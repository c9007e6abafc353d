package graft

import org.apache.spark.sql.functions._
import graft.sources.{Readers, Sinks}

/** Executable gate for the JDBC storage surface (VERDICT r4 #7): an
  * embedded Apache Derby (in /opt/spark/jars — Spark ships it for the Hive
  * metastore) exercises jdbcWrite, jdbc read incl. predicate pushdown and
  * partitioned parallel reads, and the MERGE-dialect upsert, all in-JVM.
  * The postgres-dialect upsert SQL is string-asserted (no Postgres server
  * in this container — documented in COVERAGE.md).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbcWrite + jdbc read round-trip, filter pushdown, parallel partitions (Derby)") {
    val df = Seq((1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0))
      .toDF("ID", "NAME", "V")
    Sinks.jdbcWrite(df, url, "T_ROUNDTRIP", mode = "overwrite")
    val back = Readers.jdbc(spark, url, "T_ROUNDTRIP")
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("ID", "NAME", "V"))
    // predicate pushdown reaches the JDBC scan
    val filtered = back.filter(col("ID") > 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"),
      s"filter did not push to the JDBC scan:\n$plan")
    assert(filtered.count() == 2)
    // bounded partition column → parallel read (the at-scale path)
    val par = Readers.jdbc(spark, url, "T_ROUNDTRIP",
      partitionColumn = "ID", lowerBound = 1L, upperBound = 4L, numPartitions = 2)
    assert(par.rdd.getNumPartitions == 2)
    assert(par.count() == 3)
  }

  test("jdbcUpsert MERGE dialect: updates matches, inserts the rest (Derby)") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("ID", "NAME", "V")
    Sinks.jdbcWrite(base, url, "T_UPSERT", mode = "overwrite")
    val delta = Seq((2L, "B2", 99.0), (3L, "c", 30.0)).toDF("ID", "NAME", "V")
    Sinks.jdbcUpsert(delta, url, "T_UPSERT", keyCols = Seq("ID"), dialect = "merge")
    val out = Readers.jdbc(spark, url, "T_UPSERT")
      .orderBy("ID").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "B2", 99.0), (3L, "c", 30.0)))
    // idempotent: replaying the same delta changes nothing
    Sinks.jdbcUpsert(delta, url, "T_UPSERT", keyCols = Seq("ID"), dialect = "merge")
    assert(Readers.jdbc(spark, url, "T_UPSERT").count() == 3)
    // all-key frames fall back to insert-if-absent (nothing to update)
    val keysOnly = Seq(Tuple1(2L), Tuple1(9L)).toDF("ID")
    Sinks.jdbcWrite(keysOnly, url, "T_KEYS", mode = "overwrite")
    Sinks.jdbcUpsert(Seq(Tuple1(2L), Tuple1(5L)).toDF("ID"), url, "T_KEYS",
      keyCols = Seq("ID"), dialect = "merge")
    assert(Readers.jdbc(spark, url, "T_KEYS").as[Long].collect().toSet == Set(2L, 5L, 9L))
  }

  test("JdbcJournal: batchId commits are durable, idempotent, and per-query-key") {
    val j = new graft.sources.BatchJournal.JdbcJournal(url)
    assert(!j.committed("qA", 0L))
    j.commit("qA", 0L)
    assert(j.committed("qA", 0L))
    j.commit("qA", 0L) // re-commit (replay after effects) must not throw
    assert(j.committed("qA", 0L))
    assert(!j.committed("qA", 1L) && !j.committed("qB", 0L),
      "journal entries must be scoped to (query_key, batch_id)")
  }

  test("exactly-once JDBC sink effects: forced replay does not re-INSERT (VERDICT r8 #3)") {
    // Append-mode jdbcWrite is the JDBC effect that DUPLICATES on a
    // foreachBatch replay (upsert was idempotent already). Same scenario as
    // the streaming KV test: run a batch, drop its checkpoint commit marker
    // (the kill-between-sink-write-and-checkpoint-commit window), restart —
    // the journaled handler must skip the replayed batch.
    val table = "T_STREAM_APPEND"
    Sinks.jdbcWrite(Seq.empty[(Long, String)].toDF("ID", "NAME"), url, table, mode = "overwrite")
    val in = java.nio.file.Files.createTempDirectory("graft_jeo_in").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_jeo_cp").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      """{"ID":1,"NAME":"a"}""" + "\n" + """{"ID":2,"NAME":"b"}""")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("ID BIGINT, NAME STRING")
    val journal = new graft.sources.BatchJournal.JdbcJournal(url)
    def start() = graft.streaming.StreamOps.idempotentBatchSink(
        graft.streaming.StreamOps.files(spark, in, "json", schema), cp, journal,
        outputMode = "append") { (batch, _) =>
      Sinks.jdbcWrite(batch, url, table, mode = "append")
    }.start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(Readers.jdbc(spark, url, table).count() == 2)
    val commits = new java.io.File(s"$cp/commits").listFiles().filter(_.getName.forall(_.isDigit))
    val last = commits.maxBy(_.getName.toInt)
    new java.io.File(last.getParent, s".${last.getName}.crc").delete() // stale crc breaks the rewrite
    assert(commits.nonEmpty && last.delete())
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(Readers.jdbc(spark, url, table).count() == 2,
      "replayed batch re-applied its INSERTs — the journal gate failed")
  }

  test("transactional append closes the effects→journal window: crash before commit leaves NOTHING, the journaled control DUPLICATES (round 10)") {
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL("ID BIGINT, NAME STRING")
    def mkInput(): String = {
      val in = java.nio.file.Files.createTempDirectory("graft_txn_in").toString
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
        """{"ID":1,"NAME":"a"}""" + "\n" + """{"ID":2,"NAME":"b"}""")
      in
    }
    // ---- CONTROL: the old shape (journal-wrapped jdbcWrite append) with a
    // crash between effects and journal write — this is the window
    // BatchJournal documents: the restart re-applies the batch → 4 rows.
    val ctrlTable = "T_CTRL_WINDOW"
    Sinks.jdbcWrite(Seq.empty[(Long, String)].toDF("ID", "NAME"), url, ctrlTable, mode = "overwrite")
    val ctrlIn = mkInput()
    val ctrlCp = java.nio.file.Files.createTempDirectory("graft_txn_ccp").toString
    val journal = new graft.sources.BatchJournal.JdbcJournal(url, table = "J_CTRL")
    @volatile var ctrlCrash = true
    def startCtrl() = graft.streaming.StreamOps.idempotentBatchSink(
        graft.streaming.StreamOps.files(spark, ctrlIn, "json", schema), ctrlCp, journal,
        outputMode = "append") { (batch, _) =>
      Sinks.jdbcWrite(batch, url, ctrlTable, mode = "append")
      if (ctrlCrash) throw new RuntimeException("injected crash AFTER effects, BEFORE journal")
    }.start()
    val c1 = startCtrl()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](c1.processAllAvailable())
    c1.stop()
    assert(Readers.jdbc(spark, url, ctrlTable).count() == 2, "control: effects landed before the crash")
    ctrlCrash = false
    val c2 = startCtrl(); c2.processAllAvailable(); c2.stop()
    assert(Readers.jdbc(spark, url, ctrlTable).count() == 4,
      "control must DUPLICATE — if this stops failing, the documented window moved")
    // ---- TRANSACTIONAL PATH: same crash point (after every effect, before
    // commit) — the one-transaction handler leaves nothing behind, the
    // restart applies the batch exactly once, and a forced checkpoint
    // replay of the COMMITTED batch is skipped by the in-txn journal PK.
    val table = "T_TXN_APPEND"
    Sinks.jdbcWrite(Seq.empty[(Long, String)].toDF("ID", "NAME"), url, table, mode = "overwrite")
    val in = mkInput()
    val cp = java.nio.file.Files.createTempDirectory("graft_txn_cp").toString
    @volatile var crash = true
    def start() = graft.streaming.StreamOps.foreachBatchSink(
        graft.streaming.StreamOps.files(spark, in, "json", schema), cp,
        outputMode = "append")(
      Sinks.jdbcAppendExactlyOnce(url, table, "q_txn", journalTable = "J_TXN",
        beforeCommit = () => if (crash) throw new RuntimeException("injected crash BEFORE commit")))
      .start()
    val q1 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](q1.processAllAvailable())
    q1.stop()
    assert(Readers.jdbc(spark, url, table).count() == 0,
      "crash between effects and commit must leave NO rows (single-txn atomicity)")
    crash = false
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(Readers.jdbc(spark, url, table).count() == 2, "restart applies the batch exactly once")
    // forced replay of the committed batch (drop the checkpoint commit)
    val commits = new java.io.File(s"$cp/commits").listFiles().filter(_.getName.forall(_.isDigit))
    val last = commits.maxBy(_.getName.toInt)
    new java.io.File(last.getParent, s".${last.getName}.crc").delete()
    assert(commits.nonEmpty && last.delete())
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    assert(Readers.jdbc(spark, url, table).count() == 2,
      "replayed committed batch must trip the journal PK before any effect")
  }

  test("upsert SQL generation: postgres ON CONFLICT pinned, bad dialect rejected") {
    // no Postgres server in this container — the exact statement the
    // reference DB would receive is pinned instead (COVERAGE.md)
    val schema = Seq((1L, "x", 2.0)).toDF("id", "name", "v").schema
    val (pg, pgBind) = Sinks.upsertSql(schema, "docs", Seq("id"), onConflictUpdate = true, "postgres")
    assert(pg ==
      """INSERT INTO docs (id, name, v) VALUES (?, ?, ?)
        |ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name, v = EXCLUDED.v""".stripMargin)
    assert(pgBind == Seq("id", "name", "v"))
    val (pgNoUpd, _) = Sinks.upsertSql(schema, "docs", Seq("id"), onConflictUpdate = false, "postgres")
    assert(pgNoUpd.endsWith("ON CONFLICT (id) DO NOTHING"))
    val (merge, mBind) = Sinks.upsertSql(schema, "docs", Seq("id"), onConflictUpdate = true, "merge")
    assert(merge.contains("MERGE INTO docs t USING SYSIBM.SYSDUMMY1 d"))
    assert(merge.contains("ON (t.id = CAST(? AS BIGINT))"))
    assert(merge.contains(
      "WHEN MATCHED THEN UPDATE SET name = CAST(? AS VARCHAR(32672)), v = CAST(? AS DOUBLE)"))
    assert(mBind == Seq("id", "name", "v", "id", "name", "v"),
      "merge params bind ON keys, UPDATE non-keys, then INSERT columns")
    intercept[IllegalArgumentException] {
      Sinks.upsertSql(schema, "docs", Seq("id"), onConflictUpdate = true, "cassandra")
    }
  }
}
