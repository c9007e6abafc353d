package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.sql.{Connection, DriverManager, PreparedStatement, Types}

/** Batch sinks — §2.B. */
object Sinks {

  /** Partitioned parquet write — the `partitioning: daily` the reference
    * declares but never implements (iot_pipeline.yaml:47-51). With
    * `dynamicOverwrite`, an overwrite touches ONLY the partitions present in
    * `df` (idempotent backfill of a day without clobbering the table).
    */
  def parquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                         mode: String = "overwrite", dynamicOverwrite: Boolean = false): Unit = {
    var wr = df.write.mode(mode).partitionBy(partitionCols: _*)
    if (dynamicOverwrite) wr = wr.option("partitionOverwriteMode", "dynamic")
    wr.parquet(path)
  }

  /** Size-targeted parquet write — the small-files fix: `rebalance` is the
    * AQE hint that re-splits shuffle output into partitions of
    * `spark.sql.adaptive.advisoryPartitionSizeInBytes` (both coalescing
    * tiny partitions and splitting skewed ones), so file count tracks data
    * volume instead of upstream parallelism. A 100 TB table lands as
    * ~targetMB files regardless of how many tasks produced it; a 10 MB
    * result lands as one file instead of `shuffle.partitions` shards.
    *
    * Caveat: the advisory size is a SESSION conf (Spark offers no per-query
    * override), so the set/restore around this write is visible to
    * concurrent queries on the same SparkSession — call from the session's
    * owning thread, or pre-set the conf globally and pass its value here.
    */
  def parquetSized(df: DataFrame, path: String, targetMB: Int = 128,
                   mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val old = spark.conf.getOption(key)
    try {
      spark.conf.set(key, s"${targetMB}m")
      df.hint("rebalance").write.mode(mode).parquet(path)
    } finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** Plain JDBC write (postgresql_storage.py:52-84): append/overwrite with
    * batched inserts (`batchsize` ≙ the reference's chunk_size).
    */
  def jdbcWrite(df: DataFrame, url: String, table: String, mode: String = "append",
                batchSize: Int = 10000, props: Map[String, String] = Map.empty): Unit = {
    var wr = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
    props.foreach { case (k, v) => wr = wr.option(k, v) }
    wr.mode(mode).save()
  }

  /** Upsert via `INSERT … ON CONFLICT (keys) DO UPDATE` executed per
    * partition (postgresql_storage.py:267-306 `bulk_insert` parity — Spark
    * has no built-in upsert). Each executor opens its own connection and
    * batches `batchSize` rows per round trip; the whole write is distributed.
    */
  def jdbcUpsert(
      df: DataFrame,
      url: String,
      table: String,
      keyCols: Seq[String],
      props: Map[String, String] = Map.empty,
      batchSize: Int = 1000,
      onConflictUpdate: Boolean = true
  ): Unit = {
    val cols = df.columns.toSeq
    val placeholders = cols.map(_ => "?").mkString(", ")
    val nonKeyCols = cols.filterNot(keyCols.contains)
    val conflictAction =
      if (!onConflictUpdate || nonKeyCols.isEmpty) "DO NOTHING" // all-key rows have nothing to update
      else s"DO UPDATE SET ${nonKeyCols.map(c => s"$c = EXCLUDED.$c").mkString(", ")}"
    val sql =
      s"""INSERT INTO $table (${cols.mkString(", ")}) VALUES ($placeholders)
         |ON CONFLICT (${keyCols.mkString(", ")}) $conflictAction""".stripMargin
    df.foreachPartition { (rows: Iterator[Row]) =>
      val conn: Connection = {
        val p = new java.util.Properties()
        props.foreach { case (k, v) => p.setProperty(k, v) }
        DriverManager.getConnection(url, p)
      }
      conn.setAutoCommit(false)
      val st: PreparedStatement = conn.prepareStatement(sql)
      try {
        var n = 0
        rows.foreach { row =>
          var i = 0
          while (i < cols.length) {
            val v = row.get(i)
            if (v == null) st.setNull(i + 1, java.sql.Types.NULL) else st.setObject(i + 1, v)
            i += 1
          }
          st.addBatch()
          n += 1
          if (n % batchSize == 0) { st.executeBatch(); conn.commit() }
        }
        st.executeBatch(); conn.commit()
      } finally { st.close(); conn.close() }
    }
  }

  /** Kafka producer sink (kafka_source.py:254-348): whole row as JSON value,
    * optional key column — one `to_json(struct(*))` projection, written by
    * Spark's Kafka batch sink (no per-row driver loop).
    */
  def kafkaWrite(df: DataFrame, bootstrapServers: String, topic: String, keyCol: String = null): Unit = {
    val base = if (keyCol != null)
      df.select(col(keyCol).cast("string").as("key"), to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))
    else df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))
    base.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()
  }
}
