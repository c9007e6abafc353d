package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val dim0 = Scd.scd2Init(
    Seq(("k1", "A", ts("2024-01-01 00:00:00")), ("k2", "X", ts("2024-01-01 00:00:00")))
      .toDF("k", "state", "ts"),
    Seq("k"), Seq("state"), "ts")

  test("scd2Apply: change closes the open row and opens a current version") {
    val updates = Seq(("k1", "B", ts("2024-02-01 00:00:00"))).toDF("k", "state", "ts")
    val out = Scd.scd2Apply(dim0, updates, Seq("k"), Seq("state"), "ts")
      .orderBy("k", "valid_from")
      .select($"k", $"state", $"valid_to".isNull.as[Boolean], $"is_current".as[Boolean])
      .as[(String, String, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(
      ("k1", "A", false, false), // closed at the change ts
      ("k1", "B", true, true),
      ("k2", "X", true, true)))  // untouched
    val closed = Scd.scd2Apply(dim0, updates, Seq("k"), Seq("state"), "ts")
      .filter($"k" === "k1" && !$"is_current").select("valid_to")
      .as[java.sql.Timestamp].head()
    assert(closed == ts("2024-02-01 00:00:00"))
  }

  test("scd2Apply: unchanged state is a no-op; re-applying a batch is idempotent") {
    val updates = Seq(("k1", "A", ts("2024-02-01 00:00:00"))).toDF("k", "state", "ts")
    val out = Scd.scd2Apply(dim0, updates, Seq("k"), Seq("state"), "ts")
    assert(out.count() == 2) // nothing closed, nothing inserted
    assert(out.filter($"is_current").count() == 2)

    val change = Seq(("k1", "B", ts("2024-02-01 00:00:00"))).toDF("k", "state", "ts")
    val once = Scd.scd2Apply(dim0, change, Seq("k"), Seq("state"), "ts")
    val twice = Scd.scd2Apply(once, change, Seq("k"), Seq("state"), "ts")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("scd2Apply: consecutive duplicates collapse; multi-hop chain versions correctly") {
    val updates = Seq(
      ("k1", "B", ts("2024-02-01 00:00:00")),
      ("k1", "B", ts("2024-03-01 00:00:00")), // dup -> collapses
      ("k1", "C", ts("2024-04-01 00:00:00"))
    ).toDF("k", "state", "ts")
    val out = Scd.scd2Apply(dim0, updates, Seq("k"), Seq("state"), "ts")
      .filter($"k" === "k1").orderBy("valid_from")
      .select($"state", $"is_current".as[Boolean]).as[(String, Boolean)].collect().toSeq
    assert(out == Seq(("A", false), ("B", false), ("C", true)))
  }

  test("scd2Apply: new key inserts its chain; all-null tracked values on a new key survive") {
    val updates = Seq(
      ("k3", Some("P"), ts("2024-02-01 00:00:00")),
      ("k4", None: Option[String], ts("2024-02-01 00:00:00"))
    ).toDF("k", "state", "ts")
    val out = Scd.scd2Apply(dim0, updates, Seq("k"), Seq("state"), "ts")
    assert(out.filter($"k" === "k3" && $"is_current" && $"state" === "P").count() == 1)
    // regression: null-safe equality vs the unmatched open-join columns must
    // not swallow a new key whose tracked value is null
    assert(out.filter($"k" === "k4" && $"is_current" && $"state".isNull).count() == 1)
  }

  test("scd2 YAML op: init then apply via the pipeline compiler") {
    import graft.core.{OpCompiler, PipelineConfig}
    val snapshot = Seq(("k1", "A", ts("2024-01-01 00:00:00"))).toDF("k", "state", "ts")
    val updates = Seq(("k1", "B", ts("2024-02-01 00:00:00"))).toDF("k", "state", "ts")
    val initOp = PipelineConfig.parseOp(Map("type" -> "scd2",
      "operation" -> "init", "keys" -> "k", "tracked" -> "state", "ts_col" -> "ts"))
    val applyOp = PipelineConfig.parseOp(Map("type" -> "scd2",
      "operation" -> "apply", "keys" -> "k", "tracked" -> "state", "ts_col" -> "ts",
      "updates_table" -> "changes"))
    val out = OpCompiler.compile(Seq(initOp, applyOp),
      tables = { case "changes" => updates })(snapshot)
    assert(out.count() == 2)
    assert(out.filter($"is_current" && $"state" === "B").count() == 1)
  }

  test("scd2Apply: two-batch apply equals the single-batch chain") {
    val all = Seq(
      ("k1", "B", ts("2024-02-01 00:00:00")),
      ("k1", "C", ts("2024-03-01 00:00:00")),
      ("k2", "X", ts("2024-02-15 00:00:00")), // no-op vs open X
      ("k2", "Y", ts("2024-03-15 00:00:00"))
    ).toDF("k", "state", "ts")
    val oneShot = Scd.scd2Apply(dim0, all, Seq("k"), Seq("state"), "ts")
    val b1 = all.filter($"ts" < lit(ts("2024-03-01 00:00:00")))
    val b2 = all.filter($"ts" >= lit(ts("2024-03-01 00:00:00")))
    val twoShot = Scd.scd2Apply(
      Scd.scd2Apply(dim0, b1, Seq("k"), Seq("state"), "ts"),
      b2, Seq("k"), Seq("state"), "ts")
    assert(twoShot.exceptAll(oneShot).isEmpty && oneShot.exceptAll(twoShot).isEmpty)
  }

  test("applyCdc: last-seq winner, tie resolves to delete, inserts land, untouched pass through") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      (1L, "a", 11.0, "U", 1L), (1L, "a", 12.0, "U", 3L), (1L, "a", 99.0, "U", 2L), // seq 3 wins
      (2L, "b", 0.0, "D", 5L),                                                       // delete
      (3L, "c", 33.0, "U", 7L), (3L, "c", 0.0, "D", 7L),                             // tie → delete
      (9L, "new", 90.0, "I", 1L)                                                     // insert
    ).toDF("k", "name", "v", "op", "seq")
    val out = Scd.applyCdc(snap, changes, Seq("k"))
      .select($"k", $"name", $"v").as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 12.0), (4L, "d", 40.0), (9L, "new", 90.0)))
  }

  test("applyCdc: a null-keyed row updates without duplicating (null-safe anti join)") {
    val snap = Seq((Some(1L), "a", 1.0), (None, "nk", 9.0))
      .map { case (k, n, v) => (k.map(Long.box).orNull, n, v) }.toDF("k", "name", "v")
    val changes = Seq((null.asInstanceOf[java.lang.Long], "nk", 10.0, "U", 1L))
      .toDF("k", "name", "v", "op", "seq")
    val out = Scd.applyCdc(snap, changes, Seq("k")).collect()
      .map(r => Option(r.get(0)) -> r.getDouble(2)).toMap
    assert(out.size == 2, "no duplicate null-key row")
    assert(out(None) == 10.0, "the null-keyed row took the update")
  }

  test("applyCdc is idempotent: re-applying the same log is a no-op") {
    val snap = Seq((1L, "x", 1.0)).toDF("k", "name", "v")
    val changes = Seq((1L, "x", 2.0, "U", 1L), (5L, "y", 5.0, "I", 2L))
      .toDF("k", "name", "v", "op", "seq")
    val once = Scd.applyCdc(snap, changes, Seq("k"))
    val twice = Scd.applyCdc(once, changes, Seq("k"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
