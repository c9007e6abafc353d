package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row <= left ts, inclusive at equality") {
    val quotes = Seq(
      ("A", ts("2024-01-01 09:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:00"), 110.0),
      ("A", ts("2024-01-01 11:00:00"), 120.0),
      ("B", ts("2024-01-01 09:30:00"), 50.0)
    ).toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1), // equal ts -> inclusive: 110
      ("A", ts("2024-01-01 10:30:00"), 2), // -> 110
      ("A", ts("2024-01-01 08:00:00"), 3), // before all -> null
      ("B", ts("2024-01-01 12:00:00"), 4)  // -> 50
    ).toDF("sym", "tts", "tid")
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .orderBy("tid").select("tid", "px").collect()
    assert(out(0).getDouble(1) == 110.0)
    assert(out(1).getDouble(1) == 110.0)
    assert(out(2).isNullAt(1))
    assert(out(3).getDouble(1) == 50.0)
  }

  test("asofJoin forward picks the NEXT right row >= left ts, tolerance looks ahead") {
    val quotes = Seq(
      ("A", ts("2024-01-01 09:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:00"), 110.0),
      ("A", ts("2024-01-01 11:00:00"), 120.0)
    ).toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1), // equal ts inclusive forward: 110
      ("A", ts("2024-01-01 10:30:00"), 2), // next is 11:00 -> 120
      ("A", ts("2024-01-01 12:00:00"), 3)  // after all -> null
    ).toDF("sym", "tts", "tid")
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"),
        direction = "forward")
      .orderBy("tid").select("tid", "px").collect()
    assert(out(0).getDouble(1) == 110.0)
    assert(out(1).getDouble(1) == 120.0)
    assert(out(2).isNullAt(1))
    // forward tolerance: a next-quote farther than 10 min nulls out
    val tol = Joins.asofJoin(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"),
        toleranceSeconds = 600, direction = "forward")
      .orderBy("tid").select("px").collect()
    assert(tol(0).getDouble(0) == 110.0) // equal ts: gap 0
    assert(tol(1).isNullAt(0), "30-minute look-ahead exceeds the 10-minute tolerance")
  }

  test("asofJoin tolerance nulls out stale matches") {
    val r = Seq(("A", ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "rts", "v")
    val l = Seq(("A", ts("2024-01-01 00:30:00"), 1), ("A", ts("2024-01-03 00:00:00"), 2))
      .toDF("k", "lts", "id")
    val out = Joins.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("v"), toleranceSeconds = 3600)
      .orderBy("id").select("v").collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).isNullAt(0)) // 2 days later: outside 1h tolerance
  }

  test("asofJoin plan has no join node at all (window formulation)") {
    val r = Seq(("A", ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "rts", "v")
    val l = Seq(("A", ts("2024-01-01 00:30:00"), 1)).toDF("k", "lts", "id")
    val plan = Joins.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
    assert(plan.contains("Window"))
  }

  test("asofJoin law: equals the max-rightTs<=leftTs SQL formulation on generated data") {
    val rnd = new scala.util.Random(7)
    val rights = (1 to 60).map(_ =>
      (s"k${rnd.nextInt(4)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), rnd.nextInt(1000).toDouble))
    val lefts = (1 to 60).map(i =>
      (s"k${rnd.nextInt(5)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i))
    val r = rights.toDF("k", "rts", "v").dropDuplicates("k", "rts") // unique (k, ts) → well-defined asof value
    val l = lefts.toDF("k", "lts", "id")
    val got = graft.ops.Joins.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("v"))
      .select("id", "v").orderBy("id").collect().map(x => (x.getInt(0), if (x.isNullAt(1)) null else x.getDouble(1)))
    l.createOrReplaceTempView("asof_l"); r.createOrReplaceTempView("asof_r")
    val ref = spark.sql(
      """SELECT id, (SELECT max_by(v, rts) FROM asof_r WHERE asof_r.k = asof_l.k AND rts <= lts) AS v
        |FROM asof_l ORDER BY id""".stripMargin)
      .collect().map(x => (x.getInt(0), if (x.isNullAt(1)) null else x.getDouble(1)))
    assert(got.toSeq == ref.toSeq)
  }

  test("asofJoin keeps all payload columns from the SAME matched right row") {
    // Regression: per-column last(ignoreNulls) fill would pull `a` from the
    // 10:00 row but `b` from the 09:00 row when the 10:00 row has b = NULL.
    val r = Seq(
      ("A", ts("2024-01-01 09:00:00"), Some(1.0), Some("old")),
      ("A", ts("2024-01-01 10:00:00"), Some(2.0), None: Option[String])
    ).toDF("k", "rts", "a", "b")
    val l = Seq(("A", ts("2024-01-01 10:30:00"), 1)).toDF("k", "lts", "id")
    val out = Joins.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("a", "b")).collect()(0)
    assert(out.getAs[Double]("a") == 2.0)
    assert(out.isNullAt(out.fieldIndex("b"))) // NOT "old" — same-row semantics
    assert(out.getAs[Timestamp]("asof_ts") == ts("2024-01-01 10:00:00"))
  }

  test("saltedJoin rejects join types that replicate unmatched right rows") {
    val l = Seq((1, "x")).toDF("k", "lv")
    val r = Seq((1, "y")).toDF("k", "rv")
    intercept[IllegalArgumentException] {
      graft.ops.Scale.saltedJoin(l, r, Seq("k"), 4, "right_outer")
    }
    intercept[IllegalArgumentException] {
      graft.ops.Scale.saltedJoin(l, r, Seq("k"), 4, "full")
    }
    assert(graft.ops.Scale.saltedJoin(l, r, Seq("k"), 4, "left").count() == 1)
  }

  test("rangeJoinBucketed matches BETWEEN semantics exactly once per pair") {
    val points = Seq(
      ("u1", ts("2024-01-01 00:10:00"), 1),
      ("u1", ts("2024-01-01 03:00:00"), 2),
      ("u1", ts("2024-01-01 00:50:00"), 3),
      ("u2", ts("2024-01-01 00:10:00"), 4)
    ).toDF("k", "pts", "pid")
    val intervals = Seq(
      ("u1", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), 10), // long interval spans 2 buckets
      ("u1", ts("2024-01-01 00:45:00"), ts("2024-01-01 00:55:00"), 11)
    ).toDF("k", "start_ts", "end_ts", "iid")
    val out = Joins.rangeJoinBucketed(points, intervals, Seq("k"), "pts", "start_ts", "end_ts", 1800)
      .select("pid", "iid").as[(Int, Int)].collect().toSet
    assert(out == Set((1, 10), (3, 10), (3, 11))) // point 2 outside, u2 no interval; no duplicates
    val plan = Joins.rangeJoinBucketed(points, intervals, Seq("k"), "pts", "start_ts", "end_ts", 1800)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join fell back to nested loop:\n$plan")
  }
}
