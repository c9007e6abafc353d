package graft

import org.apache.spark.sql.functions._
import graft.ops.IncrementalAgg

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("a", Some(1.0), "x1"), ("a", Some(3.0), "x2"), ("a", None, "x3"),
    ("b", Some(10.0), "x1"), ("b", Some(20.0), "x4")
  ).toDF("k", "v", "u")

  test("merge of sharded fits equals the one-shot fit") {
    val whole = IncrementalAgg.fit(df, Seq("k"), Seq("v"))
    val parts = Seq(
      IncrementalAgg.fit(df.filter($"u".isin("x1", "x2")), Seq("k"), Seq("v")),
      IncrementalAgg.fit(df.filter(!$"u".isin("x1", "x2")), Seq("k"), Seq("v")))
    val merged = IncrementalAgg.merge(parts, Seq("k"), Seq("v"))
    val a = whole.orderBy("k").collect().toSeq
    val b = merged.orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("finalizeStats: mean/std/nulls from state; empty-count group yields nulls") {
    val state = IncrementalAgg.merge(
      Seq(IncrementalAgg.fit(df, Seq("k"), Seq("v"))), Seq("k"), Seq("v"))
    val out = IncrementalAgg.finalizeStats(state, Seq("k"), Seq("v"))
      .orderBy("k").collect()
    val a = out(0) // k=a: values 1,3 + one null
    assert(a.getAs[Long]("v_n") == 2 && a.getAs[Long]("v_nulls") == 1)
    assert(math.abs(a.getAs[Double]("v_mean") - 2.0) < 1e-12)
    assert(math.abs(a.getAs[Double]("v_std") - 1.0) < 1e-12) // population std of {1,3}

    val allNull = Seq(("c", None: Option[Double])).toDF("k", "v")
    val ns = IncrementalAgg.finalizeStats(
      IncrementalAgg.fit(allNull, Seq("k"), Seq("v")), Seq("k"), Seq("v")).collect()(0)
    assert(ns.getAs[Long]("v_n") == 0 && ns.isNullAt(ns.fieldIndex("v_mean")))
  }

  test("HLL sketch state: merge across shards, estimate tracks exact distinct") {
    val big = spark.range(0, 20000)
      .select(col("id"), (col("id") % 4).cast("string").as("k"),
        concat(lit("u"), col("id") % 5000).as("u"), lit(1.0).as("v"))
    val shards = (0 until 4).map(i => big.filter(col("id") % 4 === i).drop("id"))
    val states = shards.map(sh => IncrementalAgg.fit(sh, Nil, Seq("v"), approxDistinctCols = Seq("u")))
    val merged = IncrementalAgg.merge(states, Nil, Seq("v"), approxDistinctCols = Seq("u"))
    val est = IncrementalAgg.finalizeStats(merged, Nil, Seq("v"), approxDistinctCols = Seq("u"))
      .select("u_distinct_est").as[Long].head()
    assert(math.abs(est - 5000L) < 250, s"HLL estimate $est should be within 5% of 5000")
    // merged estimate agrees with the one-shot sketch
    val oneShot = IncrementalAgg.finalizeStats(
      IncrementalAgg.fit(big.drop("id"), Nil, Seq("v"), approxDistinctCols = Seq("u")),
      Nil, Seq("v"), approxDistinctCols = Seq("u"))
      .select("u_distinct_est").as[Long].head()
    assert(math.abs(est - oneShot) <= math.max(1L, oneShot / 100))
  }

  test("ddFit/ddMerge: sharded merge equals the one-shot sketch EXACTLY") {
    val data = (1 to 4000).map(i => (i.toLong, math.exp(i % 37 / 5.0) * (i % 7 + 1)))
      .toDF("id", "v")
    val shards = (0 until 3).map(i => data.filter($"id" % 3 === i))
    val merged = IncrementalAgg.ddMerge(shards.map(s => IncrementalAgg.ddFit(s, Nil, "v")), Nil)
    val oneShot = IncrementalAgg.ddFit(data, Nil, "v")
    assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty,
      "bucket counts must merge exactly")
  }

  test("ddFit: NaN/±Inf/null excluded without an ANSI cast crash") {
    val d = Seq[java.lang.Double](1.0, Double.PositiveInfinity, Double.NegativeInfinity,
        Double.NaN, null)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val st = IncrementalAgg.ddFit(d, Nil, "v").collect()
    assert(st.map(_.getAs[Long]("n")).sum == 1L, "only the finite value lands in a bucket")
  }

  test("ddQuantiles: relative error within alpha vs exact percentiles; signed + zero values") {
    val alpha = 0.01
    val vs = (1 to 5000).map(i => math.pow(1.002, i) * 3.0) // multi-decade positive spread
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val st = IncrementalAgg.ddFit(df, Nil, "v", alpha)
    val est = IncrementalAgg.ddQuantiles(st, Nil, Seq(0.1, 0.5, 0.99), alpha)
      .collect().map(r => r.getDouble(r.fieldIndex("q")) -> r.getDouble(r.fieldIndex("quantile_est"))).toMap
    val sorted = vs.sorted
    def exact(q: Double) = sorted(((sorted.size - 1) * q).toInt)
    Seq(0.1, 0.5, 0.99).foreach { q =>
      val rel = math.abs(est(q) - exact(q)) / exact(q)
      assert(rel <= 2 * alpha, s"q=$q rel error $rel exceeds guarantee")
    }
    // signed + zero: quantile walk crosses negative, zero, and positive tiers
    val mixed = Seq(-100.0, -1.0, 0.0, 1.0, 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val mq = IncrementalAgg.ddQuantiles(IncrementalAgg.ddFit(mixed, Nil, "v", alpha),
        Nil, Seq(0.0, 0.5, 1.0), alpha)
      .collect().map(r => r.getDouble(r.fieldIndex("q")) -> r.getDouble(r.fieldIndex("quantile_est"))).toMap
    assert(mq(0.0) < -99.0, "q=0 lands in the most-negative bucket")
    assert(mq(0.5) == 0.0, "median of the symmetric set is the zero bucket")
    assert(mq(1.0) > 99.0, "q=1 lands in the most-positive bucket")
  }

  test("BoundedMinList: k smallest, sorted, partitioning-independent, nulls skipped") {
    // 1000 values per key in scrambled order (deterministic LCG-ish
    // permutation), interleaved nulls; k = 7 must return exactly the 7
    // smallest ascending no matter how the input is partitioned
    val rows = (0 until 1000).map(i => ("g", Some(((i * 613) % 1000).toLong))) ++
      Seq(("g", None), ("h", Some(42L)))
    def run(parts: Int): Map[String, Seq[Long]] =
      rows.toDF("k", "v").repartition(parts)
        .groupBy("k").agg(graft.expr.BoundedMinList(col("v"), 7).as("ids"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (parts <- Seq(1, 3, 32)) {
      val m = run(parts)
      assert(m("g") == (0L to 6L), s"parts=$parts: expected the 7 smallest ascending, got ${m("g")}")
      assert(m("h") == Seq(42L), s"parts=$parts: under-full group keeps all members")
    }
  }

  test("BoundedMinList: duplicates kept (multiset), bound enforced at duplicates") {
    val m = Seq(("g", 5L), ("g", 5L), ("g", 5L), ("g", 1L), ("g", 9L))
      .toDF("k", "v")
      .groupBy("k").agg(graft.expr.BoundedMinList(col("v"), 3).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m("g") == Seq(1L, 5L, 5L), "k=3 keeps the three smallest INCLUDING duplicates")
  }
}
