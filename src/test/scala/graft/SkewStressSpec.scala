package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Skew-stress gates (VERDICT r4 #8): on a 90%-one-key dataset, the
  * window-heavy operators must not funnel the hot key through a single
  * straggler task. Measured with a Spark listener recording per-task
  * RECORDS (input + shuffle-read); the skew score of a run = max over its
  * heavy stages of (biggest task's records / stage total records). A stage
  * whose one task does ~all the work scores → 1; balanced stages score →
  * 1/numTasks. Records, not durations: the record distribution is a pure
  * function of the plan and the data, while wall-clock per task flattens
  * under concurrent machine load (a 0.9-skewed stage once measured 0.35 by
  * duration with other JVMs pinning the cores — this gate must not depend
  * on an idle box).
  */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  private class TaskSpread extends SparkListener {
    val stages: TrieMap[Int, ArrayBuffer[Long]] = TrieMap.empty
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null)
        stages.getOrElseUpdate(te.stageId, ArrayBuffer.empty).synchronized {
          stages(te.stageId) +=
            (m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead)
        }
    }
  }

  /** Max straggler ratio across stages heavy enough to matter (≥4 tasks,
    * ≥50k records total — tiny stages are all noise, and `range`-fed scan
    * stages report no input records so only real shuffle/scan stages are
    * measured). AQE partition coalescing is disabled for the measured job:
    * at spec scale the whole shuffle fits one advisory partition and every
    * stage would collapse to a single task, hiding exactly the distribution
    * this spec measures (at 100 TB the partitions are far past the advisory
    * size and never coalesce to one).
    */
  private def skewScore(job: => Unit): Double = {
    val l = new TaskSpread
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    spark.sparkContext.addSparkListener(l)
    try {
      job
      // listener events are async (the bus drain API is private[spark]):
      // poll until the task-end stream goes quiet
      var seen = -1; var now = l.stages.values.map(_.size).sum; var spins = 0
      while (seen != now && spins < 20) {
        seen = now; Thread.sleep(250); now = l.stages.values.map(_.size).sum; spins += 1
      }
    } finally {
      spark.sparkContext.removeSparkListener(l)
      old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
    val heavy = l.stages.values.filter(ts => ts.size >= 4 && ts.sum >= 50000L)
    if (heavy.isEmpty) 0.0 else heavy.map(ts => ts.max.toDouble / ts.sum).max
  }

  private def hotDf = spark.range(4000000).select(
    when(col("id") % 100 < 99, lit("hot"))
      .otherwise(concat(lit("g"), pmod(col("id"), lit(1000)))).as("grp"),
    col("id"))

  test("quotaPerGroup spreads a 90%-hot group; a one-partition-per-group window does not") {
    // negative control FIRST: prove the metric discriminates. NOT the
    // row_number+filter shape — Spark 4's WindowGroupLimit pushdown
    // de-skews exactly that pattern (partial top-K before the exchange, a
    // fact quotaPerGroup's scaladoc leans on); a running sum has no such
    // rescue, so the hot group's 900k rows funnel through one task.
    val naive = hotDf
      .withColumn("rs", sum(col("id")).over(Window.partitionBy("grp").orderBy("id")))
    val naiveScore = skewScore(naive.write.format("noop").mode("overwrite").save())
    assert(naiveScore > 0.5,
      s"control failed: skewed window scored $naiveScore — dataset/metric not discriminating")
    // ...while the two-level TakeOrdered shape stays balanced — both in
    // absolute terms and clearly below the control (the ~0.25 floor for 4
    // uniform tasks plus per-task overhead bounds how low a score can go)
    val quota = graft.ops.Scale.quotaPerGroup(hotDf, "grp", "id", quota = 50)
    val quotaScore = skewScore(quota.write.format("noop").mode("overwrite").save())
    assert(quotaScore < 0.45 && quotaScore < naiveScore - 0.1,
      s"quotaPerGroup straggler ratio $quotaScore (skewed-window control: $naiveScore)")
    // and it still computes the right thing: 50 per group, smallest hash draw
    val counts = quota.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts("hot") == 50 && counts.values.forall(_ <= 50))
  }

  test("keep-first dedup: 90%-null keys spread via per-row sentinels; grouped nulls straggle") {
    // a crawl batch where most rows failed extraction (null text). The
    // negative control groups all nulls into ONE window partition — the
    // shape exact dedup had before the sentinel fix; keepFirstByKey's
    // per-row sentinel keys must keep the same workload balanced.
    val docs = spark.range(3000000).select(
      col("id"),
      when(col("id") % 10 < 9, lit(null).cast("string"))
        .otherwise(concat(lit("doc "), col("id"))).as("text"))
    val control = docs
      .withColumn("k", sha2(col("text"), 256)) // null text -> null key, nulls group
      .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("id")))
      .filter(col("k").isNull || col("rn") === 1)
    val controlScore = skewScore(control.write.format("noop").mode("overwrite").save())
    assert(controlScore > 0.5,
      s"control failed: grouped-null window scored $controlScore — not discriminating")
    val fixed = graft.text.Dedup.exact(docs, "text", "id")
    val fixedScore = skewScore(fixed.write.format("noop").mode("overwrite").save())
    assert(fixedScore < 0.45 && fixedScore < controlScore - 0.1,
      s"sentinel-keyed dedup straggler ratio $fixedScore (grouped-null control: $controlScore)")
    // same answer either way: all null-text rows pass through
    assert(fixed.count() == docs.count(), "no duplicates in this corpus - all rows survive")
  }

  test("cohortRetention: a 99%-one-user event log stays balanced (map-side distinct absorbs it)") {
    // one bot user generates 99% of events in one period. cohortRetention's
    // only corpus-sized shuffle is the (user, period) DISTINCT — a
    // hash-aggregate whose map side collapses the bot's duplicates to one
    // row per partition BEFORE the exchange; the per-user cohort window
    // then runs over ≤ |periods| rows per user. The negative control is
    // the same dedup done as a row_number window (no partial aggregation):
    // every bot row rides the exchange into one task.
    // the bot's whole mass lands in ONE (user, week) cell — the worst case
    // for any per-(user, period) window; real users spread over the month
    val events = spark.range(3000000).select(
      col("id"),
      when(col("id") % 100 < 99, lit("bot"))
        .otherwise(concat(lit("u"), pmod(col("id"), lit(5000)))).as("user_id"),
      to_timestamp(when(col("id") % 100 < 99, lit("2024-01-15"))
        .otherwise(concat(lit("2024-01-"),
          lpad((pmod(col("id"), lit(28)) + 1).cast("string"), 2, "0")))).as("ts"))
    // control: per-(user, period) dedup WITHOUT partial aggregation — a
    // running-sum window (row_number+filter would be WindowGroupLimit-
    // rescued, the existing quotaPerGroup lesson)
    val control = events
      .withColumn("p", date_trunc("week", col("ts")).cast("date"))
      .withColumn("rs", sum(col("id")).over(Window.partitionBy("user_id", "p").orderBy("id")))
    val controlScore = skewScore(control.write.format("noop").mode("overwrite").save())
    assert(controlScore > 0.5,
      s"control failed: window-dedup scored $controlScore — not discriminating")
    val ret = graft.functions.TimeSeriesLib.cohortRetention(events, "user_id", "ts", "week")
    val retScore = skewScore(ret.write.format("noop").mode("overwrite").save())
    assert(retScore < 0.45 && retScore < controlScore - 0.1,
      s"cohortRetention straggler ratio $retScore (window-dedup control: $controlScore)")
    // and the matrix is right: Σ offset-0 actives = distinct users. Only
    // ids ≡ 99 (mod 100) are non-bot, so pmod(id, 5000) yields 50 distinct
    // user labels, plus the bot = 51.
    val cohort0 = ret.filter(col("period_offset") === 0)
      .agg(sum(col("n_active"))).first().getLong(0)
    assert(cohort0 == 51L, s"expected 51 cohort-0 actives (50 users + bot), got $cohort0")
  }

  test("bm25TopK: a query term present in 99% of docs stays balanced") {
    // the postings aggregate keys on (doc, dl, term) — uniform even when
    // one term is corpus-wide — and the per-query top-k window is
    // rank-pushdown-rescued (partial top-k before the exchange), so the
    // 99%-match query must not straggle. Absolute gate (the discriminating
    // controls for both shapes are already pinned above and in
    // quotaPerGroup's test).
    val docs = spark.range(200000).select(
      col("id").as("doc_id"),
      concat(lit("filler"), pmod(col("id"), lit(50000)),
        when(col("id") % 100 < 99, lit(" boilerplate")).otherwise(lit(" rareword")),
        lit(" tail"), col("id")).as("text"))
    val queries = Seq((1L, "boilerplate rareword")).toDF("query_id", "qtext")
    var out: org.apache.spark.sql.DataFrame = null
    val score = skewScore {
      out = graft.text.Search.bm25TopK(docs, "text", "doc_id", queries, "query_id", "qtext", k = 10)
      out.write.format("noop").mode("overwrite").save()
    }
    assert(score < 0.5, s"bm25TopK straggler ratio $score")
    // rare-term docs must win: idf(boilerplate) ≈ 0 vs idf(rareword) ≫ 0
    val topDocs = out.filter(col("rank") <= 10).select("doc_id").as[Long].collect()
    assert(topDocs.forall(_ % 100 == 99), s"expected rareword docs on top, got ${topDocs.toSeq}")
  }

  test("transitionMatrix: one hyperactive entity spans partitions instead of straggling") {
    // 99% of events belong to one entity. The old per-entity lead() window
    // (the negative control) funnels its whole series through one task;
    // the segmented adjacent-pair formulation range-splits it.
    val events = spark.range(3000000).select(
      when(col("id") % 100 < 99, lit("bot"))
        .otherwise(concat(lit("u"), pmod(col("id"), lit(1000)))).as("entity"),
      col("id").as("seq"),
      concat(lit("s"), pmod(col("id"), lit(5))).as("state"))
    val control = events
      .withColumn("__next", lead(col("state"), 1).over(
        Window.partitionBy("entity").orderBy("seq")))
      .filter(col("__next").isNotNull)
      .groupBy(col("state"), col("__next")).agg(count(lit(1)).as("n"))
    val controlScore = skewScore(control.write.format("noop").mode("overwrite").save())
    assert(controlScore > 0.5,
      s"control failed: per-entity lead window scored $controlScore — not discriminating")
    var out: org.apache.spark.sql.DataFrame = null
    val score = skewScore {
      out = graft.functions.TimeSeriesLib.transitionMatrix(
        events, "state", Seq("seq"), Seq("entity"))
      out.write.format("noop").mode("overwrite").save()
    }
    assert(score < 0.45 && score < controlScore - 0.1,
      s"transitionMatrix straggler ratio $score (lead-window control: $controlScore)")
    // segmented pairs == window pairs: same total transition count
    val nSeg = out.agg(sum(col("n"))).first().getLong(0)
    val nWin = control.agg(sum(col("n"))).first().getLong(0)
    assert(nSeg == nWin, s"segmented $nSeg vs window $nWin transition totals")
  }

  test("sessionize: one hyperactive entity spans partitions instead of straggling") {
    // same bot reality as transitionMatrix; the old lag+running-sum window
    // (the control) funnels the bot's series through one task, the
    // segmented prefix scan range-splits it
    val events = spark.range(3000000).select(
      when(col("id") % 100 < 99, lit("bot"))
        .otherwise(concat(lit("u"), pmod(col("id"), lit(1000)))).as("user"),
      // ~1 event/minute with a >30min gap every 1000 events
      timestamp_micros(col("id") * 60000000L +
        floor(col("id") / 1000).cast("long") * 3600000000L).as("ts"))
    val w = Window.partitionBy("user").orderBy("ts")
    val control = events
      .withColumn("__new", when(lag(col("ts"), 1).over(w).isNull ||
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >= 1800000000L, 1L)
        .otherwise(0L))
      .withColumn("sid", sum(col("__new")).over(w))
    val controlScore = skewScore(control.write.format("noop").mode("overwrite").save())
    assert(controlScore > 0.5,
      s"control failed: window sessionize scored $controlScore — not discriminating")
    var out: org.apache.spark.sql.DataFrame = null
    val score = skewScore {
      out = graft.functions.TimeSeriesLib.sessionize(events, "ts", 1800L, Seq("user"))
      out.write.format("noop").mode("overwrite").save()
    }
    assert(score < 0.45 && score < controlScore - 0.1,
      s"sessionize straggler ratio $score (window control: $controlScore)")
    // segmented == window: same (user, session) count
    val nSeg = out.select("user", "session_id").distinct().count()
    val nWin = control.select(col("user"), col("sid")).distinct().count()
    assert(nSeg == nWin, s"segmented $nSeg vs window $nWin sessions")
  }

  test("interArrivalStatsScalable: a bot entity stays balanced; exact sibling straggles") {
    // the exact variant is the control — its lag window AND its exact
    // per-key percentile buffer both funnel the bot's series/gaps into
    // one task; the scalable variant extracts gaps via segmented pairs
    // and merges approx-median sketches map-side
    val events = spark.range(3000000).select(
      when(col("id") % 100 < 99, lit("bot"))
        .otherwise(concat(lit("u"), pmod(col("id"), lit(1000)))).as("user"),
      timestamp_micros(col("id") * 60000000L).as("ts"),
      col("id"))
    val control = graft.functions.TimeSeriesLib.interArrivalStats(
      events, "ts", Seq("user"), Seq("ts", "id"))
    val controlScore = skewScore(control.write.format("noop").mode("overwrite").save())
    assert(controlScore > 0.5,
      s"control failed: exact interArrival scored $controlScore — not discriminating")
    var out: org.apache.spark.sql.DataFrame = null
    val score = skewScore {
      out = graft.functions.TimeSeriesLib.interArrivalStatsScalable(
        events, "ts", Seq("user"), Seq("ts", "id"))
      out.write.format("noop").mode("overwrite").save()
    }
    assert(score < 0.45 && score < controlScore - 0.1,
      s"interArrivalStatsScalable straggler ratio $score (exact control: $controlScore)")
    // same gap accounting as the exact sibling
    val nSeg = out.agg(sum(col("n_gaps"))).first().getLong(0)
    val nExact = control.agg(sum(col("n_gaps"))).first().getLong(0)
    assert(nSeg == nExact, s"scalable $nSeg vs exact $nExact total gaps")
  }

  test("duplicateSpans survives a corpus-wide boilerplate gram without a straggler") {
    // every doc shares one boilerplate sentence: its k-grams occur 60k times
    // — a count-window formulation would single-reducer them (NOTES_r04);
    // the map-side-combined groupBy + re-join shape must stay balanced
    val docs = spark.range(60000).select(
      col("id").as("doc_id"),
      concat(lit("unique prefix "), col("id"), lit(" all rights reserved contact the webmaster for details")).as("text"))
    var out: org.apache.spark.sql.DataFrame = null
    val score = skewScore {
      out = graft.text.Dedup.duplicateSpans(docs, "text", "doc_id", k = 3, minCount = 1000)
      out.write.format("noop").mode("overwrite").save()
    }
    assert(score < 0.6, s"duplicateSpans straggler ratio $score")
    // the boilerplate run is actually flagged in every document
    val flagged = out.filter(col("n_spans") >= 1).count()
    assert(flagged == 60000L, s"expected all docs flagged, got $flagged")
  }

  test("protoSelectMap: a 95%-one-cluster corpus stays balanced (distributed ordinals, no per-cluster window)") {
    // the degenerate-cell scenario the no-window rank design exists for:
    // 95% of vectors point (noisily) at centroid 0, so a
    // Window.partitionBy(cluster) rank would funnel ~all rows through one
    // task. The ordinal path is a range-repartition SORT — balanced at
    // any cluster imbalance. Vectors are deterministic functions of id.
    val n = 400000L
    val vecs = spark.range(n).select(col("id"),
      when(col("id") % 100 < 95,
        array(lit(1.0), (pmod(col("id"), lit(1000)) / 1e7).cast("double"), lit(0.0)))
      .otherwise(array((pmod(col("id"), lit(7)) / 10.0).cast("double"), lit(0.0), lit(1.0)))
        .as("v"))
    val cents = Array(Array(1.0, 0.0, 0.0), Array(0.0, 0.0, 1.0))
    val m = graft.vec.Prototypes.protoSelectMap(vecs, "id", "v", cents, 0.5)
    val score = skewScore(m.write.format("noop").mode("overwrite").save())
    assert(score < 0.5, s"protoSelectMap straggler ratio $score — the ordinal rank must not funnel the hot cluster")
    // and it computes the right thing: the floor law holds per cluster
    val byCl = m.filter(col("cluster").isNotNull)
      .groupBy("cluster").agg(count(lit(1)).as("n"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("dropped"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    byCl.foreach { case (cn, dropped) =>
      assert(dropped == math.floor(0.5 * cn).toLong, s"floor law: n=$cn dropped=$dropped")
    }
  }
}
