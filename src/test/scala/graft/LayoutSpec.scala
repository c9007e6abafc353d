package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton implementation for the differential law. */
  private def morton(bits: Int, vals: Seq[Int]): Long = {
    var acc = 0L
    val n = vals.size
    for (i <- vals.indices; j <- 0 until bits)
      acc |= ((vals(i).toLong >> j) & 1L) << (j * n + i)
    acc
  }

  test("interleaveBits matches the reference Morton on random bucket ids") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val out = rows.toDF("a", "b", "c")
      .withColumn("z", Layout.interleaveBits(8, Seq($"a", $"b", $"c")))
      .select("a", "b", "c", "z").as[(Int, Int, Int, Long)].collect()
    out.foreach { case (a, b, c, z) => assert(z == morton(8, Seq(a, b, c))) }
  }

  test("z-sorted grid splits into quadrants (the data-skipping property)") {
    // full 16x16 grid, identity buckets (min=0, max=15, bits=4): sorting by
    // the Morton key must put one quadrant in each quarter of the order —
    // both columns' ranges halve together, which is why row-group min/max
    // stats prune on either column
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y)).toDF("x", "y")
    val sorted = Layout.addZOrderKey(grid, Seq("x", "y"), bits = 4)
      .orderBy("zkey").select("x", "y").as[(Int, Int)].collect()
    val quarters = sorted.grouped(64).toSeq
    assert(quarters.size == 4)
    for (q <- quarters) {
      assert(q.map(_._1).max - q.map(_._1).min <= 7, "x-range must halve per quarter")
      assert(q.map(_._2).max - q.map(_._2).min <= 7, "y-range must halve per quarter")
    }
  }

  test("null in any clustered column yields a null key; out-of-range clamps") {
    val df = Seq((Some(1), Some(2)), (None, Some(3)), (Some(4), None))
      .toDF("x", "y")
    val out = Layout.addZOrderKey(df, Seq("x", "y"), bits = 4)
    assert(out.filter($"zkey".isNull).count() == 2)
    // stale-stats clamp: values beyond [mn, mx] hit the edge buckets
    val clamped = Seq(-5, 0, 15, 99).toDF("v")
      .withColumn("b", Layout.rangeBucket("v", 0L, 15L, 4))
      .select("b").as[Int].collect().toSeq
    assert(clamped == Seq(0, 0, 15, 15))
  }

  test("clusterByZOrder: every partition is sorted by the key") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(2000)((rnd.nextInt(1000), rnd.nextInt(1000))).toDF("x", "y")
    val clustered = Layout.clusterByZOrder(df, Seq("x", "y"), bits = 8, numPartitions = 8)
    val unsortedParts = clustered.select("zkey").as[Long].rdd
      .mapPartitions(it => Iterator.single(it.toSeq))
      .collect().count(p => p != p.sorted)
    assert(unsortedParts == 0)
  }

  test("layout YAML op: zorder_key and cluster reach Layout from the parser") {
    import graft.core.{OpCompiler, PipelineConfig}
    val df = Seq((1, 10), (2, 20), (3, 30)).toDF("x", "y")
    val keyed = OpCompiler.compile(Seq(PipelineConfig.parseOp(Map(
      "type" -> "layout", "operation" -> "zorder_key",
      "columns" -> java.util.List.of("x", "y"), "bits" -> "4"))))(df)
    assert(keyed.columns.contains("zkey"))
    val clustered = OpCompiler.compile(Seq(PipelineConfig.parseOp(Map(
      "type" -> "layout", "operation" -> "cluster",
      "columns" -> java.util.List.of("x", "y"), "partitions" -> "2"))))(df)
    assert(clustered.count() == 3)
  }

  test("compactToTargetSize derives the partition count from on-disk bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    try {
      // 64 tiny files
      spark.range(0, 64000).withColumn("pad", lpad(lit("x"), 100, "y"))
        .repartition(64).write.mode("overwrite").parquet(dir)
      val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 64)
      val total = files.map(_.length).sum
      val target = total / 4 // aim for ~4 files
      val (compacted, n) = Layout.compactToTargetSize(spark, dir, target)
      assert(n == math.ceil(total.toDouble / target).toInt)
      assert(compacted.rdd.getNumPartitions == n)
      assert(compacted.count() == 64000)
      val outDir = java.nio.file.Files.createTempDirectory("graft_compact_out").toString
      try {
        compacted.write.mode("overwrite").parquet(outDir)
        val outFiles = new java.io.File(outDir).listFiles()
          .filter(_.getName.endsWith(".parquet"))
        assert(outFiles.length == n)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
