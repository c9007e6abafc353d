package graft

import org.apache.spark.sql.Row
import graft.text.Dedup

/** LSH parameter-tuner gates: the S-curve integration that turns the
  * minhash bands/rows choice from folklore into a measured argmin.
  */
class TuningSpec extends SparkSpec {

  test("tuneLsh enumerates exactly the factorizations of numHashes") {
    val rows = Dedup.tuneLsh(spark, numHashes = 64, threshold = 0.5).collect()
    val pairs = rows.map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"))).toSet
    assert(pairs == Set((1, 64), (2, 32), (4, 16), (8, 8), (16, 4), (32, 2), (64, 1)))
    rows.foreach { r =>
      assert(r.getAs[Int]("bands") * r.getAs[Int]("rows_per_band") == 64)
      val fp = r.getAs[Double]("fp_area"); val fn = r.getAs[Double]("fn_area")
      assert(fp >= 0.0 && fp <= 1.0 && fn >= 0.0 && fn <= 1.0, r.toString)
    }
  }

  test("the 0.5-threshold pick is the classic (16, 4) and rank-1 is the min error") {
    val rows = Dedup.tuneLsh(spark, numHashes = 64, threshold = 0.5).collect()
    val pick = rows.filter(_.getAs[Int]("pick_rank") == 1)
    assert(pick.length == 1)
    assert((pick.head.getAs[Int]("bands"), pick.head.getAs[Int]("rows_per_band")) == (16, 4))
    val minErr = rows.map(_.getAs[Double]("total_err")).min
    assert(pick.head.getAs[Double]("total_err") == minErr)
  }

  test("pickLshParams equals the DataFrame's rank-1 row at several thresholds") {
    Seq(0.3, 0.5, 0.7, 0.8).foreach { t =>
      val frame = Dedup.tuneLsh(spark, numHashes = 64, threshold = t).collect()
        .filter(_.getAs[Int]("pick_rank") == 1).head
      val (b, r) = Dedup.pickLshParams(numHashes = 64, threshold = t)
      assert((frame.getAs[Int]("bands"), frame.getAs[Int]("rows_per_band")) == ((b, r)),
        s"threshold $t: driver pick ($b,$r) != frame pick")
    }
  }

  test("picked band count decreases monotonically in the threshold") {
    // lower target similarity needs the S-curve shifted left = more bands;
    // pinned picks: 0.3→(32,2), 0.5→(16,4), 0.7→(8,8), 0.8→(4,16)
    val picks = Seq(0.3, 0.5, 0.7, 0.8).map(t => Dedup.pickLshParams(64, t))
    assert(picks == Seq((32, 2), (16, 4), (8, 8), (4, 16)))
  }

  test("YAML near_dedup derives bands from its threshold via pickLshParams; explicit bands wins (round 11)") {
    import spark.implicits._
    // routing law: threshold 0.5 → the classic (16, 4); 0.8 → (4, 16);
    // an explicit bands: always overrides the tuner
    assert(Dedup.bandsFor(64, 0.5, None) == 16)
    assert(Dedup.bandsFor(64, 0.8, None) == 4)
    assert(Dedup.bandsFor(64, 0.8, Some(16)) == 16)
    // end-to-end: a YAML near_dedup with threshold 0.5 and NO bands must
    // produce exactly the programmatic bands=16 result
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about spark catalyst optimizer internals"),
      (4L, "another unrelated document mentioning parquet and shuffle exchanges")
    ).toDF("doc_id", "text")
    val viaYaml = graft.core.OpCompiler.applyOp(docs,
      graft.core.PipelineConfig.parseOp(Map(
        "type" -> "text_processing",
        "params" -> java.util.Map.of("operation", "near_dedup", "threshold", "0.5"))))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val direct = Dedup.nearDedup(docs, "text", "doc_id",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaYaml == direct, s"derived-bands YAML run $viaYaml != bands=16 run $direct")
    assert(viaYaml.size < 4, "the near-dup pair must have collapsed")
  }

  test("rejects degenerate parameters") {
    intercept[IllegalArgumentException](Dedup.tuneLsh(spark, numHashes = 0, threshold = 0.5))
    intercept[IllegalArgumentException](Dedup.tuneLsh(spark, numHashes = 64, threshold = 1.0))
    intercept[IllegalArgumentException](Dedup.pickLshParams(64, 0.0))
  }
}
