package graft

import org.apache.spark.sql.functions._
import graft.vec.{Pq, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def clustered(n: Int, dim: Int, nClusters: Int): Seq[(Long, Seq[Float])] = {
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }
  }

  test("codebook is bit-deterministic across seeds, runs, and partitionings") {
    val df = clustered(300, 16, 8).toDF("vec_id", "embedding")
    val a = Pq.train(df.repartition(7), "embedding", "vec_id", m = 4, nbits = 4, seed = 5L)
    val b = Pq.train(df.repartition(2), "embedding", "vec_id", m = 4, nbits = 4, seed = 5L)
    assert(a.codebook.toSeq == b.codebook.toSeq, "partitioning must not leak into the codebook")
    val c = Pq.train(df, "embedding", "vec_id", m = 4, nbits = 4, seed = 6L)
    assert(a.codebook.toSeq != c.codebook.toSeq, "seed must matter")
  }

  test("encode picks the argmin centroid per subspace (driver differential)") {
    val df = clustered(200, 16, 6).toDF("vec_id", "embedding")
    val model = Pq.train(df, "embedding", "vec_id", m = 4, nbits = 4, seed = 1L)
    val got = Pq.encode(df, "embedding", model)
      .select("vec_id", "pq_code").as[(Long, Array[Byte])].collect().toMap
    // recompute on the driver from the same normalized vectors
    val unit = graft.vec.VectorOps.l2Normalize(df, "embedding", "u")
      .select("vec_id", "u").as[(Long, Seq[Double])].collect()
    unit.foreach { case (id, v) =>
      val expect = (0 until model.m).map { s =>
        (0 until model.ksub).minBy { c =>
          val base = (s * model.ksub + c) * model.ds
          (0 until model.ds).map { j =>
            val d = v(s * model.ds + j) - model.codebook(base + j); d * d
          }.sum
        }.toByte
      }
      assert(got(id).toSeq == expect, s"vec $id")
    }
  }

  test("ADC score == exact distance to the reconstructed vector") {
    val df = clustered(120, 16, 5).toDF("vec_id", "embedding")
    val model = Pq.train(df, "embedding", "vec_id", m = 4, nbits = 4, seed = 2L)
    val q = graft.vec.VectorOps.l2Normalize(df.limit(5), "embedding", "qu")
    val scored = Pq.encode(df, "embedding", model)
      .crossJoin(broadcast(q.select(col("vec_id").as("qid"), col("qu"))))
      .withColumn("lut", graft.expr.PqLut(col("qu"), model.codebook, model.m, model.ksub, model.ds))
      .withColumn("adc", graft.expr.PqAdcScore(col("pq_code"), col("lut"), model.ksub))
      .select("vec_id", "qid", "pq_code", "qu", "adc")
      .as[(Long, Long, Array[Byte], Seq[Double], Double)].collect()
    scored.foreach { case (_, _, code, qu, adc) =>
      val dec = model.decode(code)
      val exact = qu.indices.map { i => val d = qu(i) - dec(i); d * d }.sum
      assert(math.abs(adc - exact) < 1e-9, s"adc=$adc exact=$exact")
    }
  }

  test("reconstruction error shrinks as nbits grows") {
    val df = clustered(300, 16, 8).toDF("vec_id", "embedding")
    def meanErr(nbits: Int): Double = {
      val model = Pq.train(df, "embedding", "vec_id", m = 4, nbits = nbits, seed = 3L)
      val rows = Pq.encode(graft.vec.VectorOps.l2Normalize(df, "embedding", "u"),
          "u", model).select("u", "pq_code").as[(Seq[Double], Array[Byte])].collect()
      rows.map { case (v, code) =>
        val dec = model.decode(code)
        v.indices.map { i => val d = v(i) - dec(i); d * d }.sum
      }.sum / rows.length
    }
    val coarse = meanErr(2)
    val fine = meanErr(5)
    assert(fine < coarse * 0.7, s"nbits=5 err $fine must beat nbits=2 err $coarse")
  }

  test("malformed vectors get null codes and never rank — even in TRAINING input") {
    // dirty corpus fed straight to train AND search: a null vector, a
    // null-element vector, a wrong-dim vector, and a null id — none may
    // crash the driver sampler (NPE regression), corrupt the codebook
    // (zero-padding regression), or appear as a neighbor
    val good = clustered(60, 16, 3)
    val df = (good :+ (900L, Seq.fill(7)(0.1f)) :+ (901L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
      .unionByName(Seq((Some(902L), Seq[java.lang.Float](1f, null, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
        (None, Seq[java.lang.Float](1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)))
        .toDF("vec_id", "embedding"))
    val model = Pq.train(df, "embedding", "vec_id", m = 4, nbits = 3)
    assert(model.dim == 16, "majority dimension wins; the 7-dim straggler must not train")
    val codes = Pq.encode(df, "embedding", model)
    assert(codes.filter(col("vec_id").isin(900L, 901L, 902L) && col("pq_code").isNotNull).count() == 0,
      "wrong-dim, null, and null-element vectors must encode to null")
    val res = Pq.ivfPqTopK(df, "vec_id", "embedding",
      df.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, model, nlist = 4, nprobe = 4)
    assert(res.filter(col("neighbor_id") >= 900L).count() == 0,
      "malformed vectors must not appear as neighbors")
  }

  test("ADC refuses code bytes outside the model's centroid range") {
    // a code from an nbits=8 model scored against an nbits=3 LUT whose
    // total length happens to match would index past the table — must be
    // null, not a garbage distance that ranks
    val df = clustered(40, 16, 3).toDF("vec_id", "embedding")
    val model = Pq.train(df, "embedding", "vec_id", m = 4, nbits = 3) // ksub = 8
    val q = graft.vec.VectorOps.l2Normalize(df.limit(1), "embedding", "qu")
    val bad = q.select(lit(Array[Byte](0, 1, 120.toByte, 2)).as("code"),
      graft.expr.PqLut(col("qu"), model.codebook, model.m, model.ksub, model.ds).as("lut"))
    val out = bad.select(graft.expr.PqAdcScore(col("code"), col("lut"), model.ksub)).collect()
    assert(out(0).isNullAt(0), "out-of-range code byte (120 >= ksub=8) must score null")
  }

  test("ivfPqTopK recall vs bruteTopK stays high on clustered vectors") {
    val corpus = clustered(500, 32, 10).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    val model = Pq.train(corpus, "embedding", "vec_id", m = 8, nbits = 5, seed = 7L)
    val exact = Similarity.bruteTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Pq.ivfPqTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10, model, nlist = 8, nprobe = 3, rerank = 4)
    assertNoCartesian(approx)
    val got = approx.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF-PQ recall too low: $recall")
  }

  test("model save/load round-trips bit-exactly; new batches encode with the OLD model") {
    val df = clustered(100, 16, 5).toDF("vec_id", "embedding")
    val model = Pq.train(df, "embedding", "vec_id", m = 4, nbits = 4, seed = 9L)
    val path = java.nio.file.Files.createTempDirectory("pq_model").toString + "/m"
    Pq.saveModel(spark, model, path)
    val loaded = Pq.loadModel(spark, path)
    assert(loaded.m == model.m && loaded.ksub == model.ksub && loaded.ds == model.ds)
    assert(loaded.codebook.toSeq == model.codebook.toSeq, "codebook must round-trip bit-exactly")
    // a LATER batch encoded under the loaded model matches the original —
    // the property that makes a stored index appendable
    val batch2 = clustered(30, 16, 5).toDF("vec_id", "embedding")
    val a = Pq.encode(batch2, "embedding", model).select("vec_id", "pq_code")
      .as[(Long, Array[Byte])].collect().map { case (i, c) => i -> c.toSeq }.toMap
    val b = Pq.encode(batch2, "embedding", loaded).select("vec_id", "pq_code")
      .as[(Long, Array[Byte])].collect().map { case (i, c) => i -> c.toSeq }.toMap
    assert(a == b)
  }

  test("pq kernels: CODEGEN_ONLY and NO_CODEGEN agree bit-for-bit") {
    val df = clustered(50, 8, 4).toDF("vec_id", "embedding")
    val model = Pq.train(df, "embedding", "vec_id", m = 2, nbits = 3, seed = 4L)
    val q = graft.vec.VectorOps.l2Normalize(df.limit(3), "embedding", "qu")
      .select(col("vec_id").as("qid"), col("qu"))
    def run(): Seq[String] = Pq.encode(df, "embedding", model)
      .crossJoin(broadcast(q))
      .withColumn("lut", graft.expr.PqLut(col("qu"), model.codebook, model.m, model.ksub, model.ds))
      .withColumn("adc", graft.expr.PqAdcScore(col("pq_code"), col("lut"), model.ksub))
      .select(col("vec_id"), col("qid"), hex(col("pq_code")).as("code"), round(col("adc"), 9))
      .orderBy("vec_id", "qid").collect().map(_.toString).toSeq
    val conf = spark.conf
    val prev = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.wholeStage",
      "spark.sql.codegen.fallback").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.fallback", "false")
      val gen = run()
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = run()
      assert(gen == interp, s"codegen/interpreted divergence:\n$gen\n$interp")
    } finally prev.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
