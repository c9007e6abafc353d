package graft

import org.apache.spark.sql.functions._
import graft.vec.Similarity

/** Native vector kernels (graft.expr.VecExprs) vs their interpreted HOF
  * formulations — the expressions must be drop-in bit-compatible, since
  * q_ann_brute is oracle-hash-compared.
  */
class VecExprsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def vecF(n: Int): Seq[Float] = Seq.fill(n)(rnd.nextFloat() * 2 - 1)

  test("DotProduct / L2NormExpr match the double-HOF formulation bit-for-bit") {
    // Double arrays: identical accumulation order → bit equality required.
    // (Float arrays differ by design: the HOF multiplies in FLOAT precision,
    // the native kernel widens to double first — matching what a SQL oracle
    // computes; covered with a tolerance below.)
    val rows = (1 to 200).map(i => (i, vecF(64).map(_.toDouble), vecF(64).map(_.toDouble)))
    val df = rows.toDF("id", "a", "b")
    val hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val hofNorm = sqrt(aggregate(transform(col("a"), x => x * x), lit(0.0d), (acc, x) => acc + x))
    val out = df.select(
      graft.expr.DotProduct(col("a"), col("b")).as("nd"),
      hofDot.as("hd"),
      graft.expr.L2NormExpr(col("a")).as("nn"),
      hofNorm.as("hn")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"dot mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(r.getDouble(2) == r.getDouble(3), s"norm mismatch: ${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
  }

  test("DotProduct on float arrays agrees with the HOF within float tolerance") {
    val rows = (1 to 200).map(i => (i, vecF(64), vecF(64)))
    val df = rows.toDF("id", "a", "b")
    val hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val out = df.select(graft.expr.DotProduct(col("a"), col("b")).as("nd"), hofDot.as("hd")).collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-4))
  }

  test("DotProduct handles double arrays and null inputs") {
    val df = Seq(
      (1, Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (2, None: Option[Seq[Double]], Some(Seq(1.0)))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), graft.expr.DotProduct(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 32.0)
    assert(out(1).isNullAt(1))
  }

  test("null array ELEMENTS poison the result like the HOFs they replaced") {
    // zip_with/aggregate propagate a null element to a null sum — a
    // malformed vector must drop out of scoring, not contribute 0.0
    val df = Seq(
      (1, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (2, Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      graft.expr.DotProduct(col("a"), col("b")).as("d"),
      graft.expr.L2NormExpr(col("a")).as("n")).orderBy("id").collect()
    assert(out(0).isNullAt(1), "dot with null element must be null")
    assert(out(0).isNullAt(2), "norm with null element must be null")
    assert(out(1).getDouble(1) == 32.0)
    // HyperplaneSig: per-plane dot null → every sign test fails → all-zero bands
    val planes = Similarity.hyperplanes(3, 8, seed = 7L)
    val sigs = df.select(col("id"),
      graft.expr.HyperplaneSig(col("a"), planes, 2, 4).as("sig")).orderBy("id").collect()
    assert(sigs(0).getSeq[Int](1) == Seq(0, 0), "null element must hash to the zero bands")
    assert(sigs(1).getSeq[Int](1) != Seq(0, 0))
  }

  test("HyperplaneSig packs the same band hashes as per-plane sign bits") {
    val dim = 16; val bands = 4; val bitsPerBand = 4
    val planes = Similarity.hyperplanes(dim, bands * bitsPerBand, seed = 42L)
    val rows = (1 to 100).map(i => (i, vecF(dim)))
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"), graft.expr.HyperplaneSig(col("v"), planes, bands, bitsPerBand).as("sig"))
      .orderBy("id").collect().map(_.getSeq[Int](1))
    // reference: plain Scala computation of the same packing
    rows.zip(got).foreach { case ((_, v), sig) =>
      val expected = Array.fill(bands)(0)
      for (bit <- 0 until bands * bitsPerBand) {
        var acc = 0.0
        for (i <- 0 until dim) acc += v(i).toDouble * planes(bit)(i)
        if (acc >= 0) expected(bit / bitsPerBand) |= 1 << (bit % bitsPerBand)
      }
      assert(sig == expected.toSeq)
    }
  }

  test("vec kernels: CODEGEN_ONLY and NO_CODEGEN paths agree bit-for-bit") {
    // the kernels implement real doGenCode — prove the generated Java
    // compiles (CODEGEN_ONLY + fallback off would throw otherwise) and
    // matches the interpreted eval exactly, nulls and mismatches included
    val planes = Similarity.hyperplanes(4, 8, seed = 3L)
    val df = Seq(
      (1, Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0), Seq[java.lang.Double](4.0, 5.0, 6.0, 7.0)),
      (2, Seq[java.lang.Double](1.0, null, 3.0, 4.0), Seq[java.lang.Double](4.0, 5.0, 6.0, 7.0)),
      (3, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](4.0, 5.0, 6.0, 7.0)), // dim mismatch
      (4, null.asInstanceOf[Seq[java.lang.Double]], Seq[java.lang.Double](1.0, 1.0, 1.0, 1.0))
    ).toDF("id", "a", "b")
    def run(): Seq[String] = df.select(col("id"),
        graft.expr.DotProduct(col("a"), col("b")).as("d"),
        graft.expr.L2NormExpr(col("a")).as("n"),
        graft.expr.HyperplaneSig(col("a"), planes, 2, 4).as("sig"))
      .orderBy("id").collect().map(_.toString).toSeq
    val conf = spark.conf
    val prevMode = conf.getOption("spark.sql.codegen.factoryMode")
    val prevWsc = conf.getOption("spark.sql.codegen.wholeStage")
    val prevFb = conf.getOption("spark.sql.codegen.fallback")
    try {
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.fallback", "false")
      val gen = run()
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = run()
      assert(gen == interp, s"codegen/interpreted divergence:\n$gen\n$interp")
      assert(gen.head.contains("60.0")) // 1*4+2*5+3*6+4*7
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(conf.unset(k))(conf.set(k, _))
      restore("spark.sql.codegen.factoryMode", prevMode)
      restore("spark.sql.codegen.wholeStage", prevWsc)
      restore("spark.sql.codegen.fallback", prevFb)
    }
  }

  test("BoundedTopK rank tail == the window formulation, null placement and ties included") {
    import org.apache.spark.sql.expressions.Window
    // hostile candidate frame: null scores, null ids, exact score ties,
    // NaN scores, duplicate (query, score) rows, many partitions so the
    // partial heaps MERGE and the buffers round-trip serialization
    val rnd2 = new scala.util.Random(23)
    val rows = (0 until 2000).map { i =>
      val q = (i % 7).toLong
      val score: java.lang.Double = (i % 19) match {
        case 0 => null
        case 1 => Double.NaN
        case _ => math.round(rnd2.nextDouble() * 20) / 20.0 // coarse grid → frequent ties
      }
      val id: java.lang.Long = if (i % 23 == 0) null else (i % 400).toLong
      (q, id, score)
    }
    val cands = rows.toDF("query_id", "neighbor_id", "cos").repartition(13)
    for (desc <- Seq(true, false); k <- Seq(1, 5, 40)) {
      val order = if (desc) Seq(col("cos").desc, col("neighbor_id").asc)
        else Seq(col("cos").asc, col("neighbor_id").asc)
      val w = Window.partitionBy(col("query_id")).orderBy(order: _*)
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(r => (
        r.getLong(0),
        if (r.isNullAt(1)) null else Long.box(r.getLong(1)),
        if (r.isNullAt(2)) "null" else r.getDouble(2).toString)).sorted(Ordering.by {
          t: (Long, Any, String) => (t._1, String.valueOf(t._2), t._3) }).toSeq
      val windowed = canon(cands.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).select("query_id", "neighbor_id", "cos"))
      val bounded = canon(Similarity.topKPerQuery(cands, "cos", k, scoreDesc = desc))
      assert(bounded == windowed, s"desc=$desc k=$k:\nbounded=$bounded\nwindow=$windowed")
    }
    // string ids keep their type and native ordering through the aggregate
    val sCands = Seq((1L, "mmlu_002", 0.5), (1L, "mmlu_001", 0.5), (1L, "arc_9", 0.4))
      .toDF("query_id", "neighbor_id", "cos")
    val top = Similarity.topKPerQuery(sCands, "cos", 2).collect()
    assert(top.map(_.getString(1)).toSeq == Seq("mmlu_001", "mmlu_002"))
  }

  test("lshTopK recall vs bruteTopK stays high on clustered vectors") {
    // 10 tight clusters; queries are jittered cluster members — LSH must
    // recover most true neighbors through band collisions
    val centers = Array.fill(10)(Array.fill(32)(rnd.nextGaussian()))
    val corpus = (0 until 500).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = Similarity.bruteTopK(corpus, "vec_id", "embedding", queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(corpus, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 10, dim = 32, bands = 8, bitsPerBand = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall too low: $recall")
  }

  test("quantizeInt8 round-trips within half a quantization step") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 200).map { i =>
      (i.toLong, Seq.fill(32)((rnd.nextGaussian() * (i % 5 + 1)).toFloat))
    }.toDF("vec_id", "embedding")
    val q = graft.vec.VectorOps.quantizeInt8(df, "embedding")
      .select("vec_id", "embedding", "q_scale", "q")
      .as[(Long, Seq[Float], Double, Seq[Byte])].collect()
    q.foreach { case (_, v, scale, qs) =>
      assert(qs.length == v.length)
      assert(qs.forall(b => b >= -127 && b <= 127))
      val step = scale / 127.0
      v.zip(qs).foreach { case (x, b) =>
        val back = b * step
        assert(math.abs(back - x) <= step / 2 + 1e-12,
          s"x=$x back=$back step=$step")
      }
    }
    // zero vector → zero scale, all-zero codes (no division crash)
    val z = graft.vec.VectorOps.quantizeInt8(
      Seq((1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding"), "embedding")
      .select("q_scale", "q").as[(Double, Seq[Byte])].head()
    assert(z._1 == 0.0 && z._2.forall(_ == 0))
    // null elements stay null in place and don't poison the scale
    val withNull = spark.sql(
      "SELECT 1L AS vec_id, array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT), CAST(-2.0 AS FLOAT)) AS embedding")
    val n = graft.vec.VectorOps.quantizeInt8(withNull, "embedding")
      .select("q_scale", "q").as[(Double, Seq[Option[Byte]])].head()
    assert(n._1 == 2.0)
    assert(n._2 == Seq(Some(64.toByte), None, Some(-127.toByte)))
  }

  test("UnitizeExpr matches the HOF l2-normalize formulation bit-for-bit") {
    // the kernel replaced aggregate(Σx²)+transform(x/norm); identical
    // left-to-right accumulation order → exact equality is the contract
    // (q_semantic_dedup / q_pq_encode goldens are hash-pinned on it)
    val df = (1 to 200).map(i => (i.toLong, Seq.fill(48)(rnd.nextGaussian())))
      .toDF("id", "v")
    val hofNorm = sqrt(aggregate(col("v"), lit(0.0d), (acc, x) => acc + x * x))
    val hof = when(hofNorm === 0.0, col("v"))
      .otherwise(transform(col("v"), x => x / hofNorm))
    val out = df.select(
      graft.expr.UnitizeExpr(col("v"), dropIfAnyNull = false).as("n"),
      hof.as("h")).as[(Seq[Double], Seq[Double])].collect()
    out.foreach { case (n, h) => assert(n == h, "unitize diverged from the HOF chain") }
  }

  test("UnitizeExpr null policies: positional preserve vs whole-row drop") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(CAST(3.0 AS DOUBLE), NULL, CAST(4.0 AS DOUBLE))),
        |  (2L, array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE))),
        |  (3L, CAST(NULL AS ARRAY<DOUBLE>)) AS t(id, v)""".stripMargin)
    val out = df.select(col("id"),
        graft.expr.UnitizeExpr(col("v"), dropIfAnyNull = false).as("keep"),
        graft.expr.UnitizeExpr(col("v"), dropIfAnyNull = true).as("drop"))
      .orderBy("id").collect()
    // keep: nulls excluded from the norm (=5.0) and preserved in place
    assert(out(0).getSeq[Any](1) == Seq(0.6, null, 0.8))
    assert(out(0).isNullAt(2), "dropIfAnyNull must null the whole vector")
    // zero vector passes through under both policies
    assert(out(1).getSeq[Double](1) == Seq(0.0, 0.0, 0.0))
    assert(out(1).getSeq[Double](2) == Seq(0.0, 0.0, 0.0))
    // null input → null output (nullSafeEval)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("UnitizeExpr: CODEGEN_ONLY and NO_CODEGEN paths agree bit-for-bit") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(CAST(1.5 AS FLOAT), CAST(-2.5 AS FLOAT), CAST(0.25 AS FLOAT))),
        |  (2L, array(CAST(1.0 AS FLOAT), NULL, CAST(2.0 AS FLOAT))),
        |  (3L, array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))),
        |  (4L, CAST(NULL AS ARRAY<FLOAT>)) AS t(id, v)""".stripMargin)
    def run(): Seq[String] = df.select(col("id"),
        graft.expr.UnitizeExpr(col("v"), dropIfAnyNull = false).as("keep"),
        graft.expr.UnitizeExpr(col("v"), dropIfAnyNull = true).as("drop"))
      .orderBy("id").collect().map(_.toString).toSeq
    val conf = spark.conf
    val prevMode = conf.getOption("spark.sql.codegen.factoryMode")
    val prevWsc = conf.getOption("spark.sql.codegen.wholeStage")
    val prevFb = conf.getOption("spark.sql.codegen.fallback")
    try {
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.fallback", "false")
      val gen = run()
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = run()
      assert(gen == interp, s"codegen/interpreted divergence:\n$gen\n$interp")
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(conf.unset(k))(conf.set(k, _))
      restore("spark.sql.codegen.factoryMode", prevMode)
      restore("spark.sql.codegen.wholeStage", prevWsc)
      restore("spark.sql.codegen.fallback", prevFb)
    }
  }

  test("l2Normalize non-float element types keep working via the HOF fallback") {
    val df = spark.sql("SELECT 1L AS id, array(3, 4) AS v")
    val out = graft.vec.VectorOps.l2Normalize(df, "v", "unit")
      .select("unit").as[Seq[Double]].head()
    assert(out == Seq(0.6, 0.8))
  }

  test("l2Normalize yields unit vectors and leaves zero vectors zero") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 100).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val norms = graft.vec.VectorOps.l2Normalize(df, "embedding", "unit")
      .select(graft.vec.VectorOps.l2Norm(col("unit"))).as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
    val z = graft.vec.VectorOps.l2Normalize(
      Seq((1L, Seq(0f, 0f))).toDF("vec_id", "embedding"), "embedding", "unit")
      .select("unit").as[Seq[Double]].head()
    assert(z == Seq(0.0, 0.0))
  }

  test("meanPool: weighted positional mean, ragged groups, renorm; truncateRenorm prefix (round 12)") {
    import graft.vec.VectorOps
    // group a: weights 1 and 3 -> mean = (1*[2,0] + 3*[0,2]) / 4 = [0.5, 1.5]
    // group b: ragged dims -> pos 0 mean of both, pos 1 only from the 2-dim row
    val df = Seq(
      ("a", 1.0, Seq(2f, 0f)), ("a", 3.0, Seq(0f, 2f)),
      ("b", 1.0, Seq(4f)), ("b", 1.0, Seq(0f, 6f))
    ).toDF("g", "w", "v")
    val pooled = VectorOps.meanPool(df, Seq("g"), "v", weightCol = Some("w"))
      .orderBy("g").select("pooled").as[Seq[Double]].collect()
    assert(pooled(0) == Seq(0.5, 1.5))
    assert(pooled(1) == Seq(2.0, 6.0), "ragged: per-position means over present elements")
    // renorm lands on the unit sphere
    val unit = VectorOps.meanPool(df, Seq("g"), "v", weightCol = Some("w"), renorm = true)
      .filter($"g" === "a").select("pooled").as[Seq[Double]].head()
    val n = math.sqrt(unit.map(x => x * x).sum)
    assert(math.abs(n - 1.0) < 1e-12)
    // all-null positions emit a NULL element, never a compacted/shifted
    // array (the module's null-preserved-positionally convention)
    val nulls = Seq(
      ("n", 1.0, Seq[java.lang.Float](1f, null, 3f)),
      ("n", 1.0, Seq[java.lang.Float](3f, null, 5f))
    ).toDF("g", "w", "v")
    val pn = VectorOps.meanPool(nulls, Seq("g"), "v", weightCol = Some("w"))
      .select("pooled").as[Seq[Option[Double]]].head()
    assert(pn == Seq(Some(2.0), None, Some(4.0)),
      s"all-null position must stay null IN PLACE, got $pn")
    // truncateRenorm: prefix slice + unit norm; zero prefix stays zero
    val t2 = VectorOps.truncateRenorm(
        Seq((1L, Seq(3f, 4f, 100f)), (2L, Seq(0f, 0f, 5f))).toDF("id", "v"), "v", 2)
      .orderBy("id").select("trunc").as[Seq[Double]].collect()
    assert(t2(0) == Seq(0.6, 0.8))
    assert(t2(1) == Seq(0.0, 0.0), "zero prefix must not divide")
  }
}
