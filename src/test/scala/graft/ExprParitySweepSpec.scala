package graft

import java.io.File

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr._

/** Codegen/interpreted parity for EVERY expression in graft.expr, enumerated
  * by REFLECTION over the compiled classes dir (VERDICT r8 #8) — the class
  * list cannot go stale: a new kernel added to the package without a parity
  * entry here fails the sweep, and a future JVM/Spark bump that forks
  * interpreted vs codegen behavior for any kernel fails its comparison.
  *
  * Per-kernel SEMANTIC specs live in TextExprsSpec / VecExprsSpec / PqSpec /
  * ContaminationSpec; this suite only guarantees the two evaluation modes
  * agree on a hostile shared fixture (nulls, null elements, unicode, empty
  * arrays, ties).
  */
class ExprParitySweepSpec extends SparkSpec {
  import spark.implicits._

  /** Every concrete Expression class in the graft.expr package, from the
    * classes directory this suite itself runs against. */
  private def exprClassNames: Seq[String] = {
    val root = new File(
      classOf[PairCombos].getProtectionDomain.getCodeSource.getLocation.toURI)
    val pkg = new File(root, "graft/expr")
    assert(pkg.isDirectory, s"expected compiled package dir at $pkg")
    pkg.listFiles().toSeq.map(_.getName)
      .filter(n => n.endsWith(".class") && !n.contains("$"))
      .map(n => "graft.expr." + n.stripSuffix(".class"))
      .filter { n =>
        val c = Class.forName(n)
        classOf[org.apache.spark.sql.catalyst.expressions.Expression]
          .isAssignableFrom(c) &&
          !java.lang.reflect.Modifier.isAbstract(c.getModifiers)
      }
      .sorted
  }

  // ---- shared hostile fixtures (deterministic; no Random so the two mode
  // runs see identical data even if re-evaluated) ----

  private lazy val textDf: DataFrame = Seq(
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "caf\u00e9 \u00e9l\u00e8ve – ‹unicode› \u0421\u043b\u043e\u0432\u043e \u4f60\u597d \ud83d\ude00"),
    (2, "a &amp; b &lt;tag&gt; &#39;quoted&#x27; &nbsp;entity"),
    (3, ""),
    (4, null.asInstanceOf[String]),
    (5, "spam ham spam ham spam ham spam ham spam ham spam ham")
  ).toDF("id", "t")

  // multi-line fixture for the line kernels: duplicates, blanks,
  // space-only and tab-only lines, trailing newlines, unicode, null
  private lazy val lineDf: DataFrame = Seq(
    (0, "alpha\nbeta\nalpha\n\nbeta\ngamma"),
    (1, "x\n   \n\tx\nx\n   \ny y y\ny y y\n"),
    (2, "café 😀\ncafé 😀\nplain"),
    (3, ""),
    (4, null.asInstanceOf[String]),
    (5, "only one line")
  ).toDF("id", "t")

  private lazy val sigDf: DataFrame = Seq(
    (0, Seq[java.lang.Long](1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L),
        Seq[java.lang.Long](1L, 2L, 9L, 4L, 5L, 9L, 7L, 8L)),
    (1, Seq[java.lang.Long](5L, 3L, 5L, 1L, 2L, 2L, 8L, 6L),
        Seq[java.lang.Long](5L, 3L)),
    (2, Seq[java.lang.Long](1L, null, 3L, null, 5L, 6L, 7L, 8L),
        Seq[java.lang.Long](1L, null, 3L, null, 5L, 6L, 7L, 8L)),
    (3, Seq.empty[java.lang.Long], Seq[java.lang.Long](1L)),
    (4, null.asInstanceOf[Seq[java.lang.Long]], Seq[java.lang.Long](2L, 2L))
  ).toDF("id", "sa", "sb")

  private lazy val vecDf: DataFrame = Seq(
    (0, Seq[java.lang.Double](1.0, 2.0, -3.0, 0.5), Seq[java.lang.Double](0.5, -1.0, 2.0, 1.5)),
    (1, Seq[java.lang.Double](0.0, 0.0, 0.0, 0.0), Seq[java.lang.Double](1.0, 1.0, 1.0, 1.0)),
    (2, Seq[java.lang.Double](1.0, null, 3.0, 4.0), Seq[java.lang.Double](1.0, 2.0, null, 4.0)),
    (3, null.asInstanceOf[Seq[java.lang.Double]], Seq[java.lang.Double](2.0, 2.0, 2.0, 2.0)),
    (4, Seq[java.lang.Double](Double.NaN, 1.0, 1.0, 1.0), Seq[java.lang.Double](1.0, 1.0, 1.0, 1.0)),
    (5, Seq[java.lang.Double](-1.5, 2.5, 0.25, 8.0), Seq[java.lang.Double](4.0, -0.5, 1.0, 0.0))
  ).toDF("id", "a", "b")

  // grouped fixture for the aggregates: groups with ties, nulls, NaN, and a
  // group larger than k
  private lazy val aggDf: DataFrame = Seq(
    ("g1", 1L, 0.5), ("g1", 2L, 0.9), ("g1", 3L, 0.9), ("g1", 4L, 0.1),
    ("g1", 5L, Double.NaN), ("g2", 6L, 0.3), ("g2", 7L, 0.3),
    ("g3", 8L, 1.0), ("g3", 9L, -1.0), ("g3", 10L, 0.0), ("g3", 11L, 2.0),
    ("g3", 12L, -2.0), ("g3", 13L, 0.75)
  ).toDF("g", "rid", "score")

  private lazy val planes: Array[Array[Double]] = Array(
    Array(1.0, 0.0, -1.0, 0.5), Array(0.0, 1.0, 0.5, -1.0),
    Array(-1.0, 1.0, 0.0, 0.0), Array(0.5, 0.5, 0.5, 0.5),
    Array(1.0, -1.0, 1.0, -1.0), Array(0.0, 0.0, 1.0, 1.0),
    Array(2.0, 0.0, 0.0, -1.0), Array(-0.5, 1.5, -1.0, 0.25))

  // tiny PQ geometry: dim 4 = m(2) * ds(2), ksub 2 → codebook m*ksub*ds = 8
  private lazy val pqCodebook: Array[Double] =
    Array(0.0, 0.0, 1.0, 1.0, -1.0, 0.5, 2.0, -2.0)

  private lazy val evalIdx = new EvalIndex(
    Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
      Array(0.5, 0.5, 0.5, 0.5)),
    Array(1.0, 1.0, 1.0),
    Array[Any](10L, 11L, 12L),
    org.apache.spark.sql.types.LongType)

  /** One deterministic invocation per kernel, keyed by FQCN. Output must be
    * order-stable (orderBy id / g) so the two mode runs compare equal. */
  private lazy val coverage: Map[String, () => Seq[String]] = {
    def run(df: DataFrame, order: String, cols: Column*): Seq[String] =
      df.select((col(order) +: cols): _*).orderBy(order).collect().map(_.toString).toSeq
    def sig(c: Column) = MinHashSig(WordShingles(c, 2), 16)
    Map(
      "graft.expr.DeflateRatio" -> (() => run(textDf, "id", DeflateRatio(col("t")))),
      "graft.expr.HtmlEntityDecode" -> (() => run(textDf, "id", HtmlEntityDecode(col("t")))),
      "graft.expr.TextCharStats" -> (() => run(textDf, "id", TextCharStats(col("t")))),
      "graft.expr.ScriptCounts" -> (() => run(textDf, "id", ScriptCounts(col("t")))),
      "graft.expr.UnicodeNormalize" -> (() => run(textDf, "id",
        UnicodeNormalize(col("t"), "NFC"), UnicodeNormalize(col("t"), "NFKC"))),
      "graft.expr.WordSetCount" -> (() => run(textDf, "id",
        WordSetCount(col("t"), graft.text.TextLib.EnglishStopwords))),
      "graft.expr.WordSetCounts" -> (() => run(textDf, "id",
        WordSetCounts(col("t"), graft.text.TextLib.Markers.map(_._2)))),
      "graft.expr.WordShingles" -> (() => run(textDf, "id", WordShingles(col("t"), 2))),
      "graft.expr.WordGramHashes" -> (() => run(textDf, "id", WordGramHashes(col("t"), 2))),
      "graft.expr.CharGrams" -> (() => run(textDf, "id", CharGrams(col("t"), 3))),
      "graft.expr.WordGrams" -> (() => run(textDf, "id", WordGrams(col("t"), 2))),
      "graft.expr.TokenPairs" -> (() => run(textDf, "id", TokenPairs(col("t")))),
      "graft.expr.LineDedup" -> (() => run(lineDf, "id",
        LineDedup(col("t"), 1), LineDedup(col("t"), 0), LineDedup(col("t"), 5))),
      "graft.expr.LineRepStats" -> (() => run(lineDf, "id", LineRepStats(col("t")))),
      "graft.expr.TokenEntropy" -> (() => run(textDf, "id",
        // both modes call the same entropy body with insertions in array
        // order, so the map iteration — and the float sum — is identical
        TokenEntropy(split(col("t"), " ")),
        TokenEntropy(split(lit(null).cast("string"), " ")))),
      "graft.expr.WinnowMins" -> (() => run(textDf, "id",
        WinnowMins(WordGramHashes(col("t"), 2), 3))),
      "graft.expr.MinHashSig" -> (() => run(textDf, "id", sig(col("t")))),
      "graft.expr.LshBands" -> (() => run(textDf, "id", LshBands(sig(col("t")), 4, 4))),
      "graft.expr.SigAgree" -> (() => run(sigDf, "id", SigAgree(col("sa"), col("sb")))),
      "graft.expr.VocabLogProbMean" -> (() => {
        val lm = LmVocab(
          Seq("the" -> -1.5, "fox" -> -3.25, "spam" -> -0.5, "café" -> -2.0),
          -9.75)
        run(textDf, "id",
          VocabLogProbMean(filter(split(lower(col("t")), " "), x => x =!= ""), lm))
      }),
      "graft.expr.BigramLogProbMean" -> (() => {
        val lm = BigramLm(
          Seq("the" -> 4L, "fox" -> 2L, "spam" -> 6L, "café" -> 1L),
          Seq(("the", "fox", 2L, 4L), ("spam", "spam", 3L, 6L)),
          20.0)
        run(textDf, "id", BigramLogProbMean(col("t"), lm))
      }),
      "graft.expr.DropTokenPositions" -> (() => run(textDf, "id",
        DropTokenPositions(WordGrams(col("t"), 1),
          typedlit(Seq(1L, 3L, 99L))),
        DropTokenPositions(WordGrams(col("t"), 1),
          typedlit(Seq.empty[Long])))),
      "graft.expr.GramRepStats" -> (() => run(textDf, "id",
        GramRepStats(col("t"), 2, 5), GramRepStats(col("t"), 1, 2),
        GramRepStats(col("t"), 3, 3))),
      "graft.expr.LangBestScore" -> (() => {
        // two languages with overlapping vocab + distinct floors; ties on
        // the rounded score exercise the lexicographically-LAST election
        val mlm = MultiLmVocab(
          Seq("en", "fr"),
          Seq(
            LmVocab(Seq("the" -> -1.5, "fox" -> -3.25, "spam" -> -0.5), -9.75),
            LmVocab(Seq("café" -> -1.0, "the" -> -2.5, "spam" -> -0.5), -8.5)))
        run(textDf, "id",
          LangBestScore(filter(split(lower(col("t")), " "), x => x =!= ""), mlm, 6))
      }),
      "graft.expr.BucketWeightSum" -> (() => {
        val w = new DsirWeights(16, Array.tabulate(16)(i => (i - 8) * 0.125))
        run(sigDf, "id", BucketWeightSum(col("sa"), w))
      }),
      "graft.expr.PairCombos" -> (() => run(sigDf, "id",
        PairCombos(col("sa"), normalize = true), PairCombos(col("sa"), normalize = false))),
      "graft.expr.DotProduct" -> (() => run(vecDf, "id", DotProduct(col("a"), col("b")))),
      "graft.expr.L2NormExpr" -> (() => run(vecDf, "id", L2NormExpr(col("a")))),
      "graft.expr.UnitizeExpr" -> (() => run(vecDf, "id",
        UnitizeExpr(col("a"), dropIfAnyNull = false), UnitizeExpr(col("a"), dropIfAnyNull = true))),
      "graft.expr.HyperplaneSig" -> (() => run(vecDf, "id",
        HyperplaneSig(col("a"), planes, 2, 4))),
      "graft.expr.MaxCosAgainst" -> (() => run(vecDf, "id", MaxCosAgainst(col("a"), evalIdx))),
      "graft.expr.PqEncode" -> (() => run(vecDf, "id",
        hex(PqEncode(col("a"), pqCodebook, 2, 2, 2)))), // binary → hex: Row.toString prints Array identity
      "graft.expr.PqLut" -> (() => run(vecDf, "id", PqLut(col("a"), pqCodebook, 2, 2, 2))),
      "graft.expr.PqAdcScore" -> (() => run(
        vecDf.select(col("id"), PqEncode(col("a"), pqCodebook, 2, 2, 2).as("code"),
          PqLut(col("b"), pqCodebook, 2, 2, 2).as("lut")),
        "id", PqAdcScore(col("code"), col("lut"), 2))),
      "graft.expr.BoundedMinList" -> (() =>
        aggDf.groupBy("g").agg(BoundedMinList(col("rid"), 3).as("v"))
          .orderBy("g").collect().map(_.toString).toSeq),
      "graft.expr.BoundedTopK" -> (() =>
        aggDf.groupBy("g").agg(
            BoundedTopK(col("score"), col("rid"), 3, scoreDesc = true).as("d"),
            BoundedTopK(col("score"), col("rid"), 3, scoreDesc = false).as("a"))
          .orderBy("g").collect().map(_.toString).toSeq),
      "graft.expr.ExactPercentile" -> (() =>
        aggDf.groupBy("g").agg(ExactPercentile(col("score"), 0.5).as("p"))
          .orderBy("g").collect().map(_.toString).toSeq)
    )
  }

  test("every graft.expr Expression has a parity entry (reflection sweep)") {
    val classes = exprClassNames
    assert(classes.nonEmpty, "reflection found no expression classes — broken sweep")
    val missing = classes.filterNot(coverage.contains)
    assert(missing.isEmpty,
      s"kernels without a codegen/interpreted parity entry: ${missing.mkString(", ")} — " +
        "add an invocation to ExprParitySweepSpec.coverage")
    val stale = coverage.keys.filterNot(classes.contains)
    assert(stale.isEmpty, s"coverage entries for deleted kernels: ${stale.mkString(", ")}")
    // negative paths (round 10): both directions must fail when their
    // precondition flips — dropping a real entry is caught, and a
    // coverage key for a non-existent kernel is caught
    assert(classes.filterNot((coverage - classes.head).contains).nonEmpty,
      "missing-entry detection is dead: removing a real entry went unnoticed")
    assert((coverage.keySet + "graft.expr.NoSuchKernel").filterNot(classes.contains).nonEmpty,
      "stale-entry detection is dead: a fabricated kernel key went unnoticed")
  }

  test("kernel type misuse fails at ANALYSIS time, not inside the operator (ADVICE r8)") {
    import org.apache.spark.sql.AnalysisException
    // string where array<long> is required
    intercept[AnalysisException] {
      textDf.select(PairCombos(col("t"), normalize = true)).collect()
    }
    // array<string> where array<long> is required
    intercept[AnalysisException] {
      textDf.select(LshBands(split(col("t"), " "), 4, 4)).collect()
    }
    // non-double score in the top-k aggregate (used from seven call sites —
    // a MatchError at runtime was the failure mode this guards)
    intercept[AnalysisException] {
      aggDf.groupBy("g").agg(BoundedTopK(col("g"), col("rid"), 3, scoreDesc = true)).collect()
    }
  }

  test("CODEGEN_ONLY == NO_CODEGEN for every kernel in the package") {
    val conf = spark.conf
    val keys = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.wholeStage",
      "spark.sql.codegen.fallback")
    val prev = keys.map(k => k -> conf.getOption(k))
    def all(): Map[String, Seq[String]] =
      coverage.map { case (k, f) => k -> f() }
    try {
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      conf.set("spark.sql.codegen.wholeStage", "true")
      conf.set("spark.sql.codegen.fallback", "false")
      val gen = all()
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = all()
      for (k <- coverage.keys.toSeq.sorted)
        assert(gen(k) == interp(k),
          s"codegen/interpreted divergence in $k:\n${gen(k)}\n${interp(k)}")
    } finally prev.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
