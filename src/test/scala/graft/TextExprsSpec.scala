package graft

import org.apache.spark.sql.functions._
import graft.text.TextLib

/** Native text kernels vs the expression formulations they replaced —
  * q_text_quality / q_lang_id are oracle-hash-compared, so the integers
  * must be identical on arbitrary input (including unicode and astral
  * chars, where code-point vs UTF-16 counting diverges if done wrong).
  */
class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "The quick brown fox, it JUMPED! Over 42 lazy dogs?",
    "",
    "   ",
    "\t\nmixed\r\nwhitespace runs  here ",
    "no-punct no-digit no-upper",
    "ALL CAPS AND 123 AND ...!!!???",
    "unicode: café naïve 你好 😀 end",
    "'quoted' \"double\" ; colon: semi;",
    "a",
    "one two",
    "\u0001the cat sat", // control char must stay glued to its token
    "\u0002 the cat",    // control char as its own token
    "ab\u000Bcd ef",     // vertical tab IS whitespace per Java \s (RE2/DuckDB \s differs - documented caveat)
    "der die das und ist nicht ein",
    "le chat est dans la maison avec le chien"
  )

  test("GraftExtensions injects the SQL functions the extensions path registers") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.expr.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftColumnBridge.applyFunctionInjections(ext, spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_l2norm(array(3.0d, 4.0d)) AS n,
        |       size(graft_word_shingles('a b c d', 3)) AS k,
        |       size(graft_minhash_sig(graft_word_shingles('a b c d', 2), 16)) AS m,
        |       graft_text_char_stats('Ab 12!').n_tokens AS t,
        |       graft_script_counts('a я 你').n_cyrillic AS c,
        |       size(graft_winnow_mins(graft_word_gram_hashes('a b c d e', 2), 3)) AS w
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getInt(2) == 2)
    assert(r.getInt(3) == 16)
    assert(r.getInt(4) == 2)
    assert(r.getInt(5) == 1)
    assert(r.getInt(6) >= 1 && r.getInt(6) <= 2) // 4 grams, 2 windows, distinct minima
  }

  test("graft_winnow_mins rejects null array elements with a clear message (SQL path)") {
    // the SQL function bypasses WordGramHashes' non-null contract — an
    // arbitrary array<bigint> with nulls must fail loudly, not NPE (ADVICE r4)
    graft.expr.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_winnow_mins(array(1L, CAST(NULL AS BIGINT), 3L), 2)").collect()
    }
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.toString
    assert(msg.contains("contains NULL"), s"wanted the explicit null-element error, got: $e")
  }

  test("UnicodeNormalize matches java.text.Normalizer and is idempotent") {
    val samples = Seq(
      "cafe\u0301",     // DEcomposed e + combining acute -> NFC composes
      "Å",              // ANGSTROM SIGN -> Å (singleton)
      "already composed é",
      "",
      "plain ascii text",
      "\uFB01le"        // fi ligature: NFC keeps, NFKC expands to 'fi'
    )
    val df = samples.zipWithIndex.map(_.swap).toDF("id", "t")
    Seq("NFC", "NFD", "NFKC", "NFKD").foreach { form =>
      val got = df.select(col("id"), graft.text.TextLib.normalizeUnicode(col("t"), form).as("n"))
        .orderBy("id").collect().map(_.getString(1))
      samples.zip(got).foreach { case (raw, n) =>
        assert(n == java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.valueOf(form)),
          s"$form mismatch on ${raw.codePoints().toArray.toSeq}")
        // idempotence: normalize(normalize(x)) == normalize(x)
        assert(java.text.Normalizer.normalize(n, java.text.Normalizer.Form.valueOf(form)) == n)
      }
    }
    // null propagates; invalid form rejected at Column construction
    val nn = Seq((1, null: String)).toDF("id", "t")
      .select(graft.text.TextLib.normalizeUnicode(col("t")).as("n")).collect()
    assert(nn(0).isNullAt(0))
    intercept[IllegalArgumentException] {
      graft.text.TextLib.normalizeUnicode(col("t"), "NFX")
    }
    // SQL path through the registered function (Spark's chr() is mod-256
    // ASCII — unlike DuckDB's — so embed the combining char directly)
    graft.expr.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT length(graft_unicode_normalize('cafe\u0301')) AS l")
      .collect()(0).getInt(0)
    assert(viaSql == 4)
    // the SQL path must reject a bad form at ANALYSIS time with the clear
    // message, not throw from executor tasks at first evaluation
    val bad = intercept[Exception] {
      spark.sql("SELECT graft_unicode_normalize('x', 'nfc')").collect()
    }
    assert(bad.getMessage.contains("Unicode form must be one of"),
      s"unexpected error: ${bad.getMessage}")
  }

  test("TextCharStats fields match the regex/HOF formulations exactly") {
    val df = samples.zipWithIndex.map(_.swap).toDF("id", "t")
    val t = col("t")
    val words = split(trim(t), "\\s+")
    val out = df.select(
      graft.expr.TextCharStats(t).as("st"),
      length(t).as("e_chars"),
      size(regexp_extract_all(t, lit("[\\.,;:!\\?'\"]"), lit(0))).as("e_punct"),
      size(regexp_extract_all(t, lit("[0-9]"), lit(0))).as("e_digit"),
      size(regexp_extract_all(t, lit("[A-Z]"), lit(0))).as("e_upper"),
      aggregate(words, lit(0), (acc, x) => acc + length(x)).as("e_nonws"),
      // run-count spec: tokens = non-empty elements of the \s+ split
      size(filter(split(t, "\\s+"), x => x =!= "")).as("e_tokens")).collect()
    out.foreach { r =>
      val st = r.getStruct(0)
      assert(st.getInt(0) == r.getInt(1), s"n_chars: ${st.getInt(0)} vs ${r.getInt(1)}")
      assert(st.getInt(1) == r.getInt(2), s"n_punct: ${st.getInt(1)} vs ${r.getInt(2)}")
      assert(st.getInt(2) == r.getInt(3), s"n_digit: ${st.getInt(2)} vs ${r.getInt(3)}")
      assert(st.getInt(3) == r.getInt(4), s"n_upper: ${st.getInt(3)} vs ${r.getInt(4)}")
      assert(st.getInt(4) == r.getInt(5), s"n_nonws: ${st.getInt(4)} vs ${r.getInt(5)}")
      assert(st.getInt(5) == r.getInt(6), s"n_tokens: ${st.getInt(5)} vs ${r.getInt(6)}")
    }
  }

  test("WordSetCount / WordSetCounts match the filter-isin HOF") {
    val stops = TextLib.EnglishStopwords
    val markers = TextLib.Markers
    val df = samples.zipWithIndex.map(_.swap).toDF("id", "t")
    val t = col("t")
    val words = split(trim(t), "\\s+")
    val hof = size(filter(transform(words, x => lower(x)), x => x.isin(stops: _*)))
    // guard the [""]-token edge: HOF counts tokens of the trimmed text, so
    // empty/whitespace-only text yields one "" token that matches nothing
    val out = df.select(
      graft.expr.WordSetCount(t, stops).as("n"),
      hof.as("e"),
      graft.expr.WordSetCounts(t, markers.map(_._2)).as("ns")).collect()
    out.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"WordSetCount: ${r.getInt(0)} vs ${r.getInt(1)}")
    }
    // multi-set result equals per-set single calls
    val multi = df.select(graft.expr.WordSetCounts(t, markers.map(_._2)).as("ns")).collect()
      .map(_.getSeq[Int](0))
    val singles = markers.map { case (_, s) =>
      df.select(graft.expr.WordSetCount(t, s)).collect().map(_.getInt(0))
    }
    multi.zipWithIndex.foreach { case (arr, row) =>
      markers.indices.foreach { k =>
        assert(arr(k) == singles(k)(row), s"set $k row $row: ${arr(k)} vs ${singles(k)(row)}")
      }
    }
  }

  test("ScriptCounts pins the classification precedence, hand-computed") {
    // 15 code points: ws(5: 4 spaces + tab), digits(2: ASCII only),
    // latin(3: a b z), han(1), cyrillic(1), arabic(2: م and ٣ — the
    // ARABIC-INDIC digit is script Arabic, NOT an ASCII digit), other(1: €)
    val s = "ab я 你 ٣م 12\tz€"
    val out = Seq(Tuple1(s)).toDF("t")
      .select(graft.expr.ScriptCounts(col("t")).as("sc")).collect()(0).getStruct(0)
    assert(out.getInt(0) == 15, "n_chars")
    assert(out.getInt(1) == 5, "n_ws")
    assert(out.getInt(2) == 2, "n_digit")
    assert(out.getInt(3) == 3, "n_latin")
    assert(out.getInt(4) == 1, "n_han")
    assert(out.getInt(5) == 1, "n_cyrillic")
    assert(out.getInt(6) == 2, "n_arabic")
    assert(out.getInt(7) == 1, "n_other")
    // astral CJK (U+20000, surrogate pair) counts once, as Han
    val astral = Seq(Tuple1(new String(Character.toChars(0x20000)))).toDF("t")
      .select(graft.expr.ScriptCounts(col("t")).as("sc")).collect()(0).getStruct(0)
    assert(astral.getInt(0) == 1 && astral.getInt(4) == 1)
  }

  test("WordGramHashes matches the HOF gram-hash formulation bit-for-bit") {
    val df = samples.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    val ws = filter(split(TextLib.normalized(col("t")), " "), x => x =!= "")
    val k = 3
    val hof = when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => xxhash64(concat_ws(" ", slice(ws, i, lit(k))))))
      .otherwise(array().cast("array<bigint>"))
    val out = df.select(col("id"),
        graft.expr.WordGramHashes(col("t"), k).as("native"), hof.as("hof"))
      .orderBy("id").collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"row ${r.getInt(0)}: ${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
    }
  }

  test("CharGrams matches the HOF substring formulation bit-for-bit (round 11)") {
    // the lang-ID gram stream is oracle-hash-compared, so the native
    // kernel must agree with the interpreted chain on every sample —
    // including the astral 😀 row, where a UTF-16-char window would
    // split the surrogate pair that code-point counting keeps whole
    val df = samples.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    Seq(1, 2, 3, 5).foreach { n =>
      val out = df.select(col("id"), TextLib.normalized(col("t")).as("norm"))
        .select(col("id"),
          graft.expr.CharGrams(col("norm"), n).as("native"),
          TextLib.charGramArrayHof(col("norm"), n).as("hof"))
        .orderBy("id").collect()
      out.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n row ${r.getInt(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
  }

  test("WordGrams matches the HOF word-gram formulation bit-for-bit (round 11)") {
    val df = samples.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    Seq(1, 2, 5).foreach { n =>
      val ws = filter(split(TextLib.normalized(col("t")), " "), x => x =!= "")
      val hof = when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
      val out = df.select(col("id"),
          graft.expr.WordGrams(col("t"), n).as("native"), hof.as("hof"))
        .orderBy("id").collect()
      out.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n row ${r.getInt(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
  }

  test("TokenPairs matches the HOF transform/element_at formulation bit-for-bit (round 11)") {
    val df = samples.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    val ws = filter(split(TextLib.normalized(col("t")), " "), x => x =!= "")
    val hofDf = df.select(col("id"), ws.as("__ts"))
      .select(col("id"), explode(transform(col("__ts"), (t, i) =>
        struct(when(i === 0, lit(null).cast("string"))
                 .otherwise(element_at(col("__ts"), i)).as("prev"),
               t.as("cur")))).as("p"))
      .select(col("id"), col("p.prev"), col("p.cur"))
      .collect().map(_.toString).sorted.toSeq
    val nativeDf = df.select(col("id"), explode(graft.expr.TokenPairs(col("t"))).as("p"))
      .select(col("id"), col("p.prev"), col("p.cur"))
      .collect().map(_.toString).sorted.toSeq
    assert(nativeDf == hofDf, s"native=$nativeDf\nhof=$hofDf")
  }

  test("PairCombos matches the nested-transform expansion, both modes") {
    val rows = Seq(
      (0, Seq(1L, 2L, 3L, 4L)),
      (1, Seq(5L, 3L, 5L, 1L)),   // duplicates + unsorted (normalize folds/skips)
      (2, Seq(7L)),
      (3, Seq.empty[Long]),
      (4, Seq(2L, 2L)),
      (5, (1L to 40L).toSeq)
    ).toDF("id", "ids")
    // the HOF formulations PairCombos replaced, verbatim
    val hofNorm = filter(flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))),
        y => struct(least(x, y).as("id_a"), greatest(x, y).as("id_b"))))),
      p => p.getField("id_a") < p.getField("id_b"))
    val hofPlain = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))),
        y => struct(x.as("id_a"), y.as("id_b")))))
    val out = rows.select(col("id"),
        graft.expr.PairCombos(col("ids"), normalize = true).as("nn"), hofNorm.as("hn"),
        graft.expr.PairCombos(col("ids"), normalize = false).as("np"), hofPlain.as("hp"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"normalize mismatch at id ${r.getInt(0)}")
      assert(r.getSeq[Any](3) == r.getSeq[Any](4), s"plain mismatch at id ${r.getInt(0)}")
    }
  }

  test("SigAgree matches the zip_with overlap formulation on hostile arrays") {
    // null arrays, mismatched lengths (zip_with pads with nulls — padded
    // positions never count), null elements on either side, full/zero/
    // partial agreement
    val rows = Seq(
      (0, Seq[java.lang.Long](1L, 2L, 3L, 4L), Seq[java.lang.Long](1L, 2L, 3L, 4L)),
      (1, Seq[java.lang.Long](1L, 2L, 3L, 4L), Seq[java.lang.Long](9L, 2L, 9L, 4L)),
      (2, Seq[java.lang.Long](1L, 2L, 3L, 4L), Seq[java.lang.Long](5L, 6L, 7L, 8L)),
      (3, Seq[java.lang.Long](1L, 2L, 3L, 4L), Seq[java.lang.Long](1L, 2L)),
      (4, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L, 4L)),
      (5, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (6, null, Seq[java.lang.Long](1L, 2L)),
      (7, Seq[java.lang.Long](1L, 2L), null),
      (8, Seq.empty[java.lang.Long], Seq[java.lang.Long](1L))
    ).toDF("id", "a", "b")
    val hof = size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), m => m))
    val out = rows.select(col("id"), graft.expr.SigAgree(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    out.foreach { r =>
      val n = if (r.isNullAt(1)) null else Int.box(r.getInt(1))
      val h = if (r.isNullAt(2)) null else Int.box(r.getInt(2))
      assert(n == h, s"row ${r.getInt(0)}: native=$n hof=$h")
    }
  }

  test("LshBands: bucket membership equals the sub-signature equality structure") {
    // The native band kernel replaced a concat_ws/xxhash64 HOF — bucket
    // VALUES changed, but two rows must share a (band, h) bucket iff their
    // band sub-signatures are equal. Pin that against the signature slices.
    val df = (samples ++ samples.take(4) :+ null.asInstanceOf[String]) // dup texts → guaranteed collisions
      .zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    val bands = 4; val rpb = 4
    val sig = graft.expr.MinHashSig(graft.expr.WordShingles(col("t"), 2), bands * rpb)
    val rows = df.select(col("id"), sig.as("sig"),
        graft.expr.LshBands(sig, bands, rpb).as("bh"))
      .collect().filter(!_.isNullAt(1))
      .map(r => (r.getSeq[Long](1), r.getSeq[org.apache.spark.sql.Row](2)))
    assert(rows.nonEmpty && rows.forall(_._2.length == bands))
    for (((sa, ba), i) <- rows.zipWithIndex; ((sb, bb), j) <- rows.zipWithIndex if i < j;
         b <- 0 until bands) {
      val subEq = sa.slice(b * rpb, (b + 1) * rpb) == sb.slice(b * rpb, (b + 1) * rpb)
      val bucketEq = ba(b).getLong(1) == bb(b).getLong(1)
      assert(subEq == bucketEq, s"rows $i,$j band $b: subsigEq=$subEq bucketEq=$bucketEq")
      assert(ba(b).getInt(0) == b && bb(b).getInt(0) == b)
    }
  }

  test("text kernels: CODEGEN_ONLY and NO_CODEGEN paths agree exactly") {
    // the string kernels emit a reference-call doGenCode — prove the
    // generated Java compiles (CODEGEN_ONLY + fallback off throws
    // otherwise) and matches interpreted eval on the dirty sample set
    val df = (samples :+ null.asInstanceOf[String]).zipWithIndex
      .map { case (t, i) => (i, t) }.toDF("id", "t")
    def run(): Seq[String] = df.select(col("id"),
        graft.expr.TextCharStats(col("t")).as("tcs"),
        graft.expr.WordSetCount(col("t"), TextLib.EnglishStopwords).as("wsc"),
        graft.expr.WordSetCounts(col("t"), TextLib.Markers.map(_._2)).as("wscs"),
        graft.expr.WordShingles(col("t"), 2).as("sh"),
        graft.expr.MinHashSig(graft.expr.WordShingles(col("t"), 2), 16).as("mh"),
        graft.expr.UnicodeNormalize(col("t"), "NFC").as("nfc"),
        graft.expr.ScriptCounts(col("t")).as("sc"),
        graft.expr.WinnowMins(graft.expr.WordGramHashes(col("t"), 2), 3).as("wm"),
        graft.expr.LshBands(
          graft.expr.MinHashSig(graft.expr.WordShingles(col("t"), 2), 16), 4, 4).as("lb"),
        graft.expr.SigAgree(
          graft.expr.MinHashSig(graft.expr.WordShingles(col("t"), 2), 16),
          graft.expr.MinHashSig(graft.expr.WordShingles(upper(col("t")), 2), 16)).as("sa"),
        graft.expr.DeflateRatio(col("t")).as("dr"))
      .orderBy("id").collect().map(_.toString).toSeq
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

  test("deflate ratio: repetitive < prose < random noise, null/empty edges") {
    val prose = "The quick brown fox jumps over the lazy dog while seventeen " +
      "sailors argue about the relative merits of tea and coffee at dawn."
    val repetitive = "spam ham " * 40
    val rng = new scala.util.Random(7)
    val noise = Array.fill(260)((33 + rng.nextInt(94)).toChar).mkString
    val df = Seq((1, repetitive), (2, prose), (3, noise), (4, ""), (5, null))
      .toDF("id", "t")
      .select(col("id"), graft.expr.DeflateRatio(col("t")).as("r"))
      .orderBy("id").collect()
    val Seq(rep, pro, noi) = (0 to 2).map(df(_).getDouble(1))
    assert(rep < pro && pro < noi, s"ordering law violated: $rep, $pro, $noi")
    assert(rep < 0.2, s"templated text should collapse, got $rep")
    assert(noi > 0.8, s"uniform printable noise should not compress, got $noi")
    assert(df(3).getDouble(1) == 0.0, "empty string pinned to 0.0")
    assert(df(4).isNullAt(1), "null propagates")
    // row-local determinism: same value from a different partitioning
    val again = Seq((1, repetitive)).toDF("id", "t").repartition(3)
      .select(graft.expr.DeflateRatio(col("t"))).collect()(0).getDouble(0)
    assert(again == rep)
  }

  test("readability: hand-computed Flesch, sentence floor, wordless text nulls") {
    val docs = Seq(
      (1L, "Hello world. The cat sat!"),
      (2L, "no terminal punctuation here"),
      (3L, ""), (4L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val m = graft.text.TextLib.readability(docs, "t")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(r.fieldIndex("rd_words"))), Option(r.get(r.fieldIndex("rd_sentences"))),
          Option(r.get(r.fieldIndex("rd_syllables"))), Option(r.get(r.fieldIndex("flesch"))))).toMap
    // doc 1: 5 words, 2 sentences, syllables hello=2 world=1 the=1 cat=1 sat=1 → 6
    assert(m(1L)._1.contains(5L) && m(1L)._2.contains(2L) && m(1L)._3.contains(6L))
    val expected = 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (6.0 / 5.0)
    assert(math.abs(m(1L)._4.get.asInstanceOf[Double] - expected) < 1e-12)
    // doc 2: zero [.!?] runs → sentence floor 1
    assert(m(2L)._2.contains(1L))
    // wordless text: counts 0/null, flesch null
    assert(m(3L)._1.contains(0L) && m(3L)._4.isEmpty)
    assert(m(4L)._4.isEmpty)
  }

  test("keywordInContext: positions, edge clamps, case-folding, multi-hit docs") {
    val docs = Seq(
      (1L, "Spark at the start and spark at the end spark"),
      (2L, "no match here"),
      (3L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = graft.text.TextLib.keywordInContext(docs, "t", "id", "spark", 3)
      .orderBy("id", "position")
      .select($"id", $"position", $"left_context", $"keyword", $"right_context")
      .as[(Long, Int, String, String, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1, "", "spark", "at the start"),          // doc-start clamp: empty left
      (1L, 6, "the start and", "spark", "at the end"),
      (1L, 10, "at the end", "spark", "")))          // doc-end clamp: empty right
  }

  // ---- round-12 line kernels (VERDICT r11 #1): kernel ≡ HOF, then linear ----

  /** Hostile multi-line fixture: duplicate lines, blank/space-only/tab-only
    * lines, trailing newlines (split keeps trailing empties), short-line
    * exemptions, astral chars (code-point lengths), null. */
  private val lineSamples = Seq(
    "alpha\nbeta\nalpha\n\nbeta\ngamma",
    "x\n   \n\tx\nx\n   \ny y y\ny y y\n",
    "café 😀\ncafé 😀\nplain ascii line here\ncafé 😀",
    "",
    null.asInstanceOf[String],
    "only one line",
    "ab\nab\nab\nlong enough line\nlong enough line",
    "\n\n\n",
    "   \n   \n\t\n",
    "repeat me\nrepeat me\n  repeat me\nrepeat me  \nrepeat me"
  )

  test("dedupLines (LineDedup kernel) matches the filter+array_position HOF bit-for-bit (round 12)") {
    val df = lineSamples.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    Seq(0, 1, 3, 100).foreach { minChars =>
      val native = TextLib.dedupLines(df, "t", minChars)
        .select("id", "t", "n_removed_lines").orderBy("id").collect().toSeq
      val hof = TextLib.dedupLinesHof(df, "t", minChars)
        .select("id", "t", "n_removed_lines").orderBy("id").collect().toSeq
      assert(native == hof, s"minChars=$minChars: $native vs $hof")
    }
  }

  test("LineRepStats kernel matches the HOF line-stats formulation bit-for-bit (round 12)") {
    val df = lineSamples.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "t")
    val out = df.select(col("id"),
        graft.expr.LineRepStats(col("t")).as("native"),
        TextLib.lineRepStatsHof(col("t")).as("hof"))
      .orderBy("id").collect()
    out.foreach { r =>
      if (r.isNullAt(1)) {
        // kernel: null text → null struct; HOF: struct of nulls — same
        // downstream semantics (every field access is null), pinned here
        assert(r.getStruct(2).isNullAt(0), s"row ${r.getInt(0)}: HOF fields not null")
      } else {
        assert(r.getStruct(1) == r.getStruct(2),
          s"row ${r.getInt(0)}: ${r.getStruct(1)} vs ${r.getStruct(2)}")
      }
    }
  }

  test("line kernels stay linear on a 60k-line adversarial document (round 12)") {
    // the straggler scenario VERDICT r11 #1 names: one boilerplate page
    // with tens of thousands of lines. The replaced HOF was
    // O(lines²·lineLen) — ~3.6e9 interpreted string compares for this
    // document (minutes-to-hours on one task); the kernel is one hash-set
    // sweep and must clear it (plus session overhead) in seconds.
    val nLines = 60000
    val doc = (0 until nLines).map(i => s"boilerplate line ${i % 997} of the page").mkString("\n")
    val df = Seq((1, doc), (2, null.asInstanceOf[String])).toDF("id", "t")
    val t0 = System.nanoTime()
    val dd = TextLib.dedupLines(df, "t").select("id", "n_removed_lines")
      .orderBy("id").collect()
    val rs = df.select(col("id"), graft.expr.LineRepStats(col("t")).as("s"))
      .orderBy("id").collect()
    val wallSec = (System.nanoTime() - t0) / 1e9
    // 997 distinct line values → 997 survivors
    assert(dd(0).getInt(1) == nLines - 997)
    assert(rs(0).getStruct(1).getInt(0) == nLines)          // n_lines
    assert(rs(0).getStruct(1).getInt(1) == nLines - 997)    // n_dup
    assert(rs(1).isNullAt(1))                               // null text → null struct
    assert(wallSec < 30.0,
      f"60k-line document took $wallSec%.1f s — the kernel should be linear (ms), not quadratic")
  }

  test("TokenEntropy: hand-checked values, null/empty conventions, RPV2 extras (round 12)") {
    // entropy of {a:2, b:1, c:1} = ln(4) - (2/4)ln(2) = 1.0397...;
    // uniform over 2 = ln 2; single token = 0; empty/null → null
    val df = Seq(
      (0, "a b a c"),
      (1, "x y"),
      (2, "solo"),
      (3, ""),
      (4, null.asInstanceOf[String]),
      (5, "a  a")                                  // empty split tokens skipped
    ).toDF("id", "t")
    val got = df.select(col("id"),
        graft.expr.TokenEntropy(split(col("t"), " ")).as("e"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    val ln2 = math.log(2)
    assert(math.abs(got(0).get - (math.log(4) - 0.5 * ln2)) < 1e-12)
    assert(math.abs(got(1).get - ln2) < 1e-12)
    assert(got(2).get == 0.0)
    assert(got(3).isEmpty && got(4).isEmpty, "empty/null text → null entropy")
    assert(got(5).get == 0.0, "double space yields empty tokens that must be skipped")

    // rpv2Extras wiring: lorem-ipsum occurrences and brace ratio
    val sig = TextLib.rpv2Extras(
        Seq((0, "Lorem ipsum dolor lorem ipsum"), (1, "{\"k\": 1} plain")).toDF("id", "t"), "t")
      .orderBy("id").collect()
    assert(math.abs(sig(0).getDouble(3) - 2.0 / 29) < 1e-12, "two lorem-ipsum hits / 29 chars")
    assert(math.abs(sig(1).getDouble(4) - 2.0 / 14) < 1e-12, "two braces / 14 chars")
  }
}
