package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines (beyond-reference
  * surface, SURVEY §7 step 7): token counting, quality scoring, language ID,
  * fingerprinting. Everything is built from codegen'd Spark expressions — no
  * UDFs in the hot path — so a 100 TB corpus scan stays whole-stage-codegen.
  */
object TextLib {

  /** Canonical normalization used before hashing/dedup: lowercase, collapse
    * internal whitespace, trim.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** HTML → text, the first step of every web-crawl curation pipeline:
    * script/style blocks and comments removed WITH their content, block-
    * level tags become newlines (paragraph structure survives for the
    * downstream chunkers/paragraph dedup), remaining tags become spaces,
    * entities decode via the native one-pass [[graft.expr.HtmlEntityDecode]]
    * (named + numeric — a regexp chain cannot do codepoint arithmetic),
    * then whitespace collapses (3+ newlines → 2, trim). Not a browser: no
    * DOM, no CSS visibility — the deterministic regex-level strip every
    * large-scale pipeline actually runs on raw crawl bytes.
    */
  def htmlToText(c: Column): Column = {
    // comments FIRST: a commented-out "<script>" must not arm the content
    // strip (it would swallow visible text up to the next real close tag
    // and leave a dangling "<!--" behind)
    val noComment = regexp_replace(c, "(?s)<!--.*?-->", " ")
    // content-bearing never-rendered elements, matched with their bodies;
    // close tags may carry junk ("</script x>") — browsers still close
    val noHidden = regexp_replace(noComment,
      "(?is)<(script|style|title|noscript|textarea|svg)[^>]*>.*?</\\1\\b[^>]*>", " ")
    // a TRUNCATED script/style (crawl cut mid-block) swallows to EOF in a
    // browser — without this pass its source code leaks into "clean" text
    val noOpenScript = regexp_replace(noHidden, "(?is)<(script|style)[^>]*>.*$", " ")
    val blocks = regexp_replace(noOpenScript,
      "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|section|article|header|footer)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val decoded = graft.expr.HtmlEntityDecode(noTags)
    val hws = regexp_replace(decoded, "[ \\t\\x0B\\f\\r]+", " ")
    val tightNl = regexp_replace(hws, " ?\\n ?", "\n")
    // Spark's trim strips SPACES only — newline edges need the regex form
    regexp_replace(regexp_replace(tightNl, "\\n{3,}", "\n\n"), "^\\s+|\\s+$", "")
  }

  /** Whitespace token count = number of maximal non-whitespace runs.
    * (The earlier `size(split(trim(text), "\\s+"))` formulation counted a
    * phantom empty token when text begins with a tab/newline, because
    * Spark's `trim` strips spaces only — run-count is the spec now, on
    * both the engine and oracle sides.)
    */
  def tokenCountWs(text: Column): Column =
    graft.expr.TextCharStats(text).getField("n_tokens")

  /** BPE-ish token count: word pieces, numbers, punctuation runs counted
    * separately (a cheap, deterministic stand-in for a real tokenizer's
    * token count — same regex family GPT-2's pre-tokenizer uses).
    */
  def tokenCountBpeIsh(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles of the normalized text, deduplicated — a native
    * expression (graft.expr.WordShingles): the interpreted
    * transform/slice/concat_ws chain was ~10× slower on the documents corpus.
    */
  def shingles(text: Column, n: Int): Column = graft.expr.WordShingles(text, n)

  /** Character n-gram shingles (robust for CJK / no-whitespace scripts).
    *
    * PERF WARNING: pass a CHEAP column (an attribute, not a computed
    * expression) — the per-element `substring(t, i, n)` lambda re-evaluates
    * `t`'s whole subtree once per position (HOFs are interpreted, no CSE),
    * so handing it a regex-normalized expression is O(len²) in regex runs.
    * The internal `normalized()` wrap below is the only subtree cost; for
    * hot paths use a native expression (see WordShingles) instead.
    */
  def charShingles(text: Column, n: Int): Column = {
    val t = normalized(text)
    array_distinct(
      when(length(t) <= n, array(t))
        .otherwise(transform(sequence(lit(1), length(t) - n + 1), i => substring(t, i, lit(n)))))
  }

  // ---------------------------------------------------------------- quality

  /** Quality metrics per document: length, token counts, punctuation /
    * digit / uppercase ratios, mean word length, stopword ratio — the
    * standard heuristic filters of web-scale corpus cleaning.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // ONE char-stats pass (native expr; the regexp-per-class plan ran 4
    // regex passes + an interpreted fold per row) + one stopword pass
    // nullif denominators: empty / whitespace-only docs have n_chars or
    // n_tokens = 0, and Spark 4's default ANSI mode turns a bare 0-division
    // into a job-killing DIVIDE_BY_ZERO — exactly the junk documents a
    // quality filter exists to process. Ratios come out null for them.
    val nChars = nullif(col("__tcs.n_chars").cast("double"), lit(0.0))
    val nWords = nullif(col("__tcs.n_tokens").cast("double"), lit(0.0))
    df.withColumn("__tcs", graft.expr.TextCharStats(t))
      .withColumn("n_chars_calc", col("__tcs.n_chars"))
      .withColumn("n_words", col("__tcs.n_tokens"))
      // ratios stay RAW: rounding here would double-round under the oracle
      // convention (roundf = round(x + 1e-9, 6) must see the raw ratio, not
      // a pre-rounded one — the nudge can't cross the grid twice); callers
      // that need fixed decimals round at the edge
      .withColumn("punct_ratio", col("__tcs.n_punct") / nChars)
      .withColumn("digit_ratio", col("__tcs.n_digit") / nChars)
      .withColumn("upper_ratio", col("__tcs.n_upper") / nChars)
      .withColumn("mean_word_len", col("__tcs.n_nonws").cast("double") / nWords)
      .withColumn("stopword_ratio",
        graft.expr.WordSetCount(t, EnglishStopwords) / nWords)
      .drop("__tcs")
  }

  /** Composite 0–1 quality score from the heuristic features (monotone,
    * deterministic; thresholds follow common corpus-filtering practice).
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val withF = qualityFeatures(df, textCol)
    withF.withColumn("quality_score",
      round(
        (when(col("n_words").between(10, 100000), 0.35).otherwise(0.0)) +
        (when(col("mean_word_len").between(2.5, 12.0), 0.25).otherwise(0.0)) +
        (when(col("punct_ratio") < 0.2, 0.2).otherwise(0.0)) +
        (when(col("digit_ratio") < 0.3, 0.1).otherwise(0.0)) +
        (when(col("stopword_ratio") > 0.05, 0.1).otherwise(0.0)), 2))
  }

  /** The RedPajama-V2 residual quality signals not already covered by
    * [[qualityFeatures]] / [[gopherRules]] / [[c4Clean]] /
    * [[repetitionSignals]] (those families carry the other ~35 RPV2-class
    * signals between them):
    *
    *  - `unigram_entropy` (`rps_doc_unigram_entropy`): Shannon entropy of
    *    the document's own token distribution via the native
    *    [[graft.expr.TokenEntropy]] kernel — one hash-map pass per row,
    *    no shuffle (the explode→groupBy formulation would shuffle the
    *    whole token stream for a row-local quantity). Low entropy flags
    *    keyword-stuffed / boilerplate pages whose dupe-gram fractions
    *    look clean.
    *  - `lorem_ipsum_ratio` (`rps_doc_lorem_ipsum`): occurrences of
    *    "lorem ipsum" in the lowercased text per character — template
    *    pages shipped unfilled.
    *  - `curly_bracket_ratio` (`rps_doc_curly_bracket`): '{'/'}' chars
    *    per character — code/JSON masquerading as prose.
    *
    * Ratios stay raw (the [[qualityFeatures]] rounding convention);
    * null/empty text yields null signals (nullif denominators, and the
    * entropy kernel nulls on zero surviving tokens). Pure per-row map.
    */
  def rpv2Extras(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val chars = nullif(length(t).cast("double"), lit(0.0))
    val lw = lower(t)
    df.withColumn("unigram_entropy",
        graft.expr.TokenEntropy(split(normalized(t), " ")))
      // non-overlapping occurrence count: split on the literal (no regex
      // metachars in "lorem ipsum") leaves occurrences+1 pieces
      .withColumn("lorem_ipsum_ratio",
        (size(split(lw, "lorem ipsum", -1)) - 1).cast("double") / chars)
      .withColumn("curly_bracket_ratio",
        (length(t) - length(translate(t, "{}", ""))).cast("double") / chars)
  }

  /** Gopher-rules document gate (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Appendix A1.1 —
    * the heuristic baseline FineWeb/Dolma-class pipelines still start
    * from): seven per-document rules, each emitted as its OWN boolean
    * column plus a composite `gopher_keep` and an audit
    * `gopher_fail_reasons` (comma-joined failed-rule names in fixed
    * order) — production curation needs the per-rule attribution for
    * drop-rate dashboards and appeal/debug trails, not just a verdict.
    * [[qualityScore]] is the scalar cousin; this is the named-recipe gate.
    *
    * Rules (names as emitted): `word_count` (tokens in [minWords,
    * maxWords]), `mean_word_len` (in [minMeanWordLen, maxMeanWordLen]),
    * `symbol_ratio` ('#' chars + '...' runs per word ≤ maxSymbolRatio),
    * `bullet_lines` (≤ maxBulletRatio of nonempty lines start with a
    * bullet), `ellipsis_lines` (≤ maxEllipsisRatio of nonempty lines end
    * with '...'), `alpha_words` (≥ minAlphaRatio of words contain a
    * letter), `stopwords` (≥ minStopwords distinct common stop words —
    * the Gopher eight). Tokens are the corpus-wide normalized whitespace
    * tokens; lines split the RAW text on newlines. Null/empty documents
    * fail every denominator-bearing rule (each rule is null→false), so
    * they never leak through a composite keep.
    *
    * Mean word length is computed integer-exactly from the normalized
    * length ((len − n + 1)/n: single spaces by construction) — one
    * integer subtraction and one division, so an oracle replays the
    * boundary comparisons bit-for-bit without rounding conventions.
    *
    * Scale shape: a pure per-row map (token/line arrays hoisted to
    * columns once — HOF lambdas re-evaluate inline subtrees per element,
    * the q_winnow_law lesson); no shuffle, no aggregate, embarrassingly
    * parallel at any corpus size.
    *
    * ENGLISH-ONLY SCOPE (like the cited Rae 2021 pipeline, which is
    * English-only): `alpha_words` matches `[a-z]` on the lowercased
    * normalized tokens and `stopwords` uses the English Gopher-eight, so
    * every non-Latin-script document fails BOTH rules and is dropped. In
    * a multilingual recipe either run this gate after language ID on the
    * English slice only, or neutralize the two anglocentric rules with
    * `minAlphaRatio = 0, minStopwords = 0` (the remaining five rules are
    * script-agnostic).
    */
  def gopherRules(df: DataFrame, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
                  maxEllipsisRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
                  minStopwords: Int = 2): DataFrame =
    gopherCore(df, textCol, minWords, maxWords, minMeanWordLen, maxMeanWordLen,
      maxSymbolRatio, maxBulletRatio, maxEllipsisRatio,
      alphaOk = alphaRuleOk("[a-z]", minAlphaRatio),
      stopOk = stopwordRuleOk(GopherEightStopwords, minStopwords))

  /** The Gopher-eight English stop words (Rae et al. 2021 §A1.1). */
  val GopherEightStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-language parameters of the two anglocentric Gopher rules: the
    * stopword marker list + floor and the alpha-word regex + floor. Every
    * OTHER rule is script-agnostic and shared. */
  final case class GopherLangParams(stopwords: Seq[String], minStopwords: Int = 2,
                                    alphaRegex: String = "[a-z]",
                                    minAlphaRatio: Double = 0.8)

  /** Default per-language Gopher params: the Gopher eight for English, the
    * [[Markers]] top-stopword lists for de/fr/es/it/pt, each with the
    * letters-with-diacritics alpha class (Java and RE2 agree on `\p{L}`
    * for these scripts, so a SQL oracle replays the rule). */
  lazy val DefaultGopherLangParams: Map[String, GopherLangParams] = // lazy: Markers is declared below
    Map("en" -> GopherLangParams(GopherEightStopwords)) ++
      Markers.filter(_._1 != "en").map { case (lang, stops) =>
        lang -> GopherLangParams(stops, alphaRegex = "\\p{L}")
      }.toMap

  /** [[DefaultGopherLangParams]] with the two YAML-tunable floors
    * overridden UNIFORMLY across languages. The dynamic-dispatch ops
    * (gopher_rules/gopher_filter with lang_column, stream gopher_gate with
    * lang_field) route their min_alpha_ratio/min_stopwords params through
    * this so the knobs keep working when per-language dispatch is on —
    * previously they were silently ignored (ADVICE r12). At the defaults
    * (0.8, 2) this IS DefaultGopherLangParams value-for-value. */
  def gopherLangParamsWithFloors(minAlphaRatio: Double,
                                 minStopwords: Int): Map[String, GopherLangParams] =
    DefaultGopherLangParams.view
      .mapValues(_.copy(minAlphaRatio = minAlphaRatio, minStopwords = minStopwords))
      .toMap

  /** Per-LANGUAGE Gopher gate (round 12, VERDICT r11 #3): [[gopherRules]]
    * is English-only by scope — its `alpha_words` matches `[a-z]` and its
    * `stopwords` rule uses the English Gopher eight, so every non-Latin
    * document fails both. With [[langIdFit]]/[[langIdApply]] (or any
    * `langCol`) upstream, this variant keys those TWO rules on the
    * document's language: each language in `perLang` gets its own stopword
    * list/floor and alpha regex/floor; documents whose language has no
    * entry (or a null language) get the NEUTRAL fallback — both rules pass
    * vacuously, leaving the five script-agnostic rules as the gate (the
    * documented `minAlphaRatio = 0, minStopwords = 0` workaround, now
    * automatic per row). Output columns are identical to [[gopherRules]]
    * (`gopher_*_ok`, `gopher_keep`, `gopher_fail_reasons`), so the gate
    * composes into the same YAML/stream plumbing.
    *
    * Scale shape: unchanged — a pure per-row map; the language dispatch is
    * a `when` chain over |perLang| branches, each a row-local array scan.
    */
  def gopherRulesByLang(df: DataFrame, textCol: String, langCol: String,
                        perLang: Map[String, GopherLangParams] = DefaultGopherLangParams,
                        minWords: Int = 50, maxWords: Int = 100000,
                        minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                        maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
                        maxEllipsisRatio: Double = 0.3): DataFrame = {
    require(perLang.nonEmpty, "gopherRulesByLang: perLang must not be empty")
    // deterministic branch order (sorted lang) so plans are stable;
    // null/unknown lang falls through to the NEUTRAL lit(true) — while a
    // known-lang null-text doc yields a null rule body, which gopherCore's
    // ok() turns false (the gopherRules null→false convention)
    val langs = perLang.toSeq.sortBy(_._1)
    def dispatch(ruleOf: GopherLangParams => Column): Column =
      langs.foldLeft(lit(true)) { case (acc, (lang, p)) =>
        when(col(langCol) === lang, ruleOf(p)).otherwise(acc)
      }
    val alphaOk = dispatch(p => alphaRuleOk(p.alphaRegex, p.minAlphaRatio))
    val stopOk = dispatch(p => stopwordRuleOk(p.stopwords, p.minStopwords))
    gopherCore(df, textCol, minWords, maxWords, minMeanWordLen, maxMeanWordLen,
      maxSymbolRatio, maxBulletRatio, maxEllipsisRatio,
      alphaOk = alphaOk, stopOk = stopOk)
  }

  /** alpha_words rule body against the staged `__gr_*` columns (null→false
    * applied by [[gopherCore]]'s ok() wrapper). */
  private def alphaRuleOk(alphaRegex: String, minAlphaRatio: Double): Column =
    size(filter(col("__gr_ws"), w => w.rlike(alphaRegex)))
      .cast("double") / nullif(col("__gr_n"), lit(0.0)) >= minAlphaRatio

  /** stopwords rule body against the staged `__gr_*` columns. */
  private def stopwordRuleOk(stops: Seq[String], minStopwords: Int): Column =
    size(filter(array(stops.map(lit): _*), s => array_contains(col("__gr_ws"), s))) >=
      minStopwords

  /** Shared rule engine of [[gopherRules]]/[[gopherRulesByLang]]: stages
    * the hoisted token/line arrays, evaluates the five script-agnostic
    * rules plus the caller-supplied alpha/stopword rule bodies (each
    * null→false), and emits the audit columns. */
  private def gopherCore(df: DataFrame, textCol: String,
                         minWords: Int, maxWords: Int,
                         minMeanWordLen: Double, maxMeanWordLen: Double,
                         maxSymbolRatio: Double, maxBulletRatio: Double,
                         maxEllipsisRatio: Double,
                         alphaOk: Column, stopOk: Column): DataFrame = {
    val t = col(textCol)
    val staged = df
      .withColumn("__gr_norm", normalized(t))
      .withColumn("__gr_ws", filter(split(col("__gr_norm"), " "), x => x =!= ""))
      .withColumn("__gr_lines",
        filter(split(t, "\n"), l => trim(l) =!= ""))
      .withColumn("__gr_n", size(col("__gr_ws")).cast("double"))
      .withColumn("__gr_nl", size(col("__gr_lines")).cast("double"))
    val n = col("__gr_n")
    val nl = col("__gr_nl")
    def ok(c: Column): Column = coalesce(c, lit(false))
    val mwl = (length(col("__gr_norm")) - size(col("__gr_ws")) + 1).cast("double") /
      nullif(n, lit(0.0))
    val hashCount = length(t) - length(regexp_replace(t, "#", ""))
    val ellipsisCount = (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3
    val rules = Seq(
      "word_count" -> ok(n >= minWords && n <= maxWords),
      "mean_word_len" -> ok(mwl >= minMeanWordLen && mwl <= maxMeanWordLen),
      "symbol_ratio" -> ok((hashCount + ellipsisCount).cast("double") / nullif(n, lit(0.0))
        <= maxSymbolRatio),
      "bullet_lines" -> ok(size(filter(col("__gr_lines"), l => l.rlike("^\\s*[-*•]")))
        .cast("double") / nullif(nl, lit(0.0)) <= maxBulletRatio),
      "ellipsis_lines" -> ok(size(filter(col("__gr_lines"), l => l.rlike("\\.\\.\\.\\s*$")))
        .cast("double") / nullif(nl, lit(0.0)) <= maxEllipsisRatio),
      "alpha_words" -> ok(alphaOk),
      "stopwords" -> ok(stopOk)
    )
    val withRules = rules.foldLeft(staged) { case (d, (name, c)) =>
      d.withColumn(s"gopher_${name}_ok", c)
    }
    withRules
      .withColumn("gopher_keep",
        rules.map { case (name, _) => col(s"gopher_${name}_ok") }.reduce(_ && _))
      .withColumn("gopher_fail_reasons",
        concat_ws(",", filter(
          array(rules.map { case (name, _) =>
            when(!col(s"gopher_${name}_ok"), lit(name))
          }: _*), x => x.isNotNull)))
      .drop("__gr_norm", "__gr_ws", "__gr_lines", "__gr_n", "__gr_nl")
  }

  /** C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning…", §2.2 — the rules that built C4 from Common
    * Crawl), as one line-rewrite + page-gate pass:
    *
    * LINE rules (a line survives iff ALL hold; kept lines re-join with
    * newlines into the rewritten `textCol`):
    *  - ends in a terminal punctuation mark — period, exclamation,
    *    question mark, or closing quote (pinned set: `. ! ? " ”`, with
    *    trailing whitespace ignored);
    *  - has at least `minWordsPerLine` whitespace words (default 3);
    *  - does not contain the word "javascript" (case-insensitive).
    *
    * PAGE rules (flags; `c4_keep` is their conjunction):
    *  - at least `minSentences` sentences survive the line rules, where a
    *    sentence is PINNED as an occurrence of `.`, `!` or `?` in the
    *    rewritten text (the paper used a sentence tokenizer; an exact
    *    character count is what a SQL oracle can replay bit-for-bit);
    *  - the ORIGINAL page contains no "lorem ipsum" (case-insensitive),
    *    no `{` (code), and no word from `badwords` (case-insensitive
    *    whole-token match on the normalized tokenization; empty list =
    *    rule off).
    *
    * Adds `c4_n_lines_kept`, `c4_n_sentences`, `c4_keep` and REWRITES
    * `textCol` in place (null text stays null with null flags — the
    * gopherRules null convention: a composite gate never keeps it).
    * Three-sentence-span dedup — the paper's final rule — is the
    * [[graft.text.Dedup.paragraphDedup]]/[[Dedup.cutDuplicateSpans]]
    * family and deliberately not re-implemented here.
    *
    * Scale shape: pure per-row map (line array hoisted once, every rule
    * row-local); no shuffle, no aggregate — embarrassingly parallel.
    */
  def c4Rules(df: DataFrame, textCol: String,
              minWordsPerLine: Int = 3, minSentences: Int = 5,
              badwords: Seq[String] = Nil): DataFrame = {
    require(minWordsPerLine >= 0, s"c4Rules: minWordsPerLine must be >= 0")
    require(minSentences >= 0, s"c4Rules: minSentences must be >= 0")
    val staged = df.withColumn("__c4_lines", split(col(textCol), "\n"))
    val lineOk = (l: Column) =>
      l.rlike("[.!?\"”]\\s*$") &&
      size(filter(split(trim(l), "\\s+"), t => t =!= "")) >= minWordsPerLine &&
      !lower(l).rlike("javascript")
    val kept = filter(col("__c4_lines"), lineOk)
    val withKept = staged
      .withColumn("__c4_kept", kept)
      .withColumn("c4_n_lines_kept", size(col("__c4_kept")).cast("int"))
      .withColumn("__c4_new", array_join(col("__c4_kept"), "\n"))
      .withColumn("c4_n_sentences",
        (length(col("__c4_new")) -
          length(regexp_replace(col("__c4_new"), "[.!?]", ""))).cast("int"))
    val pageClean =
      !lower(col(textCol)).rlike("lorem ipsum") && !col(textCol).contains("{") &&
        (if (badwords.isEmpty) lit(true)
         else {
           val toks = filter(split(normalized(col(textCol)), " "), t => t =!= "")
           size(filter(array(badwords.map(b => lit(b.toLowerCase)): _*),
             b => array_contains(toks, b))) === 0
         })
    withKept
      .withColumn("c4_keep",
        when(col(textCol).isNull, lit(null).cast("boolean"))
          .otherwise(col("c4_n_sentences") >= minSentences && pageClean))
      .withColumn(textCol, col("__c4_new"))
      .drop("__c4_lines", "__c4_kept", "__c4_new")
  }

  /** Within-document repeated-line removal — the "repetitious lines"
    * cleaner of the MassiveText/Gopher pipeline family (Rae et al. 2021,
    * A1.1 repetition filters): every line keeps only its FIRST occurrence
    * inside the document (navigation chrome, cookie banners, and share
    * bars repeat verbatim within a page long before they repeat across
    * pages — [[graft.text.Dedup.paragraphDedup]] is the ACROSS-document
    * sibling). Lines shorter than `minChars` are exempt from removal
    * (default 1: blank lines survive, so paragraph structure does), and
    * [[qualityFeatures]]/q_text_repetition MEASURE repetition where this
    * op acts on it.
    *
    * REWRITES `textCol` in place (kept lines re-joined with newlines; null
    * text stays null) and adds `n_removed_lines` — the same in-place
    * convention as [[graft.text.Dedup.cutDuplicateSpans]], so the op
    * composes into a YAML chain without downstream column switches. Pure
    * per-row map — no shuffle, no aggregate; since round 12 the
    * first-occurrence test is the native [[graft.expr.LineDedup]] kernel
    * (ONE hash-set sweep per document, O(lines·lineLen)) — the previous
    * interpreted `filter`+`array_position` HOF was O(lines²·lineLen) per
    * document, a straggler-killer on adversarial 100k-line web pages
    * (VERDICT r11 #1). The HOF formulation is retained below as the
    * parity reference (TextExprsSpec pins kernel ≡ HOF; the DuckDB
    * oracle's `list_position` form replays the same semantics).
    */
  def dedupLines(df: DataFrame, textCol: String, minChars: Int = 1): DataFrame = {
    require(minChars >= 0, s"dedupLines: minChars must be >= 0, got $minChars")
    df.withColumn("__dl", graft.expr.LineDedup(col(textCol), minChars))
      .withColumn("n_removed_lines",
        coalesce(col("__dl.n_removed"), lit(0)).cast("int"))
      .withColumn(textCol, col("__dl.text")) // null in → null out
      .drop("__dl")
  }

  /** The original HOF formulation of [[dedupLines]] — retained ONLY as the
    * parity reference for the [[graft.expr.LineDedup]] kernel
    * (TextExprsSpec sweeps kernel ≡ HOF, the charGramArrayHof discipline). */
  private[graft] def dedupLinesHof(df: DataFrame, textCol: String,
                                   minChars: Int = 1): DataFrame = {
    val staged = df.withColumn("__dl_lines", split(col(textCol), "\n"))
    val kept = filter(col("__dl_lines"),
      (x, i) => length(x) < minChars || array_position(col("__dl_lines"), x) === i + 1)
    staged
      .withColumn("__dl_kept", kept)
      .withColumn("n_removed_lines",
        coalesce(size(col("__dl_lines")) - size(col("__dl_kept")), lit(0)).cast("int"))
      .withColumn(textCol, array_join(col("__dl_kept"), "\n")) // null in → null out
      .drop("__dl_lines", "__dl_kept")
  }

  /** Corpus length distribution in log2 bins: one aggregation pass over a
    * numeric column (chars, tokens, bytes) → per-bin row count, share, and
    * min/max/avg — the "what does this corpus look like" histogram that
    * gates truncation/packing decisions before a training run.
    *
    * bin = floor(log2(n)) computed INTEGER-exact as length(bin(n)) - 1 (bit
    * length of the binary rendering), never through float log2 — the float
    * path puts exact powers of two on a rounding boundary and engines can
    * disagree by one bin. NULL or non-positive lengths land in bin -1.
    * Output is one row per occupied bin (≤ 64 rows whatever the corpus
    * size); `share`/`len_avg` stay raw doubles — round at the edge.
    */
  def lengthHistogram(df: DataFrame, lenCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = col(lenCol).cast("long")
    val b = when(n.isNull || n <= 0, lit(-1))
      .otherwise((length(bin(n)) - 1).cast("int"))
    df.withColumn("len_bin", b)
      .groupBy("len_bin")
      .agg(
        count(lit(1)).as("n_rows"),
        min(n).as("len_min"),
        max(n).as("len_max"),
        avg(n).as("len_avg"))
      .withColumn("share",
        col("n_rows").cast("double") / sum(col("n_rows")).over(Window.partitionBy()))
      // Scala-API shiftleft only takes a literal bit count — SQL form here
      .withColumn("len_lo",
        when(col("len_bin") >= 0, expr("shiftleft(CAST(1 AS BIGINT), len_bin)")))
      .withColumn("len_hi",
        when(col("len_bin") >= 0, expr("shiftleft(CAST(1 AS BIGINT), len_bin + 1) - 1")))
  }

  /** Unicode-script composition per document (native ScriptCounts, one
    * pass): counts + ratios for latin/han/cyrillic/arabic, digits,
    * whitespace, other — the mixed-script spam / wrong-language
    * contamination signal. Ratios are over non-whitespace chars and stay
    * raw doubles (round at the edge); empty/whitespace-only docs get null
    * ratios (ANSI-safe nullif denominator).
    */
  def scriptProfile(df: DataFrame, textCol: String): DataFrame = {
    val denom = nullif((col("__sc.n_chars") - col("__sc.n_ws")).cast("double"), lit(0.0))
    df.withColumn("__sc", graft.expr.ScriptCounts(col(textCol)))
      .withColumn("n_chars_sc", col("__sc.n_chars"))
      .withColumn("latin_ratio", col("__sc.n_latin") / denom)
      .withColumn("han_ratio", col("__sc.n_han") / denom)
      .withColumn("cyrillic_ratio", col("__sc.n_cyrillic") / denom)
      .withColumn("arabic_ratio", col("__sc.n_arabic") / denom)
      .withColumn("digit_ratio_sc", col("__sc.n_digit") / denom)
      .withColumn("other_ratio_sc", col("__sc.n_other") / denom)
      .drop("__sc")
  }

  // ---------------------------------------------------------------- language ID

  /** Stopword-marker language ID: score each candidate language by the
    * fraction of tokens hitting its top-stopword list; argmax wins, `und`
    * when nothing scores. A cheap n-gram-free heuristic that is pure
    * expression (codegen'd) — the classic fastText model would slot in as a
    * `mapPartitions` scorer behind the same column contract.
    */
  def langId(df: DataFrame, textCol: String, outCol: String = "lang_pred"): DataFrame = {
    // ONE tokenize pass scores every marker set (native WordSetCounts);
    // denominator keeps the split-size semantics (empty text → 1 token →
    // score 0). The normalized text is aliased so it's computed once —
    // CollapseProject leaves multi-use non-cheap aliases alone.
    val nWords = size(split(col("__norm"), " ")).cast("double")
    val counts = graft.expr.WordSetCounts(col("__norm"), Markers.map(_._2))
    val scored = Markers.zipWithIndex.foldLeft(
        df.withColumn("__norm", normalized(col(textCol))).withColumn("__wsc", counts)) {
      case (d, ((lang, _), i)) =>
        d.withColumn(s"__s_$lang", element_at(col("__wsc"), i + 1) / nWords)
    }
    val best = Markers.map { case (lang, _) => struct(col(s"__s_$lang").as("s"), lit(lang).as("l")) }
    scored
      .withColumn("__best", greatest(best: _*))
      .withColumn(outCol, when(col("__best.s") > 0.02, col("__best.l")).otherwise(lit("und")))
      .drop(Markers.map { case (l, _) => s"__s_$l" } ++ Seq("__best", "__norm", "__wsc"): _*)
  }

  /** Frozen character-n-gram language-ID model (round 11, VERDICT r10 #4):
    * one [[graft.expr.LmVocab]] per language — n-gram → ln(tf/T_lang) over
    * the top-`tableSize` grams of that language's labeled fit text, OOV
    * floor −ln(T_lang). All counts are integers and the log math is the
    * pinned ln(tf/T) form, so a SQL oracle replays the whole model.
    * Driver/broadcast memory is |langs| × tableSize entries by construction.
    */
  final class LangIdModel(val n: Int, val langs: Seq[String],
                          val lms: Seq[graft.expr.LmVocab]) extends Serializable {
    override def toString: String =
      s"LangIdModel(n=$n, langs=${langs.mkString(",")})"
  }

  /** Positional character n-grams — the native
    * [[graft.expr.CharGrams]] kernel (multiset, not deduplicated: LM
    * scoring weighs repeated grams; text shorter than n scores as one
    * whole-text gram, empty → empty array → null score downstream). The
    * interpreted HOF formulation it replaced ([[charGramArrayHof]], kept
    * for the parity sweep) pays a closure dispatch + an O(position)
    * UTF8String scan per gram — quadratic per document.
    */
  private def charGramArray(t: Column, n: Int): Column =
    graft.expr.CharGrams(t, n)

  /** The original HOF formulation of [[charGramArray]] — retained ONLY as
    * the parity reference (TextExprsSpec sweeps the native kernel against
    * it, the WordShingles discipline). */
  private[graft] def charGramArrayHof(t: Column, n: Int): Column =
    when(length(t) === 0, array().cast("array<string>"))
      .when(length(t) <= n, array(t))
      .otherwise(transform(sequence(lit(1), length(t) - n + 1),
        i => substring(t, i, lit(n))))

  /** Fit a character-n-gram language-ID model on labeled text — the
    * fit/apply upgrade over the [[langId]] stopword heuristic (which stays
    * as the zero-model fallback): a char-trigram log-prob profile
    * discriminates languages the eight-stopword lists cannot, and the
    * frozen model applies as a PURE MAP ([[langIdApply]]) so the gate
    * composes into streaming ingest like the DSIR/CCNet gates.
    *
    * Per language: gram → ln(tf/T) over the top `tableSize` grams by
    * (tf desc, gram asc), OOV floor −ln(T); T is the language's TOTAL gram
    * count (pre-cap), so capped models stay proper sub-distributions.
    * Rows with a null label or null text are ignored.
    *
    * Scale shape: ONE tokenize+explode pass over the fit corpus into a
    * map-side-combined (lang, gram) count aggregate (uniform keys), one
    * |langs|-row total collect, one per-lang top-k window over the
    * aggregated counts (|distinct grams| rows, not the gram stream).
    */
  def langIdFit(df: DataFrame, textCol: String, langCol: String,
                n: Int = 3, tableSize: Int = 5000): LangIdModel = {
    require(n >= 1, s"langIdFit: n must be >= 1, got $n")
    require(tableSize > 0, s"langIdFit: tableSize must be positive, got $tableSize")
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(langCol).isNotNull && col(textCol).isNotNull)
      .select(col(langCol).cast("string").as("__lang"),
        normalized(col(textCol)).as("__t"))
      .select(col("__lang"), explode(charGramArray(col("__t"), n)).as("gram"))
      .groupBy("__lang", "gram").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = counts.groupBy("__lang").agg(sum("tf").as("T")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val w = Window.partitionBy(col("__lang")).orderBy(col("tf").desc, col("gram").asc)
      val top = counts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= tableSize)
        .select("__lang", "gram", "tf").collect()
      val langs = totals.keys.toSeq.sorted
      val lms = langs.map { l =>
        val t = totals(l).toDouble
        graft.expr.LmVocab(
          top.filter(_.getString(0) == l).toSeq
            .map(r => r.getString(1) -> math.log(r.getLong(2) / t)),
          -math.log(t))
      }
      new LangIdModel(n, langs, lms)
    } finally counts.unpersist()
  }

  /** Score any frame — batch or STREAMING — against a frozen
    * [[LangIdModel]]: per language the 6dp-rounded mean gram log-prob
    * (the [[graft.expr.VocabLogProbMean]] kernel — zero joins, zero
    * aggregation, a stateless projection), argmax wins. Tie policy:
    * equal rounded scores elect the lexicographically LAST language code
    * (greatest(struct(score, lang)) — pinned so the oracle replays it).
    * Null/empty texts predict `und` with a null score, mirroring
    * [[langId]]'s no-evidence rule. Adds `outCol` (default `lang_pred`)
    * and `lang_score` (replacing pre-existing columns of those names).
    */
  def langIdApply(df: DataFrame, textCol: String, model: LangIdModel,
                  outCol: String = "lang_pred"): DataFrame = {
    // ONE fused kernel (round 14): the K-fold formulation below
    // ([[langIdApplyFold]], kept as the parity reference) scans the gram
    // array K times and probes K hash tables per gram; the fused
    // [[graft.expr.LangBestScore]] kernel scans once and probes once per
    // gram (the MultiLmVocab vector carries all K log-probs), computing
    // the same per-language array-order sums, the same round(mean+1e-9, 6),
    // and the same greatest(struct(score, lang)) election — pinned
    // bit-identical by LangIdParitySpec. Still a pure map: zero joins,
    // zero shuffles, streams like every frozen gate.
    val fused = graft.expr.MultiLmVocab(model.langs, model.lms)
    val best = graft.expr.LangBestScore(
      charGramArray(normalized(col(textCol)), model.n), fused, 6)
    df.drop(outCol, "lang_score")
      .withColumn("__li_best", best)
      .withColumn(outCol,
        when(col("__li_best.s").isNotNull, col("__li_best.l")).otherwise(lit("und")))
      .withColumn("lang_score", col("__li_best.s"))
      .drop("__li_best")
  }

  /** The original K-column fold formulation of [[langIdApply]] — retained
    * ONLY as the parity reference (LangIdParitySpec sweeps the fused
    * kernel against it, the charGramArrayHof discipline). */
  private[graft] def langIdApplyFold(df: DataFrame, textCol: String, model: LangIdModel,
                  outCol: String = "lang_pred"): DataFrame = {
    val withG = df.drop(outCol, "lang_score")
      .withColumn("__li_t", normalized(col(textCol)))
      .withColumn("__li_g", charGramArray(col("__li_t"), model.n))
    val scored = model.langs.zip(model.lms).foldLeft(withG) { case (d, (l, lm)) =>
      d.withColumn(s"__li_s_$l",
        round(graft.expr.VocabLogProbMean(col("__li_g"), lm) + lit(1e-9), 6))
    }
    // gram-free docs score null for EVERY language (one shared gram array),
    // so best.s null <=> no evidence
    val best = model.langs.map(l => struct(col(s"__li_s_$l").as("s"), lit(l).as("l")))
    scored
      .withColumn("__li_best", greatest(best: _*))
      .withColumn(outCol,
        when(col("__li_best.s").isNotNull, col("__li_best.l")).otherwise(lit("und")))
      .withColumn("lang_score", col("__li_best.s"))
      .drop(model.langs.map(l => s"__li_s_$l") ++ Seq("__li_best", "__li_t", "__li_g"): _*)
  }

  /** Persist a fitted [[LangIdModel]]: vocab/ (lang, gram, lp) +
    * meta/ (n, lang, floor_lp — one row per language). The
    * [[savePplModel]] production shape: fit once, gate every later batch
    * or streaming job against the frozen file. */
  def saveLangIdModel(spark: org.apache.spark.sql.SparkSession,
                      model: LangIdModel, path: String): Unit = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    model.langs.zip(model.lms).flatMap { case (l, lm) =>
      lm.lp.entrySet().asScala.toSeq
        .map(e => (l, e.getKey.toString, e.getValue.doubleValue()))
    }.toDF("lang", "gram", "lp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    model.langs.zip(model.lms).map { case (l, lm) => (model.n, l, lm.floorLp) }
      .toDF("n", "lang", "floor_lp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a model written by [[saveLangIdModel]]; [[langIdApply]] on the
    * loaded model is bit-identical to the in-memory fit (lp doubles
    * round-trip exactly through parquet). */
  def loadLangIdModel(spark: org.apache.spark.sql.SparkSession,
                      path: String): LangIdModel = {
    val meta = spark.read.parquet(s"$path/meta").select("n", "lang", "floor_lp")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    require(meta.nonEmpty, s"loadLangIdModel: empty meta at $path")
    val byLang = spark.read.parquet(s"$path/vocab").select("lang", "gram", "lp")
      .collect().groupBy(_.getString(0))
    val langs = meta.map(_._2).toSeq.sorted
    val floors = meta.map(m => m._2 -> m._3).toMap
    val lms = langs.map { l =>
      graft.expr.LmVocab(
        byLang.getOrElse(l, Array.empty).toSeq
          .map(r => r.getString(1) -> r.getDouble(2)),
        floors(l))
    }
    new LangIdModel(meta.head._1, langs, lms)
  }

  // ---------------------------------------------------------------- fingerprint

  /** Canonical corpus word frequencies: one explode over the normalized
    * tokenization → (token, tf). THE shared definition — unigramScore and
    * Bpe both consume it, so the LM vocabulary and the BPE vocabulary can
    * never drift apart on tokenization details.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(normalized(col(textCol)), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary: token → document frequency + total count, minimum
    * document-frequency filter, deterministic top-k. One explode + two
    * aggregations — the standard tokenizer-training precursor.
    */
  def vocabulary(df: DataFrame, textCol: String, idCol: String = null,
                 minDf: Int = 1, topK: Int = 0): DataFrame = {
    // doc key = the caller's id column when given. The text-hash fallback
    // collapses duplicate texts into one document and undercounts df —
    // surfaced at sf0.1 where the corpus has verbatim duplicates.
    // (monotonically_increasing_id is no fallback: it re-evaluates per
    // exploded row and inflates document frequencies.)
    val docKey = if (idCol != null) col(idCol).cast("string")
                 else sha2(col(textCol), 256)
    val toks = df.select(docKey.as("__doc"),
      explode(split(normalized(col(textCol)), " ")).as("token"))
    val vocab = toks.groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("__doc")).as("df"))
      .filter(col("df") >= minDf && col("token") =!= "")
      .orderBy(col("tf").desc, col("token").asc)
    if (topK > 0) vocab.limit(topK) else vocab
  }

  /** Unigram language-model document score — the cheap stand-in for the
    * KenLM-perplexity gate of corpus curation: train token log-probs on a
    * reference corpus (default: the batch itself), score each document by
    * its mean token log-prob. Low scores flag gibberish / boilerplate /
    * wrong-language text that per-document heuristics miss.
    *
    * Model: lp(t) = ln(tf_t / T) for the top-`vocabSize` tokens by corpus
    * frequency (ties broken by token); out-of-vocabulary tokens get the
    * unseen floor -ln(T) (= ln(1/T)). T counts ALL corpus tokens, not just
    * the kept vocabulary.
    *
    * Scale shape (round 14): token counts aggregate with map-side combine
    * (one shuffle on token); SCORING is a pure map — the vocabSize-bounded
    * model rides the plan as a frozen [[graft.expr.LmVocab]] and
    * [[graft.expr.VocabLogProbMean]] computes each doc's mean in-row, so
    * the old explode → broadcast-join → per-doc re-aggregate → join-back
    * (two corpus-keyed exchanges) is gone entirely; this is [[pplApply]]'s
    * shape, whose agreement with the aggregate formulation is pinned at
    * the rounding every LM gate applies (kernel sums in array order, the
    * old avg() in partition order — the q_dsir_hashed_law 1e-9 class; the
    * model's driver-side math.log IS the Catalyst Log the oracle replays,
    * the pplFit discipline).
    *
    * Adds `n_tokens` (0 for token-free docs) and `lm_logprob` (null for
    * token-free docs; raw double — round at the edge). NULL-id rows keep
    * the old non-participation contract: n_tokens 0, null score.
    */
  /** The unigram LM fit [[unigramScore]] and [[pplFit]] share: top-`vocabSize`
    * (token, tf) pairs by corpus frequency (ties by token) plus the total
    * token count T. The model is MATERIALIZED at call time (two driver jobs
    * over the token counts, cached only for their duration): the vocabulary
    * is exactly what the scoring join broadcasts anyway, and an engine-side
    * persist here would pin a session-lifetime cache entry nothing could
    * ever unpersist (callers return lazy frames).
    */
  private def unigramModel(train: DataFrame, trainText: String,
                           vocabSize: Int): (Seq[(String, Long)], Double) = {
    val counts = wordCounts(train, trainText)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val t = Option(counts.agg(sum("tf")).first().get(0))
        .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)
      val vocab = counts.orderBy(col("tf").desc, col("token").asc)
        .limit(vocabSize).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      (vocab.toSeq, t)
    } finally counts.unpersist()
  }

  def unigramScore(df: DataFrame, textCol: String, idCol: String,
                   corpus: DataFrame = null, corpusTextCol: String = null,
                   vocabSize: Int = 50000): DataFrame = {
    require(vocabSize > 0, s"unigramScore: vocabSize must be positive, got $vocabSize")
    val train = Option(corpus).getOrElse(df)
    val trainText = Option(corpusTextCol).getOrElse(textCol)
    val (lpPairs, totalT) = unigramModel(train, trainText, vocabSize)
    // ln(tf/T) and -ln(T) are the PINNED formulations — the DuckDB oracle
    // replicates these exact operations; ln(1/T) would differ in ulps
    // (math.log IS java.lang.Math.log IS Catalyst's Log — pplFit's note)
    val lm = graft.expr.LmVocab(
      lpPairs.map { case (t, tf) => t -> math.log(tf.toDouble / totalT) },
      -math.log(totalT))
    // pure-map scoring (round 14): one NATIVE tokenize (WordGrams n=1 IS
    // the filter(split(normalized)) token stream, pinned bit-for-bit by
    // TextExprsSpec — and it runs codegen'd instead of an interpreted
    // per-token HOF lambda), the kernel probes the frozen vocab per token
    // in-row. NULL-id rows never participated in the old per-doc
    // aggregate (a null join key matches nothing), so they keep
    // n_tokens 0 / null score. Pre-existing n_tokens / lm_logprob
    // columns are REPLACED in the output, as before.
    df.drop("n_tokens", "lm_logprob")
      .withColumn("__lm_ws",
        when(col(idCol).isNotNull, graft.expr.WordGrams(col(textCol), 1)))
      .withColumn("n_tokens", coalesce(size(col("__lm_ws")).cast("long"), lit(0L)))
      .withColumn("lm_logprob", graft.expr.VocabLogProbMean(col("__lm_ws"), lm))
      .drop("__lm_ws")
  }

  /** CCNet-style perplexity buckets (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * per group (language, in CCNet), split documents into `nBuckets`
    * equal-population buckets by LM score — bucket 1 = "head" (highest
    * logprob = lowest perplexity), nBuckets = "tail". The bucket is the
    * standard curation handle: keep head+middle, drop or re-sample tail.
    *
    * The rank basis is the 6dp-ROUNDED logprob (ties by id): avg() is
    * float-summation-order dependent, so ranking raw doubles would make
    * bucket boundaries partition-layout- and engine-dependent; rounding
    * pins the order (the oracle discipline every float gate here uses).
    * Token-free docs (null lm_logprob) get a null bucket — they were
    * never scored, and counting them in a bucket would shift every
    * boundary.
    *
    * Scale: one window per GROUP — pass real group columns (language) so
    * no single task sorts the corpus; the LM fit itself is the
    * [[unigramScore]] broadcast model. An ungrouped call is a global sort
    * and is only for small frames (PlanLint would flag it in a registered
    * query).
    */
  def perplexityBuckets(df: DataFrame, textCol: String, idCol: String,
                        groupCols: Seq[String] = Nil, nBuckets: Int = 3,
                        corpus: DataFrame = null, corpusTextCol: String = null,
                        vocabSize: Int = 50000): DataFrame = {
    require(nBuckets >= 2, s"perplexityBuckets: nBuckets must be >= 2, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val scored = unigramScore(df, textCol, idCol, corpus, corpusTextCol, vocabSize)
    // bucket IN-FRAME (round 14): the old shape filtered scored, ntile'd,
    // and LEFT-JOINED the buckets back on idCol — with unigramScore's
    // scoring now a pure map there is no exchange to reuse, so the join
    // recomputed the whole scoring subtree on BOTH join inputs (measured
    // 3× at sf0.1). Routing the non-participating rows (null score /
    // null id — exactly the old filter) into their OWN window partition
    // leaves the participating partition's membership — and therefore its
    // ntile — IDENTICAL to the old filtered frame's, and the strays'
    // buckets are discarded by the when(). One window exchange, zero
    // joins, zero recompute.
    val participates = col("lm_logprob").isNotNull && col(idCol).isNotNull
    val w = Window.partitionBy((groupCols.map(col) :+ participates): _*)
      .orderBy(round(col("lm_logprob") + lit(1e-9), 6).desc, col(idCol).asc)
    scored.drop("ppl_bucket")
      .withColumn("ppl_bucket", when(participates, ntile(nBuckets).over(w)))
  }

  /** A frozen CCNet bucket model (round 10 — the [[graft.text.Dsir]]
    * fit/apply precedent): the unigram LM as a [[graft.expr.LmVocab]]
    * (vocabSize-bounded, collected once) plus per-group DESCENDING bucket
    * boundaries — `bounds` row g carries the group columns and the min
    * 6dp-rounded score of buckets 1..nBuckets−1 under [[perplexityBuckets]]'
    * ntile on the fit corpus (array index i−1 = bucket i's floor; shorter
    * than nBuckets−1 when the fit group had fewer docs than buckets). The
    * bounds table is |groups|×(nBuckets−1) values — it collects and
    * broadcasts by construction, like the DSIR weight table.
    */
  final class PplModel(val lm: graft.expr.LmVocab, val nBuckets: Int,
                       val groupCols: Seq[String],
                       val boundsSchema: org.apache.spark.sql.types.StructType,
                       val bounds: Array[org.apache.spark.sql.Row]) extends Serializable {
    override def toString: String =
      s"PplModel(V=${lm.lp.size}, nBuckets=$nBuckets, groups=${bounds.length})"
  }

  /** Fit the CCNet gate once: train the unigram LM (on `corpus` when given,
    * else on `df` itself — [[unigramScore]]'s contract), score the fit
    * corpus, and freeze each group's bucket boundaries from the SAME
    * ranking [[perplexityBuckets]] uses (6dp-rounded score desc, id asc).
    * CCNet's production shape: boundaries come from a reference corpus
    * once; ingest then gates documents against the frozen floors as a pure
    * map — [[pplApply]] — instead of re-running a corpus-wide ntile.
    *
    * Scale: the boundary aggregate is one window per GROUP (the
    * perplexityBuckets caveat carries over: pass real group columns) plus
    * a |groups|-bounded collect — groups are low-cardinality by contract
    * (languages), exactly like the sampler's quota collects.
    */
  def pplFit(df: DataFrame, textCol: String, idCol: String,
             groupCols: Seq[String] = Nil, nBuckets: Int = 3,
             corpus: DataFrame = null, corpusTextCol: String = null,
             vocabSize: Int = 50000): PplModel = {
    require(nBuckets >= 2, s"pplFit: nBuckets must be >= 2, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val train = Option(corpus).getOrElse(df)
    val trainText = Option(corpusTextCol).getOrElse(textCol)
    val (pairs, totalT) = unigramModel(train, trainText, vocabSize)
    // math.log IS java.lang.Math.log IS Catalyst's Log — the driver-built
    // model is bit-identical to the engine-side ln(tf/T) / −ln(T) the
    // oracle replays
    val lm = graft.expr.LmVocab(
      pairs.map { case (t, tf) => t -> math.log(tf.toDouble / totalT) },
      -math.log(totalT))
    val scored = unigramScore(df, textCol, idCol, corpus, corpusTextCol, vocabSize)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__r").desc, col(idCol).asc)
    val ranked = scored.filter(col("lm_logprob").isNotNull && col(idCol).isNotNull)
      .select((groupCols.map(col) :+ col(idCol) :+
        round(col("lm_logprob") + lit(1e-9), 6).as("__r")): _*)
      .withColumn("__b", ntile(nBuckets).over(w))
    // min rounded score per (group, bucket<n) → per-group array in bucket
    // order; sort_array on struct(__b, __m) orders by __b ascending
    val bmin = ranked.filter(col("__b") < nBuckets)
      .groupBy((groupCols.map(col) :+ col("__b")): _*).agg(min(col("__r")).as("__m"))
    val boundsDf = bmin
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__b"), col("__m")))).as("__bm"))
      .select((groupCols.map(col) :+
        transform(col("__bm"), x => x.getField("__m")).as("__ppl_bounds")): _*)
    new PplModel(lm, nBuckets, groupCols, boundsDf.schema, boundsDf.collect())
  }

  /** Persist a fitted [[PplModel]] (round 10 — the CCNet production shape:
    * fit once on a reference corpus, gate every ingest job against the
    * frozen model): three parquet pieces under `path` — vocab/ (token, lp),
    * bounds/ (group cols + __ppl_bounds, the floors table verbatim), and
    * meta/ (floor_lp, n_buckets, group_cols). */
  def savePplModel(spark: org.apache.spark.sql.SparkSession,
                   model: PplModel, path: String): Unit = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    model.lm.lp.entrySet().asScala.toSeq
      .map(e => (e.getKey.toString, e.getValue.doubleValue()))
      .toDF("token", "lp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    spark.createDataFrame(java.util.Arrays.asList(model.bounds: _*), model.boundsSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bounds")
    Seq((model.lm.floorLp, model.nBuckets, model.groupCols))
      .toDF("floor_lp", "n_buckets", "group_cols")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a model written by [[savePplModel]]; [[pplApply]] on the loaded
    * model is bit-identical to the in-memory fit (CurationFlowSpec pins
    * it — lp doubles and floors round-trip exactly through parquet). */
  def loadPplModel(spark: org.apache.spark.sql.SparkSession, path: String): PplModel = {
    val meta = spark.read.parquet(s"$path/meta")
      .select("floor_lp", "n_buckets", "group_cols").head()
    val groupCols = meta.getSeq[String](2)
    val lm = graft.expr.LmVocab(
      spark.read.parquet(s"$path/vocab").select("token", "lp").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toSeq,
      meta.getDouble(0))
    val boundsDf = spark.read.parquet(s"$path/bounds")
      .select((groupCols :+ "__ppl_bounds").map(col): _*)
    new PplModel(lm, meta.getInt(1), groupCols, boundsDf.schema, boundsDf.collect())
  }

  /** Gate any frame — batch or STREAMING — against a fitted [[PplModel]]:
    * tokenize (one hoisted array column), score via the pure-map
    * [[graft.expr.VocabLogProbMean]] kernel (zero joins, zero per-doc
    * aggregation), then assign `ppl_bucket` = 1 + |{boundary b of the
    * doc's group : rounded score < b}| against the broadcast bounds table
    * (a stream-static broadcast join — stateless, so the whole gate
    * composes into `readStream → pplApply → filter` ingest).
    *
    * Tie policy (the documented apply ≡ ntile seam): a score EQUAL to a
    * boundary lands in the head-most bucket whose floor it matches, while
    * ntile splits that tie group across the boundary by id — everywhere
    * else the two paths agree (q_ppl_buckets_law pins both statements).
    * Null/token-free texts and groups absent from the fit get a null
    * bucket: they were never scored/fitted, and inventing a bucket would
    * shift downstream keep/drop rates silently. Docs scoring below every
    * boundary get bucket min(fitGroupDocs, nBuckets) — the fit group's
    * tail. Outputs `n_tokens`, `lm_logprob`, `ppl_bucket` (replacing any
    * pre-existing columns of those names, as unigramScore does).
    */
  def pplApply(df: DataFrame, textCol: String, model: PplModel): DataFrame = {
    val sp = df.sparkSession
    // native tokenize (round 14): WordGrams n=1 IS the
    // filter(split(normalized)) stream, pinned by TextExprsSpec — codegen
    // instead of an interpreted per-token HOF lambda
    val scored = df.drop("n_tokens", "lm_logprob", "ppl_bucket")
      .withColumn("__ws", graft.expr.WordGrams(col(textCol), 1))
      .withColumn("n_tokens", coalesce(size(col("__ws")).cast("long"), lit(0L)))
      .withColumn("lm_logprob", graft.expr.VocabLogProbMean(col("__ws"), model.lm))
      .drop("__ws")
    val withBounds =
      if (model.groupCols.isEmpty) {
        val b = if (model.bounds.isEmpty) lit(null).cast("array<double>")
                else typedLit(model.bounds(0).getSeq[Double](0))
        scored.withColumn("__ppl_bounds", b)
      } else {
        val boundsDf = sp.createDataFrame(
          java.util.Arrays.asList(model.bounds: _*), model.boundsSchema)
        scored.join(broadcast(boundsDf), model.groupCols, "left")
      }
    // the HOF lambda runs interpreted, but over ≤ nBuckets−1 elements of a
    // broadcast array — nothing per-token happens here
    val r = round(col("lm_logprob") + lit(1e-9), 6)
    withBounds.withColumn("ppl_bucket",
        when(col("lm_logprob").isNotNull && col("__ppl_bounds").isNotNull,
          (lit(1) + size(filter(col("__ppl_bounds"), b => r < b))).cast("int")))
      .drop("__ppl_bounds")
  }

  /** Adjacent-token (prev, cur) pair rows of the normalized tokenization,
    * one row per position; position 1 carries a null prev. Shared by the
    * bigram trainer and the bigram scorer so the pair definition cannot
    * drift. Round-11: the native [[graft.expr.TokenPairs]] kernel (one
    * tokenize pass + tight loop) replaces the interpreted
    * transform/element_at chain — which itself replaced the O(len²)
    * inline-subtree formulation (e5df939); TextExprsSpec sweeps kernel ≡
    * HOF on the hostile sample set.
    */
  private def explodedTokenPairs(df: DataFrame, textCol: String,
                                 keep: Seq[Column]): DataFrame =
    df.select(keep :+ explode(graft.expr.TokenPairs(col(textCol))).as("__pr"): _*)
      .select(keep :+ col("__pr.prev").as("__prev") :+ col("__pr.cur").as("__cur"): _*)

  /** Bigram language-model score with Stupid Backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation") — the next step up
    * from [[unigramScore]] toward the KenLM-perplexity gate of corpus
    * curation (CCNet et al.). Context makes the score far more selective:
    * shuffled or templated text shares a unigram profile with prose but
    * not a bigram one.
    *
    * Model (every float operation pinned — the DuckDB oracle replays it):
    *  - position 1:       lp = ln(tf_cur / T) if cur in vocab, else -ln(T)
    *  - bigram seen:      lp = ln(btf / tf_prev)           (conditional MLE)
    *  - backoff:          lp = ln(0.4 * (tf_cur / T)) if cur in vocab,
    *                      else ln(0.4 / T)
    *  - doc score = mean lp over all n positions.
    * The bigram table holds the top `bigramSize` pairs by count (ties:
    * prev asc, cur asc) restricted to pairs whose BOTH tokens are in the
    * top-`vocabSize` unigram vocabulary — so the denominator tf_prev is
    * always the broadcast vocabulary's own count and the two tables can
    * never disagree about a token.
    *
    * Scale shape mirrors unigramScore, with ONE tokenization pass for
    * training: the exploded (prev, cur) relation visits every token
    * exactly once as `cur` (position 1 rides along with a null prev), so
    * unigram counts, the total T, the vocabulary and the bigram table all
    * derive from a single map-side-combined pair-count aggregate — keys
    * are pairs, uniform. SCORING is a pure map (round 14): the capped
    * tables ride the plan as a frozen [[graft.expr.BigramLm]] and
    * [[graft.expr.BigramLogProbMean]] folds the backoff in-row — the old
    * pair explode, its two broadcast joins, the doc-keyed re-aggregate
    * and the join-back exchanges are gone. Driver memory is bounded by
    * vocabSize + bigramSize.
    *
    * BENCH-SF WALL IS FIXED-COST, NOT THROUGHPUT (round-11 audit of the
    * r8→r10 q_lm_bigram drift, 1.92→2.50 s while the box got faster):
    * measured at calibration parity (cpu probe 1.68–1.75 s), the isolated
    * median-of-5 is 2.20 s at sf0.1 and 2.57 s at sf0.01 — 10× LESS data,
    * same-or-more wall — so the bench wall is ~100% per-job overhead
    * (5 scheduled jobs: persist fill, total-T agg, vocab top-k collect,
    * bigram-table collect, scoring write — plus two broadcast builds and
    * the large backoff-expression codegen), ~0% data throughput. Cross-
    * round drift in this number tracks the container's scheduler/JIT
    * state, not the plan (unchanged since r8, `git diff` verified); the
    * r9 artifact corroborates: a 2.4×-slower box (probe 4.03 s) measured
    * 2.00 s, which a throughput-bound query would have read as ~4.8 s.
    * At the 100 TB posture the two tokenize scans dominate and the job
    * count is noise — the plan optimizes for that regime deliberately.
    *
    * Adds `n_tokens` and `lm2_logprob` (null for token-free docs).
    */
  def bigramScore(df: DataFrame, textCol: String, idCol: String,
                  corpus: DataFrame = null, corpusTextCol: String = null,
                  vocabSize: Int = 50000, bigramSize: Int = 200000): DataFrame = {
    require(vocabSize > 0, s"bigramScore: vocabSize must be positive, got $vocabSize")
    require(bigramSize > 0, s"bigramScore: bigramSize must be positive, got $bigramSize")
    val train = Option(corpus).getOrElse(df)
    val trainText = Option(corpusTextCol).getOrElse(textCol)
    val (vocabPairs, totalT, bigramRows) = bigramModel(train, trainText, vocabSize, bigramSize)
    // pure-map scoring (round 14): the capped tables ride the plan as a
    // frozen [[graft.expr.BigramLm]] and the kernel folds the Stupid-
    // Backoff per-position log-prob in ONE in-row pass — the old scoring
    // explode, its two broadcast joins, the doc-keyed re-aggregate, and
    // the join-back are gone (the unigramScore/pplApply shape; the
    // kernel's array-order sum vs the old partition-order avg is the
    // pinned 1e-9 rounding seam, BigramParitySpec bit-compares the two
    // paths at the score rounding). NULL-id rows keep the old
    // non-participation contract: n_tokens 0, null score.
    val lm = graft.expr.BigramLm(vocabPairs, bigramRows, totalT)
    df.drop("n_tokens", "lm2_logprob")
      .withColumn("__lm2",
        when(col(idCol).isNotNull, graft.expr.BigramLogProbMean(col(textCol), lm)))
      .withColumn("n_tokens", coalesce(col("__lm2.n"), lit(0L)))
      .withColumn("lm2_logprob", col("__lm2.lp"))
      .drop("__lm2")
  }

  /** The Stupid-Backoff model election [[bigramScore]] and its retained
    * join-path parity reference share: the capped vocabulary with the
    * total T, and the vocab-restricted capped bigram table. */
  private def bigramModel(train: DataFrame, trainText: String,
                          vocabSize: Int, bigramSize: Int)
      : (Seq[(String, Long)], Double, Seq[(String, String, Long, Long)]) = {
    val sp = train.sparkSession
    import sp.implicits._
    // ONE tokenization of the training corpus: aggregate (prev, cur) pair
    // counts INCLUDING the null-prev position-1 rows. Unigram counts are a
    // re-aggregation of this relation (each token occurs exactly once as
    // `cur`), so no second wordCounts scan runs — the tokenize regex is the
    // dominant training cost at corpus scale. The aggregated relation
    // (|distinct bigrams| rows, not the token stream) is what persists.
    // Measured trade at sf0.1: the extra re-agg job costs ~10% wall there
    // (per-job overhead dominates a 600k-row corpus), bought against a
    // whole corpus scan+regex pass that dominates at the 100 TB posture.
    val pairCounts = explodedTokenPairs(train, trainText, Seq.empty)
      .select(col("__prev").as("prev"), col("__cur").as("cur"))
      .groupBy("prev", "cur").agg(count(lit(1)).as("btf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (vocabPairs, totalT, bigramRows) =
      try {
        val counts = pairCounts.groupBy("cur").agg(sum("btf").as("tf"))
          .select(col("cur").as("token"), col("tf"))
        val t = Option(counts.agg(sum("tf")).first().get(0))
          .map(_.asInstanceOf[Long].toDouble).getOrElse(0.0)
        val v = counts.orderBy(col("tf").desc, col("token").asc)
          .limit(vocabSize).collect()
          .map(r => (r.getString(0), r.getLong(1)))
          .toSeq
        // Bigram side: vocab-restricted via two broadcast semijoins, capped
        // with a distributed TakeOrdered. Only the capped table ever
        // reaches the driver.
        val vDf = v.toDF("token", "tf")
        val b = pairCounts.filter(col("prev").isNotNull)
          .join(broadcast(vDf.select(col("token").as("prev"), col("tf").as("ptf"))), Seq("prev"))
          .join(broadcast(vDf.select(col("token").as("cur"))), Seq("cur"))
          .orderBy(col("btf").desc, col("prev").asc, col("cur").asc)
          .limit(bigramSize)
          .collect()
          .map(r => (r.getAs[String]("prev"), r.getAs[String]("cur"),
                     r.getAs[Long]("btf"), r.getAs[Long]("ptf")))
          .toSeq
        (v, t, b)
      } finally pairCounts.unpersist()
    (vocabPairs, totalT, bigramRows)
  }

  /** The explode → broadcast-joins → per-doc avg formulation of
    * [[bigramScore]]'s scoring pass — retained ONLY as the parity
    * reference for [[graft.expr.BigramLogProbMean]] (BigramParitySpec
    * bit-compares the two paths at the score rounding, the
    * langIdApplyFold discipline). Training is the shared
    * [[bigramModel]]. */
  private[graft] def bigramScoreJoinPath(df: DataFrame, textCol: String, idCol: String,
                  corpus: DataFrame = null, corpusTextCol: String = null,
                  vocabSize: Int = 50000, bigramSize: Int = 200000): DataFrame = {
    val train = Option(corpus).getOrElse(df)
    val trainText = Option(corpusTextCol).getOrElse(textCol)
    val sp = df.sparkSession
    import sp.implicits._
    val (vocabPairs, totalT, bigramRows) = bigramModel(train, trainText, vocabSize, bigramSize)
    val vocabDf = vocabPairs.toDF("token", "tf")
    val bigramTable = bigramRows.toDF("prev", "cur", "btf", "ptf")

    val uniLp = vocabDf.select(col("token").as("cur"), col("tf").as("__utf"))
    val posLp =
      when(col("__btf").isNotNull,
        log(col("__btf").cast("double") / col("__ptf").cast("double")))
      .otherwise(when(col("__prev").isNull,
          when(col("__utf").isNotNull,
            log(col("__utf").cast("double") / lit(totalT)))
          .otherwise(-log(lit(totalT))))
        .otherwise(when(col("__utf").isNotNull,
            log(lit(0.4) * (col("__utf").cast("double") / lit(totalT))))
          .otherwise(log(lit(0.4) / lit(totalT)))))
    val perDoc = explodedTokenPairs(df, textCol, Seq(col(idCol)))
      .join(broadcast(bigramTable.select(col("prev").as("__prev"), col("cur").as("__cur"),
        col("btf").as("__btf"), col("ptf").as("__ptf"))), Seq("__prev", "__cur"), "left")
      .join(broadcast(uniLp.select(col("cur").as("__cur"), col("__utf"))), Seq("__cur"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__lm2_n"), avg(posLp).as("__lm2_lp"))
    df.drop("n_tokens", "lm2_logprob")
      .alias("__lm2_d").join(perDoc.alias("__lm2_s"), Seq(idCol), "left")
      .withColumn("n_tokens", coalesce(col("__lm2_n"), lit(0L)))
      .withColumn("lm2_logprob", col("__lm2_lp"))
      .drop("__lm2_n", "__lm2_lp")
  }

  /** Split documents into fixed-size character chunks with overlap — the
    * standard context-window preprocessing step for training/embedding
    * pipelines. Pure expression (sequence + substring), exploded to one row
    * per chunk: (doc cols..., chunk_idx, chunk_text). Stride =
    * chunkSize - overlap; the final partial chunk is kept.
    */
  /** Unicode normalization (NFC default) — see graft.expr.UnicodeNormalize:
    * precomposed vs combining-sequence spellings must collapse before any
    * hash/dedup/tokenize step sees the bytes.
    */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    graft.expr.UnicodeNormalize(text, form)

  /** Offset-greedy sequence packing: assign each document to a fixed
    * token-budget bin (pretraining sequence) by its running token offset.
    * Packing runs PER `partitionCols` group (shard/language/source): a
    * corpus-global running sum would serialize into one window partition,
    * so the global formulation is deliberately not offered — at 100 TB the
    * per-shard window keys the shuffle and every shard packs in parallel.
    * Deterministic under `orderCols` (make them a total order).
    *
    * Adds: n_tokens (whitespace token count), pack_offset (tokens before
    * this doc within its shard), pack_id (= floor(pack_offset / budget)).
    * A document straddling a boundary belongs to the bin its offset starts
    * in, so bins overflow by at most one document — the standard trade of
    * offset packing (no bin-repair shuffle).
    */
  def packDocuments(df: DataFrame, textCol: String, budgetTokens: Int,
                    partitionCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(partitionCols.nonEmpty, "packDocuments packs per shard; pass partitionCols " +
      "(a corpus-global running sum would serialize into one window partition)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", tokenCountWs(col(textCol)))
      .withColumn("pack_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("pack_offset") / budgetTokens).cast("int"))
  }

  /** Token-distribution divergence between two corpora — the drift monitor
    * of a mixture recipe: "has this source's language shifted since the
    * last snapshot?" / "how far is the web slice from the books slice?".
    *
    * Laplace-smoothed unigram distributions over the UNION vocabulary
    * (smoothing `s`: p(t) = (c(t)+s) / (N + s·V), so zero-count tokens get
    * mass and KL stays finite), then one row of summary divergences:
    * kl_ab = Σ p_a·ln(p_a/p_b), kl_ba symmetric, and js = Jensen-Shannon
    * (½KL(a‖m)+½KL(b‖m), m the mixture — bounded by ln 2, symmetric, the
    * number to alert on). All ln formulations pinned for the oracle.
    *
    * Plan: two word-count aggregates (map-side combine), a full outer join
    * on token (uniform hash keys), scalar totals broadcast back, one final
    * reduce to a single row. The corpora never shuffle — only their
    * vocabularies do.
    */
  def tokenDivergence(dfA: DataFrame, textColA: String,
                      dfB: DataFrame, textColB: String,
                      smoothing: Double = 0.5): DataFrame = {
    require(smoothing > 0.0, s"tokenDivergence: smoothing must be > 0, got $smoothing")
    val ca = wordCounts(dfA, textColA).withColumnRenamed("tf", "ca")
    val cb = wordCounts(dfB, textColB).withColumnRenamed("tf", "cb")
    // EAGER, like unigramScore: the joined vocabulary feeds two aggregates
    // (totals, then the divergence sums) — left lazy and uncached, both
    // corpus scans and the vocabulary join would execute twice; a
    // session-lifetime persist nothing can release is the alternative
    // hazard. Cache for exactly the two actions, then release.
    val joined = ca.join(cb, Seq("token"), "full_outer")
      .select(coalesce(col("ca"), lit(0L)).as("ca"), coalesce(col("cb"), lit(0L)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (klAb, klBa, js) =
      try {
        val t = joined.agg(
          sum("ca").cast("double"), sum("cb").cast("double"),
          count(lit(1)).cast("double")).first()
        if (t.isNullAt(0) || t.isNullAt(1)) (0.0, 0.0, 0.0) // an empty corpus
        else {
          val (na, nb, v) = (t.getDouble(0), t.getDouble(1), t.getDouble(2))
          val pa = (col("ca").cast("double") + lit(smoothing)) / lit(na + smoothing * v)
          val pb = (col("cb").cast("double") + lit(smoothing)) / lit(nb + smoothing * v)
          val r = joined.select(pa.as("pa"), pb.as("pb"))
            .withColumn("pm", (col("pa") + col("pb")) / 2)
            .agg(
              sum(col("pa") * log(col("pa") / col("pb"))),
              sum(col("pb") * log(col("pb") / col("pa"))),
              ((sum(col("pa") * log(col("pa") / col("pm"))) +
                sum(col("pb") * log(col("pb") / col("pm")))) / 2))
            .first()
          (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        }
      } finally joined.unpersist()
    val sp = dfA.sparkSession
    import sp.implicits._
    Seq((klAb, klBa, js)).toDF("kl_ab", "kl_ba", "js")
  }

  /** Order-preserving collect: gather `payload` values of a group as an
    * array sorted by `order` — THE idiom for reassembling exploded or
    * packed rows, shared by materializePacks and Bpe.encode. A bare
    * collect_list has no cross-shuffle order guarantee; sorting (order,
    * payload) structs restores it, with payload as the tie-break.
    */
  private[graft] def collectInOrder(order: Column, payload: Column): Column =
    transform(array_sort(collect_list(struct(order.as("__ord"), payload.as("__pay")))),
      s => s.getField("__pay"))

  /** Materialize packed documents into one row per pretraining sequence:
    * group on (partitionCols, pack_id), concatenate texts in pack_offset
    * order with `sep` between documents — the step after `packDocuments`
    * that produces what the trainer actually reads. Equal offsets
    * (zero-token docs) tie-break on the text.
    *
    * One shuffle on the pack key. Packs are TOKEN-budget-bounded, which
    * bounds the group only when every doc carries ≥1 token — any number of
    * zero/null-token docs share one pack_offset and would collect into a
    * single task, so drop token-free docs before packing (a curation
    * pipeline's quality gate does this anyway).
    */
  def materializePacks(packed: DataFrame, textCol: String,
                       partitionCols: Seq[String], sep: String = "\n\n"): DataFrame = {
    val keys = partitionCols :+ "pack_id"
    packed.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        array_join(collectInOrder(col("pack_offset"), col(textCol)), sep).as("pack_text"))
  }

  def chunkDocuments(df: DataFrame, textCol: String, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize); got $overlap — a negative overlap " +
      "widens the stride past chunkSize and silently skips text between chunks")
    val stride = chunkSize - overlap
    val t = col(textCol)
    val nChunks = greatest(ceil((length(t) - overlap).cast("double") / stride).cast("int"), lit(1))
    // explode_outer: a null text must keep its row (null chunk) — a plain
    // explode over the null sequence would silently drop the document
    df.withColumn("chunk_idx", explode_outer(sequence(lit(0), nChunks - 1)))
      .withColumn("chunk_text", t.substr(col("chunk_idx") * stride + 1, lit(chunkSize)))
      .drop(textCol)
  }

  /** PII redaction for free text: emails, international/US phone numbers,
    * and IPv4 addresses are replaced with typed placeholder tokens — the
    * standard corpus-curation scrub before training. Pure regexp_replace
    * chain (codegen'd, one pass per pattern, oracle-expressible).
    * Patterns are deliberately conservative (precision over recall): a
    * missed phone is recoverable downstream, a mangled number-that-wasn't
    * is not.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "(?:\\+?\\d{1,3}[-. ])?\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Flesch reading-ease over the normalized text — the classic
    * readability curation signal (very low scores flag legalese/generated
    * sludge, implausibly high ones flag word salad). Heuristics are the
    * standard dictionary-free ones, pinned for the oracle: sentences =
    * terminal-punctuation runs `[.!?]+` (min 1 when any word exists),
    * syllables per word = vowel-group count `[aeiouy]+` floored at 1.
    * flesch = 206.835 − 1.015·(W/S) − 84.6·(Y/W), null for wordless text.
    * Row-local (one interpreted-HOF pass per row — fine for a scalar
    * scan; the hot-path kernels stay native). Adds rd_words /
    * rd_sentences / rd_syllables / flesch.
    */
  def readability(df: DataFrame, textCol: String): DataFrame = {
    val norm = normalized(col(textCol))
    val bound = df.withColumn("__norm", norm)
      .withColumn("__ws", filter(split(col("__norm"), " "), t => t =!= ""))
    val words = size(col("__ws")).cast("long")
    val sentencesRaw = (size(split(col("__norm"), "[.!?]+")) - 1).cast("long")
    val sentences = when(words > 0, greatest(sentencesRaw, lit(1L)))
    val syl = aggregate(col("__ws"), lit(0L),
      (acc, t) => acc + greatest(size(split(t, "[aeiouy]+")) - 1, lit(1)).cast("long"))
    val wD = col("rd_words").cast("double")
    val sD = col("rd_sentences").cast("double")
    val yD = col("rd_syllables").cast("double")
    bound
      .withColumn("rd_words", words)
      .withColumn("rd_sentences", sentences)
      .withColumn("rd_syllables", when(words > 0, syl))
      .withColumn("flesch",
        when(col("rd_words") > 0,
          lit(206.835) - lit(1.015) * (wD / sD) - lit(84.6) * (yD / wD)))
      .drop("__norm", "__ws")
  }

  /** Keyword-in-context (KWIC) extraction: every occurrence of `term` in
    * the normalized tokenization with ±`window` tokens of context — the
    * corpus-inspection primitive behind "show me how this term is used"
    * audits (eval-leakage triage, slur-list review, tokenizer debugging).
    * Row-local posexplode + array slices — embarrassingly parallel, no
    * shuffle at all; the output is one row per occurrence
    * (id, position [1-based token index], left_context, keyword,
    * right_context). Matching is exact on the normalized (lowercased)
    * token, like every other tokenizer-family op here.
    */
  def keywordInContext(df: DataFrame, textCol: String, idCol: String,
                       term: String, window: Int = 5): DataFrame = {
    require(window >= 0, s"keywordInContext: window must be >= 0, got $window")
    require(term != null && term.nonEmpty, "keywordInContext: term must be non-empty")
    // bind the token array first — posexplode over the inline subtree
    // would re-run the tokenize regex per position (explodedTokenPairs'
    // documented O(len²) hazard)
    val bound = df.select(col(idCol), split(normalized(col(textCol)), " ").as("__toks"))
    bound
      .select(col(idCol), col("__toks"),
        posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      .filter(col("__tok") === lit(term.toLowerCase(java.util.Locale.ROOT)) &&
        col("__tok") =!= "")
      .select(col(idCol),
        (col("__pos") + 1).as("position"),
        array_join(slice(col("__toks"),
          greatest(lit(1), col("__pos") + 1 - window), least(col("__pos"), lit(window))), " ")
          .as("left_context"),
        col("__tok").as("keyword"),
        array_join(slice(col("__toks"), col("__pos") + 2, lit(window)), " ")
          .as("right_context"))
  }

  def redactPii(text: Column,
                emailToken: String = "<EMAIL>",
                phoneToken: String = "<PHONE>",
                ipToken: String = "<IP>"): Column = {
    // order matters: emails first (their local part can contain digits that
    // would otherwise partially match the phone pattern), then IPs (dotted
    // digits that overlap phone-ish shapes), phones last
    val noEmail = regexp_replace(text, EmailRe, emailToken)
    val noIp = regexp_replace(noEmail, Ipv4Re, ipToken)
    regexp_replace(noIp, PhoneRe, phoneToken)
  }

  /** Intra-document repetition ratio (MassiveText/Gopher-style quality
    * signal): 1 − distinct/total word n-grams. 0 = no repetition; →1 for
    * template/boilerplate spam. One pass over the shingle multiset.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val norm = normalized(text)
    val words = split(norm, " ")
    val total = greatest(size(words) - (n - 1), lit(0))
    // distinct n-grams via the WordShingles expr (already deduplicated)
    val distinctN = when(size(words) >= n, size(shingles(text, n))).otherwise(lit(0))
    when(total > 0, round(lit(1.0) - distinctN / total.cast("double"), 6)).otherwise(lit(0.0))
  }

  /** The 27 cp1252-specific characters (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ‘ ’ “ ”
    * • – — ˜ ™ š › œ ž Ÿ) and the 0x80–0x9F bytes they decode from — the
    * "sloppy windows-1252" table ftfy uses: translating them back to the
    * raw byte values makes a plain ISO-8859-1 encode reproduce the
    * original mis-decoded byte stream exactly. */
  private val Cp1252Chars =
    "€‚ƒ„…†‡ˆ‰Š‹ŒŽ" +
    "‘’“”•–—˜™š›œžŸ"
  private val Cp1252Bytes =
    "" +
    ""

  /** ftfy-style mojibake repair (ONE decoding layer): text whose UTF-8
    * bytes were mis-decoded as Latin-1/Windows-1252 — "cafÃ©",
    * "donâ€™t" — is re-encoded through the sloppy-cp1252 table and
    * re-decoded as UTF-8. The repair is ACCEPTED only when all three
    * guards hold, else the row passes through untouched:
    *   1. the text matches the mojibake marker pattern (a UTF-8
    *      lead-byte character Â–ï followed by a continuation-class
    *      character — legitimate prose essentially never does);
    *   2. the candidate contains no U+FFFD (the re-decode consumed every
    *      byte as well-formed UTF-8);
    *   3. the candidate is strictly shorter (a real fix always collapses
    *      2–3 characters into 1).
    * Conservative by design: a document mixing mojibake WITH legitimate
    * cp1252-specific characters (a real € next to â€™) fails guard 2 and
    * is left alone rather than half-repaired. Doubly-encoded mojibake
    * needs one application per layer (apply twice if your crawl has it;
    * q_mojibake_law pins single-layer round-trip + clean-text no-op +
    * idempotence after a successful fix). Null → null.
    */
  def fixMojibake(text: Column): Column = {
    val marker = "[Â-ßà-ï][-¿" + Cp1252Chars + "]"
    val candidate = decode(encode(translate(text, Cp1252Chars, Cp1252Bytes),
      "ISO-8859-1"), "UTF-8")
    when(text.isNotNull && text.rlike(marker) &&
        !candidate.contains("�") && length(candidate) < length(text),
      candidate).otherwise(text)
  }

  /** SoftDeDup weighting (round 11 — the reweight-instead-of-drop
    * alternative to [[graft.text.Dedup.exact]]): every document KEEPS its
    * row but gains `dup_count` (the size of its exact-duplicate group,
    * keyed by the sha2 of the normalized text — [[Dedup.exact]]'s group
    * definition verbatim) and `soft_weight` = 1/dup_count, 6dp-rounded —
    * the per-sample loss weight that makes n copies of a page together
    * count as one, without discarding any copy's surrounding mixture
    * context. Null-text rows are no duplicate of anything: dup_count 1,
    * weight 1.0.
    *
    * Scale shape: ONE exchange on the uniform 256-bit hash (a window
    * count over the same partitioning exact-dedup elects in) — no join
    * back, the corpus streams through once.
    */
  def softDedupWeights(df: DataFrame, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__sd_h"))
    df.withColumn("__sd_h", sha2(normalized(col(textCol)), 256))
      .withColumn("dup_count",
        when(col("__sd_h").isNull, lit(1L)).otherwise(count(lit(1)).over(w)))
      .withColumn("soft_weight",
        round(lit(1.0) / col("dup_count").cast("double") + lit(1e-9), 6))
      .drop("__sd_h")
  }

  /** The full MassiveText/Gopher A1.1 repetition-signal family (Rae et al.
    * 2021, Table A1) as ONE pass — the measurement side of the repetition
    * cleaners ([[dedupLines]] acts on lines, [[repetitionRatio]] is the
    * distinct-gram summary; these are the per-signal fractions the paper
    * thresholds):
    *
    *  - `dup_line_frac`: non-first-occurrence lines / total non-empty
    *    lines (lines = raw text split on newline, trimmed-empty excluded).
    *  - `dup_line_char_frac`: characters in those duplicated lines /
    *    total line characters.
    *  - `top_ngram_char_frac`: occurrences(most frequent word `topN`-gram)
    *    × gram length / normalized text length (the gram renders with
    *    single spaces — the normalized-text convention; ties on count
    *    break toward the lexicographically smallest gram, pinned for the
    *    oracle).
    *  - `dup_ngram_char_frac`: Σ over duplicated `dupN`-grams (count ≥ 2)
    *    of count × gram length / normalized text length. Overlapping
    *    occurrences each count — the sum can exceed 1 on degenerate spam;
    *    reported RAW (a gate clips where it thresholds).
    *
    * Fractions are null for documents with no lines / too few tokens (the
    * gopherRules null→false convention applies at any consuming gate).
    *
    * Scale shape: the line signals are a pure per-row map (arrays hoisted
    * once); the n-gram signals explode grams into a map-side-combined
    * (id, gram) count aggregate — uniform keys, the bigramScore trainer's
    * exchange — then ONE per-id aggregate and an id-keyed join back.
    * Adds the four columns, 6dp-rounded.
    */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String,
                        topN: Int = 2, dupN: Int = 5): DataFrame = {
    require(topN >= 1, s"repetitionSignals: topN must be >= 1, got $topN")
    require(dupN >= 1, s"repetitionSignals: dupN must be >= 1, got $dupN")
    val staged = df
      .withColumn("__rs", graft.expr.LineRepStats(col(textCol)))
      .withColumn("__rs_norm", normalized(col(textCol)))
    // line signals: native one-pass first-seen kernel (round 12 — the
    // interpreted filter+array_position HOF was O(lines²·lineLen) per
    // document, VERDICT r11 #1; TextExprsSpec pins kernel ≡ HOF)
    val withLines = staged
      .withColumn("dup_line_frac",
        when(col("__rs.n_lines") > 0,
          round(col("__rs.n_dup").cast("double") / col("__rs.n_lines") + lit(1e-9), 6)))
      .withColumn("dup_line_char_frac",
        when(col("__rs.chars") > 0,
          round(col("__rs.dup_chars").cast("double") / col("__rs.chars") + lit(1e-9), 6)))
    // n-gram signals: ONE fused in-row kernel (round 14) — the signals are
    // counts of the document's OWN grams, so the four corpus-keyed
    // exchanges the relational shape paid (explode ×2, groupBy (doc, gram)
    // ×2 via the union, per-doc re-aggregate, join-back) computed a
    // row-local quantity; GramRepStats counts both gram orders in one
    // tokenize pass and elects the same (max count, UTF8String-smallest
    // gram) top. Null-id docs keep the old non-participation nulls.
    // RepSignalsParitySpec pins kernel ≡ the retained relational reference
    // ([[repetitionSignalsRelational]]) on randomized corpora.
    withLines
      .withColumn("__gr",
        when(col(idCol).isNotNull, graft.expr.GramRepStats(col(textCol), topN, dupN)))
      .withColumn("top_ngram_char_frac",
        when(length(col("__rs_norm")) > 0 && col("__gr.top_c").isNotNull,
          round(col("__gr.top_c") * col("__gr.top_len") / length(col("__rs_norm")).cast("double")
            + lit(1e-9), 6)))
      // null ⇔ the doc had fewer than dupN tokens (absent from the dup
      // relation) — a doc WITH dupN-grams but no duplicated ones reads 0.0
      .withColumn("dup_ngram_char_frac",
        when(length(col("__rs_norm")) > 0 && col("__gr.has_dup").isNotNull,
          round(coalesce(col("__gr.dup_chars"), lit(0L)).cast("double")
            / length(col("__rs_norm")) + lit(1e-9), 6)))
      .drop("__rs", "__rs_norm", "__gr")
  }

  /** The relational (explode → count → re-aggregate → join-back) n-gram
    * half of [[repetitionSignals]] — retained ONLY as the parity reference
    * for [[graft.expr.GramRepStats]] (RepSignalsParitySpec sweeps kernel ≡
    * relation, the langIdApplyFold discipline). Line signals are identical
    * in both paths (same [[graft.expr.LineRepStats]] kernel). */
  private[graft] def repetitionSignalsRelational(df: DataFrame, textCol: String, idCol: String,
                        topN: Int = 2, dupN: Int = 5): DataFrame = {
    val staged = df
      .withColumn("__rs", graft.expr.LineRepStats(col(textCol)))
      .withColumn("__rs_norm", normalized(col(textCol)))
    val withLines = staged
      .withColumn("dup_line_frac",
        when(col("__rs.n_lines") > 0,
          round(col("__rs.n_dup").cast("double") / col("__rs.n_lines") + lit(1e-9), 6)))
      .withColumn("dup_line_char_frac",
        when(col("__rs.chars") > 0,
          round(col("__rs.dup_chars").cast("double") / col("__rs.chars") + lit(1e-9), 6)))
    def gramRel(n: Int, tag: String) = withLines
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("__rs_id"),
        explode(graft.expr.WordGrams(col(textCol), n)).as("gram"))
      .groupBy(col("__rs_id"), col("gram")).agg(count(lit(1)).as("c"))
      .withColumn("__tag", lit(tag))
    val counts = gramRel(topN, "top").unionByName(gramRel(dupN, "dup"))
    val perDoc = counts.groupBy(col("__rs_id"))
      .agg(
        // deterministic top gram: max count, ties to smallest gram — min
        // over (−c, gram) instead of fighting struct max semantics
        min(when(col("__tag") === "top", struct((-col("c")).as("nc"), col("gram").as("g"))))
          .as("__top"),
        max(when(col("__tag") === "dup", lit(1))).as("__hasdup"),
        sum(when(col("__tag") === "dup" && col("c") >= 2,
          col("c") * length(col("gram")))).as("__dupchars"))
      .select(col("__rs_id"),
        (-col("__top.nc")).as("__topc"), length(col("__top.g")).as("__toplen"),
        col("__hasdup"), col("__dupchars"))
    withLines
      .join(perDoc, col(idCol) === col("__rs_id"), "left")
      .withColumn("top_ngram_char_frac",
        when(length(col("__rs_norm")) > 0 && col("__topc").isNotNull,
          round(col("__topc") * col("__toplen") / length(col("__rs_norm")).cast("double")
            + lit(1e-9), 6)))
      .withColumn("dup_ngram_char_frac",
        when(length(col("__rs_norm")) > 0 && col("__hasdup").isNotNull,
          round(coalesce(col("__dupchars"), lit(0L)).cast("double")
            / length(col("__rs_norm")) + lit(1e-9), 6)))
      .drop("__rs", "__rs_norm", "__rs_id", "__topc", "__toplen", "__hasdup", "__dupchars")
  }

  /** The HOF formulation of the [[repetitionSignals]] line statistics —
    * retained ONLY as the parity reference for [[graft.expr.LineRepStats]]
    * (TextExprsSpec sweeps kernel ≡ HOF). Same struct shape:
    * (n_lines, n_dup, chars, dup_chars) over trim-non-blank lines. */
  private[graft] def lineRepStatsHof(t: Column): Column = {
    val lines = filter(split(t, "\n"), l => trim(l) =!= "")
    val dup = filter(lines, (x, i) => array_position(lines, x) =!= i + 1)
    struct(
      size(lines).as("n_lines"),
      size(dup).as("n_dup"),
      aggregate(lines, lit(0L), (a, x) => a + length(x)).as("chars"),
      aggregate(dup, lit(0L), (a, x) => a + length(x)).as("dup_chars"))
  }

  /** 64-bit document fingerprint: min of xxhash64 over word shingles —
    * stable under whitespace/case noise, computable in one expression.
    * (A 1-permutation MinHash; see MinHashDedup for the k-permutation form.)
    */
  def fingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => xxhash64(s)))

  /** Winnowing fingerprint set (Schleimer et al. 2003, the MOSS scheme):
    * sorted distinct minima of every `w`-window over the positional k-gram
    * hashes. Guarantees every shared run of at least w+k-1 tokens
    * contributes at least one COMMON fingerprint between two documents,
    * at ~1/w the storage of the full gram set — the standard
    * plagiarism/overlap screen when duplicateSpans' full gram relation is
    * too heavy to keep around. Texts shorter than k tokens yield an empty
    * set; k ≤ tokens < w+k-1 yield the single global minimum; NULL text
    * yields NULL. Fingerprint VALUES are xxhash64-family — engine-side
    * only (spec-gated overlap laws, no SQL oracle). Both stages are native
    * expressions (WordGramHashes → WinnowMins, an O(n) monotonic-deque
    * sliding min) — the HOF slice/array_min chain was O(n·w) interpreted.
    */
  def winnowFingerprint(text: Column, k: Int = 5, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, s"winnowFingerprint: k and w must be >= 1, got k=$k w=$w")
    graft.expr.WinnowMins(graft.expr.WordGramHashes(text, k), w)
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "but", "if", "then", "of", "in", "on", "at", "to", "for",
    "with", "by", "from", "as", "is", "are", "was", "were", "be", "been", "it", "this", "that",
    "he", "she", "they", "we", "you", "i", "his", "her", "their", "our", "not", "no", "so", "do")

  /** Top-stopword marker lists per language (public, common knowledge). */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "are", "this"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "den", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour", "pas", "sur", "avec"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "en", "que", "por", "para", "con", "del"),
    "it" -> Seq("il", "la", "che", "di", "e", "un", "una", "per", "non", "sono", "con", "del", "gli"),
    "pt" -> Seq("o", "a", "os", "as", "e", "que", "um", "uma", "para", "com", "não", "por", "do"))
}
