package graft

import org.apache.spark.sql.functions._
import graft.text.TextLib

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String*): Seq[String] =
    html.toDF("h").select(TextLib.htmlToText(col("h"))).as[String].collect().toSeq

  test("tags, scripts, comments, block structure") {
    assert(strip(
      "<html><head><script>if (a<b) x();</script></head><body><p>Hi</p></body></html>",
      "<style>.x { color: red; }</style>Visible",
      "before<!-- hidden <p>not a para</p> -->after",
      "<div>one</div><div>two</div>",          // block tags keep paragraphs
      "a<span>b</span>c",                      // inline tags -> space
      "<IMG src='x.png' alt='a > b'>tail") == Seq(
      "Hi",
      "Visible",
      "before after",
      "one\n\ntwo",
      "a b c",
      // '>' inside an attribute ends the tag at regex level (documented:
      // not a DOM parser) — the remainder of the attribute survives
      "b'>tail"))
  }

  test("entities: named, numeric, malformed, bare ampersands") {
    assert(strip(
      "A &amp; B &lt;x&gt; &quot;q&quot;",
      "caf&#233; &#x1F600; ok",          // decimal + hex (astral plane)
      "5 &gt 3 & more &unknown; &#xZZ; &#;", // malformed stay literal
      "a&nbsp;b") == Seq(
      "A & B <x> \"q\"",
      "café 😀 ok",
      "5 &gt 3 & more &unknown; &#xZZ; &#;",
      "a b"))
  }

  test("entities: accented letters, windows-1252 numerics, non-ASCII digits") {
    assert(strip(
      "caf&eacute; fran&ccedil;ais &Eacute;t&eacute;",  // Latin-1 letters, both cases
      "it&#146;s &#147;quoted&#148; &#128;5",           // legacy CMS C1 range
      "a&#160;b &#xA0;c",                               // numeric nbsp = plain space
      "&#١٢٣; and &#６５; stay literal") == Seq(        // Arabic-Indic / fullwidth digits
      "café français Été",
      "it’s “quoted” €5",
      "a b c",
      "&#١٢٣; and &#６５; stay literal"))
    // unmapped C1 slots must NOT inject control bytes
    assert(strip("x&#129;y") == Seq("x&#129;y"))
  }

  test("hostile markup: commented scripts, truncation, junk close tags, hidden elements") {
    assert(strip(
      "<!-- add <script> here -->Hello<script>x()</script>",  // comment must strip FIRST
      "<p>Hi</p><script>var a=1;function f(){",               // truncated block swallows to EOF
      "<script>evil()</script x>done",                        // junk in the close tag
      "<head><title>Buy cheap | ACME</title></head><p>Article</p>", // title never renders
      "<noscript>enable js</noscript>visible",
      "<textarea>draft text</textarea>after") == Seq(
      "Hello",
      "Hi",
      "done",
      "Article",
      "visible",
      "after"))
  }

  test("null and whitespace normalization") {
    val out = Seq[Option[String]](None, Some("  <p> lots   of\t space </p>  "))
      .toDF("h").select(TextLib.htmlToText(col("h"))).collect()
    assert(out(0).isNullAt(0), "null html stays null")
    assert(out(1).getString(0) == "lots of space")
  }

  test("surrogate-range and out-of-range numeric references stay literal") {
    assert(strip("&#xD800; &#x110000; &#0;") == Seq("&#xD800; &#x110000; &#0;"))
  }

  test("SQL registration and codegen/interpreted parity") {
    graft.expr.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_html_unescape('x &amp; &#66;')").collect()(0).getString(0)
    assert(viaSql == "x & B")
    val df = Seq("a &amp; b &#67; &bad; &#x44;").toDF("h")
    def run(): String = df.select(graft.expr.HtmlEntityDecode(col("h"))).collect()(0).getString(0)
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
      assert(gen == run() && gen == "a & b C &bad; D")
    } finally prev.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
