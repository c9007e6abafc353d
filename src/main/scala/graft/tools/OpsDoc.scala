package graft.tools

import java.nio.file.{Files, Paths}

/** docs/OPS.md generator — the YAML op surface extracted from the TWO
  * dispatch points themselves (core/PipelineConfig.scala for `type:`
  * values and transform sub-ops; core/OpSpec.scala's OpCompiler for every
  * dynamic family's `operation:` values and their params), so the
  * document cannot drift from the code: OpsDocSpec regenerates it on
  * every build and fails when the committed file is stale (VERDICT r6
  * #7 — the op set had grown ~30 ops past the README's examples).
  *
  * Extraction is deliberately source-level: the dynamic families take
  * `Map[String, Any]` params, so reflection sees nothing — but every
  * param read goes through the s()/seqOf()/intSeq()/pairs() helpers,
  * which makes the accepted keys and defaults mechanically greppable.
  *
  * Regenerate: `java -cp 'target/scala-2.13/classes:/opt/spark/jars/...'
  * graft.tools.OpsDoc` (writes docs/OPS.md in the CWD).
  */
object OpsDoc {

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  /** `case "x" =>` values inside `text`. */
  private def caseValues(text: String): Seq[String] =
    "case \"([a-z_0-9|]+)\"".r.findAllMatchIn(text).map(_.group(1)).toSeq.distinct

  /** Region of `text` from the line containing `from` up to (excluding)
    * the next occurrence of any of `until`. */
  private def region(text: String, from: String, until: Seq[String]): String = {
    val i = text.indexOf(from)
    require(i >= 0, s"OpsDoc: marker not found: $from")
    val tail = text.substring(i)
    val end = until.map(u => tail.indexOf(u, from.length)).filter(_ > 0) match {
      case Nil => tail.length
      case es  => es.min
    }
    tail.substring(0, end)
  }

  private final case class Param(name: String, kind: String, default: Option[String])

  /** Params referenced through the dynamic-dispatch helpers in `block`.
    * Literal string defaults render verbatim; expression defaults render
    * as `expr`. Insertion-ordered, deduplicated, `operation` excluded.
    */
  private def params(block: String): Seq[Param] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Param]
    def add(p: Param): Unit = if (p.name != "operation" && !out.contains(p.name)) out(p.name) = p
    val scalar = """s\(p,\s*"([a-z_0-9]+)"\s*(?:,\s*([^()]+?))?\)""".r
    scalar.findAllMatchIn(block).foreach { m =>
      val dflt = Option(m.group(2)).map(_.trim).map { d =>
        if (d.startsWith("\"") && d.endsWith("\"")) d.substring(1, d.length - 1) else "expr"
      }
      add(Param(m.group(1), "scalar", dflt))
    }
    """seqOf\(p,\s*"([a-z_0-9]+)"\)""".r.findAllMatchIn(block)
      .foreach(m => add(Param(m.group(1), "list", None)))
    """intSeq\(p,\s*"([a-z_0-9]+)"\)""".r.findAllMatchIn(block)
      .foreach(m => add(Param(m.group(1), "int list", None)))
    """pairs\(p,\s*"([a-z_0-9]+)"\)""".r.findAllMatchIn(block)
      .foreach(m => add(Param(m.group(1), "mapping", None)))
    """p\.get(?:OrElse)?\("([a-z_0-9]+)"""".r.findAllMatchIn(block)
      .foreach(m => add(Param(m.group(1), "any", None)))
    out.values.toSeq
  }

  private def renderParams(ps: Seq[Param]): String =
    if (ps.isEmpty) "—"
    else ps.map { p =>
      val suffix = p.kind match {
        case "list" | "int list" => "[]"
        case "mapping"           => "{}"
        case _                   => ""
      }
      p.default match {
        case Some(d) => s"`${p.name}$suffix=$d`"
        case None    => s"`${p.name}$suffix`"
      }
    }.mkString(", ")

  /** One dynamic family: split its dispatch body into per-operation case
    * blocks and tabulate (operation, params, nested sub-values).
    */
  private def familyTable(src: String, defName: String, until: Seq[String]): Seq[String] = {
    val body = region(src, defName, until)
    val caseRx = """(?m)^([ ]*)case "([a-z_0-9]+)"\s*=>""".r
    val all = caseRx.findAllMatchIn(body).toSeq
    // the family's own operations sit at the SHALLOWEST case indentation;
    // deeper cases are nested method/kind selectors inside one operation
    val outerIndent = all.map(_.group(1).length).minOption.getOrElse(0)
    val hits = all.filter(_.group(1).length == outerIndent)
    val prelude = if (hits.isEmpty) body else body.substring(0, hits.head.start)
    val rows = hits.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < hits.length) hits(i + 1).start else body.length
      val block = body.substring(m.end, end)
      val subs = caseValues(block)
      (m.group(2), renderParams(params(block)),
        if (subs.isEmpty) "" else subs.mkString(", "))
    }
    val common = params(prelude)
    val header = Seq(
      if (common.isEmpty) "" else s"Common params: ${renderParams(common)}\n",
      "| operation | params (defaults) | nested values |",
      "|---|---|---|").filter(_.nonEmpty)
    header ++ rows.map { case (op, ps, subs) => s"| `$op` | $ps | $subs |" }
  }

  def generate(mainDir: String = "src/main/scala/graft"): String = {
    val conf = read(s"$mainDir/core/PipelineConfig.scala")
    val spec = read(s"$mainDir/core/OpSpec.scala")

    val topLevel = caseValues(region(conf, "def parseOp(", Seq("def parseTransform(")))
    val transformSubs = caseValues(region(conf, "def parseTransform(", Seq("def parseAggregations(")))

    val out = new StringBuilder
    out ++= "# YAML operation surface\n\n"
    out ++= "GENERATED by `graft.tools.OpsDoc` from the dispatch code itself\n"
    out ++= "(core/PipelineConfig.scala `type:` parsing + core/OpSpec.scala's\n"
    out ++= "OpCompiler dynamic families) — do not edit by hand; OpsDocSpec fails\n"
    out ++= "the build when this file is stale. Regenerate:\n"
    out ++= "`java -cp target/scala-2.13/classes:/opt/spark/jars/'*' graft.tools.OpsDoc`.\n\n"
    out ++= "Param notation: `name=default` (literal default), `name=expr`\n"
    out ++= "(computed default), `name[]` (list), `name{}` (mapping). Families\n"
    out ++= "whose common params appear above their table read them before the\n"
    out ++= "`operation` dispatch. Nested values are inner `method:`/`kind:`-style\n"
    out ++= "selectors accepted inside that operation. For exact semantics see the\n"
    out ++= "Scaladoc of the implementing member named in OpSpec.scala.\n\n"

    out ++= "## Top-level `operations:` types (PipelineConfig.parseOp)\n\n"
    out ++= topLevel.map(t => s"`$t`").mkString(", ") + "\n\n"
    out ++= "## `transform` sub-operations (per-column `transformations:` blocks)\n\n"
    out ++= transformSubs.map(t => s"`$t`").mkString(", ") + "\n\n"

    val families = Seq(
      ("feature_engineering", "private def applyFeatureEngineering",
        Seq("private def applyTimeSeries")),
      ("time_series_processing", "private def applyTimeSeries",
        Seq("/** Inline `validate`", "private def applyTextProcessing")),
      ("text_processing", "private def applyTextProcessing",
        Seq("private def applyValidate")),
      ("multimodal", "private def applyMultimodal",
        Seq("private def applyQualityMonitor")),
      ("quality_monitor", "private def applyQualityMonitor",
        Seq("\n}")),
      ("scd2", "case Scd2Op(p)", Seq("case LayoutOp")),
      ("layout", "case LayoutOp(p)", Seq("  }\n")))
    families.foreach { case (name, marker, until) =>
      out ++= s"## `$name` (`operation:` dispatch)\n\n"
      out ++= familyTable(spec, marker, until).mkString("\n") + "\n\n"
    }

    out ++= "## Model envelopes\n\n"
    out ++= "`semantic_gate` commissioning (round 14): without `model_path` the op\n"
    out ++= "fits on `accepted_table` (a catalog table holding the frozen accepted\n"
    out ++= "corpus — never the incoming frame, whose every row would gate itself\n"
    out ++= "out at cosine 1.0) and `save_model_path` persists the model for batch\n"
    out ++= "replay and the stream `semantic_gate` transform. Sizing: the fitted\n"
    out ++= "model holds reps×dim doubles on the DRIVER heap (3–4× with boxing\n"
    out ++= "during fit) and again in EVERY task binary at apply time — 1 M reps at\n"
    out ++= "dim 768 would be ≈6 GB of raw vector payload. Both bounds fail loudly\n"
    out ++= "at fit time BEFORE any vector is collected: rows ≤ `max_reps`, and\n"
    out ++= "rows×dim ≤ 2×10⁸ doubles (`SemGate.MaxModelElems`, ≈1.6 GB raw). Past\n"
    out ++= "either bound, the snapshot-join dedup tier (`dedup_against` /\n"
    out ++= "`semantic_dedup`) is the documented route. The saved reps directory is\n"
    out ++= "sharded at ~8 M doubles (~64 MB) per file and reloads bit-identically\n"
    out ++= "regardless of file count.\n"
    out.toString
  }

  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("docs/OPS.md")
    Files.createDirectories(Paths.get(target).toAbsolutePath.getParent)
    Files.write(Paths.get(target), generate().getBytes("UTF-8"))
    println(s"wrote $target")
  }
}
