package graft.core

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Cross-run data-lineage registry — graft's equivalent of the
  * reference's `utils/lineage_tracker.py:38-284` (LineageTracker.
  * track_transformation / get_upstream_dependencies /
  * get_downstream_dependencies / get_lineage_graph /
  * generate_lineage_report).
  *
  * [[Orchestration.Lineage]] is the per-RUN snapshot (one pipeline's
  * sources → ops → sink, emitted with each run's result); this is the
  * PERSISTENT graph across runs: every tracked transformation appends
  * (source_table → target_table, transformation_type, pipeline, created,
  * metadata) edges, and the query surface walks them. The reference
  * stores rows in `metadata.data_lineage`; here the store is the same
  * JSONL journal the DataCatalog uses (Json.value lines in, Json.parse
  * out, malformed/truncated lines skipped, single writer per dir).
  * Lineage records are immutable FACTS — unlike the catalog there is no
  * last-write-wins: every appended edge loads.
  *
  * Graph semantics mirror the reference's `traverse`: depth-capped BFS
  * from the start table, upstream arms recurse upstream-only and
  * downstream arms downstream-only (no flip-flopping through the start
  * node), `depth` counts hops from the start. One deliberate divergence:
  * edges are DEDUPLICATED on (source, target, transformation, pipeline)
  * — the reference re-appends an edge every time a node is reached
  * through a second path, which is noise for a report consumer.
  */
object LineageTracker {

  final case class LineageRecord(
      id: String, sourceTable: String, targetTable: String,
      transformationType: String, pipelineName: String,
      createdMs: Long, metadata: Map[String, String])

  final case class LineageGraphEdge(
      source: String, target: String, transformation: String, pipeline: String)
}

final class LineageTracker(dir: String,
                           clock: () => Long = () => System.currentTimeMillis()) {
  import LineageTracker._

  private val journal: Path = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    d.resolve("lineage.jsonl")
  }

  private val records = scala.collection.mutable.ArrayBuffer.empty[LineageRecord]
  load()

  /** track_transformation (lineage_tracker.py:60-111): ONE lineage id,
    * one edge record per source table. Returns the id.
    */
  def trackTransformation(sourceTables: Seq[String], targetTable: String,
                          transformationType: String, pipelineName: String,
                          metadata: Map[String, String] = Map.empty): String = synchronized {
    require(sourceTables.nonEmpty, "trackTransformation: need at least one source table")
    val id = java.util.UUID.randomUUID().toString
    val now = clock()
    sourceTables.foreach { src =>
      val r = LineageRecord(id, src, targetTable, transformationType, pipelineName, now, metadata)
      Files.write(journal, (toLine(r) + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      records += r
    }
    id
  }

  /** get_upstream_dependencies: edges INTO `table`, newest first. */
  def upstreamDependencies(table: String): Seq[LineageRecord] = synchronized {
    records.filter(_.targetTable == table).toSeq.sortBy(-_.createdMs)
  }

  /** get_downstream_dependencies: edges OUT of `table`, newest first. */
  def downstreamDependencies(table: String): Seq[LineageRecord] = synchronized {
    records.filter(_.sourceTable == table).toSeq.sortBy(-_.createdMs)
  }

  /** get_lineage_graph (lineage_tracker.py:187-239): nodes + edges within
    * `depth` hops of `table` (upstream arms walk upstream-only,
    * downstream arms downstream-only, like the reference).
    */
  def lineageGraph(table: String, depth: Int = 2): (Seq[String], Seq[LineageGraphEdge]) = synchronized {
    val nodes = scala.collection.mutable.LinkedHashSet.empty[String]
    val edges = scala.collection.mutable.LinkedHashSet.empty[LineageGraphEdge]
    def traverse(current: String, d: Int, direction: String): Unit = {
      if (d > depth) return
      nodes += current
      if (direction == "both" || direction == "upstream")
        upstreamDependencies(current).foreach { dep =>
          nodes += dep.sourceTable
          edges += LineageGraphEdge(dep.sourceTable, current,
            dep.transformationType, dep.pipelineName)
          traverse(dep.sourceTable, d + 1, "upstream")
        }
      if (direction == "both" || direction == "downstream")
        downstreamDependencies(current).foreach { dep =>
          nodes += dep.targetTable
          edges += LineageGraphEdge(current, dep.targetTable,
            dep.transformationType, dep.pipelineName)
          traverse(dep.targetTable, d + 1, "downstream")
        }
    }
    traverse(table, 0, "both")
    (nodes.toSeq, edges.toSeq)
  }

  /** generate_lineage_report (lineage_tracker.py:241-284): the
    * reference's exact section shape, dates as ISO instants.
    */
  def generateLineageReport(table: String): String = {
    def iso(ms: Long) = java.time.Instant.ofEpochMilli(ms).toString
    val up = upstreamDependencies(table)
    val down = downstreamDependencies(table)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    out += s"Data Lineage Report for: $table"
    out += "=" * 50
    out += ""
    if (up.nonEmpty) {
      out += "Upstream Dependencies:"
      out += "-" * 25
      up.foreach { dep =>
        out += s"  • ${dep.sourceTable} → $table"
        out += s"    Transformation: ${dep.transformationType}"
        out += s"    Pipeline: ${dep.pipelineName}"
        out += s"    Date: ${iso(dep.createdMs)}"
        out += ""
      }
    } else { out += "No upstream dependencies found."; out += "" }
    if (down.nonEmpty) {
      out += "Downstream Dependencies:"
      out += "-" * 27
      down.foreach { dep =>
        out += s"  • $table → ${dep.targetTable}"
        out += s"    Transformation: ${dep.transformationType}"
        out += s"    Pipeline: ${dep.pipelineName}"
        out += s"    Date: ${iso(dep.createdMs)}"
        out += ""
      }
    } else { out += "No downstream dependencies found."; out += "" }
    out.mkString("\n")
  }

  // ------------------------------------------------------------- journal

  private def toLine(r: LineageRecord): String =
    Json.value(Map(
      "id" -> r.id, "source_table" -> r.sourceTable, "target_table" -> r.targetTable,
      "transformation_type" -> r.transformationType, "pipeline_name" -> r.pipelineName,
      "created" -> r.createdMs, "metadata" -> r.metadata))

  private def load(): Unit =
    if (Files.exists(journal)) {
      // terminate a crash-truncated tail so the next append starts clean
      // (the DataCatalog journal's contract)
      val bytes = Files.readAllBytes(journal)
      if (bytes.nonEmpty && bytes.last != '\n')
        Files.write(journal, "\n".getBytes("UTF-8"), StandardOpenOption.APPEND)
      Files.readAllLines(journal).asScala.filter(_.nonEmpty).foreach { line =>
        try {
          val m = Json.parse(line).asInstanceOf[Map[String, Any]]
          records += LineageRecord(
            m("id").toString, m("source_table").toString, m("target_table").toString,
            m("transformation_type").toString, m("pipeline_name").toString,
            m("created").asInstanceOf[Long],
            m.get("metadata").collect { case mm: Map[_, _] =>
              mm.map { case (k, v) => k.toString -> String.valueOf(v) }
            }.getOrElse(Map.empty))
        } catch {
          case e: Exception =>
            System.err.println(s"[lineage] skipping malformed journal line (${e.getClass.getSimpleName})")
        }
      }
    }
}
