package graft

import org.apache.spark.sql.functions._
import graft.core.LineageTracker
import graft.core.LineageTracker._

/** Cross-run lineage registry — mirrors the reference's
  * utils/lineage_tracker.py behaviors: track (one id, one edge per
  * source), upstream/downstream queries newest-first, the depth-capped
  * graph walk, the report shape, journal restart survival, and the
  * Pipeline storage integration.
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-lineage").toString

  private def fixedClock(t0: Long): (() => Long, Long => Unit) = {
    var now = t0
    (() => now, (t: Long) => { now = t })
  }

  test("track: one id per transformation, one edge per source; queries order newest-first") {
    val (clock, setTime) = fixedClock(1000L)
    val t = new LineageTracker(tmpDir(), clock)
    val id1 = t.trackTransformation(Seq("raw_a", "raw_b"), "staged", "join", "p1",
      Map("note" -> "daily"))
    setTime(2000L)
    val id2 = t.trackTransformation(Seq("staged"), "mart", "aggregate", "p2")
    assert(id1 != id2)
    val up = t.upstreamDependencies("staged")
    assert(up.map(_.sourceTable).toSet == Set("raw_a", "raw_b"))
    assert(up.forall(r => r.id == id1 && r.transformationType == "join" &&
      r.metadata == Map("note" -> "daily")))
    assert(t.downstreamDependencies("staged").map(_.targetTable) == Seq("mart"))
    // newest-first ordering across runs
    setTime(3000L)
    t.trackTransformation(Seq("raw_c"), "staged", "union", "p3")
    assert(t.upstreamDependencies("staged").head.sourceTable == "raw_c",
      "latest edge first (created DESC)")
    assert(t.upstreamDependencies("nope").isEmpty)
    intercept[IllegalArgumentException](t.trackTransformation(Nil, "x", "t", "p"))
  }

  test("lineage graph: depth-capped walk, upstream arms stay upstream, edges deduplicated") {
    val t = new LineageTracker(tmpDir())
    // chain a → b → c → d plus a side feed e → c
    t.trackTransformation(Seq("a"), "b", "load", "p")
    t.trackTransformation(Seq("b"), "c", "transform", "p")
    t.trackTransformation(Seq("e"), "c", "enrich", "p")
    t.trackTransformation(Seq("c"), "d", "aggregate", "p")
    val (nodes, edges) = t.lineageGraph("c", depth = 2)
    assert(nodes.toSet == Set("a", "b", "c", "d", "e"),
      s"depth 2 from c reaches the whole chain: $nodes")
    assert(edges.toSet == Set(
      LineageGraphEdge("b", "c", "transform", "p"),
      LineageGraphEdge("e", "c", "enrich", "p"),
      LineageGraphEdge("a", "b", "load", "p"),
      LineageGraphEdge("c", "d", "aggregate", "p")))
    // the reference's depth semantics: `depth` caps how many LEVELS get
    // EXPANDED, so neighbors of the last expanded level still appear —
    // depth 0 expands only the start node (direct neighbors, no further)
    val (n0, e0) = t.lineageGraph("c", depth = 0)
    assert(n0.toSet == Set("b", "c", "d", "e"), s"depth 0: $n0")
    assert(!e0.exists(_.source == "a"), "a→b is two hops out, not expanded at depth 0")
    // a cycle terminates at the depth cap instead of looping forever
    t.trackTransformation(Seq("d"), "a", "feedback", "p")
    val (nc, _) = t.lineageGraph("a", depth = 3)
    assert(nc.toSet == Set("a", "b", "c", "d", "e"))
  }

  test("report carries the reference's shape; journal survives restart") {
    val dir = tmpDir()
    val (clock, _) = fixedClock(1700000000000L)
    val t = new LineageTracker(dir, clock)
    t.trackTransformation(Seq("raw"), "clean", "dedup", "curation")
    val rep = t.generateLineageReport("clean")
    assert(rep.startsWith("Data Lineage Report for: clean\n" + "=" * 50))
    assert(rep.contains("Upstream Dependencies:"))
    assert(rep.contains("  • raw → clean"))
    assert(rep.contains("    Transformation: dedup"))
    assert(rep.contains("    Pipeline: curation"))
    assert(rep.contains("    Date: 2023-11-14T22:13:20Z"))
    assert(rep.contains("No downstream dependencies found."))
    // restart: records reload; a truncated tail is skipped, not fatal
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/lineage.jsonl"),
      "{\"id\":\"par".getBytes("UTF-8"), java.nio.file.StandardOpenOption.APPEND)
    val t2 = new LineageTracker(dir)
    assert(t2.upstreamDependencies("clean").map(_.sourceTable) == Seq("raw"))
    t2.trackTransformation(Seq("clean"), "mart", "agg", "p2")
    assert(new LineageTracker(dir).downstreamDependencies("clean")
      .map(_.targetTable) == Seq("mart"), "appends after a repaired tail survive")
  }

  test("examples/governed_pipeline.yaml: write + catalog + lineage in one run") {
    val gov = "/tmp/graft-governed" // the example's env default
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(gov))
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples/governed_pipeline.yaml")), "UTF-8")
    val res = graft.core.Pipeline.execute(spark, graft.core.Pipeline.fromYaml(yaml))
    assert(res.status == "success", res.errors.mkString("; "))
    assert(res.rowsWritten > 0)
    val cat = new graft.core.DataCatalog(s"$gov/catalog")
    val e = cat.getTableMetadata("docs_clean").get
    assert(e.rowCount.contains(res.rowsWritten) && e.tags == Seq("text", "curated"))
    assert(cat.searchTables(column = Some("stopword_ratio")).map(_.table) == Seq("docs_clean"),
      "quality-feature columns are searchable")
    val lin = new LineageTracker(s"$gov/lineage")
    val up = lin.upstreamDependencies("docs_clean")
    assert(up.map(_.sourceTable) == Seq("documents_raw"))
    assert(up.head.pipelineName == "governed_curation")
  }

  test("pipeline storage persists lineage edges via storage.options.lineage_dir") {
    val in = tmpDir()
    Seq((1L, 30), (2L, 10)).toDF("id", "age").coalesce(1)
      .write.mode("overwrite").parquet(s"$in/users_raw")
    val dir = tmpDir()
    val yaml =
      s"""name: lin_demo
         |source: { type: parquet, path: "$in/users_raw", table: users_raw }
         |operations:
         |  - { type: filter, condition: "age >= 20" }
         |storage:
         |  type: noop
         |  path: "x"
         |  mode: overwrite
         |  options: { lineage_dir: "$dir", catalog_table: users_clean }
         |""".stripMargin
    val res = graft.core.Pipeline.execute(spark, graft.core.Pipeline.fromYaml(yaml))
    assert(res.status == "success", res.errors.mkString("; "))
    val t = new LineageTracker(dir)
    val up = t.upstreamDependencies("users_clean")
    assert(up.map(_.sourceTable) == Seq("users_raw"))
    assert(up.head.pipelineName == "lin_demo" && up.head.transformationType == "pipeline")
    assert(up.head.metadata.get("storage_type").contains("noop"))
  }
}
