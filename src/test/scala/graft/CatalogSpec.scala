package graft

import org.apache.spark.sql.functions._
import graft.core.DataCatalog

/** Data-catalog registry — mirrors the reference's
  * utils/data_catalog.py behaviors: register (upsert with auto-analyze),
  * get, search (term/owner/tags/column, AND semantics), report shape,
  * and the journal's restart round-trip.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-catalog").toString

  private def fixedClock(t0: Long): (() => Long, Long => Unit) = {
    var now = t0
    (() => now, (t: Long) => { now = t })
  }

  private def sampleDf = Seq(
    (1L, "alice", Some(10.5), 100L),
    (2L, "bob", None, 100L),
    (3L, "carol", Some(7.25), 200L)
  ).toDF("user_id", "name", "score", "org_key")

  test("register auto-analyzes structure and stats (columnStats + type mapping + name heuristics)") {
    val cat = new DataCatalog(tmpDir())
    val e = cat.registerTable(sampleDf, "users", description = Some("user dim"),
      owner = Some("data-eng"), tags = Seq("dim", "pii"))
    assert(e.rowCount.contains(3L))
    assert(e.columns.map(_.name) == Seq("user_id", "name", "score", "org_key"))
    val byName = e.columns.map(c => c.name -> c).toMap
    // unique non-null id → PK candidate; *_id / *key names → FK name flag
    assert(byName("user_id").isPkCandidate && byName("user_id").isFkNameCandidate)
    assert(byName("org_key").isFkNameCandidate && !byName("org_key").isPkCandidate)
    assert(!byName("name").isFkNameCandidate)
    assert(byName("score").nNulls == 1L && byName("score").nDistinct == 2L)
    assert(byName("user_id").sqlType == "BIGINT")
    assert(byName("score").sqlType == "DOUBLE PRECISION")
    assert(byName("name").dataType == "string")
  }

  test("register is an upsert: created survives, updated moves, one entry per (schema, table)") {
    val (clock, setTime) = fixedClock(1000L)
    val cat = new DataCatalog(tmpDir(), clock)
    cat.registerTable(sampleDf, "users", description = Some("v1"))
    setTime(5000L)
    cat.registerTable(sampleDf, "users", description = Some("v2"), tags = Seq("fresh"))
    assert(cat.searchTables().size == 1)
    val e = cat.getTableMetadata("users").get
    assert(e.description.contains("v2") && e.tags == Seq("fresh"))
    assert(e.createdMs == 1000L && e.updatedMs == 5000L)
  }

  test("journal survives restart, including special characters in free-form fields") {
    val dir = tmpDir()
    val cat = new DataCatalog(dir)
    val desc = "line1\nline2 \"quoted\" tab\there \\ backslash, comma"
    cat.registerTable(sampleDf, "users", description = Some(desc),
      owner = Some("o,w\"ner"), tags = Seq("a b", "c\"d"))
    cat.registerTable(null, "external", schema = "raw", autoAnalyze = false)
    val reloaded = new DataCatalog(dir)
    val e = reloaded.getTableMetadata("users").get
    assert(e.description.contains(desc) && e.owner.contains("o,w\"ner"))
    assert(e.tags == Seq("a b", "c\"d"))
    assert(e.columns == cat.getTableMetadata("users").get.columns)
    val ext = reloaded.getTableMetadata("external", "raw").get
    assert(ext.columns.isEmpty && ext.rowCount.isEmpty && ext.lastAnalyzedMs.isEmpty)
  }

  test("search: term over name OR description, owner equality, tag overlap, column substring, AND semantics") {
    val cat = new DataCatalog(tmpDir())
    cat.registerTable(sampleDf, "users", description = Some("user dimension"),
      owner = Some("data-eng"), tags = Seq("dim", "pii"))
    cat.registerTable(Seq((1L, 5L)).toDF("event_id", "user_id"), "events",
      description = Some("click stream"), owner = Some("growth"), tags = Seq("fact"))
    // term matches name
    assert(cat.searchTables(term = Some("USER")).map(_.table) == Seq("users"))
    // term matches description only
    assert(cat.searchTables(term = Some("click")).map(_.table) == Seq("events"))
    // tag overlap (any shared tag)
    assert(cat.searchTables(tags = Seq("pii", "nope")).map(_.table) == Seq("users"))
    // owner equality
    assert(cat.searchTables(owner = Some("growth")).map(_.table) == Seq("events"))
    assert(cat.searchTables(owner = Some("grow")).isEmpty, "owner is equality, not substring")
    // column search hits every table carrying the column
    assert(cat.searchTables(column = Some("user_id")).map(_.table) == Seq("events", "users"))
    // AND semantics across filters
    assert(cat.searchTables(term = Some("user"), tags = Seq("fact")).isEmpty)
    assert(cat.searchTables(column = Some("user_id"), owner = Some("growth"))
      .map(_.table) == Seq("events"))
    // no filters → everything, ordered by table name
    assert(cat.searchTables().map(_.table) == Seq("events", "users"))
  }

  test("report carries the reference's shape: header, total, schema groups, bullets, grouped rows") {
    val cat = new DataCatalog(tmpDir())
    val wide = spark.range(1234).select(col("id").as("k"))
    cat.registerTable(wide, "big", description = Some("wide table"),
      owner = Some("eng"), tags = Seq("t1", "t2"))
    cat.registerTable(sampleDf, "users", schema = "dims")
    val rep = cat.generateCatalogReport()
    assert(rep.startsWith("Data Catalog Report\n" + "=" * 50))
    assert(rep.contains("Total Tables: 2"))
    assert(rep.contains("Schema: default") && rep.contains("Schema: dims"))
    assert(rep.contains("  • big") && rep.contains("  • users"))
    assert(rep.contains("    Description: wide table"))
    assert(rep.contains("    Owner: eng"))
    assert(rep.contains("    Tags: t1, t2"))
    assert(rep.contains("    Rows: 1,234"), s"grouped row count missing:\n$rep")
  }

  test("pipeline storage auto-registers into the catalog via storage.options.catalog_dir") {
    val in = tmpDir()
    sampleDf.coalesce(1).write.mode("overwrite").parquet(s"$in/t")
    val out = tmpDir() + "/res"
    val catDir = tmpDir()
    val yaml =
      s"""name: cat_demo
         |source: { type: parquet, path: "$in/t" }
         |operations:
         |  - { type: filter, condition: "user_id >= 2" }
         |storage:
         |  type: parquet
         |  path: "$out"
         |  mode: overwrite
         |  options: { catalog_dir: "$catDir", catalog_table: users_clean, catalog_tags: "dim,clean" }
         |""".stripMargin
    val res = graft.core.Pipeline.execute(spark, graft.core.Pipeline.fromYaml(yaml))
    assert(res.status == "success", res.errors.mkString("; "))
    val e = new DataCatalog(catDir).getTableMetadata("users_clean").get
    assert(e.rowCount.contains(2L), "analysis ran over the WRITTEN (filtered) frame")
    assert(e.tags == Seq("dim", "clean"))
    assert(e.description.contains("output of pipeline 'cat_demo'"))
    assert(e.path.contains(out) && e.sizeBytes.exists(_ > 0L))
    assert(e.columns.map(_.name) == Seq("user_id", "name", "score", "org_key"))
  }

  test("empty dataset registers cleanly (round-7 review: sum-over-0-rows NULLs)") {
    val cat = new DataCatalog(tmpDir())
    val e = cat.registerTable(sampleDf.filter(col("user_id") < 0), "empty")
    assert(e.rowCount.contains(0L))
    assert(e.columns.size == 4 && e.columns.forall(c => c.nNulls == 0L && c.nDistinct == 0L))
    assert(e.columns.forall(!_.isPkCandidate))
  }

  test("a truncated journal line is skipped, not fatal (crash mid-append)") {
    val dir = tmpDir()
    val cat = new DataCatalog(dir)
    cat.registerTable(sampleDf, "users", description = Some("good"))
    // simulate a crash mid-append: a partial JSON line at the tail
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/catalog.jsonl"),
      "{\"table\":\"half\",\"sch".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val reloaded = new DataCatalog(dir)
    assert(reloaded.getTableMetadata("users").exists(_.description.contains("good")),
      "intact entries survive a corrupt tail")
    assert(reloaded.searchTables().size == 1)
    // load() terminated the partial line, so subsequent appends land on
    // their own lines and survive another restart intact
    reloaded.registerTable(sampleDf, "users2")
    assert(new DataCatalog(dir).searchTables().map(_.table).toSet == Set("users", "users2"))
  }

  test("registering a parquet path records the dataset size") {
    val dir = tmpDir()
    val dataPath = s"$dir/data.parquet"
    sampleDf.write.mode("overwrite").parquet(dataPath)
    val cat = new DataCatalog(s"$dir/cat")
    val e = cat.registerTable(spark.read.parquet(dataPath), "users", path = Some(dataPath))
    assert(e.sizeBytes.exists(_ > 0L), s"expected a positive size, got ${e.sizeBytes}")
    assert(e.path.contains(dataPath))
  }
}
