package graft.core

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame

/** Data-catalog registry — graft's equivalent of the reference's
  * `utils/data_catalog.py:44-355` (DataCatalog.register_table /
  * get_table_metadata / search_tables / generate_catalog_report).
  *
  * The reference keeps its catalog in a `metadata.data_catalog` DB table
  * and auto-analyzes registered tables through SQLAlchemy inspection
  * (column types/nullability/PK/FK) plus COUNT(*) and a best-effort size
  * probe. Here the engine's tables are datasets, so:
  *
  *  - the store is a JSONL journal under `dir` (the Orchestration
  *    FileQueue precedent — last write per (schema, table) wins, state
  *    survives restarts, a truncated last line from a crash mid-append is
  *    skipped on load rather than bricking the catalog; single writer per
  *    dir). Lines serialize via [[Json.value]] and load via
  *    [[Json.parse]] — one JSON implementation, no bespoke parser;
  *  - auto-analysis reuses [[graft.quality.SchemaInference.columnStats]]
  *    (ONE aggregate pass: per-column nulls/distinct/PK-candidate) plus
  *    the type mapping of `sqlTypeFor`; the FK flag is the reference's
  *    own `_id`/`key` name heuristic (schema_inference.py:302-319) since
  *    parquet carries no constraints; size comes from the filesystem when
  *    a path is registered (best-effort, like the reference's
  *    PostgreSQL-only size probe).
  *
  * Search semantics mirror `search_tables`: case-insensitive substring on
  * table name OR description, owner equality, tag overlap (any shared
  * tag) — plus column-name search (the catalog question "which tables
  * carry a `doc_id`?" the reference answers by eye from the report).
  * `generateCatalogReport` reproduces the reference's report shape
  * (header, total, schema groups, per-table bullets with description /
  * owner / tags / formatted row count).
  *
  * Scale note: registration is an explicit metadata operation — its one
  * `columnStats` aggregate over the table is the analogue of the
  * reference's COUNT(*) probe and combines map-side; nothing here runs
  * per query.
  */
object DataCatalog {

  final case class CatalogColumn(
      name: String, dataType: String, sqlType: String, nullable: Boolean,
      nNulls: Long, nDistinct: Long, isPkCandidate: Boolean, isFkNameCandidate: Boolean)

  final case class CatalogEntry(
      table: String, schema: String,
      description: Option[String], owner: Option[String],
      tags: Seq[String], path: Option[String],
      columns: Seq[CatalogColumn],
      rowCount: Option[Long], sizeBytes: Option[Long], lastAnalyzedMs: Option[Long],
      createdMs: Long, updatedMs: Long)

}

final class DataCatalog(dir: String,
                        clock: () => Long = () => System.currentTimeMillis()) {
  import DataCatalog._

  private val journal: Path = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    d.resolve("catalog.jsonl")
  }

  private var entries: Map[(String, String), CatalogEntry] = load()

  /** register_table (data_catalog.py:66-163): upsert; `created` survives
    * re-registration, `updated` moves. With `autoAnalyze` (the default,
    * like the reference) the structure/stats analysis runs; without it the
    * entry carries identity + tags only. `df` may be null when only
    * registering identity.
    */
  def registerTable(df: DataFrame, table: String, schema: String = "default",
                    description: Option[String] = None, owner: Option[String] = None,
                    tags: Seq[String] = Nil, path: Option[String] = None,
                    autoAnalyze: Boolean = true): CatalogEntry = synchronized {
    val now = clock()
    val (cols, rowCount, analyzedAt) =
      if (autoAnalyze && df != null) {
        val (c, n) = analyze(df)
        (c, Some(n), Some(now))
      } else (Seq.empty[CatalogColumn], None, None)
    val size = path.flatMap(p => pathSize(df, p))
    val created = entries.get((schema, table)).map(_.createdMs).getOrElse(now)
    val e = CatalogEntry(table, schema, description, owner, tags, path,
      cols, rowCount, size, analyzedAt, created, now)
    append(e)
    e
  }

  /** get_table_metadata (data_catalog.py:244-287). */
  def getTableMetadata(table: String, schema: String = "default"): Option[CatalogEntry] =
    synchronized { entries.get((schema, table)) }

  /** search_tables (data_catalog.py:289-353): every given filter must
    * match (AND); no filters → the full catalog. `term` is a
    * case-insensitive substring over table name OR description (the
    * reference's ILIKE), `tags` matches on ANY shared tag (the
    * reference's array-overlap `&&`), `owner` is equality, `column`
    * (beyond-reference) is a case-insensitive substring over column
    * names. Ordered by table name (the reference's ORDER BY), schema
    * breaking ties.
    */
  def searchTables(term: Option[String] = None, tags: Seq[String] = Nil,
                   owner: Option[String] = None,
                   column: Option[String] = None): Seq[CatalogEntry] = synchronized {
    def has(e: CatalogEntry): Boolean = {
      val termOk = term.forall { t =>
        val lt = t.toLowerCase
        e.table.toLowerCase.contains(lt) ||
          e.description.exists(_.toLowerCase.contains(lt))
      }
      val tagOk = tags.isEmpty || e.tags.exists(tags.contains)
      val ownerOk = owner.forall(o => e.owner.contains(o))
      val colOk = column.forall { c =>
        val lc = c.toLowerCase
        e.columns.exists(_.name.toLowerCase.contains(lc))
      }
      termOk && tagOk && ownerOk && colOk
    }
    entries.values.filter(has).toSeq.sortBy(e => (e.table, e.schema))
  }

  /** generate_catalog_report (data_catalog.py:355-397): header, total,
    * schema groups, per-table bullets; row counts grouped with commas.
    */
  def generateCatalogReport(): String = {
    val tables = searchTables()
    val nf = java.text.NumberFormat.getIntegerInstance(java.util.Locale.US)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    out += "Data Catalog Report"
    out += "=" * 50
    out += s"Total Tables: ${tables.size}"
    out += ""
    tables.groupBy(_.schema).toSeq.sortBy(_._1).foreach { case (schemaName, ts) =>
      out += s"Schema: $schemaName"
      out += "-" * 30
      ts.foreach { t =>
        out += s"  • ${t.table}"
        t.description.foreach(d => out += s"    Description: $d")
        t.owner.foreach(o => out += s"    Owner: $o")
        if (t.tags.nonEmpty) out += s"    Tags: ${t.tags.mkString(", ")}"
        t.rowCount.foreach(n => out += s"    Rows: ${nf.format(n)}")
        out += ""
      }
      out += ""
    }
    out.mkString("\n")
  }

  // ------------------------------------------------------------- analysis

  /** One columnStats pass: (columns, rowCount). Column order follows the
    * schema; stats join on name.
    */
  private def analyze(df: DataFrame): (Seq[CatalogColumn], Long) = {
    val stats = graft.quality.SchemaInference.columnStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val rowCount = stats.values.headOption.map(_.getLong(1)).getOrElse(0L)
    val cols = df.schema.fields.toSeq.map { f =>
      val st = stats.get(f.name)
      val lower = f.name.toLowerCase
      CatalogColumn(
        name = f.name,
        dataType = f.dataType.simpleString,
        sqlType = graft.quality.SchemaInference.sqlTypeFor(f.dataType),
        nullable = f.nullable,
        // aggregates over an EMPTY frame: count() is 0 but sum()/the
        // pk-candidate conjunction come back NULL — an empty dataset must
        // register cleanly (a pipeline whose filter drops every row still
        // auto-registers its output), not NPE in getLong
        nNulls = st.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).getOrElse(-1L),
        nDistinct = st.map(r => if (r.isNullAt(3)) 0L else r.getLong(3)).getOrElse(-1L),
        isPkCandidate = st.exists(r => !r.isNullAt(6) && r.getBoolean(6)),
        isFkNameCandidate = lower.endsWith("_id") || lower.endsWith("key"))
    }
    (cols, rowCount)
  }

  /** Best-effort dataset size (the reference's PostgreSQL-only
    * pg_total_relation_size probe → None elsewhere).
    */
  private def pathSize(df: DataFrame, p: String): Option[Long] =
    try {
      val hp = new org.apache.hadoop.fs.Path(p)
      val conf =
        if (df != null) df.sparkSession.sparkContext.hadoopConfiguration
        else new org.apache.hadoop.conf.Configuration()
      Some(hp.getFileSystem(conf).getContentSummary(hp).getLength)
    } catch { case _: Exception => None }

  // ------------------------------------------------------------- journal

  private def key(e: CatalogEntry): (String, String) = (e.schema, e.table)

  private def append(e: CatalogEntry): Unit = {
    Files.write(journal, (toLine(e) + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    entries += (key(e) -> e)
  }

  private def load(): Map[(String, String), CatalogEntry] =
    if (!Files.exists(journal)) Map.empty
    else {
      // a crash mid-append can leave a partial line WITHOUT a newline;
      // terminate it now or the next append would concatenate onto the
      // junk and corrupt a GOOD record too
      val bytes = Files.readAllBytes(journal)
      if (bytes.nonEmpty && bytes.last != '\n')
        Files.write(journal, "\n".getBytes("UTF-8"), StandardOpenOption.APPEND)
      Files.readAllLines(journal).asScala.filter(_.nonEmpty)
        .flatMap(parseLine)
        .foldLeft(Map.empty[(String, String), CatalogEntry])((m, e) => m + (key(e) -> e))
    }

  private def toLine(e: CatalogEntry): String = {
    val cols = e.columns.map(c => Map(
      "name" -> c.name, "data_type" -> c.dataType, "sql_type" -> c.sqlType,
      "nullable" -> c.nullable, "n_nulls" -> c.nNulls, "n_distinct" -> c.nDistinct,
      "is_pk_candidate" -> c.isPkCandidate, "is_fk_name_candidate" -> c.isFkNameCandidate))
    Json.value(Map(
      "table" -> e.table, "schema" -> e.schema,
      "description" -> e.description, "owner" -> e.owner,
      "tags" -> e.tags, "path" -> e.path, "columns" -> cols,
      "row_count" -> e.rowCount, "size_bytes" -> e.sizeBytes,
      "last_analyzed" -> e.lastAnalyzedMs,
      "created" -> e.createdMs, "updated" -> e.updatedMs))
  }

  /** One journal line via [[Json.parse]]. Malformed lines — a truncated
    * tail from a crash mid-append, or hand-edited junk — are SKIPPED, not
    * fatal: the whole point of the append-only journal is that a partial
    * last record costs one update, never the catalog (the previous
    * bespoke parser threw on truncation and bricked every load).
    */
  private def parseLine(line: String): Option[CatalogEntry] =
    try {
      val m = Json.parse(line).asInstanceOf[Map[String, Any]]
      def str(k: String): Option[String] = m.get(k).collect { case s: String => s }
      def long(k: String): Option[Long] = m.get(k).collect { case l: Long => l }
      val cols = m.get("columns").toSeq.collect { case l: List[_] => l }.flatten.collect {
        case cm: Map[_, _] =>
          val c = cm.map { case (k, v) => k.toString -> v }
          CatalogColumn(c("name").toString, c("data_type").toString, c("sql_type").toString,
            c("nullable").asInstanceOf[Boolean], c("n_nulls").asInstanceOf[Long],
            c("n_distinct").asInstanceOf[Long], c("is_pk_candidate").asInstanceOf[Boolean],
            c("is_fk_name_candidate").asInstanceOf[Boolean])
      }
      val tags = m.get("tags").toSeq.collect { case l: List[_] => l }.flatten.map(_.toString)
      Some(CatalogEntry(
        str("table").get, str("schema").get, str("description"), str("owner"),
        tags, str("path"), cols, long("row_count"), long("size_bytes"),
        long("last_analyzed"), long("created").get, long("updated").get))
    } catch {
      case e: Exception =>
        System.err.println(s"[catalog] skipping malformed journal line (${e.getClass.getSimpleName})")
        None
    }
}
