package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json + query_names.json, for the DuckDB compare. */
object Verify {

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      // Files.walk holds directory handles until closed — ~128 leaked fds
      // per run adds up on a low-ulimit container
      val st = Files.walk(p)
      try st.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally st.close()
    }

  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), extra) = args.splitAt(2)
    // dev path: extra args = run only these queries (the driver passes two).
    // --sql-only: dump oracle_sql.json/query_names.json for the named
    // queries WITHOUT executing them — a targeted re-run overwrites both
    // files with its subset, and a later full-artifact compare (the SF1
    // gate) needs the complete map back without paying a full re-run.
    val sqlOnly = extra.contains("--sql-only")
    val only = extra.filterNot(_ == "--sql-only").toSet
    val selected0 =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => only(k) }
    val selected = if (sqlOnly) Map.empty[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] else selected0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the SAME config path Bench/Cli use (Sessions.configure): a hand-rolled
    // builder here once meant the correctness gate ran under different confs
    // than the bench — a nanosAsLong-class fix would silently not apply
    val spark = graft.core.Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      val dest = Paths.get(s"$outDir/$name")
      // stale output from a previous run must go FIRST: if this round's
      // query throws before the overwrite, a leftover dir would make the
      // checker compare last round's parquet and report a false PASS
      deleteRecursively(dest)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(dest.toString)
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        deleteRecursively(dest) // a partial write must not look like output
      }
    }
    val q = graft.core.Json.str _
    // SF-aware golden oracles (round 12, VERDICT r11 #5): golden() pins
    // engine output at sf0.01 — the driver's gate SF — so golden queries
    // were excluded from the sf0.1 replication wholesale. Queries that
    // ALSO have a committed golden at THIS run's SF (goldens/<sfLabel>/,
    // cross-core-count-diffed before commit like every golden) get their
    // dumped oracle pointed there; everything else keeps the sf0.01 path
    // (and stays excluded from off-SF gates as before). The driver's own
    // sf0.01 run is byte-identical to round 11's behavior.
    val sfLabel = new java.io.File(sfDir).getName
    def sfAwareOracle(name: String, sql: String): String = {
      val sf001 = s"/root/repo/goldens/sf0.01/$name.parquet"
      val here = s"/root/repo/goldens/$sfLabel/$name.parquet"
      if (sfLabel != "sf0.01" && sql.contains(sf001) && new java.io.File(here).exists())
        sql.replace(sf001, here)
      else sql
    }
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(sfAwareOracle(k, v))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // full registry, so the checker can flag rows-only queries that produced
    // NO output (a missing dir would otherwise vanish from the report)
    Files.writeString(Paths.get(s"$outDir/query_names.json"),
      selected0.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
