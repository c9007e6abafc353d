package graft

import graft.core.{Health, Metrics}

/** The tri-state health substrate (core/Health — the reference's
  * monitoring/health_check.py:27-552 rollup semantics) and its
  * `graft.Cli health` surface: rollup law, throwing-check capture,
  * threshold grading, metric stamping, an injected FAILING store
  * (VERDICT r12 #4's "Done" condition), and the CLI's machine-readable
  * JSON line end-to-end against a real Derby database — up and torn
  * down.
  */
class HealthSpec extends SparkSpec {

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) { body }
    new String(bos.toByteArray, "UTF-8")
  }

  private def const(name: String, st: Health.Status) =
    Health.Check(name, () => (st, name, Map.empty))

  test("rollup is the reference's: UNHEALTHY > DEGRADED > HEALTHY, empty/unknown -> UNKNOWN") {
    def roll(sts: Health.Status*): Health.Status =
      Health.overall(sts.zipWithIndex.map { case (s, i) =>
        Health.CheckResult(s"c$i", s, "", 0.0, Map.empty)
      })
    assert(Health.overall(Nil) == Health.Unknown)
    assert(roll(Health.Healthy, Health.Healthy) == Health.Healthy)
    assert(roll(Health.Healthy, Health.Degraded) == Health.Degraded)
    assert(roll(Health.Degraded, Health.Unhealthy) == Health.Unhealthy)
    assert(roll(Health.Healthy, Health.Unknown) == Health.Unknown)
    assert(roll(Health.Unknown, Health.Unhealthy) == Health.Unhealthy)
  }

  test("a throwing check is UNHEALTHY with its error captured; results stamp the collector") {
    val collector = new Metrics.Collector()
    val boom = Health.Check("boom", () => throw new IllegalStateException("store down"))
    val (overall, results) = Health.runAll(
      Seq(const("ok", Health.Healthy), boom), collector)
    assert(overall == Health.Unhealthy)
    val r = results.find(_.name == "boom").get
    assert(r.status == Health.Unhealthy && r.message.contains("store down"))
    // gauges: status rank per check (0 healthy / 2 unhealthy), durations
    val sts = collector.getMetrics("health_check_status")
    assert(sts.map(m => m.tags("check_name") -> m.value).toMap ==
      Map("ok" -> 0.0, "boom" -> 2.0), s"status gauges: $sts")
    assert(collector.aggregated("health_check_duration_seconds")("count") == 2.0)
  }

  test("disk/memory checks gauge usage and grade by thresholds") {
    val collector = new Metrics.Collector()
    val (_, results) = Health.runAll(Seq(
      Health.diskCheck("disk", "/"), Health.memoryCheck("memory")), collector)
    val disk = results.find(_.name == "disk").get
    assert(disk.details.contains("disk_usage_ratio") &&
      disk.details("disk_usage_ratio") > 0.0 && disk.details("disk_usage_ratio") < 1.0)
    val mem = results.find(_.name == "memory").get
    assert(mem.details("heap_usage_ratio") > 0.0 && mem.details("heap_max_mb") > 0.0)
    // the usage ratios ride core/Metrics as health_* gauges
    assert(collector.aggregated("health_disk_usage_ratio").nonEmpty)
    assert(collector.aggregated("health_heap_usage_ratio").nonEmpty)
    // threshold grading: a crit floor of 0 forces UNHEALTHY on the same box
    val (o2, _) = Health.runAll(Seq(Health.diskCheck("d", "/", warn = 0.0, crit = 0.0)))
    assert(o2 == Health.Unhealthy)
    val (o3, _) = Health.runAll(Seq(Health.diskCheck("d", "/", warn = 0.0, crit = 1.01)))
    assert(o3 == Health.Degraded)
  }

  test("kvCheck round-trips the engine's own sink; an INJECTED FAILING STORE is UNHEALTHY") {
    val good = Health.run(Health.kvCheck("kv",
      () => new graft.sources.KeyValueSink.InMemoryKV("health_probe")))
    assert(good.status == Health.Healthy && good.details.contains("kv_roundtrip_ms"))
    // failing store: accepts writes, loses them (read-back mismatch)
    val lossy = new graft.sources.KeyValueSink {
      def put(key: String, value: String, ttlSeconds: Long): Unit = ()
      def appendStream(stream: String, value: String, maxLen: Long): Unit = ()
      def pushList(list: String, value: String, maxLen: Long): Unit = ()
      def get(key: String): Option[String] = None
    }
    val bad = Health.run(Health.kvCheck("kv", () => lossy))
    assert(bad.status == Health.Unhealthy && bad.message.contains("read-back mismatch"))
    // failing store: connection refused (throws) — the base-class capture
    val down = Health.run(Health.kvCheck("kv",
      () => throw new java.io.IOException("connection refused")))
    assert(down.status == Health.Unhealthy && down.message.contains("connection refused"))
  }

  test("Cli health: JSON line with rollup + checks; a bad JDBC store drives UNHEALTHY end-to-end") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft-health-db").toString
    // healthy pass against a REAL (Derby) database + a memory KV
    val up = captureOut {
      Cli.main(Array("health", "--jdbc", s"jdbc:derby:$dbDir/db;create=true",
        "--jdbc-query", "VALUES 1", "--kv", "memory:health_cli"))
    }.trim
    val parsed = graft.core.Json.parse(up).asInstanceOf[Map[String, Any]]
    val checks = parsed("checks").asInstanceOf[Map[String, Any]]
    assert(checks.keySet == Set("disk", "memory", "database", "kv"), s"checks: ${checks.keySet}")
    val db = checks("database").asInstanceOf[Map[String, Any]]
    assert(db("status") == "healthy", s"derby check: $db")
    assert(db("details").asInstanceOf[Map[String, Any]].contains("db_roundtrip_ms"))
    assert(parsed("status") == "healthy" || parsed("status") == "degraded",
      s"live-box rollup can be degraded but never unhealthy here: $parsed")
    // injected failing store through the CLI: a Derby db that does NOT
    // exist and is not created -> connection fails -> UNHEALTHY rollup
    val downOut = captureOut {
      Cli.main(Array("health", "--jdbc", s"jdbc:derby:$dbDir/nonexistent"))
    }.trim
    val downParsed = graft.core.Json.parse(downOut).asInstanceOf[Map[String, Any]]
    assert(downParsed("status") == "unhealthy", s"bad store must fail the rollup: $downParsed")
    assert(downParsed("unhealthy") == 1L && downParsed.contains("healthy"))
    assert(downParsed("checks").asInstanceOf[Map[String, Any]]("database")
      .asInstanceOf[Map[String, Any]]("status") == "unhealthy")
  }
}
