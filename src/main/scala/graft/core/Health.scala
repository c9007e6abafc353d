package graft.core

/** Tri-state health substrate — graft's port of the reference's
  * `monitoring/health_check.py:27-552` (HealthStatus / HealthCheck /
  * HealthCheckManager), scoped to the DATA-FACING surface adjudicated in
  * COVERAGE.md: storage connectivity (JDBC, KV) and host resource gauges
  * (disk, heap). The reference's psutil CPU sampler, its Redis client
  * ping, and the web endpoint on top are service plumbing outside the
  * engine boundary; the rollup and result semantics here are the
  * reference's exactly:
  *
  *  - a check returns (status, message, numeric details); a THROWING
  *    check is UNHEALTHY with its error captured (`health_check.py:85`);
  *  - rollup (`health_check.py:424-448`): any UNHEALTHY → UNHEALTHY,
  *    else any DEGRADED → DEGRADED, else all HEALTHY → HEALTHY,
  *    else (empty / UNKNOWN members) → UNKNOWN;
  *  - resource checks grade by usage ratio against warning/critical
  *    thresholds (HEALTHY < warn ≤ DEGRADED < crit ≤ UNHEALTHY).
  *
  * Results stamp through [[Metrics.Collector]] (the engine's
  * observability registry): per check a `health_check_status` gauge
  * (the status RANK — 0 healthy, 1 degraded, 2 unhealthy, 3 unknown; a
  * ThresholdRule `gt 0` alerts on any non-healthy check), a
  * `health_check_duration_seconds` histogram, and each numeric detail as
  * a `health_<detail>` gauge — so disk/heap usage ride the same export
  * (JSON/Prometheus) and alerting paths as every other engine metric.
  * Driven by `graft.Cli health` (one machine-readable JSON line).
  */
object Health {

  sealed abstract class Status(val label: String, val rank: Int)
  case object Healthy extends Status("healthy", 0)
  case object Degraded extends Status("degraded", 1)
  case object Unhealthy extends Status("unhealthy", 2)
  case object Unknown extends Status("unknown", 3)

  final case class CheckResult(name: String, status: Status, message: String,
                               durationMs: Double, details: Map[String, Double])

  /** A named check: `perform` returns (status, message, numeric details). */
  final case class Check(name: String,
                         perform: () => (Status, String, Map[String, Double]))

  def run(check: Check, collector: Metrics.Collector = null,
          clock: () => Long = () => System.currentTimeMillis()): CheckResult = {
    val t0 = clock()
    val (st, msg, details) =
      try check.perform()
      catch {
        case e: Exception =>
          (Unhealthy, s"Check failed: ${e.getMessage}", Map.empty[String, Double])
      }
    val durMs = (clock() - t0).toDouble
    if (collector ne null) {
      val tags = Map("check_name" -> check.name)
      collector.recordGauge("health_check_status", st.rank.toDouble, tags)
      collector.recordHistogram("health_check_duration_seconds", durMs / 1000.0, tags)
      details.foreach { case (k, v) => collector.recordGauge(s"health_$k", v, tags) }
    }
    CheckResult(check.name, st, msg, durMs, details)
  }

  def runAll(checks: Seq[Check], collector: Metrics.Collector = null,
             clock: () => Long = () => System.currentTimeMillis())
      : (Status, Seq[CheckResult]) = {
    val results = checks.map(run(_, collector, clock))
    (overall(results), results)
  }

  /** The reference rollup, verbatim (`health_check.py:424-448`). */
  def overall(results: Iterable[CheckResult]): Status =
    if (results.isEmpty) Unknown
    else if (results.exists(_.status == Unhealthy)) Unhealthy
    else if (results.exists(_.status == Degraded)) Degraded
    else if (results.forall(_.status == Healthy)) Healthy
    else Unknown

  private def grade(ratio: Double, warn: Double, crit: Double,
                    what: String): (Status, String) =
    if (ratio >= crit) (Unhealthy, f"$what usage critical: ${ratio * 100}%.1f%%")
    else if (ratio >= warn) (Degraded, f"$what usage high: ${ratio * 100}%.1f%%")
    else (Healthy, f"$what usage normal: ${ratio * 100}%.1f%%")

  /** Database connectivity (`DatabaseHealthCheck`): run a trivial query
    * over a fresh connection; grade DEGRADED past `degradedMs` round-trip
    * (a reachable-but-slow store is the classic degraded state). Derby's
    * dialect has no bare SELECT — pass `query = "VALUES 1"` there.
    */
  def jdbcCheck(name: String, url: String, query: String = "SELECT 1",
                degradedMs: Long = 1000L): Check = Check(name, () => {
    val t0 = System.nanoTime()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(query)
      try { rs.next(); () } finally rs.close()
    } finally conn.close()
    val ms = (System.nanoTime() - t0) / 1e6
    val st = if (ms >= degradedMs) Degraded else Healthy
    (st, s"Database connection successful", Map("db_roundtrip_ms" -> ms))
  })

  /** Key-value store connectivity (`RedisHealthCheck`'s ping, expressed
    * as a put/get round-trip through the engine's own sink interface —
    * the store a health probe should exercise is the one the sinks
    * write). A missing or mismatched read-back is UNHEALTHY.
    */
  def kvCheck(name: String, store: () => graft.sources.KeyValueSink,
              degradedMs: Long = 1000L): Check = Check(name, () => {
    val t0 = System.nanoTime()
    val s = store()
    val nonce = s"${System.nanoTime()}"
    try {
      s.put("__graft/health/probe", nonce)
      val back = s.get("__graft/health/probe")
      val ms = (System.nanoTime() - t0) / 1e6
      if (!back.contains(nonce))
        (Unhealthy, s"KV probe read-back mismatch (got $back)", Map("kv_roundtrip_ms" -> ms))
      else
        (if (ms >= degradedMs) Degraded else Healthy,
          "KV connection successful", Map("kv_roundtrip_ms" -> ms))
    } finally s.close()
  })

  /** Disk usage under `path` (`DiskSpaceHealthCheck` thresholds). */
  def diskCheck(name: String, path: String = "/",
                warn: Double = 0.8, crit: Double = 0.95): Check = Check(name, () => {
    val f = new java.io.File(path)
    val total = f.getTotalSpace
    require(total > 0, s"no filesystem at $path")
    val usage = 1.0 - f.getUsableSpace.toDouble / total
    val (st, msg) = grade(usage, warn, crit, "Disk")
    (st, msg, Map("disk_usage_ratio" -> usage,
      "disk_free_gb" -> f.getUsableSpace / 1e9, "disk_total_gb" -> total / 1e9))
  })

  /** JVM heap usage (`MemoryHealthCheck` thresholds over the engine's own
    * memory — the resource that actually gates a driver). */
  def memoryCheck(name: String, warn: Double = 0.8, crit: Double = 0.95): Check =
    Check(name, () => {
      val rt = Runtime.getRuntime
      val used = rt.totalMemory() - rt.freeMemory()
      val usage = used.toDouble / rt.maxMemory()
      val (st, msg) = grade(usage, warn, crit, "Memory")
      (st, msg, Map("heap_usage_ratio" -> usage,
        "heap_used_mb" -> used / 1e6, "heap_max_mb" -> rt.maxMemory() / 1e6))
    })
}
