package graft

/** The bench ARTIFACT contract (VERDICT r7 #1). Round 7's per-query perf
  * signal was lost because the single stdout JSON line had grown diagnostic
  * payloads (`adjudicated`, `gc_sec`, `load_avg`) past the driver's bounded
  * stdout-tail capture — BENCH_r07.json came back `parsed: null`. The fix
  * splits the artifact: stdout carries only the slim
  * `{metric,value,unit,queries,failed?,runs,sf,detail}` line; diagnostics go
  * to a committed side file. This spec runs Bench IN-PROCESS with a
  * synthetic low-value prior so adjudication actually FIRES (the r7 failure
  * mode), then gates:
  *   - stdout is exactly one line and stays small even with adjudication on,
  *   - the line parses and carries every benched query,
  *   - no diagnostic key leaks back onto the stdout line,
  *   - the side file parses and carries adjudicated/gc_sec/load_avg,
  *   - the stdout query value is the adjudication's ISOLATED median.
  */
class BenchArtifactSpec extends SparkSpec {

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) { body }
    new String(bos.toByteArray, "UTF-8")
  }

  private def withProps(props: Map[String, String])(body: => Unit): Unit = {
    val saved = props.keys.map(k => k -> sys.props.get(k)).toMap
    try { props.foreach { case (k, v) => sys.props(k) = v }; body }
    finally saved.foreach { case (k, v) => v.fold { sys.props -= k; () } { x => sys.props(k) = x; () } }
  }

  test("stdout line is slim + parseable with adjudication firing; diagnostics land in the side file") {
    spark // force the shared session so Bench inherits it instead of owning one
    val dir = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val priorPath = s"$dir/prior.json"
    val detailPath = s"$dir/bench_detail.json"
    // prior values far below any real runtime → every benched query becomes a
    // >1.5× "regression" and takes the adjudication path (r7's loss trigger)
    java.nio.file.Files.write(java.nio.file.Paths.get(priorPath),
      s"""{"metric":"total","value":0.002,"unit":"sec","queries":{"q_agg_grouped":0.001,"q_join_equi":0.001},"runs":3,"sf":"$sfDir"}"""
        .getBytes("UTF-8"))

    var out = ""
    withProps(Map(
      "SPARK_GRAFT_SF_DIR" -> sfDir,
      "SPARK_GRAFT_CPUS" -> "4",
      "SPARK_GRAFT_BENCH_RUNS" -> "1",
      "SPARK_GRAFT_BENCH_NOISE_FLOOR" -> "0.0",
      "SPARK_GRAFT_BENCH_PRIOR" -> priorPath,
      "SPARK_GRAFT_BENCH_DETAIL" -> detailPath
    )) {
      out = captureOut { Bench.main(Array("q_agg_grouped", "q_join_equi")) }
    }

    val lines = out.split("\n").filter(_.nonEmpty)
    assert(lines.length == 1, s"bench must print exactly one stdout line, got ${lines.length}")
    val line = lines.head
    // the driver keeps a bounded stdout tail; r7's 4+ KB line was truncated.
    // 34 headliners at ~25 B each ≈ 1 KB — 3 KB is a hard ceiling with slack.
    assert(line.length < 3000, s"stdout line is ${line.length} B — must stay under the driver's tail capture")
    Seq("\"adjudicated\"", "\"gc_sec\"", "\"load_avg\"", "\"law_ring\"").foreach { k =>
      assert(!line.contains(k), s"diagnostic key $k leaked onto the stdout line")
    }

    val parsed = graft.core.Json.parse(line).asInstanceOf[Map[String, Any]]
    assert(parsed("metric") == "total" && parsed("unit") == "sec" && parsed("sf") == sfDir)
    val queries = parsed("queries").asInstanceOf[Map[String, Any]]
    assert(queries.keySet == Set("q_agg_grouped", "q_join_equi"), s"queries=${queries.keySet}")
    assert(parsed("detail") == detailPath)

    val detail = graft.core.Json.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(detailPath)), "UTF-8")
    ).asInstanceOf[Map[String, Any]]
    val adj = detail("adjudicated").asInstanceOf[Map[String, Any]]
    assert(adj.keySet == Set("q_agg_grouped", "q_join_equi"),
      s"both queries should have adjudicated (prior=0.001 s): ${adj.keySet}")
    adj.foreach { case (name, v) =>
      val rec = v.asInstanceOf[Map[String, Any]]
      assert(Set("suite", "isolated", "prior").subsetOf(rec.keySet))
      // the stdout value must be the isolated truth, not the suite median
      val stdoutVal = queries(name).asInstanceOf[Double]
      val isolated = rec("isolated").asInstanceOf[Double]
      assert(math.abs(stdoutVal - isolated) < 1e-9, s"$name stdout=$stdoutVal isolated=$isolated")
    }
    Seq("gc_sec", "load_avg").foreach { k =>
      val m = detail(k).asInstanceOf[Map[String, Any]]
      assert(m.contains("q_agg_grouped") && m.contains("q_join_equi"), s"$k missing queries: ${m.keySet}")
    }
    // subset (dev) invocation skips the law ring by design
    assert(detail("law_ring").asInstanceOf[Map[String, Any]].isEmpty)
  }

  test("full headline + law-ring stdout stays under the tail-capture ceiling by construction") {
    // no Spark run needed: the line's size is name-count × per-entry bytes.
    // 34 headliner names at ≤ 30 chars + "":0.000, ≈ 40 B each → ~1.4 KB with
    // envelope. Gate the INPUT (name lengths) so a future rename can't push
    // the real artifact over the r7 cliff silently.
    val maxName = (Bench.headline ++ Bench.lawRing).map(_.length).max
    val estimate = 120 + Bench.headline.map(_.length + 10).sum // envelope + "name":0.000,
    assert(maxName <= 40, s"a headline name grew past 40 chars ($maxName)")
    assert(estimate < 2500, s"estimated stdout line $estimate B — trim the headline list or split the artifact further")
    // every law-ring query must exist in the registry, else the ring silently benches nothing
    Bench.lawRing.foreach(n => assert(SparkEntry.queries.contains(n), s"law-ring query $n not registered"))
  }
}
