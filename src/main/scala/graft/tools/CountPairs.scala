package graft.tools

import org.apache.spark.sql.functions._

/** Output-size evidence for the scale-stress adjudication: the three
  * super-linear-looking headliners (minhash, semantic contamination,
  * semantic dedup) are WORKLOAD-bound — their outputs/pair spaces grow
  * quadratically in duplication depth by construction. This prints the
  * output row counts at a given SF dir so wall-clock can be compared
  * against the work actually demanded, not the input row count.
  *
  * Usage: runMain graft.tools.CountPairs [sfDir]
  */
object CountPairs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(appName = "graft-countpairs")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val qs = graft.SparkEntry.queries
      Seq("q_dedup_minhash", "q_semantic_contamination", "q_semantic_dedup").foreach { q =>
        val t0 = System.nanoTime()
        val n = qs(q)(spark, dir).count()
        println(f"[countpairs] $q%-28s rows=$n%10d  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
    } finally spark.stop()
  }
}
