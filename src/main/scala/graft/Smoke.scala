package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner mirroring the driver's t1 check: run
  * `SparkEntry.entry` on sf0.001 and assert rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(cores = 8, shufflePartitions = 8, appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"entry() schema: ${df.schema.simpleString}")
    rows.foreach(r => println(s"entry() row: $r"))
    println(s"SMOKE ${if (rows.nonEmpty) "PASS" else "FAIL"}: entry() returned ${rows.length} rows")
    spark.stop()
    // callers gate on the exit status — printing FAIL with exit 0 would
    // read as success to any script
    if (rows.isEmpty) sys.exit(1)
  }
}
