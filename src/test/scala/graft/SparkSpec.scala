package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session, lazy). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.Sessions.local(cores = 4, shufflePartitions = 4, appName = "graft-test")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sfDir: String = TestSpark.sfDir

  /** Assert a plan never falls back to a Cartesian product (scale gate for
    * every bucketed dedup/ANN operator, per VERDICT r1).
    */
  def assertNoCartesian(df: org.apache.spark.sql.DataFrame): Unit = {
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      s"plan contains CartesianProduct:\n$physical")
  }
}
