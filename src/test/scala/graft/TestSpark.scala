package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites run
  * sequentially in the single forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.engine.Sessions.builder("local[4]", "8")
      .appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Smallest driver corpus — used by plan-shape and streaming tests. */
  val sfDir = "/root/testdata/sf0.001"
}
