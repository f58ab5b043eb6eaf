package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (forked JVM). */
object TestSpark {
  lazy val spark: SparkSession = Tables.session("graft-test", cpus = "4")
  val sf: String = "/root/testdata/sf0.001"
}
