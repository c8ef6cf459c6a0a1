package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (sf0.001 fixtures). */
object TestSpark {
  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
