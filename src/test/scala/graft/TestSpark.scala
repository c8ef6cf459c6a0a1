package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (sf0.001 fixtures). */
object TestSpark {
  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val cpus = sys.env.getOrElse("GRAFT_TEST_CPUS", "8")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
