package graft

/** Dev tool: dump formatted physical plans for the plan-audit doc. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val keys = Seq("agg_hash_group", "join_inner_broadcast", "scan_pruned",
      "sim_cosine_topk", "dedup_minhash", "merge_upsert")
    keys.foreach { k =>
      println(s"===PLAN:$k===")
      val df = SparkEntry.queries(k)(spark, d)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
