package graft

import graft.operators.LlmOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing for the dedup-family cold pipeline (the bench's
  * top key pays all of it): shingle cache fill, intersection self-join,
  * pair scoring, star-contraction fixpoint. Run with
  * `sbt "Test/runMain graft.PerfProbe [sfDir]"` on a quiet box; used to
  * attribute BASELINE.md's dedup numbers to stages rather than guessing.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    time("warmup-entry")(SparkEntry.entry(spark).write.format("noop").mode("overwrite").save())
    val capped = time("capped-shingles-cache") {
      val c = LlmOps.cappedShinglesFrom(docs); c.count(); c
    }
    time("capped-shingles-reuse")(capped.count())
    val pairs = time("pairs-intersect-join") {
      val p = LlmOps.jaccardPairsFrom(docs); p.count(); p
    }
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
    time("connected-components")(LlmOps.connectedComponents(edges).count())
    time("cc-again-warm")(LlmOps.connectedComponents(edges).count())
    spark.stop()
  }
}
