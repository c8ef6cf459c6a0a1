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
    time("docs-count")(println("  docs=" + docs.count()))
    graft.functions.ShingleSet.register(spark)
    time("norm-only-noop") {
      docs.selectExpr(
        "doc_id", "trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS nt")
        .write.format("noop").mode("overwrite").save()
    }
    time("shingleset-size-sum") {
      println("  sz=" + docs.selectExpr(
        "sum(size(graft_shingles(trim(regexp_replace(lower(text), '\\\\s+', ' ')), 3)))")
        .first().getLong(0))
    }
    time("shingles-raw-noop") {
      LlmOps.shinglesForProbe(docs).write.format("noop").mode("overwrite").save()
    }
    time("shingles-raw-noop-2") {
      LlmOps.shinglesForProbe(docs).write.format("noop").mode("overwrite").save()
    }
    time("shingles-agg-count") {
      println("  shingle rows=" +
        LlmOps.shinglesForProbe(docs).groupBy().count().first().getLong(0))
    }
    val capped = time("capped-shingles-cache") {
      val c = LlmOps.cappedShinglesFrom(docs); c.count(); c
    }
    time("capped-shingles-reuse")(capped.count())
    val pairs = time("pairs-intersect-join") {
      val p = LlmOps.jaccardPairsFrom(docs); p.count(); p
    }
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
    // mirrored star-contraction loop with per-round timing (the real one
    // is private inside connectedComponents)
    time("cc-mirrored-rounds") {
      var e = time("  cc-initial-ckpt-call") {
        edges.where(col("u") =!= col("v"))
          .select(greatest(col("u"), col("v")).cast("long").as("a"),
            least(col("u"), col("v")).cast("long").as("b"))
          .distinct().localCheckpoint(false)
      }
      time("  cc-initial-ckpt-call-2") {
        edges.where(col("u") =!= col("v"))
          .select(greatest(col("u"), col("v")).cast("long").as("a"),
            least(col("u"), col("v")).cast("long").as("b"))
          .distinct().localCheckpoint(false)
      }
      def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.select(xxhash64(col("a"), col("b")).as("h"))
          .agg(count(lit(1)), coalesce(expr("bit_xor(h)"), lit(0L))).first()
        (r.getLong(0), r.getLong(1))
      }
      def largeStar(in: org.apache.spark.sql.DataFrame) = {
        val sym = in.select(col("a").as("x"), col("b").as("y"))
          .unionByName(in.select(col("b").as("x"), col("a").as("y")))
        val m = sym.groupBy("x").agg(least(min(col("y")), col("x")).as("m"))
        sym.join(m, "x").where(col("y") > col("x"))
          .select(col("y").as("a"), col("m").as("b")).distinct()
      }
      def smallStar(in: org.apache.spark.sql.DataFrame) = {
        val m = in.groupBy("a").agg(min(col("b")).as("m"))
        in.join(m, "a").where(col("b") =!= col("m"))
          .select(col("b").as("a"), col("m").as("b"))
          .unionByName(m.select(col("a"), col("m").as("b")))
          .distinct()
      }
      var s0 = time("  cc-init-sig")(sig(e))
      var converged = false
      var it = 0
      while (!converged && it < 20) {
        val next = time(f"  cc-build-$it%02d")(
          smallStar(largeStar(e)).localCheckpoint(false))
        val ns = time(f"  cc-round-$it%02d")(sig(next))
        converged = ns == s0
        e = next; s0 = ns; it += 1
      }
      println(s"  rounds=$it edges=${s0._1}")
    }
    time("connected-components")(LlmOps.connectedComponents(edges).count())
    time("cc-again-warm")(LlmOps.connectedComponents(edges).count())
    spark.stop()
  }
}
