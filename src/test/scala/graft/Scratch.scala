package graft

import org.apache.spark.sql.functions._

/** Dev-only profiling scratch (test scope; not part of the shipped library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val bitSums = (0 until 64).map(b =>
      sum(expr(s"int(shiftright(h, $b) & 1)")).as(s"c$b"))
    val simExpr = (0 until 64).map(b =>
      when(col(s"c$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sig = Tables.load(spark, d, "documents")
      .select(col("doc_id"),
        explode(expr("array_distinct(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '))")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), bitSums: _*)
      .select(col("doc_id"), simExpr.as("sim"))

    time("registered op cold")(
      SparkEntry.queries("dedup_simhash")(spark, d).count())

    time("signature only")(sig.count())
    val cached = time("signature cache")(sig.cache().count())
    println(s"[scratch] docs=$cached")

    val chunked = sig.select(col("doc_id"), col("sim"), explode(array(
      (0 until 4).map(j => struct(lit(j).as("j"),
        expr(s"shiftright(sim, ${16 * j}) & 65535").as("c"))): _*)).as("ch"))
      .select(col("doc_id"), col("sim"), col("ch.j"), col("ch.c"))
    val pairs = chunked.as("a")
      .join(chunked.as("b"),
        col("a.j") === col("b.j") && col("a.c") === col("b.c") &&
          col("a.doc_id") < col("b.doc_id"))
    time("raw collision pairs")(println("pairs=" + pairs.count()))

    val full = pairs
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sim ^ b.sim)").as("hamming"))
      .distinct()
      .where(col("hamming") <= 6)
      .orderBy("doc_a", "doc_b")
    time("full from cached sig")(full.count())

    time("registered op")(
      SparkEntry.queries("dedup_simhash")(spark, d).count())
    spark.stop()
  }
}
