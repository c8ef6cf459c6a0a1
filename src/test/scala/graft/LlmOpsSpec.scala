package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Seeded-hash LLM ops have no DuckDB oracle (SURVEY.md §7.5.4) — verified
  * here with planted near-duplicates and consistency against exact baselines. */
class LlmOpsSpec extends AnyFunSuite {
  import TestSpark._

  /** Temp "documents" table with planted near-dups:
    * 1↔2 near-identical (1 token of ~60 differs), 3 unrelated. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val other = (1 to 60).map(i => s"other$i").mkString(" ")
    val dir = Files.createTempDirectory("g_planted_").toString
    Seq((1L, "en", base), (2L, "en", near), (3L, "en", other))
      .toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_minhash surfaces the planted near-duplicate pair only") {
    val pairs = SparkEntry.queries("dedup_minhash")(spark, plantedDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("dedup_simhash hamming distance separates near-dups from unrelated") {
    val rows = SparkEntry.queries("dedup_simhash")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.contains((1L, 2L)))
    assert(!rows.contains((1L, 3L)) && !rows.contains((2L, 3L)))
  }

  test("dedup_exact keeps one survivor per duplicated text") {
    import spark.implicits._
    val dir = Files.createTempDirectory("g_exact_").toString
    Seq((1L, "en", "same  text"), (2L, "en", "Same Text"), (3L, "en", "unique"))
      .toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dedup_exact")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L), (3L, 1L)))
  }

  test("sim_ann_lsh cosine values agree with the brute-force baseline") {
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = SparkEntry.queries("sim_ann_lsh")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(ann.nonEmpty)
    // every ANN hit that is also in the exact top-10 must carry the same score
    ann.foreach { case (id, sim) =>
      brute.get(id).foreach(b => assert(math.abs(b - sim) < 1e-9)) }
  }

  test("sim_ann_ivf recalls most of the exact top-10 with nprobe=2") {
    val brute = SparkEntry.queries("sim_cosine_topk")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = SparkEntry.queries("sim_ann_ivf")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(ivf.nonEmpty)
    ivf.foreach { case (id, sim) =>
      brute.get(id).foreach(b => assert(math.abs(b - sim) < 1e-9)) }
    val recall = ivf.count(p => brute.contains(p._1)).toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@10 too low: $recall")
  }

  test("text_fingerprint is deterministic across runs") {
    val a = SparkEntry.queries("text_fingerprint")(spark, sfDir).collect()
    val b = SparkEntry.queries("text_fingerprint")(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("agg_approx_distinct within 5% of exact per group") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k).toDouble - e) / e < 0.05,
        s"$k: approx=${approx(k)} exact=$e") }
  }
}
