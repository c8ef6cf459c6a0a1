package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the third
  * mergeable-sketch family next to HLL (`agg_hll_partial_merge`, distinct
  * counts) and t-digest (`agg_approx_quantile`, quantiles): approximate
  * item frequencies in one pass with a fixed k-entry summary.
  *
  * Guarantees (n = rows seen, k = capacity): every item with true
  * frequency > n/k is present in the summary, and each reported estimate
  * undercounts its true frequency by at most n/k. Counts depend on
  * partition/merge order (like every MG implementation), so the key is
  * declared test-only: PropertySpec pins the coverage + error-bound
  * guarantees on planted skew rather than exact values.
  *
  * The map-side summary is O(k) however large the partition — this is the
  * 100 TB shape for "top sellers per shard" style questions where an exact
  * global groupBy would shuffle every distinct key.
  */
final case class MGSummary(items: Map[String, Long])

final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], MGSummary] {
  require(k > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    if (b.contains(x)) b.updated(x, b(x) + 1L)
    else if (b.size < k) b.updated(x, 1L)
    else b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap

  /** Standard MG merge: sum summaries, then if over capacity subtract the
    * (k+1)-th largest count from everything and drop the non-positives —
    * preserving the n/k error bound across partials. */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (x, c)) =>
      m.updated(x, m.getOrElse(x, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(b: Map[String, Long]): MGSummary = MGSummary(b)

  // the buffer lives as a JVM object inside the TypedImperativeAggregate;
  // kryo only pays on spill/partial-exchange
  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
}
