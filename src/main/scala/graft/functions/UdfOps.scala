package graft.functions

import graft.{Op, Tables}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDF / UDAF / UDTF surface (SURVEY.md §2C, §4.3).
  *
  * `udaf_typed` is the one place the engine needs custom Catalyst code: a
  * typed `Aggregator[IN, BUF, OUT]` (public stable API). It accumulates in
  * integer cents so the result is exact and independent of partition merge
  * order — the same reason the relational operators aggregate in DECIMAL.
  */
object UdfOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Slugify: lowercase, collapse non-alphanumerics to '-', strip edges.
    * SQL-replicable so the oracle can run the same logic. */
  private val slugifyFn: String => String = s =>
    if (s == null) null
    else s.toLowerCase.replaceAll("[^a-z0-9]+", "-").replaceAll("^-|-$", "")

  private val udfScalar = Op(
    "udf_scalar",
    (s, d) => {
      val slugify = udf(slugifyFn)
      t(s, d, "customer")
        .select(col("c_custkey"), slugify(col("c_name")).as("slug"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey,
              regexp_replace(regexp_replace(lower(c_name), '[^a-z0-9]+', '-', 'g'),
                             '^-|-$', '', 'g') AS slug
            FROM customer ORDER BY c_custkey"""))

  /** Weighted-average input row: (priceCents, weight). */
  final case class WIn(cents: Long, w: Long)
  final case class WBuf(num: Long, den: Long)

  /** Weighted average in integer cents: exact, merge-order-independent. */
  object WeightedAvg extends Aggregator[WIn, WBuf, Double] {
    override def zero: WBuf = WBuf(0L, 0L)
    override def reduce(b: WBuf, in: WIn): WBuf =
      WBuf(b.num + in.cents * in.w, b.den + in.w)
    override def merge(a: WBuf, b: WBuf): WBuf =
      WBuf(a.num + b.num, a.den + b.den)
    override def finish(b: WBuf): Double =
      if (b.den == 0L) Double.NaN
      else b.num.toDouble / (b.den * 100L).toDouble
    override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private val udafTyped = Op(
    "udaf_typed",
    (s, d) => {
      val wavg = udaf(WeightedAvg)
      t(s, d, "part")
        .withColumn("cents", expr("CAST(round(p_retailprice * 100) AS BIGINT)"))
        .withColumn("w", col("p_size").cast("long"))
        .groupBy("p_brand")
        .agg(wavg(col("cents"), col("w")).as("weighted_avg_price"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand,
              CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT) * p_size) AS DOUBLE)
                / CAST(SUM(CAST(p_size AS BIGINT)) * 100 AS DOUBLE) AS weighted_avg_price,
              COUNT(*) AS n
            FROM part GROUP BY p_brand ORDER BY p_brand"""))

  // Generator (UDTF shape): one vector row -> per-dimension rows with
  // ordinality. posexplode over a genuinely array-typed column is pure
  // map-side generation — no shuffle, no per-group array buffering; the only
  // exchange is the determinism ORDER BY the oracle compare requires.
  private val udtfGenerate = Op(
    "udtf_generate",
    (s, d) => t(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("vec_id"), (col("pos0") + 1).cast("int").as("pos"), col("v"))
      .orderBy("vec_id", "pos"),
    Some("""SELECT vec_id,
              CAST(unnest(range(1, len(embedding) + 1)) AS INT) AS pos,
              unnest(embedding) AS v
            FROM embeddings
            ORDER BY vec_id, pos"""))

  // Typed Dataset[T] surface: case-class Encoders + groupByKey/mapGroups —
  // the type-safe entry point for per-group imperative logic (the escape
  // hatch when aggregation logic won't express as SQL aggregates). The
  // group reduction here uses only order-independent math (count, max) so
  // results are partition-stable. Costs one shuffle on the key like any
  // agg, but mapGroups is opaque to Catalyst (no partial aggregation, no
  // codegen) — for SQL-expressible reductions the untyped agg is the
  // performant path; this key exists to pin the typed surface.
  private val dsTypedOps = Op(
    "ds_typed_ops",
    (s, d) => {
      implicit val ordEnc: Encoder[UdfOps.OrderRow] = Encoders.product[UdfOps.OrderRow]
      implicit val outEnc: Encoder[UdfOps.CustSpend] = Encoders.product[UdfOps.CustSpend]
      implicit val longEnc: Encoder[Long] = Encoders.scalaLong
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .as[UdfOps.OrderRow]
        .filter((r: UdfOps.OrderRow) => r.o_orderstatus != "F")
        .groupByKey((r: UdfOps.OrderRow) => r.o_custkey)
        .mapGroups { (k: Long, it: Iterator[UdfOps.OrderRow]) =>
          var n = 0L
          var mx = Double.MinValue
          it.foreach { r => n += 1; if (r.o_totalprice > mx) mx = r.o_totalprice }
          UdfOps.CustSpend(k, n, mx)
        }
        .toDF()
        .where(col("o_custkey") % 25 === 0)
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey, count(*) AS n_orders, max(o_totalprice) AS max_price
            FROM orders WHERE o_orderstatus <> 'F'
            GROUP BY o_custkey HAVING o_custkey % 25 = 0
            ORDER BY o_custkey"""))

  val ops: Seq[Op] = Seq(udfScalar, udafTyped, udtfGenerate, dsTypedOps)

  final case class OrderRow(o_orderkey: Long, o_custkey: Long,
    o_orderstatus: String, o_totalprice: Double)
  final case class CustSpend(o_custkey: Long, n_orders: Long, max_price: Double)
}
