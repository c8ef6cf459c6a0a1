package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.SparkSession

/** Round-8 continuation batch: production-metrics operators — the running
  * financial aggregates, model-fit diagnostics, freshness/health audits,
  * and engagement ratios an analytics platform serves daily over the
  * reference's sales-events domain (framework.py:310-349 delegates these
  * to engine SQL; here they are expressed Spark-first).
  *
  * Engine-determinism follows the repo protocol (core.scala): every sum
  * crossing the DuckDB oracle boundary is an exact BIGINT (per-row
  * quantization BEFORE aggregation → order-independent), floats enter in
  * fixed per-row/per-group IEEE expressions only, one final round(…, 6).
  */
object MetricsOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // Running VWAP (volume-weighted average price) per part over its ship
  // history — the canonical "weighted running mean" finance shape, distinct
  // from window_twap (time-weighted) and window_bollinger (unweighted ±σ).
  // Both cumulative sums (Σ price·qty in cents, Σ qty) are exact BIGINTs
  // sharing ONE (partkey / shipdate) sort — a single shuffle, two frames
  // over the same window spec; the published value is an exact micro-USD
  // integer (floor division, Spark DIV ≡ DuckDB //) so no float-rounding
  // boundary can split the engines. Restricted
  // to a fixed part range so the published result is a bounded table; at
  // 100 TB the partition key spreads the sort across the cluster and the
  // frame is ROWS UNBOUNDED PRECEDING — O(1) state per row, no buffering.
  private val windowVwap = Op(
    "window_vwap",
    (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_vw")
      s.sql("""
        WITH b AS (SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                          CAST(round(l_quantity) AS BIGINT) AS q
                   FROM lineitem_vw WHERE l_partkey <= 200),
             r AS (SELECT l_partkey, l_orderkey, l_linenumber,
                          CAST(SUM(pc * q) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS spq,
                          CAST(SUM(q) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sq
                   FROM b)
        SELECT l_partkey, l_orderkey, l_linenumber,
               CAST((spq * 10000) div sq AS DOUBLE) / 1000000.0D AS vwap
        FROM r ORDER BY l_partkey, l_orderkey, l_linenumber""")
    },
    Some("""WITH b AS (SELECT l_partkey, l_shipdate, l_orderkey,
                              l_linenumber,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS pc,
                              CAST(round(l_quantity) AS BIGINT) AS q
                       FROM lineitem WHERE l_partkey <= 200),
                 r AS (SELECT l_partkey, l_orderkey, l_linenumber,
                              CAST(SUM(pc * q) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey, l_linenumber
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS spq,
                              CAST(SUM(q) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey, l_linenumber
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sq
                       FROM b)
            SELECT l_partkey, l_orderkey, l_linenumber,
                   CAST((spq * 10000) // sq AS DOUBLE) / 1000000.0 AS vwap
            FROM r ORDER BY l_partkey, l_orderkey, l_linenumber"""))

  // Multiple (two-predictor) OLS regression by normal equations —
  // extendedprice ~ quantity + discount per return flag, the step past
  // agg_regression's single-predictor fit. All NINE moment sums (n, Σx₁,
  // Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y, Σx₂y) are exact BIGINTs collected
  // in ONE partial-aggregated scan (the 100 TB shape: the fit is free next
  // to the scan — no second pass, no gram-matrix shuffle). The 3×3 system
  // solves per GROUP by Cramer's rule in float64 — a fixed IEEE expression
  // tree both engines evaluate identically — and rounds once.
  private val aggOlsMulti = Op(
    "agg_ols_multi",
    (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_ols")
      s.sql("""
        WITH b AS (SELECT l_returnflag AS flag,
                          CAST(round(l_quantity) AS BIGINT) AS x1,
                          CAST(round(l_discount * 100) AS BIGINT) AS x2,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS y
                   FROM lineitem_ols),
             m AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(x1) AS BIGINT) AS s1,
                          CAST(SUM(x2) AS BIGINT) AS s2,
                          CAST(SUM(y) AS BIGINT) AS sy,
                          CAST(SUM(x1 * x1) AS BIGINT) AS s11,
                          CAST(SUM(x2 * x2) AS BIGINT) AS s22,
                          CAST(SUM(x1 * x2) AS BIGINT) AS s12,
                          CAST(SUM(x1 * y) AS BIGINT) AS s1y,
                          CAST(SUM(x2 * y) AS BIGINT) AS s2y
                   FROM b GROUP BY 1),
             f AS (SELECT flag, n,
                          CAST(n AS DOUBLE) AS dn,
                          CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
                          CAST(sy AS DOUBLE) AS dy,
                          CAST(s11 AS DOUBLE) AS d11,
                          CAST(s22 AS DOUBLE) AS d22,
                          CAST(s12 AS DOUBLE) AS d12,
                          CAST(s1y AS DOUBLE) AS d1y,
                          CAST(s2y AS DOUBLE) AS d2y
                   FROM m)
        SELECT flag, n,
               round((dy * (d11 * d22 - d12 * d12)
                      - d1 * (d1y * d22 - d12 * d2y)
                      + d2 * (d1y * d12 - d11 * d2y))
                     / (dn * (d11 * d22 - d12 * d12)
                        - d1 * (d1 * d22 - d12 * d2)
                        + d2 * (d1 * d12 - d11 * d2)), 6) AS b0,
               round((dn * (d1y * d22 - d12 * d2y)
                      - dy * (d1 * d22 - d12 * d2)
                      + d2 * (d1 * d2y - d1y * d2))
                     / (dn * (d11 * d22 - d12 * d12)
                        - d1 * (d1 * d22 - d12 * d2)
                        + d2 * (d1 * d12 - d11 * d2)), 6) AS b1,
               round((dn * (d11 * d2y - d1y * d12)
                      - d1 * (d1 * d2y - d1y * d2)
                      + dy * (d1 * d12 - d11 * d2))
                     / (dn * (d11 * d22 - d12 * d12)
                        - d1 * (d1 * d22 - d12 * d2)
                        + d2 * (d1 * d12 - d11 * d2)), 6) AS b2
        FROM f ORDER BY flag""")
    },
    Some("""WITH b AS (SELECT l_returnflag AS flag,
                              CAST(round(l_quantity) AS BIGINT) AS x1,
                              CAST(round(l_discount * 100) AS BIGINT) AS x2,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS y
                       FROM lineitem),
                 m AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(x1) AS BIGINT) AS s1,
                              CAST(SUM(x2) AS BIGINT) AS s2,
                              CAST(SUM(y) AS BIGINT) AS sy,
                              CAST(SUM(x1 * x1) AS BIGINT) AS s11,
                              CAST(SUM(x2 * x2) AS BIGINT) AS s22,
                              CAST(SUM(x1 * x2) AS BIGINT) AS s12,
                              CAST(SUM(x1 * y) AS BIGINT) AS s1y,
                              CAST(SUM(x2 * y) AS BIGINT) AS s2y
                       FROM b GROUP BY 1),
                 f AS (SELECT flag, n,
                              CAST(n AS DOUBLE) AS dn,
                              CAST(s1 AS DOUBLE) AS d1,
                              CAST(s2 AS DOUBLE) AS d2,
                              CAST(sy AS DOUBLE) AS dy,
                              CAST(s11 AS DOUBLE) AS d11,
                              CAST(s22 AS DOUBLE) AS d22,
                              CAST(s12 AS DOUBLE) AS d12,
                              CAST(s1y AS DOUBLE) AS d1y,
                              CAST(s2y AS DOUBLE) AS d2y
                       FROM m)
            SELECT flag, n,
                   round((dy * (d11 * d22 - d12 * d12)
                          - d1 * (d1y * d22 - d12 * d2y)
                          + d2 * (d1y * d12 - d11 * d2y))
                         / (dn * (d11 * d22 - d12 * d12)
                            - d1 * (d1 * d22 - d12 * d2)
                            + d2 * (d1 * d12 - d11 * d2)), 6) AS b0,
                   round((dn * (d1y * d22 - d12 * d2y)
                          - dy * (d1 * d22 - d12 * d2)
                          + d2 * (d1 * d2y - d1y * d2))
                         / (dn * (d11 * d22 - d12 * d12)
                            - d1 * (d1 * d22 - d12 * d2)
                            + d2 * (d1 * d12 - d11 * d2)), 6) AS b1,
                   round((dn * (d11 * d2y - d1y * d12)
                          - d1 * (d1 * d2y - d1y * d2)
                          + dy * (d1 * d12 - d11 * d2))
                         / (dn * (d11 * d22 - d12 * d12)
                            - d1 * (d1 * d22 - d12 * d2)
                            + d2 * (d1 * d12 - d11 * d2)), 6) AS b2
            FROM f ORDER BY flag"""))

  // Geometric + harmonic means of order value per priority — the
  // multiplicative / rate-averaging companions to the arithmetic mean
  // (geometric for growth-style quantities, harmonic for rates). Both
  // reduce to exact BIGINT sums via per-row quantization: Σ round(ln(¢)·1e9)
  // and Σ round(1e15/¢) — order-independent at any parallelism — with one
  // exp / one division per group at the end. One partial-aggregated scan
  // collects all three means; nothing here grows with volume but the scan.
  private val aggPowerMeans = Op(
    "agg_power_means",
    (s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_pm")
      s.sql("""
        WITH b AS (SELECT o_orderpriority AS prio,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS pc
                   FROM orders_pm WHERE o_totalprice > 0),
             m AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(pc) AS BIGINT) AS sp,
                          CAST(SUM(CAST(round(ln(CAST(pc AS DOUBLE))
                                              * 1000000000) AS BIGINT))
                               AS BIGINT) AS sln,
                          CAST(SUM(CAST(round(1000000000000000.0D / pc)
                                        AS BIGINT)) AS BIGINT) AS sinv
                   FROM b GROUP BY 1)
        SELECT prio AS o_orderpriority, n,
               round(CAST(sp AS DOUBLE) / n / 100.0D, 6) AS mean_usd,
               round(exp(CAST(sln AS DOUBLE) / n / 1000000000.0D)
                     / 100.0D, 6) AS gmean_usd,
               round(CAST(n AS DOUBLE) * 1000000000000000.0D / sinv
                     / 100.0D, 6) AS hmean_usd
        FROM m ORDER BY prio""")
    },
    Some("""WITH b AS (SELECT o_orderpriority AS prio,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                AS pc
                       FROM orders WHERE o_totalprice > 0),
                 m AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(pc) AS BIGINT) AS sp,
                              CAST(SUM(CAST(round(ln(CAST(pc AS DOUBLE))
                                                  * 1000000000) AS BIGINT))
                                   AS BIGINT) AS sln,
                              CAST(SUM(CAST(round(1000000000000000.0
                                                  / pc) AS BIGINT))
                                   AS BIGINT) AS sinv
                       FROM b GROUP BY 1)
            SELECT prio AS o_orderpriority, n,
                   round(CAST(sp AS DOUBLE) / n / 100.0, 6) AS mean_usd,
                   round(exp(CAST(sln AS DOUBLE) / n / 1000000000.0)
                         / 100.0, 6) AS gmean_usd,
                   round(CAST(n AS DOUBLE) * 1000000000000000.0 / sinv
                         / 100.0, 6) AS hmean_usd
            FROM m ORDER BY prio"""))

  // Data-freshness audit — per event stream: last-seen timestamp, minutes
  // behind the freshest stream, and a staleness flag. The SLA check every
  // ingestion pipeline (the reference's A6 streams included) runs before
  // declaring a table servable. One partial-aggregated scan (MAX per type),
  // a 1-row global MAX joined back by broadcast, integer floor-division
  // minutes (Spark DIV ≡ DuckDB //) — exact on both engines.
  private val dqFreshness = Op(
    "dq_freshness",
    (s, d) => {
      t(s, d, "events").createOrReplaceTempView("events_fr")
      s.sql("""
        WITH m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(MAX(unix_timestamp(ts)) AS BIGINT) AS last_s
                   FROM events_fr GROUP BY 1),
             g AS (SELECT CAST(MAX(last_s) AS BIGINT) AS gmax FROM m)
        SELECT event_type, n, last_s,
               CAST((gmax - last_s) div 60 AS BIGINT) AS lag_min,
               CASE WHEN (gmax - last_s) div 60 > 120
                    THEN 1 ELSE 0 END AS stale
        FROM m CROSS JOIN g ORDER BY event_type""")
    },
    Some("""WITH m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(MAX(CAST(floor(epoch(ts)) AS BIGINT))
                                   AS BIGINT) AS last_s
                       FROM events GROUP BY 1),
                 g AS (SELECT CAST(MAX(last_s) AS BIGINT) AS gmax FROM m)
            SELECT event_type, n, last_s,
                   CAST((gmax - last_s) // 60 AS BIGINT) AS lag_min,
                   CASE WHEN (gmax - last_s) // 60 > 120
                        THEN 1 ELSE 0 END AS stale
            FROM m CROSS JOIN g ORDER BY event_type"""))

  // Deterministic uniform sample without replacement — k=25 per event type
  // by ranking on an md5 of the row key: the reproducible analog of
  // reservoir sampling (same sample on every run/engine, the property audit
  // pipelines need). The rank-≤-k filter triggers Spark's WindowGroupLimit
  // pushdown: each map task pre-limits to its local top-k BEFORE the
  // exchange, so the shuffle carries O(k·partitions) rows, not the table —
  // the same two-phase shape a hand-written reservoir merge would have.
  private val sampleReservoir = Op(
    "sample_reservoir",
    (s, d) => {
      t(s, d, "events").createOrReplaceTempView("events_rs")
      s.sql("""
        WITH h AS (SELECT event_type, event_id,
                          md5(CAST(event_id AS STRING)) AS hk
                   FROM events_rs),
             r AS (SELECT event_type, event_id,
                          ROW_NUMBER() OVER (PARTITION BY event_type
                                             ORDER BY hk, event_id) AS rn
                   FROM h)
        SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id
        FROM r WHERE rn <= 25 ORDER BY event_type, rn""")
    },
    Some("""WITH h AS (SELECT event_type, event_id,
                              md5(CAST(event_id AS VARCHAR)) AS hk
                       FROM events),
                 r AS (SELECT event_type, event_id,
                              ROW_NUMBER() OVER (PARTITION BY event_type
                                                 ORDER BY hk, event_id)
                                AS rn
                       FROM h)
            SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id
            FROM r WHERE rn <= 25 ORDER BY event_type, rn"""))

  // DAU / trailing-7-day-WAU stickiness per day — the engagement ratio on
  // every product dashboard. The scalable spelling: collapse to DISTINCT
  // (day, user) pairs first (one partial-aggregated shuffle — the pair set
  // is orders of magnitude smaller than the event stream), then each pair
  // CONTRIBUTES itself to the 7 windows ending on day..day+6 via a 7-row
  // explode and a plain equi-groupBy COUNT(DISTINCT) — no range join, no
  // rolling-distinct window state. Expanded days with no traffic of their
  // own drop by the inner join with the DAU relation.
  private val eventDauWau = Op(
    "event_dau_wau",
    (s, d) => {
      t(s, d, "events").createOrReplaceTempView("events_dw")
      s.sql("""
        WITH du AS (SELECT DISTINCT
                           unix_timestamp(ts) div 86400 AS day, user_id
                    FROM events_dw),
             dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
                     FROM du GROUP BY 1),
             ex AS (SELECT du.day + i AS wday, du.user_id
                    FROM du LATERAL VIEW explode(sequence(0, 6)) t AS i),
             wau AS (SELECT wday AS day,
                            CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
                     FROM ex GROUP BY 1)
        SELECT dau.day AS day_idx, dau.dau, wau.wau,
               round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
        FROM dau JOIN wau ON dau.day = wau.day
        ORDER BY day_idx""")
    },
    Some("""WITH du AS (SELECT DISTINCT
                               CAST(floor(epoch(ts)) AS BIGINT) // 86400
                                 AS day, user_id
                        FROM events),
                 dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
                         FROM du GROUP BY 1),
                 ex AS (SELECT du.day + g.i AS wday, du.user_id
                        FROM du CROSS JOIN (SELECT unnest(
                            generate_series(0, 6)) AS i) g),
                 wau AS (SELECT wday AS day,
                                CAST(COUNT(DISTINCT user_id) AS BIGINT)
                                  AS wau
                         FROM ex GROUP BY 1)
            SELECT dau.day AS day_idx, dau.dau, wau.wau,
                   round(CAST(dau.dau AS DOUBLE) / wau.wau, 6)
                     AS stickiness
            FROM dau JOIN wau ON dau.day = wau.day
            ORDER BY day_idx"""))

  val ops: Seq[Op] =
    Seq(windowVwap, aggOlsMulti, aggPowerMeans, dqFreshness,
      sampleReservoir, eventDauWau)
}
