package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.SparkSession

/** Round-8 batch: concentration / association / directional statistics —
  * the model-monitoring and behavioral-analytics aggregates a training-data
  * pipeline runs next to its quality gates (cf. the drift family:
  * agg_psi_drift, agg_auc_roc, agg_calibration_bins in
  * TemporalSketchOps.scala).
  *
  * Provenance: the reference's sales-events domain (framework.py:310-349)
  * delegates all analytics to engine SQL; these are the standard shapes a
  * user of that pipeline would run, expressed Spark-first.
  *
  * Engine-determinism: every sum that crosses the DuckDB oracle boundary is
  * an exact BIGINT (values quantized per-row BEFORE aggregation, so the sum
  * is order-independent); floats enter only in per-row IEEE arithmetic or
  * the final division — see core.scala's driver-boundary protocol.
  */
object StatsMlOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // Herfindahl–Hirschman concentration index of revenue by customer within
  // each order priority. Per-customer revenue is an exact BIGINT cents sum
  // (one partial-aggregated shuffle on (priority, custkey)); each squared
  // share is computed per-GROUP in IEEE double (identical in both engines)
  // and quantized to 1e12 BEFORE the final sum, so the HHI total is an
  // order-independent BIGINT sum — no float-accumulation drift at any
  // parallelism. Two shuffles total (customer rollup, priority rollup);
  // the priority totals join back by broadcast (5 rows). At 100 TB the
  // per-customer rollup is the only big exchange and it partial-aggregates
  // map-side.
  private val aggHhi = Op(
    "agg_hhi",
    (s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_hhi")
      s.sql("""
        WITH rev AS (SELECT o_orderpriority AS prio, o_custkey,
                            CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                                 AS BIGINT) AS r
                     FROM orders_hhi GROUP BY 1, 2),
             tot AS (SELECT prio, CAST(SUM(r) AS BIGINT) AS t,
                            CAST(COUNT(*) AS BIGINT) AS n_firms
                     FROM rev GROUP BY 1),
             q AS (SELECT rev.prio, n_firms,
                          CAST(round((CAST(r AS DOUBLE) / t) *
                                     (CAST(r AS DOUBLE) / t) * 1000000000000)
                               AS BIGINT) AS sq
                   FROM rev JOIN tot ON rev.prio = tot.prio)
        SELECT prio AS o_orderpriority, n_firms,
               round(CAST(SUM(sq) AS DOUBLE) / 1000000000000.0D, 6) AS hhi
        FROM q GROUP BY prio, n_firms ORDER BY prio""")
    },
    Some("""WITH rev AS (SELECT o_orderpriority AS prio, o_custkey,
                                CAST(SUM(CAST(round(o_totalprice * 100)
                                              AS BIGINT)) AS BIGINT) AS r
                         FROM orders GROUP BY 1, 2),
                 tot AS (SELECT prio, CAST(SUM(r) AS BIGINT) AS t,
                                CAST(COUNT(*) AS BIGINT) AS n_firms
                         FROM rev GROUP BY 1),
                 q AS (SELECT rev.prio, n_firms,
                              CAST(round((CAST(r AS DOUBLE) / t) *
                                         (CAST(r AS DOUBLE) / t)
                                         * 1000000000000) AS BIGINT) AS sq
                       FROM rev JOIN tot ON rev.prio = tot.prio)
            SELECT prio AS o_orderpriority, n_firms,
                   round(CAST(SUM(sq) AS DOUBLE) / 1000000000000.0, 6) AS hhi
            FROM q GROUP BY prio, n_firms ORDER BY prio"""))

  // Spearman rank correlation (quantity vs extended price per return flag).
  // Tied ranks use the textbook AVERAGE-rank convention, kept integral by
  // doubling: 2·avgrank = 2·RANK() + tiecount − 1 (RANK is the tie group's
  // min rank; avg = min + (cnt−1)/2). All five moment sums are exact
  // BIGINTs (max term ≈ (2n)² · n ≈ 3e16 at sf0.1 — no overflow); the
  // Pearson-on-ranks combination happens in double AFTER the exact sums,
  // so the result is bit-stable across partitionings. Cost: two windows
  // over the same (flag) partitioning — ONE shuffle, two in-partition
  // sorts — then a partial-aggregated rollup.
  private val aggSpearman = Op(
    "agg_spearman",
    (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_sp")
      s.sql("""
        WITH r AS (SELECT l_returnflag AS g,
                          2 * RANK() OVER (PARTITION BY l_returnflag
                                           ORDER BY l_quantity)
                            + COUNT(*) OVER (PARTITION BY l_returnflag,
                                                          l_quantity) - 1
                            AS rx,
                          2 * RANK() OVER (PARTITION BY l_returnflag
                                           ORDER BY l_extendedprice)
                            + COUNT(*) OVER (PARTITION BY l_returnflag,
                                                          l_extendedprice) - 1
                            AS ry
                   FROM lineitem_sp),
             m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(rx) AS BIGINT) AS sx,
                          CAST(SUM(ry) AS BIGINT) AS sy,
                          CAST(SUM(rx * rx) AS BIGINT) AS sxx,
                          CAST(SUM(ry * ry) AS BIGINT) AS syy,
                          CAST(SUM(rx * ry) AS BIGINT) AS sxy
                   FROM r GROUP BY g)
        SELECT g AS l_returnflag, n,
               round((CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                     / (sqrt(CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                        * sqrt(CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)),
                     6) AS spearman
        FROM m ORDER BY g""")
    },
    Some("""WITH r AS (SELECT l_returnflag AS g,
                              2 * RANK() OVER (PARTITION BY l_returnflag
                                               ORDER BY l_quantity)
                                + COUNT(*) OVER (PARTITION BY l_returnflag,
                                                              l_quantity) - 1
                                AS rx,
                              2 * RANK() OVER (PARTITION BY l_returnflag
                                               ORDER BY l_extendedprice)
                                + COUNT(*) OVER (PARTITION BY l_returnflag,
                                                       l_extendedprice) - 1
                                AS ry
                       FROM lineitem),
                 m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(rx) AS BIGINT) AS sx,
                              CAST(SUM(ry) AS BIGINT) AS sy,
                              CAST(SUM(rx * rx) AS BIGINT) AS sxx,
                              CAST(SUM(ry * ry) AS BIGINT) AS syy,
                              CAST(SUM(rx * ry) AS BIGINT) AS sxy
                       FROM r GROUP BY g)
            SELECT g AS l_returnflag, n,
                   round((CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                         / (sqrt(CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                            * sqrt(CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)),
                         6) AS spearman
            FROM m ORDER BY g"""))

  // Bollinger bands — the rolling mean ± 2σ envelope over each user's
  // trailing 20 events. The frame keeps THREE exact integer accumulators
  // (count, Σcents, Σcents²; max Σx² ≈ 20 · 2.4e9 ≈ 5e10 — no overflow),
  // so mean/σ come out of per-row double math on exact ints — identical
  // in both engines, no running-float drift. ONE shuffle on user_id;
  // both windows share the same (user_id / ts) sort. 100 TB: per-user
  // state is O(frame), never whole-history.
  // Rounding protocol: Σcents/n yields TERMINATING 5-decimal values that
  // sit exactly on the 4-decimal half boundary (66.55375), where Spark's
  // shortest-repr HALF_UP and DuckDB's scaled nearbyint disagree by one
  // ulp of output. So each band is rounded ON THE 1e-4 GRID as an integer
  // (round(x·100 cents) — exact halves are then binary-representable and
  // both engines tie away from zero) and divided back once.
  private val windowBollinger = Op(
    "window_bollinger",
    (s, d) => {
      t(s, d, "events").createOrReplaceTempView("events_bb")
      s.sql("""
        WITH e AS (SELECT user_id, event_id, ts,
                          CAST(round(value * 100) AS BIGINT) AS cents
                   FROM events_bb WHERE user_id % 10 = 0),
             w AS (SELECT user_id, event_id, cents,
                          CAST(COUNT(*) OVER fr AS BIGINT) AS n,
                          CAST(SUM(cents) OVER fr AS BIGINT) AS s1,
                          CAST(SUM(cents * cents) OVER fr AS BIGINT) AS s2
                   FROM e
                   WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        SELECT user_id, event_id, n,
               CAST(round(CAST(s1 AS DOUBLE) * 100 / n) AS BIGINT)
                 / 10000.0D AS mid,
               CAST(round((CAST(s1 AS DOUBLE) / n
                           + 2 * sqrt((CAST(s2 AS DOUBLE)
                                       - CAST(s1 AS DOUBLE) * s1 / n) / n))
                          * 100) AS BIGINT) / 10000.0D AS upper,
               CAST(round((CAST(s1 AS DOUBLE) / n
                           - 2 * sqrt((CAST(s2 AS DOUBLE)
                                       - CAST(s1 AS DOUBLE) * s1 / n) / n))
                          * 100) AS BIGINT) / 10000.0D AS lower
        FROM w ORDER BY user_id, event_id""")
    },
    Some("""WITH e AS (SELECT user_id, event_id, ts,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events WHERE user_id % 10 = 0),
                 w AS (SELECT user_id, event_id, cents,
                              CAST(COUNT(*) OVER fr AS BIGINT) AS n,
                              CAST(SUM(cents) OVER fr AS BIGINT) AS s1,
                              CAST(SUM(cents * cents) OVER fr AS BIGINT) AS s2
                       FROM e
                       WINDOW fr AS (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 19 PRECEDING
                                              AND CURRENT ROW))
            SELECT user_id, event_id, n,
                   CAST(round(CAST(s1 AS DOUBLE) * 100 / n) AS BIGINT)
                     / 10000.0 AS mid,
                   CAST(round((CAST(s1 AS DOUBLE) / n
                               + 2 * sqrt((CAST(s2 AS DOUBLE)
                                       - CAST(s1 AS DOUBLE) * s1 / n) / n))
                              * 100) AS BIGINT) / 10000.0 AS upper,
                   CAST(round((CAST(s1 AS DOUBLE) / n
                               - 2 * sqrt((CAST(s2 AS DOUBLE)
                                       - CAST(s1 AS DOUBLE) * s1 / n) / n))
                              * 100) AS BIGINT) / 10000.0 AS lower
            FROM w ORDER BY user_id, event_id"""))

  // Circular (directional) mean of event time-of-day per event type — the
  // correct average for angles, where 23:50 and 00:10 average to midnight,
  // not noon. Each row's unit vector (sin θ, cos θ) is quantized to 1e6
  // BEFORE summation (coarse enough that a last-ulp libm difference between
  // JVM and C never crosses a rounding boundary, fine enough for 4-decimal
  // output), so the resultant vector is an exact BIGINT sum — order-
  // independent at any parallelism. One partial-aggregated shuffle on
  // event_type; atan2/sqrt run once per group on identical inputs.
  private val aggCircularMean = Op(
    "agg_circular_mean",
    (s, d) => {
      t(s, d, "events").createOrReplaceTempView("events_cm")
      s.sql("""
        WITH a AS (SELECT event_type,
                          2 * pi() * (CAST(unix_timestamp(ts) % 86400
                                           AS DOUBLE) / 86400.0D) AS th
                   FROM events_cm),
             q AS (SELECT event_type,
                          CAST(round(sin(th) * 1000000) AS BIGINT) AS s,
                          CAST(round(cos(th) * 1000000) AS BIGINT) AS c
                   FROM a),
             m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(s) AS BIGINT) AS ss,
                          CAST(SUM(c) AS BIGINT) AS sc
                   FROM q GROUP BY 1)
        SELECT event_type, n,
               round(degrees(atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))),
                     4) AS mean_dir_deg,
               round(sqrt(CAST(ss AS DOUBLE) * ss + CAST(sc AS DOUBLE) * sc)
                     / (1000000.0D * n), 6) AS resultant_len
        FROM m ORDER BY event_type""")
    },
    Some("""WITH a AS (SELECT event_type,
                              2 * pi() * (CAST(CAST(floor(epoch(ts)) AS BIGINT)
                                               % 86400 AS DOUBLE)
                                          / 86400.0) AS th
                       FROM events),
                 q AS (SELECT event_type,
                              CAST(round(sin(th) * 1000000) AS BIGINT) AS s,
                              CAST(round(cos(th) * 1000000) AS BIGINT) AS c
                       FROM a),
                 m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(s) AS BIGINT) AS ss,
                              CAST(SUM(c) AS BIGINT) AS sc
                       FROM q GROUP BY 1)
            SELECT event_type, n,
                   round(degrees(atan2(CAST(ss AS DOUBLE),
                                       CAST(sc AS DOUBLE))), 4)
                     AS mean_dir_deg,
                   round(sqrt(CAST(ss AS DOUBLE) * ss
                              + CAST(sc AS DOUBLE) * sc)
                         / (1000000.0 * n), 6) AS resultant_len
            FROM m ORDER BY event_type"""))

  // Event-type co-occurrence with association lift — market-basket over
  // user histories, restricted to HIGH-VALUE events (value ≥ 100) so the
  // baskets are discriminative. The candidate space is the distinct
  // (user, type) set (≤ 5 types per user), so the self-join fans out to
  // ≤ |types|² rows per USER — linear in users, never events². Shuffles:
  // one distinct, one equi-join on user_id, one pair rollup; the per-type
  // totals (5 rows) and the scalar user count join back by broadcast.
  // lift > 1 ⇒ the behaviors co-occur more than independence predicts.
  private val eventCooccurrence = Op(
    "event_cooccurrence",
    (s, d) => {
      t(s, d, "events").createOrReplaceTempView("events_co")
      s.sql("""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events_co
                    WHERE value >= 100),
             u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
                   FROM ut),
             tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM ut GROUP BY 1),
             pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                              CAST(COUNT(*) AS BIGINT) AS n_both
                       FROM ut a JOIN ut b
                         ON a.user_id = b.user_id
                        AND a.event_type < b.event_type
                       GROUP BY 1, 2)
        SELECT type_a, type_b, n_both, x.cnt AS n_a, y.cnt AS n_b,
               round(CAST(n_both AS DOUBLE) / n_users, 6) AS support,
               round(CAST(n_both AS DOUBLE) * n_users
                     / (CAST(x.cnt AS DOUBLE) * y.cnt), 6) AS lift
        FROM pairs JOIN tc x ON x.event_type = type_a
                   JOIN tc y ON y.event_type = type_b
                   CROSS JOIN u
        ORDER BY type_a, type_b""")
    },
    Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events
                        WHERE value >= 100),
                 u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
                                AS n_users FROM ut),
                 tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
                        FROM ut GROUP BY 1),
                 pairs AS (SELECT a.event_type AS type_a,
                                  b.event_type AS type_b,
                                  CAST(COUNT(*) AS BIGINT) AS n_both
                           FROM ut a JOIN ut b
                             ON a.user_id = b.user_id
                            AND a.event_type < b.event_type
                           GROUP BY 1, 2)
            SELECT type_a, type_b, n_both, x.cnt AS n_a, y.cnt AS n_b,
                   round(CAST(n_both AS DOUBLE) / n_users, 6) AS support,
                   round(CAST(n_both AS DOUBLE) * n_users
                         / (CAST(x.cnt AS DOUBLE) * y.cnt), 6) AS lift
            FROM pairs JOIN tc x ON x.event_type = type_a
                       JOIN tc y ON y.event_type = type_b
                       CROSS JOIN u
            ORDER BY type_a, type_b"""))

  val ops: Seq[Op] =
    Seq(aggHhi, aggSpearman, windowBollinger, aggCircularMean,
      eventCooccurrence)
}
