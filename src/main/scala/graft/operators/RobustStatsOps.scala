package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-17 robust-statistics and indicator batch (SURVEY.md §2C.r17):
  * homogeneity-of-variance and location tests (Levene/Brown–Forsythe,
  * Bartlett, Mood's median, Cochran's Q), reliability/agreement
  * coefficients (Cronbach's α, one-way ICC), serial-correlation and
  * extreme-value diagnostics (Durbin–Watson, Gumbel fit), and three
  * exact-arithmetic trading indicators (Williams %R, force index, ulcer
  * index).
  *
  * Cross-engine discipline (the agg_anova/theil precedent): every
  * aggregate accumulates EXACT integers (cents/bp quantization; per-group
  * rational terms quantized to 1e6 and summed as DECIMAL(38,0) /
  * HUGEINT so no double ever enters an order-dependent SUM), and float
  * math (ln/sqrt/division) runs once per OUTPUT ROW from those integer
  * moments, then rounds — so Spark and DuckDB hash-match at any scale.
  * Group medians use the domain-collapsed two-phase spelling (per-value
  * counts + a cumulative window over the bounded VALUE domain, never a
  * per-row window over a 5-partition sort — the shape the sf10 probes
  * kill).
  */
object RobustStatsOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private def onEvents(s: SparkSession, d: String, view: String): Unit =
    t(s, d, "events").createOrReplaceTempView(view)
  private def onLineitem(s: SparkSession, d: String, view: String): Unit =
    t(s, d, "lineitem").createOrReplaceTempView(view)

  // Brown–Forsythe Levene test: are the event-type value spreads equal?
  // Deviations |x − group LOWER median| stay exact BIGINTs (the lower
  // median is an observed value, found scale-safely via per-cent counts +
  // one cumulative window over the bounded cent DOMAIN), then the one-way
  // F on deviations reuses the agg_anova quantized-moment discipline.
  private val aggLeveneTest = Op(
    "agg_levene_test",
    (s, d) => {
      onEvents(s, d, "events_lev")
      s.sql("""
        WITH b AS (SELECT event_type AS g,
                          CAST(round(value * 100) AS BIGINT) AS x
                   FROM events_lev),
             vc AS (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c
                    FROM b GROUP BY g, x),
             cum AS (SELECT g, x, c,
                            SUM(c) OVER (PARTITION BY g ORDER BY x) AS cc,
                            SUM(c) OVER (PARTITION BY g) AS n
                     FROM vc),
             med AS (SELECT g, MIN(x) AS med
                     FROM cum WHERE cc >= (n + 1) div 2 GROUP BY g),
             z AS (SELECT b.g, abs(b.x - med.med) AS z
                   FROM b JOIN med ON b.g = med.g),
             m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(z) AS BIGINT) AS sz,
                          CAST(SUM(z * z) AS BIGINT) AS szz
                   FROM z GROUP BY g),
             q AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                          CAST(SUM(n) AS BIGINT) AS nn,
                          CAST(SUM(sz) AS BIGINT) AS ss,
                          SUM(CAST(round((CAST(szz AS DOUBLE)
                                 - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                                   / n) * 1000000) AS DECIMAL(38,0)))
                            AS ssw_q,
                          SUM(CAST(round(CAST(sz AS DOUBLE)
                                 * CAST(sz AS DOUBLE) / n * 1000000)
                                 AS DECIMAL(38,0))) AS sgm_q
                   FROM m)
        SELECT k, nn AS n,
               round((CAST(sgm_q AS DOUBLE) / 1000000.0D
                      - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / nn)
                     / (k - 1)
                     / (CAST(ssw_q AS DOUBLE) / 1000000.0D / (nn - k)),
                     6) AS f_stat
        FROM q""")
    },
    Some("""WITH b AS (SELECT event_type AS g,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events),
                 vc AS (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c
                        FROM b GROUP BY g, x),
                 cum AS (SELECT g, x, c,
                                SUM(c) OVER (PARTITION BY g ORDER BY x) AS cc,
                                SUM(c) OVER (PARTITION BY g) AS n
                         FROM vc),
                 med AS (SELECT g, MIN(x) AS med
                         FROM cum WHERE cc >= (n + 1) // 2 GROUP BY g),
                 z AS (SELECT b.g, abs(b.x - med.med) AS z
                       FROM b JOIN med ON b.g = med.g),
                 m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(z) AS BIGINT) AS sz,
                              CAST(SUM(z * z) AS BIGINT) AS szz
                       FROM z GROUP BY g),
                 q AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                              CAST(SUM(n) AS BIGINT) AS nn,
                              CAST(SUM(sz) AS BIGINT) AS ss,
                              SUM(CAST(round((CAST(szz AS DOUBLE)
                                     - CAST(sz AS DOUBLE)
                                       * CAST(sz AS DOUBLE) / n)
                                     * 1000000) AS HUGEINT)) AS ssw_q,
                              SUM(CAST(round(CAST(sz AS DOUBLE)
                                     * CAST(sz AS DOUBLE) / n * 1000000)
                                     AS HUGEINT)) AS sgm_q
                       FROM m)
            SELECT k, nn AS n,
                   round((CAST(sgm_q AS DOUBLE) / 1000000.0
                          - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / nn)
                         / (k - 1)
                         / (CAST(ssw_q AS DOUBLE) / 1000000.0 / (nn - k)),
                         6) AS f_stat
            FROM q"""))

  // Bartlett's homogeneity-of-variance test (the parametric sibling of
  // Levene). Per-group sample variances come from exact integer moments;
  // the two order-dependent float sums — Σ(n_i−1)·ln(s_i²) and Σ1/(n_i−1)
  // — are quantized per GROUP (1e6 / 1e12) and summed as BIGINTs, so the
  // 5-row reduction is order-independent on both engines; the statistic
  // evaluates once from the integer totals. Zero-variance groups (all
  // cents equal, n≥2) are filtered identically on both engines — ln(0)
  // is NULL on Spark but an error on DuckDB, so without the s2>0 gate
  // the engines would split on degenerate input (ADVICE r17 #1).
  private val aggBartlettTest = Op(
    "agg_bartlett_test",
    (s, d) => {
      onEvents(s, d, "events_bar")
      s.sql("""
        WITH b AS (SELECT event_type AS g,
                          CAST(round(value * 100) AS BIGINT) AS x
                   FROM events_bar),
             m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(x) AS BIGINT) AS sx,
                          CAST(SUM(x * x) AS BIGINT) AS sxx
                   FROM b GROUP BY g),
             v AS (SELECT g, n, s2 FROM (
                     SELECT g, n,
                            (CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                              / (n - 1) AS s2
                     FROM m WHERE n >= 2) vv
                   WHERE s2 > 0),
             q AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                          CAST(SUM(n) AS BIGINT) AS nn,
                          SUM(CAST(round((n - 1) * s2 * 1000000)
                                AS DECIMAL(38,0))) AS ssp_q,
                          CAST(SUM(CAST(round((n - 1) * ln(s2) * 1000000)
                                AS BIGINT)) AS BIGINT) AS lns_q,
                          CAST(SUM(CAST(round(1000000000000.0D / (n - 1))
                                AS BIGINT)) AS BIGINT) AS inv_q
                   FROM v)
        SELECT k, nn AS n,
               round(((nn - k) * ln(CAST(ssp_q AS DOUBLE) / 1000000.0D
                                    / (nn - k))
                      - CAST(lns_q AS DOUBLE) / 1000000.0D)
                     / (1.0D + (CAST(inv_q AS DOUBLE) / 1000000000000.0D
                                - 1.0D / (nn - k)) / (3.0D * (k - 1))),
                     6) AS t_stat
        FROM q""")
    },
    Some("""WITH b AS (SELECT event_type AS g,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events),
                 m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(x) AS BIGINT) AS sx,
                              CAST(SUM(x * x) AS BIGINT) AS sxx
                       FROM b GROUP BY g),
                 v AS (SELECT g, n, s2 FROM (
                         SELECT g, n,
                                (CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                   / n) / (n - 1) AS s2
                         FROM m WHERE n >= 2) vv
                       WHERE s2 > 0),
                 q AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                              CAST(SUM(n) AS BIGINT) AS nn,
                              SUM(CAST(round((n - 1) * s2 * 1000000)
                                    AS HUGEINT)) AS ssp_q,
                              CAST(SUM(CAST(round((n - 1) * ln(s2)
                                    * 1000000) AS BIGINT)) AS BIGINT)
                                AS lns_q,
                              CAST(SUM(CAST(round(1000000000000.0
                                    / (n - 1)) AS BIGINT)) AS BIGINT)
                                AS inv_q
                       FROM v)
            SELECT k, nn AS n,
                   round(((nn - k) * ln(CAST(ssp_q AS DOUBLE) / 1000000.0
                                        / (nn - k))
                          - CAST(lns_q AS DOUBLE) / 1000000.0)
                         / (1.0 + (CAST(inv_q AS DOUBLE) / 1000000000000.0
                                    - 1.0 / (nn - k)) / (3.0 * (k - 1))),
                         6) AS t_stat
            FROM q"""))

  // Cronbach's alpha over the three lineitem "items" (quantity, price
  // cents, discount bp): internal-consistency of the line-level measures.
  // α = k/(k−1) · (1 − Σvar_i / var_total); every variance is expressed as
  // the common-denominator integer n·Σx² − (Σx)² (the agg_gage_rr
  // integer-exact SS trick), so the ratio needs no quantization at all —
  // one double division per query.
  private val aggCronbachAlpha = Op(
    "agg_cronbach_alpha",
    (s, d) => {
      onLineitem(s, d, "lineitem_ca")
      s.sql("""
        WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
                          CAST(round(l_discount * 10000) AS BIGINT) AS dd
                   FROM lineitem_ca),
             m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          SUM(CAST(q AS DECIMAL(38,0))) AS sq,
                          SUM(CAST(q * q AS DECIMAL(38,0))) AS sqq,
                          SUM(CAST(p AS DECIMAL(38,0))) AS sp,
                          SUM(CAST(p * p AS DECIMAL(38,0))) AS spp,
                          SUM(CAST(dd AS DECIMAL(38,0))) AS sd,
                          SUM(CAST(dd * dd AS DECIMAL(38,0))) AS sdd,
                          SUM(CAST((q + p + dd) AS DECIMAL(38,0))) AS st,
                          SUM(CAST((q + p + dd) * (q + p + dd)
                                AS DECIMAL(38,0))) AS stt
                   FROM b)
        SELECT n,
               round(3.0D / 2.0D
                     * (1.0D - ((n * CAST(sqq AS DOUBLE)
                                 - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                                + (n * CAST(spp AS DOUBLE)
                                   - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                                + (n * CAST(sdd AS DOUBLE)
                                   - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)))
                               / (n * CAST(stt AS DOUBLE)
                                  - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))),
                     6) AS alpha
        FROM m""")
    },
    Some("""WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS p,
                              CAST(round(l_discount * 10000) AS BIGINT)
                                AS dd
                       FROM lineitem),
                 m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                              SUM(CAST(q AS HUGEINT)) AS sq,
                              SUM(CAST(q * q AS HUGEINT)) AS sqq,
                              SUM(CAST(p AS HUGEINT)) AS sp,
                              SUM(CAST(p * p AS HUGEINT)) AS spp,
                              SUM(CAST(dd AS HUGEINT)) AS sd,
                              SUM(CAST(dd * dd AS HUGEINT)) AS sdd,
                              SUM(CAST((q + p + dd) AS HUGEINT)) AS st,
                              SUM(CAST((q + p + dd) * (q + p + dd)
                                    AS HUGEINT)) AS stt
                       FROM b)
            SELECT n,
                   round(3.0 / 2.0
                         * (1.0 - ((n * CAST(sqq AS DOUBLE)
                                    - CAST(sq AS DOUBLE)
                                      * CAST(sq AS DOUBLE))
                                   + (n * CAST(spp AS DOUBLE)
                                      - CAST(sp AS DOUBLE)
                                        * CAST(sp AS DOUBLE))
                                   + (n * CAST(sdd AS DOUBLE)
                                      - CAST(sd AS DOUBLE)
                                        * CAST(sd AS DOUBLE)))
                                  / (n * CAST(stt AS DOUBLE)
                                     - CAST(st AS DOUBLE)
                                       * CAST(st AS DOUBLE))),
                         6) AS alpha
            FROM m"""))

  // One-way random-effects intraclass correlation ICC(1,1) — how much of
  // the event-value variance is BETWEEN users (user_id mod 20 panels)?
  // Unbalanced design handled by the standard k0 = (N − Σn²/N)/(g−1);
  // MSB/MSW from the same quantized integer moments as agg_anova.
  private val aggIcc = Op(
    "agg_icc",
    (s, d) => {
      onEvents(s, d, "events_icc")
      s.sql("""
        WITH b AS (SELECT CAST(user_id % 20 AS BIGINT) AS g,
                          CAST(round(value * 100) AS BIGINT) AS x
                   FROM events_icc),
             m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(x) AS BIGINT) AS sx,
                          CAST(SUM(x * x) AS BIGINT) AS sxx
                   FROM b GROUP BY g),
             q AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                          CAST(SUM(n) AS BIGINT) AS nn,
                          CAST(SUM(sx) AS BIGINT) AS ss,
                          CAST(SUM(sxx) AS BIGINT) AS sxx,
                          CAST(SUM(n * n) AS BIGINT) AS sn2,
                          SUM(CAST(round((CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                   / n) * 1000000) AS DECIMAL(38,0)))
                            AS ssw_q,
                          SUM(CAST(round(CAST(sx AS DOUBLE)
                                 * CAST(sx AS DOUBLE) / n * 1000000)
                                 AS DECIMAL(38,0))) AS sgm_q
                   FROM m),
             f AS (SELECT k, nn,
                          (CAST(sgm_q AS DOUBLE) / 1000000.0D
                           - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / nn)
                            / (k - 1) AS msb,
                          CAST(ssw_q AS DOUBLE) / 1000000.0D / (nn - k)
                            AS msw,
                          (nn - CAST(sn2 AS DOUBLE) / nn) / (k - 1) AS k0
                   FROM q)
        SELECT k, nn AS n,
               round((msb - msw) / (msb + (k0 - 1.0D) * msw), 6) AS icc
        FROM f""")
    },
    Some("""WITH b AS (SELECT CAST(user_id % 20 AS BIGINT) AS g,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events),
                 m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(x) AS BIGINT) AS sx,
                              CAST(SUM(x * x) AS BIGINT) AS sxx
                       FROM b GROUP BY g),
                 q AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                              CAST(SUM(n) AS BIGINT) AS nn,
                              CAST(SUM(sx) AS BIGINT) AS ss,
                              CAST(SUM(sxx) AS BIGINT) AS sxx,
                              CAST(SUM(n * n) AS BIGINT) AS sn2,
                              SUM(CAST(round((CAST(sxx AS DOUBLE)
                                     - CAST(sx AS DOUBLE)
                                       * CAST(sx AS DOUBLE) / n)
                                     * 1000000) AS HUGEINT)) AS ssw_q,
                              SUM(CAST(round(CAST(sx AS DOUBLE)
                                     * CAST(sx AS DOUBLE) / n * 1000000)
                                     AS HUGEINT)) AS sgm_q
                       FROM m),
                 f AS (SELECT k, nn,
                              (CAST(sgm_q AS DOUBLE) / 1000000.0
                               - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                                 / nn) / (k - 1) AS msb,
                              CAST(ssw_q AS DOUBLE) / 1000000.0 / (nn - k)
                                AS msw,
                              (nn - CAST(sn2 AS DOUBLE) / nn) / (k - 1)
                                AS k0
                       FROM q)
            SELECT k, nn AS n,
                   round((msb - msw) / (msb + (k0 - 1.0) * msw), 6) AS icc
            FROM f"""))

  // Durbin–Watson serial-correlation statistic per sampled user series
  // (every 100th user, ordered by ts then event_id). Multiplying through
  // by n² clears the mean: DW = n²·Σ(Δx)² / Σ(n·x − S)² — both sums are
  // exact integers (DECIMAL/HUGEINT against the sf10 ×100 fan-out), one
  // double division per user row. Partitioned by user_id — the
  // high-cardinality window shape, never a 5-partition sort.
  private val aggDurbinWatson = Op(
    "agg_durbin_watson",
    (s, d) => {
      onEvents(s, d, "events_dw")
      s.sql("""
        WITH b AS (SELECT user_id,
                          CAST(round(value * 100) AS BIGINT) AS x,
                          LAG(CAST(round(value * 100) AS BIGINT))
                            OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS px
                   FROM events_dw WHERE user_id % 100 = 0),
             m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                          SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                          SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
                          SUM(CASE WHEN px IS NULL THEN CAST(0 AS DECIMAL(38,0))
                                   ELSE CAST((x - px) * (x - px)
                                             AS DECIMAL(38,0)) END) AS sdd
                   FROM b GROUP BY user_id)
        SELECT user_id, n,
               round(n * n * CAST(sdd AS DOUBLE)
                     / (n * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n,
                     6) AS dw
        FROM m WHERE n >= 3
          AND n * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        ORDER BY user_id""")
    },
    Some("""WITH b AS (SELECT user_id,
                              CAST(round(value * 100) AS BIGINT) AS x,
                              LAG(CAST(round(value * 100) AS BIGINT))
                                OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS px
                       FROM events WHERE user_id % 100 = 0),
                 m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                              SUM(CAST(x AS HUGEINT)) AS sx,
                              SUM(CAST(x * x AS HUGEINT)) AS sxx,
                              SUM(CASE WHEN px IS NULL
                                       THEN CAST(0 AS HUGEINT)
                                       ELSE CAST((x - px) * (x - px)
                                                 AS HUGEINT) END) AS sdd
                       FROM b GROUP BY user_id)
            SELECT user_id, n,
                   round(n * n * CAST(sdd AS DOUBLE)
                         / (n * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n,
                         6) AS dw
            FROM m WHERE n >= 3
              AND n * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            ORDER BY user_id"""))

  // Cochran's Q: do the three HIGH-VALUE engagement behaviors (a
  // view / click / purchase worth ≥ $80) have equal incidence across user
  // blocks? Binary per-block treatment flags,
  // Q = (k−1)(k·ΣC² − T²) / (k·T − ΣR²) — every term an exact integer,
  // one double division, NULLIF-guarded identically on both engines so a
  // degenerate panel (every block all-or-none) publishes NULL, never an
  // error or an engine split. The ≥ $80 filter is what makes the flags
  // informative: the unfiltered incidence is 100% for every user at every
  // test SF (Q undefined, denominator exactly 0).
  private val aggCochranQ = Op(
    "agg_cochran_q",
    (s, d) => {
      onEvents(s, d, "events_cq")
      s.sql("""
        WITH f AS (SELECT user_id,
                          MAX(CASE WHEN event_type = 'view'
                            AND value >= 80 THEN 1 ELSE 0 END) AS t1,
                          MAX(CASE WHEN event_type = 'click'
                            AND value >= 80 THEN 1 ELSE 0 END) AS t2,
                          MAX(CASE WHEN event_type = 'purchase'
                            AND value >= 80 THEN 1 ELSE 0 END) AS t3
                   FROM events_cq GROUP BY user_id),
             q AS (SELECT CAST(COUNT(*) AS BIGINT) AS blocks,
                          CAST(SUM(t1) AS BIGINT) AS c1,
                          CAST(SUM(t2) AS BIGINT) AS c2,
                          CAST(SUM(t3) AS BIGINT) AS c3,
                          CAST(SUM((t1 + t2 + t3) * (t1 + t2 + t3))
                            AS BIGINT) AS sr2,
                          CAST(SUM(t1 + t2 + t3) AS BIGINT) AS tt
                   FROM f)
        SELECT blocks,
               round(2.0D * (3.0D * (c1 * c1 + c2 * c2 + c3 * c3) - CAST(tt * tt AS DOUBLE))
                     / NULLIF(3.0D * tt - sr2, 0.0D), 6) AS q_stat
        FROM q""")
    },
    Some("""WITH f AS (SELECT user_id,
                              MAX(CASE WHEN event_type = 'view'
                                AND value >= 80 THEN 1 ELSE 0 END) AS t1,
                              MAX(CASE WHEN event_type = 'click'
                                AND value >= 80 THEN 1 ELSE 0 END) AS t2,
                              MAX(CASE WHEN event_type = 'purchase'
                                AND value >= 80 THEN 1 ELSE 0 END) AS t3
                       FROM events GROUP BY user_id),
                 q AS (SELECT CAST(COUNT(*) AS BIGINT) AS blocks,
                              CAST(SUM(t1) AS BIGINT) AS c1,
                              CAST(SUM(t2) AS BIGINT) AS c2,
                              CAST(SUM(t3) AS BIGINT) AS c3,
                              CAST(SUM((t1 + t2 + t3) * (t1 + t2 + t3))
                                AS BIGINT) AS sr2,
                              CAST(SUM(t1 + t2 + t3) AS BIGINT) AS tt
                       FROM f)
            SELECT blocks,
                   round(2.0 * (3.0 * (c1 * c1 + c2 * c2 + c3 * c3)
                                - CAST(tt * tt AS DOUBLE))
                         / NULLIF(3.0 * tt - sr2, 0.0), 6) AS q_stat
            FROM q"""))

  // Mood's median test: χ² on the above/at-or-below-grand-median counts
  // per event type. The grand LOWER median comes from the domain-collapsed
  // two-phase spelling; all cell counts are exact integers and the k
  // per-group χ² terms are quantized (1e6) before the order-independent
  // integer reduction.
  private val aggMoodsMedian = Op(
    "agg_moods_median",
    (s, d) => {
      onEvents(s, d, "events_mm")
      s.sql("""
        WITH b AS (SELECT event_type AS g,
                          CAST(round(value * 100) AS BIGINT) AS x
                   FROM events_mm),
             vc AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c
                    FROM b GROUP BY x),
             cum AS (SELECT x, SUM(c) OVER (ORDER BY x) AS cc,
                            SUM(c) OVER () AS n
                     FROM vc),
             med AS (SELECT MIN(x) AS m FROM cum
                     WHERE cc >= (n + 1) div 2),
             cell AS (SELECT g,
                             CAST(SUM(CASE WHEN x > (SELECT m FROM med)
                               THEN 1 ELSE 0 END) AS BIGINT) AS a,
                             CAST(COUNT(*) AS BIGINT) AS n
                      FROM b GROUP BY g),
             tot AS (SELECT CAST(SUM(a) AS BIGINT) AS ta,
                            CAST(SUM(n) AS BIGINT) AS tn,
                            CAST(COUNT(*) AS BIGINT) AS k
                     FROM cell),
             terms AS (SELECT CAST(SUM(CAST(round(
                             (a - n * CAST(ta AS DOUBLE) / tn)
                             * (a - n * CAST(ta AS DOUBLE) / tn)
                             / (n * CAST(ta AS DOUBLE) / tn) * 1000000
                           ) AS BIGINT)
                           + CAST(round(
                             ((n - a) - n * CAST(tn - ta AS DOUBLE) / tn)
                             * ((n - a) - n * CAST(tn - ta AS DOUBLE) / tn)
                             / (n * CAST(tn - ta AS DOUBLE) / tn) * 1000000
                           ) AS BIGINT)) AS BIGINT) AS chi_q,
                              MAX(tot.k) AS k
                       FROM cell CROSS JOIN tot)
        SELECT (SELECT m FROM med) AS grand_median_c,
               k, round(CAST(chi_q AS DOUBLE) / 1000000.0D, 6) AS chi2
        FROM terms""")
    },
    Some("""WITH b AS (SELECT event_type AS g,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events),
                 vc AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c
                        FROM b GROUP BY x),
                 cum AS (SELECT x, SUM(c) OVER (ORDER BY x) AS cc,
                                SUM(c) OVER () AS n
                         FROM vc),
                 med AS (SELECT MIN(x) AS m FROM cum
                         WHERE cc >= (n + 1) // 2),
                 cell AS (SELECT g,
                                 CAST(SUM(CASE WHEN x > (SELECT m FROM med)
                                   THEN 1 ELSE 0 END) AS BIGINT) AS a,
                                 CAST(COUNT(*) AS BIGINT) AS n
                          FROM b GROUP BY g),
                 tot AS (SELECT CAST(SUM(a) AS BIGINT) AS ta,
                                CAST(SUM(n) AS BIGINT) AS tn,
                                CAST(COUNT(*) AS BIGINT) AS k
                         FROM cell),
                 terms AS (SELECT CAST(SUM(CAST(round(
                                 (a - n * CAST(ta AS DOUBLE) / tn)
                                 * (a - n * CAST(ta AS DOUBLE) / tn)
                                 / (n * CAST(ta AS DOUBLE) / tn) * 1000000
                               ) AS BIGINT)
                               + CAST(round(
                                 ((n - a) - n * CAST(tn - ta AS DOUBLE)
                                    / tn)
                                 * ((n - a) - n * CAST(tn - ta AS DOUBLE)
                                      / tn)
                                 / (n * CAST(tn - ta AS DOUBLE) / tn)
                                 * 1000000
                               ) AS BIGINT)) AS BIGINT) AS chi_q,
                                  MAX(tot.k) AS k
                           FROM cell CROSS JOIN tot)
            SELECT (SELECT m FROM med) AS grand_median_c,
                   k, round(CAST(chi_q AS DOUBLE) / 1000000.0, 6) AS chi2
            FROM terms"""))

  // Gumbel (EV-I) method-of-moments fit on daily block maxima of the
  // event values — the distribution agg_block_maxima's readout feeds in
  // classic extreme-value practice. Daily maxima and their moments stay
  // exact integers; β = s·√6/π, μ = m − γβ, and the fitted p99 return
  // level evaluate once from them.
  private val aggGumbelFit = Op(
    "agg_gumbel_fit",
    (s, d) => {
      onEvents(s, d, "events_gf")
      s.sql("""
        WITH dm AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                           CAST(MAX(CAST(round(value * 100) AS BIGINT))
                             AS BIGINT) AS mx
                    FROM events_gf GROUP BY 1),
             m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(mx) AS BIGINT) AS sx,
                          SUM(CAST(mx * mx AS DECIMAL(38,0))) AS sxx
                   FROM dm),
             f AS (SELECT n,
                          CAST(sx AS DOUBLE) / n / 100.0D AS mean_d,
                          sqrt((CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                  / n) / (n - 1)) / 100.0D AS sd_d
                   FROM m)
        SELECT n, round(mean_d, 6) AS mean_max,
               round(sd_d * 0.7796968012336761D, 6) AS scale_beta,
               round(mean_d - 0.5772156649015329D
                     * sd_d * 0.7796968012336761D, 6) AS loc_mu,
               round(mean_d - 0.5772156649015329D
                     * sd_d * 0.7796968012336761D
                     - sd_d * 0.7796968012336761D
                       * ln(-ln(0.99D)), 6) AS p99_return_level
        FROM f""")
    },
    Some("""WITH dm AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                               CAST(MAX(CAST(round(value * 100) AS BIGINT))
                                 AS BIGINT) AS mx
                        FROM events GROUP BY 1),
                 m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(mx) AS BIGINT) AS sx,
                              SUM(CAST(mx * mx AS HUGEINT)) AS sxx
                       FROM dm),
                 f AS (SELECT n,
                              CAST(sx AS DOUBLE) / n / 100.0 AS mean_d,
                              sqrt((CAST(sxx AS DOUBLE)
                                    - CAST(sx AS DOUBLE)
                                      * CAST(sx AS DOUBLE) / n) / (n - 1))
                                / 100.0 AS sd_d
                       FROM m)
            SELECT n, round(mean_d, 6) AS mean_max,
                   round(sd_d * 0.7796968012336761, 6) AS scale_beta,
                   round(mean_d - 0.5772156649015329
                         * sd_d * 0.7796968012336761, 6) AS loc_mu,
                   round(mean_d - 0.5772156649015329
                         * sd_d * 0.7796968012336761
                         - sd_d * 0.7796968012336761
                           * ln(-ln(0.99)), 6) AS p99_return_level
            FROM f"""))

  // Williams %R over the per-part price series (the window_donchian bar
  // construction): −100·(HH−C)/(HH−LL) on a 14-bar lookback, exact cents
  // in the extremes, NULL when the channel is flat (NULLIF — no engine
  // split on 0/0).
  private val windowWilliamsR = Op(
    "window_williams_r",
    (s, d) => {
      onLineitem(s, d, "lineitem_wr")
      s.sql("""
        WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                   FROM lineitem_wr WHERE l_partkey <= 100),
             w AS (SELECT l_partkey, l_orderkey, l_linenumber, c,
                          MAX(c) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                            AS hh,
                          MIN(c) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                            AS ll
                   FROM b)
        SELECT l_partkey, l_orderkey, l_linenumber, c, hh, ll,
               round(-100.0D * (hh - c) / NULLIF(hh - ll, 0), 4)
                 AS williams_r
        FROM w ORDER BY l_partkey, l_orderkey, l_linenumber""")
    },
    Some("""WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber,
                              l_shipdate,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS c
                       FROM lineitem WHERE l_partkey <= 100),
                 w AS (SELECT l_partkey, l_orderkey, l_linenumber, c,
                              MAX(c) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber
                                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                                AS hh,
                              MIN(c) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber
                                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                                AS ll
                       FROM b)
            SELECT l_partkey, l_orderkey, l_linenumber, c, hh, ll,
                   round(-100.0 * (hh - c) / NULLIF(hh - ll, 0), 4)
                     AS williams_r
            FROM w ORDER BY l_partkey, l_orderkey, l_linenumber"""))

  // Elder's force index per part: volume × price change — entirely exact
  // BIGINT (quantity units × cent delta), no float anywhere, so the
  // output is engine-identical by construction at any scale.
  private val windowForceIndex = Op(
    "window_force_index",
    (s, d) => {
      onLineitem(s, d, "lineitem_fi")
      s.sql("""
        WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber,
                          CAST(round(l_quantity) AS BIGINT) AS v,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
                          LAG(CAST(round(l_extendedprice * 100) AS BIGINT))
                            OVER (PARTITION BY l_partkey
                              ORDER BY l_shipdate, l_orderkey, l_linenumber)
                            AS pc
                   FROM lineitem_fi WHERE l_partkey <= 100)
        SELECT l_partkey, l_orderkey, l_linenumber, c, v,
               CAST(v * (c - pc) AS BIGINT) AS force_idx
        FROM b WHERE pc IS NOT NULL
        ORDER BY l_partkey, l_orderkey, l_linenumber""")
    },
    Some("""WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber,
                              CAST(round(l_quantity) AS BIGINT) AS v,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS c,
                              LAG(CAST(round(l_extendedprice * 100)
                                       AS BIGINT))
                                OVER (PARTITION BY l_partkey
                                  ORDER BY l_shipdate, l_orderkey,
                                           l_linenumber) AS pc
                       FROM lineitem WHERE l_partkey <= 100)
            SELECT l_partkey, l_orderkey, l_linenumber, c, v,
                   CAST(v * (c - pc) AS BIGINT) AS force_idx
            FROM b WHERE pc IS NOT NULL
            ORDER BY l_partkey, l_orderkey, l_linenumber"""))

  // Ulcer index per part: RMS of the basis-point drawdown from the
  // running peak over a 14-bar frame. Drawdown quantizes to an exact
  // integer bp via truncating integer division (Spark `div` ≡ DuckDB `//`
  // on BIGINT — non-negative operands here), the frame averages integer
  // squares, and sqrt runs once per row.
  private val windowUlcerIndex = Op(
    "window_ulcer_index",
    (s, d) => {
      onLineitem(s, d, "lineitem_ui")
      s.sql("""
        WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                   FROM lineitem_ui WHERE l_partkey <= 100),
             p AS (SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate, c,
                          MAX(c) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS peak
                   FROM b),
             dd AS (SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
                           c, peak,
                           ((peak - c) * 10000) div peak AS dd_bp
                    FROM p)
        SELECT l_partkey, l_orderkey, l_linenumber, c, peak,
               CAST(dd_bp AS BIGINT) AS dd_bp,
               round(sqrt(AVG(CAST(dd_bp * dd_bp AS DOUBLE))
                 OVER (PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)), 4)
                 AS ulcer_bp
        FROM dd ORDER BY l_partkey, l_orderkey, l_linenumber""")
    },
    Some("""WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber,
                              l_shipdate,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS c
                       FROM lineitem WHERE l_partkey <= 100),
                 p AS (SELECT l_partkey, l_orderkey, l_linenumber,
                              l_shipdate, c,
                              MAX(c) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS peak
                       FROM b),
                 dd AS (SELECT l_partkey, l_orderkey, l_linenumber,
                               l_shipdate, c, peak,
                               ((peak - c) * 10000) // peak AS dd_bp
                        FROM p)
            SELECT l_partkey, l_orderkey, l_linenumber, c, peak,
                   CAST(dd_bp AS BIGINT) AS dd_bp,
                   round(sqrt(AVG(CAST(dd_bp * dd_bp AS DOUBLE))
                     OVER (PARTITION BY l_partkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)), 4)
                     AS ulcer_bp
            FROM dd ORDER BY l_partkey, l_orderkey, l_linenumber"""))

  // Chande momentum oscillator per part: 100·(ΣU − ΣD)/(ΣU + ΣD) over a
  // 14-delta frame. Up/down moves are exact cent integers, the frame sums
  // stay integers, one double division per row (NULLIF when the frame is
  // flat — identical NULL on both engines).
  private val windowCmo = Op(
    "window_cmo",
    (s, d) => {
      onLineitem(s, d, "lineitem_cmo")
      s.sql("""
        WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
                          LAG(CAST(round(l_extendedprice * 100) AS BIGINT))
                            OVER (PARTITION BY l_partkey
                              ORDER BY l_shipdate, l_orderkey, l_linenumber)
                            AS pc
                   FROM lineitem_cmo WHERE l_partkey <= 100),
             dlt AS (SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
                            c,
                            CASE WHEN c > pc THEN c - pc ELSE 0 END AS up,
                            CASE WHEN c < pc THEN pc - c ELSE 0 END AS dn
                     FROM b WHERE pc IS NOT NULL),
             w AS (SELECT l_partkey, l_orderkey, l_linenumber, c,
                          CAST(SUM(up) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS su,
                          CAST(SUM(dn) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS sd
                   FROM dlt)
        SELECT l_partkey, l_orderkey, l_linenumber, c, su, sd,
               round(100.0D * (su - sd) / NULLIF(su + sd, 0), 4) AS cmo
        FROM w ORDER BY l_partkey, l_orderkey, l_linenumber""")
    },
    Some("""WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber,
                              l_shipdate,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS c,
                              LAG(CAST(round(l_extendedprice * 100)
                                       AS BIGINT))
                                OVER (PARTITION BY l_partkey
                                  ORDER BY l_shipdate, l_orderkey,
                                           l_linenumber) AS pc
                       FROM lineitem WHERE l_partkey <= 100),
                 dlt AS (SELECT l_partkey, l_orderkey, l_linenumber,
                                l_shipdate, c,
                                CASE WHEN c > pc THEN c - pc ELSE 0 END
                                  AS up,
                                CASE WHEN c < pc THEN pc - c ELSE 0 END
                                  AS dn
                         FROM b WHERE pc IS NOT NULL),
                 w AS (SELECT l_partkey, l_orderkey, l_linenumber, c,
                              CAST(SUM(up) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber
                                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                                AS BIGINT) AS su,
                              CAST(SUM(dn) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber
                                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                                AS BIGINT) AS sd
                       FROM dlt)
            SELECT l_partkey, l_orderkey, l_linenumber, c, su, sd,
                   round(100.0 * (su - sd) / NULLIF(su + sd, 0), 4) AS cmo
            FROM w ORDER BY l_partkey, l_orderkey, l_linenumber"""))

  // Detrended price oscillator per part: close minus the 14-bar SMA
  // shifted back 8 bars (n/2+1) — strips the trend so cycles show. The
  // shifted frame is expressed directly as ROWS BETWEEN 21 PRECEDING AND
  // 8 PRECEDING (the same 14 bars both engines see); the SMA is the only
  // float, derived from an exact integer frame sum.
  private val windowDpo = Op(
    "window_dpo",
    (s, d) => {
      onLineitem(s, d, "lineitem_dpo")
      s.sql("""
        WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                   FROM lineitem_dpo WHERE l_partkey <= 100),
             w AS (SELECT l_partkey, l_orderkey, l_linenumber, c,
                          CAST(SUM(c) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN 21 PRECEDING AND 8 PRECEDING)
                            AS BIGINT) AS fs,
                          CAST(COUNT(*) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN 21 PRECEDING AND 8 PRECEDING)
                            AS BIGINT) AS fn
                   FROM b)
        SELECT l_partkey, l_orderkey, l_linenumber, c,
               round(c - CAST(fs AS DOUBLE) / fn, 4) AS dpo
        FROM w WHERE fn = 14
        ORDER BY l_partkey, l_orderkey, l_linenumber""")
    },
    Some("""WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber,
                              l_shipdate,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS c
                       FROM lineitem WHERE l_partkey <= 100),
                 w AS (SELECT l_partkey, l_orderkey, l_linenumber, c,
                              CAST(SUM(c) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber
                                ROWS BETWEEN 21 PRECEDING AND 8 PRECEDING)
                                AS BIGINT) AS fs,
                              CAST(COUNT(*) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber
                                ROWS BETWEEN 21 PRECEDING AND 8 PRECEDING)
                                AS BIGINT) AS fn
                       FROM b)
            SELECT l_partkey, l_orderkey, l_linenumber, c,
                   round(c - CAST(fs AS DOUBLE) / fn, 4) AS dpo
            FROM w WHERE fn = 14
            ORDER BY l_partkey, l_orderkey, l_linenumber"""))

  // Grubbs outlier test per event type: G = max|x − x̄| / s. The max
  // deviation is the exact integer max|x·n − Σx| (mean cleared by
  // multiplying through by n), s comes from integer moments, one sqrt and
  // one division per group row.
  private val aggGrubbsTest = Op(
    "agg_grubbs_test",
    (s, d) => {
      onEvents(s, d, "events_gb")
      s.sql("""
        WITH b AS (SELECT event_type AS g,
                          CAST(round(value * 100) AS BIGINT) AS x
                   FROM events_gb),
             m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                          SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                          SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx
                   FROM b GROUP BY g),
             dev AS (SELECT b.g,
                            MAX(abs(CAST(b.x AS DECIMAL(38,0)) * m.n - m.sx))
                              AS mdev
                     FROM b JOIN m ON b.g = m.g GROUP BY b.g),
             f AS (SELECT m.g, m.n,
                          CAST(dev.mdev AS DOUBLE) / m.n AS maxdev,
                          sqrt((m.n * CAST(m.sxx AS DOUBLE)
                                - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE))
                               / m.n / (m.n - 1)) AS sd
                   FROM m JOIN dev ON m.g = dev.g WHERE m.n >= 3)
        SELECT g AS event_type, n, round(maxdev / 100.0D, 4) AS max_dev,
               round(maxdev / sd, 6) AS g_stat
        FROM f ORDER BY event_type""")
    },
    Some("""WITH b AS (SELECT event_type AS g,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events),
                 m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                              SUM(CAST(x AS HUGEINT)) AS sx,
                              SUM(CAST(x * x AS HUGEINT)) AS sxx
                       FROM b GROUP BY g),
                 dev AS (SELECT b.g,
                                MAX(abs(CAST(b.x AS HUGEINT) * m.n - m.sx))
                                  AS mdev
                         FROM b JOIN m ON b.g = m.g GROUP BY b.g),
                 f AS (SELECT m.g, m.n,
                              CAST(dev.mdev AS DOUBLE) / m.n AS maxdev,
                              sqrt((m.n * CAST(m.sxx AS DOUBLE)
                                    - CAST(m.sx AS DOUBLE)
                                      * CAST(m.sx AS DOUBLE))
                                   / m.n / (m.n - 1)) AS sd
                       FROM m JOIN dev ON m.g = dev.g WHERE m.n >= 3)
            SELECT g AS event_type, n, round(maxdev / 100.0, 4) AS max_dev,
                   round(maxdev / sd, 6) AS g_stat
            FROM f ORDER BY event_type"""))

  // Paired sign test: per user, is view spend or click spend larger? The
  // pair compares exact integer cent TOTALS (no division anywhere), ties
  // drop per the test's definition, and the normal-approximation z runs
  // once from the two counts.
  private val aggSignTest = Op(
    "agg_sign_test",
    (s, d) => {
      onEvents(s, d, "events_st")
      s.sql("""
        WITH p AS (SELECT user_id,
                          CAST(SUM(CASE WHEN event_type = 'view'
                            THEN CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS sv,
                          CAST(SUM(CASE WHEN event_type = 'click'
                            THEN CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS sc
                   FROM events_st GROUP BY user_id),
             q AS (SELECT CAST(SUM(CASE WHEN sv > sc THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_plus,
                          CAST(SUM(CASE WHEN sv < sc THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_minus
                   FROM p)
        SELECT n_plus, n_minus,
               round((n_plus - n_minus)
                     / sqrt(CAST(n_plus + n_minus AS DOUBLE)), 6) AS z
        FROM q""")
    },
    Some("""WITH p AS (SELECT user_id,
                              CAST(SUM(CASE WHEN event_type = 'view'
                                THEN CAST(round(value * 100) AS BIGINT)
                                ELSE 0 END) AS BIGINT) AS sv,
                              CAST(SUM(CASE WHEN event_type = 'click'
                                THEN CAST(round(value * 100) AS BIGINT)
                                ELSE 0 END) AS BIGINT) AS sc
                       FROM events GROUP BY user_id),
                 q AS (SELECT CAST(SUM(CASE WHEN sv > sc THEN 1 ELSE 0 END)
                                AS BIGINT) AS n_plus,
                              CAST(SUM(CASE WHEN sv < sc THEN 1 ELSE 0 END)
                                AS BIGINT) AS n_minus
                       FROM p)
            SELECT n_plus, n_minus,
                   round((n_plus - n_minus)
                         / sqrt(CAST(n_plus + n_minus AS DOUBLE)), 6) AS z
            FROM q"""))

  // Wilcoxon signed-rank test on the same integer-cent pairs: |d| ranks
  // with midrank ties kept EXACT by carrying 2·rank = 2·min_rank +
  // (ties − 1) as an integer (the half never meets a float until the final
  // z). The normal-approximation variance carries the tie correction
  // −Σ(t³−t)/48 from exact per-|d| tie counts (integer-cent differences
  // tie heavily; without it z is biased toward 0 — ADVICE r17 #2).
  // The rank window runs over USERS — a domain whose cardinality does
  // not grow with fact volume (replication re-uses user ids), so the
  // single-partition rank is bounded at any SF, like the other
  // domain-collapsed spellings.
  private val aggWilcoxonSignedRank = Op(
    "agg_wilcoxon_signed_rank",
    (s, d) => {
      onEvents(s, d, "events_wsr")
      s.sql("""
        WITH p AS (SELECT user_id,
                          CAST(SUM(CASE WHEN event_type = 'view'
                            THEN CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT)
                          - CAST(SUM(CASE WHEN event_type = 'click'
                            THEN CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS dd
                   FROM events_wsr GROUP BY user_id),
             nz AS (SELECT dd, abs(dd) AS ad FROM p WHERE dd <> 0),
             r AS (SELECT dd,
                          CAST(RANK() OVER (ORDER BY ad) AS BIGINT) AS rmin,
                          CAST(COUNT(*) OVER (PARTITION BY ad) AS BIGINT)
                            AS ties
                   FROM nz),
             q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(CASE WHEN dd > 0
                            THEN 2 * rmin + ties - 1 ELSE 0 END)
                            AS BIGINT) AS w2
                   FROM r),
             tc AS (SELECT CAST(COALESCE(SUM(t * t * t - t), 0) AS BIGINT)
                             AS tt
                    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                          FROM nz GROUP BY ad) g)
        SELECT n, CAST(w2 AS DOUBLE) / 2.0D AS w_plus,
               round((CAST(w2 AS DOUBLE) / 2.0D - n * (n + 1) / 4.0D)
                     / sqrt(n * (n + 1.0D) * (2.0D * n + 1) / 24.0D
                            - CAST(tt AS DOUBLE) / 48.0D), 6)
                 AS z
        FROM q CROSS JOIN tc""")
    },
    Some("""WITH p AS (SELECT user_id,
                              CAST(SUM(CASE WHEN event_type = 'view'
                                THEN CAST(round(value * 100) AS BIGINT)
                                ELSE 0 END) AS BIGINT)
                              - CAST(SUM(CASE WHEN event_type = 'click'
                                THEN CAST(round(value * 100) AS BIGINT)
                                ELSE 0 END) AS BIGINT) AS dd
                       FROM events GROUP BY user_id),
                 nz AS (SELECT dd, abs(dd) AS ad FROM p WHERE dd <> 0),
                 r AS (SELECT dd,
                              CAST(RANK() OVER (ORDER BY ad) AS BIGINT)
                                AS rmin,
                              CAST(COUNT(*) OVER (PARTITION BY ad)
                                AS BIGINT) AS ties
                       FROM nz),
                 q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(CASE WHEN dd > 0
                                THEN 2 * rmin + ties - 1 ELSE 0 END)
                                AS BIGINT) AS w2
                       FROM r),
                 tc AS (SELECT CAST(COALESCE(SUM(t * t * t - t), 0)
                                 AS BIGINT) AS tt
                        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                              FROM nz GROUP BY ad) g)
            SELECT n, CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
                   round((CAST(w2 AS DOUBLE) / 2.0 - n * (n + 1) / 4.0)
                         / sqrt(n * (n + 1.0) * (2.0 * n + 1) / 24.0
                                - CAST(tt AS DOUBLE) / 48.0), 6)
                 AS z
            FROM q CROSS JOIN tc"""))

  // Welch's one-way ANOVA — the F to reach for when agg_levene_test /
  // agg_bartlett_test REJECT variance homogeneity. Per-group weights
  // w = n/s², weighted means, and the correction term are all quantized
  // per group (1e6/1e12) into order-independent integer reductions; the
  // statistic evaluates once from the totals.
  private val aggWelchAnova = Op(
    "agg_welch_anova",
    (s, d) => {
      onEvents(s, d, "events_wa")
      s.sql("""
        WITH b AS (SELECT event_type AS g,
                          CAST(round(value * 100) AS BIGINT) AS x
                   FROM events_wa),
             m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                          CAST(SUM(x) AS BIGINT) AS sx,
                          CAST(SUM(x * x) AS BIGINT) AS sxx
                   FROM b GROUP BY g),
             v AS (SELECT g, n, mean, s2 FROM (
                     SELECT g, n, CAST(sx AS DOUBLE) / n AS mean,
                            (CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                              / (n - 1) AS s2
                     FROM m WHERE n >= 2) vv
                   WHERE s2 > 0),
             w AS (SELECT g, n, mean, n / s2 AS wi FROM v),
             t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                          CAST(SUM(CAST(round(wi * 1000000) AS BIGINT))
                            AS BIGINT) AS sw_q,
                          CAST(SUM(CAST(round(wi * mean * 10000) AS BIGINT))
                            AS BIGINT) AS swm_q
                   FROM w),
             c AS (SELECT t.k, t.sw_q, t.swm_q,
                          CAST(SUM(CAST(round(
                            wi * (mean - (CAST(swm_q AS DOUBLE) / 10000.0D)
                                    / (CAST(sw_q AS DOUBLE) / 1000000.0D))
                               * (mean - (CAST(swm_q AS DOUBLE) / 10000.0D)
                                    / (CAST(sw_q AS DOUBLE) / 1000000.0D))
                            * 1000000) AS BIGINT)) AS BIGINT) AS num_q,
                          CAST(SUM(CAST(round(
                            (1.0D - (wi * 1000000.0D)
                                    / CAST(sw_q AS DOUBLE))
                            * (1.0D - (wi * 1000000.0D)
                                    / CAST(sw_q AS DOUBLE))
                            / (n - 1) * 1000000000000.0D) AS BIGINT))
                            AS BIGINT) AS corr_q
                   FROM w CROSS JOIN t
                   GROUP BY t.k, t.sw_q, t.swm_q)
        SELECT k,
               round((CAST(num_q AS DOUBLE) / 1000000.0D / (k - 1))
                     / (1.0D + 2.0D * (k - 2)
                          / (CAST(k AS DOUBLE) * k - 1)
                          * CAST(corr_q AS DOUBLE) / 1000000000000.0D),
                     6) AS f_welch
        FROM c""")
    },
    Some("""WITH b AS (SELECT event_type AS g,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events),
                 m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(x) AS BIGINT) AS sx,
                              CAST(SUM(x * x) AS BIGINT) AS sxx
                       FROM b GROUP BY g),
                 v AS (SELECT g, n, mean, s2 FROM (
                         SELECT g, n, CAST(sx AS DOUBLE) / n AS mean,
                                (CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                   / n) / (n - 1) AS s2
                         FROM m WHERE n >= 2) vv
                       WHERE s2 > 0),
                 w AS (SELECT g, n, mean, n / s2 AS wi FROM v),
                 t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                              CAST(SUM(CAST(round(wi * 1000000) AS BIGINT))
                                AS BIGINT) AS sw_q,
                              CAST(SUM(CAST(round(wi * mean * 10000)
                                AS BIGINT)) AS BIGINT) AS swm_q
                       FROM w),
                 c AS (SELECT t.k, t.sw_q, t.swm_q,
                              CAST(SUM(CAST(round(
                                wi * (mean - (CAST(swm_q AS DOUBLE)
                                        / 10000.0)
                                        / (CAST(sw_q AS DOUBLE)
                                           / 1000000.0))
                                   * (mean - (CAST(swm_q AS DOUBLE)
                                        / 10000.0)
                                        / (CAST(sw_q AS DOUBLE)
                                           / 1000000.0))
                                * 1000000) AS BIGINT)) AS BIGINT) AS num_q,
                              CAST(SUM(CAST(round(
                                (1.0 - (wi * 1000000.0)
                                        / CAST(sw_q AS DOUBLE))
                                * (1.0 - (wi * 1000000.0)
                                        / CAST(sw_q AS DOUBLE))
                                / (n - 1) * 1000000000000.0) AS BIGINT))
                                AS BIGINT) AS corr_q
                       FROM w CROSS JOIN t
                       GROUP BY t.k, t.sw_q, t.swm_q)
            SELECT k,
                   round((CAST(num_q AS DOUBLE) / 1000000.0 / (k - 1))
                         / (1.0 + 2.0 * (k - 2)
                              / (CAST(k AS DOUBLE) * k - 1)
                              * CAST(corr_q AS DOUBLE)
                              / 1000000000000.0),
                         6) AS f_welch
            FROM c"""))

  // Jarque–Bera normality test per event type: JB = n/6·(S² + K²/4) from
  // skewness and excess kurtosis. The four raw power sums accumulate as
  // exact DECIMAL(38,0)/HUGEINT integers (x⁴ at cent scale needs 128-bit
  // headroom at sf10); the central moments, S, K, and JB evaluate once per
  // group row.
  private val aggJarqueBera = Op(
    "agg_jarque_bera",
    (s, d) => {
      onEvents(s, d, "events_jb")
      s.sql("""
        WITH b AS (SELECT event_type AS g,
                          CAST(round(value * 100) AS BIGINT) AS x
                   FROM events_jb),
             m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                          SUM(CAST(x AS DECIMAL(38,0))) AS s1,
                          SUM(CAST(x * x AS DECIMAL(38,0))) AS s2,
                          SUM(CAST(x AS DECIMAL(38,0)) * x * x) AS s3,
                          SUM(CAST(x AS DECIMAL(38,0)) * x * x * x) AS s4
                   FROM b GROUP BY g),
             c AS (SELECT g, n,
                          CAST(s1 AS DOUBLE) / n AS mu,
                          CAST(s2 AS DOUBLE) / n AS r2,
                          CAST(s3 AS DOUBLE) / n AS r3,
                          CAST(s4 AS DOUBLE) / n AS r4
                   FROM m WHERE n >= 4),
             k AS (SELECT g, n,
                          r2 - mu * mu AS m2,
                          r3 - 3.0D * mu * r2 + 2.0D * mu * mu * mu AS m3,
                          r4 - 4.0D * mu * r3 + 6.0D * mu * mu * r2
                             - 3.0D * mu * mu * mu * mu AS m4
                   FROM c)
        SELECT g AS event_type, n,
               round(m3 / sqrt(m2 * m2 * m2), 6) AS skewness,
               round(m4 / (m2 * m2) - 3.0D, 6) AS excess_kurtosis,
               round(n / 6.0D * ((m3 / sqrt(m2 * m2 * m2))
                                 * (m3 / sqrt(m2 * m2 * m2))
                                 + (m4 / (m2 * m2) - 3.0D)
                                   * (m4 / (m2 * m2) - 3.0D) / 4.0D),
                     4) AS jb_stat
        FROM k ORDER BY event_type""")
    },
    Some("""WITH b AS (SELECT event_type AS g,
                              CAST(round(value * 100) AS BIGINT) AS x
                       FROM events),
                 m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                              SUM(CAST(x AS HUGEINT)) AS s1,
                              SUM(CAST(x * x AS HUGEINT)) AS s2,
                              SUM(CAST(x AS HUGEINT) * x * x) AS s3,
                              SUM(CAST(x AS HUGEINT) * x * x * x) AS s4
                       FROM b GROUP BY g),
                 c AS (SELECT g, n,
                              CAST(s1 AS DOUBLE) / n AS mu,
                              CAST(s2 AS DOUBLE) / n AS r2,
                              CAST(s3 AS DOUBLE) / n AS r3,
                              CAST(s4 AS DOUBLE) / n AS r4
                       FROM m WHERE n >= 4),
                 k AS (SELECT g, n,
                              r2 - mu * mu AS m2,
                              r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu
                                AS m3,
                              r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                                 - 3.0 * mu * mu * mu * mu AS m4
                       FROM c)
            SELECT g AS event_type, n,
                   round(m3 / sqrt(m2 * m2 * m2), 6) AS skewness,
                   round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis,
                   round(n / 6.0 * ((m3 / sqrt(m2 * m2 * m2))
                                    * (m3 / sqrt(m2 * m2 * m2))
                                    + (m4 / (m2 * m2) - 3.0)
                                      * (m4 / (m2 * m2) - 3.0) / 4.0),
                         4) AS jb_stat
            FROM k ORDER BY event_type"""))

  // Awesome oscillator per part: SMA5 − SMA34 of the price series, both
  // frames exact integer sums; emitted only where the long frame is full
  // so the two averages compare like for like. The subtraction of two
  // rationals runs once per row.
  private val windowAwesomeOscillator = Op(
    "window_awesome_oscillator",
    (s, d) => {
      onLineitem(s, d, "lineitem_ao")
      s.sql("""
        WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                   FROM lineitem_ao WHERE l_partkey <= 100),
             w AS (SELECT l_partkey, l_orderkey, l_linenumber, c,
                          CAST(SUM(c) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS s5,
                          CAST(SUM(c) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN 33 PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS s34,
                          CAST(COUNT(*) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN 33 PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS n34
                   FROM b)
        SELECT l_partkey, l_orderkey, l_linenumber, c, s5, s34,
               round(s5 / 5.0D - s34 / 34.0D, 4) AS ao
        FROM w WHERE n34 = 34
        ORDER BY l_partkey, l_orderkey, l_linenumber""")
    },
    Some("""WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber,
                              l_shipdate,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS c
                       FROM lineitem WHERE l_partkey <= 100),
                 w AS (SELECT l_partkey, l_orderkey, l_linenumber, c,
                              CAST(SUM(c) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber
                                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                                AS BIGINT) AS s5,
                              CAST(SUM(c) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber
                                ROWS BETWEEN 33 PRECEDING AND CURRENT ROW)
                                AS BIGINT) AS s34,
                              CAST(COUNT(*) OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey,
                                         l_linenumber
                                ROWS BETWEEN 33 PRECEDING AND CURRENT ROW)
                                AS BIGINT) AS n34
                       FROM b)
            SELECT l_partkey, l_orderkey, l_linenumber, c, s5, s34,
                   round(s5 / 5.0 - s34 / 34.0, 4) AS ao
            FROM w WHERE n34 = 34
            ORDER BY l_partkey, l_orderkey, l_linenumber"""))

  // Price rate of change per part: 100·(c − c₋₁₂)/c₋₁₂ — exact integer
  // lag and delta, one double division per row (prices are positive so no
  // sign traps).
  private val windowPriceRoc = Op(
    "window_price_roc",
    (s, d) => {
      onLineitem(s, d, "lineitem_roc")
      s.sql("""
        WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
                          LAG(CAST(round(l_extendedprice * 100) AS BIGINT),
                              12)
                            OVER (PARTITION BY l_partkey
                              ORDER BY l_shipdate, l_orderkey, l_linenumber)
                            AS pc
                   FROM lineitem_roc WHERE l_partkey <= 100)
        SELECT l_partkey, l_orderkey, l_linenumber, c, pc,
               round(100.0D * (c - pc) / pc, 4) AS roc
        FROM b WHERE pc IS NOT NULL
        ORDER BY l_partkey, l_orderkey, l_linenumber""")
    },
    Some("""WITH b AS (SELECT l_partkey, l_orderkey, l_linenumber,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                AS c,
                              LAG(CAST(round(l_extendedprice * 100)
                                       AS BIGINT), 12)
                                OVER (PARTITION BY l_partkey
                                  ORDER BY l_shipdate, l_orderkey,
                                           l_linenumber) AS pc
                       FROM lineitem WHERE l_partkey <= 100)
            SELECT l_partkey, l_orderkey, l_linenumber, c, pc,
                   round(100.0 * (c - pc) / pc, 4) AS roc
            FROM b WHERE pc IS NOT NULL
            ORDER BY l_partkey, l_orderkey, l_linenumber"""))

  val ops: Seq[Op] = Seq(
    aggLeveneTest, aggBartlettTest, aggCronbachAlpha, aggIcc,
    aggDurbinWatson, aggCochranQ, aggMoodsMedian, aggGumbelFit,
    aggGrubbsTest, aggSignTest, aggWilcoxonSignedRank, aggWelchAnova,
    aggJarqueBera,
    windowWilliamsR, windowForceIndex, windowUlcerIndex,
    windowCmo, windowDpo, windowAwesomeOscillator, windowPriceRoc)
}
