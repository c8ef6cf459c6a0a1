package graft.operators

import graft.Mats.MatOps
import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operators (SURVEY.md §2C: sources, predicates, joins,
  * aggregations, windows, sorts/limits/set ops).
  *
  * Determinism protocol (SURVEY.md §7.6): every oracle-checked query ends in a
  * total-order ORDER BY; money math runs in DECIMAL (exact, order-independent)
  * and is cast to DOUBLE only at the output boundary; timestamps are emitted
  * only at ms precision or coarser. Provenance of each capability is the
  * reference ETL framework (`framework.py`, see SURVEY.md §2A/§2B) — the
  * operators here are the Spark-native query surface those pipelines delegate
  * to, expressed so Catalyst can push filters/prune columns/pick joins freely.
  */
object Relational {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)
  /** Money column → exact decimal at its native 2dp scale. */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  // SQL entry point: the same engine drives ANSI SQL via spark.sql — a
  // TPC-H-Q3-shaped 3-table join + group + top-k, planned by the identical
  // Catalyst pipeline as the DataFrame keys (temp views over the scans).
  private val sqlEntryQ3 = Op(
    "sql_entry_q3",
    (s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer_v")
      t(s, d, "orders").createOrReplaceTempView("orders_v")
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT o_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM customer_v
        JOIN orders_v ON c_custkey = o_custkey
        JOIN lineitem_v ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderstatus <> 'F'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")
    },
    Some("""SELECT o_orderkey,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
              COUNT(*) AS n_lines
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING' AND o_orderstatus <> 'F'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10"""))

  // SQL pipe syntax (SPARK-49555, in-box since Spark 4): the |>-chained
  // spelling of scan → filter → aggregate → having → sort. Same Catalyst
  // plan as the ANSI form — the parser rewrites pipe operators away — so
  // the key proves the surface parses and plans identically to the oracle's
  // classic spelling (which IS the same query in ANSI form).
  private val sqlPipeSyntax = Op(
    "sql_pipe_syntax",
    (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_p")
      s.sql("""
        FROM lineitem_p
        |> WHERE l_quantity >= 5
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_price
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n > 10
        |> ORDER BY l_returnflag, l_linestatus""")
    },
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_price
            FROM lineitem WHERE l_quantity >= 5
            GROUP BY l_returnflag, l_linestatus
            HAVING COUNT(*) > 10
            ORDER BY l_returnflag, l_linestatus"""))

  // Declarative SQL UDFs (SPARK-44076, in-box since Spark 4): CREATE
  // TEMPORARY FUNCTION ... RETURNS ... RETURN <expr> — the function body is
  // INLINED by the analyzer (ResolveSQLFunctions) into the calling plan, so
  // unlike a JVM UDF it stays inside codegen and Catalyst can push/fold
  // through it. The oracle spells the bodies out by hand — equal results
  // prove the inlining preserved the semantics.
  private val fnSqlUdf = Op(
    "fn_sql_udf",
    (s, d) => {
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(
                 p DECIMAL(18,2), disc DECIMAL(18,2))
               RETURNS DECIMAL(38,6) RETURN p * (1 - disc)""")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_band(q DOUBLE)
               RETURNS STRING
               RETURN CASE WHEN q < 10 THEN 'low'
                           WHEN q < 30 THEN 'mid' ELSE 'high' END""")
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_f")
      s.sql("""
        SELECT graft_band(l_quantity) AS band, COUNT(*) AS n,
               CAST(SUM(graft_disc_price(
                 CAST(l_extendedprice AS DECIMAL(18,2)),
                 CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem_f GROUP BY graft_band(l_quantity) ORDER BY band""")
    },
    Some("""SELECT CASE WHEN l_quantity < 10 THEN 'low'
                        WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS band,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                     AS revenue
            FROM lineitem
            GROUP BY CASE WHEN l_quantity < 10 THEN 'low'
                          WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END
            ORDER BY band"""))

  // String collations (SPARK-46830, in-box since Spark 4): equality and
  // GROUP BY under UTF8_LCASE — collation-aware comparison happens in the
  // ENGINE (hash/sort keys derive from the collation), not via an
  // expression rewrite. The fixture mixes case deterministically by key
  // parity; the CI grouping must fuse both spellings back together. The
  // emitted group label is min(lower(..)) — deterministic — because the
  // collated group-by value itself keeps an arbitrary representative's
  // casing. DuckDB mirrors with lower() grouping (equivalent to UTF8_LCASE
  // on this ASCII domain).
  private val fnCollation = Op(
    "fn_collation",
    (s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer_c")
      s.sql("""
        SELECT min(lower(segm)) AS seg, COUNT(*) AS n,
               CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS bal_cents
        FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                          ELSE lower(c_mktsegment) END AS segm, c_acctbal
              FROM customer_c)
        GROUP BY collate(segm, 'UTF8_LCASE')
        ORDER BY seg""")
    },
    Some("""SELECT lower(segm) AS seg, COUNT(*) AS n,
                   CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                     AS BIGINT)) AS BIGINT) AS bal_cents
            FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                              ELSE lower(c_mktsegment) END AS segm, c_acctbal
                  FROM customer)
            GROUP BY lower(segm)
            ORDER BY seg"""))

  // Parameterized SQL (SPARK-44066): named-parameter binding via
  // spark.sql(text, args) — literals arrive as TYPED parameters, not by
  // string interpolation (the SQL-injection-safe and plan-cache-friendly
  // spelling a query service uses). The oracle bakes the same constants in.
  private val sqlParameterized = Op(
    "sql_parameterized",
    (s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_prm")
      s.sql(
        """SELECT o_orderstatus, COUNT(*) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS total
           FROM orders_prm
           WHERE o_totalprice >= :min_price AND o_orderstatus <> :excluded
           GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        Map("min_price" -> 1000.0, "excluded" -> "X"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS total
            FROM orders
            WHERE o_totalprice >= 1000.0 AND o_orderstatus <> 'X'
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // SQL session variables (SPARK-46908): DECLARE / SET VAR / reference in a
  // query — session-scoped typed state the engine resolves at analysis
  // time (the scripting surface for multi-statement jobs). The variable is
  // set from a scalar SUBQUERY over the data, so the key proves the full
  // loop: compute → store in variable → drive a second query with it.
  private val sqlSessionVariables = Op(
    "sql_session_variables",
    (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_sv")
      s.sql("DECLARE OR REPLACE VARIABLE graft_qty_cut DOUBLE DEFAULT 0.0")
      s.sql("""SET VAR graft_qty_cut =
                 (SELECT CAST(avg(l_quantity) AS DOUBLE) FROM lineitem_sv)""")
      s.sql("""
        SELECT l_returnflag, COUNT(*) AS n_above,
               CAST(ROUND(min(l_quantity) - graft_qty_cut, 4) AS DOUBLE)
                 AS min_gap
        FROM lineitem_sv WHERE l_quantity > graft_qty_cut
        GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    Some("""WITH cut AS (SELECT CAST(avg(l_quantity) AS DOUBLE) AS c
                         FROM lineitem)
            SELECT l_returnflag, COUNT(*) AS n_above,
                   CAST(ROUND(min(l_quantity) - (SELECT c FROM cut), 4)
                     AS DOUBLE) AS min_gap
            FROM lineitem WHERE l_quantity > (SELECT c FROM cut)
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- sources
  private val scanParquet = Op(
    "scan_parquet",
    (s, d) => t(s, d, "region").select("r_regionkey", "r_name")
      .orderBy("r_regionkey"),
    Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"))

  // Column pruning: only 2 of 11 lineitem columns reach the scan (ReadSchema).
  private val scanPruned = Op(
    "scan_pruned",
    (s, d) => t(s, d, "lineitem").select("l_orderkey", "l_extendedprice")
      .orderBy("l_orderkey", "l_extendedprice"),
    Some("""SELECT l_orderkey, l_extendedprice FROM lineitem
            ORDER BY l_orderkey, l_extendedprice"""))

  // ---------------------------------------------------- projection / filter
  private val projectExpr = Op(
    "project_expr",
    (s, d) => Tables.widen(s, t(s, d, "lineitem"), "l_orderkey").select(
      col("l_orderkey"), col("l_linenumber"),
      (dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("net_price"),
      (dec(col("l_extendedprice")) * dec(col("l_tax"))).cast("double").as("tax_amt"))
      // (l_orderkey, l_linenumber) is NOT unique in this data — order by
      // every output column so equal-key rows are interchangeable (§7.6.1).
      .orderBy("l_orderkey", "l_linenumber", "net_price", "tax_amt"),
    Some("""SELECT l_orderkey, l_linenumber,
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS tax_amt
            FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price, tax_amt"""))

  // Pushdown-eligible conjunctive/disjunctive predicate with a date range.
  private val filterPred = Op(
    "filter_pred",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        (col("l_discount") > 0.05 || col("l_quantity") < 10.0))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              AND (l_discount > 0.05 OR l_quantity < 10.0)
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount"""))

  // 3-valued logic: IS NULL + null-safe equality (<=> / IS NOT DISTINCT FROM).
  private val filterNullSemantics = Op(
    "filter_null_semantics",
    (s, d) => t(s, d, "customer")
      .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
      .filter(col("seg").isNull || col("seg") <=> lit("AUTOMOBILE"))
      .select("c_custkey", "seg")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer
            WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL
               OR NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'AUTOMOBILE'
            ORDER BY c_custkey"""))

  private val filterInLike = Op(
    "filter_in_like",
    (s, d) => t(s, d, "part")
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
        col("p_name").like("%a%"))
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_brand FROM part
            WHERE p_brand IN ('Brand#1','Brand#2','Brand#3') AND p_name LIKE '%a%'
            ORDER BY p_partkey"""))

  // ------------------------------------------------------------------ joins
  // Small dim broadcast: nation is tiny -> explicit broadcast hash join, no
  // shuffle of the big side. At 100 TB the dim side stays broadcast-able.
  private val joinInnerBroadcast = Op(
    "join_inner_broadcast",
    (s, d) => t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"), "inner")
      .select("c_custkey", "c_name", "n_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, n_name FROM customer
            JOIN nation ON c_nationkey = n_nationkey ORDER BY c_custkey"""))

  // Large-large: leave strategy to Catalyst/AQE (sort-merge at scale).
  private val joinInnerShuffle = Op(
    "join_inner_shuffle",
    (s, d) => t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"), "inner")
      .select("l_orderkey", "l_linenumber", "o_custkey", "o_totalprice")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, o_custkey, o_totalprice FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey ORDER BY l_orderkey, l_linenumber"""))

  // Left outer keeps unmatched orders (dim filtered to force misses).
  private val joinLeftOuter = Op(
    "join_left_outer",
    (s, d) => {
      val rich = t(s, d, "customer").filter(col("c_acctbal") > 5000.0)
      t(s, d, "orders")
        .join(rich, col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, c_name FROM orders
            LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000.0) c
              ON o_custkey = c_custkey
            ORDER BY o_orderkey"""))

  // Right outer: all customers survive, orders filtered to force misses.
  private val joinRightOuter = Op(
    "join_right_outer",
    (s, d) => {
      val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      urgent
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"))
        .orderBy(col("c_custkey"), col("o_orderkey"))
    },
    Some("""SELECT c_custkey, c_name, o_orderkey
            FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
            RIGHT JOIN customer ON o_custkey = c_custkey
            ORDER BY c_custkey, o_orderkey"""))

  private val joinFullOuter = Op(
    "join_full_outer",
    (s, d) => {
      val cust = t(s, d, "customer").filter(col("c_custkey") % 2 === 0)
        .select("c_custkey", "c_name")
      val oagg = t(s, d, "orders").filter(col("o_custkey") % 3 === 0)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("total_spent"))
      cust.join(oagg, col("c_custkey") === col("o_custkey"), "full")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("key"),
          col("c_name"), col("n_orders"), col("total_spent"))
        .orderBy("key")
    },
    Some("""SELECT COALESCE(c.c_custkey, o.o_custkey) AS key, c.c_name, o.n_orders, o.total_spent
            FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0) c
            FULL OUTER JOIN (
              SELECT o_custkey, COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
              FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey) o
              ON c.c_custkey = o.o_custkey
            ORDER BY key"""))

  // EXISTS — semi join ships only the key column of the probe side.
  private val joinLeftSemi = Op(
    "join_left_semi",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  private val joinLeftAnti = Op(
    "join_left_anti",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  private val joinCross = Op(
    "join_cross",
    (s, d) => t(s, d, "region").select("r_name")
      .crossJoin(t(s, d, "nation").select("n_name"))
      .orderBy("r_name", "n_name"),
    Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
            ORDER BY r_name, n_name"""))

  // Non-equi band join; small side filtered + broadcast so the theta
  // predicate runs as a broadcast nested-loop, never a full cartesian.
  private val joinThetaRange = Op(
    "join_theta_range",
    (s, d) => {
      val bands = t(s, d, "part").filter(col("p_size") === 25)
        .select("p_partkey", "p_retailprice")
      t(s, d, "events").select("event_id", "value")
        .join(broadcast(bands),
          // prices sit in [900, 1000) while event values sit in [0, ~560):
          // the band compares value against the price's offset above 900
          col("value").between(col("p_retailprice") - 902.0, col("p_retailprice") - 898.0))
        .select("event_id", "p_partkey")
        .orderBy("event_id", "p_partkey")
    },
    Some("""SELECT event_id, p_partkey
            FROM events JOIN (SELECT p_partkey, p_retailprice FROM part WHERE p_size = 25) p
              ON value BETWEEN p_retailprice - 902.0 AND p_retailprice - 898.0
            ORDER BY event_id, p_partkey"""))

  // Salted skew join — the manual fallback when AQE's skew splitting isn't
  // enough: the big side salts its key across 8 partitions, the small side
  // replicates 8×, and the join runs on (key, salt) so one hot customer
  // spreads over 8 reducers. Result is exactly the plain join (the oracle).
  private val joinSkewSalted = Op(
    "join_skew_salted",
    (s, d) => {
      val salted = t(s, d, "orders")
        .withColumn("salt", pmod(col("o_orderkey"), lit(8)).cast("int"))
      val replicated = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"))
        .withColumn("salt", explode(expr("sequence(0, 7)")))
      salted.join(replicated,
          col("o_custkey") === col("c_custkey") && salted("salt") === replicated("salt"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, c_name
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey"""))

  // As-of join via the union+running-last rewrite: one shuffle on user_id,
  // no nested loop — the scalable pattern for temporal joins at 100 TB.
  // For each click, the latest purchase by the same user at-or-before it.
  private val joinAsof = Op(
    "join_asof",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("ts"), lit(null).cast("long").as("click_id"),
        col("event_id").as("p_id"), col("value").as("p_value"), lit(0).as("side"))
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"), col("ts"), col("event_id").as("click_id"),
        lit(null).cast("long").as("p_id"), lit(null).cast("double").as("p_value"),
        lit(1).as("side"))
      // (ts, side, event_id) is a TOTAL order: same-timestamp purchases
      // exist in real event streams, and without the id tiebreak "last"
      // is engine-dependent (caught by the round-9 sf1 scale run, where
      // replicated facts planted duplicate timestamps). Ties resolve to
      // the LARGEST purchase id — latest-writer-wins, engine-exact.
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("side"), coalesce(col("p_id"), col("click_id")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionByName(clicks)
        .withColumn("asof_id", last(col("p_id"), ignoreNulls = true).over(w))
        .withColumn("asof_value", last(col("p_value"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select("click_id", "user_id", "asof_id", "asof_value")
        .orderBy("click_id")
    },
    Some("""WITH u AS (
              SELECT user_id, ts, NULL::BIGINT AS click_id, event_id AS p_id,
                     value AS p_value, 0 AS side
              FROM events WHERE event_type = 'purchase'
              UNION ALL
              SELECT user_id, ts, event_id, NULL::BIGINT, NULL::DOUBLE, 1
              FROM events WHERE event_type = 'click'),
            w AS (
              SELECT *,
                last_value(p_id IGNORE NULLS) OVER
                  (PARTITION BY user_id
                   ORDER BY ts, side, COALESCE(p_id, click_id)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_id,
                last_value(p_value IGNORE NULLS) OVER
                  (PARTITION BY user_id
                   ORDER BY ts, side, COALESCE(p_id, click_id)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
              FROM u)
            SELECT click_id, user_id, asof_id, asof_value FROM w WHERE side = 1
            ORDER BY click_id"""))

  // FORWARD as-of join (merge_asof(direction='forward') analog): each
  // click matches the FIRST purchase at-or-after it — the "next action
  // after exposure" semantics attribution needs, completing the
  // backward/forward/nearest/tolerance matrix. Same single-shuffle
  // union-window trick as join_asof, with the frame read forward
  // (first_value over current→unbounded-following) and purchases sorted
  // AFTER same-timestamp clicks so an exactly-simultaneous purchase still
  // matches. O(n log n) per user partition; never a per-row range join.
  private val joinAsofForward = Op(
    "join_asof_forward",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("ts"), lit(null).cast("long").as("click_id"),
        col("event_id").as("p_id"), col("value").as("p_value"),
        lit(2).as("side"))
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"), col("ts"), col("event_id").as("click_id"),
        lit(null).cast("long").as("p_id"),
        lit(null).cast("double").as("p_value"), lit(1).as("side"))
      // total order (see join_asof): forward ties resolve to the SMALLEST
      // purchase id — first-writer-wins, engine-exact
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("side"), coalesce(col("p_id"), col("click_id")))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      purchases.unionByName(clicks)
        .withColumn("next_id", first(col("p_id"), ignoreNulls = true).over(w))
        .withColumn("next_value",
          first(col("p_value"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select("click_id", "user_id", "next_id", "next_value")
        .orderBy("click_id")
    },
    Some("""WITH u AS (
              SELECT user_id, ts, NULL::BIGINT AS click_id, event_id AS p_id,
                     value AS p_value, 2 AS side
              FROM events WHERE event_type = 'purchase'
              UNION ALL
              SELECT user_id, ts, event_id, NULL::BIGINT, NULL::DOUBLE, 1
              FROM events WHERE event_type = 'click'),
            w AS (
              SELECT *,
                first_value(p_id IGNORE NULLS) OVER
                  (PARTITION BY user_id
                   ORDER BY ts, side, COALESCE(p_id, click_id)
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS next_id,
                first_value(p_value IGNORE NULLS) OVER
                  (PARTITION BY user_id
                   ORDER BY ts, side, COALESCE(p_id, click_id)
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS next_value
              FROM u)
            SELECT click_id, user_id, next_id, next_value FROM w
            WHERE side = 1 ORDER BY click_id"""))

  // As-of join with a match tolerance (merge_asof(tolerance=…) analog): the
  // backward match only counts if it is at most 1 hour old — stale state
  // must read as NO state, the semantics feature-store point-in-time
  // lookups need. Same single-shuffle union-window trick as join_asof; the
  // tolerance is a pure post-window predicate, so the cost is identical.
  private val joinAsofTolerance = Op(
    "join_asof_tolerance",
    (s, d) => {
      val ev = t(s, d, "events")
        .withColumn("ts_ms", expr("unix_micros(ts) div 1000"))
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("ts"), col("ts_ms"),
        lit(null).cast("long").as("click_id"),
        col("event_id").as("p_id"), col("ts_ms").as("p_ts"), lit(0).as("side"))
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"), col("ts"), col("ts_ms"),
        col("event_id").as("click_id"),
        lit(null).cast("long").as("p_id"), lit(null).cast("long").as("p_ts"),
        lit(1).as("side"))
      // total order (see join_asof); ties to the largest purchase id
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("side"), coalesce(col("p_id"), col("click_id")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionByName(clicks)
        .withColumn("asof_id", last(col("p_id"), ignoreNulls = true).over(w))
        .withColumn("gap_ms",
          col("ts_ms") - last(col("p_ts"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("click_id"), col("user_id"),
          when(col("gap_ms") <= 3600000L, col("asof_id")).as("asof_id"),
          when(col("gap_ms") <= 3600000L, col("gap_ms")).as("gap_ms"))
        .orderBy("click_id")
    },
    Some("""WITH u AS (
              SELECT user_id, ts, epoch_ms(ts) AS ts_ms, NULL::BIGINT AS click_id,
                     event_id AS p_id, epoch_ms(ts) AS p_ts, 0 AS side
              FROM events WHERE event_type = 'purchase'
              UNION ALL
              SELECT user_id, ts, epoch_ms(ts), event_id, NULL::BIGINT,
                     NULL::BIGINT, 1
              FROM events WHERE event_type = 'click'),
            w AS (
              SELECT *,
                last_value(p_id IGNORE NULLS) OVER
                  (PARTITION BY user_id
                   ORDER BY ts, side, COALESCE(p_id, click_id)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_id,
                ts_ms - last_value(p_ts IGNORE NULLS) OVER
                  (PARTITION BY user_id
                   ORDER BY ts, side, COALESCE(p_id, click_id)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gap_ms
              FROM u)
            SELECT click_id, user_id,
                   CASE WHEN gap_ms <= 3600000 THEN asof_id END AS asof_id,
                   CASE WHEN gap_ms <= 3600000 THEN gap_ms END AS gap_ms
            FROM w WHERE side = 1
            ORDER BY click_id"""))

  // NEAREST-neighbor time join (join_asof's bidirectional sibling: backward
  // OR forward, whichever click is closer in time; ties go backward). Same
  // single-shuffle union-window trick — NOT a per-row range join: both
  // event streams union into one user-partitioned sort, a backward window
  // carries the last click and a forward window the next click, and each
  // purchase picks the closer of the two. O(n log n) per user partition at
  // any scale; the naive formulation is a per-purchase scan of all clicks.
  private val joinAsofNearest = Op(
    "join_asof_nearest",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("long").as("c_id"), lit(0).as("side"))
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("c_id"), lit(1).as("side"))
      val back = Window.partitionBy("user_id")
        .orderBy(col("us"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy("user_id")
        .orderBy(col("us"), col("side"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      purchases.unionByName(clicks)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("c_us", when(col("side") === 1, col("us")))
        .withColumn("prev_id", last(col("c_id"), ignoreNulls = true).over(back))
        .withColumn("prev_us", last(col("c_us"), ignoreNulls = true).over(back))
        .withColumn("next_id", first(col("c_id"), ignoreNulls = true).over(fwd))
        .withColumn("next_us", first(col("c_us"), ignoreNulls = true).over(fwd))
        .filter(col("side") === 0)
        .withColumn("take_prev", col("next_us").isNull ||
          (col("prev_us").isNotNull &&
            col("us") - col("prev_us") <= col("next_us") - col("us")))
        .select(col("event_id").as("p_id"), col("user_id"),
          when(col("take_prev"), col("prev_id")).otherwise(col("next_id"))
            .as("click_id"),
          (when(col("take_prev"), col("prev_us")).otherwise(col("next_us")) -
            col("us")).as("dt_us"))
        .orderBy("p_id")
    },
    Some("""WITH u AS (
              SELECT user_id, ts, event_id, NULL::BIGINT AS c_id, 0 AS side
              FROM events WHERE event_type = 'purchase'
              UNION ALL
              SELECT user_id, ts, event_id, event_id, 1
              FROM events WHERE event_type = 'click'),
            w AS (
              SELECT user_id, event_id, side, epoch_us(ts) AS us,
                last_value(c_id IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY epoch_us(ts), side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_id,
                last_value(CASE WHEN side = 1 THEN epoch_us(ts) END IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY epoch_us(ts), side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_us,
                first_value(c_id IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY epoch_us(ts), side, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_id,
                first_value(CASE WHEN side = 1 THEN epoch_us(ts) END IGNORE NULLS) OVER
                  (PARTITION BY user_id ORDER BY epoch_us(ts), side, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us
              FROM u),
            p AS (
              SELECT *, (next_us IS NULL OR (prev_us IS NOT NULL AND
                         us - prev_us <= next_us - us)) AS take_prev
              FROM w WHERE side = 0)
            SELECT event_id AS p_id, user_id,
                   CASE WHEN take_prev THEN prev_id ELSE next_id END AS click_id,
                   CASE WHEN take_prev THEN prev_us ELSE next_us END - us AS dt_us
            FROM p ORDER BY p_id"""))

  // ----------------------------------------------------------- aggregations
  // TPC-H-Q1-shaped pricing summary (flagship; partial+final HashAggregate).
  private[graft] val aggHashGroup = Op(
    "agg_hash_group",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
              COUNT(*) AS n
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  private val aggMultiStats = Op(
    "agg_multi_stats",
    (s, d) => t(s, d, "orders")
      .groupBy("o_orderpriority")
      .agg(
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_price"),
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
              MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
              COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  private val aggDistinct = Op(
    "agg_distinct",
    (s, d) => t(s, d, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus", "l_quantity"),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
            ORDER BY l_returnflag, l_linestatus, l_quantity"""))

  private val aggRollup = Op(
    "agg_rollup",
    (s, d) => t(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  private val aggCube = Op(
    "agg_cube",
    (s, d) => t(s, d, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  // GROUPING SETS is SQL-only surface in Spark — exercised via spark.sql.
  private val aggGroupingSets = Op(
    "agg_grouping_sets",
    (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
                 CAST(grouping(l_returnflag) AS INT) AS g_rf,
                 CAST(grouping(l_linestatus) AS INT) AS g_ls,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 COUNT(*) AS n
               FROM lineitem_gs
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                       (l_returnflag, l_linestatus), ())
               ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(grouping(l_returnflag) AS INT) AS g_rf,
              CAST(grouping(l_linestatus) AS INT) AS g_ls,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              COUNT(*) AS n
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                    (l_returnflag, l_linestatus), ())
            ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  // Deterministic per-group list: collect_set then sort_array (§7.6.5).
  // Arrays never cross the comparison boundary (they crash the driver's
  // pandas comparator): each quantity is scaled to exact cents and the sorted
  // list is emitted as one comma-joined string on BOTH engines.
  private val aggCollectSorted = Op(
    "agg_collect_sorted",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sort_array(collect_set(col("l_quantity"))).as("qarr"))
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("concat_ws(',', transform(qarr, q -> CAST(floor(q * 100 + 0.5) AS BIGINT)))")
          .as("quantities"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
              array_to_string(list_transform(list_sort(list(DISTINCT l_quantity)),
                q -> CAST(floor(q * 100 + 0.5) AS BIGINT)), ',') AS quantities
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  // Statistical aggregates; both engines use numerically-stable one-pass
  // algorithms — 4-dp rounding absorbs the accumulation-order difference
  // (validated at sf0.001/0.01/0.1).
  private val aggStats = Op(
    "agg_stats_corr",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qp"),
        round(stddev_samp(col("l_quantity")), 4).as("std_q"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
              round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
              round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
              round(stddev_samp(l_quantity), 4) AS std_q
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // Boolean aggregates per group (every/any shape).
  private val aggBool = Op(
    "agg_bool",
    (s, d) => t(s, d, "orders")
      .groupBy("o_orderpriority")
      .agg(bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
        bool_or(col("o_orderstatus") === "F").as("any_f"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
              bool_and(o_totalprice > 1000.0) AS all_over_1k,
              bool_or(o_orderstatus = 'F') AS any_f,
              COUNT(*) AS n
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // Two-phase salted aggregation — THE skew pattern at 100 TB: phase 1
  // aggregates on (key, salt) so a hot key spreads over 16 reducers, phase 2
  // merges the partials on the key alone. Decimal partials are
  // merge-order-independent, so the result equals the direct group-by oracle.
  private val aggSaltedTwophase = Op(
    "agg_salted_twophase",
    (s, d) => t(s, d, "events")
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(18,2)")).as("psum"))
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n"),
        sum(col("psum")).cast("double").as("sum_value"))
      .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events GROUP BY event_type ORDER BY event_type"""))

  // HLL sketch, ORACLE-CHECKED via the bound-verdict pattern (round-9
  // sketch-family upgrade): the engine-specific HLL++ estimate stays out
  // of the compared columns — the output is the exact per-type profile
  // (plain SQL in DuckDB) plus `est_within_5pct`, computed by Spark from
  // the real estimate and asserted TRUE by the oracle. The sketch runs at
  // an EXPLICIT rsd 0.02 so the 5% verdict is a 2.5σ bound (the default
  // 0.05 would make the bound one standard deviation — a coin-flip on a
  // new dataset, per round-9 ADVICE; round 10's 0.01 made it ~5σ but grew
  // the register array ~25× and an isolated quiet-box run measured the
  // sketch at 4.8 s — 0.02 keeps a ≥98% per-group verdict at ~6× less
  // state, per round-10 ADVICE, measured 4.8 → 2.3 s isolated). A drifted
  // sketch flips the boolean and fails the hash compare; the per-row
  // estimate itself stays covered by the rel-err unit test.
  private val aggApproxDistinct = Op(
    "agg_approx_distinct",
    (s, d) => t(s, d, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02)
        .cast("double").as("est"),
        countDistinct(col("user_id")).as("n_users_exact"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n_users_exact"), col("n"),
        (abs(col("est") - col("n_users_exact")) <=
          lit(0.05) * col("n_users_exact")).as("est_within_5pct"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
                   COUNT(*) AS n,
                   TRUE AS est_within_5pct
            FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------- windows
  private val windowRank = Op(
    "window_rank",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).cast("int").as("rnk"),
          dense_rank().over(w).cast("int").as("drnk"),
          row_number().over(w).cast("int").as("rn"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
              CAST(rank() OVER w AS INT) AS rnk,
              CAST(dense_rank() OVER w AS INT) AS drnk,
              CAST(row_number() OVER w AS INT) AS rn
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  // Running sum in DECIMAL: exact under any accumulation association, so
  // Spark's sequential scan and DuckDB's segment tree agree bit-for-bit.
  private val windowRunning = Op(
    "window_running",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
              COUNT(*) OVER w AS running_n
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ORDER BY o_custkey, o_orderkey"""))

  // Range frame over epoch seconds (numeric range = portable across engines).
  private val windowRangeFrame = Op(
    "window_range_frame",
    (s, d) => {
      // o_orderdate arrives as TIMESTAMP_NTZ; with a UTC session the
      // TIMESTAMP hop is value-preserving and makes the epoch cast legal.
      val base = t(s, d, "orders")
        .withColumn("epoch_s", col("o_orderdate").cast("timestamp").cast("long"))
      val w = Window.partitionBy("o_custkey").orderBy(col("epoch_s"))
        .rangeBetween(-30L * 86400, 0)
      base.select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_30d"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("sum_30d"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
              COUNT(*) OVER w AS n_30d,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_30d
            FROM (SELECT *, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s FROM orders)
            WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_s
                         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
            ORDER BY o_custkey, o_orderkey"""))

  // Frame-edge window values; the full-partition frame + unique ordering key
  // makes first/last/nth deterministic in both engines.
  private val windowFirstLast = Op(
    "window_first_last",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          first(col("o_orderkey")).over(w).as("cheapest_order"),
          last(col("o_orderkey")).over(w).as("priciest_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
              first_value(o_orderkey) OVER w AS cheapest_order,
              last_value(o_orderkey) OVER w AS priciest_order,
              nth_value(o_orderkey, 2) OVER w AS second_order
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_totalprice, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ORDER BY o_orderkey"""))

  // Relative-position window functions; exact rational doubles, rounded at
  // the boundary per §7.6.2. Spelled as the bucket-partitioned TWO-PHASE
  // rank (the ABC/eval-sample recipe): the partition key (orderpriority)
  // has 5 values, so the direct window sorts a fifth of the table per task
  // — instead, row_number runs inside (priority, price-bucket) partitions
  // and is lifted by per-bucket offsets from a cumulative window over the
  // tiny counts relation. The order (price, orderkey) is total, so
  // rank == position and percent_rank/cume_dist are the same (pos-1)/(n-1)
  // and pos/n double divisions the builtin computes — bit-identical.
  private val windowPercentRank = Op(
    "window_percent_rank",
    (s, d) => {
      val base = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority").as("g"),
          col("o_totalprice").as("p"))
        .withColumn("bu", expr("CAST(floor(p / 1000) AS BIGINT)"))
      val wIn = Window.partitionBy("g", "bu")
        .orderBy(col("p"), col("o_orderkey"))
      val win = base.withColumn("rin", row_number().over(wIn).cast("long"))
      val bt = base.groupBy("g", "bu").agg(count(lit(1)).as("c"))
      val wOff = Window.partitionBy("g").orderBy("bu")
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = bt
        .withColumn("o", coalesce(sum("c").over(wOff), lit(0L)))
        .withColumn("n", sum("c").over(Window.partitionBy("g")))
        .select("g", "bu", "o", "n")
      win.join(off, Seq("g", "bu"))
        .select(col("o_orderkey"), col("g").as("o_orderpriority"),
          // single-row partition: the builtin percent_rank defines 0.0
          // where (pos-1)/(n-1) would be 0/0 = NaN — guard it (unreachable
          // on the 5 well-populated priorities, but a latent divergence on
          // any future 1-row stratum). cume's pos/n is safe: n >= 1.
          round(when(col("n") === 1, lit(0.0)).otherwise(
            (col("rin") + col("o") - 1).cast("double") /
              (col("n") - 1)), 6).as("pct_rank"),
          round((col("rin") + col("o")).cast("double") / col("n"), 6)
            .as("cume"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority,
              round(percent_rank() OVER w, 6) AS pct_rank,
              round(cume_dist() OVER w, 6) AS cume
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderkey"""))

  // Equal-depth bucketing per customer (total order incl. tiebreak so both
  // engines assign identical bucket ids).
  private val windowNtile = Op(
    "window_ntile",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
              CAST(ntile(4) OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
            FROM orders ORDER BY o_orderkey"""))

  /** Exact per-group linear-interpolation percentile WITHOUT a holistic
    * aggregation buffer — the scale-safe spelling of `percentile(col, p)`.
    * Spark's builtin is an ObjectAggregate whose buffer materializes every
    * value of the group (lineitem has 3 return-flag groups → one buffer
    * holds ~a third of the fact table per executor: the OOM shape at
    * 100×). This re-spell collapses values to the integer-cents DOMAIN
    * first (one map-side-combinable count aggregate — cardinality bounded
    * by the value domain, not the data volume), runs the per-group CDF as
    * the bucket-partitioned two-phase cumsum (window per (group, x/1000
    * bucket) + tiny per-bucket offset join — no single-partition window),
    * and reads the two interpolation anchors by the inverse-CDF rule
    * (smallest x with cum ≥ k+1 / k+2, pure integer comparisons). The
    * interpolation itself is the standard type-7 rule both engines use:
    * pos = p·(n−1), v_lo + frac·(v_hi − v_lo). Input df: (g, v) rows with
    * v exact at 2 decimals. */
  /** Input df: (g, metric, p, v) rows — all requested (group, metric)
    * percentiles ride ONE collapse + CDF pass, keyed by (g, metric); `p`
    * must be constant per (g, metric). Returns (g, metric, pct). */
  private def interpPercentileByGroup(df: DataFrame): DataFrame = {
    val gm = Seq("g", "metric")
    // cache the domain-collapsed counts: three consumers below (CDF
    // window, per-bucket totals, per-(g,metric) n) would otherwise each
    // re-run the fact scan + collapse shuffle (3 scans in the r18
    // before-plan — guide §2.4). Cardinality is bounded by the VALUE
    // DOMAIN (one row per distinct cent value per metric), not the data
    // volume, so the cache is small at any scale.
    val g = df
      .select(col("g"), col("metric"), col("p"),
        round(col("v") * 100).cast("long").as("x"))
      .groupBy("g", "metric", "x")
      .agg(count(lit(1)).as("cnt"), first("p").as("p"))
      .withColumn("bucket", expr("x div 1000"))
      .trackedCache()
    val w = Window.partitionBy("g", "metric", "bucket").orderBy("x")
    val within = g.withColumn("cum_in", sum("cnt").over(w))
    val counts = g.groupBy("g", "metric", "bucket").agg(sum("cnt").as("bt"))
    // per-bucket offsets as a WINDOW over the tiny counts relation (one
    // row per bucket), not a triangular self-join: with a wide value
    // domain (l_extendedprice → ~10k cent-buckets per group) the b<a
    // join is O(buckets²) — measured 27 s at sf0.1 vs ~1 s windowed. The
    // window partitions by (g, metric) over O(buckets) rows, so the BIG
    // relation still never passes through a single partition.
    val wOff = Window.partitionBy("g", "metric").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum("bt").over(wOff), lit(0L)))
      .select("g", "metric", "bucket", "off")
    val tot = g.groupBy("g", "metric").agg(sum("cnt").as("n"))
    within.join(broadcast(offsets), gm :+ "bucket")
      .withColumn("cum", col("off") + col("cum_in"))
      .join(broadcast(tot), gm)
      .withColumn("k",
        floor(col("p") * (col("n") - 1).cast("double")).cast("long"))
      .groupBy("g", "metric", "n", "k")
      .agg(min(when(col("cum") >= col("k") + 1, col("x"))).as("xlo"),
        min(when(col("cum") >= col("k") + 2, col("x"))).as("xhi"),
        first("p").as("p"))
      .select(col("g"), col("metric"),
        round(col("xlo").cast("double") / 100.0 +
          (col("p") * (col("n") - 1).cast("double") -
            col("k").cast("double")) *
          (coalesce(col("xhi"), col("xlo")).cast("double") -
            col("xlo").cast("double")) / 100.0, 4).as("pct"))
  }

  // Exact linear-interpolation percentiles per group; rounded at the
  // boundary (§7.6.2) since interpolation arithmetic is float. Spelled on
  // the domain-collapse + two-phase-CDF machinery (see
  // interpPercentileByGroup) — no holistic ObjectAggregate in the plan
  // (pinned in PlanSpec).
  private val aggPercentile = Op(
    "agg_percentile",
    (s, d) => {
      // both (metric, p) pairs ride ONE scan + one collapse shuffle:
      // stack() expands each row map-side into its two metric rows
      val stacked = t(s, d, "lineitem").selectExpr(
        "l_returnflag AS g",
        "stack(2, 'qty', 0.5D, l_quantity, 'price', 0.9D, l_extendedprice)" +
          " AS (metric, p, v)")
      interpPercentileByGroup(stacked)
        .groupBy("g")
        .agg(max(when(col("metric") === "qty", col("pct"))).as("p50_qty"),
          max(when(col("metric") === "price", col("pct"))).as("p90_price"))
        .select(col("g").as("l_returnflag"), col("p50_qty"),
          col("p90_price"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
              round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
              round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val windowLagLead = Op(
    "window_lag_lead",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, value,
              lag(value, 1) OVER w AS prev_value,
              lead(value, 1) OVER w AS next_value,
              value - lag(value, 1) OVER w AS delta
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id"""))

  private val topkPerGroup = Op(
    "topk_per_group",
    (s, d) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, d, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          row_number().over(w).cast("int").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("p_brand", "rn")
    },
    Some("""SELECT p_brand, p_partkey, p_retailprice, rn FROM (
              SELECT p_brand, p_partkey, p_retailprice,
                CAST(row_number() OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rn
              FROM part) WHERE rn <= 3
            ORDER BY p_brand, rn"""))

  // --------------------------------------------- sorts / limits / set ops
  private val sortMulti = Op(
    "sort_multi",
    (s, d) => t(s, d, "customer")
      .withColumn("seg", nullif(col("c_mktsegment"), lit("MACHINERY")))
      .select("c_custkey", "seg", "c_acctbal")
      .orderBy(asc_nulls_first("seg"), desc("c_acctbal"), asc("c_custkey")),
    Some("""SELECT c_custkey, NULLIF(c_mktsegment, 'MACHINERY') AS seg, c_acctbal
            FROM customer
            ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey"""))

  // Global top-k: Spark runs this as TakeOrderedAndProject — no full sort.
  private val limitTopk = Op(
    "limit_topk",
    (s, d) => t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  private val setUnionAll = Op(
    "set_union_all",
    (s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("key"), lit("even").as("src"))
        .unionByName(c.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("key"), lit("third").as("src")))
        .orderBy("key", "src")
    },
    Some("""SELECT c_custkey AS key, 'even' AS src FROM customer WHERE c_custkey % 2 = 0
            UNION ALL
            SELECT c_custkey AS key, 'third' AS src FROM customer WHERE c_custkey % 3 = 0
            ORDER BY key, src"""))

  private val setIntersect = Op(
    "set_intersect",
    (s, d) => t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key"))
      .intersect(t(s, d, "orders").select(col("o_custkey").as("key")))
      .orderBy("key"),
    Some("""SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT o_custkey AS key FROM orders
            ORDER BY key"""))

  // Multiset (ALL) set semantics: duplicates survive by min-count /
  // count-difference — distinct from the set variants above.
  private val setIntersectAll = Op(
    "set_intersect_all",
    (s, d) => t(s, d, "orders")
      .select(col("o_custkey").as("key"))
      .intersectAll(t(s, d, "lineitem").select((col("l_orderkey") % 1000).as("key")))
      .orderBy("key"),
    Some("""SELECT o_custkey AS key FROM orders
            INTERSECT ALL
            SELECT l_orderkey % 1000 AS key FROM lineitem
            ORDER BY key"""))

  private val setExceptAll = Op(
    "set_except_all",
    (s, d) => t(s, d, "orders")
      .select(col("o_custkey").as("key"))
      .exceptAll(t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("key")))
      .orderBy("key"),
    Some("""SELECT o_custkey AS key FROM orders
            EXCEPT ALL
            SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
            ORDER BY key"""))

  // Conditional counting per group (FILTER / count_if shape).
  private val aggCountIf = Op(
    "agg_count_if",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(count_if(col("l_discount") > 0.05).as("n_discounted"),
        count_if(col("l_quantity") >= 25.0).as("n_bulk"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
              COUNT(*) FILTER (l_discount > 0.05) AS n_discounted,
              COUNT(*) FILTER (l_quantity >= 25.0) AS n_bulk,
              COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // TPC-H-Q5-shaped 6-table star join: region-filtered dims broadcast onto
  // the customer→orders→lineitem→supplier fact chain (the "is the join
  // broadcast-able, and did I broadcast it?" case in the flesh — region and
  // nation are O(10) rows at any scale factor and are hinted explicitly;
  // customer/orders/lineitem shuffle on their join keys). Revenue in exact
  // DECIMAL, cast to DOUBLE only at the output boundary. The c_nationkey =
  // s_nationkey condition is Q5's "local supplier" constraint.
  private val sqlTpchQ5 = Op(
    "sql_tpch_q5",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA" &&
        col("o_orderdate") >= expr("TIMESTAMP '1996-01-01'") &&
        col("o_orderdate") < expr("TIMESTAMP '1997-01-01'"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name")),
    Some("""SELECT n_name,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name"""))

  // TPC-H-Q10-shaped "returned items" report: revenue lost to returns per
  // customer over one quarter, top 20. The canonical customer-fact join
  // where the FACT filter (return flag + date slice) must reach the scans
  // before the join — Catalyst pushes both predicates into the parquet
  // readers, the nation dim broadcasts, and the global top-20 plans as
  // TakeOrderedAndProject (per-partition heaps), never a full sort. Revenue
  // accumulates in DECIMAL (exact, order-independent) and is cast to DOUBLE
  // only at the output boundary — the §7.6 float-sum protocol.
  private val sqlTpchQ10 = Op(
    "sql_tpch_q10",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .where(col("l_returnflag") === "R" &&
        col("o_orderdate") >= expr("TIMESTAMP '1996-01-01'") &&
        col("o_orderdate") < expr("TIMESTAMP '1996-07-01'"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20),
    Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  // TPC-H-Q17-shaped "small-quantity revenue" query: a CORRELATED scalar
  // subquery (per-part average quantity) in the WHERE clause — the third
  // decorrelation shape alongside sql_tpch_q18's IN-HAVING and
  // subquery_decorrelate's EXISTS: Catalyst rewrites the per-row scalar
  // subquery into ONE aggregate over lineitem joined back on partkey, so
  // the correlated predicate costs one extra aggregate + join, never a
  // per-row re-scan. Determinism: avg(l_quantity) sums integral-valued
  // doubles (exact in float64 far below 2^53), so the 0.2×avg threshold is
  // bit-identical on any engine/order; revenue accumulates in DECIMAL.
  private val sqlTpchQ17 = Op(
    "sql_tpch_q17",
    (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_q17")
      t(s, d, "part").createOrReplaceTempView("part_q17")
      s.sql("""SELECT count(*) AS n_small,
                      round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                                 AS DOUBLE) / 7.0, 4) AS avg_yearly
               FROM lineitem_q17 JOIN part_q17 ON p_partkey = l_partkey
               WHERE p_brand = 'Brand#1'
                 AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                   FROM lineitem_q17 l2
                                   WHERE l2.l_partkey = p_partkey)""")
    },
    Some("""SELECT count(*) AS n_small,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                              AS DOUBLE) / 7.0, 4) AS avg_yearly
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#1'
              AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = p_partkey)"""))

  // TPC-H-Q18-shaped "large orders" query: the HAVING-subquery membership
  // test (`o_orderkey IN (SELECT ... HAVING sum(qty) > K)`) — Catalyst
  // rewrites the IN to a LEFT SEMI join against the pre-aggregated key set,
  // so the filter costs one aggregate + one semi join, never a per-row
  // subquery. Global top-100 by total price plans as TakeOrderedAndProject
  // (per-partition heaps, k-row driver merge).
  private val sqlTpchQ18 = Op(
    "sql_tpch_q18",
    (s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer_v")
      t(s, d, "orders").createOrReplaceTempView("orders_v")
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT c_name, o_orderkey, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM customer_v
        JOIN orders_v ON c_custkey = o_custkey
        JOIN lineitem_v ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem_v
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        GROUP BY c_name, o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100""")
    },
    Some("""SELECT c_name, o_orderkey, o_totalprice,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem
              GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
            GROUP BY c_name, o_orderkey, o_totalprice
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 100"""))

  // TPC-H-Q1-shaped pricing summary: the canonical full-scan report — nine
  // aggregates over one lineitem pass, grouped on a 6-value key. The shape
  // that proves partial aggregation: map-side combine collapses each input
  // partition to ≤6 rows before the shuffle, so the exchange moves O(groups)
  // bytes regardless of SF (at 100 TB the scan dominates and the agg is
  // free). Determinism: quantities sum as BIGINT, money in DECIMAL (the
  // 3-factor charge product stays exact — scale 6 ≤ decimal(38,6)), and
  // every avg divides an exact sum by an exact count in float64 once.
  // The scale-6 money sums exceed double precision at sf1 (17 sig digits
  // — the decimal→double conversions diverged by 1 ulp between engines,
  // and decimal half-rounding modes differ too: Spark casts HALF_UP,
  // DuckDB HALF_EVEN; both caught by the round-9 sf1 run). They now round
  // to cents in EXACT integer arithmetic — micro-units as BIGINT,
  // (x + 5000) div 10000 half-up — and convert once, a correctly-rounded
  // 13-digit parse identical on both engines.
  private val sqlTpchQ1 = Op(
    "sql_tpch_q1",
    (s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_q1")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_base_price,
               CAST((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l_discount AS DECIMAL(18,2))))
                        * 1000000 AS BIGINT) + 5000) DIV 10000 AS DOUBLE)
                 / 100.0D
                 AS sum_disc_price,
               CAST((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l_discount AS DECIMAL(18,2))) *
                        (1 + CAST(l_tax AS DECIMAL(18,2))))
                        * 1000000 AS BIGINT) + 5000) DIV 10000 AS DOUBLE)
                 / 100.0D
                 AS sum_charge,
               round(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                     / COUNT(*), 4) AS avg_qty,
               round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                          AS DOUBLE) / COUNT(*), 4) AS avg_price,
               round(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem_q1
        WHERE l_shipdate <= TIMESTAMP '2000-12-31'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_base_price,
              CAST((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (1 - CAST(l_discount AS DECIMAL(18,2))))
                       * 1000000 AS BIGINT) + 5000) // 10000 AS DOUBLE)
                / 100.0
                AS sum_disc_price,
              CAST((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (1 - CAST(l_discount AS DECIMAL(18,2))) *
                       (1 + CAST(l_tax AS DECIMAL(18,2))))
                       * 1000000 AS BIGINT) + 5000) // 10000 AS DOUBLE)
                / 100.0
                AS sum_charge,
              round(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                    / COUNT(*), 4) AS avg_qty,
              round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DOUBLE) / COUNT(*), 4) AS avg_price,
              round(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*), 4) AS avg_disc,
              COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2000-12-31'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  // TPC-H-Q21-shaped "suppliers who kept orders waiting": the DOUBLE
  // correlation — an EXISTS (some other supplier on the order) and a NOT
  // EXISTS (no other supplier shipped later) against the same fact table.
  // Catalyst decorrelates both into a LEFT SEMI and a LEFT ANTI join on
  // l_orderkey, so the query costs three hash joins over lineitem, never a
  // per-row re-scan — the shape that separates an optimizer from a loop.
  // Late = shipped >30 days after the order date (this schema carries
  // shipdate, not commit/receipt dates).
  private val sqlTpchQ21 = Op(
    "sql_tpch_q21",
    (s, d) => {
      t(s, d, "supplier").createOrReplaceTempView("supplier_q21")
      t(s, d, "orders").createOrReplaceTempView("orders_q21")
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_q21")
      s.sql("""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier_q21
        JOIN lineitem_q21 l1 ON s_suppkey = l1.l_suppkey
        JOIN orders_q21 ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL '30' DAY
          AND EXISTS (SELECT 1 FROM lineitem_q21 l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem_q21 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name""")
    },
    Some("""SELECT s_name, COUNT(*) AS numwait
            FROM supplier
            JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
            JOIN orders ON o_orderkey = l1.l_orderkey
            WHERE o_orderstatus = 'F'
              AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_shipdate > l1.l_shipdate)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name"""))

  // TPC-H-Q22-shaped "global sales opportunity": an UNCORRELATED scalar
  // subquery (the global average balance) feeding the filter of an anti
  // join (customers with no RECENT orders — the date scope keeps
  // the key non-degenerate at every SF), grouped by nation. The scalar
  // aggregates once and broadcasts as a literal; the NOT EXISTS plans as a
  // LEFT ANTI hash join — both O(n), no per-row work. The above-average
  // test cross-multiplies in exact integer cents (cents·count > Σcents, all
  // BIGINT) so the threshold can't drift with float summation order.
  private val sqlTpchQ22 = Op(
    "sql_tpch_q22",
    (s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer_q22")
      t(s, d, "orders").createOrReplaceTempView("orders_q22")
      s.sql("""
        SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
               round(CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                          AS DOUBLE) / 100.0, 2) AS totacctbal
        FROM customer_q22
        WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
              (SELECT COUNT(*) FROM customer_q22 WHERE c_acctbal > 0)
              > (SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                 FROM customer_q22 WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders_q22
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey
        ORDER BY c_nationkey""")
    },
    Some("""SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
              round(CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                         AS DOUBLE) / 100.0, 2) AS totacctbal
            FROM customer
            WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
                  (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
                  > (SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                     FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY c_nationkey
            ORDER BY c_nationkey"""))

  // TPC-H Q2 "minimum-cost supplier" — LITERAL spec over the derived
  // partsupp (r16 upgrade; the r15- version proxied per-part cost from the
  // fact): part × supplier × partsupp × nation × region with the published
  // correlated MIN over the SAME region-sliced partsupp, the spec's
  // ORDER BY s_acctbal DESC ... LIMIT 100 (total order — p_partkey
  // tie-breaks), p_type suffix-LIKE and region literal 'EUROPE'
  // (suffix re-targeted to this generator's type vocabulary; p_size
  // widened to ≤15 so the slice is non-degenerate at sf0.001's 200 parts;
  // p_name stands in for the absent p_mfgr/s_address columns). Catalyst
  // decorrelates the per-part MIN into one aggregate joined back on
  // partkey — never a re-scan per part; costs are exact integer cents so
  // the "equals the minimum" test can't drop rows on a float ulp.
  private val sqlTpchQ2 = Op(
    "sql_tpch_q2",
    (s, d) => {
      t(s, d, "part").createOrReplaceTempView("part_q2")
      t(s, d, "supplier").createOrReplaceTempView("supplier_q2")
      t(s, d, "nation").createOrReplaceTempView("nation_q2")
      t(s, d, "region").createOrReplaceTempView("region_q2")
      Partsupp.table(s, d).createOrReplaceTempView("partsupp_q2")
      s.sql("""
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               round(CAST(ps_supplycost_c AS DOUBLE) / 100.0, 2)
                 AS ps_supplycost
        FROM part_q2, supplier_q2, partsupp_q2, nation_q2, region_q2
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size <= 15 AND p_type LIKE '%GE'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND ps_supplycost_c =
              (SELECT MIN(ps2.ps_supplycost_c)
               FROM partsupp_q2 ps2, supplier_q2 s2, nation_q2 n2,
                    region_q2 r2
               WHERE ps2.ps_partkey = p_partkey
                 AND s2.s_suppkey = ps2.ps_suppkey
                 AND s2.s_nationkey = n2.n_nationkey
                 AND n2.n_regionkey = r2.r_regionkey
                 AND r2.r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100""")
    },
    Some(s"""WITH ${Partsupp.oracleCte}
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                   round(CAST(ps_supplycost_c AS DOUBLE) / 100.0, 2)
                     AS ps_supplycost
            FROM part, supplier, partsupp, nation, region
            WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
              AND p_size <= 15 AND p_type LIKE '%GE'
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'EUROPE'
              AND ps_supplycost_c =
                  (SELECT MIN(ps2.ps_supplycost_c)
                   FROM partsupp ps2, supplier s2, nation n2, region r2
                   WHERE ps2.ps_partkey = p_partkey
                     AND s2.s_suppkey = ps2.ps_suppkey
                     AND s2.s_nationkey = n2.n_nationkey
                     AND n2.n_regionkey = r2.r_regionkey
                     AND r2.r_name = 'EUROPE')
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100"""))

  // Binned interval join — the RANGE-join shape that survives 100 TB when
  // NEITHER side fits in a broadcast (join_theta_range's complement: that key
  // broadcasts its band side; this one needs no broadcast on either side).
  // Two composable tricks:
  //  1. POINT PRE-AGGREGATION: a count-over-range query only needs the
  //     points at the predicate's resolution, so lineitem first collapses to
  //     (shipdate, cnt) — cardinality bounded by the TIME SPAN, not the data
  //     volume (2.5k rows at every SF; at 100 TB this is the difference
  //     between joining 600 B rows and joining a few thousand) — a plain
  //     map-side-combinable aggregate.
  //  2. BIN REPLICATION: each [o_orderdate, +7d) interval replicates to the
  //     ≤2 fixed 8-day bins it can overlap, points bin uniquely, and the
  //     join is a hash EQUI-join on the bin key with the between-predicate
  //     as a residual — no BroadcastNestedLoop, no cartesian, and no pair
  //     dedup needed (a point's bin is unique).
  // The oracle states the same join declaratively (DuckDB plans an IEJoin).
  private val joinRangeBinned = Op(
    "join_range_binned",
    (s, d) => {
      val binMs = 8L * 86400000L // bin width: interval length + 1 day slack
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          // NTZ parquet timestamps: bin on the UTC-session instant
          expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))").as("oms"))
        .withColumn("bin", explode(array_distinct(array(
          expr(s"oms div ${binMs}L"),
          expr(s"(oms + ${7L * 86400000L}L) div ${binMs}L")))))
        .drop("oms")
      val l = t(s, d, "lineitem")
        .groupBy(col("l_shipdate"),
          expr(s"unix_millis(CAST(l_shipdate AS TIMESTAMP)) div ${binMs}L").as("bin"))
        .agg(count(lit(1)).as("cnt"))
      o.join(l, "bin")
        .where(col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAY"))
        .groupBy("o_orderkey")
        .agg(sum("cnt").as("n_ship"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, count(*) AS n_ship
            FROM orders JOIN lineitem
              ON l_shipdate >= o_orderdate
             AND l_shipdate < o_orderdate + INTERVAL 7 DAY
            GROUP BY o_orderkey ORDER BY o_orderkey"""))

  // Runtime bloom-filter join: Spark's InjectRuntimeFilter builds a bloom
  // filter from the SELECTIVE side's join keys at runtime and semi-filters
  // the big side's shuffle input — at 100 TB this is the difference between
  // shuffling all of lineitem and shuffling the ~20% that can actually match
  // an urgent order. The thresholds are forced on a CLONED session
  // (newSession shares the SparkContext; its SQLConf is private to this op)
  // so the injection never leaks into other keys' plans; broadcast is
  // disabled because a broadcast join already prunes at the hash table and
  // would suppress the filter. PlanSpec pins might_contain in the plan.
  private val joinRuntimeBloom = Op(
    "join_runtime_bloom",
    (s0, d) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "128MB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = t(s, d, "orders").where(col("o_orderpriority") === "1-URGENT")
      t(s, d, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  private val setExcept = Op(
    "set_except",
    (s, d) => t(s, d, "customer")
      .select(col("c_custkey").as("key"))
      .except(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("key")))
      .orderBy("key"),
    Some("""SELECT c_custkey AS key FROM customer
            EXCEPT
            SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
            ORDER BY key"""))

  // Linear-regression aggregates per group (SQL-standard regr_* family —
  // the fit-a-trend step of any metrics pipeline): slope/intercept/R² of
  // extendedprice on quantity per return flag. Like corr/covar these are
  // one-pass sum-of-products aggregates — partial→final, map-side
  // combinable, one shuffle carrying one row per group per task at any
  // scale. 4-dp rounding absorbs sum-order float jitter (the protocol
  // agg_stats_corr established).
  private val aggRegression = Op(
    "agg_regression",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("icept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
              round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
              round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
              round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
              regr_count(l_extendedprice, l_quantity) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // Exact MEDIAN over a trailing value-range window (30 days of a
  // customer's orders): a holistic window aggregate, deliberately on a
  // RANGE frame — the frame is defined by epoch values, so tied timestamps
  // produce identical frame multisets on every engine and run (a ROWS
  // frame over non-unique ordering would not be deterministic). Per-key
  // frames stay bounded by a customer's 30-day order volume, so the
  // holistic evaluation is O(frame) per row regardless of corpus size.
  private val windowMedian = Op(
    "window_median",
    (s, d) => {
      val base = t(s, d, "orders")
        .withColumn("epoch_s", col("o_orderdate").cast("timestamp").cast("long"))
      val w = Window.partitionBy("o_custkey").orderBy(col("epoch_s"))
        .rangeBetween(-30L * 86400, 0)
      base.select(col("o_custkey"), col("o_orderkey"),
        round(percentile(col("o_totalprice"), lit(0.5)).over(w), 4).as("med_30d"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
              round(quantile_cont(o_totalprice, 0.5) OVER w, 4) AS med_30d
            FROM (SELECT *, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s FROM orders)
            WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_s
                         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
            ORDER BY o_custkey, o_orderkey"""))

  // Star-schema fact scan with EVERY dimension broadcast — the canonical
  // warehouse plan shape: lineitem (the fact, 100 TB at scale) joins part,
  // supplier, and nation purely map-side, so the ONLY exchange in the whole
  // query is the final partial→final aggregate. sql_tpch_q5 exercises the
  // mixed shuffle/broadcast shape; this key pins the all-broadcast one —
  // dims scale sublinearly with the fact, and a star query that shuffles
  // the fact once per dim join is the classic 100 TB performance bug.
  // PlanSpec asserts 3 BroadcastHashJoins and exactly one shuffle Exchange.
  private[graft] val joinMultiwayStar = Op(
    "join_multiway_star",
    (s, d) => t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name", "p_brand"),
    Some("""SELECT n_name, p_brand,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                     AS revenue,
                   count(*) AS n_lines
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name, p_brand
            ORDER BY n_name, p_brand"""))

  // Correlated scalar subquery, decorrelated by the optimizer: "orders more
  // than 1.5× their customer's average". Written as the correlated form a
  // user writes; Catalyst rewrites it to ONE aggregate over orders plus an
  // equi-join on o_custkey — per-row subquery re-execution (the naive
  // interpretation, O(n) scans) never appears in the physical plan
  // (PlanSpec pins: an Aggregate and a join, no nested-loop). DuckDB
  // performs the same decorrelation, so both engines run the identical
  // declarative text. The 1.5× threshold comparison is a single multiply
  // of the joined average — no sum-order-sensitive boundary risk beyond
  // the last-ulp of avg, far from any stored 2-dp price.
  private[graft] val subqueryDecorrelate = Op(
    "subquery_decorrelate",
    (s, d) => {
      Seq("orders").foreach(n => t(s, d, n).createOrReplaceTempView(n))
      s.sql("""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
               FROM orders o
               WHERE o.o_totalprice > 1.5 * (
                 SELECT avg(o2.o_totalprice) FROM orders o2
                 WHERE o2.o_custkey = o.o_custkey)
               ORDER BY o.o_orderkey""")
    },
    Some("""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
            FROM orders o
            WHERE o.o_totalprice > 1.5 * (
              SELECT avg(o2.o_totalprice) FROM orders o2
              WHERE o2.o_custkey = o.o_custkey)
            ORDER BY o.o_orderkey"""))

  // Multiple COUNT(DISTINCT ...) in ONE aggregate — Catalyst plans this as
  // an Expand (each input row replicated once per distinct column, tagged
  // by grouping id) feeding a single two-phase aggregate. That's the right
  // trade when the distinct column SET is small and you need the counts
  // together atomically (the Expand's ×3 row blowup rides one exchange);
  // the opposite trade — per-column independent jobs, each reading ONE
  // pruned parquet column — is profile_stats' shape, right when the table
  // is wide and the scans dominate. Both are deliberate, PlanSpec pins the
  // Expand here.
  private val aggMultiDistinct = Op(
    "agg_multi_distinct",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
              CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
              CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
              CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
              CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // Join-strategy HINTS: the same order-lineitem join aggregated under an
  // explicit SHUFFLE_HASH and an explicit MERGE hint — the steering wheel
  // for the cases where Catalyst's size estimate picks wrong at 100 TB
  // (e.g. forcing shuffle-hash when one side is known-small-per-partition
  // but stats say otherwise, or forcing sort-merge to avoid hash-build OOM
  // on a skewed build side). Results are identical by construction — the
  // hint changes the physical strategy only (PlanSpec pins
  // ShuffledHashJoin vs SortMergeJoin per branch); the oracle replays the
  // aggregate once per label.
  private val joinHintedStrategies = Op(
    "join_hinted_strategies",
    (s, d) => {
      // partial-aggregate BEFORE the hinted join (the 100 TB discipline):
      // revenue and line counts collapse to one row per orderkey first, so
      // the forced sort-merge sorts 15 M pre-aggregated rows, not 60 M raw
      // lines (the r14 sf10 probe priced the raw spelling at 206 s).
      val li = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_extendedprice"))).as("rev"),
          count(lit(1)).as("nl"))
      val ord = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      def agg(o: DataFrame, label: String) =
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(sum(col("nl")).as("n"),
            sum(col("rev")).cast("double").as("revenue"))
          .select(lit(label).as("strategy"), col("o_orderpriority"),
            col("n"), col("revenue"))
      agg(ord.hint("shuffle_hash"), "shuffle_hash")
        .unionAll(agg(ord.hint("merge"), "merge"))
        .orderBy("strategy", "o_orderpriority")
    },
    Some("""WITH a AS (
              SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority)
            SELECT 'shuffle_hash' AS strategy, o_orderpriority, n, revenue FROM a
            UNION ALL
            SELECT 'merge' AS strategy, o_orderpriority, n, revenue FROM a
            ORDER BY strategy, o_orderpriority"""))

  val ops: Seq[Op] = Seq(
    aggMultiDistinct, joinHintedStrategies,
    joinMultiwayStar, subqueryDecorrelate,
    scanParquet, scanPruned, sqlEntryQ3, sqlPipeSyntax, fnSqlUdf,
    fnCollation, sqlParameterized, sqlSessionVariables,
    aggRegression, windowMedian,
    projectExpr, filterPred, filterNullSemantics, filterInLike,
    joinInnerBroadcast, joinInnerShuffle, joinLeftOuter, joinRightOuter, joinFullOuter, joinSkewSalted,
    joinLeftSemi, joinLeftAnti, joinCross, joinThetaRange, joinAsof,
    aggHashGroup, aggMultiStats, aggDistinct, aggRollup, aggCube,
    aggGroupingSets, aggCollectSorted, aggSaltedTwophase, aggApproxDistinct,
    windowRank, windowRunning, windowRangeFrame, windowLagLead, windowNtile, windowPercentRank, windowFirstLast, aggBool, aggStats,
    aggPercentile, topkPerGroup,
    sortMulti, limitTopk, setUnionAll, setIntersect, setExcept, setIntersectAll, setExceptAll, aggCountIf,
    sqlTpchQ5, sqlTpchQ10, sqlTpchQ17, sqlTpchQ18, sqlTpchQ1, sqlTpchQ21,
    sqlTpchQ22, sqlTpchQ2, joinRangeBinned, joinRuntimeBloom, joinAsofNearest,
    joinAsofTolerance, joinAsofForward)
}
