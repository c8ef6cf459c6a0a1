package graft.functions

import graft.{Op, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._


/** Scalar function families (SURVEY.md §2C) — one composite query per family,
  * all built from `org.apache.spark.sql.functions` so every expression stays
  * inside whole-stage codegen. Cross-engine typing notes: DuckDB `length`/
  * `year`/`ceil` return BIGINT/DOUBLE where Spark returns INT/LONG — both
  * sides cast explicitly so the driver's schema+hash compare is stable.
  */
object FnFamilies {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private val fnString = Op(
    "fn_string",
    (s, d) => t(s, d, "customer").select(
      col("c_custkey"),
      upper(col("c_name")).as("uname"),
      lower(col("c_mktsegment")).as("lseg"),
      substring(col("c_name"), 1, 8).as("prefix"),
      concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cat"),
      length(col("c_name")).as("len"),
      regexp_replace(col("c_name"), lit("Customer"), lit("Cust")).as("repl"),
      trim(col("c_name")).as("trimmed"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
              substring(c_name, 1, 8) AS prefix,
              concat(c_name, '-', c_mktsegment) AS cat,
              CAST(length(c_name) AS INT) AS len,
              replace(c_name, 'Customer', 'Cust') AS repl,
              trim(c_name) AS trimmed
            FROM customer ORDER BY c_custkey"""))

  private val fnRegex = Op(
    "fn_regex",
    (s, d) => t(s, d, "part").select(
      col("p_partkey"),
      regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
      regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
      col("p_name").rlike("a.*e").as("has_ae"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
              regexp_extract(p_name, '^(\w+)', 1) AS first_word,
              regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
              regexp_matches(p_name, 'a.*e') AS has_ae
            FROM part ORDER BY p_partkey"""))

  private val fnDate = Op(
    "fn_date",
    (s, d) => t(s, d, "orders").select(
      col("o_orderkey"),
      date_trunc("month", col("o_orderdate")).cast("timestamp").as("month_start"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
        .as("days_since"),
      // emit as TIMESTAMP: DATE crosses the oracle's arrow/pandas bridge as
      // datetime.date vs datetime64 and the value-compare flaps (see fn_date
      // note above on cross-engine typing)
      add_months(col("o_orderdate").cast("date"), 3).cast("timestamp").as("plus3m"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
              CAST(year(o_orderdate) AS INT) AS y,
              CAST(month(o_orderdate) AS INT) AS m,
              CAST(day(o_orderdate) AS INT) AS dom,
              CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
              CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m
            FROM orders ORDER BY o_orderkey"""))

  // round() on raw doubles is engine-divergent (Spark rounds the shortest
  // decimal repr, DuckDB the binary value) — round in DECIMAL instead, which
  // is exact and HALF_UP on both engines.
  private val fnMath = Op(
    "fn_math",
    (s, d) => Tables.widen(s, t(s, d, "lineitem"), "l_orderkey").select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double").as("price_r1"),
      abs(col("l_extendedprice").cast("decimal(18,2)") - lit(100).cast("decimal(18,2)"))
        .cast("double").as("abs_diff"),
      ceil(col("l_quantity") / 7.0).cast("long").as("q_ceil"),
      floor(col("l_quantity") / 7.0).cast("long").as("q_floor"),
      (col("l_orderkey") % 7).as("k_mod"),
      pow(lit(2.0), col("l_linenumber")).as("p2"))
      .orderBy("l_orderkey", "l_linenumber", "price_r1", "q_ceil"),
    Some("""SELECT l_orderkey, l_linenumber,
              CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
              CAST(abs(CAST(l_extendedprice AS DECIMAL(18,2)) - 100) AS DOUBLE) AS abs_diff,
              CAST(ceil(l_quantity / 7.0) AS BIGINT) AS q_ceil,
              CAST(floor(l_quantity / 7.0) AS BIGINT) AS q_floor,
              l_orderkey % 7 AS k_mod,
              pow(2.0, l_linenumber) AS p2
            FROM lineitem ORDER BY l_orderkey, l_linenumber, price_r1, q_ceil"""))

  private val fnConditional = Op(
    "fn_conditional",
    (s, d) => t(s, d, "orders").select(
      col("o_orderkey"),
      when(col("o_totalprice") > 200000.0, "big")
        .when(col("o_totalprice") > 100000.0, "mid")
        .otherwise("small").as("bucket"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
      greatest(col("o_totalprice"), lit(150000.0)).as("at_least"),
      least(col("o_totalprice"), lit(150000.0)).as("at_most"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              CASE WHEN o_totalprice > 200000.0 THEN 'big'
                   WHEN o_totalprice > 100000.0 THEN 'mid'
                   ELSE 'small' END AS bucket,
              COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
              greatest(o_totalprice, 150000.0) AS at_least,
              least(o_totalprice, 150000.0) AS at_most
            FROM orders ORDER BY o_orderkey"""))

  // Array HOFs (size / element_at / slice / transform). The sliced prefix is
  // emitted as a comma-joined string of 1e4-scaled ints — raw array<float>
  // output crashes the driver's pandas comparator, and float32→double is
  // exact on both engines so the scaled ints agree bit-for-bit.
  private val fnArray = Op(
    "fn_array",
    (s, d) => t(s, d, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      element_at(col("embedding"), 1).cast("double").as("first_elem"),
      expr("""concat_ws(',', transform(slice(embedding, 1, 3),
                x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)))""")
        .as("head3"))
      .orderBy("vec_id"),
    Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
              CAST(embedding[1] AS DOUBLE) AS first_elem,
              array_to_string(list_transform(embedding[1:3],
                x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)), ',') AS head3
            FROM embeddings ORDER BY vec_id"""))

  private val fnJson = Op(
    "fn_json",
    (s, d) => Tables.widen(s, t(s, d, "events"), "event_id").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k_val"),
      get_json_object(col("props"), "$.missing").as("missing_val"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
              json_extract_string(props, '$.missing') AS missing_val
            FROM events ORDER BY event_id"""))

  // Spark-4 VARIANT path: parse once into the binary variant encoding,
  // extract TYPED values with variant_get (no per-access string re-parse —
  // the difference between JSON-as-string and a columnar semi-structured
  // type at 100 TB). Missing paths yield NULL, surfaced via coalesce.
  private val fnVariant = Op(
    "fn_variant",
    (s, d) => t(s, d, "events").select(
      col("event_id"),
      expr("CAST(variant_get(parse_json(props), '$.k', 'int') AS INT)")
        .as("k_val"),
      expr("""COALESCE(CAST(variant_get(parse_json(props), '$.missing',
                                        'int') AS INT), -1)""")
        .as("miss_val"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              CAST(json_extract(props, '$.k') AS INT) AS k_val,
              COALESCE(CAST(json_extract(props, '$.missing') AS INT), -1)
                AS miss_val
            FROM events ORDER BY event_id"""))

  // Cryptographic digests — content-addressing / dedup keys at scale.
  // (sha1 exists in Spark but not DuckDB, so the family sticks to the
  // engine-portable md5 + sha256.)
  private val fnHash = Op(
    "fn_hash",
    (s, d) => t(s, d, "customer").select(
      col("c_custkey"),
      md5(col("c_name").cast("binary")).as("name_md5"),
      sha2(col("c_name").cast("binary"), 256).as("name_sha256"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, md5(c_name) AS name_md5,
              sha256(c_name) AS name_sha256
            FROM customer ORDER BY c_custkey"""))

  // Ordered string aggregation per group (LISTAGG shape).
  private val aggStringConcat = Op(
    "agg_string_concat",
    (s, d) => t(s, d, "nation")
      .groupBy("n_regionkey")
      .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))
      .orderBy("n_regionkey"),
    Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
            FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  // Pivot with a fixed value list — compiles to one pass of conditional
  // aggregates (the only pivot shape that scales: no second pass to discover
  // columns). Oracle states the same conditional aggregates explicitly.
  private val aggPivot = Op(
    "agg_pivot",
    (s, d) => t(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
              COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
              COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
              COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // DYNAMIC pivot — the column list comes from the data, not the query: a
  // valueless pivot() makes Spark run a distinct-values job at plan time,
  // then compile the same FILTER-per-value aggregate agg_pivot declares
  // statically. Two passes by design (the first is a tiny distinct over one
  // column); the cohort key keeps output rows O(10) at any SF. The oracle
  // pins today's observed domain — if the generator ever grows a type, the
  // column-set check fails loudly rather than silently dropping it.
  private val aggPivotDynamic = Op(
    "agg_pivot_dynamic",
    (s, d) => t(s, d, "events")
      .withColumn("cohort", (col("user_id") % 10).cast("long"))
      .groupBy("cohort")
      .pivot("event_type")
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("cohort"),
    Some("""SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
              COUNT(*) FILTER (event_type = 'click') AS click,
              COUNT(*) FILTER (event_type = 'error') AS error,
              COUNT(*) FILTER (event_type = 'purchase') AS purchase,
              COUNT(*) FILTER (event_type = 'signup') AS signup,
              COUNT(*) FILTER (event_type = 'view') AS view
            FROM events GROUP BY 1 ORDER BY cohort"""))

  // Binary/text encodings (base64, hex, and the decode roundtrip) — the
  // transport-encoding family next to fn_hash's digests. All map-side.
  private val fnEncode = Op(
    "fn_encode",
    (s, d) => t(s, d, "customer").select(
      col("c_custkey"),
      base64(col("c_name").cast("binary")).as("name_b64"),
      hex(col("c_name").cast("binary")).as("name_hex"),
      decode(unbase64(base64(col("c_name").cast("binary"))), "UTF-8")
        .as("roundtrip"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
                   to_base64(encode(c_name)) AS name_b64,
                   hex(c_name) AS name_hex,
                   decode(from_base64(to_base64(encode(c_name)))) AS roundtrip
            FROM customer ORDER BY c_custkey"""))

  // Bitwise operators — partition routing, bloom-filter, and flag-word math.
  private val fnBitwise = Op(
    "fn_bitwise",
    (s, d) => t(s, d, "events").select(
      col("event_id"),
      expr("event_id & 255").as("low_byte"),
      expr("event_id | 4096").as("with_flag"),
      expr("event_id ^ user_id").as("xored"),
      expr("shiftleft(event_id, 2)").as("shl2"),
      expr("shiftright(event_id, 3)").as("shr3"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              event_id & 255 AS low_byte,
              event_id | 4096 AS with_flag,
              xor(event_id, user_id) AS xored,
              event_id << 2 AS shl2,
              event_id >> 3 AS shr3
            FROM events ORDER BY event_id"""))

  // Edit distance — the fuzzy-match primitive for near-dup text keys.
  private val fnLevenshtein = Op(
    "fn_levenshtein",
    (s, d) => t(s, d, "part").select(
      col("p_partkey"),
      levenshtein(col("p_brand"), col("p_type")).as("brand_type_dist"),
      levenshtein(lower(col("p_name")), col("p_name")).as("case_dist"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
              CAST(levenshtein(p_brand, p_type) AS INT) AS brand_type_dist,
              CAST(levenshtein(lower(p_name), p_name) AS INT) AS case_dist
            FROM part ORDER BY p_partkey"""))

  // Argmax/argmin aggregates — deterministic because the ordering key
  // (event_id) is unique within every group.
  private val aggMinMaxBy = Op(
    "agg_min_max_by",
    (s, d) => t(s, d, "events")
      .groupBy("user_id")
      .agg(max_by(col("event_type"), col("event_id")).as("latest_type"),
        min_by(col("value"), col("event_id")).as("first_value"),
        count(lit(1)).as("n"))
      .orderBy("user_id"),
    Some("""SELECT user_id,
              max_by(event_type, event_id) AS latest_type,
              min_by(value, event_id) AS first_value,
              COUNT(*) AS n
            FROM events GROUP BY user_id ORDER BY user_id"""))

  // Struct build + field access. Structs never cross the comparison boundary
  // raw (same pandas-comparator limit as arrays): the struct is emitted as
  // compact JSON — Spark's to_json and DuckDB's to_json(struct_pack(…)) both
  // print {"k":v,…} with no whitespace. Integer/string members only; a
  // double member's shortest-decimal text could diverge between engines.
  private val fnStruct = Op(
    "fn_struct",
    (s, d) => t(s, d, "orders").select(
      col("o_orderkey"),
      to_json(struct(
        col("o_custkey").as("cust"),
        col("o_orderstatus").as("status"))).as("order_js"),
      struct(col("o_orderpriority").as("p"), col("o_orderkey").as("k"))
        .getField("p").as("prio"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              CAST(to_json(struct_pack(cust := o_custkey,
                status := o_orderstatus)) AS VARCHAR) AS order_js,
              o_orderpriority AS prio
            FROM orders ORDER BY o_orderkey"""))

  // Map build + lookup, JSON at the boundary like fn_struct.
  private val fnMap = Op(
    "fn_map",
    (s, d) => t(s, d, "orders").select(
      col("o_orderkey"),
      to_json(map(
        lit("status"), col("o_orderstatus"),
        lit("priority"), col("o_orderpriority"))).as("meta_js"),
      map(lit("status"), col("o_orderstatus"))(lit("status")).as("status_val"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              CAST(json_object('status', o_orderstatus,
                'priority', o_orderpriority) AS VARCHAR) AS meta_js,
              o_orderstatus AS status_val
            FROM orders ORDER BY o_orderkey"""))

  // URL parse + canonicalization — the web-corpus curation primitive (strip
  // tracking params and fragments, lower the host, keep scheme+host+path as
  // the dedup key). The URL column is DERIVED deterministically from the
  // documents table so both engines parse identical strings; the engine
  // side uses Spark's native parse_url (codegen'd), the oracle replays the
  // same fields with anchored regexes — equivalent on these well-formed
  // inputs by construction. Pure map-side at any scale.
  private val fnUrl = Op(
    "fn_url",
    (s, d) => t(s, d, "documents")
      .withColumn("url", concat(lit("https://"), col("source"),
        lit(".example.com/"), col("lang"), lit("/doc-"), col("doc_id"),
        lit("?utm_source=feed&id="), col("doc_id"), lit("#sec1")))
      .select(
        col("doc_id"),
        expr("parse_url(url, 'PROTOCOL')").as("scheme"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'QUERY', 'id')").as("id_param"),
        expr("parse_url(url, 'REF')").as("fragment"),
        concat(expr("parse_url(url, 'PROTOCOL')"), lit("://"),
          lower(expr("parse_url(url, 'HOST')")),
          expr("parse_url(url, 'PATH')")).as("canonical"))
      .orderBy("doc_id"),
    Some("""WITH u AS (
              SELECT doc_id,
                     'https://' || source || '.example.com/' || lang ||
                     '/doc-' || doc_id || '?utm_source=feed&id=' || doc_id ||
                     '#sec1' AS url
              FROM documents)
            SELECT doc_id,
                   regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
                   regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
                   regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
                   regexp_extract(url, '\?([^#]*)', 1) AS query,
                   regexp_extract(url, '[?&]id=([^&#]*)', 1) AS id_param,
                   regexp_extract(url, '#(.*)$', 1) AS fragment,
                   regexp_extract(url, '^([a-z]+)://', 1) || '://' ||
                     lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)) ||
                     regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1)
                     AS canonical
            FROM u ORDER BY doc_id"""))

  // CSV parse (from_csv schema-on-read — the sibling of fn_json's
  // from_json): a delimited line derived from table columns round-trips
  // through a typed parse. Each engine renders AND parses its own line, so
  // the comparison tests parse-render identity (parse(render(x)) = x), not
  // cross-engine string formats. Pure map-side.
  private val fnCsv = Op(
    "fn_csv",
    (s, d) => Tables.widen(s, t(s, d, "lineitem"), "l_orderkey")
      .withColumn("line", concat_ws(";", col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_returnflag")))
      .withColumn("p", from_csv(col("line"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "a BIGINT, b INT, c DOUBLE, d STRING"),
        Map("sep" -> ";")))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.c").as("c"),
        col("p.d").as("d"))
      .orderBy("a", "b", "c", "d"),
    Some("""WITH lines AS (
              SELECT CAST(l_orderkey AS VARCHAR) || ';' ||
                     CAST(l_linenumber AS VARCHAR) || ';' ||
                     CAST(l_quantity AS VARCHAR) || ';' ||
                     l_returnflag AS line
              FROM lineitem),
            p AS (SELECT string_split(line, ';') AS f FROM lines)
            SELECT CAST(f[1] AS BIGINT) AS a, CAST(f[2] AS INT) AS b,
                   CAST(f[3] AS DOUBLE) AS c, f[4] AS d
            FROM p ORDER BY a, b, c, d"""))

  // XML extraction family: XPath scalar extraction (`xpath_string`/`_long`/
  // `_int`/`_double`/`_boolean` — including XPath-side comparison and
  // arithmetic, which evaluate inside the XPath engine, not Catalyst) plus
  // structured `from_xml` parsing with field access. The XML documents are
  // built row-side from supplier columns so the DuckDB oracle can mirror
  // every extraction with regexp_extract over the identically-concatenated
  // string — same construction, two independent parsers, equal values.
  // The xpath_* functions are Hive-interop UDFs (not codegen'd); fine here
  // because the key exercises the function surface, not a hot scan path —
  // bulk XML decode at scale goes through the `scan_xml_roundtrip` source.
  private val fnXml = Op(
    "fn_xml",
    (s, d) => Tables.widen(s, t(s, d, "supplier"), "s_suppkey")
      .select(col("s_suppkey"),
        concat(lit("<s><k>"), col("s_suppkey"), lit("</k><n>"), col("s_name"),
          lit("</n><nk>"), col("s_nationkey"), lit("</nk></s>")).as("xml"))
      .select(
        col("s_suppkey"),
        expr("xpath_long(xml, '/s/k/text()')").as("xk"),
        expr("xpath_string(xml, '/s/n/text()')").as("xn"),
        expr("xpath_int(xml, '/s/nk/text()')").as("xnk"),
        expr("xpath_boolean(xml, '/s/nk > 10')").as("xb"),
        expr("xpath_double(xml, '/s/k div 4')").as("xd"),
        expr("from_xml(xml, 'k BIGINT, n STRING, nk INT').n").as("fxn"))
      .orderBy("s_suppkey"),
    Some("""WITH x AS (
              SELECT s_suppkey,
                     '<s><k>' || s_suppkey || '</k><n>' || s_name ||
                     '</n><nk>' || s_nationkey || '</nk></s>' AS xml
              FROM supplier)
            SELECT s_suppkey,
                   CAST(regexp_extract(xml, '<k>([0-9]+)</k>', 1) AS BIGINT) AS xk,
                   regexp_extract(xml, '<n>(.*)</n>', 1) AS xn,
                   CAST(regexp_extract(xml, '<nk>([0-9]+)</nk>', 1) AS INT) AS xnk,
                   CAST(regexp_extract(xml, '<nk>([0-9]+)</nk>', 1) AS INT) > 10 AS xb,
                   CAST(regexp_extract(xml, '<k>([0-9]+)</k>', 1) AS DOUBLE) / 4 AS xd,
                   regexp_extract(xml, '<n>(.*)</n>', 1) AS fxn
            FROM x ORDER BY s_suppkey"""))

  // ANSI-safe arithmetic (the try_* family): under ANSI mode (Spark 4's
  // default) a div-by-zero / overflow / bad cast THROWS and kills the whole
  // 100 TB job — try_* turns exactly that row's result into NULL and keeps
  // the job alive, which is the production posture for dirty landing-zone
  // data. All codegen'd; the oracle replays each NULL condition as an
  // explicit CASE (DuckDB never throws on these, so the CASE is the
  // semantics, not a workaround). Long.MaxValue multiply/add overflow rows
  // are the canary that try_* really intercepted the ANSI error path.
  private val fnTryArith = Op(
    "fn_try_arith",
    (s, d) => Tables.widen(s, t(s, d, "lineitem"), "l_orderkey").select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      try_divide(col("l_extendedprice"), col("l_quantity") - 17).as("td"),
      // same rarity rule as tc below: overflow rows are 1-in-1000 (an
      // always-overflowing spelling paid the exception cost on EVERY row
      // — 13 s per 600 k rows, measured)
      try_multiply(col("l_orderkey"),
        when(col("l_orderkey") % 1000 === 0, lit(Long.MaxValue))
          .otherwise(lit(2L))).as("tm"),
      try_add(col("l_orderkey"),
        when(col("l_orderkey") % 1000 === 500, lit(9223372036854775800L))
          .otherwise(lit(1000L))).as("ta"),
      try_element_at(array(col("l_quantity"), col("l_extendedprice")),
        col("l_linenumber")).as("te"),
      // failures must be RARE for try_cast to be cheap: Spark's TryEval
      // wraps the ANSI error path, so every failing row pays a Java
      // exception construction (~10 us/row measured — an always-failing
      // spelling cost 20x the whole rest of the query). 1-in-1000 bad
      // rows is the production shape AND exercises both outcomes.
      expr("""try_cast(IF(l_orderkey % 1000 = 0,
                          concat(l_returnflag, l_partkey),
                          CAST(l_partkey AS STRING)) AS INT)""").as("tc"),
      // 12-digit format: partkey tops out at 9 digits even at sf100
      // (2e8·4), so to_number never fails and the oracle's plain CAST is
      // exact at ANY plausible scale — a 9-digit format would have made
      // the engine NULL (and the oracle diverge) past sf ~0.5e3
      expr("try_to_number(cast(l_partkey AS STRING), '999999999999')")
        .cast("long").as("tn"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "td", "tn"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
              CASE WHEN l_quantity = 17 THEN NULL
                   ELSE l_extendedprice / (l_quantity - 17) END AS td,
              CASE WHEN l_orderkey = 0 THEN 0
                   WHEN l_orderkey % 1000 = 0 THEN NULL
                   ELSE l_orderkey * 2 END AS tm,
              CASE WHEN l_orderkey % 1000 = 500 THEN NULL
                   ELSE l_orderkey + 1000 END AS ta,
              CASE WHEN l_linenumber = 1 THEN l_quantity
                   WHEN l_linenumber = 2 THEN l_extendedprice
                   ELSE NULL END AS te,
              TRY_CAST(CASE WHEN l_orderkey % 1000 = 0
                            THEN concat(l_returnflag, l_partkey)
                            ELSE CAST(l_partkey AS VARCHAR) END AS INT) AS tc,
              CAST(l_partkey AS BIGINT) AS tn
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, l_quantity, td, tn"""))

  // Timezone-aware timestamp surface: from/to_utc_timestamp,
  // convert_timezone, make_timestamp — the functions a multi-region event
  // pipeline needs to normalize wall-clock data to instants. All map-side
  // codegen'd expressions; both engines resolve zones from IANA tzdata, so
  // DST transitions agree. Session TZ is pinned UTC (Verify/Bench), which
  // is what makes the naive<->instant round-trips below engine-portable.
  private val fnDatetimeTz = Op(
    "fn_datetime_tz",
    (s, d) => t(s, d, "orders").select(
      col("o_orderkey"),
      col("o_orderdate").cast("timestamp").as("ts0"))
      .select(
        col("o_orderkey"),
        from_utc_timestamp(col("ts0"), "America/New_York").as("ny_wall"),
        to_utc_timestamp(col("ts0"), "Asia/Tokyo").as("tokyo_utc"),
        convert_timezone(lit("UTC"), lit("Europe/Paris"), col("ts0"))
          .as("paris_wall"),
        make_timestamp(year(col("ts0")), month(col("ts0")),
          dayofmonth(col("ts0")), lit(12), lit(30),
          lit(java.math.BigDecimal.valueOf(45))).as("made"),
        hour(from_utc_timestamp(col("ts0"), "America/New_York")).as("ny_hour"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              timezone('America/New_York',
                CAST(CAST(o_orderdate AS TIMESTAMP) AS TIMESTAMPTZ)) AS ny_wall,
              CAST(timezone('Asia/Tokyo',
                CAST(o_orderdate AS TIMESTAMP)) AS TIMESTAMP) AS tokyo_utc,
              timezone('Europe/Paris',
                CAST(CAST(o_orderdate AS TIMESTAMP) AS TIMESTAMPTZ)) AS paris_wall,
              make_timestamp(CAST(year(o_orderdate) AS BIGINT),
                CAST(month(o_orderdate) AS BIGINT),
                CAST(day(o_orderdate) AS BIGINT), 12, 30, 45) AS made,
              CAST(hour(timezone('America/New_York',
                CAST(CAST(o_orderdate AS TIMESTAMP) AS TIMESTAMPTZ))) AS INT)
                AS ny_hour
            FROM orders ORDER BY o_orderkey"""))

  val ops: Seq[Op] = Seq(
    fnString, fnRegex, fnDate, fnMath, fnConditional, fnArray, fnJson,
    fnHash, fnEncode, fnBitwise, fnLevenshtein, aggStringConcat, aggPivot,
    aggPivotDynamic, aggMinMaxBy, fnStruct, fnMap, fnUrl, fnCsv, fnVariant,
    fnXml, fnTryArith, fnDatetimeTz)
}
