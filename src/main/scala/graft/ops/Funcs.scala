package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function family queries (SURVEY.md §2B "Scalar functions"; anchor:
  * the Flink session's built-in function surface, Readme.md:78).
  *
  * Cross-engine parity notes baked into these queries:
  *  - day-of-week: Spark `weekday` (Mon=0)+1 == DuckDB `isodow` (Mon=1).
  *  - `round` on DOUBLE differs at .5 boundaries between engines (binary vs
  *    decimal-string rounding), so rounding happens on exact DECIMAL values or
  *    after transcendentals (where boundaries have measure ~0).
  *  - `ceil/floor` return BIGINT in Spark but DOUBLE in DuckDB → cast.
  *  - Spark `split` == DuckDB `string_split`; Spark `get_json_object` ==
  *    DuckDB `json_extract_string`.
  */
object Funcs {

  val all: Seq[QDef] = Seq(
    QDef(
      "q_fn_string",
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  substring(p_name, 1, 5) AS sub5,
        |  concat(p_brand, '-', p_type) AS cat,
        |  trim(p_type) AS tr,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  array_to_string(string_split(p_name, ' '), '|') AS words,
        |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
        |  (p_name LIKE '%bolt%') AS has_bolt
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      // split() is exercised, but the dumped column is a joined string: the
      // driver's comparator sorts output columns and cannot sort array cells.
      //
      // Derived columns compute AFTER the sort (here and in the sibling
      // map-only queries below): a global orderBy's range exchange runs a
      // sampling pass that executes the child plan a second time to pick
      // partition boundaries, so every expression below the Sort is
      // evaluated twice — and its output bytes cross the exchange. Sorting
      // the raw rows by the UNIQUE key first (p_partkey is the part PK, so
      // the total order is unchanged) and projecting afterwards evaluates
      // each derived column once and shuffles only the raw columns
      // (optimization guide §2.3 "project before the exchange" — the
      // expensive projection moves above it instead).
      Tables.part(s, d)
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey")
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 5).as("sub5"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("cat"),
          trim(col("p_type")).as("tr"),
          length(col("p_name")).as("len"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          array_join(split(col("p_name"), " "), "|").as("words"),
          size(split(col("p_name"), " ")).as("n_words"),
          col("p_name").like("%bolt%").as("has_bolt"))
    },

    QDef(
      "q_fn_date",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(isodow(o_orderdate) AS INTEGER) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          (weekday(col("o_orderdate")) + 1).as("dow"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mon_start"),
          datediff(to_date(lit("2000-01-01")), col("o_orderdate")).as("days_to_y2k"),
          date_add(col("o_orderdate"), 30).as("plus30"))
        .orderBy("o_orderkey")
    },

    QDef(
      "q_fn_math",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS r1,
        |  abs(l_discount - 0.05) AS ab,
        |  CAST(ceil(l_quantity) AS BIGINT) AS ce,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS fl,
        |  round(ln(l_extendedprice), 6) AS lnp,
        |  round(sqrt(l_quantity), 6) AS sq,
        |  round(power(l_quantity, 2), 6) AS pw,
        |  l_orderkey % 7 AS md,
        |  CAST(l_quantity AS DECIMAL(5,1)) AS qdec
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, r1, ab, ce, fl, lnp, sq, pw, md, qdec""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice").cast("decimal(18,2)"), 1).cast("double").as("r1"),
          abs(col("l_discount") - 0.05).as("ab"),
          ceil(col("l_quantity")).as("ce"),
          floor(col("l_tax") * 100).as("fl"),
          round(log(col("l_extendedprice")), 6).as("lnp"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(pow(col("l_quantity"), 2), 6).as("pw"),
          pmod(col("l_orderkey"), lit(7L)).as("md"),
          col("l_quantity").cast("decimal(5,1)").as("qdec"))
        .orderBy("l_orderkey", "l_linenumber", "r1", "ab", "ce", "fl", "lnp",
          "sq", "pw", "md", "qdec")
    },

    QDef(
      "q_fn_case_cast",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'low' END AS band,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("band"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_totalprice").cast("decimal(18,2)").cast("double").as("price_dec"),
          col("o_orderdate").cast("date").cast("string").as("date_str"))
        .orderBy("o_orderkey")
    },

    QDef(
      "q_fn_array",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS h1, embedding[2] AS h2, embedding[3] AS h3,
        |  list_transform(embedding[1:3], x -> x * 2.0::FLOAT)[2] AS scaled2,
        |  list_sort(embedding[1:3])[1] AS sorted_min,
        |  list_sort(embedding[1:3])[3] AS sorted_max,
        |  list_contains(embedding, 0.0::FLOAT) AS has_zero
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      // Arrays are constructed/transformed/sorted but dumped as elements: the
      // driver's comparator sorts output columns and cannot sort array cells.
      // x * 2 is exact in binary fp, so the FLOAT values hash identically.
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("h1"),
          element_at(col("embedding"), 2).as("h2"),
          element_at(col("embedding"), 3).as("h3"),
          expr("transform(slice(embedding, 1, 3), x -> x * float('2.0'))[1]").as("scaled2"),
          element_at(array_sort(slice(col("embedding"), 1, 3)), 1).as("sorted_min"),
          element_at(array_sort(slice(col("embedding"), 1, 3)), 3).as("sorted_max"),
          array_contains(col("embedding"), lit(0.0f)).as("has_zero"))
        .orderBy("vec_id")
    },

    QDef(
      "q_fn_map",
      """SELECT p_partkey,
        |  array_to_string(map_keys(MAP {'brand': p_brand, 'type': p_type}), ',') AS mkeys,
        |  (MAP {'brand': p_brand, 'type': p_type}['brand'])[1] AS bval,
        |  CAST(cardinality(MAP {'brand': p_brand, 'type': p_type}) AS INTEGER) AS msize
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      // map_keys is exercised but dumped joined to a string (driver's
      // comparator cannot sort array cells).
      val m = map_from_arrays(
        array(lit("brand"), lit("type")),
        array(col("p_brand"), col("p_type")))
      Tables.part(s, d)
        .select(col("p_partkey"),
          array_join(map_keys(m), ",").as("mkeys"),
          element_at(m, "brand").as("bval"),
          size(m).as("msize"))
        .orderBy("p_partkey")
    },

    // Spark SQL `^` is XOR while DuckDB `^` is POWER → `xor()` in the oracle.
    QDef(
      "q_fn_bitwise",
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 16 AS bor,
        |  xor(o_orderkey, 7) AS bxor,
        |  o_orderkey << 2 AS shl,
        |  o_orderkey >> 1 AS shr,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS bc
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("o_orderkey & 255").as("band"),
          expr("o_orderkey | 16").as("bor"),
          expr("o_orderkey ^ 7").as("bxor"),
          expr("shiftleft(o_orderkey, 2)").as("shl"),
          expr("shiftright(o_orderkey, 1)").as("shr"),
          bit_count(col("o_orderkey")).as("bc"))
        .orderBy("o_orderkey")
    },

    QDef(
      "q_fn_struct",
      """SELECT p_partkey,
        |  ({'brand': p_brand, 'sz': p_size}).brand || ':' ||
        |    CAST(({'brand': p_brand, 'sz': p_size}).sz AS VARCHAR) AS pinfo_str,
        |  ({'brand': p_brand, 'sz': p_size}).brand AS brand2,
        |  ({'brand': p_brand, 'sz': p_size}).sz + 1 AS sz_plus
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      // The struct is built and field-accessed, but the dumped column is a
      // rendered string (driver's comparator cannot sort struct cells).
      val st = struct(col("p_brand").as("brand"), col("p_size").as("sz"))
      Tables.part(s, d)
        .select(col("p_partkey"),
          concat(st.getField("brand"), lit(":"),
            st.getField("sz").cast("string")).as("pinfo_str"),
          st.getField("brand").as("brand2"),
          (st.getField("sz") + 1).as("sz_plus"))
        .orderBy("p_partkey")
    },

    QDef(
      "q_fn_json",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  json_extract_string(props, '$.k') AS k_str,
        |  (CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50) AS k_high
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      // Parse the JSON ONCE per row (from_json to a typed struct) and derive
      // every output from the struct: three independent extractions over the
      // same document would triple the per-row parse CPU — the repeated-parse
      // anti-pattern (see q_fn_variant). k_str renders from the typed field,
      // value-identical to json_extract_string for integer-valued keys.
      val k = from_json(col("props"), lit("k INT")).getField("k")
      Tables.events(s, d)
        .select(col("event_id"),
          k.as("k_int"),
          k.cast("string").as("k_str"),
          (k >= 50).as("k_high"))
        .orderBy("event_id")
    },

    // URL decomposition (parse_url) — the log/referrer-parsing surface every
    // web-scale corpus pipeline needs (URL host for per-domain dedup and
    // robots filtering, path/query for boilerplate URLs). Spark's parse_url
    // is a codegen'd built-in; DuckDB has no URL parser, so the oracle pins
    // the same components with anchored regexes over the same constructed
    // URL — which also documents the exact grammar being relied on.
    QDef(
      "q_fn_url",
      """WITH u AS (SELECT c_custkey,
        |    'https://mkt-' || lower(c_mktsegment) || '.example.com/cust/' ||
        |      c_custkey || '?nation=' || c_nationkey || '&seg=' ||
        |      lower(c_mktsegment) AS url
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_extract(url, '^([a-z]+)://', 1) AS proto,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '[?&]nation=([^&#]*)', 1) AS nation,
        |  regexp_extract(url, '\?(.*)$', 1) AS query
        |FROM u ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .withColumn("url", concat(lit("https://mkt-"),
          lower(col("c_mktsegment")), lit(".example.com/cust/"),
          col("c_custkey"), lit("?nation="), col("c_nationkey"),
          lit("&seg="), lower(col("c_mktsegment"))))
        .select(col("c_custkey"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("nation")).as("nation"),
          parse_url(col("url"), lit("QUERY")).as("query"))
        .orderBy("c_custkey")
    },
  )
}
