package graft.ops

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Spark-4-native SQL surfaces (round-8 additions): the engine features a
  * Flink-SQL user migrating off the reference stack would reach for next —
  * native recursive CTEs (the declarative dual of the hand-rolled iterative
  * loops in [[Curation]]), the VARIANT semi-structured type (the reference's
  * `props` JSON strings become a first-class binary-encoded column), and the
  * Apache DataSketches aggregate family (mergeable sketches, the only
  * aggregation shape that scales to 100 TB rollup lattices).
  *
  * Scale rules follow graft.ops.Ext: shuffle keys are ids (never bodies),
  * per-group state is constant-size (a sketch, a top-k heap), and every
  * iterative construct's per-round cost is one shuffle join.
  */
object SparkNative {

  val all: Seq[QDef] = Seq(
    // Native WITH RECURSIVE (Spark 4's recursive CTE) — the declarative form
    // of multi-hop graph traversal. Same doc→doc·2 synthetic edge rule as
    // q_ext_dedup_clusters, but here the ENGINE drives the fixpoint: each
    // recursion step is planned as one shuffle join against the frontier,
    // exactly the distributed loop Curation.scala hand-writes with IterCkpt.
    // DuckDB runs the identical statement, so the whole recursion is
    // oracle-checked end to end.
    //
    // 100 TB posture: rounds = chain depth (log₂ of the id space here;
    // near-dup chains are shallow in practice); the frontier SHRINKS each
    // round, and the per-round join is id-keyed — no row bodies ever enter
    // the recursion.
    QDef(
      "q_sql_recursive_cte",
      """WITH RECURSIVE chain(seed, node, depth) AS (
        |  SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id BETWEEN 1 AND 8
        |  UNION ALL
        |  SELECT c.seed, d.doc_id, c.depth + 1
        |  FROM chain c JOIN documents d ON d.doc_id = c.node * 2)
        |SELECT seed, count(*) AS n_nodes, max(depth) AS max_depth,
        |       CAST(sum(node) AS BIGINT) AS sum_nodes
        |FROM chain GROUP BY seed ORDER BY seed""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"))
        .createOrReplaceTempView("graft_rec_docs")
      s.sql("""WITH RECURSIVE chain(seed, node, depth) AS (
          SELECT doc_id, doc_id, 0 FROM graft_rec_docs WHERE doc_id BETWEEN 1 AND 8
          UNION ALL
          SELECT c.seed, d.doc_id, c.depth + 1
          FROM chain c JOIN graft_rec_docs d ON d.doc_id = c.node * 2)
        SELECT seed, count(*) AS n_nodes, max(depth) AS max_depth,
               CAST(sum(node) AS BIGINT) AS sum_nodes
        FROM chain GROUP BY seed ORDER BY seed""")
    },

    // VARIANT round-trip: build a nested JSON document from orders columns,
    // parse it into Spark 4's binary VARIANT encoding, and extract typed
    // values back out with variant_get paths (object field, nested field,
    // array index). The oracle is the IDENTITY contract: extraction after
    // encode∘parse must reproduce the source columns bit-for-bit (DuckDB
    // reads the originals directly), which pins both the JSON serialization
    // (shortest-round-trip doubles) and the path semantics.
    //
    // 100 TB posture: VARIANT is a map-only columnar encode — no shuffle;
    // the binary encoding is the scan-friendly replacement for repeated
    // get_json_object string parses of the events.props column.
    QDef(
      "q_fn_variant",
      """SELECT o_orderkey AS k, o_totalprice AS p,
        |       o_orderstatus AS tag0, o_orderpriority AS tag1
        |FROM orders ORDER BY k""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .withColumn("v", parse_json(to_json(struct(
          struct(col("o_orderkey").as("k"), col("o_totalprice").as("p")).as("o"),
          array(col("o_orderstatus"), col("o_orderpriority")).as("tags")))))
        .select(
          expr("variant_get(v, '$.o.k', 'bigint')").as("k"),
          expr("variant_get(v, '$.o.p', 'double')").as("p"),
          expr("variant_get(v, '$.tags[0]', 'string')").as("tag0"),
          expr("variant_get(v, '$.tags[1]', 'string')").as("tag1"))
        .orderBy("k")
    },

    // approx_top_k in its EXACT regime: the space-saving sketch tracks up to
    // maxItemsTracked items exactly — when that capacity exceeds the true
    // distinct count (3 return flags « 10000), the reported counts are the
    // exact frequencies, so the sketch query carries a full DuckDB oracle.
    // The same plan at 100 TB: capacity stays 10000 while rows grow
    // unboundedly — constant state per partition, one partial+final merge,
    // and the answer degrades gracefully (top-k still correct while long-tail
    // counts become approximate) instead of the exact groupBy's unbounded
    // key-space shuffle.
    QDef(
      "q_agg_approx_top_k",
      """SELECT l_returnflag AS flag, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY cnt DESC, flag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .agg(expr("approx_top_k(l_returnflag, 3, 10000)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("flag"), col("e.count").as("cnt"))
        .orderBy(desc("cnt"), col("flag"))
    },

    // ANSI try_* arithmetic — the overflow/invalid-input discipline this
    // round's scale lesson made concrete (q_ext_weighted_sample's Knuth
    // hash overflowed ANSI BIGINT at replica-range ids): under ANSI mode a
    // silent wrap becomes a job-killing exception, and try_multiply/
    // try_divide/try_cast are the per-row escape hatch that turns "poison
    // row kills the 100 TB job" into "poison row yields NULL and is
    // filterable". The oracle pins all three NULL boundaries exactly:
    // DuckDB emulates try_multiply's overflow edge with the division-bound
    // test, try_divide with NULLIF, try_cast with TRY_CAST.
    //
    // Regime note (measured): try_*'s FAILURE path constructs a JVM
    // exception per failing row (~15 µs each) — cheap when poison is rare,
    // pathological when failure is the common case (an all-overflow
    // try_multiply ran 24× the scan). The inputs here keep failures at the
    // realistic ~0.5% poison rate; if failure were the norm, pre-filter
    // with a predicate (rlike / range check) instead of try_*.
    QDef(
      "q_fn_try_arith",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 1030 > 1024
        |       THEN NULL ELSE (o_orderkey % 1030) * 9000000000000000 END AS big_prod,
        |  round(o_totalprice / NULLIF(o_orderkey % 3, 0), 6) AS ratio,
        |  TRY_CAST(CASE WHEN o_orderkey % 997 = 0 THEN o_orderpriority
        |                ELSE CAST(o_orderkey % 100 AS VARCHAR) END AS INTEGER) AS num,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS pri_digit
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"),
          expr("try_multiply(o_orderkey % 1030, 9000000000000000L)").as("big_prod"),
          round(expr("try_divide(o_totalprice, o_orderkey % 3)"), 6).as("ratio"),
          expr("try_cast(CASE WHEN o_orderkey % 997 = 0 THEN o_orderpriority " +
            "ELSE CAST(o_orderkey % 100 AS STRING) END AS INT)").as("num"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("pri_digit"))
        .orderBy("o_orderkey")
    },

    // Apache DataSketches HLL: per-group sketches UNIONed into a global
    // sketch — the mergeable-sketch contract that makes 100 TB distinct
    // counting feasible (pre-aggregate a 16 KB sketch per partition/day,
    // union for any rollup, never re-scan). Declared no-oracle (DuckDB has
    // no DataSketches); SparkNativeSpec pins (a) every estimate within 2% of
    // the exact distinct and (b) the union of the three group sketches
    // agreeing with a direct whole-table sketch — the merge loses nothing.
    QDef.noOracle("q_agg_hll_sketch") { (s, d) =>
      val li = Tables.lineitem(s, d)
      // HLL insertion is idempotent (a duplicate value maxes the same
      // register), so sketching the DEDUPED (flag, key) relation yields the
      // identical sketch for a fraction of the insertions — and the same
      // map-side-combined dedup pass serves the per-flag exact counts, the
      // global exact count, and the sketches: ONE scan, everything
      // downstream |distinct|-bounded. The old shape scanned lineitem twice
      // and ran two separate count-distinct Expands over the raw rows.
      val pairs = li.select(col("l_returnflag").as("scope"),
        col("l_partkey").as("pk")).distinct()
      val perFlag = pairs.groupBy("scope")
        .agg(expr("hll_sketch_agg(pk, 14)").as("sk"),
          count(lit(1)).as("exact_nd"))
      val groups = perFlag.select(col("scope"),
        expr("CAST(hll_sketch_estimate(sk) AS BIGINT)").as("est"),
        col("exact_nd"))
      val allRow = perFlag
        .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk, false)) AS BIGINT)").as("est"))
        .crossJoin(pairs.select("pk").distinct()
          .agg(count(lit(1)).as("exact_nd")))
        .select(lit("ALL").as("scope"), col("est"), col("exact_nd"))
      groups.unionByName(allRow).orderBy("scope")
    },

    // SQL-defined scalar functions (Spark 4 `CREATE FUNCTION … RETURN expr`,
    // the ANSI SQL/PSM surface behind the reference shell's SHOW FUNCTIONS,
    // Readme.md:78): business logic declared ONCE in the catalog and reused
    // across queries. Catalyst inlines the body at resolution, so the plan
    // is identical to writing the expression in place — zero UDF overhead,
    // full codegen, pushdown through the function boundary.
    QDef(
      "q_fn_sql_udf",
      """SELECT o_orderkey,
        |       CAST((CAST(round(o_totalprice * 100) AS BIGINT) * 19 + 50) // 100 AS DOUBLE) / 100 AS vat,
        |       CASE WHEN o_totalprice >= 200000 THEN 'gold'
        |            WHEN o_totalprice >= 50000 THEN 'silver'
        |            ELSE 'bronze' END AS tier
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("sqludf_orders")
      // the 19% VAT in exact integer cents (half-up): `round(p*0.19, 2)`
      // on DOUBLE rounds differently across engines on .xx5 boundaries —
      // the X.cents discipline (Core.scala) applies inside SQL functions too
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_vat(p DOUBLE)
              |RETURNS DOUBLE RETURN
              |CAST((CAST(round(p * 100) AS BIGINT) * 19 + 50) DIV 100 AS DOUBLE) / 100
              |""".stripMargin)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_tier(p DOUBLE)
              |RETURNS STRING RETURN CASE WHEN p >= 200000 THEN 'gold'
              |  WHEN p >= 50000 THEN 'silver' ELSE 'bronze' END""".stripMargin)
      s.sql("""SELECT o_orderkey, graft_vat(o_totalprice) AS vat,
              |       graft_tier(o_totalprice) AS tier
              |FROM sqludf_orders WHERE o_orderkey <= 2000
              |ORDER BY o_orderkey""".stripMargin)
    },

    // SQL-defined TABLE function + LATERAL correlation (Spark 4
    // `CREATE FUNCTION … RETURNS TABLE`): the declarative form of a UDTF —
    // the word-splitter lives in the catalog, the query LATERAL-joins it per
    // row. Planned as generate(explode) inline: one map-side pass, no
    // shuffle beyond the final aggregation, exactly q_udtf_explode_ngrams's
    // shape with zero Scala.
    QDef(
      "q_fn_sql_udtf",
      """SELECT doc_id, count(*) AS n_long
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |      FROM documents WHERE doc_id <= 500) t
        |WHERE length(w) >= 8
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).createOrReplaceTempView("sqludtf_docs")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_long_words(t STRING)
              |RETURNS TABLE(w STRING)
              |RETURN SELECT explode(filter(split(t, ' '), x -> length(x) >= 8))
              |""".stripMargin)
      s.sql("""SELECT d.doc_id, count(*) AS n_long
              |FROM sqludtf_docs d, LATERAL graft_long_words(d.text)
              |WHERE d.doc_id <= 500
              |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)
    }
  )
}
