package graft.queries

import graft.{GateQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator battery mirroring the reference's exercised
  * surface (SURVEY.md §2.2–§2.7: projections/filters, joins, aggregations,
  * windows, sorts/limits, set ops, CTEs, subqueries), expressed
  * Spark-first with the DataFrame API where natural and `spark.sql` for
  * CTE/subquery shapes. Every query has a DuckDB oracle.
  *
  * Scale notes (100 TB):
  *  - Filters/projections sit directly over the parquet scan so Catalyst
  *    pushes them into the reader (PushedFilters/ReadSchema).
  *  - Dimension joins (region/nation/customer/supplier/part) broadcast —
  *    dims stay small at any TPC-H SF while fact tables grow, so we hint
  *    `broadcast()` explicitly rather than trusting the size estimator.
  *  - Aggregations are partial (map-side combine) by construction via
  *    groupBy.agg; no driver-side collection anywhere.
  *  - Window queries partition by high-cardinality keys (custkey/suppkey)
  *    so the shuffle distributes evenly; orderings carry unique
  *    tie-breakers so results are deterministic under any parallelism.
  */
object RelationalQueries {

  private def q(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, (s, dir) => { Tables.register(s, dir); f(s, dir) }, Some(oracle))

  val all: Seq[GateQuery] = Seq(
    // ---- scans / projections / filters (SURVEY §2.1–2.2) ----
    q("q01_scan_filter_project",
      """SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag <> 'N'""".stripMargin) {
      (s, _) =>
        s.table("lineitem")
          .filter(col("l_quantity") > 45 && col("l_returnflag") =!= "N")
          .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    },

    // ---- aggregations (SURVEY §2.4) ----
    // TPC-H Q1 shape: the flagship pricing summary.
    q("q02_agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, _) =>
      s.table("lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
    },

    q("q03_count_distinct",
      """SELECT count(*) AS cnt, count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem""".stripMargin) { (s, _) =>
      s.table("lineitem").agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"))
    },

    q("q04_group_having",
      """SELECT l_suppkey, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_suppkey HAVING sum(l_quantity) > 300""".stripMargin) {
      (s, _) =>
        s.table("lineitem")
          .groupBy("l_suppkey")
          .agg(sum("l_quantity").as("sum_qty"))
          .filter(col("sum_qty") > 300)
    },

    q("q05_filter_agg",
      """SELECT l_returnflag, round(avg(l_discount), 6) AS avg_disc,
        |  max(l_extendedprice) AS max_price, min(l_extendedprice) AS min_price
        |FROM lineitem WHERE l_quantity BETWEEN 10 AND 20
        |GROUP BY l_returnflag""".stripMargin) { (s, _) =>
      s.table("lineitem")
        .filter(col("l_quantity").between(10, 20))
        .groupBy("l_returnflag")
        .agg(
          round(avg("l_discount"), 6).as("avg_disc"),
          max("l_extendedprice").as("max_price"),
          min("l_extendedprice").as("min_price"))
    },

    // ---- joins (SURVEY §2.3) ----
    q("q06_join_inner_agg",
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, _) =>
      // customer is a dimension at any SF relative to orders: broadcast it.
      s.table("orders")
        .join(broadcast(s.table("customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
    },

    q("q07_join_left_count",
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin) { (s, _) =>
      s.table("customer")
        .join(s.table("orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
    },

    // TPC-H Q3 shape: 3-way join, filter each side, top-N with tie-break.
    q("q08_join3_topn",
      """SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  CAST(o_orderdate AS DATE) AS orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-06-30'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, _) =>
      s.table("customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .join(s.table("orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(
          s.table("lineitem")
            .filter(col("l_shipdate") > lit("1996-06-30 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("o_orderkey"), col("revenue"), col("o_orderdate").cast("date").as("orderdate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    q("q09_semi_join",
      """SELECT count(*) AS n_cust_with_orders FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)""".stripMargin) { (s, _) =>
      s.table("customer")
        .join(s.table("orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_cust_with_orders"))
    },

    q("q10_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin) { (s, _) =>
      s.table("customer")
        .join(s.table("orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    q("q11_cross_join",
      """SELECT r_name, n_name FROM region CROSS JOIN nation""".stripMargin) { (s, _) =>
      s.table("region").crossJoin(s.table("nation")).select("r_name", "n_name")
    },

    // ---- window functions (SURVEY §2.5) ----
    q("q12_window_topn_per_group",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 2""".stripMargin) { (s, _) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      s.table("orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 2)
    },

    q("q13_window_running_sum",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders""".stripMargin) { (s, _) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      s.table("orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("running_spend"))
    },

    q("q14_window_avg_delta",
      """SELECT c_custkey, c_nationkey,
        |  round(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey), 4) AS bal_delta
        |FROM customer""".stripMargin) { (s, _) =>
      val w = Window.partitionBy("c_nationkey")
      s.table("customer")
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal") - avg("c_acctbal").over(w), 4).as("bal_delta"))
    },

    q("q15_rank_dense_rank",
      """SELECT p_partkey, p_brand,
        |  rank() OVER (ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
        |  dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_rank
        |FROM part""".stripMargin) { (s, _) =>
      s.table("part").select(col("p_partkey"), col("p_brand"),
        rank().over(Window.orderBy(col("p_retailprice").desc, col("p_partkey"))).as("price_rank"),
        dense_rank().over(Window.partitionBy("p_brand").orderBy("p_size")).as("size_rank"))
    },

    q("q16_lag_lead",
      """SELECT user_id, event_id,
        |  round(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 6)
        |    AS delta,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |FROM events""".stripMargin) { (s, _) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      s.table("events").select(col("user_id"), col("event_id"),
        round(col("value") - lag("value", 1).over(w), 6).as("delta"),
        lead("event_type", 1).over(w).as("next_type"))
    },

    // ---- sorts / limits (SURVEY §2.6) ----
    q("q17_sort_limit",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin) {
      (s, _) =>
        // TakeOrderedAndProject at any scale: top-k per partition then merge.
        s.table("lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(25)
    },

    // ---- set ops / distinct / explode (SURVEY §2.7) ----
    q("q18_union_all",
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src FROM supplier""".stripMargin) {
      (s, _) =>
        s.table("customer")
          .select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("src"))
          .unionAll(s.table("supplier")
            .select(col("s_suppkey").as("id"), col("s_name").as("name"), lit("supplier").as("src")))
    },

    q("q19_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""".stripMargin) { (s, _) =>
      s.table("lineitem").select("l_returnflag", "l_linestatus").distinct()
    },

    q("q20_intersect_except",
      """SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier
        |UNION ALL
        |(SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey AS nk FROM supplier)""".stripMargin) {
      (s, _) =>
        val c = s.table("customer").select(col("c_nationkey").as("nk"))
        val sup = s.table("supplier").select(col("s_nationkey").as("nk"))
        c.intersect(sup).unionAll(c.except(sup))
    },

    // UNNEST analog: the reference maps ClickHouse arrayJoin to rows
    // (SURVEY §2.7); Spark-side that is explode().
    q("q21_explode_tokens",
      """SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |FROM documents WHERE doc_id < 50""".stripMargin) { (s, _) =>
      s.table("documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    },

    // ---- CTEs / subqueries (SURVEY §2.7) ----
    GateQuery.sharedSql("q22_cte",
      """WITH cust_orders AS (
        |  SELECT o_custkey, count(*) AS cnt, round(sum(o_totalprice), 2) AS spend
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT c_nationkey, round(avg(cnt), 4) AS avg_orders,
        |  round(sum(spend), 2) AS nation_spend
        |FROM customer JOIN cust_orders ON c_custkey = o_custkey
        |GROUP BY c_nationkey""".stripMargin),

    GateQuery.sharedSql("q23_topn_per_group_cte",
      """WITH ranked AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |SELECT l_suppkey, l_orderkey, l_extendedprice, rn
        |FROM ranked WHERE rn <= 2""".stripMargin),

    GateQuery.sharedSql("q24_subquery_in",
      """SELECT count(*) AS n FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)""".stripMargin),

    GateQuery.sharedSql("q25_scalar_subquery",
      """SELECT count(*) AS n_above FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)""".stripMargin),

    GateQuery.sharedSql("q26_subquery_in_from",
      """SELECT o_orderstatus, round(avg(order_lines), 4) AS avg_lines
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, count(*) AS order_lines
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY o_orderkey, o_orderstatus) t
        |GROUP BY o_orderstatus""".stripMargin),

    // ---- grouping sets (SURVEY §2.4 "free in Spark") ----
    q("q27_rollup",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, _) =>
      s.table("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
    },

    q("q28_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin) { (s, _) =>
      s.table("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
    },

    // ---- scalar function surface (SURVEY §2.8 exercised fns) ----
    q("q29_string_functions",
      """SELECT c_custkey, upper(c_name) AS uname, length(c_name) AS name_len,
        |  concat(c_mktsegment, ':', c_name) AS tagged,
        |  substr(c_name, 1, 8) AS prefix
        |FROM customer""".stripMargin) { (s, _) =>
      s.table("customer").select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).as("name_len"),
        concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"),
        substring(col("c_name"), 1, 8).as("prefix"))
    },

    q("q30_math_functions",
      """SELECT l_orderkey, l_linenumber,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  abs(l_quantity - 25) AS qty_dev,
        |  l_partkey % 10 AS pk_mod,
        |  round(1 / (1 + exp(-l_tax)), 6) AS sigmoid_tax,
        |  round(sqrt(l_extendedprice), 6) AS sqrt_price
        |FROM lineitem WHERE l_orderkey < 400""".stripMargin) { (s, _) =>
      s.table("lineitem").filter(col("l_orderkey") < 400).select(
        col("l_orderkey"), col("l_linenumber"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        (col("l_partkey") % 10).as("pk_mod"),
        round(lit(1) / (lit(1) + exp(-col("l_tax"))), 6).as("sigmoid_tax"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"))
    },

    // Array higher-order functions: the reference ships arrayMap/arrayFilter/
    // arrayExists to ClickHouse (SURVEY §2.8); Spark evaluates them natively
    // via codegen'd HOFs (transform/filter/exists).
    q("q31_array_hof",
      """SELECT vec_id,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  len(list_filter(embedding, x -> x > 0.25)) AS n_big,
        |  round(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'), 6)
        |    AS sq_norm
        |FROM embeddings WHERE vec_id < 200""".stripMargin) { (s, _) =>
      s.table("embeddings").filter(col("vec_id") < 200).select(
        col("vec_id"),
        size(filter(col("embedding"), x => x > lit(0.0f))).as("n_pos"),
        size(filter(col("embedding"), x => x > lit(0.25f))).as("n_big"),
        round(aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x), 6).as("sq_norm"))
    },

    // ---- conditional / case (common OLAP shape) ----
    q("q32_case_conditional_agg",
      """SELECT l_linestatus,
        |  sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS returned_qty,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
        |  round(avg(CASE WHEN l_tax > 0 THEN l_extendedprice END), 4) AS avg_taxed_price
        |FROM lineitem GROUP BY l_linestatus""".stripMargin) { (s, _) =>
      s.table("lineitem").groupBy("l_linestatus").agg(
        sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0)).as("returned_qty"),
        sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_discounted"),
        round(avg(when(col("l_tax") > 0, col("l_extendedprice"))), 4).as("avg_taxed_price"))
    },

    // ---- time-series aggregation over the events stream table ----
    q("q33_time_bucket_agg",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS cnt, round(sum(value), 2) AS total_value
        |FROM events GROUP BY CAST(date_trunc('day', ts) AS DATE), event_type""".stripMargin) {
      (s, _) =>
        s.table("events")
          .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
    },

    q("q34_json_extract",
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type""".stripMargin) { (s, _) =>
      s.table("events").groupBy("event_type").agg(
        count(lit(1)).as("cnt"),
        sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sum_k"))
    },

    // ordered string aggregation (LISTAGG / string_agg analog): built
    // deterministically from collect_set -> sort -> join so both engines
    // agree without relying on aggregation order
    q("q39_string_agg",
      """SELECT n_regionkey, string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n
        |FROM nation GROUP BY n_regionkey""".stripMargin) { (s, _) =>
      s.table("nation")
        .groupBy("n_regionkey")
        .agg(
          array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
    },

    // 5-way dim join through the normalized star (region→nation→customer→
    // orders→lineitem): all dims broadcast; only fact tables shuffle.
    q("q35_star_join",
      """SELECT r_name, n_name, count(*) AS n_lines,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, _) =>
      broadcast(s.table("region"))
        .join(broadcast(s.table("nation")), col("n_regionkey") === col("r_regionkey"))
        .join(s.table("customer"), col("c_nationkey") === col("n_nationkey"))
        .join(s.table("orders"), col("o_custkey") === col("c_custkey"))
        .join(s.table("lineitem"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    },

    // exact percentiles (interpolated + discrete): both engines use the
    // (n-1)*p rank formula over sorted values; l_quantity is
    // integer-valued double, so the interpolation arithmetic is exact and
    // the hashes match without rounding
    q("q43_percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90,
        |  quantile_cont(l_quantity, 0.5) AS med
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, _) =>
      s.table("lineitem").groupBy("l_returnflag").agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.9)).as("p90"),
        median(col("l_quantity")).as("med"))
    },

    // null-handling battery: NULLIF / IFNULL / NVL2 / conditional nulls
    // flowing through aggregation (count skips nulls, count(*) doesn't)
    q("q44_null_handling",
      """SELECT o_orderpriority,
        |  count(*) AS n,
        |  count(nullif(o_orderstatus, o_orderstatus)) AS n_never,
        |  CAST(sum(CASE WHEN o_totalprice > 100000
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  count(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big_via_count,
        |  coalesce(min(nullif(o_orderstatus, 'O')), '~') AS min_nonopen_status
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, _) =>
      s.table("orders").groupBy("o_orderpriority").agg(
        count(lit(1)).as("n"),
        count(nullif(col("o_orderstatus"), col("o_orderstatus"))).as("n_never"),
        sum(when(col("o_totalprice") > 100000, 1).otherwise(0)).as("n_big"),
        count(when(col("o_totalprice") > 100000, 1)).as("n_big_via_count"),
        coalesce(min(nullif(col("o_orderstatus"), lit("O"))), lit("~"))
          .as("min_nonopen_status"))
    },

    // PIVOT: wide conditional aggregation via the DataFrame pivot API
    // (explicit value list -> stable column names; the oracle is the
    // equivalent CASE-per-value aggregation)
    q("q45_pivot",
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_f,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, _) =>
      s.table("lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(coalesce(col("l_quantity"), lit(0.0))), 2))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .select(col("l_returnflag"),
          coalesce(col("qty_f"), lit(0.0)).as("qty_f"),
          coalesce(col("qty_o"), lit(0.0)).as("qty_o"))
    },

    // UNPIVOT / melt: wide -> long via the Dataset unpivot API; oracle =
    // the UNION ALL expansion
    q("q46_unpivot",
      """SELECT l_orderkey, l_linenumber, 'price' AS measure, l_extendedprice AS val
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount', l_discount
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'tax', l_tax
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin) { (s, _) =>
      s.table("lineitem").filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("price"),
          col("l_discount").as("discount"), col("l_tax").as("tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("price"), col("discount"), col("tax")),
          "measure", "val")
    },

    // correlated EXISTS / NOT EXISTS (the subquery shapes q24-q26 don't
    // cover) — shared ANSI text runs verbatim on both engines
    GateQuery.sharedSql("q48_exists_subquery",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'F')""".stripMargin),

    // date/time arithmetic battery over the orders timestamps
    q("q49_date_arithmetic",
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS d30,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS days_to_2026,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders WHERE o_orderkey < 1000""".stripMargin) { (s, _) =>
      val d = to_date(col("o_orderdate"))
      s.table("orders").filter(col("o_orderkey") < 1000).select(
        col("o_orderkey"),
        d.as("d"),
        date_add(d, 30).as("d30"),
        last_day(d).as("eom"),
        datediff(lit("2026-01-01").cast("date"), d).as("days_to_2026"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
    },

    // explicit GROUPING SETS with grouping() markers (rollup/cube are
    // q27/q28; this is the free-form shape) — shared ANSI text
    GateQuery.sharedSql("q50_grouping_sets",
      """SELECT n_regionkey, n_name, count(*) AS n,
        |  CAST(grouping(n_regionkey) AS BIGINT) AS g_r,
        |  CAST(grouping(n_name) AS BIGINT) AS g_n
        |FROM nation
        |GROUP BY GROUPING SETS ((n_regionkey), (n_name), ())""".stripMargin),

    // recursive CTE (Spark 4's UnionLoop): generate a contiguous day
    // series and gap-fill daily event counts with zeros — the ClickHouse
    // `ORDER BY ... WITH FILL` use-case expressed through recursion.
    // SURVEY §2.7 marked this out-of-scope for Spark <4.0; Spark 4.1
    // supports WITH RECURSIVE natively, closing the last coverage row.
    GateQuery.sharedSql("q52_recursive_cte",
      """WITH RECURSIVE days(d) AS (
        |  SELECT DATE '2024-01-01' AS d
        |  UNION ALL
        |  SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM days WHERE d < DATE '2024-02-05'
        |), agg AS (
        |  SELECT CAST(ts AS DATE) AS d, count(event_id) AS n
        |  FROM events GROUP BY CAST(ts AS DATE)
        |)
        |SELECT days.d AS day, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_events
        |FROM days LEFT JOIN agg ON agg.d = days.d""".stripMargin),

    // value-based RANGE window frame: events per user in the trailing
    // hour, on exact integer micros (both engines use standard peer-
    // inclusive RANGE semantics, so ties are deterministic)
    q("q51_range_frame",
      """SELECT user_id, event_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |       RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_last_hour
        |FROM events""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tus")
        .rangeBetween(-3600000000L, 0L)
      s.table("events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_last_hour"))
    }
  )
}
