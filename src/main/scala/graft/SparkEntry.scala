package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.CoreOps._
import graft.pipelines.Pipelines

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each paired (where SQL-expressible) with DuckDB oracle SQL
  * over the same parquet tables.
  *
  * Determinism rules for oracle-compared queries (SURVEY.md §7.3):
  * explicit ORDER BY everywhere, explicit NULLS FIRST/LAST (Spark and
  * DuckDB defaults differ), no current_timestamp in compared output,
  * doubles either exact-decimal-summed or rounded, latest-wins dedup with
  * full tiebreakers instead of bare dropDuplicates.
  */
object SparkEntry {

  /** Flagship (SURVEY.md §7.4): the order-items pipeline end-to-end —
    * scan → validate → split → window-dedup → RI semi-join → agg. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_items_pipeline")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Reference pipelines end-to-end (§3.1) ----
    "q_items_pipeline" -> ((s, dir) =>
      Pipelines.orderItems(s, dir)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_items"))
        .orderBy("l_returnflag")),

    "q_orders_pipeline" -> ((s, dir) =>
      Pipelines.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("sum_total"))
        .orderBy("o_orderstatus")),

    "q_products_pipeline" -> ((s, dir) =>
      Pipelines.products(s, dir)
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")),

    // ---- Individual operators ----
    // W1 latest-wins window dedup (order_glue_job.py:113-116)
    "q_window_dedup" -> ((s, dir) =>
      latestWins(Seq("o_custkey"), "o_orderdate",
        tiebreakers = Seq(col("o_orderkey")))(Tables.load(s, dir, "orders"))
        .select("o_custkey", "o_orderkey", "o_orderstatus")
        .orderBy("o_custkey")),

    // J1 RI semi-join (order_glue_job.py:132-140)
    "q_semi_join" -> ((s, dir) =>
      semiJoin(Seq("p_partkey"),
        Tables.load(s, dir, "lineitem").selectExpr("l_partkey as p_partkey"))(
        Tables.load(s, dir, "part"))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    // K2-internal anti-join (merge emulation core, SURVEY.md §7.3)
    "q_anti_join" -> ((s, dir) =>
      antiJoin(Seq("p_partkey"),
        Tables.load(s, dir, "lineitem").selectExpr("l_partkey as p_partkey"))(
        Tables.load(s, dir, "part"))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    // P4/P5 one-pass valid/reject split, surfaced as A1 one-pass metrics
    "q_valid_counts" -> ((s, dir) =>
      validityCounts(Seq("o_orderkey", "o_custkey", "o_orderdate"))(
        Tables.load(s, dir, "orders")).orderBy("is_valid")),

    // T1 EXCEPT-distinct (order_items_glue_job.py:140)
    "q_except" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      o.except(o.filter(col("o_orderstatus") === "F")).orderBy("o_orderkey")
    }),

    // §2.9 SQL surface: registered views + ORDER BY/LIMIT (deterministic
    // variant of Athena's SELECT * ... LIMIT 10)
    "q_sql_limit" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
               FROM orders ORDER BY o_orderkey LIMIT 10""")
    }),

    // ---- North-star: aggregations (§7.5) ----
    // TPC-H Q1-shaped pricing summary over the full lineitem scan
    "q1_agg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(20,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(20,4)")).cast("double").as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
  )

  def oracleSql: Map[String, String] = Map(
    "q_items_pipeline" ->
      """SELECT l_returnflag, count(*) AS n_items
         FROM (
           SELECT * FROM (
             SELECT *, row_number() OVER (
               PARTITION BY l_orderkey, l_linenumber
               ORDER BY l_shipdate DESC NULLS LAST, l_partkey, l_suppkey) AS rn
             FROM lineitem
             WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
               AND l_shipdate IS NOT NULL) t
           WHERE rn = 1
             AND EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = t.l_orderkey))
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_orders_pipeline" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_total
         FROM (
           SELECT * FROM (
             SELECT *, row_number() OVER (
               PARTITION BY o_orderkey ORDER BY o_orderdate DESC NULLS LAST) AS rn
             FROM orders
             WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
               AND o_orderdate IS NOT NULL) t
           WHERE rn = 1
             AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = t.o_orderkey))
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_products_pipeline" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size
         FROM (
           SELECT * FROM (
             SELECT *, row_number() OVER (
               PARTITION BY p_partkey ORDER BY p_name DESC NULLS LAST) AS rn
             FROM part
             WHERE p_partkey IS NOT NULL AND p_name IS NOT NULL) t
           WHERE rn = 1
             AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = t.p_partkey))
         ORDER BY p_partkey""",

    "q_window_dedup" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus FROM (
           SELECT *, row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate DESC NULLS LAST, o_orderkey) AS rn
           FROM orders) t
         WHERE rn = 1 ORDER BY o_custkey""",

    "q_semi_join" ->
      """SELECT p_partkey, p_name FROM part p
         WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
         ORDER BY p_partkey""",

    "q_anti_join" ->
      """SELECT p_partkey, p_name FROM part p
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
         ORDER BY p_partkey""",

    "q_valid_counts" ->
      """SELECT (o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
                 AND o_orderdate IS NOT NULL) AS is_valid, count(*) AS n
         FROM orders GROUP BY 1 ORDER BY is_valid""",

    "q_except" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         EXCEPT
         SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_orderkey""",

    "q_sql_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         FROM orders ORDER BY o_orderkey LIMIT 10""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
                ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                count(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
  )
}
