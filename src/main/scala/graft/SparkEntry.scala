package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import graft.operators.{AsOfJoin, Dedup, EventOps, Graph, Multimodal, RangeJoin, Retrieval, Similarity, Stats}
import graft.ops.CoreOps._
import graft.pipelines.Pipelines
import graft.table.LakeTable

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 plus the north-star extensions (§7.5), each paired (where
  * SQL-expressible) with DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism rules for oracle-compared queries (SURVEY.md §7.3):
  * explicit ORDER BY everywhere, explicit NULLS FIRST/LAST (Spark and
  * DuckDB defaults differ), no current_timestamp in compared output,
  * doubles either exact-decimal-summed or rounded (ranking always on the
  * ROUNDED value so cross-engine ULP noise can't flip ranks), latest-wins
  * dedup with full tiebreakers instead of bare dropDuplicates.
  */
object SparkEntry {

  /** Flagship (SURVEY.md §7.4): the order-items pipeline end-to-end —
    * scan → validate → split → window-dedup → RI semi-join → agg. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_items_pipeline")(spark, "/root/testdata/sf0.001")

  /** Guard for the MV-rewrite queries: fail loudly unless the optimized
    * plan scans ONLY the view's path — so the correctness row proves the
    * rewrite actually fired (a silent fallback to the base would still
    * match the oracle and hide a dead rule). */
  private def assertViewOnlyScan(df: DataFrame, view: LakeTable,
      tag: String): DataFrame = {
    val paths = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    require(paths.nonEmpty && paths.forall(_.contains(view.tablePath)),
      s"$tag: expected the MV rewrite to serve this query from the view " +
        s"at ${view.tablePath}; scanned $paths")
    df
  }

  /** Scoped SQL-conf override: set, build (DataFrame construction analyzes
    * eagerly, so analyzer-time confs are consumed inside the scope),
    * restore the prior value — no leak into later queries on the session. */
  private def withSQLConf[A](s: SparkSession, key: String, value: String)(body: => A): A = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** Pattern set for q_decontaminate — mirrored verbatim in its oracle
    * SQL. Includes a pattern that is a prefix of another ("fast table" /
    * "fast table value") so the automaton's suffix-output links are
    * exercised by the correctness gate. */
  private val decontaminationPatterns = Seq(
    "merge batch", "fast table", "fast table value", "value part",
    "spark order", "scan slow", "hash value", "row fast", "window data")
  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")
  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** Per-order DISTINCT part sets for the co-purchase queries
    * (q_triangles, q_assoc_rules) — ONE lineitem scan + one shuffle;
    * derive counts/pairs from this so the exchange is reused instead of
    * re-scanning per branch. Parts as sorted STRINGS: the pair order
    * (and Graph.triangleCounts' canonicalization) is lexicographic,
    * replayed by the oracles' VARCHAR comparisons. */
  private[graft] def copurchaseSets(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set(col("l_partkey").cast("string")))
        .as("ps"))

  /** Within-order pairs of a sorted set column `ps`, support-counted and
    * pruned — the single definition of the slice(i+2) pair expression
    * and the support threshold both co-purchase queries share. */
  private[graft] def supportPrunedPairs(sets: DataFrame, minSupport: Int): DataFrame =
    sets.select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), " +
          "y -> struct(x AS u, y AS v))))")).as("pr"))
      .groupBy(col("pr.u").as("u"), col("pr.v").as("v"))
      .agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= minSupport)

  /** Apriori-pruned within-order TRIPLE candidates: baskets are first
    * filtered to items that appear in some support-`minSupport` pair
    * (every sub-pair of a frequent triple is frequent, so the filter
    * drops no qualifying triple and adds none — surviving triples are
    * counted over exactly the same baskets), THEN the cubic expansion
    * runs on the shrunken arrays. A large-basket corpus can't go cubic
    * on filler items the pair screen already rejected: candidate count
    * is C(freq-items-in-basket, 3) per basket, not C(|basket|, 3).
    * The item screen is a semi-join (AQE broadcasts the pruned item
    * set when small), not a driver-side collect. */
  private[graft] def aprioriTripleCandidates(sets: DataFrame, minSupport: Int): DataFrame = {
    val freqItems = supportPrunedPairs(sets, minSupport)
      .select(explode(array(col("u"), col("v"))).as("item")).distinct()
    sets.select(col("l_orderkey"), explode(col("ps")).as("item"))
      .join(freqItems, Seq("item"), "left_semi")
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set(col("item"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "flatten(transform(slice(ps, i + 2, size(ps)), (y, j) -> " +
          "transform(slice(ps, i + j + 3, size(ps)), " +
          "z -> struct(x AS a, y AS b, z AS c))))))")).as("t"))
      .select("t.a", "t.b", "t.c")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ================= Reference pipelines end-to-end (§3.1) ===========
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

    // north-star composite: corpus cleaning end-to-end (quality filter →
    // normalized-text dedup → per-language stats), fully oracle-checked
    "q_corpus_pipeline" -> ((s, dir) => Pipelines.corpus(s, dir)),

    // the reference's true input mode end-to-end: header CSV → all-string
    // read → try_cast promotion → reject split (malformed rows routed to
    // the JSON sink) → dedup → RI semi-join. Valid-path output equals the
    // parquet pipeline, which is what the oracle checks.
    "q_csv_pipeline" -> ((s, dir) =>
      Pipelines.ordersFromCsv(s, dir)._1
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("sum_total"))
        .orderBy("o_orderstatus")),

    // S2: the same CSV ingested with a DECLARED schema (typed parsing at
    // the reader, no inference pass); same oracle as the dynamic mode
    "q_csv_declared" -> ((s, dir) =>
      Pipelines.ordersFromCsvDeclared(s, dir)._1
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("sum_total"))
        .orderBy("o_orderstatus")),

    // full job orchestration (reference main + Step Functions routing):
    // all three pipelines with reject sinks, one-pass Observation metrics,
    // RI fallback, and MERGE into lake tables; compared output is the
    // final merged-table state
    "q_orchestrator" -> ((s, dir) => {
      import graft.pipelines.Orchestrator
      val root = s"/tmp/graft_orch/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      Orchestrator.deleteRecursively(root)
      Orchestrator.runAll(s, dir, root)
      def summ(entity: String, keys: Seq[String], keyCol: String) =
        LakeTable(s, root, entity, keys).read
          .agg(count(lit(1)).as("n_rows"), sum(col(keyCol)).as("key_sum"))
          .select(lit(entity).as("entity"), col("n_rows"), col("key_sum"))
      summ("order_items", Seq("l_orderkey", "l_linenumber"), "l_orderkey")
        .unionByName(summ("orders", Seq("o_orderkey"), "o_orderkey"))
        .unionByName(summ("products", Seq("p_partkey"), "p_partkey"))
        .orderBy("entity")
    }),

    // JSON source round-trip (S-surface breadth): typed table → JSON lines
    // → schema-inferred read → aggregate; oracle aggregates the parquet
    // original, so inference + value fidelity are both checked
    "q_json_source" -> ((s, dir) => {
      val path = s"/tmp/graft_fmt/${dir.replaceAll("[^A-Za-z0-9]", "_")}/orders_json"
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite").json(path)
      s.read.json(path)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("sum_total"))
        .orderBy("o_orderstatus")
    }),

    // ORC source round-trip (the other built-in columnar format)
    "q_orc_source" -> ((s, dir) => {
      val path = s"/tmp/graft_fmt/${dir.replaceAll("[^A-Za-z0-9]", "_")}/orders_orc"
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), max(col("o_orderdate")).as("max_date"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("sum_total"))
        .orderBy("o_orderstatus")
    }),

    // ================= Core operators ==================================
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

    // K2-internal anti-join (merge emulation core, SURVEY.md §7.3):
    // parts never ordered at quantity >= 49
    "q_anti_join" -> ((s, dir) =>
      antiJoin(Seq("p_partkey"),
        Tables.load(s, dir, "lineitem").filter(col("l_quantity") >= 49)
          .selectExpr("l_partkey as p_partkey"))(
        Tables.load(s, dir, "part"))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    // K2/K3 — full MERGE upsert through the LakeTable layer (real
    // partitioned-parquet writes + atomic swap), then summarize the
    // merged table. target = keys ≢0 mod 3; source = keys ≡0 mod 2 with
    // doubled totalprice (UPDATE for overlap, INSERT for the rest).
    "q_merge_upsert" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_merge", Seq("o_orderkey"))
      t.create(target)
      t.upsert(source)
      t.read.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("sum_total"))
        .orderBy("o_orderstatus")
    }),

    // K2 three-clause MERGE (Delta's WHEN MATCHED [AND cond] THEN
    // DELETE / UPDATE ALL / WHEN NOT MATCHED INSERT ALL): ONE atomic
    // commit applies updates, inserts, AND matched deletions — batch
    // rows with key ≡0 mod 7 remove their target rows, the rest
    // upsert; delete markers for absent keys are no-ops (SQL DELETE
    // semantics). This is the commit shape the IVM maintainers use for
    // group extinction (no upsert-then-delete crash window). Oracle
    // replays the same three-way merge relationally.
    "q_merge_delete" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_merge_del", Seq("o_orderkey"))
      t.create(target)
      t.upsertWithDelete(batch, col("o_orderkey") % 7 === 0)
      t.read.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("sum_total"))
        .orderBy("o_orderstatus")
    }),

    // K2 time travel through the version-retaining atomic swap: create
    // (vN) → MERGE (vN+1) → read BOTH the current table and the retained
    // pre-merge snapshot via readVersion, contrasted per status. The
    // snapshot is the max of availableVersions AFTER the merge — the
    // version the merge displaced, i.e. this run's own create. (A
    // "second-highest" heuristic instead resolves to the PREVIOUS run's
    // final state once the table dir has accumulated versions — reruns
    // in a long session keep appending — a silent rerun instability the
    // full-suite oracle run caught while targeted fresh-dir runs
    // passed.)
    "q_time_travel" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_time_travel", Seq("o_orderkey"))
      t.create(target)
      t.upsert(source)
      // availableVersions lists retained PRIOR snapshots (current
      // excluded), so its max after the merge is exactly the snapshot
      // the merge displaced — THIS run's create
      val prevV = t.availableVersions.max
      def agg(df: DataFrame, nCol: String, sumCol: String) =
        df.groupBy("o_orderstatus").agg(
          count(lit(1)).as(nCol),
          sum(col("o_totalprice").cast("decimal(20,4)"))
            .cast("double").as(sumCol))
      agg(t.read, "n_cur", "sum_cur")
        .join(agg(t.readVersion(prevV), "n_prev", "sum_prev"),
          Seq("o_orderstatus"))
        .orderBy("o_orderstatus")
    }),

    // K2 partition-pruned MERGE: year-partitioned orders table, source
    // touching a single partition — only that partition is rewritten,
    // untouched ones are hard-linked into the new version (sub-linear in
    // table size; compare its bench time against the full-rewrite
    // q_merge_upsert above).
    "q_merge_upsert_pruned" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
      val source = orders.filter(col("o_year") === 1995 && col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_merge_pruned", Seq("o_orderkey"),
        partitionCols = Seq("o_year"))
      t.create(orders)
      t.upsert(source) // prunePartitions defaults ON for partitioned tables
      t.read.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("sum_total"))
        .orderBy("o_orderstatus")
    }),

    // row-level DML (Delta parity): DELETE low-value F orders, UPDATE the
    // priority of the largest ones, then summarize the final table state
    "q_delete_update" -> ((s, dir) => {
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_dml", Seq("o_orderkey"))
      t.create(Tables.load(s, dir, "orders"))
      t.delete(col("o_orderstatus") === "F" && col("o_totalprice") < 50000)
      t.update(col("o_totalprice") >= 300000,
        Map("o_orderpriority" -> lit("0-REVIEWED")))
      t.read.groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("sum_total"))
        .orderBy("o_orderstatus", "o_orderpriority")
    }),

    // OPTIMIZE ZORDER: table rewritten clustered on the Morton curve of
    // (p_size, p_retailprice); content must be unchanged, which is what
    // the oracle checks (layout is asserted in LakeTableSpec)
    "q_zorder" -> ((s, dir) => {
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "part_z", Seq("p_partkey"))
      t.create(Tables.load(s, dir, "part")
        .select("p_partkey", "p_size", "p_retailprice"))
      t.optimizeZorder("p_size", "p_retailprice")
      t.read.groupBy("p_size")
        .agg(count(lit(1)).as("n"),
          sum(col("p_retailprice").cast("decimal(20,4)")).cast("double").as("sum_price"))
        .orderBy("p_size")
    }),

    // P4/P5 one-pass valid/reject split, surfaced as A1 one-pass metrics
    "q_valid_counts" -> ((s, dir) =>
      validityCounts(Seq("o_orderkey", "o_custkey", "o_orderdate"))(
        Tables.load(s, dir, "orders")).orderBy("is_valid")),

    // T1 EXCEPT-distinct (order_items_glue_job.py:140)
    "q_except" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_orderstatus")
      o.except(o.filter(col("o_orderstatus") === "F")).orderBy("o_orderkey")
    }),

    // set operations: INTERSECT / UNION (T1's siblings)
    "q_intersect" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_totalprice") > 1000).select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    "q_union" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderstatus")
        .unionByName(o.filter(col("o_orderstatus") === "P")
          .select("o_orderkey", "o_orderstatus"))
        .orderBy("o_orderkey")
    }),

    // LATERAL correlated derived table: top-2 orders per nation's
    // customers — the "top-n per key as a join" SQL idiom (decorrelates
    // to a ranked window, no per-row re-execution)
    "q_lateral" -> ((s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
               FROM customer c,
               LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
               WHERE c.c_custkey < 100
               ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
    }),

    // correlated scalar subquery through the SQL surface
    "q_correlated" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey, o_custkey FROM orders o
               WHERE o_totalprice = (SELECT max(i.o_totalprice) FROM orders i
                                     WHERE i.o_custkey = o.o_custkey)
               ORDER BY o_orderkey""")
    }),

    // window with a RANGE frame (peers included on ties)
    "q_range_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 30)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_leq"))
        .orderBy("o_orderkey")
    }),

    // §2.9 SQL surface: registered views + ORDER BY/LIMIT
    "q_sql_limit" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
               FROM orders ORDER BY o_orderkey LIMIT 10""")
    }),

    // §2.9 SQL surface: multi-table join + agg through spark.sql
    "q_sql_join_agg" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT n.n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               COUNT(*) AS n_lines
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name ORDER BY n.n_name""")
    }),

    // S6 local collection → DataFrame, broadcast-joined to a fact
    "q_local_relation" -> ((s, dir) => {
      val ranks = s.createDataFrame(Seq(
        ("1-URGENT", 1), ("2-HIGH", 2), ("3-MEDIUM", 3),
        ("4-NOT SPECIFIED", 4), ("5-LOW", 5))).toDF("o_orderpriority", "prio_rank")
      Tables.load(s, dir, "orders").join(broadcast(ranks), Seq("o_orderpriority"))
        .groupBy("prio_rank").agg(count(lit(1)).as("n_orders"))
        .orderBy("prio_rank")
    }),

    // ================= North-star: aggregations (§7.5) =================
    "q1_agg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(20,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(20,4)")).cast("double").as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_rollup" -> ((s, dir) => {
      // Spark 4.1's DetectAmbiguousSelfJoin false-positives on
      // rollup-after-join (the Expand node re-uses the grouping attrs);
      // the check is a lint, not a semantic guard — disable it ONLY for
      // this query's analysis (withSQLConf restores the previous value).
      withSQLConf(s, "spark.sql.analyzer.failAmbiguousSelfJoin", "false") {
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      val joined = c.select("c_custkey", "c_nationkey", "c_acctbal")
        .join(broadcast(n.select(col("n_nationkey").as("c_nationkey"),
          col("n_name"), col("n_regionkey"))), Seq("c_nationkey"))
        .join(broadcast(r.select(col("r_regionkey").as("n_regionkey"),
          col("r_name"))), Seq("n_regionkey"))
        .select("r_name", "n_name", "c_acctbal")
      joined.rollup(joined("r_name"), joined("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(20,4)")).cast("double").as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      }
    }),

    "q_pivot" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority").pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("o_orderpriority")),

    "q_count_distinct" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // date-part extraction + aggregation
    "q_date_agg" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("sum_total"))
        .orderBy("yr", "mo")),

    // string scalar functions (upper/substring/length) under aggregation
    "q_string_funcs" -> ((s, dir) =>
      docs(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n"),
          min(upper(substring(col("text"), 1, 12))).as("min_prefix"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("source")),

    // exact interpolated percentiles per group
    "q_percentile" -> ((s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
        .orderBy("event_type")),

    // GROUPING SETS through the SQL surface
    "q_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT r_name, n_name, count(*) AS n_cust
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name))
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
    }),

    // analytic window functions: lag + row_number + running sum
    "q_window_analytics" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
          row_number().over(w).as("seq"),
          sum(col("o_totalprice").cast("decimal(20,4)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"))
        .orderBy("o_custkey", "seq")
    }),

    // explode/unnest surface: token explosion + two-level re-aggregation
    "q_explode" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(30)),

    // higher-order-function surface: transform/aggregate/filter over the
    // embedding arrays (the declarative forms the native expressions twin)
    "q_hof" -> ((s, dir) =>
      emb(s, dir).select(
        col("vec_id"),
        round(aggregate(transform(col("embedding"),
          x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x), 4)
          .as("sum_sq"),
        round(array_max(transform(col("embedding"), x => abs(x.cast("double")))), 4)
          .as("max_abs"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"))
        .orderBy("vec_id")),

    // rank-family analytic windows: dense_rank / percent_rank / ntile /
    // cume_dist under one deterministic total order
    "q_rank_funcs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 20)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          dense_rank().over(w).as("dr"),
          round(percent_rank().over(w), 6).as("pr"),
          ntile(4).over(w).as("quartile"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // regex scalar surface: extract / extract_all / replace
    "q_regex_funcs" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        regexp_extract(col("text"), "([A-Za-z]+)", 1).as("first_word"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_nums"),
        length(regexp_replace(col("text"), "[aeiou]", "")).as("n_novowel"))
        .orderBy("doc_id")),

    // HLL sketch, oracle-compared as a BOUND CHECK: the estimate itself is
    // engine-seeded (Spark HLL++ vs DuckDB HLL differ by construction),
    // but the sketch's accuracy contract is relational — the row carries
    // the exact count plus a within-3×rsd flag (rsd defaults to 0.05) the
    // oracle asserts as literal 1, so a broken/drifting sketch turns the
    // row red instead of hiding behind a rows-only check.
    // PROBABILISTIC caveat: rsd is a standard deviation, not a hard
    // guarantee — 3×rsd holds with ~99.7% probability PER GROUP, and the
    // check is deterministic per dataset (HLL++ has no runtime seed), so
    // on a NEW dataset or SF a perfectly healthy sketch can land one
    // group outside the bound and fail persistently there. A red row
    // here on fresh data means "re-derive the bound for that data"
    // before suspecting the sketch; the current testdata's worst group
    // sits well inside 15%
    "q_approx_distinct" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("exact_cust"),
          approx_count_distinct(col("o_custkey")).as("approx_cust"))
        .select(col("o_orderstatus"), col("exact_cust"),
          when(abs(col("approx_cust") - col("exact_cust")) <=
            lit(0.15) * col("exact_cust"), lit(1L)).otherwise(lit(0L))
            .as("within_bound"))
        .orderBy("o_orderstatus")),

    // KMV distinct sketch — the deterministic md5-based k-minimum-values
    // estimator (ScaleOps.kmvDistinct): unlike the engine-seeded HLL row
    // above, a DuckDB replay reproduces it bit-for-bit (hash-green)
    "q_kmv_distinct" -> ((s, dir) =>
      graft.ops.ScaleOps.kmvDistinct(Tables.load(s, dir, "orders"),
        Seq("o_orderstatus"), "o_custkey", k = 64)
        .orderBy("o_orderstatus")),

    // KMV set operations — the mergeability payoff: |A|, |B|, |A∪B|,
    // |A∩B| of two customer cohorts from bottom-64 sketches, exact
    // below k, ρ/k-scaled above it; deterministic md5 chain → hash-green
    "q_kmv_setops" -> ((s, dir) =>
      graft.ops.ScaleOps.kmvSetOps(Tables.load(s, dir, "orders"),
        "o_custkey",
        col("o_orderstatus") === "F", col("o_orderstatus") === "O",
        k = 64)),

    // ================= North-star: text analysis =======================
    "q_text_stats" -> ((s, dir) =>
      docs(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text")).cast("long")).as("sum_tokens"),
          sum(bpeTokenCount(col("text")).cast("long")).as("sum_bpe_tokens"),
          round(avg(col("n_chars")), 4).as("avg_chars"))
        .orderBy("lang")),

    "q_text_quality" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tok"),
        bpeTokenCount(col("text")).as("n_bpe"),
        round(stopwordRatio(col("text")), 6).as("stop_ratio"),
        qualityScore(col("text")).as("quality"),
        fingerprintMd5(col("text")).as("fp"),
        fingerprintNormalized(col("text")).as("fp_norm"))
        .orderBy("doc_id")),

    // array-function surface: sort/slice/contains/distinct over token
    // arrays. Compared output is scalar-only (array_join) — the driver's
    // pandas-based compare can't sort array columns.
    "q_array_ops" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        array_join(slice(array_sort(tokens(col("text"))), 1, 3), " ").as("first3"),
        array_contains(tokens(col("text")), "spark").as("has_spark"),
        size(array_distinct(tokens(col("text")))).as("n_distinct"))
        .orderBy("doc_id")),

    // heavy hitters: Misra–Gries sketch aggregate (exact here because
    // capacity ≥ vocabulary, so the oracle can check it exactly)
    "q_heavy_hitters" -> ((s, dir) =>
      docs(s, dir)
        .agg(graft.functions.SketchAggregates
          .freqItems(tokens(col("text")), 10, 4096).as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.token").as("token"), col("e.cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)),

    // heuristic language ID — deterministic stopword-argmax + CJK ratio,
    // replicated in the DuckDB oracle (ties broken lexicographically in
    // both engines)
    "q_lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), langId(col("text")).as("pred_lang"), col("lang"))
        .orderBy("doc_id")),

    // ================= North-star: deduplication =======================
    "q_dedup_exact" -> ((s, dir) =>
      docs(s, dir).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(fingerprintMd5(col("text"))).as("n_unique"),
        countDistinct(fingerprintNormalized(col("text"))).as("n_unique_norm"))),

    // per-doc content fingerprints — the exact-dedup keys of
    // Dedup.exactByContent / dropExactDuplicates, md5-based so DuckDB
    // replays them exactly (hash-green). The hash-seeded winnowing
    // fingerprint variant stays covered by q_winnow_pairs' exact-Jaccard
    // oracle plus its unit specs (xxhash64 itself is engine-bound).
    "q_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        fingerprintMd5(col("text")).as("fp"),
        fingerprintNormalized(col("text")).as("fp_norm"))
        .orderBy("doc_id")),

    // MinHash+LSH near-dup pairs. The LSH candidate stage is hash-seeded,
    // but the OUTPUT is exact-Jaccard-verified, so it equals the all-pairs
    // result whenever banding recall at the threshold is 1 — which the
    // testdata guarantees (every true pair has j ≥ 0.9; per-pair miss
    // probability at 16 bands is (1-0.9⁴)¹⁶ ≈ 4e-8). Oracle: exact
    // all-pairs Jaccard in DuckDB.
    "q_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.7)
        .orderBy("a_id", "b_id")),

    // incremental near-dup: a new batch (doc_id % 4 == 0) deduped against
    // the standing corpus without re-pairing corpus x corpus — the
    // nightly-ingestion shape; oracle = all-pairs Jaccard restricted to
    // pairs touching the batch
    "q_minhash_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.minhashLshPairsIncremental(
        d.filter(col("doc_id") % 4 =!= 0), d.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", shingleN = 3, k = 64, bands = 16, threshold = 0.7)
        .orderBy("a_id", "b_id")
    }),

    // Persistent CDC-maintained LSH dedup index (table/DedupIndex): the
    // nightly-ingest shape at 100 TB. Unlike q_minhash_incremental, the
    // corpus is NEVER re-shingled — band rows live in a lakehouse table
    // maintained from the documents table's change feed, so each wave
    // costs O(changed docs + touched-bucket candidates). Three ingest
    // waves + a delete wave; the final maintained pairs table must equal
    // the all-pairs Jaccard oracle over the FINAL corpus state (delete
    // included), which is also the batch-recompute equivalence
    // DedupIndexSpec pins through updates.
    "q_dedup_index" -> ((s, dir) => {
      val all = docs(s, dir).select("doc_id", "text")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "didx_docs", Seq("doc_id"),
        changeFeed = true)
      t.drop()
      val di = graft.table.DedupIndex(s, root, "didx")
      t.create(all.filter(col("doc_id") % 3 === 1))
      di.build(t.read, "doc_id", "text")
      var synced = t.version
      t.upsert(all.filter(col("doc_id") % 3 === 2))
      synced = di.maintain(t, "doc_id", "text", synced)
      t.upsert(all.filter(col("doc_id") % 3 === 0))
      t.delete(col("doc_id") % 7 === 3)
      synced = di.maintain(t, "doc_id", "text", synced)
      di.pairs.read.orderBy("a_id", "b_id")
    }),

    // q_dedup_index with the SERVING layout: postingParts maintains the
    // bucket-partitioned postings sidecar (the candidate probe becomes a
    // partition-PRUNED read of the standing index — the plan
    // DedupIndexSpec pins), idParts hash-partitions the packed index
    // so its per-batch merge rewrites only touched id partitions, and
    // docParts hash-partitions the DOCS table itself so the snapshot
    // text fetches (alive-touched + candidate verification) open only
    // the touched ids' bucket partitions — the last O(corpus) term of
    // the maintenance path, pruned. The small-batch/streaming regime of
    // DedupIndex's class-doc analysis; same churn, same oracle — layout
    // must never change answers.
    "q_dedup_index_pruned" -> ((s, dir) => {
      val all = docs(s, dir).select("doc_id", "text")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      // the DOCS table's id-hash layout is owned by the Bucketed handle
      // (every write stamps __db; modulus derived from the FULL corpus
      // count and frozen in meta — DocBuckets.sized drops any previous
      // run's table first so its feed/modulus can't leak in)
      val b = graft.table.DocBuckets.sized(s, root, "pdidx_docs",
        "doc_id", all.count(), all.filter(col("doc_id") % 3 === 1))
      // pairParts: the stale-pair lookup and the pairs merge prune to
      // the batch ids' __ab buckets (symmetric layout — the last
      // O(pairs) terms of a maintain, see DedupIndex's class doc)
      val di = graft.table.DedupIndex(s, root, "pdidx",
        postingParts = 16, idParts = 8, docParts = b.parts, pairParts = 8)
      di.build(b.read, "doc_id", "text")
      val synced = b.version
      b.upsert(all.filter(col("doc_id") % 3 === 2))
      b.upsert(all.filter(col("doc_id") % 3 === 0))
      b.delete(col("doc_id") % 7 === 3)
      // ONE maintain over the whole multi-version span (vs
      // q_dedup_index's per-wave maintains): same final state, same
      // oracle — and the span form is the one the serving layout is
      // for (fewer, batched syncs; the per-wave form is the unpruned
      // twin's job)
      di.maintain(b.table, "doc_id", "text", synced)
      di.currentPairs.orderBy("a_id", "b_id")
    }),

    // Streaming twin of q_dedup_index: the SAME ingest/delete churn, but
    // the index is maintained by subscribing to the documents table's
    // CDC STREAM (foreachBatch over the shared DedupIndex.applyChanges
    // core, batch-id idempotent) — streaming and batch dedup maintenance
    // are one semantics by construction. Identical oracle. Runs the FULL
    // SERVING layouts under the drain (postings sidecar + id-partitioned
    // packed index + bucketed docs table + symmetric pairs layout), like
    // its ANN twin: the exactly-once marker rides the pairs merge, every
    // micro-batch exercises the postings→index→pairs commit ordering and
    // the span tokens, and the layouts must never change answers — which
    // is exactly the property worth benching on the oracle-compared row.
    "q_stream_dedup_index" -> ((s, dir) => {
      val all = docs(s, dir).select("doc_id", "text")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val b = graft.table.DocBuckets.sized(s, root, "sdidx_docs",
        "doc_id", all.count(), all.filter(col("doc_id") % 3 === 1))
      val di = graft.table.DedupIndex(s, root, "sdidx",
        postingParts = 16, idParts = 8, docParts = b.parts, pairParts = 8)
      di.build(b.read, "doc_id", "text")
      b.upsert(all.filter(col("doc_id") % 3 === 2))
      b.upsert(all.filter(col("doc_id") % 3 === 0))
      b.delete(col("doc_id") % 7 === 3)
      // the stream replays the WHOLE recorded feed; events already
      // reflected in the built index re-converge harmlessly because
      // final doc state comes from the snapshot, never the event payload
      graft.streaming.Streams.maintainDedupIndexFromChangeFeed(
        b.readChangeFeedStream, b.table, di, "doc_id", "text")
      di.currentPairs.orderBy("a_id", "b_id")
    }),

    // SimHash near-dup pairs: shingle-feature fingerprint, chunk-bucketed
    // candidates (pigeonhole-EXACT at bands=8/maxHamming=7), exact-Jaccard
    // verified. The MD5-based cross-engine fingerprint makes the row fully
    // oracle-COMPARED: DuckDB recomputes every fingerprint bit-for-bit and
    // replays the definition (hamming <= 7 AND jaccard >= 0.5); the
    // XXH64-seeded production variant stays pinned by RecallSpec
    "q_simhash_pairs" -> ((s, dir) =>
      // uncapped: the oracle IS the relational definition, which the
      // pigeonhole argument only guarantees without the bucket guard
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text",
        crossEngineHash = true, maxBucketSize = Int.MaxValue)
        .orderBy("a_id", "b_id")),

    // winnowing-fingerprint near-dup pairs. Like q_minhash_pairs, the
    // candidate stage is hash-seeded but the output is exact-Jaccard-
    // verified; near-identical docs always share winnowed prints, so the
    // output equals the all-pairs result (same oracle).
    "q_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowingPairs(docs(s, dir), "doc_id", "text", threshold = 0.7)
        .select("a_id", "b_id", "jaccard")
        .orderBy("a_id", "b_id")),

    // Exact substring-level dedup (Lee et al. 2022): maximal character
    // spans covered by a 30-gram occurring in >= 2 distinct docs. The
    // rolling-hash anchor stage is seeded, but every candidate is
    // re-verified against the real gram text, so the output is the
    // exact definition — the oracle recomputes it from substrings
    // directly, no hashes involved.
    "q_dup_spans" -> ((s, dir) =>
      Dedup.duplicateSpans(docs(s, dir), "doc_id", "text", minLen = 30)
        .orderBy("doc_id", "span_start")),

    // Per-doc duplicated-character budget from the spans: the readout
    // that drives span-level filtering thresholds.
    "q_dup_coverage" -> ((s, dir) =>
      Dedup.duplicateSpanCoverage(docs(s, dir), "doc_id", "text", minLen = 30)
        .orderBy("doc_id")),

    // Span-level decontamination: corpus spans verbatim-shared (>= 30
    // chars) with a held-out "benchmark" slice (doc_id % 17 == 0).
    "q_contam_spans" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminatedSpans(
        d.filter(col("doc_id") % 17 =!= 0), d.filter(col("doc_id") % 17 === 0),
        "doc_id", "text", minLen = 30)
        .orderBy("doc_id", "span_start")
    }),

    // Intra-doc repetition spans: regions covered by a 15-gram occurring
    // at least twice within the SAME doc — the looping/degenerate-text
    // detector.
    "q_self_repeat" -> ((s, dir) =>
      Dedup.selfRepetitionSpans(docs(s, dir), "doc_id", "text", minLen = 15)
        .orderBy("doc_id", "span_start")),

    // The ACTION step: boilerplate strip — every duplicated span cut
    // from every doc (content appearing in >= 2 docs is template
    // residue under this policy). Oracle reconstructs each cleaned text
    // from the gap segments.
    "q_excise_spans" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.exciseSpans(d,
        Dedup.duplicateSpans(d, "doc_id", "text", minLen = 30),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Lee et al.'s actual dedup action — KEEP ONE: each duplicated
    // gram survives in its owner (min doc id) and is cut everywhere
    // else, so the corpus keeps exactly one copy of each passage.
    "q_excise_keep_one" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.exciseSpans(d,
        Dedup.keepOneSpans(d, "doc_id", "text", minLen = 30),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    // connected components over the near-dup pair graph: each doc labeled
    // with the min id reachable through pairs (dedup families — pairwise
    // similarity is not transitive, dedup decisions must be). Pairs come
    // from the exact-verified MinHash path; oracle recomputes the closure
    // with a recursive CTE.
    "q_dedup_families" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.7)
      Dedup.dedupFamilies(d.select("doc_id"), pairs, "doc_id")
        .orderBy("doc_id")
    }),

    // survivor selection: per dedup family keep the highest-quality doc
    // (min id tiebreak) — families from the exact-verified MinHash pairs,
    // quality rounded identically in both engines
    "q_family_survivors" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.7)
      val fams = Dedup.dedupFamilies(d.select("doc_id"), pairs, "doc_id")
      Dedup.keepBestPerFamily(
        d.select(col("doc_id"), qualityScore(col("text")).as("quality")),
        "doc_id", "quality", fams)
        .select("doc_id", "family", "quality")
        .orderBy("doc_id")
    }),

    // per-user feature aggregation (sequence-modeling prep): activity
    // counts, span, exact-decimal average, max inter-event gap
    "q_user_features" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      events(s, dir)
        .withColumn("gap_ms",
          unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          datediff(to_date(max("ts")), to_date(min("ts"))).as("span_days"),
          round((sum(col("value").cast("decimal(20,4)")) / count(lit(1)))
            .cast("double"), 4).as("avg_value"),
          max("gap_ms").as("max_gap_ms"))
        .orderBy("user_id")
    }),

    // salted skew-join: same result as the plain join (oracle-checked),
    // hot keys split across 8 reducers
    "q_salted_join" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey").as("s_suppkey"), col("l_quantity"))
      val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
      graft.ops.ScaleOps.saltedJoin(li, sup, "s_suppkey", buckets = 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(20,4)")).cast("double").as("sum_qty"))
        .orderBy("s_name")
    }),

    // triangle counting on the co-purchase part graph (parts sharing an
    // order are linked): ordered edge-iterator — wedges by middle-vertex
    // equi-join, closed by a semi-join, each triangle counted once via
    // x<y<z. Edges are SUPPORT-PRUNED to pairs co-purchased ≥2 times —
    // the market-basket sparsification that bounds the wedge count
    // (Σ deg²): the raw singleton graph at sf0.1 has 1.2M edges and
    // hub degrees in the hundreds (a ~30 s wedge explosion); pruning
    // keeps ~3.6k meaningful edges. Canonical order is STRING order
    // (the operator's node-id domain); the oracle replays the same
    // VARCHAR least/greatest.
    "q_triangles" -> ((s, dir) => {
      // pair generation as ONE aggregation (copurchaseSets): collect the
      // order's distinct part set, emit its within-array pairs map-side
      // — replaces the self-join formulation (two scans + two distinct
      // shuffles + broadcast build over 600k rows) with a single groupBy
      // plus the pair-key shuffle
      val pairs = supportPrunedPairs(copurchaseSets(s, dir), 2)
      graft.operators.Graph.triangleCounts(pairs, "u", "v")
        .orderBy(col("n_triangles").desc, col("vertex").asc)
        .limit(50)
    }),

    // 1-hop/2-hop reachability profile over the same support-pruned
    // co-purchase graph as q_triangles (pruning is what bounds the
    // wedge-shaped 2-hop frontier, pinned by GraphSpec)
    "q_two_hop" -> ((s, dir) => {
      val pairs = supportPrunedPairs(copurchaseSets(s, dir), 2)
      graft.operators.Graph.twoHopNeighborhood(pairs, "u", "v")
        .orderBy(col("n_2hop").desc, col("vertex").asc)
        .limit(50)
    }),

    // per-label embedding-norm stats — the vector-column profile
    // (collapsed/exploded embedding detection): norms in sequential
    // double accumulation, rounded, then the decimal-sum mean pattern
    "q_embed_norms" -> ((s, dir) => {
      val n = emb(s, dir).select(col("label"),
        round(graft.functions.VectorFunctions.l2Norm(
          graft.functions.VectorFunctions.toDouble(col("embedding"))), 4)
          .as("norm"))
      n.groupBy("label").agg(
        count(lit(1)).as("n"),
        round(sum(col("norm").cast("decimal(20,4)")).cast("double") /
          count(lit(1)), 4).as("mean_norm"),
        min("norm").as("min_norm"),
        max("norm").as("max_norm"))
        .orderBy("label")
    }),

    // personalized PageRank on the bipartite user–event-type graph,
    // seeded at the purchase node: random-walk-with-restart relevance
    // of every user (and type) to purchasing behavior
    "q_ppr" -> ((s, dir) => {
      val ev = events(s, dir).select(
        concat(lit("u"), col("user_id")).as("src"),
        concat(lit("t_"), col("event_type")).as("dst")).distinct()
      graft.operators.Graph.personalizedPageRank(
        ev, "src", "dst", Seq("t_purchase"), iterations = 3)
        .select(col("node"), round(col("pr"), 6).as("ppr"))
        .orderBy(col("ppr").desc, col("node").asc)
        .limit(20)
    }),

    // frequent triples (Apriori level above q_assoc_rules' pairs) from
    // the SAME copurchaseSets aggregation — Apriori-pruned: baskets are
    // filtered to pair-frequent items BEFORE the cubic within-array
    // expansion (aprioriTripleCandidates), so basket size bounds only
    // the frequent-item part of the expansion, not raw |basket|^3
    "q_itemsets3" -> ((s, dir) =>
      aprioriTripleCandidates(copurchaseSets(s, dir), 2)
        .groupBy("a", "b", "c").agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .orderBy(col("support").desc, col("a").asc, col("b").asc,
          col("c").asc)
        .limit(30)),

    // trending top-k: weekly top-3 parts by shipped quantity — the
    // two-level shape (time-bucket agg, then a bucket-partitioned rank
    // that WindowGroupLimit pushes map-side) behind every "trending
    // now" panel; rank on the exact decimal total with id tiebreak
    "q_trending" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val agg = Tables.load(s, dir, "lineitem")
        .groupBy(date_trunc("week", col("l_shipdate")).as("week"),
          col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(20,4)")).as("qty_dec"))
      val w = Window.partitionBy("week")
        .orderBy(col("qty_dec").desc, col("l_partkey").asc)
      agg.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("week"), col("l_partkey"),
          col("qty_dec").cast("double").as("qty"), col("rn"))
        .orderBy("week", "rn")
    }),

    // market-basket association rules over the same co-purchase pairs
    // as q_triangles: support ≥2 itemset pairs expanded to both rule
    // directions, confidence = sup(ab)/sup(a), lift computed as
    // (sup_ab/sup_a)·(n/sup_b) — two double divisions and a multiply in
    // fixed order, bit-identical on both engines and overflow-free (a
    // raw sup_ab·n Long product would wrap silently at extreme order
    // counts where DuckDB's BIGINT errors) — ranked on the rounded
    // lift with rule tiebreaks
    "q_assoc_rules" -> ((s, dir) => {
      // EVERY input (order count, singleton supports, pair supports)
      // derives from the one copurchaseSets aggregation, so the
      // collect_set exchange is planned once and reused — not four
      // independent lineitem scan branches
      val sets = copurchaseSets(s, dir)
      val nOrders = sets.agg(count(lit(1)).as("n_orders"))
      val singles = sets.select(explode(col("ps")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("sup_single"))
      val pairs = supportPrunedPairs(sets, 2)
      val rules = pairs.select(explode(array(
          struct(col("u").as("antecedent"), col("v").as("consequent"),
            col("sup_ab")),
          struct(col("v").as("antecedent"), col("u").as("consequent"),
            col("sup_ab")))).as("r"))
        .select("r.antecedent", "r.consequent", "r.sup_ab")
      rules
        .join(singles.select(col("p").as("antecedent"),
          col("sup_single").as("sup_a")), Seq("antecedent"))
        .join(singles.select(col("p").as("consequent"),
          col("sup_single").as("sup_b")), Seq("consequent"))
        .crossJoin(broadcast(nOrders))
        .select(col("antecedent"), col("consequent"), col("sup_ab"),
          round(col("sup_ab").cast("double") / col("sup_a"), 4)
            .as("confidence"),
          round((col("sup_ab").cast("double") / col("sup_a")) *
            (col("n_orders").cast("double") / col("sup_b")), 4).as("lift"))
        .orderBy(col("lift").desc, col("antecedent").asc,
          col("consequent").asc)
        .limit(30)
    }),

    // FULL OUTER reconciliation: daily ordered vs shipped revenue with
    // either side possibly absent — the one outer-join flavor the rest
    // of the suite didn't exercise; both sides pre-aggregate to day
    // grain BEFORE the join so the outer join touches ~2.5k rows, not
    // the facts
    "q_full_outer" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(20,4)"))
          .cast("double").as("order_revenue"))
      val l = Tables.load(s, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_extendedprice").cast("decimal(20,4)") *
            (lit(1) - col("l_discount").cast("decimal(20,4)")))
          .cast("double").as("shipped_revenue"))
      o.join(l, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("order_revenue"), lit(0.0)).as("order_revenue"),
          coalesce(col("shipped_revenue"), lit(0.0)).as("shipped_revenue"))
        .orderBy("day")
    }),

    // two-phase salted aggregation (hot-group-key skew guard): partial
    // agg on (key, salt) then merge — decomposable sums make the result
    // EXACTLY the plain groupBy, which is the oracle
    "q_salted_agg" -> ((s, dir) =>
      graft.ops.ScaleOps.saltedAgg(
        Tables.load(s, dir, "lineitem"),
        Seq("l_returnflag"), "l_extendedprice", buckets = 8)
        .orderBy("l_returnflag")),

    // bloom-filter-accelerated semi-join: fact prefiltered by a dim-key
    // bloom before the shuffle, exact semi-join finish — output is
    // EXACTLY the plain semi-join, which is what the oracle checks
    "q_bloom_join" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey").as("s_suppkey"), col("l_quantity"))
      val sup = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") > 5000).select("s_suppkey")
      graft.ops.ScaleOps.bloomSemiJoin(li, sup, "s_suppkey")
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(20,4)")).cast("double").as("sum_qty"))
        .orderBy("s_suppkey")
    }),

    // deterministic consistent sample: 5 docs per language by smallest
    // row hash. The chosen rows are engine-specific (xxhash64), so the
    // oracle checks the invariant part — per-group sampled count =
    // min(5, group size); subset/determinism pinned in ScaleOpsSpec
    "q_consistent_sample" -> ((s, dir) =>
      graft.ops.ScaleOps.consistentSamplePerGroup(
        docs(s, dir), Seq("lang"), Seq("doc_id"), k = 5, seed = 11L)
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")),

    // deterministic per-stratum sampling (training-data rebalancing:
    // downsample over-represented languages) via the replayable Knuth-
    // hash threshold — exact counts cross-engine, so this gets a real
    // oracle; the engine-seeded sampleBy variant stays in the library
    // (ScaleOps.stratifiedSample), pinned by ScaleOpsSpec/PropertySpec.
    "q_stratified_sample" -> ((s, dir) =>
      graft.ops.ScaleOps.hashStratifiedSample(docs(s, dir), "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25))
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")),

    // column profiling (the reference's crawler-statistics step as an
    // engine op): one aggregate over the table → long-format stats
    "q_profile" -> ((s, dir) =>
      graft.ops.ScaleOps.profileColumns(
        Tables.load(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("column_name")),

    // multiset EXCEPT ALL: duplicate-preserving difference (one
    // occurrence removed per matching right row) — contrast q_except's
    // EXCEPT DISTINCT; summarized per key for a deterministic compare
    "q_except_all" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("l_orderkey"))
      li.exceptAll(ord)
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .orderBy("l_orderkey")
    }),

    // multiset INTERSECT ALL: duplicate-preserving intersection
    "q_intersect_all" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("l_orderkey"))
      li.intersectAll(ord)
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        .orderBy("l_orderkey")
    }),

    // bucketed co-located join: both sides written bucketed on the join
    // key (the write-once shuffle), then joined exchange-free — at scale
    // this converts a per-query fact shuffle into a storage layout
    // decision. Same oracle as the plain join; BucketedSpec pins the
    // no-Exchange plan.
    "q_bucketed_join" -> ((s, dir) => {
      import graft.table.Bucketed
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      Bucketed.writeBucketed(
        Tables.load(s, dir, "lineitem")
          .select(col("l_suppkey").as("s_suppkey"), col("l_quantity")),
        s"li_bkt_$sfx", "s_suppkey", buckets = 8)
      Bucketed.writeBucketed(
        Tables.load(s, dir, "supplier").select("s_suppkey", "s_name"),
        s"sup_bkt_$sfx", "s_suppkey", buckets = 8)
      Bucketed.colocatedJoin(s, s"li_bkt_$sfx", s"sup_bkt_$sfx", Seq("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(20,4)")).cast("double").as("sum_qty"))
        .orderBy("s_name")
    }),

    // CDC change feed between table versions (Delta CDF analogue):
    // create target, merge source, read inserts/updates/deletes vs the
    // retained snapshot
    // incremental view maintenance: a per-customer (count, sum) view
    // kept fresh from the base table's CDC feed across an upsert AND a
    // delete batch — O(changes), never a base rescan; the oracle is the
    // full recompute the delta rule must equal
    "q_ivm" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_ivm", Seq("o_orderkey"),
        changeFeed = true) // write-time CDF: maintenance never diffs snapshots
      val v = LakeTable(s, root, "orders_ivm_view", Seq("o_custkey"))
      t.drop(); v.drop() // fresh history per run (rerun stability)
      t.create(target)
      // record the snapshot the view is built from — NOT
      // availableVersions.min, which only coincides with it while
      // retention happens to keep the create version around
      val v0 = t.version
      v.create(graft.table.IncrementalView.sumView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(source)
      t.delete(col("o_orderkey") % 5 === 0)
      graft.table.IncrementalView.maintainSumView(t, v, Seq("o_custkey"),
        "o_totalprice", sinceVersion = v0)
      v.read.select(col("o_custkey"), col("n"),
          col("sum_value").cast("double").as("sum_total"))
        .orderBy("o_custkey")
    }),

    // min/max incremental view maintenance: same CDC batches as q_ivm,
    // but the view also carries per-group extrema — maintained from the
    // insert-side delta when safe and by a per-group base rescan only
    // where a delete removed the current extremum (the textbook IVM
    // caveat, implemented instead of documented). Oracle = the full
    // recompute the maintained view must equal exactly.
    "q_ivm_minmax" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_ivmmm", Seq("o_orderkey"),
        changeFeed = true)
      val v = LakeTable(s, root, "orders_ivmmm_view", Seq("o_custkey"))
      t.drop(); v.drop()
      t.create(target)
      val v0 = t.version
      v.create(graft.table.IncrementalView.minMaxView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(source) // doubles even-key prices: moves many group maxima
      t.delete(col("o_orderkey") % 5 === 0) // deletes extrema + whole groups
      graft.table.IncrementalView.maintainMinMaxView(t, v, Seq("o_custkey"),
        "o_totalprice", sinceVersion = v0)
      v.read.select(col("o_custkey"), col("n"),
          col("sum_value").cast("double").as("sum_total"),
          col("min_value").cast("double").as("min_total"),
          col("max_value").cast("double").as("max_total"))
        .orderBy("o_custkey")
    }),

    // Transparent materialized-view rewrite (plans.MvRewrite — the
    // Calcite/Snowflake MV-substitution pattern as a Catalyst rule):
    // the SAME churn replay as q_ivm_minmax, but the final aggregation
    // is issued against the BASE table and silently served by the
    // maintained view. The lambda asserts by plan inspection that the
    // optimized plan scans ONLY the view path — this correctness row
    // proves the rewrite fired AND that the view it served is exact.
    // At 100 TB this turns a full-corpus shuffle-aggregate into an
    // O(groups) read; freshness is checked per query against the
    // mv.base_version marker the maintainer commits atomically.
    "q_mv_rewrite" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      graft.plans.GraftOptimizations.install(s)
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_mv", Seq("o_orderkey"),
        changeFeed = true)
      val v = LakeTable(s, root, "orders_mv_view", Seq("o_custkey"))
      t.drop(); v.drop()
      t.create(target)
      val v0 = t.version
      v.create(graft.table.IncrementalView.minMaxView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(source)
      t.delete(col("o_orderkey") % 5 === 0)
      graft.table.IncrementalView.maintainMinMaxView(t, v, Seq("o_custkey"),
        "o_totalprice", sinceVersion = v0,
        meta = graft.plans.MvRewrite.syncMeta(t.version))
      graft.plans.MvRewrite.register(t, v, Seq("o_custkey"), "o_totalprice",
        graft.plans.MvRewrite.MinMaxKind)
      val vDec = col("o_totalprice").cast("decimal(20,4)")
      val q = t.read.groupBy("o_custkey").agg(
          count(lit(1)).as("n"),
          sum(vDec).cast("double").as("sum_total"),
          min(vDec).cast("double").as("min_total"),
          max(vDec).cast("double").as("max_total"))
        .orderBy("o_custkey")
      assertViewOnlyScan(q, v, "q_mv_rewrite")
    }),

    // MV roll-up rewrite: the view is keyed FINER than the query
    // (customer x priority vs priority), so the rule re-aggregates the
    // O(groups) view instead of the base — grouping-subset containment,
    // with a key-column filter commuted through the rewrite. Same
    // plan-inspection guarantee as q_mv_rewrite.
    "q_mv_rollup" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      graft.plans.GraftOptimizations.install(s)
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_mvr", Seq("o_orderkey"),
        changeFeed = true)
      val v = LakeTable(s, root, "orders_mvr_view",
        Seq("o_custkey", "o_orderpriority"))
      t.drop(); v.drop()
      t.create(target)
      val v0 = t.version
      v.create(graft.table.IncrementalView.minMaxView(
        t.read, Seq("o_custkey", "o_orderpriority"), "o_totalprice"))
      t.upsert(source)
      t.delete(col("o_orderkey") % 5 === 0)
      graft.table.IncrementalView.maintainMinMaxView(t, v,
        Seq("o_custkey", "o_orderpriority"), "o_totalprice",
        sinceVersion = v0, meta = graft.plans.MvRewrite.syncMeta(t.version))
      graft.plans.MvRewrite.register(t, v,
        Seq("o_custkey", "o_orderpriority"), "o_totalprice",
        graft.plans.MvRewrite.MinMaxKind)
      val vDec = col("o_totalprice").cast("decimal(20,4)")
      val q = t.read.filter(col("o_custkey") % 10 < 5)
        .groupBy("o_orderpriority").agg(
          count(lit(1)).as("n"),
          sum(vDec).cast("double").as("sum_total"),
          min(vDec).cast("double").as("min_total"),
          max(vDec).cast("double").as("max_total"))
        .orderBy("o_orderpriority")
      assertViewOnlyScan(q, v, "q_mv_rollup")
    }),

    // MV rewrite serving COUNT(DISTINCT): the aux-backed full-stats
    // view materializes the exact per-group distinct count, so the
    // most expensive aggregate at scale (distinct forces a second
    // shuffle on (group, value)) becomes a view-column read. Note the
    // fullStats (18,4) value space — the rewrite is value-space-strict
    // per kind. Plan-asserted view-only scan.
    "q_mv_distinct" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      graft.plans.GraftOptimizations.install(s)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_mvd", Seq("o_orderkey"),
        changeFeed = true)
      val aux = LakeTable(s, root, "orders_mvd_aux",
        Seq("o_custkey", "__v"))
      val v = LakeTable(s, root, "orders_mvd_view", Seq("o_custkey"))
      t.drop(); aux.drop(); v.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      val v0 = t.version
      graft.table.IncrementalView.createFullStatsAux(aux,
        t.read, Seq("o_custkey"), "o_totalprice")
      v.create(graft.table.IncrementalView.fullStatsView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      t.delete(col("o_orderkey") % 5 === 0)
      graft.table.IncrementalView.maintainFullStatsView(t, aux, v,
        Seq("o_custkey"), "o_totalprice", sinceVersion = v0,
        meta = graft.plans.MvRewrite.syncMeta(t.version))
      graft.plans.MvRewrite.register(t, v, Seq("o_custkey"),
        "o_totalprice", graft.plans.MvRewrite.FullStatsKind)
      val vDec = col("o_totalprice").cast("decimal(18,4)")
      val q = t.read.groupBy("o_custkey").agg(
          count(lit(1)).as("n"),
          countDistinct(vDec).as("n_distinct"),
          sum(vDec).cast("double").as("sum_total"),
          min(vDec).cast("double").as("min_total"),
          max(vDec).cast("double").as("max_total"))
        .orderBy("o_custkey")
      assertViewOnlyScan(q, v, "q_mv_distinct")
    }),

    // MV-rewrite avg()/count(col) serving — avg is THE most common user
    // aggregate, and the one a (sum, n) view CANNOT serve: Average's
    // count buffer counts NON-NULL values, so the fullStats view's
    // n_nonnull column is what makes the substitution correct on
    // null-bearing groups. The churn deliberately writes NULL prices
    // into surviving groups to exercise exactly that case. The rewrite
    // reuses Average's own evaluateExpression over the view columns
    // (bit-identical decimal division chain); the oracle replicates it
    // with exact integer half-up arithmetic — no float rounding on
    // either side. Plan-asserted view-only scan, like q_mv_rewrite.
    "q_mv_avg" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      graft.plans.GraftOptimizations.install(s)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_mva", Seq("o_orderkey"),
        changeFeed = true)
      val aux = LakeTable(s, root, "orders_mva_aux", Seq("o_custkey", "__v"))
      val v = LakeTable(s, root, "orders_mva_view", Seq("o_custkey"))
      t.drop(); aux.drop(); v.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      val v0 = t.version
      graft.table.IncrementalView.createFullStatsAux(aux,
        t.read, Seq("o_custkey"), "o_totalprice")
      v.create(graft.table.IncrementalView.fullStatsView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 1, lit(null).cast("double"))
            .otherwise(col("o_totalprice") * 2)))
      t.delete(col("o_orderkey") % 5 === 0)
      graft.table.IncrementalView.maintainFullStatsView(t, aux, v,
        Seq("o_custkey"), "o_totalprice", sinceVersion = v0,
        meta = graft.plans.MvRewrite.syncMeta(t.version))
      graft.plans.MvRewrite.register(t, v, Seq("o_custkey"),
        "o_totalprice", graft.plans.MvRewrite.FullStatsKind)
      val vDec = col("o_totalprice").cast("decimal(18,4)")
      val q = t.read.groupBy("o_custkey").agg(
          count(lit(1)).as("n"),
          count(vDec).as("n_vals"),
          avg(vDec).cast("double").as("avg_total"),
          sum(vDec).cast("double").as("sum_total"))
        .orderBy("o_custkey")
      assertViewOnlyScan(q, v, "q_mv_avg")
    }),

    // MV-rewrite serving UNCAST double aggregates — `avg(price)` with
    // no cast is the first query a real user writes, and the strict
    // value-space rule alone would never serve it. The registration's
    // serveDouble flag (MvRewrite class doc) asserts the price column
    // is exact in the view's (18,4) space (2-dp currency — true here),
    // under which sum/avg/min/max/count(price) are served with
    // decimal-exact accumulation and ONE final cast to double. The
    // oracle replays that contract in exact integer arithmetic; the
    // same null-bearing churn as q_mv_avg exercises Average's non-null
    // count and the null-sum groups. Plan-asserted view-only scan.
    "q_mv_avg_double" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      graft.plans.GraftOptimizations.install(s)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_mvad", Seq("o_orderkey"),
        changeFeed = true)
      val aux = LakeTable(s, root, "orders_mvad_aux", Seq("o_custkey", "__v"))
      val v = LakeTable(s, root, "orders_mvad_view", Seq("o_custkey"))
      t.drop(); aux.drop(); v.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      val v0 = t.version
      graft.table.IncrementalView.createFullStatsAux(aux,
        t.read, Seq("o_custkey"), "o_totalprice")
      v.create(graft.table.IncrementalView.fullStatsView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 1, lit(null).cast("double"))
            .otherwise(col("o_totalprice") * 2)))
      t.delete(col("o_orderkey") % 5 === 0)
      graft.table.IncrementalView.maintainFullStatsView(t, aux, v,
        Seq("o_custkey"), "o_totalprice", sinceVersion = v0,
        meta = graft.plans.MvRewrite.syncMeta(t.version))
      graft.plans.MvRewrite.register(t, v, Seq("o_custkey"),
        "o_totalprice", graft.plans.MvRewrite.FullStatsKind,
        serveDouble = true)
      val q = t.read.groupBy("o_custkey").agg(
          count(col("o_totalprice")).as("n_vals"),
          avg(col("o_totalprice")).as("avg_total"),
          sum(col("o_totalprice")).as("sum_total"),
          min(col("o_totalprice")).as("min_total"),
          max(col("o_totalprice")).as("max_total"))
        .orderBy("o_custkey")
      assertViewOnlyScan(q, v, "q_mv_avg_double")
    }),

    // MV rewrite over a JOIN: the aggregate-over-join query (the two
    // most expensive operators in a 100 TB plan) is served by the
    // maintained joinSumView — same churn replay as q_ivm_join on BOTH
    // sides, the rewrite fires only because the view's two-version
    // freshness marker (mv.fact_version/mv.dim_version) matches both
    // scanned snapshots. Plan-asserted view-only scan, like q_mv_rewrite.
    "q_mv_join_rewrite" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
      graft.plans.GraftOptimizations.install(s)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val f = LakeTable(s, root, "mvj_fact", Seq("o_orderkey"),
        changeFeed = true)
      val d = LakeTable(s, root, "mvj_dim", Seq("o_custkey"),
        changeFeed = true)
      val vw = LakeTable(s, root, "mvj_view", Seq("c_mktsegment"))
      f.drop(); d.drop(); vw.drop()
      f.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      d.create(customer)
      val (f0, d0) = (f.version, d.version)
      vw.create(graft.table.IncrementalView.joinSumView(f.read, d.read,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice"))
      f.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      f.delete(col("o_orderkey") % 5 === 0)
      d.update(col("o_custkey") % 7 === 0,
        Map("c_mktsegment" -> lit("MOVED")))
      d.delete(col("o_custkey") % 11 === 0)
      graft.table.IncrementalView.maintainJoinSumView(f, d, vw,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice", f0, d0,
        meta = graft.plans.MvRewrite.joinSyncMeta(f.version, d.version))
      graft.plans.MvRewrite.registerJoin(f, d, vw, Seq("o_custkey"),
        Seq("c_mktsegment"), "o_totalprice")
      val q = f.read.join(d.read, Seq("o_custkey"))
        .groupBy("c_mktsegment").agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,4)"))
            .cast("double").as("sum_total"))
        .orderBy("c_mktsegment")
      assertViewOnlyScan(q, vw, "q_mv_join_rewrite")
    }),

    // COUNT DISTINCT incremental view maintenance (two-level /
    // support-relation IVM): per-customer distinct order priorities,
    // kept fresh through the same upsert+delete CDC batches via a
    // per-(customer, priority) multiplicity table whose 0↔positive
    // transitions roll up into the distinct count — O(changes) at
    // both levels. Oracle = the full count(DISTINCT) recompute.
    "q_ivm_distinct" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "orders_ivmd", Seq("o_orderkey"),
        changeFeed = true)
      val aux = graft.table.LakeTable(s, root, "orders_ivmd_aux",
        Seq("o_custkey", "__v"))
      val vw = graft.table.LakeTable(s, root, "orders_ivmd_view",
        Seq("o_custkey"))
      t.drop(); aux.drop(); vw.drop()
      t.create(target)
      val v0 = t.version
      aux.create(graft.table.IncrementalView.supportView(
        t.read, Seq("o_custkey"), "o_orderpriority"))
      vw.create(graft.table.IncrementalView.distinctView(
        t.read, Seq("o_custkey"), "o_orderpriority"))
      t.upsert(source)
      t.delete(col("o_orderkey") % 5 === 0)
      graft.table.IncrementalView.maintainDistinctView(t, aux, vw,
        Seq("o_custkey"), "o_orderpriority", sinceVersion = v0)
      vw.read.select(col("o_custkey"), col("n_distinct"))
        .orderBy("o_custkey")
    }),

    // MOMENTS IVM: (n, sum, sum of squares) maintained through the
    // same churn as q_ivm — variance derives in closed form at read
    // time with NO rescan ever (the second moment is self-maintainable,
    // unlike min/max). Oracle recomputes var_pop from the same exact
    // decimal sums.
    "q_ivm_moments" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "orders_ivmm", Seq("o_orderkey"),
        changeFeed = true)
      val v = graft.table.LakeTable(s, root, "orders_ivmm_view",
        Seq("o_custkey"))
      t.drop(); v.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      val v0 = t.version
      v.create(graft.table.IncrementalView.momentsView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      t.delete(col("o_orderkey") % 5 === 0)
      graft.table.IncrementalView.maintainMomentsView(t, v,
        Seq("o_custkey"), "o_totalprice", sinceVersion = v0)
      // the maintained MOMENT STATE is the pinned output: exact decimals
      // compare with no doubles at all (a var derivation in doubles
      // would ride the >17-digit decimal->double conversion, whose
      // last-ulp rounding differs across engines); the mean's sum is
      // well inside double precision. sum_sq is emitted as its exact
      // STRING rendering — a raw DecimalType output column is the one
      // representation the driver's hasher normalizes differently
      // between a Spark parquet decimal and a DuckDB decimal (round-9's
      // only red row: values bit-exact, hash mismatched), and both
      // engines render a scale-8 decimal ≥ 1 as the identical plain
      // "123.45600000" form
      v.read.select(col("o_custkey"), col("n"),
          round(col("sum_value").cast("double") / col("n"), 6)
            .as("mean_total"),
          col("sum_sq").cast("string").as("sum_sq"))
        .orderBy("o_custkey")
    }),

    // FUSED stats IVM: (n, Σv, min, max, Σv²) maintained from ONE read
    // of the change feed — raw signed events feed the moments, netted
    // per-(group, value) weights feed the extrema, threatened groups
    // rescan, one atomic merge (vs three separate maintainer passes).
    // Oracle = the full statsView recompute over the replayed state.
    "q_ivm_stats" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "orders_ivmst", Seq("o_orderkey"),
        changeFeed = true)
      val v = graft.table.LakeTable(s, root, "orders_ivmst_view",
        Seq("o_custkey"))
      t.drop(); v.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      val v0 = t.version
      v.create(graft.table.IncrementalView.statsView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      t.delete(col("o_orderkey") % 5 === 0)
      graft.table.IncrementalView.maintainStatsView(t, v,
        Seq("o_custkey"), "o_totalprice", sinceVersion = v0)
      // sums/extrema are well inside double precision; sum_sq compares
      // as its exact string rendering (the decimal-output contract)
      v.read.select(col("o_custkey"), col("n"),
          col("sum_value").cast("double").as("sum_total"),
          col("min_value").cast("double").as("min_total"),
          col("max_value").cast("double").as("max_total"),
          col("sum_sq").cast("string").as("sum_sq"))
        .orderBy("o_custkey")
    }),

    // FULL stats IVM (aux-backed): every aggregate — n, Σv, min, max,
    // Σv², exact distinct count — maintained from one feed read, with
    // extremum deletions answered from the support relation's value
    // multiset instead of ANY base rescan (the aux-backed upgrade of
    // the q_ivm_minmax rescan; bytes-read-pinned in the spec). Oracle
    // = the fullStatsView recompute over the replayed final state.
    "q_ivm_full" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "orders_ivmfl", Seq("o_orderkey"),
        changeFeed = true)
      val aux = graft.table.LakeTable(s, root, "orders_ivmfl_aux",
        Seq("o_custkey", "__v"))
      val v = graft.table.LakeTable(s, root, "orders_ivmfl_view",
        Seq("o_custkey"))
      t.drop(); aux.drop(); v.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      val v0 = t.version
      graft.table.IncrementalView.createFullStatsAux(aux,
        t.read, Seq("o_custkey"), "o_totalprice")
      v.create(graft.table.IncrementalView.fullStatsView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      t.delete(col("o_orderkey") % 5 === 0)
      graft.table.IncrementalView.maintainFullStatsView(t, aux, v,
        Seq("o_custkey"), "o_totalprice", sinceVersion = v0)
      v.read.select(col("o_custkey"), col("n"),
          col("sum_value").cast("double").as("sum_total"),
          col("min_value").cast("double").as("min_total"),
          col("max_value").cast("double").as("max_total"),
          col("sum_sq").cast("string").as("sum_sq"),
          col("n_distinct"))
        .orderBy("o_custkey")
    }),

    // JOIN-view IVM: revenue by customer market segment, maintained
    // through one window of simultaneous fact churn (upsert + delete)
    // AND dim churn (segment moves + customer deletes) via the
    // two-table delta rule dF⋈D1 + F1⋈dD − dF⋈dD. Oracle replays the
    // final state of BOTH tables relationally and recomputes the join
    // aggregate from scratch — maintained must equal recomputed.
    "q_ivm_join" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val f = graft.table.LakeTable(s, root, "ivmj_fact", Seq("o_orderkey"),
        changeFeed = true)
      val d = graft.table.LakeTable(s, root, "ivmj_dim", Seq("o_custkey"),
        changeFeed = true)
      val vw = graft.table.LakeTable(s, root, "ivmj_view", Seq("c_mktsegment"))
      f.drop(); d.drop(); vw.drop()
      f.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      d.create(customer)
      val (f0, d0) = (f.version, d.version)
      vw.create(graft.table.IncrementalView.joinSumView(f.read, d.read,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice"))
      f.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      f.delete(col("o_orderkey") % 5 === 0)
      d.update(col("o_custkey") % 7 === 0,
        Map("c_mktsegment" -> lit("MOVED")))
      d.delete(col("o_custkey") % 11 === 0)
      graft.table.IncrementalView.maintainJoinSumView(f, d, vw,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice", f0, d0)
      vw.read.select(col("c_mktsegment"), col("n"),
          col("sum_value").cast("double").as("sum_total"))
        .orderBy("c_mktsegment")
    }),

    // JOIN-view IVM with min/max: same churn window as q_ivm_join, but
    // the maintained extrema must survive extremum-threatening deletes
    // (rescan THROUGH the join) and same-window cancellations (net
    // per-(group, value) weights — a fact insert whose customer is
    // deleted in the same window must never tighten an extremum).
    "q_ivm_join_minmax" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val f = graft.table.LakeTable(s, root, "ivmjm_fact", Seq("o_orderkey"),
        changeFeed = true)
      val d = graft.table.LakeTable(s, root, "ivmjm_dim", Seq("o_custkey"),
        changeFeed = true)
      val vw = graft.table.LakeTable(s, root, "ivmjm_view", Seq("c_mktsegment"))
      f.drop(); d.drop(); vw.drop()
      f.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      d.create(customer)
      val (f0, d0) = (f.version, d.version)
      vw.create(graft.table.IncrementalView.joinMinMaxView(f.read, d.read,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice"))
      f.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      f.delete(col("o_orderkey") % 5 === 0)
      d.update(col("o_custkey") % 7 === 0,
        Map("c_mktsegment" -> lit("MOVED")))
      d.delete(col("o_custkey") % 11 === 0)
      graft.table.IncrementalView.maintainJoinMinMaxView(f, d, vw,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice", f0, d0)
      vw.read.select(col("c_mktsegment"), col("n"),
          col("sum_value").cast("double").as("sum_total"),
          col("min_value").cast("double").as("min_total"),
          col("max_value").cast("double").as("max_total"))
        .orderBy("c_mktsegment")
    }),

    // CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT parity): a
    // positive-price constraint admits the good upsert, rejects the
    // poisoned one LOUDLY before staging, and the final state equals
    // the good-writes-only replay (the rejected write left no trace).
    "q_check_constraint" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "orders_chk", Seq("o_orderkey"))
      t.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      t.addCheckConstraint("pos_price", "o_totalprice > 0")
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      val vBefore = t.version
      val rejected =
        try {
          t.upsert(orders.limit(10).withColumn("o_totalprice", lit(-1.0)))
          false
        } catch { case _: IllegalStateException => true }
      t.read.agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,4)"))
            .cast("double").as("sum_total"))
        .withColumn("write_rejected", lit(rejected && t.version == vBefore))
    }),

    // streaming CDC subscription: the change feed's append-only
    // parquet log consumed as a file stream (Delta readChangeFeed
    // streaming analogue) — per-change-type event counts after the
    // standard upsert+delete batches; oracle replays the counts
    // relationally
    "q_stream_cdc" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "orders_stream_cdc",
        Seq("o_orderkey"), changeFeed = true)
      t.drop()
      t.create(target)
      t.upsert(source)
      t.delete(col("o_orderkey") % 5 === 0)
      val drained = graft.streaming.Streams.drainAppend(
        t.readChangeFeedStream, s"stream_cdc_${System.nanoTime()}")
      drained.groupBy(col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("change_type")
    }),

    // the FULL continuous-IVM loop: writer → change log → streaming
    // subscriber → view. The base takes the standard upsert+delete
    // batches; the view is then brought up to date purely by consuming
    // the CDC stream's signed deltas (inserts/post +, deletes/pre −) —
    // no snapshot read anywhere. Oracle = the q_ivm full recompute.
    "q_stream_ivm_cdc" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "orders_sivmc",
        Seq("o_orderkey"), changeFeed = true)
      val v = graft.table.LakeTable(s, root, "orders_sivmc_view",
        Seq("o_custkey"))
      t.drop(); v.drop()
      t.create(target)
      v.create(graft.table.IncrementalView.sumView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(source)
      t.delete(col("o_orderkey") % 5 === 0)
      graft.streaming.Streams.maintainSumViewFromChangeFeed(
        t.readChangeFeedStream, v, Seq("o_custkey"), "o_totalprice")
      v.read.select(col("o_custkey"), col("n"),
          col("sum_value").cast("double").as("sum_total"))
        .orderBy("o_custkey")
    }),

    // Streaming MIN/MAX view maintenance from the CDC stream: same
    // churn as q_stream_ivm_cdc, but the subscribed view also carries
    // per-group extrema — each micro-batch nets its events, applies
    // insert-side extrema, and rescans ONLY threatened groups (the
    // delete batch removes current maxima, so the rescan path runs
    // in-stream). Oracle = the full min/max recompute replay.
    "q_stream_ivm_minmax" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "orders_sivmm",
        Seq("o_orderkey"), changeFeed = true)
      val v = graft.table.LakeTable(s, root, "orders_sivmm_view",
        Seq("o_custkey"))
      t.drop(); v.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      v.create(graft.table.IncrementalView.minMaxView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      t.delete(col("o_orderkey") % 5 === 0)
      graft.streaming.Streams.maintainMinMaxViewFromChangeFeed(
        t.readChangeFeedStream, t, v, Seq("o_custkey"), "o_totalprice")
      v.read.select(col("o_custkey"), col("n"),
          col("sum_value").cast("double").as("sum_total"),
          col("min_value").cast("double").as("min_total"),
          col("max_value").cast("double").as("max_total"))
        .orderBy("o_custkey")
    }),

    // Streaming FUSED-STATS maintenance: the one-pass (n, Σv, min,
    // max, Σv²) rule applied per micro-batch from the CDC stream —
    // the streaming twin of q_ivm_stats, against the identical
    // recompute oracle.
    "q_stream_ivm_stats" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "orders_sivst",
        Seq("o_orderkey"), changeFeed = true)
      val v = graft.table.LakeTable(s, root, "orders_sivst_view",
        Seq("o_custkey"))
      t.drop(); v.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      v.create(graft.table.IncrementalView.statsView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      t.delete(col("o_orderkey") % 5 === 0)
      graft.streaming.Streams.maintainStatsViewFromChangeFeed(
        t.readChangeFeedStream, t, v, Seq("o_custkey"), "o_totalprice")
      v.read.select(col("o_custkey"), col("n"),
          col("sum_value").cast("double").as("sum_total"),
          col("min_value").cast("double").as("min_total"),
          col("max_value").cast("double").as("max_total"),
          col("sum_sq").cast("string").as("sum_sq"))
        .orderBy("o_custkey")
    }),

    // Streaming twin of q_ivm_full: the aux-backed FULL-stats view
    // (every aggregate incl. exact distinct count; extremum deletes
    // answered from the support relation, never the base) maintained
    // by draining the CDC stream through the shared applyFullStatsDelta
    // core — two-level exactly-once (batch-id marker + the span markers
    // that make the aux/view crash window exact). Identical oracle to
    // q_ivm_full: streaming and batch full-stats maintenance are one
    // semantics.
    "q_stream_ivm_full" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "orders_sivfl",
        Seq("o_orderkey"), changeFeed = true)
      val aux = graft.table.LakeTable(s, root, "orders_sivfl_aux",
        Seq("o_custkey", "__v"))
      val v = graft.table.LakeTable(s, root, "orders_sivfl_view",
        Seq("o_custkey"))
      t.drop(); aux.drop(); v.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      graft.table.IncrementalView.createFullStatsAux(aux,
        t.read, Seq("o_custkey"), "o_totalprice")
      v.create(graft.table.IncrementalView.fullStatsView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      t.delete(col("o_orderkey") % 5 === 0)
      graft.streaming.Streams.maintainFullStatsViewFromChangeFeed(
        t.readChangeFeedStream, aux, v, Seq("o_custkey"), "o_totalprice")
      v.read.select(col("o_custkey"), col("n"),
          col("sum_value").cast("double").as("sum_total"),
          col("min_value").cast("double").as("min_total"),
          col("max_value").cast("double").as("max_total"),
          col("sum_sq").cast("string").as("sum_sq"),
          col("n_distinct"))
        .orderBy("o_custkey")
    }),

    // Streaming JOIN-view maintenance: dim churn (segment moves +
    // deletes) absorbed by the BATCH maintainer while the fact is
    // quiet, then fact churn (upsert + delete) streamed from the fact
    // CDC feed and enriched in-stream against the final dim — each
    // window exact by the delta identity, so the composition must
    // equal the same from-scratch replay as q_ivm_join.
    "q_stream_ivm_join" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val f = graft.table.LakeTable(s, root, "sivmj_fact", Seq("o_orderkey"),
        changeFeed = true)
      val d = graft.table.LakeTable(s, root, "sivmj_dim", Seq("o_custkey"),
        changeFeed = true)
      val vw = graft.table.LakeTable(s, root, "sivmj_view", Seq("c_mktsegment"))
      f.drop(); d.drop(); vw.drop()
      f.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      d.create(customer)
      val (f0, d0) = (f.version, d.version)
      vw.create(graft.table.IncrementalView.joinSumView(f.read, d.read,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice"))
      d.update(col("o_custkey") % 7 === 0,
        Map("c_mktsegment" -> lit("MOVED")))
      d.delete(col("o_custkey") % 11 === 0)
      graft.table.IncrementalView.maintainJoinSumView(f, d, vw,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice", f0, d0)
      f.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      f.delete(col("o_orderkey") % 5 === 0)
      graft.streaming.Streams.maintainJoinSumViewFromChangeFeed(
        f.readChangeFeedStream, d.read, vw,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice")
      vw.read.select(col("c_mktsegment"), col("n"),
          col("sum_value").cast("double").as("sum_total"))
        .orderBy("c_mktsegment")
    }),

    // streaming JOIN-view min/max: dim churn lands first through the
    // batch maintainer, then the fact window (upsert that doubles half
    // the prices + a delete that removes current group maxima) streams
    // through the CDC subscriber — per micro-batch the fact events are
    // enriched against the dim snapshot and run the full netted
    // min/max rule, with the threatened-group rescan going THROUGH the
    // join in-stream. Oracle = the full join recompute replay
    // (identical to q_ivm_join_minmax's final state).
    "q_stream_ivm_join_minmax" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val f = graft.table.LakeTable(s, root, "sivmjm_fact", Seq("o_orderkey"),
        changeFeed = true)
      val d = graft.table.LakeTable(s, root, "sivmjm_dim", Seq("o_custkey"),
        changeFeed = true)
      val vw = graft.table.LakeTable(s, root, "sivmjm_view",
        Seq("c_mktsegment"))
      f.drop(); d.drop(); vw.drop()
      f.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      d.create(customer)
      val (f0, d0) = (f.version, d.version)
      vw.create(graft.table.IncrementalView.joinMinMaxView(f.read, d.read,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice"))
      d.update(col("o_custkey") % 7 === 0,
        Map("c_mktsegment" -> lit("MOVED")))
      d.delete(col("o_custkey") % 11 === 0)
      graft.table.IncrementalView.maintainJoinMinMaxView(f, d, vw,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice", f0, d0)
      f.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      f.delete(col("o_orderkey") % 5 === 0)
      graft.streaming.Streams.maintainJoinMinMaxViewFromChangeFeed(
        f.readChangeFeedStream, f, d.read, vw,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice")
      vw.read.select(col("c_mktsegment"), col("n"),
          col("sum_value").cast("double").as("sum_total"),
          col("min_value").cast("double").as("min_total"),
          col("max_value").cast("double").as("max_total"))
        .orderBy("c_mktsegment")
    }),

    // two-feed streaming join-view maintenance: SAME final state as
    // q_stream_ivm_join_minmax, but dim churn arrives THROUGH the
    // stream too — the drain subscribes to BOTH tables' CDC feeds and
    // consumes each from the view's recorded sync versions via the
    // exact three-term batch identity (no batch path anywhere after
    // view creation)
    "q_stream_ivm_join_dim" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val f = graft.table.LakeTable(s, root, "sivmjd_fact", Seq("o_orderkey"),
        changeFeed = true)
      val d = graft.table.LakeTable(s, root, "sivmjd_dim", Seq("o_custkey"),
        changeFeed = true)
      val vw = graft.table.LakeTable(s, root, "sivmjd_view",
        Seq("c_mktsegment"))
      f.drop(); d.drop(); vw.drop()
      f.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      d.create(customer)
      val (f0, d0) = (f.version, d.version)
      vw.create(graft.table.IncrementalView.joinMinMaxView(f.read, d.read,
        Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice"))
      // dim churn: segment re-homing + member deletion — NOT routed
      // through the batch maintainer this time
      d.update(col("o_custkey") % 7 === 0,
        Map("c_mktsegment" -> lit("MOVED")))
      d.delete(col("o_custkey") % 11 === 0)
      // fact churn in the same window
      f.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      f.delete(col("o_orderkey") % 5 === 0)
      graft.streaming.Streams.maintainJoinMinMaxViewFromBothFeeds(
        f, d, vw, Seq("o_custkey"), Seq("c_mktsegment"), "o_totalprice",
        f0, d0)
      vw.read.select(col("c_mktsegment"), col("n"),
          col("sum_value").cast("double").as("sum_total"),
          col("min_value").cast("double").as("min_total"),
          col("max_value").cast("double").as("max_total"))
        .orderBy("c_mktsegment")
    }),

    // change-feed compaction: three churn versions net into ONE
    // synthetic feed dir (canceling chains — doubled-then-reverted,
    // deleted-then-reinserted — vanish entirely), then the sum view is
    // maintained ACROSS the compacted span; the oracle replays the
    // same three merges relationally
    "q_feed_compact" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "fc_base", Seq("o_orderkey"),
        changeFeed = true)
      val vw = LakeTable(s, root, "fc_view", Seq("o_custkey"))
      t.drop(); vw.drop()
      t.create(orders.filter(col("o_orderkey") % 3 =!= 0))
      val v0 = t.version
      vw.create(graft.table.IncrementalView.sumView(
        t.read, Seq("o_custkey"), "o_totalprice"))
      t.upsert(orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      t.delete(col("o_orderkey") % 5 === 0)
      // reverts every surviving %14 key to its original price and
      // re-inserts deleted/absent %7 keys — rich canceling structure
      t.upsert(orders.filter(col("o_orderkey") % 7 === 0))
      t.compactChangeFeed(v0, t.version)
      graft.table.IncrementalView.maintainSumView(t, vw, Seq("o_custkey"),
        "o_totalprice", sinceVersion = v0)
      vw.read.select(col("o_custkey"), col("n"),
          col("sum_value").cast("double").as("sum_total"))
        .orderBy("o_custkey")
    }),

    "q_cdc" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_cdc", Seq("o_orderkey"))
      t.create(target)
      t.upsert(source)
      t.changesSince(t.availableVersions.last)
        .select(col("o_orderkey"), col("_change_type"))
        .orderBy("o_orderkey", "_change_type")
    }),

    // PMI bigram collocations: corpus-level pointwise mutual information
    // over adjacent token pairs (min count 5, top 20). Bigrams come out
    // of the native one-pass WordNgrams expression (non-distinct, every
    // occurrence counted); w1/w2 are recovered by substring_index for the
    // unigram joins (tokens never contain spaces).
    "q_pmi_bigrams" -> ((s, dir) => {
      val d = docs(s, dir)
      val biCnt = d.select(explode(
          graft.functions.TextExpressions.wordNgrams(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
        .withColumn("w1", substring_index(col("bigram"), " ", 1))
        .withColumn("w2", substring_index(col("bigram"), " ", -1))
      val uni = d.select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c_w"))
      // single-row × single-row: broadcast anyway — the repo convention
      // (lit-key/true-condition joins constant-fold to BNLJ; the
      // broadcast form is the only BNLJ PlanLint exempts)
      val totals = biCnt.agg(sum("c_ab").as("n_bi"))
        .crossJoin(broadcast(uni.agg(sum("c_w").as("n_uni"))))
      biCnt
        .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), Seq("w2"))
        .crossJoin(broadcast(totals))
        .filter(col("c_ab") >= 5)
        // pmi = ln((c_ab/n_bi)·(n_uni/c_a)·(n_uni/c_b)): fixed double-op
        // order, bit-identical on both engines, no integer products (a
        // raw n_uni² Long would wrap past ~3e9 corpus tokens)
        .select(col("bigram"), col("c_ab"),
          round(log((col("c_ab").cast("double") / col("n_bi")) *
            (col("n_uni").cast("double") / col("c_a")) *
            (col("n_uni").cast("double") / col("c_b"))), 4).as("pmi"))
        .orderBy(col("pmi").desc, col("bigram").asc)
        .limit(20)
    }),

    // PII scrub: emails + long digit runs → typed placeholders, with
    // audit counts. Deterministic PII is synthesized onto the corpus
    // (doc_id-derived) so redaction coverage is nonzero and the DuckDB
    // twin replays it exactly; patterns are RE2-compatible so both regex
    // engines agree.
    "q_pii_redact" -> ((s, dir) => {
      val salted = docs(s, dir).withColumn("t2",
        concat(col("text"),
          when(col("doc_id") % 5 === 0, concat(lit(" contact user"),
            col("doc_id"), lit("@example.com for details"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" ref 9001234"), col("doc_id"))).otherwise(lit(""))))
      salted.select(col("doc_id"),
          piiCounts(col("t2")).as("pc"),
          md5(redactPii(col("t2")).cast("binary")).as("red_md5"))
        .select(col("doc_id"), col("pc.n_emails"), col("pc.n_digit_runs"),
          col("red_md5"))
        .orderBy("doc_id")
    }),

    // Gopher-style within-doc repetition: fraction of 3-gram occurrences
    // that are repeats (native WordNgrams pass, row-local, no shuffle)
    "q_repetition" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(graft.functions.TextExpressions.wordNgrams(col("text"), 3))
          .as("n_ngrams"),
        dupNgramFraction(col("text"), 3).as("dup_frac"))
        .orderBy("doc_id")),

    // benchmark decontamination: train docs (doc_id >= 50) sharing ≥2
    // distinct 3-gram shingles with the eval set (doc_id < 50); the eval
    // shingle set is broadcast, the corpus side never shuffles its text
    "q_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminated(
        d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50),
        "doc_id", "text", n = 3, minShared = 2)
        .orderBy("doc_id")
    }),

    // exact n-gram Jaccard near-dup pairs (bounded subset: all-pairs
    // verify path; oracle-checked)
    "q_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 300), "doc_id", "text",
        n = 3, threshold = 0.7)
        .orderBy("a_id", "b_id")),

    // exact word-token Jaccard via PREFIX FILTERING (PPJoin candidate
    // rule): candidates only from rarest-first token prefixes — exact
    // at the threshold with no df cap and no recall loss; the oracle
    // replays the plain all-pairs Jaccard definition, so any pair the
    // prefix pruning loses (or invents) fails the hash. Bounded to a
    // doc slice like the other definition-oracle verify twins
    // (q_ngram_jaccard, q_embed_neardup): this synthetic corpus draws
    // from a tiny vocabulary, so most pairs ARE >0.8-similar and the
    // output (and any exact join's verify stage) is inherently
    // quadratic in corpus size — a property of the data, not the
    // operator; the content-pruned candidate stage is the scale path
    "q_prefix_jaccard" -> ((s, dir) =>
      Dedup.prefixFilterJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 500), "doc_id", "text",
        threshold = 0.8)
        .orderBy("a_id", "b_id")),

    // embedding-cosine near-dup, brute-force verify path (oracle-checked).
    // Op-level threshold sits below the final cut so the 4-decimal rounding
    // (applied in both engines) is the only boundary that matters. The
    // brute path is quadratic BY CONSTRUCTION (it is the exact
    // verification twin of the LSH sibling below), so the corpus is
    // explicitly bounded — vec_id < 500 — per this project's no-unbounded-
    // cartesian rule; the scale path is q_embed_neardup_lsh.
    "q_embed_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(
        emb(s, dir).filter(col("vec_id") < 500), "vec_id", "embedding",
        dim = 64, threshold = 0.35, lshBits = 0)
        .withColumn("cos", round(col("cos"), 4))
        .filter(col("cos") >= 0.4)
        .orderBy("a_id", "b_id")),

    // embedding-cosine near-dup, LSH-bucketed scale path. Deterministic
    // md5-Rademacher hyperplanes over integer-quantized raw vectors make
    // the CANDIDATE stage replayable bit-for-bit in DuckDB, so the row is
    // fully oracle-COMPARED even though LSH recall < 1 (the oracle replays
    // the same bucketing, not the brute-force definition). Verify chain is
    // q_embed_neardup's proven op-0.35 / round-4 / cut-0.4 rounding
    "q_embed_neardup_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(emb(s, dir), "vec_id", "embedding",
        dim = 64, threshold = 0.35, lshBits = 6, deterministic = true)
        .withColumn("cos", round(col("cos"), 4))
        .filter(col("cos") >= 0.4)
        .orderBy("a_id", "b_id")),

    // greedy sequence packing (training-batch assembly): one global lane
    // so the DuckDB recursive-CTE oracle can replay the identical walk
    "q_pack_sequences" -> ((s, dir) =>
      graft.operators.Packing.packGreedy(
        docs(s, dir).select(col("doc_id"), tokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", budgetTokens = 2000, shards = 1)
        .select("doc_id", "n_tok", "batch")
        .orderBy("doc_id")),

    // per-label centroid of the embedding column: posexplode → two hash
    // aggs (dim-wise mean, then norm) — linear, no vector ever collected
    // to the driver; the grouped-vector-aggregation staple for cluster
    // quality / drift monitoring
    "q_embed_centroids" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")))
        .groupBy("label", "pos")
        .agg(avg(col("col").cast("double")).as("m"), count(lit(1)).as("n"))
        .groupBy("label")
        .agg(round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"),
          max("n").as("n_vecs"))
        .orderBy("label")),

    // ================= North-star: similarity search ===================
    // brute-force exact top-k for a bounded query set (oracle-checked);
    // ranking on the rounded cosine with id tiebreak keeps cross-engine
    // float noise out of the rank.
    "q_embed_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val scored = Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 16), e, "vec_id", "embedding", k = 5)
      scored.select("query_id", "rank", "neighbor_id", "cos")
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN in FULL-probe mode (probeBits = bits): every
    // 2^bits bucket is probed, so the bucketed plan provably equals
    // brute force and the row is oracle-COMPARED — the same
    // full-probe ≡ brute-force conversion as q_ann_index (production
    // probeBits < bits recall stays pinned by RecallSpec).
    "q_embed_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(e.filter(col("vec_id") < 16), e, "vec_id", "embedding",
        k = 5, dim = 64, bits = 8, probeBits = 8)
        .orderBy("query_id", "rank")
    }),

    // Persistent CDC-maintained IVF index (table/AnnIndex): the serving
    // shape — the quantizer trains once at build and freezes; ingest
    // waves re-assign only the touched ids from the change feed
    // (O(batch × nCells), corpus never re-scanned). Full-probe search
    // (nProbe = nCells) is provably exact, so unlike the seeded
    // q_embed_ann_ivf this row is oracle-compared: top-k over the FINAL
    // corpus state after inserts, direction-flipping updates, and
    // deletes must equal the brute-force ranking.
    "q_ann_index" -> ((s, dir) => {
      val e = emb(s, dir).select("vec_id", "embedding")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      // the vector table's id-hash layout is owned by the Bucketed
      // handle (modulus derived from corpus rows, writes stamp __db) so
      // the maintainer's touched-vector fetch — the one remaining
      // O(corpus) scan — opens only the batch ids' partitions
      val b = graft.table.DocBuckets.sized(s, root, "annq_docs",
        "vec_id", e.count(), e.filter(col("vec_id") % 3 =!= 0))
      val ai = graft.table.AnnIndex(s, root, "annq", nCells = 8,
        docParts = b.parts, idParts = 4)
      ai.build(b.read, "vec_id", "embedding")
      var synced = b.version
      b.upsert(e.filter(col("vec_id") % 3 === 0))
      b.upsert(e.filter(col("vec_id") % 11 === 4)
        .withColumn("embedding", transform(col("embedding"), x => -x)))
      b.delete(col("vec_id") % 7 === 3)
      synced = ai.maintain(b.table, "vec_id", "embedding", synced)
      ai.search(e.filter(col("vec_id") < 16), "vec_id", "embedding",
          k = 5, nProbe = 8)
        .orderBy("query_id", "rank")
    }),

    // Streaming twin of q_ann_index: the same waves flow to the index
    // through the embedding table's CDC STREAM (foreachBatch over the
    // shared AnnIndex.applyChanges core, batch-id idempotent) — batch
    // and streaming index maintenance are one semantics. Identical
    // oracle. Runs the SERVING layouts under the drain (idParts +
    // docParts + bucketed vector table): the exactly-once marker rides
    // the ids sidecar (AnnIndex.markerTable) and every micro-batch
    // exercises the sidecar commit ordering end to end.
    "q_stream_ann_index" -> ((s, dir) => {
      val e = emb(s, dir).select("vec_id", "embedding")
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val b = graft.table.DocBuckets.sized(s, root, "sannq_docs",
        "vec_id", e.count(), e.filter(col("vec_id") % 3 =!= 0))
      val ai = graft.table.AnnIndex(s, root, "sannq", nCells = 8,
        docParts = b.parts, idParts = 4)
      ai.build(b.read, "vec_id", "embedding")
      b.upsert(e.filter(col("vec_id") % 3 === 0))
      b.upsert(e.filter(col("vec_id") % 11 === 4)
        .withColumn("embedding", transform(col("embedding"), x => -x)))
      b.delete(col("vec_id") % 7 === 3)
      graft.streaming.Streams.maintainAnnIndexFromChangeFeed(
        b.readChangeFeedStream, b.table, ai, "vec_id", "embedding")
      ai.search(e.filter(col("vec_id") < 16), "vec_id", "embedding",
          k = 5, nProbe = 8)
        .orderBy("query_id", "rank")
    }),

    // IVF ANN in FULL-probe mode (nProbe = nCells): every Voronoi cell
    // is probed, so the celled plan provably equals brute force and the
    // row is oracle-COMPARED regardless of the k-means seeding
    // (production nProbe < nCells recall stays pinned by RecallSpec).
    "q_embed_ann_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopK(e.filter(col("vec_id") < 16), e, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 16)
        .orderBy("query_id", "rank")
    }),

    // ================= North-star: event-time windows ==================
    "q_event_tumbling" -> ((s, dir) =>
      EventOps.tumbling(events(s, dir), "1 hour")
        .orderBy("window_start", "event_type")),

    "q_event_sliding" -> ((s, dir) =>
      EventOps.sliding(events(s, dir), "1 hour", "30 minutes")
        .orderBy("window_start", "event_type")),

    "q_event_sessions" -> ((s, dir) =>
      EventOps.sessions(events(s, dir), "4 hours")
        .orderBy("user_id", "session_start")),

    // as-of join: each click event picks up the user's most recent error
    // event at-or-before it (single shuffle on user_id — no range blowup)
    "q_asof" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id").as("err_id"), col("value"))
      AsOfJoin.asOf(clicks, errors, Seq("user_id"), "ts", "ts", Seq("err_id", "value"))
        .select(col("event_id"), col("user_id"), col("asof_err_id"),
          round(col("asof_value"), 2).as("asof_value"))
        .orderBy("event_id")
    }),

    // binned range join: clicks within 24h after each error, per user
    "q_range_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      RangeJoin.windowFollowing(errors, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"), windowSeconds = 86400)
        .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // UNPIVOT (melt): the wide pivot table folded back to long form
    "q_unpivot" -> ((s, dir) => {
      val wide = Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority").pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
      wide.unpivot(Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")), "status", "n")
        .orderBy("o_orderpriority", "status")
    }),

    // time-series resample: hourly grid per user with 0-filled gaps and
    // carry-forward of the last observed hourly sum
    "q_resample" -> ((s, dir) =>
      EventOps.resampleHourly(
        events(s, dir).filter(col("user_id") < 20), "user_id")
        .orderBy("user_id", "hour")),

    // funnel analysis: view → click → purchase, each stage gated on the
    // user's previous-stage timestamp
    "q_funnel" -> ((s, dir) =>
      EventOps.funnel(events(s, dir), "user_id", "event_type",
        Seq("view", "click", "purchase"))
        .orderBy("stage")),

    // cohort retention triangle: first-activity week × week offset
    "q_cohort" -> ((s, dir) =>
      EventOps.cohortRetention(events(s, dir), "user_id")
        .orderBy("cohort", "week_offset")),

    // CUBE aggregation (all grouping combinations)
    "q_cube" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // TPC-H Q3 shape: selective dim filter → two-table fact join →
    // decimal-exact revenue agg → distributed top-10. The segment-filtered
    // customer key set broadcasts; orders⋈lineitem shuffles on the order
    // key; TakeOrderedAndProject merges per-partition heads.
    "q_tpch_q3" -> ((s, dir) => {
      val cut = lit("1998-01-01").cast("timestamp")
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < cut)
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey").as("l_orderkey"),
          col("o_orderdate"))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o.join(broadcast(c), Seq("c_custkey")), Seq("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(col("l_extendedprice").cast("decimal(20,4)") *
          (lit(1) - col("l_discount").cast("decimal(20,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-way star join (region→nation→customer ⋈ orders ⋈
    // lineitem ⋈ supplier with the nation-colocation condition) —
    // dimensions broadcast, facts shuffle once on their join keys
    "q_tpch_q5" -> ((s, dir) => {
      val r = Tables.load(s, dir, "region")
        .filter(col("r_name") === "ASIA").select("r_regionkey")
      val n = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey").as("r_regionkey"))
      val natAsia = n.join(broadcast(r), Seq("r_regionkey"))
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey").as("l_orderkey"))
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      val l = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      l.join(o, Seq("l_orderkey"))
        .join(broadcast(c.join(broadcast(natAsia), Seq("c_nationkey"))), Seq("c_custkey"))
        .join(broadcast(sup), Seq("l_suppkey"))
        .filter(col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice").cast("decimal(20,4)") *
          (lit(1) - col("l_discount").cast("decimal(20,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // TPC-H Q9 shape (product-profit by nation × year): part filter →
    // three broadcast dims onto lineitem → one fact-fact shuffle with
    // orders on the order key → decimal-exact profit agg. partsupp does
    // not exist in this corpus, so p_retailprice stands in for
    // ps_supplycost in the cost term — same join/agg skeleton.
    "q_tpch_q9" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(col("p_name").like("%widget%"))
        .select(col("p_partkey").as("l_partkey"), col("p_retailprice"))
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      val n = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("s_nationkey"), col("n_name").as("nation"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"),
          year(col("o_orderdate")).as("o_year"))
      val l = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
      l.join(broadcast(p), Seq("l_partkey"))
        .join(broadcast(sup), Seq("l_suppkey"))
        .join(broadcast(n), Seq("s_nationkey"))
        .join(o, Seq("l_orderkey"))
        .groupBy("nation", "o_year")
        .agg(sum(col("l_extendedprice").cast("decimal(20,4)") *
            (lit(1) - col("l_discount").cast("decimal(20,4)")) -
            col("p_retailprice").cast("decimal(20,4)") *
            col("l_quantity").cast("decimal(20,4)"))
          .cast("double").as("sum_profit"))
        .orderBy(col("nation").asc, col("o_year").desc)
    }),

    // TPC-H Q18 shape (large-quantity orders): HAVING subquery as a
    // partial-agg groupBy whose tiny output AQE broadcasts back onto
    // orders, then onto customer — the top-100 merges per-partition
    // heads (TakeOrderedAndProject), never a global sort.
    "q_tpch_q18" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"),
          col("l_quantity").cast("decimal(20,4)").as("qty"))
      val qual = l.groupBy("l_orderkey")
        .agg(sum("qty").as("total_qty"))
        .filter(col("total_qty") > 9)
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_name"))
      o.join(qual, Seq("l_orderkey"))
        .join(c, Seq("o_custkey"))
        .select(col("c_name"), col("o_custkey").as("c_custkey"),
          col("l_orderkey").as("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("total_qty").cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // TPC-H Q7 shape (volume shipping between nation pairs, by year):
    // nations pre-filtered to the pair set BEFORE joining (suppliers of
    // the set broadcast; the customer side keeps only 4/25 nations and
    // AQE picks its strategy from the measured post-filter size), the
    // cross-nation pair condition applied after both dims attach. Four
    // nations rather than TPC-H's two so the smallest test SF still
    // produces rows.
    "q_tpch_q7" -> ((s, dir) => {
      val pair = Seq("NATION_0", "NATION_1", "NATION_2", "NATION_3")
      val n1 = Tables.load(s, dir, "nation")
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nationkey"),
          col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, dir, "nation")
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nationkey"),
          col("n_name").as("cust_nation"))
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      val l = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
          "l_shipdate")
      l.join(o, Seq("l_orderkey"))
        .join(broadcast(sup.join(broadcast(n1), Seq("s_nationkey"))),
          Seq("l_suppkey"))
        .join(c.join(broadcast(n2), Seq("c_nationkey")), Seq("o_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(col("l_extendedprice").cast("decimal(20,4)") *
            (lit(1) - col("l_discount").cast("decimal(20,4)")))
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q14 shape (promo revenue share by month): one broadcast dim
    // onto the fact, conditional decimal agg, share computed in double
    // after the exact decimal sums.
    "q_tpch_q14" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_type"))
      val l = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
      val rev = col("l_extendedprice").cast("decimal(20,4)") *
        (lit(1) - col("l_discount").cast("decimal(20,4)"))
      l.join(broadcast(p), Seq("l_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))).cast("double") /
            sum(rev).cast("double"), 4).as("promo_share"))
        .orderBy("month")
    }),

    // TPC-H Q6 shape (forecast revenue change): pure scan-side predicate
    // stack — every conjunct reaches the parquet reader as a pushed
    // filter, then one decimal-exact partial-aggregated sum. The plan to
    // want at 100 TB: no shuffle at all beyond the single-row final agg.
    "q_tpch_q6" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(20,4)") *
            col("l_discount").cast("decimal(20,4)"))
          .cast("double").as("revenue"))),

    // TPC-H Q10 shape (returned-item revenue, top 20 customers): date
    // window on orders + returnflag filter on lineitem BEFORE the join,
    // one fact-fact shuffle, nation broadcast onto the customer side,
    // TakeOrderedAndProject top-20.
    "q_tpch_q10" -> ((s, dir) => {
      val n = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
      val c = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        .join(broadcast(n), Seq("c_nationkey"))
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .select(col("o_orderkey").as("l_orderkey"),
          col("o_custkey").as("c_custkey"))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, Seq("l_orderkey"))
        .join(c, Seq("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(col("l_extendedprice").cast("decimal(20,4)") *
            (lit(1) - col("l_discount").cast("decimal(20,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q12 shape (shipping-priority class counts by mode; this
    // corpus has no l_shipmode, so l_returnflag plays the 2-value mode
    // column): fact filter → one shuffle join → conditional counts.
    "q_tpch_q12" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("R", "A") &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_returnflag"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, Seq("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    // join so zero-order customers survive with count 0, then a second
    // tiny aggregation over the per-customer counts. The filtered orders
    // side shuffles once on custkey; the histogram agg is ~50 rows.
    "q_tpch_q13" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").select("c_custkey")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"))
      c.join(o, Seq("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // `l_quantity < 0.2 * avg(l_quantity per part)` rewritten as a
    // per-part partial agg joined back onto the fact, with the predicate
    // in INTEGER-EXACT form (qty·5·cnt < sum) so both engines compare
    // exact decimals — no cross-engine double-average drift. The per-part
    // agg output is tiny and AQE broadcasts it back.
    "q_tpch_q17" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(col("p_type") === "PROMO" && col("p_brand").like("Brand#1%"))
        .select(col("p_partkey").as("l_partkey"))
      val qty = col("l_quantity").cast("decimal(20,4)")
      val perPart = Tables.load(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(qty).as("sum_qty"), count(lit(1)).as("cnt_qty"))
      Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(p), Seq("l_partkey"))
        .join(perPart, Seq("l_partkey"))
        .filter(qty * lit(5) * col("cnt_qty") < col("sum_qty"))
        .agg((sum(col("l_extendedprice").cast("decimal(20,4)"))
          .cast("double") / 7.0).as("avg_yearly"))
    }),

    // TPC-H Q19 shape (disjunctive brand/size/quantity predicates): the
    // three OR'd conjunct groups stay a single scan + broadcast join —
    // the part-side disjunction (brand ∈ {...}) is pushable, the mixed
    // fact/dim residual evaluates post-join inside codegen.
    "q_tpch_q19" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand"), col("p_size"))
      val l = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val q = col("l_quantity")
      val hit =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          q.between(1, 15)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          q.between(10, 25)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
          q.between(20, 35))
      l.join(broadcast(p), Seq("l_partkey"))
        .filter(hit)
        .agg(sum(col("l_extendedprice").cast("decimal(20,4)") *
            (lit(1) - col("l_discount").cast("decimal(20,4)")))
          .cast("double").as("revenue"))
    }),

    // TPC-H Q2 shape (min-cost supplier per part; no partsupp table, so
    // the part↔supplier relation is the DISTINCT (partkey,suppkey) pairs
    // observed in lineitem, and s_acctbal stands in for ps_supplycost):
    // the correlated MIN subquery becomes a per-part partial agg joined
    // back on equality — arithmetic-free, so double equality is exact.
    "q_tpch_q2" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(col("p_type") === "LARGE" && col("p_size") < 16)
        .select(col("p_partkey").as("l_partkey"), col("p_name"))
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"),
          col("s_acctbal"), col("s_nationkey"))
      val n = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
      val cand = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(p), Seq("l_partkey"))
        .join(broadcast(sup), Seq("l_suppkey"))
        .join(broadcast(n), Seq("s_nationkey"))
      val mins = cand.groupBy("l_partkey")
        .agg(min(col("s_acctbal")).as("min_bal"))
      cand.join(mins, Seq("l_partkey"))
        .filter(col("s_acctbal") === col("min_bal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("l_partkey").as("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name").asc,
          col("s_name").asc, col("p_partkey").asc)
        .limit(100)
    }),

    // TPC-H Q4 shape (order-priority checking): EXISTS over lineitem as
    // a LEFT SEMI join with a non-equi residual (shipdate > orderdate +
    // 60 days — the corpus has no commit/receipt dates) — the semi join
    // keys on the order key, so it stays a hash join with the interval
    // condition evaluated as the join residual.
    "q_tpch_q4" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q8 shape (national market share by year): region-filtered
    // customers on the order side, supplier nation attached by broadcast,
    // share = conditional decimal sum / total decimal sum, divided in
    // double only after both sums are exact.
    "q_tpch_q8" -> ((s, dir) => {
      val r = Tables.load(s, dir, "region")
        .filter(col("r_name") === "ASIA").select("r_regionkey")
      val nc = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey").as("r_regionkey"))
        .join(broadcast(r), Seq("r_regionkey"))
        .select(col("n_nationkey").as("c_nationkey"))
      val c = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(broadcast(nc), Seq("c_nationkey"))
        .select(col("c_custkey").as("o_custkey"))
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val ns = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("s_nationkey"),
          col("n_name").as("supp_nation"))
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        .join(broadcast(ns), Seq("s_nationkey"))
      val l = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val rev = col("l_extendedprice").cast("decimal(20,4)") *
        (lit(1) - col("l_discount").cast("decimal(20,4)"))
      l.join(o, Seq("l_orderkey"))
        .join(c, Seq("o_custkey"))
        .join(broadcast(sup), Seq("l_suppkey"))
        .groupBy("o_year")
        .agg(round(
          sum(when(col("supp_nation") === "NATION_0", rev).otherwise(lit(0)))
            .cast("double") /
          sum(rev).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q11 shape (important-part inventory value; lineitem revenue
    // per part stands in for ps_supplycost·ps_availqty): the `HAVING
    // value > fraction · total` scalar subquery is the bounded
    // single-row broadcast stats attach (the bm25/unigram-LM pattern —
    // a 1-row build side, exempted by PlanLint's maxRows rule), with
    // the threshold in exact decimals (value·1000 > total ⇔ value >
    // 0.1% of total).
    "q_tpch_q11" -> ((s, dir) => {
      val sup = Tables.load(s, dir, "supplier")
        .filter(col("s_nationkey") < 5)
        .select(col("s_suppkey").as("l_suppkey"))
      val rev = col("l_extendedprice").cast("decimal(20,4)") *
        (lit(1) - col("l_discount").cast("decimal(20,4)"))
      val lv = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast(sup), Seq("l_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(rev).as("value_dec"))
      val total = lv.agg(sum(col("value_dec")).as("total_dec"))
      lv.crossJoin(broadcast(total))
        .filter(col("value_dec") * 1000 > col("total_dec"))
        .select(col("l_partkey").as("p_partkey"),
          col("value_dec").cast("double").as("value"))
        .orderBy(col("value").desc, col("p_partkey").asc)
        .limit(100)
    }),

    // TPC-H Q15 shape (top supplier): quarter revenue per supplier, keep
    // the row(s) equal to the global max — the max is the same bounded
    // single-row broadcast attach, compared in exact decimals so ties
    // survive identically in both engines.
    "q_tpch_q15" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(col("l_extendedprice").cast("decimal(20,4)") *
          (lit(1) - col("l_discount").cast("decimal(20,4)"))).as("total_dec"))
      val mx = rev.agg(max(col("total_dec")).as("max_dec"))
      val sup = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_dec") === col("max_dec"))
        .join(broadcast(sup), Seq("l_suppkey"))
        .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
          col("total_dec").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 shape (supplier counts per part attribute): DISTINCT
    // part↔supplier pairs from lineitem, the NOT-IN supplier exclusion
    // as a LEFT ANTI join (acctbal stands in for the complaints filter),
    // COUNT(DISTINCT) per attribute triple.
    "q_tpch_q16" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 49))
        .select(col("p_partkey").as("l_partkey"),
          col("p_brand"), col("p_type"), col("p_size"))
      val excl = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") < 1000)
        .select(col("s_suppkey").as("l_suppkey"))
      Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(p), Seq("l_partkey"))
        .join(broadcast(excl), Seq("l_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)
    }),

    // TPC-H Q20 shape (excess-inventory suppliers; shipped-quantity
    // dominance stands in for ps_availqty > 0.5·sum): per-(part,supplier)
    // 1996 quantity vs the part total in INTEGER-EXACT form
    // (qty·2 > total), distinct dominant suppliers semi-joined onto the
    // nation-filtered supplier dim.
    "q_tpch_q20" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(col("p_name").like("small%"))
        .select(col("p_partkey").as("l_partkey"))
      val perPS = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("decimal(20,4)").as("q"))
        .join(broadcast(p), Seq("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("q")).as("ps_qty"))
      val perP = perPS.groupBy("l_partkey")
        .agg(sum(col("ps_qty")).as("p_qty"))
      val dominant = perPS.join(perP, Seq("l_partkey"))
        .filter(col("ps_qty") * 2 > col("p_qty"))
        .select(col("l_suppkey").as("s_suppkey")).distinct()
      Tables.load(s, dir, "supplier")
        .filter(col("s_nationkey") < 20)
        .join(dominant, Seq("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the only
    // supplier with a returned line in a multi-supplier completed order —
    // EXISTS as a semi join and NOT EXISTS as an anti join, both hash
    // joins on the order key with a supplier-inequality residual.
    "q_tpch_q21" -> ((s, dir) => {
      val sup = Tables.load(s, dir, "supplier")
        .filter(col("s_nationkey") < 13)
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey"))
      val base = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_suppkey")
        .join(o, Seq("l_orderkey"))
        .join(broadcast(sup), Seq("l_suppkey"))
      val others = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("o2_orderkey"),
          col("l_suppkey").as("o2_suppkey"))
      val othersR = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3_orderkey"),
          col("l_suppkey").as("o3_suppkey"))
      base
        .join(others, col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
        .join(othersR, col("l_orderkey") === col("o3_orderkey") &&
          col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(100)
    }),

    // TPC-H Q22 shape (dormant high-balance customers): the global
    // positive-balance average as the bounded single-row broadcast
    // attach, compared in integer-exact form (bal·cnt > sum), recent
    // orders removed by a LEFT ANTI join, per-nation count + total.
    "q_tpch_q22" -> ((s, dir) => {
      val bal = col("c_acctbal").cast("decimal(20,4)")
      val stats = Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") > 0.0 && col("c_nationkey") < 7)
        .agg(sum(bal).as("sum_bal"), count(lit(1)).as("cnt_bal"))
      val recent = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey").as("c_custkey"))
      Tables.load(s, dir, "customer")
        .filter(col("c_nationkey") < 7)
        .crossJoin(broadcast(stats))
        .filter(bal * col("cnt_bal") > col("sum_bal"))
        .join(recent, Seq("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(bal).cast("double").as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // ORDER BY + LIMIT top-n (TakeOrderedAndProject — the distributed
    // top-k physical op: per-partition heads, single driver merge)
    "q_topn" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)),

    "q_json_extract" -> ((s, dir) =>
      EventOps.withJsonProp(events(s, dir), "k")
        .groupBy("event_type")
        .agg(sum(col("k").cast("long")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")),

    // Spark 4 VARIANT path for semi-structured data: parse once into the
    // shredded binary encoding, then typed path extraction — at scale
    // this replaces re-parsing the JSON string per accessed field
    // (get_json_object) with O(1) binary navigation
    "q_variant_json" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    // schema-full JSON parse (from_json → struct) then struct field access
    "q_from_json" -> ((s, dir) =>
      events(s, dir)
        .withColumn("props_struct",
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .groupBy((col("props_struct.k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k_mod")),

    // Structured Streaming surface: the same tumbling aggregation as
    // q_event_tumbling, executed as a micro-batch stream (AvailableNow
    // drain into a memory sink) — oracle-checked against the same SQL.
    "q_stream_tumbling" -> ((s, dir) => {
      val name = s"stream_tbl_${System.nanoTime()}"
      // readTableStream normalizes events.ts exactly like Tables.load
      val stream = graft.streaming.Streams.readTableStream(s, dir, "events")
      // state partitions sized to the drain (see q_stream_interval)
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainToBatch(
          graft.streaming.Streams.windowedCounts(stream, "1 hour"), name)
      }
      drained.orderBy("window_start", "event_type")
    }),

    // streaming exact dedup: first-seen row per (user, event_type) key,
    // drained AvailableNow — key set equals batch DISTINCT (bounded key
    // domain → global dedup state; see Streams.dedupStream for the
    // unbounded-domain watermark variant)
    "q_stream_dedup" -> ((s, dir) => {
      val name = s"stream_dedup_${System.nanoTime()}"
      val stream = graft.streaming.Streams.readTableStream(s, dir, "events")
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainAppend(
          graft.streaming.Streams.dedupStream(
            stream, Seq("user_id", "event_type")), name)
      }
      drained.select("user_id", "event_type")
        .orderBy("user_id", "event_type")
    }),

    // STREAM-STREAM interval join: the q_range_join semantics executed as
    // a two-stream watermarked join (clicks within 24h after each error),
    // drained and re-aggregated; oracle is the same SQL as q_range_join.
    "q_stream_interval" -> ((s, dir) => {
      val name = s"stream_ij_${System.nanoTime()}"
      def ev() = graft.streaming.Streams.readTableStream(s, dir, "events")
      val errors = ev().filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"))
      val clicks = ev().filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      val joined = graft.streaming.Streams.intervalJoin(
        errors, clicks, "user_id", "c_user", "ts", "c_ts", windowSeconds = 86400)
      // State-store count = shuffle partitions AT QUERY START, and each
      // store pays fixed per-micro-batch cost (4 stores per partition for
      // a stream-stream join). Size it to the stream's volume, not the
      // batch default — the standard streaming ops knob. Safe to scope:
      // the drain action completes inside this block.
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainAppend(joined, name)
      }
      drained.groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // stream-stream LEFT OUTER interval join: unmatched error rows are
    // emitted with nulls only when the watermark proves no click can
    // still arrive — the state-expiry semantics the inner variant never
    // exercises. The cutoff is applied AFTER the join, not on the left
    // stream: the global watermark is min(left, right), so a
    // pre-filtered left side would trail its own max and the newest
    // unmatched rows could never flush (observed: n_unmatched short by
    // the tail rows). With full-range watermarks, every retained row's
    // eviction bound (ts + window = cutoff + 3600) clears the final
    // watermark (max ts − 600) by a 3900 s margin, so the AvailableNow
    // drain flushes EVERY retained unmatched row and the oracle can
    // replay the join relationally without modeling eviction timing
    "q_stream_outer" -> ((s, dir) => {
      val name = s"stream_oj_${System.nanoTime()}"
      // the join's effective watermark is min(left wm, right wm), each
      // trailing ITS OWN type's max ts — anchor the cutoff there, not at
      // the global max (a sparse tail of other event types would leave
      // the last errors/clicks stuck in state and short the unmatched
      // counts, as observed at sf0.001)
      val maxTs = Tables.load(s, dir, "events")
        .agg(least(
          max(when(col("event_type") === "error", col("ts"))),
          max(when(col("event_type") === "click", col("ts")))))
        .head().getTimestamp(0)
      // 8100 s = window 3600 + watermark delay 600 + margin 3900
      val cutoff = new java.sql.Timestamp(maxTs.getTime - 8100L * 1000)
      def ev() = graft.streaming.Streams.readTableStream(s, dir, "events")
      val errors = ev().filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"))
      val clicks = ev().filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      val joined = graft.streaming.Streams.intervalJoin(
        errors, clicks, "user_id", "c_user", "ts", "c_ts",
        windowSeconds = 3600, joinType = "left_outer")
        .filter(col("ts") <= lit(cutoff))
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainAppend(joined, name)
      }
      drained.groupBy("user_id")
        .agg(count(col("c_ts")).as("n_matched"),
          (count(lit(1)) - count(col("c_ts"))).as("n_unmatched"))
        .orderBy("user_id")
    }),

    // streaming sliding windows (width 1h, slide 30m) drained AvailableNow
    // — same answer as the batch q_event_sliding, same oracle
    "q_stream_sliding" -> ((s, dir) => {
      val name = s"stream_slide_${System.nanoTime()}"
      val stream = graft.streaming.Streams.readTableStream(s, dir, "events")
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainToBatch(
          graft.streaming.Streams.slidingCounts(stream, "1 hour", "30 minutes"),
          name)
      }
      drained.orderBy("window_start", "event_type")
    }),

    // foreachBatch MERGE sink as an oracle-checked query: the events
    // stream drains AvailableNow into a LakeTable with per-batch
    // latest-wins dedup + upsert. The table is deterministically reset
    // to the even-id half's latest rows first, so the stream genuinely
    // UPDATEs (overlapping keys) and INSERTs (odd-id-only keys); the
    // final state is the global latest-wins of the corpus regardless of
    // micro-batch slicing, which the oracle replays. The __ord struct
    // (ts, event_id) makes the per-key winner total-ordered.
    "q_stream_upsert" -> ((s, dir) => {
      // readTableStream and Tables.load both normalize events.ts, so
      // stream and batch halves see the same timestamp type
      def shape(df: DataFrame) = df
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), col("value"))
        .withColumn("__ord", struct(col("ts"), col("event_id")))
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = graft.table.LakeTable(s, root, "events_stream_upsert",
        Seq("user_id", "event_type"))
      t.create(graft.ops.CoreOps.latestWins(Seq("user_id", "event_type"), "__ord")(
        shape(Tables.load(s, dir, "events").filter(col("event_id") % 2 === 0))))
      graft.streaming.Streams.upsertStream(
        shape(graft.streaming.Streams.readTableStream(s, dir, "events")),
        t, Seq("user_id", "event_type"), "__ord")
      t.read.select(col("user_id"), col("event_type"),
        col("event_id").as("win_event_id"),
        round(col("value"), 2).as("win_value"))
        .orderBy("user_id", "event_type")
    }),

    // streaming incremental view maintenance: the view starts from the
    // even-event half (batch sumView), then the ODD half arrives as an
    // append-only stream whose micro-batch deltas MERGE additively into
    // the stored view (foreachBatch IVM) — the final view must equal
    // the full recompute over ALL events, which is the oracle
    "q_stream_ivm" -> ((s, dir) => {
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val v = graft.table.LakeTable(s, root, "events_stream_ivm_view",
        Seq("user_id"))
      v.drop()
      v.create(graft.table.IncrementalView.sumView(
        Tables.load(s, dir, "events").filter(col("event_id") % 2 === 0),
        Seq("user_id"), "value"))
      graft.streaming.Streams.maintainSumViewStream(
        graft.streaming.Streams.readTableStream(s, dir, "events")
          .filter(col("event_id") % 2 =!= 0),
        v, Seq("user_id"), "value")
      v.read.select(col("user_id"), col("n"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy("user_id")
    }),

    // streaming sessionization (flatMapGroupsWithState, event-time
    // timeouts) drained AvailableNow: a session is emitted once the
    // watermark passes its end + gap, and the final no-data micro-batch
    // flushes everything closed by the global max event time — so the
    // drained result is EXACTLY the batch sessions whose
    // end + gap <= max(ts); each user's trailing open session stays
    // pending by design (streaming semantics, not data loss), which the
    // oracle's HAVING replays.
    "q_stream_sessions" -> ((s, dir) => {
      val name = s"stream_sess_${System.nanoTime()}"
      val stream = graft.streaming.Streams.readTableStream(s, dir, "events")
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainAppend(
          graft.streaming.Streams.sessionize(stream, gapSeconds = 4 * 3600),
          name)
      }
      drained.select("user_id", "session_start", "n_events", "sum_value")
        .orderBy("user_id", "session_start")
    }),

    // mapGroupsWithState running per-key aggregate (Update mode): count,
    // exact-decimal value total, latest event type — one fixed-size state
    // record per key. The Update-mode memory sink holds every per-batch
    // emission; the final state is the max of the monotone counter.
    "q_stream_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val name = s"stream_run_${System.nanoTime()}"
      val stream = graft.streaming.Streams.readTableStream(s, dir, "events")
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainUpdate(
          graft.streaming.Streams.runningStats(stream), name)
      }
      val w = Window.partitionBy("user_id").orderBy(col("n_events").desc)
      drained.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "n_events", "sum_value", "last_type")
        .orderBy("user_id")
    }),

    // ================= North-star: multimodal columns ==================
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.withMediaMeta(
        docs(s, dir).withColumn("payload", col("text").cast("binary")), "payload")
        .select(col("doc_id"), col("n_bytes"), col("content_md5"))
        .orderBy("doc_id")),

    // decode/feature-extract over binary payloads (stubbed codec). The
    // stub's arithmetic (c = c*31 + byte mod 2^64, dims from the
    // checksum) is deterministic byte math, so it IS oracle-checkable:
    // the DuckDB twin replays it with HUGEINT mod-2^64 list_reduce over
    // a 64-byte payload bound (texts are ASCII → byte = code point)
    "q_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      val media = docs(s, dir).select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "video").otherwise("image").as("kind"),
        substring(col("text"), 1, 64).cast("binary").as("payload"))
        .as[Multimodal.MediaRow]
      Multimodal.resized(Multimodal.decodeAndFeaturize(media), 256)
        .select("media_id", "kind", "width", "height", "n_bytes", "checksum",
          "out_width", "out_height")
        .orderBy("media_id")
    }),

    "q_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        docs(s, dir).select(
          col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 0, "video").otherwise("image").as("kind"),
          repeat(col("text"), 50).cast("binary").as("payload")),
        stride = 2)
        .orderBy("media_id", "frame_idx")),

    // ============ Round 4: link analysis / retrieval / sketches ========

    // fixed-iteration PageRank over the undirected supplier↔customer
    // trade graph (edges from lineitem⋈orders). Fixed iterations +
    // ranking on the ROUNDED rank make the iterative float arithmetic
    // replayable cross-engine (the DuckDB twin chains one CTE per
    // iteration).
    "q_pagerank" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      // dedup as narrow int pairs BEFORE rendering string node ids (the
      // "s"/"c" prefixes are injective, so distinctness survives the
      // concat — and the disjoint namespaces keep the mirrored set
      // duplicate-free, satisfying the dedupEdges=false contract)
      val edges = l.join(o, Seq("l_orderkey"))
        .select(col("l_suppkey"), col("o_custkey")).distinct()
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("c"), col("o_custkey")).as("dst"))
      Graph.pageRank(edges, "src", "dst", iterations = 3,
        dedupEdges = false)
        .select(col("node"), round(col("pr"), 6).as("pr"))
        .orderBy(col("pr").desc, col("node").asc)
        .limit(20)
    }),

    // BM25 top-k retrieval for a fixed probe query (Lucene-style scoring
    // variant — see Retrieval.bm25TopK); idf/tf arithmetic replayed
    // exactly by the DuckDB twin, ranking on the rounded score
    "q_bm25" -> ((s, dir) =>
      Retrieval.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "hash", "window"), k = 10)),

    // retrieval evaluation harness: MRR / precision@k / recall@k of the
    // BM25 ranker against boolean-AND lexical relevance — the
    // division-only IR metrics (nDCG's log2 gains are libm-bound);
    // relevance, ranking, and every metric replay exactly in DuckDB
    "q_retrieval_eval" -> ((s, dir) =>
      Retrieval.retrievalEval(docs(s, dir), "doc_id", "text",
        Seq(Seq("spark", "hash", "window"), Seq("merge", "table")),
        k = 10)),

    // hybrid retrieval: BM25 top-20 (lexical) ⊕ cosine top-20 around
    // doc 0's embedding (dense), fused by reciprocal rank (c=60) —
    // rank-based, so neither score needs calibrating; both input lists
    // are bounded, so the ranking windows sit under the limit exemption
    "q_rrf_fusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bm = Retrieval.bm25TopK(docs(s, dir), "doc_id", "text",
          Seq("spark", "hash", "window"), k = 20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select("doc_id", "rank")
      val e = emb(s, dir)
      val en = graft.operators.Similarity.bruteForceTopK(
          e.filter(col("vec_id") === 0), e, "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(bm, en, "doc_id", "rank", c = 60, k = 10)
        .select(col("id").as("doc_id"), col("rank_a"), col("rank_b"),
          col("rrf"))
    }),

    // count-min sketch point estimates: fixed-constant universal hashing
    // makes the sketch content itself deterministic, so the DuckDB twin
    // rebuilds the exact cells and reproduces the exact estimates —
    // sketch built map-side-mergeable, probed with codegen'd built-ins
    "q_cms_counts" -> ((s, dir) => {
      import graft.functions.SketchAggregates
      val sk = events(s, dir).agg(
        SketchAggregates.countMin(col("user_id"), depth = 4, width = 64).as("sk"))
      s.range(0, 10).select(col("id").as("probe_user"))
        .crossJoin(broadcast(sk))
        .select(col("probe_user"),
          SketchAggregates.countMinEstimate(col("sk"), col("probe_user"),
            depth = 4, width = 64).as("est"))
        .orderBy("probe_user")
    }),

    // deterministic weighted mixture sampling: per-source keep rates from
    // a pure hash of the doc id (no RNG) — reproducible across engines,
    // monotone in the weight; rates land near the weights
    "q_weighted_mix" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("wt",
        (substring(col("source"), 4, 10).cast("int") % 5 + 1) / lit(5.0))
      val kept = graft.ops.ScaleOps.weightedMixtureSample(d, "doc_id", col("wt"))
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
      d.groupBy("source").agg(max("wt").as("wt"), count(lit(1)).as("n_total"))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("wt"), col("n_total"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          round(coalesce(col("n_kept"), lit(0L)) / col("n_total"), 4).as("kept_rate"))
        .orderBy("source")
    }),

    // α=0.5 temperature-scaled source mixing: per-source keep rate
    // √(n_min/nᵢ) (sqrt is IEEE-exact on every engine — the reason the
    // operator pins α=0.5), kept set decided by the deterministic hash
    // rule; rates and kept counts replay exactly in DuckDB
    "q_temperature_mix" -> ((s, dir) => {
      val d = docs(s, dir)
      val kept = graft.ops.ScaleOps.temperatureMixSample(d, "source", "doc_id")
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
      val totals = d.groupBy("source").agg(count(lit(1)).as("n_total"))
      totals.crossJoin(broadcast(totals.agg(min("n_total").as("nmin"))))
        .select(col("source"), col("n_total"),
          round(sqrt(col("nmin").cast("double") / col("n_total").cast("double")), 6)
            .as("rate"))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n_total"), col("rate"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("source")
    }),

    // multi-epoch annealed mixture schedule over the skewed lang
    // grouping (sources are uniform by construction): keep-rates at
    // α ∈ {1, 1/2, 1/4} — division and sqrt only, IEEE-exact on both
    // engines (the same pinning argument as q_temperature_mix)
    "q_mix_schedule" -> ((s, dir) =>
      graft.ops.ScaleOps.annealedMixSchedule(
        docs(s, dir).select(col("lang").as("source")), "source")
        .orderBy("source")),

    // rolling 7-day distinct users from MERGEABLE daily KMV sketches —
    // raw events touched once, every window answered by sketch merge;
    // k=4096 >> weekly cardinality at lab scale, so counts are exact
    // and the oracle checks them against a recomputed sliding distinct
    "q_rolling_uniques" -> ((s, dir) =>
      graft.ops.ScaleOps.rollingKmvDistinct(
        events(s, dir).select(to_date(col("ts")).as("day"), col("user_id")),
        "day", "user_id", windowDays = 7, k = 4096)
        .orderBy("day")),

    // revenue concentration (Pareto report): share of total revenue
    // held by the top 1% / 10% / 50% of customers — computed via exact
    // percentile THRESHOLDS + filtered sums, no global ranking window
    // anywhere (the windowless path to "top-x% share" at corpus scale);
    // exact decimal sums, one double division per segment
    "q_pareto" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "orders").groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(20,4)")).as("rev_dec"))
        .withColumn("rev", col("rev_dec").cast("double"))
      val th = rev.agg(
        expr("percentile(rev, 0.99)").as("p99"),
        expr("percentile(rev, 0.90)").as("p90"),
        expr("percentile(rev, 0.50)").as("p50"),
        sum("rev_dec").as("total_dec"))
      rev.crossJoin(broadcast(th))
        .select(explode(array(
          struct(lit("top1").as("segment"), (col("rev") >= col("p99")).as("keep")),
          struct(lit("top10").as("segment"), (col("rev") >= col("p90")).as("keep")),
          struct(lit("top50").as("segment"), (col("rev") >= col("p50")).as("keep"))))
          .as("sg"), col("rev_dec"), col("total_dec"))
        .filter(col("sg.keep"))
        .groupBy(col("sg.segment").as("segment"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("rev_dec")).cast("double") /
            max(col("total_dec")).cast("double"), 6).as("revenue_share"))
        .orderBy("segment")
    }),

    // per-source exact-dup rate on the normalized fingerprint — the
    // one-line "how dirty is each source" report that decides whether
    // a source needs the full dedup pipeline before mixing
    "q_dedup_rate" -> ((s, dir) =>
      docs(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(graft.functions.TextFunctions
            .fingerprintNormalized(col("text"))).as("n_unique"))
        .select(col("source"), col("n_docs"), col("n_unique"),
          round((col("n_docs") - col("n_unique")).cast("double") /
            col("n_docs"), 6).as("dup_rate"))
        .orderBy("source")),

    // per-(user, type) inter-arrival gaps (lag under a total (ts, id)
    // order), exact median/p90 per type in seconds — the event-cadence
    // profile; microsecond-exact diffs, one double division at the end
    "q_interarrival" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("prev_us").isNotNull)
        .withColumn("gap_us", unix_micros(col("ts")) - col("prev_us"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          round(expr("percentile(gap_us, 0.5)") / 1e6, 4)
            .as("median_gap_s"),
          round(expr("percentile(gap_us, 0.9)") / 1e6, 4).as("p90_gap_s"))
        .orderBy("event_type")
    }),

    // 20-bucket equi-width histogram of order totals — the value-
    // distribution profile behind range-partition boundary choices
    "q_numeric_hist" -> ((s, dir) =>
      graft.operators.Profiling.numericHistogram(
        Tables.load(s, dir, "orders"), "o_totalprice", nBuckets = 20)
        .orderBy("bucket")),

    // exact repeated-paragraph detection: disjoint 20-token chunks
    // fingerprinted (md5), doc pairs sharing a chunk counted — the
    // chunk-granularity exact-substring dedup complementing
    // q_containment's gram-set view; hot fingerprints capped at df≤50
    // like every posting join here
    "q_chunk_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ch = Retrieval.chunkDocuments(docs(s, dir), "doc_id", "text",
          chunkSize = 20, stride = 20)
        .filter(col("n_tokens") === 20) // short tails carry no signal
        .select(col("doc_id"),
          md5(col("chunk_text").cast("binary")).as("fp"))
        .distinct()
        .withColumn("__df", count(lit(1)).over(Window.partitionBy("fp")))
        .filter(col("__df") <= 50).drop("__df")
      ch.select(col("doc_id").as("a_id"), col("fp"))
        .join(ch.select(col("doc_id").as("b_id"), col("fp")), Seq("fp"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared_chunks"))
        .orderBy("a_id", "b_id")
    }),

    // Theil–Sen robust trend per event type over daily counts: the
    // exact median of all pairwise slopes — outlier days can't drag
    // the estimate the way least squares lets them; pair count is
    // calendar-bounded (days², not events²)
    "q_theil_sen" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("d", datediff(col("day"),
          lit("2020-01-01").cast("date")).cast("double"))
      val a = daily.select(col("event_type"), col("d").as("d1"),
        col("n").as("n1"))
      val b = daily.select(col("event_type"), col("d").as("d2"),
        col("n").as("n2"))
      a.join(b, Seq("event_type"))
        .filter(col("d2") > col("d1"))
        .withColumn("slope",
          (col("n2") - col("n1")).cast("double") / (col("d2") - col("d1")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(slope, 0.5)"), 6).as("ts_slope"))
        .orderBy("event_type")
    }),

    // functional-dependency screens: a PK that must determine (orders)
    // next to a key that must NOT (users emit many event types)
    "q_fd_profile" -> ((s, dir) => {
      def p(df: DataFrame, det: String, dep: String, label: String) =
        graft.operators.Profiling.functionalDependency(df, det, dep)
          .select(lit(label).as("fd"), col("n_keys"),
            col("violating_keys"), col("violation_rate"),
            col("max_dep_values"))
      p(Tables.load(s, dir, "orders"), "o_orderkey", "o_custkey",
        "orderkey_custkey")
        .unionByName(p(events(s, dir), "user_id", "event_type",
          "user_eventtype"))
        .orderBy("fd")
    }),

    // one-row key-skew profile of events.user_id — the pre-shuffle
    // diagnostic that decides whether a join/agg needs the suite's
    // salted shapes; exact percentiles over PER-KEY frequencies (one
    // row per distinct key, so exact stays cheap at corpus scale)
    "q_key_skew" -> ((s, dir) =>
      graft.operators.Profiling.keySkewProfile(events(s, dir), "user_id")),

    // the concrete salting sidecar: per-key salt factors for users
    // whose event count exceeds the 70-rows-per-task budget; integer
    // ceil-division, so the plan replays exactly
    "q_salt_plan" -> ((s, dir) =>
      graft.operators.Profiling.saltPlan(events(s, dir), "user_id", 70)
        .orderBy(col("freq").desc, col("key").asc)),

    // log2-bucketed token-count histogram over documents — the
    // sequence-length distribution that sizes packing/truncation;
    // bucket = bit length via bin(), integer-exact cross-engine
    "q_length_hist" -> ((s, dir) =>
      graft.operators.Profiling.lengthHistogram(
        docs(s, dir), size(tokens(col("text"))))
        .orderBy("bucket")),

    // one-pass whole-table profile (null rates + KMV distinct
    // estimates) over the stable-cast orders columns; md5 sketch, so
    // the estimates replay exactly in the oracle (and ARE exact for
    // the low-cardinality columns)
    "q_table_profile" -> ((s, dir) =>
      graft.operators.Profiling.tableProfile(
        Tables.load(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
        k = 64)
        .orderBy("col_name")),

    // median/MAD robust outlier screen per event type — exact
    // percentiles, identical IEEE predicate order on both engines
    "q_robust_outliers" -> ((s, dir) =>
      graft.operators.Profiling.robustOutliers(
        events(s, dir), "event_type", "value", nMads = 3.0)
        .orderBy("event_type")),

    // exact join-output cardinality without running the join — the
    // pre-flight explosion check (here: lineitem's l_partkey self-join,
    // the co-purchase pair-expansion cost); decimal products so hot
    // keys can't wrap a Long
    "q_join_cardinality" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      graft.operators.Profiling.joinCardinality(li, "l_partkey", li, "l_partkey")
    }),

    // winsorized per-event-type stats: exact percentile bounds, clip
    // counts, and the deterministic decimal-summed clipped mean
    "q_winsorize" -> ((s, dir) =>
      graft.operators.Profiling.winsorizedStats(
        events(s, dir), "event_type", "value", pLo = 0.01, pHi = 0.99)
        .orderBy("event_type")),

    // first-order Markov transition matrix of user event streams; the
    // (ts, event_id) tiebreak makes lead() total-ordered on both engines
    "q_transitions" -> ((s, dir) =>
      graft.operators.EventOps.transitionMatrix(
        events(s, dir), "user_id", "event_type", "ts", "event_id")
        .orderBy("from_type", "to_type")),

    // asymmetric containment near-dups (quote/subset detection) over
    // capped 5-gram postings — the duplication direction Jaccard
    // misses; threshold on the rounded max-direction containment
    "q_containment" -> ((s, dir) =>
      Dedup.ngramContainmentPairs(docs(s, dir), "doc_id", "text",
        n = 5, threshold = 0.5, maxDf = 50)
        .orderBy("a_id", "b_id")),

    // per-source OOV rate against the corpus top-100 vocab — the
    // tokenizer-coverage report; vocab boundary tie-broken (count desc,
    // token asc) identically on both engines
    "q_vocab_coverage" -> ((s, dir) =>
      Retrieval.vocabCoverage(docs(s, dir), "source", "text", vocabSize = 100)
        .orderBy("source")),

    // deterministic ~2000-token-per-source prefix sample in md5(id)
    // order, summarized per source; the window is source-partitioned
    // with an (hash, id) total order
    "q_token_budget" -> ((s, dir) =>
      graft.ops.ScaleOps.tokenBudgetSample(
        docs(s, dir), "source", "doc_id", "text", budgetTokens = 2000L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          max("cum_tok").as("last_cum"))
        .orderBy("source")),

    // corpus n-gram duplication profile per source — the memorization-
    // risk metric: of each source's distinct 5-grams, what fraction
    // appears in ≥2 docs corpus-wide
    "q_dup_ngram_rate" -> ((s, dir) =>
      Dedup.ngramDupStats(docs(s, dir), "doc_id", "text", "source",
        n = 5, minDocs = 2)
        .orderBy("source")),

    // source×source 5-gram overlap matrix — pairwise cross-source
    // leakage (which PAIR shares content; q_dup_ngram_rate above is the
    // per-source rollup)
    "q_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(docs(s, dir), "source", "text", n = 5)
        .orderBy("src_a", "src_b")),

    // HITS hubs/authorities on the directed supplier→part supply graph
    // (edge list straight from lineitem, no upstream join). L1
    // normalization per half-step keeps every constant replayable; the
    // DuckDB twin chains two CTEs per iteration. Ranking on ROUNDED
    // scores with node tiebreak, per the repo determinism rule.
    "q_hits" -> ((s, dir) => {
      // int-pair dedup before the string render; injective prefixes keep
      // it distinct (dedupEdges=false contract)
      val edges = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_partkey")).distinct()
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
      Graph.hits(edges, "src", "dst", iterations = 2, dedupEdges = false)
        .orderBy(col("auth").desc, col("hub").desc, col("node").asc)
        .limit(20)
    }),

    // Deterministic synchronous label propagation on the undirected
    // supplier↔part graph: communities emerge as shared min-ish labels;
    // output is the community-size histogram (top 20)
    "q_label_prop" -> ((s, dir) => {
      val edges = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_partkey")).distinct()
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
      Graph.labelPropagation(edges, "src", "dst", iterations = 2,
        dedupEdges = false)
        .groupBy("label").agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("label").asc)
        .limit(20)
    }),

    // inverted-index build over the documents corpus: df + impact-
    // truncated postings per term. Postings flattened to "doc:tf" text
    // for the oracle compare (driver's pandas hash can't sort nested
    // list-of-struct columns — same rule as q_array_ops).
    "q_postings" -> ((s, dir) =>
      Retrieval.invertedIndex(docs(s, dir), "doc_id", "text",
        maxPostings = 20)
        .select(col("term"), col("df"),
          array_join(transform(col("postings"),
            p => concat(p.getField("doc_id"), lit(":"), p.getField("tf"))),
            " ").as("postings"))
        .orderBy(col("df").desc, col("term").asc)
        .limit(20)),

    // model-based quality filter: frozen logistic model over the text
    // features, scored row-local and aggregated per source — the
    // distributed-scoring half of a learned quality classifier
    "q_quality_model" -> ((s, dir) =>
      docs(s, dir)
        .select(col("source"),
          qualityLogit(col("text")).as("score"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          count(when(col("score") >= 0.6, 1)).as("n_keep"),
          round(avg("score"), 4).as("avg_score"))
        .orderBy("source")),

    // RAG/pretraining chunking: overlapping 64-token windows, stride 48.
    // Chunk text compared by md5 to keep the oracle rows narrow.
    "q_chunk" -> ((s, dir) =>
      Retrieval.chunkDocuments(docs(s, dir), "doc_id", "text",
        chunkSize = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_idx")),

    // stream-static enrichment: the events stream joins a broadcast
    // customer-dimension snapshot, then a watermarked tumbling agg per
    // nation. AvailableNow drain => batch-equivalent result, so the
    // DuckDB twin is the plain batch join+agg.
    "q_stream_enrich" -> ((s, dir) => {
      val name = s"stream_enrich_${System.nanoTime()}"
      val stream = graft.streaming.Streams.readTableStream(s, dir, "events")
      val dim = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_nationkey"))
      val enriched = graft.streaming.Streams.enrichStream(stream, dim,
        Seq("user_id"))
      val agg = enriched.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(20,4)")).cast("double"), 2)
            .as("sum_value"))
        .select(col("w.start").as("window_start"), col("c_nationkey"),
          col("n"), col("sum_value"))
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainToBatch(agg, name)
      }
      drained.orderBy("window_start", "c_nationkey")
    }),

    // hard-negative mining: per probe item, the 5 most-similar items of a
    // DIFFERENT label — contrastive-training negatives, exact brute pass
    // over the bounded probe set (scale path: lshTopK + label filter)
    "q_hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.hardNegatives(e.filter(col("vec_id") < 16), e,
        "vec_id", "embedding", "label", k = 5)
        .select("query_id", "rank", "neighbor_id", "cos")
        .orderBy("query_id", "rank")
    }),

    // deterministic sketch-style quantiles: bottom-4096-by-id-hash sample
    // (TakeOrdered, O(k)/partition) + exact interpolated quantiles of the
    // sample — replays exactly in DuckDB, unlike a randomized KLL
    "q_sampled_quantiles" -> ((s, dir) =>
      graft.ops.ScaleOps.hashSampledQuantiles(events(s, dir),
        "event_id", "value", k = 4096, probs = Seq(0.5, 0.9, 0.99))),

    // positional phrase match (no index): per source, how many docs
    // contain "spark hash" as consecutive tokens — row-local HOF probe
    "q_phrase" -> ((s, dir) =>
      docs(s, dir)
        .select(col("source"),
          phraseMatch(col("text"), Seq("spark", "hash")).as("hit"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          count(when(col("hit"), 1)).as("n_match"))
        .orderBy("source")),

    // per-stratum variant: an independent deterministic sample per
    // event_type (WindowGroupLimit: map-side partial top-k per group)
    "q_group_quantiles" -> ((s, dir) =>
      graft.ops.ScaleOps.hashSampledQuantilesPerGroup(events(s, dir),
        "event_type", "event_id", "value", k = 2048,
        probs = Seq(0.5, 0.9))
        .orderBy("event_type")),

    // edit-distance self-join (entity resolution): all distinct part-name
    // pairs within 2 edits, via deletion-neighborhood blocking (complete
    // candidate generation, no all-pairs scan) + threshold levenshtein
    "q_fuzzy_join" -> ((s, dir) => {
      val names = Tables.load(s, dir, "part").select(col("p_name")).distinct()
      graft.operators.FuzzyJoin.selfJoin(names, "p_name", "p_name", tau = 2)
        .select(col("a_id").as("a_name"), col("b_id").as("b_name"), col("dist"))
        .orderBy("a_name", "b_name")
    }),

    // Jaro–Winkler name-similarity self-join (entity resolution's other
    // classic measure, complementing q_fuzzy_join's edit distance): the
    // native expression stays inside codegen; blocking is the compound
    // (2-char prefix × length band) key — a 1-char key's buckets grow
    // linearly with the corpus and its within-bucket pairs
    // quadratically, the textbook weak blocking key (see
    // FuzzyJoin.jaroCandidates and FuzzyJoinSpec's candidate-count
    // pin). The oracle replays the exact same blocking + algorithm;
    // round(·,6) washes last-ulp double drift; the ≥ threshold compares
    // the ROUNDED score in both engines so boundary rows can't flicker.
    "q_jaro_pairs" -> ((s, dir) => {
      val names = Tables.load(s, dir, "part").select(col("p_name")).distinct()
      graft.operators.FuzzyJoin.jaroSelfJoin(names, "p_name", minSim = 0.5)
        .orderBy("name1", "name2")
    }),

    // benchmark decontamination: which eval-set strings occur verbatim in
    // each document — ONE Aho–Corasick pass over the text per row for the
    // whole pattern set (N contains() probes would re-scan the text N
    // times); matched = sorted indices into the pattern list, rendered as
    // a comma-joined scalar (the oracle comparer can't hash ARRAY columns)
    "q_decontaminate" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          graft.functions.TextExpressions.multiPatternMatch(
            col("text"), decontaminationPatterns).as("matched_arr"))
        .withColumn("n_matched", size(col("matched_arr")))
        .filter(col("n_matched") > 0)
        .select(col("doc_id"),
          array_join(transform(col("matched_arr"), _.cast("string")), ",")
            .as("matched"),
          col("n_matched"))
        .orderBy("doc_id")),

    // unigram-LM quality signal: corpus-trained token frequencies, each
    // doc scored by mean token log-probability (low = corpus-atypical)
    "q_unigram_lm" -> ((s, dir) =>
      Retrieval.unigramLogProb(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf·ln(N/df), ranked on the rounded score (cross-engine rule)
    "q_tfidf" -> ((s, dir) =>
      Retrieval.tfIdfTopTerms(docs(s, dir), "doc_id", "text", k = 3)
        .orderBy("doc_id", "term")),

    // bigram-LM quality signal (perplexity-ladder rung above
    // q_unigram_lm): add-0.5-smoothed P(w2|w1), mean log-prob per doc
    "q_bigram_lm" -> ((s, dir) =>
      Retrieval.bigramLogProb(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // per-source KL divergence from the corpus token distribution —
    // the multi-source distribution-drift diagnostic
    "q_source_kl" -> ((s, dir) =>
      Retrieval.sourceKlDivergence(docs(s, dir), "source", "text")
        .orderBy("source")),

    // schema-evolving MERGE: source carries a column the target lacks;
    // after upsert the table has the union schema, pre-existing rows
    // read the new column as NULL (Delta mergeSchema parity)
    "q_schema_evolution" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val base = orders.select("o_orderkey", "o_custkey", "o_totalprice")
      val target = base.filter(col("o_orderkey") % 3 =!= 0)
      val source = base.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_channel",
          when(col("o_orderkey") % 4 === 0, lit("web")).otherwise(lit("store")))
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_evolve", Seq("o_orderkey"))
      t.create(target)
      t.upsert(source)
      t.read.select("o_orderkey", "o_totalprice", "o_channel")
        .orderBy("o_orderkey")
    }),

    // change feed across a DELETE: create, row-level delete, then read
    // the delete rows out of the version diff (the CDC branch q_cdc's
    // upsert path never exercises)
    "q_cdc_delete" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_cdcdel", Seq("o_orderkey"))
      t.create(target)
      t.delete(col("o_orderkey") % 5 === 0)
      t.changesSince(t.availableVersions.last)
        .select(col("o_orderkey"), col("_change_type"))
        .orderBy("o_orderkey")
    }),

    // SemDeDup (cluster-then-dedup semantic dedup): k-means cells, then
    // keep-min-id within each cell at cosine >= 0.4. k-means isn't
    // SQL-replayable -> rows-only here; the cell-local rule is pinned
    // exactly by SimilaritySpec's independent replay
    // SemDeDup in EXACT mode (nCells = 1): the per-cell pairwise pass
    // degenerates to the full all-pairs comparison, so the keep-min-id
    // survivor rule is provably independent of the k-means seeding and
    // the row is oracle-COMPARED (the same full-probe ≡ exact
    // conversion as the ANN rows; multi-cell recall stays pinned by
    // RecallSpec).
    "q_semdedup" -> ((s, dir) =>
      Similarity.semDedup(emb(s, dir), "vec_id", "embedding",
        threshold = 0.4, nCells = 1)
        .orderBy("id")),

    // dirty-record -> clean-catalog fuzzy match (two-sided variant): a
    // deterministically corrupted copy of the name table matched back at
    // tau=2; oracle is the brute-force levenshtein join
    "q_fuzzy_match" -> ((s, dir) => {
      val clean = Tables.load(s, dir, "part").select(col("p_name")).distinct()
      val dirty = clean.select(translate(col("p_name"), "e", "3").as("dirty_name"))
        .distinct()
      graft.operators.FuzzyJoin.join(
        dirty, "dirty_name", "dirty_name", clean, "p_name", "p_name", tau = 2)
        .select(col("left_id").as("dirty_name"), col("right_id").as("clean_name"),
          col("dist"))
        .orderBy("dirty_name", "clean_name")
    }),

    // the WHOLE training-data pipeline as one call: language filter ->
    // quality floor -> decontamination -> exact dedup -> near-dup
    // families -> best-per-family -> leakage-safe split; the oracle
    // replays all seven stages from proven fragments
    "q_curate" -> ((s, dir) =>
      Pipelines.curateCorpus(docs(s, dir), "doc_id", "text", "lang",
        keepLangs = Seq("en"), minQuality = 0.6,
        evalPatterns = Seq("merge batch", "fast table", "hash value", "row fast"))
        .select("doc_id", "lang", "quality", "family", "split")
        .orderBy("doc_id")),

    // nightly increment: docs >= 250 curated AGAINST the standing corpus
    // (< 250) — corpus never self-paired; admitted = quality-gated,
    // decontaminated, no exact/near dup in corpus or earlier new doc
    "q_curate_increment" -> ((s, dir) => {
      val d = docs(s, dir)
      Pipelines.curateIncrement(
        d.filter(col("doc_id") >= 250),
        d.filter(col("doc_id") < 250).select("doc_id", "text"),
        "doc_id", "text", "lang", keepLangs = Seq("en"), minQuality = 0.6,
        evalPatterns = Seq("merge batch", "fast table"))
        .orderBy("doc_id")
    }),

    // deterministic epoch shuffle: each doc's position in two different
    // epoch permutations (pure function of (epoch, id) -> md5 order,
    // reproducible across engines); ranked with the WINDOWLESS two-phase
    // epochPositions (round 4 ranked through an unpartitioned window —
    // a single-executor funnel this suite no longer contains anywhere);
    // oracle replays the same ranking as a plain global row_number
    "q_epoch_shuffle" -> ((s, dir) => {
      val base = docs(s, dir).select("doc_id")
      // INT cast at the query layer to mirror the oracle's CAST(... AS
      // INT); the operator itself emits LONG positions
      def pos(epoch: Int, name: String) =
        graft.ops.ScaleOps.epochPositions(base, "doc_id", epoch)
          .select(col("doc_id"), col("pos").cast("int").as(name))
      pos(1, "pos_e1").join(pos(2, "pos_e2"), "doc_id").orderBy("doc_id")
    }),

    // the FULL-corpus epoch ranking, scale-safely: two-phase distributed
    // ranking (md5-prefix bucket -> partitioned window, plus a <=256-row
    // offset table) — identical output to a global row_number with no
    // global window anywhere in the plan
    "q_epoch_positions" -> ((s, dir) =>
      graft.ops.ScaleOps.epochPositions(
        docs(s, dir).select("doc_id"), "doc_id", epoch = 1)
        .select(col("doc_id"), col("pos").cast("int").as("pos"))
        .orderBy("doc_id")),

    // REAL media decode (not the stub): per order key, a deterministic
    // 1x1 P6 PPM is byte-built and decoded by the pure-JVM codec; the
    // oracle replays the ITU-R 601 luma arithmetic directly
    "q_media_decode" -> ((s, dir) => {
      import s.implicits._
      val rows = Tables.load(s, dir, "orders").select("o_orderkey")
        .filter(col("o_orderkey") < 1000).as[Long].map { k =>
          val (r, g, b) = ((k % 256).toInt, ((k / 3) % 256).toInt, ((k / 7) % 256).toInt)
          graft.operators.Multimodal.MediaRow(k, "image",
            "P6\n1 1\n255\n".getBytes("US-ASCII") ++
              Array(r.toByte, g.toByte, b.toByte))
        }
      graft.operators.Multimodal.decodeReal(rows).toDF()
        .select(col("media_id").as("o_orderkey"), col("decoded"),
          round(col("mean_level"), 4).as("luma"))
        .orderBy("o_orderkey")
    }),

    // REAL pixel resample: per order key a 2x2 P6 with four DISTINCT
    // pixels is built, nearest-neighbor-resized to 1x1 (which must pick
    // the top-left source pixel: src = floor(dst*2/1) = 0), and the
    // resized PPM re-decoded — the oracle replays the top-left pixel's
    // luma, so selecting any other pixel (or emitting a malformed PPM)
    // fails the hash
    "q_media_resize" -> ((s, dir) => {
      import s.implicits._
      val rows = Tables.load(s, dir, "orders").select("o_orderkey")
        .filter(col("o_orderkey") < 1000).as[Long].map { k =>
          def px(i: Int) = Array((((k + i) % 256).toInt).toByte,
            (((k / 3 + i) % 256).toInt).toByte,
            (((k / 7 + i) % 256).toInt).toByte)
          graft.operators.Multimodal.MediaRow(k, "image",
            "P6\n2 2\n255\n".getBytes("US-ASCII") ++
              px(0) ++ px(1) ++ px(2) ++ px(3))
        }
      val resized = graft.operators.Multimodal.resizeReal(rows, 1, 1)
        .map(r => graft.operators.Multimodal.MediaRow(r.media_id, "image",
          r.payload))
      graft.operators.Multimodal.decodeReal(resized).toDF()
        .select(col("media_id").as("o_orderkey"), col("width"), col("height"),
          round(col("mean_level"), 4).as("luma"))
        .orderBy("o_orderkey")
    }),

    // REAL compressed-image decode via pure-JDK javax.imageio: per order
    // key a deterministic 2x2 raster is encoded by the JDK's own writer
    // — PNG for even keys, JPEG for odd — then decoded back through
    // Codecs.decodeImage. PNG is lossless, so its ITU-R 601 mean luma
    // replays as exact arithmetic on the key in DuckDB (same sequential
    // row-major accumulation both sides); JPEG is DCT-lossy
    // (deterministic per JDK but not arithmetic-replayable), so the
    // oracle pins its format/dims/channels and leaves luma NULL
    "q_image_decode" -> ((s, dir) => {
      import s.implicits._
      val rows = Tables.load(s, dir, "orders").select("o_orderkey")
        .filter(col("o_orderkey") < 600).as[Long].map { k =>
          val fmt = if (k % 2 == 0) "png" else "jpeg"
          val payload = graft.operators.Codecs.encodeImage(fmt, 2, 2, (x, y) => {
            val i = y * 2 + x
            val r = ((k + i) % 256).toInt
            val g = ((k / 3 + i) % 256).toInt
            val b = ((k / 7 + i) % 256).toInt
            (r << 16) | (g << 8) | b
          })
          graft.operators.Multimodal.MediaRow(k, "image", payload)
        }
      graft.operators.Multimodal.decodeReal(rows).toDF()
        .select(col("media_id").as("o_orderkey"), col("format"),
          col("width"), col("height"), col("channels"),
          when(col("format") === "png", round(col("mean_level"), 4)).as("luma"))
        .orderBy("o_orderkey")
    }),

    // REAL compressed-image pixel resample: per key a 2x2 PNG with four
    // DISTINCT pixels is NN-resized to 1x1 through the full
    // decode->sample->PNG-re-encode->decode roundtrip; NN must pick the
    // top-left source pixel (src = floor(dst*2/1) = 0) and PNG
    // re-encoding is lossless, so the surviving pixel's luma replays as
    // exact arithmetic on the key — picking any other pixel, resampling
    // lossily, or emitting a malformed PNG fails the hash
    "q_image_resize" -> ((s, dir) => {
      import s.implicits._
      val rows = Tables.load(s, dir, "orders").select("o_orderkey")
        .filter(col("o_orderkey") < 600).as[Long].map { k =>
          val payload = graft.operators.Codecs.encodeImage("png", 2, 2, (x, y) => {
            val i = y * 2 + x
            val r = ((k + i) % 256).toInt
            val g = ((k / 3 + i) % 256).toInt
            val b = ((k / 7 + i) % 256).toInt
            (r << 16) | (g << 8) | b
          })
          graft.operators.Multimodal.MediaRow(k, "image", payload)
        }
      val resized = graft.operators.Multimodal.resizeReal(rows, 1, 1)
        .map(r => graft.operators.Multimodal.MediaRow(r.media_id, "image",
          r.payload))
      graft.operators.Multimodal.decodeReal(resized).toDF()
        .select(col("media_id").as("o_orderkey"), col("format"),
          col("width"), col("height"), round(col("mean_level"), 4).as("luma"))
        .orderBy("o_orderkey")
    }),

    // REAL audio feature extraction: per key an 8-sample PCM-16 WAV is
    // byte-built (samples are pure key arithmetic), then RMS / peak /
    // zero-crossings come from the codec. Every feature is exact across
    // engines: /32768 and /2^30 are power-of-two scalings, so the
    // sum-of-squares is a sum of exactly-representable dyadic rationals
    // (order-independent), and peak/ZCR are integer comparisons
    "q_audio_features" -> ((s, dir) => {
      import s.implicits._
      val rows = Tables.load(s, dir, "orders").select("o_orderkey")
        .filter(col("o_orderkey") < 600).as[Long].map { k =>
          val samples = Array.tabulate[Short](8)(i =>
            (((k * 31 + i * 997) % 65536) - 32768).toShort)
          graft.operators.Multimodal.MediaRow(k, "audio",
            graft.operators.Codecs.encodeWav(8000, 1, samples))
        }
      graft.operators.Multimodal.audioFeaturesReal(rows).toDF()
        .select(col("media_id").as("o_orderkey"), col("n_samples"),
          round(col("rms"), 6).as("rms"),
          round(col("peak"), 6).as("peak"),
          col("zero_crossings"))
        .orderBy("o_orderkey")
    }),

    // REAL per-channel color means: the same deterministic 2x2 PNG as
    // q_image_decode, reduced per channel instead of to luma — each mean
    // replays as integer-sum arithmetic on the key
    "q_image_channels" -> ((s, dir) => {
      import s.implicits._
      val rows = Tables.load(s, dir, "orders").select("o_orderkey")
        .filter(col("o_orderkey") < 600).as[Long].map { k =>
          val payload = graft.operators.Codecs.encodeImage("png", 2, 2, (x, y) => {
            val i = y * 2 + x
            val r = ((k + i) % 256).toInt
            val g = ((k / 3 + i) % 256).toInt
            val b = ((k / 7 + i) % 256).toInt
            (r << 16) | (g << 8) | b
          })
          graft.operators.Multimodal.MediaRow(k, "image", payload)
        }
      graft.operators.Multimodal.imageChannelsReal(rows).toDF()
        .select(col("media_id").as("o_orderkey"),
          round(col("r_mean"), 4).as("r_mean"),
          round(col("g_mean"), 4).as("g_mean"),
          round(col("b_mean"), 4).as("b_mean"))
        .orderBy("o_orderkey")
    }),

    // REAL multi-frame video-analogue sampling: per key a 6-frame 2x2
    // animated GIF (shared gray palette, interlace disabled — the two
    // conditions under which the JDK GIF roundtrip is pixel-exact),
    // strided frame decode (stride 2 → frames 0,2,4) with per-frame
    // mean luma replaying as pure key arithmetic
    "q_gif_frames" -> ((s, dir) => {
      import s.implicits._
      val rows = Tables.load(s, dir, "orders").select("o_orderkey")
        .filter(col("o_orderkey") < 300).as[Long].map { k =>
          val payload = graft.operators.Codecs.encodeGifFrames(2, 2, 6,
            palette = i => i * 0x010101,
            pixelIdx = (f, x, y) =>
              ((k * 13 + f * 97 + y * 31 + x * 53) % 256).toInt)
          graft.operators.Multimodal.MediaRow(k, "video", payload)
        }
      graft.operators.Multimodal.sampleFramesReal(rows, stride = 2).toDF()
        .filter(col("decoded"))
        .select(col("media_id").as("o_orderkey"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("n_frames").cast("long").as("n_frames"),
          round(col("mean_level"), 4).as("luma"))
        .orderBy("o_orderkey", "frame_idx")
    }),

    // SCD Type 2 MERGE: two history-preserving upserts (initial load,
    // then a batch where 1-in-3 keys changed and 1-in-3 is a no-op);
    // fixed asOf timestamps keep reruns + oracle deterministic
    "q_scd2" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey") < 500)
      val batch2 = base.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2) // changed
        .unionByName(base.filter(col("o_orderkey") % 3 === 1)) // unchanged
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_scd2", Seq("o_orderkey"))
      t.drop() // fresh history per run
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
      t.upsertScd2(base, Seq("o_totalprice"), t0)
      t.upsertScd2(batch2, Seq("o_totalprice"), t1)
      t.read.select("o_orderkey", "o_totalprice",
          "__valid_from", "__valid_to", "__is_current")
        .orderBy("o_orderkey", "__valid_from")
    }),

    // effective-dated lookup against the SCD2 dimension: each fact joins
    // the price version valid at its timestamp (before/after the repricing)
    "q_scd2_lookup" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(col("o_orderkey") < 500)
      val batch2 = base.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_scd2l", Seq("o_orderkey"))
      t.drop()
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
      t.upsertScd2(base, Seq("o_totalprice"), t0)
      t.upsertScd2(batch2, Seq("o_totalprice"), t1)
      // facts: every key once mid-January (sees v1) and once mid-March
      // (sees the repriced v2 where one exists)
      val facts = base.select(col("o_orderkey"),
          explode(array(
            lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")),
            lit(java.sql.Timestamp.valueOf("2024-03-15 00:00:00"))))
            .as("fact_ts"))
      LakeTable.scd2Lookup(facts, t.read, Seq("o_orderkey"), "fact_ts")
        .select(col("o_orderkey"), col("fact_ts"),
          col("o_totalprice").as("effective_price"))
        .orderBy("o_orderkey", "fact_ts")
    }),

    // MAP-typed column surface: build a status->count map per customer
    // (map_from_entries over sorted entries), then read it back out with
    // element_at / map_keys / size — oracle replays map-free
    "q_map_ops" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_custkey", "o_orderstatus").agg(count(lit(1)).as("n"))
        .groupBy("o_custkey")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("o_orderstatus"), col("n"))))).as("m"))
        .select(col("o_custkey"),
          size(col("m")).as("n_statuses"),
          coalesce(element_at(col("m"), lit("O")), lit(0L)).as("n_open"),
          array_join(map_keys(col("m")), ",").as("statuses"))
        .orderBy("o_custkey")),

    // S4 Excel scan end-to-end: stage a deterministic two-sheet workbook
    // from the orders table, read it back in dynamic (all-string) mode
    // with the zero-dependency XLSX reader, promote types through the
    // standard cast path, aggregate; oracle replays from orders directly
    "q_xlsx_pipeline" -> ((s, dir) => {
      val src = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(col("o_orderkey") < 200).orderBy("o_orderkey").collect()
      val hdr = Seq("o_orderkey", "o_custkey", "o_totalprice")
      def sheet(rows: Array[org.apache.spark.sql.Row]) =
        hdr +: rows.map(r => Seq(r.getLong(0).toString, r.getLong(1).toString,
          r.getDouble(2).toString)).toSeq
      val (even, odd) = src.partition(_.getLong(0) % 2 == 0)
      val path = s"/tmp/graft_xlsx/${dir.replaceAll("[^A-Za-z0-9]", "_")}/orders.xlsx"
      graft.sources.Xlsx.write(path,
        Seq("even" -> sheet(even), "odd" -> sheet(odd)))
      graft.sources.Xlsx.readAllSheets(s, path)
        .select(col("sheet_name"),
          col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").cast("double").as("p"))
        .groupBy("sheet_name").agg(
          count(lit(1)).as("n_rows"),
          sum(col("p").cast("decimal(20,4)")).cast("double").as("sum_price"))
        .orderBy("sheet_name")
    }),

    // learned-BPE token accounting: train the merge table on a BOUNDED
    // deterministic sample (64 docs, driver-side — tokenizer practice),
    // then count subwords across the full corpus with the native encode
    // expression. The learned merges are dumped as a parquet SIDECAR so
    // the oracle can replay the greedy rank-ordered encode relationally
    // (recursive CTE over symbol lists — DuckDB recomputes every
    // subword count from the same merge table); the TRAINING loop stays
    // pinned against hand-computed merges in BpeSpec.
    "q_bpe_tokens" -> ((s, dir) => {
      val d = docs(s, dir)
      // Locale.ROOT: the sample's lowercase must be locale-independent
      // like the encode expression's (UTF8String) and the oracle's
      // (DuckDB lower()) — a tr_TR default locale would fold I→ı and
      // train a different merge table than the encode applies
      val sample = d.filter(col("doc_id") < 64).select("text").collect()
        .flatMap(_.getString(0).toLowerCase(java.util.Locale.ROOT)
          .split("\\s+")).filter(_.nonEmpty).toSeq
      val merges = graft.functions.Bpe.train(sample, numMerges = 100)
      // oracle sidecar (tiny: <= 100 rows), CONTENT-ADDRESSED: every
      // scale factor writes one <slug>.parquet into a SHARED dir, each
      // row stamped with the corpus fingerprint (count, sum(length(
      // text))) it was trained against. The oracle reads the whole dir
      // and selects the merge table whose fingerprint matches the
      // documents under verify — so verifying at ANY sf picks ITS OWN
      // merge table (the old per-sf path literal could only name one
      // sf and silently compared others against a foreign table), and
      // a corpus with no sidecar at all fails loudly ("no bpe sidecar
      // for this corpus"), never as an inscrutable hash diff. The
      // fingerprint needs the char sum because the generator keeps the
      // documents ROW COUNT constant across small sfs (ASCII corpus,
      // so char-count semantics agree cross-engine).
      val slug = dir.stripSuffix("/").replaceAll("[^A-Za-z0-9]", "_")
      val stats = d.agg(count(lit(1)).as("n"),
        sum(length(col("text"))).as("chars")).head()
      val (corpusDocs, corpusChars) = (stats.getLong(0), stats.getLong(1))
      import s.implicits._
      val stage = s"/tmp/graft_oracle_sidecar/.stage_bpe_$slug"
      merges.zipWithIndex
        .map { case ((a, b), i) => (i, a, b, corpusDocs, corpusChars) }
        .toDF("rank", "l", "r", "corpus_docs", "corpus_chars")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      locally {
        import java.nio.file.{Files, Paths, StandardCopyOption}
        val part = Files.list(Paths.get(stage)).filter(
          _.getFileName.toString.endsWith(".parquet")).findFirst.get
        val dst = Paths.get("/tmp/graft_oracle_sidecar/bpe_merges_all")
        Files.createDirectories(dst)
        Files.move(part, dst.resolve(s"$slug.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      d.select(col("source"),
          graft.functions.Bpe.bpeEncode(col("text"), merges).as("toks"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(size(col("toks"))).as("n_subwords"))
        .orderBy("source")
    }),

    // leakage-controlled train/test split: near-dup FAMILIES assigned to
    // splits atomically (md5-threshold on the family id), so no eval doc
    // has a near-duplicate in train; oracle replays closure + md5 rule
    "q_split_leakage" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.7)
      Dedup.leakageSafeSplit(d.select("doc_id"), pairs, "doc_id")
        .orderBy("doc_id")
    }),

    // ============== round 8: monitoring / quantization / CEP =============

    // rolling 7-day z-score anomaly screen over daily per-type volumes —
    // the data-drift monitor you'd run nightly on an ingest firehose;
    // variance from integer frame sums, comparisons on the rounded score
    "q_rolling_zscore" -> ((s, dir) =>
      EventOps.rollingZScore(events(s, dir), "event_type", "ts",
        windowDays = 7, zThreshold = 2.0)
        .orderBy("event_type", "day")),

    // equal-frequency histogram: order-value deciles per priority class
    // via ntile over a fully-tiebroken partitioned order — usable
    // range-partition boundaries where equi-width buckets would collapse
    "q_equidepth_hist" -> ((s, dir) =>
      graft.operators.Profiling.equiDepthHistogram(
        Tables.load(s, dir, "orders"),
        "o_orderpriority", "o_totalprice", "o_orderkey", nBuckets = 10)
        .orderBy("o_orderpriority", "bucket")),

    // int8 scalar quantization profile: per-vector scale + EXACT integer
    // code mass + reconstruction error of the round trip — the audit you
    // run before switching an embedding store to int8
    "q_int8_quant" -> ((s, dir) => {
      import graft.functions.VectorFunctions._
      val e = emb(s, dir)
      // internal name "sc" ≠ output alias "scale": Spark 4's lateral
      // column alias resolution would otherwise bind the err
      // expression's scale reference to the ROUNDED output column
      val d = e.select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .withColumn("sc", int8Scale(col("v")))
        .withColumn("q", int8Codes(col("v")))
      val err = zip_with(col("v"), col("q"),
        (x, qi) => x - dequant(qi, col("sc")))
      d.select(col("vec_id"), round(col("sc"), 6).as("scale"),
          aggregate(col("q"), lit(0L), (acc, qi) => acc + abs(qi)).as("code_l1"),
          round(dot(err, err) / size(col("q")), 10).as("mse"))
        .orderBy("vec_id")
    }),

    // ANN under fixed-scale int8 quantization of unit vectors: integer
    // dot-product ranking (4× scan bandwidth cut) — exact arithmetic,
    // so unlike LSH/IVF this approximate path has a full oracle
    "q_int8_ann" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.int8TopK(e.filter(col("vec_id") < 16), e,
        "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

    // 2-core of the co-purchase graph (support-≥2 pairs): peel degree-<2
    // vertices for 3 rounds — the dense-cluster filter that bounds the
    // wedge ops' frontier; fixed rounds keep it oracle-replayable
    "q_kcore" -> ((s, dir) => {
      val edges = supportPrunedPairs(copurchaseSets(s, dir), 2)
        .select(col("u"), col("v"))
      Graph.kCore(edges, "u", "v", k = 2, rounds = 3)
        .orderBy("vertex")
    }),

    // CEP conversion detection on the event stream: purchases preceded
    // by ≥1 view of the same user within 4 h, with trigger count and
    // latest-view attribution — flatMapGroupsWithState, watermark-exact
    "q_stream_pattern" -> ((s, dir) => {
      val name = s"stream_pat_${System.nanoTime()}"
      val stream = graft.streaming.Streams.readTableStream(s, dir, "events")
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainAppend(
          graft.streaming.Streams.patternDetect(
            stream, triggerType = "view", actionType = "purchase",
            withinSeconds = 4 * 3600),
          name)
      }
      drained.select("user_id", "purchase_id", "purchase_ts",
          "n_trigger", "last_trigger_ts")
        .orderBy("user_id", "purchase_ts", "purchase_id")
    }),

    // DSIR importance weights (Xie et al. 2023): hashed-unigram
    // log-likelihood ratio of each doc vs the English-target slice —
    // the classifier-free way to tilt a crawl toward a reference domain
    "q_dsir_weights" -> ((s, dir) =>
      graft.ops.ScaleOps.dsirWeights(docs(s, dir), "doc_id", "text",
        targetPred = col("lang") === "en", buckets = 128)
        .orderBy("doc_id")),

    // file-level data skipping (zone maps): range-cluster orders into 8
    // files, then answer a narrow BETWEEN from only the files whose
    // min/max intersect it — result equality is the oracle, file-count
    // pruning is pinned in FileSkippingSpec
    "q_skipping_scan" -> ((s, dir) => {
      val dst = s"/tmp/graft_skip/${dir.replaceAll("[^A-Za-z0-9]", "_")}/orders"
      Tables.load(s, dir, "orders")
        .repartitionByRange(8, col("o_totalprice"))
        .write.mode("overwrite").parquet(dst)
      graft.table.FileSkipping.skippingScan(
          s, dst, "o_totalprice", 50000.0, 100000.0)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double")
            .as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // metadata-only COUNT(*) over a multi-file layout: parquet footer
    // record counts, zero data pages — must equal the real count
    "q_fast_count" -> ((s, dir) => {
      import s.implicits._
      val dst = s"/tmp/graft_skip/${dir.replaceAll("[^A-Za-z0-9]", "_")}/orders_fc"
      Tables.load(s, dir, "orders").filter(col("o_orderkey") % 3 =!= 0)
        .repartition(8)
        .write.mode("overwrite").parquet(dst)
      Seq(graft.table.FileSkipping.fastCount(s, dst)).toDF("n_rows")
    }),

    // RM3-lite pseudo-relevance feedback: BM25 pass 1 → top-5 docs'
    // frequent long terms expand the query at half weight → re-scored
    // top-10 (both rankings on rounded scores, integer-count term ties)
    "q_prf_expand" -> ((s, dir) =>
      Retrieval.prfExpandedTopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "hash", "window"), fbDocs = 5, fbTerms = 5,
        beta = 0.5, k = 10)),

    // day-of-week seasonal profile per event type — the multiplicative
    // index that deseasonalizes before q_rolling_zscore's trend logic
    "q_seasonal_index" -> ((s, dir) =>
      EventOps.seasonalIndex(events(s, dir), "event_type", "ts")
        .orderBy("event_type", "dow")),

    // per-file Bloom index point lookup: layout clustered by DATE, probe
    // by ORDER KEY — min/max zone maps see the full key span per file
    // and prune nothing, the Bloom bitmap prunes to ~1 file (pinned in
    // FileSkippingSpec); result equality is the oracle
    "q_bloom_skip" -> ((s, dir) => {
      val dst = s"/tmp/graft_bloomskip/${dir.replaceAll("[^A-Za-z0-9]", "_")}/orders"
      Tables.load(s, dir, "orders")
        .repartitionByRange(8, col("o_orderdate"))
        .write.mode("overwrite").parquet(dst)
      graft.table.FileSkipping.bloomSkippingScan(
          s, dst, "o_orderkey", 100L)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    }),

    // Z-order + conjunctive skipping: Morton-clustered layout keeps
    // per-file ranges tight on BOTH columns, so a two-column range
    // conjunction prunes multiplicatively (per-dimension pruning pinned
    // in FileSkippingSpec); answer equality is the oracle
    "q_zorder_skip" -> ((s, dir) => {
      import graft.functions.ZOrder
      val dst = s"/tmp/graft_zskip/${dir.replaceAll("[^A-Za-z0-9]", "_")}/orders"
      val o = Tables.load(s, dir, "orders")
      val b = o.agg(min(col("o_totalprice")).as("p_lo"),
        max(col("o_totalprice")).as("p_hi"),
        min(col("o_custkey")).as("c_lo"), max(col("o_custkey")).as("c_hi"))
      val z = ZOrder.interleave(
        ZOrder.bin(col("o_totalprice"), col("p_lo"), col("p_hi")),
        ZOrder.bin(col("o_custkey"), col("c_lo"), col("c_hi")))
      o.crossJoin(broadcast(b)).withColumn("z", z)
        .repartitionByRange(8, col("z"))
        .drop("p_lo", "p_hi", "c_lo", "c_hi")
        .write.mode("overwrite").parquet(dst)
      graft.table.FileSkipping.skippingScanConj(s, dst,
          Seq(("o_totalprice", 100000.0, 200000.0), ("o_custkey", 20L, 80L)))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double")
            .as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // absence detection (negation CEP): views with NO purchase inside
    // the 4 h attribution window — decidable only via the event-time
    // timeout once the watermark strictly passes view_ts + window
    "q_stream_abandon" -> ((s, dir) => {
      val name = s"stream_abandon_${System.nanoTime()}"
      val stream = graft.streaming.Streams.readTableStream(s, dir, "events")
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainAppend(
          graft.streaming.Streams.abandonDetect(
            stream, triggerType = "view", actionType = "purchase",
            withinSeconds = 4 * 3600),
          name)
      }
      drained.select("user_id", "view_id", "view_ts")
        .orderBy("user_id", "view_ts", "view_id")
    }),

    // level-2 sequential patterns: users with type a EVENTUALLY before
    // type b (min/max-timestamp profile trick — no raw-event self-join)
    "q_seq_patterns" -> ((s, dir) =>
      EventOps.sequencePairSupport(events(s, dir), "user_id", "event_type", "ts")
        .orderBy(col("support").desc, col("a"), col("b"))),

    // CUSUM level-shift evidence per event type — the cumulative drift
    // detector that complements q_rolling_zscore's pointwise spikes;
    // sequential fold replayed exactly via list_reduce
    "q_cusum" -> ((s, dir) =>
      EventOps.cusumDrift(events(s, dir), "event_type", "ts")
        .orderBy("event_type")),

    // k-anonymity audit over (lang, source) quasi-identifiers: the
    // privacy screen a training corpus runs before release — groups
    // smaller than k are re-identification risks
    "q_k_anonymity" -> ((s, dir) =>
      docs(s, dir).groupBy("lang", "source")
        .agg(count(lit(1)).as("n"))
        .withColumn("violates_k5", col("n") < 5)
        .orderBy("lang", "source")),

    // conversion-latency distribution: first view → first subsequent
    // purchase per user; exact interpolated percentiles over the
    // user-bounded latency set
    "q_time_to_convert" -> ((s, dir) => {
      val ev = events(s, dir)
      val fv = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("fv"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(fv, Seq("user_id"))
        .filter(col("ts") > col("fv"))
        .groupBy("user_id", "fv").agg(min("ts").as("cp"))
        .select(((unix_micros(col("cp")) - unix_micros(col("fv"))).cast("double")
          / 1000000.0d).as("latency_s"))
      conv.agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(latency_s, 0.5)"), 1).as("median_s"),
        round(expr("percentile(latency_s, 0.9)"), 1).as("p90_s"))
    }),

    // Efraimidis–Spirakis weighted k-sample per language, weight =
    // n_chars (longer docs proportionally likelier) — exact-k weighted
    // sampling with a fully hash-replayable key
    "q_weighted_sample" -> ((s, dir) =>
      graft.ops.ScaleOps.weightedSamplePerGroup(
        docs(s, dir).select("doc_id", "lang", "n_chars"),
        Seq("lang"), "doc_id", "n_chars", k = 5, seed = 7L)
        .select("lang", "sample_rank", "doc_id", "n_chars")
        .orderBy("lang", "sample_rank")),

    // zero-dep Avro container-file source (Avro core ships with Spark;
    // spark-avro does not): bounded dimension snapshot → two .avro files
    // → distributed binaryFile+DataFileStream read-back
    "q_avro_roundtrip" -> ((s, dir) => {
      import org.apache.avro.Schema.Type
      val root = s"/tmp/graft_avro/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val src = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("long"), col("n_name"),
          col("n_regionkey").cast("long"))
        .orderBy("n_nationkey").collect() // bounded: 25-row dimension
      val fields = Seq("n_nationkey" -> Type.LONG, "n_name" -> Type.STRING,
        "n_regionkey" -> Type.LONG)
      def rows(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(r => Seq[Any](r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val (even, odd) = src.partition(_.getLong(0) % 2 == 0)
      graft.sources.Avro.write(s"$root/part-0.avro", "nation", fields, rows(even))
      graft.sources.Avro.write(s"$root/part-1.avro", "nation", fields, rows(odd))
      graft.sources.Avro.read(s, root)
        .orderBy("n_nationkey")
    }),

    // ——— closed-form statistics / experimentation family ———

    // A/B readout on the deterministic user-parity split: 2×2 table,
    // pooled two-proportion z, uncorrected chi-square — every statistic
    // a fixed closed form over exact integer counts
    "q_ab_test" -> ((s, dir) =>
      Stats.abTest(events(s, dir), "user_id", "event_type", "purchase")),

    // stratified A/B: CMH over 3 user strata (decorrelated from the
    // arm hash), uncorrected chi2 + Mantel-Haenszel common odds ratio
    "q_cmh" -> ((s, dir) =>
      Stats.cmhTest(events(s, dir), "user_id", "event_type", "purchase",
        strata = pmod(floor(col("user_id") / 2).cast("long"), lit(3)))),

    // robust location estimates: 10% two-sided trimmed and winsorized
    // means of the order totals per priority
    "q_robust_mean" -> ((s, dir) =>
      Stats.robustMeans(Tables.load(s, dir, "orders"), "o_orderpriority",
        "o_totalprice").orderBy("o_orderpriority")),

    // Kaplan–Meier days-to-purchase survival (right-censored at the
    // user's last event); product-limit via 6-dp-ln exact-decimal sums
    "q_kaplan_meier" -> ((s, dir) =>
      Stats.kaplanMeier(events(s, dir), "user_id", "event_type", "ts",
        "purchase").orderBy("t_days")),

    // Gini concentration of per-customer revenue within each market
    // segment — the inequality scalar next to q_pareto's top-share view
    "q_gini" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      Stats.giniByGroup(
        rev.join(cust, rev("o_custkey") === cust("c_custkey"))
          .select(col("c_mktsegment"), col("o_custkey"), col("revenue")),
        "c_mktsegment", "o_custkey", "revenue")
        .orderBy("c_mktsegment")
    }),

    // EWMA (α = 1/2) smoothing of daily event volume per type — exact
    // dyadic closed form, bit-identical across engines by construction
    "q_ewma" -> ((s, dir) =>
      Stats.ewmaDaily(events(s, dir), "event_type", "ts")
        .orderBy("event_type", "day")),

    // Holt linear-trend 7-day forecast per event type (α=β=½, l₁=y₁,
    // b₁=0); the fold's fixed-order IEEE arithmetic replays in the
    // oracle's recursive CTE step for step
    "q_holt_forecast" -> ((s, dir) =>
      Stats.holtLinearDaily(events(s, dir), "event_type", "ts", horizon = 7)
        .orderBy("event_type", "h")),

    // daily-count autocorrelation at lags 1..7 (seasonality diagnostic:
    // a weekly cycle peaks at lag 7); exact decimal moments per lag
    "q_acf" -> ((s, dir) =>
      Stats.acfDaily(events(s, dir), "ts", maxLag = 7)
        .orderBy("lag")),

    // Spearman rank correlation of daily volume vs daily user breadth —
    // integer series, average ranks in exact 2·avgrank integer space
    "q_spearman" -> ((s, dir) =>
      Stats.spearmanDaily(events(s, dir), "ts", "user_id")),

    // Kendall's tau-b on the same two daily series — the other standard
    // rank correlation, with exact tie-corrected pair counting
    "q_kendall_tau" -> ((s, dir) =>
      Stats.kendallTauDaily(events(s, dir), "ts", "user_id")),

    // design-based causal estimate: 1:1 nearest-neighbor matching on
    // price within returnflag strata, matched-pairs ATT of quantity
    "q_nn_match" -> ((s, dir) =>
      Stats.nnMatchATT(
        Tables.load(s, dir, "lineitem")
          .withColumn("li_id", col("l_orderkey") * 10 + col("l_linenumber")),
        "li_id", Seq("l_returnflag"), "l_extendedprice", "l_quantity",
        treated = col("l_orderkey") % 2 === 0)
        .orderBy("l_returnflag")),

    // Mann–Whitney U on daily mean event values, even-user cohort vs
    // odd (same treated split as q_did): nonparametric shift test in
    // the doubled-rank integer space; tie-corrected normal z
    "q_mann_whitney" -> ((s, dir) =>
      Stats.mannWhitneyDaily(events(s, dir), "ts", "value",
        treated = col("user_id") % 2 === 0)),

    // Mann–Kendall monotone-trend test + Sen's slope over the daily
    // mean event value — S, tie-corrected z, and the exact median of
    // pairwise slopes, all from one calendar-bounded daily frame.
    "q_mann_kendall" -> ((s, dir) =>
      Stats.mannKendallDaily(events(s, dir), "ts", "value")),

    // lead-lag cross-correlation signup → purchase at lags −7..7 (a
    // positive-lag peak = signups lead purchases by that many days)
    "q_ccf" -> ((s, dir) =>
      Stats.ccfDaily(events(s, dir), "event_type", "ts",
        "signup", "purchase", maxLag = 7)
        .orderBy("lag")),

    // Mantel–Cox log-rank test: treated (even user_ids) vs control
    // time-to-purchase curves; O/E/V from the shared risk-set table,
    // per-t terms quantized to 10 dp then exact-decimal-summed
    "q_logrank" -> ((s, dir) =>
      Stats.logRank(events(s, dir), "user_id", "event_type", "ts",
        "purchase", treated = col("user_id") % 2 === 0)),

    // "Fightin' Words" distinctive terms per source: Dirichlet-smoothed
    // z-scored log-odds vs the rest of the corpus, top-5 per source
    "q_log_odds" -> ((s, dir) =>
      graft.operators.Retrieval.logOddsTerms(docs(s, dir), "text", "source")
        .orderBy("source", "term")),

    // per-returnflag OLS of extendedprice on quantity (+ r²): the
    // normal equations over ONE pass of exact decimal moments
    "q_ols" -> ((s, dir) =>
      Stats.olsByGroup(Tables.load(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),

    // full Pearson pair matrix over the four lineitem measures in ONE
    // aggregate pass (6 pair rows unfold from the single moment row)
    "q_corr_matrix" -> ((s, dir) =>
      Stats.pearsonPairs(Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("x_col", "y_col")),

    // Benford first-digit screen on order totals (digit extraction via
    // exact decimal render, not log10; expected masses fixed literals)
    "q_benford" -> ((s, dir) =>
      Stats.benford(Tables.load(s, dir, "orders"), "o_totalprice")
        .orderBy("digit")),

    // Poisson-bootstrap 90% CI for the mean event value per type — B=40
    // one-pass weighted sums (shuffle = types x 40 rows, never events);
    // weights replay from knuthHash + fixed integer CDF thresholds, so
    // the whole interval is oracle-exact
    "q_bootstrap_ci" -> ((s, dir) =>
      Stats.poissonBootstrap(events(s, dir), Seq("event_type"), "event_id",
        "value", replicates = 40)
        .orderBy("event_type")),

    // 2-D skyline (Pareto frontier): parts no other part beats on both
    // size and price; staircase from a 50-row per-size aggregate, no
    // all-pairs dominance join
    "q_skyline" -> ((s, dir) =>
      Stats.skyline2d(
        Tables.load(s, dir, "part").select("p_partkey", "p_size", "p_retailprice"),
        "p_size", "p_retailprice")
        .select(col("p_partkey"), col("p_size"),
          round(col("p_retailprice"), 2).as("p_retailprice"))
        .orderBy("p_size", "p_partkey")),

    // difference-in-differences: even user_ids "treated", cutover = the
    // integer midpoint of the observed time range, outcome = mean event
    // value per cell; all four cells + the estimate from ONE aggregate
    "q_did" -> ((s, dir) =>
      Stats.diffInDiff(events(s, dir), "ts", "value",
        treated = col("user_id") % 2 === 0)),

    // Neyman-optimal allocation of a 1000-row sample budget across
    // market segments (n_h ∝ N_h·σ_h from one exact-moment aggregate) —
    // the profiling step before hashStratifiedSample draws
    "q_neyman" -> ((s, dir) =>
      Stats.neymanAllocation(Tables.load(s, dir, "customer"),
        "c_mktsegment", "c_acctbal", totalN = 1000)
        .orderBy("c_mktsegment")),

    // perceptual-hash image near-dup: 4x4 PNGs built from key
    // arithmetic (1-in-5 keys a one-unit perturbation of the previous
    // key's raster), decoded by the REAL ImageIO codec, aHash'd in
    // exact integer space (bit i: 16·s_i > Σs), paired by the banded
    // Hamming join — bands=4 > maxHamming=3, so pigeonhole makes the
    // candidate set EXACTLY the true pair set and the brute-force
    // DuckDB replay is a full oracle, not a recall bound
    "q_phash_pairs" -> ((s, dir) => {
      import s.implicits._
      val rows = Tables.load(s, dir, "orders").select("o_orderkey")
        .filter(col("o_orderkey") < 600).as[Long].map { k =>
          val base = if (k % 5 == 4) k - 1 else k
          val delta = if (k % 5 == 4) 1 else 0
          // multiplicative mixing so hashes spread (a linear gradient
          // gives every image the same above-average bit pattern and
          // the pair set degenerates to all-pairs)
          val payload = graft.operators.Codecs.encodeImage("png", 4, 4, (x, y) => {
            val i = y * 4 + x
            val d = if (i == 0) delta else 0
            val r = ((base * 31 + i * 97 + d) % 256).toInt
            val g = ((base * 53 + i * 193) % 256).toInt
            val b = ((base * 71 + i * 41) % 256).toInt
            (r << 16) | (g << 8) | b
          })
          graft.operators.Multimodal.MediaRow(k, "image", payload)
        }
      val hashed = graft.operators.Multimodal.perceptualHash(rows, 4, 4)
        .toDF().filter(col("decoded"))
      graft.operators.Dedup.hammingPairs(hashed, "media_id", "phash",
          bits = 16, bands = 4, maxHamming = 3)
        .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
        .orderBy("a_id", "b_id")
    }),

    // same real-raster aHash fixture through the MULTI-INDEX Hamming
    // join (the >1e8-fingerprint scale path): blocks=4, maxHamming=2 →
    // C(4,2)=6 tables keyed on concatenated chunk PAIRS — double-width
    // keys, so ~2^chunk× fewer random candidates than the single-chunk
    // bands while pigeonhole still guarantees the EXACT pair set; the
    // brute-force DuckDB replay is again a full oracle
    "q_phash_multiindex" -> ((s, dir) => {
      import s.implicits._
      val rows = Tables.load(s, dir, "orders").select("o_orderkey")
        .filter(col("o_orderkey") < 600).as[Long].map { k =>
          val base = if (k % 5 == 4) k - 1 else k
          val delta = if (k % 5 == 4) 1 else 0
          val payload = graft.operators.Codecs.encodeImage("png", 4, 4, (x, y) => {
            val i = y * 4 + x
            val d = if (i == 0) delta else 0
            val r = ((base * 31 + i * 97 + d) % 256).toInt
            val g = ((base * 53 + i * 193) % 256).toInt
            val b = ((base * 71 + i * 41) % 256).toInt
            (r << 16) | (g << 8) | b
          })
          graft.operators.Multimodal.MediaRow(k, "image", payload)
        }
      val hashed = graft.operators.Multimodal.perceptualHash(rows, 4, 4)
        .toDF().filter(col("decoded"))
      graft.operators.Dedup.hammingPairsMultiIndex(hashed, "media_id", "phash",
          bits = 16, blocks = 4, maxHamming = 2)
        .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
        .orderBy("a_id", "b_id")
    }),

    // declarative data-quality gate: completeness / uniqueness / bound /
    // domain / referential-integrity constraints in one scan of orders
    "q_dq_suite" -> ((s, dir) =>
      graft.operators.Profiling.dqSuite(
        Tables.load(s, dir, "orders"), Tables.load(s, dir, "customer"),
        keyCol = "o_orderkey", completenessCol = "o_custkey",
        boundCol = "o_totalprice", lowerBound = 0.0,
        domainCol = "o_orderstatus", domain = Seq("F", "P", "O"),
        fkCol = "o_custkey", dimKeyCol = "c_custkey")
        .orderBy("constraint")),

    // longest consecutive-active-day streaks per user (gaps-and-islands
    // via the row_number difference trick — pure date arithmetic)
    "q_gaps_islands" -> ((s, dir) =>
      EventOps.gapsIslands(events(s, dir), "user_id", "ts")
        .orderBy("user_id")),

    // item-item cosine collaborative filtering from co-purchase counts:
    // sim = sup_ab / √(n_a·n_b) on the SAME shared copurchaseSets
    // exchange the other basket queries reuse; sqrt is IEEE-exact so
    // the ranking needs no rounding rescue (rounded anyway for display)
    "q_item_cf" -> ((s, dir) => {
      val sets = copurchaseSets(s, dir)
      val itemN = sets.select(explode(col("ps")).as("item"))
        .groupBy("item").agg(count(lit(1)).as("n_orders"))
      supportPrunedPairs(sets, 2)
        .join(itemN.select(col("item").as("u"), col("n_orders").as("n_u")),
          Seq("u"))
        .join(itemN.select(col("item").as("v"), col("n_orders").as("n_v")),
          Seq("v"))
        .select(col("u"), col("v"), col("sup_ab"),
          round(col("sup_ab").cast("double") /
            sqrt((col("n_u") * col("n_v")).cast("double")), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("u"), col("v"))
        .limit(50)
    }),

    // χ² independence of market segment × order priority over the
    // customer⋈orders fact — the r×c generalization of q_ab_test's 2×2;
    // empty cells folded in via Σ_all e = n (no grid materialization)
    "q_chi2_indep" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      Stats.chi2Independence(
        o.join(broadcast(c), o("o_custkey") === c("c_custkey")),
        "c_mktsegment", "o_orderpriority")
    }),

    // PSI drift of order totals, early era (< 1998) vs late era — the
    // model-input stability gate; per-bucket table + exact-decimal total
    "q_psi" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      Stats.psi(o.filter(col("o_orderdate") < lit("1998-01-01")),
          o.filter(col("o_orderdate") >= lit("1998-01-01")),
          "o_totalprice")
        .orderBy("bucket")
    }),

    // growth accounting: daily active users, first-seen new users, and
    // the running total of distinct users ever seen (first-day trick —
    // no distinct-over-window, one bounded calendar-sized cumsum)
    "q_cumulative_uniques" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
      val newPerDay = ev.groupBy("user_id")
        .agg(to_date(min("ts")).as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      val dau = ev.groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      dau.join(newPerDay, Seq("day"), "left")
        .select(col("day"), col("dau"),
          coalesce(col("new_users"), lit(0L)).as("new_users"))
        .limit(10000) // calendar-bounded; proves the global cumsum safe
        .withColumn("cum_users", sum("new_users").over(
          Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("day")
    }),

    // week-over-week growth per event type — the period-over-period
    // report every ops dashboard runs; integer counts, lag window
    "q_wow_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val weekly = events(s, dir)
        .groupBy(col("event_type"), date_trunc("week", col("ts")).as("week"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("week")
      weekly.withColumn("prev_n", lag("n", 1).over(w))
        .withColumn("wow_pct", when(col("prev_n") > 0,
          round((col("n") - col("prev_n")).cast("double") /
            col("prev_n") * 100, 4)))
        .orderBy("event_type", "week")
    }),

    // 3-step behavioral patterns a→b→c (∃ ordered, not adjacent) —
    // the PrefixSpan level the pair profile trick can't see
    "q_seq3" -> ((s, dir) =>
      EventOps.sequenceTripleSupport(events(s, dir), "user_id",
        "event_type", "ts")
        .orderBy(col("support").desc, col("a"), col("b"), col("c"))
        .limit(50)),

    // snapshot reconciliation across a REAL lake merge: full-outer diff
    // of the time-travel version the upsert displaced vs current —
    // added/changed/unchanged counts + exact net price delta (the
    // audit report a nightly MERGE publishes)
    "q_table_diff" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val root = s"/tmp/graft_tables/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t = LakeTable(s, root, "orders_table_diff", Seq("o_orderkey"))
      t.create(target)
      t.upsert(source)
      val prevV = t.availableVersions.max
      val prev = t.readVersion(prevV).select(col("o_orderkey").as("k"),
        col("o_totalprice").cast("decimal(18,2)").as("p_prev"))
      val cur = t.read.select(col("o_orderkey").as("k"),
        col("o_totalprice").cast("decimal(18,2)").as("p_cur"))
      prev.join(cur, Seq("k"), "full_outer")
        .withColumn("change_type",
          when(col("p_prev").isNull, "added")
            .when(col("p_cur").isNull, "removed")
            .when(col("p_cur") =!= col("p_prev"), "changed")
            .otherwise("unchanged"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n_rows"),
          round((sum(coalesce(col("p_cur"), lit(0))) -
            sum(coalesce(col("p_prev"), lit(0)))).cast("double"), 2)
            .as("net_price_delta"))
        .orderBy("change_type")
    }),

    // reliability diagram + ECE of the quality-model score against the
    // length proxy label — does a 0.8 score MEAN 80%? The calibration
    // gate that decides whether the keep-threshold is trustworthy
    "q_calibration" -> ((s, dir) =>
      Stats.calibration(
        docs(s, dir).select(qualityLogit(col("text")).as("score"),
          (col("n_chars") >= 150).as("label")),
        "score", "label", nBins = 100) // corpus scores cluster ~0.80–0.87
        .orderBy("bin")),

    // linear multi-touch attribution: each purchase splits one unit of
    // credit across the user's touches in the trailing 3 days; 1/k
    // credits rounded then decimal-summed (repeating rationals must
    // not ride float accumulation order)
    "q_attribution" -> ((s, dir) =>
      EventOps.multiTouchAttribution(events(s, dir), "user_id",
        "event_type", "ts", "event_id", "purchase", 3)
        .orderBy("touch_type")),

    // rolling z-scores on the seasonally-adjusted series: q_rolling_
    // zscore ∘ q_seasonal_index — weekend dips stop tripping the
    // detector, genuine same-weekday spikes still do
    "q_deseasonal_z" -> ((s, dir) =>
      EventOps.deseasonalizedZScore(events(s, dir), "event_type", "ts")
        .orderBy("event_type", "day")),

    // Fisher-style class-separation profile of the labeled embeddings:
    // intra = mean distance to the OWN-label centroid, inter = distance
    // of that centroid to the GLOBAL centroid (between-class scatter) —
    // deliberately centroid-vs-global rather than centroid-pairs, so
    // every join is an equi-join on (label, pos)/(pos) and nothing
    // cross-products, at any number of classes. The embedding-quality
    // gate before training a classifier head on the corpus.
    "q_class_separation" -> ((s, dir) => {
      val d = emb(s, dir)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos"),
          col("col").cast("double").as("v"))
      val cl = d.groupBy("label", "pos").agg(avg("v").as("m"))
      val cg = d.groupBy("pos").agg(avg("v").as("g"))
      val dist = d.join(broadcast(cl), Seq("label", "pos"))
        .withColumn("sq", (col("v") - col("m")) * (col("v") - col("m")))
        .groupBy("vec_id", "label")
        .agg(round(sqrt(sum("sq")), 4).cast("decimal(18,4)").as("dist"))
      val intra = dist.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(sum("dist").cast("double") / count(lit(1)), 4).as("intra"))
      val inter = cl.join(broadcast(cg), Seq("pos"))
        .withColumn("sq", (col("m") - col("g")) * (col("m") - col("g")))
        .groupBy("label").agg(round(sqrt(sum("sq")), 4).as("inter"))
      intra.join(inter, Seq("label"))
        .withColumn("separation", round(col("inter") / col("intra"), 4))
        .orderBy("label")
    }),

    // effective dimensionality of the embedding space: participation
    // ratio PR = (Σ var_d)² / Σ var_d² over per-dimension variances —
    // the eigen-free collapse detector (PR ≈ d for isotropic vectors,
    // PR ≪ d when the space has collapsed onto a few directions).
    // One unnest + one per-dim agg + one single-row fold; per-dim
    // variances rounded at 6 dp before the decimal fold so the final
    // ratio is order-free on both engines
    "q_effective_dim" -> ((s, dir) => {
      val d = emb(s, dir)
        .select(posexplode(col("embedding")))
        .select(col("pos"), col("col").cast("double").as("v"))
      val perDim = d.groupBy("pos")
        .agg(count(lit(1)).as("n"), avg("v").as("m"),
          avg(col("v") * col("v")).as("m2"))
        .select(col("pos"),
          round(col("m2") - col("m") * col("m"), 6)
            .cast("decimal(18,6)").as("variance"))
      perDim.agg(
        count(lit(1)).as("n_dims"),
        round(sum("variance").cast("double"), 6).as("total_variance"),
        round(
          (sum("variance").cast("double") * sum("variance").cast("double")) /
            sum((col("variance") * col("variance")).cast("decimal(38,12)"))
              .cast("double"), 4).as("participation_ratio"))
    }),

    // per-dimension embedding drift between two corpus eras (vec_id
    // parity as the deterministic era split): |Δmean| / pooled sd per
    // dim, top-10 drifted dims — the vector-space PSI analog that
    // catches an upstream encoder change before it poisons retrieval
    "q_embed_drift" -> ((s, dir) => {
      val d = emb(s, dir)
        .select(pmod(col("vec_id"), lit(2)).as("era"),
          posexplode(col("embedding")))
        .select(col("era"), col("pos"), col("col").cast("double").as("v"))
      val stats = d.groupBy("pos")
        .agg(
          avg(when(col("era") === 0, col("v"))).as("m0"),
          avg(when(col("era") === 1, col("v"))).as("m1"),
          avg(col("v") * col("v")).as("m2"),
          avg("v").as("m"))
      stats
        .withColumn("pooled_sd", sqrt(col("m2") - col("m") * col("m")))
        .withColumn("drift_z",
          round(abs(col("m1") - col("m0")) / col("pooled_sd"), 4))
        .select(col("pos"), round(col("m0"), 4).as("mean_a"),
          round(col("m1"), 4).as("mean_b"), col("drift_z"))
        .orderBy(col("drift_z").desc, col("pos"))
        .limit(10)
    }),

    // classic Dn retention (D1/D7/D14) per signup-day cohort — the
    // growth dashboard's standard curve; pure integer date arithmetic
    // over the same first-day reduction as q_cumulative_uniques
    "q_dn_retention" -> ((s, dir) => {
      val ev = events(s, dir)
      val fd = ev.groupBy("user_id").agg(to_date(min("ts")).as("cohort"))
      val act = ev.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val cohortSize = fd.groupBy("cohort").agg(count(lit(1)).as("n_users"))
      act.join(fd, Seq("user_id"))
        .select(col("user_id"), col("cohort"),
          datediff(col("day"), col("cohort")).as("k"))
        .filter(col("k").isin(1, 7, 14))
        .groupBy("cohort", "k")
        .agg(count(lit(1)).as("n_active"))
        .join(cohortSize, Seq("cohort"))
        .select(col("cohort"), col("k"), col("n_active"), col("n_users"),
          round(col("n_active").cast("double") / col("n_users"), 4)
            .as("retention"))
        .orderBy("cohort", "k")
    }),

    // experiment sample-size planning from the measured baseline rate:
    // n/arm = ⌈(z_{α/2}+z_β)²·2p̄(1−p̄)/δ²⌉ at α=.05, power=.8 for three
    // candidate absolute lifts — the "how long must this test run"
    // readout next to q_ab_test; z constants are fixed 6-dp literals
    "q_ab_power" -> ((s, dir) => {
      val users = events(s, dir).groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      val base = users.agg(count(lit(1)).as("n_users"),
        sum("converted").as("n_conv"))
      val p = col("n_conv").cast("double") / col("n_users")
      val z = lit(1.959964) + lit(0.841621) // z_{.975} + z_{.80}
      base.select(explode(array(
          lit(0.02), lit(0.05), lit(0.10)).cast("array<double>"))
          .as("delta"), col("n_users"), col("n_conv"))
        .withColumn("base_rate", round(p, 6))
        .withColumn("n_per_arm",
          ceil(z * z * lit(2.0) * p * (lit(1.0) - p) /
            (col("delta") * col("delta"))).cast("long"))
        .select(col("delta"), col("n_users"), col("n_conv"),
          col("base_rate"), col("n_per_arm"))
        .orderBy("delta")
    }),

    // changepoint LOCATION by binary segmentation: the split day that
    // minimizes SSE_left + SSE_right of each type's daily series —
    // where q_cusum says "a level shift exists", this says WHERE.
    // All candidate costs come from integer prefix sums (one window),
    // selection by (rounded cost, day) so the argmin is cross-engine
    "q_changepoint" -> ((s, dir) =>
      EventOps.binaryChangepoint(events(s, dir), "event_type", "ts")
        .orderBy("event_type")),

    // median with a resampling CI — 20 DETERMINISTIC half-samples by
    // the md5 parity of (replicate, custkey), each half's exact median
    // in one pass of conditional percentiles, spread reported as the
    // half-sample standard error (rounded medians → exact moments)
    "q_median_ci" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("rev"))
      // 4-dp round: midpoints of 2-dp values are exact at 3 dp, so no
      // boundary digit exists and interpolation ulp cannot flip it
      val halves = (0 until 20).map { b =>
        round(expr(
          s"""percentile(case when
              conv(substring(md5(concat('$b|', cast(o_custkey as string))), 1, 15), 16, 10) % 2 = 0
              then rev end, 0.5)"""), 4).cast("decimal(18,4)").as(s"m$b")
      }
      val aggCols = round(expr("percentile(rev, 0.5)"), 2).as("median") +:
        halves
      val ms = rev.agg(aggCols.head, aggCols.tail: _*)
      val cols = (0 until 20).map(b => col(s"m$b"))
      val k = lit(20.0)
      val mean = cols.reduce(_ + _).cast("double") / k
      // squares in DOUBLE over a fixed left-associated single-row
      // chain — deterministic on both engines (and DuckDB's int64
      // decimal(18) multiply would overflow on million-scale medians)
      val sumsq = cols.map(c => c.cast("double") * c.cast("double"))
        .reduce(_ + _)
      ms.select(col("median"),
        round(mean, 2).as("half_sample_mean"),
        round(sqrt(sumsq / k - mean * mean), 4).as("half_sample_se"))
    }),

    // cross-sell sequences at the ITEM level: customer bought part X
    // in an earlier order, then part Y in a LATER order — the retail
    // twin of q_seq_patterns, bounded to the top-20 parts by order
    // count (the fixed-vocabulary discipline that keeps the per-
    // customer pair profile ≤ 20 rows at any scale); first-purchase
    // profile join, X.first < Y.first, support = customers
    "q_cross_sell" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val topParts = li.select(col("l_orderkey"), col("l_partkey"))
        .distinct()
        .groupBy("l_partkey").agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("l_partkey")).limit(20)
        .select("l_partkey")
      val firstBuy = li
        .join(broadcast(topParts), Seq("l_partkey"), "left_semi")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .agg(min("o_orderdate").as("first_dt"))
      val a = firstBuy.select(col("cust"), col("part").as("x"),
        col("first_dt").as("xd"))
      val b = firstBuy.select(col("cust"), col("part").as("y"),
        col("first_dt").as("yd"))
      a.join(b, Seq("cust")).filter(col("xd") < col("yd"))
        .groupBy("x", "y").agg(count(lit(1)).as("support"))
        .orderBy(col("support").desc, col("x"), col("y"))
        .limit(30)
    }),

    // log-log price elasticity per return flag: OLS of ln(quantity) on
    // ln(unit price) — the econometrics readout on the star schema;
    // 6-dp lns into exact decimal moments (the zipf/heaps discipline)
    "q_price_elasticity" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      val x = round(log(round(col("l_extendedprice").cast("double") /
          col("l_quantity").cast("double"), 2)), 6).cast("decimal(18,6)")
      val y = round(log(col("l_quantity").cast("double")), 6)
        .cast("decimal(18,6)")
      val m = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * x).cast("decimal(38,12)")).as("sxx"),
        sum((y * y).cast("decimal(38,12)")).as("syy"),
        sum((x * y).cast("decimal(38,12)")).as("sxy"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double")
      val sy = col("sy").cast("double")
      val cov = n * col("sxy").cast("double") - sx * sy
      val vx = n * col("sxx").cast("double") - sx * sx
      val vy = n * col("syy").cast("double") - sy * sy
      m.select(col("l_returnflag"), col("n"),
        round(cov / vx, 4).as("elasticity"),
        round(cov * cov / (vx * vy), 4).as("r2"))
        .orderBy("l_returnflag")
    }),

    // anomaly ENSEMBLE: the plain rolling z-score, the seasonally-
    // adjusted z-score, and a same-weekday spike rule vote per
    // (type, day) — consensus ≥ 2 is the page-worthy alert, a single
    // vote is triage noise; the production pattern that keeps one
    // detector's blind spot from paging (or silencing) on its own
    "q_anomaly_consensus" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
      val plain = EventOps.rollingZScore(ev, "event_type", "ts")
        .select(col("event_type"), col("day"), col("n"),
          coalesce(col("is_anomaly"), lit(false)).cast("int").as("v_plain"))
      val deseason = EventOps.deseasonalizedZScore(ev, "event_type", "ts")
        .select(col("event_type"), col("day"),
          coalesce(col("is_anomaly"), lit(false)).cast("int")
            .as("v_deseason"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val wow = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("lag7", lag("n", 7).over(w))
        .select(col("event_type"), col("day"),
          coalesce(col("n") > lit(2) * col("lag7"), lit(false))
            .cast("int").as("v_wow"))
      plain.join(deseason, Seq("event_type", "day"))
        .join(wow, Seq("event_type", "day"))
        .withColumn("votes",
          col("v_plain") + col("v_deseason") + col("v_wow"))
        .select(col("event_type"), col("day"), col("n"), col("v_plain"),
          col("v_deseason"), col("v_wow"), col("votes"))
        .orderBy("event_type", "day")
    }),

    // RFM customer scoring WITHOUT a global ranking window: quintile
    // cutoffs come from one exact-percentile aggregate broadcast back,
    // each score = 1 + Σ(x > cutoff) — the q_pareto threshold
    // discipline applied to the classic segmentation report
    "q_rfm" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val today = o.agg(to_date(max("o_orderdate")).as("today"))
      val rfm = o.crossJoin(broadcast(today))
        .groupBy("o_custkey")
        .agg(min(datediff(col("today"), to_date(col("o_orderdate"))))
          .as("recency"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
      def cuts(c: String) = Seq(0.2, 0.4, 0.6, 0.8).map(p =>
        expr(s"percentile(cast($c as double), $p)").as(s"${c}_q${(p * 100).toInt}"))
      val th = rfm.agg((cuts("recency") ++ cuts("frequency") ++
        cuts("monetary")).head,
        (cuts("recency") ++ cuts("frequency") ++ cuts("monetary")).tail: _*)
      def score(c: String, reversed: Boolean) = {
        val s0 = Seq(20, 40, 60, 80).map(q =>
          when(col(c).cast("double") > col(s"${c}_q$q"), 1).otherwise(0))
          .reduce(_ + _) + 1
        if (reversed) lit(6) - s0 else s0 // low recency = good
      }
      rfm.crossJoin(broadcast(th))
        .filter(col("o_custkey") % 50 === 0) // bounded output slice
        .select(col("o_custkey"), col("recency"), col("frequency"),
          round(col("monetary").cast("double"), 2).as("monetary"),
          score("recency", reversed = true).as("r_score"),
          score("frequency", reversed = false).as("f_score"),
          score("monetary", reversed = false).as("m_score"))
        .orderBy("o_custkey")
    }),

    // cohort LTV curve: cumulative revenue per customer by order-age
    // year within each first-order-year cohort — the growth-finance
    // payback view; exact decimal sums, cohort-partitioned prefix
    "q_ltv_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
          col("o_totalprice").cast("decimal(18,2)").as("rev"))
      val cohort = o.groupBy("o_custkey").agg(min("yr").as("cohort"))
      val byAge = o.join(cohort, Seq("o_custkey"))
        .groupBy(col("cohort"), (col("yr") - col("cohort")).as("age"))
        .agg(sum("rev").as("arev"))
      val size = cohort.groupBy("cohort").agg(count(lit(1)).as("n_customers"))
      val w = Window.partitionBy("cohort").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byAge
        .withColumn("cum_rev", sum("arev").over(w))
        .join(broadcast(size), Seq("cohort"))
        .select(col("cohort"), col("age"), col("n_customers"),
          round(col("cum_rev").cast("double") / col("n_customers"), 2)
            .as("cum_ltv_per_customer"))
        .orderBy("cohort", "age")
    }),

    // CUPED variance reduction (Deng et al. 2013): per-user pre-period
    // activity x (days 1–15) as the covariate for the post-period
    // metric y (days 16+); θ = cov/var(x) from ONE pass of exact
    // decimal moments, reported with the achieved variance reduction —
    // the experimentation-platform readout that shrinks required
    // sample sizes without touching the treatment effect
    "q_cuped" -> ((s, dir) => {
      val ev = events(s, dir)
      val anchor = ev.agg(date_add(to_date(min("ts")), 15).as("cut"))
      val xy = ev.crossJoin(broadcast(anchor))
        .groupBy("user_id")
        .agg(sum(when(to_date(col("ts")) < col("cut"), 1L).otherwise(0L))
          .as("x"),
          sum(when(to_date(col("ts")) >= col("cut"), 1L).otherwise(0L))
            .as("y"))
      val m = xy.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      val n = col("n").cast("double")
      val mx = col("sx").cast("double") / n
      val my = col("sy").cast("double") / n
      val varX = col("sxx").cast("double") / n - mx * mx
      val varY = col("syy").cast("double") / n - my * my
      val covXY = col("sxy").cast("double") / n - mx * my
      m.select(col("n").as("n_users"),
        round(covXY / varX, 6).as("theta"),
        round(varY, 4).as("var_y"),
        round(varY - covXY * covXY / varX, 4).as("var_adjusted"),
        round((covXY * covXY / varX) / varY * 100, 2)
          .as("reduction_pct"))
    }),

    // share-of-parent rollup: nation revenue as a share of its region,
    // region as a share of the total — the hierarchical BI report;
    // exact decimal sums at every level, shares as rounded doubles
    "q_share_of_parent" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("rev"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val reg = Tables.load(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))
      val byNation = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name").agg(sum("rev").as("nrev"))
      val byRegion = byNation.groupBy("r_name")
        .agg(sum("nrev").as("rrev"))
      val total = byRegion.agg(sum("rrev").as("trev"))
      byNation.join(broadcast(byRegion), Seq("r_name"))
        .crossJoin(broadcast(total))
        .select(col("r_name"), col("n_name"),
          round(col("nrev").cast("double"), 2).as("revenue"),
          round(col("nrev").cast("double") / col("rrev").cast("double"), 6)
            .as("share_of_region"),
          round(col("rrev").cast("double") / col("trev").cast("double"), 6)
            .as("region_share_of_total"))
        .orderBy("r_name", "n_name")
    }),

    // Newman modularity of the label-propagation communities on the
    // supplier–part graph: Q = Σ_c (e_c/m − (d_c/2m)²) — the "are these
    // communities real" quality score on top of q_label_prop, computed
    // from three equi-join aggregates (within-community edges, degree
    // sums, |E|); per-community terms rounded then decimal-summed
    "q_modularity" -> ((s, dir) => {
      val e0 = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_partkey")).distinct()
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
      val labels = Graph.labelPropagation(e0, "src", "dst",
        iterations = 2, dedupEdges = false)
      val m = e0.agg(count(lit(1)).as("m_edges"))
      val ec = e0
        .join(labels.select(col("node").as("src"), col("label").as("ls")),
          Seq("src"))
        .join(labels.select(col("node").as("dst"), col("label").as("ld")),
          Seq("dst"))
        .filter(col("ls") === col("ld"))
        .groupBy(col("ls").as("label")).agg(count(lit(1)).as("e_in"))
      val deg = e0.select(col("src").as("node"))
        .unionByName(e0.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val dc = labels.join(deg, Seq("node"))
        .groupBy("label")
        .agg(sum("d").as("d_sum"), count(lit(1)).as("n_members"))
      val halfD = col("d_sum").cast("double") / (lit(2) * col("m_edges"))
      val terms = dc.join(ec, Seq("label"), "left")
        .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
        .crossJoin(broadcast(m))
        .withColumn("q_term", round(
          col("e_in").cast("double") / col("m_edges") - halfD * halfD, 6))
      val q = terms.agg(
        round(sum(col("q_term").cast("decimal(18,6)")).cast("double"), 6)
          .as("modularity"))
      terms.crossJoin(broadcast(q))
        .select(col("label"), col("n_members"), col("e_in"), col("d_sum"),
          col("q_term"), col("modularity"))
        .orderBy(col("n_members").desc, col("label"))
        .limit(20)
    }),

    // ——— ML feature-engineering family ———

    // time-series lag/rolling features per (type, day): lag-1, lag-7,
    // trailing-7 mean — the standard forecasting feature block; counts
    // are integers so every feature is exact (mean = int sum / 7.0)
    "q_lag_features" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val w7 = w.rowsBetween(-6, Window.currentRow)
      daily
        .withColumn("lag_1", lag("n", 1).over(w))
        .withColumn("lag_7", lag("n", 7).over(w))
        .withColumn("roll7_mean",
          when(count(lit(1)).over(w7) === 7,
            round(sum("n").over(w7).cast("double") / lit(7.0), 4)))
        .orderBy("event_type", "day")
    }),

    // leave-one-out target encoding of market segment by order total —
    // the leakage-safe categorical encoder: each row's code excludes
    // its own target, (Σ_seg − x)/(n_seg − 1), all in exact decimal
    "q_target_encoding" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("y"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      val seg = joined.groupBy("c_mktsegment")
        .agg(sum("y").as("sy"), count(lit(1)).as("ny"))
      joined.join(broadcast(seg), Seq("c_mktsegment"))
        .filter(col("o_orderkey") % 100 === 0) // bounded output slice
        .select(col("o_orderkey"), col("c_mktsegment"),
          round(col("y").cast("double"), 2).as("y"),
          // divide in DOUBLE: decimal division scale/rounding rules are
          // engine-specific, double division is IEEE on both
          round((col("sy").cast("double") - col("y").cast("double")) /
            (col("ny") - 1), 4).as("loo_encoding"))
        .orderBy("o_orderkey")
    }),

    // seasonal-naive forecast with backtest: forecast(d) = seasonal
    // index(dow) × trailing-7 deseasonalized mean, scored by MAE over
    // the fully-framed days — the closed-form baseline every real
    // forecaster must beat; absolute errors rounded then decimal-summed
    "q_seasonal_forecast" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val byDow = daily
        .groupBy(col("event_type"), (weekday(col("day")) + 1).as("dow"))
        .agg(sum("n").as("s_dow"), count(lit(1)).as("d_dow"))
      val totals = daily.groupBy(col("event_type"))
        .agg(sum("n").as("s_all"), count(lit(1)).as("d_all"))
      val idx = byDow.join(broadcast(totals), Seq("event_type"))
        .select(col("event_type"), col("dow"),
          round((col("s_dow").cast("double") / col("d_dow")) /
            (col("s_all").cast("double") / col("d_all")), 4).as("sidx"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val wPrev7 = w.rowsBetween(-7, -1)
      val withNd = daily
        .withColumn("dow", weekday(col("day")) + 1)
        .join(broadcast(idx), Seq("event_type", "dow"))
        .withColumn("nd", round(col("n").cast("double") / col("sidx"), 4)
          .cast("decimal(18,4)"))
      val scored = withNd
        .withColumn("base",
          when(count(lit(1)).over(wPrev7) === 7,
            round(sum("nd").over(wPrev7).cast("double") / lit(7.0), 4)))
        .withColumn("forecast", round(col("base") * col("sidx"), 2))
        .withColumn("abs_err",
          round(abs(col("n").cast("double") - col("forecast")), 2)
            .cast("decimal(18,2)"))
      scored.filter(col("forecast").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          round(sum("abs_err").cast("double") / count(lit(1)), 4).as("mae"),
          // split-conformal 90% interval half-width: the empirical p90
          // of backtest |errors| (exact interpolated percentile over
          // the calendar-bounded error set)
          round(expr("percentile(cast(abs_err as double), 0.9)"), 4)
            .as("pi90_halfwidth"))
        .orderBy("event_type")
    }),

    // Laplace-mechanism noisy counts over (lang, source) — the DP
    // release plumbing next to q_k_anonymity (hash-seeded u-draws make
    // the mechanism gate-replayable; production swaps in a CSPRNG)
    "q_dp_counts" -> ((s, dir) =>
      Stats.dpNoisyCounts(docs(s, dir), Seq("lang", "source"),
        epsilon = 1.0)
        .orderBy("lang", "source")),

    // STREAMING daily anomaly detection: each completed day z-scored
    // against the expanding stats of all prior completed days, emitted
    // the moment the watermark strictly passes the day boundary —
    // O(1) state per key (Σn, Σn², #days + open-day counts), never a
    // history replay; the monitoring detector as a live stream
    "q_stream_anomaly" -> ((s, dir) => {
      val name = s"stream_anom_${System.nanoTime()}"
      val stream = graft.streaming.Streams.readTableStream(s, dir, "events")
      val drained = withSQLConf(s, "spark.sql.shuffle.partitions", "8") {
        graft.streaming.Streams.drainAppend(
          graft.streaming.Streams.anomalyDetect(stream), name)
      }
      drained.orderBy("event_type", "day")
    }),

    // degree assortativity of the supplier–part graph: Pearson
    // correlation of endpoint degrees over the symmetrized edge list
    // (negative = hubs attach to leaves, the usual bipartite signature)
    // — exact decimal moments of integer degrees, one edges⋈degrees
    // equi-join per side
    "q_assortativity" -> ((s, dir) => {
      val e0 = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_partkey")).distinct()
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
      val sym = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      val deg = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("d"))
      val pairs = sym
        .join(deg.select(col("node").as("src"), col("d").as("dx")),
          Seq("src"))
        .join(deg.select(col("node").as("dst"), col("d").as("dy")),
          Seq("dst"))
        .select(col("dx").cast("decimal(18,0)").as("x"),
          col("dy").cast("decimal(18,0)").as("y"))
      val m = pairs.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double")
      val sy = col("sy").cast("double")
      val cov = n * col("sxy").cast("double") - sx * sy
      val vx = n * col("sxx").cast("double") - sx * sx
      val vy = n * col("syy").cast("double") - sy * sy
      m.select(col("n").as("n_directed_edges"),
        round(cov / sqrt(vx * vy), 6).as("assortativity"))
    }),

    // Heaps'-law vocabulary growth: V(n) ≈ K·n^β measured at 10
    // doc-id-decile checkpoints from token FIRST-OCCURRENCE docs (no
    // per-prefix rescan — one min-agg per token, one prefix fold),
    // β from the ln-ln OLS — the corpus-growth twin of q_zipf_fit
    "q_heaps_fit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = docs(s, dir).select(col("doc_id"), explode(
        graft.functions.TextExpressions.wordTokens(col("text"))).as("w"))
      val maxId = docs(s, dir).agg(max("doc_id").as("max_id"))
      val firstDoc = toks.groupBy("w").agg(min("doc_id").as("fd"))
      // decile bucket of a doc id — tokens/vocab fold into 10 buckets
      // by AGGREGATION (never a cutoff theta-join), cumulated by a
      // bounded 10-row prefix window
      def decile(c: Column) = (floor(c.cast("double") * 10 /
        (col("max_id") + 1)) + 1).cast("int")
      val vNew = firstDoc.crossJoin(broadcast(maxId))
        .groupBy(decile(col("fd")).as("dec")).agg(count(lit(1)).as("dv"))
      val tNew = toks.crossJoin(broadcast(maxId))
        .groupBy(decile(col("doc_id")).as("dec"))
        .agg(count(lit(1)).as("dt"))
      val wc = Window.orderBy("dec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pts = vNew.join(tNew, Seq("dec"), "full_outer")
        .select(col("dec"), coalesce(col("dv"), lit(0L)).as("dv"),
          coalesce(col("dt"), lit(0L)).as("dt"))
        .limit(10000)
        .withColumn("v", sum("dv").over(wc))
        .withColumn("n_toks", sum("dt").over(wc))
        .filter(col("v") > 0 && col("n_toks") > 0)
      val x = round(log(col("n_toks").cast("double")), 6)
        .cast("decimal(18,6)")
      val y = round(log(col("v").cast("double")), 6).cast("decimal(18,6)")
      val m = pts.agg(count(lit(1)).as("k"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * x).cast("decimal(38,12)")).as("sxx"),
        sum((x * y).cast("decimal(38,12)")).as("sxy"))
      val k = col("k").cast("double")
      val sx = col("sx").cast("double")
      val sy = col("sy").cast("double")
      m.select(col("k").as("n_checkpoints"),
        round((k * col("sxy").cast("double") - sx * sy) /
          (k * col("sxx").cast("double") - sx * sx), 4).as("heaps_beta"))
    }),

    // Zipf rank-frequency fit over the top-100 corpus terms: OLS of
    // ln f on ln rank (6-dp-rounded lns → exact decimal moments) —
    // natural text sits near slope −1; a synthetic or deduplicate-
    // starved corpus shows up immediately in the slope and r²
    "q_zipf_fit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val top = docs(s, dir)
        .select(explode(
          graft.functions.TextExpressions.wordTokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("w")).limit(100)
      val ranked = top.withColumn("rank",
        row_number().over(Window.orderBy(col("f").desc, col("w"))))
      val x = round(log(col("rank").cast("double")), 6)
        .cast("decimal(18,6)")
      val y = round(log(col("f").cast("double")), 6).cast("decimal(18,6)")
      val m = ranked.agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * x).cast("decimal(38,12)")).as("sxx"),
        sum((y * y).cast("decimal(38,12)")).as("syy"),
        sum((x * y).cast("decimal(38,12)")).as("sxy"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double")
      val sy = col("sy").cast("double")
      val cov = n * col("sxy").cast("double") - sx * sy
      val vx = n * col("sxx").cast("double") - sx * sx
      val vy = n * col("syy").cast("double") - sy * sy
      m.select(col("n").as("n_terms"),
        round(cov / vx, 4).as("zipf_slope"),
        round(cov * cov / (vx * vy), 4).as("r2"))
    }),

    // ROC AUC of the quality score vs the length label — the
    // Mann-Whitney form over per-DISTINCT-SCORE aggregates (tie-aware:
    // each positive credits negatives-below + half the same-score
    // negatives), all integer arithmetic until one final division; the
    // third leg of the classifier-eval family (confusion, calibration)
    "q_auc" -> ((s, dir) =>
      Stats.rocAuc(
        docs(s, dir).select(qualityLogit(col("text")).as("score"),
          (col("n_chars") >= 150).as("label")),
        "score", "label")),

    // decile gains/lift table for the same score/label pair q_auc
    // compresses to one number: exact percentile thresholds (no global
    // sort), map-side band assignment, 10-row cumulative frame
    "q_gains" -> ((s, dir) =>
      Stats.gainsTable(
        docs(s, dir).select(qualityLogit(col("text")).as("score"),
          (col("n_chars") >= 150).as("label")),
        "score", "label", buckets = 10)
        .orderBy("band")),

    // NDCG@10 of the BM25 ranking with graded relevance (capped query-
    // term frequency): DCG/IDCG over the bounded top-k frame, gains
    // rounded then decimal-summed — completes the retrieval-eval family
    // (MRR/precision/recall) with the graded metric
    "q_ndcg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val terms = Seq("spark", "hash", "window")
      val d = docs(s, dir)
      val top = Retrieval.bm25TopK(d, "doc_id", "text", terms, 10)
      val rel = d.select(col("doc_id"), explode(
          graft.functions.TextExpressions.wordTokens(col("text"))).as("w"))
        .filter(col("w").isin(terms: _*))
        .groupBy("doc_id").agg(least(lit(7L), count(lit(1))).as("rel"))
      val ranked = top.join(broadcast(rel), Seq("doc_id"), "left")
        .withColumn("rel", coalesce(col("rel"), lit(0L)))
        // re-assert the top-k bound ABOVE the join: a left join's
        // maxRows is unknowable to the planner, and the global ranking
        // windows below are only sanctioned over a provably tiny frame
        .limit(10000)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .withColumn("irank", row_number().over(
          Window.orderBy(col("rel").desc, col("doc_id"))))
      def gain(rankCol: Column) = round(
        (pow(lit(2.0), col("rel")) - 1.0) /
          (log(rankCol + 1.0) / log(lit(2.0))), 6).cast("decimal(18,6)")
      ranked.agg(
          round(sum(gain(col("rank"))).cast("double"), 4).as("dcg"),
          round(sum(gain(col("irank"))).cast("double"), 4).as("idcg"))
        .select(col("dcg"), col("idcg"),
          round(col("dcg") / col("idcg"), 4).as("ndcg"))
    }),

    // feature scaling (min-max + z-score) per group from ONE stats pass
    // attached by broadcast — the ML-preprocessing primitive; mean/sd
    // from exact decimal Σx/Σx², output bounded to a keyed slice
    "q_feature_scaling" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice").cast("decimal(18,2)").as("x"))
      val stats = li.groupBy("l_returnflag").agg(
        min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"),
        count(lit(1)).as("n"),
        sum("x").as("sx"),
        sum((col("x") * col("x")).cast("decimal(38,4)")).as("sxx"))
      val mean = col("sx").cast("double") / col("n")
      val variance = col("sxx").cast("double") / col("n") - mean * mean
      li.join(broadcast(stats), Seq("l_returnflag"))
        .filter(col("l_orderkey") % 500 === 0) // bounded output slice
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          round(col("x").cast("double"), 2).as("x"),
          round((col("x").cast("double") - col("mn")) /
            (col("mx") - col("mn")), 6).as("minmax"),
          round((col("x").cast("double") - mean) / sqrt(variance), 4)
            .as("zscore"))
        // (orderkey, linenumber) is NOT unique in this synthetic data —
        // total tiebreak through flag and value
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "x")
    }),

    // weight-of-evidence / information value of market segment vs the
    // has-urgent-order target — the credit-scoring feature screen;
    // +0.5 Laplace smoothing, ln rounded at 4 dp, IV terms rounded
    // then decimal-summed
    "q_woe_iv" -> ((s, dir) => {
      val tgt = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(when(col("o_orderpriority") === "1-URGENT", 1L)
          .otherwise(0L)).as("y"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val bins = c.join(tgt, c("c_custkey") === tgt("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum("y").as("g"), sum(lit(1L) - col("y")).as("b"))
      val tot = bins.agg(sum("g").as("gt"), sum("b").as("bt"),
        count(lit(1)).as("k"))
      val pg = (col("g").cast("double") + 0.5) /
        (col("gt") + lit(0.5) * col("k"))
      val pb = (col("b").cast("double") + 0.5) /
        (col("bt") + lit(0.5) * col("k"))
      val woe = round(log(pg / pb), 4)
      val terms = bins.crossJoin(broadcast(tot))
        .withColumn("woe", woe)
        .withColumn("iv_term", round((pg - pb) * col("woe"), 6)
          .cast("decimal(18,6)"))
      val iv = terms.agg(
        round(sum("iv_term").cast("double"), 6).as("iv_total"))
      terms.crossJoin(broadcast(iv))
        .select(col("c_mktsegment"), col("g"), col("b"), col("woe"),
          col("iv_total"))
        .orderBy("c_mktsegment")
    }),

    // burstiness profile per event type: Fano factor (variance/mean of
    // daily counts — 1 ≈ Poisson, ≫1 bursty) from exact integer sums
    "q_burstiness" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val mean = col("total").cast("double") / col("n_days")
      val variance = col("sumsq").cast("double") / col("n_days") -
        mean * mean
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("n").as("total"),
          sum(col("n") * col("n")).as("sumsq"))
        .select(col("event_type"), col("n_days"), col("total"),
          round(mean, 4).as("mean_daily"),
          round(variance, 4).as("var_daily"),
          round(variance / mean, 4).as("fano"))
        .orderBy("event_type")
    }),

    // language-ID confusion matrix + accuracy against the stored lang
    // labels — the classifier-eval readout over the SAME langId scorer
    // q_lang_id exposes (shared oracle body, so they can never drift)
    "q_lang_confusion" -> ((s, dir) => {
      val p = docs(s, dir)
        .select(langId(col("text")).as("pred_lang"), col("lang"))
      val cm = p.groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      val acc = p.agg(round(
        sum(when(col("lang") === col("pred_lang"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 4).as("accuracy"))
      cm.crossJoin(broadcast(acc)).orderBy("lang", "pred_lang")
    }),
  )

  /** Per-doc quality-score oracle chain (source, n_chars, score) —
    * shared verbatim by q_quality_model / q_calibration / q_auc so the
    * scorer replay can never drift between its consumers. */
  private val qualityScoreOracleSql: String =
    """WITH base AS (
           SELECT source, n_chars, text,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS toks,
                  length(text) AS n_char
           FROM documents),
         m AS (
           SELECT source, n_chars, len(toks) AS n_tok,
                  len(list_filter(toks, t -> list_contains(
                      ['the','a','an','and','or','of','to','in','is','it',
                       'that','for','on','with','as','this','by'], t)))
                    AS sw_hits,
                  n_char - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
                    AS n_punct,
                  n_char - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                    AS n_alpha,
                  n_char - length(regexp_replace(text, '[0-9]', '', 'g'))
                    AS n_digit,
                  greatest(n_char, 1) AS len1
           FROM base)
         SELECT source, n_chars,
                ROUND(1.0 / (1.0 + exp(-(
                  -1.0
                  + 1.2 * (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0
                                WHEN n_tok BETWEEN 3 AND 9 THEN 0.5
                                ELSE 0.0 END)
                  - 2.0 * (n_punct * 1.0 / len1)
                  + 1.5 * (n_alpha * 1.0 / len1)
                  + 2.0 * (sw_hits * 1.0 / greatest(n_tok, 1))
                  - 1.0 * (n_digit * 1.0 / len1)))), 6) AS score
         FROM m"""

  /** q_lang_id oracle body (no ORDER BY) — shared verbatim with
    * q_lang_confusion so the two can never drift. */
  private val langIdOracleSql: String =
    """WITH base AS (
           SELECT doc_id, text, lang,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS toks,
                  greatest(length(text), 1) AS n_char
           FROM documents),
         scored AS (
           SELECT doc_id, lang, text, n_char,
                  greatest(len(toks), 1) AS n_tok,
                  len(list_filter(toks, t -> list_contains(
                    ['der','die','das','und','ist','von','mit','den','nicht','ein'], t))) AS h_de,
                  len(list_filter(toks, t -> list_contains(
                    ['the','and','of','to','in','is','that','it','for','with'], t))) AS h_en,
                  len(list_filter(toks, t -> list_contains(
                    ['el','la','los','las','y','de','que','es','un','por'], t))) AS h_es,
                  len(list_filter(toks, t -> list_contains(
                    ['le','la','les','et','de','un','une','est','que','pour'], t))) AS h_fr,
                  (length(text) - length(regexp_replace(text,
                    '[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}]', '', 'g'))) * 1.0
                    / greatest(length(text), 1) AS cjk
           FROM base),
         m AS (
           SELECT doc_id, lang, cjk,
                  h_de * 1.0 / n_tok AS s_de, h_en * 1.0 / n_tok AS s_en,
                  h_es * 1.0 / n_tok AS s_es, h_fr * 1.0 / n_tok AS s_fr,
                  greatest(h_de * 1.0 / n_tok, h_en * 1.0 / n_tok,
                           h_es * 1.0 / n_tok, h_fr * 1.0 / n_tok) AS best
           FROM scored)
         SELECT doc_id,
                CASE WHEN cjk > 0.2 THEN 'zh'
                     WHEN best > 0 THEN
                       CASE WHEN s_de = best THEN 'de'
                            WHEN s_en = best THEN 'en'
                            WHEN s_es = best THEN 'es'
                            ELSE 'fr' END
                     ELSE 'und' END AS pred_lang,
                lang
         FROM m"""

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

    "q_corpus_pipeline" ->
      """WITH base AS (
           SELECT doc_id, text, lang,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS toks,
                  length(text) AS n_char
           FROM documents),
         scored AS (
           SELECT doc_id, text, lang, len(toks) AS n_tok,
                  array_to_string(toks, ' ') AS norm_text,
                  ROUND(
                    (CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 1.0
                          WHEN len(toks) BETWEEN 3 AND 9 THEN 0.5 ELSE 0.0 END) * 0.3
                    + (1.0 - least((n_char - length(regexp_replace(text,
                        '[[:punct:]]', '', 'g'))) * 4.0 / greatest(n_char, 1), 1.0)) * 0.3
                    + least(len(list_filter(toks, t -> list_contains(
                        ['the','a','an','and','or','of','to','in','is','it',
                         'that','for','on','with','as','this','by'], t)))
                        * 5.0 / greatest(len(toks), 1), 1.0) * 0.2
                    + ((n_char - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                        * 1.0 / greatest(n_char, 1)) * 0.2, 4) AS quality
           FROM base),
         kept AS (SELECT * FROM scored WHERE quality >= 0.5),
         survivors AS (
           SELECT min(doc_id) AS doc_id FROM kept
           GROUP BY md5(norm_text)),
         deduped AS (
           SELECT k.* FROM kept k
           WHERE k.doc_id IN (SELECT doc_id FROM survivors))
         SELECT lang, count(*) AS n_docs,
                CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
                ROUND(AVG(quality), 4) AS avg_quality
         FROM deduped GROUP BY lang ORDER BY lang""",

    // the three merged tables equal their pipeline results (first run is a
    // create; reruns are idempotent merges), so the oracle re-derives each
    // pipeline and compares counts + key checksums
    "q_orchestrator" ->
      """SELECT 'order_items' AS entity, count(*) AS n_rows,
                CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
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
         UNION ALL
         SELECT 'orders', count(*), CAST(SUM(o_orderkey) AS BIGINT)
         FROM (
           SELECT * FROM (
             SELECT *, row_number() OVER (
               PARTITION BY o_orderkey ORDER BY o_orderdate DESC NULLS LAST) AS rn
             FROM orders
             WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
               AND o_orderdate IS NOT NULL) t
           WHERE rn = 1
             AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = t.o_orderkey))
         UNION ALL
         SELECT 'products', count(*), CAST(SUM(p_partkey) AS BIGINT)
         FROM (
           SELECT * FROM (
             SELECT *, row_number() OVER (
               PARTITION BY p_partkey ORDER BY p_name DESC NULLS LAST) AS rn
             FROM part
             WHERE p_partkey IS NOT NULL AND p_name IS NOT NULL) t
           WHERE rn = 1
             AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = t.p_partkey))
         ORDER BY entity""",

    // CSV round-trip is lossless and the injected malformed rows are all
    // rejected, so the oracle is the same parquet-side pipeline SQL
    "q_csv_pipeline" ->
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

    "q_json_source" ->
      """SELECT o_orderstatus, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_total
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_orc_source" ->
      """SELECT o_orderstatus, count(*) AS n, max(o_orderdate) AS max_date,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_total
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_csv_declared" ->
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
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_quantity >= 49 AND l.l_partkey = p.p_partkey)
         ORDER BY p_partkey""",

    // full recompute of the final base state (merge then delete) — the
    // delta-maintained view must equal it exactly
    "q_ivm" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    // same replay as q_ivm plus exact min/max — the maintained extrema
    // (delta rule + threatened-group rescan) must equal the recompute
    "q_ivm_minmax" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS max_total
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    // the MV rewrite serves the query from the maintained view, so the
    // oracle is the honest base aggregation after the replay — identical
    // value space (decimal(20,4)) to q_ivm_minmax
    "q_mv_rewrite" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS max_total
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    // distinct-count rewrite: the full-stats view's exact n_distinct
    // serves count(DISTINCT) — oracle recomputes in the same (18,4)
    // value space
    "q_mv_distinct" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(*) AS n,
                count(DISTINCT CAST(o_totalprice AS DECIMAL(18,4)))
                  AS n_distinct,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS max_total
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    // avg served from the view: Spark's decimal Average divides at
    // scale 14 (precision-loss-adjusted) then casts to scale 8, both
    // HALF_UP — replicated here with exact HUGEINT arithmetic
    // (halfup(a/b) = (2a+b)//(2b) for positive operands) so neither
    // engine ever rounds a float: i4 is the exact sum in 1e-4 units,
    // v14/v8 the two half-up roundings, and the final /1e8 division is
    // IEEE-exact-input on both sides.
    "q_mv_avg" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              CASE WHEN o_orderkey % 7 = 1 THEN NULL
                                   ELSE o_totalprice * 2 END AS o_totalprice,
                              o_orderdate, o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0),
            agg AS (
              SELECT o_custkey, count(*) AS n,
                     count(o_totalprice) AS n_vals,
                     SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                         AS HUGEINT)) AS i4
              FROM final GROUP BY o_custkey),
            rounded AS (
              SELECT o_custkey, n, n_vals, i4,
                     CASE WHEN n_vals = 0 THEN NULL ELSE
                       (2 * i4 * 10000000000 + n_vals) // (2 * n_vals)
                     END AS v14
              FROM agg)
         SELECT o_custkey, n, n_vals,
                CAST((2 * v14 + 1000000) // 2000000 AS DOUBLE)
                  / 100000000.0 AS avg_total,
                CAST(i4 AS DOUBLE) / 10000.0 AS sum_total
         FROM rounded ORDER BY o_custkey""",

    // serveDouble contract replay: exact integer accumulation of the
    // 4-dp-scaled values, ONE cast to double (i4 < 2^53 at every SF, so
    // CAST(i4 AS DOUBLE)/1e4 is the correctly-rounded double of the
    // exact decimal sum — the same number Spark's decimal→double cast
    // yields), then plain IEEE division for the avg; min/max replay the
    // decimal cast chain verbatim
    "q_mv_avg_double" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              CASE WHEN o_orderkey % 7 = 1 THEN NULL
                                   ELSE o_totalprice * 2 END AS o_totalprice,
                              o_orderdate, o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0),
            agg AS (
              SELECT o_custkey,
                     count(o_totalprice) AS n_vals,
                     SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                         AS HUGEINT)) AS i4,
                     MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS mn,
                     MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS mx
              FROM final GROUP BY o_custkey)
         SELECT o_custkey, n_vals,
                (CAST(i4 AS DOUBLE) / 10000.0) / n_vals AS avg_total,
                CAST(i4 AS DOUBLE) / 10000.0 AS sum_total,
                CAST(mn AS DOUBLE) AS min_total,
                CAST(mx AS DOUBLE) AS max_total
         FROM agg ORDER BY o_custkey""",

    // join rewrite: the view serves the aggregate-over-join query —
    // the oracle replays both sides' churn and re-joins, identical to
    // q_ivm_join's recompute
    "q_mv_join_rewrite" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            ffinal AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0),
            dfinal AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                          ELSE c_mktsegment END AS c_mktsegment
              FROM customer WHERE c_custkey % 11 <> 0)
         SELECT c_mktsegment, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total
         FROM ffinal JOIN dfinal ON ffinal.o_custkey = dfinal.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // roll-up form: the query groups COARSER than the view and filters
    // on a view key; the rewrite re-aggregates view rows — the oracle
    // re-aggregates the base, same decimal value space
    "q_mv_rollup" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_orderpriority, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS max_total
         FROM final WHERE o_custkey % 10 < 5
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // count(DISTINCT) full recompute — the two-level maintained view
    // must equal it exactly; null priorities (none in this data, but
    // the operator's pinned semantics) are skipped on both sides
    "q_ivm_distinct" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_distinct
         FROM final WHERE o_orderpriority IS NOT NULL
         GROUP BY o_custkey ORDER BY o_custkey""",

    // moments replay: same final state, exact decimal moment state with
    // sum_sq rendered as its plain string form (both engines render a
    // scale-8 decimal >= 1 identically; a raw decimal output column is
    // the one representation the compare hashes differently)
    "q_ivm_moments" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0),
            agg AS (
              SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                          AS DOUBLE) AS ds,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                              * CAST(o_totalprice AS DECIMAL(19,4)))
                          AS DECIMAL(38,8)) AS sum_sq
              FROM final GROUP BY o_custkey)
         SELECT o_custkey, n,
                round(ds / n, 6) AS mean_total,
                CAST(sum_sq AS VARCHAR) AS sum_sq
         FROM agg ORDER BY o_custkey""",

    // fused-stats replay: same final state, every aggregate from the
    // same exact decimal value space ((18,4) to match statsView)
    "q_ivm_stats" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS max_total,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                              * CAST(o_totalprice AS DECIMAL(19,4)))
                          AS DECIMAL(38,8)) AS VARCHAR) AS sum_sq
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    // full-stats replay: every aggregate from the same exact decimal
    // value space, distinct count over the SAME (18,4)-cast values
    "q_ivm_full" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS max_total,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                              * CAST(o_totalprice AS DECIMAL(19,4)))
                          AS DECIMAL(38,8)) AS VARCHAR) AS sum_sq,
                count(DISTINCT CAST(o_totalprice AS DECIMAL(18,4)))
                  AS n_distinct
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    // identical oracle: the streaming full-stats drain must land the
    // SAME final state as the batch maintainer
    "q_stream_ivm_full" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS max_total,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                              * CAST(o_totalprice AS DECIMAL(19,4)))
                          AS DECIMAL(38,8)) AS VARCHAR) AS sum_sq,
                count(DISTINCT CAST(o_totalprice AS DECIMAL(18,4)))
                  AS n_distinct
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    // JOIN-view replay: final fact state (upsert + delete) joined to
    // final dim state (segment moves + deletes), re-aggregated from
    // scratch — the maintained view must equal this exactly
    "q_ivm_join" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            ffinal AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0),
            dfinal AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                          ELSE c_mktsegment END AS c_mktsegment
              FROM customer WHERE c_custkey % 11 <> 0)
         SELECT c_mktsegment, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total
         FROM ffinal JOIN dfinal ON ffinal.o_custkey = dfinal.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // q_ivm_join's replay extended with exact min/max
    "q_ivm_join_minmax" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            ffinal AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0),
            dfinal AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                          ELSE c_mktsegment END AS c_mktsegment
              FROM customer WHERE c_custkey % 11 <> 0)
         SELECT c_mktsegment, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS max_total
         FROM ffinal JOIN dfinal ON ffinal.o_custkey = dfinal.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // good-writes-only replay; the rejected write must have left no
    // trace (write_rejected also pins that the version didn't advance)
    "q_check_constraint" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source)
         SELECT count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total,
                true AS write_rejected
         FROM merged""",

    // identical final state to q_ivm_join — the dim window (batch) and
    // the fact window (streamed CDC) compose to the same replay
    "q_stream_ivm_join" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            ffinal AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0),
            dfinal AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                          ELSE c_mktsegment END AS c_mktsegment
              FROM customer WHERE c_custkey % 11 <> 0)
         SELECT c_mktsegment, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total
         FROM ffinal JOIN dfinal ON ffinal.o_custkey = dfinal.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // identical final state to q_ivm_join_minmax — the dim window
    // (batch) and the fact window (streamed CDC, rescan through the
    // join) compose to the same full-recompute replay
    "q_stream_ivm_join_minmax" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            ffinal AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0),
            dfinal AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                          ELSE c_mktsegment END AS c_mktsegment
              FROM customer WHERE c_custkey % 11 <> 0)
         SELECT c_mktsegment, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS max_total
         FROM ffinal JOIN dfinal ON ffinal.o_custkey = dfinal.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // same final state as q_stream_ivm_join_minmax — the dim churn
    // merely arrives through the two-feed streaming drain instead of
    // the batch maintainer
    "q_stream_ivm_join_dim" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            ffinal AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0),
            dfinal AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                          ELSE c_mktsegment END AS c_mktsegment
              FROM customer WHERE c_custkey % 11 <> 0)
         SELECT c_mktsegment, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS max_total
         FROM ffinal JOIN dfinal ON ffinal.o_custkey = dfinal.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // the view state after maintenance across the COMPACTED feed span
    // == the plain relational replay of the three merges
    "q_feed_compact" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            src2 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                            o_totalprice * 2 AS o_totalprice, o_orderdate,
                            o_orderpriority
                     FROM orders WHERE o_orderkey % 2 = 0),
            m1 AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM src2 s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM src2),
            m2 AS (SELECT * FROM m1 WHERE o_orderkey % 5 <> 0),
            src7 AS (SELECT * FROM orders WHERE o_orderkey % 7 = 0),
            final AS (
              SELECT * FROM m2 t
              WHERE NOT EXISTS (SELECT 1 FROM src7 s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM src7)
         SELECT o_custkey, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    // change-stream event counts replayed relationally: inserts =
    // source keys absent from target; updates = matched keys whose row
    // changed (only o_totalprice differs by construction, and it
    // always does since prices are positive — spelled out anyway);
    // deletes = post-merge rows hit by the delete predicate
    "q_stream_cdc" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            ins AS (SELECT count(*) AS c FROM source s
                    WHERE NOT EXISTS (SELECT 1 FROM target t
                                      WHERE t.o_orderkey = s.o_orderkey)),
            upd AS (SELECT count(*) AS c FROM source s
                    JOIN target t USING (o_orderkey)
                    WHERE t.o_totalprice <> s.o_totalprice),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            del AS (SELECT count(*) AS c FROM merged
                    WHERE o_orderkey % 5 = 0)
         SELECT change_type, n FROM (
           SELECT 'delete' AS change_type, del.c AS n FROM del
           UNION ALL SELECT 'insert', ins.c FROM ins
           UNION ALL SELECT 'update_postimage', upd.c FROM upd
           UNION ALL SELECT 'update_preimage', upd.c FROM upd)
         ORDER BY change_type""",

    // identical replay to q_ivm: the stream-maintained view must land
    // on the same full-recompute state
    "q_stream_ivm_cdc" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    // streaming fused-stats replay: same final state as q_ivm_stats,
    // reached through the CDC-stream subscriber
    "q_stream_ivm_stats" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS max_total,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                              * CAST(o_totalprice AS DECIMAL(19,4)))
                          AS DECIMAL(38,8)) AS VARCHAR) AS sum_sq
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    // streaming min/max replay: same final state as q_ivm_minmax,
    // reached through the CDC-stream subscriber instead of the batch
    // maintainer
    "q_stream_ivm_minmax" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
         SELECT o_custkey, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_total,
                CAST(MIN(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS min_total,
                CAST(MAX(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS max_total
         FROM final GROUP BY o_custkey ORDER BY o_custkey""",

    "q_merge_upsert" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source)
         SELECT o_orderstatus, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_total
         FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // three-clause MERGE replay: all batch keys leave the target, only
    // non-delete batch rows come back
    "q_merge_delete" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            batch AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                             o_totalprice * 2 AS o_totalprice, o_orderdate,
                             o_orderpriority
                      FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM batch b
                                WHERE b.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM batch WHERE o_orderkey % 7 <> 0)
         SELECT o_orderstatus, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_total
         FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // current state = the q_merge_upsert merge; previous snapshot = the
    // pre-merge target, both replayed relationally
    "q_time_travel" ->
      """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority
                       FROM orders WHERE o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source),
            cur AS (SELECT o_orderstatus, count(*) AS n_cur,
                           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
                                AS DOUBLE) AS sum_cur
                    FROM merged GROUP BY 1),
            prev AS (SELECT o_orderstatus, count(*) AS n_prev,
                            CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
                                 AS DOUBLE) AS sum_prev
                     FROM target GROUP BY 1)
         SELECT o_orderstatus, n_cur, sum_cur, n_prev, sum_prev
         FROM cur JOIN prev USING (o_orderstatus)
         ORDER BY o_orderstatus""",

    "q_merge_upsert_pruned" ->
      """WITH base AS (SELECT *, year(o_orderdate) AS o_year FROM orders),
            source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                              o_totalprice * 2 AS o_totalprice, o_orderdate,
                              o_orderpriority, o_year
                       FROM base WHERE o_year = 1995 AND o_orderkey % 2 = 0),
            merged AS (
              SELECT * FROM base t
              WHERE NOT EXISTS (SELECT 1 FROM source s
                                WHERE s.o_orderkey = t.o_orderkey)
              UNION ALL SELECT * FROM source)
         SELECT o_orderstatus, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_total
         FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_delete_update" ->
      """SELECT o_orderstatus,
                CASE WHEN o_totalprice >= 300000 THEN '0-REVIEWED'
                     ELSE o_orderpriority END AS o_orderpriority,
                count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_total
         FROM orders
         WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000)
         GROUP BY 1, 2 ORDER BY o_orderstatus, o_orderpriority""",

    "q_zorder" ->
      """SELECT p_size, count(*) AS n,
                CAST(SUM(CAST(p_retailprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
         FROM part GROUP BY p_size ORDER BY p_size""",

    "q_valid_counts" ->
      """SELECT (o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
                 AND o_orderdate IS NOT NULL) AS is_valid, count(*) AS n
         FROM orders GROUP BY 1 ORDER BY is_valid""",

    "q_except" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         EXCEPT
         SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_orderkey""",

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 1000
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",

    "q_union" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'P'
         ORDER BY o_orderkey""",

    "q_correlated" ->
      """SELECT o_orderkey, o_custkey FROM orders o
         WHERE o_totalprice = (SELECT max(i.o_totalprice) FROM orders i
                               WHERE i.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",

    "q_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
         FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         WHERE c.c_custkey < 100
         ORDER BY c_custkey, o_totalprice DESC, o_orderkey""",

    "q_range_frame" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
                count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS n_leq
         FROM orders WHERE o_custkey < 30 ORDER BY o_orderkey""",

    "q_sql_limit" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         FROM orders ORDER BY o_orderkey LIMIT 10""",

    "q_sql_join_agg" ->
      """SELECT n.n_name,
                ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                COUNT(*) AS n_lines
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON n.n_nationkey = c.c_nationkey
         JOIN region r ON r.r_regionkey = n.n_regionkey
         WHERE r.r_name = 'ASIA'
         GROUP BY n.n_name ORDER BY n.n_name""",

    "q_local_relation" ->
      """SELECT prio_rank, count(*) AS n_orders
         FROM orders
         JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
                      ('4-NOT SPECIFIED', 4), ('5-LOW', 5))
              AS ranks(o_orderpriority, prio_rank) USING (o_orderpriority)
         GROUP BY prio_rank ORDER BY prio_rank""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
                ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                count(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS sum_bal
         FROM customer c
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",

    "q_pivot" ->
      """SELECT o_orderpriority,
                count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
                count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
                count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_count_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_date_agg" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
                count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_total
         FROM orders GROUP BY 1, 2 ORDER BY yr, mo""",

    "q_string_funcs" ->
      """SELECT source, count(*) AS n,
                min(upper(substr(text, 1, 12))) AS min_prefix,
                max(n_chars) AS max_chars
         FROM documents GROUP BY source ORDER BY source""",

    "q_percentile" ->
      """SELECT event_type,
                ROUND(quantile_cont(value, 0.5), 4) AS p50,
                ROUND(quantile_cont(value, 0.95), 4) AS p95
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_grouping_sets" ->
      """SELECT r_name, n_name, count(*) AS n_cust
         FROM customer c
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY GROUPING SETS ((r_name), (n_name))
         ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",

    "q_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
                lag(o_orderkey, 1) OVER w AS prev_orderkey,
                row_number() OVER w AS seq,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
         FROM orders WHERE o_custkey < 50
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, seq""",

    "q_explode" ->
      """WITH t AS (
           SELECT doc_id,
                  unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> len(x) > 0)) AS token
           FROM documents)
         SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
         FROM t GROUP BY token ORDER BY n DESC, token ASC LIMIT 30""",

    "q_hof" ->
      """SELECT vec_id,
                ROUND(CAST(list_sum(list_transform(embedding::DOUBLE[],
                      x -> x * x)) AS DOUBLE), 4) AS sum_sq,
                ROUND(CAST(list_max(list_transform(embedding::DOUBLE[],
                      x -> abs(x))) AS DOUBLE), 4) AS max_abs,
                len(list_filter(embedding, x -> x > 0)) AS n_pos
         FROM embeddings ORDER BY vec_id""",

    "q_rank_funcs" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                dense_rank() OVER w AS dr,
                ROUND(percent_rank() OVER w, 6) AS pr,
                ntile(4) OVER w AS quartile,
                ROUND(cume_dist() OVER w, 6) AS cd
         FROM orders WHERE o_custkey < 20
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",

    "q_regex_funcs" ->
      """SELECT doc_id,
                regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
                len(regexp_extract_all(text, '[0-9]+')) AS n_nums,
                length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_novowel
         FROM documents ORDER BY doc_id""",

    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
                CAST(SUM(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                        x -> len(x) > 0))) AS BIGINT) AS sum_tokens,
                CAST(SUM(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS sum_bpe_tokens,
                ROUND(AVG(n_chars), 4) AS avg_chars
         FROM documents GROUP BY lang ORDER BY lang""",

    "q_text_quality" ->
      """WITH base AS (
           SELECT doc_id, text,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS toks,
                  length(text) AS n_char
           FROM documents),
         m AS (
           SELECT doc_id, text, n_char, len(toks) AS n_tok,
                  len(regexp_extract_all(text,
                      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
                  len(list_filter(toks, t -> list_contains(
                      ['the','a','an','and','or','of','to','in','is','it',
                       'that','for','on','with','as','this','by'], t)))
                    AS sw_hits,
                  array_to_string(toks, ' ') AS norm_text,
                  n_char - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
                    AS n_punct,
                  n_char - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                    AS n_alpha
           FROM base)
         SELECT doc_id, n_tok, n_bpe,
                ROUND(sw_hits * 1.0 / greatest(n_tok, 1), 6) AS stop_ratio,
                ROUND(
                  (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0
                        WHEN n_tok BETWEEN 3 AND 9 THEN 0.5 ELSE 0.0 END) * 0.3
                  + (1.0 - least(n_punct * 4.0 / greatest(n_char, 1), 1.0)) * 0.3
                  + least(sw_hits * 5.0 / greatest(n_tok, 1), 1.0) * 0.2
                  + (n_alpha * 1.0 / greatest(n_char, 1)) * 0.2, 4) AS quality,
                md5(text) AS fp, md5(norm_text) AS fp_norm
         FROM m ORDER BY doc_id""",

    "q_array_ops" ->
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS toks
           FROM documents)
         SELECT doc_id,
                array_to_string(list_sort(toks)[1:3], ' ') AS first3,
                list_contains(toks, 'spark') AS has_spark,
                len(list_distinct(toks)) AS n_distinct
         FROM t ORDER BY doc_id""",

    "q_lang_id" ->
      s"""$langIdOracleSql ORDER BY doc_id""",

    "q_heavy_hitters" ->
      """WITH t AS (
           SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> len(x) > 0)) AS token
           FROM documents)
         SELECT token, count(*) AS cnt FROM t
         GROUP BY token ORDER BY cnt DESC, token LIMIT 10""",

    "q_dedup_exact" ->
      """SELECT count(*) AS n_docs,
                count(DISTINCT md5(text)) AS n_unique,
                count(DISTINCT md5(array_to_string(
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0), ' '))) AS n_unique_norm
         FROM documents""",

    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
                md5(array_to_string(
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0), ' ')) AS fp_norm
         FROM documents ORDER BY doc_id""",

    "q_minhash_pairs" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM toks)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
                      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
                  AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
         ORDER BY a_id, b_id""",

    "q_minhash_incremental" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM toks)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
                      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
                  AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE (a.doc_id % 4 = 0 OR b.doc_id % 4 = 0)
           AND len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
         ORDER BY a_id, b_id""",

    // the streaming-maintained pairs table must land the SAME final
    // state as the batch-maintained one — identical oracle
    "q_stream_dedup_index" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents WHERE doc_id % 7 <> 3),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM toks)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
                      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
                  AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
         ORDER BY a_id, b_id""",

    // the maintained pairs table after 3 ingest waves + a delete wave ==
    // all-pairs Jaccard over the FINAL corpus state (docs %7=3 deleted)
    "q_dedup_index" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents WHERE doc_id % 7 <> 3),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM toks)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
                      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
                  AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
         ORDER BY a_id, b_id""",

    // identical oracle: the pruned serving layout must not change answers
    "q_dedup_index_pruned" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents WHERE doc_id % 7 <> 3),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM toks)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
                      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
                  AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
         ORDER BY a_id, b_id""",

    "q_winnow_pairs" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM toks)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
                      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
                  AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
         ORDER BY a_id, b_id""",

    // full bit-for-bit replay of the MD5-based SimHash (SimHash64Md5):
    // fingerprint bit 4d+k is bit k of hex digit d of md5(shingle),
    // vote-summed over the DISTINCT 3-word shingles; the banded candidate
    // stage is pigeonhole-exact at bands=8/maxHamming=7, so the oracle is
    // the relational definition: all pairs with hamming <= 7 whose
    // rounded shingle-Jaccard >= 0.5
    "q_simhash_pairs" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM toks),
         feat AS (SELECT doc_id, md5(unnest(s)) AS h FROM sh),
         votes AS (
           SELECT doc_id, u.b AS b,
                  SUM(CASE WHEN (((strpos('0123456789abcdef',
                                          substr(h, CAST(u.b // 4 AS INT) + 1, 1)) - 1)
                                  >> CAST(u.b % 4 AS INT)) & 1) = 1
                           THEN 1 ELSE -1 END) AS v
           FROM feat, range(0, 64) AS u(b)
           GROUP BY doc_id, u.b),
         fp AS (
           SELECT doc_id,
                  CAST(SUM(CASE WHEN v > 0 THEN
                         CASE WHEN b = 63
                              THEN CAST(-9223372036854775807 - 1 AS HUGEINT)
                              ELSE CAST(1::BIGINT << CAST(b AS INT) AS HUGEINT) END
                       ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS f
           FROM votes GROUP BY doc_id),
         cand AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                  bit_count(xor(a.f, b.f)) AS hamming
           FROM fp a JOIN fp b ON a.doc_id < b.doc_id
           WHERE bit_count(xor(a.f, b.f)) <= 7)
         SELECT c.a_id, c.b_id, c.hamming,
                ROUND(len(list_intersect(sa.s, sb.s)) * 1.0 /
                      (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))),
                      6) AS jaccard
         FROM cand c
         JOIN sh sa ON sa.doc_id = c.a_id
         JOIN sh sb ON sb.doc_id = c.b_id
         WHERE ROUND(len(list_intersect(sa.s, sb.s)) * 1.0 /
                     (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))),
                     6) >= 0.5
         ORDER BY a_id, b_id""",

    // exact recompute of the substring-dedup definition: every 30-gram
    // by real substring (no hashes), dup = seen in >= 2 docs, island
    // merge of covered positions per doc
    "q_dup_spans" ->
      """WITH d AS (
           SELECT doc_id, text, greatest(length(text) - 29, 0) AS np
           FROM documents),
         grams AS (
           SELECT doc_id, u.p AS pos, substr(text, u.p::int, 30) AS g
           FROM d, LATERAL unnest(range(1, np + 1)) AS u(p)),
         dup AS (
           SELECT g FROM grams GROUP BY g
           HAVING count(DISTINCT doc_id) >= 2),
         anch AS (
           SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
         isl AS (
           SELECT doc_id, pos,
                  CASE WHEN pos > coalesce(max(pos + 29) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       CAST(-1 AS BIGINT)) + 1
                       THEN 1 ELSE 0 END AS brk
           FROM anch),
         isl2 AS (
           SELECT doc_id, pos,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
           FROM isl)
         SELECT doc_id, min(pos) AS span_start, max(pos) + 29 AS span_end,
                max(pos) + 29 - min(pos) + 1 AS span_len
         FROM isl2 GROUP BY doc_id, island
         ORDER BY doc_id, span_start""",

    "q_dup_coverage" ->
      """WITH d AS (
           SELECT doc_id, text, greatest(length(text) - 29, 0) AS np
           FROM documents),
         grams AS (
           SELECT doc_id, u.p AS pos, substr(text, u.p::int, 30) AS g
           FROM d, LATERAL unnest(range(1, np + 1)) AS u(p)),
         dup AS (
           SELECT g FROM grams GROUP BY g
           HAVING count(DISTINCT doc_id) >= 2),
         anch AS (
           SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
         isl AS (
           SELECT doc_id, pos,
                  CASE WHEN pos > coalesce(max(pos + 29) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       CAST(-1 AS BIGINT)) + 1
                       THEN 1 ELSE 0 END AS brk
           FROM anch),
         isl2 AS (
           SELECT doc_id, pos,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
           FROM isl),
         spans AS (
           SELECT doc_id, max(pos) + 29 - min(pos) + 1 AS span_len
           FROM isl2 GROUP BY doc_id, island),
         tot AS (
           SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_chars
           FROM spans GROUP BY doc_id)
         SELECT d2.doc_id, length(d2.text) AS n_chars,
                coalesce(t.dup_chars, 0) AS dup_chars,
                round(CAST(coalesce(t.dup_chars, 0) AS DOUBLE)
                      / length(d2.text), 6) AS dup_ratio
         FROM documents d2 LEFT JOIN tot t USING (doc_id)
         ORDER BY doc_id""",

    "q_contam_spans" ->
      """WITH d AS (
           SELECT doc_id, text, greatest(length(text) - 29, 0) AS np
           FROM documents),
         grams AS (
           SELECT doc_id, u.p AS pos, substr(text, u.p::int, 30) AS g
           FROM d, LATERAL unnest(range(1, np + 1)) AS u(p)),
         tg AS (
           SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0),
         anch AS (
           SELECT doc_id, pos FROM grams
           WHERE doc_id % 17 <> 0 AND g IN (SELECT g FROM tg)),
         isl AS (
           SELECT doc_id, pos,
                  CASE WHEN pos > coalesce(max(pos + 29) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       CAST(-1 AS BIGINT)) + 1
                       THEN 1 ELSE 0 END AS brk
           FROM anch),
         isl2 AS (
           SELECT doc_id, pos,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
           FROM isl)
         SELECT doc_id, min(pos) AS span_start, max(pos) + 29 AS span_end,
                max(pos) + 29 - min(pos) + 1 AS span_len
         FROM isl2 GROUP BY doc_id, island
         ORDER BY doc_id, span_start""",

    // intra-doc repetition: same island merge, candidate rule is
    // per-(doc, gram) multiplicity >= 2 at L=15
    "q_self_repeat" ->
      """WITH d AS (
           SELECT doc_id, text, greatest(length(text) - 14, 0) AS np
           FROM documents),
         grams AS (
           SELECT doc_id, u.p AS pos, substr(text, u.p::int, 15) AS g
           FROM d, LATERAL unnest(range(1, np + 1)) AS u(p)),
         dup AS (
           SELECT doc_id, g FROM grams GROUP BY doc_id, g
           HAVING count(*) >= 2),
         anch AS (
           SELECT g2.doc_id, g2.pos FROM grams g2
           JOIN dup USING (doc_id, g)),
         isl AS (
           SELECT doc_id, pos,
                  CASE WHEN pos > coalesce(max(pos + 14) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       CAST(-1 AS BIGINT)) + 1
                       THEN 1 ELSE 0 END AS brk
           FROM anch),
         isl2 AS (
           SELECT doc_id, pos,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
           FROM isl)
         SELECT doc_id, min(pos) AS span_start, max(pos) + 14 AS span_end,
                max(pos) + 14 - min(pos) + 1 AS span_len
         FROM isl2 GROUP BY doc_id, island
         ORDER BY doc_id, span_start""",

    // excise replay: recompute the duplicated spans, then stitch each
    // cleaned text from the gap segments (lag boundary + tail piece)
    "q_excise_spans" ->
      """WITH d AS (
           SELECT doc_id, text, greatest(length(text) - 29, 0) AS np
           FROM documents),
         grams AS (
           SELECT doc_id, u.p AS pos, substr(text, u.p::int, 30) AS g
           FROM d, LATERAL unnest(range(1, np + 1)) AS u(p)),
         dup AS (
           SELECT g FROM grams GROUP BY g
           HAVING count(DISTINCT doc_id) >= 2),
         anch AS (
           SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
         isl AS (
           SELECT doc_id, pos,
                  CASE WHEN pos > coalesce(max(pos + 29) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       CAST(-1 AS BIGINT)) + 1
                       THEN 1 ELSE 0 END AS brk
           FROM anch),
         isl2 AS (
           SELECT doc_id, pos,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
           FROM isl),
         spans AS (
           SELECT doc_id, min(pos) AS span_start, max(pos) + 29 AS span_end
           FROM isl2 GROUP BY doc_id, island),
         segs AS (
           SELECT doc_id, span_start, span_end,
                  lag(span_end, 1, 0) OVER (
                    PARTITION BY doc_id ORDER BY span_start) AS prev_end
           FROM spans),
         pieces AS (
           SELECT s.doc_id, s.span_start AS ord,
                  substr(d2.text, (s.prev_end + 1)::int,
                         greatest(s.span_start - s.prev_end - 1, 0)::int) AS piece
           FROM segs s JOIN documents d2 USING (doc_id)
           UNION ALL
           SELECT t.doc_id, t.m + 1 AS ord,
                  substr(d2.text, (t.m + 1)::int) AS piece
           FROM (SELECT doc_id, max(span_end) AS m
                 FROM spans GROUP BY doc_id) t
           JOIN documents d2 USING (doc_id)),
         agged AS (
           SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS clean_text
           FROM pieces GROUP BY doc_id)
         SELECT d3.doc_id, coalesce(a.clean_text, d3.text) AS clean_text
         FROM documents d3 LEFT JOIN agged a USING (doc_id)
         ORDER BY doc_id""",

    // keep-one replay: anchors restricted to NON-OWNER docs (owner =
    // min doc id containing the gram), then the same stitch
    "q_excise_keep_one" ->
      """WITH d AS (
           SELECT doc_id, text, greatest(length(text) - 29, 0) AS np
           FROM documents),
         grams AS (
           SELECT doc_id, u.p AS pos, substr(text, u.p::int, 30) AS g
           FROM d, LATERAL unnest(range(1, np + 1)) AS u(p)),
         dup AS (
           SELECT g FROM grams GROUP BY g
           HAVING count(DISTINCT doc_id) >= 2),
         anch AS (
           SELECT doc_id, pos, g FROM grams
           WHERE g IN (SELECT g FROM dup)),
         owners AS (
           SELECT g, min(doc_id) AS own FROM anch GROUP BY g),
         lose AS (
           SELECT a.doc_id, a.pos FROM anch a JOIN owners o USING (g)
           WHERE a.doc_id <> o.own),
         isl AS (
           SELECT doc_id, pos,
                  CASE WHEN pos > coalesce(max(pos + 29) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       CAST(-1 AS BIGINT)) + 1
                       THEN 1 ELSE 0 END AS brk
           FROM lose),
         isl2 AS (
           SELECT doc_id, pos,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
           FROM isl),
         spans AS (
           SELECT doc_id, min(pos) AS span_start, max(pos) + 29 AS span_end
           FROM isl2 GROUP BY doc_id, island),
         segs AS (
           SELECT doc_id, span_start, span_end,
                  lag(span_end, 1, 0) OVER (
                    PARTITION BY doc_id ORDER BY span_start) AS prev_end
           FROM spans),
         pieces AS (
           SELECT s.doc_id, s.span_start AS ord,
                  substr(d2.text, (s.prev_end + 1)::int,
                         greatest(s.span_start - s.prev_end - 1, 0)::int) AS piece
           FROM segs s JOIN documents d2 USING (doc_id)
           UNION ALL
           SELECT t.doc_id, t.m + 1 AS ord,
                  substr(d2.text, (t.m + 1)::int) AS piece
           FROM (SELECT doc_id, max(span_end) AS m
                 FROM spans GROUP BY doc_id) t
           JOIN documents d2 USING (doc_id)),
         agged AS (
           SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS clean_text
           FROM pieces GROUP BY doc_id)
         SELECT d3.doc_id, coalesce(a.clean_text, d3.text) AS clean_text
         FROM documents d3 LEFT JOIN agged a USING (doc_id)
         ORDER BY doc_id""",

    "q_dedup_families" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM toks),
         pairs AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7),
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
         SELECT d.doc_id,
                least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS family
         FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
         GROUP BY d.doc_id ORDER BY doc_id""",

    "q_family_survivors" ->
      """WITH RECURSIVE base AS (
           SELECT doc_id, text,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t,
                  length(text) AS n_char
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM base),
         pairs AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7),
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         fam AS (
           SELECT d.doc_id,
                  least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS family
           FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
           GROUP BY d.doc_id),
         q AS (
           SELECT doc_id,
                  ROUND(
                    (CASE WHEN len(t) BETWEEN 10 AND 100000 THEN 1.0
                          WHEN len(t) BETWEEN 3 AND 9 THEN 0.5 ELSE 0.0 END) * 0.3
                    + (1.0 - least((n_char - length(regexp_replace(text,
                        '[[:punct:]]', '', 'g'))) * 4.0 / greatest(n_char, 1), 1.0)) * 0.3
                    + least(len(list_filter(t, x -> list_contains(
                        ['the','a','an','and','or','of','to','in','is','it',
                         'that','for','on','with','as','this','by'], x)))
                        * 5.0 / greatest(len(t), 1), 1.0) * 0.2
                    + ((n_char - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                        * 1.0 / greatest(n_char, 1)) * 0.2, 4) AS quality
           FROM base),
         ranked AS (
           SELECT q.doc_id, f.family, q.quality,
                  row_number() OVER (PARTITION BY f.family
                    ORDER BY q.quality DESC, q.doc_id) AS rn
           FROM q JOIN fam f ON f.doc_id = q.doc_id)
         SELECT doc_id, family, quality FROM ranked WHERE rn = 1
         ORDER BY doc_id""",

    "q_user_features" ->
      """WITH g AS (
           SELECT user_id, ts, event_type, value,
                  epoch_ms(ts) - epoch_ms(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts)) AS gap_ms
           FROM events)
         SELECT user_id, count(*) AS n_events,
                count(DISTINCT event_type) AS n_types,
                date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
                  AS span_days,
                ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) / count(*)
                  AS DOUBLE), 4) AS avg_value,
                CAST(max(gap_ms) AS BIGINT) AS max_gap_ms
         FROM g GROUP BY user_id ORDER BY user_id""",

    "q_salted_join" ->
      """SELECT s_name, count(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         GROUP BY s_name ORDER BY s_name""",

    "q_bloom_join" ->
      """SELECT l.l_suppkey AS s_suppkey, count(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
         FROM lineitem l
         WHERE EXISTS (SELECT 1 FROM supplier s
                       WHERE s.s_acctbal > 5000 AND s.s_suppkey = l.l_suppkey)
         GROUP BY l.l_suppkey ORDER BY s_suppkey""",

    // same lexicographic canonicalization (VARCHAR least/greatest),
    // support-≥2 edge pruning, wedge join, and EXISTS closure
    "q_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (
           SELECT CAST(a.l_partkey AS VARCHAR) AS u,
                  CAST(b.l_partkey AS VARCHAR) AS v
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                              AND a.l_partkey < b.l_partkey
           GROUP BY u, v HAVING count(*) >= 2),
         e AS (SELECT DISTINCT LEAST(u, v) AS lo, GREATEST(u, v) AS hi
               FROM pr WHERE u <> v),
         w AS (SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
               FROM e e1 JOIN e e2 ON e2.lo = e1.hi),
         t AS (SELECT x, y, z FROM w
               WHERE EXISTS (SELECT 1 FROM e
                             WHERE e.lo = w.x AND e.hi = w.z)),
         vx AS (SELECT unnest([x, y, z]) AS vertex FROM t)
         SELECT vertex, count(*) AS n_triangles FROM vx
         GROUP BY vertex
         ORDER BY n_triangles DESC, vertex ASC LIMIT 50""",

    // same support-≥2 pair CTE as q_triangles; adjacency symmetrized,
    // 2-hop via one self-join, distinct counts
    "q_two_hop" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         pr AS (
           SELECT CAST(a.l_partkey AS VARCHAR) AS u,
                  CAST(b.l_partkey AS VARCHAR) AS v
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                              AND a.l_partkey < b.l_partkey
           GROUP BY u, v HAVING count(*) >= 2),
         adj AS (SELECT u AS s, v AS d FROM pr WHERE u <> v
                 UNION SELECT v, u FROM pr WHERE u <> v),
         two AS (SELECT a.s AS s, b.d AS d
                 FROM adj a JOIN adj b ON a.d = b.s
                 WHERE a.s <> b.d),
         reach AS (SELECT s, d FROM adj UNION SELECT s, d FROM two),
         h1 AS (SELECT s, count(*) AS n_1hop FROM adj GROUP BY s),
         h2 AS (SELECT s, count(*) AS n_2hop FROM reach GROUP BY s)
         SELECT h1.s AS vertex, h1.n_1hop AS n_1hop, h2.n_2hop AS n_2hop
         FROM h1 JOIN h2 USING (s)
         ORDER BY n_2hop DESC, vertex ASC LIMIT 50""",

    // same norm chain as the q_embed_topk oracle (sequential double
    // accumulation over the DOUBLE[] cast), then the decimal-sum mean
    "q_embed_norms" ->
      """WITH n AS (
           SELECT label,
                  ROUND(sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                     x -> x * x))), 4)
                    AS norm
           FROM embeddings)
         SELECT label, count(*) AS n,
                ROUND(CAST(SUM(CAST(norm AS DECIMAL(20,4))) AS DOUBLE)
                      / count(*), 4) AS mean_norm,
                MIN(norm) AS min_norm, MAX(norm) AS max_norm
         FROM n GROUP BY label ORDER BY label""",

    // both rule directions from each support-≥2 pair; lift as
    // (sup_ab/sup_a)·(n/sup_b), same fixed double-op order as the
    // Spark side — no integer products, overflow-free
    "q_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey,
                            CAST(l_partkey AS VARCHAR) AS p
                     FROM lineitem),
         n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
         s AS (SELECT p, count(*) AS sup_single FROM li GROUP BY p),
         pr AS (
           SELECT a.p AS u, b.p AS v, count(*) AS sup_ab
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                              AND a.p < b.p
           GROUP BY u, v HAVING count(*) >= 2),
         rules AS (
           SELECT u AS antecedent, v AS consequent, sup_ab FROM pr
           UNION ALL
           SELECT v, u, sup_ab FROM pr)
         SELECT r.antecedent, r.consequent, r.sup_ab,
                ROUND(CAST(r.sup_ab AS DOUBLE) / sa.sup_single, 4)
                  AS confidence,
                ROUND((CAST(r.sup_ab AS DOUBLE) / sa.sup_single) *
                      (CAST(n.n_orders AS DOUBLE) / sb.sup_single), 4)
                  AS lift
         FROM rules r
         JOIN s sa ON sa.p = r.antecedent
         JOIN s sb ON sb.p = r.consequent
         CROSS JOIN n
         ORDER BY lift DESC, antecedent ASC, consequent ASC LIMIT 30""",

    "q_trending" ->
      """WITH a AS (
           SELECT date_trunc('week', l_shipdate) AS week, l_partkey,
                  SUM(CAST(l_quantity AS DECIMAL(20,4))) AS qty_dec
           FROM lineitem GROUP BY week, l_partkey),
         r AS (SELECT *, row_number() OVER (PARTITION BY week
                 ORDER BY qty_dec DESC, l_partkey ASC) AS rn FROM a)
         SELECT week, l_partkey, CAST(qty_dec AS DOUBLE) AS qty, rn
         FROM r WHERE rn <= 3 ORDER BY week, rn""",

    // two-phase salted agg == plain groupBy for decomposable aggregates
    "q_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_value
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_full_outer" ->
      """WITH o AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                    AS order_revenue
           FROM orders GROUP BY 1),
         l AS (
           SELECT CAST(l_shipdate AS DATE) AS day,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                           (1 - CAST(l_discount AS DECIMAL(20,4))))
                       AS DOUBLE) AS shipped_revenue
           FROM lineitem GROUP BY 1)
         SELECT COALESCE(o.day, l.day) AS day,
                COALESCE(o.order_revenue, 0.0) AS order_revenue,
                COALESCE(l.shipped_revenue, 0.0) AS shipped_revenue
         FROM o FULL OUTER JOIN l ON o.day = l.day
         ORDER BY day""",

    "q_profile" ->
      """SELECT * FROM (
           SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
                  count(o_orderkey) AS n_nonnull,
                  count(DISTINCT o_orderkey) AS n_distinct,
                  CAST(min(o_orderkey) AS VARCHAR) AS min_val,
                  CAST(max(o_orderkey) AS VARCHAR) AS max_val
           FROM orders
           UNION ALL
           SELECT 'o_custkey', count(*), count(o_custkey),
                  count(DISTINCT o_custkey),
                  CAST(min(o_custkey) AS VARCHAR),
                  CAST(max(o_custkey) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderstatus', count(*), count(o_orderstatus),
                  count(DISTINCT o_orderstatus),
                  CAST(min(o_orderstatus) AS VARCHAR),
                  CAST(max(o_orderstatus) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderpriority', count(*), count(o_orderpriority),
                  count(DISTINCT o_orderpriority),
                  CAST(min(o_orderpriority) AS VARCHAR),
                  CAST(max(o_orderpriority) AS VARCHAR)
           FROM orders)
         ORDER BY column_name""",

    "q_except_all" ->
      """SELECT l_orderkey, count(*) AS n FROM (
           SELECT l_orderkey FROM lineitem
           EXCEPT ALL
           SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0)
         GROUP BY l_orderkey ORDER BY l_orderkey""",

    "q_intersect_all" ->
      """SELECT l_orderkey, count(*) AS n FROM (
           SELECT l_orderkey FROM lineitem
           INTERSECT ALL
           SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0)
         GROUP BY l_orderkey ORDER BY l_orderkey""",

    "q_bucketed_join" ->
      """SELECT s_name, count(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         GROUP BY s_name ORDER BY s_name""",

    "q_cdc" ->
      """WITH target AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 <> 0),
            source AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0)
         SELECT o_orderkey, _change_type FROM (
           SELECT o_orderkey, 'insert' AS _change_type FROM source
           WHERE o_orderkey NOT IN (SELECT o_orderkey FROM target)
           UNION ALL
           SELECT o_orderkey, 'update_postimage' FROM source
           WHERE o_orderkey IN (SELECT o_orderkey FROM target)
           UNION ALL
           SELECT o_orderkey, 'update_preimage' FROM source
           WHERE o_orderkey IN (SELECT o_orderkey FROM target))
         ORDER BY o_orderkey, _change_type""",

    "q_pmi_bigrams" ->
      """WITH toks AS (
           SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         bi AS (
           SELECT unnest([{'w1': t[i], 'w2': t[i+1]} for i in range(1, len(t))]) AS b
           FROM toks WHERE len(t) >= 2),
         bic AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c_ab
                 FROM bi GROUP BY 1, 2),
         uni AS (SELECT unnest(t) AS w FROM toks),
         unic AS (SELECT w, count(*) AS c_w FROM uni GROUP BY w),
         tot AS (SELECT (SELECT CAST(SUM(c_ab) AS BIGINT) FROM bic) AS n_bi,
                        (SELECT CAST(SUM(c_w) AS BIGINT) FROM unic) AS n_uni)
         SELECT w1 || ' ' || w2 AS bigram, c_ab,
                ROUND(ln((CAST(c_ab AS DOUBLE) / n_bi) *
                         (CAST(n_uni AS DOUBLE) / a.c_w) *
                         (CAST(n_uni AS DOUBLE) / b.c_w)), 4) AS pmi
         FROM bic
         JOIN unic a ON a.w = bic.w1
         JOIN unic b ON b.w = bic.w2
         CROSS JOIN tot
         WHERE c_ab >= 5
         ORDER BY pmi DESC, bigram ASC LIMIT 20""",

    "q_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents WHERE doc_id < 300),
         sh AS (
           SELECT doc_id, len(t) AS ntok,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM toks)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
                      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
                  AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
         ORDER BY a_id, b_id""",

    // the prefix-filter join is exact, so the oracle is the DEFINITION:
    // all-pairs distinct-token Jaccard, thresholded on the rounded value
    "q_prefix_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, list_distinct(
                    list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                x -> len(x) > 0)) AS t
           FROM documents WHERE doc_id < 500),
         nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                ROUND(len(list_intersect(a.t, b.t)) * 1.0 /
                      (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))),
                      6) AS jaccard
         FROM nz a JOIN nz b ON a.doc_id < b.doc_id
         WHERE ROUND(len(list_intersect(a.t, b.t)) * 1.0 /
                     (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))),
                     6) >= 0.8
         ORDER BY a_id, b_id""",

    "q_pii_redact" ->
      """WITH s AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' contact user' || doc_id || '@example.com for details'
                  ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' ref 9001234' || doc_id ELSE '' END AS t2
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t2,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(t2, '[0-9]{7,}')) AS INT)
             AS n_digit_runs,
           md5(regexp_replace(regexp_replace(t2,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '[0-9]{7,}', '<NUM>', 'g')) AS red_md5
         FROM s ORDER BY doc_id""",

    "q_repetition" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         g AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN
                    [array_to_string(t[i:i+2], ' ')
                     for i in range(1, len(t) - 1)]
                  ELSE [] END AS gr
           FROM toks)
         SELECT doc_id, CAST(len(gr) AS INT) AS n_ngrams,
                CASE WHEN len(gr) = 0 THEN 0.0
                     ELSE ROUND(1.0 - len(list_distinct(gr)) * 1.0 / len(gr), 6)
                END AS dup_frac
         FROM g ORDER BY doc_id""",

    "q_contamination" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         sh AS (
           SELECT doc_id, CASE WHEN len(t) >= 3 THEN list_distinct(
                            [array_to_string(t[i:i+2], ' ')
                             for i in range(1, len(t) - 1)])
                          ELSE [array_to_string(t, ' ')] END AS s
           FROM toks),
         test AS (SELECT DISTINCT unnest(s) AS sh FROM sh WHERE doc_id < 50),
         corpus AS (SELECT doc_id, unnest(s) AS sh FROM sh WHERE doc_id >= 50)
         SELECT c.doc_id, count(*) AS n_shared
         FROM corpus c JOIN test t USING (sh)
         GROUP BY c.doc_id HAVING count(*) >= 2 ORDER BY doc_id""",

    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",

    "q_consistent_sample" ->
      """SELECT lang, LEAST(count(*), 5) AS n_sampled
         FROM documents GROUP BY lang ORDER BY lang""",

    "q_pack_sequences" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id,
                  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                       x -> len(x) > 0)) AS BIGINT) AS n_tok,
                  row_number() OVER (ORDER BY doc_id) AS rn
           FROM documents),
         walk(rn, doc_id, n_tok, batch, acc) AS (
           SELECT rn, doc_id, n_tok, CAST(0 AS BIGINT), n_tok
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.rn, d.doc_id, d.n_tok,
                  CASE WHEN w.acc + d.n_tok > 2000 AND w.acc > 0
                       THEN w.batch + 1 ELSE w.batch END,
                  CASE WHEN w.acc + d.n_tok > 2000 AND w.acc > 0
                       THEN d.n_tok ELSE w.acc + d.n_tok END
           FROM walk w JOIN d ON d.rn = w.rn + 1)
         SELECT doc_id, n_tok, batch FROM walk ORDER BY doc_id""",

    "q_embed_neardup" ->
      """WITH nv AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings WHERE vec_id < 500)
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                ROUND(ROUND(list_dot_product(a.v, b.v), 6), 4) AS cos
         FROM nv a JOIN nv b ON a.vec_id < b.vec_id
         WHERE ROUND(ROUND(list_dot_product(a.v, b.v), 6), 4) >= 0.4
         ORDER BY a_id, b_id""",

    // full replay of the deterministic LSH candidate stage (LshBitsDet):
    // Rademacher sign s(t,j,i) = bit 0 of the first hex digit of
    // md5('lsh:<1000+t>:<j>:<i>'); signature bit j of table t is the sign
    // of sum_i s*floor(raw_v_i*1e6) — exact integer arithmetic, so both
    // engines compute identical buckets; candidates share (table, bucket),
    // then the proven cosine verify chain (round 6 -> round 4 -> cut 0.4)
    "q_embed_neardup_lsh" ->
      """WITH q AS (
           SELECT vec_id,
                  [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
                        AS BIGINT)
                   for i in range(1, len(embedding) + 1)] AS qv
           FROM embeddings),
         planes AS (
           SELECT t.t AS t, j.j AS j, i.i AS i,
                  CASE WHEN ((strpos('0123456789abcdef',
                               substr(md5('lsh:' || CAST(1000 + t.t AS VARCHAR)
                                          || ':' || CAST(j.j AS VARCHAR)
                                          || ':' || CAST(i.i AS VARCHAR)),
                                      1, 1)) - 1) & 1) = 1
                       THEN 1 ELSE -1 END AS s
           FROM range(0, 8) AS t(t), range(0, 6) AS j(j),
                range(0, 64) AS i(i)),
         proj AS (
           SELECT q.vec_id, p.t, p.j,
                  SUM(p.s * q.qv[CAST(p.i AS INT) + 1]) AS pr
           FROM q, planes p
           GROUP BY q.vec_id, p.t, p.j),
         sig AS (
           SELECT vec_id, t,
                  CAST(SUM(CASE WHEN pr >= 0
                                THEN (1::BIGINT << CAST(j AS INT))
                                ELSE 0 END) AS BIGINT) AS bucket
           FROM proj GROUP BY vec_id, t),
         cand AS (
           SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
           FROM sig a JOIN sig b
             ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         nv AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings)
         SELECT c.a_id, c.b_id,
                ROUND(ROUND(list_dot_product(a.v, b.v), 6), 4) AS cos
         FROM cand c
         JOIN nv a ON a.vec_id = c.a_id
         JOIN nv b ON b.vec_id = c.b_id
         WHERE ROUND(ROUND(list_dot_product(a.v, b.v), 6), 4) >= 0.4
         ORDER BY a_id, b_id""",

    "q_embed_centroids" ->
      """WITH d AS (
           SELECT label,
                  unnest([{'pos': i, 'v': CAST(embedding[i] AS DOUBLE)}
                          for i in range(1, len(embedding) + 1)]) AS u
           FROM embeddings),
         m AS (
           SELECT label, u.pos AS pos, AVG(u.v) AS m, count(*) AS n
           FROM d GROUP BY label, u.pos)
         SELECT label, ROUND(sqrt(SUM(m * m)), 6) AS centroid_norm,
                CAST(MAX(n) AS BIGINT) AS n_vecs
         FROM m GROUP BY label ORDER BY label""",

    "q_embed_topk" ->
      """WITH nv AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(list_dot_product(q.v, c.v), 6) AS cos
           FROM nv q JOIN nv c ON q.vec_id < 16 AND q.vec_id <> c.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id, cos FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // full-probe LSH ≡ brute force (every bucket probed, each corpus row
    // in exactly one bucket) — identical oracle to q_embed_topk
    "q_embed_ann_lsh" ->
      """WITH nv AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(list_dot_product(q.v, c.v), 6) AS cos
           FROM nv q JOIN nv c ON q.vec_id < 16 AND q.vec_id <> c.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id, cos FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // full-probe IVF ≡ brute force (every cell probed; the seeded
    // quantizer only partitions work) — identical oracle to q_embed_topk
    "q_embed_ann_ivf" ->
      """WITH nv AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(list_dot_product(q.v, c.v), 6) AS cos
           FROM nv q JOIN nv c ON q.vec_id < 16 AND q.vec_id <> c.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id, cos FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // exact-mode SemDeDup (nCells = 1 → all-pairs): a row is dropped
    // iff some LOWER-id row reaches the rounded-cosine threshold
    "q_semdedup" ->
      """WITH nv AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings),
         dropped AS (
           SELECT DISTINCT b.vec_id AS id
           FROM nv a JOIN nv b ON a.vec_id < b.vec_id
           WHERE ROUND(list_dot_product(a.v, b.v), 6) >= 0.4)
         SELECT n.vec_id AS id, CAST(0 AS INTEGER) AS cell,
                (d.id IS NULL) AS kept
         FROM nv n LEFT JOIN dropped d ON n.vec_id = d.id
         ORDER BY id""",

    // the streaming-maintained index must land the SAME final state —
    // identical oracle to q_ann_index
    "q_stream_ann_index" ->
      """WITH corpus AS (
           SELECT vec_id,
                  CASE WHEN vec_id % 11 = 4
                       THEN list_transform(embedding::DOUBLE[], x -> -x)
                       ELSE embedding::DOUBLE[] END AS emb
           FROM embeddings WHERE vec_id % 7 <> 3),
         nc AS (
           SELECT vec_id,
                  list_transform(emb,
                    x -> x / sqrt(list_sum(list_transform(emb, y -> y * y))))
                    AS v
           FROM corpus),
         nq AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings WHERE vec_id < 16),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(list_dot_product(q.v, c.v), 6) AS cos
           FROM nq q JOIN nc c ON q.vec_id <> c.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id, cos FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // full-probe search over the maintained index == brute-force top-k
    // over the FINAL corpus (wave %3=0 inserted, %11=4 negated, %7=3
    // deleted); queries use the ORIGINAL vectors
    "q_ann_index" ->
      """WITH corpus AS (
           SELECT vec_id,
                  CASE WHEN vec_id % 11 = 4
                       THEN list_transform(embedding::DOUBLE[], x -> -x)
                       ELSE embedding::DOUBLE[] END AS emb
           FROM embeddings WHERE vec_id % 7 <> 3),
         nc AS (
           SELECT vec_id,
                  list_transform(emb,
                    x -> x / sqrt(list_sum(list_transform(emb, y -> y * y))))
                    AS v
           FROM corpus),
         nq AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings WHERE vec_id < 16),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(list_dot_product(q.v, c.v), 6) AS cos
           FROM nq q JOIN nc c ON q.vec_id <> c.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id, cos FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
                count(*) AS n,
                ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE), 2)
                  AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "q_event_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
                count(*) AS n,
                ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE), 2)
                  AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "q_event_sliding" ->
      """WITH w AS (
           SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                          time_bucket(INTERVAL '30 minutes', ts)
                            - INTERVAL '30 minutes']) AS window_start,
                  event_type
           FROM events)
         SELECT window_start, event_type, count(*) AS n
         FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "q_stream_sliding" ->
      """WITH w AS (
           SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                          time_bucket(INTERVAL '30 minutes', ts)
                            - INTERVAL '30 minutes']) AS window_start,
                  event_type
           FROM events)
         SELECT window_start, event_type, count(*) AS n
         FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""",

    // final MERGE state = global latest-wins: (ts DESC, event_id DESC)
    // is exactly the __ord struct's descending order
    "q_stream_upsert" ->
      """SELECT user_id, event_type, event_id AS win_event_id,
                ROUND(value, 2) AS win_value
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) t
         WHERE rn = 1 ORDER BY user_id, event_type""",

    // initial view (even events) + streamed odd-half deltas must equal
    // the one-shot aggregate over ALL events — exact decimal sums, so
    // no batch-boundary arithmetic can hide in rounding
    "q_stream_ivm" ->
      """SELECT user_id, count(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_value
         FROM events GROUP BY user_id ORDER BY user_id""",

    // the batch sessionization restricted to sessions the stream's final
    // watermark (= global max ts, delay 0) has closed: end + gap <= max(ts)
    "q_stream_sessions" ->
      """WITH m AS (
           SELECT user_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL '4 hours'
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
           FROM m),
         g AS (SELECT max(ts) AS mx FROM events)
         SELECT user_id, MIN(ts) AS session_start, count(*) AS n_events,
                ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE), 2)
                  AS sum_value
         FROM s, g GROUP BY user_id, sid, mx
         HAVING MAX(ts) + INTERVAL '4 hours' <= mx
         ORDER BY user_id, session_start""",

    // final per-key state = whole-corpus aggregate; latest type replays
    // the (ts, event_id)-max rule; sum replays the decimal arithmetic
    "q_stream_running" ->
      """WITH last AS (
           SELECT user_id, event_type AS last_type FROM (
             SELECT user_id, event_type,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1)
         SELECT e.user_id, count(*) AS n_events,
                ROUND(CAST(SUM(CAST(e.value AS DECIMAL(20,4))) AS DOUBLE), 2)
                  AS sum_value,
                l.last_type
         FROM events e JOIN last l USING (user_id)
         GROUP BY e.user_id, l.last_type
         ORDER BY user_id""",

    "q_event_sessions" ->
      """WITH m AS (
           SELECT user_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL '4 hours'
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
           FROM m)
         SELECT MIN(ts) AS session_start, user_id, count(*) AS n_events,
                ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE), 2)
                  AS sum_value
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",

    "q_asof" ->
      """SELECT c.event_id, c.user_id, e.event_id AS asof_err_id,
                ROUND(e.value, 2) AS asof_value
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click') c
         ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
                         WHERE event_type = 'error') e
           ON c.user_id = e.user_id AND c.ts >= e.ts
         ORDER BY c.event_id""",

    "q_range_join" ->
      """SELECT e.user_id, count(*) AS n_pairs
         FROM (SELECT user_id, ts FROM events WHERE event_type = 'error') e
         JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
           ON c.user_id = e.user_id AND c.ts >= e.ts
              AND c.ts < e.ts + INTERVAL '24 hours'
         GROUP BY e.user_id ORDER BY e.user_id""",

    "q_stream_interval" ->
      """SELECT e.user_id, count(*) AS n_pairs
         FROM (SELECT user_id, ts FROM events WHERE event_type = 'error') e
         JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
           ON c.user_id = e.user_id AND c.ts >= e.ts
              AND c.ts < e.ts + INTERVAL '24 hours'
         GROUP BY e.user_id ORDER BY e.user_id""",

    // the left-outer stream emits every pre-cutoff error row exactly
    // once per matching click plus once with nulls when unmatched, so
    // the relational left join replays it; 8100 s mirrors the Spark
    // side's cutoff (window + watermark delay + margin)
    "q_stream_outer" ->
      """WITH mx AS (SELECT LEAST(
                       MAX(ts) FILTER (WHERE event_type = 'error'),
                       MAX(ts) FILTER (WHERE event_type = 'click')) AS m
                     FROM events),
            e AS (SELECT user_id, ts FROM events CROSS JOIN mx
                  WHERE event_type = 'error'
                    AND ts <= m - INTERVAL 8100 SECONDS),
            c AS (SELECT user_id AS c_user, ts AS c_ts FROM events
                  WHERE event_type = 'click'),
            j AS (SELECT e.user_id, c.c_ts
                  FROM e LEFT JOIN c ON e.user_id = c.c_user
                    AND c.c_ts >= e.ts
                    AND c.c_ts < e.ts + INTERVAL 3600 SECONDS)
         SELECT user_id, CAST(COUNT(c_ts) AS BIGINT) AS n_matched,
                CAST(COUNT(*) - COUNT(c_ts) AS BIGINT) AS n_unmatched
         FROM j GROUP BY user_id ORDER BY user_id""",

    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                     WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1)
         SELECT stage, n_users FROM (
           SELECT '1_view' AS stage, count(*) AS n_users FROM s1
           UNION ALL SELECT '2_click', count(*) FROM s2
           UNION ALL SELECT '3_purchase', count(*) FROM s3)
         ORDER BY stage""",

    "q_cohort" ->
      """WITH fw AS (SELECT user_id,
                            CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
                     FROM events GROUP BY 1),
            act AS (SELECT DISTINCT user_id,
                           CAST(date_trunc('week', ts) AS DATE) AS w
                    FROM events)
         SELECT cohort,
                CAST(date_diff('day', cohort, w) // 7 AS INT) AS week_offset,
                count(DISTINCT act.user_id) AS n_users
         FROM act JOIN fw ON act.user_id = fw.user_id
         GROUP BY 1, 2 ORDER BY cohort, week_offset""",

    "q_unpivot" ->
      """WITH w AS (
           SELECT o_orderpriority,
                  count(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
                  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
                  count(*) FILTER (WHERE o_orderstatus = 'P') AS p_n
           FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, status, n FROM (
           SELECT o_orderpriority, 'F' AS status, f_n AS n FROM w
           UNION ALL SELECT o_orderpriority, 'O', o_n FROM w
           UNION ALL SELECT o_orderpriority, 'P', p_n FROM w)
         ORDER BY o_orderpriority, status""",

    "q_resample" ->
      """WITH b AS (
           SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n,
                  ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE), 2) AS sv
           FROM events WHERE user_id < 20 GROUP BY 1, 2),
         spans AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM b GROUP BY 1),
         grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                  FROM spans),
         j AS (SELECT g.user_id, g.h, b.n, b.sv
               FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.h = g.h)
         SELECT user_id, h AS hour, COALESCE(n, 0) AS n,
                ROUND(COALESCE(last_value(sv IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY h
                  ROWS UNBOUNDED PRECEDING), 0.0), 2) AS carried
         FROM j ORDER BY user_id, hour""",

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "q_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""",

    "q_json_extract" ->
      """SELECT event_type,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                  AS sum_k,
                count(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_from_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
                count(*) AS n
         FROM events GROUP BY 1 ORDER BY k_mod""",

    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                         (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
                  AS revenue
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND o.o_orderdate < TIMESTAMP '1998-01-01'
           AND l.l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q_tpch_q5" ->
      """SELECT n_name,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                         (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
                  AS revenue
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q_tpch_q9" ->
      """SELECT n.n_name AS nation,
                CAST(year(o.o_orderdate) AS INT) AS o_year,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                         (1 - CAST(l_discount AS DECIMAL(20,4))) -
                         CAST(p_retailprice AS DECIMAL(20,4)) *
                         CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_profit
         FROM lineitem l
         JOIN part p ON p.p_partkey = l.l_partkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         WHERE p.p_name LIKE '%widget%'
         GROUP BY nation, o_year
         ORDER BY nation ASC, o_year DESC""",

    "q_tpch_q18" ->
      """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                o.o_totalprice,
                CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,4))) AS DOUBLE)
                  AS total_qty
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE o.o_orderkey IN (
           SELECT l_orderkey FROM lineitem
           GROUP BY l_orderkey
           HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > 9)
         GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                  o.o_totalprice
         ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 100""",

    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l.l_shipdate) AS INT) AS l_year,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                         (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
                  AS revenue
         FROM lineitem l
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
         JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
         WHERE n1.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
           AND n2.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
           AND n1.n_name <> n2.n_name
         GROUP BY supp_nation, cust_nation, l_year
         ORDER BY supp_nation, cust_nation, l_year""",

    "q_tpch_q14" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
                ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(20,4)) *
                             (1 - CAST(l_discount AS DECIMAL(20,4)))
                        ELSE 0 END) AS DOUBLE) /
                      CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                               (1 - CAST(l_discount AS DECIMAL(20,4))))
                           AS DOUBLE), 4) AS promo_share
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         GROUP BY month ORDER BY month""",

    "q_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                        CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE)
                  AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.02 AND 0.04
           AND l_quantity < 24""",

    "q_tpch_q10" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                         (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
                  AS revenue
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON n.n_nationkey = c.c_nationkey
         WHERE l.l_returnflag = 'R'
           AND o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate < TIMESTAMP '1996-07-01'
         GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
         ORDER BY revenue DESC, c.c_custkey ASC LIMIT 20""",

    "q_tpch_q12" ->
      """SELECT l_returnflag,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
         WHERE l_returnflag IN ('R','A')
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
               FROM customer c
               LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
                 AND o.o_orderpriority <> '4-NOT SPECIFIED'
               GROUP BY c.c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    // correlated 0.2·avg predicate replayed in integer-exact form
    // (qty·5·cnt < sum of exact decimals) — see the Spark side
    "q_tpch_q17" ->
      """WITH perpart AS (
           SELECT l_partkey,
                  SUM(CAST(l_quantity AS DECIMAL(20,4))) AS sum_qty,
                  COUNT(*) AS cnt_qty
           FROM lineitem GROUP BY l_partkey)
         SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,4)))
                     AS DOUBLE) / 7.0 AS avg_yearly
         FROM lineitem l
         JOIN part p ON p.p_partkey = l.l_partkey
         JOIN perpart a ON a.l_partkey = l.l_partkey
         WHERE p.p_type = 'PROMO' AND p.p_brand LIKE 'Brand#1%'
           AND CAST(l.l_quantity AS DECIMAL(20,4)) * 5 * a.cnt_qty
               < a.sum_qty""",

    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                        (1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE)
                  AS revenue
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 15)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 25)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 35)""",

    // part↔supplier relation = DISTINCT lineitem pairs; correlated MIN
    // replayed as a CTE agg + equality join (arithmetic-free)
    "q_tpch_q2" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         cand AS (
           SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name
           FROM ps
           JOIN part p ON p.p_partkey = ps.l_partkey
           JOIN supplier s ON s.s_suppkey = ps.l_suppkey
           JOIN nation n ON n.n_nationkey = s.s_nationkey
           WHERE p.p_type = 'LARGE' AND p.p_size < 16),
         mins AS (SELECT p_partkey, MIN(s_acctbal) AS min_bal
                  FROM cand GROUP BY p_partkey)
         SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_name
         FROM cand c JOIN mins m ON m.p_partkey = c.p_partkey
         WHERE c.s_acctbal = m.min_bal
         ORDER BY c.s_acctbal DESC, c.n_name ASC, c.s_name ASC,
                  c.p_partkey ASC LIMIT 100""",

    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate < TIMESTAMP '1997-01-01'
           AND EXISTS (
             SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
               AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_tpch_q8" ->
      """SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_0'
                         THEN CAST(l_extendedprice AS DECIMAL(20,4)) *
                              (1 - CAST(l_discount AS DECIMAL(20,4)))
                         ELSE 0 END) AS DOUBLE) /
                      CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                               (1 - CAST(l_discount AS DECIMAL(20,4))))
                           AS DOUBLE), 6) AS mkt_share
         FROM lineitem l
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation cn ON cn.n_nationkey = c.c_nationkey
         JOIN region r ON r.r_regionkey = cn.n_regionkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation sn ON sn.n_nationkey = s.s_nationkey
         WHERE r.r_name = 'ASIA'
           AND o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY o_year ORDER BY o_year""",

    // HAVING vs global total in integer-exact form: value·1000 > total
    "q_tpch_q11" ->
      """WITH lv AS (
           SELECT l_partkey,
                  SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                      (1 - CAST(l_discount AS DECIMAL(20,4)))) AS value_dec
           FROM lineitem l
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           WHERE s.s_nationkey < 5
           GROUP BY l_partkey),
         t AS (SELECT SUM(value_dec) AS total_dec FROM lv)
         SELECT lv.l_partkey AS p_partkey,
                CAST(lv.value_dec AS DOUBLE) AS value
         FROM lv, t WHERE lv.value_dec * 1000 > t.total_dec
         ORDER BY value DESC, p_partkey ASC LIMIT 100""",

    "q_tpch_q15" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
                      (1 - CAST(l_discount AS DECIMAL(20,4)))) AS total_dec
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey),
         mx AS (SELECT MAX(total_dec) AS max_dec FROM rev)
         SELECT r.l_suppkey AS s_suppkey, s.s_name,
                CAST(r.total_dec AS DOUBLE) AS total_revenue
         FROM rev r
         JOIN supplier s ON s.s_suppkey = r.l_suppkey
         JOIN mx ON r.total_dec = mx.max_dec
         ORDER BY s_suppkey""",

    "q_tpch_q16" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         SELECT p.p_brand, p.p_type, p.p_size,
                count(DISTINCT ps.l_suppkey) AS supplier_cnt
         FROM ps
         JOIN part p ON p.p_partkey = ps.l_partkey
         WHERE p.p_type <> 'PROMO'
           AND p.p_size IN (1,4,9,14,19,24,29,34,49)
           AND ps.l_suppkey NOT IN (
             SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
         GROUP BY p.p_brand, p.p_type, p.p_size
         ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""",

    // shipped-quantity dominance in integer-exact form: qty·2 > total
    "q_tpch_q20" ->
      """WITH l96 AS (
           SELECT l_partkey, l_suppkey,
                  CAST(l_quantity AS DECIMAL(20,4)) AS q
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'),
         ps AS (SELECT l_partkey, l_suppkey, SUM(q) AS ps_qty
                FROM l96 JOIN part p ON p.p_partkey = l96.l_partkey
                WHERE p.p_name LIKE 'small%'
                GROUP BY l_partkey, l_suppkey),
         pt AS (SELECT l_partkey, SUM(ps_qty) AS p_qty
                FROM ps GROUP BY l_partkey)
         SELECT s.s_name, s.s_acctbal
         FROM supplier s
         WHERE s.s_nationkey < 20 AND s.s_suppkey IN (
           SELECT ps.l_suppkey FROM ps JOIN pt ON pt.l_partkey = ps.l_partkey
           WHERE ps.ps_qty * 2 > pt.p_qty)
         ORDER BY s.s_name""",

    "q_tpch_q21" ->
      """SELECT s.s_name, count(*) AS numwait
         FROM lineitem l1
         JOIN orders o ON o.o_orderkey = l1.l_orderkey
         JOIN supplier s ON s.s_suppkey = l1.l_suppkey
         WHERE l1.l_returnflag = 'R' AND o.o_orderstatus = 'F'
           AND s.s_nationkey < 13
           AND EXISTS (
             SELECT 1 FROM lineitem l2
             WHERE l2.l_orderkey = l1.l_orderkey
               AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (
             SELECT 1 FROM lineitem l3
             WHERE l3.l_orderkey = l1.l_orderkey
               AND l3.l_suppkey <> l1.l_suppkey
               AND l3.l_returnflag = 'R')
         GROUP BY s.s_name
         ORDER BY numwait DESC, s.s_name ASC LIMIT 100""",

    // positive-balance average in integer-exact form: bal·cnt > sum
    "q_tpch_q22" ->
      """WITH pos AS (
           SELECT SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS sum_bal,
                  COUNT(*) AS cnt_bal
           FROM customer WHERE c_acctbal > 0.0 AND c_nationkey < 7)
         SELECT c.c_nationkey, count(*) AS numcust,
                CAST(SUM(CAST(c.c_acctbal AS DECIMAL(20,4))) AS DOUBLE)
                  AS totacctbal
         FROM customer c, pos
         WHERE c.c_nationkey < 7
           AND CAST(c.c_acctbal AS DECIMAL(20,4)) * pos.cnt_bal
               > pos.sum_bal
           AND NOT EXISTS (
             SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey
               AND o.o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY c.c_nationkey ORDER BY c.c_nationkey""",

    // HLL bound check: the estimate is engine-seeded, so the oracle
    // asserts the accuracy CONTRACT — the Spark side emits 1 only when
    // |approx - exact| <= 3*rsd*exact (rsd 0.05); a broken sketch flips
    // the flag and the hash goes red
    "q_approx_distinct" ->
      """SELECT o_orderstatus,
                count(DISTINCT o_custkey) AS exact_cust,
                CAST(1 AS BIGINT) AS within_bound
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // KMV: identical md5→60-bit-hash→bottom-k→(k-1)·2^60/h_k arithmetic
    "q_kmv_distinct" ->
      """WITH h AS (
           SELECT DISTINCT o_orderstatus,
                  ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
                    AS hv
           FROM orders WHERE o_custkey IS NOT NULL),
         r AS (
           SELECT o_orderstatus, hv,
                  row_number() OVER (PARTITION BY o_orderstatus ORDER BY hv)
                    AS rn
           FROM h)
         SELECT o_orderstatus,
                CAST(CASE WHEN count(*) < 64 THEN count(*)
                          ELSE floor(63.0 * 1152921504606846976.0 /
                                     CAST(max(hv) AS DOUBLE))
                     END AS BIGINT) AS est_distinct
         FROM r WHERE rn <= 64
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // same md5→60-bit chain as q_kmv_distinct; tags replayed by UNION ALL
    "q_kmv_setops" ->
      """WITH m AS (
           SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
                    AS h,
                  bool_or(o_orderstatus = 'F') AS in_a,
                  bool_or(o_orderstatus = 'O') AS in_b
           FROM orders
           WHERE o_custkey IS NOT NULL AND o_orderstatus IN ('F','O')
           GROUP BY h),
         t AS (
           SELECT h, in_a, in_b, 'a' AS tag FROM m WHERE in_a
           UNION ALL SELECT h, in_a, in_b, 'b' FROM m WHERE in_b
           UNION ALL SELECT h, in_a, in_b, 'u' FROM m),
         r AS (SELECT *, row_number() OVER (PARTITION BY tag ORDER BY h)
                         AS rn FROM t),
         s AS (SELECT tag, count(*) AS n, max(h) AS hk,
                      CAST(SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
                           AS BIGINT) AS nboth
               FROM r WHERE rn <= 64 GROUP BY tag),
         e AS (SELECT tag, n, nboth,
                      CASE WHEN n < 64 THEN n
                           ELSE CAST(floor(63.0 * 1152921504606846976.0 /
                                           CAST(hk AS DOUBLE)) AS BIGINT)
                      END AS est
               FROM s)
         SELECT MAX(CASE WHEN tag = 'a' THEN est END) AS est_a,
                MAX(CASE WHEN tag = 'b' THEN est END) AS est_b,
                MAX(CASE WHEN tag = 'u' THEN est END) AS est_union,
                MAX(CASE WHEN tag = 'u' THEN
                      CASE WHEN n < 64 THEN nboth
                           ELSE CAST(floor(CAST(nboth * est AS DOUBLE) / 64)
                                     AS BIGINT) END END) AS est_intersect
         FROM e""",

    "q_variant_json" ->
      """SELECT event_type, count(*) AS n,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS BIGINT) AS sum_k,
                CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS BIGINT) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                md5(text) AS content_md5
         FROM documents ORDER BY doc_id""",

    // replays the stub codec byte-exactly: c = c*31 + byte with 64-bit
    // wraparound via HUGEINT mod 2^64 (texts are ASCII, so ascii(char)
    // = byte); |trunc(c/7)| computed as abs(c) // 7
    "q_multimodal_decode" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
                  CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END AS kind,
                  left(text, 64) AS p
           FROM documents),
         c AS (
           SELECT media_id, kind, len(p) AS n_raw,
                  list_reduce(
                    list_prepend(CAST(0 AS HUGEINT),
                      list_transform(range(1, len(p) + 1),
                                     i -> CAST(ascii(p[i]) AS HUGEINT))),
                    (acc, b) -> (acc * 31 + b) %
                                18446744073709551616::HUGEINT) AS m64
           FROM m),
         s AS (
           SELECT media_id, kind, n_raw,
                  CAST(CASE WHEN m64 >= 9223372036854775808::HUGEINT
                            THEN m64 - 18446744073709551616::HUGEINT
                            ELSE m64 END AS BIGINT) AS checksum
           FROM c),
         d AS (
           SELECT media_id, kind,
                  CAST(16 + abs(checksum) % 1024 AS INT) AS width,
                  CAST(16 + (abs(checksum) // 7) % 1024 AS INT) AS height,
                  CAST(n_raw AS BIGINT) AS n_bytes, checksum
           FROM s),
         r AS (
           SELECT *, least(1.0, 256.0 / greatest(width, height)) AS scale
           FROM d)
         SELECT media_id, kind, width, height, n_bytes, checksum,
                CAST(floor(width * scale) AS INT) AS out_width,
                CAST(floor(height * scale) AS INT) AS out_height
         FROM r ORDER BY media_id""",

    "q_frame_sample" ->
      """SELECT doc_id AS media_id,
                unnest(range(0, greatest(1,
                  octet_length(encode(repeat(text, 50))) // 4096), 2))
                  AS frame_idx
         FROM documents WHERE doc_id % 3 = 0
         ORDER BY media_id, frame_idx""",

    // 3 PageRank iterations as chained CTEs — identical edge set,
    // identical r_{t+1} = (1-d) + 0.85·Σ r_t/deg arithmetic
    "q_pagerank" ->
      """WITH e0 AS (
           SELECT DISTINCT 's' || l_suppkey AS src, 'c' || o_custkey AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT src, dst FROM e0
               UNION SELECT dst AS src, src AS dst FROM e0),
         deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
         r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS pr FROM deg),
         r1 AS (SELECT e.dst AS node, (1.0 - 0.85) + 0.85 * SUM(r.pr / d.deg) AS pr
                FROM e JOIN r0 r ON e.src = r.node
                       JOIN deg d ON e.src = d.node GROUP BY e.dst),
         r2 AS (SELECT e.dst AS node, (1.0 - 0.85) + 0.85 * SUM(r.pr / d.deg) AS pr
                FROM e JOIN r1 r ON e.src = r.node
                       JOIN deg d ON e.src = d.node GROUP BY e.dst),
         r3 AS (SELECT e.dst AS node, (1.0 - 0.85) + 0.85 * SUM(r.pr / d.deg) AS pr
                FROM e JOIN r2 r ON e.src = r.node
                       JOIN deg d ON e.src = d.node GROUP BY e.dst)
         SELECT node, ROUND(pr, 6) AS pr FROM r3
         ORDER BY ROUND(pr, 6) DESC, node LIMIT 20""",

    // same teleport CASE, division/sum chain, and (1-d)*t + d*mass
    // operation order as the Spark loop, unrolled three iterations
    "q_ppr" ->
      """WITH e0 AS (SELECT DISTINCT 'u' || user_id AS src,
                            't_' || event_type AS dst
                     FROM events),
         e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
         n AS (SELECT DISTINCT src AS node FROM e),
         t AS (SELECT node, CASE WHEN node = 't_purchase'
                                 THEN 1.0 ELSE 0.0 END AS t FROM n),
         r0 AS (SELECT node, t AS pr FROM t),
         r1 AS (SELECT t.node, (1.0 - 0.85) * t.t + 0.85 * COALESCE(m.im, 0.0) AS pr
                FROM t LEFT JOIN (SELECT e.dst AS node,
                                         SUM(r.pr / d.deg) AS im
                                  FROM e JOIN r0 r ON e.src = r.node
                                         JOIN deg d ON e.src = d.node
                                  GROUP BY e.dst) m USING (node)),
         r2 AS (SELECT t.node, (1.0 - 0.85) * t.t + 0.85 * COALESCE(m.im, 0.0) AS pr
                FROM t LEFT JOIN (SELECT e.dst AS node,
                                         SUM(r.pr / d.deg) AS im
                                  FROM e JOIN r1 r ON e.src = r.node
                                         JOIN deg d ON e.src = d.node
                                  GROUP BY e.dst) m USING (node)),
         r3 AS (SELECT t.node, (1.0 - 0.85) * t.t + 0.85 * COALESCE(m.im, 0.0) AS pr
                FROM t LEFT JOIN (SELECT e.dst AS node,
                                         SUM(r.pr / d.deg) AS im
                                  FROM e JOIN r2 r ON e.src = r.node
                                         JOIN deg d ON e.src = d.node
                                  GROUP BY e.dst) m USING (node))
         SELECT node, ROUND(pr, 6) AS ppr FROM r3
         ORDER BY ppr DESC, node ASC LIMIT 20""",

    // three-way distinct self-join replays the within-basket triple
    // expansion; VARCHAR part ordering matches the sorted string sets
    "q_itemsets3" ->
      """WITH li AS (SELECT DISTINCT l_orderkey,
                            CAST(l_partkey AS VARCHAR) AS p
                     FROM lineitem)
         SELECT a.p AS a, b.p AS b, c.p AS c, count(*) AS support
         FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.p < b.p
                   JOIN li c ON a.l_orderkey = c.l_orderkey AND b.p < c.p
         GROUP BY a.p, b.p, c.p HAVING count(*) >= 2
         ORDER BY support DESC, a ASC, b ASC, c ASC LIMIT 30""",

    "q_bm25" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         base AS (SELECT doc_id, len(t) AS dl FROM toks),
         stats AS (SELECT count(*) AS n_docs, AVG(dl) AS avgdl FROM base),
         tf AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM toks) u
           WHERE term IN ('spark', 'hash', 'window')
           GROUP BY doc_id, term),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         parts AS (
           SELECT tf.doc_id AS doc_id,
                  ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf
                    / (tf.tf + 1.2 * ((1.0 - 0.75)
                        + 0.75 * b.dl / s.avgdl)) AS part
           FROM tf JOIN df USING (term)
                JOIN base b ON tf.doc_id = b.doc_id
                CROSS JOIN stats s)
         SELECT doc_id, ROUND(SUM(part), 4) AS score
         FROM parts GROUP BY doc_id
         ORDER BY ROUND(SUM(part), 4) DESC, doc_id LIMIT 10""",

    // per-query BM25 replay (q_bm25's CTE) + boolean-AND relevance via
    // list_has_all; MRR/precision/recall are single exact divisions
    "q_retrieval_eval" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         base AS (SELECT doc_id, len(t) AS dl FROM toks),
         stats AS (SELECT count(*) AS n_docs, AVG(dl) AS avgdl FROM base),
         tf1 AS (SELECT doc_id, term, count(*) AS tf
                 FROM (SELECT doc_id, unnest(t) AS term FROM toks) u
                 WHERE term IN ('spark', 'hash', 'window')
                 GROUP BY doc_id, term),
         df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY term),
         bm1 AS (SELECT tf1.doc_id,
                        ROUND(SUM(ln(1.0 + (s.n_docs - df1.df + 0.5)
                                     / (df1.df + 0.5)) * tf1.tf
                                  / (tf1.tf + 1.2 * ((1.0 - 0.75)
                                      + 0.75 * b.dl / s.avgdl))), 4) AS score
                 FROM tf1 JOIN df1 USING (term)
                      JOIN base b ON tf1.doc_id = b.doc_id
                      CROSS JOIN stats s
                 GROUP BY tf1.doc_id
                 ORDER BY score DESC, tf1.doc_id LIMIT 10),
         r1 AS (SELECT doc_id, CAST(row_number() OVER
                  (ORDER BY score DESC, doc_id) AS INT) AS rank FROM bm1),
         rel1 AS (SELECT doc_id FROM toks
                  WHERE list_has_all(t, ['spark', 'hash', 'window'])),
         tf2 AS (SELECT doc_id, term, count(*) AS tf
                 FROM (SELECT doc_id, unnest(t) AS term FROM toks) u
                 WHERE term IN ('merge', 'table')
                 GROUP BY doc_id, term),
         df2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY term),
         bm2 AS (SELECT tf2.doc_id,
                        ROUND(SUM(ln(1.0 + (s.n_docs - df2.df + 0.5)
                                     / (df2.df + 0.5)) * tf2.tf
                                  / (tf2.tf + 1.2 * ((1.0 - 0.75)
                                      + 0.75 * b.dl / s.avgdl))), 4) AS score
                 FROM tf2 JOIN df2 USING (term)
                      JOIN base b ON tf2.doc_id = b.doc_id
                      CROSS JOIN stats s
                 GROUP BY tf2.doc_id
                 ORDER BY score DESC, tf2.doc_id LIMIT 10),
         r2 AS (SELECT doc_id, CAST(row_number() OVER
                  (ORDER BY score DESC, doc_id) AS INT) AS rank FROM bm2),
         rel2 AS (SELECT doc_id FROM toks
                  WHERE list_has_all(t, ['merge', 'table'])),
         m AS (
           SELECT 0 AS query_id, 'spark hash window' AS query,
                  (SELECT count(*) FROM rel1) AS n_rel,
                  (SELECT count(*) FROM r1 JOIN rel1 USING (doc_id)) AS n_hits,
                  (SELECT min(rank) FROM r1 JOIN rel1 USING (doc_id)) AS fr
           UNION ALL
           SELECT 1, 'merge table',
                  (SELECT count(*) FROM rel2),
                  (SELECT count(*) FROM r2 JOIN rel2 USING (doc_id)),
                  (SELECT min(rank) FROM r2 JOIN rel2 USING (doc_id)))
         SELECT query_id, query, n_rel, n_hits,
                ROUND(COALESCE(1.0 / fr, 0.0), 6) AS mrr,
                ROUND(n_hits / 10.0, 6) AS precision_k,
                ROUND(CASE WHEN n_rel > 0 THEN n_hits * 1.0 / n_rel
                      ELSE 0.0 END, 6) AS recall_k
         FROM m ORDER BY query_id""",

    // BM25 top-20 (same scoring replay as q_bm25) ⊕ cosine top-20 for
    // query vector 0 (same norm/dot chain as q_embed_topk), fused by
    // 1/(60+rank) with the identical two-term sum order
    "q_rrf_fusion" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         base AS (SELECT doc_id, len(t) AS dl FROM toks),
         stats AS (SELECT count(*) AS n_docs, AVG(dl) AS avgdl FROM base),
         tf AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM toks) u
           WHERE term IN ('spark', 'hash', 'window')
           GROUP BY doc_id, term),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         parts AS (
           SELECT tf.doc_id AS doc_id,
                  ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf
                    / (tf.tf + 1.2 * ((1.0 - 0.75)
                        + 0.75 * b.dl / s.avgdl)) AS part
           FROM tf JOIN df USING (term)
                JOIN base b ON tf.doc_id = b.doc_id
                CROSS JOIN stats s),
         bm AS (SELECT doc_id, ROUND(SUM(part), 4) AS score
                FROM parts GROUP BY doc_id
                ORDER BY ROUND(SUM(part), 4) DESC, doc_id LIMIT 20),
         bmr AS (SELECT doc_id,
                        CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                             AS INT) AS rank_a
                 FROM bm),
         nv AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings),
         qv AS (SELECT v FROM nv WHERE vec_id = 0),
         scored AS (
           SELECT c.vec_id AS doc_id,
                  ROUND(list_dot_product(qv.v, c.v), 6) AS cos
           FROM nv c CROSS JOIN qv WHERE c.vec_id <> 0),
         er AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY cos DESC, doc_id)
                            AS INT) AS rank_b
                FROM scored ORDER BY cos DESC, doc_id LIMIT 20)
         SELECT COALESCE(bmr.doc_id, er.doc_id) AS doc_id,
                bmr.rank_a AS rank_a, er.rank_b AS rank_b,
                ROUND(COALESCE(1.0 / (60 + bmr.rank_a), 0.0)
                      + COALESCE(1.0 / (60 + er.rank_b), 0.0), 6) AS rrf
         FROM bmr FULL OUTER JOIN er ON bmr.doc_id = er.doc_id
         ORDER BY rrf DESC, doc_id LIMIT 10""",

    // exact replay of the count-min cells: same fixed hash family
    // ((a·(x mod p) + b) mod p) mod width, p = 2^31−1, in BIGINT math
    "q_cms_counts" ->
      """WITH h(i, a, b) AS (
           VALUES (0, 1299721, 7), (1, 15485863, 101),
                  (2, 32452843, 1009), (3, 49979687, 10007)),
         cells AS (
           SELECT h.i AS i,
                  ((h.a * ((user_id % 2147483647 + 2147483647) % 2147483647)
                    + h.b) % 2147483647) % 64 AS bkt,
                  count(*) AS c
           FROM events CROSS JOIN h GROUP BY 1, 2),
         probes AS (SELECT unnest(range(0, 10)) AS probe_user),
         est AS (
           SELECT p.probe_user AS probe_user,
                  MIN(coalesce(c.c, 0)) AS est
           FROM probes p CROSS JOIN h
           LEFT JOIN cells c ON c.i = h.i
            AND c.bkt = ((h.a * ((p.probe_user % 2147483647 + 2147483647)
                                 % 2147483647) + h.b) % 2147483647) % 64
           GROUP BY 1)
         SELECT probe_user, CAST(est AS BIGINT) AS est
         FROM est ORDER BY probe_user""",

    // same Knuth multiplicative hash + integer threshold, per stratum;
    // langs outside the fraction map drop (weight 0), mirroring sampleBy
    "q_stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled
         FROM documents
         WHERE (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 <
               CAST(floor(CASE lang WHEN 'en' THEN 0.5
                                    WHEN 'de' THEN 1.0
                                    WHEN 'fr' THEN 0.25
                                    ELSE 0.0 END * 4294967296.0) AS BIGINT)
         GROUP BY lang ORDER BY lang""",

    // α=0.5 temperature mixing: sqrt-exact rates + the same hash rule
    "q_temperature_mix" ->
      """WITH t AS (SELECT source, count(*) AS n_total
                    FROM documents GROUP BY source),
         m AS (SELECT min(n_total) AS nmin FROM t),
         r AS (SELECT source, n_total,
                      sqrt(CAST(nmin AS DOUBLE) / CAST(n_total AS DOUBLE))
                        AS rate_full
               FROM t, m),
         k AS (SELECT d.source, count(*) AS n_kept
               FROM documents d JOIN r USING (source)
               WHERE (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 <
                     CAST(floor(rate_full * 4294967296.0) AS BIGINT)
               GROUP BY d.source)
         SELECT r.source AS source, r.n_total AS n_total,
                ROUND(r.rate_full, 6) AS rate,
                coalesce(k.n_kept, 0) AS n_kept
         FROM r LEFT JOIN k USING (source) ORDER BY source""",

    // same Knuth multiplicative hash + integer threshold compare
    "q_weighted_mix" ->
      """WITH d AS (
           SELECT doc_id, source,
                  (CAST(substr(source, 4) AS INT) % 5 + 1)
                    / CAST(5.0 AS DOUBLE) AS wt
           FROM documents),
         k AS (
           SELECT source, count(*) AS n_kept
           FROM d
           WHERE (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 <
                 CAST(floor(wt * 4294967296.0) AS BIGINT)
           GROUP BY source),
         t AS (SELECT source, MAX(wt) AS wt, count(*) AS n_total
               FROM d GROUP BY source)
         SELECT t.source AS source, t.wt AS wt, t.n_total AS n_total,
                coalesce(k.n_kept, 0) AS n_kept,
                ROUND(coalesce(k.n_kept, 0) / CAST(t.n_total AS DOUBLE), 4)
                  AS kept_rate
         FROM t LEFT JOIN k USING (source) ORDER BY source""",

    // same IEEE-exact division/sqrt chain as the Spark side; FLOOR of
    // the identical double product, so kept counts replay exactly
    "q_mix_schedule" ->
      """WITH c AS (SELECT lang AS source, count(*) AS n_docs
                    FROM documents GROUP BY lang),
         m AS (SELECT MIN(n_docs) AS nmin FROM c)
         SELECT source, n_docs,
                ROUND(CAST(nmin AS DOUBLE) / n_docs, 6) AS rate_a100,
                CAST(FLOOR(n_docs * (CAST(nmin AS DOUBLE) / n_docs))
                     AS BIGINT) AS keep_a100,
                ROUND(sqrt(CAST(nmin AS DOUBLE) / n_docs), 6) AS rate_a50,
                CAST(FLOOR(n_docs * sqrt(CAST(nmin AS DOUBLE) / n_docs))
                     AS BIGINT) AS keep_a50,
                ROUND(sqrt(sqrt(CAST(nmin AS DOUBLE) / n_docs)), 6) AS rate_a25,
                CAST(FLOOR(n_docs * sqrt(sqrt(CAST(nmin AS DOUBLE) / n_docs)))
                     AS BIGINT) AS keep_a25
         FROM c CROSS JOIN m ORDER BY source""",

    // same percentile thresholds + filtered decimal sums; >= boundary
    // on the identical doubles on both engines
    "q_pareto" ->
      """WITH r AS (
           SELECT o_custkey,
                  SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS rev_dec,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                    AS rev
           FROM orders GROUP BY o_custkey),
         t AS (SELECT quantile_cont(rev, 0.99) AS p99,
                      quantile_cont(rev, 0.90) AS p90,
                      quantile_cont(rev, 0.50) AS p50,
                      SUM(rev_dec) AS total_dec
               FROM r),
         seg AS (
           SELECT 'top1' AS segment, rev_dec, total_dec
           FROM r CROSS JOIN t WHERE rev >= p99
           UNION ALL
           SELECT 'top10', rev_dec, total_dec
           FROM r CROSS JOIN t WHERE rev >= p90
           UNION ALL
           SELECT 'top50', rev_dec, total_dec
           FROM r CROSS JOIN t WHERE rev >= p50)
         SELECT segment, count(*) AS n_customers,
                ROUND(CAST(SUM(rev_dec) AS DOUBLE)
                      / CAST(MAX(total_dec) AS DOUBLE), 6) AS revenue_share
         FROM seg GROUP BY segment ORDER BY segment""",

    // same normalized-fingerprint replay as q_fingerprint
    "q_dedup_rate" ->
      """WITH f AS (
           SELECT source,
                  md5(array_to_string(
                    list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                x -> len(x) > 0), ' ')) AS fp
           FROM documents)
         SELECT source, count(*) AS n_docs,
                count(DISTINCT fp) AS n_unique,
                ROUND(CAST(count(*) - count(DISTINCT fp) AS DOUBLE)
                      / count(*), 6) AS dup_rate
         FROM f GROUP BY source ORDER BY source""",

    // same (user, type) partition and (ts, event_id) total order;
    // epoch_us == unix_micros
    "q_interarrival" ->
      """WITH g AS (
           SELECT event_type,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) AS gap_us
           FROM events)
         SELECT event_type, count(*) AS n_gaps,
                ROUND(quantile_cont(gap_us, 0.5) / 1e6, 4) AS median_gap_s,
                ROUND(quantile_cont(gap_us, 0.9) / 1e6, 4) AS p90_gap_s
         FROM g WHERE gap_us IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",

    // same clamped floor((v-lo)/((hi-lo)/20)) bucket expression
    // the v CTE casts to DOUBLE up front so every bucket operand is the
    // same IEEE double Spark's cast("double") sees — bit-identical floor
    // boundaries even if a future testdata generation stores
    // o_totalprice as DECIMAL (DuckDB would otherwise subtract exactly
    // in decimal before dividing, which can flip floor() at boundaries)
    "q_numeric_hist" ->
      """WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS p FROM orders
                    WHERE o_totalprice IS NOT NULL),
            b AS (SELECT MIN(p) AS lo, MAX(p) AS hi FROM v)
         SELECT CASE WHEN hi = lo THEN 0
                     ELSE least(19, CAST(floor((p - lo) /
                                               ((hi - lo) / 20)) AS INT))
                END AS bucket,
                count(*) AS n,
                ROUND(MIN(p), 4) AS bucket_min,
                ROUND(MAX(p), 4) AS bucket_max
         FROM v CROSS JOIN b
         GROUP BY bucket ORDER BY bucket""",

    // same 20-token disjoint chunk replay as q_chunk's CTE (stride ==
    // chunkSize), same df≤50 cap
    "q_chunk_dedup" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         c AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
         st AS (SELECT doc_id, t, n, unnest(range(0, n, 20)) AS start FROM c),
         ch AS (SELECT DISTINCT doc_id,
                       md5(array_to_string(t[start + 1 : start + 20], ' '))
                         AS fp
                FROM st WHERE least(20, n - start) = 20),
         dfc AS (SELECT fp FROM ch GROUP BY fp HAVING count(*) <= 50),
         cc AS (SELECT ch.doc_id, ch.fp FROM ch JOIN dfc USING (fp))
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                count(*) AS shared_chunks
         FROM cc a JOIN cc b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY a_id, b_id ORDER BY a_id, b_id""",

    // same pairwise-slope construction; quantile_cont == percentile
    "q_theil_sen" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                               count(*) AS n
                        FROM events GROUP BY event_type, day),
         d AS (SELECT event_type,
                      CAST(date_diff('day', DATE '2020-01-01', day)
                           AS DOUBLE) AS d,
                      n
               FROM daily),
         p AS (SELECT a.event_type AS event_type,
                      CAST(b.n - a.n AS DOUBLE) / (b.d - a.d) AS slope
               FROM d a JOIN d b ON a.event_type = b.event_type
                                AND b.d > a.d)
         SELECT event_type, count(*) AS n_pairs,
                ROUND(quantile_cont(slope, 0.5), 6) AS ts_slope
         FROM p GROUP BY event_type ORDER BY event_type""",

    // exact distinct-dependent counting per determinant, twice
    "q_fd_profile" ->
      """WITH o AS (SELECT o_orderkey AS k,
                           count(DISTINCT o_custkey) AS nd
                    FROM orders GROUP BY o_orderkey),
         e AS (SELECT user_id AS k,
                      count(DISTINCT event_type) AS nd
               FROM events GROUP BY user_id)
         SELECT 'orderkey_custkey' AS fd, count(*) AS n_keys,
                count(CASE WHEN nd > 1 THEN 1 END) AS violating_keys,
                ROUND(count(CASE WHEN nd > 1 THEN 1 END)
                      / CAST(count(*) AS DOUBLE), 6) AS violation_rate,
                MAX(nd) AS max_dep_values
         FROM o
         UNION ALL
         SELECT 'user_eventtype', count(*),
                count(CASE WHEN nd > 1 THEN 1 END),
                ROUND(count(CASE WHEN nd > 1 THEN 1 END)
                      / CAST(count(*) AS DOUBLE), 6),
                MAX(nd)
         FROM e
         ORDER BY fd""",

    // recomputed exact sliding distinct — equals the sketch rollup
    // while the window cardinality sits below k
    "q_rolling_uniques" ->
      """WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                        FROM events),
         days AS (SELECT DISTINCT day FROM daily)
         SELECT d.day AS day,
                count(DISTINCT u.day) AS n_days,
                count(DISTINCT u.user_id) AS uniques
         FROM days d JOIN daily u ON u.day BETWEEN d.day - 6 AND d.day
         GROUP BY d.day ORDER BY d.day""",

    // exact percentiles over per-key frequencies: quantile_cont is the
    // same linear-interpolation definition as Spark's percentile
    "q_key_skew" ->
      """WITH f AS (SELECT user_id, count(*) AS freq
                    FROM events GROUP BY user_id)
         SELECT CAST(SUM(freq) AS BIGINT) AS n_rows,
                count(*) AS n_keys,
                MAX(freq) AS max_freq,
                ROUND(AVG(freq), 4) AS avg_freq,
                ROUND(CAST(MAX(freq) AS DOUBLE) / SUM(freq), 6) AS top1_share,
                ROUND(quantile_cont(freq, 0.5), 4) AS freq_p50,
                ROUND(quantile_cont(freq, 0.9), 4) AS freq_p90,
                ROUND(quantile_cont(freq, 0.99), 4) AS freq_p99
         FROM f""",

    // integer ceil-division replayed with //; only keys above the
    // per-task budget appear
    "q_salt_plan" ->
      """WITH f AS (SELECT user_id AS key, count(*) AS freq
                    FROM events GROUP BY user_id)
         SELECT key, freq, CAST((freq + 69) // 70 AS INT) AS salt
         FROM f WHERE freq > 70
         ORDER BY freq DESC, key ASC""",

    // bucket = bit length via bin(); same tokenization replay as the
    // other text queries
    "q_length_hist" ->
      """WITH t AS (
           SELECT CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> len(x) > 0)) AS BIGINT) AS n
           FROM documents)
         SELECT CAST(length(bin(n)) AS INT) AS bucket,
                count(*) AS n_docs,
                CAST(SUM(n) AS BIGINT) AS total_len,
                MIN(n) AS min_len, MAX(n) AS max_len
         FROM t GROUP BY bucket ORDER BY bucket""",

    // same md5→60-bit KMV chain as q_kmv_distinct, stacked per column
    "q_table_profile" ->
      """WITH s AS (
           SELECT 'o_orderkey' AS col_name,
                  CAST(o_orderkey AS VARCHAR) AS v FROM orders
           UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
           FROM orders
           UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
           UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
         b AS (SELECT col_name, count(*) AS n_rows,
                      count(CASE WHEN v IS NULL THEN 1 END) AS n_null
               FROM s GROUP BY col_name),
         h AS (SELECT DISTINCT col_name,
                      ('0x' || substr(md5(v), 1, 15))::BIGINT AS hv
               FROM s WHERE v IS NOT NULL),
         r AS (SELECT col_name, hv,
                      row_number() OVER (PARTITION BY col_name ORDER BY hv)
                        AS rn
               FROM h),
         d AS (SELECT col_name,
                      CAST(CASE WHEN count(*) < 64 THEN count(*)
                           ELSE floor(63.0 * 1152921504606846976.0 /
                                      CAST(max(hv) AS DOUBLE))
                           END AS BIGINT) AS est_distinct
               FROM r WHERE rn <= 64 GROUP BY col_name)
         SELECT b.col_name AS col_name, b.n_rows AS n_rows,
                b.n_null AS n_null,
                ROUND(CAST(b.n_null AS DOUBLE) / b.n_rows, 6) AS null_rate,
                coalesce(d.est_distinct, 0) AS est_distinct
         FROM b LEFT JOIN d USING (col_name) ORDER BY col_name""",

    // exact medians via quantile_cont (same interpolation as Spark's
    // percentile); outlier predicate in the identical operation order
    "q_robust_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                      FROM events GROUP BY event_type),
         dv AS (SELECT e.event_type, m.med,
                       abs(e.value - m.med) AS adev
                FROM events e JOIN med m USING (event_type)),
         mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
                 FROM dv GROUP BY event_type)
         SELECT dv.event_type AS event_type, count(*) AS n,
                ROUND(MAX(dv.med), 4) AS med,
                ROUND(MAX(mad.mad), 4) AS mad,
                count(CASE WHEN dv.adev > 3.0 * mad.mad THEN 1 END)
                  AS n_outliers,
                ROUND(count(CASE WHEN dv.adev > 3.0 * mad.mad THEN 1 END)
                      / CAST(count(*) AS DOUBLE), 6) AS outlier_rate
         FROM dv JOIN mad USING (event_type)
         GROUP BY dv.event_type ORDER BY event_type""",

    // HUGEINT-exact frequency products cast to BIGINT, mirroring the
    // Spark side's decimal(38,0) products
    "q_join_cardinality" ->
      """WITH f AS (SELECT l_partkey AS k, count(*) AS fl
                    FROM lineitem GROUP BY l_partkey)
         SELECT count(*) AS n_matched_keys,
                CAST(SUM(fl * fl) AS BIGINT) AS join_rows,
                CAST(MAX(fl * fl) AS BIGINT) AS max_key_fanout
         FROM f""",

    // same exact-percentile bounds, clip predicate, and round-then-
    // decimal-sum mean chain as the Spark side
    "q_winsorize" ->
      """WITH b AS (SELECT event_type,
                           quantile_cont(value, 0.01) AS lo,
                           quantile_cont(value, 0.99) AS hi
                    FROM events GROUP BY event_type),
         c AS (SELECT e.event_type, e.value, b.lo, b.hi,
                      least(greatest(e.value, b.lo), b.hi) AS clip
               FROM events e JOIN b USING (event_type))
         SELECT event_type, count(*) AS n,
                ROUND(MAX(lo), 4) AS lo, ROUND(MAX(hi), 4) AS hi,
                count(CASE WHEN value < lo THEN 1 END) AS n_clipped_lo,
                count(CASE WHEN value > hi THEN 1 END) AS n_clipped_hi,
                ROUND(CAST(SUM(CAST(ROUND(clip, 4) AS DECIMAL(20,4)))
                           AS DOUBLE) / count(*), 4) AS mean_wins
         FROM c GROUP BY event_type ORDER BY event_type""",

    // lead() with the same (ts, event_id) total order; probabilities
    // as one double division of exact counts
    "q_transitions" ->
      """WITH nx AS (
           SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS to_type
           FROM events),
         pr AS (SELECT from_type, to_type, count(*) AS n
                FROM nx WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
         tt AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
                FROM pr GROUP BY from_type)
         SELECT pr.from_type AS from_type, pr.to_type AS to_type, pr.n AS n,
                ROUND(CAST(pr.n AS DOUBLE) / tt.n_from, 6) AS p
         FROM pr JOIN tt USING (from_type)
         ORDER BY from_type, to_type""",

    // same capped-gram definition on both engines: grams in ≤50 docs,
    // postings self-join, counts over capped sets only
    "q_containment" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         gr AS (
           SELECT doc_id,
                  unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                                        for i in range(1, len(t) - 3)])) AS g
           FROM toks WHERE len(t) >= 5),
         dfg AS (SELECT g FROM gr GROUP BY g HAVING count(*) <= 50),
         cg AS (SELECT gr.doc_id, gr.g FROM gr JOIN dfg USING (g)),
         sz AS (SELECT doc_id, count(*) AS n_g FROM cg GROUP BY doc_id),
         sh AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       count(*) AS shared
                FROM cg a JOIN cg b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY a_id, b_id)
         SELECT sh.a_id AS a_id, sh.b_id AS b_id, sh.shared AS shared,
                sa.n_g AS n_a, sb.n_g AS n_b,
                ROUND(GREATEST(CAST(sh.shared AS DOUBLE) / sa.n_g,
                               CAST(sh.shared AS DOUBLE) / sb.n_g), 4)
                  AS c_max
         FROM sh JOIN sz sa ON sa.doc_id = sh.a_id
                 JOIN sz sb ON sb.doc_id = sh.b_id
         WHERE ROUND(GREATEST(CAST(sh.shared AS DOUBLE) / sa.n_g,
                              CAST(sh.shared AS DOUBLE) / sb.n_g), 4) >= 0.5
         ORDER BY a_id, b_id""",

    // top-100 vocab with the same (count desc, token asc) boundary
    "q_vocab_coverage" ->
      """WITH toks AS (
           SELECT source,
                  unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                     x -> len(x) > 0)) AS w
           FROM documents),
         cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
         vocab AS (SELECT w FROM cnt ORDER BY c DESC, w ASC LIMIT 100)
         SELECT source, count(*) AS n_tokens, count(v.w) AS n_in_vocab,
                ROUND(1.0 - count(v.w) / CAST(count(*) AS DOUBLE), 6)
                  AS oov_rate
         FROM toks LEFT JOIN vocab v USING (w)
         GROUP BY source ORDER BY source""",

    // same md5(id) walk order and running sum, BIGINT throughout
    "q_token_budget" ->
      """WITH t AS (
           SELECT source, doc_id AS id,
                  CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> len(x) > 0)) AS BIGINT) AS n_tok,
                  md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         c AS (SELECT source, id, n_tok,
                      CAST(SUM(n_tok) OVER (PARTITION BY source
                                            ORDER BY h, id
                                            ROWS UNBOUNDED PRECEDING)
                           AS BIGINT) AS cum_tok
               FROM t)
         SELECT source, count(*) AS n_docs,
                CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                MAX(cum_tok) AS last_cum
         FROM c WHERE cum_tok - n_tok < 2000
         GROUP BY source ORDER BY source""",

    "q_dup_ngram_rate" ->
      """WITH toks AS (
           SELECT doc_id, source,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         gr AS (
           SELECT doc_id, source,
                  unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                                        for i in range(1, len(t) - 3)])) AS g
           FROM toks WHERE len(t) >= 5),
         dc AS (SELECT g, count(*) AS nd FROM gr GROUP BY g),
         sg AS (SELECT DISTINCT source, g FROM gr)
         SELECT sg.source AS source, count(*) AS n_grams,
                count(CASE WHEN dc.nd >= 2 THEN 1 END) AS n_dup,
                ROUND(count(CASE WHEN dc.nd >= 2 THEN 1 END)
                      / CAST(count(*) AS DOUBLE), 4) AS dup_rate
         FROM sg JOIN dc USING (g) GROUP BY sg.source ORDER BY source""",

    "q_source_overlap" ->
      """WITH toks AS (
           SELECT source,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         gr AS (
           SELECT source, unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                                                for i in range(1, len(t) - 3)])) AS g
           FROM toks WHERE len(t) >= 5),
         sg AS (SELECT DISTINCT source AS src, g FROM gr),
         sizes AS (SELECT src, count(*) AS n FROM sg GROUP BY src),
         shared AS (
           SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared
           FROM sg a JOIN sg b USING (g)
           WHERE a.src < b.src GROUP BY 1, 2)
         SELECT s.src_a AS src_a, s.src_b AS src_b, s.n_shared AS n_shared,
                sa.n AS n_a, sb.n AS n_b,
                ROUND(s.n_shared /
                      CAST(sa.n + sb.n - s.n_shared AS DOUBLE), 6) AS jaccard
         FROM shared s
         JOIN sizes sa ON sa.src = s.src_a
         JOIN sizes sb ON sb.src = s.src_b
         ORDER BY src_a, src_b""",

    // HITS, two iterations as chained CTEs — identical edge set,
    // identical L1 normalization per half-step
    "q_hits" ->
      """WITH e AS (SELECT DISTINCT 's' || l_suppkey AS src,
                           'p' || l_partkey AS dst FROM lineitem),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         h0 AS (SELECT node, 1.0 AS h FROM nodes),
         a1r AS (SELECT e.dst AS node, SUM(h0.h) AS a
                 FROM e JOIN h0 ON e.src = h0.node GROUP BY e.dst),
         a1 AS (SELECT node, a / (SELECT SUM(a) FROM a1r) AS a FROM a1r),
         h1r AS (SELECT e.src AS node, SUM(a1.a) AS h
                 FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
         h1 AS (SELECT node, h / (SELECT SUM(h) FROM h1r) AS h FROM h1r),
         a2r AS (SELECT e.dst AS node, SUM(h1.h) AS a
                 FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
         a2 AS (SELECT node, a / (SELECT SUM(a) FROM a2r) AS a FROM a2r),
         h2r AS (SELECT e.src AS node, SUM(a2.a) AS h
                 FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src),
         h2 AS (SELECT node, h / (SELECT SUM(h) FROM h2r) AS h FROM h2r)
         SELECT n.node AS node, ROUND(COALESCE(a2.a, 0), 6) AS auth,
                ROUND(COALESCE(h2.h, 0), 6) AS hub
         FROM nodes n LEFT JOIN a2 ON n.node = a2.node
                      LEFT JOIN h2 ON n.node = h2.node
         ORDER BY ROUND(COALESCE(a2.a, 0), 6) DESC,
                  ROUND(COALESCE(h2.h, 0), 6) DESC, n.node LIMIT 20""",

    // synchronous LPA, two rounds as chained CTEs: adopt the most
    // frequent neighbor label, ties to the smallest label
    "q_label_prop" ->
      """WITH e0 AS (SELECT DISTINCT 's' || l_suppkey AS src,
                            'p' || l_partkey AS dst FROM lineitem),
         e AS (SELECT src, dst FROM e0
               UNION SELECT dst AS src, src AS dst FROM e0),
         r0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
         n1 AS (SELECT e.src AS node, r.label, count(*) AS cnt
                FROM e JOIN r0 r ON e.dst = r.node GROUP BY e.src, r.label),
         r1 AS (SELECT node, label FROM (
                  SELECT node, label, row_number() OVER (
                    PARTITION BY node ORDER BY cnt DESC, label) AS rn
                  FROM n1) WHERE rn = 1),
         n2 AS (SELECT e.src AS node, r.label, count(*) AS cnt
                FROM e JOIN r1 r ON e.dst = r.node GROUP BY e.src, r.label),
         r2 AS (SELECT node, label FROM (
                  SELECT node, label, row_number() OVER (
                    PARTITION BY node ORDER BY cnt DESC, label) AS rn
                  FROM n2) WHERE rn = 1)
         SELECT label, count(*) AS n_members FROM r2 GROUP BY label
         ORDER BY count(*) DESC, label LIMIT 20""",

    // inverted index: same tokenize, same (tf DESC, doc_id) truncation,
    // postings rendered doc_id-ordered as "doc:tf" text
    "q_postings" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         tf AS (SELECT term, doc_id, count(*) AS tf
                FROM (SELECT doc_id, unnest(t) AS term FROM toks) u
                GROUP BY term, doc_id),
         ranked AS (SELECT term, doc_id, tf,
                           count(*) OVER (PARTITION BY term) AS df,
                           row_number() OVER (PARTITION BY term
                             ORDER BY tf DESC, doc_id) AS rn
                    FROM tf)
         SELECT term, df,
                string_agg(doc_id || ':' || tf, ' ' ORDER BY doc_id) AS postings
         FROM ranked WHERE rn <= 20
         GROUP BY term, df
         ORDER BY df DESC, term LIMIT 20""",

    // frozen logistic quality model: identical feature arithmetic to the
    // q_text_quality twins plus the digit class, squashed by exp()
    "q_quality_model" ->
      s"""WITH sc AS ($qualityScoreOracleSql)
         SELECT source, count(*) AS n_docs,
                count(CASE WHEN score >= 0.6 THEN 1 END) AS n_keep,
                ROUND(AVG(score), 4) AS avg_score
         FROM sc GROUP BY source ORDER BY source""",

    // identical tokenize, start offsets every 48, 1-based inclusive list
    // slice == Spark's slice(toks, start+1, 64)
    "q_chunk" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         c AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
         st AS (SELECT doc_id, t, n, unnest(range(0, n, 48)) AS start FROM c)
         SELECT doc_id, start // 48 AS chunk_idx,
                least(64, n - start) AS n_tokens,
                md5(array_to_string(t[start + 1 : start + 64], ' ')) AS chunk_fp
         FROM st ORDER BY doc_id, chunk_idx""",

    "q_stream_enrich" ->
      """SELECT date_trunc('hour', ts) AS window_start, c_nationkey,
                count(*) AS n,
                ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE), 2)
                  AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2 ORDER BY window_start, c_nationkey""",

    "q_hard_negatives" ->
      """WITH nv AS (
           SELECT vec_id, label,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(list_dot_product(q.v, c.v), 6) AS cos
           FROM nv q JOIN nv c ON q.vec_id < 16 AND q.label <> c.label),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id, cos FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // same deterministic bottom-k-by-hash sample; quantile_cont uses the
    // identical linear-interpolation definition as Spark's percentile
    "q_sampled_quantiles" ->
      """SELECT ROUND(quantile_cont(value, 0.5), 4) AS p50,
                ROUND(quantile_cont(value, 0.9), 4) AS p90,
                ROUND(quantile_cont(value, 0.99), 4) AS p99
         FROM (SELECT value FROM events
               ORDER BY md5(CAST(event_id AS VARCHAR)) LIMIT 4096)""",

    // same tokenize; consecutive-pair probe via 1-based list indexing
    // (t[i+1] past the end is NULL, which the filter drops — same
    // never-match semantics as Spark's try_element_at probe)
    "q_phrase" ->
      """WITH toks AS (
           SELECT source,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         m AS (SELECT source,
                      len(list_filter(range(1, greatest(len(t) - 1, 0) + 1),
                          i -> t[i] = 'spark' AND t[i+1] = 'hash')) > 0 AS hit
               FROM toks)
         SELECT source, count(*) AS n_docs,
                count(CASE WHEN hit THEN 1 END) AS n_match
         FROM m GROUP BY source ORDER BY source""",

    "q_group_quantiles" ->
      """WITH s AS (
           SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
           FROM events)
         SELECT event_type,
                ROUND(quantile_cont(value, 0.5), 4) AS p50,
                ROUND(quantile_cont(value, 0.9), 4) AS p90
         FROM s WHERE rn <= 2048
         GROUP BY event_type ORDER BY event_type""",

    // oracle is the brute-force all-pairs join the operator avoids
    "q_fuzzy_join" ->
      """WITH d AS (SELECT DISTINCT p_name FROM part)
         SELECT a.p_name AS a_name, b.p_name AS b_name,
                CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
         FROM d a JOIN d b ON a.p_name < b.p_name
         WHERE levenshtein(a.p_name, b.p_name) <= 2
         ORDER BY a_name, b_name""",

    // same (2-char prefix × length band of 4) blocking; DuckDB's
    // jaro_winkler_similarity is the same algorithm (0.7 boost gate,
    // prefix≤4, scale 0.1) — both sides round to 6 before the threshold
    // so boundary rows agree
    "q_jaro_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part)
         SELECT a.p_name AS name1, b.p_name AS name2,
                ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS sim
         FROM n a JOIN n b
           ON substr(a.p_name, 1, 2) = substr(b.p_name, 1, 2)
          AND CAST(floor(length(a.p_name) / 4) AS BIGINT)
              = CAST(floor(length(b.p_name) / 4) AS BIGINT)
          AND a.p_name < b.p_name
         WHERE ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.5
         ORDER BY name1, name2""",

    // pattern list mirrored verbatim from decontaminationPatterns;
    // matched = indices i (0-based) with contains(text, pats[i+1]),
    // comma-joined to a scalar so the comparer can sort/hash it
    "q_decontaminate" ->
      """WITH p AS (SELECT ['merge batch', 'fast table', 'fast table value',
                            'value part', 'spark order', 'scan slow',
                            'hash value', 'row fast', 'window data'] AS pats),
         m AS (SELECT doc_id,
                      list_filter([0, 1, 2, 3, 4, 5, 6, 7, 8],
                                  i -> contains(text, pats[i + 1])) AS matched_arr
               FROM documents CROSS JOIN p)
         SELECT doc_id,
                array_to_string(list_transform(matched_arr,
                                               x -> CAST(x AS VARCHAR)), ',')
                  AS matched,
                CAST(len(matched_arr) AS INT) AS n_matched
         FROM m WHERE len(matched_arr) > 0
         ORDER BY doc_id""",

    // same tokenize as the other text oracles; MLE unigram LM replay
    "q_unigram_lm" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                     x -> len(x) > 0)) AS w
           FROM documents),
         cnt AS (SELECT w, count(*) AS c_w FROM toks GROUP BY w),
         tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM cnt)
         SELECT doc_id, count(*) AS n_tokens,
                ROUND(avg(ln(CAST(c_w AS DOUBLE) / n_total)), 4) AS avg_logprob
         FROM toks JOIN cnt USING (w) CROSS JOIN tot
         GROUP BY doc_id ORDER BY doc_id""",

    // bigram generation replayed like q_pmi_bigrams; context counts
    // derived from the bigram counts; α=0.5 terms exactly representable
    "q_bigram_lm" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         bi AS (
           SELECT doc_id,
                  unnest([t[i] || ' ' || t[i+1]
                          for i in range(1, len(t))]) AS bg
           FROM toks WHERE len(t) >= 2),
         bic AS (SELECT bg, count(*) AS c_bg FROM bi GROUP BY bg),
         ctx AS (SELECT split_part(bg, ' ', 1) AS w1,
                        CAST(SUM(c_bg) AS BIGINT) AS c_ctx
                 FROM bic GROUP BY 1),
         vv AS (SELECT count(DISTINCT w) AS v
                FROM (SELECT unnest(t) AS w FROM toks))
         SELECT b.doc_id, count(*) AS n_bigrams,
                ROUND(avg(ln((c_bg + 0.5) / (c_ctx + 0.5 * vv.v))), 4)
                  AS avg_logprob
         FROM bi b
         JOIN bic USING (bg)
         JOIN ctx ON ctx.w1 = split_part(bg, ' ', 1)
         CROSS JOIN vv
         GROUP BY b.doc_id ORDER BY doc_id""",

    // log ratio as (c_sw/c_w)·(n/n_s), same fixed double-op order as
    // the Spark side — no integer products, overflow-free
    "q_source_kl" ->
      """WITH toks AS (
           SELECT source,
                  unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                     x -> len(x) > 0)) AS w
           FROM documents),
         sw AS (SELECT source, w, count(*) AS c_sw
                FROM toks GROUP BY source, w),
         ns AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s
                FROM sw GROUP BY source),
         cw AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w
                FROM sw GROUP BY w),
         tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n FROM cw)
         SELECT sw.source, MAX(ns.n_s) AS n_tokens,
                ROUND(SUM((CAST(c_sw AS DOUBLE) / n_s) *
                          ln((CAST(c_sw AS DOUBLE) / c_w) *
                             (CAST(n AS DOUBLE) / n_s))), 4) AS kl
         FROM sw
         JOIN cw USING (w)
         JOIN ns ON ns.source = sw.source
         CROSS JOIN tot
         GROUP BY sw.source ORDER BY sw.source""",

    // same tokenization replay as q_unigram_lm; ranking replays the
    // rounded-score + term tiebreak exactly
    "q_tfidf" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                     x -> len(x) > 0)) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         sc AS (
           SELECT doc_id, term, tf, df,
                  ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score
           FROM tf JOIN dfq USING (term) CROSS JOIN nd),
         rk AS (
           SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, term ASC) AS rn
           FROM sc)
         SELECT doc_id, term, tf, df, score FROM rk WHERE rn <= 3
         ORDER BY doc_id, term""",

    "q_schema_evolution" ->
      """WITH target AS (
           SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0),
         source AS (
           SELECT o_orderkey, o_totalprice,
                  CASE WHEN o_orderkey % 4 = 0 THEN 'web' ELSE 'store' END AS o_channel
           FROM orders WHERE o_orderkey % 2 = 0)
         SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_channel
         FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)
         UNION ALL
         SELECT o_orderkey, o_totalprice, o_channel FROM source
         ORDER BY o_orderkey""",

    "q_cdc_delete" ->
      """SELECT o_orderkey, 'delete' AS _change_type FROM orders
         WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 = 0
         ORDER BY o_orderkey""",

    // stages replayed from the q_quality_model / q_dedup_exact /
    // q_dedup_families / q_split_leakage oracle fragments
    "q_curate" ->
      """WITH RECURSIVE base AS (
           SELECT doc_id, lang, text,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS toks,
                  length(text) AS n_char
           FROM documents WHERE lang = 'en'),
         m AS (
           SELECT doc_id, lang, text, toks, len(toks) AS n_tok,
                  len(list_filter(toks, t -> list_contains(
                      ['the','a','an','and','or','of','to','in','is','it',
                       'that','for','on','with','as','this','by'], t)))
                    AS sw_hits,
                  n_char - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
                    AS n_punct,
                  n_char - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                    AS n_alpha,
                  n_char - length(regexp_replace(text, '[0-9]', '', 'g'))
                    AS n_digit,
                  greatest(n_char, 1) AS len1
           FROM base),
         q AS (
           SELECT doc_id, lang, text, toks,
                  ROUND(1.0 / (1.0 + exp(-(
                    -1.0
                    + 1.2 * (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0
                                  WHEN n_tok BETWEEN 3 AND 9 THEN 0.5
                                  ELSE 0.0 END)
                    - 2.0 * (n_punct * 1.0 / len1)
                    + 1.5 * (n_alpha * 1.0 / len1)
                    + 2.0 * (sw_hits * 1.0 / greatest(n_tok, 1))
                    - 1.0 * (n_digit * 1.0 / len1)))), 6) AS quality
           FROM m),
         kept AS (
           SELECT * FROM q
           WHERE quality >= 0.6
             AND NOT (contains(text, 'merge batch')
                   OR contains(text, 'fast table')
                   OR contains(text, 'hash value')
                   OR contains(text, 'row fast'))),
         exact AS (
           SELECT * FROM kept k
           WHERE doc_id = (SELECT min(doc_id) FROM kept k2
                           WHERE md5(array_to_string(k2.toks, ' ')) =
                                 md5(array_to_string(k.toks, ' ')))),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(toks) >= 3 THEN list_distinct(
                         [array_to_string(toks[i:i+2], ' ')
                          for i in range(1, len(toks) - 1)])
                       ELSE [array_to_string(toks, ' ')] END AS s
           FROM exact),
         pairs AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7),
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         fam AS (
           SELECT e.doc_id, e.lang, e.quality,
                  least(e.doc_id, coalesce(min(r.dst), e.doc_id)) AS family
           FROM exact e LEFT JOIN reach r ON r.src = e.doc_id
           GROUP BY e.doc_id, e.lang, e.quality),
         best AS (
           SELECT * FROM fam f
           WHERE doc_id = (SELECT f2.doc_id FROM fam f2
                           WHERE f2.family = f.family
                           ORDER BY f2.quality DESC, f2.doc_id ASC LIMIT 1))
         SELECT doc_id, lang, quality, family,
                CASE WHEN substr(md5(CAST(family AS VARCHAR)), 1, 2) < '33'
                     THEN 'test' ELSE 'train' END AS split
         FROM best ORDER BY doc_id""",

    "q_curate_increment" ->
      """WITH prep AS (
           SELECT doc_id, lang, text,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS toks,
                  length(text) AS n_char
           FROM documents),
         corpus AS (SELECT * FROM prep WHERE doc_id < 250),
         nm AS (
           SELECT doc_id, lang, text, toks, len(toks) AS n_tok,
                  len(list_filter(toks, t -> list_contains(
                      ['the','a','an','and','or','of','to','in','is','it',
                       'that','for','on','with','as','this','by'], t))) AS sw_hits,
                  n_char - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
                  n_char - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
                  n_char - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
                  greatest(n_char, 1) AS len1
           FROM prep WHERE doc_id >= 250 AND lang = 'en'),
         q AS (
           SELECT doc_id, lang, text, toks,
                  ROUND(1.0 / (1.0 + exp(-(
                    -1.0
                    + 1.2 * (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0
                                  WHEN n_tok BETWEEN 3 AND 9 THEN 0.5 ELSE 0.0 END)
                    - 2.0 * (n_punct * 1.0 / len1)
                    + 1.5 * (n_alpha * 1.0 / len1)
                    + 2.0 * (sw_hits * 1.0 / greatest(n_tok, 1))
                    - 1.0 * (n_digit * 1.0 / len1)))), 6) AS quality
           FROM nm),
         kept AS (
           SELECT * FROM q WHERE quality >= 0.6
             AND NOT (contains(text, 'merge batch') OR contains(text, 'fast table'))),
         exact_new AS (
           SELECT * FROM kept k
           WHERE doc_id = (SELECT min(doc_id) FROM kept k2
                           WHERE md5(array_to_string(k2.toks, ' ')) =
                                 md5(array_to_string(k.toks, ' ')))),
         fresh AS (
           SELECT * FROM exact_new e
           WHERE NOT EXISTS (SELECT 1 FROM corpus c
                             WHERE md5(array_to_string(c.toks, ' ')) =
                                   md5(array_to_string(e.toks, ' ')))),
         
         shf AS (
           SELECT doc_id, CASE WHEN len(toks) >= 3 THEN list_distinct(
                    [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])
                  ELSE [array_to_string(toks, ' ')] END AS s
           FROM fresh),
         shc AS (
           SELECT doc_id, CASE WHEN len(toks) >= 3 THEN list_distinct(
                    [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])
                  ELSE [array_to_string(toks, ' ')] END AS s
           FROM corpus),
         corp_dups AS (
           SELECT DISTINCT f.doc_id FROM shf f JOIN shc c
           ON len(list_intersect(c.s, f.s)) * 1.0 /
              (len(c.s) + len(f.s) - len(list_intersect(c.s, f.s))) >= 0.7),
         new_dups AS (
           SELECT DISTINCT b.doc_id FROM shf a JOIN shf b
           ON a.doc_id < b.doc_id AND
              len(list_intersect(a.s, b.s)) * 1.0 /
              (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7)
         SELECT doc_id, lang, quality,
                CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '33'
                     THEN 'test' ELSE 'train' END AS split
         FROM fresh
         WHERE doc_id NOT IN (SELECT doc_id FROM corp_dups)
           AND doc_id NOT IN (SELECT doc_id FROM new_dups)
         ORDER BY doc_id""",

    "q_epoch_shuffle" ->
      """SELECT doc_id,
                CAST(row_number() OVER (ORDER BY
                  md5('1' || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS INT)
                  AS pos_e1,
                CAST(row_number() OVER (ORDER BY
                  md5('2' || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS INT)
                  AS pos_e2
         FROM documents WHERE doc_id IS NOT NULL ORDER BY doc_id""",

    // the two-phase ranking must equal the plain global row_number
    "q_epoch_positions" ->
      """SELECT doc_id,
                CAST(row_number() OVER (ORDER BY
                  md5('1' || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS INT)
                  AS pos
         FROM documents WHERE doc_id IS NOT NULL ORDER BY doc_id""",

    "q_media_decode" ->
      """SELECT o_orderkey, true AS decoded,
                ROUND(0.299 * (o_orderkey % 256) +
                      0.587 * ((o_orderkey // 3) % 256) +
                      0.114 * ((o_orderkey // 7) % 256), 4) AS luma
         FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""",

    // nearest-neighbor 2x2 -> 1x1 must keep exactly the top-left pixel,
    // whose channels replay as pure arithmetic on the order key
    "q_media_resize" ->
      """SELECT o_orderkey, CAST(1 AS INT) AS width, CAST(1 AS INT) AS height,
                ROUND(0.299 * (o_orderkey % 256) +
                      0.587 * ((o_orderkey // 3) % 256) +
                      0.114 * ((o_orderkey // 7) % 256), 4) AS luma
         FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""",

    // PNG (lossless): the 2x2 raster's mean luma replays pixel-by-pixel
    // in the same left-to-right accumulation order the decoder uses;
    // JPEG (lossy): format/dims/channels are pinned, luma is NULL
    "q_image_decode" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderkey % 2 = 0 THEN 'png' ELSE 'jpeg' END
                  AS format,
                CAST(2 AS INT) AS width, CAST(2 AS INT) AS height,
                CAST(3 AS INT) AS channels,
                CASE WHEN o_orderkey % 2 = 0 THEN ROUND((
                   (0.299 * ((o_orderkey + 0) % 256) +
                    0.587 * ((o_orderkey // 3 + 0) % 256) +
                    0.114 * ((o_orderkey // 7 + 0) % 256)) +
                   (0.299 * ((o_orderkey + 1) % 256) +
                    0.587 * ((o_orderkey // 3 + 1) % 256) +
                    0.114 * ((o_orderkey // 7 + 1) % 256)) +
                   (0.299 * ((o_orderkey + 2) % 256) +
                    0.587 * ((o_orderkey // 3 + 2) % 256) +
                    0.114 * ((o_orderkey // 7 + 2) % 256)) +
                   (0.299 * ((o_orderkey + 3) % 256) +
                    0.587 * ((o_orderkey // 3 + 3) % 256) +
                    0.114 * ((o_orderkey // 7 + 3) % 256))) / 4, 4)
                END AS luma
         FROM orders WHERE o_orderkey < 600 ORDER BY o_orderkey""",

    // gray palette (r=g=b=v) and a lossless GIF roundtrip make each
    // sampled frame's luma pure key arithmetic: per pixel the same
    // three-term 601 form the decoder accumulates, row-major order
    "q_gif_frames" ->
      """WITH k AS (SELECT o_orderkey AS k FROM orders
                    WHERE o_orderkey < 300),
         fr AS (SELECT unnest([0, 2, 4]) AS f)
         SELECT k.k AS o_orderkey, CAST(fr.f AS BIGINT) AS frame_idx,
                CAST(6 AS BIGINT) AS n_frames,
                ROUND((
                  (0.299 * ((k.k * 13 + fr.f * 97) % 256) +
                   0.587 * ((k.k * 13 + fr.f * 97) % 256) +
                   0.114 * ((k.k * 13 + fr.f * 97) % 256)) +
                  (0.299 * ((k.k * 13 + fr.f * 97 + 53) % 256) +
                   0.587 * ((k.k * 13 + fr.f * 97 + 53) % 256) +
                   0.114 * ((k.k * 13 + fr.f * 97 + 53) % 256)) +
                  (0.299 * ((k.k * 13 + fr.f * 97 + 31) % 256) +
                   0.587 * ((k.k * 13 + fr.f * 97 + 31) % 256) +
                   0.114 * ((k.k * 13 + fr.f * 97 + 31) % 256)) +
                  (0.299 * ((k.k * 13 + fr.f * 97 + 84) % 256) +
                   0.587 * ((k.k * 13 + fr.f * 97 + 84) % 256) +
                   0.114 * ((k.k * 13 + fr.f * 97 + 84) % 256))
                ) / 4, 4) AS luma
         FROM k CROSS JOIN fr
         ORDER BY o_orderkey, frame_idx""",

    // NN 2x2 -> 1x1 through PNG re-encode keeps exactly the top-left
    // pixel (i=0), whose channels replay as pure arithmetic on the key
    "q_image_resize" ->
      """SELECT o_orderkey, 'png' AS format,
                CAST(1 AS INT) AS width, CAST(1 AS INT) AS height,
                ROUND(0.299 * (o_orderkey % 256) +
                      0.587 * ((o_orderkey // 3) % 256) +
                      0.114 * ((o_orderkey // 7) % 256), 4) AS luma
         FROM orders WHERE o_orderkey < 600 ORDER BY o_orderkey""",

    // time-domain audio features replayed over the unnested synthetic
    // samples: /32768 and the squared terms are power-of-two scalings of
    // integers (exactly representable doubles), so SUM order can't skew
    // the RMS; ZCR is a lag-window sign-flip count; all integer-exact
    "q_audio_features" ->
      """WITH s AS (
           SELECT o_orderkey AS k, i,
                  ((o_orderkey * 31 + i * 997) % 65536) - 32768 AS raw
           FROM orders CROSS JOIN (SELECT unnest(range(8)) AS i)
           WHERE o_orderkey < 600),
         f AS (SELECT k, i, raw,
                 CASE WHEN lag(raw) OVER (PARTITION BY k ORDER BY i)
                        IS NULL THEN 0
                      WHEN (raw >= 0) <>
                        (lag(raw) OVER (PARTITION BY k ORDER BY i) >= 0)
                        THEN 1 ELSE 0 END AS flip
               FROM s)
         SELECT k AS o_orderkey, CAST(8 AS BIGINT) AS n_samples,
                ROUND(SQRT(SUM((raw / 32768.0) * (raw / 32768.0)) / 8), 6)
                  AS rms,
                ROUND(MAX(ABS(raw)) / 32768.0, 6) AS peak,
                CAST(SUM(flip) AS BIGINT) AS zero_crossings
         FROM f GROUP BY k ORDER BY o_orderkey""",

    // per-channel means of the 2x2 raster: integer channel sums then one
    // exact /4, same accumulation both engines
    "q_image_channels" ->
      """SELECT o_orderkey,
                ROUND(((o_orderkey + 0) % 256 + (o_orderkey + 1) % 256 +
                       (o_orderkey + 2) % 256 + (o_orderkey + 3) % 256)
                      / 4.0, 4) AS r_mean,
                ROUND(((o_orderkey // 3 + 0) % 256 + (o_orderkey // 3 + 1) % 256 +
                       (o_orderkey // 3 + 2) % 256 + (o_orderkey // 3 + 3) % 256)
                      / 4.0, 4) AS g_mean,
                ROUND(((o_orderkey // 7 + 0) % 256 + (o_orderkey // 7 + 1) % 256 +
                       (o_orderkey // 7 + 2) % 256 + (o_orderkey // 7 + 3) % 256)
                      / 4.0, 4) AS b_mean
         FROM orders WHERE o_orderkey < 600 ORDER BY o_orderkey""",

    "q_scd2" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
                       WHERE o_orderkey < 500)
         SELECT o_orderkey, o_totalprice,
                TIMESTAMP '2024-01-01 00:00:00' AS __valid_from,
                CASE WHEN o_orderkey % 3 = 0
                     THEN TIMESTAMP '2024-02-01 00:00:00' END AS __valid_to,
                o_orderkey % 3 <> 0 AS __is_current
         FROM base
         UNION ALL
         SELECT o_orderkey, o_totalprice * 2,
                TIMESTAMP '2024-02-01 00:00:00', NULL, true
         FROM base WHERE o_orderkey % 3 = 0
         ORDER BY o_orderkey, __valid_from""",

    "q_scd2_lookup" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders
                       WHERE o_orderkey < 500),
            facts AS (SELECT o_orderkey, unnest([
                        TIMESTAMP '2024-01-15 00:00:00',
                        TIMESTAMP '2024-03-15 00:00:00']) AS fact_ts
                      FROM base)
         SELECT f.o_orderkey, f.fact_ts,
                CASE WHEN b.o_orderkey % 3 = 0
                      AND f.fact_ts >= TIMESTAMP '2024-02-01 00:00:00'
                     THEN b.o_totalprice * 2 ELSE b.o_totalprice END
                  AS effective_price
         FROM facts f JOIN base b USING (o_orderkey)
         ORDER BY o_orderkey, fact_ts""",

    "q_map_ops" ->
      """WITH g AS (SELECT o_custkey, o_orderstatus, count(*) AS n
                    FROM orders GROUP BY 1, 2)
         SELECT o_custkey,
                CAST(count(*) AS INT) AS n_statuses,
                CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN n END), 0)
                     AS BIGINT) AS n_open,
                string_agg(o_orderstatus, ',' ORDER BY o_orderstatus)
                  AS statuses
         FROM g GROUP BY o_custkey ORDER BY o_custkey""",

    "q_xlsx_pipeline" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'even' ELSE 'odd' END
                  AS sheet_name,
                count(*) AS n_rows,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_price
         FROM orders WHERE o_orderkey < 200
         GROUP BY 1 ORDER BY sheet_name""",

    "q_fuzzy_match" ->
      """WITH clean AS (SELECT DISTINCT p_name FROM part),
            dirty AS (SELECT DISTINCT replace(p_name, 'e', '3') AS dirty_name
                      FROM clean)
         SELECT d.dirty_name, c.p_name AS clean_name,
                CAST(levenshtein(d.dirty_name, c.p_name) AS INT) AS dist
         FROM dirty d JOIN clean c
           ON levenshtein(d.dirty_name, c.p_name) <= 2
         ORDER BY dirty_name, clean_name""",

    // q_dedup_families' closure + the md5-threshold split rule
    "q_split_leakage" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) >= 3 THEN list_distinct(
                         [array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)])
                       ELSE [array_to_string(t, ' ')] END AS s
           FROM toks),
         pairs AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE len(list_intersect(a.s, b.s)) * 1.0 /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7),
         edges AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         fam AS (
           SELECT d.doc_id,
                  least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS family
           FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
           GROUP BY d.doc_id)
         SELECT doc_id, family,
                CASE WHEN substr(md5(CAST(family AS VARCHAR)), 1, 2) < '33'
                     THEN 'test' ELSE 'train' END AS split
         FROM fam ORDER BY doc_id""",

    // Replays the learned-BPE ENCODE from the merge-table sidecar the
    // query dumps (the path names the driver's verify SF — sf0.01):
    // per distinct word, a recursive CTE applies greedy rank-ordered
    // merges exactly like Bpe.encodeWord (strictly-lowest rank, first
    // position, one merge per step), then per-doc subword counts
    // re-aggregate per source. The merge table itself is pure driver
    // Scala pinned by BpeSpec; given it, the counts are exact.
    "q_bpe_tokens" ->
      """WITH RECURSIVE
         mraw AS (SELECT * FROM read_parquet(
           '/tmp/graft_oracle_sidecar/bpe_merges_all/*.parquet')),
         dc AS MATERIALIZED (SELECT count(*) AS n,
                 sum(length(text)) AS chars FROM documents),
         msel AS MATERIALIZED (SELECT DISTINCT rank, l, r FROM mraw, dc
                 WHERE corpus_docs = dc.n AND corpus_chars = dc.chars),
         mn AS MATERIALIZED (SELECT count(*) AS k,
                 count(DISTINCT rank) AS dr FROM msel),
         chk AS MATERIALIZED (SELECT CASE WHEN mn.k = 0
                 THEN error('no bpe sidecar for this corpus: the content-addressed merge-table dir has no entry whose corpus fingerprint matches the documents under verify - run q_bpe_tokens at this sf first')
                 WHEN mn.k <> mn.dr
                 THEN error('ambiguous bpe sidecar: more than one stored merge table matches this corpus fingerprint (duplicate ranks after the fingerprint cut) - two regenerated corpora collided on (doc count, char sum); clear /tmp/graft_oracle_sidecar/bpe_merges_all and re-run q_bpe_tokens')
                 ELSE 1 END AS ok FROM mn),
         m AS (SELECT list(struct_pack(a := l, b := r) ORDER BY rank) AS ms
               FROM msel),
         toks AS (
           SELECT doc_id, source,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         w0 AS (SELECT DISTINCT unnest(t) AS word FROM toks),
         enc AS (
           SELECT word, [word[i] for i in range(1, len(word)+1)] AS syms
           FROM w0
           UNION ALL
           SELECT word,
                  list_concat(list_concat(syms[1:bp-1],
                                          [syms[bp] || syms[bp+1]]),
                              syms[bp+2:])
           FROM (
             SELECT word, syms, list_min(prs) AS mn,
                    list_position(prs, list_min(prs)) AS bp
             FROM (
               SELECT e.word, e.syms,
                      [coalesce(nullif(list_position(ms,
                         struct_pack(a := e.syms[i], b := e.syms[i+1])), 0),
                         2147483647)
                       for i in range(1, len(e.syms))] AS prs
               FROM enc e, m
               WHERE len(e.syms) >= 2)
           ) WHERE mn < 2147483647),
         fin AS (
           SELECT e.word, len(e.syms) AS n_tok
           FROM enc e, m
           WHERE len(e.syms) < 2 OR
                 list_min([coalesce(nullif(list_position(ms,
                    struct_pack(a := e.syms[i], b := e.syms[i+1])), 0),
                    2147483647)
                    for i in range(1, len(e.syms))]) = 2147483647),
         doc_words AS (SELECT doc_id, source, unnest(t) AS word FROM toks),
         per_doc AS (SELECT doc_id, sum(f.n_tok) AS n_sub
                     FROM doc_words dw JOIN fin f USING (word)
                     GROUP BY doc_id)
         SELECT t.source, count(*)::BIGINT AS n_docs,
                CAST(sum(coalesce(p.n_sub, 0)) AS BIGINT) AS n_subwords
         FROM toks t LEFT JOIN per_doc p USING (doc_id) CROSS JOIN chk
         WHERE chk.ok = 1
         GROUP BY t.source ORDER BY t.source""",

    // ============== round 8: monitoring / quantization / CEP =============

    // identical integer frame sums + one shared IEEE formula
    // (var = sumsq/n − mean²); stats NULL until the frame is full,
    // anomaly compares the ROUNDED z on both engines
    "q_rolling_zscore" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT event_type, day, n,
                  count(*) OVER fr AS cnt_w,
                  SUM(n) OVER fr AS sum_w,
                  SUM(n * n) OVER fr AS sumsq_w
           FROM daily
           WINDOW fr AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         z AS (
           SELECT event_type, day, n, cnt_w,
                  CAST(sum_w AS DOUBLE) / 7.0 AS mean_r,
                  CAST(sumsq_w AS DOUBLE) / 7.0
                    - (CAST(sum_w AS DOUBLE) / 7.0) * (CAST(sum_w AS DOUBLE) / 7.0)
                    AS var_r
           FROM w),
         s AS (
           SELECT event_type, day, n,
                  CASE WHEN cnt_w = 7 THEN ROUND(mean_r, 4) END AS mean_w,
                  CASE WHEN cnt_w = 7 AND var_r > 0
                       THEN ROUND((CAST(n AS DOUBLE) - mean_r) / sqrt(var_r), 4)
                  END AS z,
                  cnt_w
           FROM z)
         SELECT event_type, day, n, mean_w, z,
                CASE WHEN cnt_w = 7 THEN COALESCE(abs(z) >= 2.0, FALSE)
                END AS is_anomaly
         FROM s ORDER BY event_type, day""",

    // ntile over the identical fully-tiebroken order — the SQL-standard
    // ceil(n/k)-first-buckets split is common to both engines
    "q_equidepth_hist" ->
      """WITH v AS (SELECT o_orderpriority,
                           CAST(o_totalprice AS DOUBLE) AS p, o_orderkey
                    FROM orders WHERE o_totalprice IS NOT NULL)
         SELECT o_orderpriority, bucket, count(*) AS n,
                ROUND(MIN(p), 4) AS bucket_min,
                ROUND(MAX(p), 4) AS bucket_max
         FROM (SELECT o_orderpriority, p,
                      ntile(10) OVER (PARTITION BY o_orderpriority
                                      ORDER BY p, o_orderkey) AS bucket
               FROM v)
         GROUP BY o_orderpriority, bucket
         ORDER BY o_orderpriority, bucket""",

    // replay of the exact quantization arithmetic: scale = max |x|,
    // q = floor(x·127/scale + 0.5) clamped (the engine-neutral rounding
    // form), reconstruction error in the same sequential double chain
    "q_int8_quant" ->
      """WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) AS scale
               FROM d),
         c AS (SELECT vec_id, v, scale,
                      list_transform(v, x -> CASE WHEN scale = 0 THEN 0
                        ELSE CAST(greatest(-127, least(127,
                               floor(x * 127.0 / scale + 0.5))) AS INT)
                        END) AS qc
               FROM q)
         SELECT vec_id, ROUND(scale, 6) AS scale,
                CAST(list_sum(list_transform(qc,
                       x -> abs(CAST(x AS BIGINT)))) AS BIGINT) AS code_l1,
                ROUND(list_sum(list_transform(range(len(v)), i ->
                        (v[i + 1] - qc[i + 1] * scale / 127.0) *
                        (v[i + 1] - qc[i + 1] * scale / 127.0)))
                      / len(v), 10) AS mse
         FROM c ORDER BY vec_id""",

    // integer dot products of fixed-scale int8 codes — exact arithmetic
    // end to end (|q·c| ≤ 64·127² ≪ 2^53), ties broken on neighbor id
    "q_int8_ann" ->
      """WITH nv AS (
           SELECT vec_id,
                  list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                          y -> y * y)))) AS v
           FROM embeddings),
         c AS (SELECT vec_id,
                      list_transform(v, x -> CAST(greatest(-127, least(127,
                        floor(x * 127.0 + 0.5))) AS DOUBLE)) AS q
               FROM nv),
         scored AS (
           SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
                  CAST(list_dot_product(qq.q, cc.q) AS BIGINT) AS dot_q
           FROM c qq JOIN c cc
             ON qq.vec_id < 16 AND qq.vec_id <> cc.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, dot_q,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY dot_q DESC, neighbor_id) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id, dot_q FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank""",

    // 3 unrolled peel rounds over the same support-≥2 co-purchase edge
    // set (VARCHAR part keys match the sorted-string pair generation)
    "q_kcore" ->
      """WITH li AS (SELECT DISTINCT l_orderkey,
                            CAST(l_partkey AS VARCHAR) AS p
                     FROM lineitem),
         e0 AS (SELECT a.p AS lo, b.p AS hi
                FROM li a JOIN li b
                  ON a.l_orderkey = b.l_orderkey AND a.p < b.p
                GROUP BY a.p, b.p HAVING count(*) >= 2),
         d1 AS (SELECT n, count(*) AS deg FROM (
                  SELECT lo AS n FROM e0 UNION ALL SELECT hi FROM e0)
                GROUP BY n),
         k1 AS (SELECT n FROM d1 WHERE deg >= 2),
         e1 AS (SELECT lo, hi FROM e0
                WHERE lo IN (SELECT n FROM k1) AND hi IN (SELECT n FROM k1)),
         d2 AS (SELECT n, count(*) AS deg FROM (
                  SELECT lo AS n FROM e1 UNION ALL SELECT hi FROM e1)
                GROUP BY n),
         k2 AS (SELECT n FROM d2 WHERE deg >= 2),
         e2 AS (SELECT lo, hi FROM e1
                WHERE lo IN (SELECT n FROM k2) AND hi IN (SELECT n FROM k2)),
         d3 AS (SELECT n, count(*) AS deg FROM (
                  SELECT lo AS n FROM e2 UNION ALL SELECT hi FROM e2)
                GROUP BY n),
         k3 AS (SELECT n FROM d3 WHERE deg >= 2),
         e3 AS (SELECT lo, hi FROM e2
                WHERE lo IN (SELECT n FROM k3) AND hi IN (SELECT n FROM k3))
         SELECT vertex, count(*) AS degree FROM (
           SELECT lo AS vertex FROM e3 UNION ALL SELECT hi AS vertex FROM e3)
         GROUP BY vertex ORDER BY vertex""",

    // every purchase the final watermark passed (strictly, at the
    // watermark's millisecond granularity — the date_trunc mirror of the
    // operator's ms-domain boundary) joined to its 4 h view window;
    // inner join = matched-only, interval arithmetic in microseconds
    "q_stream_pattern" ->
      """WITH g AS (SELECT max(ts) AS mx FROM events),
         p AS (SELECT user_id, event_id, ts FROM events, g
               WHERE event_type = 'purchase'
                 AND date_trunc('milliseconds', ts)
                     < date_trunc('milliseconds', mx)),
         v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
         SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
                count(*) AS n_trigger, max(v.ts) AS last_trigger_ts
         FROM p JOIN v ON p.user_id = v.user_id
              AND v.ts < p.ts AND v.ts >= p.ts - INTERVAL '4 hours'
         GROUP BY p.user_id, p.event_id, p.ts
         ORDER BY p.user_id, p.ts, p.event_id""",

    // same md5→60-bit→mod-128 bucketing, same add-one smoothing, the
    // single float op (ln) rounded to 6 dp before the EXACT decimal sum
    "q_dsir_weights" ->
      """WITH toks AS (
           SELECT doc_id, (lang = 'en') AS is_tgt,
                  unnest(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> len(x) > 0)) AS tok
           FROM documents),
         b AS (
           SELECT doc_id, is_tgt,
                  ('0x' || substr(md5(tok), 1, 15))::BIGINT % 128 AS bucket
           FROM toks),
         stats AS (
           SELECT bucket, count(*) AS n_raw,
                  count(*) FILTER (WHERE is_tgt) AS n_tgt
           FROM b GROUP BY bucket),
         tot AS (SELECT SUM(n_raw) AS t_raw, SUM(n_tgt) AS t_tgt FROM stats),
         lr AS (
           SELECT bucket,
                  CAST(ROUND(ln(
                    ((n_tgt + 1.0) / (t_tgt + 128.0)) /
                    ((n_raw + 1.0) / (t_raw + 128.0))), 6)
                    AS DECIMAL(16,6)) AS lr
           FROM stats, tot)
         SELECT doc_id, count(*) AS n_tok, CAST(SUM(lr) AS DOUBLE) AS weight
         FROM b JOIN lr USING (bucket)
         GROUP BY doc_id ORDER BY doc_id""",

    // stats-pruned scan ≡ full-table filter (pruning is a physical
    // optimization; the oracle checks it cannot change the answer)
    "q_skipping_scan" ->
      """SELECT o_orderpriority, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_price
         FROM orders
         WHERE o_totalprice >= 50000.0 AND o_totalprice <= 100000.0
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // footer-only count must equal the real count of the written slice
    "q_fast_count" ->
      """SELECT count(*) AS n_rows FROM orders WHERE o_orderkey % 3 <> 0""",

    // two chained BM25 replays: pass-1 top-5 feedback docs, expansion =
    // top-5 (count desc, term asc) length-≥4 non-query terms at weight
    // 0.5, pass-2 weighted rescore — all ranking on rounded scores
    "q_prf_expand" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         base AS (SELECT doc_id, len(t) AS dl FROM toks),
         stats AS (SELECT count(*) AS n_docs, AVG(dl) AS avgdl FROM base),
         tf1 AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM toks) u
           WHERE term IN ('spark', 'hash', 'window')
           GROUP BY doc_id, term),
         df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY term),
         pass1 AS (
           SELECT tf1.doc_id AS doc_id,
                  ROUND(SUM(ln(1.0 + (s.n_docs - df1.df + 0.5) / (df1.df + 0.5))
                        * tf1.tf
                        / (tf1.tf + 1.2 * ((1.0 - 0.75)
                            + 0.75 * b.dl / s.avgdl))), 4) AS score
           FROM tf1 JOIN df1 USING (term)
                JOIN base b ON tf1.doc_id = b.doc_id
                CROSS JOIN stats s
           GROUP BY tf1.doc_id
           ORDER BY score DESC, doc_id LIMIT 5),
         exp AS (
           SELECT term, 0.5 AS w
           FROM (SELECT unnest(t) AS term FROM toks
                 WHERE doc_id IN (SELECT doc_id FROM pass1)) u
           WHERE len(term) >= 4
             AND term NOT IN ('spark', 'hash', 'window')
           GROUP BY term
           ORDER BY count(*) DESC, term LIMIT 5),
         weights AS (
           SELECT unnest(['spark', 'hash', 'window']) AS term, 1.0 AS w
           UNION ALL SELECT term, w FROM exp),
         tf2 AS (
           SELECT doc_id, term, w, count(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM toks) u
                JOIN weights USING (term)
           GROUP BY doc_id, term, w),
         df2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY term)
         SELECT tf2.doc_id AS doc_id,
                ROUND(SUM(tf2.w
                      * ln(1.0 + (s.n_docs - df2.df + 0.5) / (df2.df + 0.5))
                      * tf2.tf
                      / (tf2.tf + 1.2 * ((1.0 - 0.75)
                          + 0.75 * b.dl / s.avgdl))), 4) AS score
         FROM tf2 JOIN df2 USING (term)
              JOIN base b ON tf2.doc_id = b.doc_id
              CROSS JOIN stats s
         GROUP BY tf2.doc_id
         ORDER BY score DESC, doc_id LIMIT 10""",

    // integer daily sums through one shared division chain; ISO weekday
    "q_seasonal_index" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         dw AS (
           SELECT event_type, isodow(day) AS dow,
                  SUM(n) AS s_dow, count(*) AS d_dow
           FROM daily GROUP BY 1, 2),
         tot AS (
           SELECT event_type, SUM(n) AS s_all, count(*) AS d_all
           FROM daily GROUP BY 1)
         SELECT dw.event_type, dw.dow, dw.d_dow AS n_days,
                ROUND(CAST(s_dow AS DOUBLE) / d_dow, 4) AS avg_n,
                ROUND((CAST(s_dow AS DOUBLE) / d_dow) /
                      (CAST(s_all AS DOUBLE) / d_all), 4) AS seasonal_index
         FROM dw JOIN tot USING (event_type)
         ORDER BY event_type, dow""",

    // the Avro writer/reader pair must reproduce the dimension exactly
    "q_avro_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
         FROM nation ORDER BY n_nationkey""",

    // Bloom pruning is physical-only — the lookup answer can't change
    "q_bloom_skip" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
         FROM orders WHERE o_orderkey = 100 ORDER BY o_orderkey""",

    // prefix identity replay: p_t = P_t − t·μ on the exact integer
    // running count; s_t = p_t − min(0, running min p); min/max are
    // order-insensitive so no float accumulation order exists
    "q_cusum" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, SUM(n) AS total, count(*) AS n_days
           FROM daily GROUP BY event_type),
         pre AS (
           SELECT d.event_type, d.day, t.n_days,
                  CAST(t.total AS DOUBLE) / t.n_days AS mu,
                  CAST(SUM(n) OVER w AS DOUBLE)
                    - CAST(count(*) OVER w AS DOUBLE)
                      * (CAST(t.total AS DOUBLE) / t.n_days) AS p
           FROM daily d JOIN tot t USING (event_type)
           WINDOW w AS (PARTITION BY d.event_type ORDER BY day
                        ROWS UNBOUNDED PRECEDING)),
         s AS (
           SELECT event_type, n_days, mu,
                  p - least(CAST(0 AS DOUBLE),
                            min(p) OVER (PARTITION BY event_type ORDER BY day
                                         ROWS UNBOUNDED PRECEDING)) AS sv
           FROM pre)
         SELECT event_type, n_days, ROUND(mu, 4) AS mean_daily,
                ROUND(MAX(sv), 4) AS max_cusum
         FROM s GROUP BY event_type, n_days, mu ORDER BY event_type""",

    // exact small-group counting; the flag is derived, not probabilistic
    "q_k_anonymity" ->
      """SELECT lang, source, count(*) AS n, count(*) < 5 AS violates_k5
         FROM documents GROUP BY lang, source ORDER BY lang, source""",

    // ∃ a-before-b replayed via the same min/max profile reduction
    "q_seq_patterns" ->
      """WITH prof AS (
           SELECT user_id, event_type,
                  min(ts) AS first_ts, max(ts) AS last_ts
           FROM events GROUP BY 1, 2)
         SELECT a.event_type AS a, b.event_type AS b, count(*) AS support
         FROM prof a JOIN prof b
           ON a.user_id = b.user_id AND a.first_ts < b.last_ts
         GROUP BY 1, 2 ORDER BY support DESC, a, b""",

    // identical epoch-microsecond arithmetic; quantile_cont is the same
    // linear interpolation as Spark's percentile
    "q_time_to_convert" ->
      """WITH fv AS (
           SELECT user_id, min(ts) AS fv FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         conv AS (
           SELECT (CAST(epoch_us(min(e.ts)) - epoch_us(fv.fv) AS DOUBLE)
                   / 1000000.0) AS latency_s
           FROM events e JOIN fv USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > fv.fv
           GROUP BY e.user_id, fv.fv)
         SELECT count(*) AS n_converted,
                ROUND(quantile_cont(latency_s, 0.5), 1) AS median_s,
                ROUND(quantile_cont(latency_s, 0.9), 1) AS p90_s
         FROM conv""",

    // zone-map pruning is physical-only; the conjunction's answer is a
    // plain two-predicate filter
    "q_zorder_skip" ->
      """SELECT o_orderpriority, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE)
                  AS sum_price
         FROM orders
         WHERE o_totalprice >= 100000.0 AND o_totalprice <= 200000.0
           AND o_custkey >= 20 AND o_custkey <= 80
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // every view the final watermark decided (strictly past ts + 4 h at
    // ms granularity) with an EMPTY (view, view+4h] purchase window
    "q_stream_abandon" ->
      """WITH g AS (SELECT max(ts) AS mx FROM events),
         v AS (SELECT user_id, event_id, ts FROM events, g
               WHERE event_type = 'view'
                 AND date_trunc('milliseconds', ts + INTERVAL '4 hours')
                     < date_trunc('milliseconds', mx)),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
         SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts
         FROM v
         WHERE NOT EXISTS (
           SELECT 1 FROM p
           WHERE p.user_id = v.user_id
             AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL '4 hours')
         ORDER BY v.user_id, v.ts, v.event_id""",

    // same md5(seed|id)→60-bit→u∈(0,1] chain, key = −ln(u)/w rounded to
    // 6 dp, id tiebreak, k smallest per group
    "q_weighted_sample" ->
      """WITH keyed AS (
           SELECT lang, doc_id, n_chars,
                  ROUND(-ln((('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                             + 1.0) / 1.152921504606846976e18)
                        / CAST(n_chars AS DOUBLE), 6) AS es_key
           FROM documents WHERE n_chars > 0),
         ranked AS (
           SELECT lang, doc_id, n_chars,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY es_key, doc_id) AS sample_rank
           FROM keyed)
         SELECT lang, sample_rank, doc_id, n_chars FROM ranked
         WHERE sample_rank <= 5 ORDER BY lang, sample_rank""",

    // every statistic is integer-count arithmetic + one fixed double
    // formula; the 2×2 determinant replayed in the same a·d − b·c form
    // CMH replay: same user-level conversion aggregate, 2x2 per
    // stratum, per-stratum terms rounded to 10 dp then decimal-summed
    // (order-free) exactly as the engine does
    "q_cmh" ->
      """WITH u AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS cv,
                  user_id % 2 AS arm,
                  (user_id // 2) % 3 AS st
           FROM events GROUP BY user_id),
         tab AS (
           SELECT st,
                  SUM(CASE WHEN arm = 1 AND cv = 1 THEN 1 ELSE 0 END) AS a,
                  SUM(CASE WHEN arm = 1 AND cv = 0 THEN 1 ELSE 0 END) AS b,
                  SUM(CASE WHEN arm = 0 AND cv = 1 THEN 1 ELSE 0 END) AS c,
                  SUM(CASE WHEN arm = 0 AND cv = 0 THEN 1 ELSE 0 END) AS d
           FROM u GROUP BY st),
         terms AS (
           SELECT a, b, c, d,
                  CAST(a + b + c + d AS DOUBLE) AS t
           FROM tab WHERE a + b + c + d > 1),
         r AS (
           SELECT a,
                  CAST(round(CAST((a + b) AS DOUBLE) * CAST((a + c) AS DOUBLE)
                       / t, 10) AS DECIMAL(28,10)) AS e,
                  CAST(round(CAST((a + b) * (c + d) AS DOUBLE)
                       * CAST((a + c) * (b + d) AS DOUBLE)
                       / (t * t * (t - 1)), 10) AS DECIMAL(28,10)) AS v,
                  CAST(round(CAST(a * d AS DOUBLE) / t, 10)
                       AS DECIMAL(28,10)) AS num,
                  CAST(round(CAST(b * c AS DOUBLE) / t, 10)
                       AS DECIMAL(28,10)) AS den
           FROM terms),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_strata,
                  CAST(SUM(a) AS BIGINT) AS sum_a,
                  CAST(SUM(e) AS DOUBLE) AS se,
                  CAST(SUM(v) AS DOUBLE) AS sv,
                  CAST(SUM(num) AS DOUBLE) AS sn,
                  CAST(SUM(den) AS DOUBLE) AS sd
           FROM r)
         SELECT n_strata, sum_a,
                round(se, 6) AS expected_a,
                round(CASE WHEN sv > 0 THEN
                  (CAST(sum_a AS DOUBLE) - se) * (CAST(sum_a AS DOUBLE) - se)
                    / sv END, 6) AS chi2_cmh,
                round(CASE WHEN sd > 0 THEN sn / sd END, 6) AS or_mh
         FROM agg""",

    // trimmed/winsorized replay on the same engine-compatible
    // interpolated percentiles; winsorized values rounded to 4 dp then
    // decimal-summed, matching the engine's order-free discipline
    "q_robust_mean" ->
      """WITH th AS (
           SELECT o_orderpriority,
                  quantile_cont(o_totalprice, 0.1) AS lo,
                  quantile_cont(o_totalprice, 0.9) AS hi
           FROM orders GROUP BY o_orderpriority)
         SELECT o.o_orderpriority,
                CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN o.o_totalprice >= t.lo
                               AND o.o_totalprice <= t.hi
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                round(CAST(SUM(CASE WHEN o.o_totalprice >= t.lo
                                     AND o.o_totalprice <= t.hi
                               THEN CAST(o.o_totalprice AS DECIMAL(20,4))
                               END) AS DOUBLE)
                      / SUM(CASE WHEN o.o_totalprice >= t.lo
                                  AND o.o_totalprice <= t.hi
                                 THEN 1 ELSE 0 END), 6) AS trimmed_mean,
                round(CAST(SUM(CAST(round(least(greatest(o.o_totalprice, t.lo),
                                           t.hi), 4) AS DECIMAL(20,4)))
                           AS DOUBLE) / count(*), 6) AS winsorized_mean
         FROM orders o JOIN th t USING (o_orderpriority)
         GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",

    "q_ab_test" ->
      """WITH u AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS converted
           FROM events GROUP BY user_id),
         arms AS (
           SELECT user_id % 2 AS arm, count(*) AS n,
                  CAST(SUM(converted) AS BIGINT) AS conv
           FROM u GROUP BY 1),
         t AS (
           SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
                  max(CASE WHEN arm = 0 THEN conv END) AS conv_a,
                  max(CASE WHEN arm = 1 THEN n END) AS n_b,
                  max(CASE WHEN arm = 1 THEN conv END) AS conv_b
           FROM arms)
         SELECT n_a, conv_a, n_b, conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           ROUND(CAST(conv_b AS DOUBLE) / n_b
               - CAST(conv_a AS DOUBLE) / n_a, 6) AS lift,
           CASE WHEN (conv_a + conv_b) > 0
                 AND (n_a + n_b) > (conv_a + conv_b) THEN
             ROUND((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
               / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 6)
           END AS z_stat,
           CASE WHEN (conv_a + conv_b) > 0
                 AND (n_a + n_b) > (conv_a + conv_b) THEN
             ROUND(CAST(n_a + n_b AS DOUBLE)
                 * CAST(conv_a * (n_b - conv_b)
                        - (n_a - conv_a) * conv_b AS DOUBLE)
                 * CAST(conv_a * (n_b - conv_b)
                        - (n_a - conv_a) * conv_b AS DOUBLE)
                 / CAST(n_a * n_b * (conv_a + conv_b)
                        * ((n_a - conv_a) + (n_b - conv_b)) AS DOUBLE), 6)
           END AS chi2
         FROM t""",

    // product-limit as exp(Σ round(ln(factor),6)) with an exact DECIMAL
    // sum — the dsirWeights transcendental discipline; factor 0 floored
    // at ln = −20 on both sides
    "q_kaplan_meier" ->
      """WITH pu AS (
           SELECT user_id, CAST(min(ts) AS DATE) AS d0,
                  CAST(min(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS DATE) AS dp,
                  CAST(max(ts) AS DATE) AS dl
           FROM events GROUP BY user_id),
         dur AS (
           SELECT CASE WHEN dp IS NOT NULL THEN datediff('day', d0, dp)
                       ELSE datediff('day', d0, dl) END AS t,
                  CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS observed
           FROM pu),
         byt AS (
           SELECT t, CAST(SUM(observed) AS BIGINT) AS d,
                  CAST(SUM(1 - observed) AS BIGINT) AS c,
                  count(*) AS ended
           FROM dur GROUP BY t),
         tot AS (SELECT CAST(SUM(ended) AS BIGINT) AS n_total FROM byt),
         risk AS (
           SELECT b.t, b.d, b.c,
                  t2.n_total - COALESCE(CAST(SUM(b.ended) OVER (ORDER BY b.t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS n_risk
           FROM byt b CROSS JOIN tot t2),
         lf AS (
           SELECT t, d, c, n_risk,
                  CAST(CASE WHEN d > 0 AND n_risk > d
                       THEN ROUND(ln(CAST(n_risk - d AS DOUBLE) / n_risk), 6)
                       WHEN d > 0 THEN CAST(-20 AS DOUBLE)
                       ELSE CAST(0 AS DOUBLE) END AS DECIMAL(18,6)) AS ln_f
           FROM risk)
         SELECT t AS t_days, n_risk, d AS d_conv, c AS c_censored,
                ROUND(exp(CAST(SUM(ln_f) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE)), 4) AS survival
         FROM lf QUALIFY d > 0 ORDER BY t""",

    // rank-weighted DECIMAL sums stay exact; only the final fixed
    // formula 2Σ(r·x)/(nΣx) − (n+1)/n runs in double
    "q_gini" ->
      """WITH rev AS (
           SELECT o_custkey,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DECIMAL(18,2)) AS x
           FROM orders GROUP BY o_custkey),
         ranked AS (
           SELECT c.c_mktsegment, r.o_custkey, r.x,
                  row_number() OVER (PARTITION BY c.c_mktsegment
                                     ORDER BY r.x ASC, r.o_custkey ASC) AS rk
           FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey)
         SELECT c_mktsegment, count(*) AS n,
                ROUND(CAST(SUM(x) AS DOUBLE), 2) AS total,
                ROUND(2.0 * CAST(SUM(x * rk) AS DOUBLE)
                      / (count(*) * CAST(SUM(x) AS DOUBLE))
                    - CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini
         FROM ranked GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // s_t = 2^(−t)·(B_t + x_1): the only accumulation (B_t) is an exact
    // int128/decimal running sum and every weight a dyadic rational, so
    // the doubles agree bit-for-bit with no rounding rescue
    "q_ewma" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         cut AS (SELECT max(day) - 99 AS min_day FROM daily),
         idx AS (
           SELECT d.event_type, d.day, d.n,
                  row_number() OVER (PARTITION BY d.event_type
                                     ORDER BY d.day) AS t
           FROM daily d CROSS JOIN cut WHERE d.day >= cut.min_day),
         acc AS (
           SELECT event_type, day, n, t,
                  SUM(CAST(power(2.0, t - 1) AS HUGEINT) * n)
                    OVER (PARTITION BY event_type ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS b,
                  first_value(n)
                    OVER (PARTITION BY event_type ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS x1
           FROM idx)
         SELECT event_type, day, n,
                power(2.0, -t) * CAST(b + x1 AS DOUBLE) AS ewma
         FROM acc ORDER BY event_type, day""",

    // Holt recursion replayed step for step in a recursive CTE — the
    // level/trend updates mirror the Spark fold's exact operation order
    "q_holt_forecast" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         d AS (SELECT event_type, day, n,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY day) AS t
               FROM daily),
         rec AS (
           -- b must anchor as DOUBLE: a bare 0.0 is DECIMAL(1,1) in
           -- DuckDB and would quantize the trend every iteration
           SELECT event_type, t, CAST(n AS DOUBLE) AS l,
                  CAST(0.0 AS DOUBLE) AS b
           FROM d WHERE t = 1
           UNION ALL
           SELECT d.event_type, d.t,
                  0.5 * d.n + 0.5 * (rec.l + rec.b),
                  0.5 * ((0.5 * d.n + 0.5 * (rec.l + rec.b)) - rec.l)
                    + 0.5 * rec.b
           FROM rec JOIN d ON d.event_type = rec.event_type
                          AND d.t = rec.t + 1),
         fin AS (
           SELECT r.event_type, r.l, r.b, lst.last_day
           FROM rec r
           JOIN (SELECT event_type, max(t) AS mt, max(day) AS last_day
                 FROM d GROUP BY event_type) lst
             ON r.event_type = lst.event_type AND r.t = lst.mt)
         SELECT f.event_type, f.last_day, hs.h,
                ROUND(f.l + hs.h * f.b, 6) AS forecast
         FROM fin f CROSS JOIN (SELECT unnest(range(1, 8)) AS h) hs
         ORDER BY f.event_type, hs.h""",

    // per-lag Pearson from exact decimal moments over the day-lag join
    "q_acf" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1),
         pairs AS (
           SELECT ls.lag, a.n AS x, b.n AS y
           FROM daily a
           CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) ls
           JOIN daily b ON b.day = a.day - CAST(ls.lag AS INT)),
         m AS (SELECT lag, count(*) AS n_pairs,
                 SUM(CAST(x AS DECIMAL(19,0))) AS sx,
                 SUM(CAST(y AS DECIMAL(19,0))) AS sy,
                 SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
                 SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
                 SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
               FROM pairs GROUP BY lag)
         SELECT lag, n_pairs,
                ROUND(CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                            AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                      THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                  * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                      END, 6) AS acf
         FROM m ORDER BY lag""",

    // Pearson over doubled average ranks (exact integers); same moment
    // formula as q_acf
    // matching replay: identical window mechanics (stratum-partitioned
    // covariate sort, IGNORE NULLS carries, same tie rules)
    "q_nn_match" ->
      """WITH base AS (
           SELECT l_returnflag AS st,
                  l_orderkey * 10 + l_linenumber AS id,
                  CAST(l_extendedprice AS DOUBLE) AS cov,
                  CAST(l_quantity AS DECIMAL(20,4)) AS y,
                  CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END AS side
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
         car AS (
           SELECT st, cov, y, side,
                  last_value(CASE WHEN side = 0 THEN cov END IGNORE NULLS)
                    OVER w1 AS pc,
                  last_value(CASE WHEN side = 0 THEN y END IGNORE NULLS)
                    OVER w1 AS py,
                  first_value(CASE WHEN side = 0 THEN cov END IGNORE NULLS)
                    OVER w2 AS nc,
                  first_value(CASE WHEN side = 0 THEN y END IGNORE NULLS)
                    OVER w2 AS ny
           FROM base
           WINDOW
             w1 AS (PARTITION BY st ORDER BY cov ASC, side ASC, id DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (PARTITION BY st ORDER BY cov ASC, side ASC, id DESC
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         m AS (
           SELECT st, y,
                  CASE WHEN pc IS NOT NULL
                        AND (nc IS NULL OR cov - pc <= nc - cov) THEN py
                       WHEN nc IS NOT NULL THEN ny END AS my
           FROM car WHERE side = 1)
         SELECT st AS l_returnflag,
                CAST(count(*) AS BIGINT) AS n_treated,
                CAST(SUM(CASE WHEN my IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_matched,
                round(CAST(SUM(CASE WHEN my IS NOT NULL THEN y - my END)
                           AS DOUBLE)
                      / SUM(CASE WHEN my IS NOT NULL THEN 1 ELSE 0 END), 6)
                  AS att
         FROM m GROUP BY st ORDER BY st""",

    // tau-b replay: pairwise sign products via a day<day self-join,
    // tie sums per series, same fixed final formula
    "q_kendall_tau" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS x,
                  count(DISTINCT user_id) AS y
           FROM events GROUP BY 1),
         pairs AS (
           SELECT COALESCE(CAST(SUM(CAST(sign(b.x - a.x) AS BIGINT)
                           * CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT), 0) AS s
           FROM daily a JOIN daily b ON a.day < b.day),
         tx AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS tx2
                FROM (SELECT count(*) AS t FROM daily GROUP BY x)),
         ty AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS ty2
                FROM (SELECT count(*) AS t FROM daily GROUP BY y)),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
         SELECT n_days, s,
                round(CASE WHEN (CAST(n_days AS DOUBLE) * (n_days - 1) - tx2) > 0
                            AND (CAST(n_days AS DOUBLE) * (n_days - 1) - ty2) > 0
                      THEN CAST(2 AS DOUBLE) * s
                           / sqrt((CAST(n_days AS DOUBLE) * (n_days - 1) - tx2)
                                  * (CAST(n_days AS DOUBLE) * (n_days - 1) - ty2))
                      END, 6) AS tau_b
         FROM nn CROSS JOIN pairs CROSS JOIN tx CROSS JOIN ty""",

    "q_spearman" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS x,
                  count(DISTINCT user_id) AS y
           FROM events GROUP BY 1),
         rk AS (
           SELECT CAST(2 * rank() OVER (ORDER BY x)
                       + count(*) OVER (PARTITION BY x) - 1
                    AS DECIMAL(19,0)) AS rx,
                  CAST(2 * rank() OVER (ORDER BY y)
                       + count(*) OVER (PARTITION BY y) - 1
                    AS DECIMAL(19,0)) AS ry
           FROM daily),
         m AS (SELECT count(*) AS n_days,
                 SUM(rx) AS sx, SUM(ry) AS sy,
                 SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
                 SUM(rx * ry) AS sxy
               FROM rk)
         SELECT n_days,
                ROUND(CASE WHEN CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                            AND CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                      THEN (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                  * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                      END, 6) AS spearman
         FROM m""",

    // Mann–Whitney replay: pooled doubled average ranks of the 6dp
    // daily means, exact-long doubled U, tie-corrected variance; all
    // double arithmetic in the same operand order as the Spark side
    "q_mann_whitney" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day,
                  CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS grp,
                  ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE)
                        / COUNT(*), 6) AS m
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         rk AS (SELECT grp,
                  2 * rank() OVER (ORDER BY m)
                    + COUNT(*) OVER (PARTITION BY m) - 1 AS r2
                FROM daily),
         tie AS (SELECT COALESCE(SUM(t * t * t - t), 0) AS tie3
                 FROM (SELECT COUNT(*) AS t FROM daily GROUP BY m)),
         agg AS (SELECT SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_a,
                        SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_b,
                        SUM(CASE WHEN grp = 1 THEN r2 ELSE 0 END) AS ra2
                 FROM rk),
         fin AS (SELECT n_a, n_b,
                   CAST(ra2 - n_a * (n_a + 1) AS DOUBLE) AS u2,
                   CAST(n_a AS DOUBLE) AS n1, CAST(n_b AS DOUBLE) AS n2,
                   CAST(n_a + n_b AS DOUBLE) AS n,
                   CAST(tie3 AS DOUBLE) AS t3
                 FROM agg CROSS JOIN tie)
         SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                ROUND(u2 / 2.0, 1) AS u_a,
                ROUND(CASE WHEN n1 * n2 / 12.0 * ((n + 1.0)
                                - t3 / (n * (n - 1.0))) > 0
                      THEN (u2 / 2.0 - n1 * n2 / 2.0)
                           / sqrt(n1 * n2 / 12.0 * ((n + 1.0)
                                  - t3 / (n * (n - 1.0))))
                      END, 6) AS z
         FROM fin""",

    // Mann–Kendall replay: pairwise S over the same rounded daily
    // means, tie-corrected variance, continuity-corrected z, Sen's
    // slope as the exact median of pairwise slopes (the oracle may
    // self-join freely; the engine enumerates the bounded pairs
    // row-locally)
    "q_mann_kendall" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day,
                  ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE)
                        / COUNT(*), 6) AS m
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         idx AS (SELECT m,
                   CAST(datediff('day', (SELECT MIN(day) FROM daily), day)
                        AS DOUBLE) AS t
                 FROM daily),
         pairs AS (SELECT a.m AS ma, b.m AS mb, a.t AS ta, b.t AS tb
                   FROM idx a JOIN idx b ON a.t < b.t),
         sagg AS (SELECT COALESCE(CAST(SUM(CASE WHEN mb > ma THEN 1
                                 WHEN mb < ma THEN -1 ELSE 0 END) AS BIGINT),
                          0) AS s,
                         median((mb - ma) / (tb - ta)) AS sen
                  FROM pairs),
         nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
         tie AS (SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tie3
                 FROM (SELECT COUNT(*) AS t FROM daily GROUP BY m)),
         fin AS (SELECT n_days, s, sen,
                   (CAST(n_days AS DOUBLE) * (n_days - 1) * (2.0 * n_days + 5)
                    - CAST(tie3 AS DOUBLE)) / 18.0 AS vars
                 FROM nn CROSS JOIN sagg CROSS JOIN tie)
         SELECT n_days, s,
                ROUND(CASE WHEN vars > 0 AND s > 0
                             THEN (CAST(s AS DOUBLE) - 1) / sqrt(vars)
                           WHEN vars > 0 AND s < 0
                             THEN (CAST(s AS DOUBLE) + 1) / sqrt(vars)
                           WHEN vars > 0 THEN 0.0 END, 6) AS z,
                ROUND(sen, 6) AS sen_slope
         FROM fin""",

    // same day-lag join + moment kernel as q_acf, between two filtered
    // series over lags -7..7
    "q_ccf" ->
      """WITH a AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS x
           FROM events WHERE event_type = 'signup' GROUP BY 1),
         b AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS y
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         pairs AS (
           SELECT ls.lag, a.x, b.y
           FROM a
           CROSS JOIN (SELECT unnest(range(-7, 8)) AS lag) ls
           JOIN b ON b.day = a.day + CAST(ls.lag AS INT)),
         m AS (SELECT lag, count(*) AS n_pairs,
                 SUM(CAST(x AS DECIMAL(19,0))) AS sx,
                 SUM(CAST(y AS DECIMAL(19,0))) AS sy,
                 SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
                 SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
                 SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
               FROM pairs GROUP BY lag)
         SELECT lag, n_pairs,
                ROUND(CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                            AND CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                      THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                  * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                      END, 6) AS ccf
         FROM m ORDER BY lag""",

    // O/E/V over the risk-set table; per-t terms ROUND(...,10) then
    // decimal-summed exactly as the Spark side pins
    "q_logrank" ->
      """WITH pu AS (
           SELECT user_id, CAST(min(ts) AS DATE) AS d0,
                  CAST(min(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS DATE) AS dp,
                  CAST(max(ts) AS DATE) AS dl,
                  max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS grp
           FROM events GROUP BY user_id),
         dur AS (
           SELECT CASE WHEN dp IS NOT NULL THEN datediff('day', d0, dp)
                       ELSE datediff('day', d0, dl) END AS t,
                  CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS observed,
                  grp
           FROM pu),
         byt AS (
           SELECT t, CAST(SUM(observed) AS BIGINT) AS d,
                  CAST(SUM(observed * grp) AS BIGINT) AS da,
                  count(*) AS ended,
                  CAST(SUM(grp) AS BIGINT) AS endeda
           FROM dur GROUP BY t),
         tot AS (SELECT CAST(SUM(ended) AS BIGINT) AS n_total,
                        CAST(SUM(endeda) AS BIGINT) AS n_total_a
                 FROM byt),
         risk AS (
           SELECT byt.*, tot.n_total, tot.n_total_a,
                  tot.n_total - COALESCE(SUM(ended) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
                  tot.n_total_a - COALESCE(SUM(endeda) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS na
           FROM byt CROSS JOIN tot),
         terms AS (
           SELECT n_total, n_total_a, da,
                  CAST(ROUND(CAST(na AS DOUBLE) * CAST(d AS DOUBLE)
                             / CAST(n AS DOUBLE), 10) AS DECIMAL(28,10)) AS e,
                  CAST(CASE WHEN n > 1 THEN ROUND(
                         CAST(na AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(na AS DOUBLE))
                         * CAST(d AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                            * (CAST(n AS DOUBLE) - 1.0)), 10)
                       ELSE 0.0 END AS DECIMAL(28,10)) AS v
           FROM risk WHERE d > 0),
         agg AS (
           SELECT max(n_total) AS n_users, max(n_total_a) AS n_users_a,
                  CAST(SUM(da) AS BIGINT) AS oa, SUM(e) AS ea, SUM(v) AS v
           FROM terms)
         SELECT n_users, n_users_a, oa,
                ROUND(CAST(ea AS DOUBLE), 6) AS ea,
                ROUND(CAST(v AS DOUBLE), 6) AS v,
                ROUND(CASE WHEN CAST(v AS DOUBLE) > 0
                      THEN (CAST(oa AS DOUBLE) - CAST(ea AS DOUBLE))
                           / sqrt(CAST(v AS DOUBLE)) END, 6) AS z,
                ROUND(CASE WHEN CAST(v AS DOUBLE) > 0
                      THEN ((CAST(oa AS DOUBLE) - CAST(ea AS DOUBLE))
                            / sqrt(CAST(v AS DOUBLE)))
                           * ((CAST(oa AS DOUBLE) - CAST(ea AS DOUBLE))
                              / sqrt(CAST(v AS DOUBLE))) END, 6) AS chi2
         FROM agg""",

    // Monroe et al. log-odds with Dirichlet prior: vocab filtered to
    // global count >= 20 BEFORE totals, alpha=0.5, top-5 per source by
    // rounded z with term tiebreak
    "q_log_odds" ->
      """WITH toks AS (
           SELECT source,
                  unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                     x -> len(x) > 0)) AS term
           FROM documents),
         c AS (SELECT source, term, count(*) AS c_sw
               FROM toks GROUP BY 1, 2),
         g AS (SELECT term, SUM(c_sw) AS c_w FROM c
               GROUP BY term HAVING SUM(c_sw) >= 20),
         kept AS (SELECT c.source, c.term, c.c_sw, g.c_w
                  FROM c JOIN g USING (term)),
         ns AS (SELECT source, SUM(c_sw) AS n_s FROM kept GROUP BY source),
         tot AS (SELECT SUM(c_sw) AS n_tot, count(DISTINCT term) AS v
                 FROM kept),
         sc AS (
           SELECT k.source, k.term, k.c_sw,
                  CAST(k.c_sw AS DOUBLE) + 0.5 AS cs,
                  CAST(k.c_w - k.c_sw AS DOUBLE) + 0.5 AS cr,
                  CAST(ns.n_s AS DOUBLE) AS n_s,
                  CAST(t.n_tot - ns.n_s AS DOUBLE) AS n_r,
                  0.5 * t.v AS a0
           FROM kept k JOIN ns USING (source) CROSS JOIN tot t),
         z AS (
           SELECT source, term, c_sw,
                  ROUND((ln(cs / (n_s + a0 - cs)) - ln(cr / (n_r + a0 - cr)))
                        / sqrt(1.0 / cs + 1.0 / cr), 6) AS z
           FROM sc),
         rk AS (SELECT *, row_number() OVER (PARTITION BY source
                           ORDER BY z DESC, term ASC) AS rn
                FROM z)
         SELECT source, term, c_sw, z FROM rk WHERE rn <= 5
         ORDER BY source, term""",

    // normal equations over one-pass exact decimal moments; doubles
    // enter only in the final fixed formulas (mirrored operand order)
    "q_ols" ->
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
             SUM(CAST(ROUND(CAST(l_quantity AS DOUBLE), 2)
                 AS DECIMAL(18,2))) AS sx,
             SUM(CAST(ROUND(CAST(l_extendedprice AS DOUBLE), 2)
                 AS DECIMAL(18,2))) AS sy,
             SUM(CAST(CAST(ROUND(CAST(l_quantity AS DOUBLE), 2)
                   AS DECIMAL(18,2))
                 * CAST(ROUND(CAST(l_quantity AS DOUBLE), 2)
                   AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxx,
             SUM(CAST(CAST(ROUND(CAST(l_extendedprice AS DOUBLE), 2)
                   AS DECIMAL(18,2))
                 * CAST(ROUND(CAST(l_extendedprice AS DOUBLE), 2)
                   AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS syy,
             SUM(CAST(CAST(ROUND(CAST(l_quantity AS DOUBLE), 2)
                   AS DECIMAL(18,2))
                 * CAST(ROUND(CAST(l_extendedprice AS DOUBLE), 2)
                   AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS slope,
           ROUND((CAST(sy AS DOUBLE)
               - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS r2
         FROM m ORDER BY l_returnflag""",

    // all moments in ONE aggregate CTE; six pair rows replay the same
    // cov/√(varx·vary) formula (sqrt is IEEE-exact on both engines)
    "q_corr_matrix" ->
      """WITH src AS (
           SELECT CAST(ROUND(CAST(l_quantity AS DOUBLE), 2)
                  AS DECIMAL(18,2)) AS a,
                  CAST(ROUND(CAST(l_extendedprice AS DOUBLE), 2)
                  AS DECIMAL(18,2)) AS b,
                  CAST(ROUND(CAST(l_discount AS DOUBLE), 2)
                  AS DECIMAL(18,2)) AS c,
                  CAST(ROUND(CAST(l_tax AS DOUBLE), 2)
                  AS DECIMAL(18,2)) AS d
           FROM lineitem),
         m AS (
           SELECT count(*) AS n,
             SUM(a) AS sa, SUM(b) AS sb, SUM(c) AS sc, SUM(d) AS sd,
             SUM(CAST(a * a AS DECIMAL(38,4))) AS saa,
             SUM(CAST(b * b AS DECIMAL(38,4))) AS sbb,
             SUM(CAST(c * c AS DECIMAL(38,4))) AS scc,
             SUM(CAST(d * d AS DECIMAL(38,4))) AS sdd,
             SUM(CAST(a * b AS DECIMAL(38,4))) AS sab,
             SUM(CAST(a * c AS DECIMAL(38,4))) AS sac,
             SUM(CAST(a * d AS DECIMAL(38,4))) AS sad,
             SUM(CAST(b * c AS DECIMAL(38,4))) AS sbc,
             SUM(CAST(b * d AS DECIMAL(38,4))) AS sbd,
             SUM(CAST(c * d AS DECIMAL(38,4))) AS scd
           FROM src)
         SELECT * FROM (
           SELECT 'l_quantity' AS x_col, 'l_extendedprice' AS y_col, n,
             ROUND((n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
               / sqrt((n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                    * (n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6) AS corr
           FROM m
           UNION ALL
           SELECT 'l_quantity', 'l_discount', n,
             ROUND((n * CAST(sac AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sc AS DOUBLE))
               / sqrt((n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                    * (n * CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))), 6)
           FROM m
           UNION ALL
           SELECT 'l_quantity', 'l_tax', n,
             ROUND((n * CAST(sad AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sd AS DOUBLE))
               / sqrt((n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                    * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6)
           FROM m
           UNION ALL
           SELECT 'l_extendedprice', 'l_discount', n,
             ROUND((n * CAST(sbc AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sc AS DOUBLE))
               / sqrt((n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                    * (n * CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))), 6)
           FROM m
           UNION ALL
           SELECT 'l_extendedprice', 'l_tax', n,
             ROUND((n * CAST(sbd AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sd AS DOUBLE))
               / sqrt((n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                    * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6)
           FROM m
           UNION ALL
           SELECT 'l_discount', 'l_tax', n,
             ROUND((n * CAST(scd AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sd AS DOUBLE))
               / sqrt((n * CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                    * (n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6)
           FROM m)
         ORDER BY x_col, y_col""",

    // digit via exact DECIMAL(18,2) string render (both engines print
    // plain form); the nine Benford masses are fixed 6-dp literals
    "q_benford" ->
      """WITH digits AS (
           SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                         AS VARCHAR), 1, 1) AS digit,
                  count(*) AS n
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM digits),
         e(digit, expected) AS (VALUES
           ('1', CAST(0.30103  AS DOUBLE)), ('2', CAST(0.176091 AS DOUBLE)),
           ('3', CAST(0.124939 AS DOUBLE)), ('4', CAST(0.09691  AS DOUBLE)),
           ('5', CAST(0.079181 AS DOUBLE)), ('6', CAST(0.066947 AS DOUBLE)),
           ('7', CAST(0.057992 AS DOUBLE)), ('8', CAST(0.051153 AS DOUBLE)),
           ('9', CAST(0.045757 AS DOUBLE)))
         SELECT d.digit, d.n,
                ROUND(CAST(d.n AS DOUBLE) / t.n_total, 6) AS freq,
                e.expected,
                ROUND(ROUND(CAST(d.n AS DOUBLE) / t.n_total, 6)
                      - e.expected, 6) AS deviation
         FROM digits d CROSS JOIN tot t JOIN e ON e.digit = d.digit
         ORDER BY d.digit""",

    // Poisson-bootstrap replay: same knuthHash(id*40+rep) uniform (the
    // HUGEINT twin), same integer CDF thresholds, exact decimal sums,
    // double division, order-stat endpoints rms[2]/rms[38]
    "q_bootstrap_ci" ->
      """WITH w AS (
           SELECT e.event_type, CAST(e.value AS DECIMAL(20,4)) AS v, r.rep,
                  (CAST(e.event_id * 40 + r.rep AS HUGEINT) * 2654435761)
                    % 4294967296 AS u
           FROM events e
           CROSS JOIN (SELECT unnest(range(40)) AS rep) r),
         ww AS (SELECT event_type, v, rep,
                  CASE WHEN u < 1580030168 THEN 0
                       WHEN u < 3160060337 THEN 1
                       WHEN u < 3950075421 THEN 2
                       WHEN u < 4213413783 THEN 3
                       WHEN u < 4279248373 THEN 4
                       WHEN u < 4292415291 THEN 5
                       ELSE 6 END AS w
                FROM w),
         rm AS (SELECT event_type, rep,
                  ROUND(CAST(SUM(v * w) AS DOUBLE) / SUM(w), 6) AS rmean
                FROM ww GROUP BY event_type, rep HAVING SUM(w) > 0),
         b AS (SELECT event_type, list_sort(list(rmean)) AS rms
               FROM rm GROUP BY event_type),
         o AS (SELECT event_type, count(*) AS n,
                  ROUND(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE)
                        / count(*), 6) AS observed_mean
               FROM events GROUP BY event_type)
         SELECT o.event_type, o.n, o.observed_mean,
                b.rms[2] AS boot_lo, b.rms[38] AS boot_hi
         FROM o JOIN b USING (event_type)
         ORDER BY o.event_type""",

    // skyline by definition: NOT EXISTS a componentwise-dominating part
    "q_skyline" ->
      """SELECT b.p_partkey, b.p_size,
                ROUND(b.p_retailprice, 2) AS p_retailprice
         FROM part b
         WHERE NOT EXISTS (
           SELECT 1 FROM part a
           WHERE a.p_size <= b.p_size
             AND a.p_retailprice <= b.p_retailprice
             AND (a.p_size < b.p_size OR a.p_retailprice < b.p_retailprice))
         ORDER BY b.p_size, b.p_partkey""",

    // DiD cells from exact decimal sums; cutover = floor-midpoint of
    // epoch-us range (Spark's double-divide-then-truncate equals // here
    // because the operands are positive and < 2^53)
    "q_did" ->
      """WITH x AS (SELECT epoch_us(ts) AS t,
                           CAST(value AS DECIMAL(20,4)) AS v,
                           (user_id % 2 = 0) AS treated
                    FROM events),
         c AS (SELECT (MIN(t) + MAX(t)) // 2 AS cut FROM x),
         m AS (SELECT
            CAST(SUM(CASE WHEN NOT treated AND t <  cut THEN v END) AS DOUBLE)
              / SUM(CASE WHEN NOT treated AND t <  cut THEN 1 END) AS m_c_pre,
            CAST(SUM(CASE WHEN NOT treated AND t >= cut THEN v END) AS DOUBLE)
              / SUM(CASE WHEN NOT treated AND t >= cut THEN 1 END) AS m_c_post,
            CAST(SUM(CASE WHEN treated AND t <  cut THEN v END) AS DOUBLE)
              / SUM(CASE WHEN treated AND t <  cut THEN 1 END) AS m_t_pre,
            CAST(SUM(CASE WHEN treated AND t >= cut THEN v END) AS DOUBLE)
              / SUM(CASE WHEN treated AND t >= cut THEN 1 END) AS m_t_post
           FROM x CROSS JOIN c)
         SELECT ROUND(m_c_pre, 6) AS mean_c_pre,
                ROUND(m_c_post, 6) AS mean_c_post,
                ROUND(m_t_pre, 6) AS mean_t_pre,
                ROUND(m_t_post, 6) AS mean_t_post,
                ROUND((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6) AS did
         FROM m""",

    // Neyman allocation from one exact-moment aggregate; floor(x+0.5)
    // rounding so neither engine's round-half mode matters, and the
    // N_h*sd weights rounded to 10dp + decimal-summed so wtot (and
    // hence every allocation) is order-free cross-engine
    "q_neyman" ->
      """WITH s AS (SELECT c_mktsegment, count(*) AS n_pop,
                  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))
                           * CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS s2
                FROM customer GROUP BY c_mktsegment),
         t AS (SELECT c_mktsegment, n_pop,
                 sqrt(greatest(0.0, s2 / n_pop - (s1 / n_pop) * (s1 / n_pop)))
                   AS sd
               FROM s),
         t2 AS (SELECT c_mktsegment, n_pop, sd,
                  CAST(round(n_pop * sd, 10) AS DECIMAL(28,10)) AS w
                FROM t),
         w AS (SELECT CAST(SUM(w) AS DOUBLE) AS wtot FROM t2)
         SELECT t2.c_mktsegment, t2.n_pop, ROUND(t2.sd, 6) AS sd,
                CAST(floor(CAST(1000 AS DOUBLE) * CAST(t2.w AS DOUBLE)
                           / w.wtot + 0.5) AS BIGINT) AS n_alloc
         FROM t2 CROSS JOIN w ORDER BY t2.c_mktsegment""",

    // brute-force aHash replay: the PNG round-trip is lossless, so the
    // raster IS the key arithmetic; bits compare 16*s_i > total in pure
    // integers, pairs are all-pairs Hamming <= 3 (the Spark side's
    // banded join is provably equal by pigeonhole: 4 bands > 3 flips)
    "q_phash_pairs" ->
      """WITH k AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 600),
         px AS (SELECT k,
                  CASE WHEN k % 5 = 4 THEN k - 1 ELSE k END AS base,
                  CASE WHEN k % 5 = 4 THEN 1 ELSE 0 END AS delta,
                  unnest(range(16)) AS i
                FROM k),
         s AS (SELECT k, i,
                 ((base * 31 + i * 97
                   + CASE WHEN i = 0 THEN delta ELSE 0 END) % 256)
                 + ((base * 53 + i * 193) % 256)
                 + ((base * 71 + i * 41) % 256) AS s
               FROM px),
         t AS (SELECT k, SUM(s) AS tot FROM s GROUP BY k),
         h AS (SELECT s.k,
                 SUM(CASE WHEN 16 * s.s > t.tot THEN 1 << s.i ELSE 0 END) AS ph
               FROM s JOIN t USING (k) GROUP BY s.k)
         SELECT a.k AS a_id, b.k AS b_id,
                CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
         FROM h a JOIN h b ON a.k < b.k
         WHERE bit_count(xor(a.ph, b.ph)) <= 3
         ORDER BY a_id, b_id""",

    // identical replay, threshold 2 — the multi-index join is exact by
    // the same pigeonhole argument (>= blocks-maxHamming chunks agree)
    "q_phash_multiindex" ->
      """WITH k AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 600),
         px AS (SELECT k,
                  CASE WHEN k % 5 = 4 THEN k - 1 ELSE k END AS base,
                  CASE WHEN k % 5 = 4 THEN 1 ELSE 0 END AS delta,
                  unnest(range(16)) AS i
                FROM k),
         s AS (SELECT k, i,
                 ((base * 31 + i * 97
                   + CASE WHEN i = 0 THEN delta ELSE 0 END) % 256)
                 + ((base * 53 + i * 193) % 256)
                 + ((base * 71 + i * 41) % 256) AS s
               FROM px),
         t AS (SELECT k, SUM(s) AS tot FROM s GROUP BY k),
         h AS (SELECT s.k,
                 SUM(CASE WHEN 16 * s.s > t.tot THEN 1 << s.i ELSE 0 END) AS ph
               FROM s JOIN t USING (k) GROUP BY s.k)
         SELECT a.k AS a_id, b.k AS b_id,
                CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
         FROM h a JOIN h b ON a.k < b.k
         WHERE bit_count(xor(a.ph, b.ph)) <= 2
         ORDER BY a_id, b_id""",

    // one scan of orders folds every constraint metric; the RI probe is
    // the same distinct-dim-keyset left join
    "q_dq_suite" ->
      """WITH j AS (
           SELECT o.*, c.c_custkey AS dim_key
           FROM orders o
           LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o.o_custkey = c.c_custkey),
         m AS (
           SELECT count(*) AS n_rows,
             CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_complete,
             count(DISTINCT o_orderkey) AS n_distinct,
             min(CAST(o_totalprice AS DOUBLE)) AS min_bound,
             CAST(SUM(CASE WHEN o_orderstatus IN ('F','P','O')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_in_domain,
             CAST(SUM(CASE WHEN dim_key IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ri_ok
           FROM j)
         SELECT * FROM (
           SELECT 'row_count_nonempty' AS "constraint",
                  CAST(n_rows AS DOUBLE) AS metric, n_rows > 0 AS passed
           FROM m
           UNION ALL SELECT 'completeness_o_custkey',
             ROUND(CAST(n_complete AS DOUBLE) / n_rows, 6),
             n_complete = n_rows FROM m
           UNION ALL SELECT 'uniqueness_o_orderkey',
             ROUND(CAST(n_distinct AS DOUBLE) / n_rows, 6),
             n_distinct = n_rows FROM m
           UNION ALL SELECT 'min_bound_o_totalprice',
             ROUND(min_bound, 6), min_bound >= 0.0 FROM m
           UNION ALL SELECT 'domain_o_orderstatus',
             ROUND(CAST(n_in_domain AS DOUBLE) / n_rows, 6),
             n_in_domain = n_rows FROM m
           UNION ALL SELECT 'ri_o_custkey_c_custkey',
             ROUND(CAST(n_ri_ok AS DOUBLE) / n_rows, 6),
             n_ri_ok = n_rows FROM m)
         ORDER BY "constraint"""",

    // row_number difference anchor — pure integer date arithmetic
    "q_gaps_islands" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         isl AS (
           SELECT user_id, day,
                  day - CAST(row_number() OVER (PARTITION BY user_id
                                                ORDER BY day) AS INTEGER)
                    AS anchor
           FROM ud),
         runs AS (
           SELECT user_id, anchor, count(*) AS len, min(day) AS start_day
           FROM isl GROUP BY user_id, anchor),
         mx AS (
           SELECT user_id, anchor, len, start_day,
                  max(len) OVER (PARTITION BY user_id) AS max_len
           FROM runs)
         SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
                count(*) AS n_streaks,
                CAST(max(len) AS BIGINT) AS longest_streak,
                min(CASE WHEN len = max_len THEN start_day END)
                  AS longest_start
         FROM mx GROUP BY user_id ORDER BY user_id""",

    // same distinct-basket pair counts as q_assoc_rules; cosine =
    // sup_ab / √(n_a·n_b), ranked on the rounded value
    "q_item_cf" ->
      """WITH li AS (SELECT DISTINCT l_orderkey,
                            CAST(l_partkey AS VARCHAR) AS p
                     FROM lineitem),
         s AS (SELECT p, count(*) AS n_orders FROM li GROUP BY p),
         pr AS (
           SELECT a.p AS u, b.p AS v, count(*) AS sup_ab
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                              AND a.p < b.p
           GROUP BY u, v HAVING count(*) >= 2)
         SELECT pr.u, pr.v, pr.sup_ab,
                ROUND(CAST(pr.sup_ab AS DOUBLE)
                      / sqrt(CAST(su.n_orders * sv.n_orders AS DOUBLE)), 6)
                  AS cosine
         FROM pr JOIN s su ON su.p = pr.u JOIN s sv ON sv.p = pr.v
         ORDER BY cosine DESC, pr.u, pr.v LIMIT 50""",

    // observed-cells-only identity χ² = Σ_obs[(o−e)²/e − e] + n; terms
    // rounded at 6 dp and summed in exact decimal
    "q_chi2_indep" ->
      """WITH f AS (
           SELECT cu.c_mktsegment AS a, o.o_orderpriority AS b
           FROM orders o JOIN customer cu ON o.o_custkey = cu.c_custkey),
         obs AS (SELECT a, b, count(*) AS o FROM f GROUP BY a, b),
         rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM obs GROUP BY a),
         ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM obs GROUP BY b),
         tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                        count(DISTINCT a) AS r, count(DISTINCT b) AS c
                 FROM obs),
         terms AS (
           SELECT tot.n, tot.r, tot.c,
                  CAST(ROUND((obs.o - CAST(rt.ra AS DOUBLE) * ct.cb / tot.n)
                           * (obs.o - CAST(rt.ra AS DOUBLE) * ct.cb / tot.n)
                           / (CAST(rt.ra AS DOUBLE) * ct.cb / tot.n)
                           - CAST(rt.ra AS DOUBLE) * ct.cb / tot.n, 6)
                       AS DECIMAL(18,6)) AS term
           FROM obs JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot)
         SELECT max(n) AS n, max(r) AS r, max(c) AS c,
                (max(r) - 1) * (max(c) - 1) AS dof,
                ROUND(CAST(SUM(term) AS DOUBLE) + max(n), 6) AS chi2
         FROM terms""",

    // shared pooled-bounds buckets, +1-per-occupied-bucket smoothing,
    // (p−q)·ln(p/q) terms rounded then decimal-summed
    "q_psi" ->
      """WITH allv AS (
           SELECT CAST(o_totalprice AS DOUBLE) AS v,
                  CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                       THEN 1 ELSE 0 END AS is_ref
           FROM orders WHERE o_totalprice IS NOT NULL),
         bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM allv),
         bucketed AS (
           SELECT CASE WHEN b.hi = b.lo THEN 0
                       ELSE LEAST(9, CAST(FLOOR((v - b.lo)
                         / ((b.hi - b.lo) / 10)) AS INTEGER)) END AS bucket,
                  CAST(SUM(is_ref) AS BIGINT) AS n_ref,
                  CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
           FROM allv CROSS JOIN bounds b GROUP BY 1),
         totals AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
                           CAST(SUM(n_cur) AS BIGINT) AS t_cur,
                           count(*) AS nb
                    FROM bucketed),
         terms AS (
           SELECT bucket, n_ref, n_cur,
                  CAST(n_ref + 1 AS DOUBLE) / (t_ref + nb) AS p,
                  CAST(n_cur + 1 AS DOUBLE) / (t_cur + nb) AS q,
                  ROUND((CAST(n_ref + 1 AS DOUBLE) / (t_ref + nb)
                       - CAST(n_cur + 1 AS DOUBLE) / (t_cur + nb))
                      * ln((CAST(n_ref + 1 AS DOUBLE) / (t_ref + nb))
                         / (CAST(n_cur + 1 AS DOUBLE) / (t_cur + nb))), 6)
                    AS psi_term
           FROM bucketed CROSS JOIN totals),
         tot2 AS (SELECT ROUND(CAST(SUM(CAST(psi_term AS DECIMAL(18,6)))
                    AS DOUBLE), 6) AS psi_total FROM terms)
         SELECT bucket, n_ref, n_cur, ROUND(p, 6) AS p, ROUND(q, 6) AS q,
                psi_term, psi_total
         FROM terms CROSS JOIN tot2 ORDER BY bucket""",

    // first-day trick: running distinct = cumsum of first-seen counts
    "q_cumulative_uniques" ->
      """WITH fd AS (
           SELECT user_id, CAST(min(ts) AS DATE) AS day
           FROM events GROUP BY user_id),
         npd AS (SELECT day, count(*) AS new_users FROM fd GROUP BY day),
         dau AS (SELECT CAST(ts AS DATE) AS day,
                        count(DISTINCT user_id) AS dau
                 FROM events GROUP BY 1),
         j AS (
           SELECT d.day, d.dau, COALESCE(n.new_users, 0) AS new_users
           FROM dau d LEFT JOIN npd n USING (day))
         SELECT day, dau, new_users,
                CAST(SUM(new_users) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_users
         FROM j ORDER BY day""",

    // Monday-anchored weeks on both engines; growth on integer counts
    "q_wow_growth" ->
      """WITH w AS (
           SELECT event_type, date_trunc('week', ts) AS week,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
         l AS (
           SELECT event_type, week, n,
                  lag(n, 1) OVER (PARTITION BY event_type
                                  ORDER BY week) AS prev_n
           FROM w)
         SELECT event_type, week, n, prev_n,
                CASE WHEN prev_n > 0 THEN
                  ROUND(CAST(n - prev_n AS DOUBLE) / prev_n * 100, 4)
                END AS wow_pct
         FROM l ORDER BY event_type, week""",

    // b-event anchored: profile joins give ∃a-before and ∃c-after
    "q_seq3" ->
      """WITH prof AS (
           SELECT user_id AS u, event_type AS t, min(ts) AS f,
                  max(ts) AS l
           FROM events GROUP BY 1, 2),
         tri AS (
           SELECT DISTINCT e.user_id AS u, a.t AS a, e.event_type AS b,
                  c.t AS c
           FROM events e
           JOIN prof a ON a.u = e.user_id AND a.f < e.ts
           JOIN prof c ON c.u = e.user_id AND e.ts < c.l)
         SELECT a, b, c, count(*) AS support
         FROM tri GROUP BY a, b, c
         ORDER BY support DESC, a, b, c LIMIT 50""",

    // merge semantics replayed relationally: cur = source ∪ (target
    // not overwritten); diff classes + exact decimal price delta
    "q_table_diff" ->
      """WITH target AS (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 3 <> 0),
         source AS (
           SELECT o_orderkey, o_totalprice * 2 AS o_totalprice
           FROM orders WHERE o_orderkey % 2 = 0),
         cur AS (
           SELECT * FROM source
           UNION ALL
           SELECT t.* FROM target t WHERE NOT EXISTS
             (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)),
         prev AS (SELECT o_orderkey AS k,
                         CAST(o_totalprice AS DECIMAL(18,2)) AS p_prev
                  FROM target),
         c2 AS (SELECT o_orderkey AS k,
                       CAST(o_totalprice AS DECIMAL(18,2)) AS p_cur
                FROM cur),
         d AS (
           SELECT CASE WHEN p.p_prev IS NULL THEN 'added'
                       WHEN c.p_cur IS NULL THEN 'removed'
                       WHEN c.p_cur <> p.p_prev THEN 'changed'
                       ELSE 'unchanged' END AS change_type,
                  p.p_prev, c.p_cur
           FROM prev p FULL OUTER JOIN c2 c ON p.k = c.k)
         SELECT change_type, count(*) AS n_rows,
                ROUND(CAST(SUM(COALESCE(p_cur, 0))
                    - SUM(COALESCE(p_prev, 0)) AS DOUBLE), 2)
                  AS net_price_delta
         FROM d GROUP BY change_type ORDER BY change_type""",

    // same per-doc score chain as q_quality_model; scores decimal-
    // summed per bin, per-bin ECE terms rounded then decimal-summed
    "q_calibration" ->
      s"""WITH sc AS ($qualityScoreOracleSql),
         s AS (SELECT score,
                      CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS y
               FROM sc),
         binned AS (
           SELECT LEAST(99, CAST(FLOOR(score * 100) AS INTEGER)) AS bin,
                  count(*) AS n,
                  SUM(CAST(score AS DECIMAL(18,6))) AS ssum,
                  CAST(SUM(y) AS BIGINT) AS npos
           FROM s GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM binned),
         terms AS (
           SELECT bin, n,
                  ROUND(CAST(ssum AS DOUBLE) / n, 6) AS conf,
                  ROUND(CAST(npos AS DOUBLE) / n, 6) AS acc,
                  ROUND(abs(ROUND(CAST(npos AS DOUBLE) / n, 6)
                          - ROUND(CAST(ssum AS DOUBLE) / n, 6)), 6) AS gap,
                  CAST(ROUND(CAST(n AS DOUBLE) / t.n_total
                       * ROUND(abs(ROUND(CAST(npos AS DOUBLE) / n, 6)
                               - ROUND(CAST(ssum AS DOUBLE) / n, 6)), 6), 6)
                    AS DECIMAL(18,6)) AS ece_term
           FROM binned CROSS JOIN tot t),
         e AS (SELECT ROUND(CAST(SUM(ece_term) AS DOUBLE), 6) AS ece_total
               FROM terms)
         SELECT bin, n, conf, acc, gap, ece_total
         FROM terms CROSS JOIN e ORDER BY bin""",

    // per-conversion fan-out k via a conversion-id window; credit 1/k
    // rounded at 6 dp, decimal-summed
    "q_attribution" ->
      """WITH conv AS (
           SELECT user_id AS u, event_id AS conv_id, ts AS cts
           FROM events WHERE event_type = 'purchase'),
         touches AS (
           SELECT user_id AS u, event_type AS touch_type, ts AS tts
           FROM events WHERE event_type <> 'purchase'),
         pairs AS (
           SELECT t.touch_type, c.conv_id
           FROM touches t JOIN conv c ON t.u = c.u
           WHERE t.tts < c.cts AND t.tts >= c.cts - INTERVAL 3 DAY),
         credits AS (
           SELECT touch_type,
                  CAST(ROUND(1.0 / (count(*) OVER (PARTITION BY conv_id)), 6)
                       AS DECIMAL(18,6)) AS credit
           FROM pairs)
         SELECT touch_type, count(*) AS n_touches,
                ROUND(CAST(SUM(credit) AS DOUBLE), 4) AS total_credit
         FROM credits GROUP BY touch_type ORDER BY touch_type""",

    // q_seasonal_index ∘ q_rolling_zscore: deseasonalized counts
    // rounded to 4 dp → DECIMAL frame sums → ONE variance formula
    "q_deseasonal_z" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         bydow AS (
           SELECT event_type, isodow(day) AS dow,
                  CAST(SUM(n) AS BIGINT) AS s_dow, count(*) AS d_dow
           FROM daily GROUP BY 1, 2),
         totals AS (
           SELECT event_type, CAST(SUM(n) AS BIGINT) AS s_all,
                  count(*) AS d_all
           FROM daily GROUP BY event_type),
         idx AS (
           SELECT b.event_type, b.dow,
                  ROUND((CAST(b.s_dow AS DOUBLE) / b.d_dow)
                      / (CAST(t.s_all AS DOUBLE) / t.d_all), 4) AS sidx
           FROM bydow b JOIN totals t USING (event_type)),
         ds AS (
           SELECT d.event_type, d.day, d.n,
                  CAST(ROUND(CAST(d.n AS DOUBLE) / i.sidx, 4)
                       AS DECIMAL(18,4)) AS nd
           FROM daily d JOIN idx i
             ON i.event_type = d.event_type AND i.dow = isodow(d.day)),
         z AS (
           SELECT event_type, day, n, CAST(nd AS DOUBLE) AS deseasonalized,
                  count(*) OVER w AS cnt,
                  CAST(SUM(nd) OVER w AS DOUBLE) / 7.0 AS mean_w,
                  CAST(SUM(nd * nd) OVER w AS DOUBLE) / 7.0
                    - (CAST(SUM(nd) OVER w AS DOUBLE) / 7.0)
                    * (CAST(SUM(nd) OVER w AS DOUBLE) / 7.0) AS var_w,
                  CAST(nd AS DOUBLE) AS ndd
           FROM ds
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT event_type, day, n, deseasonalized,
                CASE WHEN cnt = 7 AND var_w > 0 THEN
                  ROUND((ndd - mean_w) / sqrt(var_w), 4) END AS z,
                CASE WHEN cnt = 7 THEN
                  COALESCE(abs(CASE WHEN cnt = 7 AND var_w > 0 THEN
                    ROUND((ndd - mean_w) / sqrt(var_w), 4) END) >= 2.0,
                    false)
                END AS is_anomaly
         FROM z ORDER BY event_type, day""",

    // same per-dim unnest as q_embed_centroids; per-vector distances
    // rounded then decimal-summed, centroid-vs-global equi-join shape
    "q_class_separation" ->
      """WITH d AS (
           SELECT vec_id, label, u.pos AS pos, u.v AS v
           FROM (SELECT vec_id, label,
                   unnest([{'pos': i, 'v': CAST(embedding[i] AS DOUBLE)}
                           for i in range(1, len(embedding) + 1)]) AS u
                 FROM embeddings)),
         cl AS (SELECT label, pos, AVG(v) AS m FROM d GROUP BY label, pos),
         cg AS (SELECT pos, AVG(v) AS g FROM d GROUP BY pos),
         dist AS (
           SELECT d.vec_id, d.label,
                  CAST(ROUND(sqrt(SUM((d.v - c.m) * (d.v - c.m))), 4)
                       AS DECIMAL(18,4)) AS dist
           FROM d JOIN cl c ON c.label = d.label AND c.pos = d.pos
           GROUP BY d.vec_id, d.label),
         w AS (SELECT label, count(*) AS n_vecs,
                      ROUND(CAST(SUM(dist) AS DOUBLE) / count(*), 4)
                        AS intra
               FROM dist GROUP BY label),
         btw AS (
           SELECT c.label,
                  ROUND(sqrt(SUM((c.m - g.g) * (c.m - g.g))), 4) AS inter
           FROM cl c JOIN cg g USING (pos) GROUP BY c.label)
         SELECT w.label, w.n_vecs, w.intra, b.inter,
                ROUND(b.inter / w.intra, 4) AS separation
         FROM w JOIN btw b ON b.label = w.label ORDER BY w.label""",

    // per-dim variances rounded then decimal-folded; PR = (Σv)²/Σv²
    "q_effective_dim" ->
      """WITH d AS (
           SELECT u.pos AS pos, u.v AS v
           FROM (SELECT unnest([{'pos': i, 'v': CAST(embedding[i] AS DOUBLE)}
                                for i in range(1, len(embedding) + 1)]) AS u
                 FROM embeddings)),
         pd AS (
           SELECT pos,
                  CAST(ROUND(AVG(v * v) - AVG(v) * AVG(v), 6)
                       AS DECIMAL(18,6)) AS variance
           FROM d GROUP BY pos)
         SELECT count(*) AS n_dims,
                ROUND(CAST(SUM(variance) AS DOUBLE), 6) AS total_variance,
                ROUND(CAST(SUM(variance) AS DOUBLE)
                      * CAST(SUM(variance) AS DOUBLE)
                      / CAST(SUM(CAST(variance * variance
                                      AS DECIMAL(38,12))) AS DOUBLE), 4)
                  AS participation_ratio
         FROM pd""",

    // vec_id parity era split; |Δmean|/pooled sd, rank on rounded z
    "q_embed_drift" ->
      """WITH d AS (
           SELECT vec_id % 2 AS era, u.pos AS pos, u.v AS v
           FROM (SELECT vec_id,
                   unnest([{'pos': i - 1, 'v': CAST(embedding[i] AS DOUBLE)}
                           for i in range(1, len(embedding) + 1)]) AS u
                 FROM embeddings)),
         st AS (
           SELECT pos,
                  AVG(CASE WHEN era = 0 THEN v END) AS m0,
                  AVG(CASE WHEN era = 1 THEN v END) AS m1,
                  AVG(v * v) AS m2, AVG(v) AS m
           FROM d GROUP BY pos)
         SELECT pos, ROUND(m0, 4) AS mean_a, ROUND(m1, 4) AS mean_b,
                ROUND(abs(m1 - m0) / sqrt(m2 - m * m), 4) AS drift_z
         FROM st ORDER BY drift_z DESC, pos LIMIT 10""",

    // first-day reduction + integer date arithmetic
    "q_dn_retention" ->
      """WITH fd AS (
           SELECT user_id, CAST(min(ts) AS DATE) AS cohort
           FROM events GROUP BY 1),
         act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                 FROM events),
         cs AS (SELECT cohort, count(*) AS n_users FROM fd GROUP BY cohort),
         r AS (
           SELECT f.cohort, datediff('day', f.cohort, a.day) AS k,
                  count(*) AS n_active
           FROM act a JOIN fd f USING (user_id)
           WHERE datediff('day', f.cohort, a.day) IN (1, 7, 14)
           GROUP BY 1, 2)
         SELECT r.cohort, r.k, r.n_active, c.n_users,
                ROUND(CAST(r.n_active AS DOUBLE) / c.n_users, 4)
                  AS retention
         FROM r JOIN cs c USING (cohort) ORDER BY r.cohort, r.k""",

    // the z-sum must be the SAME double addition as Spark's lit sum
    "q_ab_power" ->
      """WITH u AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS converted
           FROM events GROUP BY 1),
         b AS (SELECT count(*) AS n_users,
                      CAST(SUM(converted) AS BIGINT) AS n_conv FROM u),
         d(delta) AS (VALUES (CAST(0.02 AS DOUBLE)),
                             (CAST(0.05 AS DOUBLE)),
                             (CAST(0.10 AS DOUBLE)))
         SELECT d.delta, b.n_users, b.n_conv,
                ROUND(CAST(b.n_conv AS DOUBLE) / b.n_users, 6) AS base_rate,
                CAST(CEIL((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
                        * (CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
                        * 2.0 * (CAST(b.n_conv AS DOUBLE) / b.n_users)
                        * (1.0 - CAST(b.n_conv AS DOUBLE) / b.n_users)
                        / (d.delta * d.delta)) AS BIGINT) AS n_per_arm
         FROM b CROSS JOIN d ORDER BY d.delta""",

    // same unrolled 2-iteration propagation as q_label_prop, then the
    // three modularity aggregates over the ONE-direction edge list
    "q_modularity" ->
      """WITH e0 AS (SELECT DISTINCT 's' || l_suppkey AS src,
                            'p' || l_partkey AS dst FROM lineitem),
         e AS (SELECT src, dst FROM e0
               UNION SELECT dst AS src, src AS dst FROM e0),
         r0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
         n1 AS (SELECT e.src AS node, r.label, count(*) AS cnt
                FROM e JOIN r0 r ON e.dst = r.node GROUP BY e.src, r.label),
         r1 AS (SELECT node, label FROM (
                  SELECT node, label, row_number() OVER (
                    PARTITION BY node ORDER BY cnt DESC, label) AS rn
                  FROM n1) WHERE rn = 1),
         n2 AS (SELECT e.src AS node, r.label, count(*) AS cnt
                FROM e JOIN r1 r ON e.dst = r.node GROUP BY e.src, r.label),
         r2 AS (SELECT node, label FROM (
                  SELECT node, label, row_number() OVER (
                    PARTITION BY node ORDER BY cnt DESC, label) AS rn
                  FROM n2) WHERE rn = 1),
         mm AS (SELECT count(*) AS m_edges FROM e0),
         ec AS (
           SELECT ls.label, count(*) AS e_in
           FROM e0 JOIN r2 ls ON ls.node = e0.src
                   JOIN r2 ld ON ld.node = e0.dst
           WHERE ls.label = ld.label
           GROUP BY ls.label),
         deg AS (
           SELECT node, count(*) AS d FROM (
             SELECT src AS node FROM e0
             UNION ALL SELECT dst AS node FROM e0)
           GROUP BY node),
         dc AS (
           SELECT r.label, CAST(SUM(d.d) AS BIGINT) AS d_sum,
                  count(*) AS n_members
           FROM r2 r JOIN deg d USING (node) GROUP BY r.label),
         terms AS (
           SELECT dc.label, dc.n_members,
                  COALESCE(ec.e_in, 0) AS e_in, dc.d_sum,
                  ROUND(CAST(COALESCE(ec.e_in, 0) AS DOUBLE) / mm.m_edges
                      - (CAST(dc.d_sum AS DOUBLE) / (2 * mm.m_edges))
                      * (CAST(dc.d_sum AS DOUBLE) / (2 * mm.m_edges)), 6)
                    AS q_term
           FROM dc LEFT JOIN ec USING (label) CROSS JOIN mm),
         q AS (SELECT ROUND(CAST(SUM(CAST(q_term AS DECIMAL(18,6)))
                    AS DOUBLE), 6) AS modularity FROM terms)
         SELECT t.label, t.n_members, t.e_in, t.d_sum, t.q_term,
                q.modularity
         FROM terms t CROSS JOIN q
         ORDER BY t.n_members DESC, t.label LIMIT 20""",

    // lag() ignores frames; the rolling mean guards partial frames
    "q_lag_features" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, n,
                lag(n, 1) OVER w AS lag_1,
                lag(n, 7) OVER w AS lag_7,
                CASE WHEN count(*) OVER w7 = 7 THEN
                  ROUND(CAST(SUM(n) OVER w7 AS DOUBLE) / 7.0, 4)
                END AS roll7_mean
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day),
                w7 AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY event_type, day""",

    // LOO in double: (Σ_seg − x)/(n_seg − 1); decimal only for the sums
    "q_target_encoding" ->
      """WITH o AS (
           SELECT o_orderkey, o_custkey,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS y
           FROM orders),
         j AS (SELECT o.*, c.c_mktsegment
               FROM o JOIN customer c ON o.o_custkey = c.c_custkey),
         seg AS (SELECT c_mktsegment, SUM(y) AS sy, count(*) AS ny
                 FROM j GROUP BY 1)
         SELECT j.o_orderkey, j.c_mktsegment,
                ROUND(CAST(j.y AS DOUBLE), 2) AS y,
                ROUND((CAST(s.sy AS DOUBLE) - CAST(j.y AS DOUBLE))
                      / (s.ny - 1), 4) AS loo_encoding
         FROM j JOIN seg s USING (c_mktsegment)
         WHERE j.o_orderkey % 100 = 0
         ORDER BY j.o_orderkey""",

    // forecast = trailing-7 deseasonalized mean × index; MAE from
    // rounded absolute errors decimal-summed
    "q_seasonal_forecast" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         bydow AS (
           SELECT event_type, isodow(day) AS dow,
                  CAST(SUM(n) AS BIGINT) AS s_dow, count(*) AS d_dow
           FROM daily GROUP BY 1, 2),
         totals AS (
           SELECT event_type, CAST(SUM(n) AS BIGINT) AS s_all,
                  count(*) AS d_all
           FROM daily GROUP BY event_type),
         idx AS (
           SELECT b.event_type, b.dow,
                  ROUND((CAST(b.s_dow AS DOUBLE) / b.d_dow)
                      / (CAST(t.s_all AS DOUBLE) / t.d_all), 4) AS sidx
           FROM bydow b JOIN totals t USING (event_type)),
         nd AS (
           SELECT d.event_type, d.day, d.n, i.sidx,
                  CAST(ROUND(CAST(d.n AS DOUBLE) / i.sidx, 4)
                       AS DECIMAL(18,4)) AS ndv
           FROM daily d JOIN idx i
             ON i.event_type = d.event_type AND i.dow = isodow(d.day)),
         sc AS (
           SELECT event_type, day, n, sidx,
                  CASE WHEN count(*) OVER wp = 7 THEN
                    ROUND(CAST(SUM(ndv) OVER wp AS DOUBLE) / 7.0, 4)
                  END AS base
           FROM nd
           WINDOW wp AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
         f AS (SELECT event_type, day, n,
                      ROUND(base * sidx, 2) AS forecast
               FROM sc),
         e AS (SELECT event_type,
                      CAST(ROUND(abs(CAST(n AS DOUBLE) - forecast), 2)
                           AS DECIMAL(18,2)) AS abs_err
               FROM f WHERE forecast IS NOT NULL)
         SELECT event_type, count(*) AS n_days,
                ROUND(CAST(SUM(abs_err) AS DOUBLE) / count(*), 4) AS mae,
                ROUND(quantile_cont(CAST(abs_err AS DOUBLE), 0.9), 4)
                  AS pi90_halfwidth
         FROM e GROUP BY event_type ORDER BY event_type""",

    // verbatim langIdOracleSql as the prediction CTE
    "q_lang_confusion" ->
      s"""WITH pred AS ($langIdOracleSql),
         cm AS (SELECT lang, pred_lang, count(*) AS n
                FROM pred GROUP BY 1, 2),
         acc AS (SELECT ROUND(CAST(SUM(CASE WHEN lang = pred_lang
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
                   AS accuracy
                 FROM pred)
         SELECT cm.lang, cm.pred_lang, cm.n, acc.accuracy
         FROM cm CROSS JOIN acc ORDER BY cm.lang, cm.pred_lang""",

    // same md5→60-bit uniform chain as q_weighted_sample; Laplace noise
    // as b·(ln u1 − ln u2), b = 1/ε = 1
    "q_dp_counts" ->
      """WITH c AS (
           SELECT lang, source, count(*) AS n
           FROM documents GROUP BY 1, 2),
         u AS (
           SELECT lang, source, n,
                  ((('0x' || substr(md5('42|1|' || lang || '|' || source),
                      1, 15))::BIGINT + 1.0) / 1.152921504606846976e18)
                    AS u1,
                  ((('0x' || substr(md5('42|2|' || lang || '|' || source),
                      1, 15))::BIGINT + 1.0) / 1.152921504606846976e18)
                    AS u2
           FROM c)
         SELECT lang, source, n,
                ROUND(n + (ln(u1) - ln(u2)) / 1.0, 4) AS noisy_n
         FROM u ORDER BY lang, source""",

    // a day is emitted once the final watermark (max ts, ms-truncated,
    // delay 0) is STRICTLY past its end; z vs expanding PRIOR-day
    // stats via the same Q/k − (P/k)² integer-prefix formula
    "q_stream_anomaly" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         wm AS (SELECT date_trunc('milliseconds', max(ts)) AS w
                FROM events),
         ready AS (
           SELECT d.* FROM daily d CROSS JOIN wm
           WHERE CAST(d.day AS TIMESTAMP) + INTERVAL 1 DAY < wm.w),
         pre AS (
           SELECT event_type, day, n,
                  CAST(SUM(n) OVER wp AS BIGINT) AS p,
                  CAST(SUM(n * n) OVER wp AS BIGINT) AS q,
                  count(*) OVER wp AS k
           FROM ready
           WINDOW wp AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING))
         SELECT event_type, day, n,
                CASE WHEN k >= 7
                      AND (CAST(q AS DOUBLE) / k
                           - (CAST(p AS DOUBLE) / k)
                           * (CAST(p AS DOUBLE) / k)) > 0 THEN
                  ROUND((n - CAST(p AS DOUBLE) / k)
                        / sqrt(CAST(q AS DOUBLE) / k
                               - (CAST(p AS DOUBLE) / k)
                               * (CAST(p AS DOUBLE) / k)), 4)
                END AS z,
                CASE WHEN k >= 7 THEN
                  COALESCE(abs(CASE WHEN k >= 7
                        AND (CAST(q AS DOUBLE) / k
                             - (CAST(p AS DOUBLE) / k)
                             * (CAST(p AS DOUBLE) / k)) > 0 THEN
                      ROUND((n - CAST(p AS DOUBLE) / k)
                            / sqrt(CAST(q AS DOUBLE) / k
                                   - (CAST(p AS DOUBLE) / k)
                                   * (CAST(p AS DOUBLE) / k)), 4)
                    END) >= 2.0, false)
                END AS is_anomaly
         FROM pre ORDER BY event_type, day""",

    // integer prefix sums → per-candidate SSE costs; argmin on the
    // rounded cost with day tiebreak
    "q_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, CAST(SUM(n) AS BIGINT) AS tn,
                  CAST(SUM(n * n) AS BIGINT) AS tq, count(*) AS td
           FROM daily GROUP BY event_type),
         pre AS (
           SELECT d.event_type, d.day,
                  CAST(SUM(n) OVER w AS BIGINT) AS p,
                  CAST(SUM(n * n) OVER w AS BIGINT) AS q,
                  count(*) OVER w AS k,
                  t.tn, t.tq, t.td
           FROM daily d JOIN tot t USING (event_type)
           WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)),
         scored AS (
           SELECT event_type, day,
                  ROUND((CAST(q AS DOUBLE)
                         - CAST(p AS DOUBLE) * p / k)
                      + (CAST(tq - q AS DOUBLE)
                         - CAST(tn - p AS DOUBLE) * (tn - p)
                           / (td - k)), 4) AS cost
           FROM pre WHERE k < td),
         best AS (SELECT event_type, min(cost) AS mc FROM scored
                  GROUP BY event_type),
         pick AS (
           SELECT s.event_type, min(s.day) AS split_day,
                  b.mc AS sse_split
           FROM scored s JOIN best b ON s.event_type = b.event_type
                                    AND s.cost = b.mc
           GROUP BY s.event_type, b.mc),
         ns AS (
           SELECT event_type,
                  ROUND(CAST(tq AS DOUBLE)
                        - CAST(tn AS DOUBLE) * tn / td, 4) AS sse_nosplit
           FROM tot)
         SELECT p.event_type, p.split_day, p.sse_split, ns.sse_nosplit,
                CASE WHEN ns.sse_nosplit > 0 THEN
                  ROUND((ns.sse_nosplit - p.sse_split)
                        / ns.sse_nosplit * 100, 2)
                END AS sse_drop_pct
         FROM pick p JOIN ns USING (event_type)
         ORDER BY p.event_type""",

    // 20 deterministic half-samples via md5 parity; exact medians
    "q_median_ci" -> {
      val halves = (0 until 20).map { b =>
        s"""quantile_cont(CASE WHEN (('0x' || substr(md5('$b|' ||
            CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT) % 2 = 0
            THEN rev END, 0.5)"""
      }
      val mcols = (0 until 20).map(b =>
        s"CAST(ROUND(${halves(b)}, 4) AS DECIMAL(18,4)) AS m$b")
        .mkString(",\n                  ")
      val sumM = (0 until 20).map(b => s"m$b").mkString(" + ")
      val sumSq = (0 until 20)
        .map(b => s"CAST(m$b AS DOUBLE) * CAST(m$b AS DOUBLE)")
        .mkString(" + ")
      s"""WITH rev AS (
           SELECT o_custkey,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DOUBLE) AS rev
           FROM orders GROUP BY o_custkey),
         ms AS (
           SELECT ROUND(quantile_cont(rev, 0.5), 2) AS median,
                  $mcols
           FROM rev)
         SELECT median,
                ROUND(CAST($sumM AS DOUBLE) / 20.0, 2)
                  AS half_sample_mean,
                ROUND(sqrt(CAST($sumSq AS DOUBLE) / 20.0
                      - (CAST($sumM AS DOUBLE) / 20.0)
                      * (CAST($sumM AS DOUBLE) / 20.0)), 4)
                  AS half_sample_se
         FROM ms"""
    },

    // top-20 parts by distinct-order count; X-before-Y on first buys
    "q_cross_sell" ->
      """WITH tp AS (
           SELECT l_partkey FROM (
             SELECT l_partkey, count(*) AS n_orders
             FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
             GROUP BY l_partkey)
           ORDER BY n_orders DESC, l_partkey LIMIT 20),
         fb AS (
           SELECT o.o_custkey AS cust, li.l_partkey AS part,
                  min(o.o_orderdate) AS first_dt
           FROM lineitem li
           JOIN tp ON tp.l_partkey = li.l_partkey
           JOIN orders o ON o.o_orderkey = li.l_orderkey
           GROUP BY 1, 2)
         SELECT a.part AS x, b.part AS y, count(*) AS support
         FROM fb a JOIN fb b ON a.cust = b.cust
                            AND a.first_dt < b.first_dt
         GROUP BY 1, 2
         ORDER BY support DESC, x, y LIMIT 30""",

    // ln(unit price) rounded at 2 dp first (the exact ratio both
    // engines compute), then 6-dp lns into decimal moments
    "q_price_elasticity" ->
      """WITH src AS (
           SELECT l_returnflag,
                  CAST(ROUND(ln(ROUND(CAST(l_extendedprice AS DOUBLE)
                    / CAST(l_quantity AS DOUBLE), 2)), 6)
                    AS DECIMAL(18,6)) AS x,
                  CAST(ROUND(ln(CAST(l_quantity AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS y
           FROM lineitem
           WHERE l_quantity > 0 AND l_extendedprice > 0),
         m AS (
           SELECT l_returnflag, count(*) AS n,
                  SUM(x) AS sx, SUM(y) AS sy,
                  SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
                  SUM(CAST(y * y AS DECIMAL(38,12))) AS syy,
                  SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy
           FROM src GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
             AS elasticity,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
             AS r2
         FROM m ORDER BY l_returnflag""",

    // the three detector chains replayed verbatim, then a vote join
    "q_anomaly_consensus" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         zw AS (
           SELECT event_type, day, n,
                  count(*) OVER fr AS cnt_w,
                  SUM(n) OVER fr AS sum_w,
                  SUM(n * n) OVER fr AS sumsq_w
           FROM daily
           WINDOW fr AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         zz AS (
           SELECT event_type, day, n, cnt_w,
                  CAST(sum_w AS DOUBLE) / 7.0 AS mean_r,
                  CAST(sumsq_w AS DOUBLE) / 7.0
                    - (CAST(sum_w AS DOUBLE) / 7.0)
                    * (CAST(sum_w AS DOUBLE) / 7.0) AS var_r
           FROM zw),
         plain AS (
           SELECT event_type, day, n,
                  CAST(COALESCE(CASE WHEN cnt_w = 7 THEN
                    COALESCE(abs(CASE WHEN cnt_w = 7 AND var_r > 0
                      THEN ROUND((CAST(n AS DOUBLE) - mean_r)
                                 / sqrt(var_r), 4) END) >= 2.0, FALSE)
                  END, FALSE) AS INTEGER) AS v_plain
           FROM zz),
         bydow AS (
           SELECT event_type, isodow(day) AS dow,
                  CAST(SUM(n) AS BIGINT) AS s_dow, count(*) AS d_dow
           FROM daily GROUP BY 1, 2),
         totals AS (
           SELECT event_type, CAST(SUM(n) AS BIGINT) AS s_all,
                  count(*) AS d_all
           FROM daily GROUP BY event_type),
         idx AS (
           SELECT b.event_type, b.dow,
                  ROUND((CAST(b.s_dow AS DOUBLE) / b.d_dow)
                      / (CAST(t.s_all AS DOUBLE) / t.d_all), 4) AS sidx
           FROM bydow b JOIN totals t USING (event_type)),
         ds AS (
           SELECT d.event_type, d.day, d.n,
                  CAST(ROUND(CAST(d.n AS DOUBLE) / i.sidx, 4)
                       AS DECIMAL(18,4)) AS nd
           FROM daily d JOIN idx i
             ON i.event_type = d.event_type AND i.dow = isodow(d.day)),
         dz AS (
           SELECT event_type, day,
                  count(*) OVER w2 AS cnt,
                  CAST(SUM(nd) OVER w2 AS DOUBLE) / 7.0 AS mean_w,
                  CAST(SUM(nd * nd) OVER w2 AS DOUBLE) / 7.0
                    - (CAST(SUM(nd) OVER w2 AS DOUBLE) / 7.0)
                    * (CAST(SUM(nd) OVER w2 AS DOUBLE) / 7.0) AS var_w,
                  CAST(nd AS DOUBLE) AS ndd
           FROM ds
           WINDOW w2 AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         deseason AS (
           SELECT event_type, day,
                  CAST(COALESCE(CASE WHEN cnt = 7 THEN
                    COALESCE(abs(CASE WHEN cnt = 7 AND var_w > 0 THEN
                      ROUND((ndd - mean_w) / sqrt(var_w), 4) END) >= 2.0,
                      false)
                  END, false) AS INTEGER) AS v_deseason
           FROM dz),
         wow AS (
           SELECT event_type, day,
                  CAST(COALESCE(n > 2 * lag(n, 7) OVER
                    (PARTITION BY event_type ORDER BY day), false)
                    AS INTEGER) AS v_wow
           FROM daily)
         SELECT p.event_type, p.day, p.n, p.v_plain, d2.v_deseason,
                w3.v_wow, p.v_plain + d2.v_deseason + w3.v_wow AS votes
         FROM plain p
         JOIN deseason d2 ON d2.event_type = p.event_type
                         AND d2.day = p.day
         JOIN wow w3 ON w3.event_type = p.event_type AND w3.day = p.day
         ORDER BY p.event_type, p.day""",

    // quintile cutoffs from exact percentiles; score = 1 + Σ(x > cut)
    "q_rfm" ->
      """WITH today AS (
           SELECT CAST(max(o_orderdate) AS DATE) AS today FROM orders),
         rfm AS (
           SELECT o_custkey,
                  min(datediff('day', CAST(o_orderdate AS DATE), t.today))
                    AS recency,
                  count(*) AS frequency,
                  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
           FROM orders CROSS JOIN today t GROUP BY o_custkey),
         th AS (SELECT
             quantile_cont(CAST(recency AS DOUBLE), 0.2) AS r20,
             quantile_cont(CAST(recency AS DOUBLE), 0.4) AS r40,
             quantile_cont(CAST(recency AS DOUBLE), 0.6) AS r60,
             quantile_cont(CAST(recency AS DOUBLE), 0.8) AS r80,
             quantile_cont(CAST(frequency AS DOUBLE), 0.2) AS f20,
             quantile_cont(CAST(frequency AS DOUBLE), 0.4) AS f40,
             quantile_cont(CAST(frequency AS DOUBLE), 0.6) AS f60,
             quantile_cont(CAST(frequency AS DOUBLE), 0.8) AS f80,
             quantile_cont(CAST(monetary AS DOUBLE), 0.2) AS m20,
             quantile_cont(CAST(monetary AS DOUBLE), 0.4) AS m40,
             quantile_cont(CAST(monetary AS DOUBLE), 0.6) AS m60,
             quantile_cont(CAST(monetary AS DOUBLE), 0.8) AS m80
           FROM rfm)
         SELECT r.o_custkey, r.recency, r.frequency,
           ROUND(CAST(r.monetary AS DOUBLE), 2) AS monetary,
           6 - (1 + (CASE WHEN CAST(r.recency AS DOUBLE) > t.r20 THEN 1 ELSE 0 END)
                  + (CASE WHEN CAST(r.recency AS DOUBLE) > t.r40 THEN 1 ELSE 0 END)
                  + (CASE WHEN CAST(r.recency AS DOUBLE) > t.r60 THEN 1 ELSE 0 END)
                  + (CASE WHEN CAST(r.recency AS DOUBLE) > t.r80 THEN 1 ELSE 0 END))
             AS r_score,
           1 + (CASE WHEN CAST(r.frequency AS DOUBLE) > t.f20 THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(r.frequency AS DOUBLE) > t.f40 THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(r.frequency AS DOUBLE) > t.f60 THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(r.frequency AS DOUBLE) > t.f80 THEN 1 ELSE 0 END)
             AS f_score,
           1 + (CASE WHEN CAST(r.monetary AS DOUBLE) > t.m20 THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(r.monetary AS DOUBLE) > t.m40 THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(r.monetary AS DOUBLE) > t.m60 THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(r.monetary AS DOUBLE) > t.m80 THEN 1 ELSE 0 END)
             AS m_score
         FROM rfm r CROSS JOIN th t
         WHERE r.o_custkey % 50 = 0 ORDER BY r.o_custkey""",

    // cohort-partitioned prefix of exact decimal sums
    "q_ltv_curve" ->
      """WITH o AS (
           SELECT o_custkey, year(o_orderdate) AS yr,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS rev
           FROM orders),
         ch AS (SELECT o_custkey, min(yr) AS cohort FROM o
                GROUP BY o_custkey),
         ba AS (SELECT c.cohort, o.yr - c.cohort AS age,
                       SUM(o.rev) AS arev
                FROM o JOIN ch c USING (o_custkey) GROUP BY 1, 2),
         sz AS (SELECT cohort, count(*) AS n_customers FROM ch
                GROUP BY cohort)
         SELECT ba.cohort, ba.age, sz.n_customers,
           ROUND(CAST(SUM(ba.arev) OVER (PARTITION BY ba.cohort
               ORDER BY ba.age ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS DOUBLE) / sz.n_customers, 2)
             AS cum_ltv_per_customer
         FROM ba JOIN sz USING (cohort)
         ORDER BY ba.cohort, ba.age""",

    // θ = cov/var(x) from one exact-moment pass; var formulas mirrored
    "q_cuped" ->
      """WITH anchor AS (
           SELECT CAST(min(ts) AS DATE) + 15 AS cut FROM events),
         xy AS (
           SELECT user_id,
                  CAST(SUM(CASE WHEN CAST(ts AS DATE) < a.cut
                           THEN 1 ELSE 0 END) AS BIGINT) AS x,
                  CAST(SUM(CASE WHEN CAST(ts AS DATE) >= a.cut
                           THEN 1 ELSE 0 END) AS BIGINT) AS y
           FROM events CROSS JOIN anchor a GROUP BY user_id, a.cut),
         m AS (
           SELECT count(*) AS n,
                  CAST(SUM(x) AS BIGINT) AS sx,
                  CAST(SUM(y) AS BIGINT) AS sy,
                  CAST(SUM(x * x) AS BIGINT) AS sxx,
                  CAST(SUM(y * y) AS BIGINT) AS syy,
                  CAST(SUM(x * y) AS BIGINT) AS sxy
           FROM xy)
         SELECT n AS n_users,
           ROUND((CAST(sxy AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
               / (CAST(sxx AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)), 6)
             AS theta,
           ROUND(CAST(syy AS DOUBLE) / n
                 - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n), 4)
             AS var_y,
           ROUND((CAST(syy AS DOUBLE) / n
                  - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
               - (CAST(sxy AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
               * (CAST(sxy AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
               / (CAST(sxx AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)), 4)
             AS var_adjusted,
           ROUND(((CAST(sxy AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                * (CAST(sxy AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                / (CAST(sxx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
               / (CAST(syy AS DOUBLE) / n
                  - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
               * 100, 2) AS reduction_pct
         FROM m""",

    // exact decimal sums at each rollup level; shares as doubles
    "q_share_of_parent" ->
      """WITH bn AS (
           SELECT r.r_name, n.n_name,
                  SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS nrev
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           GROUP BY r.r_name, n.n_name),
         br AS (SELECT r_name, SUM(nrev) AS rrev FROM bn GROUP BY r_name),
         t AS (SELECT SUM(rrev) AS trev FROM br)
         SELECT bn.r_name, bn.n_name,
                ROUND(CAST(bn.nrev AS DOUBLE), 2) AS revenue,
                ROUND(CAST(bn.nrev AS DOUBLE) / CAST(br.rrev AS DOUBLE), 6)
                  AS share_of_region,
                ROUND(CAST(br.rrev AS DOUBLE) / CAST(t.trev AS DOUBLE), 6)
                  AS region_share_of_total
         FROM bn JOIN br USING (r_name) CROSS JOIN t
         ORDER BY bn.r_name, bn.n_name""",

    // symmetrized edges ⋈ integer degrees; Pearson from decimal moments
    "q_assortativity" ->
      """WITH e0 AS (SELECT DISTINCT 's' || l_suppkey AS src,
                            'p' || l_partkey AS dst FROM lineitem),
         sym AS (SELECT src, dst FROM e0
                 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         deg AS (SELECT src AS node, count(*) AS d FROM sym GROUP BY src),
         pairs AS (
           SELECT CAST(dx.d AS DECIMAL(18,0)) AS x,
                  CAST(dy.d AS DECIMAL(18,0)) AS y
           FROM sym JOIN deg dx ON dx.node = sym.src
                    JOIN deg dy ON dy.node = sym.dst),
         m AS (SELECT count(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
                 SUM(CAST(y * y AS DECIMAL(38,0))) AS syy,
                 SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
               FROM pairs)
         SELECT n AS n_directed_edges,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS assortativity
         FROM m""",

    // first-occurrence decile buckets + 10-row prefix fold; ln-ln OLS
    "q_heaps_fit" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(
                    lower(trim(text)), '\s+'), x -> len(x) > 0)) AS w
           FROM documents),
         mx AS (SELECT max(doc_id) AS max_id FROM documents),
         fd AS (SELECT w, min(doc_id) AS fdoc FROM toks GROUP BY w),
         vnew AS (
           SELECT CAST(FLOOR(CAST(f.fdoc AS DOUBLE) * 10
                    / (mx.max_id + 1)) + 1 AS INTEGER) AS dec,
                  count(*) AS dv
           FROM fd f CROSS JOIN mx GROUP BY 1),
         tnew AS (
           SELECT CAST(FLOOR(CAST(t.doc_id AS DOUBLE) * 10
                    / (mx.max_id + 1)) + 1 AS INTEGER) AS dec,
                  count(*) AS dt
           FROM toks t CROSS JOIN mx GROUP BY 1),
         j AS (
           SELECT COALESCE(v.dec, t.dec) AS dec, COALESCE(dv, 0) AS dv,
                  COALESCE(dt, 0) AS dt
           FROM vnew v FULL OUTER JOIN tnew t ON v.dec = t.dec),
         pts AS (
           SELECT dec,
                  CAST(SUM(dv) OVER wc AS BIGINT) AS v,
                  CAST(SUM(dt) OVER wc AS BIGINT) AS n_toks
           FROM j
           WINDOW wc AS (ORDER BY dec ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)),
         f2 AS (SELECT * FROM pts WHERE v > 0 AND n_toks > 0),
         xy AS (SELECT
                  CAST(ROUND(ln(CAST(n_toks AS DOUBLE)), 6)
                       AS DECIMAL(18,6)) AS x,
                  CAST(ROUND(ln(CAST(v AS DOUBLE)), 6)
                       AS DECIMAL(18,6)) AS y
                FROM f2),
         m AS (SELECT count(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
                 SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy
               FROM xy)
         SELECT k AS n_checkpoints,
           ROUND((k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
             AS heaps_beta
         FROM m""",

    // same tokenize as the LM oracles; 6-dp lns → decimal moments
    "q_zipf_fit" ->
      """WITH toks AS (
           SELECT unnest(list_filter(string_split_regex(lower(trim(text)),
                    '\s+'), x -> len(x) > 0)) AS w
           FROM documents),
         cnt AS (SELECT w, count(*) AS f FROM toks GROUP BY w),
         top AS (SELECT w, f FROM cnt ORDER BY f DESC, w LIMIT 100),
         ranked AS (SELECT f, row_number() OVER (ORDER BY f DESC, w)
                      AS rank FROM top),
         xy AS (
           SELECT CAST(ROUND(ln(CAST(rank AS DOUBLE)), 6)
                       AS DECIMAL(18,6)) AS x,
                  CAST(ROUND(ln(CAST(f AS DOUBLE)), 6)
                       AS DECIMAL(18,6)) AS y
           FROM ranked),
         m AS (SELECT count(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
                 SUM(CAST(y * y AS DECIMAL(38,12))) AS syy,
                 SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy
               FROM xy)
         SELECT n AS n_terms,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
             AS zipf_slope,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
             AS r2
         FROM m""",

    // Mann-Whitney over per-distinct-score aggregates; halves are exact
    "q_auc" ->
      s"""WITH sc AS ($qualityScoreOracleSql),
         s AS (SELECT score,
                      CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS y
               FROM sc),
         bs AS (SELECT score, CAST(SUM(y) AS BIGINT) AS pos,
                       CAST(SUM(1 - y) AS BIGINT) AS neg
                FROM s GROUP BY score),
         tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS p_tot,
                        CAST(SUM(neg) AS BIGINT) AS n_tot FROM bs),
         cum AS (SELECT score, pos, neg,
                   COALESCE(CAST(SUM(neg) OVER (ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS BIGINT), 0) AS cum_neg
                 FROM bs)
         SELECT max(tot.p_tot) AS n_pos, max(tot.n_tot) AS n_neg,
                ROUND(SUM(CAST(pos AS DOUBLE) * (cum_neg + 0.5 * neg))
                      / (CAST(max(tot.p_tot) AS DOUBLE)
                         * max(tot.n_tot)), 6) AS auc
         FROM cum CROSS JOIN tot""",

    // same score CTE as q_auc; quantile_cont mirrors Spark's exact
    // interpolated percentile (parity precedent: q_percentile), band =
    // count of thresholds strictly below the 6-dp score
    "q_gains" ->
      s"""WITH sc AS ($qualityScoreOracleSql),
         s AS (SELECT score,
                      CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS y
               FROM sc),
         thr AS (SELECT quantile_cont(score,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS t
                 FROM s),
         b AS (SELECT CAST(11 - (1 + list_sum(list_transform(thr.t,
                        x -> CASE WHEN s.score > x THEN 1 ELSE 0 END)))
                        AS BIGINT) AS band,
                      s.y
               FROM s CROSS JOIN thr),
         g AS (SELECT band, count(*) AS n, CAST(SUM(y) AS BIGINT) AS conv
               FROM b GROUP BY band),
         w AS (SELECT band, n, conv,
                 SUM(n) OVER () AS tot_n,
                 SUM(conv) OVER () AS tot_conv,
                 SUM(conv) OVER (ORDER BY band ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum_conv
               FROM g)
         SELECT band, n, conv,
                ROUND(CAST(conv AS DOUBLE) / n, 6) AS conv_rate,
                ROUND(CASE WHEN tot_conv > 0
                      THEN CAST(cum_conv AS DOUBLE) / tot_conv END, 6)
                  AS cum_capture,
                ROUND(CASE WHEN tot_conv > 0
                      THEN (CAST(conv AS DOUBLE) / n)
                           / (CAST(tot_conv AS DOUBLE) / tot_n) END, 6)
                  AS lift
         FROM w ORDER BY band""",

    // same BM25 chain as q_bm25; graded rel = capped term frequency;
    // gains rounded then decimal-summed; ndcg on the rounded pair
    "q_ndcg" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(trim(text)), '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents),
         base AS (SELECT doc_id, len(t) AS dl FROM toks),
         stats AS (SELECT count(*) AS n_docs, AVG(dl) AS avgdl FROM base),
         tf AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM toks) u
           WHERE term IN ('spark', 'hash', 'window')
           GROUP BY doc_id, term),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         parts AS (
           SELECT tf.doc_id AS doc_id,
                  ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf
                    / (tf.tf + 1.2 * ((1.0 - 0.75)
                        + 0.75 * b.dl / s.avgdl)) AS part
           FROM tf JOIN df USING (term)
                JOIN base b ON tf.doc_id = b.doc_id
                CROSS JOIN stats s),
         top AS (
           SELECT doc_id, ROUND(SUM(part), 4) AS score
           FROM parts GROUP BY doc_id
           ORDER BY ROUND(SUM(part), 4) DESC, doc_id LIMIT 10),
         rel AS (
           SELECT doc_id, LEAST(7, count(*)) AS rel
           FROM (SELECT doc_id, unnest(t) AS term FROM toks) u
           WHERE term IN ('spark', 'hash', 'window')
           GROUP BY doc_id),
         r AS (SELECT t.doc_id, t.score, COALESCE(rel.rel, 0) AS rel
               FROM top t LEFT JOIN rel USING (doc_id)),
         rk AS (SELECT doc_id, rel,
                  row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
                  row_number() OVER (ORDER BY rel DESC, doc_id) AS irank
                FROM r),
         g AS (SELECT
                 CAST(ROUND((power(2.0, rel) - 1.0)
                      / (ln(rank + 1.0) / ln(2.0)), 6)
                   AS DECIMAL(18,6)) AS gain,
                 CAST(ROUND((power(2.0, rel) - 1.0)
                      / (ln(irank + 1.0) / ln(2.0)), 6)
                   AS DECIMAL(18,6)) AS igain
               FROM rk),
         a AS (SELECT ROUND(CAST(SUM(gain) AS DOUBLE), 4) AS dcg,
                      ROUND(CAST(SUM(igain) AS DOUBLE), 4) AS idcg
               FROM g)
         SELECT dcg, idcg, ROUND(dcg / idcg, 4) AS ndcg FROM a""",

    // one stats pass per group; scaling replayed row-locally
    "q_feature_scaling" ->
      """WITH li AS (
           SELECT l_orderkey, l_linenumber, l_returnflag,
                  CAST(l_extendedprice AS DECIMAL(18,2)) AS x
           FROM lineitem),
         st AS (
           SELECT l_returnflag,
                  min(CAST(x AS DOUBLE)) AS mn,
                  max(CAST(x AS DOUBLE)) AS mx,
                  count(*) AS n, SUM(x) AS sx,
                  SUM(CAST(x * x AS DECIMAL(38,4))) AS sxx
           FROM li GROUP BY 1)
         SELECT li.l_returnflag, li.l_orderkey, li.l_linenumber,
                ROUND(CAST(li.x AS DOUBLE), 2) AS x,
                ROUND((CAST(li.x AS DOUBLE) - st.mn) / (st.mx - st.mn), 6)
                  AS minmax,
                ROUND((CAST(li.x AS DOUBLE) - CAST(st.sx AS DOUBLE) / st.n)
                      / sqrt(CAST(st.sxx AS DOUBLE) / st.n
                             - (CAST(st.sx AS DOUBLE) / st.n)
                             * (CAST(st.sx AS DOUBLE) / st.n)), 4) AS zscore
         FROM li JOIN st USING (l_returnflag)
         WHERE li.l_orderkey % 500 = 0
         ORDER BY li.l_orderkey, li.l_linenumber, li.l_returnflag,
                  ROUND(CAST(li.x AS DOUBLE), 2)""",

    // +0.5 smoothing; 4-dp WoE; IV terms rounded then decimal-summed
    "q_woe_iv" ->
      """WITH tgt AS (
           SELECT o_custkey,
                  max(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS y
           FROM orders GROUP BY 1),
         bins AS (
           SELECT c.c_mktsegment, CAST(SUM(y) AS BIGINT) AS g,
                  CAST(SUM(1 - y) AS BIGINT) AS b
           FROM customer c JOIN tgt t ON c.c_custkey = t.o_custkey
           GROUP BY 1),
         tot AS (SELECT CAST(SUM(g) AS BIGINT) AS gt,
                        CAST(SUM(b) AS BIGINT) AS bt, count(*) AS k
                 FROM bins),
         terms AS (
           SELECT bins.c_mktsegment, bins.g, bins.b,
                  ROUND(ln(((CAST(bins.g AS DOUBLE) + 0.5)
                            / (tot.gt + 0.5 * tot.k))
                         / ((CAST(bins.b AS DOUBLE) + 0.5)
                            / (tot.bt + 0.5 * tot.k))), 4) AS woe,
                  CAST(ROUND(((CAST(bins.g AS DOUBLE) + 0.5)
                              / (tot.gt + 0.5 * tot.k)
                            - (CAST(bins.b AS DOUBLE) + 0.5)
                              / (tot.bt + 0.5 * tot.k))
                           * ROUND(ln(((CAST(bins.g AS DOUBLE) + 0.5)
                                       / (tot.gt + 0.5 * tot.k))
                                    / ((CAST(bins.b AS DOUBLE) + 0.5)
                                       / (tot.bt + 0.5 * tot.k))), 4), 6)
                       AS DECIMAL(18,6)) AS iv_term
           FROM bins CROSS JOIN tot),
         iv AS (SELECT ROUND(CAST(SUM(iv_term) AS DOUBLE), 6) AS iv_total
                FROM terms)
         SELECT t.c_mktsegment, t.g, t.b, t.woe, iv.iv_total
         FROM terms t CROSS JOIN iv ORDER BY t.c_mktsegment""",

    // Fano = var/mean of daily counts from exact integer sums
    "q_burstiness" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         m AS (
           SELECT event_type, count(*) AS n_days,
                  CAST(SUM(n) AS BIGINT) AS total,
                  CAST(SUM(n * n) AS BIGINT) AS sumsq
           FROM daily GROUP BY event_type)
         SELECT event_type, n_days, total,
                ROUND(CAST(total AS DOUBLE) / n_days, 4) AS mean_daily,
                ROUND(CAST(sumsq AS DOUBLE) / n_days
                    - (CAST(total AS DOUBLE) / n_days)
                    * (CAST(total AS DOUBLE) / n_days), 4) AS var_daily,
                ROUND((CAST(sumsq AS DOUBLE) / n_days
                     - (CAST(total AS DOUBLE) / n_days)
                     * (CAST(total AS DOUBLE) / n_days))
                    / (CAST(total AS DOUBLE) / n_days), 4) AS fano
         FROM m ORDER BY event_type""",
  )
}
