package graft

import org.apache.spark.sql.functions._

import graft.plans.PlanLint

/** The plan linter must flag deliberately bad plans and stay quiet on the
  * repo's own (pinned-good) query shapes. */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  test("flags a genuine cartesian product as an error") {
    val a = Tables.load(spark, sf, "customer")
    val b = Tables.load(spark, sf, "orders")
    val bad = a.crossJoin(b)
    val errs = PlanLint.errors(bad).map(_.rule)
    assert(errs.contains("cartesian-product") ||
      errs.contains("broadcast-nested-loop"), PlanLint.lint(bad))
  }

  test("single-row cross attach (stats pattern) is NOT an error") {
    val d = Tables.load(spark, sf, "documents")
    val stats = d.agg(count(lit(1)).as("n"))
    val ok = d.crossJoin(broadcast(stats)) // the totals-attach idiom
    assert(PlanLint.errors(ok).isEmpty, PlanLint.lint(ok))
  }

  test("naked single-row crossJoin degrades to a flagged cartesian " +
      "without stats; only the broadcast form is exempt") {
    // the repo convention is crossJoin(broadcast(agg)): the naked form
    // only plans as the exempt BNLJ while the optimizer can PROVE the
    // side tiny — with auto-broadcast off (stats absent / threshold
    // misconfigured) it becomes the quadratic cartesian, which must flag
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val d = Tables.load(spark, sf, "documents")
      val naked = d.crossJoin(d.agg(count(lit(1)).as("n")))
      naked.queryExecution.executedPlan // plan under the degraded config
      assert(PlanLint.errors(naked).map(_.rule).contains("cartesian-product"),
        PlanLint.lint(naked))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the explicit broadcast form stays exempt (same attach, planned as
    // single-row-build BNLJ regardless of stats)
    val d2 = Tables.load(spark, sf, "documents")
    val ok = d2.crossJoin(broadcast(d2.agg(count(lit(1)).as("n"))))
    assert(PlanLint.errors(ok).isEmpty, PlanLint.lint(ok))
  }

  test("flags a small side forced through a sort-merge join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dim = Tables.load(spark, sf, "nation") // tiny
      val fact = Tables.load(spark, sf, "customer")
      val j = fact.join(dim, fact("c_nationkey") === dim("n_nationkey"))
      // executedPlan is lazy: force planning while broadcast is disabled,
      // THEN restore a realistic threshold for the lint's size check
      j.queryExecution.executedPlan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      val warns = PlanLint.lint(j).filter(_.rule == "broadcastable-not-broadcast")
      assert(warns.nonEmpty, PlanLint.lint(j))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("unpartitioned window over an unbounded frame is an error") {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(spark, sf, "documents")
    val bad = d.withColumn("rn", row_number().over(Window.orderBy("doc_id")))
    assert(PlanLint.errors(bad).map(_.rule).contains("global-window"),
      PlanLint.lint(bad))
  }

  test("unpartitioned window over a limit-bounded frame is NOT an error") {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(spark, sf, "documents").limit(100)
    val ok = d.withColumn("rn", row_number().over(Window.orderBy("doc_id")))
    val findings = PlanLint.lint(ok)
    assert(!PlanLint.errors(ok).map(_.rule).contains("global-window"), findings)
    assert(findings.exists(f =>
      f.rule == "global-window" && f.severity == "info"), findings)
  }

  test("repo query shapes produce no errors; info totals always present") {
    Seq("q1_agg", "q_semi_join", "q_tpch_q3", "q_bm25").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      assert(PlanLint.errors(df).isEmpty, s"$q: ${PlanLint.lint(df)}")
      val rules = PlanLint.lint(df).map(_.rule)
      assert(rules.contains("shuffle-count") && rules.contains("codegen-coverage"))
    }
  }

  // queries whose CONSTRUCTION is eager (lake DML, iterative loops,
  // fixture staging, bounded driver-side training) — linting them lazily
  // would run jobs, so they are gated by the executed-plan capture test
  // instead; stream drains are gated by the last-execution test (their
  // micro-batch plans bypass QueryExecutionListener)
  private val eagerQueries = Set(
    "q_merge_upsert", "q_merge_upsert_pruned", "q_merge_delete",
    "q_delete_update",
    "q_time_travel",
    "q_zorder", "q_cdc", "q_cdc_delete", "q_schema_evolution",
    "q_orchestrator", "q_csv_pipeline", "q_csv_declared", "q_json_source",
    "q_orc_source", "q_items_pipeline", "q_orders_pipeline",
    "q_products_pipeline", "q_xlsx_pipeline", "q_bpe_tokens", "q_scd2",
    "q_scd2_lookup",
    "q_epoch_positions", "q_epoch_shuffle",
    "q_semdedup", "q_embed_ann_ivf", "q_split_leakage",
    "q_dedup_families", "q_family_survivors", "q_curate",
    "q_curate_increment", "q_pagerank", "q_ppr", "q_hits",
    "q_label_prop", "q_valid_counts", "q_corpus_pipeline",
    "q_kcore", // iterative peel localCheckpoints per round
    "q_skipping_scan", // writes the range-clustered layout, stats pass
    "q_bloom_skip", // writes the layout + runs the bloom-index build
    "q_zorder_skip", // writes the Morton-clustered layout, stats passes
    "q_avro_roundtrip") // bounded dim collect + fixture write
  private def streamQueries =
    SparkEntry.queries.keys.filter(_.startsWith("q_stream")).toSet
  // documented bounded brute-force verification twins — the cartesian /
  // non-equi shape is the point (README/ARCHITECTURE notes); they stay in
  // the lazy gate but only those two rules are tolerated for them
  // q_rrf_fusion's dense leg IS bruteForceTopK (single-query broadcast
  // side), so it inherits the same documented bounded-brute shape
  // q_int8_ann is bruteForceTopK's shape over int8 codes (bounded
  // 16-query broadcast side, one corpus scan) — same documented contract
  private val boundedBrute = Set("q_embed_neardup", "q_embed_topk",
    "q_hard_negatives", "q_embed_ann_lsh", "q_rrf_fusion", "q_int8_ann")
  private val bruteAllowedRules =
    Set("cartesian-product", "broadcast-nested-loop")

  test("no scale errors across the whole lazy analytic query surface") {
    val linted = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(eagerQueries).filterNot(streamQueries)
    assert(linted.size > 70) // the gate covers the bulk of the contract
    linted.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      val errs = PlanLint.errors(df)
        .filterNot(e => boundedBrute(q) && bruteAllowedRules(e.rule))
      assert(errs.isEmpty, s"$q: $errs")
    }
  }

  test("the three gates partition the ENTIRE query surface — no query " +
      "falls outside lazy, eager, and streaming") {
    val all = SparkEntry.queries.keySet
    assert(eagerQueries.subsetOf(all),
      s"stale eager entries: ${eagerQueries -- all}")
    assert(boundedBrute.subsetOf(all),
      s"stale brute entries: ${boundedBrute -- all}")
    assert((eagerQueries intersect streamQueries).isEmpty)
    assert((boundedBrute intersect (eagerQueries ++ streamQueries)).isEmpty)
    // the lazy gate lints exactly `all -- eager -- stream` (same
    // expression as the lazy test's filter), so with the subset +
    // disjointness assertions above the three gates partition `all` by
    // construction — asserting the union here would be tautological
    // (ADVICE r6). What CAN rot is the floor:
    assert(all.size >= 168, s"query surface shrank: ${all.size}")
  }

  test("executed-plan lint covers EVERY eager query (non-stream)") {
    // these run jobs during CONSTRUCTION, so the lazy gate above cannot
    // lint them — capture every execution they trigger instead and lint
    // those plans post-hoc (merge internals, iterative rounds, sinks).
    // Derived from the SAME set the lazy test excludes, so a new eager
    // query cannot silently fall between the two gates.
    eagerQueries.toSeq.sorted.foreach { q =>
      val (_, findings) = PlanLint.lintExecuted(spark) {
        SparkEntry.queries(q)(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
      val errs = findings.filter(_.severity == "error")
      assert(errs.isEmpty, s"$q: $errs")
      assert(findings.nonEmpty, s"$q captured no executions")
    }
  }

  test("per-query streaming lint: every q_stream_* micro-batch plan is clean") {
    import graft.streaming.Streams
    val qs = streamQueries.toSeq.sorted
    assert(qs.nonEmpty)
    qs.foreach { q =>
      // each q_stream_* drains its stream DURING construction via
      // drainToBatch/drainAppend — withDrainCapture collects the last
      // micro-batch QueryExecution of every drain on this thread, then
      // the noop write executes (and thereby covers) the batch tail too
      val (_, captured) = Streams.withDrainCapture {
        SparkEntry.queries(q)(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
      assert(captured.nonEmpty,
        s"$q drained no stream through Streams.drainWithExecution")
      captured.foreach { case (name, qe) =>
        val errs = PlanLint.lintPlan(qe.executedPlan, spark)
          .filter(_.severity == "error")
        assert(errs.isEmpty, s"$q [$name]: $errs")
      }
    }
  }

  test("streaming micro-batch plans lint clean (last-execution capture)") {
    import graft.streaming.Streams
    import org.apache.spark.sql.streaming.OutputMode
    val events = Streams.readTableStream(spark, sf, "events")
    // a watermarked windowed aggregation AND a stream-static broadcast
    // enrich — the two plan families the lazy + listener gates can't see
    val (aggOut, aggQe) = Streams.drainWithExecution(
      Streams.windowedCounts(events), "lint_stream_agg",
      OutputMode.Complete())
    assert(aggOut.count() > 0)
    assert(aggQe.nonEmpty, "no micro-batch execution captured")
    val dim = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))
    val (enrichOut, enrichQe) = Streams.drainWithExecution(
      Streams.enrichStream(events, dim, Seq("user_id")),
      "lint_stream_enrich", OutputMode.Append())
    assert(enrichOut.count() > 0)
    Seq("agg" -> aggQe, "enrich" -> enrichQe).foreach { case (tag, qe) =>
      val errs = PlanLint.lintPlan(qe.get.executedPlan, spark)
        .filter(_.severity == "error")
      assert(errs.isEmpty, s"$tag: $errs")
    }
  }

  test("lintReport renders findings as a DataFrame") {
    val r = PlanLint.lintReport(Tables.load(spark, sf, "orders").limit(5))
    assert(r.columns.toSeq == Seq("rule", "severity", "detail"))
    assert(r.count() >= 2) // the two info totals at minimum
  }
}
