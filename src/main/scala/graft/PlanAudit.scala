package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the headline queries so
  * scan pushdown (PushedFilters/ReadSchema), join strategies, and
  * WholeStageCodegen spans can be audited (the 100 TB design check). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_items_pipeline", "q1_agg", "q_semi_join", "q_embed_topk",
        "q_minhash_pairs", "q_asof", "q_event_sessions", "q_rollup",
        "q_corpus_pipeline", "q_range_join", "q_winnow_pairs", "q_heavy_hitters",
        "q_ngram_jaccard", "q_bloom_join", "q_dedup_families", "q_pmi_bigrams",
        "q_pack_sequences", "q_funnel", "q_resample", "q_user_features",
        "q_repetition", "q_contamination", "q_stratified_sample",
        "q_tpch_q3", "q_tpch_q5", "q_pii_redact", "q_consistent_sample",
        "q_pagerank", "q_bm25", "q_cms_counts", "q_weighted_mix",
        "q_dup_ngram_rate", "q_hits", "q_label_prop", "q_postings",
        "q_quality_model", "q_chunk", "q_sampled_quantiles",
        "q_group_quantiles", "q_hard_negatives", "q_phrase",
        "q_fuzzy_join", "q_decontaminate", "q_unigram_lm", "q_semdedup",
        "q_split_leakage", "q_lateral", "q_fuzzy_match", "q_bpe_tokens",
        "q_tpch_q7", "q_tpch_q9", "q_tpch_q14", "q_tpch_q18",
        "q_kmv_distinct", "q_temperature_mix")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
