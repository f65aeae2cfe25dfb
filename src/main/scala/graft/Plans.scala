package graft
import org.apache.spark.sql.functions._
/** Dumps formatted physical plans for headline queries (plan-quality audit). */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = new java.io.PrintStream(new java.io.FileOutputStream("/tmp/plans.txt"))
    val spark = GraftSession.builder("plans")
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("q01_agg", "q02_filter", "q03_join", "q07_topk",
        "q09_range_join", "q21_ann_top1", "q25_minhash_lsh", "q26_simhash",
        "q30_token_blocking", "q38_haversine", "q41_agent_match",
        "q67_sparql_agg", "q77_lm_score", "q78_repetition",
        "q79_decontaminate", "q80_packing", "q82_span_dedup", "q83_describe",
        "q86_top_bigrams", "q88_bm25", "q90_sparql_expr", "q92_rdfs",
        "q39_stays", "q93_graph_mgmt", "q94_pii_redact",
        "q95_url_classify", "q96_curation", "q97_nested_path",
        "q99_repetition", "q100_contamination", "q101_fuzzy_keeplist",
        "q102_audio", "q103_video", "q104_epoch_mixture",
        "q114_segment_dedup", "q115_det_shuffle", "q116_quality_classifier",
        "q117_source_cap", "q118_corpus_stats", "q119_keywords",
        "q120_asof_join", "q121_pagerank", "q122_winnow",
        "q124_salted_join", "q125_vocab", "q126_winnow_pairs",
        "q127_gap_fill", "q128_pivot", "q129_funnel", "q130_profile",
        "q131_sampled_quantile", "q132_tumbling", "q133_setsim_join",
        "q134_triangles", "q135_scd2", "q136_script_profile",
        "q137_sorted_neighborhood", "q139_cdc_merge", "q140_assoc_rules",
        "q142_mad_outliers", "q143_expectations", "q144_ivm",
        "q146_centroids", "q147_rank_windows", "q148_json_props",
        "q149_containment", "q150_nfc_keys", "q151_group_ols",
        "q152_auc", "q153_ks_drift", "q154_table_diff",
        "q174_dsir", "q175_winsorize",
        "q176_loo_encode", "q177_kmv_overlap", "q178_golden_record",
        "q179_calibration", "q180_mrr", "q181_temperature_mix",
        "q182_seasonal", "q183_k_anonymity", "q184_filtered_ann",
        "q185_zorder", "q186_cube", "q188_chi2", "q189_ngram_overlap",
        "q190_rrf", "q191_cms", "q192_hll", "q193_ewma",
        "q194_hard_negatives", "q195_grouping_sets", "q196_trailing_window",
        "q197_except_all", "q198_scc")) {
      out.println(s"===== $name =====")
      out.println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    out.close(); spark.stop()
  }
}
