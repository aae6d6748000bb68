package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Tables => T}
import graft.QUtil._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.Operators

/** LLM-training-data pipeline operators (SURVEY.md §2 d/s/t/m/e
  * families): deduplication, similarity search, text analysis,
  * multimodal plumbing, and batch-equivalents of the streaming jobs.
  * Everything is built from codegen'd column expressions — no UDFs —
  * so the same plan scales from sf0.001 to a 1000-executor sweep.
  *
  * Queries whose semantics aren't ANSI-SQL-expressible (MinHash/SimHash
  * banding, hyperplane LSH) have no oracle entry → driver records a
  * rows-only check, as allowed by the contract.
  */
object Pipeline extends PipelineStreamBatch {

  val queries: Map[String, Q] = Map(
    "d01_dedup_exact" -> d01, "d02_dedup_fingerprint" -> d02,
    "d03_dedup_ngram_jaccard" -> d03, "d04_dedup_minhash" -> d04,
    "d05_dedup_simhash" -> d05, "d06_dedup_embedding" -> d06,
    "d07_dedup_embedding_ivf" -> d07, "d08_dedup_winnow_jaccard" -> d08,
    "d09_decontaminate" -> d09, "d10_dedup_clusters" -> d10,
    "d11_dedup_lines" -> d11, "d12_dedup_substring" -> d12,
    "d13_dedup_keeper_quality" -> d13, "d14_dedup_keeper_banded" -> d14,
    "d15_dedup_semantic" -> d15, "d16_decontaminate_semantic" -> d16,
    "d17_decontaminate_ivf" -> d17,
    "p08_release_diff" -> p08,
    "p10_pack_learned" -> p10, "p11_budget_waterfill" -> p11,
    "p12_leakage_safe_split" -> p12, "p13_pack_bpe" -> p13,
    "p14_epoch_schedule" -> p14, "p15_pretrain_build" -> p15,
    "p16_pretrain_build_semantic" -> p16,
    "p17_pretrain_build_multimodal" -> p17,
    "t13_vocab_coverage" -> t13,
    "t14_dedup_impact" -> t14, "t15_lm_quality_partition" -> t15,
    "t16_ngram_novelty" -> t16, "t17_learned_tokenizer" -> t17,
    "t18_tfidf_hashed" -> t18, "t19_intra_doc_dedup" -> t19,
    "t20_bpe_train" -> t20, "t21_readability" -> t21,
    "t22_vocab_growth" -> t22, "t23_bpe_apply" -> t23,
    "t24_zipf_fit" -> t24, "t25_gzip_ingest" -> t25,
    "t26_jsonl_gzip_ingest" -> t26, "t27_gzip_multimember" -> t27,
    "t28_warc_ingest" -> t28, "t29_html_extract" -> t29,
    "t30_zstd_ingest" -> t30, "t31_brotli_ingest" -> t31,
    "t32_link_extract" -> t32, "t33_charset_report" -> t33,
    "t35_host_link_graph" -> t35, "t36_quality_model_gate" -> t36,
    "t37_zip_ingest" -> t37,
    "s01_ann_bruteforce" -> s01, "s02_ann_lsh" -> s02, "s03_ann_ivf" -> s03,
    "s04_ann_pq" -> s04, "s05_ann_ivfpq" -> s05, "s06_ann_range_search" -> s06,
    "s07_ann_range_ivf" -> s07, "s08_ann_topk_ivf" -> s08,
    "s09_ann_mips" -> s09, "s10_ann_filtered" -> s10,
    "s11_ann_recall_report" -> s11, "s12_ann_delta_append" -> s12,
    "s13_ann_tombstone_delete" -> s13, "s14_ann_sq8" -> s14,
    "s15_knn_classify" -> s15, "s16_ann_graph" -> s16,
    "s17_ann_pq_delta" -> s17, "s18_ann_pq_tombstone" -> s18,
    "s19_ann_ivfpq_residual" -> s19, "s20_ann_beam" -> s20,
    "s21_ann_graph_delta" -> s21, "s22_ann_graph_tombstone" -> s22,
    "s23_ann_edge_recall" -> s23, "s24_ann_beam_ivf_entry" -> s24,
    "s25_ann_graph_geometry_grid" -> s25, "s26_ann_beam_pq_rerank" -> s26,
    "p06_dataset_card" -> p06, "p07_token_budget_sample" -> p07,
    "t01_langid" -> t01, "t02_quality_score" -> t02,
    "t03_token_count" -> t03, "t04_ngram_stats" -> t04, "t05_group_stats" -> t05,
    "t06_fingerprint" -> t06, "t07_stratified_sample" -> t07,
    "t08_repetition" -> t08, "t09_ngram_lm" -> t09,
    "t10_heavy_hitters" -> t10, "t11_pii_redact" -> t11,
    "t12_chunking" -> t12,
    "p01_curate_corpus" -> p01, "p02_pack_sequences" -> p02,
    "p03_temperature_mix" -> p03, "p04_train_order" -> p04,
    "p05_multimodal_dedup" -> p05, "p05b_multimodal_dedup_cells" -> p05b,
    "m01_binary_meta" -> m01, "m02_multimodal_features" -> m02,
    "m03_frame_sample" -> m03, "m04_multimodal_packing" -> m04,
    "m06_video_meta" -> m06, "m07_video_frame_sample" -> m07,
    "m05_audio_meta" -> m05, "m08_pixel_decode" -> m08,
    "m09_audio_samples" -> m09, "m10_png_decode" -> m10,
    "m12_jpeg_decode" -> m12, "m13_jpeg_color" -> m13,
    "m14_jpeg_420" -> m14, "m15_jpeg_restart" -> m15,
    "m16_png_palette" -> m16, "m17_png_channels" -> m17,
    "m18_jpeg_progressive" -> m18, "m19_gif_decode" -> m19,
    "p09_shard_manifest" -> p09,
    "e01_stream_tumbling" -> e01, "e02_stream_dedupe" -> e02,
    "e03_stream_join" -> e03, "e04_stream_curation" -> e04,
    "e10_stream_token_volume" -> e10, "e11_stream_media_intake" -> e11,
    "e14_stream_audio_qc" -> e14, "e15_stream_gzip_intake" -> e15,
    "e16_stream_jsonl_intake" -> e16,
    "e12_stream_drift" -> e12, "e13_stream_scd2_enrich" -> e13,
    "e17_stream_warc_intake" -> e17, "e18_stream_zstd_intake" -> e18,
    "e19_stream_brotli_intake" -> e19, "e20_stream_wet_intake" -> e20,
    "t34_wet_ingest" -> t34,
    "e05_stream_neardup" -> e05, "e06_stream_olap_migrate" -> e06,
    "e07_stream_sessionize" -> e07, "e08_stream_heavy_hitters" -> e08,
    "e09_stream_latency_monitor" -> e09)


  /** Every query replays in DuckDB — the last rows-only family
    * (KMeans-dependent d07/s03/s04/s05) graduated in round 5 via the
    * integer-quantized replayable Lloyd fit (IntLloyd). */
  val oracle: Map[String, String] = Map(
    "d01_dedup_exact" -> d01Sql, "d02_dedup_fingerprint" -> d02Sql,
    "d03_dedup_ngram_jaccard" -> d03Sql, "d04_dedup_minhash" -> d04Sql,
    "d05_dedup_simhash" -> d05Sql, "d06_dedup_embedding" -> d06Sql,
    "d07_dedup_embedding_ivf" -> d07Sql,
    "d08_dedup_winnow_jaccard" -> d08Sql, "d09_decontaminate" -> d09Sql,
    "d10_dedup_clusters" -> d10Sql,
    "d11_dedup_lines" -> d11Sql, "d12_dedup_substring" -> d12Sql,
    "d13_dedup_keeper_quality" -> d13Sql, "d14_dedup_keeper_banded" -> d14Sql,
    "d15_dedup_semantic" -> d15Sql, "d16_decontaminate_semantic" -> d16Sql,
    // d17 shares d16's oracle VERBATIM: hash equality certifies the
    // admission-pruned plan computes identical semantics
    "d17_decontaminate_ivf" -> d16Sql,
    "p08_release_diff" -> p08Sql, "p11_budget_waterfill" -> p11Sql,
    "p12_leakage_safe_split" -> p12Sql, "p13_pack_bpe" -> p13Sql,
    "p14_epoch_schedule" -> p14Sql, "p15_pretrain_build" -> p15Sql,
    "p16_pretrain_build_semantic" -> p16Sql,
    "p17_pretrain_build_multimodal" -> p17Sql,
    "t13_vocab_coverage" -> t13Sql,
    "s06_ann_range_search" -> s06Sql, "s07_ann_range_ivf" -> s07Sql,
    "s08_ann_topk_ivf" -> s08Sql, "s09_ann_mips" -> s09Sql,
    "s10_ann_filtered" -> s10Sql, "s11_ann_recall_report" -> s11Sql,
    "s12_ann_delta_append" -> s12Sql, "s13_ann_tombstone_delete" -> s13Sql,
    "s14_ann_sq8" -> s14Sql, "s15_knn_classify" -> s15Sql,
    "s16_ann_graph" -> s16Sql,
    "s17_ann_pq_delta" -> s17Sql, "s18_ann_pq_tombstone" -> s18Sql,
    "s19_ann_ivfpq_residual" -> s19Sql, "s20_ann_beam" -> s20Sql,
    "s21_ann_graph_delta" -> s21Sql, "s22_ann_graph_tombstone" -> s22Sql,
    "s23_ann_edge_recall" -> s23Sql, "s24_ann_beam_ivf_entry" -> s24Sql,
    "s25_ann_graph_geometry_grid" -> s25Sql, "s26_ann_beam_pq_rerank" -> s26Sql,
    "p06_dataset_card" -> p06Sql, "p07_token_budget_sample" -> p07Sql,
    "t14_dedup_impact" -> t14Sql, "t15_lm_quality_partition" -> t15Sql,
    "t16_ngram_novelty" -> t16Sql, "t17_learned_tokenizer" -> t17Sql,
    "t18_tfidf_hashed" -> t18Sql, "t19_intra_doc_dedup" -> t19Sql,
    "t20_bpe_train" -> t20Sql, "t21_readability" -> t21Sql,
    "t22_vocab_growth" -> t22Sql, "t23_bpe_apply" -> t23Sql,
    "t24_zipf_fit" -> t24Sql, "t25_gzip_ingest" -> t25Sql,
    "t26_jsonl_gzip_ingest" -> t26Sql, "t27_gzip_multimember" -> t27Sql,
    "t28_warc_ingest" -> t28Sql, "t29_html_extract" -> t29Sql,
    "t30_zstd_ingest" -> t30Sql, "t31_brotli_ingest" -> t31Sql,
    "t32_link_extract" -> t32Sql, "t33_charset_report" -> t33Sql,
    "t35_host_link_graph" -> t35Sql, "t36_quality_model_gate" -> t36Sql,
    "t37_zip_ingest" -> t37Sql,
    "p10_pack_learned" -> p10Sql,
    "s01_ann_bruteforce" -> s01Sql, "s02_ann_lsh" -> s02Sql,
    "s03_ann_ivf" -> s03Sql, "s04_ann_pq" -> s04Sql, "s05_ann_ivfpq" -> s05Sql,
    "t01_langid" -> t01Sql, "t02_quality_score" -> t02Sql,
    "t03_token_count" -> t03Sql, "t04_ngram_stats" -> t04Sql,
    "t05_group_stats" -> t05Sql, "t06_fingerprint" -> t06Sql,
    "t07_stratified_sample" -> t07Sql, "t08_repetition" -> t08Sql,
    "t09_ngram_lm" -> t09Sql, "t10_heavy_hitters" -> t10Sql,
    "t11_pii_redact" -> t11Sql, "t12_chunking" -> t12Sql,
    "p01_curate_corpus" -> p01Sql, "p02_pack_sequences" -> p02Sql,
    "p03_temperature_mix" -> p03Sql, "p04_train_order" -> p04Sql,
    "p05_multimodal_dedup" -> p05Sql, "p05b_multimodal_dedup_cells" -> p05bSql,
    "m01_binary_meta" -> m01Sql, "m02_multimodal_features" -> m02Sql,
    "m03_frame_sample" -> m03Sql, "m04_multimodal_packing" -> m04Sql,
    "m06_video_meta" -> m06Sql, "m07_video_frame_sample" -> m07Sql,
    "m05_audio_meta" -> m05Sql, "m08_pixel_decode" -> m08Sql,
    "m09_audio_samples" -> m09Sql, "m10_png_decode" -> m10Sql,
    "m12_jpeg_decode" -> m12Sql, "m13_jpeg_color" -> m13Sql,
    "m14_jpeg_420" -> m14Sql,
    // m15 shares m14's oracle VERBATIM: restart markers are pure framing,
    // so hash equality proves the restarted decode is pixel-identical
    "m15_jpeg_restart" -> m14Sql,
    "m16_png_palette" -> m16Sql, "m17_png_channels" -> m17Sql,
    "m18_jpeg_progressive" -> m18Sql, "m19_gif_decode" -> m19Sql,
    "p09_shard_manifest" -> p09Sql,
    "e01_stream_tumbling" -> e01Sql, "e02_stream_dedupe" -> e02Sql,
    "e03_stream_join" -> e03Sql, "e04_stream_curation" -> e04Sql,
    "e10_stream_token_volume" -> e10Sql, "e11_stream_media_intake" -> e11Sql,
    "e14_stream_audio_qc" -> e14Sql, "e15_stream_gzip_intake" -> e15Sql,
    "e16_stream_jsonl_intake" -> e16Sql,
    "e17_stream_warc_intake" -> e17Sql, "e18_stream_zstd_intake" -> e18Sql,
    "e19_stream_brotli_intake" -> e19Sql, "e20_stream_wet_intake" -> e20Sql,
    "t34_wet_ingest" -> t34Sql,
    "e12_stream_drift" -> e12Sql, "e13_stream_scd2_enrich" -> e13Sql,
    "e05_stream_neardup" -> e05Sql, "e06_stream_olap_migrate" -> e06Sql,
    "e07_stream_sessionize" -> e07Sql, "e08_stream_heavy_hitters" -> e08Sql,
    "e09_stream_latency_monitor" -> e09Sql)
}
