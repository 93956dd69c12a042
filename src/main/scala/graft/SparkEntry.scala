package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Oracles, PipelineQueries, RelationalQueries => R}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2:
  * oracle-checkable relational demonstrations over the testdata tables
  * (paired DuckDB SQL in `oracleSql`) plus extraction-pipeline queries over
  * the deterministic fixture corpus (rows-only; their correctness gate is
  * the golden suite run by `sbt -batch test`).
  */
object SparkEntry {

  /** Flagship: full extraction pipeline over the fixture corpus — the
    * north-rule job in miniature (decode → tokenize → classify → assemble).
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.qExtract(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 window statistics (integral-image analogue)
    "q_window_stats" -> (R.qWindowStats _),
    // §2.3 threshold classifier family
    "q_sauvola" -> (R.qSauvola _),
    "q_niblack" -> (R.qNiblack _),
    "q_nick" -> (R.qNick _),
    "q_wolfjolion" -> (R.qWolfJolion _),
    "q_feng" -> (R.qFeng _),
    "q_meanc" -> (R.qMeanAdaptive _),
    "q_gaussadaptive" -> (R.qGaussAdaptive _),
    "q_medianmean" -> (R.qMedianMean _),
    "q_mokji" -> (R.qMokji _),
    "q_otsu" -> (R.qOtsu _),
    // §2.3 post-pass morphology / §2.5 denoise
    "q_median_smooth" -> (R.qMedianSmooth _),
    "q_dilate_erode" -> (R.qDilateErode _),
    // §2.5 artifact removal
    "q_remove_margins" -> (R.qRemoveMargins _),
    "q_remove_repeats" -> (R.qRemoveRepeats _),
    "q_tiny_isolated" -> (R.qTinyIsolated _),
    // §2.1 photometric normalization
    "q_gamma_lut" -> (R.qGammaLut _),
    "q_white_balance" -> (R.qWhiteBalance _),
    "q_gray_world" -> (R.qGrayWorld _),
    "q_scale_range" -> (R.qScaleRange _),
    "q_equalize_hist" -> (R.qEqualizeHist _),
    "q_hist" -> (R.qHistogram _),
    // §2.1/§2.6 canonicalization
    "q_canon" -> (R.qCanon _),
    // §2.7 detectors
    "q_quality_scores" -> (R.qQualityScores _),
    "q_lang_gate" -> (R.qLangGate _),
    // §2.9 joins / aggregation / top-k
    "q_golden_join" -> (R.qGoldenJoin _),
    "q_anti_join" -> (R.qAntiJoin _),
    "q_semi_join" -> (R.qSemiJoin _),
    "q_lineage_agg" -> (R.qLineageAgg _),
    "q_topk" -> (R.qTopK _),
    "q_distinct_sources" -> (R.qDistinctSources _),
    // training-pipeline: dedup
    "q_dedup_exact" -> (R.qDedupExact _),
    "q_minhash" -> (R.qMinHash _),
    "q_ngram_jaccard" -> (R.qNgramJaccard _),
    // training-pipeline: similarity / ANN
    "q_embed_norm" -> (R.qEmbedNorm _),
    "q_ann_topk" -> (R.qAnnTopK _),
    "q_lsh_bucket" -> (R.qLshBucket _),
    // events / time windows
    "q_event_windows" -> (R.qEventWindows _),
    "q_sessionize" -> (R.qSessionize _),
    // §2.5/§2.2 smoothing & variance map
    "q_kuwahara" -> (R.qKuwahara _),
    "q_kuwahara_aniso" -> (R.qKuwaharaAniso _),
    "q_sharpen" -> (R.qSharpen _),
    "q_variance_map" -> (R.qVarianceMap _),
    // §2.6 skeleton profile + fingerprinting
    "q_skeleton" -> (R.qSkeleton _),
    // native Catalyst expression (codegen) + library-API ops
    "q_canon_expr" -> (R.qCanonExpr _),
    "q_lang_id" -> (R.qLangId _),
    "q_dedup_api" -> (R.qDedupApi _),
    "q_lsh_pairs" -> (R.qLshPairs _),
    "q_ann_bucketed" -> (R.qAnnBucketed _),
    "q_embed_neardup" -> (R.qEmbedNearDup _),
    "q_ivf_topk" -> (R.qIvfTopK _),
    "q_simhash" -> (R.qSimHash _),
    "q_angle" -> (R.qAngle _),
    "q_rotate" -> (R.qRotate _),
    "q_color_balance" -> (R.qColorBalance _),
    "q_salted_distinct" -> (R.qSaltedDistinct _),
    "q_fingerprint" -> (R.qFingerprint _),
    // cross-doc site-template removal (cleanBackgroundToWhite analogue)
    "q_template_chrome" -> (R.qTemplateChrome _),
    "q_template_strip" -> (R.qTemplateStrip _),
    // extraction pipeline (hash-shaped; oracles are frozen golden parquet
    // tables under /root/repo/golden, see PipelineQueries.goldenOracles)
    "q_extract" -> (PipelineQueries.qExtract _),
    "q_decode_charsets" -> (PipelineQueries.qDecodeCharsets _),
    "q_quarantine" -> (PipelineQueries.qQuarantine _),
    "q_blocks" -> (PipelineQueries.qBlocks _),
    "q_boundary" -> (PipelineQueries.qBoundary _),
    "q_resume_antijoin" -> (PipelineQueries.qResumeAntiJoin _),
    "q_multimodal" -> (PipelineQueries.qMultimodal _),
    // REAL codec paths (JDK ImageIO / WAV PCM): decode verified end-to-end
    // against independent SQL arithmetic
    "q_multimodal_pixels" -> (PipelineQueries.qMultimodalPixels _),
    "q_multimodal_audio" -> (PipelineQueries.qMultimodalAudio _),
    "q_multimodal_video" -> (PipelineQueries.qMultimodalVideo _),
    "q_multimodal_mjpeg" -> (PipelineQueries.qMultimodalMjpeg _),
    "q_extract_fbsect" -> (PipelineQueries.qExtractFbsect _),
    "q_extract_cocoedge" -> (PipelineQueries.qExtractCocoedge _),
    "q_extract_nibhi" -> (PipelineQueries.qExtractRuleCorpus("nibhi") _),
    "q_extract_nickdim" -> (PipelineQueries.qExtractRuleCorpus("nickdim") _),
    "q_extract_wolfglob" -> (PipelineQueries.qExtractRuleCorpus("wolfglob") _),
    "q_extract_fengpoly" -> (PipelineQueries.qExtractRuleCorpus("fengpoly") _),
    "q_extract_kuwedge" -> (PipelineQueries.qExtractRuleCorpus("kuwedge") _),
    "q_extract_colflow" -> (PipelineQueries.qExtractColflow _),
    "q_extract_meanc" -> (PipelineQueries.qExtractRuleCorpus("meanc") _),
    "q_extract_otsubi" -> (PipelineQueries.qExtractRuleCorpus("otsubi") _),
    "q_extract_mokedge" -> (PipelineQueries.qExtractRuleCorpus("mokedge") _),
    "q_extract_gausstail" -> (PipelineQueries.qExtractRuleCorpus("gausstail") _),
    "q_extract_gausstail_g" -> (PipelineQueries.qExtractGausstailG _),
    "q_extract_medspike" -> (PipelineQueries.qExtractRuleCorpus("medspike") _),
    // §2.4 alternative boundary + §2.4 orientation gate + adversarial corpus
    "q_extract_houghsep" -> (PipelineQueries.qExtractHoughSep _),
    "q_extract_clahe" -> (PipelineQueries.qExtractClahe _),
    "q_extract_overwrap" -> (PipelineQueries.qExtractOverwrap _),
    "q_extract_profiled" -> (PipelineQueries.qExtractProfiled _),
    "q_orientation" -> (PipelineQueries.qOrientation _),
    "q_extract_adversarial" -> (PipelineQueries.qExtractAdversarial _)
  ) ++ PipelineQueries.variantKinds.map { kind =>
    s"q_extract_$kind" -> (PipelineQueries.classifierVariant(kind) _)
  }.toMap

  /** DuckDB-runnable oracle SQL: relational oracles over the sf tables plus
    * frozen-golden-table oracles for the pipeline queries.
    */
  def oracleSql: Map[String, String] =
    Oracles.all ++ PipelineQueries.goldenOracles()
}
