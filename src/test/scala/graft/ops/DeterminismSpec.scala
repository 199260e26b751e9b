package graft.ops

import graft.SparkSpec

/** The sampling/shuffle/scoring operators advertise "a pure function
  * of the data — reproducible across partitionings": rerun each under
  * a different shuffle-partition count and require bit-identical rows.
  */
class DeterminismSpec extends SparkSpec {

  private val names = Seq(
    "q55_stratified_sample",
    "q56_weighted_sample",
    "q58_corpus_shuffle",
    "q59_mixture_epochs",
    "sim11_quantized_topk",
    // round-5 additions: decimal-exact moments, integer week/prefix
    // arithmetic, and vote/stage machines all claim order-independence
    "q63_regression",
    "q65_retention",
    "q68_transitions",
    "text17_pack_spans",
    "sim14_label_knn",
    "sim15_diversity",
    "stream09_funnel",
    // round-5: hash-sample sketch, selection-based mining/dedup
    // verdicts, and integer-bits LM scores are all pure functions of
    // the data
    "q69_hash_median",
    "sim16_semdedup",
    "sim17_hardneg",
    "text19_lm_score",
    "text20_bm25",
    "q71_mad_outliers",
    "text21_divergence",
    "stream10_exact_dedup",
    // round-6: integer-exact k-means assignment, hashed-bucket DSIR
    // bits, and the anti-join OOV cut are pure functions of the data
    "sim18_kmeans",
    "text22_dsir",
    "text23_oov",
    "q74_median_cont",
    "text24_zipf",
    "q75_stddev_outliers",
    "dedup19_clustering_coeff",
    "dedup20_kcore",
    // round-7: salted-join rewrite, gap sessionization, positional
    // substring spans, first-holder novelty, integer PQ/ADC ranking,
    // and the corpus report are all pure functions of the data
    "q76_salted_join",
    "q77_sessionize",
    "dedup21_substring_spans",
    "text25_novelty",
    "pipe04_corpus_report",
    "sim19_pq_adc",
    "dedup22_pagerank",
    "q78_rolling_active",
    "dedup23_lsh_curve",
    "sim20_ivf_pq",
    "dedup24_simhash64",
    "stream11_window_topk",
    "sim21_residual_pq",
    "text26_gopher_rules",
    "text27_ccnet_buckets",
    "text28_quality_classifier",
    "q79_hll_distinct",
    // round-8: bottom-k sketches are pure set functions; the dHash
    // sketch and the UDTF aggregate are map-side-deterministic
    "dedup25_kmv_overlap",
    "mm05_media_phash",
    "q80_udtf_shingles",
    "q81_asof_nearest",
    "stream12_late_quarantine",
    "dedup26_khop_recursive",
    "q82_interval_overlap",
    "cdc13_join_maintain",
    "q83_interpolate",
    "text29_water_fill",
    "q84_neyman_sample",
    // round-9: hash-keyed masking/spans, sorted-fold normalizer,
    // count histograms, and the cluster-keyed split/delete verdicts
    // are all pure functions of the data
    "text32_length_buckets",
    "text33_mlm_mask",
    "text34_temperature_mix",
    "text35_fim_transform",
    "q95_join_key_profile",
    "q96_segment_overlap",
    "dedup32_cluster_split",
    "dedup33_delete_propagation"
  )

  test("partitioning never changes the result rows") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      val a = q(spark, sfDir).collect().map(_.toString).sorted.toSeq
      try {
        conf.set("spark.sql.shuffle.partitions", "7")
        val b = q(spark, sfDir).collect().map(_.toString).sorted.toSeq
        assert(a === b, s"$n diverged across partitionings")
        assert(a.nonEmpty, s"$n returned nothing")
      } finally conf.set("spark.sql.shuffle.partitions", orig)
    }
  }
}
