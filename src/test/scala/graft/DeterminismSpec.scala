package graft

/** Cross-layout determinism: every rounded aggregate must be identical
  * under different shuffle widths (different partial-aggregation merge
  * orders). This is the property the oracle compare depends on — the
  * epsilon-nudged rounding (Fns.r4) exists precisely to make it hold,
  * including on exact half-boundary values from discrete decimal data.
  */
class DeterminismSpec extends SparkSuite {

  private val sample = Seq("q1_pricing", "q_daily_rollup", "q_grand_avg",
    "q_json_extract", "q_stats_agg", "q8_market_share", "q_percentiles",
    "q_embedding_stats", "q_window_running",
    // r9 additions: decode round-trip, regex scans, budget windows,
    // repetition ratios (avg of doubles), packing accounting, and the
    // five-stage curation chain (three keyed windows back to back)
    "q_wav_decode", "q_pii_scan", "q_token_budget", "q_token_mixture",
    "q_repetition", "q_seq_pack", "q_curate",
    // r12 additions: BM25's rounded-score ranking (float sums across
    // aggregation orders), boilerplate's grouped reassembly, the
    // sketch-guarantee booleans, and the dominance-policy summary
    "q_bm25", "q_boilerplate", "q_heavy_hitters", "q_semdedup",
    // r13 additions: exact-span counts (two stacked count aggregates),
    // the conjunctive ranking (same rounded scores + the term-count
    // gate) — q_semdedup above now runs the perturbed-view summary,
    // whose sorted dropped_ids csv is the layout-sensitive part
    "q_bm25_phrase", "q_bm25_and",
    // int8 tier: the quantized-shortlist TopK aggregator merges in
    // layout-dependent order; the final exact re-rank must not care
    "q_ann_int8",
    // hybrid fusion: two leg windows + the fused-sum groupBy
    "q_hybrid_rrf",
    // NB filter: per-doc double sums + the exact-percentile gate
    "q_quality_nb",
    // perplexity filter: per-doc nll sums + two interpolated-percentile
    // bucket edges; BPE: the argmax tie-break must not see partial-agg
    // merge order; random projection: fixed-order fold (narrow, but the
    // 4 dp contract is what the oracle hashes)
    "q_perplexity", "q_bpe_merges", "q_rand_proj",
    // funnel: set-min steps must not see join/agg merge order
    "q_funnel",
    // fourth-wave r13: the bloom reduction (bitwise-OR merge is
    // commutative; the exact join must erase any fpp difference), the
    // LOCF fill (rounded baseline propagated across the grid), the
    // CDC merge (LWW window + presence flags), the rolling-baseline
    // flag (compares against the EMITTED rounded columns), the basket
    // pair counts, the in-block argmin, and the integer-PageRank
    // fixpoint (exact by construction — this pins it)
    "q_bloom_join", "q_gap_fill", "q_cdc_apply", "q_anomaly",
    "q_copurchase", "q_fuzzy_match", "q_pagerank",
    // fifth-wave r13: the binned join's per-purchase aggregate (exact
    // ns integers — any drift is a binning bug, not rounding), DSIR's
    // per-doc double means + interpolated p80 gate, and the wedge
    // count (exact longs; pins that each triangle is found ONCE
    // regardless of which partition enumerates its wedge)
    "q_range_join", "q_dsir", "q_triangles",
    // k-hop BFS: frontier/anti-join rounds must settle the same
    // distances no matter which partition discovers a node first
    "q_khop",
    // Bellman-Ford: the per-round min-aggregate must not see partial
    // merge order (exact longs make any drift a relaxation bug)
    "q_cheapest_path",
    // label propagation: fixpoint labels AND the scalar convergence
    // probe must agree across layouts (monotone sum is order-free)
    "q_components",
    // winsorize: the rounded quantile thresholds and the clip counts
    // they gate must not see partial-aggregation merge order
    "q_winsorize",
    // drift: per-source sums of tiny p·ln(p/q) terms across the
    // vocab grid — the classic order-sensitive float sum, 4 dp pinned
    "q_source_drift",
    // skew profile: two stacked count aggregates per key — exact
    // longs plus interpolated p99 through the rounding contract
    "q_skew_profile",
    // RANGE frame: decimal accumulation inside the frame — emitted
    // doubles must be bit-identical with no rounding step at all
    "q_window_range",
    // two-stage skyline: the bucketed local prune must be invariant
    // to how rows land in partitions
    "q_skyline",
    // exact-integer sketches: counters/signs are layout-free sums
    "q_cms",
    "q_join_size_ams",
    // prefix-filtered containment: df ranking and candidate set must
    // not depend on partitioning
    "q_containment",
    // grid statistic: empty-cell construction and the (O−E)²/E sum
    // must survive any layout through the 4 dp contract
    "q_chi2",
    // conditional-count rules are plain sums; zero rows must persist
    "q_validate",
    // per-group sketch: emitted rows carry only exact counts and
    // guarantee booleans, both layout-free by the merge proof
    "q_heavy_hitters_grouped",
    // label-anti-filtered top-k: window ties broken by vec_id
    "q_hard_negatives",
    // data-derived split day + slot means through the 4 dp contract
    "q_forecast",
    // multi-distinct equalities are exact longs under any layout
    "q_key_discovery",
    // pow-derived shares through the 4 dp contract
    "q_temperature_mix",
    // rounded decile bounds then exact conditional counts
    "q_histogram",
    // ln-ratio scores ranked ROUNDED — the cross-engine ulp guard
    "q_collocations",
    // replicate-then-group sliding windows: rounded avgs per window
    "q_sliding",
    // variant binary path: typed extraction + rounded group avgs
    "q_variant",
    // decontamination wave: the per-probe argmax (max(struct) partial
    // merges must settle the same (sim, id) under any layout), the
    // gate's array_max projection (narrow, but the 4 dp contract is
    // what the oracle hashes), and the nDCG metric (membership-join
    // hit sums through the shared-IDCG division)
    "q_semantic_decontam", "q_semantic_gate", "q_retrieval_ndcg",
    // centroid scrub: rounded per-dim avgs, then an interpolated
    // percentile over the rounded distances — both through the 4 dp
    // contract under any partial-merge order
    "q_embedding_outliers")

  test("rounded aggregates are identical across shuffle widths") {
    // the graph sample rows (q_pagerank etc.) read prepare's persisted
    // edge lists at THIS spec's sf0.01 scale — build them here rather
    // than inheriting whatever a previous Verify run left in the JVM
    // temp dir (a fresh machine has nothing there and the suite must
    // be hermetic). Only the edge lists: no sampled query reads the
    // other prepare artifacts, and the full sf0.01 prepare costs
    // minutes of suite time
    graft.operators.Graph.prepareEdges(spark, sf("sf0.01"),
      s"${graft.registry.TextQueries.indexRoot(sf("sf0.01"))}/edges")
    val original = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(parts: String): Map[String, Seq[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      sample.map { name =>
        name -> SparkEntry.queries(name)(spark, sf("sf0.01"))
          .collect().map(_.toString).sorted.toSeq
      }.toMap
    }
    try {
      val wide = runAll("32")
      val narrow = runAll("3")
      sample.foreach { name =>
        assert(wide(name) === narrow(name), s"drift in $name")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", original)
    }
  }
}
