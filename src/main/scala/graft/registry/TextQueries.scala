package graft.registry

import graft.operators.{BinaryQuant, Bpe, Classify, Curate, Dedup,
  Hybrid, Multimodal, Perplexity, Reduce, Sampling, ScalarQuant, Scrub,
  Search, Shard, Similarity, Substring, TextOps, Video}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registry for the text / dedup / similarity families.
  * Hash-VALUED operators (simhash, fingerprints, LSH/IVF rankings,
  * lang-id profiles) have engine-specific values, so a cross-engine
  * recomputation is impossible — but each is still deterministic, so
  * each carries either a GOLDEN oracle (values pinned at the driver's
  * verify scale: simhash pairs, LSH + IVF rankings, confusion matrix,
  * cluster sample) or an oracle-backed companion; since r14 no row is
  * rows-only — q_fingerprint registers the class-anchored per-doc
  * form (classes are text-recomputable even though hashes aren't) and
  * q_lang_id carries a full SQL fit+score recompute.
  *
  * The near-dup PAIR operators do get full oracles even though their
  * candidate generation is hash-based: the emitted (pair, metric) rows
  * are pure data facts — DuckDB recomputes the exhaustive shingle
  * Jaccard / cosine sets over the same parquet and the driver
  * hash-compares. This also pins LSH recall at 1.0 on the driver data
  * (verified: 25/25 minhash pairs at sf0.01); a recall regression now
  * fails correctness instead of hiding in a rows-only check.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tokens" -> (TextOps.tokenCounts _),
    "q_boilerplate" -> ((s: SparkSession, d: String) =>
      TextOps.boilerplate(s, d)),
    "q_head_tokens" -> (TextOps.headTokenCounts _),
    "q_text_stats" -> (TextOps.textStats _),
    "q_lang_stats" -> (TextOps.langSourceStats _),
    // per-source KL/TVD drift vs the corpus distribution over the
    // (V+1)-slot Lidstone space — closed-form, fully oracle-able
    "q_source_drift" -> ((s: SparkSession, d: String) =>
      TextOps.sourceDrift(s, d)),
    // per-doc class-anchored form: raw xxhash64/simhash values are
    // engine-specific, but the equivalence classes they induce are
    // recomputable from the normalized text — full per-doc oracle
    "q_fingerprint" -> (TextOps.fingerprintMembers _),
    "q_fingerprint_classes" -> (TextOps.fingerprintClasses _),
    "q_lang_id" -> (TextOps.langId _),
    "q_lang_id_confusion" -> (TextOps.langIdConfusion _),
    // learned quality filter: in-engine Bernoulli-NB scoring against
    // the reference slice + a median-quantile keep gate — closed-form,
    // so training AND inference carry one full cross-engine oracle
    "q_quality_nb" -> ((s: SparkSession, d: String) =>
      Classify.nbQuality(s, d)),
    // DSIR importance resampling: generative bigram-LM ratio weights
    // (target vs raw crawl) + deterministic top-20% gate — closed-form
    // Lidstone estimates, so weighting AND selection carry one full
    // cross-engine oracle
    "q_dsir" -> ((s: SparkSession, d: String) =>
      Classify.dsirWeights(s, d)),
    // the composed production keep decision: heuristic + NB +
    // perplexity majority vote — every leg closed-form, so the
    // ensemble carries one full oracle
    "q_quality_ensemble" -> ((s: SparkSession, d: String) =>
      Classify.qualityEnsemble(s, d)),
    // CCNet-style perplexity filter: bigram LM trained on the curated
    // slice, per-doc ppl, head/middle/tail tertiles — closed-form
    // Lidstone smoothing, so train+score+bucket carries one full
    // cross-engine oracle
    "q_perplexity" -> ((s: SparkSession, d: String) =>
      Perplexity.perplexityFilter(s, d)),
    // serves the persisted GROWN count model (80% base + 20% batch):
    // counts are additive, so this answers the same full oracle as the
    // inline train — no frozen-model caveat
    "q_perplexity_served" -> ((s: SparkSession, d: String) =>
      Perplexity.scoreWithModel(s, d, s"${indexRoot(d)}/ppl_model")),
    // LM-count fsck: the GROWN model's folded bigram counts bucketed
    // by integer binary length, answered by a pure corpus recompute —
    // a replayed or lost batch fails the hash
    "q_ppl_model_stats" -> ((s: SparkSession, d: String) =>
      Perplexity.modelStats(s, s"${indexRoot(d)}/ppl_model")),
    // erasure through the TRAINED LM (r17): a right-to-be-forgotten
    // request must remove not just the documents but their counts in
    // the standing model — additive counts subtract exactly, so the
    // tombstoned model scores/buckets the survivors as a from-scratch
    // survivors-only train would (one spliced full oracle); the stats
    // twin fscks the subtracted counts themselves, and the compacted
    // row pins the fold-in
    "q_perplexity_deleted_served" -> ((s: SparkSession, d: String) =>
      Perplexity.scoreWithModel(s, d, s"${indexRoot(d)}/ppl_deleted",
        docFilter = Some(org.apache.spark.sql.functions
          .col("doc_id") % 7 =!= 6))),
    "q_perplexity_del_compacted_served" -> ((s: SparkSession, d: String) =>
      Perplexity.scoreWithModel(s, d,
        s"${indexRoot(d)}/ppl_del_compacted",
        docFilter = Some(org.apache.spark.sql.functions
          .col("doc_id") % 7 =!= 6))),
    "q_ppl_model_stats_deleted" -> ((s: SparkSession, d: String) =>
      Perplexity.modelStats(s, s"${indexRoot(d)}/ppl_deleted")),
    // JL sign random projection: closed-form hash-seeded matrix, zero
    // shuffles — fully oracle-recomputable
    "q_rand_proj" -> ((s: SparkSession, d: String) =>
      Reduce.randomProjection(s, d)),
    // PCA whitening family: the covariance matrix is one narrow pass
    // with a fixed-size typed aggregate (full oracle); the Jacobi
    // eigen-fit is a bounded driver-side model fit (d² doubles) —
    // explained variance golden-pinned, and the whitened-projection
    // covariance must equal the k×k IDENTITY at 4 dp, which makes its
    // oracle data-independent (regen-proof)
    "q_embedding_gram" -> ((s: SparkSession, d: String) =>
      Reduce.gram(s, d)),
    "q_pca_evr" -> ((s: SparkSession, d: String) =>
      Reduce.pcaExplainedVariance(s, d)),
    "q_pca_whiten" -> ((s: SparkSession, d: String) =>
      Reduce.pcaWhitenCheck(s, d)),
    // distributed BPE trainer: iteration-0 weighted pair counts carry
    // the full cross-engine oracle; the merge table and encode stats
    // are deterministic loop outputs, golden-pinned (re-pin:
    // `runMain graft.GoldenDump q_bpe_merges` after a testdata regen)
    "q_bpe_pair_counts" -> ((s: SparkSession, d: String) =>
      Bpe.initialPairCounts(s, d)),
    "q_bpe_merges" -> ((s: SparkSession, d: String) =>
      Bpe.merges(s, d)),
    "q_bpe_encode_stats" -> ((s: SparkSession, d: String) =>
      Bpe.encodeStats(s, d)),
    // the frozen-tokenizer serve: encode under the PERSISTED merge
    // table (prepare hook trains it once) — replay-in-rank-order folds,
    // OOV-capable; with apply == train corpus it equals the inline row
    "q_bpe_encode_served" -> ((s: SparkSession, d: String) =>
      Bpe.encodeStatsFromModel(s, d, s"${indexRoot(d)}/bpe_model")),
    // tokenizer fertility per (lang, source) — tokens-per-word /
    // chars-per-token, the table that decides mixture token budgets;
    // FULL trainer-included oracle (no goldens), unlike the
    // corpus-level golden-pinned q_bpe_encode_stats
    "q_bpe_fertility" -> ((s: SparkSession, d: String) =>
      Bpe.fertility(s, d)),
    // fertility from the persisted frozen model — the rank-order
    // replay reproduces the training encode exactly, so the served
    // report answers the SAME full trainer-included oracle
    "q_bpe_fertility_served" -> ((s: SparkSession, d: String) =>
      Bpe.fertilityFromModel(s, d, s"${indexRoot(d)}/bpe_model")),
    // vocabulary-overlap matrix across sources: distinct-set reduction
    // first, token-keyed pair join second — fully oracle-recomputable
    "q_vocab_overlap" -> ((s: SparkSession, d: String) =>
      TextOps.vocabOverlap(s, d)),
    // deterministic corpus shuffle → training shards: closed-form
    // multiplicative-hash permutation, fully oracle-recomputable
    "q_train_shards" -> ((s: SparkSession, d: String) =>
      Shard.trainShards(s, d)),
    // RAG chunking: overlapping token windows, the unit the retrieval
    // stack indexes past whole-doc length limits
    "q_chunks" -> ((s: SparkSession, d: String) =>
      TextOps.chunks(s, d)),
    // stratified train/val/test split: exact per-language fractions,
    // deterministic hash order — leak-free under re-runs
    "q_data_splits" -> ((s: SparkSession, d: String) =>
      Shard.stratifiedSplit(s, d)),
    // near-dup-aware split: the split unit is the connected COMPONENT
    // of the verified near-dup graph, so no near-dup pair straddles
    // the train/eval boundary (the leakage q_data_splits permits)
    "q_leakage_splits" -> ((s: SparkSession, d: String) =>
      Shard.leakageSafeSplit(s, d)),
    // per-doc shingle novelty: fraction of a doc's distinct 3-gram
    // shingles first seen in THIS doc (min-doc_id anchored)
    "q_novelty" -> ((s: SparkSession, d: String) =>
      Dedup.novelty(s, d)),
    // greedy farthest-point (Gonzalez k-center) diversity coreset over
    // the embeddings — k=8 one-pass rounds, round-then-argmax contract
    "q_coreset" -> ((s: SparkSession, d: String) =>
      Sampling.coreset(s, d)),
    // BM25 index fsck: the GROWN index's sum-folded termstats bucketed
    // by integer binary length of df, answered against a pure corpus
    // recompute — a double-counted or lost append batch fails the hash
    "q_bm25_index_stats" -> ((s: SparkSession, d: String) =>
      Search.indexTermStats(s, s"${indexRoot(d)}/bm25_appended")),
    "q_dedup_exact" -> (Dedup.exact _),
    "q_minhash_pairs" -> ((s: SparkSession, d: String) =>
      Dedup.minhashPairs(s, d)),
    "q_ngram_jaccard" -> ((s: SparkSession, d: String) =>
      Dedup.ngramJaccardPairs(s, d)),
    // prefix-filtered containment join: the partial-overlap detector
    // (quotation / subset duplication) Jaccard structurally misses
    "q_containment" -> ((s: SparkSession, d: String) =>
      Dedup.ngramContainmentPairs(s, d)),
    // exact-substring dedup (Lee et al. suffix-array class, r15):
    // maximal verbatim ≥8-token spans with positions — the modality
    // the gram-SET family (jaccard/containment) structurally misses
    "q_substring_dups" -> ((s: SparkSession, d: String) =>
      Substring.substringDups(s, d)),
    // the curation half: cut every duplicated span occurrence except
    // the smallest-doc_id copy, rebuild the surviving token stream
    "q_substring_scrub" -> ((s: SparkSession, d: String) =>
      Substring.substringScrub(s, d)),
    // the production shape of the cut (r16): spans reconstructed from
    // the persisted position index (built as base + one append batch —
    // counts merge exactly), corpus never re-grammed; shares the
    // inline scrub's full reassembly oracle
    "q_substring_scrub_served" -> ((s: SparkSession, d: String) =>
      Substring.substringScrubFromIndex(s,
        s"${indexRoot(d)}/substr_full",
        graft.Tables.documents(s, d).select("doc_id", "text"))),
    // tokenizer-aware variant (r16): windows over the corpus-trained
    // BPE symbol stream (how dedup actually runs post-tokenizer);
    // oracle re-trains the merge table AND re-encodes in DuckDB
    "q_substring_dups_bpe" -> ((s: SparkSession, d: String) =>
      Substring.substringDupsBpe(s, d)),
    // the BPE family's production lifecycle (r16): vocabulary frozen
    // at index build, streams/positions/counts persisted (80% base +
    // one frozen-vocab append batch) — served spans and the served
    // cut re-encode NOTHING and share the inline forms' full
    // trainer-included oracles
    "q_substring_dups_bpe_served" -> ((s: SparkSession, d: String) =>
      Substring.substringDupsBpeFromIndex(s,
        s"${indexRoot(d)}/substr_bpe")),
    // the curation half post-tokenizer: cut duplicated SYMBOL spans,
    // reassemble the surviving stream (</w> markers → word
    // boundaries; a mid-word cut honestly merges fragments, the same
    // artifact token-id-level cutting produces in real pipelines)
    "q_substring_scrub_bpe" -> ((s: SparkSession, d: String) =>
      Substring.substringScrubBpe(s, d)),
    "q_substring_scrub_bpe_served" -> ((s: SparkSession, d: String) =>
      Substring.substringScrubBpeFromIndex(s,
        s"${indexRoot(d)}/substr_bpe")),
    // erasure through the BPE index (r17): the tombstoned docs'
    // positions, per-gram counts AND persisted symbol streams all
    // leave the serve — the tokenizer stays frozen (erasure removes
    // documents, never retrains the merge table), which is exactly
    // what the restricted oracle recomputes: survivors encoded under
    // the full-corpus-trained merges
    "q_substring_scrub_bpe_deleted_served" ->
      ((s: SparkSession, d: String) =>
        Substring.substringScrubBpeFromIndex(s,
          s"${indexRoot(d)}/substr_bpe_deleted")),
    "q_substring_scrub_bpe_del_compacted_served" ->
      ((s: SparkSession, d: String) =>
        Substring.substringScrubBpeFromIndex(s,
          s"${indexRoot(d)}/substr_bpe_del_compacted")),
    // incremental ingest, post-tokenizer: inline (probe = filter above
    // the shared encoded-corpus frame) and served (batch encoded under
    // the frozen tokenizer, re-grams only itself, probed against the
    // old-80% index with merged dfCap counts); one shared oracle
    "q_substring_dups_bpe_incr" -> ((s: SparkSession, d: String) =>
      Substring.incrementalBpeSpans(s, d)),
    "q_substring_dups_bpe_incr_served" -> ((s: SparkSession, d: String) =>
      Substring.incrementalBpeSpansFromIndex(s,
        s"${indexRoot(d)}/substr_bpe_incr",
        incrSplitSide(s, d, newSide = true))),
    // incremental ingest forms: spans for pairs involving a new doc —
    // inline (one shared position subtree, probe = filter above it)
    // and served (batch re-grammed only, probed against the persisted
    // position index with mergeable dfCap counts); one shared oracle
    "q_substring_dups_incr" -> ((s: SparkSession, d: String) =>
      Substring.incrementalSpans(s, d)),
    "q_substring_dups_served" -> ((s: SparkSession, d: String) =>
      Substring.incrementalSpansFromIndex(s, s"${indexRoot(d)}/substr",
        incrSplitSide(s, d, newSide = true))),
    // lifecycle twins: grown (base + append batch) and promoted
    // (batches folded back) indexes serve the identical answer —
    // per-gram counts merge exactly, so one oracle covers all three
    "q_substring_dups_appended_served" -> ((s: SparkSession, d: String) =>
      Substring.incrementalSpansFromIndex(s,
        s"${indexRoot(d)}/substr_appended",
        incrSplitSide(s, d, newSide = true))),
    "q_substring_dups_promoted_served" -> ((s: SparkSession, d: String) =>
      Substring.incrementalSpansFromIndex(s,
        s"${indexRoot(d)}/substr_promoted",
        incrSplitSide(s, d, newSide = true))),
    "q_incremental_dedup" -> ((s: SparkSession, d: String) =>
      Dedup.incrementalDedupQuery(s, d)),
    "q_embedding_stats" -> (Similarity.labelStats _),
    // centroid-distance tail scrub: corrupt/out-of-distribution
    // embedding detection — job-free, zero corpus shuffle
    "q_embedding_outliers" -> ((s: SparkSession, d: String) =>
      Similarity.embeddingOutliers(s, d)),
    // margin-based bitext mining: mutual top-1 cross-side neighbors
    // with a ratio margin — exhaustive driver form, fully oracled
    "q_bitext_mine" -> ((s: SparkSession, d: String) =>
      Similarity.bitextMine(s, d)),
    // hard-negative mining: per probe, top-k most-similar vectors of
    // a DIFFERENT label — the contrastive-training candidate set
    "q_hard_negatives" -> ((s: SparkSession, d: String) =>
      Similarity.hardNegatives(s, d)),
    "q_ann_brute" -> ((s: SparkSession, d: String) =>
      Similarity.bruteForceTopK(s, d)),
    "q_ann_brute_agg" -> ((s: SparkSession, d: String) =>
      Similarity.bruteForceTopKAgg(s, d)),
    // filtered (metadata-predicate) vector search: exact pre-filter
    // tier (full oracle) + the composite-(label,cell)-key IVF tier
    "q_ann_filtered" -> ((s: SparkSession, d: String) =>
      Similarity.filteredBruteTopK(s, d)),
    "q_ann_filtered_ivf" -> ((s: SparkSession, d: String) =>
      Similarity.filteredIvfTopK(s, d)),
    // MMR-diversified rerank: greedy λ·relevance − (1−λ)·max-sim-to-
    // selected over the exact shortlist — the result-page
    // diversification stage; full trajectory oracle (unrolled rounds)
    "q_mmr_rerank" -> ((s: SparkSession, d: String) =>
      Similarity.mmrTopK(s, d)),
    // the diversification stage served from the persisted int8 tier:
    // shortlist ids off the index (exact re-rank ⇒ the brute top-kCand
    // row-for-row), relevance re-attached from the raw store by id —
    // same candidates, same greedy, shared trajectory oracle
    "q_mmr_rerank_served" -> ((s: SparkSession, d: String) =>
      Similarity.mmrTopKFromIndex(s, s"${indexRoot(d)}/int8", d)),
    // late-interaction multi-vector retrieval (ColBERT maxsim)
    "q_maxsim" -> ((s: SparkSession, d: String) =>
      Similarity.maxSimTopK(s, d)),
    // the pruned candidate-join ARCHITECTURE under the gate: at
    // exhaustive probing (nProbe = nCells) the co-cell candidate set
    // is total, so the result is row-identical to q_maxsim for ANY
    // corpus — the entry shares its full oracle and survives testdata
    // regens; the default-probe approximation quality is pinned
    // separately (SketchAccuracySpec recall ratchet, ledger 1.0)
    "q_maxsim_pruned" -> ((s: SparkSession, d: String) =>
      Similarity.maxSimTopKPruned(s, d, nCells = 16, nProbe = 16)),
    "q_ann_lsh" -> ((s: SparkSession, d: String) =>
      Similarity.annTopK(s, d)),
    "q_ann_ivf" -> ((s: SparkSession, d: String) =>
      Similarity.ivfTopK(s, d)),
    // retrieval EVAL under the gate: binary nDCG@10 of the IVF tier
    // against the exhaustive brute ground truth — rank-aware quality,
    // not just set recall (which the accuracy ledger ratchets offline)
    "q_retrieval_ndcg" -> ((s: SparkSession, d: String) =>
      Similarity.retrievalNdcg(s, d)),
    // Matryoshka truncation eval: per (prefix dim, probe), overlap of
    // the truncated-cosine top-k with the full-dim top-k — the report
    // read before adopting truncated embeddings as a cheaper serve
    // tier. Full recompute oracle (round-then-rank at 6 dp both sides)
    "q_matryoshka_recall" -> ((s: SparkSession, d: String) =>
      Similarity.truncationRecall(s, d)),
    // nShards forced to 2 so the sharded machinery (stratified sample,
    // per-shard fit, dispatch, cross-shard merge) runs at driver scale
    // — shardsFor would pick 1 below 65k vectors
    "q_ann_ivf_sharded" -> ((s: SparkSession, d: String) =>
      Similarity.ivfTopKSharded(s, d, nShards = 2)),
    // the compressed-index tier: IVF pruning + 16-byte PQ codes +
    // exact re-rank of the ADC shortlist (r10)
    "q_ann_ivfpq" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqTopK(s, d)),
    // the 100 TB hot tier proper (r11): compressed codes AND past the
    // single-index capacity wall — nShards=2 as q_ann_ivf_sharded.
    // refine=150 (not the operator-default 100): the per-shard
    // codebook fit shifts the ADC error profile just enough that at
    // this geometry the 100-row shortlist misses one true top-10 row
    // by 2e-4; 150 recovers the uncompressed sharded ranking
    // row-for-row, which the dedicated golden then pins
    "q_ann_ivfpq_sharded" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqTopKSharded(s, d, nShards = 2, refine = 150)),
    "q_simhash_pairs" -> ((s: SparkSession, d: String) =>
      Dedup.simhashPairs(s, d)),
    "q_embedding_neardups" -> ((s: SparkSession, d: String) =>
      Dedup.embeddingNearDups(s, d, threshold = 0.8)),
    "q_stratified_sample" -> (Sampling.stratifiedDocSample _),
    "q_token_mixture" -> ((s: SparkSession, d: String) =>
      Sampling.tokenMixture(s, d)),
    // temperature-smoothed source weights (q ∝ p^0.3) — the
    // multilingual rebalancing rule, emitted as a shard-writer table
    "q_temperature_mix" -> ((s: SparkSession, d: String) =>
      Sampling.temperatureMix(s, d)),
    // PMI collocations: top-k above-chance adjacent word pairs,
    // ranked by the rounded score (the BM25 ulp convention)
    "q_collocations" -> ((s: SparkSession, d: String) =>
      TextOps.collocations(s, d)),
    "q_weighted_sample" -> ((s: SparkSession, d: String) =>
      Sampling.weightedDocSample(s, d)),
    "q_reservoir" -> ((s: SparkSession, d: String) =>
      Sampling.reservoirEventSample(s, d)),
    "q_multimodal_stats" -> (Multimodal.docAssetStats _),
    "q_wav_decode" -> (Multimodal.wavDecodeStats _),
    "q_bmp_decode" -> (Multimodal.bmpDecodeStats _),
    // image/audio near-dup (r11): BmpCodec dHash / WavCodec energy-
    // envelope hash through the same banded-Hamming machinery as
    // q_simhash_pairs, over planted grouped fixture corpora
    "q_image_neardups" -> ((s: SparkSession, d: String) =>
      Multimodal.imageNearDups(s, d)),
    "q_audio_neardups" -> ((s: SparkSession, d: String) =>
      Multimodal.audioNearDups(s, d)),
    // video modality (r11): real RIFF-AVI container parse + frame
    // sampling; decode stats DuckDB-oracled, near-dups golden-pinned
    "q_avi_decode" -> (Video.aviDecodeStats _),
    "q_video_neardups" -> ((s: SparkSession, d: String) =>
      Video.videoNearDups(s, d)),
    "q_token_budget" -> (TextOps.tokenBudget _),
    "q_repetition" -> ((s: SparkSession, d: String) =>
      TextOps.repetitionStats(s, d)),
    "q_seq_pack" -> ((s: SparkSession, d: String) =>
      TextOps.seqPackStats(s, d)),
    // dynamic-batching planner table: per length-bucket padding mass
    // under pad-to-batch-max batching (the alternative q_seq_pack's
    // concat-and-chop packing is weighed against)
    "q_length_buckets" -> ((s: SparkSession, d: String) =>
      TextOps.lengthBuckets(s, d)),
    "q_curate" -> ((s: SparkSession, d: String) =>
      Curate.curate(s, d)),
    "q_pii_scan" -> (Scrub.piiScan _),
    // the per-source curation audit (r16): exact/near/substring dedup
    // mass, PII, contamination and repetition in ONE gate-checked row
    // per source — every component is the matching operator itself
    "q_curation_report" -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.report(s, d)),
    // the training-mix MANIFEST (r17): the report's drop set +
    // temperature weights over CLEAN token mass + the run's token
    // budget, composed into the per-source table a pretraining run is
    // configured from — full oracle, trainer-free composition
    "q_mix_manifest" -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.mixManifest(s, d)),
    // ngramSize=4 so the scan produces rows on the driver's 25-word-
    // vocab corpus (no two synthetic docs share a 13-gram); the
    // operator default stays at the published-practice 13
    "q_contamination" -> ((s: SparkSession, d: String) =>
      Scrub.contamination(s, d, nProbes = 3, ngramSize = 4)),
    // embedding-space decontamination: exact nearest-train cosine per
    // eval probe (held-out slice = near-miss FALSE band; planted
    // verbatim leaks = deterministic 1.0 TRUE flags at any sf)
    "q_semantic_decontam" -> ((s: SparkSession, d: String) =>
      Scrub.semanticContaminationQuery(s, d)),
    // the per-doc transpose — the ingest GATE form: zero-shuffle
    // narrow projection, probes collapse to one broadcast row
    "q_semantic_gate" -> ((s: SparkSession, d: String) =>
      Scrub.semanticGateQuery(s, d)),
    // SemDeDup-style cluster-then-prune semantic dedup over the
    // deterministic perturbed view (corpus + exact-float32 scaled and
    // negated siblings): prunes nonzero ids at verify scale and the
    // geometry-free corpus summary is fully recomputable by DuckDB —
    // an all-pairs cosine scan, since every ≥τ pair on this view is a
    // co-celled (v, 3v) sibling pair. Operator default τ=0.85; the
    // per-cell summary semantics stay spec-pinned on planted corpora
    "q_semdedup" -> ((s: SparkSession, d: String) =>
      Dedup.semDedupPerturbed(s, d)),
    // cross-source syndication matrix: near-dup pairs rolled up to
    // unordered source cells — the copy-detection table a mixture
    // planner reads before trusting per-source token budgets
    "q_syndication" -> ((s: SparkSession, d: String) =>
      Dedup.syndicationMatrix(s, d)),
    // quality-aware canonical selection: keep the LEAST-repetitive
    // (then longest, then smallest-id) member of each near-dup cluster
    // — the keep-best rule production curation uses over keep-first
    "q_canonical_docs" -> ((s: SparkSession, d: String) =>
      Dedup.canonicalDocs(s, d)),
    "q_dup_clusters" -> ((s: SparkSession, d: String) =>
      Dedup.dupClusters(s, d)),
    "q_dup_clusters_sample" -> ((s: SparkSession, d: String) =>
      Dedup.dupClustersSampleQuery(s, d)),
    // ---- persisted-index SERVE paths --------------------------------
    // The production serving story: the same answers from the lake
    // artifacts [[prepare]] builds — no fit, no corpus signature pass.
    // Each is bit-identical to its inline twin (round-tripped in
    // DedupSimilaritySpec), so each shares the twin's oracle below.
    // Query CONSTRUCTION only reads the prepared paths; the index
    // builds run in the [[prepare]] hook, never at construction
    // (registry queries must stay construction-job-free).
    // BM25 keyword retrieval over the documents corpus: inline twin
    // recomputes postings/df/corpus stats; the served twin reads the
    // term-partitioned inverted index written by [[prepare]]
    "q_bm25" -> ((s: SparkSession, d: String) => Search.bm25(s, d)),
    "q_bm25_served" -> ((s: SparkSession, d: String) =>
      Search.bm25FromIndex(s, s"${indexRoot(d)}/bm25")),
    // conjunctive retrieval: BM25 restricted to docs matching EVERY
    // query term (the stricter triage mode)
    "q_bm25_and" -> ((s: SparkSession, d: String) => Search.bm25And(s, d)),
    // exact-span (phrase) matching — contamination triage proper:
    // occurrence counts per (phrase, doc) from token positions; the
    // served twin reads the positional postings of the persisted index
    "q_bm25_phrase" -> ((s: SparkSession, d: String) =>
      Search.phraseMatch(s, d)),
    "q_bm25_phrase_served" -> ((s: SparkSession, d: String) =>
      Search.phraseMatchFromIndex(s, s"${indexRoot(d)}/bm25")),
    // grow-in-place retrieval tier: base indexed on 80% of docs, the
    // held-out 20% appended as a batch; postings/df/stats fold by
    // exact summation, so the grown serve answers the FULL-corpus
    // oracle (no frozen-model caveat, unlike the ANN appends)
    "q_bm25_appended_served" -> ((s: SparkSession, d: String) =>
      Search.bm25FromIndex(s, s"${indexRoot(d)}/bm25_appended")),
    // GDPR-erasure over the retrieval tier (r16): tombstoned docs must
    // leave the RANKING MODEL, not just the result list — df recounts
    // from the surviving pruned postings and N/Σdl adjust by the
    // tombstones' recorded lengths, so scores equal a from-scratch
    // index over the survivors (the delete-restricted full oracle);
    // the compacted twin folds the deletions in and serves the same
    // answer from the minimal stored-stats plan
    "q_bm25_deleted_served" -> ((s: SparkSession, d: String) =>
      Search.bm25FromIndex(s, s"${indexRoot(d)}/bm25_deleted")),
    "q_bm25_del_compacted_served" -> ((s: SparkSession, d: String) =>
      Search.bm25FromIndex(s, s"${indexRoot(d)}/bm25_del_compacted")),
    "q_ann_lsh_served" -> ((s: SparkSession, d: String) =>
      Similarity.annTopKFromIndex(s, s"${indexRoot(d)}/lsh",
        annProbeVectors(s, d))),
    // LSH lifecycle twins (closing the last index family without one):
    // bucketing is a pure function of (embedding, frozen planes), so
    // grown and promoted both serve the one-shot golden exactly
    "q_ann_lsh_appended_served" -> ((s: SparkSession, d: String) =>
      Similarity.annTopKFromIndex(s, s"${indexRoot(d)}/lsh_appended",
        annProbeVectors(s, d))),
    "q_ann_lsh_promoted_served" -> ((s: SparkSession, d: String) =>
      Similarity.annTopKFromIndex(s, s"${indexRoot(d)}/lsh_promoted",
        annProbeVectors(s, d))),
    "q_ann_ivf_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfTopKFromIndex(s, s"${indexRoot(d)}/ivf",
        annProbeVectors(s, d))),
    "q_ann_ivf_sharded_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfTopKShardedFromIndex(s,
        s"${indexRoot(d)}/ivf_sharded", annProbeVectors(s, d))),
    // the two-tier PQ serve: ADC over the partition-pruned codes
    // table, exact re-rank fetching raw vectors from the lake's
    // embeddings table (the cold store)
    "q_ann_ivfpq_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqTopKFromIndex(s, s"${indexRoot(d)}/ivfpq",
        annProbeVectors(s, d), refine = 100,
        refineFrom = Some(graft.Tables.embeddings(s, d)))),
    "q_ann_ivfpq_sharded_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqTopKShardedFromIndex(s,
        s"${indexRoot(d)}/ivfpq_sharded", annProbeVectors(s, d),
        refine = 150, // matches the inline twin's boundary note above
        refineFrom = Some(graft.Tables.embeddings(s, d)))),
    // the grown index: 80% built + 20% appended under frozen geometry
    // must serve exactly what a one-shot full build serves
    "q_ann_ivf_appended_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfTopKFromIndex(s, s"${indexRoot(d)}/ivf_appended",
        annProbeVectors(s, d))),
    // the lake's drift monitor: per-cell occupancy over the same
    // base+batches union the serve path scans (refit signal)
    "q_ann_ivf_cell_stats" -> ((s: SparkSession, d: String) =>
      Similarity.ivfCellStats(s, s"${indexRoot(d)}/ivf_appended")),
    // lifecycle close-out #1: the appended index PROMOTED — batches
    // folded into base, side dirs retired, serve back on the minimal
    // one-scan plan. Geometry untouched ⇒ bit-identical to q_ann_ivf
    "q_ann_ivf_promoted_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfTopKFromIndex(s, s"${indexRoot(d)}/ivf_promoted",
        annProbeVectors(s, d))),
    // lifecycle close-out #2: the appended index REFIT — fresh
    // centroids over the accreted content (base ∪ batches = the full
    // corpus here), atomic swap. The deterministic fit reproduces the
    // one-shot full-corpus geometry, so the serve answers q_ann_ivf's
    // golden exactly
    "q_ann_ivf_refit_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfTopKFromIndex(s, s"${indexRoot(d)}/ivf_refit",
        annProbeVectors(s, d))),
    // the grown COMPRESSED index: batch-encoded appends under frozen
    // centroids+codebooks must serve the one-shot build's ranking
    "q_ann_ivfpq_appended_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqTopKFromIndex(s, s"${indexRoot(d)}/ivfpq_appended",
        annProbeVectors(s, d), refine = 100,
        refineFrom = Some(graft.Tables.embeddings(s, d)))),
    // compressed-tier lifecycle close-out: the grown PQ index REFIT —
    // fresh centroids+codebooks from the raw store, full re-encode,
    // atomic swap; the deterministic fits reproduce the one-shot
    // model, so the serve answers q_ann_ivfpq's golden exactly
    "q_ann_ivfpq_refit_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqTopKFromIndex(s, s"${indexRoot(d)}/ivfpq_refit",
        annProbeVectors(s, d), refine = 100,
        refineFrom = Some(graft.Tables.embeddings(s, d)))),
    // compressed-tier promotion close-out (the last lifecycle
    // asymmetry): batch code dirs folded into the base codes table,
    // frozen model untouched — promotion moves rows, never geometry,
    // so the minimal one-scan serve answers q_ann_ivfpq's golden
    "q_ann_ivfpq_promoted_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqTopKFromIndex(s, s"${indexRoot(d)}/ivfpq_promoted",
        annProbeVectors(s, d), refine = 100,
        refineFrom = Some(graft.Tables.embeddings(s, d)))),
    // corpus-wide near-dup consumers served from the standing
    // full-corpus bucket index (r16): pairs come off the lake's
    // 24-byte bucket rows — no corpus signature pass — then feed the
    // same selection/rollup; pair sets are bit-identical to the inline
    // twins', so both share their full oracles
    "q_canonical_docs_served" -> ((s: SparkSession, d: String) =>
      Dedup.canonicalDocsFromIndex(s, d,
        s"${indexRoot(d)}/minhash_full")),
    "q_syndication_served" -> ((s: SparkSession, d: String) =>
      Dedup.syndicationFromIndex(s, d,
        s"${indexRoot(d)}/minhash_full")),
    // the per-source audit served from the standing indexes (r16): the
    // substring cut — the report's expensive span machinery — reads
    // the persisted full-corpus position index; scan-side components
    // are per-doc map work with no index to serve from
    "q_curation_report_served" -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.reportServed(s, d,
        s"${indexRoot(d)}/substr_full")),
    // erasure through the dedup/curation indexes (r16): tombstoned
    // docs can neither pair nor be selected, and the substring cut's
    // dfCap boundary is the survivors' (a capped gram re-enters when
    // its copies are erased) — both lifecycle states answer the
    // delete-RESTRICTED full recomputes
    "q_canonical_docs_deleted_served" -> ((s: SparkSession, d: String) =>
      Dedup.canonicalDocsFromIndex(s, d,
        s"${indexRoot(d)}/minhash_deleted")),
    "q_canonical_docs_del_compacted_served" ->
      ((s: SparkSession, d: String) =>
        Dedup.canonicalDocsFromIndex(s, d,
          s"${indexRoot(d)}/minhash_del_compacted")),
    "q_substring_scrub_deleted_served" -> ((s: SparkSession, d: String) =>
      graft.operators.Substring.substringScrubFromIndex(s,
        s"${indexRoot(d)}/substr_deleted",
        graft.Tables.documents(s, d).filter(
          org.apache.spark.sql.functions.col("doc_id") % 7 =!= 6))),
    "q_substring_scrub_del_compacted_served" ->
      ((s: SparkSession, d: String) =>
        graft.operators.Substring.substringScrubFromIndex(s,
          s"${indexRoot(d)}/substr_del_compacted",
          graft.Tables.documents(s, d).filter(
            org.apache.spark.sql.functions.col("doc_id") % 7 =!= 6))),
    "q_incremental_dedup_served" -> ((s: SparkSession, d: String) =>
      Dedup.incrementalMinhashPairsFromIndex(
        s.read.parquet(s"${indexRoot(d)}/minhash_buckets"),
        incrSplitSide(s, d, newSide = false),
        incrSplitSide(s, d, newSide = true))),
    // novelty served from the GROWN first-seen index (80% built + 20%
    // appended): the min-fold over base ∪ batches is the global min,
    // so the serve answers the inline q_novelty oracle row-for-row
    "q_novelty_served" -> ((s: SparkSession, d: String) =>
      Dedup.noveltyFromIndex(s, s"${indexRoot(d)}/novelty",
        graft.Tables.documents(s, d))),
    // erasure through the first-seen index (r17): min is NOT
    // subtractable, so the serve keeps surviving minima (removing docs
    // can only raise a min), re-derives erased-vouched grams from the
    // survivor probe frame, and the compacted twin pins the one
    // corpus-pass fold-in ([[Dedup.compactNoveltyDeletes]]). Both
    // answer the survivors-restricted full recompute
    "q_novelty_deleted_served" -> ((s: SparkSession, d: String) =>
      Dedup.noveltyFromIndex(s, s"${indexRoot(d)}/novelty_deleted",
        graft.Tables.documents(s, d).filter(
          org.apache.spark.sql.functions.col("doc_id") % 7 =!= 6))),
    "q_novelty_del_compacted_served" -> ((s: SparkSession, d: String) =>
      Dedup.noveltyFromIndex(s,
        s"${indexRoot(d)}/novelty_del_compacted",
        graft.Tables.documents(s, d).filter(
          org.apache.spark.sql.functions.col("doc_id") % 7 =!= 6))),
    // the int8 scalar-quantized WARM tier: closed-form quantizer, so
    // (unlike the PQ goldens) BOTH the stored codes and the served
    // ranking carry full cross-engine oracles — the codes audit pins
    // the quantizer + tinyint parquet round-trip value-for-value, and
    // the topk rows answer q_ann_brute's oracle, equality-pinning
    // shortlist recall 1.0 after the exact re-rank
    "q_int8_codes" -> ((s: SparkSession, d: String) =>
      ScalarQuant.codesAudit(s, s"${indexRoot(d)}/int8")),
    "q_ann_int8" -> ((s: SparkSession, d: String) =>
      ScalarQuant.sqTopK(s, d)),
    "q_ann_int8_served" -> ((s: SparkSession, d: String) =>
      ScalarQuant.sqTopKFromIndex(s, s"${indexRoot(d)}/int8",
        annProbeVectors(s, d), graft.Tables.embeddings(s, d))),
    // int8 lifecycle: the grown index (base ∪ batch union-folds at
    // serve) and the promoted one (folded back to one scan) — with no
    // frozen geometry both are exact, so they answer the full brute
    // oracle like their one-shot twin, not a pinned golden
    "q_ann_int8_appended_served" -> ((s: SparkSession, d: String) =>
      ScalarQuant.sqTopKFromIndex(s, s"${indexRoot(d)}/int8_appended",
        annProbeVectors(s, d), graft.Tables.embeddings(s, d))),
    "q_ann_int8_promoted_served" -> ((s: SparkSession, d: String) =>
      ScalarQuant.sqTopKFromIndex(s, s"${indexRoot(d)}/int8_promoted",
        annProbeVectors(s, d), graft.Tables.embeddings(s, d))),
    // the binary (1-bit sign) COLD tier below int8: packed-word bit
    // vectors, XOR+popcount Hamming shortlist, exact re-rank. Like the
    // int8 tier the quantizer is closed-form, so the bit audit carries
    // a full cross-engine recompute and the topk rows answer
    // q_ann_brute's oracle — equality-pinning shortlist recall 1.0 at
    // the registry's refine width (288 of 500 at verify scale)
    "q_bq_bits" -> ((s: SparkSession, d: String) =>
      BinaryQuant.bitsAudit(s, s"${indexRoot(d)}/bq")),
    "q_ann_bq" -> ((s: SparkSession, d: String) =>
      BinaryQuant.bqTopK(s, d)),
    "q_ann_bq_served" -> ((s: SparkSession, d: String) =>
      BinaryQuant.bqTopKFromIndex(s, s"${indexRoot(d)}/bq",
        annProbeVectors(s, d), graft.Tables.embeddings(s, d))),
    // bit-tier lifecycle: grown (base ∪ batch) and promoted (folded
    // back to one scan) — no frozen geometry, both exact rebuilds
    "q_ann_bq_appended_served" -> ((s: SparkSession, d: String) =>
      BinaryQuant.bqTopKFromIndex(s, s"${indexRoot(d)}/bq_appended",
        annProbeVectors(s, d), graft.Tables.embeddings(s, d))),
    "q_ann_bq_promoted_served" -> ((s: SparkSession, d: String) =>
      BinaryQuant.bqTopKFromIndex(s, s"${indexRoot(d)}/bq_promoted",
        annProbeVectors(s, d), graft.Tables.embeddings(s, d))),
    // GDPR-erasure lifecycle (r16): logical deletes over a GROWN index
    // (base + committed batch + tombstones all live at once) must
    // vanish from the serve without an index rewrite; the compaction
    // close-out folds them into a fresh base and returns the plan to
    // one scan. Both answer the delete-RESTRICTED brute oracle —
    // deleted ids must not rank, every survivor must rank exactly
    "q_ann_int8_deleted_served" -> ((s: SparkSession, d: String) =>
      ScalarQuant.sqTopKFromIndex(s, s"${indexRoot(d)}/int8_deleted",
        annProbeVectors(s, d), graft.Tables.embeddings(s, d))),
    "q_ann_int8_del_compacted_served" -> ((s: SparkSession, d: String) =>
      ScalarQuant.sqTopKFromIndex(s,
        s"${indexRoot(d)}/int8_del_compacted",
        annProbeVectors(s, d), graft.Tables.embeddings(s, d))),
    // the bit tier shares the tombstone machinery — both lifecycle
    // states pinned like the int8 pair
    "q_ann_bq_deleted_served" -> ((s: SparkSession, d: String) =>
      BinaryQuant.bqTopKFromIndex(s, s"${indexRoot(d)}/bq_deleted",
        annProbeVectors(s, d), graft.Tables.embeddings(s, d))),
    "q_ann_bq_del_compacted_served" -> ((s: SparkSession, d: String) =>
      BinaryQuant.bqTopKFromIndex(s, s"${indexRoot(d)}/bq_del_compacted",
        annProbeVectors(s, d), graft.Tables.embeddings(s, d))),
    // erasure through the frozen-geometry approximate tiers (r17):
    // deletion is the live-row anti-join — no refit, the model tables
    // untouched — and compaction folds it into a fresh base. Both
    // states serve the survivors-only build's exact ranking
    // (AnnEraseSpec), pinned here as delete-restricted goldens (the
    // families' own oracles are goldens; the restricted run is as
    // deterministic as the unrestricted one)
    "q_ann_ivf_deleted_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfTopKFromIndex(s, s"${indexRoot(d)}/ivf_deleted",
        annProbeVectors(s, d))),
    "q_ann_ivf_del_compacted_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfTopKFromIndex(s,
        s"${indexRoot(d)}/ivf_del_compacted", annProbeVectors(s, d))),
    "q_ann_ivfpq_deleted_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqTopKFromIndex(s, s"${indexRoot(d)}/ivfpq_deleted",
        annProbeVectors(s, d), refine = 100,
        refineFrom = Some(graft.Tables.embeddings(s, d)))),
    "q_ann_ivfpq_del_compacted_served" -> ((s: SparkSession, d: String) =>
      Similarity.ivfPqTopKFromIndex(s,
        s"${indexRoot(d)}/ivfpq_del_compacted",
        annProbeVectors(s, d), refine = 100,
        refineFrom = Some(graft.Tables.embeddings(s, d)))),
    "q_ann_lsh_deleted_served" -> ((s: SparkSession, d: String) =>
      Similarity.annTopKFromIndex(s, s"${indexRoot(d)}/lsh_deleted",
        annProbeVectors(s, d))),
    "q_ann_lsh_del_compacted_served" -> ((s: SparkSession, d: String) =>
      Similarity.annTopKFromIndex(s,
        s"${indexRoot(d)}/lsh_del_compacted", annProbeVectors(s, d))),
    // hybrid retrieval: BM25 + dense cosine fused by reciprocal-rank
    // fusion. The served twin composes the two PERSISTED indexes
    // (bm25 postings + the int8 codes tier); the int8 leg's exact
    // re-rank is what lets it answer the same full oracle as the
    // inline brute-force form
    "q_hybrid_rrf" -> ((s: SparkSession, d: String) => Hybrid.rrf(s, d)),
    "q_hybrid_rrf_served" -> ((s: SparkSession, d: String) =>
      Hybrid.rrfFromIndexes(s, d, s"${indexRoot(d)}/bm25",
        s"${indexRoot(d)}/int8")),
    // same fusion with the binary bit tier as the dense leg — the
    // cheapest-storage serve shape; exact-recall re-rank keeps it on
    // the same full oracle as the inline and int8-served forms
    "q_hybrid_rrf_bq_served" -> ((s: SparkSession, d: String) =>
      Hybrid.rrfFromIndexesBq(s, d, s"${indexRoot(d)}/bm25",
        s"${indexRoot(d)}/bq")),
    // the cascade's last stage: cross-encoder-STYLE pairwise rerank of
    // the RRF shortlist (0.6·cosine + 0.4·term-jaccard, deterministic
    // stand-in for a model call — full oracle recomputes the cascade)
    "q_rerank" -> ((s: SparkSession, d: String) => Hybrid.rerank(s, d)),
    // served cascade (r15): same rerank stage over the index-served
    // RRF shortlist — shares q_rerank's full oracle because the served
    // RRF is oracle-identical to the inline form (exact-recall int8)
    "q_rerank_served" -> ((s: SparkSession, d: String) =>
      Hybrid.rerankFromIndexes(s, d, s"${indexRoot(d)}/bm25",
        s"${indexRoot(d)}/int8")),
    // the whole cascade from the two cheapest persisted artifacts
    // (postings + sign-bit table) — same full cascade-recompute oracle
    "q_rerank_bq_served" -> ((s: SparkSession, d: String) =>
      Hybrid.rerankFromIndexesBq(s, d, s"${indexRoot(d)}/bm25",
        s"${indexRoot(d)}/bq"))
  )

  /** The 5 probe vectors every ANN registry query uses
    * (`vec_id < 5` = the inline twins' `nQueries = 5`).
    */
  private def annProbeVectors(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    graft.Tables.embeddings(s, d).filter(col("vec_id") < 5)
  }

  /** One side of the 80/20 incremental split
    * ([[graft.operators.Dedup.incrementalDedupQuery]]'s fixture rule),
    * with the split id in-plan as a scalar subquery — constructing the
    * frame must not run a job.
    */
  private def incrSplitSide(s: SparkSession, d: String,
      newSide: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val docs = graft.Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
    docs.createOrReplaceTempView("graft_incr_docs_served")
    val splitId =
      "(select (max(doc_id) * 4) div 5 from graft_incr_docs_served)"
    docs.filter(expr(
      if (newSide) s"doc_id >= $splitId" else s"doc_id < $splitId"))
  }

  /** Root for the build-once lake indexes the `*_served` queries read —
    * keyed by the sfDir so scales coexist; under the JVM temp dir
    * because the testdata tree is read-only.
    */
  def indexRoot(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_lake_indexes/" +
      d.replaceAll("[^A-Za-z0-9.]", "_")

  /** Build-once prepare hook for the `*_served` queries: persists the
    * LSH, IVF, sharded-IVF and minhash-bucket indexes for `d`. Verify,
    * Bench, the audit mains and EntrySpec call this BEFORE executing
    * registry queries. Always rebuilds — seconds at verify scale, and a
    * fresh build can never serve a stale on-disk format across code
    * changes.
    */
  def prepare(s: SparkSession, d: String): Unit = {
    val root = indexRoot(d)
    Similarity.lshWriteIndex(s, d, s"$root/lsh")
    Similarity.ivfWriteIndex(s, d, s"$root/ivf")
    // nShards = 2 matches q_ann_ivf_sharded (shardsFor picks 1 below
    // the ~65k single-index capacity, and driver data sits below it)
    Similarity.ivfWriteIndexSharded(s, d, s"$root/ivf_sharded",
      nShards = 2)
    Similarity.ivfPqWriteIndex(s, d, s"$root/ivfpq")
    Similarity.ivfPqWriteIndexSharded(s, d, s"$root/ivfpq_sharded",
      nShards = 2)
    // the grow-in-place tier: index 80% at build time (geometry fit on
    // the full corpus — the frozen-codebook production pattern), then
    // the held-out 20% arrives as an append batch; the serve must be
    // bit-identical to q_ann_ivf (assignment is a pure function of
    // (embedding, centroids)), which q_ann_ivf_appended_served pins
    val appended = s"$root/ivf_appended"
    Similarity.ivfWriteIndex(s, d, appended,
      assignOnly = Some(org.apache.spark.sql.functions
        .col("vec_id") % 5 =!= 4))
    Similarity.ivfAppendBatch(s, appended,
      graft.Tables.embeddings(s, d)
        .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 4),
      batchId = 1L)
    // lifecycle close-outs: the same 80/20 grown index, then promoted
    // (batches folded into base, geometry untouched) or refit (fresh
    // deterministic geometry over the accreted full corpus + atomic
    // swap) — both serve q_ann_ivf's exact golden
    Seq("ivf_promoted" -> false, "ivf_refit" -> true).foreach {
      case (name, refit) =>
        val dir = s"$root/$name"
        Similarity.ivfWriteIndex(s, d, dir,
          assignOnly = Some(org.apache.spark.sql.functions
            .col("vec_id") % 5 =!= 4))
        Similarity.ivfAppendBatch(s, dir,
          graft.Tables.embeddings(s, d)
            .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 4),
          batchId = 1L)
        if (refit) Similarity.refitIvfIndex(s, dir)
        else Similarity.promoteBatches(s, dir)
    }
    // the compressed tier grows the same way: frozen centroids AND
    // codebooks, batch-encoded appends; q_ann_ivfpq_appended_served
    // pins the serve against the one-shot q_ann_ivfpq golden
    val appendedPq = s"$root/ivfpq_appended"
    Similarity.ivfPqWriteIndex(s, d, appendedPq,
      assignOnly = Some(org.apache.spark.sql.functions
        .col("vec_id") % 5 =!= 4))
    Similarity.ivfPqAppendBatch(s, appendedPq,
      graft.Tables.embeddings(s, d)
        .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 4),
      batchId = 1L)
    // compressed-tier refit close-out: same 80/20 grown index, then a
    // full refit from the raw store — deterministic fits reproduce the
    // one-shot model, q_ann_ivfpq_refit_served pins it to the golden
    val refitPq = s"$root/ivfpq_refit"
    Similarity.ivfPqWriteIndex(s, d, refitPq,
      assignOnly = Some(org.apache.spark.sql.functions
        .col("vec_id") % 5 =!= 4))
    Similarity.ivfPqAppendBatch(s, refitPq,
      graft.Tables.embeddings(s, d)
        .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 4),
      batchId = 1L)
    Similarity.refitIvfPqIndex(s, refitPq, graft.Tables.embeddings(s, d))
    // compressed-tier promotion close-out: the same 80/20 grown index,
    // batches then folded into the base codes table (geometry frozen
    // throughout) — back to the one-scan serve plan, same golden
    val promotedPq = s"$root/ivfpq_promoted"
    Similarity.ivfPqWriteIndex(s, d, promotedPq,
      assignOnly = Some(org.apache.spark.sql.functions
        .col("vec_id") % 5 =!= 4))
    Similarity.ivfPqAppendBatch(s, promotedPq,
      graft.Tables.embeddings(s, d)
        .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 4),
      batchId = 1L)
    Similarity.promoteBatches(s, promotedPq, table = "codes",
      partitionCol = "cell")
    Dedup.minhashBuckets(incrSplitSide(s, d, newSide = false))
      .write.mode("overwrite").parquet(s"$root/minhash_buckets")
    // FULL-corpus LSH bucket index (r16) for the served corpus-wide
    // near-dup consumers (canonical selection, syndication matrix) —
    // built lifecycle-real as 80% base + one append batch; buckets are
    // per-doc rows, so the union IS the one-shot full index exactly
    val mhFull = s"$root/minhash_full"
    Dedup.minhashWriteIndex(s, d, mhFull,
      buildOnly = Some(org.apache.spark.sql.functions
        .col("doc_id") % 5 =!= 4))
    Dedup.minhashAppendBatch(s, mhFull,
      graft.Tables.documents(s, d)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 4),
      batchId = 1L)
    // gram-position index for the served exact-substring probe (r15):
    // old 80% positions + mergeable frequency counts
    Substring.writePositionIndex(s,
      incrSplitSide(s, d, newSide = false), s"$root/substr")
    // FULL-corpus position index for the served curation cut (r16):
    // built the lifecycle-real way — 80% base + one append batch
    // (counts merge exactly, so the served scrub equals the inline
    // recompute and shares its oracle)
    locally {
      val dir = s"$root/substr_full"
      val all = graft.Tables.documents(s, d).select("doc_id", "text")
      Substring.writePositionIndex(s,
        all.filter(org.apache.spark.sql.functions
          .col("doc_id") % 5 =!= 4), dir)
      Substring.appendPositionsBatch(s, dir,
        all.filter(org.apache.spark.sql.functions
          .col("doc_id") % 5 === 4), batchId = 1L)
    }
    // BPE-symbol position index (r16): vocabulary trained once on the
    // full corpus and FROZEN (the LSH plane-set convention), 80% of
    // the encoded streams indexed, the rest appended under the frozen
    // vocab — counts merge exactly, so the served dups/scrub equal
    // the inline recomputes and share their full retrain oracles
    Substring.writeBpeIndex(s, d, s"$root/substr_bpe",
      buildOnly = Some(org.apache.spark.sql.functions
        .col("doc_id") % 5 =!= 4))
    Substring.bpeAppendBatch(s, s"$root/substr_bpe",
      graft.Tables.documents(s, d)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 4),
      batchId = 1L)
    // BPE incremental-probe twin: the OLD 80% indexed under the same
    // frozen full-corpus tokenizer; the newest fifth arrives only as
    // the served query's probe batch
    Substring.writeBpeIndex(s, d, s"$root/substr_bpe_incr",
      indexDocs = Some(incrSplitSide(s, d, newSide = false)))
    // substring lifecycle twins: the same old-80% index grown as
    // base(4/5 of it) + one append batch, and the promoted fold-back —
    // counts merge exactly, so all three serve the identical answer
    Seq("substr_appended" -> false, "substr_promoted" -> true).foreach {
      case (name, promote) =>
        val dir = s"$root/$name"
        val oldSide = incrSplitSide(s, d, newSide = false)
        Substring.writePositionIndex(s,
          oldSide.filter(org.apache.spark.sql.functions
            .col("doc_id") % 5 =!= 3), dir)
        Substring.appendPositionsBatch(s, dir,
          oldSide.filter(org.apache.spark.sql.functions
            .col("doc_id") % 5 === 3), batchId = 1L)
        if (promote) Substring.promotePositionBatches(s, dir)
    }
    // novelty first-seen index, the standard 80/20 grow-in-place
    // fixture: min-per-gram is mergeable (no frozen model), so the
    // grown index serves the inline answer exactly and
    // q_novelty_served shares q_novelty's full-recompute oracle
    val novIdx = s"$root/novelty"
    Dedup.noveltyWriteIndex(s, d, novIdx,
      buildOnly = Some(org.apache.spark.sql.functions
        .col("doc_id") % 5 =!= 4))
    Dedup.noveltyAppendBatch(s, novIdx,
      graft.Tables.documents(s, d)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 4),
      batchId = 1L)
    Search.buildIndex(s, d, s"$root/bm25")
    val bm25App = s"$root/bm25_appended"
    Search.buildIndex(s, d, bm25App,
      docFilter = Some(org.apache.spark.sql.functions
        .col("doc_id") % 5 =!= 4))
    Search.appendBatch(s, bm25App,
      graft.Tables.documents(s, d)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 4),
      batchId = 1L)
    ScalarQuant.sqWriteIndex(s, d, s"$root/int8")
    // LSH lifecycle twins: plane set fit on the full corpus, 80%
    // indexed, 20% appended under the frozen planes; promotion folds
    // the batch back. Bucketing is exact given planes, so both serve
    // the one-shot golden
    Seq("lsh_appended" -> false, "lsh_promoted" -> true).foreach {
      case (name, promote) =>
        val dir = s"$root/$name"
        Similarity.lshWriteIndex(s, d, dir,
          assignOnly = Some(org.apache.spark.sql.functions
            .col("vec_id") % 5 =!= 4))
        Similarity.lshAppendBatch(s, dir,
          graft.Tables.embeddings(s, d)
            .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 4),
          batchId = 1L)
        if (promote)
          Similarity.promoteBatches(s, dir, table = "buckets",
            partitionCol = "bucket")
    }
    // int8 lifecycle twins, the same 80/20 fixture rule as the other
    // tiers: grown (base + one committed batch) and grown-then-promoted
    // (back to the one-scan plan). No geometry to freeze, so both are
    // EXACT rebuilds of the full index by construction
    Seq("int8_appended" -> false, "int8_promoted" -> true).foreach {
      case (name, promote) =>
        val dir = s"$root/$name"
        ScalarQuant.sqWriteIndex(s, d, dir,
          assignOnly = Some(org.apache.spark.sql.functions
            .col("vec_id") % 5 =!= 4))
        ScalarQuant.sqAppendBatch(s, dir,
          graft.Tables.embeddings(s, d)
            .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 4),
          batchId = 1L)
        if (promote) ScalarQuant.promoteBatches(s, dir)
    }
    // binary bit-tier: full build for the serve twin + the same 80/20
    // grown/promoted lifecycle fixtures — closed-form packing, so all
    // three indexes are exact rebuilds of the one-shot table
    BinaryQuant.bqWriteIndex(s, d, s"$root/bq")
    Seq("bq_appended" -> false, "bq_promoted" -> true).foreach {
      case (name, promote) =>
        val dir = s"$root/$name"
        BinaryQuant.bqWriteIndex(s, d, dir,
          assignOnly = Some(org.apache.spark.sql.functions
            .col("vec_id") % 5 =!= 4))
        BinaryQuant.bqAppendBatch(s, dir,
          graft.Tables.embeddings(s, d)
            .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 4),
          batchId = 1L)
        if (promote) BinaryQuant.promoteBatches(s, dir)
    }
    // GDPR-erasure fixtures (r16): each deleted index is built the
    // hardest lifecycle-real way — 80% base + 20% committed append
    // batch + a tombstone batch over vec_id/doc_id % 7 == 6 (disjoint
    // from the probe ids 0–4), all live at once; the compacted twins
    // then fold the deletions into a fresh base. All serve the
    // delete-restricted oracles
    locally {
      import org.apache.spark.sql.functions.col
      val emb = graft.Tables.embeddings(s, d)
      val embDel = emb.filter(col("vec_id") % 7 === 6).select("vec_id")
      Seq("int8_deleted" -> false, "int8_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          ScalarQuant.sqWriteIndex(s, d, dir,
            assignOnly = Some(col("vec_id") % 5 =!= 4))
          ScalarQuant.sqAppendBatch(s, dir,
            emb.filter(col("vec_id") % 5 === 4), batchId = 1L)
          ScalarQuant.sqDeleteIds(s, dir, embDel, batchId = 1L)
          if (compact) ScalarQuant.compactDeletes(s, dir)
        }
      Seq("bq_deleted" -> false, "bq_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          BinaryQuant.bqWriteIndex(s, d, dir,
            assignOnly = Some(col("vec_id") % 5 =!= 4))
          BinaryQuant.bqAppendBatch(s, dir,
            emb.filter(col("vec_id") % 5 === 4), batchId = 1L)
          BinaryQuant.bqDeleteIds(s, dir, embDel, batchId = 1L)
          if (compact) BinaryQuant.compactDeletes(s, dir)
        }
      // the frozen-geometry families (r17): centroids / codebooks /
      // planes are fit once on the FULL corpus and deletion never
      // refits — the live-row anti-join IS the erasure, so a grown
      // index carrying tombstones serves exactly what a survivors-only
      // build under the same geometry serves (AnnEraseSpec pins that
      // identity; the driver rows pin the concrete rankings)
      Seq("ivf_deleted" -> false, "ivf_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          Similarity.ivfWriteIndex(s, d, dir,
            assignOnly = Some(col("vec_id") % 5 =!= 4))
          Similarity.ivfAppendBatch(s, dir,
            emb.filter(col("vec_id") % 5 === 4), batchId = 1L)
          Similarity.annDeleteIds(s, dir, embDel, batchId = 1L)
          if (compact) Similarity.compactAnnDeletes(s, dir)
        }
      Seq("ivfpq_deleted" -> false, "ivfpq_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          Similarity.ivfPqWriteIndex(s, d, dir,
            assignOnly = Some(col("vec_id") % 5 =!= 4))
          Similarity.ivfPqAppendBatch(s, dir,
            emb.filter(col("vec_id") % 5 === 4), batchId = 1L)
          Similarity.annDeleteIds(s, dir, embDel, batchId = 1L)
          if (compact)
            Similarity.compactAnnDeletes(s, dir, table = "codes")
        }
      Seq("lsh_deleted" -> false, "lsh_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          Similarity.lshWriteIndex(s, d, dir,
            assignOnly = Some(col("vec_id") % 5 =!= 4))
          Similarity.lshAppendBatch(s, dir,
            emb.filter(col("vec_id") % 5 === 4), batchId = 1L)
          Similarity.annDeleteIds(s, dir, embDel, batchId = 1L)
          if (compact)
            Similarity.compactAnnDeletes(s, dir, table = "buckets",
              partitionCol = "bucket")
        }
      val docs = graft.Tables.documents(s, d)
      Seq("bm25_deleted" -> false, "bm25_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          Search.buildIndex(s, d, dir,
            docFilter = Some(col("doc_id") % 5 =!= 4))
          Search.appendBatch(s, dir,
            docs.filter(col("doc_id") % 5 === 4), batchId = 1L)
          Search.deleteDocs(s, dir,
            docs.filter(col("doc_id") % 7 === 6), batchId = 1L)
          if (compact) Search.compactDeletes(s, dir)
        }
      // erasure reaches the dedup/curation indexes too: the bucket
      // index loses the tombstoned docs' pair rows (the canonical
      // consumer answers the survivors-only construction), the
      // position index drops their positions AND subtracts their
      // per-gram counts — a capped gram can re-enter the survivors'
      // span set, which the restricted oracle demands
      val docDel = docs.filter(col("doc_id") % 7 === 6).select("doc_id")
      Seq("minhash_deleted" -> false, "minhash_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          Dedup.minhashWriteIndex(s, d, dir,
            buildOnly = Some(col("doc_id") % 5 =!= 4))
          Dedup.minhashAppendBatch(s, dir,
            docs.filter(col("doc_id") % 5 === 4), batchId = 1L)
          Dedup.minhashDeleteIds(s, dir, docDel, batchId = 1L)
          if (compact) Dedup.compactBucketDeletes(s, dir)
        }
      Seq("substr_deleted" -> false, "substr_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          val all = docs.select("doc_id", "text")
          Substring.writePositionIndex(s,
            all.filter(col("doc_id") % 5 =!= 4), dir)
          Substring.appendPositionsBatch(s, dir,
            all.filter(col("doc_id") % 5 === 4), batchId = 1L)
          Substring.deletePositions(s, dir, docDel, batchId = 1L)
          if (compact) Substring.compactPositionDeletes(s, dir)
        }
      // the BPE index's erasure pair (r17): same lifecycle-real build
      // as substr_bpe (frozen full-corpus vocabulary, 80% base + one
      // append batch) plus the tombstone batch; the compacted twin
      // folds positions, counts AND symbol streams
      Seq("substr_bpe_deleted" -> false,
          "substr_bpe_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          Substring.writeBpeIndex(s, d, dir,
            buildOnly = Some(col("doc_id") % 5 =!= 4))
          Substring.bpeAppendBatch(s, dir,
            docs.filter(col("doc_id") % 5 === 4), batchId = 1L)
          Substring.deletePositions(s, dir, docDel, batchId = 1L)
          if (compact) Substring.compactPositionDeletes(s, dir)
        }
      // erasure reaches the DERIVED/MODEL artifacts too (r17): the
      // novelty first-seen index (min re-derivation + the one-pass
      // compaction) and the trained perplexity LM (additive count
      // subtraction, BM25's trick) — a right-to-be-forgotten request
      // that removed the documents but left their statistics standing
      // would not be an erasure
      Seq("novelty_deleted" -> false, "novelty_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          Dedup.noveltyWriteIndex(s, d, dir,
            buildOnly = Some(col("doc_id") % 5 =!= 4))
          Dedup.noveltyAppendBatch(s, dir,
            docs.filter(col("doc_id") % 5 === 4), batchId = 1L)
          Dedup.noveltyDeleteDocs(s, dir,
            docs.filter(col("doc_id") % 7 === 6), batchId = 1L)
          if (compact) Dedup.compactNoveltyDeletes(s, dir,
            docs.filter(col("doc_id") % 7 =!= 6))
        }
      Seq("ppl_deleted" -> false, "ppl_del_compacted" -> true)
        .foreach { case (name, compact) =>
          val dir = s"$root/$name"
          Perplexity.writeModel(s, d, dir,
            docFilter = Some(col("doc_id") % 5 =!= 4))
          Perplexity.appendBatch(s, dir,
            docs.filter(col("doc_id") % 5 === 4), batchId = 1L)
          Perplexity.deleteDocs(s, dir,
            docs.filter(col("doc_id") % 7 === 6), batchId = 1L)
          if (compact) Perplexity.compactDeletes(s, dir)
        }
    }
    // frozen BPE tokenizer: trained once here, applied by
    // q_bpe_encode_served (and to anything else) without retraining
    Bpe.writeModel(s, d, s"$root/bpe_model")
    // perplexity LM lifecycle fixture: counts for 80% of the corpus at
    // build time, the rest as one committed batch — counts are
    // additive, so the grown serve equals the inline train EXACTLY and
    // q_perplexity_served answers q_perplexity's full oracle
    val pplDir = s"$root/ppl_model"
    Perplexity.writeModel(s, d, pplDir,
      docFilter = Some(org.apache.spark.sql.functions
        .col("doc_id") % 5 =!= 4))
    Perplexity.appendBatch(s, pplDir,
      graft.Tables.documents(s, d)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 4),
      batchId = 1L)
    // the streaming tier's driver row: a real AvailableNow streaming
    // run over events, snapshotted; q_stream_hourly reads it and must
    // match the batch q_hourly_agg oracle
    graft.streaming.Streams.hourlyEventsSnapshot(s, d,
      s"$root/stream_hourly", s"$root/stream_hourly_ckpt")
    // second streaming row: native SESSION WINDOWS, snapshotted;
    // q_stream_sessions reads it and must match the batch
    // q_sessionize oracle
    graft.streaming.Streams.sessionEventsSnapshot(s, d,
      s"$root/stream_sessions", s"$root/stream_sessions_ckpt")
    // third streaming row: the stream-stream interval join,
    // snapshotted; q_stream_join must match the batch interval join
    graft.streaming.Streams.attributionSnapshot(s, d,
      s"$root/stream_join", s"$root/stream_join_ckpt")
    // fourth streaming row: SLIDING windows, snapshotted;
    // q_stream_sliding must match the batch q_sliding oracle
    graft.streaming.Streams.slidingEventsSnapshot(s, d,
      s"$root/stream_sliding", s"$root/stream_sliding_ckpt")
  }

  /** The GDPR-erasure rows' oracles: the inline full recomputes
    * RESTRICTED to the surviving rows (vec_id/doc_id % 7 ≠ 6 — the
    * prepare fixtures' tombstone slice). Spliced from the base oracles
    * with require-guarded anchors (the incrOracleSql ADVICE rule: a
    * wording drift must fail loudly, not silently gate against the
    * unrestricted form). For BM25 the restriction lands in the toks
    * CTE, so N, Σdl, df and every score are the from-scratch
    * survivors-only model — exactly what a correct erasure must serve.
    */
  private lazy val deletedBruteOracle: String = {
    val base = baseOracle("q_ann_brute")
    val out = base.replace("WHERE e.vec_id <> q.query_id)",
      "WHERE e.vec_id <> q.query_id AND e.vec_id % 7 <> 6)")
    require(out != base,
      "deletedBruteOracle: candidate-restriction splice found no anchor")
    out
  }

  private lazy val deletedBm25Oracle: String = {
    val base = baseOracle("q_bm25")
    val out = base.replace("FROM documents)",
      "FROM documents WHERE doc_id % 7 <> 6)")
    require(out != base,
      "deletedBm25Oracle: corpus-restriction splice found no anchor")
    out
  }

  private lazy val deletedNoveltyOracle: String = {
    val base = baseOracle("q_novelty")
    // one anchor: the shingle CTE's corpus scan — grams, first-seen
    // minima and per-doc scores all flow from the restricted toks
    val out = base.replace("FROM documents\n",
      "FROM documents WHERE doc_id % 7 <> 6\n")
    require(out != base,
      "deletedNoveltyOracle: corpus-restriction splice found no anchor")
    out
  }

  private lazy val deletedPerplexityOracle: String = {
    val base = baseOracle("q_perplexity")
    // the toks CTE feeds the training slice, the scored docs AND the
    // tertile thresholds — one splice restricts the whole chain
    val out = base.replace("FROM documents),",
      "FROM documents WHERE doc_id % 7 <> 6),")
    require(out != base,
      "deletedPerplexityOracle: corpus-restriction splice found no anchor")
    out
  }

  private lazy val deletedPplStatsOracle: String = {
    val base = baseOracle("q_ppl_model_stats")
    val out = base.replace("FROM documents WHERE lang = 'en'),",
      "FROM documents WHERE lang = 'en' AND doc_id % 7 <> 6),")
    require(out != base,
      "deletedPplStatsOracle: corpus-restriction splice found no anchor")
    out
  }

  private lazy val deletedCanonicalOracle: String = {
    val base = baseOracle("q_canonical_docs")
    // one anchor: the shingle CTE's corpus scan — pairs, components,
    // features and members all flow from the restricted toks
    val out = base.replace("FROM documents\n",
      "FROM documents WHERE doc_id % 7 <> 6\n")
    require(out != base,
      "deletedCanonicalOracle: corpus-restriction splice found no anchor")
    out
  }

  /** q_ann_brute_agg produces identical results to q_ann_brute (the
    * aggregate formulation changes the plan, not the semantics), so it
    * shares the same oracle SQL.
    */
  lazy val oracle: Map[String, String] =
    baseOracle + ("q_ann_brute_agg" -> baseOracle("q_ann_brute")) +
      // serve paths are bit-identical to their inline twins (pinned by
      // the DedupSimilaritySpec round-trips), so they share oracles —
      // the golden-backed ones inherit the sf0.01-only caveat
      // the grown count model scores EXACTLY as the inline train
      // (additive counts) — a full oracle, not a golden
      // exhaustive-probe pruning is row-identical to the exact maxsim
      // for any corpus (total candidate set, same reduction) — the
      // shared oracle is a full recompute, not a golden
      ("q_maxsim_pruned" -> baseOracle("q_maxsim")) +
      ("q_perplexity_served" -> baseOracle("q_perplexity")) +
      // frozen-merge replay == the inline greedy train encode (same
      // merges, same fold) — shares the golden and its re-pin caveat
      ("q_bpe_encode_served" -> baseOracle("q_bpe_encode_stats")) +
      ("q_ann_lsh_served" -> baseOracle("q_ann_lsh")) +
      ("q_ann_lsh_appended_served" -> baseOracle("q_ann_lsh")) +
      ("q_ann_lsh_promoted_served" -> baseOracle("q_ann_lsh")) +
      ("q_ann_ivf_served" -> baseOracle("q_ann_ivf")) +
      // append-parity: frozen geometry ⇒ the grown index serves the
      // one-shot build's exact ranking (spec-pinned; golden shared)
      ("q_ann_ivf_appended_served" -> baseOracle("q_ann_ivf")) +
      // promotion moves rows, never geometry; refit's deterministic
      // fit over the accreted full corpus reproduces the one-shot
      // geometry — both serve the q_ann_ivf golden bit-for-bit
      ("q_ann_ivf_promoted_served" -> baseOracle("q_ann_ivf")) +
      ("q_ann_ivf_refit_served" -> baseOracle("q_ann_ivf")) +
      ("q_ann_ivf_sharded_served" -> baseOracle("q_ann_ivf_sharded")) +
      ("q_incremental_dedup_served" -> baseOracle("q_incremental_dedup")) +
      // the grown first-seen index min-folds to the global min, so the
      // served novelty answers the inline full-recompute oracle
      ("q_novelty_served" -> baseOracle("q_novelty")) +
      // pairs off the persisted full-corpus bucket index are
      // bit-identical to the inline minhash pair set (signatures are a
      // pure function of text), so the served consumers answer the
      // inline full oracles; the served report's only index-fed
      // component (the substring cut) carries the
      // q_substring_scrub_served parity
      ("q_canonical_docs_served" -> baseOracle("q_canonical_docs")) +
      ("q_syndication_served" -> baseOracle("q_syndication")) +
      ("q_curation_report_served" -> baseOracle("q_curation_report")) +
      // the GDPR-erasure rows: full recomputes restricted to the
      // surviving ids — a deleted row ranking anywhere, or a
      // survivor's score still carrying the deleted docs' df/N/Σdl,
      // fails the hash compare
      ("q_ann_int8_deleted_served" -> deletedBruteOracle) +
      ("q_ann_int8_del_compacted_served" -> deletedBruteOracle) +
      ("q_ann_bq_deleted_served" -> deletedBruteOracle) +
      ("q_ann_bq_del_compacted_served" -> deletedBruteOracle) +
      // the frozen-geometry tiers' compacted twins share the deleted
      // goldens — compaction folds rows, never geometry or answers
      ("q_ann_ivf_del_compacted_served" ->
        baseOracle("q_ann_ivf_deleted_served")) +
      ("q_ann_ivfpq_del_compacted_served" ->
        baseOracle("q_ann_ivfpq_deleted_served")) +
      ("q_ann_lsh_del_compacted_served" ->
        baseOracle("q_ann_lsh_deleted_served")) +
      ("q_bm25_deleted_served" -> deletedBm25Oracle) +
      ("q_bm25_del_compacted_served" -> deletedBm25Oracle) +
      ("q_canonical_docs_deleted_served" -> deletedCanonicalOracle) +
      ("q_canonical_docs_del_compacted_served" ->
        deletedCanonicalOracle) +
      ("q_substring_scrub_deleted_served" ->
        graft.operators.Substring.deletedScrubOracleSql()) +
      ("q_substring_scrub_del_compacted_served" ->
        graft.operators.Substring.deletedScrubOracleSql()) +
      // derived/model-index erasure (r17): survivors-restricted full
      // recomputes — a min still vouched by an erased doc, a count it
      // still inflates, or a tertile it still shifts fails the hash
      ("q_novelty_deleted_served" -> deletedNoveltyOracle) +
      ("q_novelty_del_compacted_served" -> deletedNoveltyOracle) +
      ("q_perplexity_deleted_served" -> deletedPerplexityOracle) +
      ("q_perplexity_del_compacted_served" -> deletedPerplexityOracle) +
      ("q_ppl_model_stats_deleted" -> deletedPplStatsOracle) +
      // served MMR: index-exact shortlist + raw-store relevance ⇒ the
      // identical greedy trajectory — shares the unrolled-rounds oracle
      ("q_mmr_rerank_served" -> baseOracle("q_mmr_rerank")) +
      ("q_ann_ivfpq_served" -> baseOracle("q_ann_ivfpq")) +
      // compressed append-parity: frozen centroids+codebooks ⇒ the
      // grown codes table is row-identical to the one-shot encode
      ("q_ann_ivfpq_appended_served" -> baseOracle("q_ann_ivfpq")) +
      // the PQ refit's deterministic fits over the full raw store
      // reproduce the one-shot model ⇒ same golden
      ("q_ann_ivfpq_refit_served" -> baseOracle("q_ann_ivfpq")) +
      // promotion moves code rows, never the frozen model ⇒ the folded
      // index is row-identical to the grown one and serves the same
      // golden (closes the promote leg for the last ANN family)
      ("q_ann_ivfpq_promoted_served" -> baseOracle("q_ann_ivfpq")) +
      ("q_ann_ivfpq_sharded_served" -> baseOracle("q_ann_ivfpq_sharded")) +
      // nDCG@10 of the IVF ranking (the pinned annIvfGolden — re-pins
      // automatically with q_ann_ivf's) against the FULL brute-force
      // recompute; the IDCG normalizer is the same Scala double
      // injected verbatim, so the 6-dp metric is engine-exact
      ("q_retrieval_ndcg" ->
        s"""WITH brute AS (${baseOracle("q_ann_brute")}),
           |ivf AS (SELECT CAST(q AS BIGINT) AS query_id,
           |  CAST(v AS BIGINT) AS vec_id, CAST(r AS INT) AS rk
           |  FROM (VALUES
           |${annIvfGolden}) AS t(q, v, s, r))
           |SELECT i.query_id, count(b.vec_id) AS n_hits,
           |  round(sum(CASE WHEN b.vec_id IS NOT NULL
           |      THEN 1.0 / log2(i.rk + 1) ELSE 0 END)
           |    / ${Similarity.idcgAt(10)}, 6) AS ndcg
           |FROM ivf i LEFT JOIN brute b
           |  ON b.query_id = i.query_id AND b.vec_id = i.vec_id
           |GROUP BY i.query_id""".stripMargin) +
      // the BM25 serve path reads back exactly the frames the inline
      // twin computes (one shared scorer), so one oracle covers both;
      // the grown index is an exact sum-fold of disjoint-doc partials,
      // so it answers the same full-corpus oracle
      ("q_bm25_served" -> baseOracle("q_bm25")) +
      ("q_bm25_appended_served" -> baseOracle("q_bm25")) +
      // the served phrase matcher explodes the index's positions
      // arrays back to the exact (term, doc, pos) rows the inline
      // twin derives from the corpus — same matcher, same oracle
      ("q_bm25_phrase_served" -> baseOracle("q_bm25_phrase")) +
      // the int8 tier's ranking rows: quantized shortlist + exact
      // re-rank recovers the exact brute-force ranking (recall-1.0
      // pinned by answering the SAME full oracle), inline and served
      ("q_ann_int8" -> baseOracle("q_ann_brute")) +
      ("q_ann_int8_served" -> baseOracle("q_ann_brute")) +
      ("q_ann_int8_appended_served" -> baseOracle("q_ann_brute")) +
      ("q_ann_int8_promoted_served" -> baseOracle("q_ann_brute")) +
      // the binary tier's ranking rows: Hamming shortlist + exact
      // re-rank recovers the exact brute-force ranking at the
      // registry's refine width (recall-1.0 pinned by answering the
      // SAME full oracle), inline and across the whole lifecycle
      ("q_ann_bq" -> baseOracle("q_ann_brute")) +
      ("q_ann_bq_served" -> baseOracle("q_ann_brute")) +
      ("q_ann_bq_appended_served" -> baseOracle("q_ann_brute")) +
      ("q_ann_bq_promoted_served" -> baseOracle("q_ann_brute")) +
      // Matryoshka truncation recall: full recompute — prefix-sliced
      // cosine rankings at each dim, round-then-rank at 6 dp (the
      // convention that keeps cross-engine ulps out of the rank order),
      // overlap counted against the full-dim ranking from the same CTE
      ("q_matryoshka_recall" ->
        // the prefix cosine uses cosineSql's list_reduce sequential
        // fold, not list_sum — the pinned accumulation-order contract
        // that keeps raw-double ranking bit-stable cross-engine
        s"""WITH dims(m) AS (VALUES (8),(16),(32),(64)),
          |q AS (
          |  SELECT vec_id AS query_id, embedding AS qv
          |  FROM embeddings WHERE vec_id < 5),
          |pairs AS (
          |  SELECT dims.m, q.query_id, e.vec_id,
          |    round(${cosineSql("e.embedding[1:dims.m]",
            "q.qv[1:dims.m]")}
          |      + 1e-12, 6) AS simk
          |  FROM embeddings e CROSS JOIN q CROSS JOIN dims
          |  WHERE e.vec_id <> q.query_id),
          |topk AS (
          |  SELECT m, query_id, vec_id FROM (
          |    SELECT *, row_number() OVER (PARTITION BY m, query_id
          |              ORDER BY simk DESC, vec_id) AS rk
          |    FROM pairs)
          |  WHERE rk <= 10),
          |fulltop AS (
          |  SELECT query_id AS fq, vec_id AS fv FROM topk WHERE m = 64)
          |SELECT t.m AS trunc_dim, t.query_id,
          |  CAST(count(f.fv) AS BIGINT) AS n_hits,
          |  round(count(f.fv) / 10.0 + 1e-9, 4) AS recall
          |FROM topk t LEFT JOIN fulltop f
          |  ON f.fq = t.query_id AND f.fv = t.vec_id
          |GROUP BY t.m, t.query_id""".stripMargin) +
      // full recompute of every stored sign bit from the raw floats:
      // bit_i = (x_i >= 0), 1-based dim — pins the packing formula and
      // the packed-BIGINT parquet round-trip cross-engine
      ("q_bq_bits" ->
        """SELECT vec_id, CAST(u.dim AS INT) AS dim, u.bit AS bit
          |FROM (
          |  SELECT vec_id,
          |    unnest(list_transform(embedding,
          |      (x, i) -> {'dim': i,
          |        'bit': CAST(CASE WHEN CAST(x AS DOUBLE) >= 0
          |          THEN 1 ELSE 0 END AS INT)})) AS u
          |  FROM embeddings)""".stripMargin) +
      // hybrid RRF: both legs recomputed exhaustively (the BM25 CTEs
      // verbatim + the brute cosine ranking), fused 1/(60+rank),
      // rounded to 6 dp before the final rank — served twin included
      // because its int8 dense leg re-ranks to the exact brute ranking
      ("q_hybrid_rrf" -> hybridRrfOracle) +
      ("q_hybrid_rrf_served" -> hybridRrfOracle) +
      // bq dense leg: exact-recall Hamming-shortlist re-rank ⇒ the
      // same dense ranking ⇒ the same full fusion oracle
      ("q_hybrid_rrf_bq_served" -> hybridRrfOracle) +
      ("q_rerank" -> rerankOracle) +
      ("q_rerank_served" -> rerankOracle) +
      // the bq-legged cascade serves the identical shortlist (exact
      // dense recall), so the same full cascade oracle covers it
      ("q_rerank_bq_served" -> rerankOracle) +
      // full recompute of every stored int8 code from the raw floats:
      // closed-form half-up quantizer (floor(x/s + 0.5) — explicit,
      // because engine round() tie semantics differ), clamped ±127
      ("q_int8_codes" ->
        """WITH qz AS (
          |  SELECT vec_id, embedding,
          |    CASE WHEN list_max(list_transform(embedding,
          |           x -> abs(CAST(x AS DOUBLE)))) = 0 THEN 1.0
          |         ELSE list_max(list_transform(embedding,
          |           x -> abs(CAST(x AS DOUBLE)))) / 127 END AS scale
          |  FROM embeddings),
          |ex AS (
          |  SELECT vec_id,
          |    unnest(list_transform(embedding,
          |      (x, i) -> {'dim': i,
          |        'code': CAST(greatest(-127, least(127,
          |          floor(CAST(x AS DOUBLE) / scale + 0.5))) AS INT)}))
          |      AS u
          |  FROM qz)
          |SELECT vec_id, CAST(u.dim AS INT) AS dim, u.code AS code
          |FROM ex""".stripMargin)

  /** q_hybrid_rrf(_served): the q_bm25 CTEs verbatim (sparse leg) +
    * the q_ann_brute cosine ranking over probes 1–3 (dense leg), RRF
    * fused. Round-then-rank at 6 dp mirrors Hybrid.fuse exactly.
    * Split so q_rerank's oracle composes the same cascade.
    */
  private val hybridCtes: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
      |  FROM documents),
      |stats AS (
      |  SELECT count(*) AS n, CAST(sum(length(ts)) AS DOUBLE) AS sumdl
      |  FROM toks),
      |queries(query_id, term) AS (
      |  VALUES (1, 'hash'), (1, 'join'),
      |         (2, 'window'), (2, 'agg'), (2, 'stream'),
      |         (3, 'dup'), (3, 'scan')),
      |post AS (
      |  SELECT term, doc_id, dl, count(*) AS tf FROM (
      |    SELECT doc_id, length(ts) AS dl, unnest(ts) AS term
      |    FROM toks)
      |  GROUP BY term, doc_id, dl),
      |tstats AS (SELECT term, count(*) AS df FROM post GROUP BY term),
      |scored AS (
      |  SELECT q.query_id, p.doc_id,
      |   round(sum(ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
      |     * (p.tf * 2.2)
      |     / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / (s.sumdl / s.n)))),
      |    4) AS score
      |  FROM post p
      |  JOIN queries q USING (term)
      |  JOIN tstats t USING (term), stats s
      |  GROUP BY q.query_id, p.doc_id),
      |sparse AS (
      |  SELECT query_id, doc_id, rank FROM (
      |    SELECT query_id, doc_id, row_number() OVER (
      |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
      |    FROM scored) WHERE rank <= 10),
      |qq AS (
      |  SELECT vec_id AS query_id, embedding AS qv
      |  FROM embeddings WHERE vec_id IN (1, 2, 3)),
      |pairs AS (
      |  SELECT q.query_id, e.vec_id,
      |   list_sum(list_transform(e.embedding,
      |     (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
      |   / (sqrt(list_sum(list_transform(e.embedding,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      * sqrt(list_sum(list_transform(q.qv,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
      |  FROM embeddings e CROSS JOIN qq q WHERE e.vec_id <> q.query_id),
      |dense AS (
      |  SELECT query_id, vec_id AS doc_id, rank FROM (
      |    SELECT query_id, vec_id, row_number() OVER (
      |      PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |    FROM pairs) WHERE rank <= 10),
      |legs AS (SELECT * FROM sparse UNION ALL SELECT * FROM dense),
      |fused AS (
      |  SELECT query_id, doc_id,
      |    round(sum(1.0 / (60 + rank)) + 1e-12, 6) AS rrf
      |  FROM legs GROUP BY query_id, doc_id)""".stripMargin

  private val hybridRrfOracle: String = hybridCtes +
    """
      |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf FROM (
      |  SELECT query_id, doc_id, rrf, row_number() OVER (
      |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
      |  FROM fused) WHERE rank <= 10""".stripMargin

  /** q_rerank: the full cascade recomputed — the hybrid CTEs, the
    * RRF top-10 shortlist, then the cross-encoder-style pairwise
    * score (0.6·cosine + 0.4·term-jaccard, round-then-rank at 6 dp)
    * mirroring Hybrid.rerank exactly.
    */
  private val rerankOracle: String = hybridCtes +
    """,
      |cand AS (
      |  SELECT query_id, doc_id, rrf FROM (
      |    SELECT query_id, doc_id, rrf, row_number() OVER (
      |      PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
      |    FROM fused) WHERE rank <= 10),
      |dtt AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(string_split(text, ' '),
      |      t -> t <> '')) AS dts
      |  FROM documents),
      |qt AS (
      |  SELECT query_id, list_sort(list(DISTINCT term)) AS qts
      |  FROM queries GROUP BY query_id),
      |feat AS (
      |  SELECT c.query_id, c.doc_id, c.rrf,
      |    round(0.6 * (
      |        list_sum(list_transform(de.embedding,
      |          (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
      |        / (sqrt(list_sum(list_transform(de.embedding,
      |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |           * sqrt(list_sum(list_transform(q.qv,
      |               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
      |      + 0.4 * (CAST(len(list_intersect(d.dts, qt.qts)) AS DOUBLE)
      |          / len(list_distinct(list_concat(d.dts, qt.qts)))),
      |      6) + 0.0 AS rerank_score
      |  FROM cand c
      |  JOIN dtt d USING (doc_id)
      |  JOIN embeddings de ON de.vec_id = c.doc_id
      |  JOIN qq q ON q.query_id = c.query_id
      |  JOIN qt ON qt.query_id = c.query_id)
      |SELECT query_id, CAST(rank AS INT) AS rank, doc_id,
      |  rerank_score, rrf
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY rerank_score DESC, doc_id) AS rank
      |  FROM feat) WHERE rank <= 10""".stripMargin

  /** Word-3-gram shingle sets per document, as a DuckDB CTE — mirrors
    * Dedup.shinglesFromTokens (whitespace tokens, empties dropped,
    * short docs collapse to one whole-text shingle, distinct).
    */
  /** q_contamination's full recompute, shared verbatim with
    * q_curation_report's contaminated_docs component (nested as a
    * subquery there — post-hoc text surgery is banned, r15 ADVICE). */
  private val contaminationOracle =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |   list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, source,
      |   unnest(list_transform(range(1, len(t) - 2),
      |     i -> array_to_string(t[i:i+3], ' '))) AS g
      |  FROM toks),
      |probe AS (SELECT DISTINCT g FROM g WHERE doc_id < 3)
      |SELECT c.doc_id, c.source, count(DISTINCT c.g) AS n_matched
      |FROM g c JOIN probe p ON c.g = p.g
      |WHERE c.doc_id >= 3
      |GROUP BY 1, 2""".stripMargin

  /** q_curation_report recomputed END-TO-END: every component is the
    * matching query's own oracle construction — the exact-dup keep
    * rule over raw text, the exhaustive blocked Jaccard (the form
    * q_ngram_jaccard's oracle proves the LSH recalls exactly), the
    * full substring-scrub reassembly and the contamination recompute
    * nested as subqueries, the PII regexes and bigram-repetition
    * signal inline — re-aggregated per source.
    */
  private def curationReportOracle: String = {
    val email = graft.operators.Scrub.EmailRe
    val phone = graft.operators.Scrub.PhoneRe
    val ipv4 = graft.operators.Scrub.Ipv4Re
    s"""$shingleCte,
       |jac AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM sh a JOIN sh b
       |    ON a.lang = b.lang AND a.source = b.source
       |    AND a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |     / len(list_distinct(a.sh || b.sh)) >= 0.5),
       |d0 AS (
       |  SELECT d.doc_id, d.source, len(t.t) AS ws,
       |    CASE WHEN d.doc_id <> min(d.doc_id) OVER (PARTITION BY d.text)
       |      THEN 1 ELSE 0 END AS exact_dup,
       |    CASE WHEN regexp_matches(d.text, '$email')
       |      OR regexp_matches(d.text, '$phone')
       |      OR regexp_matches(d.text, '$ipv4')
       |      THEN 1 ELSE 0 END AS pii
       |  FROM documents d JOIN toks t ON d.doc_id = t.doc_id),
       |rep0 AS (
       |  SELECT doc_id, list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i + 1]) AS bigrams
       |  FROM toks),
       |rep AS (
       |  SELECT doc_id, CASE WHEN len(bigrams) > 0 AND
       |      1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams)
       |        > 0.2
       |    THEN 1 ELSE 0 END AS repetitive
       |  FROM rep0),
       |sc AS (SELECT doc_id, n_cut FROM (
       |${graft.operators.Substring.scrubOracleSql()})),
       |ct AS (SELECT doc_id FROM (
       |$contaminationOracle))
       |SELECT d0.source, count(*) AS n_docs,
       | CAST(sum(d0.ws) AS BIGINT) AS ws_tokens,
       | CAST(sum(d0.exact_dup) AS BIGINT) AS exact_dup_docs,
       | CAST(count(jac.doc_id) AS BIGINT) AS near_dup_docs,
       | CAST(sum(sc.n_cut) AS BIGINT) AS substr_cut_tokens,
       | CAST(sum(d0.pii) AS BIGINT) AS pii_docs,
       | CAST(count(ct.doc_id) AS BIGINT) AS contaminated_docs,
       | CAST(sum(rep.repetitive) AS BIGINT) AS repetitive_docs
       |FROM d0
       |LEFT JOIN rep ON d0.doc_id = rep.doc_id
       |LEFT JOIN jac ON d0.doc_id = jac.doc_id
       |LEFT JOIN sc ON d0.doc_id = sc.doc_id
       |LEFT JOIN ct ON d0.doc_id = ct.doc_id
       |GROUP BY d0.source""".stripMargin
  }

  /** q_mix_manifest's full oracle: the curation report's component CTE
    * chain (dup/PII/contamination/repetition flags + the substring
    * scrub, all recomputed from scratch) extended with the manifest
    * tail — kept-doc clean token mass, temperature weights over clean
    * tokens (α = 0.3), the 50k-token budget allocation and the implied
    * epochs. Derived doubles at 4 dp (the pow() ulp contract).
    */
  private def mixManifestOracle: String = {
    val base = curationReportOracle
    val anchor = "SELECT d0.source, count(*) AS n_docs,"
    require(base.contains(anchor),
      "mixManifestOracle: final-SELECT anchor missing from the report " +
        "oracle")
    val ctes = base.substring(0, base.indexOf(anchor)).trim
      .stripSuffix(",")
    s"""$ctes,
       |flags AS (
       |  SELECT d0.doc_id, d0.source, d0.ws,
       |    coalesce(sc.n_cut, 0) AS n_cut,
       |    CASE WHEN d0.exact_dup = 1 OR d0.pii = 1
       |      OR rep.repetitive = 1 OR jac.doc_id IS NOT NULL
       |      OR ct.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dropped
       |  FROM d0
       |  LEFT JOIN rep ON d0.doc_id = rep.doc_id
       |  LEFT JOIN jac ON d0.doc_id = jac.doc_id
       |  LEFT JOIN sc ON d0.doc_id = sc.doc_id
       |  LEFT JOIN ct ON d0.doc_id = ct.doc_id),
       |per AS (
       |  SELECT source, count(*) AS raw_docs,
       |    CAST(sum(ws) AS BIGINT) AS raw_tokens,
       |    CAST(sum(CASE WHEN dropped = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS kept_docs,
       |    CAST(sum(CASE WHEN dropped = 0 THEN ws - n_cut ELSE 0 END)
       |      AS BIGINT) AS clean_tokens
       |  FROM flags GROUP BY source),
       |tot AS (SELECT CAST(sum(clean_tokens) AS DOUBLE) AS ctt FROM per),
       |smw AS (SELECT per.*, clean_tokens / ctt AS p,
       |    pow(clean_tokens / ctt, 0.3) AS pa
       |  FROM per, tot),
       |zz AS (SELECT sum(pa) AS z FROM smw)
       |SELECT source, raw_docs, raw_tokens, kept_docs, clean_tokens,
       |  round(p, 4) AS clean_share,
       |  round(pa / z, 4) AS q_share,
       |  round(pa / z * 50000, 4) AS alloc_tokens,
       |  round(pa / z * 50000 / clean_tokens, 4) AS epochs
       |FROM smw, zz""".stripMargin
  }

  private val shingleCte =
    """WITH toks AS (
      |  SELECT doc_id, lang, source,
      |   list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, lang, source,
      |   list_distinct(CASE WHEN len(t) < 3
      |     THEN [array_to_string(t, ' ')]
      |     ELSE list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS sh
      |  FROM toks
      |)""".stripMargin

  /** Sequential-order cosine over two float lists in double — same
    * accumulation order as Similarity.cosine / FusedCosineSimilarity,
    * so values are bit-identical.
    */
  /** q_coreset's full-recompute oracle: the greedy farthest-point loop
    * unrolled into k−1 chained CTE rounds. Each round picks the
    * candidate with the maximum running min-distance (6-dp rounded,
    * ties by vec_id — the Spark side's exact contract) and folds the
    * new center into every survivor's `mind` via least(). The seed is
    * min(vec_id), so the whole trajectory is derived from the parquet
    * floats — no golden to rot.
    */
  private def coresetOracle: String = {
    val k = 8
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |seed AS (SELECT min(vec_id) AS sid FROM e),
       |d0 AS (SELECT e.vec_id, e.embedding,
       |  round(1 - ${cosineSql("e.embedding", "s.se")}, 6) AS mind
       |  FROM e CROSS JOIN (SELECT embedding AS se FROM e
       |    JOIN seed ON vec_id = sid) s
       |  WHERE e.vec_id <> (SELECT sid FROM seed))""".stripMargin
    val picks = scala.collection.mutable.Buffer(
      "SELECT CAST(0 AS INT) AS rnd, (SELECT sid FROM seed) AS vec_id, " +
        "CAST(NULL AS DOUBLE) AS mind")
    var prev = "d0"
    (1 until k).foreach { r =>
      sb ++= s""",
         |p$r AS (SELECT vec_id, mind FROM $prev
         |  ORDER BY mind DESC, vec_id LIMIT 1),
         |d$r AS (SELECT d.vec_id, d.embedding,
         |  least(d.mind,
         |    round(1 - ${cosineSql("d.embedding", "s.embedding")}, 6))
         |    AS mind
         |  FROM $prev d CROSS JOIN (SELECT e.embedding FROM e
         |    JOIN p$r ON e.vec_id = p$r.vec_id) s
         |  WHERE d.vec_id <> (SELECT vec_id FROM p$r))""".stripMargin
      picks += s"SELECT CAST($r AS INT) AS rnd, vec_id, mind FROM p$r"
      prev = s"d$r"
    }
    sb ++= "\n" + picks.mkString(" UNION ALL ")
    sb.toString
  }

  /** q_mmr_rerank's oracle: the greedy MMR trajectory replayed as
    * unrolled per-query rounds (the coresetOracle pattern with a
    * partitioned argmax instead of LIMIT 1) — exact shortlist, pairwise
    * cosine table, then k chained (score → argmax → accumulate) blocks
    * on 6-dp-rounded objectives. `${1 - lam}` interpolates the exact
    * IEEE double Scala computes (0.30000000000000004, not the literal
    * 0.3) so both engines weight the penalty with the same bits.
    */
  private def mmrOracle: String = {
    val (kCand, k, lam) = (12, 5, 0.7)
    val sb = new StringBuilder
    sb ++= s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv
       |  FROM embeddings WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, e.embedding,
       |   ${cosineSql("e.embedding", "q.qv")} AS rel
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
       |cand AS (
       |  SELECT query_id, vec_id, embedding, rel FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, vec_id) AS rk FROM scored)
       |  WHERE rk <= $kCand),
       |ps AS (
       |  SELECT a.query_id, a.vec_id AS vi, b.vec_id AS vj,
       |   ${cosineSql("a.embedding", "b.embedding")} AS cs
       |  FROM cand a JOIN cand b ON b.query_id = a.query_id
       |    AND b.vec_id <> a.vec_id),
       |p0 AS (
       |  SELECT query_id, vec_id, round($lam * rel + 1e-12, 6) AS score,
       |   0 AS rnd FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY round($lam * rel + 1e-12, 6) DESC, vec_id) AS rk
       |    FROM cand) WHERE rk = 1),
       |sel0 AS (SELECT query_id, vec_id, score, rnd FROM p0)""".stripMargin
    var prev = "sel0"
    (1 until k).foreach { t =>
      sb ++= s""",
         |m$t AS (
         |  SELECT c.query_id, c.vec_id,
         |   round($lam * c.rel - ${1 - lam} * max(ps.cs) + 1e-12, 6)
         |     AS score
         |  FROM cand c
         |  JOIN $prev s ON s.query_id = c.query_id
         |  JOIN ps ON ps.query_id = c.query_id AND ps.vi = c.vec_id
         |    AND ps.vj = s.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM $prev x
         |    WHERE x.query_id = c.query_id AND x.vec_id = c.vec_id)
         |  GROUP BY c.query_id, c.vec_id, c.rel),
         |p$t AS (
         |  SELECT query_id, vec_id, score, $t AS rnd FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, vec_id) AS rk FROM m$t)
         |  WHERE rk = 1),
         |sel$t AS (SELECT * FROM $prev UNION ALL
         |  SELECT query_id, vec_id, score, rnd FROM p$t)""".stripMargin
      prev = s"sel$t"
    }
    sb ++= s"\nSELECT query_id, vec_id, CAST(rnd AS INT) AS rnd, " +
      s"score FROM $prev"
    sb.toString
  }

  private def cosineSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
       |    (acc, x) -> acc + x)
       |  / (sqrt(list_reduce(list_transform($a,
       |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |       (acc, x) -> acc + x))
       |     * sqrt(list_reduce(list_transform($b,
       |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |         (acc, x) -> acc + x)))""".stripMargin

  private lazy val baseOracle: Map[String, String] = Map(
    // chunking: starts 0, 48, … while inside the doc; window 64; the
    // tail window may be short; 1-based chunk_idx = start/stride + 1
    "q_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, ts, unnest(range(0, len(ts), 48)) AS start
        |  FROM toks WHERE len(ts) > 0)
        |SELECT doc_id, CAST(start // 48 + 1 AS INT) AS chunk_idx,
        |  CAST(start AS INT) AS start,
        |  CAST(len(ts[start + 1 : start + 64]) AS INT) AS n_tokens,
        |  array_to_string(ts[start + 1 : start + 64], ' ') AS chunk
        |FROM st""".stripMargin,
    // stratified split: rank by the Knuth hash within each lang, cut
    // at integer-division boundaries (80/10/10)
    "q_data_splits" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    (doc_id * 2654435761) % 4294967296 AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |      AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM h)
        |SELECT doc_id, lang,
        |  CASE WHEN rk <= (n * 80) // 100 THEN 'train'
        |       WHEN rk <= (n * 80) // 100 + (n * 10) // 100 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r""".stripMargin,
    // BM25 index fsck: df histogram recomputed from the corpus —
    // integer binary-length buckets, engine-exact at power boundaries
    "q_bm25_index_stats" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |post AS (
        |  SELECT term, doc_id FROM (
        |    SELECT doc_id, unnest(ts) AS term FROM toks)
        |  GROUP BY term, doc_id),
        |tstats AS (SELECT term, count(*) AS df FROM post GROUP BY term)
        |SELECT CAST(length(bin(df)) - 1 AS INT) AS df_bucket,
        |  count(*) AS n_terms, CAST(sum(df) AS BIGINT) AS sum_df
        |FROM tstats GROUP BY df_bucket""".stripMargin,
    // JL sign random projection: full recompute — the sign matrix is a
    // closed-form integer hash of (i, j), so DuckDB regenerates it
    // exactly; 4 dp on the fixed-length dot products is the shared
    // sum-of-doubles contract; "+ 0.0" launders DuckDB's -0.0 on
    // near-zero projections (Spark's BigDecimal round never signs zero)
    "q_rand_proj" ->
      """SELECT vec_id, CAST(j AS INT) AS dim,
        |  round(list_sum(list_transform(embedding,
        |    (x, i) -> CAST(x AS DOUBLE) *
        |      (CASE WHEN ((i * 2654435761 + j * 1013904223)
        |          % 4294967296) // 65536 % 2 = 0
        |        THEN 1.0 ELSE -1.0 END)))
        |    / sqrt(8.0), 4) + 0.0 AS v
        |FROM embeddings, (SELECT unnest(range(1, 9)) AS j)""".stripMargin,
    // BPE iteration-0: weighted character-pair counts (word-final char
    // tagged '</w>') recomputed from the raw corpus — pins the
    // frequency-weighted pair-counting machinery under the merge loop
    "q_bpe_pair_counts" ->
      """WITH wf AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '),
        |      t -> t <> '')) AS word
        |    FROM documents) GROUP BY word),
        |syms AS (
        |  SELECT freq,
        |    list_transform(range(1, len(word) + 1),
        |      i -> CASE WHEN i = len(word) THEN word[i] || '</w>'
        |           ELSE word[i] END) AS s
        |  FROM wf),
        |pairs AS (
        |  SELECT freq, s[i] AS l, s[i + 1] AS r
        |  FROM (SELECT freq, s, unnest(range(1, len(s))) AS i
        |        FROM syms))
        |SELECT l, r, CAST(sum(freq) AS BIGINT) AS n
        |FROM pairs GROUP BY l, r""".stripMargin,
    // embedding covariance, upper triangle: full recompute — avg of
    // products minus product of avgs over every (i ≤ j) column pair.
    // `+ 0.0` launders DuckDB's -0.0 (its round() keeps the sign of
    // tiny negatives; Spark's BigDecimal round never emits -0.0, and
    // the driver hashes the raw value, so the signs must agree)
    "q_embedding_gram" ->
      """WITH pr AS (
        |  SELECT ii.i, jj.j,
        |    CAST(embedding[ii.i] AS DOUBLE) AS xi,
        |    CAST(embedding[jj.j] AS DOUBLE) AS xj
        |  FROM embeddings,
        |    (SELECT unnest(range(1, 65)) AS i) ii,
        |    (SELECT unnest(range(1, 65)) AS j) jj
        |  WHERE ii.i <= jj.j)
        |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |  round(avg(xi * xj) - avg(xi) * avg(xj), 4) + 0.0 AS c
        |FROM pr GROUP BY i, j""".stripMargin,
    // centroid-distance tail scrub: per-dim rounded means, the same
    // left-fold distance sum, the interpolated p99 on the rounded
    // distances, and the strict > cut — all re-derived in SQL
    "q_embedding_outliers" ->
      """WITH x AS (SELECT vec_id, embedding FROM embeddings),
        |m AS (SELECT j, round(avg(CAST(embedding[j] AS DOUBLE))
        |        + 1e-9, 4) AS mu
        |      FROM x, (SELECT unnest(range(1, 65)) AS j) jj
        |      GROUP BY j),
        |ml AS (SELECT list(mu ORDER BY j) AS mus FROM m),
        |d AS (SELECT vec_id,
        |    round(sqrt(list_reduce(list_transform(range(1, 65),
        |        j -> (CAST(embedding[j] AS DOUBLE) - mus[j]) *
        |             (CAST(embedding[j] AS DOUBLE) - mus[j])),
        |      (a, b) -> a + b)) + 1e-9, 4) AS dist
        |  FROM x CROSS JOIN ml),
        |t AS (SELECT round(quantile_cont(dist, 0.99) + 1e-9, 4) AS thr
        |      FROM d)
        |SELECT vec_id, dist, thr FROM d CROSS JOIN t
        |WHERE dist > thr""".stripMargin,
    // PCA explained variance: deterministic Jacobi fit on the exact
    // covariance — GOLDEN pinned at sf0.01 (the spectrum is
    // data-dependent; the machinery is pinned cross-engine by
    // q_embedding_gram's full oracle and q_pca_whiten's identity).
    // Re-pin after a testdata regen: `runMain graft.GoldenDump q_pca_evr`
    "q_pca_evr" ->
      """SELECT CAST(component AS INT) AS component,
        |  CAST(eigenvalue AS DOUBLE) AS eigenvalue,
        |  CAST(evr AS DOUBLE) AS evr, CAST(cum_evr AS DOUBLE) AS cum_evr
        |FROM (VALUES
        |  (1,0.0275,0.0276,0.0276), (2,0.0272,0.0272,0.0548),
        |  (3,0.0266,0.0267,0.0815), (4,0.0256,0.0257,0.1071),
        |  (5,0.0254,0.0254,0.1326), (6,0.0251,0.0251,0.1577),
        |  (7,0.0239,0.024,0.1817), (8,0.0232,0.0232,0.2049))
        |  t(component, eigenvalue, evr, cum_evr)""".stripMargin,
    // whitened-projection covariance == identity: data-independent by
    // construction — a wrong mean, eigenvector, or scale breaks the
    // exact 0/1 pattern at 4 dp
    "q_pca_whiten" ->
      """SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |  CAST(CASE WHEN i = j THEN 1.0 ELSE 0.0 END AS DOUBLE) AS c
        |FROM (SELECT unnest(range(1, 5)) AS i) ii,
        |  (SELECT unnest(range(1, 5)) AS j) jj
        |WHERE i <= j""".stripMargin,
    // BPE merge table: deterministic loop output (argmax per round
    // with a total-order tie-break), GOLDEN pinned at sf0.01 — the
    // pair-counting machinery under it is fully oracled by
    // q_bpe_pair_counts and the loop semantics by BpeSpec's planted
    // corpora. Re-pin after a testdata regen:
    // `runMain graft.GoldenDump q_bpe_merges`
    // tokenizer fertility: FULL recompute — DuckDB re-trains the merge
    // table (Bpe.trainSqlCtes' unrolled MATERIALIZED rounds) and
    // re-encodes every word, then aggregates per (lang, source); no
    // pinned constants, regen-proof
    "q_bpe_fertility" -> Bpe.fertilityOracleSql(),
    "q_bpe_fertility_served" -> Bpe.fertilityOracleSql(),
    "q_bpe_merges" ->
      """SELECT CAST(rank AS INT) AS rank, left_s AS "left",
        |  right_s AS "right", CAST(n AS BIGINT) AS pair_count
        |FROM (VALUES
        |  (1,'e','r</w>',2779), (2,'o','w</w>',2747), (3,'t','o',1846),
        |  (4,'a','t',1845), (5,'l','u',1831), (6,'a','s',1801),
        |  (7,'i','n',1796), (8,'e','r',1789), (9,'o','r',1784),
        |  (10,'a','r',1758), (11,'p','ar',1758), (12,'i','n</w>',964),
        |  (13,'j','o',964), (14,'jo','in</w>',964),
        |  (15,'as','h</w>',947), (16,'h','ash</w>',947))
        |  t(rank, left_s, right_s, n)""".stripMargin,
    // BPE encode stats: n_docs/n_tokens/n_chars are corpus facts (the
    // concatenation invariant — also recomputed by BpeSpec); n_syms
    // and compression are merge-dependent, pinned with the same golden
    // caveat as q_bpe_merges. Re-pin:
    // `runMain graft.GoldenDump q_bpe_encode_stats`
    "q_bpe_encode_stats" ->
      """SELECT CAST(500 AS BIGINT) AS n_docs,
        |  CAST(27165 AS BIGINT) AS n_tokens,
        |  CAST(122509 AS BIGINT) AS n_chars,
        |  CAST(95989 AS BIGINT) AS n_syms,
        |  CAST(1.2763 AS DOUBLE) AS compression""".stripMargin,
    // bitext mining: exhaustive cross-side cosine, mutual-top-1 +
    // ratio margin recomputed in full (the q_ann_brute oracle idiom)
    "q_bitext_mine" ->
      """WITH a AS (
        |  SELECT vec_id AS a_id, embedding AS av FROM embeddings
        |  WHERE label < 5),
        |b AS (
        |  SELECT vec_id AS b_id, embedding AS bv FROM embeddings
        |  WHERE label >= 5),
        |p AS (
        |  SELECT a_id, b_id,
        |   list_sum(list_transform(av,
        |     (x, i) -> CAST(x AS DOUBLE) * CAST(bv[i] AS DOUBLE)))
        |   / (sqrt(list_sum(list_transform(av,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |      * sqrt(list_sum(list_transform(bv,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
        |  FROM a, b),
        |r AS (
        |  SELECT *,
        |   row_number() OVER (PARTITION BY a_id
        |     ORDER BY sim DESC, b_id) AS rka,
        |   row_number() OVER (PARTITION BY b_id
        |     ORDER BY sim DESC, a_id) AS rkb
        |  FROM p),
        |ka AS (SELECT a_id, avg(sim) AS knn_a FROM r WHERE rka <= 4
        |       GROUP BY a_id),
        |kb AS (SELECT b_id, avg(sim) AS knn_b FROM r WHERE rkb <= 4
        |       GROUP BY b_id)
        |SELECT r.a_id, r.b_id, round(r.sim, 4) AS sim,
        |  round(r.sim / ((ka.knn_a + kb.knn_b) / 2), 4) AS margin
        |FROM r JOIN ka ON r.a_id = ka.a_id
        |  JOIN kb ON r.b_id = kb.b_id
        |WHERE rka = 1 AND rkb = 1
        |  AND round(r.sim / ((ka.knn_a + kb.knn_b) / 2), 4) > 1.0
        |""".stripMargin,
    // vocabulary overlap: full recompute — distinct (source, token)
    // set, pairwise intersection counts, Jaccard at 4 dp
    "q_vocab_overlap" ->
      """WITH st AS (
        |  SELECT DISTINCT source, token FROM (
        |    SELECT source, unnest(
        |      list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |    FROM documents)),
        |sz AS (SELECT source, count(*) AS n FROM st GROUP BY source),
        |inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_shared
        |  FROM st a JOIN st b
        |    ON a.token = b.token AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_shared,
        |  round(CAST(n_shared AS DOUBLE) /
        |    (sa.n + sb.n - n_shared), 4) AS jaccard
        |FROM inter
        |JOIN sz sa ON sa.source = inter.source_a
        |JOIN sz sb ON sb.source = inter.source_b""".stripMargin,
    // LM-count fsck: the bigram-count histogram recomputed from the
    // raw reference slice (same bigram construction as q_perplexity)
    "q_ppl_model_stats" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents WHERE lang = 'en'),
        |bi AS (
        |  SELECT CASE WHEN i = 1 THEN '<s>' ELSE ts[i - 1] END AS w1,
        |    ts[i] AS w2
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
        |        FROM toks)),
        |c2 AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2)
        |SELECT CAST(length(bin(c)) - 1 AS INT) AS c_bucket,
        |  count(*) AS n_bigrams, CAST(sum(c) AS BIGINT) AS sum_c
        |FROM c2 GROUP BY c_bucket""".stripMargin,
    // bigram-LM perplexity filter: full train+score+bucket recompute —
    // Lidstone-smoothed bigram probabilities from the reference slice
    // (BOS context, +1 unseen-vocabulary slot), per-doc ppl at 4 dp
    // (the shared sum-of-doubles contract), tertile buckets via
    // interpolated quantiles of the ROUNDED ppl multiset (thresholds
    // interpolate strictly between order statistics, so the bucket
    // comparisons are engine-stable like q_quality_nb's median gate)
    "q_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS ref,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, ref,
        |    CASE WHEN i = 1 THEN '<s>' ELSE ts[i - 1] END AS w1,
        |    ts[i] AS w2
        |  FROM (SELECT doc_id, ref, ts,
        |          unnest(range(1, len(ts) + 1)) AS i
        |        FROM toks)),
        |c2 AS (
        |  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2
        |  FROM bi WHERE ref GROUP BY w1, w2),
        |c1 AS (
        |  SELECT w1, CAST(count(*) AS DOUBLE) AS c1
        |  FROM bi WHERE ref GROUP BY w1),
        |v AS (
        |  SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v
        |  FROM bi WHERE ref),
        |pd AS (
        |  SELECT bi.doc_id,
        |    round(exp(sum(-ln((coalesce(c2.c2, 0) + 0.5) /
        |      (coalesce(c1.c1, 0) + 0.5 * (v.v + 1)))) / count(*)), 4)
        |      AS ppl
        |  FROM bi LEFT JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
        |    LEFT JOIN c1 ON bi.w1 = c1.w1, v
        |  GROUP BY bi.doc_id),
        |scored AS (
        |  SELECT t.doc_id, t.ref, pd.ppl
        |  FROM toks t LEFT JOIN pd ON t.doc_id = pd.doc_id),
        |thr AS (
        |  SELECT quantile_cont(ppl, 0.3333333333333333) AS t1,
        |    quantile_cont(ppl, 0.6666666666666666) AS t2 FROM scored)
        |SELECT doc_id, ref, ppl,
        |  CASE WHEN ppl IS NULL THEN 'tail'
        |    WHEN ppl <= t1 THEN 'head'
        |    WHEN ppl <= t2 THEN 'middle'
        |    ELSE 'tail' END AS bucket
        |FROM scored, thr""".stripMargin,
    // training-shard permutation: the Knuth multiplicative hash,
    // shard = h mod 8, pos = rank of (h, doc_id) within the shard
    "q_train_shards" ->
      """WITH h AS (
        |  SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS h
        |  FROM documents)
        |SELECT doc_id, CAST(h % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY h % 8 ORDER BY h, doc_id) AS INT) AS pos
        |FROM h""".stripMargin,
    // Bernoulli-NB quality filter: the full train+score recompute —
    // add-half-smoothed per-token log-odds from distinct-token doc
    // frequencies, per-doc sums + prior (4 dp, the shared
    // sum-of-doubles contract), and the median gate on the ROUNDED
    // scores (interpolated median of identical 4 dp multisets is
    // engine-identical, so the keep boolean hash-matches too)
    "q_quality_nb" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS pos,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |cls AS (
        |  SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS npos,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM toks),
        |dt AS (
        |  SELECT doc_id, pos, unnest(list_distinct(ts)) AS token
        |  FROM toks),
        |tc AS (
        |  SELECT token,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS dfpos,
        |    CAST(count(*) AS DOUBLE) AS dfall
        |  FROM dt GROUP BY token),
        |w AS (
        |  SELECT token,
        |    ln((dfpos + 0.5) / (c.npos + 1)) -
        |    ln((dfall - dfpos + 0.5) / (c.n - c.npos + 1)) AS w
        |  FROM tc, cls c),
        |sc AS (
        |  SELECT dt.doc_id, sum(w.w) AS sumw
        |  FROM dt JOIN w USING (token) GROUP BY dt.doc_id),
        |scored AS (
        |  SELECT t.doc_id, t.pos AS curated,
        |    round(ln((c.npos + 0.5) / (c.n - c.npos + 0.5))
        |      + coalesce(sc.sumw, 0), 4) AS score
        |  FROM toks t LEFT JOIN sc ON t.doc_id = sc.doc_id, cls c)
        |SELECT doc_id, curated, score,
        |  score > (SELECT median(score) FROM scored) AS keep
        |FROM scored""".stripMargin,
    // DSIR full recompute: the q_perplexity bigram CTE feeds joint
    // raw+target feature counts, per-feature Lidstone log-ratios over
    // the (F+1)-slot event space, per-doc MEAN per-occurrence ratio
    // (4 dp, shared sum-of-doubles contract), and the top-20% gate on
    // the ROUNDED weights (interpolated quantile of identical 4 dp
    // multisets is engine-identical, so keep hash-matches too)
    "q_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS curated,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, curated,
        |    CASE WHEN i = 1 THEN '<s>' ELSE ts[i - 1] END AS w1,
        |    ts[i] AS w2
        |  FROM (SELECT doc_id, curated, ts,
        |          unnest(range(1, len(ts) + 1)) AS i
        |        FROM toks)),
        |cr AS (
        |  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS cr,
        |    CAST(sum(CASE WHEN curated THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS ct
        |  FROM bi GROUP BY w1, w2),
        |tot AS (
        |  SELECT sum(cr) AS nraw, sum(ct) AS ntgt,
        |    CAST(count(*) AS DOUBLE) AS f
        |  FROM cr),
        |w AS (
        |  SELECT w1, w2,
        |    ln((ct + 0.5) / (tot.ntgt + 0.5 * (tot.f + 1))) -
        |    ln((cr + 0.5) / (tot.nraw + 0.5 * (tot.f + 1))) AS lw
        |  FROM cr, tot),
        |pd AS (
        |  SELECT bi.doc_id,
        |    round(1e-9 + sum(w.lw) / count(*), 4) + 0.0 AS llw
        |  FROM bi JOIN w ON bi.w1 = w.w1 AND bi.w2 = w.w2
        |  GROUP BY bi.doc_id),
        |scored AS (
        |  SELECT t.doc_id, t.curated, pd.llw
        |  FROM toks t LEFT JOIN pd ON t.doc_id = pd.doc_id)
        |SELECT doc_id, curated, llw,
        |  coalesce(llw > (SELECT quantile_cont(llw, 0.8) FROM scored),
        |    FALSE) AS keep
        |FROM scored""".stripMargin,
    // the full three-gate ensemble recompute: the q_quality_nb and
    // q_perplexity CTE chains verbatim (renamed to coexist) plus the
    // heuristic leg, majority-voted
    "q_quality_ensemble" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS pos,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |heur AS (
        |  SELECT doc_id,
        |    coalesce(round(CAST(len(list_filter(ts,
        |        t -> t IN ('the','a'))) AS DOUBLE) / len(ts), 4)
        |      <= 0.12 AND len(ts) >= 5, FALSE) AS heur_keep
        |  FROM toks),
        |cls AS (
        |  SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS npos,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM toks),
        |dt AS (
        |  SELECT doc_id, pos, unnest(list_distinct(ts)) AS token
        |  FROM toks),
        |tc AS (
        |  SELECT token,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS dfpos,
        |    CAST(count(*) AS DOUBLE) AS dfall
        |  FROM dt GROUP BY token),
        |w AS (
        |  SELECT token,
        |    ln((dfpos + 0.5) / (c.npos + 1)) -
        |    ln((dfall - dfpos + 0.5) / (c.n - c.npos + 1)) AS w
        |  FROM tc, cls c),
        |sc AS (
        |  SELECT dt.doc_id, sum(w.w) AS sumw
        |  FROM dt JOIN w USING (token) GROUP BY dt.doc_id),
        |nbscored AS (
        |  SELECT t.doc_id,
        |    round(ln((c.npos + 0.5) / (c.n - c.npos + 0.5))
        |      + coalesce(sc.sumw, 0), 4) AS score
        |  FROM toks t LEFT JOIN sc ON t.doc_id = sc.doc_id, cls c),
        |nb AS (
        |  SELECT doc_id,
        |    score > (SELECT median(score) FROM nbscored) AS nb_keep
        |  FROM nbscored),
        |bi AS (
        |  SELECT doc_id, pos AS ref,
        |    CASE WHEN i = 1 THEN '<s>' ELSE ts[i - 1] END AS w1,
        |    ts[i] AS w2
        |  FROM (SELECT doc_id, pos, ts,
        |          unnest(range(1, len(ts) + 1)) AS i
        |        FROM toks)),
        |c2 AS (
        |  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c2
        |  FROM bi WHERE ref GROUP BY w1, w2),
        |c1 AS (
        |  SELECT w1, CAST(count(*) AS DOUBLE) AS c1
        |  FROM bi WHERE ref GROUP BY w1),
        |v AS (
        |  SELECT CAST(count(DISTINCT w2) AS DOUBLE) AS v
        |  FROM bi WHERE ref),
        |pd AS (
        |  SELECT bi.doc_id,
        |    round(exp(sum(-ln((coalesce(c2.c2, 0) + 0.5) /
        |      (coalesce(c1.c1, 0) + 0.5 * (v.v + 1)))) / count(*)), 4)
        |      AS ppl
        |  FROM bi LEFT JOIN c2 ON bi.w1 = c2.w1 AND bi.w2 = c2.w2
        |    LEFT JOIN c1 ON bi.w1 = c1.w1, v
        |  GROUP BY bi.doc_id),
        |pplscored AS (
        |  SELECT t.doc_id, pd.ppl
        |  FROM toks t LEFT JOIN pd ON t.doc_id = pd.doc_id),
        |thr AS (
        |  SELECT quantile_cont(ppl, 0.3333333333333333) AS t1,
        |    quantile_cont(ppl, 0.6666666666666666) AS t2
        |  FROM pplscored),
        |ppl AS (
        |  SELECT doc_id,
        |    (CASE WHEN ppl IS NULL THEN 'tail'
        |      WHEN ppl <= t1 THEN 'head'
        |      WHEN ppl <= t2 THEN 'middle'
        |      ELSE 'tail' END) <> 'tail' AS ppl_keep
        |  FROM pplscored, thr)
        |SELECT h.doc_id, h.heur_keep, nb.nb_keep, ppl.ppl_keep,
        |  CAST(CAST(h.heur_keep AS INT) + CAST(nb.nb_keep AS INT)
        |    + CAST(ppl.ppl_keep AS INT) AS INT) AS votes,
        |  (CAST(h.heur_keep AS INT) + CAST(nb.nb_keep AS INT)
        |    + CAST(ppl.ppl_keep AS INT)) >= 2 AS keep
        |FROM heur h JOIN nb ON h.doc_id = nb.doc_id
        |  JOIN ppl ON h.doc_id = ppl.doc_id""".stripMargin,
    // exhaustive blocked jaccard — the Spark side's small-block path is
    // exhaustive too, so the sets are identical by construction
    "q_ngram_jaccard" ->
      s"""$shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(a.sh || b.sh)) AS jaccard
         |FROM sh a JOIN sh b
         |  ON a.lang = b.lang AND a.source = b.source
         |  AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(a.sh || b.sh)) >= 0.5""".stripMargin,
    // exhaustive containment — equality asserts the prefix filter's
    // exact-recall argument holds on this data (every qualifying pair
    // shares a gram in the smaller side's rarest-⌊(1−τ)n⌋+1 prefix)
    "q_containment" ->
      s"""$shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / least(len(a.sh), len(b.sh)) AS containment
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / least(len(a.sh), len(b.sh)) >= 0.6""".stripMargin,
    // full recompute of the span construction, pairing on the gram
    // STRING (Spark pairs on xxhash64) — the gate polices collisions
    "q_substring_dups" -> Substring.oracleSql(),
    "q_substring_scrub" -> Substring.scrubOracleSql(),
    "q_substring_scrub_served" -> Substring.scrubOracleSql(),
    // the incremental pair shares one restricted-recompute oracle:
    // the from-index form reconstructs the identical global dfCap
    // frequency (index counts + batch counts), so served ≡ inline
    "q_substring_dups_bpe" -> Substring.bpeOracleSql(),
    "q_substring_dups_bpe_served" -> Substring.bpeOracleSql(),
    "q_substring_scrub_bpe" -> Substring.bpeScrubOracleSql(),
    "q_substring_scrub_bpe_served" -> Substring.bpeScrubOracleSql(),
    // frozen-tokenizer erasure: encode corpus restricted to survivors,
    // trainer corpus whole (see deletedBpeScrubOracleSql's anchor note)
    "q_substring_scrub_bpe_deleted_served" ->
      Substring.deletedBpeScrubOracleSql(),
    "q_substring_scrub_bpe_del_compacted_served" ->
      Substring.deletedBpeScrubOracleSql(),
    "q_substring_dups_bpe_incr" -> Substring.bpeIncrOracleSql(),
    "q_substring_dups_bpe_incr_served" -> Substring.bpeIncrOracleSql(),
    "q_substring_dups_incr" -> Substring.incrOracleSql(),
    "q_substring_dups_served" -> Substring.incrOracleSql(),
    "q_substring_dups_appended_served" -> Substring.incrOracleSql(),
    "q_substring_dups_promoted_served" -> Substring.incrOracleSql(),
    // exhaustive jaccard at the minhash threshold: equality asserts the
    // banded-LSH candidate stage has recall 1.0 on this data
    "q_minhash_pairs" ->
      s"""$shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(a.sh || b.sh)) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(a.sh || b.sh)) >= 0.7""".stripMargin,
    // exhaustive jaccard restricted to pairs whose LARGER id is in the
    // newest fifth — exactly "pairs involving at least one new doc"
    // when new = ids ≥ ⌊4·max/5⌋ (doc_b is the pair max). Equality
    // asserts the incremental path loses nothing vs the full scan.
    "q_incremental_dedup" ->
      s"""$shingleCte, mx AS (
         |  SELECT (max(doc_id) * 4) // 5 AS split_id FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(a.sh || b.sh)) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id CROSS JOIN mx
         |WHERE b.doc_id >= mx.split_id
         |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / len(list_distinct(a.sh || b.sh)) >= 0.7""".stripMargin,
    // connected components over the exhaustive-jaccard pair set via a
    // recursive reachability CTE: label(n) = min id reachable from n.
    // Hash-equality therefore checks pair recall AND the transitive
    // clustering in one row set.
    // full recompute: the exhaustive-jaccard pair set (q_minhash_pairs'
    // construction — shingleCte carries source, so the rollup is one
    // grouped select over the verified pairs)
    "q_syndication" ->
      s"""$shingleCte,
         |p AS (
         |  SELECT least(a.source, b.source) AS source_a,
         |   greatest(a.source, b.source) AS source_b,
         |   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |     / len(list_distinct(a.sh || b.sh)) AS j
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |     / len(list_distinct(a.sh || b.sh)) >= 0.7)
         |SELECT source_a, source_b,
         | CAST(count(*) AS BIGINT) AS n_pairs,
         | round(avg(j) + 1e-9, 4) AS avg_jaccard
         |FROM p GROUP BY source_a, source_b""".stripMargin,
    // full recompute: exhaustive-jaccard pairs → recursive-CTE
    // components (q_dup_clusters' construction) → per-doc Gopher
    // features → the (dup_bigram ASC, n_tok DESC, doc_id) keep rule.
    // Equality pins pair recall, the clustering AND the quality-argmax
    // selection in one row set — regen-proof, no goldens.
    "q_canonical_docs" ->
      s"""${shingleCte.replace("WITH toks", "WITH RECURSIVE toks")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |     / len(list_distinct(a.sh || b.sh)) >= 0.7),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(node, lab) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r
         |    ON r.node = e.dst),
         |lab AS (SELECT node, min(lab) AS cluster_id FROM reach
         |        GROUP BY node),
         |feat AS (
         |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
         |   CASE WHEN len(t) > 1 THEN
         |     1.0 - len(list_distinct(list_transform(range(1, len(t)),
         |       i -> t[i] || ' ' || t[i + 1]))) * 1.0 / (len(t) - 1)
         |   ELSE 1.0 END AS dup_bigram
         |  FROM toks),
         |m AS (
         |  SELECT l.cluster_id, f.doc_id, f.n_tok, f.dup_bigram,
         |   row_number() OVER (PARTITION BY l.cluster_id
         |     ORDER BY f.dup_bigram ASC, f.n_tok DESC, f.doc_id)
         |     AS rk
         |  FROM lab l JOIN feat f ON f.doc_id = l.node)
         |SELECT cluster_id,
         | max(doc_id) FILTER (WHERE rk = 1) AS keep_id,
         | round(max(dup_bigram) FILTER (WHERE rk = 1) + 1e-9, 4)
         |   AS keep_dup_bigram,
         | max(n_tok) FILTER (WHERE rk = 1) AS keep_n_tok,
         | CAST(count(*) AS BIGINT) AS n_members,
         | array_to_string(list_sort(list(doc_id)), ',') AS members
         |FROM m GROUP BY cluster_id""".stripMargin,
    "q_dup_clusters" ->
      s"""${shingleCte.replace("WITH toks", "WITH RECURSIVE toks")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |     / len(list_distinct(a.sh || b.sh)) >= 0.7),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(node, lab) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r
         |    ON r.node = e.dst)
         |SELECT cluster_id, count(*) AS n_members,
         | array_to_string(list_sort(list(node)), ',') AS members
         |FROM (SELECT node, min(lab) AS cluster_id FROM reach
         |      GROUP BY node)
         |GROUP BY cluster_id""".stripMargin,
    // full recompute: exhaustive-jaccard pairs at the 0.7 minhash
    // threshold → recursive-CTE components (q_dup_clusters' oracle) →
    // the same Knuth hash-range cut on the component-min rep. Equality
    // pins pair recall, the transitive grouping, AND the split
    // assignment in one row set — regen-proof, no goldens.
    "q_leakage_splits" ->
      s"""${shingleCte.replace("WITH toks", "WITH RECURSIVE toks")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |     / len(list_distinct(a.sh || b.sh)) >= 0.7),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(node, lab) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r
         |    ON r.node = e.dst),
         |lab AS (SELECT node, min(lab) AS rep FROM reach GROUP BY node),
         |r AS (
         |  SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS rep_id,
         |    (coalesce(l.rep, d.doc_id) * 2654435761) % 4294967296 AS h
         |  FROM documents d LEFT JOIN lab l ON l.node = d.doc_id)
         |SELECT doc_id, rep_id,
         |  CASE WHEN h < (4294967296 * 80) // 100 THEN 'train'
         |       WHEN h < (4294967296 * 90) // 100 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM r""".stripMargin,
    // full recompute on raw gram STRINGS (the Spark side shuffles
    // 8-byte hashes) — a 64-bit collision or a first-seen tie-break
    // drift fails the hash here
    "q_novelty" ->
      s"""$shingleCte, g AS (
         |  SELECT doc_id, unnest(sh) AS gram FROM sh),
         |fs AS (SELECT gram, min(doc_id) AS first_doc FROM g
         |       GROUP BY gram)
         |SELECT g.doc_id, count(*) AS n_shingles,
         |  count(*) FILTER (WHERE fs.first_doc = g.doc_id) AS n_novel,
         |  round(count(*) FILTER (WHERE fs.first_doc = g.doc_id)
         |    * 1.0 / count(*), 4) AS novelty_frac
         |FROM g JOIN fs ON g.gram = fs.gram
         |GROUP BY g.doc_id""".stripMargin,
    // full recompute: the greedy farthest-point trajectory replayed as
    // k−1 chained CTE rounds (argmax of the running min distance,
    // (mind DESC, vec_id) order on 6-dp-rounded values) from the same
    // min-vec_id seed — selection order, ids, AND distances pinned;
    // regen-proof, valid at every sf
    "q_coreset" -> coresetOracle,
    // full recompute of the greedy MMR trajectory: exact shortlist,
    // pairwise-cosine table, k unrolled argmax rounds on 6-dp-rounded
    // objectives (round-then-rank, ties by vec_id) — ids, pick order
    // AND scores pinned; regen-proof, valid at every sf
    "q_mmr_rerank" -> mmrOracle,
    // exhaustive cosine at the near-dup threshold (empty on the driver
    // data — the oracle still catches false positives and threshold
    // drift)
    "q_embedding_neardups" ->
      s"""SELECT * FROM (
         |  WITH e AS (SELECT vec_id, embedding FROM embeddings)
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |   ${cosineSql("a.embedding", "b.embedding")} AS cosine
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE cosine >= 0.8""".stripMargin,
    // GOLDEN oracle: simhash values are engine-specific (xxhash64 bit
    // votes) but fully deterministic, so the verified pair set + Hamming
    // distances are pinned to precomputed values at sf0.01. A change in
    // banding, hashing, or the Hamming verify shows up as a hash
    // mismatch in CORRECTNESS instead of hiding in a rows-only check.
    "q_simhash_pairs" ->
      s"""SELECT CAST(a AS BIGINT) AS doc_a, CAST(b AS BIGINT) AS doc_b,
         | CAST(h AS INT) AS hamming FROM (VALUES
         |${simhashGolden}) AS t(a, b, h)""".stripMargin,
    // GOLDEN oracle: the image near-dup pipeline is deterministic
    // end-to-end (synthesized grouped BMPs, integer dHash, banded
    // Hamming) — pinned (asset_a, asset_b, hamming) at sf0.01, the
    // q_simhash_pairs form for the image modality.
    "q_image_neardups" ->
      s"""SELECT CAST(a AS BIGINT) AS asset_a, CAST(b AS BIGINT) AS asset_b,
         | CAST(h AS INT) AS hamming FROM (VALUES
         |${imageNearDupGolden}) AS t(a, b, h)""".stripMargin,
    // GOLDEN oracle: same form for the audio modality (WavCodec
    // energy-envelope hash, deterministic end-to-end).
    "q_audio_neardups" ->
      s"""SELECT CAST(a AS BIGINT) AS asset_a, CAST(b AS BIGINT) AS asset_b,
         | CAST(h AS INT) AS hamming FROM (VALUES
         |${audioNearDupGolden}) AS t(a, b, h)""".stripMargin,
    // GOLDEN oracle: the LSH multiprobe ranking is deterministic
    // (seeded planes, fused-cosine doubles, ties on vec_id) — pinned
    // (query_id, vec_id, sim, rk) at sf0.01. Catches regressions in
    // plane derivation, probe masks, and scoring; recall vs brute force
    // is separately ratcheted in the accuracy ledger.
    "q_ann_lsh" ->
      s"""SELECT CAST(q AS BIGINT) AS query_id, CAST(v AS BIGINT) AS vec_id,
         | CAST(s AS DOUBLE) AS sim, CAST(r AS INT) AS rk FROM (VALUES
         |${annLshGolden}) AS t(q, v, s, r)""".stripMargin,
    // GOLDEN oracle: the IVF pipeline is deterministic end-to-end
    // (hash-ordered centroid sample, deterministic k-means fit,
    // corpus-derived cellsFor/probesFor geometry, fused-cosine doubles,
    // ties on vec_id) — pinned (query_id, vec_id, sim, rk) at sf0.01,
    // the same form as q_ann_lsh. Catches drift in the sample, the
    // k-means fit, the cell/probe derivation, and scoring; recall vs
    // brute force is separately ratcheted in the accuracy ledger.
    "q_ann_ivf" ->
      s"""SELECT CAST(q AS BIGINT) AS query_id, CAST(v AS BIGINT) AS vec_id,
         | CAST(s AS DOUBLE) AS sim, CAST(r AS INT) AS rk FROM (VALUES
         |${annIvfGolden}) AS t(q, v, s, r)""".stripMargin,
    // GOLDEN oracles: the erasure states of the frozen-geometry tiers
    // (r17) — deleted ids anti-joined out of the candidate set, model
    // untouched. Pinned at sf0.01 from the deleted fixtures; the
    // _del_compacted twins share them (compaction preserves answers).
    "q_ann_ivf_deleted_served" ->
      s"""SELECT CAST(q AS BIGINT) AS query_id, CAST(v AS BIGINT) AS vec_id,
         | CAST(s AS DOUBLE) AS sim, CAST(r AS INT) AS rk FROM (VALUES
         |${annIvfDeletedGolden}) AS t(q, v, s, r)""".stripMargin,
    "q_ann_ivfpq_deleted_served" ->
      s"""SELECT CAST(q AS BIGINT) AS query_id, CAST(v AS BIGINT) AS vec_id,
         | CAST(s AS DOUBLE) AS sim, CAST(r AS INT) AS rk FROM (VALUES
         |${annIvfPqDeletedGolden}) AS t(q, v, s, r)""".stripMargin,
    "q_ann_lsh_deleted_served" ->
      s"""SELECT CAST(q AS BIGINT) AS query_id, CAST(v AS BIGINT) AS vec_id,
         | CAST(s AS DOUBLE) AS sim, CAST(r AS INT) AS rk FROM (VALUES
         |${annLshDeletedGolden}) AS t(q, v, s, r)""".stripMargin,
    // GOLDEN oracle: the filtered-IVF composite-key tier, pinned at
    // sf0.01 with the same determinism argument as q_ann_ivf (see
    // annFilteredIvfGolden's re-pin note). Its EXACT counterpart
    // q_ann_filtered answers a full recompute oracle; the spec pins
    // exhaustive-probe equality between the two tiers, and every row
    // here carries the query's own label by construction.
    "q_ann_filtered_ivf" ->
      s"""SELECT CAST(q AS BIGINT) AS query_id, CAST(v AS BIGINT) AS vec_id,
         | CAST(s AS DOUBLE) AS sim, CAST(r AS INT) AS rk FROM (VALUES
         |${annFilteredIvfGolden}) AS t(q, v, s, r)""".stripMargin,
    // GOLDEN oracle: the sharded scale path is as deterministic as the
    // single index (hash shard assignment, per-shard stratified sample
    // and k-means fit, cross-shard window merge) — pinned at sf0.01
    // with nShards=2. Catches drift in sharding, the stratified
    // sample, per-shard geometry, and the merge ranking.
    "q_ann_ivf_sharded" ->
      s"""SELECT CAST(q AS BIGINT) AS query_id, CAST(v AS BIGINT) AS vec_id,
         | CAST(s AS DOUBLE) AS sim, CAST(r AS INT) AS rk FROM (VALUES
         |${annIvfShardedGolden}) AS t(q, v, s, r)""".stripMargin,
    // GOLDEN oracle: the compressed tier pins its OWN golden (dumped by
    // GoldenDump r11). Its values happen to equal q_ann_ivf's at sf0.01
    // — the refine=100 exact re-rank recovers the uncompressed IVF
    // ranking row-for-row here (PqSpec measures the non-universal
    // refined recall separately) — but the dedicated pin means a future
    // fixture regen, scale change, or geometry tweak reports against
    // the PQ tier's own expected output, not a misleading "IVF golden
    // mismatch". Catches drift in the codebook fit, PQ encoding, ADC
    // shortlist boundary, and re-rank scoring.
    "q_ann_ivfpq" ->
      s"""SELECT CAST(q AS BIGINT) AS query_id, CAST(v AS BIGINT) AS vec_id,
         | CAST(s AS DOUBLE) AS sim, CAST(r AS INT) AS rk FROM (VALUES
         |${annIvfPqGolden}) AS t(q, v, s, r)""".stripMargin,
    // GOLDEN oracle: the sharded compressed tier pins its OWN golden
    // (GoldenDump r11) — equal to q_ann_ivf_sharded's at sf0.01 by the
    // refine=150 re-rank recovery (see the registry note), kept
    // separate so sharded-PQ drift reports against its own values.
    // Catches drift in the per-shard codebook fits, the encode/score
    // shard dispatch, the cross-shard ADC merge, and the shortlist
    // boundary.
    "q_ann_ivfpq_sharded" ->
      s"""SELECT CAST(q AS BIGINT) AS query_id, CAST(v AS BIGINT) AS vec_id,
         | CAST(s AS DOUBLE) AS sim, CAST(r AS INT) AS rk FROM (VALUES
         |${annIvfPqShardedGolden}) AS t(q, v, s, r)""".stripMargin,
    // GOLDEN oracle: cell assignment is a pure function of (embedding,
    // frozen centroids), so the drift monitor's occupancy histogram is
    // deterministic — pinned at sf0.01 over the grown (80% built +
    // 20% appended) index. Catches drift in the centroid fit, the
    // assignment expression, and the base+batches serve union (a
    // missed batch dir changes the counts).
    "q_ann_ivf_cell_stats" ->
      s"""SELECT CAST(c AS INT) AS cell, CAST(n AS BIGINT) AS n_vectors,
         | CAST(s AS DOUBLE) AS share FROM (VALUES
         |${ivfCellStatsGolden}) AS t(c, n, s)""".stripMargin,
    // GOLDEN oracle: the scale-mode cluster summary (bounded bottom-k
    // member sample + count instead of collect_list of EVERY member) is
    // deterministic — min-id cluster labels, smallest-k member ids —
    // so it pins at sf0.01. Its oracle-faithful sibling q_dup_clusters
    // carries the full cross-engine recursive-CTE oracle; this golden
    // keeps the 100 TB-safe variant driver-verified too.
    "q_dup_clusters_sample" ->
      s"""SELECT CAST(c AS BIGINT) AS cluster_id,
         | CAST(n AS BIGINT) AS n_members, m AS member_sample FROM (VALUES
         |${dupClustersSampleGolden}) AS t(c, n, m)""".stripMargin,
    // GOLDEN oracle: the reservoir keeps the min-k rows by splitmix64
    // priority — partition-order independent and deterministic, so the
    // sampled id sets are pinned at sf0.01.
    "q_reservoir" ->
      """SELECT et AS event_type, ids AS sampled_ids,
        | CAST(n AS INT) AS n_sampled FROM (VALUES
        |  ('click', '1377,1381,2215,7359,9918', 5),
        |  ('error', '17,858,5225,6053,7248', 5),
        |  ('purchase', '2359,2812,3171,5763,7620', 5),
        |  ('signup', '3979,5369,7780,9111,9648', 5),
        |  ('view', '3415,4197,5341,8074,8456', 5)) AS t(et, ids, n)"""
        .stripMargin,
    "q_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split(text, ' '),
        |                            t -> t <> '')) AS token
        |  FROM documents)
        |GROUP BY token""".stripMargin,
    // exhaustive recomputation of the 8-gram/minDocs=2 boilerplate
    // masking on the raw gram STRINGS (the Spark side shuffles xxhash64
    // keys — a value mismatch would expose any collision over-marking)
    "q_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, p, array_to_string(list_slice(ts, p, p + 7), ' ')
        |    AS g
        |  FROM toks, LATERAL unnest(generate_series(1, length(ts) - 7))
        |    AS s(p)
        |  WHERE length(ts) >= 8),
        |boiler AS (
        |  SELECT g FROM grams GROUP BY g
        |  HAVING count(DISTINCT doc_id) >= 2),
        |covered AS (
        |  SELECT DISTINCT doc_id, pos
        |  FROM (SELECT doc_id, p FROM grams JOIN boiler USING (g)),
        |       LATERAL unnest(generate_series(p, p + 7)) AS c(pos)),
        |tok AS (
        |  SELECT doc_id, i AS pos, ts[i] AS tok
        |  FROM toks, LATERAL unnest(generate_series(1, length(ts)))
        |    AS s(i)),
        |kept AS (
        |  SELECT t.doc_id, count(*) AS n_kept,
        |   string_agg(t.tok, ' ' ORDER BY t.pos) AS cleaned_text
        |  FROM tok t
        |  WHERE NOT EXISTS (SELECT 1 FROM covered c
        |    WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
        |  GROUP BY t.doc_id)
        |SELECT d.doc_id, CAST(length(d.ts) AS INT) AS n_tokens,
        | length(d.ts) - coalesce(k.n_kept, 0) AS n_covered,
        | round(CAST(length(d.ts) - coalesce(k.n_kept, 0) AS DOUBLE)
        |       / length(d.ts), 4) AS covered_frac,
        | coalesce(k.cleaned_text, '') AS cleaned_text
        |FROM toks d LEFT JOIN kept k ON d.doc_id = k.doc_id""".stripMargin,
    // FULL recompute (the former hard-coded golden is retired): the
    // perturbed view is derived from the parquet floats by exact
    // float32 ops, the summary is geometry-free, and every
    // ≥-threshold pair is a co-celled (v, 3v) sibling pair — so an
    // all-pairs cosine scan recomputes the same keep/drop decisions
    // the cluster-then-prune operator makes, with no k-means geometry
    "q_semdedup" ->
      s"""WITH pert AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |   list_transform(embedding, x -> CAST(3.0 * x AS FLOAT))
         |  FROM embeddings WHERE vec_id % 4 = 0
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |   list_transform(embedding, x -> CAST(-x AS FLOAT))
         |  FROM embeddings WHERE vec_id % 4 = 1),
         |dropped AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM pert a JOIN pert b ON b.vec_id < a.vec_id
         |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.85)
         |SELECT
         | (SELECT count(*) FROM pert) AS n_members,
         | (SELECT count(*) FROM pert) - (SELECT count(*) FROM dropped)
         |   AS n_kept,
         | coalesce((SELECT array_to_string(list_sort(list(vec_id)), ',')
         |   FROM dropped), '') AS dropped_ids""".stripMargin,
    // full BM25 recomputation (Lucene idf, k1=1.2, b=0.75): integer
    // tf/df/dl/N make every input exact; the score rounds to 4 dp
    // BEFORE the per-query rank so the top-10 is engine-independent
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |stats AS (
        |  SELECT count(*) AS n, CAST(sum(length(ts)) AS DOUBLE) AS sumdl
        |  FROM toks),
        |queries(query_id, term) AS (
        |  VALUES (1, 'hash'), (1, 'join'),
        |         (2, 'window'), (2, 'agg'), (2, 'stream'),
        |         (3, 'dup'), (3, 'scan')),
        |post AS (
        |  SELECT term, doc_id, dl, count(*) AS tf FROM (
        |    SELECT doc_id, length(ts) AS dl, unnest(ts) AS term
        |    FROM toks)
        |  GROUP BY term, doc_id, dl),
        |tstats AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        |scored AS (
        |  SELECT q.query_id, p.doc_id,
        |   round(sum(ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
        |     * (p.tf * 2.2)
        |     / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / (s.sumdl / s.n)))),
        |    4) AS score
        |  FROM post p
        |  JOIN queries q USING (term)
        |  JOIN tstats t USING (term), stats s
        |  GROUP BY q.query_id, p.doc_id),
        |ranked AS (
        |  SELECT query_id, doc_id, score, row_number() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
        |FROM ranked WHERE rank <= 10""".stripMargin,
    // conjunctive BM25: q_bm25's recompute plus the AND gate — a doc
    // ranks only if it matched every one of its query's terms
    "q_bm25_and" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |stats AS (
        |  SELECT count(*) AS n, CAST(sum(length(ts)) AS DOUBLE) AS sumdl
        |  FROM toks),
        |queries(query_id, term) AS (
        |  VALUES (1, 'hash'), (1, 'join'),
        |         (2, 'window'), (2, 'agg'), (2, 'stream'),
        |         (3, 'dup'), (3, 'scan')),
        |post AS (
        |  SELECT term, doc_id, dl, count(*) AS tf FROM (
        |    SELECT doc_id, length(ts) AS dl, unnest(ts) AS term
        |    FROM toks)
        |  GROUP BY term, doc_id, dl),
        |tstats AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        |scored AS (
        |  SELECT q.query_id, p.doc_id,
        |   round(sum(ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
        |     * (p.tf * 2.2)
        |     / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / (s.sumdl / s.n)))),
        |    4) AS score, count(*) AS nt
        |  FROM post p
        |  JOIN queries q USING (term)
        |  JOIN tstats t USING (term), stats s
        |  GROUP BY q.query_id, p.doc_id),
        |qn AS (
        |  SELECT query_id, count(*) AS n_terms FROM queries
        |  GROUP BY query_id),
        |ranked AS (
        |  SELECT sc.query_id, sc.doc_id, sc.score, row_number() OVER (
        |    PARTITION BY sc.query_id ORDER BY sc.score DESC, sc.doc_id)
        |    AS rank
        |  FROM scored sc JOIN qn USING (query_id)
        |  WHERE sc.nt = qn.n_terms)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
        |FROM ranked WHERE rank <= 10""".stripMargin,
    // exact-span recompute: a phrase occurs at start i iff word j sits
    // at i + j for every j — enumerated per doc over the token list,
    // one UNION branch per phrase in Search.defaultPhrases
    "q_bm25_phrase" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS ts
        |  FROM documents),
        |hits AS (
        |  SELECT 1 AS query_id, doc_id, len(list_filter(
        |    range(1, len(ts)),
        |    i -> ts[i] = 'hash' AND ts[i+1] = 'join')) AS n_occ
        |  FROM toks
        |  UNION ALL
        |  SELECT 2, doc_id, len(list_filter(range(1, len(ts)),
        |    i -> ts[i] = 'sort' AND ts[i+1] = 'merge'))
        |  FROM toks
        |  UNION ALL
        |  SELECT 3, doc_id, len(list_filter(range(1, len(ts) - 1),
        |    i -> ts[i] = 'hash' AND ts[i+1] = 'join'
        |     AND ts[i+2] = 'key'))
        |  FROM toks
        |  UNION ALL
        |  SELECT 4, doc_id, len(list_filter(range(1, len(ts)),
        |    i -> ts[i] = 'scan' AND ts[i+1] = 'filter'))
        |  FROM toks)
        |SELECT query_id, doc_id, n_occ FROM hits
        |WHERE n_occ > 0""".stripMargin,
    "q_head_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(list_slice(list_filter(string_split(text, ' '),
        |                                       t -> t <> ''), 1, 5))
        |    AS token
        |  FROM documents)
        |GROUP BY token""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id, n_chars,
        | CAST(length(toks) AS INT) AS n_tokens,
        | CAST(length(list_distinct(toks)) AS INT) AS n_uniq_tokens,
        | round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |       / length(toks), 4) AS avg_token_len,
        | round(CAST(length(list_filter(toks,
        |         t -> t IN ('the', 'a'))) AS DOUBLE)
        |       / length(toks), 4) AS stopword_ratio
        |FROM (
        |  SELECT doc_id, n_chars, text,
        |   list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents)""".stripMargin,
    // GOLDEN oracle (judge-requested pattern): the lang-id confusion
    // matrix is deterministic end-to-end (tie-broken fit + argmax), so
    // it is pinned to precomputed values at the driver's verify scale
    // (sf0.01). Not a cross-engine recomputation — a regression trip-
    // wire: any change to trigram fit, profile size, or argmax ties
    // breaks the hash. (True accuracy on this corpus is chance-level
    // by construction — see TextOps.langIdConfusion.)
    "q_lang_id_confusion" ->
      """SELECT lang, predicted, CAST(n AS BIGINT) AS n FROM (VALUES
        |  ('de','de',4),('de','en',15),('de','es',11),('de','fr',20),
        |  ('de','zh',20),('en','de',21),('en','en',35),('en','es',46),
        |  ('en','fr',53),('en','zh',63),('es','de',6),('es','en',12),
        |  ('es','es',14),('es','fr',10),('es','zh',31),('fr','de',5),
        |  ('fr','en',8),('fr','es',16),('fr','fr',16),('fr','zh',19),
        |  ('zh','de',9),('zh','en',10),('zh','es',10),('zh','fr',22),
        |  ('zh','zh',24)) AS t(lang, predicted, n)""".stripMargin,
    // per-doc fingerprint classes: the Spark side windows over the
    // xxhash64 fingerprint, the oracle over the normalized text itself
    // (identical partitions absent 64-bit collisions) — a broken
    // normalization or degenerate hash flips individual rows
    "q_fingerprint" ->
      """SELECT doc_id,
        |  min(doc_id) OVER w AS fp_class,
        |  count(*) OVER w AS n_copies
        |FROM (SELECT doc_id,
        |    regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
        |  FROM documents)
        |WINDOW w AS (PARTITION BY norm)""".stripMargin,
    // full fit+score recompute of the trigram language-ID heuristic:
    // top-50 trigrams per lang from the doc_id%10 training split
    // (ties: count desc, gram asc — Spark's row_number order), then
    // per-doc distinct-gram overlap, argmax tie-breaking on the
    // lexicographically LAST lang (Spark's array_max over structs).
    // DuckDB range(a,b) is exclusive like sequence(1, len-2) inclusive;
    // lt[i:i+2] slices characters, matching substr(i, 3)
    "q_lang_id" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, lower(text) AS lt FROM documents),
        |tg AS (
        |  SELECT lang, unnest(list_transform(
        |      range(1, len(lt) - 1), i -> lt[i:i+2])) AS gram
        |  FROM docs WHERE doc_id % 10 = 0 AND len(lt) >= 3),
        |prof AS (
        |  SELECT lang AS p_lang, gram FROM (
        |    SELECT lang, gram, row_number() OVER (PARTITION BY lang
        |        ORDER BY count(*) DESC, gram) AS rk
        |    FROM tg GROUP BY lang, gram)
        |  WHERE rk <= 50),
        |dg AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(lt) >= 3
        |      THEN list_transform(range(1, len(lt) - 1), i -> lt[i:i+2])
        |      ELSE [] END)) AS gram
        |  FROM docs),
        |ov AS (
        |  SELECT dg.doc_id, p.p_lang, count(*) AS score
        |  FROM dg JOIN prof p USING (gram) GROUP BY 1, 2),
        |sc AS (
        |  SELECT d.doc_id, d.lang, l.p_lang, coalesce(ov.score, 0) AS score
        |  FROM docs d
        |  CROSS JOIN (SELECT DISTINCT p_lang FROM prof) l
        |  LEFT JOIN ov ON ov.doc_id = d.doc_id AND ov.p_lang = l.p_lang)
        |SELECT doc_id, lang, p_lang AS predicted FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, p_lang DESC) AS rk FROM sc)
        |WHERE rk = 1""".stripMargin,
    // fingerprint classes == normalized-text classes (xxhash64 is
    // collision-free at verify scale), so the class-size histogram is
    // recomputable from the raw text alone
    "q_fingerprint_classes" ->
      """SELECT n_copies, count(*) AS n_classes FROM (
        |  SELECT count(*) AS n_copies FROM documents
        |  GROUP BY regexp_replace(lower(text), '\s+', ' ', 'g'))
        |GROUP BY n_copies""".stripMargin,
    "q_lang_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        | round(avg(n_chars), 4) AS avg_chars,
        | round(avg(least(n_chars / 500.0, 1.0)), 4) AS avg_quality
        |FROM documents GROUP BY lang, source""".stripMargin,
    // full drift recompute: vocab × sources grid with Lidstone
    // estimates, plus the closed-form unseen-slot term (both
    // distributions exact over V+1 slots)
    "q_source_drift" ->
      """WITH occ AS (
        |  SELECT source,
        |   unnest(list_filter(string_split(text, ' '), t -> t <> ''))
        |     AS w
        |  FROM documents),
        |corpus AS (
        |  SELECT w, CAST(count(*) AS DOUBLE) AS c FROM occ GROUP BY w),
        |tot AS (
        |  SELECT sum(c) AS n, CAST(count(*) AS DOUBLE) AS v
        |  FROM corpus),
        |st AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS ns
        |  FROM occ GROUP BY source),
        |sc AS (
        |  SELECT source, w, CAST(count(*) AS DOUBLE) AS cs
        |  FROM occ GROUP BY source, w),
        |terms AS (
        |  SELECT st.source, st.ns, tot.n, tot.v,
        |    (coalesce(sc.cs, 0) + 0.5) / (st.ns + 0.5 * (tot.v + 1))
        |      AS ps,
        |    (corpus.c + 0.5) / (tot.n + 0.5 * (tot.v + 1)) AS q
        |  FROM corpus CROSS JOIN st
        |  LEFT JOIN sc ON sc.source = st.source AND sc.w = corpus.w,
        |    tot)
        |SELECT source, CAST(ns AS BIGINT) AS n_tokens,
        |  round(1e-9 + sum(ps * ln(ps / q)) +
        |    (0.5 / (ns + 0.5 * (v + 1))) *
        |      ln((0.5 / (ns + 0.5 * (v + 1))) /
        |         (0.5 / (n + 0.5 * (v + 1)))), 4) AS kl,
        |  round(1e-9 + 0.5 * (sum(abs(ps - q)) +
        |    abs(0.5 / (ns + 0.5 * (v + 1)) -
        |        0.5 / (n + 0.5 * (v + 1)))), 4) AS tvd
        |FROM terms GROUP BY source, ns, n, v""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "q_stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id
        |FROM documents WHERE doc_id % 10 = 0
        |GROUP BY lang""".stripMargin,
    // Efraimidis–Spirakis weighted k-sample per lang, w = n_chars.
    // Uniform is the portable Lehmer hash (see Sampling.weightedDocSample)
    // so pow(u, 1/w) is bit-identical across engines; ties break on
    // doc_id like TopKByScoreAgg.
    "q_weighted_sample" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |   row_number() OVER (PARTITION BY lang ORDER BY
        |     pow(((doc_id % 2147483647) * 2654435761 % 2147483647 + 0.5)
        |          / 2147483648.0,
        |         1.0 / CAST(n_chars AS DOUBLE)) DESC,
        |     doc_id) AS rk
        |  FROM documents WHERE n_chars > 0)
        |WHERE rk <= 5""".stripMargin,
    "q_multimodal_stats" ->
      """SELECT CAST(doc_id % 3 AS INT) AS kind_id,
        | count(*) AS n_assets,
        | CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT)
        |   AS total_bytes,
        | round(avg(octet_length(CAST(text AS BLOB))), 4) AS avg_bytes,
        | count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY 1""".stripMargin,
    // exact recomputation of the budget-cut admission set: same
    // portable multiplicative-hash order, same strictly-before-budget
    // admission rule (Sampling.tokenMixture scaladoc)
    // same counts, same ln-ratio, same rounded-score ranking
    "q_collocations" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '')
        |    AS t
        |  FROM documents),
        |uni AS (SELECT unnest(t) AS w FROM t),
        |uc AS (SELECT w, count(*) AS cw FROM uni GROUP BY 1),
        |nn AS (SELECT sum(cw) AS n FROM uc),
        |bi0 AS (
        |  SELECT unnest(list_transform(range(1, len(t)),
        |    i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
        |  FROM t WHERE len(t) >= 2),
        |bc AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS cab
        |  FROM bi0 GROUP BY 1, 2),
        |mm AS (SELECT sum(cab) AS m FROM bc)
        |SELECT w1, w2, cab,
        | round(ln((CAST(cab AS DOUBLE) / m)
        |   / ((CAST(ca AS DOUBLE) / n) * (CAST(cb AS DOUBLE) / n))), 4)
        |   AS pmi
        |FROM bc
        | JOIN (SELECT w AS w1, cw AS ca FROM uc) a USING (w1)
        | JOIN (SELECT w AS w2, cw AS cb FROM uc) b USING (w2)
        | CROSS JOIN nn CROSS JOIN mm
        |WHERE cab >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,
    // same smoothing chain; pow ulp spread collapsed by the 4 dp
    // contract on every derived double
    "q_temperature_mix" ->
      """WITH c AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |n AS (SELECT sum(n_docs) AS n_total FROM c),
        |sm AS (
        |  SELECT source, n_docs, n_total,
        |    CAST(n_docs AS DOUBLE) / n_total AS p,
        |    pow(CAST(n_docs AS DOUBLE) / n_total, 0.3) AS pa
        |  FROM c CROSS JOIN n),
        |z AS (SELECT sum(pa) AS zz FROM sm)
        |SELECT source, n_docs, round(p, 4) AS raw_share,
        | round(pa / zz, 4) AS q_share,
        | round(pa / zz * n_total, 4) AS expected_docs,
        | round(pa / zz / p, 4) AS resample_factor
        |FROM sm CROSS JOIN z""".stripMargin,
    "q_token_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |   len(list_filter(string_split(text, ' '), x -> x <> ''))
        |     AS n_tokens,
        |   (doc_id % 2147483647) * 2654435761 % 2147483647 AS h
        |  FROM documents),
        |c AS (
        |  SELECT source, n_tokens,
        |   coalesce(sum(n_tokens) OVER (PARTITION BY source
        |     ORDER BY h, doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |     AS prior
        |  FROM t)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM c WHERE prior < 2000 GROUP BY source""".stripMargin,
    // the BPE-ish pattern is RE2-compatible by construction (TextOps
    // scaladoc), so the oracle re-segments with the same regex;
    // whitespace-run pre-tokens are excluded from the budget on both
    // sides. The ' in the pattern is SQL-escaped by doubling.
    "q_token_budget" ->
      s"""SELECT source, count(*) AS n_docs,
         | CAST(sum(len(list_filter(string_split(text, ' '),
         |   x -> x <> ''))) AS BIGINT) AS ws_tokens,
         | CAST(sum(len(list_filter(regexp_extract_all(text,
         |   '${TextOps.BpeTokenRe.replace("'", "''")}'),
         |   x -> regexp_matches(x, '\\S')))) AS BIGINT) AS bpe_tokens,
         | round(avg(len(list_filter(regexp_extract_all(text,
         |   '${TextOps.BpeTokenRe.replace("'", "''")}'),
         |   x -> regexp_matches(x, '\\S')))), 4) AS avg_bpe_per_doc
         |FROM documents GROUP BY source""".stripMargin,
    // exact recomputation of the repetition signals: same tokenizer,
    // same adjacent-bigram construction, same distinct/total ratios;
    // int divisions are bit-exact cross-engine, the r4-rounded avgs
    // follow the established avg_quality pattern
    "q_repetition" ->
      """WITH t AS (
        |  SELECT source,
        |   list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT source, toks,
        |   list_transform(range(1, len(toks)),
        |     i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
        |  FROM t),
        |d AS (
        |  SELECT source,
        |   1.0 - len(list_distinct(toks)) * 1.0 / len(toks) AS dup_tok,
        |   CASE WHEN len(bigrams) > 0 THEN
        |     1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams)
        |   END AS dup_bigram
        |  FROM b)
        |SELECT source, count(*) AS n_docs,
        | round(avg(dup_tok), 4) AS avg_dup_token_ratio,
        | round(avg(dup_bigram), 4) AS avg_dup_bigram_ratio,
        | count(*) FILTER (WHERE dup_bigram > 0.2) AS n_repetitive
        |FROM d GROUP BY source""".stripMargin,
    // exact recomputation of the packing accounting: same per-source
    // doc_id-ordered running token total, same integer-div window
    // indices — everything up to the final density division is integer
    // arithmetic, bit-exact cross-engine
    "q_seq_pack" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |   len(list_filter(string_split(text, ' '), x -> x <> ''))
        |     AS ws
        |  FROM documents),
        |c AS (
        |  SELECT source, ws,
        |   sum(ws) OVER (PARTITION BY source ORDER BY doc_id
        |     ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(ws) AS BIGINT) AS total_tokens,
        | CAST((max(cum) + 511) // 512 AS BIGINT) AS n_windows,
        | CAST(count(*) FILTER (WHERE ws > 0
        |   AND (cum - ws) // 512 <> (cum - 1) // 512) AS BIGINT)
        |   AS n_straddlers,
        | round(count(*) * 1.0 / ((max(cum) + 511) // 512), 4)
        |   AS docs_per_window
        |FROM c GROUP BY source""".stripMargin,
    // length-bucketed batching: the same integer-exact construction —
    // bucket by (n_tok + w-1) div w, per-bucket doc_id-ordered ordinal,
    // batch = (ord-1) div B, padding = batch-max minus own length;
    // everything up to the final ratio is integer arithmetic
    "q_length_buckets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |   len(list_filter(string_split(text, ' '), x -> x <> ''))
        |     AS n_tok
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tok,
        |   CAST((n_tok + 15) // 16 AS INT) AS bucket
        |  FROM t),
        |rb AS (
        |  SELECT bucket, n_tok,
        |   (row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
        |     - 1) // 8 AS batch_idx
        |  FROM b),
        |pb AS (
        |  SELECT bucket, batch_idx, max(n_tok) AS mx,
        |   count(*) AS n, sum(n_tok) AS tok
        |  FROM rb GROUP BY bucket, batch_idx)
        |SELECT bucket, CAST(sum(n) AS BIGINT) AS n_docs,
        | CAST(count(*) AS BIGINT) AS n_batches,
        | CAST(sum(mx * n - tok) AS BIGINT) AS pad_tokens,
        | CASE WHEN sum(mx * n) > 0
        |   THEN round(sum(mx * n - tok) * 1.0 / sum(mx * n) + 1e-9, 4)
        |   ELSE 0.0 END AS pad_ratio
        |FROM pb GROUP BY bucket""".stripMargin,
    // the full curation chain recomputed end-to-end: same quality
    // features, same min-id dedup, same portable-hash admission order,
    // same integer-div packing. The oracle reads RAW text where the
    // engine reads the redacted text — the corpus is PII-free
    // (q_pii_scan pins docs_clean = all), so any redaction false
    // positive would desync clean_text and fail THIS row too: the
    // no-op is enforced, not assumed.
    "q_curate" ->
      """WITH q AS (
        |  SELECT doc_id, source, text,
        |   list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, source, text, len(t) AS ws,
        |   CASE WHEN len(t) >= 2 THEN
        |     1.0 - len(list_distinct(list_transform(range(1, len(t)),
        |       i -> t[i] || ' ' || t[i + 1]))) * 1.0 / (len(t) - 1)
        |   ELSE 0.0 END AS dupb
        |  FROM q WHERE len(t) >= 5),
        |d AS (
        |  SELECT doc_id, source, ws,
        |   row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM f WHERE dupb <= 0.2),
        |a AS (
        |  SELECT doc_id, source, ws,
        |   (doc_id % 2147483647) * 2654435761 % 2147483647 AS h
        |  FROM d WHERE rn = 1),
        |p AS (
        |  SELECT doc_id, source, ws,
        |   coalesce(sum(ws) OVER (PARTITION BY source ORDER BY h, doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |     AS prior
        |  FROM a),
        |c AS (
        |  SELECT doc_id, source, ws,
        |   sum(ws) OVER (PARTITION BY source ORDER BY doc_id
        |     ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM p WHERE prior < 2000)
        |SELECT doc_id, source, CAST(ws AS BIGINT) AS n_tokens,
        | CAST((cum - ws) // 512 AS BIGINT) AS window_id
        |FROM c""".stripMargin,
    // the PII patterns are RE2-compatible by construction (Scrub
    // scaladoc), so DuckDB re-evaluates the same regexes; on the
    // synthetic corpus every count is zero except docs_clean — the
    // oracle pins the false-positive rate at exactly zero
    "q_pii_scan" ->
      s"""SELECT source, count(*) AS n_docs,
         | count(*) FILTER (WHERE regexp_matches(text,
         |   '${Scrub.EmailRe}')) AS docs_email,
         | count(*) FILTER (WHERE regexp_matches(text,
         |   '${Scrub.PhoneRe}')) AS docs_phone,
         | count(*) FILTER (WHERE regexp_matches(text,
         |   '${Scrub.Ipv4Re}')) AS docs_ip,
         | count(*) FILTER (WHERE NOT (regexp_matches(text,
         |     '${Scrub.EmailRe}')
         |   OR regexp_matches(text, '${Scrub.PhoneRe}')
         |   OR regexp_matches(text, '${Scrub.Ipv4Re}'))) AS docs_clean
         |FROM documents GROUP BY source""".stripMargin,
    // full recomputation of the 4-gram probe overlap — contiguous
    // n-grams, probe docs 0-2, per-doc distinct matched-gram counts
    // (shared with q_curation_report's contaminated_docs component)
    "q_contamination" -> contaminationOracle,
    "q_curation_report" -> curationReportOracle,
    "q_mix_manifest" -> mixManifestOracle,
    // semantic decontamination: full cross-engine recompute — every
    // probe×train cosine re-derived in SQL (sequential double sums,
    // bit-identical to the fused expression), argmax re-ranked on the
    // same 4-dp round and min-train-id tie; the planted mod-100 leaks
    // pin the TRUE band, the held-out slice the near-miss FALSE band
    "q_semantic_decontam" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |probes AS (
         |  SELECT vec_id AS eval_id, embedding AS q FROM e
         |  WHERE vec_id % 10 = 7
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS eval_id, embedding AS q FROM e
         |  WHERE vec_id % 100 = 3),
         |train AS (
         |  SELECT vec_id, embedding FROM e WHERE vec_id % 10 <> 7),
         |scored AS (
         |  SELECT p.eval_id, t.vec_id,
         |    round(${cosineSql("p.q", "t.embedding")} + 1e-9, 4) AS sim_r
         |  FROM probes p CROSS JOIN train t),
         |best AS (SELECT eval_id, vec_id, sim_r, row_number() OVER (
         |    PARTITION BY eval_id ORDER BY sim_r DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT eval_id, vec_id AS train_id, sim_r AS max_sim,
         |  sim_r >= 0.8 AS contaminated
         |FROM best WHERE rn = 1""".stripMargin,
    // the gate transpose: per-TRAIN-vector max probe cosine — max
    // over the bit-identical unrounded doubles, THEN the shared 4-dp
    // round, matching semanticGate's r4(array_max(...)) order
    "q_semantic_gate" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |probes AS (
         |  SELECT embedding AS q FROM e WHERE vec_id % 10 = 7
         |  UNION ALL
         |  SELECT embedding FROM e WHERE vec_id % 100 = 3),
         |train AS (
         |  SELECT vec_id, embedding FROM e WHERE vec_id % 10 <> 7),
         |scored AS (
         |  SELECT t.vec_id,
         |    round(max(${cosineSql("p.q", "t.embedding")}) + 1e-9, 4)
         |      AS max_eval_sim
         |  FROM train t CROSS JOIN probes p GROUP BY t.vec_id)
         |SELECT vec_id, max_eval_sim,
         |  max_eval_sim >= 0.8 AS semantic_hit
         |FROM scored""".stripMargin,
    // recomputes, from the synthesis parameters, the header fields a
    // correct WAV decode must recover (Multimodal.wavDecodeStats docs)
    "q_wav_decode" ->
      """SELECT CAST(doc_id % 2 + 1 AS INT) AS n_channels,
        | CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |   ELSE 44100 END AS INT) AS sample_rate,
        | count(*) AS n_assets,
        | CAST(sum(44 + (50 + n_chars % 100) * 2 * (doc_id % 2 + 1))
        |   AS BIGINT) AS total_bytes,
        | round(avg(50 + n_chars % 100), 4) AS avg_samples
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // header-decode round-trip for the image modality: width/height
    // and the PADDED row stride are predictable from the synthesis
    // parameters — 54-byte headers + ((3w+3)//4)*4-byte rows
    "q_bmp_decode" ->
      """SELECT CAST(4 + doc_id % 5 AS INT) AS width,
        | count(*) AS n_assets,
        | CAST(sum(54 + (2 + n_chars % 4)
        |   * (((3 * (4 + doc_id % 5)) + 3) // 4) * 4) AS BIGINT)
        |   AS total_bytes,
        | round(avg(2 + n_chars % 4), 4) AS avg_height,
        | CAST(max(2 + n_chars % 4) AS INT) AS max_height
        |FROM documents GROUP BY 1""".stripMargin,
    // container-parse round-trip for the video modality: dims, frame
    // count, and the exact file size are predictable from the
    // synthesis parameters — a fixed 224-byte header region
    // (RIFF + hdrl with avih/strh/strf + the movi list head) plus
    // n_frames chunks of 8 + padded-plane bytes each
    "q_avi_decode" ->
      """SELECT CAST(4 + doc_id % 5 AS INT) AS width,
        | CAST(3 + doc_id % 4 AS INT) AS n_frames,
        | count(*) AS n_assets,
        | CAST(sum(224 + (3 + doc_id % 4)
        |   * (8 + (((3 * (4 + doc_id % 5)) + 3) // 4) * 4
        |     * (2 + n_chars % 4))) AS BIGINT) AS total_bytes,
        | round(avg(2 + n_chars % 4), 4) AS avg_height
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // GOLDEN oracle: the video near-dup pipeline is deterministic
    // end-to-end (synthesized grouped AVIs, frame-sampled integer
    // dHashes, temporal-majority signature, banded Hamming) — pinned
    // (asset_a, asset_b, hamming) at sf0.01, the q_image_neardups
    // form for the video modality.
    "q_video_neardups" ->
      s"""SELECT CAST(a AS BIGINT) AS asset_a, CAST(b AS BIGINT) AS asset_b,
         | CAST(h AS INT) AS hamming FROM (VALUES
         |${videoNearDupGolden}) AS t(a, b, h)""".stripMargin,
    "q_embedding_stats" ->
      """SELECT label, count(*) AS n,
        | round(avg(sqrt(list_sum(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm
        |FROM embeddings GROUP BY label""".stripMargin,
    // exhaustive recompute of the label-anti-filtered top-k
    "q_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, label AS q_label, embedding AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |pairs AS (
        |  SELECT q.query_id, e.vec_id,
        |   list_sum(list_transform(e.embedding,
        |     (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |   / (sqrt(list_sum(list_transform(e.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |      * sqrt(list_sum(list_transform(q.qv,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.label <> q.q_label)
        |SELECT query_id, vec_id, round(sim, 4) AS sim,
        | CAST(rk AS INT) AS rk
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY sim DESC, vec_id) AS rk
        |  FROM pairs)
        |WHERE rk <= 10""".stripMargin,
    // late-interaction retrieval: DuckDB rebuilds the same derived
    // vector sets (vec_id // 4), recomputes every (query vector,
    // corpus vector) cosine, the per-(q_vec, doc) max, and the
    // DECIMAL sum of 4-dp maxes — the full maxsim ranking is
    // cross-engine, no golden
    "q_maxsim" ->
      """WITH v AS (
        |  SELECT vec_id // 4 AS doc, vec_id, embedding FROM embeddings),
        |q AS (
        |  SELECT doc AS query_id, vec_id AS q_vec, embedding AS qv
        |  FROM v WHERE doc < 3),
        |pairs AS (
        |  SELECT q.query_id, q.q_vec, v.doc,
        |   list_sum(list_transform(v.embedding,
        |     (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |   / (sqrt(list_sum(list_transform(v.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |      * sqrt(list_sum(list_transform(q.qv,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
        |  FROM v JOIN q ON v.doc <> q.query_id),
        |mx AS (
        |  SELECT query_id, q_vec, doc, max(sim) AS mx
        |  FROM pairs GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT query_id, doc,
        |    sum(CAST(round(mx, 4) AS DECIMAL(18,6))) AS sdec
        |  FROM mx GROUP BY 1, 2)
        |SELECT query_id, doc AS doc_id, CAST(sdec AS DOUBLE) AS score,
        |  CAST(rk AS INT) AS rk
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY sdec DESC, doc) AS rk
        |  FROM sc)
        |WHERE rk <= 10""".stripMargin,
    // filtered search, exact tier: the brute recompute with the
    // per-query label predicate inside the pair-generation join —
    // DuckDB recomputes the full pre-filtered ranking, so a
    // post-filter bug (qualifying vector displaced by a filtered-out
    // one) or a predicate dropped from the join would hash-mismatch
    "q_ann_filtered" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, label AS q_label, embedding AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |pairs AS (
        |  SELECT q.query_id, e.vec_id,
        |   list_sum(list_transform(e.embedding,
        |     (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |   / (sqrt(list_sum(list_transform(e.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |      * sqrt(list_sum(list_transform(q.qv,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
        |  FROM embeddings e JOIN q
        |    ON e.label = q.q_label AND e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, round(sim, 4) AS sim, CAST(rk AS INT) AS rk
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY sim DESC, vec_id) AS rk
        |  FROM pairs)
        |WHERE rk <= 10""".stripMargin,
    "q_ann_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |pairs AS (
        |  SELECT q.query_id, e.vec_id,
        |   list_sum(list_transform(e.embedding,
        |     (x, i) -> CAST(x AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
        |   / (sqrt(list_sum(list_transform(e.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |      * sqrt(list_sum(list_transform(q.qv,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, round(sim, 4) AS sim, CAST(rk AS INT) AS rk
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY sim DESC, vec_id) AS rk
        |  FROM pairs)
        |WHERE rk <= 10""".stripMargin
  )

  // precomputed goldens for the deterministic hash-valued operators,
  // pinned at the driver's verify scale (sf0.01) — see the oracle
  // comments above for why golden-vs-recomputed is the right form here
  private val simhashGolden: String =
    """(4,264,6),(4,328,5),(5,383,5),(5,401,5),(5,478,6),(8,245,0),
      |  (9,151,6),(9,251,6),(9,340,6),(9,422,5),(14,31,6),(14,337,4),
      |  (14,401,6),(22,473,6),(26,455,6),(31,139,5),(31,296,4),
      |  (31,300,5),(31,383,2),(32,430,6),(35,399,6),(40,126,6),
      |  (44,446,5),(45,267,4),(45,413,1),(51,369,4),(56,161,6),
      |  (58,293,1),(61,185,1),(63,490,6),(67,162,6),(69,113,5),
      |  (70,447,3),(72,377,1),(76,102,2),(76,142,4),(82,452,6),
      |  (87,134,3),(92,450,6),(97,102,6),(98,290,4),(102,142,4),
      |  (107,387,3),(113,126,6),(113,259,5),(113,453,5),(120,332,3),
      |  (126,128,4),(126,167,5),(126,259,5),(126,442,6),(128,300,4),
      |  (128,437,6),(142,230,5),(147,461,6),(152,178,3),(161,242,6),
      |  (161,383,6),(166,323,2),(167,367,4),(173,230,5),(176,461,5),
      |  (182,285,6),(182,353,6),(182,453,6),(197,263,5),(197,461,6),
      |  (201,302,6),(205,376,6),(242,353,6),(243,317,6),(251,422,5),
      |  (251,426,3),(251,439,5),(259,292,6),(259,453,6),(264,381,6),
      |  (267,413,3),(271,360,6),(276,314,5),(285,301,3),(285,453,6),
      |  (294,301,6),(296,353,6),(300,340,5),(300,439,6),(300,473,6),
      |  (309,319,6),(326,457,2),(328,381,5),(340,461,6),(340,473,5),
      |  (353,473,5),(360,383,6),(381,422,6),(393,420,1),(399,430,5),
      |  (401,478,5),(418,452,6),(418,466,6),(422,426,6),(426,440,6),
      |  (435,486,3),(439,473,6),(453,493,4),(453,495,6),(458,462,3),
      |  (458,466,5),(462,466,6),(493,495,6)""".stripMargin

  // delete-restricted goldens (r17, GoldenDump at sf0.01): the
  // tombstoned/compacted serves of the frozen-geometry tiers. As
  // deterministic as their unrestricted twins — same full-corpus fit,
  // the candidate set merely anti-joins the fixture's vec_id % 7 == 6
  // slice — and AnnEraseSpec pins each against a survivors-only build
  // under the same geometry, so the pin's job is catching drift in
  // the tombstone plumbing itself. Re-pin alongside the base goldens.
  private val annIvfDeletedGolden: String =
    """(0,190,0.2818,7),(0,334,0.3627,2),(0,365,0.37,1),
      |  (0,387,0.3311,3),(0,388,0.2763,9),(0,423,0.2969,4),
      |  (0,464,0.2766,8),(0,483,0.2567,10),(0,7,0.2928,6),
      |  (0,73,0.2954,5),(1,124,0.3028,4),(1,203,0.2682,8),
      |  (1,220,0.2898,7),(1,312,0.2591,9),(1,353,0.2466,10),
      |  (1,386,0.3715,1),(1,402,0.2923,5),(1,407,0.327,2),
      |  (1,472,0.2921,6),(1,64,0.3164,3),(2,109,0.2284,10),
      |  (2,112,0.2453,7),(2,117,0.3181,1),(2,145,0.2635,3),
      |  (2,172,0.2398,9),(2,320,0.255,4),(2,350,0.2401,8),
      |  (2,418,0.254,5),(2,450,0.2663,2),(2,471,0.2472,6),
      |  (3,134,0.2506,9),(3,192,0.2908,4),(3,207,0.2917,3),
      |  (3,231,0.2988,2),(3,343,0.3085,1),(3,396,0.261,7),
      |  (3,437,0.2805,5),(3,444,0.2445,10),(3,463,0.2609,8),
      |  (3,474,0.2767,6),(4,114,0.3985,1),(4,249,0.2796,4),
      |  (4,257,0.2724,5),(4,280,0.2798,3),(4,288,0.2286,9),
      |  (4,332,0.2276,10),(4,346,0.2316,8),(4,408,0.3228,2),
      |  (4,470,0.2525,7),(4,89,0.266,6)""".stripMargin

  // equal to annIvfDeletedGolden at sf0.01 by the refine=100 exact
  // re-rank recovery (the annIvfPqGolden precedent) — pinned
  // separately so compressed-tier erasure drift reports its own values
  private val annIvfPqDeletedGolden: String =
    """(0,190,0.2818,7),(0,334,0.3627,2),(0,365,0.37,1),
      |  (0,387,0.3311,3),(0,388,0.2763,9),(0,423,0.2969,4),
      |  (0,464,0.2766,8),(0,483,0.2567,10),(0,7,0.2928,6),
      |  (0,73,0.2954,5),(1,124,0.3028,4),(1,203,0.2682,8),
      |  (1,220,0.2898,7),(1,312,0.2591,9),(1,353,0.2466,10),
      |  (1,386,0.3715,1),(1,402,0.2923,5),(1,407,0.327,2),
      |  (1,472,0.2921,6),(1,64,0.3164,3),(2,109,0.2284,10),
      |  (2,112,0.2453,7),(2,117,0.3181,1),(2,145,0.2635,3),
      |  (2,172,0.2398,9),(2,320,0.255,4),(2,350,0.2401,8),
      |  (2,418,0.254,5),(2,450,0.2663,2),(2,471,0.2472,6),
      |  (3,134,0.2506,9),(3,192,0.2908,4),(3,207,0.2917,3),
      |  (3,231,0.2988,2),(3,343,0.3085,1),(3,396,0.261,7),
      |  (3,437,0.2805,5),(3,444,0.2445,10),(3,463,0.2609,8),
      |  (3,474,0.2767,6),(4,114,0.3985,1),(4,249,0.2796,4),
      |  (4,257,0.2724,5),(4,280,0.2798,3),(4,288,0.2286,9),
      |  (4,332,0.2276,10),(4,346,0.2316,8),(4,408,0.3228,2),
      |  (4,470,0.2525,7),(4,89,0.266,6)""".stripMargin

  private val annLshDeletedGolden: String =
    """(0,320,0.2879,4),(0,323,0.2565,8),(0,344,0.2525,9),
      |  (0,365,0.37,1),(0,387,0.3311,2),(0,388,0.2763,6),
      |  (0,464,0.2766,5),(0,483,0.2567,7),(0,498,0.2507,10),
      |  (0,7,0.2928,3),(1,124,0.3028,4),(1,203,0.2682,7),
      |  (1,220,0.2898,6),(1,268,0.2455,10),(1,312,0.2591,8),
      |  (1,353,0.2466,9),(1,386,0.3715,1),(1,407,0.327,2),
      |  (1,472,0.2921,5),(1,64,0.3164,3),(2,109,0.2284,10),
      |  (2,112,0.2453,6),(2,117,0.3181,1),(2,145,0.2635,2),
      |  (2,172,0.2398,8),(2,197,0.2331,9),(2,320,0.255,3),
      |  (2,350,0.2401,7),(2,418,0.254,4),(2,471,0.2472,5),
      |  (3,130,0.3999,1),(3,149,0.3299,2),(3,192,0.2908,5),
      |  (3,207,0.2917,4),(3,231,0.2988,3),(3,315,0.2852,6),
      |  (3,396,0.261,8),(3,437,0.2805,7),(3,444,0.2445,9),
      |  (3,449,0.2427,10),(4,114,0.3985,1),(4,249,0.2796,3),
      |  (4,257,0.2724,4),(4,288,0.2286,8),(4,332,0.2276,9),
      |  (4,346,0.2316,7),(4,353,0.225,10),(4,408,0.3228,2),
      |  (4,470,0.2525,6),(4,89,0.266,5)""".stripMargin

  private val annIvfShardedGolden: String =
    """(0,190,0.2818,7),(0,320,0.2879,6),(0,334,0.3627,2),
      |  (0,365,0.37,1),(0,387,0.3311,3),(0,388,0.2763,9),
      |  (0,464,0.2766,8),(0,483,0.2567,10),(0,7,0.2928,5),
      |  (0,73,0.2954,4),(1,124,0.3028,6),(1,195,0.3227,4),
      |  (1,203,0.2682,10),(1,220,0.2898,9),(1,27,0.3482,2),
      |  (1,386,0.3715,1),(1,402,0.2923,7),(1,407,0.327,3),
      |  (1,472,0.2921,8),(1,64,0.3164,5),(2,112,0.2453,7),
      |  (2,117,0.3181,1),(2,145,0.2635,3),(2,172,0.2398,9),
      |  (2,197,0.2331,10),(2,320,0.255,4),(2,350,0.2401,8),
      |  (2,418,0.254,5),(2,450,0.2663,2),(2,471,0.2472,6),
      |  (3,130,0.3999,1),(3,149,0.3299,2),(3,174,0.3035,4),
      |  (3,207,0.2917,6),(3,231,0.2988,5),(3,315,0.2852,7),
      |  (3,343,0.3085,3),(3,363,0.2686,10),(3,437,0.2805,8),
      |  (3,474,0.2767,9),(4,114,0.3985,1),(4,249,0.2796,6),
      |  (4,257,0.2724,7),(4,280,0.2798,5),(4,346,0.2316,10),
      |  (4,408,0.3228,3),(4,470,0.2525,9),(4,482,0.3139,4),
      |  (4,496,0.3412,2),(4,89,0.266,8)""".stripMargin

  // Re-pin after a testdata regen: `runMain graft.GoldenDump
  // q_ann_filtered_ivf` (same determinism argument as annIvfGolden:
  // hash-ordered sample, deterministic fit, derived geometry,
  // fused-cosine doubles, vec_id ties; the label predicate adds no
  // nondeterminism — it only narrows the candidate join).
  private val annFilteredIvfGolden: String =
    """(0,16,0.0938,8),(0,271,0.1871,4),(0,320,0.2879,1),
      |  (0,325,0.1355,6),(0,351,0.1864,5),(0,36,0.2387,2),
      |  (0,39,0.0833,10),(0,419,0.0982,7),(0,48,0.0893,9),
      |  (0,99,0.2041,3),(1,165,0.2439,4),(1,195,0.3227,1),
      |  (1,220,0.2898,3),(1,393,0.2129,6),(1,396,0.1371,10),
      |  (1,423,0.1882,7),(1,43,0.1716,8),(1,485,0.1387,9),
      |  (1,64,0.3164,2),(1,80,0.2337,5),(2,127,0.168,6),
      |  (2,19,0.1926,5),(2,197,0.2331,1),(2,266,0.1638,8),
      |  (2,307,0.196,3),(2,340,0.1632,9),(2,371,0.1662,7),
      |  (2,430,0.1553,10),(2,459,0.2234,2),(2,82,0.1935,4),
      |  (3,11,0.1807,8),(3,111,0.1291,9),(3,149,0.3299,1),
      |  (3,207,0.2917,2),(3,236,0.115,10),(3,283,0.2042,7),
      |  (3,349,0.2486,4),(3,363,0.2686,3),(3,428,0.2137,5),
      |  (3,499,0.2107,6),(4,129,0.1631,6),(4,138,0.1634,5),
      |  (4,139,0.1963,2),(4,225,0.1192,9),(4,249,0.2796,1),
      |  (4,317,0.1922,3),(4,391,0.156,7),(4,418,0.15,8),
      |  (4,474,0.1096,10),(4,81,0.17,4)""".stripMargin

  private val annIvfGolden: String =
    """(0,190,0.2818,7),(0,334,0.3627,2),(0,365,0.37,1),
      |  (0,387,0.3311,3),(0,388,0.2763,9),(0,423,0.2969,4),
      |  (0,464,0.2766,8),(0,483,0.2567,10),(0,7,0.2928,6),
      |  (0,73,0.2954,5),(1,124,0.3028,6),(1,195,0.3227,4),
      |  (1,203,0.2682,10),(1,220,0.2898,9),(1,27,0.3482,2),
      |  (1,386,0.3715,1),(1,402,0.2923,7),(1,407,0.327,3),
      |  (1,472,0.2921,8),(1,64,0.3164,5),(2,112,0.2453,8),
      |  (2,117,0.3181,1),(2,145,0.2635,3),(2,172,0.2398,10),
      |  (2,188,0.2633,4),(2,320,0.255,5),(2,350,0.2401,9),
      |  (2,418,0.254,6),(2,450,0.2663,2),(2,471,0.2472,7),
      |  (3,174,0.3035,2),(3,192,0.2908,5),(3,207,0.2917,4),
      |  (3,231,0.2988,3),(3,343,0.3085,1),(3,363,0.2686,8),
      |  (3,396,0.261,9),(3,437,0.2805,6),(3,463,0.2609,10),
      |  (3,474,0.2767,7),(4,114,0.3985,1),(4,249,0.2796,5),
      |  (4,257,0.2724,6),(4,280,0.2798,4),(4,346,0.2316,10),
      |  (4,384,0.2404,9),(4,408,0.3228,3),(4,470,0.2525,8),
      |  (4,496,0.3412,2),(4,89,0.266,7)""".stripMargin

  // audio near-dup pin (GoldenDump r11, sf0.01): the verified
  // (asset_a, asset_b, hamming) set over the planted grouped-WAV
  // corpus — every group's m1 near-dup recovered, m2 borderline by
  // design, the m=3 hard negative never pairs within its group.
  private val audioNearDupGolden: String =
    """(0,1,1),(0,2,2),(1,2,3),(10,252,5),(10,253,5),
      |  (10,254,5),(100,101,3),(100,102,5),(104,105,0),(104,106,1),
      |  (105,106,1),(108,109,0),(108,110,0),(109,110,0),(112,113,2),
      |  (112,371,3),(113,371,5),(115,135,5),(115,451,5),(116,117,0),
      |  (116,118,1),(117,118,1),(12,13,0),(12,14,2),(120,121,1),
      |  (120,122,2),(120,451,6),(121,122,3),(121,451,5),(122,451,6),
      |  (124,125,1),(128,129,0),(128,130,1),(129,130,1),(13,14,2),
      |  (132,133,1),(132,134,3),(133,134,4),(136,137,0),(136,138,1),
      |  (137,138,1),(140,141,0),(140,142,2),(141,142,2),(144,145,0),
      |  (144,146,3),(145,146,3),(146,428,6),(146,429,6),(146,430,6),
      |  (148,149,0),(148,150,0),(149,150,0),(151,156,3),(151,157,3),
      |  (151,158,6),(152,153,0),(152,154,1),(153,154,1),(155,416,3),
      |  (155,417,3),(155,418,4),(156,157,0),(156,158,3),(156,332,5),
      |  (156,333,5),(156,334,6),(157,158,3),(157,332,5),(157,333,5),
      |  (157,334,6),(159,432,5),(159,433,5),(159,434,5),(16,17,0),
      |  (16,18,3),(16,207,6),(160,161,0),(160,162,3),(161,162,3),
      |  (164,165,0),(164,166,1),(165,166,1),(168,169,0),(168,170,2),
      |  (169,170,2),(17,18,3),(17,207,6),(170,322,6),(172,173,1),
      |  (172,174,0),(173,174,1),(176,177,0),(176,178,3),(177,178,3),
      |  (180,181,1),(184,185,0),(184,186,3),(185,186,3),(188,189,0),
      |  (188,190,6),(189,190,6),(19,283,6),(192,193,0),(192,194,1),
      |  (193,194,1),(195,376,2),(195,377,2),(195,378,5),(196,197,1),
      |  (196,198,0),(197,198,1),(20,21,0),(20,22,1),(200,201,0),
      |  (200,202,1),(201,202,1),(204,205,1),(204,206,1),(205,206,2),
      |  (208,209,0),(208,210,0),(209,210,0),(21,22,1),(212,213,0),
      |  (212,214,1),(213,214,1),(216,217,1),(216,218,3),(217,218,4),
      |  (220,221,0),(220,222,4),(221,222,4),(224,225,0),(224,226,5),
      |  (225,226,5),(228,229,2),(232,233,1),(232,234,3),(233,234,4),
      |  (236,237,0),(236,238,0),(237,238,0),(24,25,4),(240,241,0),
      |  (240,242,1),(241,242,1),(244,245,0),(244,420,4),(244,421,4),
      |  (245,420,4),(245,421,4),(248,249,2),(248,250,2),(249,250,4),
      |  (252,253,0),(252,254,0),(253,254,0),(256,257,0),(256,258,1),
      |  (256,340,4),(256,341,4),(257,258,1),(257,340,4),(257,341,4),
      |  (258,340,5),(258,341,5),(260,261,0),(264,265,0),(264,266,4),
      |  (265,266,4),(268,269,0),(268,270,1),(269,270,1),(272,273,0),
      |  (272,274,2),(273,274,2),(276,277,1),(276,278,6),(28,29,0),
      |  (28,30,1),(280,281,0),(280,282,2),(281,282,2),(284,285,0),
      |  (284,286,0),(285,286,0),(288,289,2),(29,30,1),(292,293,0),
      |  (292,294,1),(293,294,1),(296,297,0),(296,298,1),(297,298,1),
      |  (3,35,6),(300,301,1),(300,302,5),(301,302,6),(304,305,1),
      |  (304,306,5),(305,306,4),(308,309,0),(312,313,0),(312,314,3),
      |  (313,314,3),(316,317,2),(316,318,4),(317,318,6),(32,33,0),
      |  (32,34,4),(32,463,0),(32,468,0),(32,469,0),(32,470,0),
      |  (320,321,0),(320,322,2),(321,322,2),(324,325,1),(324,326,2),
      |  (325,326,3),(328,329,0),(328,330,1),(329,330,1),(33,34,4),
      |  (33,463,0),(33,468,0),(33,469,0),(33,470,0),(332,333,0),
      |  (332,334,1),(333,334,1),(336,337,0),(336,338,2),(337,338,2),
      |  (34,463,4),(34,468,4),(34,469,4),(34,470,4),(340,341,0),
      |  (340,342,2),(341,342,2),(344,345,1),(344,346,2),(345,346,3),
      |  (348,349,0),(348,350,3),(349,350,3),(352,353,1),(352,354,3),
      |  (353,354,2),(356,357,1),(356,358,1),(357,358,2),(36,37,1),
      |  (36,38,2),(360,361,0),(360,362,2),(361,362,2),(364,365,1),
      |  (368,369,1),(368,370,2),(369,370,3),(37,38,1),(372,373,0),
      |  (372,374,0),(373,374,0),(376,377,0),(376,378,3),(377,378,3),
      |  (380,381,0),(380,382,2),(381,382,2),(384,385,0),(384,386,0),
      |  (385,386,0),(388,389,1),(388,390,4),(389,390,5),(392,393,0),
      |  (392,394,2),(393,394,2),(396,397,0),(396,398,3),(397,398,3),
      |  (4,5,0),(4,6,2),(40,41,1),(40,42,2),(400,401,0),
      |  (400,402,0),(401,402,0),(404,405,3),(404,406,2),(405,406,5),
      |  (408,409,1),(408,410,0),(409,410,1),(41,42,1),(412,413,0),
      |  (412,414,1),(412,483,4),(413,414,1),(413,483,4),(414,483,5),
      |  (416,417,0),(416,418,1),(417,418,1),(420,421,0),(424,425,0),
      |  (424,426,1),(425,426,1),(428,429,0),(428,430,0),(429,430,0),
      |  (432,433,0),(432,434,2),(433,434,2),(436,437,2),(44,45,0),
      |  (44,46,6),(440,441,1),(441,442,6),(444,445,0),(444,446,1),
      |  (445,446,1),(448,449,0),(448,450,2),(449,450,2),(45,46,6),
      |  (452,453,0),(452,454,4),(453,454,4),(456,457,0),(456,458,0),
      |  (457,458,0),(460,461,1),(460,462,1),(461,462,2),(463,468,0),
      |  (463,469,0),(463,470,0),(464,465,1),(468,469,0),(468,470,0),
      |  (469,470,0),(472,473,1),(472,474,1),(473,474,0),(476,477,1),
      |  (48,49,0),(48,50,3),(480,481,0),(480,482,3),(481,482,3),
      |  (484,485,1),(488,489,1),(488,490,3),(489,490,4),(49,50,3),
      |  (492,493,1),(492,494,2),(493,494,3),(496,497,0),(496,498,1),
      |  (497,498,1),(5,6,2),(52,53,1),(55,131,2),(56,57,0),
      |  (56,58,2),(57,58,2),(60,61,0),(60,62,1),(61,62,1),
      |  (64,65,0),(64,66,2),(65,66,2),(68,69,0),(72,73,0),
      |  (72,74,1),(73,74,1),(76,483,6),(76,77,0),(76,78,1),
      |  (77,483,6),(77,78,1),(8,10,0),(8,252,5),(8,253,5),
      |  (8,254,5),(8,9,0),(80,81,0),(80,82,1),(81,82,1),
      |  (84,85,0),(84,86,5),(85,86,5),(88,89,0),(9,10,0),
      |  (9,252,5),(9,253,5),(9,254,5),(92,93,0),(92,94,2),
      |  (93,94,2),(96,97,0)""".stripMargin

  // drift-monitor pin (GoldenDump r11, sf0.01): per-cell occupancy of
  // the grown ivf_appended index
  private val ivfCellStatsGolden: String =
    """(0,32,0.064),(1,32,0.064),(10,32,0.064),(11,31,0.062),(12,23,0.046),
      |  (13,30,0.06),(14,24,0.048),(15,30,0.06),(2,34,0.068),(3,32,0.064),
      |  (4,27,0.054),(5,32,0.064),(6,33,0.066),(7,34,0.068),(8,41,0.082),
      |  (9,33,0.066)""".stripMargin

  // video near-dup pin (GoldenDump r11, sf0.01): the verified
  // (asset_a, asset_b, hamming) set over the planted grouped-AVI
  // corpus — every group's m0/m1 pair (the temporal majority absorbs
  // the one-frame perturbation), the borderline m2 pairs the golden
  // pins, and the deterministic cross-group coincidences; the m=3
  // hard negative never pairs. A change in the frame sampling, the
  // per-frame dHash, the majority vote, or the banded verify shows up
  // as a hash mismatch here.
  private val videoNearDupGolden: String =
    """(0,1,0),(0,2,0),(1,2,0),(100,101,0),(100,102,1),
      |  (101,102,1),(104,105,0),(104,106,0),(105,106,0),(108,109,0),
      |  (108,110,3),(109,110,3),(112,113,0),(112,114,0),(113,114,0),
      |  (116,117,0),(116,118,0),(116,168,5),(116,169,5),(116,170,6),
      |  (116,407,6),(117,118,0),(117,168,5),(117,169,5),(117,170,6),
      |  (117,407,6),(118,168,5),(118,169,5),(118,170,6),(118,407,6),
      |  (12,13,0),(12,14,1),(120,121,0),(120,122,1),(121,122,1),
      |  (124,125,0),(124,126,3),(125,126,3),(128,129,0),(128,130,2),
      |  (129,130,2),(13,14,1),(132,133,0),(132,134,1),(133,134,1),
      |  (136,137,0),(136,138,2),(137,138,2),(140,141,0),(140,142,4),
      |  (141,142,4),(144,145,1),(144,146,2),(145,146,3),(148,149,0),
      |  (148,150,0),(148,168,5),(148,169,5),(148,170,4),(149,150,0),
      |  (149,168,5),(149,169,5),(149,170,4),(150,168,5),(150,169,5),
      |  (150,170,4),(152,153,0),(152,154,1),(152,407,5),(153,154,1),
      |  (153,407,5),(154,407,6),(156,157,0),(16,17,1),(16,18,4),
      |  (160,161,0),(160,162,0),(161,162,0),(164,165,0),(164,166,0),
      |  (165,166,0),(168,169,0),(168,170,1),(168,407,5),(169,170,1),
      |  (169,407,5),(17,18,5),(170,407,6),(172,173,0),(172,174,4),
      |  (173,174,4),(176,177,1),(176,178,4),(177,178,5),(180,181,0),
      |  (180,182,1),(181,182,1),(184,185,0),(184,186,2),(185,186,2),
      |  (188,189,0),(188,190,0),(189,190,0),(192,193,0),(192,194,3),
      |  (193,194,3),(196,197,1),(196,198,1),(197,198,2),(20,21,0),
      |  (20,22,0),(200,201,0),(200,202,2),(201,202,2),(204,205,0),
      |  (204,206,1),(205,206,1),(208,209,0),(208,210,0),(209,210,0),
      |  (21,22,0),(212,213,0),(212,214,0),(213,214,0),(216,217,0),
      |  (216,218,1),(217,218,1),(220,221,0),(220,222,3),(221,222,3),
      |  (224,225,0),(224,226,2),(225,226,2),(228,229,0),(228,230,0),
      |  (229,230,0),(232,233,0),(232,234,1),(233,234,1),(236,237,0),
      |  (236,238,2),(237,238,2),(24,25,0),(24,26,3),(240,241,1),
      |  (240,242,4),(241,242,5),(244,245,0),(244,246,1),(245,246,1),
      |  (248,249,0),(248,250,0),(249,250,0),(25,26,3),(252,253,0),
      |  (252,254,3),(253,254,3),(256,257,0),(256,258,3),(257,258,3),
      |  (260,261,0),(260,262,2),(261,262,2),(264,265,0),(264,266,2),
      |  (265,266,2),(268,269,0),(268,270,5),(269,270,5),(272,273,0),
      |  (272,274,2),(273,274,2),(276,277,0),(276,278,2),(277,278,2),
      |  (28,29,0),(28,30,3),(280,281,0),(280,282,3),(281,282,3),
      |  (284,285,1),(284,286,1),(285,286,2),(288,289,1),(288,290,0),
      |  (289,290,1),(29,30,3),(292,293,1),(292,294,2),(293,294,3),
      |  (296,297,0),(296,298,0),(297,298,0),(300,301,0),(300,302,2),
      |  (301,302,2),(304,305,2),(304,306,3),(308,309,0),(308,310,0),
      |  (309,310,0),(312,313,1),(312,314,0),(313,314,1),(316,317,0),
      |  (316,318,2),(317,318,2),(32,33,0),(32,34,3),(320,321,0),
      |  (320,322,2),(321,322,2),(324,325,0),(324,326,0),(325,326,0),
      |  (328,329,0),(328,330,0),(329,330,0),(33,34,3),(332,333,0),
      |  (332,334,1),(333,334,1),(336,337,0),(336,338,1),(337,338,1),
      |  (340,341,0),(340,342,2),(341,342,2),(344,345,1),(344,346,0),
      |  (345,346,1),(348,349,0),(348,350,5),(349,350,5),(352,353,0),
      |  (352,354,4),(353,354,4),(356,357,0),(356,358,3),(357,358,3),
      |  (36,37,1),(36,38,3),(360,361,0),(360,362,0),(361,362,0),
      |  (364,365,0),(364,366,1),(365,366,1),(368,369,0),(368,370,1),
      |  (369,370,1),(372,373,0),(372,374,0),(373,374,0),(376,377,0),
      |  (376,378,1),(377,378,1),(380,381,0),(380,382,1),(381,382,1),
      |  (384,385,0),(384,386,0),(385,386,0),(388,389,0),(388,390,0),
      |  (389,390,0),(392,393,0),(392,394,2),(393,394,2),(396,397,0),
      |  (396,398,3),(397,398,3),(4,5,0),(4,6,3),(40,41,0),
      |  (40,42,3),(400,401,0),(400,402,2),(401,402,2),(404,405,0),
      |  (404,406,3),(405,406,3),(408,409,1),(408,410,0),(409,410,1),
      |  (41,42,3),(412,413,0),(412,414,4),(413,414,4),(416,417,0),
      |  (416,418,5),(417,418,5),(420,421,0),(420,422,1),(421,422,1),
      |  (424,425,0),(424,426,0),(425,426,0),(428,429,0),(428,430,1),
      |  (429,430,1),(432,433,0),(432,434,5),(433,434,5),(436,437,0),
      |  (436,438,0),(437,438,0),(44,45,0),(44,46,3),(440,441,0),
      |  (440,442,1),(441,442,1),(444,445,2),(444,446,2),(445,446,4),
      |  (448,449,1),(448,450,1),(449,450,2),(45,46,3),(452,453,0),
      |  (452,454,2),(453,454,2),(456,457,0),(456,458,0),(457,458,0),
      |  (460,461,1),(460,462,1),(461,462,2),(464,465,0),(464,466,4),
      |  (465,466,4),(468,469,0),(468,470,1),(469,470,1),(472,473,0),
      |  (472,474,1),(473,474,1),(476,477,0),(476,478,3),(477,478,3),
      |  (48,49,0),(48,50,1),(480,481,0),(480,482,2),(481,482,2),
      |  (484,485,0),(484,486,3),(485,486,3),(488,489,0),(488,490,0),
      |  (489,490,0),(49,50,1),(492,493,0),(492,494,3),(493,494,3),
      |  (496,497,0),(496,498,2),(497,498,2),(5,6,3),(52,53,0),
      |  (52,54,2),(53,54,2),(56,57,0),(56,58,0),(57,58,0),
      |  (60,61,0),(60,62,1),(61,62,1),(64,65,0),(64,66,2),
      |  (65,66,2),(68,69,0),(68,70,2),(69,70,2),(7,168,6),
      |  (7,169,6),(72,73,0),(72,74,2),(73,74,2),(76,77,0),
      |  (76,78,2),(77,78,2),(8,10,2),(8,9,0),(80,81,0),
      |  (80,82,2),(81,82,2),(84,85,0),(84,86,0),(85,86,0),
      |  (88,89,2),(88,90,0),(89,90,2),(9,10,2),(92,93,1),
      |  (92,94,3),(93,94,4),(96,97,0),(96,98,3),(97,98,3)""".stripMargin

  // image near-dup pin (GoldenDump r11, sf0.01): the verified
  // (asset_a, asset_b, hamming) set over the planted grouped-BMP
  // corpus — every group's (0,1)/(0,2)/(1,2) near-dup pairs plus the
  // deterministic cross-group dHash coincidences; the m=3 hard
  // negative never pairs. A change in the dHash grid, the band split,
  // or the Hamming verify shows up as a hash mismatch here.
  private val imageNearDupGolden: String =
    """(0,1,0),(0,2,0),(1,2,0),(100,101,0),(100,102,1),
      |  (101,102,1),(104,105,0),(104,106,0),(105,106,0),(107,223,5),
      |  (108,109,0),(108,110,0),(109,110,0),(11,479,4),(112,113,0),
      |  (112,114,0),(112,367,5),(113,114,0),(113,367,5),(114,367,5),
      |  (116,117,0),(116,118,0),(117,118,0),(12,13,0),(12,14,0),
      |  (120,121,0),(120,122,0),(121,122,0),(124,125,0),(124,126,1),
      |  (125,126,1),(128,129,0),(128,130,2),(129,130,2),(13,14,0),
      |  (132,133,2),(132,134,0),(133,134,2),(136,137,1),(136,138,2),
      |  (137,138,3),(140,141,0),(140,142,1),(141,142,1),(144,145,0),
      |  (144,146,0),(145,146,0),(148,149,0),(148,150,3),(149,150,3),
      |  (15,380,6),(15,381,6),(15,382,6),(152,153,0),(152,154,1),
      |  (153,154,1),(156,157,1),(156,158,0),(157,158,1),(16,17,0),
      |  (16,18,1),(160,161,0),(160,162,0),(161,162,0),(163,376,2),
      |  (163,377,2),(163,378,2),(164,165,1),(164,166,0),(165,166,1),
      |  (168,169,0),(168,170,0),(168,223,5),(168,435,4),(169,170,0),
      |  (169,223,5),(169,435,4),(17,18,1),(170,223,5),(170,435,4),
      |  (172,173,0),(172,174,1),(173,174,1),(176,177,0),(176,178,2),
      |  (177,178,2),(180,181,2),(180,182,0),(181,182,2),(184,185,0),
      |  (184,186,0),(185,186,0),(188,189,0),(188,190,0),(189,190,0),
      |  (192,193,0),(192,194,2),(193,194,2),(196,197,1),(196,198,3),
      |  (197,198,4),(20,21,0),(20,22,0),(200,201,0),(200,202,0),
      |  (201,202,0),(204,205,0),(204,206,0),(204,459,2),(205,206,0),
      |  (205,459,2),(206,459,2),(208,209,1),(208,210,0),(209,210,1),
      |  (21,22,0),(212,213,0),(212,214,0),(213,214,0),(216,217,0),
      |  (216,218,1),(217,218,1),(220,221,0),(220,222,0),(220,475,6),
      |  (221,222,0),(221,475,6),(222,475,6),(224,225,0),(224,226,1),
      |  (225,226,1),(228,229,0),(228,230,1),(229,230,1),(232,233,0),
      |  (232,234,0),(233,234,0),(236,237,0),(236,238,0),(237,238,0),
      |  (24,25,0),(24,26,2),(24,492,6),(24,493,6),(24,494,6),
      |  (240,241,0),(240,242,0),(241,242,0),(244,245,0),(244,246,1),
      |  (245,246,1),(248,249,1),(248,250,0),(249,250,1),(25,26,2),
      |  (25,492,6),(25,493,6),(25,494,6),(252,253,1),(252,254,3),
      |  (253,254,4),(256,257,0),(256,258,1),(257,258,1),(260,261,0),
      |  (260,262,0),(261,262,0),(264,265,0),(264,266,1),(265,266,1),
      |  (268,269,0),(268,270,1),(269,270,1),(272,273,0),(272,274,0),
      |  (273,274,0),(276,277,0),(276,278,0),(277,278,0),(28,29,0),
      |  (28,30,1),(280,281,0),(280,282,1),(281,282,1),(284,285,1),
      |  (284,286,1),(285,286,2),(288,289,0),(288,290,0),(289,290,0),
      |  (29,30,1),(292,293,0),(292,294,0),(293,294,0),(296,297,0),
      |  (296,298,0),(297,298,0),(300,301,0),(300,302,1),(301,302,1),
      |  (304,305,1),(304,306,1),(305,306,2),(308,309,0),(308,310,0),
      |  (309,310,0),(312,313,0),(312,314,1),(313,314,1),(315,427,6),
      |  (316,317,0),(316,318,3),(317,318,3),(319,332,5),(319,333,6),
      |  (319,334,5),(32,33,1),(32,34,3),(320,321,0),(320,322,1),
      |  (321,322,1),(324,325,0),(324,326,0),(325,326,0),(328,329,0),
      |  (328,330,0),(329,330,0),(33,34,4),(332,333,1),(332,334,0),
      |  (333,334,1),(336,337,0),(336,338,1),(336,427,4),(337,338,1),
      |  (337,427,4),(340,341,0),(340,342,0),(341,342,0),(344,345,0),
      |  (344,346,1),(345,346,1),(348,349,0),(348,350,2),(349,350,2),
      |  (352,353,0),(352,354,2),(353,354,2),(356,357,0),(356,358,1),
      |  (357,358,1),(36,37,1),(36,38,2),(360,361,0),(360,362,1),
      |  (361,362,1),(364,365,1),(364,366,1),(365,366,2),(368,369,0),
      |  (368,370,0),(369,370,0),(37,38,3),(372,373,0),(372,374,0),
      |  (373,374,0),(376,377,0),(376,378,0),(377,378,0),(380,381,0),
      |  (380,382,0),(381,382,0),(384,385,0),(384,386,0),(385,386,0),
      |  (388,389,1),(388,390,0),(389,390,1),(392,393,0),(392,394,1),
      |  (393,394,1),(396,397,0),(396,398,2),(397,398,2),(4,5,0),
      |  (4,6,2),(40,41,0),(40,42,2),(400,401,0),(400,402,0),
      |  (401,402,0),(404,405,1),(404,406,0),(405,406,1),(408,409,2),
      |  (408,410,0),(409,410,2),(41,42,2),(412,413,0),(412,414,1),
      |  (413,414,1),(416,417,0),(416,418,0),(417,418,0),(420,421,0),
      |  (420,422,0),(421,422,0),(424,425,0),(424,426,0),(425,426,0),
      |  (428,429,0),(428,430,0),(429,430,0),(432,433,1),(432,434,3),
      |  (433,434,4),(436,437,0),(436,438,0),(437,438,0),(44,45,0),
      |  (44,46,2),(440,441,0),(440,442,0),(441,442,0),(444,445,1),
      |  (444,446,1),(445,446,2),(448,449,0),(448,450,0),(449,450,0),
      |  (45,46,2),(452,453,0),(452,454,0),(453,454,0),(456,457,1),
      |  (456,458,0),(457,458,1),(460,461,0),(460,462,1),(461,462,1),
      |  (464,465,0),(464,466,2),(465,466,2),(468,469,0),(468,470,0),
      |  (469,470,0),(472,473,1),(472,474,2),(473,474,3),(476,477,0),
      |  (476,478,0),(477,478,0),(48,49,3),(48,50,2),(480,481,0),
      |  (480,482,0),(481,482,0),(484,485,0),(484,486,1),(485,486,1),
      |  (488,489,0),(488,490,0),(489,490,0),(49,50,5),(492,493,0),
      |  (492,494,0),(493,494,0),(496,497,0),(496,498,0),(497,498,0),
      |  (5,6,2),(52,53,0),(52,54,2),(53,54,2),(56,57,1),
      |  (56,58,0),(57,58,1),(60,61,0),(60,62,1),(61,62,1),
      |  (64,65,0),(64,66,0),(65,66,0),(68,69,0),(68,70,1),
      |  (69,70,1),(72,73,0),(72,74,1),(73,74,1),(76,77,0),
      |  (76,78,2),(77,78,2),(8,10,1),(8,9,0),(80,335,1),
      |  (80,81,0),(80,82,1),(81,335,1),(81,82,1),(82,335,2),
      |  (84,85,1),(84,86,0),(85,86,1),(88,89,0),(88,90,1),
      |  (89,90,1),(9,10,1),(92,93,0),(92,94,1),(93,94,1),
      |  (96,97,0),(96,98,0),(97,98,0)""".stripMargin

  // dedicated sharded-IVF-PQ pin (GoldenDump r11, sf0.01, nShards=2,
  // refine=150) — equal to annIvfShardedGolden by re-rank recovery;
  // kept separate so sharded-PQ drift reports against its own values
  private val annIvfPqShardedGolden: String =
    """(0,190,0.2818,7),(0,320,0.2879,6),(0,334,0.3627,2),
      |  (0,365,0.37,1),(0,387,0.3311,3),(0,388,0.2763,9),
      |  (0,464,0.2766,8),(0,483,0.2567,10),(0,7,0.2928,5),
      |  (0,73,0.2954,4),(1,124,0.3028,6),(1,195,0.3227,4),
      |  (1,203,0.2682,10),(1,220,0.2898,9),(1,27,0.3482,2),
      |  (1,386,0.3715,1),(1,402,0.2923,7),(1,407,0.327,3),
      |  (1,472,0.2921,8),(1,64,0.3164,5),(2,112,0.2453,7),
      |  (2,117,0.3181,1),(2,145,0.2635,3),(2,172,0.2398,9),
      |  (2,197,0.2331,10),(2,320,0.255,4),(2,350,0.2401,8),
      |  (2,418,0.254,5),(2,450,0.2663,2),(2,471,0.2472,6),
      |  (3,130,0.3999,1),(3,149,0.3299,2),(3,174,0.3035,4),
      |  (3,207,0.2917,6),(3,231,0.2988,5),(3,315,0.2852,7),
      |  (3,343,0.3085,3),(3,363,0.2686,10),(3,437,0.2805,8),
      |  (3,474,0.2767,9),(4,114,0.3985,1),(4,249,0.2796,6),
      |  (4,257,0.2724,7),(4,280,0.2798,5),(4,346,0.2316,10),
      |  (4,408,0.3228,3),(4,470,0.2525,9),(4,482,0.3139,4),
      |  (4,496,0.3412,2),(4,89,0.266,8)""".stripMargin

  // dedicated IVF-PQ pin (GoldenDump r11, sf0.01) — equal to
  // annIvfGolden today by the re-rank-recovery property; kept separate
  // so PQ-tier drift reports against its own expectation
  private val annIvfPqGolden: String =
    """(0,190,0.2818,7),(0,334,0.3627,2),(0,365,0.37,1),
      |  (0,387,0.3311,3),(0,388,0.2763,9),(0,423,0.2969,4),
      |  (0,464,0.2766,8),(0,483,0.2567,10),(0,7,0.2928,6),
      |  (0,73,0.2954,5),(1,124,0.3028,6),(1,195,0.3227,4),
      |  (1,203,0.2682,10),(1,220,0.2898,9),(1,27,0.3482,2),
      |  (1,386,0.3715,1),(1,402,0.2923,7),(1,407,0.327,3),
      |  (1,472,0.2921,8),(1,64,0.3164,5),(2,112,0.2453,8),
      |  (2,117,0.3181,1),(2,145,0.2635,3),(2,172,0.2398,10),
      |  (2,188,0.2633,4),(2,320,0.255,5),(2,350,0.2401,9),
      |  (2,418,0.254,6),(2,450,0.2663,2),(2,471,0.2472,7),
      |  (3,174,0.3035,2),(3,192,0.2908,5),(3,207,0.2917,4),
      |  (3,231,0.2988,3),(3,343,0.3085,1),(3,363,0.2686,8),
      |  (3,396,0.261,9),(3,437,0.2805,6),(3,463,0.2609,10),
      |  (3,474,0.2767,7),(4,114,0.3985,1),(4,249,0.2796,5),
      |  (4,257,0.2724,6),(4,280,0.2798,4),(4,346,0.2316,10),
      |  (4,384,0.2404,9),(4,408,0.3228,3),(4,470,0.2525,8),
      |  (4,496,0.3412,2),(4,89,0.266,7)""".stripMargin

  private val dupClustersSampleGolden: String =
    """(8,2,'8,245'),(26,2,'26,455'),(31,2,'31,383'),(44,2,'44,446'),
      |  (45,3,'45,267,413'),(58,2,'58,293'),(61,2,'61,185'),
      |  (70,2,'70,447'),(72,2,'72,377'),(87,2,'87,134'),(92,2,'92,450'),
      |  (98,2,'98,290'),(107,2,'107,387'),(120,2,'120,332'),
      |  (152,2,'152,178'),(166,2,'166,323'),(285,2,'285,301'),
      |  (295,2,'295,374'),(310,2,'310,389'),(326,2,'326,457'),
      |  (393,2,'393,420'),(435,2,'435,486'),(458,2,'458,462')"""
      .stripMargin

  private val annLshGolden: String =
    """(0,365,0.37,1),(0,387,0.3311,2),(0,7,0.2928,3),
      |  (0,320,0.2879,4),(0,464,0.2766,5),(0,388,0.2763,6),
      |  (0,483,0.2567,7),(0,323,0.2565,8),(0,344,0.2525,9),
      |  (0,498,0.2507,10),(1,386,0.3715,1),(1,27,0.3482,2),
      |  (1,407,0.327,3),(1,195,0.3227,4),(1,64,0.3164,5),
      |  (1,124,0.3028,6),(1,472,0.2921,7),(1,220,0.2898,8),
      |  (1,203,0.2682,9),(1,312,0.2591,10),(2,117,0.3181,1),
      |  (2,145,0.2635,2),(2,188,0.2633,3),(2,320,0.255,4),
      |  (2,418,0.254,5),(2,471,0.2472,6),(2,112,0.2453,7),
      |  (2,350,0.2401,8),(2,172,0.2398,9),(2,197,0.2331,10),
      |  (3,130,0.3999,1),(3,149,0.3299,2),(3,174,0.3035,3),
      |  (3,231,0.2988,4),(3,207,0.2917,5),(3,192,0.2908,6),
      |  (3,315,0.2852,7),(3,437,0.2805,8),(3,363,0.2686,9),
      |  (3,396,0.261,10),(4,114,0.3985,1),(4,408,0.3228,2),
      |  (4,482,0.3139,3),(4,249,0.2796,4),(4,257,0.2724,5),
      |  (4,89,0.266,6),(4,470,0.2525,7),(4,384,0.2404,8),
      |  (4,346,0.2316,9),(4,288,0.2286,10)""".stripMargin
}
