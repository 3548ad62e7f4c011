package graft.operators

import graft.Tables
import graft.functions.Fns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents` table: tokenization, explode/flatten (the reference's
  * P1/P2/P8 array surface, clickhouse_etl.py:103-116 / mongodb_etl.py:27
  * — behavior only), quality scoring, language stats, token counting and
  * a deterministic document fingerprint.
  *
  * All per-document work is narrow (no shuffle); only the final
  * token-level groupBys shuffle, keyed on high-cardinality tokens —
  * skew-safe at 100 TB. Everything stays in whole-stage codegen
  * (built-in higher-order array functions, zero UDFs).
  */
object TextOps {

  /** Whitespace tokens with empties dropped — the shared tokenizer. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Adjacent-token bigrams as a slice zip — one narrow expression, no
    * explode (the list never leaves its row). The single definition of
    * the Gopher duplicate-bigram signal's input, shared by
    * [[repetitionStats]], [[Curate]], [[Curation]] and
    * [[Dedup.canonicalDocs]] so the feature cannot drift between its
    * consumers.
    */
  def bigramsOf(toks: Column): Column = {
    val nBi = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), nBi), slice(toks, lit(2), nBi),
      (a, b) => concat_ws(" ", a, b))
  }

  /** P1-style explode: token frequencies across the corpus. */
  def tokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))

  /** P8-style slice: frequencies over only each doc's first 5 tokens. */
  def headTokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(slice(tokens(col("text")), 1, 5)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))

  private val stopwords = Seq("the", "a")

  /** Per-document quality metrics: token counts, mean token length,
    * stopword ratio — the classic pre-training quality-filter features.
    */
  def textStats(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      col("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq_tokens"),
      r4(length(regexp_replace(col("text"), " ", ""))
        .cast("double") / size(toks)).as("avg_token_len"),
      r4(size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*)))
        .cast("double") / size(toks)).as("stopword_ratio"))
  }

  /** BPE-ish pre-tokenizer pattern: the GPT-2 segmentation classes
    * (contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs, whitespace) restricted to the RE2-compatible
    * subset — the original's `\s+(?!\S)` lookahead is dropped so the
    * SQL oracle (RE2) and Spark (java.util.regex) segment identically;
    * both engines use leftmost-first alternation, so token boundaries
    * agree on every input.
    */
  val BpeTokenRe: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** All BPE-ish pre-tokens of `text`, in order (whitespace runs
    * included — the real tokenizer's byte-level stage sees them too).
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenRe), lit(0))

  /** Token-budget accounting per source: the query a pre-training data
    * planner runs to size a mixture — document counts, whitespace-token
    * and BPE-ish-token totals (the two standard budget units), and the
    * BPE-per-doc average. One corpus pass, pure column expressions.
    */
  def tokenBudget(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Fns.r4
    val nBpe = size(filter(bpeTokens(col("text")), t => t.rlike("\\S")))
    Tables.documents(s, d)
      .select(col("source"), size(tokens(col("text"))).as("ws"),
        nBpe.as("bpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).cast("long").as("ws_tokens"),
        sum(col("bpe")).cast("long").as("bpe_tokens"),
        r4(avg(col("bpe"))).as("avg_bpe_per_doc"))
  }

  /** Intra-document repetition signals per source — the Gopher-class
    * quality filter that catches boilerplate/spam: a document whose
    * token bigrams are mostly duplicates of each other is template or
    * generated text, not prose. Per doc: duplicate-token ratio
    * (1 − distinct/total tokens) and duplicate-bigram ratio (same over
    * adjacent-token bigrams); per source: averages plus the count of
    * docs whose bigram ratio exceeds `threshold` (the would-be-dropped
    * set a filtering pass sizes before committing).
    *
    * Scale shape: bigrams are a zip of two slices of the already-split
    * token array — pure narrow column expressions, one corpus pass, no
    * explode (the bigram list never leaves its row), and the only
    * shuffle is the final per-source aggregate.
    */
  def repetitionStats(s: SparkSession, d: String,
      threshold: Double = 0.2): DataFrame = {
    val toks = tokens(col("text"))
    val bigrams = bigramsOf(toks)
    val perDoc = Tables.documents(s, d).select(
      col("source"),
      (lit(1.0) - size(array_distinct(toks)).cast("double")
        / size(toks)).as("dup_tok"),
      when(size(bigrams) > 0,
        lit(1.0) - size(array_distinct(bigrams)).cast("double")
          / size(bigrams)).as("dup_bigram"))
    perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      r4(avg(col("dup_tok"))).as("avg_dup_token_ratio"),
      r4(avg(col("dup_bigram"))).as("avg_dup_bigram_ratio"),
      sum(when(col("dup_bigram") > threshold, 1).otherwise(0))
        .cast("long").as("n_repetitive"))
  }

  /** Sequence-packing accounting per source: documents are concatenated
    * in doc_id order into a token stream that is chopped into
    * fixed-`budget` context windows (the GPT-style packing a training
    * run feeds on). Reports window counts, packing density and how many
    * documents straddle a window boundary (get split across training
    * examples) — the numbers a data planner reads before choosing a
    * packing budget.
    *
    * Scale shape: one scan; the running token total is the two-level
    * sharded prefix sum ([[Prefix.shardedRunningSum]]) ordered by the
    * unique doc_id (deterministic) — a dominant source's stream is
    * sorted by parallel doc_id-range shards, not one task, with the
    * in-plan bounds aggregate sizing the shards. Window indices use
    * integer `div` (exact at any stream length, no double rounding).
    */
  def seqPackStats(s: SparkSession, d: String,
      budget: Int = 512): DataFrame = {
    val cum = Prefix.shardedRunningSum(
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("ws")),
      "source", Seq("doc_id"), "ws", "cum")
    cum
      .withColumn("w_first", expr(s"(cum - ws) div $budget"))
      .withColumn("w_last", expr(s"(cum - 1) div $budget"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws")).as("total_tokens"),
        expr(s"(max(cum) + ${budget - 1}) div $budget").as("n_windows"),
        sum(when(col("ws") > 0 && col("w_first") =!= col("w_last"), 1)
          .otherwise(0)).cast("long").as("n_straddlers"),
        r4(count(lit(1)).cast("double")
          / expr(s"(max(cum) + ${budget - 1}) div $budget"))
          .as("docs_per_window"))
  }

  /** Length-bucketed batching report — the dynamic-batching planner's
    * table: documents are grouped into token-length buckets of
    * `width`, batched `batch` at a time within each bucket (doc_id
    * order, deterministic), and each batch pays padding up to its own
    * max length. Reports, per bucket, the document/batch counts, the
    * padding token mass and the padding ratio — the numbers that
    * decide bucket width for a padded-batch training run (vs
    * [[seqPackStats]], which evaluates the concat-and-chop packing
    * alternative; together they are the two standard answers to
    * variable-length batching).
    *
    * Scale shape: one scan; the per-bucket ordinal is the two-level
    * sharded prefix sum ([[Prefix.shardedRunningSum]] over a unit
    * column, ordered by unique doc_id) — a mega-bucket is numbered by
    * parallel doc_id-range shards, not one window task; batch indices
    * use integer `div`. The two aggregates after it are bucket- and
    * (bucket, batch)-keyed — tiny.
    */
  def lengthBuckets(s: SparkSession, d: String, width: Int = 16,
      batch: Int = 8): DataFrame = {
    val perDoc = Tables.documents(s, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("bucket",
        expr(s"(n_tok + ${width - 1}) div $width").cast("int"))
      .withColumn("one", lit(1L))
    val padded = Prefix.shardedRunningSum(perDoc, "bucket",
        Seq("doc_id"), "one", "ord")
      .withColumn("batch_idx", expr(s"(ord - 1) div $batch"))
      .groupBy(col("bucket"), col("batch_idx"))
      .agg(max(col("n_tok")).as("mx"), count(lit(1)).as("n"),
        sum(col("n_tok")).as("tok"))
    padded.groupBy(col("bucket")).agg(
      sum(col("n")).cast("long").as("n_docs"),
      count(lit(1)).as("n_batches"),
      sum(col("mx") * col("n") - col("tok")).cast("long")
        .as("pad_tokens"),
      when(sum(col("mx") * col("n")) > 0,
        r4(sum(col("mx") * col("n") - col("tok")).cast("double")
          / sum(col("mx") * col("n")))).otherwise(lit(0.0d))
        .as("pad_ratio"))
  }

  /** Corpus stats per (lang, source): volume and quality score. The
    * quality score is a simple length saturation — a placeholder with
    * the right shape (bounded, monotone) for a real scorer.
    */
  def langSourceStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        r4(avg(col("n_chars"))).as("avg_chars"),
        r4(avg(least(col("n_chars") / 500.0, lit(1.0)))).as("avg_quality"))

  /** Per-source distribution drift against the corpus — the mixture
    * monitor a multi-source training pipeline runs before reweighting
    * ([[Sampling]]'s token mixture decides proportions; this decides
    * whether a source's CONTENT distribution has moved): KL(p_s‖q)
    * and total-variation distance between each source's Lidstone
    * (α = ½) unigram distribution p_s and the whole-corpus
    * distribution q, both over the (V+1)-slot event space (the unseen
    * slot makes both exact probability distributions, so TVD ∈ [0,1]
    * and KL ≥ 0 hold by construction, not approximately).
    *
    * Scale shape: one explode; the corpus count table is V-bounded
    * and stays distributed; the evaluation grid is vocab × sources —
    * sources is a GROUP-sized table (broadcast), so the grid is a
    * broadcast join over the vocab, never a corpus-sized exchange;
    * per-source totals and the unseen-slot term ride along as
    * broadcast one-row/dim frames. 4 dp sums (shared contract).
    */
  def sourceDrift(s: SparkSession, d: String,
      alpha: Double = 0.5): DataFrame = {
    // materialize the doc-sized token-array frame BEFORE exploding:
    // the interpreted filter(split()) chain would otherwise re-run per
    // generator row (Dedup.hashedShingleArrays' measured pathology),
    // and `occ` feeds THREE aggregates below (lazy + audit-transparent,
    // the Dedup.lazyCheckpoint convention)
    val occ = Dedup.lazyCheckpoint(
      Tables.parallelized(Tables.documents(s, d))
        .select(col("source"), tokens(col("text")).as("toks")))
      .select(col("source"), explode(col("toks")).as("w"))
    val corpus = occ.groupBy("w")
      .agg(count(lit(1)).cast("double").as("c"))
    val tot = corpus.agg(sum(col("c")).as("n"),
      count(lit(1)).cast("double").as("v"))
    val srcTot = occ.groupBy("source")
      .agg(count(lit(1)).cast("double").as("ns"))
    val srcCnt = occ.groupBy("source", "w")
      .agg(count(lit(1)).cast("double").as("cs"))
    val grid = corpus.crossJoin(broadcast(srcTot))
      .join(srcCnt, Seq("source", "w"), "left")
      .crossJoin(broadcast(tot))
    val ps = (coalesce(col("cs"), lit(0.0)) + alpha) /
      (col("ns") + lit(alpha) * (col("v") + 1.0))
    val q = (col("c") + alpha) /
      (col("n") + lit(alpha) * (col("v") + 1.0))
    // closed-form unseen-slot contribution per source
    val ps0 = lit(alpha) / (col("ns") + lit(alpha) * (col("v") + 1.0))
    val q0 = lit(alpha) / (col("n") + lit(alpha) * (col("v") + 1.0))
    grid.groupBy(col("source"), col("ns"), col("n"), col("v"))
      .agg(sum(ps * log(ps / q)).as("klv"),
        sum(abs(ps - q)).as("tvv"))
      .select(col("source"), col("ns").cast("long").as("n_tokens"),
        r4(col("klv") + ps0 * log(ps0 / q0)).as("kl"),
        r4((col("tvv") + abs(ps0 - q0)) * 0.5).as("tvd"))
  }

  /** Deterministic 64-bit document fingerprint (xxhash64 of normalized
    * text) + 64-bit SimHash over token hashes. Engine-specific hash
    * values → no SQL oracle; used by dedup and covered by ScalaTest.
    *
    * SimHash: per token, xxhash64 gives 64 bits; each bit votes ±1;
    * the sign vector re-packs into a long. Expressed with higher-order
    * array functions so it is fully distributed and codegen-friendly.
    */
  def fingerprints(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    // 64 codegen'd aggregate() passes over the staged hash array beat
    // an explode + 64-sum hash-aggregate here (measured 0.3s vs 4.4s at
    // sf0.1): the array passes stay in a register-resident loop with no
    // shuffle, no hash-map updates, no row materialization
    val docs = Tables.parallelized(
      Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(
        col("doc_id"),
        xxhash64(regexp_replace(lower(col("text")), "\\s+", " "))
          .as("fingerprint"),
        transform(toks, t => xxhash64(t)).as("tok_hashes"))
    val nToks = size(col("tok_hashes"))
    val bitCols = (0 until 64).map { i =>
      val votes = aggregate(col("tok_hashes"), lit(0),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(1).cast("int"))
      when(votes * 2 >= nToks, lit(1L << i)).otherwise(0L)
    }
    docs.select(col("doc_id"), col("fingerprint"),
      bitCols.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Language-ID trigram profiles: per-language top-50 character
    * trigrams. Split fit/score API — fit once, score many: the fit scans
    * the training split (one aggregate + window + a tiny collect — the
    * model is ~langs×50 strings, the one legitimate collect); scoring
    * never refits.
    */
  type LangProfiles = Seq[(String, Seq[String])]

  private val profileCache =
    new scala.collection.concurrent.TrieMap[String, LangProfiles]()

  /** Fit per-language trigram profiles from a deterministic training
    * split (doc_id % 10 == 0) of the documents at `d`.
    */
  def fitLangProfiles(s: SparkSession, d: String): LangProfiles = {
    val docs = Tables.parallelized(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"), lower(col("text")).as("lt"))
    val grams = docs.filter(col("doc_id") % 10 === 0)
      .select(col("lang"), explode(charTrigrams(col("lt"))).as("gram"))
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("n"))
    // top-50 trigrams per language = the "model" (fit → driver → lit)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("gram"))
    grams
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 50)
      .groupBy(col("lang")).agg(collect_list(col("gram")).as("grams"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).sorted.toSeq)
      .sortBy(_._1).toSeq
  }

  /** The cached model for a data dir — fit at most once per JVM.
    *
    * CONTRACT: the cache keys on the path and NEVER self-invalidates —
    * a long-lived driver (or test JVM) that rewrites the documents at
    * `d` in place keeps scoring with the model fit from the OLD data.
    * That is the intended trade (immutable corpus paths are the norm at
    * scale; refitting per query is the scale bug this cache fixes).
    * Callers that do rewrite a path in place must call
    * [[clearLangProfiles]] for it first.
    */
  def langProfiles(s: SparkSession, d: String): LangProfiles =
    profileCache.getOrElseUpdate(d, fitLangProfiles(s, d))

  /** Drop the cached model for `d` (all paths when `d` is null) so the
    * next [[langProfiles]] call refits — the explicit invalidation hook
    * for in-place rewrites.
    */
  def clearLangProfiles(d: String = null): Unit =
    if (d == null) profileCache.clear() else { profileCache.remove(d); () }

  /** Score documents against fitted profiles: distinct-trigram overlap
    * per language; the profiles ship to executors as literal arrays (the
    * corpus never reshuffles). Scoring is `size(array_intersect(...))`
    * per language — a narrow pass, no explode/join/window over the
    * corpus. The whole fit+score path is deterministic and expressible
    * in SQL (trigram counts → ranked top-50 profiles → distinct-gram
    * overlap argmax), so the registered row carries a FULL per-doc
    * cross-engine oracle since r14.
    */
  def scoreLangId(documents: DataFrame,
      profiles: LangProfiles): DataFrame = {
    // stage the lowered text: charTrigrams' lambda must reference an
    // attribute, or the lowercasing re-runs per trigram
    val scored = documents
      .select(col("doc_id"), col("lang"), lower(col("text")).as("lt"))
      .select(col("doc_id"), col("lang"),
        array_distinct(charTrigrams(col("lt"))).as("dg"))
    val scores = profiles.map { case (lang, gs) =>
      struct(
        size(array_intersect(col("dg"),
          array(gs.map(lit(_)): _*))).as("score"),
        lit(lang).as("p_lang"))
    }
    // argmax via array_max over (score, lang) structs — ties break on
    // the lexicographically LAST lang, mirrored in nothing external
    // (rows-only check); no window, no shuffle
    scored.select(col("doc_id"), col("lang"),
      array_max(array(scores: _*)).getField("p_lang").as("predicted"))
  }

  /** Fit-once language-ID over the documents at `d`. */
  def langId(s: SparkSession, d: String): DataFrame =
    scoreLangId(
      Tables.parallelized(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))),
      langProfiles(s, d))

  /** Character trigrams of an ALREADY-LOWERED string column. Callers
    * must pass an attribute (stage `lower(text)` first): the transform
    * lambda re-evaluates non-attribute children per element.
    */
  def charTrigrams(lowered: Column): Column =
    when(length(lowered) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(lowered) - 2),
        i => lowered.substr(i, lit(3))))

  /** Regression-pinning companion to [[langId]]: the (true lang,
    * predicted lang, count) confusion matrix. The whole path is
    * deterministic — profile fit breaks ties on (count desc, gram),
    * scoring argmax on the lexicographically-last lang — so the matrix
    * is a stable fingerprint of the heuristic's behavior on a fixed
    * corpus, checkable against a precomputed golden. (The driver
    * corpus draws all languages from one shared token pool, so
    * ACCURACY there is chance-level by construction — the ledger's 1.0
    * is measured on separable synthetic docs in `TextOpsSpec`; this
    * companion pins behavior, not accuracy.)
    */
  def langIdConfusion(s: SparkSession, d: String): DataFrame =
    langId(s, d).groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Oracle-checkable companion to [[fingerprints]]: the histogram of
    * fingerprint equivalence-class sizes. The fingerprint is
    * xxhash64(whitespace-normalized lowered text), so — absent 64-bit
    * collisions, vanishingly unlikely at verify scale — its classes are
    * exactly the normalized-text classes, which DuckDB computes directly
    * by grouping on the normalized string. Catches both a broken
    * normalization and a degenerate hash, without needing xxhash64 in
    * the oracle engine.
    */
  /** Cross-document boilerplate-span removal (C4 / "Deduplicating
    * Training Data Makes Language Models Better"-style): any word
    * n-gram occurring in at least `minDocs` DISTINCT documents marks
    * every token position it covers as boilerplate; covered tokens are
    * stripped and the survivors are re-joined in order. Output per doc:
    * token counts before/after, the covered-fraction, and the cleaned
    * text.
    *
    * Scale shape: grams shuffle as (doc_id, pos, xxhash64) — the 8-byte
    * hash, never the gram text — keyed on the high-cardinality hash, so
    * the boilerplate count is a two-phase partial aggregate with no skew
    * (a 64-bit collision could only over-mark; at corpus scales past
    * ~2^32 grams widen the key with a second seeded hash). The covered
    * position set re-joins on (doc_id, pos) and the reassembly is a
    * per-doc collect bounded by document length. No stage holds more
    * than one document's tokens in memory.
    *
    * Skew: boilerplate grams are hot BY DEFINITION (a header shared by
    * a million pages is one join key with a million occurrence rows),
    * so the occurrence↔membership join splits on `hotDocs`: grams in
    * ≥ `hotDocs` docs are few — at most total-occurrences/hotDocs —
    * and ride a BROADCAST membership probe (their occurrences never
    * shuffle at all; membership is all the join carries, the C4
    * observation that past the threshold the per-gram doc list is
    * irrelevant), while the cold remainder keeps the shuffle join
    * with per-key width now bounded by `hotDocs`. The split is
    * disjoint, so the union is exactly the unsplit join (spec-pinned
    * on a planted hot-gram corpus).
    */
  def boilerplate(s: SparkSession, d: String, n: Int = 8,
      minDocs: Int = 2, hotDocs: Int = 1024): DataFrame = {
    val docs = Tables.parallelized(Tables.documents(s, d))
      .select(col("doc_id"), tokens(col("text")).as("ts"))
    // sequence(1, size-(n-1)) counts DOWN when the doc is shorter than
    // n tokens — guard with an empty array so short docs yield no grams
    val grams = docs
      .select(col("doc_id"), col("ts"),
        explode(when(size(col("ts")) >= n,
          sequence(lit(1), size(col("ts")) - (n - 1)))
          .otherwise(array())).as("p"))
      .select(col("doc_id"), col("p"),
        xxhash64(array_join(slice(col("ts"), col("p"), lit(n)), " "))
          .as("g"))
    val boiler = grams
      .groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
    // hot/cold split of the membership join (see the skew note above):
    // the hot side is bounded-small, so it broadcasts and its
    // occurrences never enter an exchange
    val coveredOcc = grams
      .join(boiler.filter(col("nd") < hotDocs).select(col("g")), "g")
      .unionByName(grams.join(
        broadcast(boiler.filter(col("nd") >= hotDocs).select(col("g"))),
        "g"))
    val covered = coveredOcc
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (n - 1))).as("pos"))
      .distinct()
    // posexplode_outer keeps token-less docs as a (null, null) row, so
    // one grouped pass yields totals, kept counts AND the reassembled
    // text — no extra corpus scan or per-doc re-join for n_tokens
    val toks = docs.select(col("doc_id"),
      posexplode_outer(col("ts")).as(Seq("i", "tok")))
      .select(col("doc_id"), (col("i") + 1).as("pos"), col("tok"))
    val keptTok = col("tok").isNotNull && col("cov").isNull
    toks.join(covered.withColumn("cov", lit(true)),
        Seq("doc_id", "pos"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(when(col("tok").isNotNull, 1))
          .cast("int").as("n_tokens"),
        count(when(keptTok, 1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(when(keptTok,
            struct(col("pos"), col("tok"))))), x => x.getField("tok")),
          " ").as("cleaned_text"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - col("n_kept")).cast("long").as("n_covered"),
        r4((col("n_tokens") - col("n_kept")).cast("double") /
          col("n_tokens")).as("covered_frac"),
        col("cleaned_text"))
  }

  def fingerprintClasses(s: SparkSession, d: String): DataFrame =
    fingerprints(s, d)
      .groupBy(col("fingerprint")).agg(count(lit(1)).as("n_copies"))
      .groupBy(col("n_copies")).agg(count(lit(1)).as("n_classes"))

  /** Per-doc oracle-checkable form of [[fingerprints]]: each document
    * with its fingerprint-equivalence-class representative (the min
    * doc_id sharing the fingerprint) and class size. The Spark side
    * derives classes FROM the xxhash64 fingerprint; the oracle groups
    * the raw normalized text — so a broken normalization OR a
    * degenerate hash flips per-document rows, not just the histogram
    * [[fingerprintClasses]] pins. One window shuffle on the 8-byte
    * hash key; column pruning drops the simhash subtree entirely.
    */
  def fingerprintMembers(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fingerprint"))
    fingerprints(s, d)
      .select(col("doc_id"),
        min(col("doc_id")).over(w).as("fp_class"),
        count(lit(1)).over(w).as("n_copies"))
  }

  /** RAG-style document chunking: overlapping token windows of
    * `window` tokens every `stride` (overlap = window − stride), the
    * unit the retrieval stack indexes when whole documents are too
    * long to embed or rank. Chunk starts are `0, stride, 2·stride, …`
    * while they fall inside the doc, so the final window may be short
    * (never empty) and every token belongs to ≥ 1 chunk; tokenless
    * docs emit nothing. Output rows
    * (doc_id, chunk_idx 1-based, start 0-based, n_tokens, chunk) are a
    * pure function of the text — fully oracle-recomputable — and the
    * chunk column is documents-shaped, so the ANN/BM25/int8 builders
    * consume a chunks table unchanged (chunk identity = the
    * (doc_id, chunk_idx) pair).
    *
    * Scale shape: one projection + one generator per doc — the only
    * exchange is [[graft.Tables.parallelized]]'s single-file
    * scan-parallelism repartition, absent on a sharded corpus; the
    * output is ~(len/stride)× the corpus rows, the intended fan-out.
    */
  def chunks(s: SparkSession, d: String, window: Int = 64,
      stride: Int = 48): DataFrame = {
    require(window >= stride && stride > 0, "need window >= stride > 0")
    Tables.parallelized(Tables.documents(s, d))
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .withColumn("len", size(col("ts")))
      .filter(col("len") > 0)
      .select(col("doc_id"), col("ts"),
        posexplode(sequence(lit(0), col("len") - 1, lit(stride))))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("chunk_idx"),
        col("col").cast("int").as("start"),
        slice(col("ts"), col("col") + 1, lit(window)).as("cts"))
      .select(col("doc_id"), col("chunk_idx"), col("start"),
        size(col("cts")).cast("int").as("n_tokens"),
        array_join(col("cts"), " ").as("chunk"))
  }

  /** Vocabulary overlap across sources — the domain-similarity signal a
    * mixture planner reads before weighting sources: for every
    * unordered source pair, distinct-token intersection size and
    * Jaccard. Scale shape: the corpus reduces to the distinct
    * (source, token) set first (vocabulary-sized), and the pair join is
    * token-keyed over THAT set — per-token fan-out is bounded by
    * sources², never corpus rows; per-source vocabulary sizes ride in
    * as a broadcast.
    */
  def vocabOverlap(s: SparkSession, d: String): DataFrame = {
    // the distinct (source, token) frame feeds three consumers (sizes
    // + both self-join sides) — lazily materialized once so the token
    // explode and distinct shuffle don't re-run per consumer
    val st = Dedup.lazyCheckpoint(
      Tables.parallelized(Tables.documents(s, d))
        .select(col("source"), explode(tokens(col("text"))).as("token"))
        .distinct())
    val sizes = st.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = st.as("a")
      .join(st.as("b"), col("a.token") === col("b.token") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(broadcast(sizes.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n", "na")), "source_a")
      .join(broadcast(sizes.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n", "nb")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        r4(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared"))).as("jaccard"))
  }

  /** PMI collocation mining — the corpus-linguistics pass that finds
    * word pairs co-occurring far above chance: PMI(a,b) =
    * ln((c_ab/M)/((c_a/N)(c_b/N))) over adjacent-token bigrams with a
    * min-count support floor (rare pairs have unboundedly inflated
    * PMI). Counts are two corpus aggregates (bigram-keyed and
    * vocab-keyed — TYPE-sized shuffles, the q_perplexity shape); the
    * vocab table joins back twice. The top-k ranks by the ROUNDED
    * score (the BM25 convention: ln() may differ between libm
    * implementations by an ulp, and ranking on raw doubles would let
    * that flip an order the hash compare then sees), ties by the pair
    * text.
    */
  def collocations(s: SparkSession, d: String, minCount: Int = 5,
      k: Int = 20): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(tokens(col("text")).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val n = uni.agg(sum(col("cw")).as("n"))
    val bi = toks
      .filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2")))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cab"))
    val m = bi.agg(sum(col("cab")).as("m"))
    bi.filter(col("cab") >= minCount)
      .join(broadcast(uni.select(col("w").as("w1"), col("cw").as("ca"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("cw").as("cb"))),
        Seq("w2"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(m))
      .select(col("w1"), col("w2"), col("cab"),
        r4(log((col("cab").cast("double") / col("m")) /
          ((col("ca").cast("double") / col("n")) *
            (col("cb").cast("double") / col("n"))))).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
