package graft.operators

import graft.Tables
import graft.functions.Fns.r4
import graft.functions.FusedCosineSimilarity.fusedCosine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus scrubbing for training-data pipelines: PII detection /
  * redaction and benchmark-contamination scanning — the safety passes a
  * pipeline runs between dedup and training.
  *
  * Scale discipline: every operator here is one corpus pass. PII
  * scanning never leaves the scan (regexp predicates fold into the
  * per-source aggregate); contamination broadcasts the bounded probe
  * n-gram set, so the corpus is never shuffled — the only exchange
  * carries (doc_id, gram) rows for MATCHED grams, a
  * contamination-rate-bounded set, not the corpus; semantic
  * decontamination broadcasts the bounded eval vectors and shuffles
  * only per-partition partial-max rows.
  *
  * Reference scope note: the reference pipeline (weather ETL) has no
  * scrubbing tier; these belong to the LLM-data extension mandated by
  * the blueprint (SURVEY.md §2 north-star family).
  */
object Scrub {

  /** PII patterns restricted to the RE2-compatible subset (no
    * backreferences, no lookaround) so Spark's java.util.regex and the
    * oracle's RE2 agree on every input.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redaction transform: PII spans replaced with typed placeholder
    * tokens. Email first — an address would otherwise leave its
    * domain's dotted tail looking like an IP to the next pattern.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-source PII exposure: document counts carrying each PII class,
    * plus the clean count. All-zero on the driver's synthetic word-soup
    * corpus — the oracle then pins the false-positive rate at exactly
    * zero, the same discipline as q_embedding_neardups' empty result.
    */
  def piiScan(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val email = col("text").rlike(EmailRe)
    val phone = col("text").rlike(PhoneRe)
    val ip = col("text").rlike(Ipv4Re)
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(email, 1)).as("docs_email"),
        count(when(phone, 1)).as("docs_phone"),
        count(when(ip, 1)).as("docs_ip"),
        count(when(!email && !phone && !ip, 1)).as("docs_clean"))
  }

  /** Contiguous word n-grams (space-joined) from a token-array COLUMN;
    * docs shorter than `n` tokens contribute none. Unlike Dedup's
    * shingles there is no short-doc collapse — a 3-word doc cannot
    * "contain" a 13-gram. Same staging rule as
    * [[Dedup.shinglesFromTokens]]: `toks` must be a materialized
    * column, not an inline tokenizer — higher-order lambdas re-evaluate
    * non-attribute subexpressions per element, so an inlined
    * `tokens(text)` re-splits the document for EVERY gram (measured:
    * q_contamination 4.9 s → 0.6 s at sf0.1 from this staging alone).
    */
  def wordNgramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Single-shot convenience (tests, tiny inputs) — quadratic in
    * tokens if the result feeds another expression; hot paths stage
    * `tokens(text)` first and call [[wordNgramsFromTokens]].
    */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsFromTokens(TextOps.tokens(text), n)

  /** Benchmark-contamination scan: documents sharing any contiguous
    * word `ngramSize`-gram with the probe set (here the first
    * `nProbes` documents standing in for a benchmark's text; a real
    * deployment passes the eval corpus). Returns one row per
    * contaminated document with its distinct matched-gram count.
    *
    * The 13-gram default is the published-practice window for
    * contamination detection; at 13 a match is essentially never
    * coincidental. The probe set is bounded (benchmarks are MBs, the
    * corpus is the 100 TB side), so probe grams broadcast and the
    * corpus streams through the join unshuffled; only matched
    * (doc_id, gram) rows reach the per-doc count aggregate.
    */
  def contamination(s: SparkSession, d: String, nProbes: Int = 3,
      ngramSize: Int = 13): DataFrame = {
    // explode_outer + post-filter instead of explode: a plain explode
    // plants a `size(grams) > 0` pre-filter that predicate pushdown
    // drags below the parallelism floor's repartition AND inlines with
    // the full n-gram expression — the quadratic tokenizer then runs
    // per-document on the unsharded scan (measured: 3.7 s vs 0.6 s at
    // sf0.1). explode_outer has no pre-filter; the null rows it emits
    // for gram-less docs are dropped AFTER the Generate, where the
    // filter is a cheap attribute test that cannot sink further.
    def grams(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), col("source"),
        TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        explode_outer(wordNgramsFromTokens(col("toks"), ngramSize))
          .as("g"))
      .filter(col("g").isNotNull)
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
    val probeGrams = grams(base.filter(col("doc_id") < nProbes))
      .select(col("g")).distinct()
    // the corpus side is the compute-heavy stage -> parallelism floor
    // (Tables.parallelized), same as every text-family corpus pass
    grams(Tables.parallelized(base.filter(col("doc_id") >= nProbes)))
      .join(broadcast(probeGrams), Seq("g"))
      .groupBy(col("doc_id"), col("source"))
      .agg(countDistinct(col("g")).as("n_matched"))
  }

  /** Semantic (embedding-space) benchmark decontamination — the
    * near-dup counterpart of [[contamination]]'s exact n-gram scan:
    * paraphrased or lightly-edited eval leakage that shares no 13-gram
    * still lands next to its source in embedding space, so each eval
    * probe is scored against its EXACT nearest train vector (max
    * cosine) and flagged when that clears `tau`. Exact by construction
    * — every train vector is scored, no index-recall caveat — which is
    * what a decontamination audit needs: a probe this scan misses
    * silently poisons an eval number.
    *
    * Scale shape is [[contamination]]'s, transposed to vectors: the
    * eval side is small (benchmark suites are MBs) and BROADCASTS; the
    * 100 TB train corpus streams through ONCE with a per-partition
    * partial max per probe (aggregate state = one (sim, id) struct per
    * eval row), so train embeddings never enter an exchange — the only
    * shuffle carries nProbes × nPartitions partial-max rows. The
    * argmax is deterministic cross-engine: sims compare after the
    * suite-wide 4-dp round (the unrounded doubles are already
    * bit-identical — sequential accumulation, Similarity's contract)
    * and ties break on the SMALLEST train id via max(struct(sim, -id)).
    *
    * `evalProbes` needs (eval_id, q); `train` needs (vec_id, embedding).
    */
  def semanticContamination(evalProbes: DataFrame, train: DataFrame,
      tau: Double): DataFrame =
    train.join(broadcast(evalProbes))
      .select(col("eval_id"), col("vec_id"),
        r4(fusedCosine(col("q"), col("embedding"))).as("sim_r"))
      .groupBy(col("eval_id"))
      .agg(max(struct(col("sim_r").as("s"), (-col("vec_id")).as("nid")))
        .as("b"))
      .select(col("eval_id"), (-col("b.nid")).as("train_id"),
        col("b.s").as("max_sim"),
        (col("b.s") >= lit(tau)).as("contaminated"))

  /** Driver registry form over `embeddings`: the held-out slice
    * (vec_id ≡ 7 mod 10) stands in for the benchmark and exercises the
    * near-miss (FALSE) band, and every train vector with vec_id ≡ 3
    * mod 100 is ALSO planted as an eval probe under an offset id — the
    * canonical verbatim-leak case, guaranteeing deterministic
    * max_sim = 1.0 TRUE flags at every scale and testdata regen.
    */
  def semanticContaminationQuery(s: SparkSession, d: String,
      tau: Double = 0.8): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val held = e.filter(pmod(col("vec_id"), lit(10)) === 7)
      .select(col("vec_id").as("eval_id"), col("embedding").as("q"))
    val planted = e.filter(pmod(col("vec_id"), lit(100)) === 3)
      .select((col("vec_id") + lit(1000000L)).as("eval_id"),
        col("embedding").as("q"))
    val train = e.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    semanticContamination(held.union(planted), train, tau)
  }

  /** Per-document transpose of [[semanticContamination]] — the GATE
    * form a curation pipeline runs at ingest: flags every corpus doc
    * whose embedding sits within `tau` of ANY eval probe. The probe
    * set collapses to ONE collected row (benchmark suites are
    * MB-scale) and broadcasts, so the gate is a pure narrow
    * projection over the corpus — `array_max` over the fused cosines,
    * no corpus aggregate; the only exchange collapses the probe set
    * to its one broadcast row, so zero CORPUS rows ever shuffle.
    * Stream-safe under any output mode
    * (the [[graft.streaming.Streams.scrubbedDocuments]] contract).
    * The max applies BEFORE the 4-dp round: the unrounded doubles are
    * engine-identical (sequential accumulation, Similarity's
    * contract), so the rounded max is too. `docs` keeps its columns
    * and gains (max_eval_sim, semantic_hit); an empty probe set
    * passes everything (max_eval_sim = −1).
    *
    * `evalProbes` needs (q); `docs` needs (embedding) at minimum.
    */
  def semanticGate(docs: DataFrame, evalProbes: DataFrame,
      tau: Double): DataFrame =
    docs.crossJoin(broadcast(
        evalProbes.agg(collect_list(col("q")).as("eval_qs"))))
      .withColumn("max_eval_sim",
        r4(coalesce(
          array_max(transform(col("eval_qs"),
            q => fusedCosine(q, col("embedding")))),
          lit(-1.0))))
      .withColumn("semantic_hit", col("max_eval_sim") >= lit(tau))
      .drop("eval_qs")

  /** Driver registry form: [[semanticContaminationQuery]]'s probe
    * views, transposed — one row per TRAIN vector with its max probe
    * cosine. The planted mod-100 leak probes ARE train vectors, so on
    * a corpus with no organic near-dups exactly those flag TRUE
    * (self-cosine 1.0) at every scale and testdata regen.
    */
  def semanticGateQuery(s: SparkSession, d: String,
      tau: Double = 0.8): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val held = e.filter(pmod(col("vec_id"), lit(10)) === 7)
      .select(col("embedding").as("q"))
    val planted = e.filter(pmod(col("vec_id"), lit(100)) === 3)
      .select(col("embedding").as("q"))
    val train = e.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    semanticGate(train, held.union(planted), tau)
      .select(col("vec_id"), col("max_eval_sim"), col("semantic_hit"))
  }
}
