package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders,
  SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines. At 100 TB, sampling
  * must be deterministic (reruns and retries see the same sample — no
  * rand()), distributed (no driver state), and pushdown-friendly.
  */
object Sampling {

  /** Engine-portable multiplicative hash: `(id mod p) · 2654435761
    * mod p`, p = 2³¹−1 — the admission/sampling order key the registry
    * shares with its SQL oracles. The id is reduced BEFORE the multiply
    * so the product stays under 2⁶³ for ANY long id: Spark wraps
    * silently on overflow (non-ANSI) while oracle engines raise on
    * BIGINT overflow, so the unreduced form diverges or errors past
    * id ≈ 3.47e9. For id < p the value equals the classic
    * `(id · 2654435761) mod p`. SQL twin:
    * `(id % 2147483647) * 2654435761 % 2147483647`.
    */
  def portableHash(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    pmod(pmod(id, lit(2147483647L)) * lit(2654435761L), lit(2147483647L))

  /** Deterministic hash sample: keep rows whose key hashes into the
    * first `fraction` of the hash space. Stable across runs, retries and
    * cluster layouts; sampling by KEY (not row) keeps all rows of a key
    * together — sample by document id, get whole documents.
    */
  def hashSample(df: DataFrame, keyCol: String,
      fraction: Double): DataFrame =
    df.filter(
      pmod(xxhash64(col(keyCol)), lit(1000000L)) < (fraction * 1000000).toLong)

  /** Diversity coreset over the embedding corpus: greedy farthest-point
    * (Gonzalez k-center) selection — start from the minimum vec_id,
    * then `k−1` times pick the vector farthest (max over candidates of
    * the min cosine distance to every selected center). The classic
    * 2-approximation for k-center cover, and the standard way to pull a
    * small maximally-diverse seed set (eval probes, annotation budgets,
    * centroid inits) out of a corpus. Output: one row per round
    * (`rnd`, `vec_id`, `mind` — the selected vector's distance to the
    * previously-selected set; the seed row carries NULL, and the last
    * row's `mind` is the k-center cover radius of the unselected rest).
    *
    * Determinism contract: distances are `round(1 − fusedCosine, 6)`
    * and the per-round argmax orders by (mind DESC, vec_id ASC) — the
    * round-then-rank convention every retrieval oracle here uses, so an
    * external engine replays the greedy trajectory exactly.
    *
    * Scale shape: each round is ONE narrow corpus pass — the running
    * min-distance column folds the new center in via `least(...)`
    * against a LITERAL center vector (no join, no exchange beyond the
    * 1-row TakeOrdered argmax), and `localCheckpoint` cuts the lineage
    * so round r's plan does not replay rounds 1..r−1. Driver state is
    * k center vectors — the same bounded-collect class as the k-means
    * centroid fits. Never all-pairs: k passes of n cosines, not n².
    */
  def coreset(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    import graft.functions.FusedCosineSimilarity.fusedCosine
    import s.implicits._
    val e = Tables.parallelized(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"))
    val seed = e.orderBy(col("vec_id")).limit(1)
      .collect()(0)
    val seedId = seed.getLong(0)
    def vecOf(r: org.apache.spark.sql.Row): Seq[Float] =
      r.getSeq[Float](1)
    var picks = Vector((0, seedId, Option.empty[Double]))
    var center = vecOf(seed)
    // candidates carry a running min distance to the selected set
    var state = e.filter(col("vec_id") =!= seedId)
      .withColumn("mind",
        round(lit(1.0) - fusedCosine(col("embedding"),
          typedLit(center)), 6))
      .localCheckpoint(false)
    (1 until k).foreach { r =>
      val pick = state
        .orderBy(col("mind").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("embedding"), col("mind"))
        .collect()(0)
      picks :+= ((r, pick.getLong(0), Some(pick.getDouble(2))))
      center = vecOf(pick)
      state = state.filter(col("vec_id") =!= pick.getLong(0))
        .withColumn("mind",
          least(col("mind"), round(lit(1.0) -
            fusedCosine(col("embedding"), typedLit(center)), 6)))
        .localCheckpoint(false)
    }
    picks.map(p => (p._1, p._2, p._3))
      .toDF("rnd", "vec_id", "mind")
  }

  /** Deterministic stratified sample over documents: an exact modulo
    * rule per stratum so the sample is reproducible AND SQL-expressible
    * (oracle-able), with per-stratum counts to audit the rate.
    */
  def stratifiedDocSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("first_id"))

  /** Token-budgeted mixture sampling — the pre-training data-planner
    * op: admit documents per source, in a deterministic pseudo-random
    * order, until each source's token budget is met. Returns the
    * per-source achieved mixture (docs admitted, tokens admitted).
    *
    * Determinism & oracle form: the admission order is the portable
    * multiplicative hash [[portableHash]] (the hash this registry
    * already uses for weighted sampling), ties broken by doc_id; a
    * document is admitted when the tokens of PRECEDING admitted docs
    * are still under budget — so the first doc crossing the budget is
    * included and every engine agrees on the exact set.
    *
    * Scale note: the admission prefix sum is the two-level sharded
    * form ([[Prefix.shardedRunningSum]]) — the hash order key is
    * uniform over [0, 2³¹−1) by construction, so constant-width hash
    * ranges shard a dominant source's sort across tasks with no bounds
    * scan. At 100 TB a planner would additionally pre-cut — admit
    * `h < hₘₐₓ·(budget/total_tokens)` from the per-source token totals
    * ([[graft.operators.TextOps.tokenBudget]]), one scan, no sort —
    * then run this exact form over the ~budget-sized survivors. The
    * exact form is the contract; the pre-cut feeds it less data.
    */
  def tokenMixture(s: SparkSession, d: String,
      perSourceBudget: Long = 2000): DataFrame = {
    val toks = graft.Tables.documents(s, d).select(
      col("source"), col("doc_id"),
      size(graft.operators.TextOps.tokens(col("text"))).as("n_tokens"),
      portableHash(col("doc_id")).as("h"))
    Prefix.shardedRunningSum(toks, "source", Seq("h", "doc_id"),
        "n_tokens", "cum_adm", bounds = Some((0L, 2147483646L)))
      .withColumn("prior", col("cum_adm") - col("n_tokens"))
      .filter(col("prior") < perSourceBudget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
  }

  /** Temperature-smoothed source sampling weights — the multilingual/
    * multi-source rebalancing rule (XLM-R / mT5 practice): qₛ ∝ pₛ^α
    * with α < 1 upweights tail sources without letting any dominate.
    * One group-sized aggregate (sources are few); emitted per source:
    * the raw share, the smoothed sampling weight, the expected docs
    * per epoch at corpus size, and the up/down-sampling factor — the
    * table a shard writer consumes directly. pow() can differ between
    * libm implementations by an ulp, so every derived double passes
    * the 4 dp contract (the q_source_drift log() precedent).
    */
  def temperatureMix(s: SparkSession, d: String,
      alpha: Double = 0.3): DataFrame = {
    val counts = Tables.documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val n = counts.agg(sum(col("n_docs")).as("n_total"))
    val sm = counts.crossJoin(broadcast(n))
      .select(col("source"), col("n_docs"), col("n_total"),
        (col("n_docs").cast("double") / col("n_total")).as("p"),
        pow(col("n_docs").cast("double") / col("n_total"), lit(alpha))
          .as("pa"))
    val z = sm.agg(sum(col("pa")).as("z"))
    sm.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"),
        graft.functions.Fns.r4(col("p")).as("raw_share"),
        graft.functions.Fns.r4(col("pa") / col("z")).as("q_share"),
        graft.functions.Fns.r4(col("pa") / col("z") * col("n_total"))
          .as("expected_docs"),
        graft.functions.Fns.r4(col("pa") / col("z") / col("p"))
          .as("resample_factor"))
  }

  /** Typed reservoir-sample Aggregator: uniform k-sample of the
    * DISTINCT values per group in a single pass with O(k) state — the
    * Dataset-API custom-aggregate surface (`Aggregator[IN, BUF, OUT]`).
    * Selection is deterministic (splitmix64 of the value), so merges
    * commute and retries agree: each value gets a stable pseudo-random
    * priority; the reservoir keeps the k smallest priorities (a
    * distributed bottom-k).
    *
    * Multiset semantics: duplicate values collapse (the priority is a
    * pure function of the value, so repeats carry no extra mass) — this
    * samples the value SET uniformly, the right shape for id sampling.
    * Per-row multiplicity would need a stable per-row identity to seed
    * the priority, which a deterministic distributed fold doesn't have;
    * callers who want row weighting should use [[weightedSample]] with a
    * count weight instead.
    */
  final case class Reservoir(k: Int,
      items: Vector[(Long, Long)]) { // (priority, value), kept sorted asc
    def add(value: Long): Reservoir = {
      val pr = Sampling.mix64(value)
      insert((pr, value))
    }
    // bounded insertion into the sorted vector: O(log k) search +
    // O(k) copy only when the item actually lands in the bottom-k —
    // no per-row sort/distinct/allocation storm
    def insert(p: (Long, Long)): Reservoir = {
      var lo = 0
      var hi = items.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val it = items(mid)
        val c =
          if (it._1 != p._1) java.lang.Long.compare(it._1, p._1)
          else java.lang.Long.compare(it._2, p._2)
        if (c < 0) lo = mid + 1 else hi = mid
      }
      if (lo < items.length && items(lo) == p) this // dup value, no mass
      else if (items.length >= k && lo >= k) this   // not in bottom-k
      else copy(items =
        ((items.take(lo) :+ p) ++ items.drop(lo)).take(k))
    }
    def merge(other: Reservoir): Reservoir =
      other.items.foldLeft(this)(_.insert(_))
  }

  def mix64(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  class ReservoirSampleAgg(k: Int)
      extends Aggregator[(String, Long), Reservoir, Seq[Long]] {
    override def zero: Reservoir = Reservoir(k, Vector.empty)
    override def reduce(b: Reservoir, a: (String, Long)): Reservoir =
      b.add(a._2)
    override def merge(b1: Reservoir, b2: Reservoir): Reservoir =
      b1.merge(b2)
    override def finish(r: Reservoir): Seq[Long] =
      r.items.map(_._2).sorted
    // structured (not Kryo) buffer: Tungsten rows the partial-agg
    // exchange can size and spill, no opaque blobs
    override def bufferEncoder: Encoder[Reservoir] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Reservoir]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Bounded top-k by score — the aggregate form of top-k-per-group.
    * Unlike `row_number().over(window) <= k` (which shuffles and sorts
    * EVERY candidate row per group), this aggregator's buffer holds at
    * most k entries, and partial aggregation combines per-partition
    * top-ks before the shuffle: the exchange carries k rows per group
    * per map partition instead of the full candidate set — the
    * difference between shuffling ~k×partitions rows and shuffling the
    * corpus at 100 TB.
    * Ties break toward the smaller id (matches the window ordering
    * `sim DESC, vec_id ASC`).
    */
  final case class TopK(k: Int, items: Vector[(Double, Long)]) {
    // items kept sorted best-first (score DESC, id ASC); bounded
    // insertion — a row worse than the current kth is a single
    // comparison, not a sort
    def insert(p: (Double, Long)): TopK = {
      var lo = 0
      var hi = items.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val it = items(mid)
        // it ranks before p?
        val before = it._1 > p._1 || (it._1 == p._1 && it._2 < p._2)
        if (before) lo = mid + 1 else hi = mid
      }
      if (items.length >= k && lo >= k) this
      else copy(items =
        ((items.take(lo) :+ p) ++ items.drop(lo)).take(k))
    }
  }

  /** Bounded top-k aggregator; the group key type `K` is only consumed
    * by `groupByKey`, so any key shape works (vector ids, strata names).
    */
  class TopKByScoreAgg[K](k: Int)
      extends Aggregator[(K, Long, Double), TopK, Seq[(Long, Double)]] {
    override def zero: TopK = TopK(k, Vector.empty)
    override def reduce(b: TopK, a: (K, Long, Double)): TopK =
      b.insert((a._3, a._2))
    override def merge(b1: TopK, b2: TopK): TopK =
      b2.items.foldLeft(b1)(_.insert(_))
    override def finish(r: TopK): Seq[(Long, Double)] =
      r.items.map { case (score, id) => (id, score) }
    override def bufferEncoder: Encoder[TopK] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TopK]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** Bounded bottom-k + total count in one pass: keeps the k smallest
    * values AND the full group cardinality with O(k) state. The
    * per-group summary shape for skew-proof cluster reporting
    * ([[graft.operators.Dedup.dupClustersSample]]) — a mega-group
    * contributes a count and k ids to the exchange, never its whole
    * membership.
    */
  final case class BottomK(k: Int, n: Long, items: Vector[Long]) {
    def add(value: Long): BottomK = {
      var lo = 0
      var hi = items.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (items(mid) < value) lo = mid + 1 else hi = mid
      }
      val kept =
        if (items.length >= k && lo >= k) items
        else ((items.take(lo) :+ value) ++ items.drop(lo)).take(k)
      copy(n = n + 1, items = kept)
    }
    def merge(other: BottomK): BottomK = {
      val merged = other.items.foldLeft(this)(_ insertOnly _)
      merged.copy(n = n + other.n)
    }
    private def insertOnly(value: Long): BottomK = {
      val r = add(value); r.copy(n = n)
    }
  }

  class BottomKCountAgg(k: Int)
      extends Aggregator[(Long, Long), BottomK, (Long, Seq[Long])] {
    override def zero: BottomK = BottomK(k, 0L, Vector.empty)
    override def reduce(b: BottomK, a: (Long, Long)): BottomK = b.add(a._2)
    override def merge(b1: BottomK, b2: BottomK): BottomK = b1.merge(b2)
    override def finish(r: BottomK): (Long, Seq[Long]) = (r.n, r.items)
    override def bufferEncoder: Encoder[BottomK] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[BottomK]()
    override def outputEncoder: Encoder[(Long, Seq[Long])] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Long, Seq[Long])]()
  }

  /** Weighted k-sample per group (Efraimidis–Spirakis): each row gets
    * priority u^(1/w) for a deterministic uniform u derived from its
    * key hash; the k highest priorities per group form a weighted
    * sample without replacement. Single pass, map-side partial top-k,
    * deterministic under retries — the distributed weighted-sampling
    * shape for quality-weighted corpus selection.
    *
    * Precondition: weights must be > 0 — u^(1/w) is only the ES priority
    * for positive w (w=0 gives 1/w=Inf, w<0 priorities >1, both corrupt
    * the ordering). Rows with null or non-positive weight are excluded,
    * which matches the math: zero weight = zero selection probability.
    */
  /** ES priority column: u^(1/w) for a deterministic uniform u derived
    * from the id hash. u in (0,1): hash → [-1,1] → shifted/halved;
    * endpoints have measure ~2^-63 and pow handles them finitely.
    */
  private def esPriority(idCol: String, weightCol: String)
      : org.apache.spark.sql.Column = {
    val u = (xxhash64(col(idCol)).cast("double") /
      lit(Long.MaxValue.toDouble) + 1.0) / 2.0
    pow(u, lit(1.0) / col(weightCol))
  }

  /** @param priorityOverride replaces the default xxhash64-seeded ES
    *   priority — used when the priority must be reproducible OUTSIDE
    *   Spark (e.g. the DuckDB oracle can't compute xxhash64; see
    *   [[weightedDocSample]]'s portable Lehmer-style uniform).
    *
    * Precondition: `idCol` must be unique within each group — the
    * recovery semi-join matches on (group, id), so a duplicated id
    * would return more than k rows. Null group keys form their own
    * group (`<=>` join), matching the window-form oracle's null
    * partition.
    */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int,
      priorityOverride: Option[org.apache.spark.sql.Column] = None)
      : DataFrame = {
    // priorities flow through the bounded TopK aggregator: partial
    // per-partition top-k, so the exchange carries at most k rows per
    // group per map partition — never the corpus. (A ranking window
    // here would shuffle and SORT every row per group; that form
    // survives only as the test oracle, weightedSampleWindow.)
    val pr = priorityOverride.getOrElse(esPriority(idCol, weightCol))
    val scored = df.filter(col(weightCol) > 0)
      .select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"), pr.as("pr"))
    import df.sparkSession.implicits._
    val picked = scored.as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(new TopKByScoreAgg[String](k).toColumn.name("topk"))
      .toDF("__g", "topk")
      .select(col("__g"), explode(col("topk")).as("kv"))
      .select(col("__g"), col("kv._1").as("__id"))
    // recover the full rows with a semi-join against the (≤ k×groups,
    // broadcast-able) sampled-id set; `<=>` keeps a null group key as
    // its own partition, same as the window form
    df.join(picked,
      df(groupCol).cast("string") <=> col("__g") &&
        df(idCol).cast("long") === col("__id"),
      "left_semi")
  }

  /** The ranking-window form of [[weightedSample]] — identical output,
    * O(group) shuffle+sort cost. Kept ONLY as the equality oracle for
    * tests; never use it on corpus-sized data.
    */
  def weightedSampleWindow(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__priority").desc, col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("__priority", esPriority(idCol, weightCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__priority", "__rk")
  }

  /** k event ids uniformly sampled per event type (typed API). */
  def sampledEventIds(s: SparkSession, d: String, k: Int = 5)
      : Dataset[(String, Seq[Long])] = {
    val ev = Tables.events(s, d)
    import ev.sparkSession.implicits._
    ev.select(col("event_type"), col("event_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(new ReservoirSampleAgg(k).toColumn.name("sample"))
  }

  /** Driver-contract form of [[sampledEventIds]]: reservoir sample as a
    * DataFrame (event_type, id list as a sorted CSV string). Hash-valued
    * (splitmix64 priorities aren't portable SQL) → rows-only check;
    * `SamplingSpec` pins the value-level semantics.
    */
  def reservoirEventSample(s: SparkSession, d: String, k: Int = 5)
      : DataFrame =
    sampledEventIds(s, d, k)
      .toDF("event_type", "sample")
      .select(col("event_type"),
        concat_ws(",", col("sample")).as("sampled_ids"),
        size(col("sample")).as("n_sampled"))

  /** Weighted document sample, length-weighted (w = n_chars), k per
    * lang — the driver-contract form of [[weightedSample]]. The ES
    * uniform here is a Lehmer-style multiplicative hash instead of
    * xxhash64 so the oracle engine can recompute it exactly in plain
    * SQL: u = ([[portableHash]](doc_id) + 0.5) / 2^31, strictly inside
    * (0,1). Priority pow(u, 1/w) — identical IEEE double math in both
    * engines.
    */
  def weightedDocSample(s: SparkSession, d: String, k: Int = 5)
      : DataFrame = {
    val docs = Tables.documents(s, d)
    val u = (portableHash(col("doc_id")).cast("double") + lit(0.5)) /
      lit(2147483648.0)
    val pr = pow(u, lit(1.0) / col("n_chars").cast("double"))
    weightedSample(docs, "lang", "doc_id", "n_chars", k, Some(pr))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }
}
