package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle into training shards — the hand-off
  * step from curation to the training loader: every document gets a
  * pseudo-random but reproducible (shard, position), so shard files
  * can be written once and streamed in a fixed order, any shard
  * prefix is an unbiased corpus sample, and a re-run after a crash
  * reproduces the identical layout (no RNG state to lose).
  *
  * Permutation key: the Knuth multiplicative hash
  * `h = (doc_id · 2654435761) mod 2³²` — closed-form integer
  * arithmetic, so the full assignment is DuckDB-recomputable
  * (engine-internal hashes like xxhash64 are not; a production
  * deployment that needs 64-bit mixing swaps the key expression and
  * gives up the cross-engine oracle, nothing else changes).
  * `shard = h mod N`; `pos` = rank of `(h, doc_id)` within the shard.
  *
  * Scale shape: assignment is embarrassingly parallel; materializing
  * ordered shards is ONE repartition-by-shard + sort-within-partition
  * pass (Spark's native shuffle+sort — no global sort, no window over
  * the corpus). The [[trainShards]] audit DOES use a per-shard
  * row_number window to emit positions for the oracle; the writer
  * path never needs it (the sort order IS the position).
  */
object Shard {

  private val Knuth = 2654435761L
  private val M32 = 4294967296L

  /** (doc_id, shard, pos) for every document — the audit/oracle view
    * of the permutation.
    */
  def trainShards(s: SparkSession, d: String, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col("doc_id"))
    Tables.parallelized(Tables.documents(s, d))
      .select(col("doc_id"),
        ((col("doc_id") * Knuth) % M32).as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Stratified train/val/test split: within each stratum (language),
    * docs rank by the same hash permutation and are cut at EXACT
    * integer fractions — `⌊n·trainPct/100⌋` to train, the next
    * `⌊n·valPct/100⌋` to val, the rest to test — so per-stratum
    * proportions are exact (not just expected), assignment is
    * deterministic and leak-free under re-runs, and integer arithmetic
    * keeps the boundaries engine-identical (a float fraction could
    * flip a boundary doc cross-engine).
    *
    * Scale shape: one rank window + one count per stratum — strata
    * (languages) are few and internally large, the partitionBy is on
    * the stratum key; at extreme per-stratum cardinality the rank
    * window becomes the same repartition+sort pass as [[writeShards]].
    */
  def stratifiedSplit(s: SparkSession, d: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      "need 0 < trainPct, 0 <= valPct, trainPct + valPct <= 100")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    val cw = Window.partitionBy(col("lang"))
    // ⌊n·p/100⌋ per boundary (NOT floor of the summed fractions —
    // that shifts the val cut); n·p ≪ 2⁵³ and a non-divisible n·p sits
    // ≥ 0.01 from an integer, so the double floor equals the oracle's
    // integer division exactly
    val trainCut = floor(col("n") * trainPct / lit(100.0))
    val valCut = trainCut + floor(col("n") * valPct / lit(100.0))
    Tables.parallelized(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"),
        ((col("doc_id") * Knuth) % M32).as("h"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
      .select(col("doc_id"), col("lang"),
        when(col("rk") <= trainCut, "train")
          .when(col("rk") <= valCut, "val")
          .otherwise("test").as("split"))
  }

  /** Near-dup-aware train/val/test split — the leakage-safe form of
    * [[stratifiedSplit]]: a per-doc split can put two near-duplicate
    * documents on opposite sides of the train/eval boundary, leaking
    * eval content into training. Here the split unit is the GROUP —
    * the connected component of the verified near-dup pair graph
    * ([[Dedup.minhashPairs]] at its 0.7 default, collapsed by
    * [[Dedup.clusterPairs]]' min-id labeling; docs in no pair are
    * their own group) — so every member of a near-dup component lands
    * on the same side, by construction.
    *
    * Assignment hashes the group REPRESENTATIVE (the component-min
    * doc id) with the same Knuth permutation as [[trainShards]] and
    * cuts the 32-bit hash RANGE at exact integer boundaries
    * (`⌊2³²·p/100⌋`), not a rank: group count ≈ doc count, so the
    * corpus-wide rank window [[stratifiedSplit]] affords per-stratum
    * would be a global sort here. Range cuts are embarrassingly
    * parallel, give expected (not exact) fractions, and stay
    * engine-exact in integer arithmetic — the whole assignment is
    * DuckDB-recomputable from the parquet text (exhaustive Jaccard +
    * recursive-CTE components + the same hash constants).
    *
    * Scale shape: pair generation and clustering are the existing
    * banded/star-contraction paths (never all-pairs); the only added
    * work is one broadcast-sized left join of (doc_id → component
    * label) onto the corpus and a closed-form hash per row.
    */
  def leakageSafeSplit(s: SparkSession, d: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      "need 0 < trainPct, 0 <= valPct, trainPct + valPct <= 100")
    val trainBound = M32 * trainPct / 100 // ⌊2³²·p/100⌋, exact in Long
    val valBound = M32 * (trainPct + valPct) / 100
    val labels = Dedup.clusterPairs(
      Dedup.minhashPairs(s, d).select(col("doc_a"), col("doc_b")))
      .withColumnRenamed("cluster_id", "rep_of_clustered")
    Tables.parallelized(Tables.documents(s, d))
      .select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rep_of_clustered"), col("doc_id")).as("rep_id"))
      .withColumn("h", (col("rep_id") * Knuth) % M32)
      .select(col("doc_id"), col("rep_id"),
        when(col("h") < trainBound, "train")
          .when(col("h") < valBound, "val")
          .otherwise("test").as("split"))
  }

  /** Materialize the shards: one dir per shard, rows in (h, doc_id)
    * order — the file order IS the training order, so the loader just
    * streams. One shuffle (keyed on shard), one partition-local sort.
    */
  def writeShards(s: SparkSession, d: String, outDir: String,
      nShards: Int = 8): Unit =
    Tables.documents(s, d)
      .withColumn("h", (col("doc_id") * Knuth) % M32)
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("h"), col("doc_id"))
      .drop("h")
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
}
