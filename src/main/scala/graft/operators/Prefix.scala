package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level (sharded) prefix sums — the scale-safe form of
  * `sum(v).over(Window.partitionBy(key).orderBy(ord))`.
  *
  * The single-window form funnels each key's entire partition through
  * ONE task's sort: correct and spill-safe, but serial on a dominant
  * key — a real training corpus has one (web ≈ 80%+ of documents), so
  * at 100 TB one reducer sorts and prefix-sums most of the corpus.
  * This helper computes the identical column with the sort sharded:
  *
  *  1. assign each row a shard by a MONOTONE function of the leading
  *     order column: `shard = (lead − lo) div width`, `width` sized so
  *     `shards` spans cover the observed range (bounds come from an
  *     in-plan min/max aggregate — no driver action — or are passed by
  *     the caller when the column's range is known by construction,
  *     e.g. a `mod 2³¹−1` hash);
  *  2. one hash exchange on (key, shard), shared by both consumers
  *     below via ReuseExchange;
  *  3. local inclusive running sum per (key, shard) — parallel window
  *     over bounded spans — and per-(key, shard) totals;
  *  4. per-shard offsets: a window over the TINY totals table (at most
  *     `shards` rows per key), broadcast-joined back;
  *     `out = local + offset`.
  *
  * Bit-identical to the single-window form: the shard function is
  * monotone in the leading order column, so "earlier shard" ⇔ "smaller
  * lead", and equal lead values land in the same shard — composite-
  * order ties never straddle a boundary; within a shard the window
  * orders by the full composite key. All arithmetic is integer, so no
  * float-reassociation concerns.
  *
  * Parallelism caveat: the shard function splits the ORDER-KEY RANGE
  * evenly, so balance assumes roughly uniform density of the leading
  * column over its range — true by construction for hash order keys
  * (admission hashes) and for dense surrogate ids. A pathologically
  * clustered order key concentrates shards; raise `shards` or pre-map
  * the key in that case.
  */
object Prefix {

  /** Adds `out` = running (inclusive) sum of `value` per `key` in
    * `orderCols` order. An exclusive "prior" form is `out − value`.
    *
    * @param bounds known (min, max) of the leading order column; when
    *   absent they are computed by an in-plan broadcast aggregate (one
    *   extra column-pruned pass over `df`).
    */
  def shardedRunningSum(df: DataFrame, key: String, orderCols: Seq[String],
      value: String, out: String, bounds: Option[(Long, Long)] = None,
      shards: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val lead = orderCols.head
    // a null lead sorts FIRST under the window's default ascending
    // order, so nulls get a dedicated shard -1 below every real shard
    // (shard exprs are ≥ 0) — without this a null lead made __shard
    // null and the === offsets join silently dropped the row
    val sharded = bounds match {
      case Some((lo, hi)) =>
        val width = math.max((hi - lo) / shards + 1, 1L)
        df.withColumn("__shard",
          coalesce(expr(s"($lead - $lo) div $width"), lit(-1L)))
      case None =>
        // in-plan bounds: a broadcast one-row aggregate over the pruned
        // leading column — declarative (no .head() at construction),
        // and near-free under parquet min/max statistics
        val b = df.groupBy()
          .agg(min(col(lead)).as("__lo"), max(col(lead)).as("__hi"))
        df.crossJoin(broadcast(b))
          .withColumn("__shard", coalesce(expr(
            s"($lead - __lo) div greatest((__hi - __lo) div $shards + 1, 1)"),
            lit(-1L)))
          .drop("__lo", "__hi")
    }
    // one explicit exchange on (key, shard): the local window and the
    // shard-totals aggregate both consume it, and their subplans are
    // identical, so ReuseExchange materializes the staged corpus once
    val staged = sharded.repartition(col(key), col("__shard"))
    val lw = Window.partitionBy(col(key), col("__shard"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = staged.withColumn("__local",
      sum(col(value).cast("long")).over(lw))
    val totals = staged.groupBy(col(key), col("__shard"))
      .agg(sum(col(value).cast("long")).as("__tot"))
    // offsets table: ≤ `shards` rows per key — the single-task window
    // here runs over shard COUNTS, not corpus rows
    val ow = Window.partitionBy(col("__k")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .select(col(key).as("__k"), col("__shard").as("__s"), col("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(ow), lit(0L)))
      .drop("__tot")
    local
      .join(broadcast(offsets),
        col(key) <=> col("__k") && col("__shard") === col("__s"))
      .withColumn(out, col("__local") + col("__off"))
      .drop("__local", "__off", "__k", "__s", "__shard")
  }
}
