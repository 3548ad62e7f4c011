package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata star schema (TESTDATA.md).
  *
  * Every operator takes `sfDir` so the same logical plan runs at any scale
  * factor; at cluster scale these would be partitioned table paths and the
  * parquet scans benefit from column pruning + predicate pushdown exactly
  * as they do here.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** `events.ts` arrives in either of two physical schemas depending on
    * the testdata generation: parquet TIMESTAMP(NANOS) — which Spark's
    * vectorized reader rejects, so it is read as a raw nanosecond long —
    * or plain TIMESTAMP(MICROS). Both normalize to the same downstream
    * contract every operator and oracle assumes: `ts` is an epoch
    * NANOSECOND long (exact integer ordering and gap arithmetic,
    * bit-identical across engines — DuckDB's `epoch_ns(ts)` agrees in
    * both cases) and `ts_event` is a micros real timestamp for
    * date/hour bucketing and streaming watermarks.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEvents(t(s, d, "events"))
  }

  /** Normalize a raw events frame in either physical schema to the
    * downstream contract (also used by the streaming specs, which
    * readStream the same parquet).
    */
  def normalizeEvents(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_event", timestamp_micros(expr("ts div 1000")))
      case _ =>
        val tsLtz = col("ts").cast("timestamp")
        raw.withColumn("ts_event", tsLtz)
          .withColumn("ts", unix_micros(tsLtz) * lit(1000L))
    }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Parallelism floor for COMPUTE-HEAVY corpus stages (shingling,
    * signature hashing, trigram scoring, bucket projections): when the
    * scan yields fewer than half the cluster's cores worth of
    * partitions — a single unsplittable parquet file, an upstream dump
    * of a few huge files — repartition to full parallelism before the
    * expensive per-row work. The round-robin exchange moves only the
    * pruned input columns (the text corpus is a fraction of the CPU
    * cost it unlocks); on a properly-sharded layout the condition never
    * fires and this is a no-op. Deliberately NOT applied to the
    * relational tables: their per-row work is cheap enough that the
    * extra exchange loses (measured in the r3 layout bench — small
    * dimension-join queries regressed 0.4–0.6× under forced sharding
    * while the text family gained 1.6–2.8×).
    */
  def parallelized(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target)
    else df
  }
}
