package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binned range (interval-containment) join — the join family whose
  * predicate has NO equality component: points matched to the
  * intervals that contain them, `start <= t < end`, keyed by time
  * alone.
  *
  * Why it needs a dedicated strategy: Spark plans a pure inequality
  * join as BroadcastNestedLoopJoin (or a cartesian product), which is
  * |points|×|intervals| work — the one shape that can never survive a
  * 100× scale-up. The scale-correct plan *manufactures* an equi-key:
  * quantize time into fixed-width buckets, replicate each interval
  * into every bucket it overlaps (`ceil(len/bucket)+1` copies — a
  * bounded, known blow-up), send each point to exactly its own bucket,
  * equi-join on the bucket id, and re-check the exact containment
  * predicate as a residual filter. Each (point, interval) pair meets
  * in exactly one bucket — the point's — so no dedup pass is needed.
  * The join becomes an ordinary shuffled equi-join that AQE can size
  * and skew-split like any other.
  *
  * Bucket-width trade-off: wider buckets mean fewer interval copies
  * but fatter per-bucket partials; narrower buckets bound the
  * per-bucket fan-in (dense event bursts) at the cost of more copies.
  * With `bucket == interval length` every interval lands in at most 2
  * buckets — the default here. At 100 TB the bucket id would also be
  * the layout partition key, turning the shuffle into a co-located
  * join; a hot burst window is an AQE skew-split, not a repartition
  * redesign ([[graft.functions.Skew]] covers the deliberate variant).
  *
  * Arithmetic stays on the exact epoch-nanosecond longs of the events
  * contract (`Tables.events`) — bucket ids, containment, and gaps are
  * integer ops, bit-identical across engines, so the driver oracle is
  * a full DuckDB recompute (`epoch_ns` agrees in both physical
  * schemas).
  */
object RangeJoin {

  private val NsPerMin = 60L * 1000 * 1000 * 1000

  /** Each purchase matched to every corpus-wide "incident window"
    * `[error.ts, error.ts + window)` that contains it — time-only
    * predicate, no user key — then collapsed to a bounded per-purchase
    * summary (how many windows cover it, and the gap to the freshest
    * one). Only purchases covered by at least one window appear, as in
    * the plain SQL inner-join formulation.
    */
  def errorWindowCoverage(s: SparkSession, d: String,
      windowNs: Long = 30 * NsPerMin,
      bucketNs: Long = 30 * NsPerMin): DataFrame =
    pairs(s, d, windowNs, bucketNs)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_windows"),
        min(col("gap_ns")).as("min_gap_ns"))

  /** Raw matched pairs (testing surface for the containment
    * semantics; the registered query uses the bounded aggregate). */
  def pairs(s: SparkSession, d: String, windowNs: Long = 30 * NsPerMin,
      bucketNs: Long = 30 * NsPerMin): DataFrame = {
    val ev = Tables.events(s, d)
    val points = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withColumn("bucket", expr(s"p_ts div ${bucketNs}L"))
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("e_ts"))
      .withColumn("bucket", explode(expr(
        s"sequence(e_ts div ${bucketNs}L, " +
          s"(e_ts + ${windowNs - 1}L) div ${bucketNs}L)")))
    points.join(intervals, Seq("bucket"))
      .where(col("e_ts") <= col("p_ts") &&
        col("p_ts") - col("e_ts") < windowNs)
      .select(col("purchase_id"), col("error_id"),
        (col("p_ts") - col("e_ts")).as("gap_ns"))
  }
}
