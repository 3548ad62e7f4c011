package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction via a Bloom filter — the storage-side runtime
  * filter a 100 TB fact⋈dim join wants: build a compact bit-set over
  * the FILTERED build side's join keys, then drop probe-side rows that
  * cannot match BEFORE they enter the shuffle. Catalyst's own
  * `InjectRuntimeFilter` applies the same trick automatically when its
  * cost heuristics fire; exposing it as an explicit operator makes the
  * reduction deterministic (no heuristic flip at a different scale
  * factor) and lets a pipeline persist/reuse the filter across queries
  * the way it persists its lake indexes.
  *
  * Scale posture: the filter itself is the only driver-side object —
  * `expectedItems` keys at ~7.3 bits/key (the sketch library's sizing
  * for its default 3% fpp), i.e. ~0.9 MB per million build keys — the
  * same bounded-model shape as the IVF centroid fits. It re-enters the
  * plan as a BinaryType literal, so executors evaluate the codegen'd
  * `might_contain` against task-local bytes; nothing per-row crosses
  * back to the driver. False positives only pass extra rows into the
  * exact join that follows — the reduction can never change a result,
  * which is what makes the composed query fully oracle-checkable.
  */
object Bloom {

  /** Aggregate `keyCol` (LongType) of `df` into a Bloom filter sized
    * for `expectedItems`, returned as the sketch's serialized bytes.
    * One partial sketch per partition, OR-merged — a single bounded
    * collect regardless of row count.
    */
  def build(df: DataFrame, keyCol: Column, expectedItems: Long)
      : Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(keyCol), expectedItems)
    val row = df.select(
      GraftBridge.column(agg.toAggregateExpression())).head()
    if (row.isNullAt(0)) Array.emptyByteArray
    else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a built filter. An empty
    * filter (built over zero rows) admits nothing.
    */
  def mightContain(filter: Array[Byte], key: Column): Column =
    if (filter.isEmpty) org.apache.spark.sql.functions.lit(false)
    else GraftBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType), GraftBridge.expression(key)))
}
