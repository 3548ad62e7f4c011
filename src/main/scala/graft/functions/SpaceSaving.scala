package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** One surviving sketch entry: estimated count and its overcount
  * ceiling (est - err ≤ true ≤ est).
  */
case class HeavyHitter(key: String, est: Long, err: Long)

/** Space-Saving heavy-hitters sketch (Metwally et al.) as a typed
  * [[Aggregator]] — the approximate top-k operator a 100 TB pipeline
  * uses where an exact groupBy over a hot key column would be a
  * full-corpus shuffle: the sketch is O(m) memory per partition, one
  * partial per partition, and a single O(m·partitions) merge.
  *
  * Guarantees (preserved under the parallel Space-Saving combine: a
  * key absent from one summary is charged that summary's minimum
  * counter — its maximum possible hidden count — into both its
  * estimate and its error ceiling before the merged top m is kept):
  *  - any key with true count > n/m is present in the summary;
  *  - for present keys, true ≤ est ≤ true + n/m.
  * A naive pointwise sum (absent side treated as 0) would BREAK the
  * lower bound: a key evicted in one partition but surviving in
  * another would surface with est < true. Which NON-guaranteed keys
  * survive still depends on merge order, so consumers must assert
  * only the guarantees (see q_heavy_hitters), never exact sketch
  * contents.
  */
class SpaceSavingAgg(m: Int)
    extends Aggregator[String, (mutable.Map[String, (Long, Long)], Long),
      Seq[HeavyHitter]] {

  def zero: (mutable.Map[String, (Long, Long)], Long) =
    (mutable.Map.empty, 0L)

  def reduce(b: (mutable.Map[String, (Long, Long)], Long), key: String)
      : (mutable.Map[String, (Long, Long)], Long) = {
    val (map, n) = b
    map.get(key) match {
      case Some((c, e)) => map(key) = (c + 1, e)
      case None if map.size < m => map(key) = (1L, 0L)
      case None =>
        // evict the min-count entry (key tie-break for determinism
        // within a partition); the newcomer inherits its ceiling
        val (mk, (mc, _)) = map.minBy { case (k, (c, _)) => (c, k) }
        map -= mk
        map(key) = (mc + 1, mc)
    }
    (map, n + 1)
  }

  def merge(x: (mutable.Map[String, (Long, Long)], Long),
      y: (mutable.Map[String, (Long, Long)], Long))
      : (mutable.Map[String, (Long, Long)], Long) = {
    val (a, na) = x; val (b, nb) = y
    // A summary that never evicted (size < m) tracks absent keys
    // exactly as 0; a full one may hide up to its min counter.
    val minA = if (a.size < m) 0L else a.valuesIterator.map(_._1).min
    val minB = if (b.size < m) 0L else b.valuesIterator.map(_._1).min
    val all = mutable.Map.empty[String, (Long, Long)]
    (a.keysIterator ++ b.keysIterator).foreach { k =>
      if (!all.contains(k)) {
        val (c1, e1) = a.getOrElse(k, (minA, minA))
        val (c2, e2) = b.getOrElse(k, (minB, minB))
        all(k) = (c1 + c2, e1 + e2)
      }
    }
    val kept = all.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }
      .take(m)
    (mutable.Map(kept: _*), na + nb)
  }

  def finish(r: (mutable.Map[String, (Long, Long)], Long))
      : Seq[HeavyHitter] =
    r._1.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
      .map { case (k, (c, e)) => HeavyHitter(k, c, e) }

  def bufferEncoder
      : Encoder[(mutable.Map[String, (Long, Long)], Long)] =
    Encoders.kryo[(mutable.Map[String, (Long, Long)], Long)]

  def outputEncoder: Encoder[Seq[HeavyHitter]] =
    ExpressionEncoder[Seq[HeavyHitter]]()
}

/** [[SpaceSavingAgg]] over the VALUE slot of a (group, key) tuple —
  * the shape `KeyValueGroupedDataset.agg` needs for PER-GROUP
  * sketches (one independent O(m) summary per group, partial per
  * partition per group, merged along the group shuffle). All sketch
  * logic delegates to the single-key aggregator, so the parallel
  * combine's guarantee proof carries over unchanged.
  */
class SpaceSavingTupleAgg(m: Int)
    extends Aggregator[(String, String),
      (mutable.Map[String, (Long, Long)], Long), Seq[HeavyHitter]] {
  private val inner = new SpaceSavingAgg(m)
  def zero: (mutable.Map[String, (Long, Long)], Long) = inner.zero
  def reduce(b: (mutable.Map[String, (Long, Long)], Long),
      t: (String, String)): (mutable.Map[String, (Long, Long)], Long) =
    inner.reduce(b, t._2)
  def merge(x: (mutable.Map[String, (Long, Long)], Long),
      y: (mutable.Map[String, (Long, Long)], Long))
      : (mutable.Map[String, (Long, Long)], Long) = inner.merge(x, y)
  def finish(r: (mutable.Map[String, (Long, Long)], Long))
      : Seq[HeavyHitter] = inner.finish(r)
  def bufferEncoder
      : Encoder[(mutable.Map[String, (Long, Long)], Long)] =
    inner.bufferEncoder
  def outputEncoder: Encoder[Seq[HeavyHitter]] = inner.outputEncoder
}
