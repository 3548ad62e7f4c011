package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared machinery for ITERATIVE driver loops (BPE trainer rounds,
  * PageRank/components fixpoints, k-means fits): many small sequential
  * jobs whose per-round cost is driver overhead, not data.
  */
object Iterate {

  /** Run `body` with adaptive query execution disabled, restoring the
    * caller's setting afterwards (r17, guide §1.2 step 3 applied to a
    * measured loop cost).
    *
    * Why: an iterative operator submits one vocabulary/rank-table-sized
    * query per round, tens of rounds per call. Each round's physical
    * layout is chosen EXPLICITLY by the operator (size-adaptive
    * coalesce before the loop — the partitioning AQE would otherwise
    * discover at runtime), so AQE has nothing left to adapt: its
    * per-query cost is pure driver-side re-planning. Measured on the
    * BPE trainer (16 argmax rounds over the checkpointed word table):
    * 2.6 s with AQE, 1.8 s without — ~50 ms/round of adaptive stage
    * wrapping for zero plan change (the rounds are exchange-free at
    * driver scale and a single explicitly-sized exchange beyond it).
    * Corpus-sized work NEVER runs under this scope — callers flip it
    * on around the round loop only, after the corpus pass has
    * materialized its checkpoint.
    */
  def withoutAqe[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(key, "true")
    s.conf.set(key, "false")
    try body finally s.conf.set(key, prev)
  }
}
