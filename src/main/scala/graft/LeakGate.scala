package graft

import org.apache.spark.sql.SparkSession

/** Block-manager leak accounting shared by [[Bench]] (which sweeps at
  * every iteration boundary and ledgers what each query left behind)
  * and EntrySpec's leak gate (which pins per-query `left_mb` ceilings
  * so the r13/r14 crowding class cannot RETURN silently — a future
  * lazyCheckpoint consumer that forgets its cut shows up as a gate
  * failure, not a four-round bench adjudication).
  */
object LeakGate {

  /** What is registered in the block manager right now:
    * (persistent RDD count, total memory+disk MB). */
  def leftBlocks(spark: SparkSession): (Int, Double) = {
    val infos = spark.sparkContext.getRDDStorageInfo
    (infos.length, infos.map(i => (i.memSize + i.diskSize) / 1e6).sum)
  }

  /** Synchronous block-manager sweep (the r15 Bench mechanism):
    * unpersist every registered RDD BLOCKING (ContextCleaner GC alone
    * only queues the cleanup), drop cached tables, then GC against an
    * empty block manager. */
  def sweep(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    System.gc()
  }

  /** Ledger rows whose left_mb exceeds their ceiling (override if
    * pinned, else the default) — the gate's pure core, unit-testable
    * with a fabricated leak. */
  def violations(rows: Map[String, Double], defaultMb: Double,
      overrides: Map[String, Double]): Seq[String] =
    rows.toSeq.sortBy(_._1).flatMap { case (name, mb) =>
      val ceil = overrides.getOrElse(name, defaultMb)
      if (mb > ceil) Some(f"$name: left $mb%.1f MB > ceiling $ceil%.1f")
      else None
    }
}
