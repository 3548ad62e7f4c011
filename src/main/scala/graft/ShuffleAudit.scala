package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Shuffle-volume audit: runs every query with a task-metrics listener
  * and reports shuffle bytes written / records per query — the measured
  * counterpart to SCALE.md's static plan audit. Usage:
  * `runMain graft.ShuffleAudit [sfDir] > SHUFFLE.md` (markdown on
  * stdout).
  */
object ShuffleAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new AtomicLong()
    val shuffleRecords = new AtomicLong()
    val inputBytes = new AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          inputBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    }
    // build the serve indexes OUTSIDE the per-query metrics windows
    SparkEntry.prepare(spark, sfDir)

    spark.sparkContext.addSparkListener(listener)

    println(s"# SHUFFLE — measured per-query shuffle volumes ($sfDir)")
    println()
    println("Shuffle bytes/records written per query (task metrics,")
    println("4 shuffle partitions). 'input MB' is bytes read from")
    println("parquet — the gap to table size shows column pruning.")
    println()
    println("| query | input MB | shuffle MB | shuffle records |")
    println("|---|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      shuffleBytes.set(0); shuffleRecords.set(0); inputBytes.set(0)
      try {
        // noop sink materializes every column — count() would let
        // Catalyst prune entire operators (e.g. unused windows)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Thread.sleep(300) // let the listener bus drain task-end events
        println(f"| $name | ${inputBytes.get / 1e6}%.1f " +
          f"| ${shuffleBytes.get / 1e6}%.2f | ${shuffleRecords.get} |")
      } catch {
        case e: Throwable =>
          println(s"| $name | ERROR ${e.getClass.getSimpleName} | | |")
      }
    }
    spark.stop()
  }
}
