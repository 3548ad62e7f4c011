package graft

import graft.Tables
import graft.functions.Bloom
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** A/B measurement for the Bloom semi-join reduction: the q_bloom_join
  * shape with and without the probe-side filter, same session, shuffle
  * task metrics per variant. Usage: `runMain graft.BloomProbe [sfDir]`.
  * Results recorded in SHUFFLE.md.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // isolate OUR reduction from Catalyst's own injected filter
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      .config("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
        "false")
      // emulate the 100 TB regime: at bench scale the filtered dim
      // fits a broadcast and NO fact shuffle exists to prune — the
      // reduction matters exactly when both join sides must shuffle,
      // so measure the shuffle-join plan
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new AtomicLong()
    val shuffleRecords = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })

    def ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F" &&
        year(col("o_orderdate")) === 1996)
      .select(col("o_orderkey"), col("o_orderpriority"))
    def joined(li: DataFrame) =
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"))
    def li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))

    def measure(label: String, mk: () => DataFrame): Unit = {
      // warm once, then measure min-of-2
      mk().write.format("noop").mode("overwrite").save()
      val runs = (1 to 2).map { _ =>
        shuffleBytes.set(0); shuffleRecords.set(0)
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        Thread.sleep(300)
        (shuffleBytes.get, shuffleRecords.get,
          (System.nanoTime() - t0) / 1e9)
      }
      val best = runs.minBy(_._3)
      println(f"$label%-14s shuffleMB=${best._1 / 1e6}%.2f " +
        f"records=${best._2} sec=${best._3}%.2f")
    }

    measure("plain", () => joined(li))
    measure("bloom-pruned", () => {
      val bf = Bloom.build(ord, col("o_orderkey"), 1000000L)
      joined(li.filter(Bloom.mightContain(bf, col("l_orderkey"))))
    })
    spark.stop()
  }
}
