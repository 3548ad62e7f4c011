package graft

import graft.operators.Cdc
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** The persisted CDC lake lifecycle: grown snapshot ≡ one-shot merge,
  * replay idempotency, promotion invisibility (including disposition
  * history), and the streaming maintainer's exactly-once growth.
  */
class CdcSpec extends SparkSuite {
  import spark.implicits._

  private def plantLake(): String = {
    val lake = tmpDir("cdc_lake")
    Cdc.writeBase(spark, lake,
      Seq((1L, 100.0), (2L, 200.0), (3L, 300.0)).toDF("key", "value"))
    // batch 0: key 1 -> 10 (two writers, LWW), key 9 inserted
    Cdc.appendBatch(spark, lake, Seq(
      (1L, Double.box(9.0), 100L, 1L), (1L, Double.box(10.0), 200L, 2L),
      (9L, Double.box(90.0), 150L, 3L))
      .toDF("key", "value", "ts", "event_id"), 0L)
    // batch 1: key 1 -> 11 (later batch wins), key 3 -> 30
    Cdc.appendBatch(spark, lake, Seq(
      (1L, Double.box(11.0), 300L, 4L), (3L, Double.box(30.0), 300L, 5L))
      .toDF("key", "value", "ts", "event_id"), 1L)
    lake
  }

  private def snap(lake: String): Seq[(Long, Double, String)] =
    Cdc.snapshot(spark, lake).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq

  private val expected = Seq(
    (1L, 11.0, "updated"), (2L, 200.0, "kept"),
    (3L, 30.0, "updated"), (9L, 90.0, "inserted"))

  test("grown snapshot: later batch beats earlier, LWW within batch, " +
      "dispositions from presence") {
    assert(snap(plantLake()) === expected)
  }

  test("replaying a batch overwrites its own dir — snapshot unchanged") {
    val lake = plantLake()
    Cdc.appendBatch(spark, lake, Seq(
      (1L, Double.box(11.0), 300L, 4L), (3L, Double.box(30.0), 300L, 5L))
      .toDF("key", "value", "ts", "event_id"), 1L)
    assert(snap(lake) === expected)
  }

  test("promotion folds batches into base without changing the " +
      "snapshot, keeps disposition history, and re-runs as a no-op") {
    val lake = plantLake()
    Cdc.promoteBatches(spark, lake)
    assert(!new java.io.File(s"$lake/changes_batches").exists())
    assert(snap(lake) === expected)
    Cdc.promoteBatches(spark, lake) // no batches: no-op
    assert(snap(lake) === expected)
    // post-promotion changes: an inserted key stays inserted, a kept
    // key upgrades to updated
    Cdc.appendBatch(spark, lake, Seq(
      (9L, Double.box(91.0), 400L, 6L), (2L, Double.box(21.0), 400L, 7L))
      .toDF("key", "value", "ts", "event_id"), 2L)
    assert(snap(lake) === Seq(
      (1L, 11.0, "updated"), (2L, 21.0, "updated"),
      (3L, 30.0, "updated"), (9L, 91.0, "inserted")))
  }

  test("time travel: as-of batch 0 hides the later batch; as-of the " +
      "head equals the current snapshot; the as-of scan prunes " +
      "batch dirs statically") {
    val lake = plantLake()
    val at0 = Cdc.snapshotAt(spark, lake, 0L).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    // batch 1's key-1 overwrite and key-3 update are invisible
    assert(at0 === Seq(
      (1L, 10.0, "updated"), (2L, 200.0, "kept"),
      (3L, 300.0, "kept"), (9L, 90.0, "inserted")))
    assert(Cdc.snapshotAt(spark, lake, 1L).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSeq === expected)
    // the as-of filter rides the batch PARTITION column: the scan
    // carries it as a PartitionFilter (directory pruning), not a
    // post-scan data filter
    val plan = Cdc.snapshotAt(spark, lake, 0L).queryExecution
      .executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("PartitionFilters: [") && l.contains("batch"))
    assert(scanLine.isDefined, plan)
  }

  test("streaming maintainer grows the lake exactly-once and the " +
      "snapshot equals the one-shot merge") {
    val lake = tmpDir("cdc_stream_lake")
    val stage = tmpDir("cdc_stage")
    val ckpt = tmpDir("cdc_ckpt")
    Cdc.writeBase(spark, lake,
      Seq((1L, 100.0), (2L, 200.0)).toDF("key", "value"))
    val changes = Seq(
      (1L, Double.box(10.0), 100L, 1L), (2L, Double.box(20.0), 150L, 2L),
      (1L, Double.box(12.0), 200L, 3L), (5L, Double.box(50.0), 250L, 4L))
      .toDF("key", "value", "ts", "event_id")
    def stageBatch(name: String, f: org.apache.spark.sql.DataFrame)
        : Unit = {
      val tmp = tmpDir(s"cdc_part_$name")
      f.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$stage/$name.parquet"))
    }
    // time-ordered arrival: first two writers, then the later two
    stageBatch("a", changes.filter(col("ts") <= 150))
    stageBatch("b", changes.filter(col("ts") > 150))
    val q = Streams.cdcMaintainer(
      spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage),
      lake, ckpt)
    q.awaitTermination(300000)
    assert(new java.io.File(s"$lake/changes_batches").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq ===
      Seq("batch=0", "batch=1"))
    assert(snap(lake) === Seq(
      (1L, 12.0, "updated"), (2L, 20.0, "updated"),
      (5L, 50.0, "inserted")))
    // restart over the same checkpoint: nothing new, snapshot fixed
    val q2 = Streams.cdcMaintainer(
      spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage),
      lake, ckpt)
    q2.awaitTermination(300000)
    assert(snap(lake) === Seq(
      (1L, 12.0, "updated"), (2L, 20.0, "updated"),
      (5L, 50.0, "inserted")))
  }
}
