package graft

import graft.functions.Skew
import graft.pipeline.Incremental
import org.apache.spark.sql.functions._

/** High-watermark incremental reads + skew-salted join equivalence. */
class IncrementalSkewSpec extends SparkSuite {
  import spark.implicits._

  test("incremental reader sees only rows past the committed watermark") {
    val root = tmpDir("incr")
    val wm = s"$root/watermark.txt"
    val b1 = Seq(("2026-08-01 10:00:00", 1), ("2026-08-01 11:00:00", 2))
      .toDF("ts", "v").select(col("ts").cast("timestamp").as("ts"), col("v"))
    b1.write.mode("append").parquet(s"$root/data")
    val first = Incremental.readNew(spark, s"$root/data", wm, "ts")
    assert(first.count() === 2)
    Incremental.commit(first, wm, "ts")
    // nothing new → empty slice
    assert(Incremental.readNew(spark, s"$root/data", wm, "ts").count() === 0)
    // late batch with newer ts
    Seq(("2026-08-01 12:30:00", 3)).toDF("ts", "v")
      .select(col("ts").cast("timestamp").as("ts"), col("v"))
      .write.mode("append").parquet(s"$root/data")
    val second = Incremental.readNew(spark, s"$root/data", wm, "ts")
    assert(second.collect().map(_.getInt(1)).toSeq === Seq(3))
    Incremental.commit(second, wm, "ts")
    assert(Incremental.readNew(spark, s"$root/data", wm, "ts").count() === 0)
  }

  test("uncommitted sync retries the same slice (at-least-once)") {
    val root = tmpDir("incr2")
    val wm = s"$root/watermark.txt"
    Seq(("2026-08-01 10:00:00", 1)).toDF("ts", "v")
      .select(col("ts").cast("timestamp").as("ts"), col("v"))
      .write.mode("append").parquet(s"$root/data")
    assert(Incremental.readNew(spark, s"$root/data", wm, "ts").count() === 1)
    // no commit → same slice again
    assert(Incremental.readNew(spark, s"$root/data", wm, "ts").count() === 1)
  }

  test("sessionization partitions every event into exactly one session") {
    val sessions = graft.operators.Relational.sessionize(spark, sf())
    val total = sessions.agg(sum(col("n_events")))
      .collect().head.getLong(0)
    assert(total === Tables.events(spark, sf()).count())
    // session indexes are contiguous from 0 per user
    val byUser = sessions.groupBy(col("user_id"))
      .agg(min(col("session_idx")).as("mn"), max(col("session_idx"))
        .as("mx"), count(lit(1)).as("n")).collect()
    byUser.foreach { r =>
      assert(r.getAs[Int]("mn") === 0)
      assert(r.getAs[Int]("mx") === r.getAs[Long]("n") - 1)
    }
  }

  test("salted join equals the plain join on skewed data") {
    // 90% of rows share one hot key
    val big = spark.range(2000)
      .select((when(col("id") % 10 === 0, col("id") % 7)
        .otherwise(0L)).as("k"), col("id").as("payload"))
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "label")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "label")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "label")
      .collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("salted join results are invariant under upstream repartitioning " +
      "and preserve byte-identical duplicate rows") {
    // the retry-semantics pin (r9): the salt mixes spark_partition_id,
    // so different upstream partitionings produce different salt
    // ASSIGNMENTS — but the join RESULT (a bag: duplicates preserved)
    // must be identical for any partitioning, which is exactly what a
    // stage retry or an AQE re-plan is allowed to change. Hot key 0
    // carries byte-identical payloads (the null/default hot-key shape
    // whose content hash collapses to one salt).
    val big = spark.range(3000)
      .select((when(col("id") % 10 === 0, col("id") % 7)
        .otherwise(0L)).as("k"),
        when(col("k") === 0, lit(-1L)).otherwise(col("id")).as("payload"))
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "label")
    def run(b: org.apache.spark.sql.DataFrame): Seq[String] =
      Skew.saltedJoin(b, small, "k", salts = 8)
        .select("k", "payload", "label")
        .collect().map(_.toString).sorted.toSeq
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "label")
      .collect().map(_.toString).sorted.toSeq
    val base = run(big)
    val repart = run(big.repartition(13, col("payload")))
    val coalesced = run(big.coalesce(2))
    assert(base === plain)
    assert(repart === plain)
    assert(coalesced === plain)
    // the duplicate-preservation part is load-bearing: 90% of rows are
    // the identical (0, -1) row, so any salt-induced row loss or
    // duplication would change the multiset size
    assert(plain.count(_.contains("hot")) > 2000)
  }

  test("idCols salt keeps full spread when identical hot rows are " +
      "co-partitioned by the join key — the fallback's collapse case") {
    // hot key 0 with byte-identical payloads, hash-partitioned BY THE
    // JOIN KEY (a groupBy/exchange output shape): every copy sits in
    // one partition, so the content+partition fallback collapses to a
    // single salt; the id-based salt must still use all of them
    val big = spark.range(4000)
      .select(col("id"), lit(0L).as("k"), lit(-1L).as("payload"))
      .repartition(8, col("k"))
    val spread = big.select(
      Skew.saltCol(big, Seq("id"), salts = 8).as("s"))
      .distinct().count()
    assert(spread === 8L, s"id salt used $spread of 8 salts")
    val collapsed = big.drop("id").select(
      Skew.saltCol(big.drop("id"), Nil, salts = 8).as("s"))
      .distinct().count()
    assert(collapsed === 1L, "fallback should collapse here — if this " +
      "starts passing, the scaladoc's documented limitation is stale")
    // and the idCols join is still exact
    val small = Seq((0L, "hot")).toDF("k", "label")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8,
        idCols = Seq("id"))
      .select("k", "payload", "label")
      .collect().map(_.toString).sorted.toSeq
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "label")
      .collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
  }
}
