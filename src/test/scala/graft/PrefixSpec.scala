package graft

import graft.operators.Prefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The sharded two-level prefix sum must be BIT-IDENTICAL to the
  * single-window form it replaces — same rows, same cumulative longs —
  * on a fixture with a dominant key (the skew shape it exists for).
  */
class PrefixSpec extends SparkSuite {
  import spark.implicits._

  /** 9:1 skewed fixture: key "web" dominates; ord deliberately sparse
    * and non-contiguous so range sharding sees uneven gaps.
    */
  private lazy val skewed = (0 until 2000).map { i =>
    val key = if (i % 10 == 0) "books" else "web"
    val ord = i.toLong * 37 + (i % 7) // sparse, strictly increasing
    (key, ord, (i % 13).toLong + 1)
  }.toDF("k", "ord", "v")

  private def windowCum = skewed.withColumn("cum",
    sum($"v").over(Window.partitionBy($"k").orderBy($"ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  test("sharded running sum equals the single-window form (scanned bounds)") {
    val got = Prefix.shardedRunningSum(skewed, "k", Seq("ord"), "v", "cum")
    assert(got.columns.sorted === windowCum.columns.sorted)
    assert(got.except(windowCum).isEmpty && windowCum.except(got).isEmpty)
    assert(got.count() === 2000)
  }

  test("sharded running sum equals the single-window form (known bounds)") {
    val got = Prefix.shardedRunningSum(skewed, "k", Seq("ord"), "v", "cum",
      bounds = Some((0L, 2000L * 37 + 6)))
    assert(got.except(windowCum).isEmpty && windowCum.except(got).isEmpty)
  }

  test("composite order keys: ties on the leading column stay exact") {
    // leading key with heavy ties (h collisions), doc_id tiebreak —
    // the tokenMixture/curate admission shape
    val df = (0 until 500)
      .map(i => ("src", (i % 17).toLong, i.toLong, 1L))
      .toDF("k", "h", "id", "v")
    val want = df.withColumn("cum",
      sum($"v").over(Window.partitionBy($"k").orderBy($"h", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = Prefix.shardedRunningSum(df, "k", Seq("h", "id"), "v", "cum",
      bounds = Some((0L, 16L)), shards = 8)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("degenerate range (single shard) still correct") {
    val df = Seq(("a", 5L, 2L), ("a", 9L, 3L), ("b", 5L, 7L))
      .toDF("k", "ord", "v")
    val got = Prefix.shardedRunningSum(df, "k", Seq("ord"), "v", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .toSet
    assert(got === Set(("a", 5L, 2L), ("a", 9L, 5L), ("b", 5L, 7L)))
  }

  test("null leading order keys are kept, matching the window's nulls-first") {
    val df = Seq(("a", Some(5L), 2L), ("a", None, 3L), ("a", Some(9L), 4L),
      ("b", None, 7L)).toDF("k", "ord", "v")
    val want = df.withColumn("cum",
      sum($"v").over(Window.partitionBy($"k").orderBy($"ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = Prefix.shardedRunningSum(df, "k", Seq("ord"), "v", "cum")
    assert(got.count() === 4, "null-lead rows must not be dropped")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("the dominant key's sort is sharded, not single-task") {
    // the point of the operator: the staged exchange partitions by
    // (key, shard), so the dominant key occupies MULTIPLE shards
    val bounds = Some((0L, 2000L * 37 + 6))
    val plan = Prefix.shardedRunningSum(skewed, "k", Seq("ord"), "v",
      "cum", bounds, shards = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__shard"),
      "staged exchange should partition by the shard column")
    // and the shard assignment actually spreads the dominant key
    val width = math.max((2000L * 37 + 6) / 16 + 1, 1L)
    val nShards = skewed.filter($"k" === "web")
      .select(($"ord" / width).cast("long")).distinct().count()
    assert(nShards > 4, s"expected the dominant key across >4 shards, got $nShards")
  }
}
