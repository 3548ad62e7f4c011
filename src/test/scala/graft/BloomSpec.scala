package graft

import graft.functions.Bloom
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction: no false negatives ever, empty filter
  * admits nothing, and the composed pruned join is value-identical to
  * the plain join it accelerates.
  */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  test("a built filter never false-negatives an inserted key") {
    val keys = (0L until 5000L).toDF("k")
    val bf = Bloom.build(keys, col("k"), expectedItems = 5000L)
    assert(bf.nonEmpty)
    assert(keys.filter(Bloom.mightContain(bf, col("k"))).count() === 5000L)
  }

  test("selectivity: most absent keys are rejected") {
    val bf = Bloom.build((0L until 1000L).toDF("k"), col("k"), 1000L)
    val probed = (1000000L until 1010000L).toDF("k")
      .filter(Bloom.mightContain(bf, col("k"))).count()
    // default sizing targets ~3% fpp; allow generous slack
    assert(probed < 1000L, s"fpp too high: $probed/10000")
  }

  test("a filter built over zero rows admits nothing") {
    val bf = Bloom.build(
      (0L until 10L).toDF("k").filter(col("k") < 0), col("k"), 100L)
    assert(bf.isEmpty)
    assert((0L until 10L).toDF("k")
      .filter(Bloom.mightContain(bf, col("k"))).count() === 0L)
  }

  test("the pruned join equals the plain join (sf0.001)") {
    val pruned = Relational.bloomPrunedJoin(spark, sf())
      .orderBy("o_orderpriority").collect().toSeq
    val ord = Tables.orders(spark, sf())
      .filter(col("o_orderstatus") === "F" &&
        year(col("o_orderdate")) === 1996)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(pruned.nonEmpty)
    assert(pruned === plain)
  }

  test("the probe filter sits below the join in the physical plan") {
    val plan = Relational.bloomPrunedJoin(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
  }
}
