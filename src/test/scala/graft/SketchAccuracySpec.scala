package graft

import graft.operators.{Extras, Relational}
import org.apache.spark.sql.functions._

/** Secondary value-level checks for the sketch-based operators whose
  * outputs are engine-specific (no DuckDB oracle): each sketch must land
  * within its stated error of the exact answer computed over the same
  * data. A sketch that silently degrades now fails correctness instead
  * of hiding behind a rows-only check.
  */
class SketchAccuracySpec extends SparkSuite {

  test("approx_count_distinct is within its 1% rsd of exact counts") {
    val dir = sf("sf0.01")
    val exact = Relational.distinctCounts(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Relational.approxDistinctCounts(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    // 0.01 rsd → allow 5 sigma
    exact.foreach { case (flag, (nParts, _)) =>
      val aParts = approx(flag)._1
      assert(math.abs(aParts - nParts).toDouble / nParts <= 0.05,
        s"$flag n_parts: approx $aParts vs exact $nParts")
    }
  }

  test("approx_percentile is within rank tolerance of exact percentiles") {
    val dir = sf("sf0.01")
    val exact = Extras.percentiles(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Extras.approxPercentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    // accuracy 1000 → rank error ≤ 1/1000; quantity is 1..50 uniform-ish
    // and price spans ~1e5, so translate rank slack to generous value
    // slack: 5% relative
    exact.foreach { case (flag, (medQty, _, medPrice)) =>
      val (aMedQty, aP90Price) = approx(flag)
      assert(math.abs(aMedQty - medQty) / medQty <= 0.05,
        s"$flag median_qty: approx $aMedQty vs exact $medQty")
      assert(aP90Price > medPrice,
        s"$flag p90_price $aP90Price should exceed exact median " +
          s"price $medPrice")
    }
  }

  test("ANN recall artifacts: LSH and IVF recall vs brute force " +
    "recorded at sf0.01") {
    import graft.operators.Similarity
    val dir = sf("sf0.01")
    val brute = Similarity.bruteForceTopK(spark, dir, nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annTopK(spark, dir, nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, dir, nQueries = 5, k = 10,
      nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRecall = (brute & lsh).size.toDouble / brute.size
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    info(f"sf0.01 recall@10 over 5 queries: lsh=$lshRecall%.2f " +
      f"ivf=$ivfRecall%.2f")
    assert(lshRecall >= 0.5, s"lsh recall $lshRecall")
    assert(ivfRecall >= 0.5, s"ivf recall $ivfRecall")
  }
}
