package graft

import graft.operators.{Extras, Relational}
import org.apache.spark.sql.functions._

/** Secondary value-level checks for the sketch-based operators whose
  * outputs are engine-specific (no DuckDB oracle): each sketch must land
  * within its stated error of the exact answer computed over the same
  * data, AND within [[AccuracyLedger]]'s regression band of the value
  * recorded last round — so a sketch that degrades-but-still-clears-the-
  * floor fails too, and `tools/accuracy_ledger.json` gives the driver a
  * round-over-round accuracy diff.
  */
class SketchAccuracySpec extends SparkSuite {

  test("approx_count_distinct is within its 1% rsd of exact counts") {
    val dir = sf("sf0.01")
    val exact = Relational.distinctCounts(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Relational.approxDistinctCounts(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    val maxRelErr = exact.map { case (flag, (nParts, _)) =>
      math.abs(approx(flag)._1 - nParts).toDouble / nParts
    }.max
    // 0.01 rsd → allow 5 sigma absolute; band vs last round on top
    AccuracyLedger.assertAtMost("hll_parts_max_rel_err", maxRelErr, 0.05)
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
    val maxMedErr = exact.map { case (flag, (medQty, _, _)) =>
      math.abs(approx(flag)._1 - medQty) / medQty
    }.max
    exact.foreach { case (flag, (_, _, medPrice)) =>
      val aP90Price = approx(flag)._2
      assert(aP90Price > medPrice,
        s"$flag p90_price $aP90Price should exceed exact median " +
          s"price $medPrice")
    }
    AccuracyLedger.assertAtMost("approx_median_qty_max_rel_err",
      maxMedErr, 0.05)
  }

  test("ANN recall vs brute force: floors + round-over-round band") {
    import graft.operators.Similarity
    val dir = sf("sf0.01")
    val brute = Similarity.bruteForceTopK(spark, dir, nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annTopK(spark, dir, nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, dir, nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRecall = (brute & lsh).size.toDouble / brute.size
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    info(f"sf0.01 recall@10 over 5 queries: lsh=$lshRecall%.2f " +
      f"ivf=$ivfRecall%.2f")
    AccuracyLedger.assertAtLeast("ann_lsh_recall_at_10", lshRecall, 0.7)
    AccuracyLedger.assertAtLeast("ann_ivf_recall_at_10", ivfRecall, 0.75)
    // the sharded scale path must not cost recall vs the single index:
    // 2 forced shards at driver scale, same floor + ratchet discipline
    val sharded = Similarity
      .ivfTopKSharded(spark, dir, nShards = 2, nQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shardedRecall = (brute & sharded).size.toDouble / brute.size
    info(f"sharded(2) recall@10 = $shardedRecall%.2f")
    AccuracyLedger.assertAtLeast("ann_ivf_sharded_recall_at_10",
      shardedRecall, 0.75)
  }

  test("filtered-IVF recall vs the filtered exact tier: floor + " +
    "round-over-round band") {
    import graft.operators.Similarity
    val dir = sf("sf0.01")
    val brute = Similarity.filteredBruteTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.filteredIvfTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"filtered recall@10 over 5 queries = $recall%.2f")
    // the qualifying set per (label, cell) is ~10× sparser than the
    // unfiltered cells, so geometric pruning bites harder — floor set
    // below the unfiltered tier's, ratchet discipline identical
    AccuracyLedger.assertAtLeast("ann_filtered_ivf_recall_at_10",
      recall, 0.6)
  }

  test("pruned maxsim recall vs the exact multi-vector ranking: " +
    "floor + round-over-round band") {
    import graft.operators.Similarity
    val dir = sf("sf0.01")
    val exact = Similarity.maxSimTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = Similarity.maxSimTopKPruned(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pruned).size.toDouble / exact.size
    info(f"pruned maxsim recall@10 over 3 queries = $recall%.2f")
    // multi-vector recall compounds per-vector misses (a doc needs
    // EVERY relevant vector probed to score fully), so the floor
    // sits below the single-vector tiers'
    AccuracyLedger.assertAtLeast("maxsim_pruned_recall_at_10",
      recall, 0.5)
  }

}
