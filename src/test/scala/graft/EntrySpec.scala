package graft

/** Driver-contract smoke: every declared query runs at sf0.001 and
  * returns rows; oracle keys are a subset of query keys; the flagship
  * entry returns rows.
  */
class EntrySpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  // duplicate-detection queries are legitimately empty on clean
  // testdata; q16's NOT-IN prunes all 10 suppliers at sf0.001
  private val mayBeEmpty = Set("q_anti_join", "q_minhash_pairs",
    "q_ngram_jaccard", "q_simhash_pairs", "q_embedding_neardups",
    "q16_supplier_cnt")

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.prepare(spark, sf()) // *_served queries read lake indexes
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf()).count()
        if (n == 0 && !mayBeEmpty(name)) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }

  test("no query plans a CartesianProduct — the SCALE.md audit as a " +
      "standing regression gate") {
    SparkEntry.prepare(spark, sf())
    // physical plan only — nothing executes; one-row scalar
    // broadcasts plan as BroadcastNestedLoopJoin, never
    // CartesianProduct, so the allowlist is EMPTY by design
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          fn(spark, sf()).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
