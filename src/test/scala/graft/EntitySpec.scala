package graft

import graft.operators.Entity

/** Blocked fuzzy matching on a planted catalog: in-block verify,
  * deterministic argmin, and the blocking key's recall guarantee for
  * the modeled corruption.
  */
class EntitySpec extends SparkSuite {
  import spark.implicits._

  test("every corrupted name resolves to its original at distance 1, " +
      "ties broken by name") {
    val d = tmpDir("entity_parts")
    Seq((1L, "small ring"), (2L, "red widget"), (3L, "hot gear"),
      (4L, "small ring"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val got = Entity.fuzzyMatch(spark, d)
      .orderBy("dirty_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3)))
    assert(got.toSeq === Seq(
      (1L, "sall ring", "small ring", 1),
      (2L, "rd widget", "red widget", 1),
      (3L, "ht gear", "hot gear", 1),
      (4L, "sall ring", "small ring", 1)))
  }

  test("a closer name in the same block wins over the original") {
    val d = tmpDir("entity_parts2")
    // dirty of "sxall ring" is "sall ring": distance 1 to BOTH
    // "small ring" and "sxall ring" -> the (dist, name) order picks
    // "small ring" deterministically
    Seq((1L, "sxall ring"), (2L, "small ring"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val got = Entity.fuzzyMatch(spark, d).orderBy("dirty_id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getInt(3)))
    assert(got.head === ((1L, "small ring", 1)))
  }

  test("names beyond maxDist in-block stay unmatched") {
    val d = tmpDir("entity_parts3")
    // block key of the dirty "aeelgh z" shares (a, z) with no clean
    // name within distance 2 except nothing
    Seq((1L, "abcdefgh z"), (2L, "azzzzzzz z"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val got = Entity.fuzzyMatch(spark, d, maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getInt(3)))
    // each dirty matches only its own original (distance 1); the other
    // clean name is 6+ edits away and must not appear
    assert(got.toSeq.sortBy(_._1) === Seq((1L, 1), (2L, 1)))
  }
}
