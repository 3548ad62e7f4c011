package graft

import graft.operators.{Dedup, Extras, Sketch}
import org.apache.spark.sql.functions._

/** Hand-computed pins for the exactly-recomputable sketches (CMS, AMS)
  * and the two-stage skyline — the cross-engine oracles pin them on
  * real data; these fixtures pin the ALGORITHMS on planted inputs
  * where the correct answer is derivable by hand.
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  private def lineitemDir(keys: Seq[Long]): String = {
    val dir = tmpDir("sketch")
    keys.toDF("l_partkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("CMS: estimates dominate exact counts and match exactly when " +
      "the width cannot collide") {
    // keys 0,50,100 are the probed residues (k % 50 == 0); counts 5/3/2
    val keys = Seq.fill(5)(0L) ++ Seq.fill(3)(50L) ++ Seq.fill(2)(100L) ++
      Seq.fill(4)(7L) ++ Seq.fill(6)(13L)
    val dir = lineitemDir(keys)
    val got = Sketch.cmsProbe(spark, dir)
      .orderBy("l_partkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // 5 distinct keys into 4×256 cells: lb_ok always; with this few
    // keys a shared bucket in ALL FOUR rows is impossible, so the min
    // over rows is exact and est == exact
    assert(got.toSeq === Seq((0L, 5L, 5L, true), (50L, 3L, 3L, true),
      (100L, 2L, 2L, true)))
  }

  test("CMS: planted single-row collision overcounts but never " +
      "undercounts") {
    // depth=1 forces every collision to survive the min; width=1 makes
    // ALL keys share the one bucket -> est(k) = total row count
    val keys = Seq.fill(5)(0L) ++ Seq.fill(3)(50L) ++ Seq.fill(7)(9L)
    val dir = lineitemDir(keys)
    val got = Sketch.cmsProbe(spark, dir, depth = 1, width = 1)
      .orderBy("l_partkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq((0L, 5L, 15L, true), (50L, 3L, 15L, true)))
  }

  test("AMS: single-key input estimates F2 exactly (every sign cancels " +
      "nothing); the 16-column aggregate matches a direct computation") {
    // one key repeated n times: Z_j = ±n for every seed, est = n² = F2
    val dir = lineitemDir(Seq.fill(9)(42L))
    val row = Sketch.amsJoinSize(spark, dir).collect().head
    assert(row.getLong(0) === 81L)
    assert(row.getDouble(1) === 81.0)
    assert(row.getDouble(2) === 0.0)
  }

  test("AMS: two-key fixture matches the sign arithmetic computed " +
      "independently in Scala") {
    val ka = 3L; val kb = 11L; val na = 4L; val nb = 6L
    val dir = lineitemDir(Seq.fill(na.toInt)(ka) ++ Seq.fill(nb.toInt)(kb))
    val p = 2147483647L
    val coef = Seq(
      (1299721L, 104659L), (7368787L, 1299709L), (104729L, 7368773L),
      (15485863L, 32452843L), (49979687L, 67867967L), (67867979L, 49979693L),
      (86028121L, 15485867L), (104395301L, 86028157L), (122949823L, 2750161L),
      (141650939L, 122949829L), (160481183L, 141650963L), (179424673L, 472882027L),
      (198491317L, 160481219L), (217645177L, 179424691L), (236887691L, 198491329L),
      (256203161L, 217645199L))
    def sign(k: Long, j: Int): Long =
      1L - 2L * (((coef(j)._1 * k + coef(j)._2) % p) % 2L)
    val zs = coef.indices.map(j => sign(ka, j) * na + sign(kb, j) * nb)
    val expectedEst = zs.map(z => z * z).sum.toDouble / coef.size
    val row = Sketch.amsJoinSize(spark, dir).collect().head
    assert(row.getLong(0) === na * na + nb * nb)
    assert(row.getDouble(1) === expectedEst)
  }

  test("skyline: dominated rows drop, equal twins survive, strictness " +
      "respected across both the same-price and cheaper-price paths") {
    val dir = tmpDir("skyline")
    Seq(
      // brand X: (10,5) frontier; (10,7) dominated same-price;
      // (12,5) dominated by (10,5); (9,9) frontier (cheapest);
      // (11,4) frontier (smallest); twins (13,3)x2 both frontier
      ("X", 1L, 10.0, 5), ("X", 2L, 10.0, 7), ("X", 3L, 12.0, 5),
      ("X", 4L, 9.0, 9), ("X", 5L, 11.0, 4), ("X", 6L, 13.0, 3),
      ("X", 7L, 13.0, 3),
      // brand Y: single row is trivially the frontier
      ("Y", 8L, 1.0, 1)
    ).toDF("p_brand", "p_partkey", "p_retailprice", "p_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Extras.skyline(spark, dir)
      .orderBy("p_partkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("X", 1L), ("X", 4L), ("X", 5L),
      ("X", 6L), ("X", 7L), ("Y", 8L)))
  }

  test("containment: finds a planted whole-quote subset pair Jaccard " +
      "misses; below-threshold overlap excluded") {
    val words = (1 to 60).map(i => s"w$i")
    val long = words.mkString(" ")              // 58 grams
    val short = words.take(12).mkString(" ")    // 10 grams, all in long
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, other))
      .toDF("doc_id", "text")
    val got = Dedup.ngramContainmentPairsOf(docs, 0.6, 1000)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
    // the same pair fails a 0.5 JACCARD gate: J = 10/58 ≈ 0.17
    val jac = Dedup.ngramJaccardPairsOf(
      docs.select(lit("en").as("lang"), lit("s").as("source"),
        col("doc_id"), col("text")),
      0.5, 1000)
    assert(jac.count() === 0L)
  }

  test("containment dfCap: pairs whose shared grams are all hot drop " +
      "from the index side; rare-gram pairs survive") {
    // the run "h1 h2 h3 h4" contributes two grams shared by ALL ten
    // docs (df 10); docs 1/2 additionally share a rare 9-word tail
    val hot = "h1 h2 h3 h4"
    val rare = (1 to 9).map(i => s"r$i").mkString(" ")
    val docs = (Seq((1L, s"$hot $rare"), (2L, s"$hot $rare")) ++
      (3L to 10L).map(i => (i, s"$hot x$i"))).toDF("doc_id", "text")
    // uncapped: every pair qualifies — the short docs have 3 grams of
    // which the 2 hot ones are shared with everything (2/3 ≥ 0.6),
    // and 1-2 are identical: C(45,...) = 28 in-cohort + 16 cross + 1
    val full = Dedup.ngramContainmentPairsOf(docs, 0.6, dfCap = 1000)
    assert(full.count() === 45L)
    // cap below the hot grams' df: every pair whose ONLY shared grams
    // are hot disappears; 1-2 still pair through the rare tail grams
    val capped = Dedup.ngramContainmentPairsOf(docs, 0.6, dfCap = 5)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq === Seq((1L, 2L)))
  }
}
