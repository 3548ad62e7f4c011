package graft

import graft.operators.TextOps

/** Per-source drift: hand-computed KL/TVD on a planted two-source
  * corpus, and the exact-zero identity on a single-source corpus
  * (p_s == q term-for-term, so both divergences are 0.0 exactly,
  * not approximately).
  */
class SourceDriftSpec extends SparkSuite {
  import spark.implicits._

  private def r4d(x: Double) = math.rint((x + 1e-9) * 1e4) / 1e4

  private def plant(rows: Seq[(Long, String, String)]): String = {
    val dir = tmpDir("drift")
    rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("KL and TVD match the hand-computed Lidstone distributions") {
    val d = plant(Seq((1L, "x x", "A"), (2L, "x y", "B")))
    // corpus: x:3, y:1, n=4, V=2 → q over 5.5; A: ns=2 over 3.5;
    // B: ns=2 over 3.5. Unseen slot carries 0.5 mass units each.
    val qx = 3.5 / 5.5; val qy = 1.5 / 5.5; val q0 = 0.5 / 5.5
    def kl(px: Double, py: Double, p0: Double) =
      px * math.log(px / qx) + py * math.log(py / qy) +
        p0 * math.log(p0 / q0)
    def tvd(px: Double, py: Double, p0: Double) =
      0.5 * (math.abs(px - qx) + math.abs(py - qy) + math.abs(p0 - q0))
    val (ax, ay, a0) = (2.5 / 3.5, 0.5 / 3.5, 0.5 / 3.5)
    val (bx, by, b0) = (1.5 / 3.5, 1.5 / 3.5, 0.5 / 3.5)
    val got = TextOps.sourceDrift(spark, d).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("A", 2L, r4d(kl(ax, ay, a0)), r4d(tvd(ax, ay, a0))),
      ("B", 2L, r4d(kl(bx, by, b0)), r4d(tvd(bx, by, b0)))))
  }

  test("single source == corpus: both divergences exactly zero; " +
      "real data: KL >= 0 and TVD in [0,1] for every source") {
    val d = plant(Seq((1L, "a b", "only"), (2L, "b c c", "only")))
    val one = TextOps.sourceDrift(spark, d).collect()
    assert(one.length === 1)
    assert(one(0).getDouble(2) === 0.0 && one(0).getDouble(3) === 0.0)
    val real = TextOps.sourceDrift(spark, sf()).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    assert(real.nonEmpty)
    real.foreach { case (kl, tvd) =>
      assert(kl >= 0.0 && tvd >= 0.0 && tvd <= 1.0)
    }
  }
}
