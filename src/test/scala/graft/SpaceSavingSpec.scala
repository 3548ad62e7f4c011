package graft

import graft.functions.SpaceSavingAgg
import graft.operators.Extras

/** Space-Saving sketch: guarantees must hold under every partition
  * layout (merge order), and exactness must hold when m ≥ distinct.
  */
class SpaceSavingSpec extends SparkSuite {
  import spark.implicits._

  // skewed stream: "a"×600, "b"×250, "c"×100, "d"×40, "e"×10
  private val stream: Seq[String] =
    Seq.fill(600)("a") ++ Seq.fill(250)("b") ++ Seq.fill(100)("c") ++
      Seq.fill(40)("d") ++ Seq.fill(10)("e")

  private def sketch(m: Int, parts: Int, shuffled: Boolean) = {
    val data = if (shuffled) new scala.util.Random(7).shuffle(stream)
      else stream
    data.toDS().repartition(parts)
      .select(new SpaceSavingAgg(m).toColumn)
      .collect()(0)
  }

  test("guarantees hold across partition layouts") {
    val n = stream.size
    for (m <- Seq(2, 3); parts <- Seq(1, 3, 8); sh <- Seq(false, true)) {
      val hh = sketch(m, parts, sh)
      val est = hh.map(h => h.key -> h.est).toMap
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      // containment: every key with true count > n/m is present
      exact.foreach { case (k, c) =>
        if (c > n.toDouble / m)
          assert(est.contains(k), s"m=$m parts=$parts: lost $k")
      }
      // bound: present keys estimate within [true, true + n/m]
      est.foreach { case (k, e) =>
        val c = exact.getOrElse(k, 0L)
        assert(e >= c && e <= c + n.toDouble / m,
          s"m=$m parts=$parts: $k est=$e true=$c")
      }
      assert(hh.size <= m)
    }
  }

  test("merge preserves true<=est when a key was evicted on one side") {
    // Counterexample to the naive pointwise-sum merge, m=2:
    // partition A sees x*3 then a*4 then b*4 (x gets evicted),
    // partition B sees x*5. true(x)=8; a 0-for-absent merge would
    // keep x at est=5 < true. The parallel combine charges A's min
    // counter to x, restoring the overestimate invariant.
    val agg = new SpaceSavingAgg(2)
    val pa = (Seq.fill(3)("x") ++ Seq.fill(4)("a") ++ Seq.fill(4)("b"))
      .foldLeft(agg.zero)(agg.reduce)
    val pb = Seq.fill(5)("x").foldLeft(agg.zero)(agg.reduce)
    for (merged <- Seq(agg.merge(pa, pb), agg.merge(pb, pa))) {
      val hh = agg.finish(merged)
      val n = merged._2
      assert(n === 16L)
      val est = hh.map(h => h.key -> h).toMap
      // with the parallel combine x's merged estimate (5 + minA=4)
      // outranks a's, so it deterministically survives the top-2 cut
      assert(est.contains("x"))
      est.get("x").foreach { h =>
        assert(h.est >= 8L && h.est <= 8L + n / 2)
        assert(h.est - h.err <= 8L)
      }
      // b: true 4, must satisfy true <= est <= true + n/m
      est.get("b").foreach(h => assert(h.est >= 4L && h.est <= 4L + n / 2))
    }
  }

  test("m >= distinct keys makes the sketch exact") {
    val hh = sketch(8, 4, shuffled = true)
    assert(hh.map(h => h.key -> h.est).toMap ===
      Map("a" -> 600L, "b" -> 250L, "c" -> 100L, "d" -> 40L, "e" -> 10L))
    assert(hh.forall(_.err == 0L))
  }

  test("q_heavy_hitters booleans are all true at sf0.001") {
    val rows = Extras.heavyHitters(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3)))
  }
}
