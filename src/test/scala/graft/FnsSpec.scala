package graft

import graft.functions.Fns._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Golden + property tests for the scalar surface (SURVEY §2.3),
  * hitting every heuristic boundary from the quirk ledger (§8.4).
  * Property tests use a seeded generator loop (scalatestplus bridge is
  * not on the offline classpath).
  */
class FnsSpec extends SparkSuite {
  import spark.implicits._

  private def eval1(in: Option[Double], f: Column => Column)
      : Option[Double] = {
    val r = Seq(in).toDF("x").select(f(col("x")).as("y")).collect().head
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) < tol

  test("kelvinToC converts only above the 100 heuristic boundary") {
    assert(approx(eval1(Some(308.15), kelvinToC).get, 35.0))
    assert(eval1(Some(100.0), kelvinToC).contains(100.0)) // boundary stays
    assert(approx(eval1(Some(100.0001), kelvinToC).get, -173.1499))
    assert(eval1(Some(-5.0), kelvinToC).contains(-5.0))
    assert(eval1(None, kelvinToC).isEmpty)
  }

  test("metersToMm converts only below the 1.0 heuristic boundary") {
    assert(approx(eval1(Some(0.0005), metersToMm).get, 0.5))
    assert(eval1(Some(1.0), metersToMm).contains(1.0)) // boundary stays
    assert(approx(eval1(Some(0.999), metersToMm).get, 999.0))
    assert(eval1(Some(2.5), metersToMm).contains(2.5))
    assert(eval1(None, metersToMm).isEmpty)
  }

  test("humidity cap applies only to positive values, at 100") {
    assert(eval1(Some(120.0), capHumidity).contains(100.0))
    assert(eval1(Some(100.0), capHumidity).contains(100.0))
    assert(eval1(Some(42.0), capHumidity).contains(42.0))
    assert(eval1(Some(0.0), capHumidity).contains(0.0))   // not capped
    assert(eval1(Some(-1.0), capHumidity).contains(-1.0)) // passthrough
    assert(eval1(None, capHumidity).isEmpty)
  }

  test("midpoint falls back through nulls") {
    val rows = Seq((Some(30.0), Some(10.0)), (Some(30.0), None),
      (None, Some(10.0)), (None, None))
      .toDF("mx", "mn")
      .select(midpoint(col("mx"), col("mn")).as("m"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rows.toSeq === Seq(Some(20.0), Some(30.0), Some(10.0), None))
  }

  test("truthy drops zero and null, keeps negatives") {
    val kept = Seq(Some(0.0), Some(1.5), Some(-2.0), None).toDF("x")
      .filter(truthy(col("x"))).collect().map(_.getDouble(0)).toSet
    assert(kept === Set(1.5, -2.0))
  }

  test("property: C→F→C round-trips; conversions preserve ordering") {
    val rnd = new scala.util.Random(42)
    val cs = Seq.fill(200)(rnd.nextDouble() * 300 - 100)
    val out = cs.toDF("c")
      .select(col("c"), fToC(cToF(col("c"))).as("rt"), cToF(col("c")).as("f"))
      .collect()
    out.foreach(r => assert(approx(r.getDouble(0), r.getDouble(1))))
    val sortedByC = out.sortBy(_.getDouble(0)).map(_.getDouble(2)).toSeq
    assert(sortedByC === sortedByC.sorted)
  }

  test("property: dsum equals exact BigDecimal sum of money values") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(5000)(
      BigDecimal(rnd.nextInt(10000000)) / 100)
    val got = xs.map(_.toDouble).toDF("x")
      .repartition(8) // force nondeterministic partial-agg order
      .agg(dsum(col("x")).as("s")).collect().head.getDouble(0)
    assert(got === xs.sum.toDouble)
  }
}
