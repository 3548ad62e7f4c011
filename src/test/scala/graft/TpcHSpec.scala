package graft

import graft.operators.TpcH
import org.apache.spark.sql.functions._

/** Cross-query invariants for the adapted TPC-H suite (the oracle
  * verifies values; these verify relationships between queries).
  */
class TpcHSpec extends SparkSuite {

  test("market share is a valid proportion and consistent with trade") {
    val shares = TpcH.marketShare(spark, sf("sf0.01")).collect()
    shares.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Double]("nation_volume") <=
        r.getAs[Double]("total_volume") + 1e-6)
    }
  }

  test("nation-pair trade excludes intra-nation flows, volumes positive") {
    val trade = TpcH.nationPairTrade(spark, sf("sf0.01")).collect()
    assert(trade.nonEmpty)
    trade.foreach { r =>
      assert(r.getAs[String]("supp_nation") !==
        r.getAs[String]("cust_nation"))
      assert(r.getAs[Double]("volume") > 0)
    }
  }

  test("returned revenue top-20 is sorted and within global totals") {
    val top = TpcH.returnedRevenue(spark, sf("sf0.01")).collect()
    assert(top.length === 20)
    val revs = top.map(_.getAs[Double]("revenue")).toSeq
    assert(revs === revs.sorted.reverse)
    val globalReturned = Tables.lineitem(spark, sf("sf0.01"))
      .filter(col("l_returnflag") === "R")
      .agg(sum(col("l_extendedprice"))).collect().head.getDouble(0)
    assert(revs.sum <= globalReturned)
  }

  test("large orders all exceed the quantity threshold") {
    val large = TpcH.largeOrders(spark, sf("sf0.01")).collect()
    assert(large.nonEmpty)
    large.foreach(r => assert(r.getAs[Double]("total_qty") > 150.0))
  }

  test("min-cost suppliers: every emitted offer matches its part's " +
    "regional minimum") {
    val rows = TpcH.minCostSupplier(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    // per part, all emitted unit prices are equal (they all hit the min)
    rows.groupBy(_.getAs[Long]("p_partkey")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Double]("unit_price")).distinct.length === 1)
    }
  }

  test("priority check counts only window orders with a late line") {
    val byPriority = TpcH.priorityOrderCheck(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPriority.nonEmpty)
    val windowOrders = Tables.orders(spark, sf("sf0.01"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .count()
    assert(byPriority.values.sum <= windowOrders)
  }

  test("forecast revenue subsets total discount revenue") {
    val row = TpcH.forecastRevenue(spark, sf("sf0.01")).collect().head
    val all = Tables.lineitem(spark, sf("sf0.01"))
      .agg(sum(col("l_extendedprice") * col("l_discount")))
      .collect().head.getDouble(0)
    assert(row.getAs[Double]("revenue") > 0)
    assert(row.getAs[Double]("revenue") < all)
    assert(row.getAs[Long]("n_items") > 0)
  }

  test("value concentration: every kept supplier clears the global " +
    "fraction; Q15's top supplier is unique-or-tied max") {
    val total = Tables.lineitem(spark, sf("sf0.01"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
      .collect().head.getDouble(0)
    val kept = TpcH.supplierValueConcentration(spark, sf("sf0.01"))
      .collect()
    assert(kept.nonEmpty)
    kept.foreach(r =>
      assert(r.getAs[Double]("value") > total * 0.001 * 0.999))
    val top = TpcH.topSupplier(spark, sf("sf0.01")).collect()
    assert(top.nonEmpty)
    assert(top.map(_.getAs[Double]("total_revenue")).distinct.length === 1)
  }

  test("order-count distribution partitions the customer set") {
    val dist = TpcH.customerOrderDistribution(spark, sf("sf0.01"))
      .collect()
    val custTotal = Tables.customer(spark, sf("sf0.01")).count()
    assert(dist.map(_.getAs[Long]("custdist")).sum === custTotal)
  }

  test("shipment classes partition the window's lineitems") {
    val classes = TpcH.shipmentPriorityClasses(spark, sf("sf0.01"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1) + r.getLong(2))).toMap
    val windowLines = Tables.lineitem(spark, sf("sf0.01"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .count()
    assert(classes.values.sum === windowLines)
    assert(classes.keySet.subsetOf(Set("late", "ontime")))
  }

  test("excess-share suppliers exist and hold >1/8 of some part") {
    val excess = TpcH.excessShareSuppliers(spark, sf("sf0.001"))
      .collect()
    assert(excess.nonEmpty) // threshold tuned to be non-vacuous
    assert(excess.map(_.getAs[Long]("s_suppkey")).distinct.length ===
      excess.length)
  }

  test("banded revenue equals the sum of its three bands") {
    def band(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
      Tables.lineitem(spark, sf("sf0.01"))
        .join(Tables.part(spark, sf("sf0.01")),
          col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === brand &&
          col("p_size").between(szLo, szHi) &&
          col("l_quantity").between(qLo, qHi))
        .agg(count(lit(1))).collect().head.getLong(0)
    val total = TpcH.bandedRevenue(spark, sf("sf0.01"))
      .collect().head.getAs[Long]("n_items")
    assert(total === band("Brand#1", 1, 15, 1, 20) +
      band("Brand#2", 10, 30, 10, 40) + band("Brand#3", 20, 50, 20, 60))
  }
}
