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
