package graft

import graft.pipeline._
import org.apache.spark.sql.SparkSession

/** One-command end-to-end demo: generates the §1.1 fixture documents,
  * runs the full pipeline (lake → warehouse → aggregates → serving) and
  * prints the monthly serving rows plus the cache envelope JSON — what
  * a reference user sees from their dashboard, produced by this engine.
  * Usage: `sbt "runMain graft.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft_demo")
    val fixtures = demoFixtures(root.toString)
    val paths = Pipeline.Paths(s"$root/tiers")

    val monthly = Pipeline.run(spark, fixtures, paths)
    println("== monthly serving rows ==")
    monthly.show(truncate = false)

    println("== overall averages ==")
    Serving.overallAverages(monthly).show(truncate = false)

    println("== cache envelope (fresh) ==")
    Serving.readCacheIfFresh(spark, paths.cache, 3600)
      .foreach(j => println(j.take(400) + " ..."))

    println("== serving ladder status ==")
    val served = Scheduler.servingData(spark, paths)
    println(s"sync_status=${served.syncStatus} fromCache=${served.fromCache}"
      + s" dailyRows=${served.daily.count()}")
    spark.stop()
  }

  /** Writes a small deterministic fixture batch; returns the path. */
  private def demoFixtures(dir: String): String = {
    // reuse the test fixture content (inlined — test scope is not on
    // the runtime classpath)
    val feature =
      """{"properties": {"timestamp": "2026-08-01T17:53:00+00:00",
        | "station": "https://api.example.test/stations/KSCK",
        | "temperature": {"value": 308.15},
        | "precipitationLastHour": {"value": 0.0005},
        | "relativeHumidity": {"value": 42.0},
        | "windSpeed": {"value": 4.1},
        | "seaLevelPressure": {"value": 101325.0}}}"""
        .stripMargin.replaceAll("\n", " ")
    val hist =
      """{"properties": {"timestamp": "2026-07-30T05:00:00+00:00",
        | "station": "https://api.example.test/stations/KSJC",
        | "temperature": {"value": 296.15},
        | "precipitationLastHour": {"value": 1.5},
        | "relativeHumidity": {"value": 58.0},
        | "windSpeed": {"value": 2.0},
        | "seaLevelPressure": {"value": 101200.0}}}"""
        .stripMargin.replaceAll("\n", " ")
    val doc =
      s"""{"source_timestamp": "2026-08-01T18:00:00Z",
         |"source_database": "NWS_API", "data_quality": "raw",
         |"api_request_id": "req_demo", "etl_batch_id": "batch_demo",
         |"location": {"city": "Stockton", "state": "CA",
         |  "latitude": 37.9577, "longitude": -121.2908,
         |  "grid_point": {"office": "STO", "grid_x": 40, "grid_y": 60}},
         |"forecast": {"properties": {"periods": [
         |  {"name": "Today", "temperature": 95.0}]}},
         |"observations": [$feature],
         |"historical_observations": [$hist],
         |"stations": ["KSCK"], "sync_type": "full",
         |"metadata": {"team_name": "graft", "data_source": "NWS_API"}}
         |""".stripMargin.replaceAll("\n", " ")
    val p = java.nio.file.Paths.get(dir, "raw", "batch.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, doc.getBytes("UTF-8"))
    p.getParent.toString
  }
}
