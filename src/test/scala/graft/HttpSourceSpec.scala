package graft

import graft.sources.{HttpResponse, HttpTransport}
import org.apache.spark.sql.functions._

/** Deterministic counter-backed transport: every URL fails its first
  * two fetches, then succeeds — exercises the retry ladder. Local-mode
  * executors share the JVM, so the companion state is visible.
  */
class FlakyTransport extends HttpTransport {
  override def fetch(url: String): HttpResponse = {
    val n: Int = FlakyTransport.calls.merge(url, 1,
      (a: Integer, b: Integer) => Integer.valueOf(a + b))
    if (n <= 2) HttpResponse(503, null)
    else HttpResponse(200, s"payload-of-$url")
  }
}

object FlakyTransport {
  val calls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}

class HttpSourceSpec extends SparkSuite {

  private def writeFixture(dir: String, name: String,
      content: String): String = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, content)
    p.toString
  }

  test("graft-http reads a URL fan-out via the file transport") {
    val dir = tmpDir("http_src")
    val urls = (0 until 5).map(i =>
      writeFixture(dir, s"stations/s$i.json", s"""{"station": $i}"""))
    val df = spark.read.format("graft-http")
      .option("urls", urls.mkString(","))
      .load()
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1),
      r.getInt(2), r.getString(3))).sortBy(_._1)
    assert(rows.length === 5)
    rows.zipWithIndex.foreach { case ((url, status, attempts, body), i) =>
      assert(status === 200 && attempts === 1)
      assert(body === s"""{"station": $i}""")
    }
  }

  test("missing URLs become auditable rows, and a deterministic 4xx " +
    "is final on FIRST attempt (no retry waste)") {
    val dir = tmpDir("http_missing")
    val ok = writeFixture(dir, "ok.json", """{"a": 1}""")
    val df = spark.read.format("graft-http")
      .option("urls", s"$ok,$dir/nope.json")
      .option("retries", "3")
      .load()
    val byUrl = df.collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2),
        r.getString(3))).toMap
    assert(byUrl(ok) === ((200, 1, """{"a": 1}""")))
    // 404 is not transient: one attempt, then the audit row
    assert(byUrl(s"$dir/nope.json") === ((404, 1, null)))
  }

  test("urls option: JSON-array form carries comma-containing URLs; " +
    "urlsDelimiter overrides the split") {
    val dir = tmpDir("http_commas")
    // a filename WITH a comma — the comma-split form would shred it
    val weird = writeFixture(dir, "q,page=1.json", """{"q": 1}""")
    val plain = writeFixture(dir, "plain.json", """{"p": 2}""")
    val jsonUrls =
      s"""["$weird", "$plain"]"""
    val viaJson = spark.read.format("graft-http")
      .option("urls", jsonUrls).load()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(viaJson === Map(weird -> 200, plain -> 200))
    val viaDelim = spark.read.format("graft-http")
      .option("urls", s"$weird|$plain")
      .option("urlsDelimiter", "|").load()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(viaDelim === Map(weird -> 200, plain -> 200))
  }

  test("JavaHttpTransport loads through the reflective seam; an " +
    "unroutable endpoint yields transport-error audit rows") {
    // no egress in the sandbox: a connection-refused localhost URL
    // exercises the real HttpClient path end-to-end (exception → -1 →
    // retried as transient → audit row, task alive)
    val df = spark.read.format("graft-http")
      .option("urls", "http://127.0.0.1:1/unreachable")
      .option("retries", "2")
      .option("transport", classOf[graft.sources.JavaHttpTransport].getName)
      .load()
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1),
      r.getInt(2), r.getString(3)))
    assert(rows.toSeq === Seq(
      ("http://127.0.0.1:1/unreachable", -1, 2, null)))
  }

  test("retry ladder stops on first success (flaky transport)") {
    FlakyTransport.calls.clear()
    val df = spark.read.format("graft-http")
      .option("urls", "u1,u2")
      .option("retries", "5")
      .option("transport", classOf[FlakyTransport].getName)
      .load()
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(rows("u1") === ((200, 3, "payload-of-u1")))
    assert(rows("u2") === ((200, 3, "payload-of-u2")))
    // exactly 3 transport calls per url — no fetch after success
    assert(FlakyTransport.calls.get("u1") === 3)
  }

  test("fanout bounds input partitions; pruning reaches the reader") {
    val dir = tmpDir("http_fanout")
    val urls = (0 until 10).map(i =>
      writeFixture(dir, s"u$i.json", s"$i"))
    val df = spark.read.format("graft-http")
      .option("urls", urls.mkString(","))
      .option("fanout", "4")
      .load()
    assert(df.rdd.getNumPartitions === 4)
    val pruned = df.select("url")
    // DSv2 BatchScan prints its (pruned) output schema in brackets —
    // only `url` must reach the reader
    assert(pruned.queryExecution.executedPlan.toString
      .contains("BatchScan graft-http[url#"))
    assert(pruned.count() === 10)
  }

  test("connector feeds the existing lake parse path (from_json)") {
    val dir = tmpDir("http_lake")
    val doc = WeatherFixtures.rawDoc("batch_http", Seq(
      """{"properties": {"timestamp": "2026-08-01T10:00:00+00:00",
        | "station": "https://api.example.test/stations/KSCK",
        | "temperature": {"value": 300.15},
        | "precipitationLastHour": {"value": 0.001},
        | "relativeHumidity": {"value": 50.0},
        | "windSpeed": {"value": 2.0},
        | "seaLevelPressure": {"value": 101325.0}}}"""
        .stripMargin.replaceAll("\n", " ")), Seq())
    val url = writeFixture(dir, "fetch.json", doc)
    val fetched = spark.read.format("graft-http")
      .option("urls", url).load()
      .filter(col("status") === 200)
    // the connector's body column parses with the same explicit schema
    // the file-based lake tier uses
    val viaConnector = fetched.select(
      from_json(col("body"), pipeline.WeatherSchemas.rawDocument).as("doc"))
      .select(col("doc.*"))
    val viaFiles = pipeline.Lake.readRaw(spark, url)
    assert(viaConnector.count() === 1)
    assert(viaConnector.select("api_request_id").collect().head.getString(0)
      === viaFiles.select("api_request_id").collect().head.getString(0))
  }
}
