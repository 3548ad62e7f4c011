package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Result of one fetch attempt. */
final case class HttpResponse(status: Int, body: String)

/** The transport seam: how bytes are obtained for a URL. Instantiated
  * REFLECTIVELY ON EXECUTORS (no-arg constructor required) so the
  * connector itself stays serialization-free. The sandbox has no
  * network, so the default [[FileTransport]] maps URLs to local files —
  * a real `java.net.http` transport slots in via
  * `.option("transport", classOf[MyTransport].getName)` without
  * touching the connector (same seam pattern as Multimodal.MediaCodec;
  * reference behavior: nws_api_fetcher_v2.py:21-119, fetch + retry
  * ladder :151-157 — behavior only, no code).
  */
trait HttpTransport {
  def fetch(url: String): HttpResponse
}

/** Default transport: `file://` (or bare-path) URLs served from the
  * local filesystem; missing file → 404. Gives the connector fully
  * deterministic, testable behavior in the sandbox.
  */
final class FileTransport extends HttpTransport {
  override def fetch(url: String): HttpResponse = {
    val path = java.nio.file.Paths.get(url.stripPrefix("file://"))
    if (java.nio.file.Files.exists(path))
      HttpResponse(200, new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8))
    else HttpResponse(404, null)
  }
}

/** Real-network transport over `java.net.http.HttpClient` (JDK 11+, no
  * extra dependency): one client per reader (instantiated on the
  * executor via the reflective seam), redirects followed, bounded
  * connect/request timeouts so a hung endpoint can't wedge a task.
  * Non-2xx statuses are returned as data — the connector's retry
  * ladder, not this class, decides what is retryable. The sandbox has
  * no egress, so tests exercise this class against unroutable
  * localhost endpoints (exception → audit row) and real fetching is a
  * deployment concern only:
  * `.option("transport", "graft.sources.JavaHttpTransport")`.
  */
final class JavaHttpTransport extends HttpTransport {
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()

  override def fetch(url: String): HttpResponse = {
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(30))
      .header("User-Agent", "graft-spark")
      .GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    HttpResponse(resp.statusCode(), resp.body())
  }
}

/** DataSource V2 batch connector for fan-out URL ingestion — the
  * reference's station-fetch orchestration as a first-class Spark
  * source:
  *
  *   spark.read.format("graft-http")
  *     .option("urls", "u1,u2,...")      // the fetch fan-out
  *     .option("fanout", "8")            // max input partitions
  *     .option("retries", "3")           // attempts per URL
  *     .option("transport", "graft.sources.FileTransport")
  *     .load()                           // → (url, status, attempts, body)
  *
  * Scale design: one fetch unit per URL, URLs round-robined into
  * `fanout` input partitions so a 10k-station fan-out becomes 10k
  * parallel-fetchable units without 10k tasks; fetching happens ON
  * EXECUTORS (the driver never touches a payload); failures don't kill
  * the task — each URL yields a row with its final status and attempt
  * count (the audit trail), body null on persistent failure. Downstream
  * parses `body` with `from_json` + explicit schema, exactly like the
  * file-based lake tier. Column pruning is pushed into the reader (a
  * `select(url)` never materializes bodies into rows).
  */
class HttpSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpTable()
}

object HttpSource {
  val Schema: StructType = new StructType()
    .add("url", StringType, nullable = false)
    .add("status", IntegerType, nullable = false)
    .add("attempts", IntegerType, nullable = false)
    .add("body", StringType, nullable = true)
}

private[sources] class HttpTable extends Table with SupportsRead {
  override def name(): String = "graft-http"
  override def schema(): StructType = HttpSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new HttpScanBuilder(options)
}

private[sources] class HttpScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = HttpSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order regardless of projection order
    required = new StructType(HttpSource.Schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = {
    // 'urls' accepts a JSON array (`["u1","u2"]`) — the robust form,
    // safe for URLs containing commas — or a delimited list, with the
    // delimiter overridable via 'urlsDelimiter' (default ",") for
    // callers whose URLs embed commas in query strings
    val raw = Option(options.get("urls")).map(_.trim).getOrElse("")
    def splitDelimited(): Seq[String] = {
      val delim = Option(options.get("urlsDelimiter")).getOrElse(",")
      raw.split(java.util.regex.Pattern.quote(delim))
        .map(_.trim).filter(_.nonEmpty).toSeq
    }
    val urls: Seq[String] =
      if (raw.startsWith("["))
        // a leading '[' is USUALLY a JSON array, but a delimited list
        // may legitimately start with an IPv6-literal URL like
        // http://[::1]/x once a scheme-less form is passed — fall back
        // to delimiter parsing rather than dying on a Jackson error
        try new com.fasterxml.jackson.databind.ObjectMapper()
          .readValue(raw, classOf[Array[String]])
          .toSeq.map(_.trim).filter(_.nonEmpty)
        catch {
          case _: com.fasterxml.jackson.core.JacksonException =>
            splitDelimited()
        }
      else splitDelimited()
    require(urls.nonEmpty, "graft-http requires a non-empty 'urls' option")
    val fanout = math.max(1, math.min(
      Option(options.get("fanout")).map(_.toInt).getOrElse(32),
      urls.size))
    val retries =
      math.max(1, Option(options.get("retries")).map(_.toInt).getOrElse(3))
    val transport = Option(options.get("transport"))
      .getOrElse(classOf[FileTransport].getName)
    new HttpScan(urls, fanout, retries, transport, required)
  }
}

private[sources] class HttpScan(urls: Seq[String], fanout: Int,
    retries: Int, transportClass: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    // round-robin for balanced partitions even when slow URLs cluster
    (0 until fanout).map { p =>
      HttpPartition(urls.zipWithIndex
        .collect { case (u, i) if i % fanout == p => u }.toArray)
        .asInstanceOf[InputPartition]
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpReaderFactory(retries, transportClass, required)
}

private[sources] final case class HttpPartition(urls: Array[String])
    extends InputPartition

private[sources] class HttpReaderFactory(retries: Int,
    transportClass: String, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val transport = Class.forName(transportClass)
      .getDeclaredConstructor().newInstance().asInstanceOf[HttpTransport]
    new HttpPartitionReader(
      partition.asInstanceOf[HttpPartition].urls, retries, transport,
      required)
  }
}

private[sources] class HttpPartitionReader(urls: Array[String],
    retries: Int, transport: HttpTransport, required: StructType)
    extends PartitionReader[InternalRow] {
  private var i = -1
  private var row: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= urls.length) return false
    row = fetchRow(urls(i))
    true
  }

  /** The reference's retry ladder: up to `retries` attempts, break on
    * the first success; a still-failing URL becomes an auditable row,
    * not a task failure. Only TRANSIENT failures are retried —
    * transport exceptions (status -1) and 5xx. A 4xx is deterministic
    * (the URL is wrong, not the network) and is final on first sight;
    * retrying it only hammers the backend.
    */
  private def fetchRow(url: String): InternalRow = {
    var attempt = 0
    var resp = HttpResponse(-1, null)
    var done = false
    while (!done && attempt < retries) {
      attempt += 1
      resp =
        try transport.fetch(url)
        catch { case _: Exception => HttpResponse(-1, null) }
      done = !(resp.status < 0 || resp.status >= 500)
    }
    InternalRow.fromSeq(required.fieldNames.toSeq.map {
      case "url" => UTF8String.fromString(url)
      case "status" => resp.status
      case "attempts" => attempt
      case "body" =>
        if (resp.body == null) null else UTF8String.fromString(resp.body)
    })
  }

  override def get(): InternalRow = row
  override def close(): Unit = {}
}
