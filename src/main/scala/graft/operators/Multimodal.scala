package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-parallel batched
  * execution, output shape — is real and tested. The actual media
  * decode is STUBBED with a deterministic fake (this container has no
  * image/audio codecs): `FakeCodec` derives "features" purely from the
  * bytes, so tests are reproducible and the stub swaps for a real codec
  * (e.g. a JNI decoder) without touching the plumbing.
  *
  * Scale notes: per-asset work is embarrassingly parallel; assets are
  * processed inside `mapPartitions` so a real decoder amortizes any
  * per-batch init (model load, codec context) across the partition —
  * the Scala analog of a batched pandas UDF. No shuffle is introduced:
  * decode is a narrow transformation.
  */
object Multimodal {

  final case class Asset(asset_id: Long, kind: String, content: Array[Byte],
    mime: String, source: String)

  final case class AssetFeatures(asset_id: Long, kind: String,
    n_bytes: Int, checksum: Long, width: Int, height: Int,
    feature: Array[Float])

  final case class Frame(asset_id: Long, frame_idx: Int,
    frame_bytes: Array[Byte])

  /** The codec seam: what any real decoder must provide to slot into
    * the pipeline without touching the distributed plumbing. The
    * contract (enforced by `MediaCodecContractSpec` against every
    * implementation):
    *
    *  - total: never throws, for any byte array including empty;
    *  - deterministic: equal bytes → equal outputs (retries and
    *    cross-run reproducibility depend on this);
    *  - `feature` always returns exactly `featureDim` finite floats;
    *  - `dims` returns non-negative width/height.
    *
    * Implementations are shipped to executors inside `mapPartitions`,
    * hence `Serializable`; `open()` runs once per partition for
    * amortized init (codec contexts, model weights).
    */
  trait MediaCodec extends Serializable {
    def featureDim: Int
    /** Per-partition init hook; default no-op. */
    def open(): Unit = {}
    def checksum(bytes: Array[Byte]): Long
    def dims(bytes: Array[Byte]): (Int, Int)
    def feature(bytes: Array[Byte]): Array[Float]
  }

  /** STUB decoder — deterministic fake in place of a real codec. */
  object FakeCodec extends MediaCodec {
    // ??? real implementation would decode image/audio here; the fake
    // derives stable pseudo-features from the raw bytes instead.
    override val featureDim: Int = 8

    def checksum(bytes: Array[Byte]): Long =
      bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + b)

    def dims(bytes: Array[Byte]): (Int, Int) =
      if (bytes.length < 2) (0, 0)
      else ((bytes(0) & 0xff) + 1, (bytes(1) & 0xff) + 1)

    /** 8-dim "embedding": byte-value histogram over 8 buckets, L1
      * normalized — a stand-in with an embedding's shape and dtype.
      */
    def feature(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](8)
      bytes.foreach(b => hist((b & 0xff) >> 5) += 1f)
      val total = math.max(bytes.length, 1).toFloat
      hist.map(_ / total)
    }
  }

  /** Decode + feature-extract, batched per partition; any conforming
    * [[MediaCodec]] slots in.
    */
  def extractFeatures(assets: Dataset[Asset],
      codec: MediaCodec = FakeCodec): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      codec.open() // per-partition init (codec context, model load)
      it.map { a =>
        val (w, h) = codec.dims(a.content)
        AssetFeatures(a.asset_id, a.kind, a.content.length,
          codec.checksum(a.content), w, h,
          codec.feature(a.content))
      }
    }
  }

  /** Frame sampling for video-kind assets: every `stride`-th fixed-size
    * block becomes a frame row (the real decoder would seek keyframes).
    */
  def sampleFrames(assets: Dataset[Asset], frameSize: Int = 64,
      stride: Int = 4): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      a.content.grouped(frameSize).zipWithIndex.collect {
        case (block, i) if i % stride == 0 => Frame(a.asset_id, i, block)
      }
    }
  }

  /** Metadata + size stats per kind — pure column expressions over the
    * binary column (no decode needed): the cheap pre-filter a pipeline
    * runs before spending decode cycles.
    */
  def assetStats(assets: DataFrame): DataFrame =
    assets.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(length(col("content"))).as("total_bytes"),
        avg(length(col("content"))).as("avg_bytes"))

  /** Driver-visible multimodal stats: documents re-interpreted as
    * binary assets (kind from id, content = utf-8 text bytes) → the
    * opaque-binary metadata pass every media pipeline runs before
    * decode. SQL-expressible (octet_length), so it is oracle-checked
    * end-to-end even though the container has no codecs.
    */
  def docAssetStats(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Fns.r4
    graft.Tables.documents(spark, d)
      .select(
        (col("doc_id") % 3).cast("int").as("kind_id"),
        encode(col("text"), "UTF-8").as("content"),
        col("lang"))
      .groupBy(col("kind_id"))
      .agg(count(lit(1)).as("n_assets"),
        sum(length(col("content"))).as("total_bytes"),
        r4(avg(length(col("content")))).as("avg_bytes"),
        countDistinct(col("lang")).as("n_langs"))
  }

  /** Deterministic synthetic assets for tests/benches (no external
    * media needed): content bytes derived from the asset id.
    */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val bytes = Array.tabulate(128 + (i % 64).toInt)(j =>
        ((i * 131 + j * 17) % 256).toByte)
      Asset(i, kind, bytes, s"application/x-fake-$kind", s"src${i % 5}")
    }
  }
}
