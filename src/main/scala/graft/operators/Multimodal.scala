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
    // STUB marker (per the brief): a real codec would decode the media
    // bytes here; the fake derives stable pseudo-features instead.
    // Real codecs exist behind the same seam: WavCodec/BmpCodec/AviCodec.
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

  /** Real codec #2: RIFF/WAVE (PCM16) header parse + sample decode,
    * pure JVM — proves the [[MediaCodec]] seam is sufficient for an
    * actual container format, not just the fake. Parsing is total:
    * anything that is not a well-formed PCM16 WAV (bad magic, truncated
    * chunk, compressed format, 8/24-bit samples) yields zero dims and a
    * zero feature rather than an exception — a decode failure on one
    * asset must never kill a 100 TB partition.
    *
    * Field mapping onto the image-shaped contract: `dims` = (channels,
    * sampleRate); `feature` = 8-bin amplitude histogram over the PCM16
    * samples of the data chunk, L1-normalized; `checksum` = CRC32.
    */
  object WavCodec extends MediaCodec {
    override val featureDim: Int = 8

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def magic(b: Array[Byte], o: Int, m: String): Boolean =
      b.length >= o + 4 &&
        m.indices.forall(i => (b(o + i) & 0xff) == m.charAt(i).toInt)

    private final case class WavInfo(channels: Int, sampleRate: Int,
      dataOff: Int, dataLen: Int)

    /** Chunk walk over the RIFF container; `None` unless both a PCM16
      * `fmt ` chunk and an in-bounds `data` chunk are present.
      */
    private def parse(b: Array[Byte]): Option[WavInfo] = {
      if (!magic(b, 0, "RIFF") || !magic(b, 8, "WAVE")) None
      else {
        var off = 12
        var fmt: Option[(Int, Int)] = None
        var data: Option[(Int, Int)] = None
        var ok = true
        while (ok && off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
          val size = le32(b, off + 4)
          if (size > b.length - off - 8) ok = false // truncated chunk
          else {
            val sz = size.toInt
            if (magic(b, off, "fmt ") && sz >= 16) {
              val ch = le16(b, off + 10)
              val rate = le32(b, off + 12)
              val bits = le16(b, off + 22)
              if (le16(b, off + 8) == 1 && bits == 16 && ch > 0 &&
                rate > 0 && rate <= Int.MaxValue)
                fmt = Some((ch, rate.toInt))
            } else if (magic(b, off, "data")) data = Some((off + 8, sz))
            off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
          }
        }
        for (f <- fmt; d <- data) yield WavInfo(f._1, f._2, d._1, d._2)
      }
    }

    def checksum(bytes: Array[Byte]): Long = {
      val crc = new java.util.zip.CRC32()
      crc.update(bytes)
      crc.getValue
    }

    def dims(bytes: Array[Byte]): (Int, Int) =
      parse(bytes).map(w => (w.channels, w.sampleRate)).getOrElse((0, 0))

    /** 64-bit perceptual hash of the decoded audio — the energy-
      * envelope twin of [[BmpCodec.dhash]]: the PCM samples split into
      * 65 equal time windows, each window's energy is the integer sum
      * of absolute sample values, and bit `i` = "window i+1 louder
      * than window i" (cross-product compare, so uneven window sizes
      * never need float division). A few perturbed samples move a few
      * windows' energies — small Hamming distance; different material
      * scrambles ~half the envelope comparisons. `None` when the bytes
      * are not a well-formed PCM16 WAV or the data chunk is empty, so
      * failed decodes never pair.
      */
    def dhash(bytes: Array[Byte]): Option[Long] =
      parse(bytes).filter(_.dataLen >= 2).map { w =>
        val n = w.dataLen / 2
        val sums = new Array[Long](65)
        val cnts = new Array[Long](65)
        var win = 0
        while (win < 65) {
          val i0 = win * n / 65
          val i1 = math.max(i0 + 1, (win + 1) * n / 65)
          var i = i0
          while (i < i1) {
            val raw = le16(bytes, w.dataOff + 2 * i).toInt
            val s = (raw << 16) >> 16 // sign-extend LE16
            sums(win) += math.abs(s.toLong)
            cnts(win) += 1
            i += 1
          }
          win += 1
        }
        var h = 0L
        var b = 0
        while (b < 64) {
          if (sums(b + 1) * cnts(b) > sums(b) * cnts(b + 1))
            h |= 1L << b
          b += 1
        }
        h
      }

    def feature(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](featureDim)
      parse(bytes).foreach { w =>
        val n = w.dataLen / 2
        var i = 0
        while (i < n) {
          val s = le16(bytes, w.dataOff + 2 * i) // unsigned LE16
          // sign-bit flip biases the signed sample into [0, 65536);
          // top 3 bits pick the amplitude bin: 0 = most negative,
          // 4 = near-zero positive, 7 = most positive
          hist((s ^ 0x8000) >> 13) += 1f
          i += 1
        }
        if (n > 0) { var j = 0; while (j < featureDim) {
          hist(j) /= n.toFloat; j += 1 } }
      }
      hist
    }
  }

  /** Real codec #3: BMP (24-bit uncompressed BI_RGB) header parse +
    * pixel decode, pure JVM — closes the IMAGE modality the way
    * [[WavCodec]] closed audio. Parsing is total: anything that is not
    * a well-formed 24bpp uncompressed BMP (bad magic, truncated pixel
    * array, compressed, palettized, 1/4/8/16/32-bit) yields zero dims
    * and a zero feature rather than an exception — one bad asset must
    * never kill a 100 TB partition.
    *
    * Field mapping onto the contract: `dims` = (width, |height|)
    * (negative height is the legal top-down orientation); `feature` =
    * 8-bin luminance histogram over the decoded BGR pixels (integer
    * BT.601 weights), L1-normalized — orientation-independent, so
    * bottom-up and top-down encodings of the same image agree;
    * `checksum` = CRC32.
    */
  object BmpCodec extends MediaCodec {
    override val featureDim: Int = 8

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    private final case class BmpInfo(width: Int, height: Int,
      topDown: Boolean, dataOff: Int, rowSize: Int)

    /** BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (≥40 B) walk;
      * `None` unless planes=1, 24 bpp, BI_RGB, and the whole padded
      * pixel array is in bounds.
      */
    private def parse(b: Array[Byte]): Option[BmpInfo] = {
      if (b.length < 54 || (b(0) & 0xff) != 'B' || (b(1) & 0xff) != 'M')
        None
      else {
        val dataOff = le32(b, 10)
        val hdrSize = le32(b, 14)
        val width = le32(b, 18)
        val rawHeight = le32(b, 22)
        val planes = le16(b, 26)
        val bpp = le16(b, 28)
        val compression = le32(b, 30)
        val height = math.abs(rawHeight)
        val rowSize = ((3 * width + 3) / 4) * 4
        // height > 0 also rejects rawHeight == Int.MinValue, whose
        // math.abs is still negative and would slip past the bounds
        // checks (negative <= positive) into a nonsense BmpInfo
        val ok = hdrSize >= 40 && planes == 1 && bpp == 24 &&
          compression == 0 && width > 0 && height > 0 &&
          dataOff >= 54 && rowSize > 0 &&
          height <= (Int.MaxValue - dataOff) / rowSize &&
          dataOff + rowSize.toLong * height <= b.length
        if (ok) Some(BmpInfo(width, height, rawHeight < 0, dataOff,
          rowSize))
        else None
      }
    }

    def checksum(bytes: Array[Byte]): Long = {
      val crc = new java.util.zip.CRC32()
      crc.update(bytes)
      crc.getValue
    }

    def dims(bytes: Array[Byte]): (Int, Int) =
      parse(bytes).map(i => (i.width, i.height)).getOrElse((0, 0))

    private[operators] def lumAt(bytes: Array[Byte], o: Int): Int =
      (114 * (bytes(o) & 0xff) + 587 * (bytes(o + 1) & 0xff) +
        299 * (bytes(o + 2) & 0xff)) / 1000

    def feature(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](featureDim)
      parse(bytes).foreach { info =>
        var row = 0
        while (row < info.height) {
          val base = info.dataOff + row * info.rowSize
          var px = 0
          while (px < info.width) {
            hist(lumAt(bytes, base + 3 * px) >> 5) += 1f
            px += 1
          }
          row += 1
        }
        val n = info.width.toLong * info.height
        if (n > 0) { var j = 0; while (j < featureDim) {
          hist(j) /= n.toFloat; j += 1 } }
      }
      hist
    }

    /** 64-bit perceptual difference hash (dHash) over the decoded
      * luminance plane: box-downsample to a 9×8 mean-luminance grid
      * (any image size — small images repeat pixels, never skip), then
      * bit `y*8 + x` = "cell (y, x+1) brighter than cell (y, x)".
      * Orientation-normalized: rows are walked in IMAGE order (top to
      * bottom), so bottom-up and top-down encodings of the same pixels
      * hash identically, like [[feature]]. Means are compared as
      * integer cross-products — no float rounding, bit-reproducible
      * everywhere. `None` when the bytes are not a well-formed 24bpp
      * BMP (a failed decode must not pair with anything, rather than
      * hashing to the all-zero signature every other failed decode
      * shares).
      */
    def dhash(bytes: Array[Byte]): Option[Long] = parse(bytes).map { info =>
      dhashPlane(bytes, info.dataOff, info.width, info.height,
        info.rowSize, info.topDown)
    }

    /** The dHash grid core over a padded 24bpp BGR pixel plane at an
      * arbitrary offset — shared with [[Video.AviCodec]], whose DIB
      * frames are exactly this layout without the 54-byte file header.
      */
    private[operators] def dhashPlane(bytes: Array[Byte], dataOff: Int,
        width: Int, height: Int, rowSize: Int, topDown: Boolean): Long = {
      val sums = Array.ofDim[Long](8, 9)
      val cnts = Array.ofDim[Long](8, 9)
      var gy = 0
      while (gy < 8) {
        val y0 = gy * height / 8
        val y1 = math.max(y0 + 1, (gy + 1) * height / 8)
        var gx = 0
        while (gx < 9) {
          val x0 = gx * width / 9
          val x1 = math.max(x0 + 1, (gx + 1) * width / 9)
          var y = y0
          while (y < y1) {
            val storageRow =
              if (topDown) y else height - 1 - y
            val base = dataOff + storageRow * rowSize
            var x = x0
            while (x < x1) {
              sums(gy)(gx) += lumAt(bytes, base + 3 * x)
              cnts(gy)(gx) += 1
              x += 1
            }
            y += 1
          }
          gx += 1
        }
        gy += 1
      }
      var h = 0L
      var b = 0
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          if (sums(yy)(xx + 1) * cnts(yy)(xx) >
              sums(yy)(xx) * cnts(yy)(xx + 1))
            h |= 1L << b
          b += 1
          xx += 1
        }
        yy += 1
      }
      h
    }
  }

  /** Serialize a bottom-up 24bpp BI_RGB BMP (the inverse of
    * [[BmpCodec]]'s parse — round-trip asserted in tests).
    * `pixelsBgr` is row-major, 3 bytes per pixel, NO padding; rows are
    * padded to the 4-byte boundary here.
    */
  def bmpBytes(width: Int, height: Int,
      pixelsBgr: Array[Byte]): Array[Byte] = {
    require(pixelsBgr.length == 3 * width * height,
      s"expected ${3 * width * height} BGR bytes, got ${pixelsBgr.length}")
    val rowSize = ((3 * width + 3) / 4) * 4
    val dataLen = rowSize * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel-array offset
    bb.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
    bb.putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
    bb.putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = 0
    while (row < height) {
      bb.put(pixelsBgr, 3 * width * row, 3 * width)
      var pad = rowSize - 3 * width
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row += 1
    }
    bb.array()
  }

  /** Documents re-rendered as deterministic 24bpp BMP assets: width and
    * height are simple functions of (doc_id, n_chars) — so a SQL oracle
    * can predict what a CORRECT header decode must recover (including
    * the padded row stride in the byte size) — while the pixel values
    * are hash-derived BGR the codec actually decodes.
    */
  def syntheticBmpAssets(spark: SparkSession, d: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"), col("source"))
      .as[(Long, Long, String)]
      .map { case (docId, nChars, source) =>
        val width = (4 + docId % 5).toInt
        val height = (2 + nChars % 4).toInt
        val px = Array.tabulate(3 * width * height)(j =>
          ((docId * 131 + j * 17) % 256).toByte)
        Asset(docId, "image", bmpBytes(width, height, px),
          "image/bmp", source)
      }
  }

  /** Registered decode round-trip for the image modality: synthesize
    * BMPs from the documents table, decode them with [[BmpCodec]]
    * inside the `mapPartitions` plumbing, and aggregate ONLY
    * decode-derived fields (header dims, byte length). The oracle
    * recomputes the same stats from the synthesis parameters — a
    * mis-parsed width, height, or row stride breaks the group keys or
    * sums and the hashes diverge.
    */
  def bmpDecodeStats(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Fns.r4
    val feats = extractFeatures(syntheticBmpAssets(spark, d), BmpCodec)
      .toDF()
    feats.select(col("width"), col("height"), col("n_bytes"))
      .groupBy(col("width"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        r4(avg(col("height"))).as("avg_height"),
        max(col("height")).as("max_height"))
  }

  /** Image near-dup fixture corpus: documents re-rendered as grouped
    * BMPs with PLANTED perturbation levels. Group `g = doc_id div 4`
    * fixes the dimensions and base pixel pattern; member `m = doc_id
    * mod 4` perturbs it — m=0 the base itself, m=1 two pixels nudged
    * (a true near-dup), m=2 six pixels nudged (borderline), m=3 an
    * unrelated pattern at the same dimensions (the hard negative: it
    * shares the group's geometry but no content). Deterministic, so
    * the verified pair set pins to a golden exactly like
    * q_simhash_pairs.
    */
  def syntheticImageCorpus(spark: SparkSession, d: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val g = docId / 4
        val m = (docId % 4).toInt
        val w = (16 + g % 9).toInt
        val h = (12 + g % 7).toInt
        // per-group pixel STRIDE, not just a per-group constant shift:
        // dHash keys on luminance differences, so a shifted copy of
        // the same gradient would hash equal across groups — distinct
        // strides make distinct groups perceptually distinct
        val stride = 11 + (g % 13) * 2
        val px = Array.tabulate(3 * w * h) { j =>
          val base =
            if (m == 3) (g * 197 + 91 + j * (stride + 4)) % 256 // unrelated
            else (g * 131 + j * stride) % 256
          base.toByte
        }
        val nudges = m match {
          case 1 => 2
          case 2 => 6
          case _ => 0
        }
        var k = 0
        while (k < nudges) {
          val p = ((g * 31 + k * 97 + m * 13) % (3L * w * h)).toInt
          px(p) = (px(p) + 60).toByte
          k += 1
        }
        Asset(docId, "image", bmpBytes(w, h, px), "image/bmp", source)
      }
  }

  /** Perceptual hashes per asset — the decode stage of the image
    * near-dup pipeline, batched per partition like [[extractFeatures]]
    * (a real pipeline amortizes codec init the same way). Output:
    * (asset_id, phash NULLABLE) — failed decodes carry null and are
    * dropped by the pairing, never hashed to a shared sentinel.
    */
  def imagePHashes(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map(a => (a.asset_id, BmpCodec.dhash(a.content)))
    }.toDF("asset_id", "phash")
  }

  /** Image near-duplicate pairs — the multimodal leg of the dedup
    * story: [[BmpCodec.dhash]] perceptual hashes fed through the SAME
    * banded-Hamming machinery as SimHash text dedup
    * ([[Dedup.bandedHammingPairs]]): 4 16-bit bands bucket the
    * candidates (no all-pairs join), Hamming over the full 64-bit hash
    * verifies. At 100 TB the decode is a narrow per-partition pass and
    * the pairing join carries only (band, bkey, id, hash) — the image
    * bytes never shuffle.
    */
  def imageNearDups(spark: SparkSession, d: String,
      maxHamming: Int = 6): DataFrame =
    Dedup.bandedHammingPairs(
      imagePHashes(syntheticImageCorpus(spark, d)),
      "asset_id", "phash", maxHamming, "asset_a", "asset_b")

  /** Audio near-dup fixture corpus — [[syntheticImageCorpus]]'s
    * structure for the audio modality: group `g = doc_id div 4` fixes
    * channels, rate, length and the base PCM pattern; member `m` is
    * the planted perturbation — m=0 the base take, m=1 four samples
    * nudged (a re-encode-class near-dup), m=2 twelve samples nudged
    * (borderline), m=3 an unrelated pattern at the same geometry (the
    * hard negative). Deterministic → golden-pinnable.
    */
  def syntheticAudioCorpus(spark: SparkSession, d: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val g = docId / 4
        val m = (docId % 4).toInt
        val channels = (g % 2 + 1).toInt
        val rate = Seq(8000, 16000, 44100)((g % 3).toInt)
        val n = (130 + g % 50).toInt * channels
        // per-group phase AND stride: the envelope shape itself must
        // differ between groups (the image-corpus lesson: a constant
        // shift of the same shape is a near-dup to a difference hash)
        val stride = 40503L + (g % 11) * 4096
        val seed = if (m == 3) g * 977 + 13 else g * 2654435761L
        val str = if (m == 3) stride + 8192 else stride
        val samples = Array.tabulate(n)(j =>
          ((seed + j * str) % 65536 - 32768).toShort)
        // m=1 dampens 4 samples by 12.5% (a lossy-re-encode-class
        // wobble: robustly inside the pairing bar); m=2 halves 12
        // samples (borderline BY DESIGN — some groups land past
        // maxHamming, the golden pins which)
        val nudges = m match {
          case 1 => 4
          case 2 => 12
          case _ => 0
        }
        var k = 0
        while (k < nudges) {
          val p = ((g * 37 + k * 131 + m * 17) % n.toLong).toInt
          val damp = if (m == 1) samples(p) / 8 else samples(p) / 2
          samples(p) = (samples(p) - damp).toShort
          k += 1
        }
        Asset(docId, "audio", wavBytes(channels, rate, samples),
          "audio/wav", source)
      }
  }

  /** Audio perceptual hashes — the decode stage of the audio near-dup
    * pipeline, per-partition like [[imagePHashes]].
    */
  def audioPHashes(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map(a => (a.asset_id, WavCodec.dhash(a.content)))
    }.toDF("asset_id", "phash")
  }

  /** Audio near-duplicate pairs — completes the multimodal dedup
    * story: [[WavCodec.dhash]] energy-envelope hashes through the SAME
    * banded-Hamming machinery as SimHash text dedup and
    * [[imageNearDups]]. The audio bytes never shuffle; the pairing
    * join carries only (band, bkey, id, hash).
    */
  def audioNearDups(spark: SparkSession, d: String,
      maxHamming: Int = 6): DataFrame =
    Dedup.bandedHammingPairs(
      audioPHashes(syntheticAudioCorpus(spark, d)),
      "asset_id", "phash", maxHamming, "asset_a", "asset_b")

  /** Serialize PCM16 samples as a well-formed WAV file (the inverse of
    * [[WavCodec]]'s parse — round-trip asserted in tests).
    */
  def wavBytes(channels: Int, sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Documents re-rendered as deterministic PCM16 WAV assets: channel
    * count, sample rate, and sample count are simple functions of
    * (doc_id, n_chars) — so a SQL oracle can predict what a CORRECT
    * header decode must recover — while the sample values themselves
    * are hash-derived PCM the codec actually parses.
    */
  def syntheticWavAssets(spark: SparkSession, d: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"), col("source"))
      .as[(Long, Long, String)]
      .map { case (docId, nChars, source) =>
        val channels = (docId % 2 + 1).toInt
        val rate = Seq(8000, 16000, 44100)((docId % 3).toInt)
        val perCh = (50 + nChars % 100).toInt
        val samples = Array.tabulate(perCh * channels)(j =>
          ((docId * 2654435761L + j * 40503L) % 65536 - 32768).toShort)
        Asset(docId, "audio", wavBytes(channels, rate, samples),
          "audio/wav", source)
      }
  }

  /** Registered decode round-trip: synthesize WAVs from the documents
    * table, decode them with [[WavCodec]] inside the `mapPartitions`
    * plumbing, and aggregate ONLY decode-derived fields (dims, byte
    * length). The oracle recomputes the same stats from the synthesis
    * parameters — any header mis-parse (wrong rate, channels, or data
    * length) breaks the group keys or sums and the hashes diverge.
    */
  def wavDecodeStats(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Fns.r4
    val feats = extractFeatures(syntheticWavAssets(spark, d), WavCodec)
      .toDF()
    feats.select(
      col("width").as("n_channels"),
      col("height").as("sample_rate"),
      col("n_bytes"),
      // per-channel sample count, recovered from the DECODED header:
      // (bytes - 44-byte header) / (2 bytes per sample * channels)
      ((col("n_bytes") - 44) / (lit(2) * col("width")))
        .as("n_samples"))
      .groupBy(col("n_channels"), col("sample_rate"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        r4(avg(col("n_samples"))).as("avg_samples"))
  }
}
