package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Multimodal.{Asset, MediaCodec}

/** Video modality — closes the image/audio/video triple the multimodal
  * family promises. The container is RIFF AVI restricted to what a
  * pure-JVM parser can decode honestly: uncompressed 24bpp DIB
  * (`00db`) frames, i.e. the same padded BGR pixel planes
  * [[Multimodal.BmpCodec]] decodes, wrapped in the standard
  * `hdrl`/`movi` chunk structure. Everything a *compressed* codec
  * would add (H.264 et al.) sits behind the same [[MediaCodec]] seam
  * and swaps in without touching the distributed plumbing.
  *
  * The pipeline stages mirror the image/audio legs:
  *  - decode round-trip ([[aviDecodeStats]], `q_avi_decode`): header
  *    fields a correct parse must recover, DuckDB-oracled from the
  *    synthesis parameters;
  *  - frame sampling + per-frame perceptual hash + temporal-majority
  *    signature ([[AviCodec.dhash]]);
  *  - near-dup pairing through the SAME banded-Hamming machinery as
  *    SimHash/image/audio ([[videoNearDups]], `q_video_neardups`).
  *
  * Scale notes: decode and hashing are narrow per-partition passes;
  * the pairing join carries only (band, bkey, id, hash) — the video
  * bytes never enter an exchange. At 100 TB the per-asset cost is the
  * frame-sampled decode (stride-configurable), and the candidate set
  * is bucketed, never all-pairs.
  */
object Video {

  /** Parsed AVI geometry: frame dimensions plus the offset of every
    * `00db` frame's pixel plane inside the byte array.
    */
  private final case class AviInfo(width: Int, height: Int,
    rowSize: Int, frameOffs: Array[Int])

  /** Real codec #4: RIFF AVI (uncompressed 24bpp DIB frames), pure
    * JVM. Parsing is total: anything that is not a well-formed
    * DIB-frame AVI (bad magic, truncated chunk, missing `avih`, frame
    * chunks whose size disagrees with the header geometry, a frame
    * count that disagrees with `dwTotalFrames`) yields zero dims and a
    * zero feature rather than an exception — one bad asset must never
    * kill a 100 TB partition.
    *
    * Field mapping onto the contract: `dims` = (width, height);
    * `feature` = 8-bin luminance histogram over the decoded pixels of
    * ALL frames, L1-normalized; `checksum` = CRC32.
    */
  object AviCodec extends MediaCodec {
    override val featureDim: Int = 8

    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def magic(b: Array[Byte], o: Int, m: String): Boolean =
      b.length >= o + 4 &&
        m.indices.forall(i => (b(o + i) & 0xff) == m.charAt(i).toInt)

    /** Chunk walk over the RIFF container: find `avih` inside
      * `LIST hdrl` (width, height, dwTotalFrames) and every `00db`
      * chunk inside `LIST movi`. `None` unless both are present, every
      * frame chunk is exactly one padded pixel plane, and the frame
      * count matches the header.
      */
    private def parse(b: Array[Byte]): Option[AviInfo] = {
      if (!magic(b, 0, "RIFF") || !magic(b, 8, "AVI ")) return None
      var avih: Option[(Int, Int, Int)] = None // width, height, total
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var ok = true

      def walk(from: Int, until: Int, inMovi: Boolean,
          inHdrl: Boolean): Unit = {
        var off = from
        while (ok && off + 8 <= until) {
          val size = le32(b, off + 4)
          if (size > until - off - 8) ok = false // truncated chunk
          else {
            val sz = size.toInt
            if (magic(b, off, "LIST") && sz >= 4) {
              val hdrl = magic(b, off + 8, "hdrl")
              val movi = magic(b, off + 8, "movi")
              walk(off + 12, off + 8 + sz, inMovi || movi,
                inHdrl || hdrl)
            } else if (inHdrl && magic(b, off, "avih") && sz >= 56) {
              val w = le32(b, off + 8 + 32)
              val h = le32(b, off + 8 + 36)
              val n = le32(b, off + 8 + 16)
              if (w > 0 && w <= 65536 && h > 0 && h <= 65536 &&
                n >= 0 && n <= Int.MaxValue)
                avih = Some((w.toInt, h.toInt, n.toInt))
              else ok = false
            } else if (inMovi && magic(b, off, "00db")) {
              frames += ((off + 8, sz))
            }
            off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
          }
        }
      }

      walk(12, b.length, inMovi = false, inHdrl = false)
      avih match {
        case Some((w, h, total)) if ok =>
          val rowSize = ((3 * w + 3) / 4) * 4
          val planeLen = rowSize.toLong * h
          val good = frames.nonEmpty && frames.length == total &&
            frames.forall { case (_, sz) => sz.toLong == planeLen }
          if (good)
            Some(AviInfo(w, h, rowSize, frames.map(_._1).toArray))
          else None
        case _ => None
      }
    }

    def checksum(bytes: Array[Byte]): Long = {
      val crc = new java.util.zip.CRC32()
      crc.update(bytes)
      crc.getValue
    }

    def dims(bytes: Array[Byte]): (Int, Int) =
      parse(bytes).map(i => (i.width, i.height)).getOrElse((0, 0))

    /** Decoded frame count; 0 for anything malformed. */
    def frameCount(bytes: Array[Byte]): Int =
      parse(bytes).map(_.frameOffs.length).getOrElse(0)

    def feature(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](featureDim)
      parse(bytes).foreach { info =>
        var f = 0
        while (f < info.frameOffs.length) {
          var row = 0
          while (row < info.height) {
            val base = info.frameOffs(f) + row * info.rowSize
            var px = 0
            while (px < info.width) {
              val bin = Multimodal.BmpCodec.lumAt(bytes, base + 3 * px) >> 5
              hist(bin) += 1f
              px += 1
            }
            row += 1
          }
          f += 1
        }
        val n = info.width.toLong * info.height * info.frameOffs.length
        if (n > 0) { var j = 0; while (j < featureDim) {
          hist(j) /= n.toFloat; j += 1 } }
      }
      hist
    }

    /** Per-frame perceptual hashes of every `stride`-th frame (frame 0
      * always included) — the frame-sample stage. Each sampled frame
      * is a bottom-up padded BGR plane, hashed with the exact
      * [[Multimodal.BmpCodec]] dHash grid, so a single-frame video
      * hashes identically to the equivalent BMP.
      */
    def sampledFrameHashes(bytes: Array[Byte],
        stride: Int = 2): Option[Array[Long]] =
      parse(bytes).map { info =>
        info.frameOffs.indices.collect {
          case f if f % stride == 0 =>
            Multimodal.BmpCodec.dhashPlane(bytes, info.frameOffs(f),
              info.width, info.height, info.rowSize, topDown = false)
        }.toArray
      }

    /** 64-bit temporal-majority video signature: bit `i` is set iff a
      * strict majority of the sampled frames set bit `i` in their
      * per-frame dHash (ties → 0, deterministic). Perturbing a
      * minority of frames leaves the signature unchanged — the
      * robustness a re-encode/overlay-class near-dup needs — while a
      * different pixel stream scrambles ~half the bits. `None` when
      * the bytes are not a well-formed DIB-frame AVI, so failed
      * decodes never pair.
      */
    def dhash(bytes: Array[Byte], stride: Int = 2): Option[Long] =
      sampledFrameHashes(bytes, stride).map { hs =>
        var sig = 0L
        var bit = 0
        while (bit < 64) {
          var votes = 0
          var i = 0
          while (i < hs.length) {
            if ((hs(i) >>> bit & 1L) == 1L) votes += 1
            i += 1
          }
          if (2 * votes > hs.length) sig |= 1L << bit
          bit += 1
        }
        sig
      }
  }

  /** Serialize frames as a well-formed DIB AVI (the inverse of
    * [[AviCodec]]'s parse — round-trip asserted in tests): RIFF/`AVI `
    * with a standard `hdrl` (avih + one `vids`/`DIB ` stream) and a
    * `movi` list of `00db` chunks. Each frame is raw bottom-up BGR,
    * 3 bytes/pixel, NO padding in the input; rows pad to the 4-byte
    * boundary here, exactly like [[Multimodal.bmpBytes]].
    */
  def aviBytes(width: Int, height: Int,
      frames: Array[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    frames.foreach(f => require(f.length == 3 * width * height,
      s"expected ${3 * width * height} BGR bytes, got ${f.length}"))
    val rowSize = ((3 * width + 3) / 4) * 4
    val planeLen = rowSize * height
    val n = frames.length
    // strl = 'strl' + strh chunk (8+56) + strf chunk (8+40)
    val strlLen = 4 + 64 + 48
    // hdrl = 'hdrl' + avih chunk (8+56) + LIST strl chunk (8+strlLen)
    val hdrlLen = 4 + 64 + 8 + strlLen
    // movi = 'movi' + n frame chunks (planeLen is 4-aligned: no pad)
    val moviLen = 4 + n * (8 + planeLen)
    val riffLen = 4 + 8 + hdrlLen + 8 + moviLen
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(riffLen); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(33333).putInt(0).putInt(0).putInt(0) // usPerFrame.. flags
    bb.putInt(n).putInt(0).putInt(1).putInt(planeLen) // total..bufSize
    bb.putInt(width).putInt(height)
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fourcc("LIST"); bb.putInt(strlLen); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0).putInt(0).putInt(0) // flags, prio/lang, initialFrames
    bb.putInt(1).putInt(30) // scale, rate
    bb.putInt(0).putInt(n).putInt(planeLen).putInt(0).putInt(0) // ..smpSz
    bb.putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort) // rcFrame
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
    bb.putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
    bb.putInt(planeLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(moviLen); fourcc("movi")
    frames.foreach { f =>
      fourcc("00db"); bb.putInt(planeLen)
      var row = 0
      while (row < height) {
        bb.put(f, 3 * width * row, 3 * width)
        var pad = rowSize - 3 * width
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        row += 1
      }
    }
    bb.array()
  }

  /** Documents re-rendered as deterministic DIB AVIs: width, height
    * and frame count are simple functions of (doc_id, n_chars) — so a
    * SQL oracle can predict what a CORRECT container parse must
    * recover (the fixed 224-byte header region plus n·(8 + padded
    * plane) of frame chunks) — while the pixel values are hash-derived
    * BGR the codec actually decodes.
    */
  def syntheticAviAssets(spark: SparkSession, d: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars"), col("source"))
      .as[(Long, Long, String)]
      .map { case (docId, nChars, source) =>
        val w = (4 + docId % 5).toInt
        val h = (2 + nChars % 4).toInt
        val n = (3 + docId % 4).toInt
        val frames = Array.tabulate(n)(f =>
          Array.tabulate(3 * w * h)(j =>
            ((docId * 131 + f * 29 + j * 17) % 256).toByte))
        Asset(docId, "video", aviBytes(w, h, frames), "video/x-msvideo",
          source)
      }
  }

  /** Registered decode round-trip for the video modality: synthesize
    * AVIs from the documents table, decode them with [[AviCodec]]
    * inside the `mapPartitions` plumbing, and aggregate ONLY
    * decode-derived fields (header dims, frame count, byte length).
    * The oracle recomputes the same stats from the synthesis
    * parameters — a mis-parsed chunk walk, frame size, or row stride
    * breaks the group keys or sums and the hashes diverge.
    */
  def aviDecodeStats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Fns.r4
    val feats = syntheticAviAssets(spark, d).mapPartitions { it =>
      it.map { a =>
        val (w, h) = AviCodec.dims(a.content)
        (w, h, AviCodec.frameCount(a.content), a.content.length)
      }
    }.toDF("width", "height", "n_frames", "n_bytes")
    feats.groupBy(col("width"), col("n_frames"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        r4(avg(col("height"))).as("avg_height"))
  }

  /** Video near-dup fixture corpus — the [[Multimodal
    * .syntheticImageCorpus]] structure one modality up: group
    * `g = doc_id div 4` fixes geometry (w, h, frame count) and the
    * base pixel stream; member `m = doc_id mod 4` perturbs it — m=0
    * the base cut, m=1 three pixels nudged in ONE sampled frame (a
    * re-encode/overlay-class near-dup: a strict minority of sampled
    * frames, so the temporal majority absorbs it), m=2 eight pixels
    * nudged in EVERY sampled frame (borderline BY DESIGN — the
    * per-frame drift passes straight through the majority; some
    * groups land past maxHamming, the golden pins which), m=3 an
    * unrelated pixel stream at the same geometry (the hard negative).
    * Per-group pixel stride keeps distinct groups perceptually
    * distinct (the image-corpus lesson: dHash keys on differences, so
    * a shifted copy of the same gradient would collide); the per-frame
    * `f*37` term shifts each frame's gradient without changing its
    * differences — frames of one video hash alike, as consecutive
    * frames of real footage do.
    */
  def syntheticVideoCorpus(spark: SparkSession, d: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (docId, source) =>
        val g = docId / 4
        val m = (docId % 4).toInt
        val w = (16 + g % 9).toInt
        val h = (12 + g % 7).toInt
        val n = (6 + g % 4).toInt
        val stride = 11 + (g % 13) * 2
        val frames = Array.tabulate(n) { f =>
          Array.tabulate(3 * w * h) { j =>
            val base =
              if (m == 3) (g * 197 + 91 + f * 53 + j * (stride + 4)) % 256
              else (g * 131 + f * 37 + j * stride) % 256
            base.toByte
          }
        }
        val perturb: (Int, Seq[Int]) = m match {
          case 1 => (3, Seq(2)) // one sampled frame: majority absorbs
          case 2 => (8, 0 until n by 2) // every sampled frame: drifts
          case _ => (0, Nil)
        }
        val (nudges, inFrames) = perturb
        for (f <- inFrames) {
          var k = 0
          while (k < nudges) {
            val p = ((g * 31 + k * 97 + m * 13) % (3L * w * h)).toInt
            frames(f)(p) = (frames(f)(p) + 60).toByte
            k += 1
          }
        }
        Asset(docId, "video", aviBytes(w, h, frames), "video/x-msvideo",
          source)
      }
  }

  /** Temporal-majority signatures per asset — the frame-sample +
    * decode stage of the video near-dup pipeline, batched per
    * partition like [[Multimodal.imagePHashes]]. Output: (asset_id,
    * phash NULLABLE) — failed decodes carry null and are dropped by
    * the pairing, never hashed to a shared sentinel.
    */
  def videoPHashes(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map(a => (a.asset_id, AviCodec.dhash(a.content)))
    }.toDF("asset_id", "phash")
  }

  /** Video near-duplicate pairs — completes the multimodal dedup
    * triple: frame-sampled temporal-majority signatures through the
    * SAME banded-Hamming machinery as SimHash text dedup,
    * [[Multimodal.imageNearDups]] and [[Multimodal.audioNearDups]].
    * The video bytes never shuffle; the pairing join carries only
    * (band, bkey, id, hash).
    */
  def videoNearDups(spark: SparkSession, d: String,
      maxHamming: Int = 6): DataFrame =
    Dedup.bandedHammingPairs(
      videoPHashes(syntheticVideoCorpus(spark, d)),
      "asset_id", "phash", maxHamming, "asset_a", "asset_b")
}
