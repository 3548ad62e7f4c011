package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaCodec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The contract every [[MediaCodec]] implementation must pass — run it
  * against a real decoder before swapping out the stub, and the
  * distributed plumbing (schema, mapPartitions batching, retries) keeps
  * working unchanged. Properties are checked with ScalaCheck generators
  * over arbitrary byte arrays, plus the empty/tiny edge cases
  * explicitly.
  */
class MediaCodecContractSpec extends SparkSuite {

  private def passes(p: Prop): Boolean =
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
      .passed

  def checkContract(codec: MediaCodec): Unit = {
    val bytesGen: Gen[Array[Byte]] =
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

    // total + deterministic on edge cases
    for (edge <- Seq(Array.emptyByteArray, Array[Byte](0),
        Array[Byte](-1, 127))) {
      assert(codec.checksum(edge) === codec.checksum(edge.clone()))
      assert(codec.dims(edge) === codec.dims(edge.clone()))
      assert(codec.feature(edge).toSeq === codec.feature(edge.clone()).toSeq)
    }

    assert(passes(Prop.forAll(bytesGen) { b =>
      codec.feature(b).length == codec.featureDim
    }), "feature length must equal featureDim for all inputs")

    assert(passes(Prop.forAll(bytesGen) { b =>
      codec.feature(b).forall(f => !f.isNaN && !f.isInfinite)
    }), "feature values must be finite")

    assert(passes(Prop.forAll(bytesGen) { b =>
      val (w, h) = codec.dims(b)
      w >= 0 && h >= 0
    }), "dims must be non-negative")

    assert(passes(Prop.forAll(bytesGen) { b =>
      codec.checksum(b) == codec.checksum(b.clone()) &&
        codec.feature(b).toSeq == codec.feature(b.clone()).toSeq
    }), "outputs must be deterministic in the bytes")
  }

  test("FakeCodec satisfies the MediaCodec contract") {
    checkContract(Multimodal.FakeCodec)
  }

  test("WavCodec (real RIFF/WAVE parser) satisfies the contract") {
    checkContract(Multimodal.WavCodec)
  }

  test("WavCodec round-trips wavBytes headers and decodes exact " +
    "amplitude histograms") {
    val codec = Multimodal.WavCodec
    // known samples hit bins 0 (most negative), 4 (zero), 7 (most
    // positive), 5 — each 1/4 of the histogram mass
    val samples = Array[Short](-32768, 0, 32767, 8192)
    val wav = Multimodal.wavBytes(channels = 2, sampleRate = 44100, samples)
    assert(codec.dims(wav) === ((2, 44100)))
    val hist = codec.feature(wav)
    assert(hist.toSeq === Seq(0.25f, 0f, 0f, 0f, 0.25f, 0.25f, 0f, 0.25f))
    // malformed inputs must degrade, not throw: bad magic, truncated
    // data chunk, non-PCM format tag
    assert(codec.dims("not a wav at all".getBytes) === ((0, 0)))
    assert(codec.feature(wav.take(30)).toSeq === Seq.fill(8)(0f))
    val nonPcm = wav.clone(); nonPcm(20) = 3 // format tag -> IEEE float
    assert(codec.dims(nonPcm) === ((0, 0)))
  }

  test("wavDecodeStats recovers synthesis parameters through the " +
    "decode path") {
    val out = Multimodal.wavDecodeStats(spark, sf()).collect()
    assert(out.nonEmpty)
    val rates = out.map(_.getInt(1)).toSet
    assert(rates.subsetOf(Set(8000, 16000, 44100)))
    assert(out.map(_.getInt(0)).toSet.subsetOf(Set(1, 2)))
  }

  test("BmpCodec (real 24bpp BMP parser) satisfies the contract") {
    checkContract(Multimodal.BmpCodec)
  }

  test("BmpCodec round-trips bmpBytes and decodes exact luminance " +
    "histograms, padding and orientation included") {
    val codec = Multimodal.BmpCodec
    // 3×2 image (row stride pads 9 → 12 bytes): pure black, pure
    // white, and four mid-greys — bins 0 (×1), 7 (×1), and the grey's
    // bin (×4). BGR grey 128 → lum 128 → bin 4.
    val px = Array[Byte](
      0, 0, 0, -1, -1, -1, -128, -128, -128, // row 0: black, white, grey
      -128, -128, -128, -128, -128, -128, -128, -128, -128) // row 1
    val bmp = Multimodal.bmpBytes(3, 2, px)
    assert(codec.dims(bmp) === ((3, 2)))
    assert(bmp.length === 54 + 12 * 2) // padded stride recovered below
    val hist = codec.feature(bmp)
    val exp = Seq(1 / 6f, 0f, 0f, 0f, 4 / 6f, 0f, 0f, 1 / 6f)
    hist.toSeq.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-6f) }
    // top-down encoding (negative height) must agree: same pixels,
    // legal alternative orientation
    val topDown = bmp.clone()
    val negH = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-2).array()
    System.arraycopy(negH, 0, topDown, 22, 4)
    assert(codec.dims(topDown) === ((3, 2)))
    assert(codec.feature(topDown).toSeq === hist.toSeq)
    // malformed inputs must degrade, not throw: bad magic, truncated
    // pixel array, unsupported depth/compression
    assert(codec.dims("definitely not a bitmap".getBytes) === ((0, 0)))
    assert(codec.feature(bmp.take(60)).toSeq === Seq.fill(8)(0f))
    val bpp8 = bmp.clone(); bpp8(28) = 8
    assert(codec.dims(bpp8) === ((0, 0)))
    val rle = bmp.clone(); rle(30) = 1 // BI_RLE8
    assert(codec.dims(rle) === ((0, 0)))
    // height = Int.MinValue: math.abs stays negative, so the bounds
    // checks pass vacuously — parse must still reject it
    val minH = bmp.clone()
    val minHBytes = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(Int.MinValue).array()
    System.arraycopy(minHBytes, 0, minH, 22, 4)
    assert(codec.dims(minH) === ((0, 0)))
    assert(codec.feature(minH).toSeq === Seq.fill(8)(0f))
  }

  test("BmpCodec.dhash: deterministic, orientation-invariant, total") {
    val codec = Multimodal.BmpCodec
    // a 20×16 gradient image — big enough that the 9×8 grid resolves
    val px = Array.tabulate(3 * 20 * 16)(j => ((j * 13) % 256).toByte)
    val bmp = Multimodal.bmpBytes(20, 16, px)
    val h1 = codec.dhash(bmp)
    assert(h1.nonEmpty)
    assert(codec.dhash(bmp) === h1) // deterministic
    // top-down re-encoding of the SAME pixels must hash identically
    val topDown = bmp.clone()
    val negH = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-16).array()
    System.arraycopy(negH, 0, topDown, 22, 4)
    // flip the stored row order so the image content is unchanged
    val rowSize = 60 // 3*20, already 4-byte aligned
    for (r <- 0 until 16)
      System.arraycopy(bmp, 54 + (15 - r) * rowSize, topDown,
        54 + r * rowSize, rowSize)
    assert(codec.dhash(topDown) === h1)
    // malformed input → None, never a shared sentinel hash
    assert(codec.dhash("not a bitmap".getBytes).isEmpty)
    assert(codec.dhash(bmp.take(40)).isEmpty)
  }

  test("dhash perturbation distance: few nudged pixels stay near, a " +
    "different gradient lands far") {
    val codec = Multimodal.BmpCodec
    def img(stride: Int, nudges: Int): Array[Byte] = {
      val px = Array.tabulate(3 * 20 * 16)(j => ((j * stride) % 256).toByte)
      for (k <- 0 until nudges) {
        val p = (k * 97) % px.length
        px(p) = (px(p) + 60).toByte
      }
      Multimodal.bmpBytes(20, 16, px)
    }
    def ham(a: Option[Long], b: Option[Long]): Int =
      java.lang.Long.bitCount(a.get ^ b.get)
    val base = codec.dhash(img(13, 0))
    assert(ham(base, codec.dhash(img(13, 2))) <= 4,
      "2 nudged pixels must flip at most a few grid comparisons")
    assert(ham(base, codec.dhash(img(29, 0))) > 6,
      "a different luminance gradient must land past the pairing bar")
  }

  test("imageNearDups recovers every planted group and never pairs " +
    "the hard negative into its group") {
    val pairs = Multimodal.imageNearDups(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val within = pairs.filter { case (a, b) => a / 4 == b / 4 }
      .map { case (a, b) => (a / 4, a % 4, b % 4) }
    val groups = within.map(_._1).distinct
    assert(groups.length >= 12, s"only ${groups.length} groups paired")
    // every group recovered with exactly the planted near-dup members
    groups.foreach { g =>
      val members = within.filter(_._1 == g).map(t => (t._2, t._3)).toSet
      assert(members === Set((0L, 1L), (0L, 2L), (1L, 2L)),
        s"group $g paired $members")
    }
    assert(!within.exists(t => t._2 == 3 || t._3 == 3),
      "the unrelated m=3 member must never pair within its group")
  }

  test("WavCodec.dhash: deterministic, perturbation-bounded, total") {
    val codec = Multimodal.WavCodec
    def wav(stride: Long, damp: Seq[Int] = Nil): Array[Byte] = {
      val samples = Array.tabulate(300)(j =>
        ((7L + j * stride) % 65536 - 32768).toShort)
      damp.foreach(p => samples(p) = (samples(p) - samples(p) / 8).toShort)
      Multimodal.wavBytes(1, 8000, samples)
    }
    def ham(a: Option[Long], b: Option[Long]): Int =
      java.lang.Long.bitCount(a.get ^ b.get)
    val base = codec.dhash(wav(40503))
    assert(base.nonEmpty)
    assert(codec.dhash(wav(40503)) === base) // deterministic
    assert(ham(base, codec.dhash(wav(40503, damp = Seq(11, 97, 200)))) <= 6,
      "a few dampened samples must stay inside the pairing bar")
    assert(ham(base, codec.dhash(wav(48695))) > 6,
      "a different envelope must land past the pairing bar")
    // malformed / empty-data inputs → None, never a shared sentinel
    assert(codec.dhash("RIFF but not really".getBytes).isEmpty)
    assert(codec.dhash(Multimodal.wavBytes(1, 8000,
      Array.empty[Short])).isEmpty)
  }

  test("audioNearDups recovers every planted m1 near-dup and never " +
    "pairs the hard negative into its group") {
    val pairs = Multimodal.audioNearDups(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val within = pairs.filter { case (a, b) => a / 4 == b / 4 }
      .map { case (a, b) => (a / 4, a % 4, b % 4) }
    val groups = within.map(_._1).distinct
    assert(groups.length >= 12, s"only ${groups.length} groups paired")
    // the m1 (re-encode-class) near-dup is recovered in EVERY group;
    // m2 is borderline by design, m3 must never pair
    groups.foreach { g =>
      val members = within.filter(_._1 == g).map(t => (t._2, t._3)).toSet
      assert(members.contains((0L, 1L)), s"group $g missed its m1 pair")
      assert(!members.exists(p => p._1 == 3 || p._2 == 3),
        s"group $g paired the unrelated member: $members")
    }
  }

  test("AviCodec (real RIFF AVI parser) satisfies the contract") {
    checkContract(graft.operators.Video.AviCodec)
  }

  test("AviCodec round-trips aviBytes, agrees with BmpCodec on a " +
    "single frame, and rejects malformed containers") {
    import graft.operators.Video
    val codec = Video.AviCodec
    val px = Array.tabulate(3 * 20 * 16)(j => ((j * 13) % 256).toByte)
    val avi = Video.aviBytes(20, 16, Array(px))
    assert(codec.dims(avi) === ((20, 16)))
    assert(codec.frameCount(avi) === 1)
    // a single-frame AVI's temporal majority IS the frame hash, and
    // the frame is the same padded BGR plane a BMP carries — the two
    // real image codecs must agree bit-for-bit
    assert(codec.dhash(avi) === Multimodal.BmpCodec
      .dhash(Multimodal.bmpBytes(20, 16, px)))
    // the luminance histogram over one frame must equal the BMP's
    assert(codec.feature(avi).toSeq ===
      Multimodal.BmpCodec.feature(Multimodal.bmpBytes(20, 16, px)).toSeq)
    // malformed inputs must degrade, not throw: bad magic, truncated
    // movi, header/frame-count disagreement
    assert(codec.dims("RIFF but not an avi".getBytes) === ((0, 0)))
    assert(codec.dims(avi.take(300)) === ((0, 0)))
    assert(codec.dhash(avi.take(300)).isEmpty)
    val badCount = avi.clone()
    // dwTotalFrames lives at hdrl avih payload offset 16: file offset
    // 12 (RIFF hdr) + 12 (LIST hdrl head) + 8 (avih head) + 16
    badCount(48) = 2
    assert(codec.dims(badCount) === ((0, 0)))
    assert(codec.frameCount(badCount) === 0)
  }

  test("AviCodec.dhash: temporal majority absorbs a minority-frame " +
    "perturbation, a different stream lands far") {
    import graft.operators.Video
    def vid(stride: Int, nudgeFrames: Seq[Int]): Array[Byte] = {
      val frames = Array.tabulate(6) { f =>
        val px = Array.tabulate(3 * 20 * 16)(j =>
          ((f * 37 + j * stride) % 256).toByte)
        if (nudgeFrames.contains(f))
          for (k <- 0 until 6) {
            val p = (k * 97) % px.length
            px(p) = (px(p) + 60).toByte
          }
        px
      }
      Video.aviBytes(20, 16, frames)
    }
    def ham(a: Option[Long], b: Option[Long]): Int =
      java.lang.Long.bitCount(a.get ^ b.get)
    val base = Video.AviCodec.dhash(vid(13, Nil))
    assert(base.nonEmpty)
    // one perturbed frame among the sampled {0,2,4}: strict minority,
    // the majority vote must absorb it completely
    assert(ham(base, Video.AviCodec.dhash(vid(13, Seq(2)))) === 0)
    // every sampled frame perturbed: the drift passes through, but a
    // 6-pixel nudge stays near
    assert(ham(base, Video.AviCodec.dhash(vid(13, Seq(0, 2, 4)))) <= 6)
    // a different gradient must land past the pairing bar
    assert(ham(base, Video.AviCodec.dhash(vid(29, Nil))) > 6)
  }

  test("videoNearDups recovers every planted m1 near-dup and never " +
    "pairs the hard negative into its group") {
    val pairs = graft.operators.Video.videoNearDups(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val within = pairs.filter { case (a, b) => a / 4 == b / 4 }
      .map { case (a, b) => (a / 4, a % 4, b % 4) }
    val groups = within.map(_._1).distinct
    assert(groups.length >= 12, s"only ${groups.length} groups paired")
    // the m1 (minority-frame) near-dup is recovered in EVERY group;
    // m2 is borderline by design, m3 must never pair
    groups.foreach { g =>
      val members = within.filter(_._1 == g).map(t => (t._2, t._3)).toSet
      assert(members.contains((0L, 1L)), s"group $g missed its m1 pair")
      assert(!members.exists(p => p._1 == 3 || p._2 == 3),
        s"group $g paired the unrelated member: $members")
    }
  }

  test("aviDecodeStats recovers synthesis parameters through the " +
    "decode path") {
    val out = graft.operators.Video.aviDecodeStats(spark, sf()).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getInt(0)).toSet.subsetOf(Set(4, 5, 6, 7, 8)))
    assert(out.map(_.getInt(1)).toSet.subsetOf(Set(3, 4, 5, 6)))
  }

  test("bmpDecodeStats recovers synthesis parameters through the " +
    "decode path") {
    val out = Multimodal.bmpDecodeStats(spark, sf()).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getInt(0)).toSet.subsetOf(Set(4, 5, 6, 7, 8)))
    assert(out.map(_.getInt(4)).forall(h => h >= 2 && h <= 5))
  }

  test("a conforming alternative codec slots into extractFeatures " +
    "without plumbing changes") {
    object AltCodec extends MediaCodec {
      override val featureDim: Int = 4
      def checksum(bytes: Array[Byte]): Long =
        bytes.foldLeft(17L)((h, b) => h * 1099511628211L + b)
      def dims(bytes: Array[Byte]): (Int, Int) =
        (bytes.length % 97, bytes.length % 89)
      def feature(bytes: Array[Byte]): Array[Float] = {
        val f = new Array[Float](4)
        bytes.zipWithIndex.foreach { case (b, i) => f(i % 4) += (b & 0xff) }
        f.map(_ / math.max(bytes.length, 1))
      }
    }
    checkContract(AltCodec)
    val feats = Multimodal
      .extractFeatures(Multimodal.syntheticAssets(spark, 12), AltCodec)
      .collect()
    assert(feats.length === 12)
    assert(feats.forall(_.feature.length === 4))
  }
}
