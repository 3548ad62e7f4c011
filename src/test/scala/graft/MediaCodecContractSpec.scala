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
