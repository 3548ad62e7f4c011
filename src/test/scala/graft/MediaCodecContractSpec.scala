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
