package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck round-trip invariants for the pure-JVM media codecs:
  * arbitrary dims (hitting every row-padding residue) and arbitrary
  * pixel/sample content must survive encode → decode bit-exactly.
  */
object CodecsProps extends Properties("Codecs") {

  private val genDims: Gen[(Int, Int)] =
    for { w <- Gen.chooseNum(1, 33); h <- Gen.chooseNum(1, 17) } yield (w, h)

  property("BMP encode→decode is identity for any dims and pixel content") =
    forAll(genDims, Gen.chooseNum(0, Int.MaxValue)) { case ((w, h), seed) =>
      def px(x: Int, y: Int): (Int, Int, Int) = {
        val v = (x * 7919 + y * 104729 + seed) & 0x7fffffff
        (v % 256, (v / 256) % 256, (v / 65536) % 256)
      }
      val img = Codecs.decodeBmp(Codecs.encodeBmp(w, h, px))
      img.width == w && img.height == h &&
        (0 until h).forall(y => (0 until w).forall { x =>
          val (r, g, b) = px(x, y)
          img.pixels(y * w + x) == ((r << 16) | (g << 8) | b)
        })
    }

  property("WAV encode→decode is identity for any rate and samples") =
    forAll(Gen.chooseNum(1, 192000), Gen.listOf(Gen.chooseNum(Short.MinValue, Short.MaxValue))) {
      (rate, samples) =>
        val arr = samples.map(_.toShort).toArray
        val wav = Codecs.decodeWav(Codecs.encodeWav(rate, arr))
        wav.sampleRate == rate && wav.samples.toSeq == arr.toSeq
    }
}
