package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.graftshim.TopKBuffer

/** ScalaCheck invariants for the bounded top-k buffer behind the
  * TopKPairs aggregate (pure data structure — no SparkSession): any
  * insertion order and any split into partial buffers must equal the
  * reference "sort everything, take k" computation.
  */
object TopKBufferProps extends Properties("TopKBuffer") {

  private val genPairs: Gen[List[(Double, Long)]] =
    Gen.listOf(for {
      // small key domain on purpose: exercises duplicate keys and ties
      k <- Gen.chooseNum(-3, 3)
      p <- Gen.chooseNum(-100L, 100L)
    } yield (k.toDouble, p))

  private def reference(pairs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    pairs.sortBy { case (key, p) => (-key, p) }.take(k)

  private def drain(b: TopKBuffer): List[(Double, Long)] =
    (0 until b.size).map(i => (b.keys(i), b.payloads(i))).toList

  property("insert ≡ sort-then-take for any order and k") =
    forAll(genPairs, Gen.chooseNum(1, 8)) { (pairs, k) =>
      val buf = new TopKBuffer(k)
      pairs.foreach { case (key, p) => buf.insert(key, p) }
      drain(buf) == reference(pairs, k)
    }

  property("merge of split buffers ≡ single buffer over all input") =
    forAll(genPairs, Gen.chooseNum(1, 8), Gen.chooseNum(0, 64)) { (pairs, k, cut) =>
      val (l, r) = pairs.splitAt(cut % (pairs.length + 1))
      val a = new TopKBuffer(k)
      val b = new TopKBuffer(k)
      l.foreach { case (key, p) => a.insert(key, p) }
      r.foreach { case (key, p) => b.insert(key, p) }
      // merge the way TopKPairs.merge does
      (0 until b.size).foreach(i => a.insert(b.keys(i), b.payloads(i)))
      drain(a) == reference(pairs, k)
    }
}
