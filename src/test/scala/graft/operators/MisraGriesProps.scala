package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.graftshim.MGBuffer

/** ScalaCheck invariants for the Misra–Gries counter map behind the
  * heavy-hitters candidate aggregate (pure data structure — no
  * SparkSession). The one guarantee t13's exact recount relies on: for
  * ANY insertion order and ANY split into partial buffers (Spark's
  * map-task partials merging at the reducer), every item with true
  * frequency > n/(capacity+1) survives in the candidate set, and the
  * buffer never holds more than `capacity` counters.
  */
object MisraGriesProps extends Properties("MGBuffer") {

  // small item domain on purpose: forces heavy collisions and decrements
  private val genStream: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 12L))

  private def heavy(xs: List[Long], cap: Int): Set[Long] = {
    val n = xs.length
    xs.groupBy(identity).collect {
      case (k, occ) if occ.length.toLong * (cap + 1) > n => k
    }.toSet
  }

  property("single buffer: candidates ⊇ items with freq > n/(cap+1)") =
    forAll(genStream, Gen.chooseNum(1, 6)) { (xs, cap) =>
      val b = new MGBuffer(cap)
      xs.foreach(b.add(_, 1L))
      val cands = b.counts.keys.toSet
      b.counts.size <= cap && heavy(xs, cap).subsetOf(cands)
    }

  property("merged split buffers keep the same guarantee") =
    forAll(genStream, Gen.chooseNum(1, 6), Gen.chooseNum(0, 64)) { (xs, cap, cut) =>
      val (l, r) = xs.splitAt(cut % (xs.length + 1))
      val a = new MGBuffer(cap)
      val b = new MGBuffer(cap)
      l.foreach(a.add(_, 1L))
      r.foreach(b.add(_, 1L))
      // merge exactly as MisraGries.merge does
      b.counts.foreach { case (k, c) => a.addNoCompress(k, c) }
      a.compress()
      a.counts.size <= cap && heavy(xs, cap).subsetOf(a.counts.keys.toSet)
    }

  property("three-way merge (deeper partial tree) keeps the guarantee") =
    forAll(genStream, genStream, genStream, Gen.chooseNum(1, 6)) { (x, y, z, cap) =>
      val bufs = List(x, y, z).map { part =>
        val b = new MGBuffer(cap)
        part.foreach(b.add(_, 1L))
        b
      }
      val acc = bufs.reduce { (a, b) =>
        b.counts.foreach { case (k, c) => a.addNoCompress(k, c) }
        a.compress()
        a
      }
      val all = x ++ y ++ z
      acc.counts.size <= cap && heavy(all, cap).subsetOf(acc.counts.keys.toSet)
    }
}
