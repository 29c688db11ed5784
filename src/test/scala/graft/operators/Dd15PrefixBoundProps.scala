package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Pure-math property for dd15's round-9 fingerprint-first verify: the
  * P-prefix overlap bound must NEVER reject a pair whose true common
  * count reaches the ⌈0.9·na⌉ containment gate (losslessness), and the
  * prefix intersect must equal the true overlap below the prefix-max
  * cut m (exactness of the cheap part).
  *
  * Mirrors the plan arithmetic exactly: pa/pb are the P smallest of
  * each sorted distinct set; m = min(max pa, max pb); rest = the
  * m-side's elements beyond its prefix (na−min(P,na) when
  * max pa ≤ max pb, else nb−min(P,nb)); survive ⟺
  * 10·(|pa∩pb| + rest) ≥ 9·na. Run with small P (4) so the generator
  * actually exercises the beyond-prefix regime.
  */
object Dd15PrefixBoundProps extends Properties("Dedup.dd15.prefixBound") {

  private val P = 4

  private val genSet: Gen[Set[Long]] =
    Gen.chooseNum(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50L, 50L)).map(_.toSet))

  // a pair with forced overlap: draw A, then B as (subset of A) ∪ extras
  private val genPair: Gen[(Set[Long], Set[Long])] = for {
    a <- genSet
    keep <- Gen.listOfN(a.size, Gen.prob(0.7))
    extra <- genSet
  } yield (a, a.zip(keep).collect { case (x, true) => x }.toSet ++ extra)

  private def bound(a: Set[Long], b: Set[Long]): (Long, Boolean) = {
    val sa = a.toVector.sorted
    val sb = b.toVector.sorted
    val (pa, pb) = (sa.take(P), sb.take(P))
    val pc = pa.toSet.intersect(pb.toSet).size.toLong
    val rest =
      if (pa.last <= pb.last) sa.size - math.min(P, sa.size)
      else sb.size - math.min(P, sb.size)
    val survives = (pc + rest) * 10 >= sa.size.toLong * 9
    (pc, survives)
  }

  property("never rejects a truly-contained pair (lossless)") =
    forAll(genPair) { case (a, b) =>
      val common = a.intersect(b).size.toLong
      val contained = common * 10 >= a.size.toLong * 9
      val (_, survives) = bound(a, b)
      Prop(!contained || survives) :| s"a=$a b=$b common=$common"
    }

  property("prefix intersect is EXACT below the min-prefix-max cut") =
    forAll(genPair) { case (a, b) =>
      val sa = a.toVector.sorted
      val sb = b.toVector.sorted
      val m = math.min(sa.take(P).last, sb.take(P).last)
      val below = a.intersect(b).count(_ <= m).toLong
      val (pc, _) = bound(a, b)
      Prop(pc == below) :| s"pc=$pc below=$below m=$m"
    }
}
