package graft.wistia

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import WatchTime.Ev

/** ScalaCheck invariants for the A6 watch-time state machine (pure
  * function — no SparkSession needed). SURVEY §5/§7.4: watch-time must
  * stay within [0, duration], within wall-clock span, be monotone in
  * event-prefix length, and the faithful /100 quirk can only shrink it.
  */
object WatchTimeProps extends Properties("WatchTime.run") {

  private val genEv: Gen[(Long, Option[Double], Option[String])] =
    for {
      gapUs <- Gen.chooseNum(1L, 3600L * 1000000L)
      pct <- Gen.option(Gen.chooseNum(0, 100).map(_ / 100.0))
      name <- Gen.frequency(
        7 -> Gen.const(None),
        1 -> Gen.const(Some("play")),
        1 -> Gen.const(Some("pause")),
        1 -> Gen.const(Some("end")))
    } yield (gapUs, pct, name)

  private val genStream: Gen[Seq[Ev]] =
    Gen.listOf(genEv).map { gaps =>
      var t = 0L
      gaps.map { case (gap, pct, name) => t += gap; Ev(t, pct, name) }
    }

  private val genDuration: Gen[Double] = Gen.chooseNum(1, 10000).map(_ / 10.0)

  property("total in [0, duration]") = forAll(genStream, genDuration) { (evs, dur) =>
    val t = WatchTime.run(evs, Some(dur), scaleDivisor = 1.0)
    t >= 0.0 && t <= dur
  }

  property("no/zero duration yields 0") = forAll(genStream) { evs =>
    WatchTime.run(evs, None) == 0.0 &&
    WatchTime.run(evs, Some(0.0)) == 0.0 &&
    WatchTime.run(evs, Some(-5.0)) == 0.0
  }

  property("total bounded by wall-clock span") = forAll(genStream, genDuration) {
    (evs, dur) =>
      val t = WatchTime.run(evs, Some(dur), scaleDivisor = 1.0)
      val spanSec =
        if (evs.size < 2) 0.0 else (evs.last.tsMicros - evs.head.tsMicros) / 1e6
      t <= spanSec + 1e-6
  }

  property("monotone in prefix length") = forAll(genStream, genDuration) { (evs, dur) =>
    val totals = evs.indices.map(i =>
      WatchTime.run(evs.take(i + 1), Some(dur), scaleDivisor = 1.0))
    Prop(totals.zip(totals.drop(1)).forall { case (a, b) => b >= a - 1e-9 })
  }

  property("faithful /100 mode never exceeds corrected mode") =
    forAll(genStream, genDuration) { (evs, dur) =>
      WatchTime.run(evs, Some(dur), scaleDivisor = 100.0) <=
        WatchTime.run(evs, Some(dur), scaleDivisor = 1.0) + 1e-9
    }
}
