package graft.wistia

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** A6 watch-time: hand-computed cases against the executable spec, and a
  * randomized differential check spec ⇔ windowed (SURVEY §7.4 requires
  * both implementations to agree under strictly-increasing timestamps).
  */
class WatchTimeSpec extends SparkSpec {

  private def ts(s: String): Long =
    Timestamp.valueOf(s).getTime * 1000L // micros

  import WatchTime.Ev

  test("state machine: simple linear watch credits expected time") {
    // duration 100s, corrected mode (divisor=1): 0→0.5 over 40s credits
    // min(40, 0.5*100)=40; 0.5→0.8 over 10s credits min(10, 30)=10
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:00"), Some(0.0), None),
      Ev(ts("2025-01-01 00:00:10"), Some(0.5), None), // starts tracking (pct>0)
      Ev(ts("2025-01-01 00:00:50"), Some(0.8), None)) // credits min(40, 0.3*100)=30
    val total = WatchTime.run(evs, Some(100.0), scaleDivisor = 1.0)
    assert(math.abs(total - 30.0) < 1e-9)
  }

  test("state machine: faithful /100 quirk under-scales credit") {
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:10"), Some(0.5), None),
      Ev(ts("2025-01-01 00:00:50"), Some(0.8), None))
    // faithful: (0.3/100)*100 = 0.3s credited instead of 30s
    val total = WatchTime.run(evs, Some(100.0))
    assert(math.abs(total - 0.3) < 1e-9)
  }

  test("state machine: pause/end advance anchor without credit") {
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:00"), Some(0.1), None),
      Ev(ts("2025-01-01 00:00:10"), Some(0.5), Some("pause")), // no credit, anchor moves
      Ev(ts("2025-01-01 00:00:20"), Some(0.6), None)) // credits vs 0.5
    val total = WatchTime.run(evs, Some(100.0), scaleDivisor = 1.0)
    assert(math.abs(total - 10.0) < 1e-9) // min(10, 0.1*100)=10
  }

  test("state machine: percent decrease resets anchor, no credit") {
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:00"), Some(0.5), None),
      Ev(ts("2025-01-01 00:00:10"), Some(0.2), None), // seek back
      Ev(ts("2025-01-01 00:00:20"), Some(0.3), None)) // credits vs 0.2
    val total = WatchTime.run(evs, Some(100.0), scaleDivisor = 1.0)
    assert(math.abs(total - 10.0) < 1e-9)
  }

  test("state machine: no duration → zero; cap at duration") {
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:00"), Some(0.1), None),
      Ev(ts("2025-01-01 02:00:00"), Some(1.0), None))
    assert(WatchTime.run(evs, None) === 0.0)
    assert(WatchTime.run(evs, Some(0.0)) === 0.0)
    // corrected mode: credit min(7200, 0.9*50)=45, already below cap 50
    assert(WatchTime.run(evs, Some(50.0), scaleDivisor = 1.0) === 45.0)
  }

  test("state machine: events before first progress don't credit") {
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:00"), Some(0.0), None), // not started
      Ev(ts("2025-01-01 00:10:00"), Some(0.0), None), // still not started
      Ev(ts("2025-01-01 00:20:00"), Some(0.4), None), // starts here, no credit
      Ev(ts("2025-01-01 00:20:30"), Some(0.5), None)) // credits min(30, 10)=10
    val total = WatchTime.run(evs, Some(100.0), scaleDivisor = 1.0)
    assert(math.abs(total - 10.0) < 1e-9)
  }

  test("differential: windowed == spec on randomized strictly-increasing streams") {
    import scala.util.Random
    val rnd = new Random(42)
    val rows = (0 until 200).flatMap { g =>
      val media = s"m${g % 7}"
      val visitor = s"v${g % 23}"
      val day = 1 + (g % 3)
      val n = 1 + rnd.nextInt(8)
      var t = ts(f"2025-01-0$day 00:00:00") + rnd.nextInt(1000) * 1000000L
      (0 until n).map { _ =>
        t += (1 + rnd.nextInt(600)) * 1000000L // strictly increasing
        val pct = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(101) / 100.0)
        val name = rnd.nextInt(10) match {
          case 0 => Some("play"); case 1 => Some("pause"); case 2 => Some("end")
          case _ => None
        }
        (media, visitor, new Timestamp(t / 1000L), pct, name)
      }
    }
    val durations = (0 until 7).map(i => (s"m$i", if (i == 6) None else Some(i * 37.5 + 10)))

    import spark.implicits._
    val events = rows.toDF("media_id", "visitor_key", "received_at", "percent_viewed", "name")
    val durDf = durations.toDF("media_id", "duration")
    val joined = events.join(broadcast(durDf), Seq("media_id"), "left")

    for (divisor <- Seq(100.0, 1.0)) {
      val specOut = WatchTime.spec(joined, divisor)
        .withColumnRenamed("total_watch_time", "spec_wt")
      val winOut = WatchTime.windowed(joined, divisor)
        .withColumnRenamed("total_watch_time", "win_wt")
      val cmp = specOut.join(winOut, Seq("media_id", "visitor_id", "date"), "full")
        .withColumn("diff", abs(coalesce(col("spec_wt"), lit(-1)) -
          coalesce(col("win_wt"), lit(-2))))
      val bad = cmp.filter(col("diff") > 1e-9)
      assert(bad.count() === 0,
        s"divisor=$divisor mismatches: ${bad.collect().take(5).mkString("\n")}")
      assert(specOut.count() > 0)
    }
  }
}
