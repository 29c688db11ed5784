package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** streamingHeavyHitters: per-shard Misra–Gries state over a token
  * stream. The contract under test: after any number of micro-batches,
  * every term with global frequency > n/(capacity+1) appears in its
  * shard's latest candidate emission, and every emitted floor_count is
  * a lower bound on the term's true count. Run with a deliberately TINY
  * capacity (4) and a skewed vocabulary so the sketch is forced to
  * decrement — the guarantee must hold anyway.
  */
class StreamingHHSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("MG candidates cover all true heavy terms across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = ts("2024-01-01 00:00:00")
    // batch 1: "alpha" heavy, long tail; batch 2: "beta" surges
    val b1 = Seq.fill(30)("alpha") ++ (1 to 20).map(i => s"tail$i")
    val b2 = Seq.fill(40)("beta") ++ Seq.fill(10)("alpha") ++ (21 to 30).map(i => s"tail$i")
    val all = b1 ++ b2
    val capacity = 4

    val stream = MemoryStream[Streams.TokEv]
    val q = Streams.streamingHeavyHitters(stream.toDS(), capacity = capacity, shards = 2)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    try {
      stream.addData(b1.map(Streams.TokEv(_, t0)): _*)
      q.processAllAvailable()
      stream.addData(b2.map(Streams.TokEv(_, t0)): _*)
      q.processAllAvailable()
    } finally q.stop()

    // latest emission per (shard, term_hash): memory sink in update mode
    // appends each emission, so take the last row per key
    val rows = spark.table("hh").collect()
    val latest = rows.groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k._2 -> rs.last.getLong(2) }

    val trueCounts = all.groupBy(identity).map { case (t, occ) => t -> occ.size }
    val n = all.size
    val heavy = trueCounts.filter { case (_, c) => c.toLong * (capacity + 1) > n }
    assert(heavy.nonEmpty, "test corpus must contain heavy terms")
    heavy.foreach { case (term, c) =>
      val h = Streams.termHash(term)
      assert(latest.contains(h), s"heavy term $term (count $c) missing from candidates")
      assert(latest(h) <= c, s"floor_count ${latest(h)} exceeds true count $c for $term")
    }
  }
}
