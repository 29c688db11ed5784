package graft.operators

/** sim13 (ANN-candidated MMR) vs sim12 (exhaustive-candidate MMR):
  * value-level correctness of each is the DuckDB oracle's job; what this
  * pins is that the ANN candidate stage preserves SELECTION QUALITY.
  * Raw pick overlap is a deliberately loose bound — MMR is a greedy
  * chain, so one ANN-missed candidate early can legitimately reroute
  * every later pick (measured: 6/10 at sf0.001, 3/10 at sf0.01) — while
  * the stable invariants are strict: the rank-1 pick is pure relevance
  * (no chain effect), so ANN must find the true argmax; and the selected
  * set's mean relevance must stay close to exhaustive (measured 0.976 at
  * sf0.001, 0.879 at sf0.01).
  */
class Sim13MmrAnnSpec extends graft.SparkSpec {

  test("sim13 matches sim12's rank-1 pick and holds selection quality at sf0.001") {
    val exhaustive = graft.SparkEntry.queries("sim12_mmr_select")(spark, sf("sf0.001"))
      .orderBy("rank").collect()
    val ann = graft.SparkEntry.queries("sim13_mmr_ann")(spark, sf("sf0.001"))
      .orderBy("rank").collect()
    assert(ann.length == 10)
    assert(ann.map(_.getLong(1)).distinct.length == 10, "picks must be distinct")
    // rank 1 is pure relevance — the ANN probe must surface the true argmax
    assert(ann.head.getLong(1) == exhaustive.head.getLong(1),
      s"rank-1 diverged: ann=${ann.head.getLong(1)} exhaustive=${exhaustive.head.getLong(1)}")
    val overlap = ann.map(_.getLong(1)).toSet
      .intersect(exhaustive.map(_.getLong(1)).toSet).size
    assert(overlap >= 4, s"pick overlap $overlap/10 below floor 4")
    val meanRel = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(_.getLong(2)).sum.toDouble / rs.length
    val ratio = meanRel(ann) / meanRel(exhaustive)
    assert(ratio >= 0.8, f"mean-relevance ratio $ratio%.3f below floor 0.8")
  }
}
