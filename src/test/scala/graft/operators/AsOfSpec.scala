package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential test: the scalable union+window as-of join must agree
  * with the obvious-but-O(L·R) formulation (cross join per key, filter
  * to at-or-before, pick max (time, seq)) on randomized data, including
  * ties and no-match rows.
  */
class AsOfSpec extends SparkSpec {

  test("asOfJoin == brute-force range join on randomized keyed streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // deliberately collide timestamps (small domain) to exercise ties
    val left = (0 until 400).map { i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, 1000L + i) // key, t, seq
    }.toDF("k", "t", "seq")
    val right = (0 until 300).map { i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, i.toLong, rnd.nextInt(1000))
    }.toDF("k", "t", "seq", "v")

    val fast = AsOf.asOfJoin(left, right, key = "k", time = "t", seq = "seq",
      rightCols = Seq("seq", "v"))
      .select(col("k"), col("t"), col("seq"),
        col("matched.seq").as("m_seq"), col("matched.v").as("m_v"))

    // reference: all right rows at-or-before, keep max (t, seq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k", "t", "seq")
      .orderBy(col("rt").desc, col("rseq").desc)
    val ref = left.join(
      right.select(col("k"), col("t").as("rt"), col("seq").as("rseq"), col("v")),
      Seq("k"), "left")
      .filter(col("rt").isNull || col("rt") <= col("t"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("k"), col("t"), col("seq"),
        col("rseq").as("m_seq"), col("v").as("m_v"))
    // left rows whose every right row is in the future drop out of the
    // filtered join entirely — restore them with null matches
    val refFull = left.select("k", "t", "seq")
      .join(ref, Seq("k", "t", "seq"), "left")

    assert(fast.count() === left.count())
    assert(fast.exceptAll(refFull).count() === 0)
    assert(refFull.exceptAll(fast).count() === 0)
    // sanity: some matches and some no-matches both occurred
    assert(fast.filter(col("m_seq").isNotNull).count() > 0)
    assert(fast.filter(col("m_seq").isNull).count() > 0)
  }
}
