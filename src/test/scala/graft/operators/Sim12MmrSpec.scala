package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.Registry

/** sim12 MMR diverse selection: the greedy 2·rel − maxsim rule must
  * break the pure-relevance order when the top candidates are mutual
  * near-duplicates.
  *
  * Geometry (64-dim, only first 3 dims used): query q = x̂;
  *   id 1 (A) = (0.9, 0.436, 0)  rel ≈ 0.90
  *   id 2 (B) = A exactly        rel ≈ 0.90, sim(B,A) = 1
  *   id 3 (C) = (0.9, −0.436, 0) rel ≈ 0.90, sim(C,A) ≈ 0.62
  *   id 4 (D) = ẑ                rel = 0
  * Pure top-k order is (1, 2, 3, 4) (tie → lowest id). MMR round 2:
  * score(B) = 2·0.9 − 1.0 = 0.8 but score(C) = 2·0.9 − 0.62 = 1.18, so
  * C jumps the exact duplicate B → MMR order (1, 3, 2, 4). With only 4
  * candidates and k=10 the operator must emit exactly 4 rows (the
  * empty-argmax guard).
  */
class Sim12MmrSpec extends graft.SparkSpec {

  test("MMR demotes the near-duplicate; emits min(k, n) rows") {
    val dim = 64
    def vec(parts: (Int, Double)*): Array[Float] = {
      val a = Array.fill(dim)(0.0f)
      parts.foreach { case (i, x) => a(i) = x.toFloat }
      a
    }
    val rows = Seq(
      Row(0L, vec(0 -> 1.0).toSeq, 0),
      Row(1L, vec(0 -> 0.9, 1 -> 0.436).toSeq, 0),
      Row(2L, vec(0 -> 0.9, 1 -> 0.436).toSeq, 0),
      Row(3L, vec(0 -> 0.9, 1 -> -0.436).toSeq, 0),
      Row(4L, vec(2 -> 1.0).toSeq, 0))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val tmp = java.nio.file.Files.createTempDirectory("sim12").toString
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schema)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val got = Registry.queries("sim12_mmr_select")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq(1L -> 1L, 2L -> 3L, 3L -> 2L, 4L -> 4L),
      s"MMR selection order wrong: ${got.toSeq}")
  }
}
