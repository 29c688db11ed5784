package graft.operators

import org.apache.spark.sql.functions._

/** t17 (and the dd2-family caveat class) compares tokens by xxhash64 in
  * Spark but by string in the DuckDB oracle, so a single vocab hash
  * collision would silently diverge the two engines. This pins the
  * assumption the equivalence rests on: xxhash64 is injective over the
  * corpus vocabulary at the verified scale factors. A 64-bit hash over a
  * vocab of |V| words collides with probability ~|V|²/2⁶⁵ (birthday
  * bound: |V|=10⁶ → ~3·10⁻⁸), so a failure here means either a corpus
  * regeneration exploded the vocab or the hash changed — both worth a
  * loud stop.
  */
class VocabHashSpec extends graft.SparkSpec {

  private def collisionFree(dir: String): Unit = {
    val vocab = graft.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1) // full vocab, superset of t17's >=4 filter
      .select(col("w")).distinct()
    val Array(words, hashes) = vocab
      .agg(count(lit(1)), countDistinct(xxhash64(col("w"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    assert(words == hashes,
      s"xxhash64 collision inside corpus vocab at $dir: $words words -> $hashes hashes")
  }

  test("xxhash64 is collision-free over the sf0.001 corpus vocab") {
    collisionFree(sf("sf0.001"))
  }

  test("xxhash64 is collision-free over the sf0.01 corpus vocab") {
    collisionFree(sf("sf0.01"))
  }
}
