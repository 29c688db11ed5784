package graft.operators

import graft.{Registry, SparkSpec}

/** dd15 asymmetric near-containment: the quote/subset case. A short doc
  * whose text is pasted verbatim inside a much longer doc has high
  * containment (C(A→B) ≈ 1) but low Jaccard (|A|/|B|), so dd2 must miss
  * it and dd15 must catch it — and only in the A→B direction.
  */
class Dd15ContainmentSpec extends SparkSpec {

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private def corpus(docs: Seq[(Long, String)], name: String) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory(name).toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("a short doc inside a long one: containment catches it, Jaccard does not; direction is A->B only") {
    val short = words("s", 12)                      // 10 shingles
    val long = s"$short ${words("u", 40)}"          // contains all of A's
    val tmp = corpus(Seq(1L -> short, 2L -> long, 3L -> words("z", 30)), "dd15")

    val cont = Registry.queries("dd15_containment")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cont === Seq((1L, 2L))) // contained A -> container B, one direction

    val jac = Registry.queries("dd2_ngram_jaccard")(spark, tmp).count()
    assert(jac === 0L, "J = 10/50 = 0.2 must be below dd2's 0.8 gate")
  }

  test("near-identical docs emit both directions; unrelated docs emit nothing") {
    val a = words("a", 22)                 // 20 shingles
    val b = s"${words("a", 22)} extra1"    // 21 shingles, superset
    val tmp = corpus(Seq(1L -> a, 2L -> b, 3L -> words("z", 30)), "dd15b")
    val cont = Registry.queries("dd15_containment")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // C(1->2) = 20/20 = 1; C(2->1) = 20/21 ≈ 0.952 ≥ 0.9 → both emit
    assert(cont === Seq((1L, 2L, 20L, 20L), (2L, 1L, 20L, 21L)))
  }

  test("89% containment stays below the 90% gate") {
    // A: 19 shingles, 17 shared with B → C = 17/19 ≈ 0.894 < 0.9
    val shared = words("s", 19) // 17 shingles
    val a = s"$shared xx1 xx2"  // 19 shingles total, 2 unique tail
    val b = s"$shared ${words("u", 30)}"
    val tmp = corpus(Seq(1L -> a, 2L -> b, 3L -> words("z", 30)), "dd15c")
    val cont = Registry.queries("dd15_containment")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(!cont.contains((1L, 2L)))
  }

  test("fingerprint-first verify is lossless: bit-identical to brute force at sf0.001") {
    // the r9 prefix-bound pre-filter must drop only pairs that cannot
    // reach the 0.9 gate — compare the full operator against an inline
    // token-join brute force (the oracle's shape) on the real corpus
    import org.apache.spark.sql.functions._
    val d = sf("sf0.001")
    val sh = Dedup.shingleRows(spark, d)
      .select(col("doc_id"), col("s")).distinct()
    val n = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("common"))
      .join(n.select(col("doc_id").as("ida"), col("n").as("n_a")), "ida")
      .filter(col("common") * 10 >= col("n_a") * 9)
      .select("ida", "idb", "common", "n_a")
    val got = Registry.queries("dd15_containment")(spark, d)
      .select("ida", "idb", "common", "n_a")
    assert(got.count() > 0)
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
      "dd15 diverged from brute-force containment")
  }
}
