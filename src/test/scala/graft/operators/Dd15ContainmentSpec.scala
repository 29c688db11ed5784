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
}
