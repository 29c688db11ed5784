package graft.operators

import graft.SparkSpec

/** mix3_dsir_importance: the hashed-n-gram importance selection must
  * (a) keep exactly the top ⌈R/5⌉ of the raw pool, (b) rank docs that
  * speak the target domain's language above mixed and junk docs, and
  * (c) stay well-defined when a doc's buckets never occur in the target
  * sample (Laplace smoothing).
  */
class Mix3DsirSpec extends SparkSpec {

  private val tgtText = "alpha beta gamma alpha beta gamma alpha beta gamma"
  private val junk = (1 to 9).map(i => s"zz$i").mkString(" ")
  private val mixed = "alpha beta zz1 zz2 alpha beta gamma zz3 zz4"

  private def docs(rows: Seq[(Long, String, String)]) =
    spark.createDataFrame(rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("mix3: selection is the top fifth and it is the target-like docs") {
    val rows =
      (0L to 4L).map(i => (i, tgtText, "src0")) ++
        (10L to 14L).map(i => (i, tgtText, "src1")) ++ // target-like raw
        (20L to 24L).map(i => (i, mixed, "src1")) ++ // half-target raw
        (30L to 39L).map(i => (i, junk, "src2")) // junk raw
    val out = TrainPrep.dsirSelect(docs(rows), "src0").collect()
    // raw pool = 20 docs → keep ⌈20/5⌉ = 4, all from the target-like band
    assert(out.length === 4)
    assert(out.map(_.getLong(1)).forall(id => id >= 10L && id <= 14L))
    // ranks dense 1..4, scores non-increasing down the ranking
    assert(out.map(_.getLong(0)).toSeq === (1L to 4L))
    val scores = out.map(_.getLong(3)).toSeq
    assert(scores === scores.sorted(Ordering[Long].reverse))
  }

  test("mix3: a half-target doc outranks pure junk") {
    val rows = Seq((0L, tgtText, "src0"), (1L, mixed, "src1")) ++
      (2L to 5L).map(i => (i, junk, "src2"))
    // raw pool = 5 → k = 1; the mixed doc must win over the four junk docs
    val out = TrainPrep.dsirSelect(docs(rows), "src0").collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 1L)
  }

  test("mix3: an ABSENT target source still yields Laplace-floor scores, not nulls") {
    // sum over an empty bucket table is NULL in Spark where the oracle
    // counts 0 — the coalesce in dsirSelect is load-bearing
    val rows = (1L to 5L).map(i => (i, junk, "src2"))
    val out = TrainPrep.dsirSelect(docs(rows), "srcMissing").collect()
    assert(out.length === 1)
    assert(!out.head.isNullAt(3) && out.head.getLong(3) > 0L)
    assert(out.head.getLong(1) === 1L)
  }

  test("mix4: the stored+batch merge equals a JVM rebuild, batch-only buckets included") {
    // doc 3 (3 % 7 = 3) is tonight's batch and carries vocabulary the
    // stored docs never saw — its buckets must appear in the merged
    // table with exact counts and Laplace-floor-consistent weights
    val rows = Seq(
      (1L, "alpha beta alpha", "src0"), // stored target
      (2L, "beta gamma", "src1"), // stored raw
      (3L, "zeta zeta eta", "src1")) // batch raw, unseen vocab
    val tmp = java.nio.file.Files.createTempDirectory("mix4").toString
    docs(rows).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.Registry.queries("mix4_incremental_dsir")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // JVM twin: same md5-60-bit bucket hash, full-corpus recount
    def bucket(f: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 128L
    }
    def feats(text: String): Seq[String] = {
      val t = text.split(" ").toSeq
      t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val all = rows.flatMap { case (_, text, src) =>
      feats(text).map(f => (bucket(f), src == "src0"))
    }
    val tn = all.count(_._2).toLong
    val cn = all.size.toLong - tn
    val expected = all.groupBy(_._1).map { case (b, fs) =>
      val tc = fs.count(_._2).toLong
      val cc = fs.size.toLong - tc
      val w = ((tc + 1) * 1000000000L / (tn + 128)) * 1000000L /
        math.max(1L, (cc + 1) * 1000000000L / (cn + 128))
      b -> ((tc, cc, w))
    }
    assert(got === expected)
    // the batch-only vocab's buckets really are new vs the stored docs
    val storedB = rows.take(2).flatMap(r => feats(r._2)).map(bucket).toSet
    assert(feats(rows(2)._2).map(bucket).exists(b => !storedB(b)))
  }

  test("mix3: smoothing keeps junk-only corpora well-defined and ranked") {
    // no raw doc shares a single feature with the target: every bucket
    // weight falls back to the Laplace floor, scores stay positive, and
    // the tie-break is doc_id order
    val rows = Seq((0L, tgtText, "src0")) ++
      (1L to 5L).map(i => (i, junk, "src2"))
    val out = TrainPrep.dsirSelect(docs(rows), "src0").collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 1L) // identical scores → lowest doc_id
    assert(out.head.getLong(3) > 0L)
  }
}
