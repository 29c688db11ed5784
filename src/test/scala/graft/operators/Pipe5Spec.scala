package graft.operators

import org.apache.spark.sql.functions._

/** pipe5 incremental-chunk contract: the emitted rows must be EXACTLY
  * what a full per-shard rebuild (store tokens in (hkey, doc_id) order,
  * then pipe3's accepted batch in pos order) would produce for chunk ids
  * at/after each shard's open chunk — nothing below the open chunk
  * (those chunks are immutable), nothing for untouched shards, and the
  * open-chunk rewrite's digest must cover the stored tail tokens
  * bit-for-bit. Reference computed in plain Scala from the corpus.
  */
class Pipe5Spec extends graft.SparkSpec {

  test("pipe5 chunks equal the full-rebuild chunks at/after each touched shard's open chunk") {
    val d = sf("sf0.001")
    val B = TrainPrep.packBudget
    val got = graft.SparkEntry.queries("pipe5_incremental_chunks")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_docs"),
          r.getAs[String]("chunk_md5"), r.getAs[Long]("n_seqs"),
          r.getAs[String]("seq_starts_csv"), r.getAs[Boolean]("is_full"))))
      .toMap
    assert(got.nonEmpty)

    // corpus + gates in plain Scala (pipe3's predicates)
    val all = graft.Tables.documents(spark, d)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[Long]("n_chars")))
    def gated(id: Long, text: String, nc: Long): Boolean =
      text.split(" ", -1).length >= 10 &&
        2L * text.count(c => c >= 'a' && c <= 'z') > nc &&
        id % 10L != 0L
    val textOf = all.map(t => t._1 -> t._2).toMap
    val hk = (id: Long) => graft.streaming.Streams.termHash(s"$id:42")
    val storeDocs = all.filter(t => gated(t._1, t._2, t._3) && t._1 % 7 != 3)
      .map(t => (t._1, java.lang.Math.floorMod(hk(t._1), 8L)))
    val batchMan = graft.SparkEntry.queries("pipe3_incremental_prep")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos")))
    val touched = batchMan.map(_._2).toSet
    assert(touched.nonEmpty)

    val expect = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long, String, Long, String, Boolean)]
    // store-side open chunk per shard, computed INDEPENDENTLY of the
    // engine output (the immutability frontier the engine must respect)
    val openByShard = scala.collection.mutable.Map.empty[Long, Long]
    // does some emitted open-chunk rewrite actually carry stored tokens?
    var storedTokenRewrite = false
    touched.foreach { shard =>
      // full rebuild: store docs by (hkey, doc_id), then batch docs by pos
      val storeSeq = storeDocs.filter(_._2 == shard).map(_._1)
        .sortBy(id => (hk(id), id))
      val batchSeq = batchMan.filter(_._2 == shard).sortBy(_._3).map(_._1)
      val docs = storeSeq ++ batchSeq
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var off = 0L
      docs.foreach { id =>
        val n = textOf(id).split(" ", -1).length.toLong
        spans += ((id, off, off + n)); off += n
      }
      val tot0 = storeSeq.map(id => textOf(id).split(" ", -1).length.toLong).sum
      val openChunk = tot0 / B
      openByShard(shard) = openChunk
      if (tot0 % B != 0) storedTokenRewrite = true // open chunk holds stored tokens
      // token stream restricted to chunks >= openChunk
      val toks = docs.iterator.flatMap(id =>
        textOf(id).split(" ", -1).iterator.map(t => (id, t))).toArray
      toks.zipWithIndex
        .filter { case (_, pos) => pos / B >= openChunk }
        .groupBy { case (_, pos) => pos / B }
        .foreach { case (c, rows) =>
          val nTok = rows.length.toLong
          val nDocs = rows.map(_._1._1).distinct.length.toLong
          val md5 = org.apache.commons.codec.digest.DigestUtils
            .md5Hex(rows.map(_._1._2).mkString(" "))
          val ss = spans
            .filter { case (_, s0, e0) => s0 < (c + 1) * B && e0 > c * B }
            .map { case (_, s0, _) => math.max(s0, c * B) - c * B }
            .sorted
          expect((shard, c)) = (nTok, nDocs, md5, ss.length.toLong,
            ss.mkString(","), nTok == B)
        }
    }
    assert(got.keySet === expect.keySet,
      s"chunk keys differ: extra=${got.keySet -- expect.keySet} missing=${expect.keySet -- got.keySet}")
    expect.foreach { case (k, v) =>
      assert(got(k) === v, s"chunk $k mismatch: got=${got(k)} want=$v")
    }
    // immutability vs the INDEPENDENTLY computed store frontier: nothing
    // below any touched shard's open chunk, and every touched shard's
    // emission starts exactly AT its open chunk (the rewrite happens)
    got.keys.foreach { case (s0, c0) => assert(c0 >= openByShard(s0),
      s"emitted chunk ($s0, $c0) below the immutable frontier ${openByShard(s0)}") }
    touched.foreach { s0 =>
      val emitted = got.keys.filter(_._1 == s0).map(_._2)
      assert(emitted.nonEmpty && emitted.min == openByShard(s0),
        s"shard $s0 must start emission at its open chunk ${openByShard(s0)}, got ${emitted.toSeq.sorted}")
    }
    // the corpus must actually exercise the stored-tail rewrite (a corpus
    // where every shard's store ends on a chunk boundary would leave the
    // boundary-doc path untested — fail loudly instead of silently)
    assert(storedTokenRewrite,
      "no shard's open chunk carries stored tokens — boundary path untested")
  }
}
