package graft.operators

import graft.{Registry, SparkSpec}

/** Differential armor for dd13/dd14: on seeded random corpora (small
  * vocab → organic gram collisions, plus explicit splice-dups), the
  * distributed plans must equal a direct in-JVM reference
  * implementation of the same semantics — repeated-gram detection,
  * maximal-island merge, and residual reassembly.
  */
class Dd13DifferentialSpec extends SparkSpec {

  private val W = 8

  /** Reference: maximal repeated spans per doc (cross-doc W-grams). */
  private def refSpans(docs: Seq[(Long, Array[String])]): Seq[(Long, Long, Long, Long)] = {
    val owners = scala.collection.mutable.Map.empty[Seq[String], scala.collection.mutable.Set[Long]]
    for ((id, toks) <- docs; i <- 0 to toks.length - W)
      owners.getOrElseUpdate(toks.slice(i, i + W).toSeq,
        scala.collection.mutable.Set.empty) += id
    docs.sortBy(_._1).flatMap { case (id, toks) =>
      val rep = (0 to toks.length - W)
        .filter(i => owners(toks.slice(i, i + W).toSeq).exists(_ != id))
      val islands = rep.foldLeft(List.empty[List[Int]]) {
        case (acc, i) if acc.nonEmpty && acc.head.head == i - 1 =>
          (i :: acc.head) :: acc.tail
        case (acc, i) => List(i) :: acc
      }.reverse.map(_.reverse)
      islands.map(run =>
        (id, run.head.toLong, (run.last + W - 1).toLong,
          (run.last - run.head + W).toLong))
    }
  }

  /** Reference: residual text after cutting every repeated span. */
  private def refResidual(docs: Seq[(Long, Array[String])]): Seq[(Long, String, Long, Long)] = {
    val spans = refSpans(docs).groupBy(_._1)
    docs.sortBy(_._1).map { case (id, toks) =>
      val cut = Array.fill(toks.length)(false)
      spans.getOrElse(id, Nil).foreach { case (_, s, e, _) =>
        (s.toInt to e.toInt).foreach(cut(_) = true)
      }
      val keptToks = toks.indices.filterNot(cut).map(toks)
      (id, keptToks.mkString(" "), toks.length.toLong,
        (toks.length - keptToks.length).toLong)
    }
  }

  private def corpus(seed: Int): Seq[(Long, Array[String])] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 20).map(i => s"w$i")
    val base = (0L until 12L).map { id =>
      id -> Array.fill(rnd.between(1, 30))(vocab(rnd.nextInt(vocab.size)))
    }
    // splice-dups: doc 12 = tail of doc 0 + head of doc 1 (guaranteed
    // long shared runs when the sources are long enough)
    val d0 = base(0)._2; val d1 = base(1)._2
    base :+ (12L -> (d0.takeRight(10) ++ d1.take(10)))
  }

  test("dd13/dd14 equal the in-JVM reference on 8 seeded random corpora") {
    import spark.implicits._
    for (seed <- 1 to 8) {
      val docs = corpus(seed)
      val tmp = java.nio.file.Files.createTempDirectory(s"dd13diff$seed").toString
      docs.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")

      val gotSpans = Registry.queries("dd13_substring_dedup")(spark, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(gotSpans === refSpans(docs), s"dd13 diverged on seed $seed")

      val gotRes = Registry.queries("dd14_residual_corpus")(spark, tmp)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      assert(gotRes === refResidual(docs), s"dd14 diverged on seed $seed")
    }
  }
}
