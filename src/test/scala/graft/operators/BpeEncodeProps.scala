package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.BpeEncode
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck differential for the single-pass BPE encode expression
  * (pure expression eval — no SparkSession): random token sequences and
  * random (possibly chaining) merge tables against an INDEPENDENT
  * implementation of the window-algebra specification — candidates =
  * adjacent (lhs, rhs) positions, runs isolated gaps-and-islands style,
  * the even offsets of each run merged. The expression scans greedily
  * left-to-right instead; these must coincide on every input, which is
  * exactly the equivalence BpeEncodeSpec pins on the corpus and this
  * suite pins on the adversarial space (long self-merge runs from the
  * tiny vocabulary, merges consuming earlier merges' outputs).
  */
object BpeEncodeProps extends Properties("BpeEncode") {

  /** The window-algebra reference: one merge round per table entry —
    * candidates grouped into runs of consecutive positions
    * (gaps-and-islands), the even offsets of each run selected, the
    * selected position consuming its successor.
    */
  private def mergeOnceSpec(cur: Vector[String], a: String,
      b: String): Vector[String] = {
    val cands = cur.indices.dropRight(1)
      .filter(i => cur(i) == a && cur(i + 1) == b)
    val runs = cands.foldLeft(List.empty[List[Int]]) {
      case (acc, i) if acc.nonEmpty && acc.head.head == i - 1 =>
        (i :: acc.head) :: acc.tail
      case (acc, i) => List(i) :: acc
    }.map(_.reverse)
    val selected = (for {
      run <- runs
      (i, off) <- run.zipWithIndex if off % 2 == 0
    } yield i).toSet
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < cur.length) {
      if (selected.contains(i)) { out += s"$a $b"; i += 2 }
      else { out += cur(i); i += 1 }
    }
    out.result()
  }

  private def refEncode(tokens: Vector[String],
      merges: List[(String, String)]): Vector[String] =
    merges.foldLeft(tokens) { case (cur, (a, b)) => mergeOnceSpec(cur, a, b) }

  private def exprEncode(tokens: Vector[String],
      merges: List[(String, String)]): Vector[String] = {
    val lit = Literal.create(tokens, ArrayType(StringType))
    val out = BpeEncode(lit, merges).eval(null).asInstanceOf[ArrayData]
    (0 until out.numElements())
      .map(i => out.getUTF8String(i).toString).toVector
  }

  // tiny vocabulary forces long self-merge runs and candidate collisions
  private val tok: Gen[String] = Gen.oneOf("a", "b", "c")
  private val genTokens: Gen[Vector[String]] =
    Gen.containerOf[Vector, String](tok)
  // merges over the vocab, plus chained entries built from earlier
  // merges' output tokens
  private val genMerges: Gen[List[(String, String)]] = for {
    base <- Gen.listOfN(3, Gen.zip(tok, tok))
    chain <- Gen.oneOf(true, false)
  } yield {
    val b = base.distinct
    if (chain && b.nonEmpty) {
      val m0 = b.head
      b :+ ((s"${m0._1} ${m0._2}", s"${m0._1} ${m0._2}"))
    } else b
  }

  property("greedy scan == window-algebra selection on random inputs") =
    forAll(genTokens, genMerges) { (toks, merges) =>
      exprEncode(toks, merges) == refEncode(toks, merges)
    }

  property("null elements pass through untouched") =
    forAll(genTokens) { toks =>
      val withNulls: Seq[String] =
        toks.flatMap(t => Seq(t, null.asInstanceOf[String]))
      val lit = Literal.create(withNulls, ArrayType(StringType))
      val out = BpeEncode(lit, List(("a", "a"), ("a", "b"))).eval(null)
        .asInstanceOf[ArrayData]
      // nulls break every adjacency, so nothing merges and every
      // element (incl. the nulls) survives in order
      out.numElements() == withNulls.length &&
        (0 until out.numElements()).forall { i =>
          (out.isNullAt(i) && withNulls(i) == null) ||
            (!out.isNullAt(i) && out.getUTF8String(i).toString == withNulls(i))
        }
    }
}
