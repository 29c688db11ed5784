package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The prefix-filtered dd2 must emit exactly the pairs of the naive
  * full inverted-index formulation (completeness of the prefix-filter
  * candidate generation is a theorem — this checks the implementation).
  */
class Dd2PrefixFilterSpec extends SparkSpec {

  /** The pre-optimization formulation: full shared-token join. */
  private def naive(s: SparkSession, d: String): DataFrame = {
    val sh = graft.Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 3)).as("i"))
      .select(col("doc_id"), xxhash64(concat_ws(" ",
        element_at(col("toks"), col("i") + 1),
        element_at(col("toks"), col("i") + 2),
        element_at(col("toks"), col("i") + 3))).as("h"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("ida"), col("h"))
    val b = sh.select(col("doc_id").as("idb"), col("h"))
    a.join(b, Seq("h")).filter(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("ida"), col("n").as("na")), "ida")
      .join(sizes.select(col("doc_id").as("idb"), col("n").as("nb")), "idb")
      .withColumn("uni", col("na") + col("nb") - col("common"))
      .filter(col("common") * 10L >= col("uni") * 8L)
      .select("ida", "idb", "common", "uni")
  }

  test("prefix-filtered dd2 == naive inverted-index dd2 at sf0.01") {
    val fast = graft.SparkEntry.queries("dd2_ngram_jaccard")(spark, sf("sf0.01"))
    val ref = naive(spark, sf("sf0.01"))
    assert(fast.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(fast).count() === 0)
    assert(fast.count() > 0)
  }
}
