package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Skew-handling primitives. Hash aggregation already partial-aggregates
  * map-side, but a pathologically hot key can still bottleneck its single
  * reducer once per-key state is large (collect_list-like aggs) or AQE
  * skew handling is unavailable; the classic fix is two-phase salting:
  * spread each key over `salts` sub-keys, aggregate, then combine.
  * Results are salt-invariant for any algebraic aggregate, which is what
  * the oracle checks.
  *
  * 100 TB note: q24 uses l_returnflag (3 values across 600M+ rows at
  * real TPC-H scale — maximal key skew); the salted plan's first shuffle
  * spreads each flag over 16 reducers, the second moves 48 rows total.
  */
object Skew {

  /** Two-phase salted sum: groupBy(keys :+ salt) → groupBy(keys).
    * `salt` defaults to a deterministic row spreader (id column mod
    * salts) so plans stay replayable; any row→[0,salts) map works.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], sums: Seq[(String, Column)],
      saltCol: Column, salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(saltCol, lit(salts)))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sums.head._2.as(sums.head._1),
        sums.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sums.head._1)).as(sums.head._1),
        sums.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
  }

  // ---------------------------------------------------------------------
  // q24_salted_agg — salted two-phase aggregation over the most skewed
  // key in the corpus (l_returnflag: 3 values). The oracle is the plain
  // single-phase GROUP BY — salting must be invisible in the result.
  private def q24SaltedAgg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    saltedSum(li,
      keys = Seq("l_returnflag"),
      sums = Seq(
        "qty_cents" -> sum(Relational.cents(col("l_quantity"))),
        "price_cents" -> sum(Relational.cents(col("l_extendedprice"))),
        "n" -> count(lit(1))),
      saltCol = col("l_orderkey"))
      .orderBy("l_returnflag")
  }

  private val q24Sql =
    s"""SELECT l_returnflag,
       | CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS qty_cents,
       | CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS price_cents,
       | COUNT(*) AS n
       |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q24_salted_agg", q24SaltedAgg, Some(q24Sql)))
}
