package graft.operators

/** Structural invariants for the graph family (value-level correctness
  * is the DuckDB oracle's job — gr1/gr2 are hash-compared there):
  * PageRank must keep one row per node with the damping floor as a hard
  * lower bound, and the clustering coefficient is bounded by definition
  * (3·triangles ≤ wedges — every triangle closes exactly 3 wedges).
  */
class GraphOpsSpec extends graft.SparkSpec {

  test("gr1: one row per node, every rank at or above the damping floor") {
    val df = graft.SparkEntry.queries("gr1_pagerank")(spark, sf("sf0.001")).cache()
    val n = df.count()
    assert(n > 0)
    assert(df.select("node_type", "node_key").distinct().count() == n)
    assert(df.filter(org.apache.spark.sql.functions.col("rank_ppm") < 150000L).count() == 0)
  }

  test("gr3: mode propagation separates bridged cliques that CC would merge") {
    // two 4-cliques bridged by one edge: every basket is an order; make
    // each clique edge weight 2 (two shared orders) so the w>=2 gate
    // keeps them, and the bridge weight 2 as well — LPA must still
    // split the cliques (the bridge is outvoted by 3 intra-clique
    // neighbors) while connected components would collapse all 8 nodes.
    import spark.implicits._
    val cliqueA = Seq(1L, 2L, 3L, 4L)
    val cliqueB = Seq(11L, 12L, 13L, 14L)
    def orders(parts: Seq[Long], base: Long) =
      Seq.fill(2)(parts).zipWithIndex.flatMap { case (ps, i) =>
        ps.map(p => (base + i, p))
      }
    val bridge = Seq.tabulate(2)(i => Seq((900L + i, 4L), (900L + i, 11L))).flatten
    val rows = orders(cliqueA, 100L) ++ orders(cliqueB, 200L) ++ bridge
    val tmp = java.nio.file.Files.createTempDirectory("gr3").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val lab = graft.SparkEntry.queries("gr3_lpa_communities")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cliqueA.map(lab).distinct.size == 1, s"clique A split: $lab")
    assert(cliqueB.map(lab).distinct.size == 1, s"clique B split: $lab")
    assert(lab(1L) != lab(11L), s"bridged cliques merged: $lab")
  }

  test("gr2: single row, 3*triangles <= wedges, clustering in [0, 1e6]") {
    val r = graft.SparkEntry.queries("gr2_triangles")(spark, sf("sf0.001")).collect()
    assert(r.length == 1)
    val row = r.head
    val tri = row.getAs[Long]("n_triangles")
    val wedges = row.getAs[Long]("n_wedges")
    val c = row.getAs[Long]("clustering_ppm")
    assert(3L * tri <= wedges || wedges == 0L)
    assert(c >= 0L && c <= 1000000L)
  }
}
