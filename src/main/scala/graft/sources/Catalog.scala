package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Idempotent catalog DDL — the engine-shaped equivalent of the
  * reference's conflict-tolerant dataset/table bootstrap
  * (`create_bigquery_tables`, process_wistia_data_v2.py:88-128:
  * `exists_ok=True` on the dataset, "Already Exists" swallowed per
  * table). Every operation is safe to re-run; existing objects are never
  * altered or dropped.
  *
  * Scale: DDL is metadata-only against the session catalog (Hive
  * metastore / Unity / Glue on a real cluster); appends by table NAME
  * resolve columns case-insensitively and keep partition and bucket
  * specs, so the exchange-free bucketed-join property of
  * [[RawZone.warehouseBucketed]] stays reachable from the lifecycle.
  */
object Catalog {

  /** ≙ create_dataset(exists_ok=True). Optional explicit location (tests
    * point this at a temp dir; clusters use the metastore default).
    */
  def ensureDatabase(spark: SparkSession, db: String,
      location: Option[String] = None): Unit = {
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`$loc")
  }

  /** ≙ create_table swallowing "Already Exists": CREATE TABLE IF NOT
    * EXISTS with an explicit schema, optionally partitioned (fact
    * tables: by date — the reference's own schema comments,
    * process_wistia_data_v2.py:81-83) or bucketed (CLUSTERED BY) for
    * shuffle-free co-located joins.
    */
  def ensureTable(spark: SparkSession, table: String, schema: StructType,
      partitionBy: Seq[String] = Nil,
      bucketBy: Option[(Seq[String], Int)] = None): Unit = {
    val part =
      if (partitionBy.nonEmpty) s" PARTITIONED BY (${partitionBy.mkString(", ")})"
      else ""
    val buck = bucketBy.map { case (cols, n) =>
      s" CLUSTERED BY (${cols.mkString(", ")}) INTO $n BUCKETS"
    }.getOrElse("")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table (${schema.toDDL}) USING PARQUET$part$buck")
  }

  /** K4 against the catalog: APPEND by table name (by-name column
    * resolution — never positional, so the catalog's
    * partition-columns-last reordering can't mis-slot values). Spark's
    * writer contract requires restating the partition spec of a
    * partitioned table.
    */
  def append(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append).format("parquet")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).saveAsTable(table)
  }

  /** Append into a CLUSTERED BY table — the writer must restate the
    * bucket spec (Spark's bucketed-write contract).
    */
  def appendBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet").saveAsTable(table)

  /** [[RawZone.warehouseMerge]] against the catalog: keyed
    * first-write-wins upsert-by-insert by table NAME — append only
    * incoming rows whose natural key is absent, so a re-run converges
    * (the idiomatic T3 fix for catalog-managed warehouses). Same scan
    * economics as the path version: the existing-keys read selects only
    * the key columns, and when the table's partition columns are a
    * subset of the key it is filtered to the batch's touched partitions
    * (metastore partition pruning). MERGE-with-update stays out of scope
    * deliberately — plain parquet tables have no transactional row
    * rewrite; first-write-wins insert is the strongest idempotency a
    * file-format warehouse offers without a table format like
    * Delta/Iceberg, and it is exactly what re-run convergence needs.
    */
  def mergeAppend(spark: SparkSession, df: DataFrame, table: String,
      keys: Seq[String], partitionBy: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "mergeAppend needs a natural key")
    val cols = df.columns.toSeq
    val deduped = df
      .groupBy(keys.map(col): _*)
      .agg(min(struct(cols.map(col): _*)).as("_row"))
      .select(col("_row.*"))
      .select(cols.map(col): _*)
    if (!spark.catalog.tableExists(table)) append(deduped, table, partitionBy)
    else {
      val existing = spark.table(table)
      val pruned =
        if (partitionBy.nonEmpty && partitionBy.forall(keys.contains)) {
          val touched = deduped.select(partitionBy.map(col): _*).distinct()
            .collect().toSeq // bounded: one row per touched partition
          if (touched.isEmpty) existing.limit(0)
          else existing.filter(
            touched.map(r => partitionBy.zipWithIndex.map {
              case (c, i) => col(c) === lit(r.get(i))
            }.reduce(_ && _)).reduce(_ || _))
        } else existing
      val fresh = deduped.join(
        pruned.select(keys.map(col): _*).distinct(), keys, "left_anti")
      append(fresh, table, partitionBy)
    }
  }

  /** K5 against the catalog: TRUNCATE + reload (the prod variant's
    * dim_media refresh policy, process_wistia_data.py:197-234) — the
    * table object, its schema, and its grants survive, unlike a
    * drop-and-recreate overwrite.
    */
  def truncateReload(spark: SparkSession, df: DataFrame, table: String): Unit = {
    spark.sql(s"TRUNCATE TABLE $table")
    append(df, table)
  }
}
