package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output sinks. The reference writes TSV/text exports to GCS buckets
  * (TextIO in ConceptAnnotationExportPipeline, SentenceTsvBuilderFn output,
  * BigQuery load files); Spark-first those become columnar parquet (the
  * default interchange), partitioned layouts for partition-pruned reads at
  * scale, and TSV/JSONL for the reference's text-shaped consumers.
  */
object Sinks {

  /** Columnar parquet, optionally hash-partitioned by columns — the layout
    * that makes downstream scans partition-prunable at 100 TB. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** TSV (header, tab-delimited) — the reference's export interchange shape. */
  def tsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true").csv(path)

  /** JSON Lines — the Elasticsearch bulk-load shape
    * (ElasticsearchLoadPipeline's document stream). */
  def jsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the alternate columnar interchange (predicate pushdown + column
    * pruning like parquet; some warehouse stacks are ORC-native). */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** JDBC sink — the reference's ClassifiedSentenceStoragePipeline.java
    * writes scored sentences to CloudSQL/MySQL over JDBC; this is the same
    * path through Spark's JDBC writer (per-partition executor-side
    * connections, batched inserts, dialect-mapped DDL). Tested against
    * embedded Derby (the driver Spark ships for its metastore); a cluster
    * deployment passes a server URL (mysql/postgres) instead — embedded
    * Derby is single-JVM by design. `numPartitions` caps the writer's
    * connection fan-in so a 1000-executor run can't open 1000 sessions
    * against one database. */
  def jdbc(df: DataFrame, url: String, table: String,
           driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
           mode: SaveMode = SaveMode.Overwrite,
           numPartitions: Int = 8): Unit =
    df.coalesce(numPartitions).write.mode(mode)
      .format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .option("batchsize", 1000)
      .save()

  /** JDBC read-back (verification + the reference's storage-then-query
    * pattern). `partitionColumn`/bounds would parallelize a big table read;
    * verification tables are small so a single-partition read is fine. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", driver)
      .load()

  /** Bucketed managed table: co-locates join keys so repeated joins on
    * `bucketBy` columns skip the shuffle entirely (the 100 TB path for the
    * cooccurrence self-join family). Requires a warehouse-backed catalog. */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String, buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)
}
