package graft.infra

import org.apache.spark.sql.SparkSession

/** Cache lifecycle for graft's shared-plan persist() sites.
  *
  * Several operators persist() intermediate plans that multiple downstream
  * queries share (SparkEntry's post-processed annotations, Cooccurrence's
  * metrics totals, Dedup's shingle/band sets, Embeddings' IVF cell ranks).
  * In the driver suites (Verify/Bench) that registration is deliberately
  * SESSION-LIFETIME: the CacheManager is what lets 150+ back-to-back
  * queries reuse one materialization of the tokenize→recognize→post-process
  * chain instead of recomputing it per query, and the session ends with the
  * JVM. A long-lived service embedding these operators instead calls
  * [[unpersistAll]] between corpora (or at request boundaries) so storage
  * doesn't accumulate across workloads.
  */
object Caches {

  /** Drop every CacheManager entry of the session (all graft persist()
    * sites register there — Dataset.persist goes through the shared
    * CacheManager, not RDD-level persistence). Safe mid-pipeline: Spark
    * recomputes lazily from lineage on next use. */
  def unpersistAll(spark: SparkSession): Unit = spark.catalog.clearCache()
}
