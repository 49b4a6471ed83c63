package graft

import graft.operators.{Concepts, Cooccurrence}
import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the bucketed co-located path for the cooccurrence pair join
  * (SURVEY §5 / R2 backlog): unit-concept sets written once bucketed by
  * doc_id, then the pair self-join reads both sides shuffle-free. Prints a
  * comparison against the in-memory (shuffled) formulation. */
object BucketedCooccurDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ so bucketing matters
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("DROP TABLE IF EXISTS graft_units_bucketed")
    // a previous JVM's managed location survives the in-memory catalog; clear it
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "graft_units_bucketed")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    val units = Cooccurrence.unitConcepts(
      Concepts.postProcess(Concepts.recognize(Tables.documents(spark, sfDir))), Seq("doc_id"))

    def timed[A](f: => A): (Double, A) = { val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r) }

    val (tShuffled, nShuffled) = timed(Cooccurrence.pairCounts(units, Seq("doc_id")).count())

    val (tWrite, _) = timed(Sinks.bucketedTable(units, "graft_units_bucketed", "doc_id", buckets = 32))
    val bucketed = spark.table("graft_units_bucketed")
    val (tBucketed, nBucketed) = timed(Cooccurrence.pairCounts(bucketed, Seq("doc_id")).count())
    def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r.findAllIn(df.queryExecution.executedPlan.toString).length
    val exShuffled = nExchanges(Cooccurrence.pairCounts(units, Seq("doc_id")))
    val exBucketed = nExchanges(Cooccurrence.pairCounts(bucketed, Seq("doc_id")))
    println(f"shuffled_join=${tShuffled}%.2fs bucketed_join=${tBucketed}%.2fs (one-time bucket write=${tWrite}%.2fs)")
    println(s"rows_equal=${nShuffled == nBucketed} exchanges shuffled=$exShuffled bucketed=$exBucketed")
    spark.stop()
  }
}
