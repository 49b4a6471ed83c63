package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession

/** Recommended session configuration for the graft engine.
  *
  * Local runs size the shuffle to the core count; the same builder on a
  * cluster takes executor topology from spark-submit and keeps the
  * engine-level settings (AQE + skew handling on, partition coalescing,
  * graft SQL extensions, nanosecond-timestamp policy).
  */
object GraftSession {

  def builder(master: String = "local[4]", shufflePartitions: Int = 4): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
