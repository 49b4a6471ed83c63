package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Demonstrates + verifies the co-located-join scale path: two tables
  * bucketed on the join key join WITHOUT any shuffle exchange — at 100 TB
  * this removes the dominant cost of the cooccurrence family's repeated
  * doc_id joins. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    // clear orphaned managed-table locations from prior JVMs
    for (t <- Seq("graft_bucket_l", "graft_bucket_r", "graft_bucket_rt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  test("join of two tables bucketed on the key plans with zero exchanges") {
    val left = (1L to 1000L).map(i => (i % 97, i)).toDF("doc_id", "payload_a")
    val right = (1L to 1000L).map(i => (i % 97, i * 2)).toDF("doc_id", "payload_b")
    Sinks.bucketedTable(left, "graft_bucket_l", "doc_id", buckets = 8)
    Sinks.bucketedTable(right, "graft_bucket_r", "doc_id", buckets = 8)
    // force the sort-merge path (tiny test tables would broadcast, which
    // disables bucketing; at the scale bucketing targets, SMJ is the plan)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucket_l").join(spark.table("graft_bucket_r"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == left.join(right, "doc_id").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed table round-trips data intact") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "v")
    Sinks.bucketedTable(df, "graft_bucket_rt", "doc_id", buckets = 4)
    val back = spark.table("graft_bucket_rt").orderBy("doc_id").as[(Long, String)].collect()
    assert(back.toSeq == Seq((1L, "a"), (2L, "b")))
  }
}
