package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement main: the default oracle-checkable MinHash pipeline
  * (shingle ids via Hash60 = md5+conv, DuckDB-twinnable) vs the hashed
  * variant (xxhash64 mod P — one codegen'd hash call, no oracle twin).
  * Both produce the same plan SHAPE (band-bucket equi-join candidates);
  * the only difference is scalar hash cost per shingle, so the gap scales
  * with corpus bytes, not with pair counts. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.MinhashPathBench"
  * Numbers recorded in SURVEY §7 (round 5). */
object MinhashPathBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def time(fn: => Long): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // warm both once (shared scan caches, codegen), then time alternating
    // passes so neither path owns the warmer JVM
    graft.operators.Dedup.minhashCandidates(docs).count()
    graft.operators.Dedup.minhashCandidatesHashed(docs).count()
    val rounds = 3
    val md5 = (1 to rounds).map(_ =>
      time(graft.operators.Dedup.minhashCandidates(docs).count()))
    val xx = (1 to rounds).map(_ =>
      time(graft.operators.Dedup.minhashCandidatesHashed(docs).count()))
    println(s"""{"metric":"minhash_path","md5_hash60_sec":[${md5.map(f3).mkString(",")}],"xxhash64_sec":[${xx.map(f3).mkString(",")}],"md5_min":${f3(md5.min)},"xx_min":${f3(xx.min)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
