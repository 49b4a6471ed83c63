package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * Each query is executed once to warm shared caches/codegen (cold pass,
  * reported as cold_total_sec) and once timed (steady-state, reported
  * per-query; "value" is the warm total). A short GC quiesce between queries
  * keeps async cleanup from the previous query out of the next one's timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def quiesce(): Unit = { System.gc(); Thread.sleep(200) }

    val names = SparkEntry.queries.keys.toSeq.sorted
    var coldTotal = 0.0
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Long =
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        failed += name
        -1L
      }
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      run(name, fn)
      coldTotal += (System.nanoTime() - t0) / 1e9
      quiesce()
      val t1 = System.nanoTime()
      run(name, fn)
      val warm = (System.nanoTime() - t1) / 1e9
      quiesce()
      name -> warm
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fails = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total_sec":$coldTotal,"failed":$fails,"sf":"$sfDir"}""")
    spark.stop()
  }
}
