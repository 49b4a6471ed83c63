package graft

import org.apache.spark.sql.SparkSession

/** Scaling probe: times the dedup / ANN / connected-components families at
  * two scale factors in ONE JVM and reports per-query time ratios against
  * the data-size ratio — the measured evidence behind SURVEY §8's
  * linear-in-bytes claims (band/bucket/cell-bounded pair generation). A
  * family whose time ratio tracks ≲ the bytes ratio scales linearly; one
  * that outgrows it is quadratic somewhere and failed its design.
  *
  * Usage: runMain graft.ScaleBench [smallSfDir largeSfDir]
  * (defaults: /root/testdata/sf0.01 → /root/testdata/sf0.1, a 10x step).
  * Same timing discipline as [[Bench]]: cold pass to warm codegen/caches,
  * then min-of-2 timed passes; GC quiesce between queries. Caches are
  * dropped between scale factors (infra.Caches.unpersistAll) so the large
  * scale's storage starts clean.
  */
object ScaleBench {

  private val Families: Seq[(String, Seq[String])] = Seq(
    "dedup" -> Seq("dedup_exact", "dedup_norm", "span_dedup", "dedup_minhash",
      "minhash_est", "ngram_jaccard", "dedup_simhash", "simhash_pairs",
      "window_dup", "doc_fingerprint"),
    "ann" -> Seq("emb_topk", "emb_topk_native", "emb_lsh", "ivf_topk",
      "pq_codes", "pq_topk", "sq_codes", "sq_topk", "ivfsq_topk", "ivfpq_topk",
      "kmeans_cells", "emb_dup_pairs", "semantic_dedup"),
    "cc" -> Seq("dedup_clusters", "semantic_clusters", "dedup_keep_best"),
    "layout" -> Seq("corpus_shuffle", "zorder_key"))

  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val large = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def quiesce(): Unit = { System.gc(); Thread.sleep(200) }
    def timed(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // cold
      quiesce()
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val w = (System.nanoTime() - t0) / 1e9
        quiesce()
        w
      }.min
    }

    val names = Families.flatMap(_._2)
    val atSmall = names.map(n => n -> timed(n, small)).toMap
    graft.infra.Caches.unpersistAll(spark)
    val atLarge = names.map(n => n -> timed(n, large)).toMap

    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val perQuery = names.map { n =>
      val r = atLarge(n) / math.max(atSmall(n), 1e-9)
      s""""$n":{"t_small":${f3(atSmall(n))},"t_large":${f3(atLarge(n))},"ratio":${f3(r)}}"""
    }.mkString("{", ",", "}")
    val perFamily = Families.map { case (fam, qs) =>
      val s = qs.map(atSmall).sum
      val l = qs.map(atLarge).sum
      s""""$fam":{"t_small":${f3(s)},"t_large":${f3(l)},"ratio":${f3(l / math.max(s, 1e-9))}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_ratio","small":"$small","large":"$large","families":$perFamily,"queries":$perQuery}""")
    spark.stop()
  }
}
