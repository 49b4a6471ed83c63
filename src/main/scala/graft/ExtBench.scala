package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plain-session vs GraftExtensions-session benchmark (VERDICT r9 item 5).
  *
  * `Bench`/`Verify` deliberately build PLAIN sessions (the oracle gate must
  * measure the operators, not the optimizer rules), which meant the
  * WindowTopKToBoundedHeap rule's production cost/benefit was spec-proved
  * (ExtensionsSpec) but never measured in a driver-visible artifact. This
  * main times the top-N query family and a window-formulated top-k twice —
  * once per session kind, same JVM, plain first — and prints ONE JSON line
  * consumed by PERF_AUDIT_r10.md:
  *  - `win_topk_*`: the row_number()<=k formulation. Under extensions the
  *    rule rewrites it to the bounded-heap aggregate (`rule_fired` proves
  *    it from the optimized plan); the delta is the rule's BENEFIT.
  *  - the SparkEntry family rows measure rule OVERHEAD on queries the rule
  *    inspects but must leave alone (already heap-formulated or non-top-k).
  */
object ExtBench {

  private val Family = Seq(
    "top_parts_per_brand", "top_parts_agg", "q3_top_orders", "bm25_topk",
    "emb_topk_native", "q18_large_orders")

  private def windowTopK(s: SparkSession, sfDir: String): DataFrame = {
    // the rule's eligibility contract: score/id must be provably non-null
    // DOUBLE/LONG attributes (parquet columns are nullable, so project
    // through coalesce first — the same contract topPartsPerBrand documents)
    val w = Window.partitionBy("p_brand")
      .orderBy(col("score").desc, col("id").asc)
    graft.sources.Tables.part(s, sfDir)
      .select(col("p_brand"), col("p_name"),
        coalesce(col("p_partkey"), lit(-1L)).as("id"),
        coalesce(col("p_retailprice").cast("double"), lit(0.0)).as("score"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
  }

  /** Same shape over the FACT table (sf0.1 lineitem ~600k rows, ~100
    * suppliers → wide partitions): the case where the window formulation
    * pays a real per-partition sort and the heap rewrite should win. */
  private def windowTopKBig(s: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("score").desc, col("id").asc)
    graft.sources.Tables.lineitem(s, sfDir)
      .select(col("l_suppkey"),
        coalesce(col("l_orderkey") * 10 + col("l_linenumber"), lit(-1L)).as("id"),
        coalesce(col("l_extendedprice").cast("double"), lit(0.0)).as("score"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
  }

  /** The r12 integer-key shape: first-k per supplier by the composite
    * (l_orderkey, linenumber-id) ascending key — the lane TopKLongAgg
    * serves exactly; under extensions the rule must route it through
    * `top_k_long_agg`. */
  private def windowTopKLongKey(s: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("okey").asc, col("id").asc)
    graft.sources.Tables.lineitem(s, sfDir)
      .select(col("l_suppkey"),
        coalesce(col("l_orderkey"), lit(-1L)).as("okey"),
        coalesce(col("l_orderkey") * 10 + col("l_linenumber"), lit(-1L)).as("id"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
  }

  /** The r13 multi-key shape: first-k per supplier by the LEXICOGRAPHIC
    * (l_orderkey ASC, l_linenumber ASC, id ASC) composite — three sort
    * keys, the lane TopKLexAgg serves; under extensions the rule must
    * route it through `top_k_lex_agg`. */
  private def windowTopKLexKey(s: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("okey").asc, col("lnum").asc, col("id").asc)
    graft.sources.Tables.lineitem(s, sfDir)
      .select(col("l_suppkey"),
        coalesce(col("l_orderkey"), lit(-1L)).as("okey"),
        coalesce(col("l_linenumber").cast("long"), lit(-1L)).as("lnum"),
        coalesce(col("l_orderkey") * 10 + col("l_linenumber"), lit(-1L)).as("id"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    def quiesce(): Unit = { System.gc(); Thread.sleep(200) }
    def minOf2(body: => Unit): Double = {
      body; quiesce() // cold
      (1 to 2).map { _ =>
        val t = System.nanoTime(); body
        val w = (System.nanoTime() - t) / 1e9; quiesce(); w
      }.min
    }
    def runKind(kind: String): (Map[String, Double], Double, Double, Double, Double, Boolean, Boolean, Boolean) = {
      val spark =
        if (kind == "ext") GraftSession.local(cpus)
        else {
          val s = SparkSession.builder().master(s"local[$cpus]")
            .config("spark.sql.shuffle.partitions", cpus)
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false").getOrCreate()
          s.sparkContext.setLogLevel("WARN")
          s
        }
      val fam = Family.map { name =>
        name -> minOf2(SparkEntry.queries(name)(spark, sfDir).count())
      }.toMap
      val win = minOf2(windowTopK(spark, sfDir).count())
      val winBig = minOf2(windowTopKBig(spark, sfDir).count())
      val winLong = minOf2(windowTopKLongKey(spark, sfDir).count())
      val winLex = minOf2(windowTopKLexKey(spark, sfDir).count())
      val fired = windowTopK(spark, sfDir)
        .queryExecution.executedPlan.toString.contains("top_k_agg")
      val longFired = windowTopKLongKey(spark, sfDir)
        .queryExecution.executedPlan.toString.contains("top_k_long_agg")
      val lexFired = windowTopKLexKey(spark, sfDir)
        .queryExecution.executedPlan.toString.contains("top_k_lex_agg")
      spark.stop()
      // a fresh builder after stop() must not inherit this session
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      (fam, win, winBig, winLong, winLex, fired, longFired, lexFired)
    }
    val (plainFam, plainWin, plainWinBig, plainWinLong, plainWinLex, plainFired, plainLongFired, plainLexFired) = runKind("plain")
    val (extFam, extWin, extWinBig, extWinLong, extWinLex, extFired, extLongFired, extLexFired) = runKind("ext")
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jm(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"ext_vs_plain","sf":"$sfDir","win_topk_plain":${f3(plainWin)},"win_topk_ext":${f3(extWin)},"win_topk_big_plain":${f3(plainWinBig)},"win_topk_big_ext":${f3(extWinBig)},"win_topk_longkey_plain":${f3(plainWinLong)},"win_topk_longkey_ext":${f3(extWinLong)},"win_topk_lexkey_plain":${f3(plainWinLex)},"win_topk_lexkey_ext":${f3(extWinLex)},"rule_fired_plain":$plainFired,"rule_fired_ext":$extFired,"long_rule_fired_plain":$plainLongFired,"long_rule_fired_ext":$extLongFired,"lex_rule_fired_plain":$plainLexFired,"lex_rule_fired_ext":$extLexFired,"family_plain":${jm(plainFam)},"family_ext":${jm(extFam)}}""")
  }
}
