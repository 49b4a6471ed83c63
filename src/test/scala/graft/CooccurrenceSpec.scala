package graft

import graft.operators.{Concepts, Cooccurrence, TextOps}

/** Metric formulas vs hand computation, mirroring the reference's own
  * ConceptCooccurrenceMetricsTest (util/ConceptCooccurrenceMetrics.java). */
class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs: join appears in 3, merge in 2, together in 2
  private val docs = Seq(
    (0L, "join merge", "en", "s", 10L),
    (1L, "join merge", "en", "s", 10L),
    (2L, "join scan", "en", "s", 9L),
    (3L, "scan table", "en", "s", 10L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val annots = Concepts.postProcess(Concepts.recognize(docs))

  test("pair counts: distinct per unit, ordered pair keys") {
    val units = Cooccurrence.unitConcepts(annots, Seq("doc_id"), addAncestors = false)
    val pairs = Cooccurrence.pairCounts(units, Seq("doc_id")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs(("OP:join", "OP:merge")) == 2L)
    assert(pairs(("OP:join", "OP:scan")) == 1L)
    assert(pairs(("DS:table", "OP:scan")) == 1L)
  }

  test("cached unit sets are co-partitioned: pair self-join adds only the final agg exchange") {
    // the cooccurrence family's scale contract (SURVEY §5): unitConcepts
    // hash-places its one materialization on the unit key, so the pair
    // self-join needs no exchange — only the (c1,c2) aggregation shuffles
    val broadcastThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ: co-partitioning must carry it
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan tree for the node count
    try {
      val units = Cooccurrence.unitConcepts(annots, Seq("doc_id"))
      units.count() // materialize the cache so the join reads InMemoryTableScan
      val pairs = Cooccurrence.pairCounts(units, Seq("doc_id"))
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val shuffles = pairs.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.length == 1, pairs.queryExecution.executedPlan.toString)
      units.unpersist()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("annotation-driven title level keeps only span-contained concepts") {
    // window 0 (title) holds join+merge; window 1 (abstract) holds scan+table
    val d = Seq((0L, "join aa merge bb cc dd ee ff gg hh scan xx table yy zz qq ww rr tt uu",
      "en", "s", 80L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Concepts.postProcess(Concepts.recognize(d))
    val secs = Cooccurrence.sectionAnnots(d)
    assert(secs.collect().map(r => r.getAs[String]("section")).toSet == Set("title", "abstract"))
    val titleAnnots = Cooccurrence.levelAnnotsBySection(a, secs, "title")
    assert(titleAnnots.select("concept_id").distinct().collect().map(_.getString(0)).toSet ==
      Set("OP:join", "OP:merge"))
    val pairs = Cooccurrence.pairCounts(
      Cooccurrence.unitConcepts(titleAnnots, Seq("doc_id"), addAncestors = false), Seq("doc_id")).collect()
    assert(pairs.length == 1)
    assert((pairs.head.getString(0), pairs.head.getString(1)) == ("OP:join", "OP:merge"))
  }

  test("metrics match hand-computed reference formulas") {
    val m = Cooccurrence.metrics(annots, Seq("doc_id"))
      .where($"concept1" === "OP:join" && $"concept2" === "OP:merge").collect().head
    val fx = 3.0; val fy = 2.0; val fxy = 2.0; val n = 4.0
    val ngd = (math.max(math.log10(fx), math.log10(fy)) - math.log10(fxy)) /
      (math.log10(n) - math.min(math.log10(fx), math.log10(fy)))
    val pmi = math.log((fxy / n) / ((fx / n) * (fy / n)))
    val npmi = pmi / (-1.0 * math.log(fxy / n + 1e-9))
    assert(m.getAs[Long]("pair_count") == 2L)
    assert(m.getAs[Long]("concept1_count") == 3L)
    assert(m.getAs[Long]("concept2_count") == 2L)
    assert(math.abs(m.getAs[Double]("ngd") - ngd) < 1e-6)
    assert(math.abs(m.getAs[Double]("pmi") - pmi) < 1e-6)
    assert(math.abs(m.getAs[Double]("npmi") - npmi) < 1e-6)
  }

  test("pairs whose smaller concept count equals N are excluded (NGD guard)") {
    val all = Seq((0L, "join merge", "en", "s", 10L), (1L, "join merge", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Concepts.postProcess(Concepts.recognize(all))
    val m = Cooccurrence.metrics(a, Seq("doc_id")).collect()
    // every concept appears in both docs → min(fx,fy)=N for all pairs → all excluded
    assert(m.isEmpty)
  }

  test("idf = ln(N/df) with ancestor expansion") {
    val idf = Cooccurrence.idf(annots).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(idf("OP:join")._1 == 3L)
    assert(math.abs(idf("OP:join")._2 - math.log(4.0 / 3.0)) < 1e-6)
    // ancestor OP:ROOT is in every doc
    assert(idf("OP:ROOT")._1 == 4L)
    assert(idf("OP:ROOT")._2 == 0.0)
  }

  test("bm25 top-k via the bounded-heap aggregate matches the window formulation") {
    // the engine runs TopKAgg (≤k pairs per concept through partial agg);
    // the window-ranked twin is the oracle's formulation — identical output
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val k = 2
    val w = Window.partitionBy("concept_id").orderBy(col("bm25").desc, col("doc_id"))
    val windowed = Cooccurrence.bm25(annots)
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("concept_id", "rk", "doc_id", "bm25")
      .collect().map(_.toSeq).toSet
    val agged = Cooccurrence.bm25TopK(annots, k)
      .collect().map(_.toSeq).toSet
    assert(agged == windowed)
  }

  test("ancestor expansion adds JOINLIKE + ROOT for join/merge") {
    val units = Cooccurrence.unitConcepts(annots, Seq("doc_id"))
    val c0 = units.where($"doc_id" === 0).select("concept_id").as[String].collect().toSet
    assert(c0 == Set("OP:join", "OP:merge", "OP:JOINLIKE", "OP:ROOT"))
  }
}
