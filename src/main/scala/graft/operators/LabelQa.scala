package graft.operators

import graft.functions.{ConceptDict, Hash60}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dictionary-label quality analysis.
  *
  * The reference audits its OGER dictionary labels three ways before they
  * enter concept recognition (oger/util/LabelFilterByEmbedding.java):
  * labels shared by multiple identifiers (findOverlappingLabels:89-138),
  * labels that are common English words (findLabelsThatAreEnglishWords:
  * 301-321), and labels whose embedding sits far from the domain's average
  * embedding (createAverageEmbedding:35-79 + the cosine filter in main).
  * Each is a dictionary-sized analysis: tiny tables broadcast against the
  * corpus-derived word list where one is needed, never the reverse.
  */
object LabelQa {

  /** The MolePro-style (label, id) rows: dictionary entries plus the
    * promotion-target aliases — the multi-identifier labels the reference's
    * overlap audit hunts (a label like `triglyceride` naming many CHEBI
    * ids; here `join` naming both OP:join and its promoted OP:JOINLIKE). */
  val labelIdPairs: Seq[(String, String)] = {
    val aliasRows = for {
      (c, p) <- ConceptDict.promotions
      (t, c2) <- ConceptDict.entries if c2 == c
    } yield (t, p)
    (ConceptDict.entries.map { case (t, c) => (t, c) } ++ aliasRows).distinct
  }

  def labelsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    labelIdPairs.toDF("label", "concept_id")
  }

  def labelsValuesSql: String =
    labelIdPairs.map { case (t, c) => s"('$t','$c')" }
      .mkString("(VALUES ", ", ", ") AS lbls(label, concept_id)")

  /** label, n_ids, ids — labels associated with ≥2 distinct identifiers,
    * with the sorted pipe-joined id list (findOverlappingLabels' report:
    * label, count, id list). */
  def labelOverlap(spark: SparkSession): DataFrame =
    labelsDF(spark)
      .groupBy("label")
      .agg(countDistinct(col("concept_id")).as("n_ids"),
        array_join(array_sort(collect_set(col("concept_id"))), "|").as("ids"))
      .where(col("n_ids") >= 2)

  /** The fixed English-word dictionary (the words_alpha.txt stand-in the
    * reference loads as a plain word set — a data file, not a corpus
    * derivation; ~half the dictionary labels are in it, so the audit
    * discriminates). */
  val wordsAlpha: Seq[String] = Seq(
    "a", "the", "and", "of", "to", "in", "is", "on", "for", "with",
    "table", "line", "key", "value", "order", "part", "big", "small",
    "fast", "slow", "window", "row", "data", "group", "stream", "column")

  def wordsAlphaValuesSql: String =
    wordsAlpha.map(w => s"('$w')").mkString("(VALUES ", ", ", ") AS wa(w)")

  /** concept_id, label, df — labels that are common English words (the
    * "WORD Possible bad label" report, findLabelsThatAreEnglishWords:
    * 301-321: set membership against the word dictionary), with the
    * label's corpus document frequency attached as the severity signal —
    * one corpus aggregation with the tiny word/label tables broadcast. */
  def labelEnglishWords(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val flagged = labelsDF(docs.sparkSession)
      .join(wordsAlpha.toDF("w"), lower(col("label")) === col("w"), "left_semi")
    val dfCounts = TextOps.tokens(docs)
      .select(col("doc_id"), lower(col("tok")).as("w"))
      .distinct()
      .groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
    flagged.join(dfCounts, lower(col("label")) === dfCounts("w"), "left")
      .select(col("concept_id"), col("label"),
        coalesce(col("df"), lit(0L)).as("df"))
  }

  val EmbedScale = 1000000L
  val BadLabelCosine = 0.1

  /** Embedding in integer micro-units for one label: the label keys into
    * the embedding table by md5-derived id modulo the table size (a
    * deterministic label→vector assignment; the reference loads a word-
    * vector file keyed by label text — LabelFilterByEmbedding.main:245). */
  private def labelVectors(spark: SparkSession, emb: DataFrame,
                           labels: DataFrame): DataFrame = {
    val n = emb.select(count(lit(1)).as("n_vecs"))
    val keyed = labels.crossJoin(broadcast(n))
      .withColumn("vec_id", pmod(Hash60.id(col("label")), col("n_vecs")))
      .drop("n_vecs")
    keyed.join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("concept_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "e")))
      .select(col("concept_id"), col("label"), col("dim").cast("long").as("dim"),
        floor(col("e").cast("double") * EmbedScale + 0.5).cast("long").as("e_u"))
  }

  /** concept_id, label, cosine, possible_bad — per-label cosine against the
    * domain's average embedding (createAverageEmbedding over the root
    * class's descendants — here the labels of `domainPrefix`), flagging
    * labels below [[BadLabelCosine]]. All sums are exact integer
    * micro-units (commutative, cross-engine reproducible); the reference's
    * pairwise running average (EmbeddingUtil.average folds two vectors at
    * a time, so its result depends on HashSet iteration order) is replaced
    * by the order-independent arithmetic mean — the only well-defined
    * choice, taken via integer division of micro-unit sums. */
  def labelFilterByEmbedding(emb: DataFrame, domainPrefix: String = "OP"): DataFrame = {
    val spark = emb.sparkSession
    val all = labelsDF(spark).select("concept_id", "label").distinct()
    val vecs = graft.infra.Caches.managed(labelVectors(spark, emb, all))
    // domain centroid per dim: mean of the domain labels' micro-units
    // (integer division — deterministic), carried as a broadcast dim table
    val centroid = vecs
      .where(substring_index(col("concept_id"), ":", 1) === domainPrefix)
      .groupBy("dim")
      .agg(expr("sum(e_u) div count(1)").as("c_u"))
    val scored = vecs.join(broadcast(centroid), "dim")
      .groupBy("concept_id", "label")
      .agg(sum(col("e_u") * col("c_u")).as("dot_u"),
        sum(col("e_u") * col("e_u")).as("n1_u"),
        sum(col("c_u") * col("c_u")).as("n2_u"))
    scored.select(col("concept_id"), col("label"),
        graft.functions.Num.r6(col("dot_u").cast("double") /
          (sqrt(col("n1_u").cast("double")) * sqrt(col("n2_u").cast("double"))))
          .as("cosine"))
      .withColumn("possible_bad", col("cosine") < BadLabelCosine)
  }
}
