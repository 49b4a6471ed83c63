package graft.operators

import graft.functions.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Normalized text-mined-assertion DB star.
  *
  * The production consumer of the classified-sentence stream is a MySQL
  * star schema (reference: scripts/sql/text-mined-assertion-db.sql:26-79):
  * `assertion` (digest PK over subject/object/association), `evidence`
  * (digest PK, assertion FK, the sentence with document provenance — zone,
  * publication type, year), `entity` (the subject/object mention spans and
  * covered texts), and `evidence_score` (per-predicate classifier score,
  * PK (evidence_id, predicate)). The repo's `classified_sentences` +
  * JDBC sink cover the flat write; this operator is the 4-table
  * decomposition with FK integrity.
  *
  * All digests are sha256 hex over the natural key (the schema's
  * VARCHAR(65) digest ids; DuckDB-reproducible). Document provenance
  * follows the repo's standing conventions: zone from the sentence ordinal
  * window (0 = title, 1-2 = abstract, else body — the C2b device), year =
  * the Medline channel (doc_id%30+1990, 2155 — the reference's
  * DEFAULT_PUB_YEAR — for the year-less %7 channel), publication type a
  * two-value doc channel. Every table derives from ONE shared evidence
  * plan: doc-keyed joins only, dimension tables are grouped projections.
  */
object AssertionDb {

  val PredicateOf: Column =
    when(pmod(graft.functions.Hash60.id(
      concat_ws("|", col("concept_x"), col("concept_y"))), lit(2)) === 0,
      "biolink:located_in").otherwise("biolink:has_phenotype")

  /** The shared denormalized evidence plan: one row per classified
    * (sentence, pair) with every column any of the four tables projects. */
  def evidenceBase(docs: DataFrame, annots: DataFrame): DataFrame = {
    val classified = SentencePairs.classified(annots)
    val sents = TextOps.sentences(docs).select(col("doc_id"), col("sent_id"), col("sent_text"))
    val mentions = annots
      .select(col("doc_id"), col("ord"), col("tok"), col("char_start"), col("char_end"))
      .distinct()
    classified
      .withColumn("association_curie", PredicateOf)
      .join(sents, Seq("doc_id", "sent_id"))
      .join(mentions.select(col("doc_id"), col("ord").as("x_ord"), col("tok").as("x_tok"),
        col("char_start").as("x_start"), col("char_end").as("x_end")), Seq("doc_id", "x_ord"))
      .join(mentions.select(col("doc_id"), col("ord").as("y_ord"), col("tok").as("y_tok"),
        col("char_start").as("y_start"), col("char_end").as("y_end")), Seq("doc_id", "y_ord"))
      .withColumn("assertion_id", sha2(concat_ws("|",
        col("concept_x"), col("concept_y"), col("association_curie")), 256))
      .withColumn("evidence_id", sha2(concat_ws("|",
        col("doc_id"), col("sent_id"), col("concept_x"), col("concept_y"),
        col("association_curie")), 256))
      .withColumn("subject_entity_id", sha2(concat_ws("|",
        col("doc_id"), col("x_ord"), col("concept_x")), 256))
      .withColumn("object_entity_id", sha2(concat_ws("|",
        col("doc_id"), col("y_ord"), col("concept_y")), 256))
      .withColumn("document_zone",
        when(col("sent_id") === 0, "title")
          .when(col("sent_id") <= 2, "abstract").otherwise("body"))
      .withColumn("document_publication_type",
        when(col("doc_id") % 10 === 0, "Review").otherwise("Journal Article"))
      .withColumn("document_year_published",
        when(col("doc_id") % 7 === 0, lit(2155L)).otherwise(col("doc_id") % 30 + 1990))
  }

  /** [[evidenceBase]] staged ONCE per (process, corpus): the star's four
    * tables and the integrity gate are projections of one load — in
    * production they read the LOADED database, not a per-table re-run of
    * the NLP pipeline. The integrity query alone references the base from
    * eight join branches (14 s at sf0.1 un-staged; file-backed each branch
    * is a parquet scan). */
  def stagedBase(docs: DataFrame, annots: DataFrame, sfDir: String): DataFrame =
    graft.infra.Staging.stageOnce("assertion_db_base", sfDir,
      evidenceBase(docs, annots), docs.sparkSession)

  /** assertion_id, subject_curie, object_curie, association_curie. */
  def assertions(docs: DataFrame, annots: DataFrame): DataFrame =
    assertionsFrom(evidenceBase(docs, annots))

  def assertionsFrom(base: DataFrame): DataFrame =
    base
      .select(col("assertion_id"), col("concept_x").as("subject_curie"),
        col("concept_y").as("object_curie"), col("association_curie"))
      .distinct()

  /** The evidence table (text-mined-assertion-db.sql:40-52). */
  def evidence(docs: DataFrame, annots: DataFrame): DataFrame =
    evidenceFrom(evidenceBase(docs, annots))

  def evidenceFrom(base: DataFrame): DataFrame =
    base
      .select(col("evidence_id"), col("assertion_id"),
        concat(lit("PMID:"), col("doc_id")).as("document_id"),
        col("sent_text").as("sentence"),
        col("subject_entity_id"), col("object_entity_id"),
        col("document_zone"), col("document_publication_type"),
        col("document_year_published"))
      .distinct()

  /** entity_id, span ("start|end"), covered_text — subject and object
    * mentions unioned and deduplicated (:60-65). */
  def entities(docs: DataFrame, annots: DataFrame): DataFrame =
    entitiesFrom(evidenceBase(docs, annots))

  def entitiesFrom(base: DataFrame): DataFrame = {
    base.select(col("subject_entity_id").as("entity_id"),
        concat_ws("|", col("x_start"), col("x_end")).as("span"),
        col("x_tok").as("covered_text"))
      .union(base.select(col("object_entity_id"),
        concat_ws("|", col("y_start"), col("y_end")), col("y_tok")))
      .distinct()
  }

  /** evidence_id, predicate_curie, score — one scored predicate per
    * evidence row (:73-79; PK (evidence_id, predicate_curie) holds because
    * evidence_id already encodes the pair and the pair determines the
    * predicate). */
  def evidenceScores(docs: DataFrame, annots: DataFrame): DataFrame =
    evidenceScoresFrom(evidenceBase(docs, annots))

  def evidenceScoresFrom(base: DataFrame): DataFrame =
    base
      .select(col("evidence_id"), col("association_curie").as("predicate_curie"),
        Num.r6(col("score")).as("score"))
      .distinct()

  /** One row of orphan counts — the FK integrity the MySQL schema's
    * foreign keys enforce, asserted relationally: evidence rows without
    * their assertion, scores without their evidence, evidence without its
    * entity rows, plus duplicate-PK counts. All zero on a correct build. */
  def integrity(docs: DataFrame, annots: DataFrame): DataFrame =
    integrityFrom(evidenceBase(docs, annots))

  def integrityFrom(base: DataFrame): DataFrame = {
    val a = assertionsFrom(base)
    val e = evidenceFrom(base)
    val s = evidenceScoresFrom(base)
    val ent = entitiesFrom(base)
    val evOrphans = e.join(a.select("assertion_id"), Seq("assertion_id"), "left_anti")
      .select(count(lit(1)).as("evidence_without_assertion"))
    val scoreOrphans = s.join(e.select("evidence_id"), Seq("evidence_id"), "left_anti")
      .select(count(lit(1)).as("scores_without_evidence"))
    val subjOrphans = e.select(col("subject_entity_id").as("entity_id"))
      .union(e.select(col("object_entity_id")))
      .join(ent.select("entity_id"), Seq("entity_id"), "left_anti")
      .select(count(lit(1)).as("evidence_without_entity"))
    val dupPks = e.groupBy("evidence_id").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).select(count(lit(1)).as("duplicate_evidence_ids"))
    evOrphans.crossJoin(scoreOrphans).crossJoin(subjOrphans).crossJoin(dupPks)
  }
}
