package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Assertion-annotation sheet batches and their BERT back-conversion.
  *
  * The reference samples extracted-sentence rows into annotator
  * spreadsheets (reference: relation_extraction/
  * GoogleSheetsAssertionAnnotationSheetCreator.java:201-347
  * createNewSpreadsheet): a random index set over the unique sentences
  * (:225 getRandomIndexes), per-line entity-id exclusion (:251-265), a
  * sentence-hash dedup against the carried-forward previous-ids file
  * (:218-219, :284), a static identifier validation (:355-361), the row
  * contract of getSentenceCellData (:452-496: hash id, placeholder
  * sentence, document id, subject/object ids and texts, the sentence text
  * padded with 18 trailing spaces for the checkbox columns, NO-RELATION
  * pre-checked true, per-predicate checkboxes false), optional inverse
  * rows with subject/object swapped (:291-295), and the append of this
  * batch's hashes to the previous-ids file (:326-336). The return path
  * (GoogleSheetsToBertInputFileCreator.java:36-73) reads annotated rows
  * back and emits `sha256Hex(placeholder_sentence) \t sentence \t
  * predicate-abbreviation` training lines, where the LAST checked
  * predicate column wins (:59-65 — the loop overwrites).
  *
  * Determinism re-expressions (both established repo-wide): the random
  * index set becomes the hash-ordered batch cut (smallest batchSize
  * sentence hashes — a TakeOrderedAndProject, never a global sort), and
  * the reference's base64-SHA1 sentence hash becomes sha256 hex (same
  * injective fingerprint role, DuckDB-reproducible — the E6c/KGX device).
  * The Sheets API plumbing itself is out of scope; the batch is the row
  * set the spreadsheet would hold.
  */
object Sheets {

  /** Stand-ins for the reference's exclusion mechanisms over the synthetic
    * concept universe: the per-call ids-to-exclude set (:251-265) and the
    * static IDENTIFIERS_TO_EXCLUDE validation (:111, :355-361 — e.g.
    * CHEBI:36080, CL:0000000). */
  val IdsToExclude: Seq[String] = Seq("DS:data")
  val ValidateExclude: Seq[String] = Seq("OP:scan")

  val DefaultBatchSize = 8

  /** sentence_id, sentence_with_placeholders, document_id, subject_id,
    * subject_text, object_id, object_text, sentence, no_relation, inverse —
    * one annotator batch. One row per selected sentence hash (+ its inverse
    * twin when includeInverse); the representative pair for a multi-pair
    * sentence is the minimum (x_ord, y_ord, concepts) — the reference
    * writes whichever line the file yields first. */
  def batch(docs: DataFrame, annots: DataFrame, previousHashes: DataFrame,
            batchSize: Int = DefaultBatchSize, includeInverse: Boolean = true): DataFrame =
    batchFrom(candidateRows(docs, annots), previousHashes, batchSize, includeInverse)

  /** The candidate-row table — the reference's input sentence TSV: one row
    * per extracted (sentence, pair) line with the placeholder sentence,
    * raw text, mention texts and the sentence hash, exclusions applied. */
  def candidateRows(docs: DataFrame, annots: DataFrame): DataFrame = {
    val sents = TextOps.sentences(docs).select(col("doc_id"), col("sent_id"), col("sent_text"))
    val toks = annots.select(col("doc_id"), col("ord"), col("tok")).distinct()
    SentencePairs.extractWithBlinded(docs, annots)
      .where(!col("concept_x").isin((IdsToExclude ++ ValidateExclude): _*) &&
        !col("concept_y").isin((IdsToExclude ++ ValidateExclude): _*))
      .join(sents, Seq("doc_id", "sent_id"))
      .join(toks.select(col("doc_id"), col("ord").as("x_ord"), col("tok").as("subject_text")),
        Seq("doc_id", "x_ord"))
      .join(toks.select(col("doc_id"), col("ord").as("y_ord"), col("tok").as("object_text")),
        Seq("doc_id", "y_ord"))
      .withColumn("sentence_id", sha2(col("sent_text"), 256))
  }

  /** [[candidateRows]] staged ONCE per (process, corpus) — the reference's
    * inputSentenceFiles ARE files a prior pipeline stage wrote
    * (createNewSpreadsheet:240-245 streams them from disk); each sheets
    * query re-deriving the extraction chain per invocation measured 3-16 s
    * at sf0.1, file-backed it is a scan. */
  def stagedCandidateRows(docs: DataFrame, annots: DataFrame, sfDir: String): DataFrame =
    graft.infra.Staging.stageOnce("sheets_rows", sfDir,
      candidateRows(docs, annots), docs.sparkSession)

  /** [[batch]] over a pre-built candidate-row table. */
  def batchFrom(rows: DataFrame, previousHashes: DataFrame,
                batchSize: Int = DefaultBatchSize, includeInverse: Boolean = true): DataFrame = {
    val fresh = rows.join(
      previousHashes.select(col("hash").as("sentence_id")), Seq("sentence_id"), "left_anti")
    // the deterministic random sample: smallest batchSize hashes — an
    // ordered LIMIT (per-partition bounded heaps), never a full sort
    val cut = fresh.select("sentence_id").distinct().orderBy("sentence_id").limit(batchSize)
    val chosen = fresh.join(cut, Seq("sentence_id"), "left_semi")
      .groupBy("sentence_id")
      .agg(min(struct(col("x_ord"), col("y_ord"), col("concept_x"), col("concept_y"),
        col("doc_id"), col("sent_id"), col("blinded_sentence"),
        col("subject_text"), col("object_text"), col("sent_text"))).as("r"))
    def side(inverse: Boolean): DataFrame = {
      val (sid, stx, oid, otx) =
        if (!inverse) ("r.concept_x", "r.subject_text", "r.concept_y", "r.object_text")
        else ("r.concept_y", "r.object_text", "r.concept_x", "r.subject_text")
      chosen.select(
        col("sentence_id"),
        col("r.blinded_sentence").as("sentence_with_placeholders"),
        concat(lit("PMID:"), col("r.doc_id")).as("document_id"),
        col(sid).as("subject_id"), col(stx).as("subject_text"),
        col(oid).as("object_id"), col(otx).as("object_text"),
        concat(col("r.sent_text"), lit(" " * 18)).as("sentence"),
        lit(true).as("no_relation"), lit(inverse).as("inverse"))
    }
    if (includeInverse) side(false).unionByName(side(true)) else side(false)
  }

  /** Batch 1 (the first annotator's batch over an empty previous-ids file)
    * staged ONCE per (process, corpus): the reference CREATES the
    * spreadsheet once and appends its hashes to the previous-ids FILE
    * (createNewSpreadsheet:326-336) — every later step (the carry-forward
    * batch, the IAA overlap batch, the BERT back-conversion) reads the
    * EXISTING sheet/ids file, it does not re-create batch 1. The
    * sheets_batch query itself stays the honest computation of exactly
    * this derivation. Canonical-inputs contract per Staging.stageOnce:
    * `rows` must be [[stagedCandidateRows]] for `sfDir` and the batch the
    * family default. */
  def stagedFirstBatch(rows: DataFrame, sfDir: String): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    graft.infra.Staging.stageOnce("sheets_batch1", sfDir,
      batchFrom(rows, Seq.empty[String].toDF("hash")), spark)
  }

  /** A second annotator's batch with a deliberate IAA overlap share
    * (reference: relation_extraction/annot_batch_cli/BatchCreateCommand
    * .java:135-174 + its --overlap-sentence-percentage option: when a
    * second annotator's first batch is created, a percentage of its
    * sentences is drawn from the FIRST annotator's batch so agreement can
    * be measured; the rest are fresh sentences not yet in use). Overlap
    * pick determinized as the hash-ordered head of batch 1; output rows
    * carry is_overlap. */
  def iaaOverlapBatch(rows: DataFrame, firstBatch: DataFrame,
                      batchSize: Int = DefaultBatchSize,
                      overlapPct: Double = 0.25): DataFrame = {
    val nOverlap = math.ceil(batchSize * overlapPct).toInt
    val b1Hashes = firstBatch.select(col("sentence_id").as("hash")).distinct()
    val overlapIds = b1Hashes.orderBy("hash").limit(nOverlap)
      .select(col("hash").as("sentence_id"))
    val overlap = firstBatch.where(!col("inverse"))
      .join(overlapIds, Seq("sentence_id"), "left_semi")
      .withColumn("is_overlap", lit(true))
    val freshPart = batchFrom(rows, b1Hashes, batchSize - nOverlap,
      includeInverse = false).withColumn("is_overlap", lit(false))
    overlap.unionByName(freshPart)
  }

  /** [[batchFrom]] restricted to an ALLOWABLE concept-id set — the
    * IDF-threshold filter of BatchCreateCommand.loadOntologyPrefixToAllowableConceptIdsMap
    * (:183-260 + addConceptIdsAboveIdfThreshold: only concepts whose IDF
    * clears the threshold may anchor a batch sentence, cutting the
    * too-common concepts annotators waste time on). Both entities must be
    * allowable; the filter is two broadcast semi-joins against the
    * ontology-sized concept-IDF cut. */
  def idfFilteredBatch(rows: DataFrame, conceptIdf: DataFrame, idfThreshold: Double,
                       previousHashes: DataFrame,
                       batchSize: Int = DefaultBatchSize): DataFrame = {
    // one canonical cut plan, two aliased references: the broadcast
    // exchange canonicalizes identically and is REUSED across both
    // semi-joins (a withColumnRenamed per side defeats the reuse and
    // derives the idf chain twice — measured 2× the query's cost)
    val cut = conceptIdf.where(col("idf") >= idfThreshold).select("concept_id")
    val filtered = rows
      .join(broadcast(cut.as("idf_a")),
        col("concept_x") === col("idf_a.concept_id"), "left_semi")
      .join(broadcast(cut.as("idf_b")),
        col("concept_y") === col("idf_b.concept_id"), "left_semi")
    batchFrom(filtered, previousHashes, batchSize)
  }

  /** The previous-ids carry-forward (:326-336): the file after this batch =
    * old hashes ∪ this batch's hashes. */
  def carryForward(previousHashes: DataFrame, batchRows: DataFrame): DataFrame =
    previousHashes.select("hash")
      .union(batchRows.select(col("sentence_id").as("hash")))
      .distinct()

  /** Predicate columns in sheet order with their edge-label abbreviations
    * (reference BiolinkConstants.java:173 NO_RELATION_PRESENT → "false",
    * :183 BL_HAS_PHENOTYPE → "has_phenotype", :187 BL_LOCATED_IN →
    * "located_in"). */
  val PredicateAbbrevs: Seq[String] = Seq("false", "located_in", "has_phenotype")

  /** hash, sentence_with_placeholders, label — the BERT training lines read
    * back from an annotated sheet (GoogleSheetsToBertInputFileCreator
    * .java:36-73). The annotator's checkboxes are simulated by a
    * deterministic per-row channel c ∈ 0..3 over the sentence id:
    * 0 → NO-RELATION only, 1 → located_in, 2 → has_phenotype, 3 → BOTH
    * relation boxes checked — which exercises the reference's
    * last-checked-column-wins overwrite (:59-65). hash = sha256 hex of the
    * placeholder sentence, exactly the reference's DigestUtils.sha256Hex. */
  def toBertInput(batchRows: DataFrame): DataFrame = {
    val c = pmod(graft.functions.Hash60.id(
      concat_ws("|", col("sentence_id"), col("inverse").cast("string"))), lit(4))
    val label = when(c === 2 || c === 3, PredicateAbbrevs(2))
      .when(c === 1, PredicateAbbrevs(1))
      .otherwise(PredicateAbbrevs.head)
    batchRows.select(
      sha2(col("sentence_with_placeholders"), 256).as("hash"),
      col("sentence_with_placeholders"), label.as("label"))
  }
}
