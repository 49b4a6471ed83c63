package graft.operators

import graft.functions.Hash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distant-supervision concept-pair file flow.
  *
  * The reference trains relation classifiers from a concept-pairs file —
  * (subject_uri, object_uri, predicate_uri) triples — by extracting the
  * positive pairs for a target predicate, generating subject-anchored
  * negative pair chunks, and pulling every sentence whose annotations
  * contain a pair into masked BERT training lines
  * (relation_extraction/distant_supervision/ConceptPairsFileParser.java,
  * ConceptPairSentenceExtractor.java, ConceptPairsSentenceExtractorMain
  * .java). The reference's sentence lookup is an Elasticsearch boolean
  * query per pair; Spark-first the same semantics is ONE equi-join of the
  * pair table against the sentence-mention table — no per-pair round trips,
  * and the pair table broadcasts when small.
  */
object ConceptPairs {

  val OboNs = "http://purl.obolibrary.org/obo/"
  val RoHasPhenotype: String = OboNs + "RO_0002200"
  val RoLocatedIn: String = OboNs + "RO_0001025"

  /** predicate URI → biolink curie (ConceptPairsFileParser.getBiolink:140-151). */
  val BiolinkOf: Map[String, String] = Map(
    RoHasPhenotype -> "biolink:has_phenotype",
    RoLocatedIn -> "biolink:located_in")

  private def uriOf(c: Column): Column =
    concat(lit(OboNs), regexp_replace(c, ":", "_"))

  private def curieOf(c: Column): Column =
    regexp_replace(regexp_replace(c, lit(OboNs), lit("")), "_", ":")

  /** doc-cooccurrence pairs restricted to the subject/object domains
    * (OP × DS — the protein/GO-CC analog), with a deterministic predicate
    * split so the target-predicate filter discriminates. */
  private def domainPairs(annots: DataFrame): DataFrame =
    Cooccurrence.pairCounts(Cooccurrence.unitConcepts(annots, Seq("doc_id")), Seq("doc_id"))
      .where(substring_index(col("concept1"), ":", 1) === "DS" &&
        substring_index(col("concept2"), ":", 1) === "OP")
      .select(col("concept2").as("subject_id"), col("concept1").as("object_id"))
      .withColumn("predicate_uri",
        when(pmod(Hash60.id(concat_ws("|", col("subject_id"), col("object_id"))), lit(2)) === 0,
          lit(RoLocatedIn)).otherwise(lit(RoHasPhenotype)))

  /** line — the concept-pairs file serialization: one
    * `subject_uri \t object_uri \t predicate_uri` line per domain pair. */
  def serializePairsFile(annots: DataFrame): DataFrame =
    domainPairs(annots).select(concat_ws("\t",
      uriOf(col("subject_id")), uriOf(col("object_id")), col("predicate_uri")).as("line"))

  /** subject_curie, object_curie, predicate_biolink — the positive pairs
    * for the target predicate, parsed back out of the file lines
    * (ConceptPairsFileParser.extractPositivePairs:36-62: split on tabs,
    * filter predicate, OBO URI → curie, predicate → biolink). */
  def parsePositivePairs(lines: DataFrame,
                         targetPredicateUri: String = RoLocatedIn): DataFrame = {
    val cols = split(col("line"), "\t")
    lines.where(trim(col("line")) =!= "")
      .select(cols.getItem(0).as("subject_uri"), cols.getItem(1).as("object_uri"),
        cols.getItem(2).as("predicate_uri"))
      .where(col("predicate_uri") === targetPredicateUri)
      .select(curieOf(col("subject_uri")).as("subject_curie"),
        curieOf(col("object_uri")).as("object_curie"),
        lit(BiolinkOf(targetPredicateUri)).as("predicate_biolink"))
      .distinct()
  }

  /** Negative chunk size (the reference's negObjCurieCount = 1000,
    * ConceptPairsFileParser.java:100; small here so the subdivision is
    * exercised at test scale). */
  val NegChunkSize = 4

  /** subject_curie, chunk_id, n_objects, object_curies, predicate_biolink —
    * the negative pairs (extractNegativePairs:71-120): for each subject
    * with positives, every target-predicate object curie it was NOT paired
    * with, subdivided into chunks of [[NegChunkSize]]
    * (subdivideNegativeCuries:123-138; the reference's HashSet chunk order
    * is JVM-iteration-dependent — here chunks fill in sorted object order,
    * the only well-defined assignment). The per-subject ranking window is
    * key-partitioned and bounded by the object-curie vocabulary. */
  def negativePairs(lines: DataFrame,
                    targetPredicateUri: String = RoLocatedIn): DataFrame = {
    val pos = parsePositivePairs(lines, targetPredicateUri)
    val subjects = pos.select("subject_curie").distinct()
    // the object-curie side is the target predicate's object VOCABULARY
    // (ontology-sized, never corpus-sized) — broadcast-declared small
    val objects = broadcast(pos.select("object_curie").distinct())
    val candidates = subjects.crossJoin(objects)
    val negatives = candidates.join(pos.select("subject_curie", "object_curie"),
      Seq("subject_curie", "object_curie"), "left_anti")
    negatives
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("subject_curie").orderBy("object_curie")))
      .withColumn("chunk_id", ((col("rn") - 1) / NegChunkSize).cast("long"))
      .groupBy("subject_curie", "chunk_id")
      .agg(count(lit(1)).as("n_objects"),
        array_join(array_sort(collect_list(col("object_curie"))), "|").as("object_curies"))
      .withColumn("predicate_biolink", lit("false"))
  }

  /** Concept ids too general to anchor a negative example
    * (ConceptPairSentenceExtractor.IDENTIFIERS_TO_EXCLUDE:59-74 — e.g.
    * `protein`, `cell`, `disease`). */
  val IdentifiersToExclude: Seq[String] = Seq("OP:scan", "DS:data")

  val SubjectPlaceholder = "@OPERATION$"
  val ObjectPlaceholder = "@DATASHAPE$"

  /** subject_curie, object_curie, doc_id, sent_id, label, masked — the
    * masked BERT training lines for every (pair, sentence) where the
    * sentence's annotations contain the pair
    * (ConceptPairsSentenceExtractorMain.getBertTrainingLines:290-416).
    *
    * Mention typing per the reference: exact subject curie → SUBJECT, an
    * object curie → OBJECT, else same-prefix → SUBJECT_TYPE/OBJECT_TYPE;
    * excluded ids dropped first. Overlap hygiene in the reference's order:
    * TYPE mentions overlapping a SUBJECT/OBJECT mention are removed
    * (:334-354), SUBJECT_TYPE overlapping OBJECT_TYPE removed (:359-368,
    * the MONDO/HP same-span case — realized here by the promoted-id
    * expansion, which puts e.g. OP:join and OP:JOINLIKE on one span), and
    * a SUBJECT mention overlapping an OBJECT mention is removed (:370-379).
    * Positives = surviving SUBJECT × OBJECT with the pair's predicate;
    * negatives = (SUBJECT ∪ SUBJECT_TYPE) × (OBJECT ∪ OBJECT_TYPE) minus
    * both-ends-positive, labeled `false` (:418-452). Lines deduplicate per
    * (pair, document) — the reference's alreadyPrinted scope.
    *
    * Every step is an equi-join on (doc_id, sent_id) or an in-row array
    * op; the pair table broadcasts. No per-pair scans. */
  def pairSentences(docs: DataFrame, annots: DataFrame, pairs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val w = TextOps.SentWindow
    // mention table with promoted-id expansion (same span, promoted curie)
    val base = annots.select(col("doc_id"),
      expr(s"(ord - 1) div $w").as("sent_id"), col("ord"), col("concept_id"))
    val promoted = base
      .join(broadcast(graft.functions.ConceptDict.promotionsDF(spark)), "concept_id")
      .select(col("doc_id"), col("sent_id"), col("ord"),
        col("promoted_id").as("concept_id"))
    val mentions = base.unionByName(promoted).distinct()
      .where(!col("concept_id").isin(IdentifiersToExclude: _*))
      .withColumn("prefix", substring_index(col("concept_id"), ":", 1))

    val p = broadcast(pairs.select(col("subject_curie"), col("object_curie"),
      col("predicate_biolink")))

    // per (pair, sentence): typed mentions — join once on the subject
    // prefix side and once on exact curies; a sentence qualifies when it
    // holds a SUBJECT and an OBJECT mention
    val subjM = mentions.join(p, mentions("concept_id") === p("subject_curie"))
      .select(col("subject_curie"), col("object_curie"), col("predicate_biolink"),
        col("doc_id"), col("sent_id"), col("ord").as("subj_ord"))
    val objM = mentions.join(p, mentions("concept_id") === p("object_curie"))
      .select(col("subject_curie"), col("object_curie"),
        col("doc_id"), col("sent_id"), col("ord").as("obj_ord"))
    val inSent = subjM.join(objM,
      Seq("subject_curie", "object_curie", "doc_id", "sent_id"))
      .select("subject_curie", "object_curie", "predicate_biolink", "doc_id", "sent_id")
      .distinct()

    // typed mention sets per qualifying (pair, sentence)
    val m = inSent.join(mentions, Seq("doc_id", "sent_id"))
      .withColumn("mtype",
        when(col("concept_id") === col("subject_curie"), "S")
          .when(col("concept_id") === col("object_curie"), "O")
          .when(col("prefix") === substring_index(col("subject_curie"), ":", 1), "ST")
          .when(col("prefix") === substring_index(col("object_curie"), ":", 1), "OT"))
      .where(col("mtype").isNotNull)
      .select("subject_curie", "object_curie", "predicate_biolink",
        "doc_id", "sent_id", "ord", "mtype")

    val key = Seq("subject_curie", "object_curie", "doc_id", "sent_id")
    def typed(t: String*) = m.where(col("mtype").isin(t: _*))
    // overlap = same ord (single-token mentions; span identity)
    def minus(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b.select((key :+ "ord").map(col): _*).distinct(),
        key :+ "ord", "left_anti")

    val so = typed("S", "O")
    val st1 = minus(typed("ST"), so)
    val ot1 = minus(typed("OT"), so)
    val st2 = minus(st1, ot1) // SUBJECT_TYPE overlapping OBJECT_TYPE removed
    val sFinal = minus(typed("S"), typed("O")) // S overlapping O removed
    val oFinal = typed("O")

    val posPairs = sFinal.select((key :+ "predicate_biolink").map(col) :+ col("ord").as("subj_ord"): _*)
      .join(oFinal.select(key.map(col) :+ col("ord").as("obj_ord"): _*), key)
      .select(col("subject_curie"), col("object_curie"), col("doc_id"), col("sent_id"),
        col("subj_ord"), col("obj_ord"), col("predicate_biolink").as("label"))

    val negSubj = sFinal.select(key.map(col) :+ col("ord"): _*).unionByName(
      st2.select(key.map(col) :+ col("ord"): _*)).distinct()
    val negObj = oFinal.select(key.map(col) :+ col("ord"): _*).unionByName(
      ot1.select(key.map(col) :+ col("ord"): _*)).distinct()
    val posSet = sFinal.select(key.map(col) :+ col("ord"): _*).unionByName(
      oFinal.select(key.map(col) :+ col("ord"): _*)).distinct()
    val negPairs = negSubj.withColumnRenamed("ord", "subj_ord")
      .join(negObj.withColumnRenamed("ord", "obj_ord"), key)
      // not (both ends in the positive-pair mention set)
      .join(posSet.select(key.map(col) :+ col("ord").as("subj_ord") :+ lit(1).as("sp"): _*),
        key :+ "subj_ord", "left")
      .join(posSet.select(key.map(col) :+ col("ord").as("obj_ord") :+ lit(1).as("op"): _*),
        key :+ "obj_ord", "left")
      .where(col("sp").isNull || col("op").isNull)
      .select(col("subject_curie"), col("object_curie"), col("doc_id"), col("sent_id"),
        col("subj_ord"), col("obj_ord"), lit("false").as("label"))

    val all = posPairs.unionByName(negPairs)

    // mask the sentence in-row: rebuild from the sentence token array with
    // the two mention ordinals replaced by the class placeholders
    val sents = TextOps.sentences(docs).select(col("doc_id"), col("sent_id"),
      col("sent_text"))
    all.join(sents, Seq("doc_id", "sent_id"))
      .withColumn("base_ord", col("sent_id") * w)
      .withColumn("masked", array_join(zip_with(
        split(col("sent_text"), " "),
        sequence(col("base_ord") + 1, col("base_ord") + size(split(col("sent_text"), " "))),
        (tok, ordc) => when(ordc === col("subj_ord"), lit(SubjectPlaceholder))
          .when(ordc === col("obj_ord"), lit(ObjectPlaceholder))
          .otherwise(tok)), " "))
      .select("subject_curie", "object_curie", "doc_id", "sent_id", "label", "masked")
      .distinct()
  }
}
