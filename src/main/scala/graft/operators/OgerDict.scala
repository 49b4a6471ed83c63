package graft.operators

import graft.functions.ConceptDict
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OGER dictionary-file construction.
  *
  * The reference builds the concept-recognition dictionaries its OGER stage
  * loads from per-ontology factory classes
  * (reference: oger/util/OgerDictFileFactory.java — the shared synonym
  * selection / case-sensitivity split / dict-line machinery — plus one
  * subclass per ontology under oger/dict/). Each factory walks an ontology
  * serially on one machine; here the same per-class rule chains are column
  * and array expressions over a corpus-scale class table, so a dictionary
  * build over a 100M-class ontology is a shuffle-free scan (the per-class
  * synonym set is one array cell — every rule is an in-row HOF; the only
  * wide stages in this family are the explicit roll-up/promotion joins).
  *
  * The synthetic class universe is derived from the `part` table: one
  * ontology class per part, synonym sets assembled from the part's
  * name/type/brand/size so that every rule in the reference chain has both
  * firing and non-firing rows (deterministic `p_partkey` modulus channels,
  * same device as `concepts_ext_revert`). The DuckDB oracle twins derive
  * the identical universe.
  */
object OgerDict {

  // ---------------------------------------------------------------- shared

  /** The scalar core of OgerDictFileFactory.isCaseSensitive
    * (reference: oger/util/OgerDictFileFactory.java:185-224):
    * (1) `s.matches("^\\d")` — Java matches() anchors BOTH ends, so this
    * fires only for a single-digit string (kept faithfully, quirk and all);
    * (2) more than 40% of the trimmed string is uppercase-or-digit — the
    * float compare `(float) uc / len > 0.4f` is re-expressed as the exact
    * integer test `10*uc > 4*len` (equal for every string short of ~1e8
    * chars, where float rounding could diverge);
    * (3) a lowercase letter immediately followed by an uppercase one. */
  private def csScalar(c: Column): Column = {
    val t = trim(c)
    val ucDigits = length(t) - length(regexp_replace(t, "[A-Z0-9]", ""))
    c.rlike("^[0-9]$") ||
      (length(t) > lit(0) && ucDigits * lit(10) > length(t) * lit(4)) ||
      c.rlike("[a-z][A-Z]")
  }

  /** Full isCaseSensitive: the scalar core, or — for multi-token strings —
    * any single token passing the scalar core (the recursive call in the
    * reference bottoms out after one level because tokens contain no
    * spaces; reference: OgerDictFileFactory.java:216-223). */
  def isCaseSensitive(c: Column): Column = {
    val toks = split(c, " ")
    csScalar(c) || (size(toks) > lit(1) && exists(toks, t => csScalar(t)))
  }

  /** OgerDictFileFactory.fixLabel (reference: oger/util/
    * OgerDictFileFactory.java:640-662): unescape `\"` → `"`; if the label
    * ends with a quote and `label.split("\"").length` is odd, drop that
    * final quote (Java split discards trailing empty segments, so the
    * parity test is: after stripping ALL trailing quotes the remainder is
    * non-empty and contains an even number of quotes); strip one trailing
    * ` (parenthetical)`; trim. */
  def fixLabel(c: Column): Column = {
    val unesc = regexp_replace(c, "\\\\\"", "\"")
    val rt = regexp_replace(unesc, "\"+$", "")
    val quotes = length(rt) - length(regexp_replace(rt, "\"", ""))
    val oddSegments = length(rt) > lit(0) && quotes % 2 === lit(0)
    val stripped = when(unesc.endsWith("\"") && oddSegments,
      unesc.substr(lit(1), length(unesc) - 1)).otherwise(unesc)
    trim(regexp_replace(stripped, " \\([^)]+\\)$", ""))
  }

  /** All-caps gene-symbol alternate (reference: OgerDictFileFactory.java:
    * 150-170): for a synonym wholly matching `[A-Z]+[0-9]+`, add the
    * variant with only the first letter uppercase (BRCA1 → Brca1). */
  private val GeneSymbolRe = "^[A-Z]+[0-9]+$"

  private def geneAlt(c: Column): Column =
    concat(upper(c.substr(lit(1), lit(1))), lower(c.substr(lit(2), length(c))))

  /** Case-sensitivity split + alternates + per-class line dedup over a
    * per-class synonym array, exploded to one row per dictionary line
    * (reference: OgerDictFileFactory.java:90-105 writes the CS set — which
    * includes the generated alternates — to the case_sensitive file and
    * the remainder, minus anything in the CS set, to case_insensitive;
    * writeDictLine:585-591 dedups identical lines, which within one class
    * is exactly an array_distinct; getDictLine:617-638 trims syn/label).
    * Input df must carry concept_id, label, syns (array<string>). */
  private def assemble(df: DataFrame, ontKey: String, mainType: String): DataFrame = {
    val syns = array_distinct(transform(col("syns"), s => trim(s)))
    val cs = filter(syns, s => isCaseSensitive(s))
    val csAll = array_distinct(concat(cs,
      transform(filter(cs, s => s.rlike(GeneSymbolRe)), s => geneAlt(s))))
    val ci = array_except(syns, csAll)
    df.select(col("concept_id"), col("label"),
        explode(concat(
          transform(csAll, s => struct(s.as("syn"), lit(true).as("cs"))),
          transform(ci, s => struct(s.as("syn"), lit(false).as("cs"))))).as("e"))
      .select(lit(ontKey).as("ont_key"), col("concept_id"),
        col("e.syn").as("syn"), trim(col("label")).as("label"),
        lit(mainType).as("main_type"), col("e.cs").as("case_sensitive"))
  }

  private def notNull(a: Column): Column = filter(a, s => s.isNotNull)

  private val pk = col("p_partkey")

  // ------------------------------------------------------- oger_dict_build

  /** The base factory flow with an identity augment step (reference:
    * oger/util/OgerDictFileFactory.java:51-113 createOgerDictionaryFile —
    * label+EXACT synonyms, fixLabels, case split, alternates, dedup —
    * with the pass-through augment of
    * oger/dict/UtilityOgerDictFileFactory.java:47-50).
    *
    * Synthetic synonym channels: the part name (case-insensitive side); a
    * ` (type)` parenthetical variant and, on the `%7` channel, a
    * trailing-quote variant — both of which fixLabel must collapse back
    * into the name (their survival as extra rows is the oracle's signal
    * that the rule broke); the all-caps NOUN+size symbol, which must land
    * case-sensitive AND generate the Titlecase alternate; and the all-caps
    * type, case-sensitive with no alternate (no trailing digits). */
  def build(part: DataFrame): DataFrame = {
    val raw = array(
      col("p_name"),
      concat(col("p_name"), lit(" ("), col("p_type"), lit(")")),
      when(pk % 7 === 0, concat(col("p_name"), lit("\""))),
      concat(upper(element_at(split(col("p_name"), " "), 2)), col("p_size")),
      col("p_type"))
    val classes = part.select(
      concat(lit("P:"), pk).as("concept_id"),
      col("p_name").as("label"),
      array_distinct(transform(notNull(raw), fixLabel _)).as("syns"))
    assemble(classes, "P", "part")
  }

  // ------------------------------------------------------- oger_dict_chebi

  /** The CHEBI chain (reference: oger/dict/ChebiOgerDictFileFactory.java:
    * 75-146): stopword removal, minimum length 3, the complicated-name
    * filter (≥5 hyphen-tokens or ≥4 comma-tokens dropped — counted here as
    * separator counts, identical for strings that do not end in a
    * separator), per-class specific-synonym removal (the static
    * iri→synonym map of filterSpecificSynonyms:128-143, stood in by the
    * `%19` channel removing the class's own name), THEN the chemical
    * formula annotation added after the filters (addChemicalFormula:
    * 94-113 — formulas bypass the name filters), and finally the
    * excluded-individual classes emptied (`%23` channel standing in for
    * EXCLUDED_INDIVIDUAL_CLASSES:38-72). */
  def chebi(part: DataFrame): DataFrame = {
    val hyphenated = concat(regexp_replace(col("p_name"), " ", "-"),
      lit("-"), lower(col("p_type")))
    val raw = array(
      col("p_name"),
      hyphenated,
      when(pk % 13 === 0, concat(hyphenated, lit("-alpha-beta"))),
      when(pk % 9 === 0,
        concat(col("p_name"), lit(", "), lower(col("p_type")), lit(", grade, pure"))),
      when(pk % 11 === 0, lit("the")),
      when(pk % 13 === 5, col("p_name").substr(1, 2)))
    val stop = ConceptDict.stopwords.map(_.toLowerCase)
    val fixed = array_distinct(transform(notNull(raw), fixLabel _))
    val afterStop = filter(fixed, s => !lower(s).isin(stop: _*))
    val afterLen = filter(afterStop, s => length(s) >= 3)
    val afterShape = filter(afterLen, s =>
      length(s) - length(regexp_replace(s, "-", "")) < 4 &&
        length(s) - length(regexp_replace(s, ",", "")) < 3)
    val afterSpecific = when(pk % 19 === 0,
      filter(afterShape, s => s =!= col("p_name"))).otherwise(afterShape)
    val formula = concat(lit("C"), col("p_size"), lit("H"), (col("p_size") * 2))
    val withFormula = array_distinct(concat(afterSpecific, array(formula)))
    val syns = when(pk % 23 === 0, array().cast("array<string>")).otherwise(withFormula)
    val classes = part.select(
      concat(lit("CHEBI:"), pk).as("concept_id"),
      col("p_name").as("label"), syns.as("syns"))
    assemble(classes, "CHEBI", "chemical")
  }

  // ---------------------------------------------------- oger_dict_drugbank

  /** The DrugBank chain (reference: oger/dict/DrugbankOgerDictFileFactory
    * .java:53-137): records whose description mentions allergenic/animal
    * extract are skipped outright (`%29` channel); the augment removes
    * stopwords and short synonyms, empties the excluded individuals
    * (`%23`), and — tested against the ORIGINAL synonym set, as the
    * reference does — empties any class with a synonym matching the
    * extract/venom/dander/allergenic/stomach/liver word patterns (`%31`
    * channel plants a 'liver extract' synonym). No fixLabels here: the
    * DrugBank flow reads records, not ontology labels. */
  def drugbank(part: DataFrame): DataFrame = {
    val desc = concat(lit("standard "), lower(col("p_type")), lit(" part"),
      when(pk % 29 === 0, lit(" allergenic")).otherwise(lit("")))
    val raw = notNull(array(
      col("p_name"),
      col("p_brand"),
      when(pk % 31 === 0, concat(col("p_name"), lit(" liver extract")))))
    val bodyRe = "\\b([Ee]xtracts?|[Vv]enom|[Dd]ander|[Aa]llergenic|[Ss]tomach|[Ll]iver)\\b"
    val classDropped = exists(raw, s => s.rlike(bodyRe))
    val stop = ConceptDict.stopwords.map(_.toLowerCase)
    val afterStop = filter(array_distinct(raw), s => !lower(s).isin(stop: _*))
    val afterLen = filter(afterStop, s => length(s) >= 3)
    val excluded = (pk % 23 === 0) || classDropped
    val classes = part
      .where(!desc.contains("allergenic") && !desc.contains("animal extract"))
      .select(concat(lit("DRUGBANK:DB"), pk).as("concept_id"),
        col("p_name").as("label"),
        when(excluded, array().cast("array<string>")).otherwise(afterLen).as("syns"))
    assemble(classes, "DrugBank", "drug")
  }

  // ------------------------------------------------------- oger_dict_mondo

  /** The MONDO chain (reference: oger/dict/MondoOgerDictFileFactory.java:
    * 74-170), applied in the reference's order on the evolving set:
    * stopwords; `…virus infection(s)` → add the bare `…virus`
    * (augmentVirusSynonyms:127-141, `%4` channels); `, formerly` /
    * `(formerly)` variants added with the marker removed
    * (augmentSynonymsWithFormerly:109-120, `%6` channels — note a TRAILING
    * ` (formerly)` never reaches the augment because fixLabels strips it
    * as a parenthetical first, so the planted variant carries the marker
    * mid-string); `hemo…` → add `haemo…` (augmentHemoSynonyms:148-157,
    * `%5`); `heart` → add the `cardiac` replacement (augmentHeartSynonyms:
    * 164-173, `%7`); minimum length 4; the specific-synonym map (`%19`
    * stand-in, as in [[chebi]]); excluded individuals emptied (`%23`). */
  def mondo(part: DataFrame): DataFrame = {
    def addVariants(a: Column, pred: Column => Column, f: Column => Column): Column =
      array_distinct(concat(a, transform(filter(a, pred), f)))
    val raw = array(
      col("p_name"),
      when(pk % 4 === 0, concat(col("p_name"), lit(" virus infection"))),
      when(pk % 4 === 1, concat(col("p_name"), lit(" virus infections"))),
      when(pk % 6 === 0, concat(col("p_name"), lit(", formerly"))),
      when(pk % 6 === 3, concat(lit("acute (formerly) "), col("p_name"))),
      when(pk % 5 === 0, concat(lit("hemo"), regexp_replace(col("p_name"), " ", ""))),
      when(pk % 7 === 0, concat(col("p_name"), lit(" heart"))))
    val stop = ConceptDict.stopwords.map(_.toLowerCase)
    val fixed = array_distinct(transform(notNull(raw), fixLabel _))
    val s0 = filter(fixed, s => !lower(s).isin(stop: _*))
    val s1 = addVariants(s0,
      s => s.endsWith("virus infection") || s.endsWith("virus infections"),
      s => when(s.endsWith("virus infections"),
        regexp_replace(s, " infections$", "")).otherwise(regexp_replace(s, " infection$", "")))
    val s2 = addVariants(s1,
      s => s.contains(", formerly") || s.contains("(formerly)"),
      s => when(s.contains(", formerly"), regexp_replace(s, ", formerly", ""))
        .otherwise(regexp_replace(s, "\\(formerly\\)", "")))
    val s3 = addVariants(s2, s => s.startsWith("hemo"),
      s => regexp_replace(s, "hemo", "haemo"))
    val s4 = addVariants(s3, s => s.contains("heart"),
      s => regexp_replace(s, "heart", "cardiac"))
    val s5 = filter(s4, s => length(s) >= 4)
    val s6 = when(pk % 19 === 0, filter(s5, s => s =!= col("p_name"))).otherwise(s5)
    val syns = when(pk % 23 === 0, array().cast("array<string>")).otherwise(s6)
    val classes = part.select(
      concat(lit("MONDO:"), pk).as("concept_id"),
      col("p_name").as("label"), syns.as("syns"))
    assemble(classes, "MONDO", "disease")
  }

  // -------------------------------------------------------- oger_dict_rest

  /** Shared synthetic channels for the residual factories: the name (CI),
    * the all-caps NOUN+size symbol (CS + Titlecase alternate), a stopword
    * on `%11`, and a 2-char synonym on `%13==5` (the min-length rule). */
  private def residualRaw(extra: Column*): Column =
    notNull(array(Seq(
      col("p_name"),
      concat(upper(element_at(split(col("p_name"), " "), 2)), col("p_size")),
      when(pk % 11 === 0, lit("the")),
      when(pk % 13 === 5, col("p_name").substr(1, 2))) ++ extra: _*))

  private def fixAll(a: Column): Column = array_distinct(transform(a, fixLabel _))

  /** removeStopWords + removeWordsLessThenLength(3) — the shared head of
    * every residual augmentSynonyms override. */
  private def stdFilters(a: Column): Column = {
    val stop = ConceptDict.stopwords.map(_.toLowerCase)
    filter(filter(a, s => !lower(s).isin(stop: _*)), s => length(s) >= 3)
  }

  /** The per-class filterSpecificSynonyms map, stood in by the `%19`
    * channel removing the class's own name (as in [[chebi]]/[[mondo]]). */
  private def specific19(a: Column): Column =
    when(pk % 19 === 0, filter(a, s => s =!= col("p_name"))).otherwise(a)

  /** EXCLUDED_INDIVIDUAL_CLASSES → empty synonym set, `%23` channel. */
  private def empty23(a: Column): Column =
    when(pk % 23 === 0, array().cast("array<string>")).otherwise(a)

  private def addWhen(a: Column, cond: Column, v: Column): Column =
    when(cond, array_distinct(concat(a, array(v)))).otherwise(a)

  private def classesOf(part: DataFrame, idPrefix: String, syns: Column): DataFrame =
    part.select(concat(lit(idPrefix), pk).as("concept_id"),
      col("p_name").as("label"), syns.as("syns"))

  /** The nine residual per-ontology factories as one parameterized family
    * over the shared machinery, unioned with an ont_key discriminator.
    * Each arm applies ITS reference's augmentSynonyms chain in order:
    *
    *  - CL (oger/dict/ClOgerDictFileFactory.java:26-40): stopwords, min-len,
    *    per-class synonym ADDITIONS (:29-34, `%17` channel), then excluded
    *    individuals.
    *  - GO_CC (GoCcOgerDictFileFactory.java:27-48): id add-on `_CC` (:28-30);
    *    its nucleoli addition (:37-39) mutates the PRE-filter set after the
    *    filtered copy was taken — a no-op in the reference, so NO addition
    *    channel here, quirk kept; its excluded set is EMPTY (:32), so no
    *    `%23` empty either.
    *  - GO_BP (GoBpOgerDictFileFactory.java:28-50): `_BP`, specific-synonym
    *    filter, the :33-35 addition (`%17`), excluded.
    *  - GO_MF (GoMfOgerDictFileFactory.java:30-97): `_MF`, specific filter,
    *    then for every synonym ending ` activity` ADD the suffix-stripped
    *    variant (augmentActivitySynonyms:81-90; planted by the `%3`
    *    channel), then excluded.
    *  - HP (HpOgerDictFileFactory.java:34-45): specific filter, excluded.
    *  - UBERON (UberonOgerDictFileFactory.java:22-38): specific filter,
    *    excluded, THEN the eyes/ears pluralization additions (:31-36 run
    *    after the excluded-empty — order kept; `%17` adds noun+'s').
    *  - SO (SoOgerDictFileFactory.java:20-75): the large specific-synonym
    *    map (one `%19` channel), excluded.
    *  - SNOMED procedures (ProcedureOgerDictFileFactory.java:44-120): a
    *    SEPARATE flow — no fixLabels (SNOMED description rows, not OWL
    *    labels), membership in the procedure subtree loaded from the
    *    transitive-subclass file and applied per concept (:36-41, here a
    *    broadcast semi-join against the `p_size%3` projection), the line's
    *    label an arbitrary PRE-augment synonym (:97 — determinized as the
    *    minimum), stopword/min-len/excluded only (its
    *    filterSpecificSynonyms is defined but never called — quirk kept).
    *  - Utility (UtilityOgerDictFileFactory.java:24-37): one constant
    *    case-sensitive line for the document-end marker.
    */
  def residual(part: DataFrame): DataFrame = {
    val spark = part.sparkSession
    import spark.implicits._
    val noun = element_at(split(col("p_name"), " "), 2)

    val cl = assemble(classesOf(part, "CL:",
      empty23(addWhen(stdFilters(fixAll(residualRaw())), pk % 17 === 0,
        lit("outer hair cell")))), "CL", "cell")

    val goCc = assemble(classesOf(part, "GO_CC:",
      stdFilters(fixAll(residualRaw()))), "GO_CC", "cellular_component")

    val goBp = assemble(classesOf(part, "GO_BP:",
      empty23(addWhen(specific19(stdFilters(fixAll(residualRaw()))), pk % 17 === 0,
        lit("alternative splicing")))), "GO_BP", "biological_process")

    val mfRaw = residualRaw(
      when(pk % 3 === 0, concat(lower(col("p_type")), lit(" transporter activity"))))
    val mfSpecific = specific19(stdFilters(fixAll(mfRaw)))
    val mfActivity = array_distinct(concat(mfSpecific,
      transform(filter(mfSpecific, s => s.endsWith(" activity")),
        s => regexp_replace(s, " activity$", ""))))
    val goMf = assemble(classesOf(part, "GO_MF:", empty23(mfActivity)),
      "GO_MF", "molecular_function")

    val hp = assemble(classesOf(part, "HP:",
      empty23(specific19(stdFilters(fixAll(residualRaw()))))), "HP", "phenotype")

    val uberon = assemble(classesOf(part, "UBERON:",
      addWhen(empty23(specific19(stdFilters(fixAll(residualRaw())))), pk % 17 === 0,
        concat(noun, lit("s")))), "UBERON", "anatomy")

    val so = assemble(classesOf(part, "SO:",
      empty23(specific19(stdFilters(fixAll(residualRaw()))))), "SO", "sequence_feature")

    val procRaw = array_distinct(transform(residualRaw(), s => trim(s)))
    val procMembers = broadcast(part.where(col("p_size") % 3 === 0)
      .select(concat(lit("SNOMEDCT:"), pk).as("concept_id")))
    val procClasses = part.select(concat(lit("SNOMEDCT:"), pk).as("concept_id"),
        array_min(procRaw).as("label"), empty23(stdFilters(procRaw)).as("syns"))
      .join(procMembers, Seq("concept_id"), "left_semi")
    val procedure = assemble(procClasses, "SNOMEDCT", "procedure")

    val utility = Seq(("Utility", "TMKPUTIL:1", "zzzDOCUMENTzENDzzz",
      "zzzDOCUMENTzENDzzz", "util", true))
      .toDF("ont_key", "concept_id", "syn", "label", "main_type", "case_sensitive")

    cl.unionByName(goCc).unionByName(goBp).unionByName(goMf).unionByName(hp)
      .unionByName(uberon).unionByName(so).unionByName(procedure).unionByName(utility)
  }

  // ------------------------------------------------------- chem_label_norm

  /** MolePro chemical-label normalization (reference: oger/util/
    * OgerDictFileFactory.java:525-584 processChemicalLabel): drop labels
    * under 4 chars after punctuation removal; exactly one comma → flip the
    * halves (right + space-unless-hyphen + left) and return immediately;
    * two or more commas → drop; over 30% digit-or-whitespace (the
    * reference strips \\d AND \\s before measuring, so whitespace counts
    * toward the "digit" fraction — kept faithfully) → drop; surrounding
    * square brackets removed. The static id+label exclusions (561-581)
    * are data, not mechanics, and are not modeled. Returns one row per
    * surviving label: concept_id, raw_label, label. */
  def chemLabelNorm(part: DataFrame): DataFrame = {
    val raw = notNull(array(
      col("p_name"),
      when(pk % 3 === 0, concat(element_at(split(col("p_name"), " "), 2),
        lit(", "), element_at(split(col("p_name"), " "), 1))),
      when(pk % 5 === 0, concat(lit("["), col("p_name"), lit("]"))),
      when(pk % 7 === 0, concat(col("p_name"), lit(" "), pk)),
      when(pk % 11 === 0, concat(lit("!!"), col("p_name").substr(1, 1))),
      when(pk % 13 === 0, concat(col("p_name"), lit(", a, b")))))
    val rows = part.select(concat(lit("PC:"), pk).as("concept_id"),
      explode(raw).as("raw_label"))
    val s = col("raw_label")
    val noPunct = regexp_replace(s, "\\p{Punct}", "")
    val commas = length(s) - length(regexp_replace(s, ",", ""))
    val digitsAndWs = length(s) - length(regexp_replace(s, "[0-9\\s]", ""))
    // the flip keeps the raw right half (including its leading space)
    val rightRaw = expr("substr(raw_label, instr(raw_label, ',') + 1)")
    val flipped = concat(rightRaw,
      when(rightRaw.endsWith("-"), lit("")).otherwise(lit(" ")),
      expr("substr(raw_label, 1, instr(raw_label, ',') - 1)"))
    val norm = when(length(noPunct) < 4, lit(null))
      .when(commas === 1, flipped)
      .when(commas >= 2, lit(null))
      .when(digitsAndWs * 10 > length(s) * 3, lit(null))
      .when(s.startsWith("[") && s.endsWith("]"), s.substr(lit(2), length(s) - 2))
      .otherwise(s)
    rows.select(col("concept_id"), col("raw_label"), norm.as("label"))
      .where(col("label").isNotNull)
  }

  // ------------------------------------------------------- taxon_promotion

  /** NCBITaxon label promotion (reference: oger/dict/
    * NcbiTaxonOgerDictFileFactory.java:102-175 performPromotion + 200-250
    * prefer): for every dictionary label carried by more than one class,
    * drop each class that has another same-label class among its proper
    * ancestors (keeping the most-general bearer); labels carried by more
    * than 20 classes short-circuit to a single survivor (prefer:211-214 —
    * the reference picks an arbitrary HashSet head, determinized here as
    * the minimum id). The reference's sequential `removed` bookkeeping is
    * re-expressed as the order-independent rule "remove every id with a
    * same-label proper ancestor in the group", which agrees on any
    * hierarchy without removal-order races (and in particular on every
    * chain: all non-roots drop).
    *
    * Synthetic three-level hierarchy: word-level W:noun classes (plus
    * parentless X:noun aliases), name-level N:name under W, and
    * size-variant B:name#size under N (the `%5` sizes). Labels: nouns name
    * {W, X, and every N of that noun} — the pairwise branch keeps {W, X};
    * full names name {N and its B variants} — keeps N; the shared
    * 'universal' label collects ALL B classes — the >20 branch keeps the
    * minimum. Output: label, concept_id (the surviving rows). */
  def taxonPromotion(part: DataFrame): DataFrame = {
    val noun = element_at(split(col("p_name"), " "), 2)
    val bId = concat(lit("B:"), col("p_name"), lit("#"), col("p_size"))
    val isB = col("p_size") % 5 === 0
    // All six label channels derive in ONE scan (struct array + explode +
    // one distinct) instead of a 6-way union of per-channel distincts: the
    // dict subtree is reused four times below (grouping, both self-join
    // sides, the anti-join), and with the union formulation every reuse
    // duplicated the whole 6-scan subtree — the physical plan measured 360
    // parquet scans / 824 aggregates of pure fixed overhead (the
    // r11→r12→r13 2.9→4.1→5.2 s drift was this plan's compile+schedule
    // cost moving with machine state, not data). Channels never collide on
    // (label, id) — W:/X:/N:/B: prefixes and distinct label sources — so
    // one global distinct is row-equivalent to the per-channel distincts.
    // The B-only channels emit null labels on non-B rows, dropped before
    // the distinct. PRECONDITION (ADVICE r13): p_name must be multi-word —
    // on a single-word p_name the noun (element_at(split, 2)) is itself
    // null, so the W/X/Nw channels also null out and the global
    // null-label filter drops them where the old per-channel formulation
    // kept them. TPC-H p_name is always five words, and the DuckDB twin
    // (OracleSql.taxonPromotionSql) has the same multi-word dependence —
    // split_part returns '' there, a different third behavior — so the
    // precondition is pinned here and on the twin rather than guarded.
    val dict = part.select(explode(array(
        struct(noun.as("label"), concat(lit("W:"), noun).as("id")),
        struct(noun.as("label"), concat(lit("X:"), noun).as("id")),
        struct(col("p_name").as("label"), concat(lit("N:"), col("p_name")).as("id")),
        struct(noun.as("label"), concat(lit("N:"), col("p_name")).as("id")),
        struct(when(isB, col("p_name")).as("label"), bId.as("id")),
        struct(when(isB, lit("universal")).as("label"), bId.as("id")))).as("e"))
      .select(col("e.label").as("label"), col("e.id").as("id"))
      .where(col("label").isNotNull).distinct()

    // proper-ancestor edges of the synthetic hierarchy (child, anc) — same
    // single-scan explode shape; B-only channels null out on non-B rows
    val anc = part.select(explode(array(
        struct(concat(lit("N:"), col("p_name")).as("child"), concat(lit("W:"), noun).as("anc")),
        struct(when(isB, bId).as("child"), concat(lit("N:"), col("p_name")).as("anc")),
        struct(when(isB, bId).as("child"), concat(lit("W:"), noun).as("anc")))).as("e"))
      .select(col("e.child").as("child"), col("e.anc").as("anc"))
      .where(col("child").isNotNull).distinct()

    val grouped = dict.groupBy("label")
      .agg(countDistinct(col("id")).as("n"), min(col("id")).as("min_id"))
    val big = grouped.where(col("n") > 20)
      .select(col("label"), col("min_id").as("concept_id"))
    val small = dict.join(grouped.where(col("n") <= 20).select("label"), Seq("label"))
    val removals = small.as("a")
      .join(small.as("b"), col("a.label") === col("b.label") && col("a.id") =!= col("b.id"))
      .join(anc, col("a.id") === anc("child") && col("b.id") === anc("anc"))
      .select(col("a.label").as("label"), col("a.id").as("id")).distinct()
    val kept = small.join(removals, Seq("label", "id"), "left_anti")
      .select(col("label"), col("id").as("concept_id"))
    kept.union(big)
  }

  // -------------------------------------------------------- pr_gene_rollup

  /** PR gene-level synonym roll-up (reference: oger/dict/
    * PrOgerDictFileFactory.java:73-248): family-level classes emit only
    * their own synonyms (the max_norm file); gene-level classes without
    * gene-level children collect EXACT synonyms from themselves plus every
    * descendant (extractSynonyms:250-257), keyed per synonym with the set
    * of contributing class ids — writeDictLines:225-248 joins that source
    * set with '|' as the line's label column, and case-sensitive
    * alternates generated by the split carry no source entry, so they get
    * the literal 'CS_addition'. The per-descendant augment applies the
    * English-word label filter (filterEnglishWordLabels:559-567, via the
    * words_alpha stand-in of [[LabelQa.wordsAlpha]]).
    *
    * Synthetic levels: gene-level = (name, brand); descendants = the parts
    * of that (name, brand), contributing the name, the typed name, the
    * `%5` channel's bare adjective (some of which ARE English words and
    * must drop), and the all-caps NOUN+size symbol (case-sensitive, and
    * its Titlecase alternate must surface as CS_addition); family-level =
    * the noun. One shuffle: the (class, synonym) → source-set aggregation.
    * Output: norm ('min'|'max'), concept_id, syn, sources, case_sensitive. */
  def geneRollup(part: DataFrame): DataFrame = {
    val geneId = concat(lit("G:"), col("p_name"), lit("#"), col("p_brand"))
    val noun = element_at(split(col("p_name"), " "), 2)
    val adj = element_at(split(col("p_name"), " "), 1)
    // per-descendant synonym contributions (source = the contributing class)
    val descRows = part.select(geneId.as("concept_id"),
        explode(notNull(array(
          col("p_name"),
          concat(lower(col("p_type")), lit(" "), col("p_name")),
          when(pk % 5 === 0, adj),
          concat(upper(noun), col("p_size"))))).as("syn0"),
        concat(lit("PR:"), pk).as("source"))
    // gene-level classes' own synonym: name (type) — fixLabel collapses it
    val ownRows = part.select(geneId.as("concept_id"),
        concat(col("p_name"), lit(" ("), col("p_brand"), lit(")")).as("syn0"),
        geneId.as("source")).distinct()
    val english = LabelQa.wordsAlpha.map(_.toLowerCase)
    val minRows = descRows.union(ownRows)
      .select(col("concept_id"), fixLabel(col("syn0")).as("syn"), col("source"))
      .where(!lower(col("syn")).isin(english: _*))
      .groupBy(col("concept_id"), col("syn"))
      .agg(array_join(array_sort(collect_set(col("source"))), "|").as("sources"))
      .withColumn("norm", lit("min"))
    // family-level: own synonyms only (no descendant roll-up)
    val maxRows = part.select(concat(lit("F:"), noun).as("concept_id"),
        noun.as("syn")).distinct()
      .withColumn("sources", col("concept_id"))
      .withColumn("norm", lit("max"))
    val base = minRows.unionByName(maxRows)
      .withColumn("case_sensitive", isCaseSensitive(col("syn")))
    val alts = base.where(col("case_sensitive") && col("syn").rlike(GeneSymbolRe))
      .select(col("concept_id"), geneAlt(col("syn")).as("syn"),
        lit("CS_addition").as("sources"), col("norm"), lit(true).as("case_sensitive"))
    // an alternate that already exists as a row keeps its sourced line
    val freshAlts = alts.join(base.select("concept_id", "syn"),
      Seq("concept_id", "syn"), "left_anti")
    base.select("norm", "concept_id", "syn", "sources", "case_sensitive")
      .unionByName(freshAlts.select("norm", "concept_id", "syn", "sources", "case_sensitive"))
  }

  // --------------------------------------------------- oger_dict_entry_map

  /** concept_id, entries — the id → `|`-joined dictionary-entry-set map
    * over the dict-file family (reference: etl/util/
    * IdToOgerDictEntryMapFileFactory.java:27-60 — cols[2]=id, cols[3]=entry
    * accumulated into a one-to-many unique map across the input dict files,
    * then written `id \t entry1|entry2|...`). The reference's HashMap/
    * HashSet iteration order is JVM-dependent; the sorted set join is the
    * deterministic choice. One groupBy with map-side-combinable collect_set
    * — the map is ontology-sized, never corpus-sized. */
  def idToEntryMap(dictRows: DataFrame*): DataFrame =
    dictRows.map(_.select("concept_id", "syn")).reduce(_ unionByName _)
      .groupBy("concept_id")
      .agg(array_join(array_sort(collect_set(col("syn"))), "|").as("entries"))

  // ----------------------------------------------------- mondo_hp_equiv

  /** indicator, hp_id, mondo_ids, hp_label, mondo_labels — HP→MONDO
    * equivalence-map DERIVATION (reference: etl/util/
    * MondoToHpEquivalenceMapFileFactory.java:41-186). The reference walks
    * two OWL files and connects an HP class to MONDO classes through two
    * channels: (1) DIRECT — a MONDO class carries an oboInOwl:hasDbXref to
    * the HP id (:90-99); (2) INDIRECT — a MONDO skos:exactMatch curie
    * (MSH:/UMLS:/SNOMEDCT_US:, :67-88) and an HP hasDbXref land on the
    * same external id, and every such co-cited HP×MONDO combination pairs
    * (:124-146). Per HP row it writes (:173-182) an indicator — `**` when
    * any pairing is direct, else `####` when any MONDO label matches the
    * HP label case-insensitively (:160-168 equalsIgnoreCase), else empty —
    * plus the `|`-joined MONDO ids and their labels in the same order.
    * The reference iterates HashSets (JVM-dependent order); ids sort
    * ascending here and labels ride in id order — the deterministic choice
    * a diffable 100 TB export needs.
    *
    * Synthetic class universe from `part` (same device as the sibling
    * dict factories): every part is a MONDO class (label = p_name); even
    * keys are also HP classes (label = upper(p_name) on key%4==0 — the
    * equalsIgnoreCase channel — else p_name + ' variant'); key%6==0 MONDO
    * classes xref their own HP id (direct channel); key%5==0 MONDO and
    * key%10==0 HP classes cite an external curie keyed by (key%3 prefix,
    * p_brand, key div 64 block) (indirect channel). Every reference branch
    * has firing and non-firing rows — the self co-citation (key%10==0
    * implies key%5==0, identical curie by construction) guarantees
    * indirect pairs at every corpus size. Plan: ontology-sized equi-joins
    * only — the indirect channel joins through the curie key, never a
    * label cross join. The `div 64` block keeps curie CARDINALITY
    * proportional to the class universe so each co-citation group stays
    * constant-bounded (≤13 MONDO + ≤7 HP citers per curie) — the property
    * real curies have (a UMLS CUI maps to a handful of classes), and what
    * keeps the join linear-in-classes: the r14 sf1.0 probe caught the
    * prefix×brand-only key going quadratic (constant #groups × linearly
    * growing groups → 32× wall-clock at 10× rows). */
  def mondoHpEquiv(part: DataFrame): DataFrame = {
    val k = col("p_partkey")
    val mondo = part.select(concat(lit("MONDO:"), k).as("mondo_id"),
      col("p_name").as("mondo_label"))
    val hp = part.where(k % 2 === 0).select(concat(lit("HP:"), k).as("hp_id"),
      when(k % 4 === 0, upper(col("p_name")))
        .otherwise(concat(col("p_name"), lit(" variant"))).as("hp_label"))
    val direct = part.where(k % 6 === 0).select(
      concat(lit("HP:"), k).as("hp_id"),
      concat(lit("MONDO:"), k).as("mondo_id"), lit(true).as("direct"))
    val curie = concat(
      when(k % 3 === 0, lit("MSH:"))
        .when(k % 3 === 1, lit("UMLS:"))
        .otherwise(lit("SNOMEDCT_US:")),
      col("p_brand"), lit("#"), expr("p_partkey div 64"))
    val mx = part.where(k % 5 === 0)
      .select(curie.as("curie"), concat(lit("MONDO:"), k).as("mondo_id")).distinct()
    val hx = part.where(k % 10 === 0)
      .select(curie.as("curie"), concat(lit("HP:"), k).as("hp_id")).distinct()
    val indirect = hx.join(mx, "curie")
      .select(col("hp_id"), col("mondo_id"), lit(false).as("direct"))
    val pairs = direct.unionByName(indirect)
      .groupBy("hp_id", "mondo_id").agg(max("direct").as("direct"))
    pairs.join(hp, "hp_id").join(mondo, "mondo_id")
      .withColumn("exact", lower(col("hp_label")) === lower(col("mondo_label")))
      .groupBy("hp_id")
      .agg(
        max("direct").as("any_direct"), max("exact").as("any_exact"),
        graft.functions.Agg.orderedStringAgg(col("mondo_id"), col("mondo_id"), "|").as("mondo_ids"),
        min("hp_label").as("hp_label"),
        graft.functions.Agg.orderedStringAgg(col("mondo_id"), col("mondo_label"), "|").as("mondo_labels"))
      .select(
        when(col("any_direct"), "**").when(col("any_exact"), "####")
          .otherwise("").as("indicator"),
        col("hp_id"), col("mondo_ids"), col("hp_label"), col("mondo_labels"))
  }
}
