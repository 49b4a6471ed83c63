package graft

import graft.operators.OgerDict
import org.apache.spark.sql.functions._

/** Reference-rule fixtures for the OGER dictionary-factory family
  * (reference: oger/util/OgerDictFileFactory.java and the oger/dict
  * subclasses — see OgerDict.scala's per-method citations). */
class OgerDictSpec extends SparkSpec {
  import spark.implicits._

  private def cs(s: String): Boolean =
    Seq(s).toDF("v").select(OgerDict.isCaseSensitive(col("v"))).head.getBoolean(0)

  private def fix(s: String): String =
    Seq(s).toDF("v").select(OgerDict.fixLabel(col("v"))).head.getString(0)

  /** p_partkey-indexed synthetic part rows (schema of the testdata table). */
  private def parts(rows: (Long, String, String, String, Int)*) =
    rows.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")

  // ---------------------------------------------------------- isCaseSensitive

  test("isCaseSensitive: the single-digit matches() quirk (rule 1)") {
    // Java matches("^\\d") anchors BOTH ends: fires ONLY for one digit
    assert(cs("7"))
    assert(!cs("7abc")) // starts with a digit but is not a single digit
  }

  test("isCaseSensitive: >40% uppercase-or-digit as exact integers (rule 2)") {
    assert(cs("ABC d"))    // 3/5 = 60%
    assert(!cs("Abcde"))   // 1/5 = 20%
    assert(!cs("ABcde"))   // exactly 40% must NOT fire (strict >)
    assert(cs("AB1cd"))    // digits count toward the fraction: 3/5
  }

  test("isCaseSensitive: lowercase immediately followed by uppercase (rule 3)") {
    assert(cs("aB"))
    assert(!cs("ab"))
    // NOT a counter-case: 'a B' is still CS — the token recursion sees the
    // all-uppercase single-char token 'B' (rule 2 at 100%)
    assert(cs("a B"))
  }

  test("isCaseSensitive: multi-token strings fire when any token fires") {
    // whole string: 3/10 = 30% (no), no [a-z][A-Z]; token 'DNA' = 100% (yes)
    assert(cs("bigger DNA"))
    assert(!cs("bigger dna"))
  }

  // ----------------------------------------------------------------- fixLabel

  test("fixLabel: unescapes backslash-quote") {
    assert(fix("ab\\\"c") == "ab\"c")
  }

  test("fixLabel: trailing-quote strip follows Java split parity") {
    // Java: split("\"").length odd → drop the final quote
    assert(fix("foo\"") == "foo")     // ["foo"] → 1, odd → strip
    assert(fix("fo\"o\"") == "fo\"o\"") // ["fo","o"] → 2, even → keep
  }

  test("fixLabel: strips one trailing parenthetical and trims") {
    assert(fix("name (disambiguation)") == "name")
    assert(fix("name (a) (b)") == "name (a)") // only the last one
    assert(fix("  padded  ") == "padded")
  }

  // -------------------------------------------------------------------- build

  test("build: case split, gene alternates, fixLabel collapse, line dedup") {
    // pk=7 also exercises the trailing-quote channel
    val out = OgerDict.build(parts((7L, "cold widget", "Brand#1", "ECONOMY", 24)))
      .collect().map(r => (r.getAs[String]("syn"), r.getAs[Boolean]("case_sensitive"))).toSet
    // name (CI); '(type)' parenthetical and trailing-quote variants collapse
    // into the name via fixLabel (no extra rows); WIDGET24 is CS with its
    // Titlecase alternate; the all-caps type is CS with NO alternate
    assert(out == Set(
      ("cold widget", false),
      ("WIDGET24", true), ("Widget24", true),
      ("ECONOMY", true)))
    val row = OgerDict.build(parts((7L, "cold widget", "Brand#1", "ECONOMY", 24)))
      .where(col("syn") === "cold widget").head
    assert(row.getAs[String]("label") == "cold widget")
    assert(row.getAs[String]("concept_id") == "P:7")
    assert(row.getAs[String]("main_type") == "part")
  }

  // -------------------------------------------------------------------- chebi

  test("chebi: stopword, min-length, shape filters; formula bypasses them") {
    // pk=55: %11==0 plants 'the' (stopword), %5 not used here
    val out = OgerDict.chebi(parts((55L, "cold widget", "Brand#1", "ECONOMY", 3)))
      .collect().map(_.getAs[String]("syn")).toSet
    assert(!out.contains("the"))
    assert(out.contains("C3H6")) // the formula annotation (added after filters)
    assert(out.contains("cold widget"))
  }

  test("chebi: the complicated-name filter drops >=4 hyphens / >=3 commas") {
    // pk=117: %13==0 plants hyphenated+'-alpha-beta' (4 hyphens) and %9==0
    // plants the 3-comma variant — both must drop; the 2-hyphen base stays
    val out = OgerDict.chebi(parts((117L, "cold widget", "Brand#1", "ECONOMY", 5)))
      .collect().map(_.getAs[String]("syn")).toSet
    assert(out.contains("cold-widget-economy"))
    assert(!out.exists(_.endsWith("-alpha-beta")))
    assert(!out.exists(_.contains(", grade, pure")))
  }

  test("chebi: min length 3 drops the 2-char channel; %23 empties the class") {
    // pk=18: %13==5 plants the substr(1,2) 2-char synonym
    val short = OgerDict.chebi(parts((18L, "cold widget", "Brand#1", "ECONOMY", 5)))
      .collect().map(_.getAs[String]("syn"))
    assert(!short.contains("co"))
    // pk=23: excluded individual → zero dictionary lines
    assert(OgerDict.chebi(parts((23L, "cold widget", "Brand#1", "ECONOMY", 5))).count() == 0L)
  }

  // ----------------------------------------------------------------- drugbank

  test("drugbank: allergenic records skipped; body-part synonyms empty the class") {
    // pk=29: description carries 'allergenic' → record skipped outright
    assert(OgerDict.drugbank(parts((29L, "cold widget", "Brand#1", "ECONOMY", 5))).count() == 0L)
    // pk=31: a 'liver extract' synonym empties the class (tested against the
    // ORIGINAL set, so the name itself vanishes too)
    assert(OgerDict.drugbank(parts((31L, "cold widget", "Brand#1", "ECONOMY", 5))).count() == 0L)
    // a clean record keeps name + brand
    val out = OgerDict.drugbank(parts((1L, "cold widget", "Brand#1", "ECONOMY", 5)))
      .collect().map(_.getAs[String]("syn")).toSet
    assert(out == Set("cold widget", "Brand#1"))
  }

  // -------------------------------------------------------------------- mondo

  test("mondo: virus-infection / formerly / hemo / heart augments in order") {
    // pk=120: %4==0 (virus infection), %6==0 (', formerly'), %5==0 (hemo)
    val out = OgerDict.mondo(parts((120L, "cold widget", "Brand#1", "ECONOMY", 5)))
      .collect().map(_.getAs[String]("syn")).toSet
    assert(out.contains("cold widget virus infection"))
    assert(out.contains("cold widget virus")) // the bare-virus augment
    assert(out.contains("cold widget, formerly"))
    assert(out.contains("cold widget")) // the formerly-removed variant
    assert(out.contains("hemocoldwidget"))
    assert(out.contains("haemocoldwidget")) // the haemo augment
    // pk=7: heart → cardiac replacement ADDED (original kept)
    val heart = OgerDict.mondo(parts((7L, "cold widget", "Brand#1", "ECONOMY", 5)))
      .collect().map(_.getAs[String]("syn")).toSet
    assert(heart.contains("cold widget heart") && heart.contains("cold widget cardiac"))
  }

  test("mondo: min length 4 and excluded individuals") {
    // a 3-char name with no augment channels (pk=2) leaves only the bare
    // name, which the min-length-4 filter drops → zero dictionary lines
    assert(OgerDict.mondo(parts((2L, "oka", "Brand#1", "ECONOMY", 5))).count() == 0L)
    assert(OgerDict.mondo(parts((23L, "cold widget", "Brand#1", "ECONOMY", 5))).count() == 0L)
  }

  // ----------------------------------------------------------- chemLabelNorm

  test("chemLabelNorm: one-comma flip keeps the raw right half") {
    // pk=3: the flip channel 'widget, cold' → ' cold widget' (the reference
    // concatenates parts[1] + ' ' + parts[0] without trimming)
    val out = OgerDict.chemLabelNorm(parts((3L, "cold widget", "Brand#1", "ECONOMY", 5)))
      .collect().map(r => r.getAs[String]("raw_label") -> r.getAs[String]("label")).toMap
    assert(out("widget, cold") == " cold widget")
    assert(out("cold widget") == "cold widget")
  }

  test("chemLabelNorm: two-comma drop, short-after-punct drop, bracket strip") {
    // pk=13: ', a, b' channel → 2 commas → dropped
    val out13 = OgerDict.chemLabelNorm(parts((13L, "cold widget", "Brand#1", "ECONOMY", 5)))
      .collect().map(_.getAs[String]("raw_label")).toSet
    assert(!out13.exists(_.endsWith(", a, b")))
    // pk=11: '!!c' → 1 char after punct removal → dropped
    val out11 = OgerDict.chemLabelNorm(parts((11L, "cold widget", "Brand#1", "ECONOMY", 5)))
      .collect().map(_.getAs[String]("raw_label")).toSet
    assert(!out11.exists(_.startsWith("!!")))
    // pk=5: surrounding brackets removed
    val out5 = OgerDict.chemLabelNorm(parts((5L, "cold widget", "Brand#1", "ECONOMY", 5)))
      .collect().map(r => r.getAs[String]("raw_label") -> r.getAs[String]("label")).toMap
    assert(out5("[cold widget]") == "cold widget")
  }

  test("chemLabelNorm: >30% digit-or-whitespace drops (whitespace counts)") {
    // pk=7 plants 'ab cd 7': 1 digit + 2 spaces = 3/7 = 43% > 30% → dropped
    val out = OgerDict.chemLabelNorm(parts((7L, "ab cd", "Brand#1", "ECONOMY", 5)))
      .collect().map(_.getAs[String]("raw_label")).toSet
    assert(!out.contains("ab cd 7"))
  }

  // ------------------------------------------------------------ taxonPromotion

  test("taxonPromotion: same-label descendants drop, parentless aliases stay") {
    val p = parts(
      (1L, "cold widget", "Brand#1", "ECONOMY", 1),
      (2L, "small widget", "Brand#2", "PROMO", 10)) // size%5==0 → B variant
    val out = OgerDict.taxonPromotion(p).collect()
      .map(r => r.getString(0) -> r.getString(1)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    // 'widget' is borne by W:widget, X:widget and both N classes: the N
    // classes have the same-label ancestor W → only {W, X} survive
    assert(out("widget") == Set("W:widget", "X:widget"))
    // 'small widget' is borne by N and its B size variant: B drops
    assert(out("small widget") == Set("N:small widget"))
    assert(out("cold widget") == Set("N:cold widget"))
  }

  test("taxonPromotion: >20 bearers short-circuit to the minimum id") {
    // 21 size%5==0 parts all bear the shared 'universal' label
    val p = parts((1L to 21L).map(i =>
      (i, f"name$i%02d widget", "Brand#1", "ECONOMY", 5)): _*)
    val out = OgerDict.taxonPromotion(p).collect()
      .map(r => r.getString(0) -> r.getString(1))
    val universal = out.filter(_._1 == "universal").map(_._2)
    assert(universal.toSeq == Seq("B:name01 widget#5"))
  }

  // --------------------------------------------------------------- geneRollup

  test("geneRollup: source sets pipe-joined, CS_addition alternates, word filter") {
    val p = parts(
      (2L, "cold widget", "Brand#1", "ECONOMY", 24),
      (4L, "cold widget", "Brand#1", "PROMO", 24),
      (5L, "big widget", "Brand#2", "ECONOMY", 7)) // %5==0 plants adj 'big'
    val rows = OgerDict.geneRollup(p).collect()
    val byKey = rows.map(r => (r.getAs[String]("concept_id"), r.getAs[String]("syn")) -> r).toMap
    // two descendants of the same gene both contribute the name → sorted
    // pipe-joined source set
    val name = byKey(("G:cold widget#Brand#1", "cold widget"))
    assert(name.getAs[String]("sources").split('|').toSeq.sorted ==
      name.getAs[String]("sources").split('|').toSeq)
    assert(name.getAs[String]("sources").contains("PR:2") &&
      name.getAs[String]("sources").contains("PR:4"))
    assert(name.getAs[String]("norm") == "min")
    // the all-caps symbol is CS and its Titlecase alternate is CS_addition
    assert(byKey(("G:cold widget#Brand#1", "WIDGET24")).getAs[Boolean]("case_sensitive"))
    assert(byKey(("G:cold widget#Brand#1", "Widget24")).getAs[String]("sources") == "CS_addition")
    // 'big' is an English word (words_alpha stand-in) → filtered out
    assert(!byKey.contains(("G:big widget#Brand#2", "big")))
    // family-level rows carry max norm and only their own synonym
    assert(byKey(("F:widget", "widget")).getAs[String]("norm") == "max")
  }
}
