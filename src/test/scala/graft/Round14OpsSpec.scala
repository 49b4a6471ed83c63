package graft

import graft.operators.{Exports, OgerDict}
import org.apache.spark.sql.functions._

class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- pubannotation_import

  test("pubannotationImport parses denotations and recovers covered text by substring") {
    // PubAnnotationDocumentReader.java:92-95 — one annotation per
    // denotation, covered text = documentText.substring(begin, end)
    val docs = Seq((7L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val pa = Seq((7L,
      """{"target":"doc:7","denotations":[""" +
        """{"id":"T1","span":{"begin":0,"end":5},"obj":"OP:1"},""" +
        """{"id":"T2","span":{"begin":6,"end":10},"obj":"DS:2"}]}"""))
      .toDF("doc_id", "pubannotation")
    val got = Exports.pubannotationImport(docs, pa)
      .orderBy("char_start")
      .select("doc_id", "concept_id", "char_start", "char_end", "tok")
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(got == Seq((7L, "OP:1", 0L, 5L, "alpha"), (7L, "DS:2", 6L, 10L, "beta")))
  }

  test("pubannotationImport merges _lexicallyChainedTo fragments into the subject's aggregate span") {
    // PubAnnotationDocumentReader.java:103-112 — a lexically-chained
    // relation means subj and obj are fragments of ONE discontinuous
    // annotation: subj absorbs obj's span (addSpan) and obj leaves the
    // annotation map; the flat model represents the merged annotation by
    // its aggregate span (the reader's getAggregateSpan). A non-chained
    // relation predicate (:113-115) keeps both endpoint rows.
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val pa = Seq((1L,
      """{"target":"doc:1","denotations":[""" +
        """{"id":"T1","span":{"begin":0,"end":5},"obj":"OP:head"},""" +
        """{"id":"T2","span":{"begin":11,"end":16},"obj":"OP:frag"},""" +
        """{"id":"T3","span":{"begin":17,"end":22},"obj":"DS:rel"}],""" +
        """"relations":[""" +
        """{"pred":"_lexicallyChainedTo","subj":"T1","obj":"T2"},""" +
        """{"pred":"part_of","subj":"T3","obj":"T1"}]}"""))
      .toDF("doc_id", "pubannotation")
    val got = Exports.pubannotationImport(docs, pa)
      .orderBy("char_start")
      .select("concept_id", "char_start", "char_end", "tok")
      .as[(String, Long, Long, String)].collect().toSeq
    // T2 merged into T1 (span 0..16, subject's concept id kept); T3 intact
    assert(got == Seq(
      ("OP:head", 0L, 16L, "alpha beta gamma"),
      ("DS:rel", 17L, 22L, "delta")))
  }

  test("pubannotation export → import round-trips the annotation set") {
    val docs = Seq(
      (1L, "red part order line spark"),
      (2L, "blue part nothing here at")).toDF("doc_id", "text")
    val annots = Seq(
      (1L, "OP:9", 0L, 3L, "red"),
      (1L, "DS:4", 9L, 14L, "order"),
      (2L, "OP:9", 0L, 4L, "blue"))
      .toDF("doc_id", "concept_id", "char_start", "char_end", "tok")
    val back = Exports.pubannotationImport(docs, Exports.pubannotation(annots))
      .orderBy("doc_id", "char_start")
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(back == Seq(
      (1L, "OP:9", 0L, 3L, "red"),
      (1L, "DS:4", 9L, 14L, "order"),
      (2L, "OP:9", 0L, 4L, "blue")))
  }

  // ----------------------------------------------------- mondo_hp_equiv

  test("mondoHpEquiv derives direct, indirect, and label-match channels with the reference indicators") {
    // MondoToHpEquivalenceMapFileFactory.java:90-99 (direct hasDbXref),
    // :67-88 + :124-146 (skos curie co-citation), :160-182 (indicator:
    // ** direct beats #### exact-label beats empty). Keys chosen so each
    // channel fires: 12 → direct (12%6=0); 20 → indirect self-pair with
    // matching label (20%10=0, 20%4=0, 20%6!=0 → '####'); 10 → indirect
    // with ' variant' label (10%4!=0 → no match → '');
    // 30 → direct AND exact (30%6=0 wins '**').
    val part = Seq(
      (10L, "one common name", "B#1"),
      (12L, "two common name", "B#2"),
      (20L, "three common name", "B#1"),
      (30L, "four common name", "B#3"),
      (15L, "five common name", "B#1"), // mondo-side curie only (15%5=0, odd → no HP)
      (7L, "seven common name", "B#9")) // fires nothing
      .toDF("p_partkey", "p_name", "p_brand")
    val got = OgerDict.mondoHpEquiv(part).collect()
      .map(r => r.getString(1) -> (r.getString(0), r.getString(2), r.getString(3), r.getString(4)))
      .toMap
    // 12: direct pair with itself, label 'two common name variant' (12%4=0? 12%4==0 → upper!)
    // recompute: 12%4==0 so hp_label = upper → exact matches too, but direct wins
    assert(got("HP:12") == ("**", "MONDO:12", "TWO COMMON NAME", "two common name"))
    // 20: curie-indirect (20%5=0 and 20%10=0 share curie), 20%4=0 → upper label → exact → '####';
    //     brand B#1 also co-cites MONDO:10 and MONDO:15 (10%5=0, 15%5=0, all %3-compatible?)
    //     10%3=1→UMLS, 15%3=0→MSH, 20%3=2→SNOMEDCT_US — different prefixes, so no cross-pairing
    assert(got("HP:20") == ("####", "MONDO:20", "THREE COMMON NAME", "three common name"))
    // 10: 10%10=0 → hx curie SNOMEDCT? 10%3=1 → UMLS:B#1; mondo side needs k%5=0 with
    //     UMLS prefix + B#1: only k=10 itself (10%5=0) → self-pair; 10%4!=0 → ' variant' → ''
    assert(got("HP:10") == ("", "MONDO:10", "one common name variant", "one common name"))
    // 30: direct (30%6=0) → '**'
    assert(got("HP:30")._1 == "**")
    // 7 and 15 produce no HP rows
    assert(!got.contains("HP:7") && !got.contains("HP:15"))
  }

  test("mondoHpEquiv rolls multiple mondo ids up per hp id, sorted, labels in id order") {
    // two MONDO classes sharing one curie with one HP class: both pair,
    // ids pipe-join ascending, labels ride in the same order
    val part = Seq(
      (20L, "alpha name", "BB"),   // HP + mondo curie (20%5=0, 20%10=0), SNOMEDCT_US:BB
      (50L, "beta name", "BB"),    // mondo curie only (50%5=0, 50%3=2 → SNOMEDCT_US:BB)
      (3L, "gamma name", "ZZ"))    // inert
      .toDF("p_partkey", "p_name", "p_brand")
    val r = OgerDict.mondoHpEquiv(part).where(col("hp_id") === "HP:20").collect().head
    assert(r.getAs[String]("mondo_ids") == "MONDO:20|MONDO:50")
    assert(r.getAs[String]("mondo_labels") == "alpha name|beta name")
    // 20%4=0 → hp label upper('alpha name') matches MONDO:20's label → '####'
    assert(r.getAs[String]("indicator") == "####")
  }
}
