package graft

import graft.operators.XmlIngest

/** Medline/JATS schema-fidelity checks mirroring the reference's own
  * MedlineXmlToTextFnTest semantics (title + labeled-abstract assembly,
  * pub-year default) on micro-fixtures. */
class XmlIngestSpec extends SparkSpec {
  import spark.implicits._

  // doc 7: 25 tokens → title (w0) + two abstract windows; 7 % 7 == 0 → no
  // <Year> element in the serialized citation. doc 8: 5 tokens → title only.
  private val docs = Seq(
    (7L, (1 to 25).map(i => s"t$i").mkString(" "), "en", "s", 120L),
    (8L, "only five tokens right here", "en", "s", 28L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("medline parse: labeled abstract sections join with \\n; doc text = title\\n\\nabstract") {
    val r = XmlIngest.medlineRoundTrip(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    val title7 = (1 to 10).map(i => s"t$i").mkString(" ")
    val abs7 = (11 to 20).map(i => s"t$i").mkString(" ") + "\n" + (21 to 25).map(i => s"t$i").mkString(" ")
    assert(r(7L).getAs[String]("title") == title7)
    assert(r(7L).getAs[String]("abstract") == abs7)
    assert(r(7L).getAs[String]("doc_text") == s"$title7\n\n$abs7")
    assert(r(7L).getAs[String]("pmid") == "PMID:7")
  }

  test("medline parse: missing PubDate year defaults to 2155; title-only doc has no abstract") {
    val r = XmlIngest.medlineRoundTrip(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(7L).getAs[String]("year") == XmlIngest.DefaultPubYear) // 7 % 7 == 0
    assert(r(8L).getAs[String]("year") == "1998") // 8 % 30 + 1990
    assert(r(8L).getAs[String]("abstract") == "")
    assert(r(8L).getAs[String]("doc_text") == "only five tokens right here")
  }

  test("medline metadata flatten: journal-issue fields land, missing fields become '-'") {
    val r = XmlIngest.medlineMetadata(XmlIngest.serializeMedline(docs)).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 7: %7==0 → no Year → '-' (the metadata path hyphenates, it does
    // NOT apply the text path's 2155 default); %4!=0 → Volume present
    assert(r(7L).getAs[String]("year") == "-")
    assert(r(7L).getAs[String]("volume") == "8")    // 7 % 50 + 1
    assert(r(7L).getAs[String]("month") == "Aug")   // MonthAbbrevs(7 % 12)
    assert(r(7L).getAs[String]("journal") == "Journal of Spark Topic 7")
    assert(r(7L).getAs[String]("article_abstract").startsWith("t11 "))
    // doc 8: %4==0 → no Volume; %8... year present; title-only → abstract '-'
    assert(r(8L).getAs[String]("volume") == "-")
    assert(r(8L).getAs[String]("year") == "1998")
    assert(r(8L).getAs[String]("journal_abbrev") == "J Spark 8")
    assert(r(8L).getAs[String]("article_abstract") == "-")
    assert(r(8L).getAs[String]("pmid") == "PMID:8")
  }

  test("update files: revised articles carry year+1, DeleteCitation lists retracted pmids, upsert applies both") {
    // hash(doc_id) = (doc_id * 2654435761) % 1000: pick fixture ids landing
    // in each slice — updated (<100), retracted (>=900), untouched
    def h(id: Long) = java.lang.Math.floorMod(id * 2654435761L, 1000L)
    val ids = (1L to 2000L)
    val updId = ids.find(i => h(i) < 100).get
    val delId = ids.find(i => h(i) >= 900).get
    val keepId = ids.find(i => h(i) >= 100 && h(i) < 900 && i % 7 != 0).get
    val dd = Seq(updId, delId, keepId)
      .map(i => (i, (1 to 15).map(k => s"w$k").mkString(" "), "en", "s", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val files = XmlIngest.serializeMedlineUpdateFiles(dd)
    val arts = XmlIngest.parseUpdateFileArticles(files).collect()
    assert(arts.map(_.getAs[Long]("doc_id")).toSeq == Seq(updId))
    if (updId % 7 != 0)
      assert(arts.head.getAs[String]("year") == (updId % 30 + 1991).toString)
    val dels = XmlIngest.parseUpdateFileDeletes(files).collect()
    assert(dels.map(_.getAs[Long]("doc_id")).toSeq == Seq(delId))
    assert(dels.head.getAs[Long]("file_id") == delId % XmlIngest.UpdateFileMod)
    val merged = XmlIngest.medlineUpsertWithDeletes(dd).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(!merged.contains(delId), "retracted PMID must vanish")
    assert(merged.contains(keepId))
    if (updId % 7 != 0)
      assert(merged(updId).getAs[String]("year") == (updId % 30 + 1991).toString,
        "revised citation must win the upsert")
  }

  test("sub/sup annotations: spans index the cleaned text and validate covered_text") {
    val r = XmlIngest.medlineSubSupRoundTrip(docs).collect()
    val clean = XmlIngest.medlineRoundTrip(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("doc_text")).toMap
    assert(r.nonEmpty)
    // the validateObservedAnnotations contract: covered text == substring
    r.foreach { x =>
      val (id, s, e) = (x.getAs[Long]("doc_id"), x.getAs[Long]("char_start").toInt,
        x.getAs[Long]("char_end").toInt)
      assert(clean(id).substring(s, e) == x.getAs[String]("covered_text"),
        s"span mismatch for doc $id")
    }
    // doc 7 (odd): title token 2 in sub, abstract token 1 in sup
    val by = r.groupBy(x => (x.getAs[Long]("doc_id"), x.getAs[String]("ann_type")))
    assert(by((7L, "sub")).head.getAs[String]("covered_text") == "t2")
    assert(by((7L, "sup")).head.getAs[String]("covered_text") == "t11")
    // doc 8 (even) title-only: sup ann on title, no abstract ann
    assert(by((8L, "sup")).head.getAs[String]("covered_text") == "five")
    assert(!by.contains((8L, "sub")))
  }

  test("jats parse: doi attribute value, abstract/body paragraphs, null sections skipped in doc_text") {
    val r = XmlIngest.jatsRoundTrip(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(7L).getAs[String]("doi") == "10.1101/7")
    // 25 tokens → abstract = windows 1-2, body = none (no window 3)
    assert(r(7L).getAs[String]("body") == "")
    val title7 = (1 to 10).map(i => s"t$i").mkString(" ")
    assert(r(7L).getAs[String]("doc_text").startsWith(title7 + "\n\n"))
    assert(r(8L).getAs[String]("doc_text") == "only five tokens right here")
  }
}
