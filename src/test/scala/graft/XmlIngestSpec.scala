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
