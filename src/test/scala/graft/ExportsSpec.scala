package graft

import graft.operators.{Concepts, Exports, TextOps}
import org.apache.spark.sql.functions._

/** Per-page brat file bodies (E9b): page-continuous span offsets, page-scoped
  * T numbering, DONE-terminated txt bodies — validated by rebuilding each
  * page's text and indexing every ann span back into it. */
class ExportsSpec extends SparkSpec {
  import spark.implicits._

  test("annotationBatchFiles emits page-consistent ann/txt bodies") {
    // 2 docs x 2 sentence-windows each, every sentence holding dictionary
    // tokens so annotations exist; perPage=3 forces two pages for 4 sents
    val texts = Seq(
      "join alpha table beta sort gamma one two three four " +
        "merge delta row epsilon five six seven eight nine ten",
      "scan zeta column theta filter iota eleven twelve thirteen fourteen " +
        "key kappa value lambda fifteen sixteen seventeen eighteen nineteen twenty")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val sents = TextOps.sentences(d)
    val prev = Seq.empty[String].toDF("sent_hash")
    val batch = Exports.annotationBatch(sents, prev, batchSize = 100, perPage = 3)
    val pp = Concepts.postProcess(Concepts.recognize(d))
    val files = Exports.annotationBatchFiles(batch, sents, pp).collect()

    val pages = batch.collect().groupBy(_.getAs[Long]("page"))
    assert(pages.size == 2)
    for ((pg, rows) <- pages) {
      val txt = files.filter(_.getAs[String]("file") == s"batch_$pg.txt")
        .sortBy(_.getAs[Long]("line_no")).map(_.getAs[String]("line"))
      val expected =
        rows.sortBy(_.getAs[Long]("pos")).map(_.getAs[String]("sent_text")) :+ "DONE"
      assert(txt.toSeq == expected.toSeq)
      // offsets advance by sentence length + 1 per sentence, so every ann
      // span must index into the page's newline-joined sentence text
      val pageText = expected.dropRight(1).mkString("\n") + "\n"
      val ann = files.filter(_.getAs[String]("file") == s"batch_$pg.ann")
        .sortBy(_.getAs[Long]("line_no")).map(_.getAs[String]("line"))
      assert(ann.nonEmpty)
      ann.zipWithIndex.foreach { case (line, i) =>
        val m = "^T(\\d+)\\t([a-z]+) (\\d+) (\\d+)\\t(.+)$".r.findFirstMatchIn(line)
          .getOrElse(fail(s"malformed ann line: $line"))
        assert(m.group(1).toInt == i + 1, s"non-contiguous T numbering at: $line")
        assert(pageText.substring(m.group(3).toInt, m.group(4).toInt) == m.group(5),
          s"span does not cover its text: $line")
      }
    }
  }
}
