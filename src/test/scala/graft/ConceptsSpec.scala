package graft

import graft.operators.{Concepts, TextOps}
import org.apache.spark.sql.functions._

class ConceptsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("dictionary recognition annotates known tokens with concept ids") {
    val r = Concepts.recognize(docs("the join is fast")).orderBy("ord").collect()
    assert(r.map(_.getAs[String]("concept_id")).toSet == Set("OP:join", "SZ:fast"))
    // 'the' is not in the dictionary, 'is' neither
    assert(r.length == 2)
  }

  test("recognized spans cover the token text") {
    val text = "merge small table scan"
    val r = Concepts.recognize(docs(text)).collect()
    r.foreach { row =>
      val cs = row.getAs[Long]("char_start").toInt
      val ce = row.getAs[Long]("char_end").toInt
      assert(text.substring(cs, ce) == row.getAs[String]("tok"))
    }
  }

  test("postProcess removes annotations nested inside longer spans") {
    import spark.implicits._
    // hand-built annots: 'b' [2,4) nested inside 'a' [0,6)
    val annots = Seq(
      (0L, "X:a", 1L, "abcdef", 0L, 6L),
      (0L, "X:b", 1L, "cd", 2L, 4L),
      (1L, "X:c", 1L, "cd", 2L, 4L))
      .toDF("doc_id", "concept_id", "ord", "tok", "char_start", "char_end")
    val kept = Concepts.postProcess(annots).select("concept_id").as[String].collect().toSet
    assert(kept == Set("X:a", "X:c"))
  }

  test("postProcess dedups identical (doc, concept, span) rows") {
    val annots = Seq(
      (0L, "X:a", 1L, "tok", 0L, 3L),
      (0L, "X:a", 1L, "tok", 0L, 3L))
      .toDF("doc_id", "concept_id", "ord", "tok", "char_start", "char_end")
    assert(Concepts.postProcess(annots).count() == 1L)
  }

  test("filterViaCrf keeps only concepts overlapping a CRF span") {
    val concepts = Seq(
      (0L, "X:a", 1L, "aa", 0L, 2L),
      (0L, "X:b", 2L, "bb", 10L, 12L))
      .toDF("doc_id", "concept_id", "ord", "tok", "char_start", "char_end")
    val crf = Seq((0L, 1L, 1L, 3L)).toDF("doc_id", "ord", "char_start", "char_end")
    val kept = Concepts.filterViaCrf(concepts, crf).select("concept_id").as[String].collect()
    assert(kept.toSeq == Seq("X:a"))
  }
}
