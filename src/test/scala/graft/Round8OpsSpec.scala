package graft

import graft.operators.{Dedup, TextOps, TextStats}

/** Round-8 operators: corpus-frequency boilerplate removal, sliding-window
  * RAG chunking, and the fastText-shaped hashing-trick quality classifier.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // one full 10-token sentence window (SentWindow = 10)
  private val chrome = "all rights reserved terms of service privacy policy contact us"
  // exactly 10 tokens, so each doc = chrome window + one unique window
  private def unique(i: Int) =
    s"unique body content number $i with several distinct tokens here"

  test("boilerplate windows in >=3 docs are removed from every doc") {
    val r = Dedup.boilerplateStrip(
      docs(s"$chrome ${unique(1)}", s"$chrome ${unique(2)}", s"$chrome ${unique(3)}"))
      .orderBy("doc_id").collect()
    assert(r.length == 3)
    r.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[String]("clean_text") == unique(i + 1))
      assert(row.getAs[Long]("n_kept") == 1L && row.getAs[Long]("n_removed") == 1L)
    }
  }

  test("a window shared by only 2 docs is below the boilerplate threshold") {
    val r = Dedup.boilerplateStrip(
      docs(s"$chrome ${unique(1)}", s"$chrome ${unique(2)}", unique(3)))
      .orderBy("doc_id").collect()
    assert(r.forall(_.getAs[Long]("n_removed") == 0L))
    assert(r(0).getAs[String]("clean_text") == s"$chrome ${unique(1)}")
  }

  test("chunkStride windows overlap by window-stride tokens and cover the text") {
    val toks = (1 to 12).map(i => s"t$i")
    val r = TextOps.chunkStride(docs(toks.mkString(" ")))
      .orderBy("chunk_id").collect()
    // w=8, s=4 over 12 tokens -> chunks at ords [1,8], [5,12], [9,12]
    assert(r.map(_.getAs[Long]("chunk_id")).toSeq == Seq(0L, 1L, 2L))
    assert(r.map(_.getAs[Long]("n_tokens")).toSeq == Seq(8L, 8L, 4L))
    assert(r(0).getAs[String]("chunk_text") == toks.take(8).mkString(" "))
    assert(r(1).getAs[String]("chunk_text") == toks.slice(4, 12).mkString(" "))
    assert(r(2).getAs[String]("chunk_text") == toks.slice(8, 12).mkString(" "))
    // char spans index into the original text
    val text = toks.mkString(" ")
    r.foreach { row =>
      val (s0, e0) = (row.getAs[Long]("char_start").toInt, row.getAs[Long]("char_end").toInt)
      assert(text.substring(s0, e0) == row.getAs[String]("chunk_text"))
    }
  }

  test("quality classifier scores are deterministic, bounded, and count 2n-1 features") {
    val t = "spark plans are declarative and the optimizer does the physical work"
    val r = TextStats.qualityClassifier(docs(t, t)).collect()
    assert(r.length == 2)
    val n = t.split(" ").length
    r.foreach { row =>
      assert(row.getAs[Long]("n_feats") == 2L * n - 1)
      val score = row.getAs[Double]("score")
      assert(score >= -1.0 && score <= 1.0)
      assert(row.getAs[Boolean]("keep") == row.getAs[Long]("score_raw") > 0)
    }
    // same text => identical score on both docs
    assert(r.map(_.getAs[Double]("score")).distinct.length == 1)
  }
}
