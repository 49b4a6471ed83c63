package graft

import graft.operators.{Conllu, SentencePairs, Concepts}

class ConlluSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("build→parse round-trip preserves every token with its sentence position") {
    val text = (1 to 12).map(_ => "join").mkString(" ") // 12 tokens -> 2 sentences
    val r = Conllu.roundTrip(docs(text)).orderBy("sent_id", "tok_id").collect()
    assert(r.length == 12)
    assert(r.map(_.getAs[Long]("sent_id")).toSet == Set(0L, 1L))
    assert(r.forall(_.getAs[String]("upos") == "OP"))
    assert(r.take(10).map(_.getAs[Long]("tok_id")).toSeq == (1L to 10L))
  }

  test("upos reflects dictionary group; unknown tokens are X") {
    val r = Conllu.roundTrip(docs("join table fast customer zzz"))
      .orderBy("tok_id").select("form", "upos").as[(String, String)].collect()
    assert(r.toSeq == Seq("join" -> "OP", "table" -> "DS", "fast" -> "SZ",
      "customer" -> "ENT", "zzz" -> "X"))
  }
}
