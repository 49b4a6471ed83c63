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

  test("depParseKernel: kernel-returned CoNLL-U parses identically to the direct round trip") {
    val d = docs("join table fast customer", (1 to 12).map(_ => "sort").mkString(" "))
    val direct = Conllu.roundTrip(d).orderBy("doc_id", "sent_id", "tok_id").collect().toSeq
    val viaKernel = Conllu.depParseKernel(d).orderBy("doc_id", "sent_id", "tok_id").collect().toSeq
    assert(viaKernel == direct)
    assert(viaKernel.nonEmpty)
  }

  test("depParseKernel launches one parser child per non-empty partition") {
    val pidFile = java.nio.file.Files.createTempFile("graft-depparse-pids", ".txt")
    val cmd = Seq("/bin/sh", "-c", s"echo $$$$ >> $pidFile; exec /bin/cat")
    val many = (0 until 40).map(i => (i.toLong, "join sort merge", "en", "s", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars").repartition(4)
    assert(Conllu.depParseKernel(many, cmd).count() > 0)
    val pids = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(pidFile)).asScala.filter(_.nonEmpty)
    assert(pids.distinct.size == pids.size)
    assert(pids.size <= 4, s"expected at most one child per partition, saw: $pids")
    assert(pids.nonEmpty)
  }

  test("bertImport reconstructs spans, merging adjacent same-label runs like the reference fixTag") {
    // tokens: join(OP) sort(OP) zzz(O) table(DS) — expect [join sort](OP), [table](DS)
    val tagged = Seq(
      (1L, 1L, "join", 0L, 4L, "B-OP"),
      (1L, 2L, "sort", 5L, 9L, "B-OP"), // B after same label ⇒ merged (fixTag)
      (1L, 3L, "zzz", 10L, 13L, "O"),
      (1L, 4L, "table", 14L, 19L, "I-DS")) // I after O ⇒ starts a new entity
      .toDF("doc_id", "ord", "tok", "char_start", "char_end", "tag")
    val r = Conllu.bertImport(tagged).orderBy("t_num")
      .select("t_num", "label", "char_start", "char_end", "covered_text")
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(r == Seq((1L, "OP", 0L, 9L, "join sort"), (2L, "DS", 14L, 19L, "table")))
  }
}
