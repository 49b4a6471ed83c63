package graft

import graft.operators.{Concepts, SentencePairs}

class SentencePairsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("extracts OP×DS pairs only within the same sentence window") {
    // sentence 1 (tokens 1-10) has join+table; sentence 2 (tokens 11+) has only merge
    val text = "join aa table bb cc dd ee ff gg hh merge xx yy zz qq ww rr tt uu vv"
    val annots = Concepts.postProcess(Concepts.recognize(docs(text)))
    val pairs = SentencePairs.extract(annots).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getAs[String]("concept_x") == "OP:join")
    assert(p.getAs[String]("concept_y") == "DS:table")
    assert(p.getAs[Long]("sent_id") == 0L)
  }

  test("keyword-constrained extraction keeps only sentences containing a keyword") {
    // both windows have an OP×DS pair; only the first contains a keyword
    val withKw = "join aa table bb cc merge dd ee ff gg join xx table yy zz qq ww rr tt uu"
    val d = docs(withKw)
    val annots = Concepts.postProcess(Concepts.recognize(d))
    val all = SentencePairs.extract(annots).collect()
    assert(all.map(_.getAs[Long]("sent_id")).toSet == Set(0L, 1L))
    val kw = SentencePairs.extractWithKeyword(d, annots, keywords = Seq("Merge", "vector")).collect()
    assert(kw.map(_.getAs[Long]("sent_id")).toSet == Set(0L)) // case-insensitive match
    assert(kw.forall(_.getAs[String]("keyword") == "merge"))
  }

  test("blinded sentence replaces both mentions with placeholders") {
    val text = "join aa table bb cc dd ee ff gg hh"
    val d = docs(text)
    val annots = Concepts.postProcess(Concepts.recognize(d))
    val r = SentencePairs.extractWithBlinded(d, annots).collect().head
    assert(r.getAs[String]("blinded_sentence") ==
      "@CONCEPT_X$ aa @CONCEPT_Y$ bb cc dd ee ff gg hh")
  }

  test("semmed eval rows: token distance, edge pmid support, reference bucket thresholds") {
    // doc 0 and doc 1 both assert (join, table) in a sentence → pmid_count 2;
    // doc 2 asserts (merge, table) once → pmid_count 1. Distances differ.
    val d = docs(
      "join aa table bb cc dd ee ff gg hh",   // join@1, table@3 → 1 intervening
      "join xx yy zz qq table ww rr tt uu",   // join@1, table@6 → 4 intervening
      "merge table bb cc dd ee ff gg hh ii")  // merge@1, table@2 → 0 intervening
    val annots = Concepts.postProcess(Concepts.recognize(d))
    val r = SentencePairs.semmedEvalRows(d, annots).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("subj_concept")) -> x).toMap
    val r0 = r((0L, "OP:join"))
    assert(r0.getAs[Long]("intervening_tokens") == 1L)
    assert(r0.getAs[String]("token_bucket") == "TOKEN_1")
    assert(r0.getAs[Long]("pmid_count") == 2L)
    assert(r0.getAs[String]("pmid_bucket") == "PMID_2_4")
    assert(r0.getAs[Long]("sentence_tokens") == 10L)
    assert(r0.getAs[String]("sem_types") == "OP_DS")
    val r1 = r((1L, "OP:join"))
    assert(r1.getAs[Long]("intervening_tokens") == 4L)
    assert(r1.getAs[String]("token_bucket") == "TOKEN_2_4")
    assert(r1.getAs[Long]("pmid_count") == 2L)
    val r2 = r((2L, "OP:merge"))
    assert(r2.getAs[Long]("intervening_tokens") == 0L)
    assert(r2.getAs[String]("token_bucket") == "TOKEN_0")
    assert(r2.getAs[Long]("pmid_count") == 1L)
    assert(r2.getAs[String]("pmid_bucket") == "PMID_1")
  }

  test("dp input block carries comments, spans, and underscore-joins multi-word mentions") {
    val text = "join aa table bb cc dd ee ff gg hh"
    val d = docs(text)
    // hand-built annots so the X mention's covered text contains a space —
    // the case the reference's underscore rule exists for
    val annots = Seq(
      (0L, "OP:join", 1L, "join phase", 0L, 4L),
      (0L, "DS:table", 3L, "table", 8L, 13L))
      .toDF("doc_id", "concept_id", "ord", "tok", "char_start", "char_end")
    val r = SentencePairs.dpInput(d, annots).collect().head.getAs[String]("dp_input")
    val lines = r.split("\n")
    assert(lines(0) == "###C: SENTENCE\t0\t0\t0")
    assert(lines(1) == "###C: ENTITY\tOP:join\t0|4\tjoin phase")
    assert(lines(2) == "###C: ENTITY\tDS:table\t8|13\ttable")
    // sentence line: token at the X ordinal underscore-joined (the document
    // token itself is single-word here; the transform applies the rule to
    // whatever covered text sits at that ordinal)
    assert(lines(3).startsWith("join") && lines(3).contains("table"))
    // multi-word replacement rule itself, in isolation
    import org.apache.spark.sql.functions._
    val u = Seq("red blood cells").toDF("t")
      .select(regexp_replace(col("t"), " ", "_")).as[String].head()
    assert(u == "red_blood_cells")
  }

  test("relation paths group pairs by the between-mentions token sequence") {
    // two docs, same 'join ... of ... table' context → one path with support 2
    val d = docs("join speed of table bb cc dd ee ff gg",
                 "join speed of table xx yy zz qq ww rr")
    val annots = Concepts.postProcess(Concepts.recognize(d))
    val r = SentencePairs.relationPaths(d, annots).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("path") == "speed of")
    assert(r.head.getAs[Long]("support") == 2L)
    assert(r.head.getAs[Long]("n_distinct_pairs") == 1L)
  }

  test("classified sentences carry a deterministic in-range score") {
    val text = "join aa table bb cc dd ee ff gg hh"
    val annots = Concepts.postProcess(Concepts.recognize(docs(text)))
    val scored = SentencePairs.classified(annots, threshold = 0.0).collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s >= 0.0 && s < 1.0)
    }
  }
}
