package graft

import java.nio.file.{Files, Paths}

import graft.operators.Conllu
import graft.sources.TextFiles

class TextFilesSpec extends SparkSpec {
  import spark.implicits._

  test("twoColumnMap parses key→set lines, skipping blanks and comments") {
    val dir = Files.createTempDirectory("graft-tcm")
    Files.writeString(dir.resolve("map.tsv"),
      "OP:join\tOP:JOINLIKE|OP:ROOT\n\n# comment\nOP:sort\tOP:ROOT\n")
    val r = TextFiles.twoColumnMap(spark, dir.toString).orderBy("key").collect()
    assert(r.length == 2)
    assert(r(0).getAs[String]("key") == "OP:join")
    assert(r(0).getAs[scala.collection.Seq[String]]("values").toSeq == Seq("OP:JOINLIKE", "OP:ROOT"))
    assert(r(1).getAs[scala.collection.Seq[String]]("values").toSeq == Seq("OP:ROOT"))
  }

  test("wholeTextDocs reads one doc per file with its name") {
    val dir = Files.createTempDirectory("graft-docs")
    Files.writeString(dir.resolve("7_doc.txt"), "line one\nline two")
    val r = TextFiles.wholeTextDocs(spark, dir.toString).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("file_name") == "7_doc.txt")
    assert(r.head.getAs[String]("text") == "line one\nline two")
  }

  test("conlluFiles feed Conllu.parse end-to-end") {
    val dir = Files.createTempDirectory("graft-conllu")
    Files.writeString(dir.resolve("3.conllu"), "1\tjoin\tjoin\tOP\n2\ttable\ttable\tDS")
    val parsed = Conllu.parse(TextFiles.conlluFiles(spark, dir.toString))
      .orderBy("tok_id").collect()
    assert(parsed.length == 2)
    assert(parsed.head.getAs[Long]("doc_id") == 3L)
    assert(parsed.head.getAs[String]("form") == "join")
    assert(parsed(1).getAs[String]("upos") == "DS")
  }
}
