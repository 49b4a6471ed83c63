package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Real JDBC round trip against embedded Derby (the driver Spark ships):
  * the ClassifiedSentenceStoragePipeline storage path — write scored
  * sentences over JDBC, read them back, byte-equal. */
class JdbcSinkSpec extends SparkSpec {

  test("classified sentences round-trip through a real JDBC database") {
    val url = {
      val dir = java.nio.file.Files.createTempDirectory("graft-derby")
      // Derby spams derby.log into cwd unless redirected
      System.setProperty("derby.stream.error.file", s"$dir/derby.log")
      s"jdbc:derby:$dir/db;create=true"
    }
    val rows = SparkEntry.queries("classified_sentences")(spark, "/root/testdata/sf0.001")
      .limit(200).cache()
    val n = rows.count()
    assert(n > 0)

    Sinks.jdbc(rows, url, "classified_sentences")
    val back = Sinks.readJdbc(spark, url, "classified_sentences")

    assert(back.schema.fieldNames.sorted.toSeq == rows.schema.fieldNames.sorted.toSeq)
    assert(back.count() == n)
    val cols = rows.schema.fieldNames.sorted.map(col).toSeq
    assert(back.select(cols: _*).exceptAll(rows.select(cols: _*)).isEmpty)
    assert(rows.select(cols: _*).exceptAll(back.select(cols: _*)).isEmpty)
  }

  test("the assertion-DB star round-trips as four JDBC tables with intact FKs") {
    // the text-mined-assertion-db.sql load path: write assertion / evidence /
    // entity / evidence_score over JDBC, read back, and re-run the FK gate
    // on the read-back tables
    val dir = java.nio.file.Files.createTempDirectory("graft-derby3")
    val url = s"jdbc:derby:$dir/db;create=true"
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val annots = graft.operators.Concepts.postProcess(graft.operators.Concepts.recognize(d))
    val base = graft.operators.AssertionDb.evidenceBase(d, annots).cache()
    // 'assertion' is a Derby reserved word; the production schema's table
    // names live in MySQL backticks — prefix here, same columns
    val tables = Map(
      "tma_assertion" -> graft.operators.AssertionDb.assertionsFrom(base),
      "tma_evidence" -> graft.operators.AssertionDb.evidenceFrom(base),
      "tma_entity" -> graft.operators.AssertionDb.entitiesFrom(base),
      "tma_evidence_score" -> graft.operators.AssertionDb.evidenceScoresFrom(base))
    tables.foreach { case (name, df) => Sinks.jdbc(df, url, name) }
    val back = tables.map { case (name, df) =>
      val b = Sinks.readJdbc(spark, url, name)
      assert(b.count() == df.count(), name)
      name -> b
    }
    // FK gate over the READ-BACK tables (orphans would mean the sink broke
    // referential integrity)
    val orphanEv = back("tma_evidence").join(back("tma_assertion").select("assertion_id"),
      Seq("assertion_id"), "left_anti").count()
    val orphanScore = back("tma_evidence_score").join(back("tma_evidence").select("evidence_id"),
      Seq("evidence_id"), "left_anti").count()
    val orphanEnt = back("tma_evidence").select(col("subject_entity_id").as("entity_id"))
      .union(back("tma_evidence").select(col("object_entity_id")))
      .join(back("tma_entity").select("entity_id"), Seq("entity_id"), "left_anti").count()
    assert(orphanEv == 0L && orphanScore == 0L && orphanEnt == 0L)
  }

  test("append mode accumulates instead of replacing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby2")
    val url = s"jdbc:derby:$dir/db;create=true"
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    Sinks.jdbc(a, url, "t")
    Sinks.jdbc(a, url, "t", mode = org.apache.spark.sql.SaveMode.Append)
    assert(Sinks.readJdbc(spark, url, "t").count() == 4)
  }
}
