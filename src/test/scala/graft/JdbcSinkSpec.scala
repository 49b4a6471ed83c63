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
