package graft

import graft.operators.{Concepts, Exports}
import org.apache.spark.sql.functions._

/** DSv2 standoff source: round-trip, partition pruning, column pruning. */
class BioNlpSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the customer table joins the orders table"),
    (2L, "spark shuffles partition data"),
    (7L, "orders join customer")
  ).toDF("doc_id", "text")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("bionlp-src-spec").toString
    Exports.bionlp(Concepts.postProcess(Concepts.recognize(docs)))
      .write.partitionBy("doc_id").mode("overwrite").text(d)
    d
  }

  private def readBack = spark.read.format("graft.sources.BioNlpSource").load(dir)

  test("round-trips the exported annotation fields") {
    val pp = Concepts.postProcess(Concepts.recognize(docs))
    val expected = pp.select(col("doc_id"), col("char_start"), col("char_end"), col("tok"))
      .collect().map(_.toSeq).toSet
    val got = readBack.select("doc_id", "char_start", "char_end", "tok")
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == expected)
  }

  test("doc_id filters prune whole files at planning time") {
    val scan = readBack.where(col("doc_id") === 1L)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("prunedDocs=1"), s"expected planning-time pruning in:\n$plan")
    assert(scan.select("doc_id").distinct().as[Long].collect().toSeq == Seq(1L))
  }

  test("column pruning reaches the scan") {
    val narrow = readBack.select("doc_id", "tok")
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("columns=doc_id,tok"), s"expected pruned read schema in:\n$plan")
    assert(narrow.count() > 0)
  }
}
