package graft.operators

import graft.functions.Agg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** XML document ingest (title/body extraction).
  *
  * The reference's ingest stage parses publisher XML into plain text:
  * BiocToTextPipeline / BiocToTextConverter, MedlineXmlToTextFn (title +
  * abstract extraction), BiorxivXmlToTextPipeline (JATS). Here the same
  * capability Spark-first: documents are serialized to an XML envelope and
  * parsed back with Spark's native `from_xml` — schema-driven, codegen'd,
  * no hand-rolled parser. The round-trip (serialize → parse → compare)
  * proves both directions, mirroring how MedlineXmlToTextFnTest works.
  */
object XmlIngest {

  private val xmlSchema = StructType(Seq(
    StructField("title", StringType),
    StructField("body", StringType)))

  /** doc_id, xml — title = first sentence window, body = the rest. */
  def serialize(docs: DataFrame): DataFrame = {
    val sents = TextOps.sentences(docs)
    val title = sents.where(col("sent_id") === 0)
      .select(col("doc_id"), col("sent_text").as("title"))
    val body = sents.where(col("sent_id") > 0)
      .groupBy("doc_id")
      .agg(Agg.orderedStringAgg(col("sent_id"), col("sent_text"), " ")
        .as("body"))
    title.join(body, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat(lit("<doc><title>"), col("title"), lit("</title><body>"),
          coalesce(col("body"), lit("")), lit("</body></doc>")).as("xml"))
  }

  /** Parse an xml column → doc_id, title, body, title_n_tokens. */
  def parse(xmlDocs: DataFrame): DataFrame =
    xmlDocs
      .withColumn("parsed", from_xml(col("xml"), xmlSchema))
      .select(col("doc_id"),
        col("parsed.title").as("title"),
        coalesce(col("parsed.body"), lit("")).as("body"),
        size(split(col("parsed.title"), " ")).cast("long").as("title_n_tokens"))

  /** Round-trip: serialize then parse (the oracle reconstructs directly). */
  def roundTrip(docs: DataFrame): DataFrame = parse(serialize(docs))
}
