package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-file sources. The reference reads line-oriented artifacts from GCS:
  * two-column map files (reference: etl/fn/PCollectionUtil.java
  * fromKeyToSetTwoColumnFiles — ancestor maps, promotion maps), plain-text
  * document dumps, and CoNLL-U files. Spark-first: `spark.read.text` /
  * `wholetext` with declarative parsing — no custom readers.
  */
object TextFiles {

  /** Two-column file(s) → (key, values ARRAY) rows. Lines are
    * `key<colDelim>v1<setDelim>v2...`; blank/comment lines skipped.
    * (PCollectionUtil.fromKeyToSetTwoColumnFiles analog.) */
  def twoColumnMap(spark: SparkSession, path: String,
                   colDelim: String = "\t", setDelim: String = "\\|"): DataFrame =
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0 && !col("value").startsWith("#"))
      .select(split(col("value"), colDelim).as("f"))
      .where(size(col("f")) >= 2) // skip malformed lines (no delimiter)
      .select(element_at(col("f"), 1).as("key"),
        split(element_at(col("f"), 2), setDelim).as("values"))

  /** One document per file: file name + whole text (BioC/Medline dump shape). */
  def wholeTextDocs(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(regexp_extract(input_file_name(), "([^/]+)$", 1).as("file_name"),
        col("value").as("text"))

  /** CoNLL-U file → (doc_id from file name, conllu text), ready for
    * graft.operators.Conllu.parse. */
  def conlluFiles(spark: SparkSession, dir: String): DataFrame =
    wholeTextDocs(spark, dir)
      .select(regexp_extract(col("file_name"), "^([0-9]+)", 1).cast("long").as("doc_id"),
        col("text").as("conllu"))
}
