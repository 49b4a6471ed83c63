package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Abbreviation (short-form / long-form) detection.
  *
  * The reference wraps the Ab3P abbreviation detector
  * (reference: etl/AbbreviationAb3pPipeline.java, etl/fn/AbbreviationFn.java:
  * long_form/short_form annotation pairs with a has_short_form slot, plus
  * short-form propagation through the document). Here the public
  * Schwartz–Hearst algorithm (Schwartz & Hearst, PSB 2003 — the standard
  * open reimplementation of this task) provides the same capability as a
  * pure Scala function applied per text value.
  */
object Abbreviations {

  /** Returns (shortForm, longForm) pairs found in `text` via Schwartz–Hearst:
    * a parenthesized candidate short form, matched right-to-left against the
    * words preceding the '('. */
  def schwartzHearst(text: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = text.indexOf('(')
    while (i >= 0) {
      val close = text.indexOf(')', i + 1)
      if (close > i) {
        val sf = text.substring(i + 1, close).trim
        if (isValidShortForm(sf)) {
          val before = text.substring(0, i).trim
          findBestLongForm(sf, before).foreach(lf => out += ((sf, lf)))
        }
      }
      i = text.indexOf('(', i + 1)
    }
    out.result()
  }

  /** SF validity per Schwartz–Hearst: 2–10 chars, ≤2 words, starts
    * alphanumeric, contains a letter. */
  def isValidShortForm(sf: String): Boolean =
    sf.length >= 2 && sf.length <= 10 &&
      sf.split("\\s+").length <= 2 &&
      sf.headOption.exists(_.isLetterOrDigit) &&
      sf.exists(_.isLetter)

  /** Right-to-left character match; the first SF char must align with the
    * start of a word in the long-form candidate. */
  def findBestLongForm(shortForm: String, before: String): Option[String] = {
    val candidateWords = before.split("\\s+").takeRight(math.min(shortForm.length + 5, shortForm.length * 2))
    if (candidateWords.isEmpty) return None
    val candidate = candidateWords.mkString(" ")
    var sIndex = shortForm.length - 1
    var lIndex = candidate.length - 1
    while (sIndex >= 0) {
      val c = shortForm.charAt(sIndex).toLower
      if (!c.isLetterOrDigit) { sIndex -= 1 }
      else {
        while (lIndex >= 0 &&
          (candidate.charAt(lIndex).toLower != c ||
            (sIndex == 0 && lIndex > 0 && candidate.charAt(lIndex - 1).isLetterOrDigit))) {
          lIndex -= 1
        }
        if (lIndex < 0) return None
        sIndex -= 1
        lIndex -= 1
      }
    }
    Some(candidate.substring(lIndex + 1).trim).filter(_.nonEmpty)
  }

  /** DataFrame op: id + text column → (id, short_form, long_form) rows.
    * Runs through the native [[graft.functions.SchwartzHearstPairs]]
    * expression (whole-stage codegen, no UDF serialization boundary);
    * this is also the I7 subprocess slot — a deployment wrapping the real
    * Ab3P binary swaps this projection for a SubProcess.pipeFramed stage
    * with the same output shape. */
  def detect(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.SchwartzHearstPairs.pairsOf(col(textCol))).as("pair"))
      .select(col(idCol), col("pair.short_form").as("short_form"),
        col("pair.long_form").as("long_form"))

  /** The rows-only driver query: abbreviations over constructed
    * "name (INITIALS)" part descriptions. */
  def partAbbreviations(part: DataFrame): DataFrame = {
    val text = concat(col("p_name"), lit(" ("),
      upper(concat(
        substring(substring_index(col("p_name"), " ", 1), 1, 1),
        substring(substring_index(col("p_name"), " ", -1), 1, 1))), lit(")"))
    detect(part.withColumn("abbrev_text", text), "p_partkey", "abbrev_text")
      .withColumnRenamed("p_partkey", "part_id")
      .orderBy("part_id")
  }
}
