package graft.operators

import graft.functions.Num
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Annotation-set evaluation: system vs gold agreement.
  *
  * The reference ships corpus converters whose purpose is evaluating the
  * pipeline against gold-standard annotation sets (corpora/craft readers
  * feed the CRAFT concept-recognition evaluation; corpora/semmed builds
  * labeled eval rows). This is that capability as a relational operator:
  * exact-span matching via a full outer join on the span key, per-document
  * tp/fp/fn tallies, and the derived precision/recall/F1 — one shuffle on
  * (doc_id, span), one on doc_id.
  *
  * At 100 TB the span join partitions by doc hash; nothing is corpus-global
  * (the corpus-level aggregate is a second tiny groupBy over the per-doc
  * rows when wanted).
  */
object Eval {

  /** Per-document exact-span agreement between a system and a gold
    * annotation set. Both inputs need (doc_id, char_start, char_end); spans
    * are compared as sets (multiplicity ignored, as in span-level NER eval).
    * Output: doc_id, tp, fp, fn, precision, recall, f1 (6dp; 0.0 where the
    * denominator is empty, the usual eval-harness convention). */
  def spanAgreement(system: DataFrame, gold: DataFrame): DataFrame = {
    // one union + one (doc, span) groupBy replaces two distincts plus a
    // full outer join — the span-set semantics (multiplicity ignored) fall
    // out of the max() flags, and both sides shuffle exactly once
    val s = system.select(col("doc_id"), col("char_start"), col("char_end"),
      lit(1L).as("s_flag"), lit(0L).as("g_flag"))
    val g = gold.select(col("doc_id"), col("char_start"), col("char_end"),
      lit(0L).as("s_flag"), lit(1L).as("g_flag"))
    s.unionByName(g)
      .groupBy("doc_id", "char_start", "char_end")
      .agg(max("s_flag").as("in_s"), max("g_flag").as("in_g"))
      .groupBy("doc_id")
      .agg(
        sum(when(col("in_s") === 1L && col("in_g") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("in_s") === 1L && col("in_g") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(col("in_s") === 0L && col("in_g") === 1L, 1L).otherwise(0L)).as("fn"))
      .withColumn("precision", Num.r6(
        when(col("tp") + col("fp") === 0, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))))
      .withColumn("recall", Num.r6(
        when(col("tp") + col("fn") === 0, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))))
      .withColumn("f1", Num.r6(
        when(col("precision") + col("recall") === 0.0, 0.0)
          .otherwise(lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))))
  }
}
