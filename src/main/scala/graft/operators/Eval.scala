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

  /** Per-document Cohen's kappa between two annotation sets, measured at
    * the token level — the chance-corrected companion to [[spanAgreement]]
    * (P/R/F1 ignores that two annotators can agree by luck; kappa doesn't,
    * and token-level labeling gives the well-defined "both said nothing"
    * cell that span sets lack). A token counts as labeled by a set when it
    * lies fully inside one of its spans.
    *
    * Shape: one equi-join on doc_id fans each token out to the doc's
    * (system ∪ gold) spans — per-doc bounded, the bio_tags family's
    * envelope — then max-flags collapse it back to one row per token and
    * two grouped aggregations derive the kappa inputs. All formula inputs
    * are exact integers, so po/pe/kappa are accumulation-order independent.
    * Convention: kappa = 0.0 where pe = 1 (the degenerate all-one-label
    * document, where chance correction is undefined). */
  def tokenKappa(tokens: DataFrame, system: DataFrame, gold: DataFrame): DataFrame = {
    val s = system.select(col("doc_id"), col("char_start").as("a_start"),
      col("char_end").as("a_end"), lit(1L).as("sf"), lit(0L).as("gf"))
    val g = gold.select(col("doc_id"), col("char_start").as("a_start"),
      col("char_end").as("a_end"), lit(0L).as("sf"), lit(1L).as("gf"))
    tokens.select("doc_id", "ord", "char_start", "char_end")
      .join(s.unionByName(g),
        Seq("doc_id"), "left_outer")
      .groupBy("doc_id", "ord")
      .agg(
        max(when(col("char_start") >= col("a_start") && col("char_end") <= col("a_end"),
          col("sf")).otherwise(0L)).as("in_s"),
        max(when(col("char_start") >= col("a_start") && col("char_end") <= col("a_end"),
          col("gf")).otherwise(0L)).as("in_g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_s") === col("in_g"), 1L).otherwise(0L)).as("n_agree"),
        sum(col("in_s")).as("s_pos"), sum(col("in_g")).as("g_pos"))
      .withColumn("po", col("n_agree").cast("double") / col("n_tokens").cast("double"))
      .withColumn("pe",
        (col("s_pos") * col("g_pos") + (col("n_tokens") - col("s_pos")) * (col("n_tokens") - col("g_pos")))
          .cast("double") / (col("n_tokens") * col("n_tokens")).cast("double"))
      .select(col("doc_id"), col("n_tokens"), col("n_agree"), col("s_pos"), col("g_pos"),
        Num.r6(col("po")).as("po"), Num.r6(col("pe")).as("pe"),
        Num.r6(when(col("pe") === 1.0, 0.0)
          .otherwise((col("po") - col("pe")) / (lit(1.0) - col("pe")))).as("kappa"))
  }
}
