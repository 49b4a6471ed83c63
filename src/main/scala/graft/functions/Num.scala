package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable display rounding.
  *
  * Spark's round() goes through BigDecimal(double) (exact binary expansion);
  * DuckDB's multiplies by 10^d then rounds — on values straddling a half-ulp
  * boundary the two differ in the last digit (observed once in 500k values
  * at sf0.1). `r(x, d) = floor(x*10^d + 0.5)/10^d` is the same IEEE op
  * sequence in both engines (OracleSql.r mirrors it textually), so outputs
  * are bit-identical by construction. Ties round toward +inf; this is
  * display rounding, not accounting.
  */
object Num {
  def r(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
  def r6(c: Column): Column = r(c, 6)
  def r2(c: Column): Column = r(c, 2)

  /** Overflow-free multiplicative hash bucket: (c * k) mod m computed as
    * ((c mod m) * (k mod m)) mod m — congruence-identical by modular
    * arithmetic, but the operands stay below m² instead of k·max(c).
    *
    * The direct form overflowed int64 under ANSI mode on ScaleUp-offset
    * keys (replica·10⁹ + id: 9·10⁹ × 2654435761 ≈ 2.4·10¹⁹ > Long.Max —
    * the sf1.0 probe's doc_sample/doc_upsert failures), and at a real
    * 100 TB deployment 10-digit document ids are the NORM, not the probe
    * artifact. The DuckDB oracle twins use the SAME congruence rewrite,
    * inlined per modulus (OracleSql.mulModSql — e.g.
    * ((doc_id % 1000) * 761) % 1000 for m = 1000), so both sides are
    * scale-generic; m² must stay < 2⁶³ (m ≤ ~3·10⁹ — every graft bucket
    * count is ≤ 10⁶). */
  def mulMod(c: Column, k: Long, m: Long): Column =
    pmod(pmod(c, lit(m)) * lit(k % m), lit(m))
}
