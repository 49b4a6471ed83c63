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
}
