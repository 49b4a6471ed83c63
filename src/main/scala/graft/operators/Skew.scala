package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join split is the first line of defense; explicit salting is
  * the deterministic fallback when a handful of keys dominate (the corpus
  * analog: stopword-like concepts, celebrity documents). Pattern: replicate
  * the small side `salt`×, scatter the big side uniformly, join on
  * (key, salt) — identical result set, `salt`-way parallelism on hot keys.
  */
object Skew {

  /** Equi-join `big` with `small` on `key`, salting the key `salt` ways.
    * `big`'s rows are scattered deterministically (hash of all columns), the
    * small side is exploded once per salt value. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    val bigSalted = big.withColumn("__salt", pmod(xxhash64(big.columns.map(col): _*), lit(salt)))
    val smallSalted = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    bigSalted.join(smallSalted, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key frequency report — identifies keys worth salting. */
  def keySkewReport(df: DataFrame, key: String, topK: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc)
      .limit(topK)
}
