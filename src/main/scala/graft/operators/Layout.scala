package graft.operators

import graft.functions.Hash60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-column data-skipping layout: Z-order (Morton) clustering.
  *
  * At 100 TB the cheapest predicate is the one that never reads the file:
  * parquet footer min/max stats prune whole row groups, but only for
  * columns the file order correlates with. Sorting by one column gives
  * perfect skipping on it and none on the others; interleaving the bits of
  * two (quantized) columns gives useful locality on BOTH — the standard
  * lakehouse Z-ORDER operation (Delta/Iceberg expose the same thing). Here
  * it is pure column algebra: quantize each key to 16 bits, spread bits
  * with the classic mask-shift sequence, interleave, then
  * `repartitionByRange + sortWithinPartitions` on the z-value so the write
  * inherits the clustered order. Everything is codegen'd arithmetic — no
  * UDF, no shuffle beyond the one range exchange the layout IS.
  */
object Layout {

  /** Spread the low 16 bits of `c` to even bit positions (0b...abcd →
    * 0b...0a0b0c0d) — the 4-step mask-shift bit spread. */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long")
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values (a in even bits, b in odd). */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** All of `docs` plus an inline `zval` column — the Z-order key over
    * (n_chars min-max-quantized to 16 bits, source hash-bucketed to 16
    * bits). Bounds come from a 1-row broadcast aggregate, in-plan (no
    * driver-side pass); the key is computed ON the full row, so layouts
    * never join it back. */
  private def withZval(docs: DataFrame): DataFrame = {
    val bounds = docs.agg(min(col("n_chars")).cast("double").as("mn"),
      max(col("n_chars")).cast("double").as("mx"))
    docs.crossJoin(broadcast(bounds))
      .withColumn("qa", when(col("mx") === col("mn"), lit(0L))
        .otherwise(floor((col("n_chars") - col("mn")) * 65535.0 / (col("mx") - col("mn"))).cast("long")))
      .withColumn("qb", pmod(Hash60.id(col("source")), lit(65536L)))
      .withColumn("zval", morton2(col("qa"), col("qb")))
      .drop("mn", "mx", "qa", "qb")
  }

  /** doc_id, zval — the key view (the oracle-checked query surface). */
  def zorderKey(docs: DataFrame): DataFrame =
    withZval(docs).select(col("doc_id"), col("zval"))

  /** The layout operation itself: cluster `docs` in z-order so a parquet
    * write inherits row-group locality on both keys. The z-key is computed
    * inline on the full row (no doc_id self-join — that shape cost an
    * avoidable shuffle join), so the whole plan is scan → broadcast bounds
    * → ONE range exchange. */
  def zorderBy(docs: DataFrame, partitions: Int = 32): DataFrame =
    withZval(docs)
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")

  /** doc_id, shard, pos — deterministic pseudorandom corpus shuffle: the
    * write-path operation every pretraining pipeline runs before
    * serializing examples (training order must be random-looking, seeded
    * reproducible, and balanced across output shards). Each doc gets a
    * seeded hash key; shard = key mod nShards (balanced in expectation),
    * pos = the doc's rank within its shard in key order. Scale shape: one
    * per-row hash, one shuffle on the shard key (the same exchange the
    * sharded write needs anyway), and per-SHARD local sorts — never a
    * corpus-global sort. Re-running with the same seed reproduces the
    * exact order; changing the seed is a fresh epoch permutation. */
  def corpusShuffle(docs: DataFrame, nShards: Int = 64, seed: Long = 42L): DataFrame = {
    val byShard = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("skey"), col("doc_id"))
    docs.select(col("doc_id"),
        Hash60.id(concat(lit(s"$seed:"), col("doc_id"))).as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(byShard).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }
}
