package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 60-bit integer id derived from md5 — the engine/oracle-shared hash id.
  *
  * `id(c)` = first 15 hex chars of md5(c) read as a base-16 integer:
  * uniform, deterministic, computed per-row with no vocabulary build and no
  * global sort (the id-assignment requirement at 100 TB), and exactly
  * reproducible in DuckDB via `sql(c)` — digit-by-digit arithmetic over the
  * same md5 hex string (both engines emit lowercase hex over UTF-8 bytes).
  * 15 hex digits = 60 bits, so every value fits a signed 64-bit integer in
  * both engines.
  *
  * This replaces the round-1 vocabulary-rank ids (a row_number over the
  * distinct vocabulary — a single-partition global sort, the one structure
  * that cannot survive a 100 TB corpus) as the DEFAULT id scheme for the
  * dedup family. `xxhash64` remains the cheapest pure-Spark alternative
  * (Dedup.shingleSetsHashed) where oracle parity is not required.
  */
object Hash60 {
  def id(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** The same value in DuckDB SQL (which lacks conv/xxhash64): Σ digit·16^k
    * with precomputed BIGINT power literals — pure integer arithmetic. */
  def sql(c: String): String =
    (0 until 15).map { i =>
      val pow = java.math.BigInteger.valueOf(16).pow(14 - i)
      s"(strpos('0123456789abcdef', substr(md5($c), ${i + 1}, 1)) - 1) * $pow"
    }.mkString("(", " + ", ")")
}
