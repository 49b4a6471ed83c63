package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Regression guard for the events-table timestamp contract.
  *
  * Round 6 shipped broken because the testdata's `ts` column changed parquet
  * precision (NANOS → MICROS) and twelve downstream queries assumed the old
  * raw-long representation. The contract now lives in ONE place —
  * Tables.canonicalizeEventTs — and this spec pins it: whatever the parquet
  * carries, `Tables.events` exposes `ts` as canonical epoch-µs BIGINT. A
  * future precision change in the testdata fails HERE, with a named
  * assertion, instead of as twelve downstream analysis errors.
  */
class TablesSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("events.ts loads as canonical epoch-µs BIGINT from every sf dir") {
    for (dir <- sfDirs) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == LongType,
        s"$dir: ts must canonicalize to BIGINT (epoch-µs), got ${ev.schema("ts").dataType}")
    }
  }

  test("canonical ts values are plausible epoch-µs instants") {
    // The synthetic corpus is dated 2024; epoch-µs for 2024 is ~1.7e15.
    // A ns-read-as-µs mistake lands at ~1.7e18, a ms one at ~1.7e12, and a
    // 1000×-compressed stream lands in 1970 — all three fail this window.
    val bounds = Tables.events(spark, sfDirs.head)
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val us2020 = 1577836800000000L // 2020-01-01
    val us2030 = 1893456000000000L // 2030-01-01
    assert(lo >= us2020 && hi < us2030,
      s"ts range [$lo, $hi] is not epoch-µs for a 2024 corpus — precision drift")
  }

  test("canonicalizeEventTs handles each source representation identically") {
    import spark.implicits._
    val us = 1704326400123456L
    // TIMESTAMP_NTZ source (what current MICROS testdata loads as, tz=UTC)
    val ntz = Seq(1).toDF("i")
      .select(timestamp_micros(lit(us)).cast(TimestampNTZType).as("ts"))
    // TIMESTAMP source
    val tz = Seq(1).toDF("i").select(timestamp_micros(lit(us)).as("ts"))
    // legacy NANOS-as-long source
    val ns = Seq(us * 1000).toDF("ts")
    for (df <- Seq(ntz, tz, ns)) {
      val got = Tables.canonicalizeEventTs(df).select("ts").as[Long].head()
      assert(got == us, s"canonicalized $got != $us for source type ${df.schema("ts").dataType}")
    }
  }
}
