package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 interleaves exactly (spot values + bijectivity on a sample)") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (0xABCDL, 0x1234L), (42L, 4242L), (65535L, 0L))
    val got = pairs.toDF("a", "b")
      .select(Layout.morton2(col("a"), col("b")).as("z")).as[Long].collect()
    def spread(x: Long): Long = {
      var v = x
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    val expect = pairs.map { case (a, b) => spread(a) | (spread(b) << 1) }
    assert(got.toSeq == expect)
    assert(got.distinct.length == got.length) // distinct pairs -> distinct codes
  }

  test("zorderBy clusters without changing the row set") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val laid = Layout.zorderBy(docs, partitions = 4)
    assert(laid.count() == docs.count())
    assert(laid.columns.sorted.toSeq == docs.columns.sorted.toSeq)
    // within each output partition, rows arrive z-sorted (layout inherited
    // by any subsequent file write)
    val keyed = Layout.zorderKey(docs)
    val zByDoc = keyed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perPart = laid.select("doc_id").rdd
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq)).collect()
    perPart.foreach { ids =>
      val zs = ids.map(zByDoc)
      assert(zs == zs.sorted, "partition not z-sorted")
    }
    // partitions cover disjoint ascending z-ranges (a true range layout)
    val ranges = perPart.filter(_.nonEmpty).map { ids =>
      val zs = ids.map(zByDoc); (zs.min, zs.max)
    }
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "overlapping z-ranges")
      case _ => ()
    }
  }

  test("zorderBy plans as scan → broadcast bounds → one range exchange (no self-join)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Layout.zorderBy(docs, partitions = 4).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("ShuffledHashJoin"), plan.take(2000))
    assert("Exchange rangepartitioning".r.findAllIn(plan).length == 1, plan.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty, plan.take(2000))
  }

  test("corpusShuffle is a seeded permutation: balanced shards, dense ranks, reproducible") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val a = Layout.corpusShuffle(docs, nShards = 8, seed = 42L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // every doc appears exactly once
    assert(a.length == n && a.map(_._1).distinct.length == n)
    // shards are balanced within 3x of ideal (hash-mod balance on 500 docs)
    val sizes = a.groupBy(_._2).values.map(_.length)
    assert(sizes.max <= 3 * (n / 8).toInt, s"skewed shards: $sizes")
    // ranks are dense 1..size within each shard
    for ((_, rows) <- a.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    // same seed reproduces; a different seed permutes differently
    val b = Layout.corpusShuffle(docs, nShards = 8, seed = 42L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    val c = Layout.corpusShuffle(docs, nShards = 8, seed = 7L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq != c.toSeq)
  }
}
