package graft

import graft.operators.Dedup

/** Connected-components invariants beyond what the oracle's near-dup blobs
  * exercise: chains (multi-round propagation) and disjoint components. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to its minimum over multiple rounds") {
    // 9-8, 8-7, ..., 1-0: diameter 9 forces several propagation rounds
    val got = components((1L to 9L).map(i => (i - 1, i)))
    assert(got == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("disjoint components keep distinct minimum labels") {
    val got = components(Seq((5L, 3L), (3L, 9L), (20L, 21L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("large-star/small-star labels a 1000-node path graph in O(log n) rounds") {
    // min-label propagation needs ~diameter rounds here; the star variant
    // must land the same answer within a logarithmic budget
    val pairs = (1L until 1000L).map(i => (i - 1, i)).toDF("doc_a", "doc_b")
    val (labeled, rounds) = Dedup.starComponents(pairs, maxIterations = 30)
    val got = labeled.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 1000L).map(_ -> 0L).toMap)
    assert(rounds <= 15, s"took $rounds rounds on a 1000-node path")
  }

  test("star variant agrees with min-label propagation on a mixed graph") {
    val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L), (21L, 22L), (22L, 23L),
      (40L, 41L), (41L, 40L), (7L, 9L))
    val viaStar = Dedup.connectedComponentsStar(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == components(pairs))
  }

  test("both variants are null-safe on an empty pair list") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
    assert(Dedup.connectedComponentsStar(empty).count() == 0)
  }
}
