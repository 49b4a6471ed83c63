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
}
