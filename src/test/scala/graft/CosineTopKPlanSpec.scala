package graft

import graft.operators.Embeddings

class CosineTopKPlanSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int) = {
    // deterministic pseudo-random floats
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j => (((i * 73 + j * 31) % 97) - 48).toFloat / 48f), 0)
    }.toDF("vec_id", "embedding", "label")
  }

  test("custom physical operator returns exactly the composed plan's result") {
    val vecs = randVecs(200, Embeddings.EmbDim)
    val composed = Embeddings.cosineTopK(vecs, numQueries = 5, k = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val native = Embeddings.cosineTopKNative(vecs, numQueries = 5, k = 4)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(native.toSeq == composed.toSeq)
  }

  test("physical plan contains PartialCosineTopKExec and no cross join") {
    val vecs = randVecs(50, Embeddings.EmbDim)
    val df = Embeddings.cosineTopKNative(vecs, numQueries = 3, k = 2)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PartialCosineTopK"))
    assert(!physical.toLowerCase.contains("cartesian"))
    assert(df.count() == 6)
  }

  test("partials are bounded by Q*k per partition") {
    val vecs = randVecs(100, Embeddings.EmbDim).repartition(4)
    val q = vecs.where($"vec_id" < 2)
      .selectExpr("CAST(vec_id AS LONG) AS query_id", "CAST(embedding AS ARRAY<DOUBLE>) AS qe")
    val n = vecs.selectExpr("CAST(vec_id AS LONG) AS neighbor_id", "CAST(embedding AS ARRAY<DOUBLE>) AS ne")
    val partials = graft.plans.CosineTopKPlan.partials(spark, q, n, k = 3)
    assert(partials.count() <= 2 * 3 * 4)
  }
}
