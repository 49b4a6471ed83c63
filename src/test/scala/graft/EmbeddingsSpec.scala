package graft

import graft.operators.Embeddings

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(vs: Seq[Array[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")

  private def unit(dim: Int, at: Int): Array[Float] = {
    val a = Array.fill(dim)(0.01f); a(at) = 1.0f; a
  }

  test("cosine top-k ranks an identical vector first with cosine 1") {
    val dim = Embeddings.EmbDim
    val vs = vecs(Seq(unit(dim, 0), unit(dim, 0), unit(dim, 5), unit(dim, 9)))
    val top = Embeddings.cosineTopK(vs, numQueries = 1, k = 3).orderBy("rank").collect()
    assert(top.head.getAs[Long]("neighbor_id") == 1L)
    assert(top.head.getAs[Double]("cosine") == 1.0)
  }

  test("lsh buckets are deterministic and identical vectors collide") {
    val dim = Embeddings.EmbDim
    val vs = vecs(Seq(unit(dim, 3), unit(dim, 3), unit(dim, 40)))
    val b = Embeddings.lshBuckets(vs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(b(0L) == b(1L))
    val b2 = Embeddings.lshBuckets(vs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(b == b2)
  }

  test("dupPairs finds the identical pair via shared bucket") {
    val dim = Embeddings.EmbDim
    val vs = vecs(Seq(unit(dim, 3), unit(dim, 3), unit(dim, 40)))
    val pairs = Embeddings.dupPairs(vs, threshold = 0.9).collect()
    assert(pairs.exists(r => r.getAs[Long]("vec_a") == 0L && r.getAs[Long]("vec_b") == 1L))
  }

  test("pq codes are deterministic and identical vectors share codes") {
    val dim = Embeddings.EmbDim
    val vs = vecs(Seq(unit(dim, 3), unit(dim, 3), unit(dim, 40)))
    val c = Embeddings.pqCodes(vs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("code_key")).toMap
    assert(c(0L) == c(1L))
    assert(c(0L).split("\\|").length == Embeddings.PqM)
    assert(Embeddings.pqCodes(vs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("code_key")).toMap == c)
  }

  test("pq ADC ranks an exact duplicate first (its codes are the query's argmin codes)") {
    val dim = Embeddings.EmbDim
    val vs = vecs(Seq(unit(dim, 0), unit(dim, 0), unit(dim, 5), unit(dim, 9)))
    val top = Embeddings.pqTopK(vs, numQueries = 1, k = 3).orderBy("rank").collect()
    assert(top.head.getAs[Long]("neighbor_id") == 1L)
  }
}
