package graft

import graft.functions.CosineSimilarity.cosineSim
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim matches hand-computed cosine and the HOF formulation") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val native = df.select(cosineSim(col("a"), col("b"))).as[Double].head()
    val expected = (4.0 + 10.0 + 18.0) / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(native - expected) < 1e-12)
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x) /
        (sqrt(aggregate(zip_with(col("a"), col("a"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)) *
          sqrt(aggregate(zip_with(col("b"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x))))
      .as[Double].head()
    assert(math.abs(native - hof) < 1e-12)
  }

  test("cosine_sim is null-safe on mismatched lengths and zero vectors") {
    val df = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0, 3.0)),
      (Array(0.0, 0.0), Array(1.0, 2.0)))
      .toDF("a", "b")
    val r = df.select(cosineSim(col("a"), col("b")).as("c")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("cosine_sim of identical vectors is exactly 1.0 in codegen path") {
    val df = (1 to 100).map(i => (Array.tabulate(16)(j => (i * j + 1).toDouble), Array.tabulate(16)(j => (i * j + 1).toDouble)))
      .toDF("a", "b")
    val r = df.select(cosineSim(col("a"), col("b")).as("c")).as[Double].collect()
    assert(r.forall(v => math.abs(v - 1.0) < 1e-12))
  }
}
