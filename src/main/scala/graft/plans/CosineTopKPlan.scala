package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator custom plan (design-brief custom-operator path c):
  * partial cosine top-k as a LogicalPlan + Strategy + SparkPlan.
  *
  * The composed formulation (crossJoin → score → window rank) materializes
  * and sorts |Q|×|N| scored rows through an exchange. The built-in operators
  * cannot express "bounded heap during the join", so this node scans the
  * neighbor side ONCE per partition, keeping a k-bounded heap per query
  * vector, and emits ≤ |Q|·k·partitions partial rows — the exact top-k is
  * then a trivial window over that tiny partial set (see
  * graft.operators.Embeddings.cosineTopKNative). At 10⁹ neighbors this is
  * the difference between a feasible plan and an infeasible one.
  *
  * Left child: (query_id BIGINT, qe ARRAY<DOUBLE>) — small, broadcast.
  * Right child: (neighbor_id BIGINT, ne ARRAY<DOUBLE>) — streamed.
  * Output: (query_id, neighbor_id, cosine) partials, cosine pre-rounded 6dp
  * with the same floor formula as graft.functions.Num (oracle-stable).
  */
case class PartialCosineTopK(left: LogicalPlan, right: LogicalPlan, k: Int,
                             // a case-class FIELD so exprIds survive tree copies
                             // (a `val output` would mint fresh ids on every copy())
                             output: Seq[Attribute] = PartialCosineTopK.freshOutput())
  extends BinaryNode {
  // the node generates its output columns (they are not child pass-throughs)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): PartialCosineTopK =
    copy(left = newLeft, right = newRight)
}

object PartialCosineTopK {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("query_id", LongType, nullable = false)(),
    AttributeReference("neighbor_id", LongType, nullable = false)(),
    AttributeReference("cosine", DoubleType, nullable = false)())
}

object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n @ PartialCosineTopK(l, r, k, out) =>
      PartialCosineTopKExec(planLater(l), planLater(r), k, out) :: Nil
    case _ => Nil
  }
}

case class PartialCosineTopKExec(left: SparkPlan, right: SparkPlan, k: Int,
                                 output: Seq[Attribute]) extends BinaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    // small side to the driver once, then task-broadcast (the standard
    // broadcast-join shape, explicit here)
    val queries: Array[(Long, Array[Double], Double)] =
      left.executeCollect().map { row =>
        val qe = row.getArray(1).toDoubleArray()
        var nq = 0.0; var i = 0
        while (i < qe.length) { nq += qe(i) * qe(i); i += 1 }
        (row.getLong(0), qe, math.sqrt(nq))
      }
    val bc = sparkContext.broadcast(queries)
    val kk = k
    val schema = output.map(_.dataType).toArray

    right.execute().mapPartitions { iter =>
      val qs = bc.value
      // per-query bounded heap; head = current worst of the kept k
      val ord = Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }
      val heaps = Array.fill(qs.length)(scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
      iter.foreach { row =>
        val nid = row.getLong(0)
        val ne = row.getArray(1).toDoubleArray()
        var qi = 0
        while (qi < qs.length) {
          val (qid, qe, qNorm) = qs(qi)
          if (nid != qid && qe.length == ne.length) {
            var dot = 0.0; var nn = 0.0; var i = 0
            while (i < ne.length) { dot += qe(i) * ne(i); nn += ne(i) * ne(i); i += 1 }
            if (nn != 0.0 && qNorm != 0.0) {
              // same floor-rounding as graft.functions.Num.r6 → oracle-stable
              val c = math.floor(dot / (qNorm * math.sqrt(nn)) * 1e6 + 0.5) / 1e6
              val h = heaps(qi)
              if (h.size < kk) h.enqueue((c, nid))
              else {
                val (wc, wid) = h.head
                if (c > wc || (c == wc && nid < wid)) { h.dequeue(); h.enqueue((c, nid)) }
              }
            }
          }
          qi += 1
        }
      }
      val proj = UnsafeProjection.create(schema)
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        val qid = qs(qi)._1
        h.iterator.map { case (c, nid) =>
          proj(InternalRow(qid, nid, c)).copy(): InternalRow
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): PartialCosineTopKExec =
    copy(left = newLeft, right = newRight)
}

object CosineTopKPlan {
  /** Build the partial-top-k DataFrame; installs GraftStrategy on the session
    * if absent (also available via GraftExtensions for configured clusters). */
  def partials(spark: SparkSession,
               queries: org.apache.spark.sql.DataFrame,
               neighbors: org.apache.spark.sql.DataFrame,
               k: Int): org.apache.spark.sql.DataFrame = {
    if (!spark.experimental.extraStrategies.contains(GraftStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ GraftStrategy
    }
    val plan = PartialCosineTopK(queries.queryExecution.analyzed, neighbors.queryExecution.analyzed, k)
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark, plan)
  }
}
