package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** SparkSessionExtensions wiring (design-brief custom-operator path c).
  *
  * Registers graft's native expressions as SQL functions and injects a
  * graft-specific optimizer rule, so `spark.sql("SELECT cosine_sim(a, b)")`
  * works and trivially-true similarity comparisons fold away at plan time.
  *
  * Activate with:
  *   SparkSession.builder.withExtensions(new GraftExtensions)            // code
  *   --conf spark.sql.extensions=graft.plans.GraftExtensions             // cluster
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => FoldSelfCosine)
    ext.injectOptimizerRule(_ => WindowTopKToBoundedHeap)
    ext.injectPlannerStrategy(_ => GraftStrategy)
  }
}

/** Rank-window top-k → bounded-heap aggregate, as an OPTIMIZER RULE.
  *
  * The repo's scale discipline replaces `row_number() over (partition by g
  * order by s desc, id) <= k` with the TopKAgg TypedImperativeAggregate by
  * hand (bm25_topk, knn_graph, hard_negatives): the window materializes and
  * sorts every row of every group before discarding all but k — one hot
  * group is one straggler partition at 100× — while the aggregate carries
  * ≤ k pairs per group through partial aggregation. This rule
  * institutionalizes that rewrite: any user query in the exact eligible
  * shape gets the bounded plan automatically when GraftExtensions is
  * active, the way Catalyst itself folds or prunes.
  *
  * Eligible shape (deliberately narrow — the rewrite must lose nothing):
  *   Project(proj, Filter(rank <= K, Window(row_number as rank
  *     partitionBy p... orderBy s1 DESC|ASC [, s2 ..., all same direction],
  *     id ASC, child)))
  * where a single s is a NON-NULLABLE DOUBLE or BIGINT attribute (doubles
  * ride TopKAgg; integer keys ride the TopKLongAgg sibling, EXACT at any
  * magnitude), MULTIPLE sort keys are NON-NULLABLE BIGINT attributes in one
  * shared direction and ride the lexicographic TopKLexAgg lane (the
  * "first k per pair by (doc_id, sent_id, id)" shape that round 12's
  * concept_pair_sentences had to express by hand-placing its minor key in
  * the heap's id slot),
  * id a NON-NULLABLE BIGINT attribute (the heaps skip null-id rows that
  * row_number would rank, so a nullable id could silently change the
  * result set — ADVICE r8), and K a literal. The filter may carry ADDITIONAL conjuncts beside the rank
  * bound (`rank <= 3 AND score > 0.5` — Catalyst cannot push non-partition
  * predicates below a Window, so realistic top-N filters keep them here);
  * they re-apply above the heap output, the same post-ranking point they
  * occupied above the window. Projection columns beyond {p..., rank, s,
  * id} — and any columns the residual conjuncts read — are carried
  * through the heap as PAYLOAD cargo when they are attributes of the window
  * child, so e.g. "top 3 parts per brand with the part NAME" still gets the
  * bounded plan; only computed columns the child doesn't expose block the
  * rewrite. Ties: row_number with (s DESC|ASC, id ASC) ranks exactly like
  * TopKAgg's eviction order — including NaN scores, which both the window
  * sort and the heap place greatest — so results are identical row-for-row,
  * not just setwise.
  */
object WindowTopKToBoundedHeap extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, AttributeReference, Cast, Descending, GetStructField, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, NamedExpression, PosExplode, SortOrder, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.expressions.{RowNumber, Add}
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, Project, Window => LWindow}
  import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Split the filter condition into (k, residual conjuncts): the FIRST
    * conjunct that is a plain rank upper bound supplies k; everything else
    * re-applies AFTER the heap (a filter above the window filters ranked
    * rows, so post-heap evaluation — with rank/score/id substituted — is
    * semantics-preserving; Catalyst cannot push such predicates below a
    * Window, which is exactly why realistic top-N filters carry them).
    * All residual conjuncts must be deterministic. */
  private def splitBound(cond: Expression, rankId: Long): Option[(Long, Seq[Expression])] = {
    val cs = conjuncts(cond)
    cs.zipWithIndex.collectFirst {
      case (c, idx) if upperBound(c, rankId).isDefined =>
        (upperBound(c, rankId).get, cs.patch(idx, Nil, 1))
    }.filter { case (_, residual) => residual.forall(_.deterministic) }
  }

  /** rank-bound k from one conjunct, if it is a plain upper bound
    * on `rank` (rank <= k / rank < k / k >= rank / k > rank). */
  private def upperBound(cond: Expression, rankId: Long): Option[Long] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId.id == rankId => Some(k.toLong)
    case LessThanOrEqual(a: AttributeReference, Literal(k: Long, LongType)) if a.exprId.id == rankId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId.id == rankId => Some(k.toLong - 1)
    case LessThan(a: AttributeReference, Literal(k: Long, LongType)) if a.exprId.id == rankId => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId.id == rankId => Some(k.toLong)
    case GreaterThanOrEqual(Literal(k: Long, LongType), a: AttributeReference) if a.exprId.id == rankId => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId.id == rankId => Some(k.toLong - 1)
    case GreaterThan(Literal(k: Long, LongType), a: AttributeReference) if a.exprId.id == rankId => Some(k - 1)
    case _ => None
  }

  /** Destructure Filter(Window) into the pieces the rewrite needs, when the
    * window is a single row_number ranked by one of
    *   - (DOUBLE|BIGINT attr, BIGINT attr id ASC) — the single-key lanes, or
    *   - (BIGINT attr, ..., BIGINT attr, BIGINT attr id ASC), every key in
    *     the SAME direction — the multi-key lexicographic lane (TopKLexAgg;
    *     `(k1 ASC, k2 ASC, id ASC)` shapes like "first k sentences per pair
    *     by (doc_id, sent_id)" get the bounded plan without hand-placing
    *     the minor key in the id slot)
    * over attribute partition keys. Both sort directions are served by the
    * heaps' own `asc` flag (no score negation — negation would invert where
    * NaN ranks on the double lane, and overflows Long.MinValue on the
    * integer lanes). All rank columns must be provably non-null: the heaps
    * skip null score/id rows, row_number ranks them. */
  private def eligible(cond: Expression, w: LWindow):
      Option[(Alias, Seq[AttributeReference], Seq[AttributeReference], Boolean, AttributeReference, Long, Seq[Expression], LogicalPlan)] =
    w match {
      case LWindow(
          Seq(rankAlias @ Alias(WindowExpression(_: RowNumber, WindowSpecDefinition(_, _, _)), _)),
          partSpec, sortOrders, child, _)
        if sortOrders.length >= 2 &&
          partSpec.forall(_.isInstanceOf[AttributeReference]) => {
        val (keyOrders, idOrder) = (sortOrders.init, sortOrders.last)
        val dirs = keyOrders.map(_.direction).distinct
        val keysOk = dirs.length == 1 &&
          (dirs.head == Descending || dirs.head == Ascending) &&
          keyOrders.forall(so => so.child.isInstanceOf[AttributeReference] &&
            !so.child.nullable &&
            (so.child.dataType == LongType ||
              (keyOrders.length == 1 &&
                so.child.dataType == org.apache.spark.sql.types.DoubleType)))
        val idOk = idOrder.direction == Ascending &&
          idOrder.child.isInstanceOf[AttributeReference] &&
          idOrder.child.dataType == LongType && !idOrder.child.nullable
        if (keysOk && idOk)
          splitBound(cond, rankAlias.exprId.id)
            .filter { case (k, _) => k > 0 && k <= 1000000 }
            .map { case (k, residual) =>
              (rankAlias, partSpec.map(_.asInstanceOf[AttributeReference]),
                keyOrders.map(_.child.asInstanceOf[AttributeReference]),
                dirs.head == Descending,
                idOrder.child.asInstanceOf[AttributeReference], k, residual, child)
            }
        else None
      }
      case _ => None
    }

  /** Referenced columns outside {group keys, rank, score, id} (from the
    * projection AND any residual filter conjuncts): carried through the
    * heap as payload when every one is an attribute the window child
    * exposes (order = first reference, so the rewrite is deterministic).
    * None ⇒ ineligible (a computed column the child doesn't expose can't
    * ride the heap). */
  private def payloadAttrs(refs: Seq[Expression], rankAlias: Alias,
      partAttrs: Seq[AttributeReference], scores: Seq[AttributeReference],
      id: AttributeReference, child: LogicalPlan): Option[Seq[AttributeReference]] = {
    val allowed = (partAttrs.map(_.exprId) ++ scores.map(_.exprId) ++
      Seq(rankAlias.exprId, id.exprId)).toSet
    val extraRefs = refs.flatMap(_.references.toSeq)
      .filterNot(r => allowed.contains(r.exprId))
      .foldLeft(Vector.empty[org.apache.spark.sql.catalyst.expressions.Attribute]) { (acc, r) =>
        if (acc.exists(_.exprId == r.exprId)) acc else acc :+ r
      }
    val extras = extraRefs.collect { case a: AttributeReference => a }
    if (extras.length == extraRefs.length && extras.forall(a => child.outputSet.contains(a)))
      Some(extras.toSeq)
    else None
  }

  private def rewrite(projList: Seq[NamedExpression], rankAlias: Alias,
      partAttrs: Seq[AttributeReference], scores: Seq[AttributeReference], desc: Boolean,
      id: AttributeReference, k: Long, residual: Seq[Expression],
      payload: Seq[AttributeReference],
      child: LogicalPlan): LogicalPlan = {
    // single integer key takes the exact long lane; a single double the
    // NaN-consistent double lane; ≥2 keys the lexicographic long lane —
    // entry struct fields match the original attribute types, so no cast
    // rides the output
    val lexMode = scores.length >= 2
    val heap =
      if (lexMode)
        graft.functions.TopKLexAgg(scores, id, k.toInt, asc = !desc,
          payload = payload).toAggregateExpression()
      else if (scores.head.dataType == LongType)
        graft.functions.TopKLongAgg(scores.head, id, k.toInt, asc = !desc,
          payload = payload).toAggregateExpression()
      else
        graft.functions.TopKAgg(scores.head, id, k.toInt, asc = !desc,
          payload = payload).toAggregateExpression()
    val tkAlias = Alias(heap, "__tk")()
    val agg = Aggregate(partAttrs, (partAttrs: Seq[NamedExpression]) :+ tkAlias, child)
    val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
    val payloadSchema = StructType(payload.zipWithIndex.map { case (a, i) =>
      org.apache.spark.sql.types.StructField(s"p$i", a.dataType, a.nullable)
    })
    val entryBase =
      if (lexMode)
        scores.indices.foldLeft(new StructType()) { (st, i) => st.add(s"s$i", LongType) }
          .add("id", LongType)
      else new StructType().add("score", scores.head.dataType).add("id", LongType)
    val idFieldIdx = if (lexMode) scores.length else 1
    val payloadFieldIdx = idFieldIdx + 1
    val entryType =
      if (payload.isEmpty) entryBase else entryBase.add("payload", payloadSchema, nullable = false)
    val entryAttr = AttributeReference("__e", entryType, nullable = false)()
    val gen = Generate(PosExplode(tkAlias.toAttribute), Nil, outer = false, None,
      Seq(posAttr, entryAttr), agg)
    val payloadIdx = payload.map(_.exprId).zipWithIndex.toMap
    val scoreIdx = scores.map(_.exprId).zipWithIndex.toMap
    def scoreField(i: Int): GetStructField =
      if (lexMode) GetStructField(entryAttr, i, Some(s"s$i"))
      else GetStructField(entryAttr, 0, Some("score"))
    // substitution shared by the projection rebuild and the residual
    // filter: every original attribute re-derives from the heap entry
    def substitute(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if a.exprId == rankAlias.exprId =>
        Cast(Add(posAttr, Literal(1, IntegerType)), a.dataType)
      case a: AttributeReference if scoreIdx.contains(a.exprId) =>
        scoreField(scoreIdx(a.exprId))
      case a: AttributeReference if a.exprId == id.exprId =>
        GetStructField(entryAttr, idFieldIdx, Some("id"))
      case a: AttributeReference if payloadIdx.contains(a.exprId) =>
        GetStructField(GetStructField(entryAttr, payloadFieldIdx, Some("payload")),
          payloadIdx(a.exprId), Some(s"p${payloadIdx(a.exprId)}"))
    }
    // residual non-rank conjuncts re-apply above the heap output — the
    // same post-ranking point they occupied above the window
    val filtered =
      if (residual.isEmpty) gen
      else Filter(residual.map(substitute).reduce(And), gen)
    // rebuild every projected column under its ORIGINAL exprId so parents
    // of this subtree keep resolving
    val rebuilt = projList.map { ne =>
      substitute(ne) match {
        case a: Alias => a
        case other: NamedExpression if other.isInstanceOf[AttributeReference] => other
        case other => Alias(other, ne.name)(exprId = ne.exprId)
      }
    }
    Project(rebuilt, filtered)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(projList, Filter(cond, w: LWindow)) if eligible(cond, w).exists {
          case (ra, pa, s, _, i, _, residual, child) =>
            payloadAttrs(projList ++ residual, ra, pa, s, i, child).isDefined
        } =>
      val (ra, pa, s, desc, i, k, residual, child) = eligible(cond, w).get
      rewrite(projList, ra, pa, s, desc, i, k, residual,
        payloadAttrs(projList ++ residual, ra, pa, s, i, child).get, child)
    // bare Filter(Window) — output is child columns + rank; payload covers
    // whatever the child carries beyond the heap-reproducible set
    case Filter(cond, w: LWindow) if eligible(cond, w).exists {
          case (ra, pa, s, _, i, _, residual, child) =>
            payloadAttrs(w.output.map(_.asInstanceOf[Expression]) ++ residual,
              ra, pa, s, i, child).isDefined
        } =>
      val (ra, pa, s, desc, i, k, residual, child) = eligible(cond, w).get
      val outs = w.output.map(_.asInstanceOf[NamedExpression])
      rewrite(outs, ra, pa, s, desc, i, k, residual,
        payloadAttrs(outs ++ residual, ra, pa, s, i, child).get, child)
  }
}

/** cosine_sim(x, x) ≡ 1.0 for non-null x (norms cancel): fold at plan time.
  * The rewrite keeps null semantics by only firing on deterministic,
  * provably-equal children. */
object FoldSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case c @ CosineSimilarity(l, r) if l.deterministic && l.semanticEquals(r) && !l.nullable =>
      Literal(1.0, DoubleType)
    case c => c
  }
}
