package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the ubiquitous top-k idiom
  *
  *   df.withColumn("rn", row_number().over(Window.partitionBy(K).orderBy(O)))
  *     .filter($"rn" <= k)
  *
  * — and its rank()/dense_rank() variants — into the [[TopKPerKey]]
  * operator. The window form sorts every row of every key partition
  * and shuffles the full input; the rewrite keeps k-bounded heaps per
  * key and shuffles only per-partition survivors — same rows out
  * (row_number over a non-unique ordering is tie-nondeterministic in
  * both forms; with a tie-breaking ordering both are exact; rank and
  * dense_rank are deterministic by construction and keep their
  * boundary ties, so all three match the window semantics row for
  * row).
  *
  * Conservative scope: a Filter directly over (optionally a
  * pass-through Project over) a single-ranking-function Window,
  * predicate `rn <= lit`, `rn < lit`, or `rn = 1`, with nothing else
  * referencing intermediate window internals. Opt-in via
  * [[GraftExtensions]].
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** predicate on `attr` → max rank k, if the shape matches */
  private def extractK(cond: Expression, rn: Attribute): Option[Int] = {
    def isRn(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == rn.exprId
      case Cast(a: Attribute, _, _, _) => a.exprId == rn.exprId
      case _ => false
    }
    cond match {
      case LessThanOrEqual(e, Literal(k: Int, IntegerType)) if isRn(e) => Some(k)
      case LessThanOrEqual(e, Literal(k: Long, LongType)) if isRn(e) => Some(k.toInt)
      case LessThan(e, Literal(k: Int, IntegerType)) if isRn(e) => Some(k - 1)
      case LessThan(e, Literal(k: Long, LongType)) if isRn(e) => Some(k.toInt - 1)
      case EqualTo(e, Literal(1, IntegerType)) if isRn(e) => Some(1)
      case EqualTo(e, Literal(1L, LongType)) if isRn(e) => Some(1)
      case _ => None
    }
  }

  private def modeOf(wf: Expression): Option[TopKMode] = wf match {
    case _: RowNumber => Some(TopKMode.RowNumber)
    case _: Rank => Some(TopKMode.Rank)
    case _: DenseRank => Some(TopKMode.DenseRank)
    case _ => None
  }

  private def asTopK(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(wf, _), _)) =>
        modeOf(wf).flatMap { mode =>
          extractK(cond, a.toAttribute).collect {
            case k if k >= 1 =>
              TopKPerKey(w.partitionSpec, w.orderSpec, k,
                a.toAttribute.asInstanceOf[AttributeReference], w.child, mode)
          }
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Filter(rn <= k, Window(row_number))
    case f @ Filter(cond, w: Window) =>
      asTopK(cond, w).getOrElse(f)
    // Filter(rn <= k, Project(passthrough-or-alias, Window(row_number))).
    // Aliases are resolved back to the window-side attribute before the
    // predicate match, so select(col("rn").as("r")).filter($"r" <= k)
    // rewrites too — TopKPerKey's output is the Window's output, so the
    // projection re-applies unchanged on top.
    case f @ Filter(cond, Project(projList, w: Window))
        if projList.forall {
          case _: Attribute => true
          case Alias(_: Attribute, _) => true
          case _ => false
        } =>
      val subst = projList.collect {
        case a @ Alias(ref: Attribute, _) => a.exprId -> ref
      }.toMap
      val resolved = cond.transform {
        case attr: Attribute if subst.contains(attr.exprId) => subst(attr.exprId)
      }
      asTopK(resolved, w) match {
        case Some(topk) => Project(projList, topk)
        case None => f
      }
  }
}
