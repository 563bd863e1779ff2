package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarityExpr, HexToDecimal, Md5Prefix60, U256DecString, U256Limbs, U256RenderLimbs, WordNgrams, ZOrder2}

/** Optimizer rule: hoist repeated EXPENSIVE graft kernel calls out of a
  * projection so each evaluates once per row.
  *
  * Motivation is measured, not theoretical: `u256_render(element_at(
  * u256_limbs(h), 1), ..., element_at(u256_limbs(h), 5))` — the natural
  * way to author the limb render before [[graft.functions.U256RenderLimbs]]
  * existed — carries five copies of the parse in one Project, and Spark's
  * runtime subexpression elimination did NOT fuse them (q40 at sf0.1
  * spent 2.5 s of 4.9 s re-parsing; see U256.scala). This rule rewrites
  *
  *   Project[f(k(x)), g(k(x))](child)
  *     → Project[f(a), g(a)](Project[child.*, k(x) AS a](child))
  *
  * for deterministic kernels in [[isExpensive]] that appear ≥ 2 times
  * (semantically equal under `canonicalized`). `CollapseProject` will not
  * undo the split: the alias is non-cheap and referenced more than once,
  * which is exactly its no-inline guard. The rewrite is idempotent — the
  * lower Project holds one occurrence per kernel, the upper only
  * attribute references — so the rule is fixed-point safe.
  *
  * Scope is Project-only by design: aggregates evaluate their children
  * inside partial-aggregate codegen where the same duplication shape has
  * not been observed, and a narrower rule is a safer rule. Nested
  * extracted kernels (one expensive expr inside another) extract the
  * outer occurrence; a then-unreferenced inner alias is dead code the
  * later column-pruning pass (or codegen) discards.
  *
  * Injection: `GraftExtensions` (spark.sql.extensions) for new sessions,
  * or [[ExtractExpensiveSubexpressions.install]] post-hoc via
  * `experimental.extraOptimizations` — that batch runs after the main
  * optimizer, so the split survives untouched into physical planning,
  * where both Projects land in one WholeStageCodegen stage and the
  * kernel result becomes a local variable.
  */
object ExtractExpensiveSubexpressions extends Rule[LogicalPlan] {

  private def isExpensive(e: Expression): Boolean = e match {
    case _: U256Limbs | _: U256DecString | _: U256RenderLimbs | _: HexToDecimal |
        _: Md5Prefix60 | _: WordNgrams | _: CosineSimilarityExpr | _: ZOrder2 => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, child) =>
      // count semantically-equal expensive kernels across the whole list
      val counts = mutable.LinkedHashMap.empty[Expression, (Expression, Int)]
      projectList.foreach(_.foreach {
        case e if isExpensive(e) && e.deterministic &&
            e.references.subsetOf(child.outputSet) =>
          val k = e.canonicalized
          counts.update(k, counts.get(k).map { case (i, n) => (i, n + 1) }.getOrElse((e, 1)))
        case _ => ()
      })
      val dups = counts.collect { case (k, (inst, n)) if n >= 2 =>
        k -> Alias(inst, s"_graft_cse_${counts.keys.toSeq.indexOf(k)}")()
      }
      if (dups.isEmpty) p
      else {
        val lower = Project(child.output ++ dups.values, child)
        val byCanonical = dups.map { case (k, a) => k -> a.toAttribute }
        val upper = projectList.map(_.transformDown {
          case e: Expression if byCanonical.contains(e.canonicalized) =>
            byCanonical(e.canonicalized)
        }.asInstanceOf[NamedExpression])
        Project(upper, lower)
      }
  }

  /** Post-hoc installation on an existing session (idempotent) — the
    * path for sessions not built with `spark.sql.extensions`.
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
