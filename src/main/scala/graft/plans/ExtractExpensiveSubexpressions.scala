package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CaseWhen, Coalesce, Expression, If, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarityExpr, HexToDecimal, Md5Prefix60, PqCodesExpr, U256DecString, U256Limbs, U256RenderLimbs, WordNgrams, ZOrder2}

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
        _: Md5Prefix60 | _: WordNgrams | _: CosineSimilarityExpr | _: ZOrder2 |
        _: PqCodesExpr => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, child) =>
      // Count semantically-equal expensive kernels across the whole list,
      // tracking whether each has at least one ALWAYS-EVALUATED
      // occurrence. Hoisting an expression that only appears inside
      // If/CaseWhen branches (or non-first Coalesce arms) would force it
      // to run for 100% of rows where the original plan ran it for the
      // branch-taken fraction — a perf inversion for a rule whose only
      // purpose is performance (round-4 review; Spark's own subexpression
      // elimination applies the same conditional-position restriction).
      // With ≥1 unconditional occurrence the kernel already runs every
      // row, so extraction strictly reduces evaluations and replacing
      // the conditional occurrences too is free.
      val counts = mutable.LinkedHashMap.empty[Expression, (Expression, Int)]
      val unconditional = mutable.Set.empty[Expression]
      def visit(e: Expression, conditional: Boolean): Unit = {
        if (isExpensive(e) && e.deterministic &&
            e.references.subsetOf(child.outputSet)) {
          val k = e.canonicalized
          counts.update(k, counts.get(k).map { case (i, n) => (i, n + 1) }.getOrElse((e, 1)))
          if (!conditional) unconditional += k
        }
        e match {
          case i: If =>
            visit(i.predicate, conditional)
            visit(i.trueValue, conditional = true)
            visit(i.falseValue, conditional = true)
          case cw: CaseWhen =>
            cw.branches.zipWithIndex.foreach { case ((c, v), idx) =>
              visit(c, conditional || idx > 0)
              visit(v, conditional = true)
            }
            cw.elseValue.foreach(visit(_, conditional = true))
          case c: Coalesce =>
            c.children.zipWithIndex.foreach { case (ch, idx) =>
              visit(ch, conditional || idx > 0)
            }
          case other => other.children.foreach(visit(_, conditional))
        }
      }
      projectList.foreach(visit(_, conditional = false))
      val dups = counts.collect {
        case (k, (inst, n)) if n >= 2 && unconditional.contains(k) =>
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
