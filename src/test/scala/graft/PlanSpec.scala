package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Physical-plan posture locks: these are the properties SCALING.md and
  * README's scale section promise. A regression that un-pushes a filter,
  * drops a broadcast, or turns top-K into a global sort fails here, not
  * in production.
  */
class PlanSpec extends SparkSuite {

  private def plan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(pf) ++ p.subqueries.flatMap(s => collectAll(s)(pf))

  test("q01: filter and projection reach the parquet scan") {
    val p = plan(SparkEntry.queries("q01_scan_prune")(spark, sf))
    val scan = collectAll(p) { case f: FileSourceScanExec => f }.head
    assert(scan.dataFilters.nonEmpty, "predicate not pushed to the scan")
    assert(scan.requiredSchema.fieldNames.toSet ==
      Set("l_orderkey", "l_linenumber", "l_extendedprice"),
      s"column pruning lost: ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q05: top-K plans TakeOrderedAndProject, not a global sort") {
    val p = plan(SparkEntry.queries("q05_topk")(spark, sf))
    assert(collectAll(p) { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"expected TakeOrderedAndProject:\n$p")
  }

  test("q04: all five dimension joins broadcast; exactly one agg shuffle") {
    val p = plan(SparkEntry.queries("q04_double_dim_join")(spark, sf))
    val bcasts = collectAll(p) { case b: BroadcastExchangeLike => b }
    assert(bcasts.size == 5, s"expected 5 broadcast exchanges, got ${bcasts.size}")
    val shuffles = collectAll(p) { case s: ShuffleExchangeLike => s }
    // just the groupBy — no trailing cosmetic sort since round 2
    assert(shuffles.size == 1, s"expected 1 shuffle (agg), got ${shuffles.size}")
  }

  test("q18: the max(ts) pin is a broadcast, not a collect, and the dim join broadcasts") {
    val p = plan(SparkEntry.queries("q18_report_pairs")(spark, sf))
    val bcasts = collectAll(p) { case b: BroadcastExchangeLike => b }
    assert(bcasts.size >= 2, s"expected broadcasts for scalar pin + dim, got ${bcasts.size}")
    assert(collectAll(p) { case t: TakeOrderedAndProjectExec => t }.nonEmpty)
  }

  test("custom expressions stay inside WholeStageCodegen (no fallback to interpreted eval)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // under AQE codegen stages materialize per query-stage at execution;
    // disable it so the static plan shows them
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p11 = SparkEntry.queries("q11_hex_to_decimal")(spark, sf)
        .queryExecution.executedPlan
      val codegenned = collectAll(p11) { case w: WholeStageCodegenExec => w }
      assert(codegenned.exists(_.toString.contains("hex_to_decimal")),
        s"HexToDecimal not inside a codegen stage:\n$p11")

      val emb = graft.sources.Tables.embeddings(spark, sf)
      val pCos = graft.ext.Similarity.knnBrute(emb.filter(emb("vec_id") < 5), emb, 3)
        .queryExecution.executedPlan
      val cosStages = collectAll(pCos) { case w: WholeStageCodegenExec => w }
      assert(cosStages.exists(_.toString.contains("cosine_sim")),
        s"CosineSimilarityExpr not inside a codegen stage:\n$pCos")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("x06: bounded-heap knn has no window sort and only the agg shuffles") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val p = plan(graft.ext.Similarity.knnBrute(emb.filter(emb("vec_id") < 10), emb, 5))
    assert(collectAll(p) { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      "knnBrute must not plan a window")
  }
}
