package graft.tools

import org.apache.spark.sql.functions._

/** removeAssign's headline claim, measured: deletion rework is bounded
  * by the AFFECTED components, so forgetting a handful of docs from a
  * growing graph costs one edge-history scan plus a tiny mini-CC —
  * while the naive answer (from-scratch CC over the surviving edges)
  * pays fixpoint rounds over the whole corpus that grow with it.
  *
  * Graph: `n` chain-of-5 components (nodes 5k..5k+4), 10 deletions
  * spread across 10 distinct components — each deletion splits or
  * shrinks only its own component.
  *
  *   sbt 'runMain graft.tools.CcForgetBench'
  */
object CcForgetBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    println("edges\tremove_assign_s\tfull_cc_s\tsurvivor_rows")
    for (comps <- Seq(250000L, 2500000L)) { // 1M / 10M edges
      val edges = spark.range(comps)
        .select(explode(sequence(lit(0), lit(3))).as("i"), col("id"))
        .select((col("id") * 5 + col("i")).as("a"), (col("id") * 5 + col("i") + 1).as("b"))
        .localCheckpoint(true)
      val standing = graft.operators.ConnectedComponents.labels(edges)
        .localCheckpoint(true)
      // 10 deletions in 10 distinct components: the middle node of
      // components 0, comps/10, 2*comps/10, ... — each a bridge
      val delIds = (0L until 10L).map(k => (comps / 10) * k * 5 + 2)
      val del = delIds.toDF("node")

      val t0 = System.nanoTime()
      val out = graft.operators.ConnectedComponents
        .removeAssign(standing, edges, del)
      val nOut = out.count()
      val tRemove = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val delSet = delIds.toSet
      val kept = edges.filter(!col("a").isin(delSet.toSeq: _*) &&
        !col("b").isin(delSet.toSeq: _*))
      val full = graft.operators.ConnectedComponents.labels(kept)
      val nFull = full.count()
      val tFull = (System.nanoTime() - t1) / 1e9

      println(f"${comps * 4}\t$tRemove%.2f\t$tFull%.2f\t$nOut (full labels $nFull)")
    }
    spark.stop()
  }
}
