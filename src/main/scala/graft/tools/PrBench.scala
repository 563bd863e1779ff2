package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only PageRank cost-shape measurement: 3-iteration decimal-exact
  * PageRank (x67's kernel) on synthetic tree graphs one and two orders
  * past the registered query's oracle-bounded graph — each iteration is
  * one edge join + one destination-keyed aggregate, so wall should grow
  * ~linearly with the edge count.
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.PrBench'
  */
object PrBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt)
    spark.range(0, 100000, 1, 4).groupBy((col("id") % 7).as("k")).count().count()
    for (n <- Seq(1000000L, 4000000L)) {
      // binary-tree forest: node i links to i/2 — bounded degree, depth
      // log n, every node reachable; nodes = range, edges = n-1
      val nodes = spark.range(n).select(col("id"))
      val edges = spark.range(1L, n)
        .selectExpr("id AS a", "id DIV 2 AS b")
      val t0 = System.nanoTime()
      val out = graft.operators.PageRank.run(nodes, edges, "id", "a", "b")
      val rows = out.agg(count(lit(1)), max(length(col("pagerank")))).first()
      println(f"[pr] edges=${n - 1}%,d  3 iters  ${(System.nanoTime() - t0) / 1e9}%7.2f s  (nodes=${rows.getLong(0)}%,d)")
    }
    spark.stop()
  }
}
