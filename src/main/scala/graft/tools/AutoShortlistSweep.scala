package graft.tools

import org.apache.spark.sql.functions._

/** Fixed-vs-occupancy-derived IVF-PQ shortlist across scale factors
  * (round-11 verdict item 5) — the measured row behind
  * `Similarity.occupancyShortlist`: at a FIXED shortlist recall decays
  * as cells outgrow it (candidates per query grow `nprobe·N/C`, the
  * admitted fraction shrinks); at the occupancy-derived setting the
  * re-rank admits a constant fraction and recall stays flat across
  * sf0.01 → sf0.1. Runs the x92 clustered corpus at x88/x92 index
  * parameters.
  *
  *   sbt 'runMain graft.tools.AutoShortlistSweep /root/testdata/sf0.01 /root/testdata/sf0.1'
  */
object AutoShortlistSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Similarity
    println("sf\tn\tcells\tmean_occ\tsl_fixed\trecall_fixed\tsl_auto\trecall_auto")
    for (d <- dirs) {
      val emb = Similarity.clusteredCorpus(
        graft.sources.Tables.embeddings(spark, d)).localCheckpoint(false)
      val n = emb.count()
      val q = emb.filter(col("vec_id") < 10)
      val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
      val c = centroids.count()
      val cb = Similarity.pqResidualCodebooks(emb, centroids).localCheckpoint(false)
      val assigned = Similarity.ivfAssign(emb, centroids).localCheckpoint(false)
      val exact = Similarity.knnBrute(q, emb, 5).localCheckpoint(false)
      def recall(shortlist: Int): Double =
        Similarity.recallAtK(
          Similarity.knnIvfPq(q, emb, centroids, cb, k = 5, nprobe = 4,
            shortlist = shortlist, assignedOpt = Some(assigned)), exact, 5)
      val auto = Similarity.occupancyShortlist(assigned, nprobe = 4, k = 5)
      println(f"$d\t$n\t$c\t${n.toDouble / c}%.1f\t12\t${recall(12)}%.3f\t$auto\t${recall(auto)}%.3f")
    }
    spark.stop()
  }
}
