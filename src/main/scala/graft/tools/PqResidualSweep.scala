package graft.tools

import org.apache.spark.sql.functions._

/** Raw-PQ vs residual-PQ A/B on the derived clustered corpus (round-10
  * verdict item 4) — the measured table behind the x92 narrative.
  *
  * Two questions, one sweep:
  *   1. Does residual encoding DISCRIMINATE where raw encoding
  *      collapses? (On a clustered corpus every member of a cell
  *      PQ-quantizes near the cell's exemplar rows under raw encoding —
  *      the oracle-side probe measured 2–29 distinct code tuples per
  *      40–70-member cell raw vs 30–46 residual.)
  *   2. Does that discrimination convert to recall as the shortlist
  *      grows? Raw mode's tied approx scores make a longer shortlist
  *      admit candidates roughly by id; residual mode's ordered scores
  *      should convert extra shortlist slots to recall at a higher rate.
  *
  *   sbt 'runMain graft.tools.PqResidualSweep /root/testdata/sf0.01'
  */
object PqResidualSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.build()
    import graft.ext.Similarity
    def sweep(tag: String, emb: org.apache.spark.sql.DataFrame): Unit = {
      val n = emb.count()
      val q = emb.filter(col("vec_id") < 10).cache()
      q.count()
      val k = 5
      val exact = Similarity.knnBrute(q, emb, k).cache()
      exact.count()
      val centroids = Similarity.strideCentroids(emb, 16).cache()
      centroids.count()
      val cbRaw = Similarity.pqCodebooks(emb).cache()
      val cbRes = Similarity.pqResidualCodebooks(emb, centroids).cache()
      val cbFit = Similarity.pqResidualCodebooksFitted(emb, centroids, iters = 2).cache()
      cbRaw.count(); cbRes.count(); cbFit.count()

      println(s"$tag corpus n=$n queries=10 k=$k cells=stride62 nprobe=4")
      println("shortlist\trecall_raw\trecall_residual\trecall_res_fitted")
      for (shortlist <- Seq(12, 24, 48)) {
        def recall(cb: org.apache.spark.sql.DataFrame, residual: Boolean): Double =
          Similarity.recallAtK(
            Similarity.knnIvfPq(q, emb, centroids, cb, k, nprobe = 4,
              shortlist = shortlist, residual = residual), exact, k)
        println(f"$shortlist\t${recall(cbRaw, residual = false)}%.3f\t\t${recall(cbRes, residual = true)}%.3f\t\t${recall(cbFit, residual = true)}%.3f")
      }
    }
    val raw = graft.sources.Tables.embeddings(spark, sfDir)
    sweep("clustered (isotropic residuals)", Similarity.clusteredCorpus(raw).cache())
    // round-11 verdict item 4: the sub-clustered corpus is where the
    // Lloyd trainer has structure to find — fitted should WIN here
    sweep("structured (anisotropic-stretch residuals)", Similarity.structuredCorpus(raw).cache())
    spark.stop()
  }
}
