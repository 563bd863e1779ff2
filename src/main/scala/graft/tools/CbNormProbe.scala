package graft.tools

import org.apache.spark.sql.functions._

/** One-off probe: mean codeword L2 norm, init vs Lloyd-fitted residual
  * codebooks, on the clustered corpus — quantifies the mean-contraction
  * effect the PqResidualSweep surfaced (dev-only, round-10).
  */
object CbNormProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Similarity
    def meanNorm(cb: org.apache.spark.sql.DataFrame): Double =
      cb.select(sqrt(aggregate(transform(col("codeword"), x => x * x),
          lit(0.0), (a, v) => a + v)).as("n"))
        .agg(avg(col("n"))).head().getDouble(0)
    def probe(tag: String, emb: org.apache.spark.sql.DataFrame): Unit = {
      val centroids = Similarity.strideCentroids(emb, 16).cache()
      val init = Similarity.pqResidualCodebooks(emb, centroids)
      println(f"[$tag] init mean codeword norm:   ${meanNorm(init)}%.4f")
      for (it <- Seq(1, 2, 4)) {
        val fit = Similarity.pqResidualCodebooksFitted(emb, centroids, iters = it)
        println(f"[$tag] fitted(iters=$it) mean norm: ${meanNorm(fit)}%.4f")
      }
    }
    val raw = graft.sources.Tables.embeddings(spark, sfDir)
    probe("isotropic", Similarity.clusteredCorpus(raw).localCheckpoint(false))
    probe("structured", Similarity.structuredCorpus(raw).localCheckpoint(false))
    spark.stop()
  }
}
