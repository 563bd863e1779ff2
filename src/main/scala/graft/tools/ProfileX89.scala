package graft.tools

import org.apache.spark.sql.functions._

/** Component timings for the x89/x92 recall decompositions (dev-only,
  * round-10): where do the ~2.5 s go — brute, the IVF ladder, or the
  * IVF-PQ ladder — and how much of it is the duplicated cell-assign?
  */
object ProfileX89 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 10)
    val centroids = Similarity.strideCentroids(emb, 16)
    val cb = Similarity.pqResidualCodebooks(emb, centroids)
    def t(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    // warm
    spark.range(0, 100000, 1, 4).groupBy((col("id") % 7).as("k")).count().count()
    for (_ <- 1 to 2) {
      t("brute")(Similarity.knnBrute(q, emb, 5))
      t("ivfAssign")(Similarity.ivfAssign(emb, centroids))
      t("knnIvf")(Similarity.knnIvf(q, emb, centroids, 5, 4))
      t("knnIvfPq")(Similarity.knnIvfPq(q, emb, centroids, cb, 5, 4, 12))
      t("codebooks")(cb)
      println("---")
    }
    spark.stop()
  }
}
