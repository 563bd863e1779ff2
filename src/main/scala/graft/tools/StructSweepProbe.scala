package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
object StructSweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Similarity
    val raw = graft.sources.Tables.embeddings(spark, sfDir)
    val anchors = raw.select(col("vec_id").as("__aid"), col("embedding").as("__av"))

    // variant A: continuous anisotropic stretch — noise elementwise
    // modulated by a fixed anchor row (vec_id=7)
    def stretch(k: Int, stride: Long, scale: Double): DataFrame = {
      raw.select(col("vec_id"), col("embedding"),
          (pmod(col("vec_id"), lit(k)) * stride).as("__cid"), lit(7L).as("__sid"))
        .join(broadcast(anchors.select(col("__aid").as("__cid"), col("__av").as("__cv"))), Seq("__cid"))
        .join(broadcast(anchors.select(col("__aid").as("__sid"), col("__av").as("__sv"))), Seq("__sid"))
        .select(col("vec_id"),
          zip_with(col("__cv"),
            zip_with(col("__sv"), col("embedding"),
              (s, e) => lit(scale) * s.cast("double") * e.cast("double")),
            (c, se) => c.cast("double") + se).as("embedding"))
    }
    // variant B: lobes with small cluster count (4 clusters x 2 lobes = 8 lobes < 16 codewords)
    def lobes(k: Int, cStride: Long, sStride: Long, subScale: Double, noise: Double): DataFrame = {
      val centerId = pmod(col("vec_id"), lit(k)) * cStride
      val subId = (pmod(col("vec_id"), lit(k)) * 2 +
        pmod(col("vec_id").divide(lit(k)).cast("long"), lit(2))) * sStride
      raw.select(col("vec_id"), col("embedding"), centerId.as("__cid"), subId.as("__sid"))
        .join(broadcast(anchors.select(col("__aid").as("__cid"), col("__av").as("__cv"))), Seq("__cid"))
        .join(broadcast(anchors.select(col("__aid").as("__sid"), col("__av").as("__sv"))), Seq("__sid"))
        .select(col("vec_id"),
          zip_with(col("__cv"),
            zip_with(col("__sv"), col("embedding"),
              (s, e) => lit(subScale) * s.cast("double") + lit(noise) * e.cast("double")),
            (c, se) => c.cast("double") + se).as("embedding"))
    }
    def sweep(tag: String, embU: DataFrame): Unit = {
      val emb = embU.cache()
      val q = emb.filter(col("vec_id") < 10).cache(); q.count()
      val k = 5
      val exact = Similarity.knnBrute(q, emb, k).cache(); exact.count()
      val centroids = Similarity.strideCentroids(emb, 16).cache(); centroids.count()
      val cbRes = Similarity.pqResidualCodebooks(emb, centroids).cache()
      val cbFit = Similarity.pqResidualCodebooksFitted(emb, centroids, iters = 2).cache()
      cbRes.count(); cbFit.count()
      def recall(cb: DataFrame, shortlist: Int): Double =
        Similarity.recallAtK(
          Similarity.knnIvfPq(q, emb, centroids, cb, k, nprobe = 4,
            shortlist = shortlist, residual = true), exact, k)
      val line = Seq(12, 24, 48).map(sl => f"sl$sl init ${recall(cbRes, sl)}%.3f fit ${recall(cbFit, sl)}%.3f").mkString("  ")
      println(s"[probe] $tag  $line")
      emb.unpersist(); q.unpersist(); exact.unpersist(); centroids.unpersist()
    }
    sweep("stretch k13 s0.30", stretch(13, 38L, 0.30))
    sweep("stretch k13 s0.45", stretch(13, 38L, 0.45))
    sweep("lobes k4 sub0.3 n0.06", lobes(4, 38L, 17L, 0.3, 0.06))
    sweep("lobes k4 sub0.3 n0.15", lobes(4, 38L, 17L, 0.3, 0.15))
    spark.stop()
  }
}
