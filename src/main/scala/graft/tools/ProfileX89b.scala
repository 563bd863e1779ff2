package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Stage-granular timing inside the knnIvfPq ladder (dev-only). */
object ProfileX89b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 10)
    val centroids = Similarity.strideCentroids(emb, 16)
    val cb = Similarity.pqResidualCodebooks(emb, centroids)
    def t(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      println(f"[prof] $name%-26s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    spark.range(0, 100000, 1, 4).groupBy((col("id") % 7).as("k")).count().count()
    val assigned = Similarity.ivfAssign(emb, centroids)
    val cells = centroids.select(col("vec_id").as("cell_id"), col("embedding").as("cv"))
    val probes = q.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(broadcast(cells))
      .withColumn("csim", graft.functions.cosine_similarity(col("qv"), col("cv")))
      .groupBy(col("qid"), col("qv"))
      .agg(graft.functions.top_k_by(col("csim"), col("cell_id"), 4).as("top"))
      .select(col("qid"), col("qv"), explode(col("top.id")).as("cell_id"))
    val candIds = assigned.select(col("cell_id"), col("vec_id").as("neighbor_id"))
      .join(broadcast(probes.select(col("qid"), col("cell_id"))), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("qid"))
      .select(col("qid"), col("neighbor_id"))
    val candVecIds = candIds.select(col("neighbor_id").as("vec_id"))
    val encodeInput = Similarity.residualizeAssigned(
      assigned.join(candVecIds, Seq("vec_id"), "left_semi"), centroids)
    val codes = Similarity.pqEncode(encodeInput, cb)
    val reconBase = Similarity.pqDecode(codes, cb)
    for (_ <- 1 to 2) {
      t("probes")(probes)
      t("candIds")(candIds)
      t("encodeInput(resid)")(encodeInput)
      t("pqEncode")(codes)
      t("pqDecode")(reconBase)
      t("full knnIvfPq")(Similarity.knnIvfPq(q, emb, centroids, cb, 5, 4, 12))
      println("---")
    }
    spark.stop()
  }
}
