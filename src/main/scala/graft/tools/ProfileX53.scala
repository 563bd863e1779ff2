package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Dev-only stage profiler for x53_semdedup_kmeans.
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.ProfileX53'
  */
object ProfileX53 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    emb.count() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    time("kmeansFitExact(8,2)")(Similarity.kmeansFitExact(emb, 8, 2).count())
    val cells = Similarity.kmeansFitExact(emb, 8, 2)
      .select(col("vec_id"), col("cell_id"))
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .localCheckpoint(true)
    time("within-cell pairs")(
      cells.select(col("cell_id"), col("vec_id").as("id_a"), col("embedding").as("va"))
        .join(cells.select(col("cell_id"), col("vec_id").as("id_b"), col("embedding").as("vb")),
          Seq("cell_id"))
        .filter(col("id_a") < col("id_b"))
        .filter(graft.functions.cosine_similarity(col("va"), col("vb")) >= 0.35)
        .count())
    val pairs = cells.select(col("cell_id"), col("vec_id").as("id_a"), col("embedding").as("va"))
      .join(cells.select(col("cell_id"), col("vec_id").as("id_b"), col("embedding").as("vb")),
        Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.cosine_similarity(col("va"), col("vb")) >= 0.35)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    time("cc assign on pairs")(
      graft.operators.ConnectedComponents.assign(
        emb.select(col("vec_id")), pairs, "vec_id", "id_a", "id_b").count())
    val (labs, rounds) = graft.operators.ConnectedComponents
      .labelsAdaptiveWithRounds(pairs, "id_a", "id_b")
    println(s"[profile] adaptive rounds=$rounds comps=${labs.select("component").distinct().count()}")
    val (_, r2) = graft.operators.ConnectedComponents
      .labelsWithRounds(pairs, "id_a", "id_b")
    println(s"[profile] pure altstar rounds=$r2")
    time("full x53")(Similarity.semDedupKmeans(emb).count())
    spark.stop()
  }
}
