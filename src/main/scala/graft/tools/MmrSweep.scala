package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Measured relevance-vs-redundancy tradeoff of the MMR re-rank (x103):
  * for a λ grid, mean relevance of the selected set and mean pairwise
  * similarity WITHIN the selected set — the table that justifies the
  * operator (λ=1 must equal plain top-k; lowering λ must trade a little
  * relevance for a larger drop in redundancy).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.MmrSweep'
  */
object MmrSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 10)
    val vecs = emb.filter(col("vec_id") < 10000).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (ab, aa, bb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) {
        ab += a(i).toDouble * b(i).toDouble
        aa += a(i).toDouble * a(i).toDouble
        bb += b(i).toDouble * b(i).toDouble
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    println(f"${"lambda"}%-8s ${"mean_rel"}%-10s ${"mean_pair_sim"}%-14s (10 queries, shortlist 8, k 4, ${sfDir})")
    Seq(1.0, 0.75, 0.5, 0.25, 0.0).foreach { lam =>
      val sel = Similarity.mmrRerank(q, emb, 8, 4, lambda = lam).collect()
        .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor_id"))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val rels = sel.toSeq.flatMap { case (qid, ids) =>
        ids.map(id => cos(vecs(qid), vecs(id))) }
      val pairSims = sel.values.toSeq.flatMap { ids =>
        for (i <- ids.indices; j <- i + 1 until ids.size)
          yield cos(vecs(ids(i)), vecs(ids(j)))
      }
      println(f"$lam%-8.2f ${rels.sum / rels.size}%-10.4f ${pairSims.sum / pairSims.size}%-14.4f")
    }
    spark.stop()
  }
}
