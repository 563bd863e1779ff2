package graft.tools

import org.apache.spark.sql.functions._

/** IVF nprobe/recall trade-off sweep (round-3 roadmap follow-up).
  *
  * For each (centroid count C, Lloyd iterations L, nprobe P) point,
  * measures recall@5 of `Similarity.knnIvf` against the exact
  * brute-force top-5 (`knnBrute`) plus wall time, and prints one table.
  * The point of the sweep is the *shape*: at a fixed C, recall should
  * climb with P toward the brute-force 1.0 while cost climbs linearly
  * in P/C of the corpus scanned — the measured curve is what a capacity
  * planner needs to size an IVF index at 10^9 vectors (pick C ≈ sqrt(N),
  * then the smallest P whose recall clears the product bar).
  *
  *   sbt 'runMain graft.tools.RecallSweep /root/testdata/sf0.1'
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.build()
    import graft.ext.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sfDir).cache()
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 50).cache()
    q.count()
    val k = 5
    val exact = Similarity.knnBrute(q, emb, k).cache()
    exact.count()

    println(f"corpus=$n queries=50 k=$k")
    println("C\titers\tnprobe\trecall@5\tsec")
    for (c <- Seq(16, 32, 64); iters <- Seq(0, 2)) {
      val cents = {
        val init = Similarity.strideCentroids(emb, c)
        (if (iters == 0) init else Similarity.kmeansIterate(emb, init, iters)).cache()
      }
      cents.count()
      for (p <- Seq(1, 2, 4, 8, 16).filter(_ <= c)) {
        val t0 = System.nanoTime()
        val r = Similarity.recallAtK(Similarity.knnIvf(q, emb, cents, k, p), exact, k)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"$c\t$iters\t$p\t$r%.3f\t$sec%.2f")
      }
      cents.unpersist()
    }
    spark.stop()
  }
}
