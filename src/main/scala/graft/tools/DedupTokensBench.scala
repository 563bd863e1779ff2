package graft.tools

import org.apache.spark.sql.functions._

/** dedup_tokens kernel vs the composed array form at GROWING document
  * length — the measurement behind x107's "giant-doc corpus would swap
  * in a per-row hash set" claim: the composed form pays O(tokens²)
  * array_position scans per row, the kernel one hash-set probe per
  * token. Synthetic docs draw tokens from a small vocabulary so the
  * dedup actually removes most repeats (the adversarial case for the
  * array form: long arrays, early first occurrences).
  *
  *   sbt 'runMain graft.tools.DedupTokensBench'
  */
object DedupTokensBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    println("tokens_per_doc\tdocs\tcomposed_s\tkernel_s\tspeedup")
    for (len <- Seq(100, 1000, 5000, 20000)) {
      val docs = math.max(20, 200000 / len)
      val data = (0 until docs).map { d =>
        val rnd = new scala.util.Random(d)
        (d.toLong, Seq.fill(len)(s"w${rnd.nextInt(500)}").mkString(" "))
      }.toDF("doc_id", "text").localCheckpoint(true)
      val w = filter(split(col("text"), " "), x => length(x) > 0)
      val composed = array_join(
        filter(w, (x, i) => array_position(w, x) === i + 1), " ")
      // force full evaluation via an aggregate over the result length
      def timed(c: org.apache.spark.sql.Column): Double = {
        val t0 = System.nanoTime()
        data.select(length(c).as("l")).agg(sum(col("l"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      timed(graft.functions.dedup_tokens(col("text"))) // JIT warm
      val tc = Seq.fill(2)(timed(composed)).min
      val tk = Seq.fill(2)(timed(graft.functions.dedup_tokens(col("text")))).min
      println(f"$len\t$docs\t$tc%.2f\t$tk%.2f\t${tc / tk}%.1fx")
    }
    spark.stop()
  }
}
