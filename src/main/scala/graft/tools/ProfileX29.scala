package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for x29 (char-n-gram language ID): times the
  * gram explode, the profile-training branch, and the scoring branch
  * separately. Round-4 measurements at sf0.1 (5000 docs, 1.48M bigrams,
  * local[32], warm): explode 0.3 s, training 1.0 s, scoring 2.2 s, full
  * query ~1.9 s — shuffles all post-partial-agg (tiny); residual cost is
  * per-stage scheduling, not data volume. The rejected shared
  * (doc,lang,gram) pre-aggregation variant measured ~2× slower (column
  * pruning defeats ReuseExchange — see languageIdNgram's comment).
  *
  * Round 8: the registered x29 switched to `languageIdNgramLiteral`
  * (profile embedded as a literal map — no scoring join/window/
  * crossJoin; measured 1.10 → 0.79 s warm, registered-path 2.95 →
  * ~1.5 s). This profiler still times the declarative reference form.
  *
  *   sbt 'runMain graft.tools.ProfileX29'
  */
object ProfileX29 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[32]", 32)
    val docs = graft.sources.Tables.loadFanout(spark, sfDir, "documents")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    val grams = docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.char_ngrams(col("text"), 2)).as("g"))
    for (_ <- 1 to 2) {
      time("explode-only")(grams.count())
      time("full")(graft.SparkEntry.queries("x29_lang_id_ngram")(spark, sfDir).count())
    }
    spark.stop()
  }
}
