package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** BPE fit cost vs merge depth (round-10 verdict item 6; depth ≥ 512 and
  * the batch-width story: round-12, r11 verdict item 4): x57 registers a
  * 4-merge fit, but a production tokenizer is 32k merges and each merge
  * is one sequential Spark job over the vocab-sized frame — the
  * questions are (a) whether per-merge cost stays FLAT with depth
  * (iterations are vocab-sized, corpus-independent), and (b) how many
  * merges a candidate-window PASS actually retires, because the batched
  * form's claim — "one vocab count job per BATCH of merges" — only pays
  * off when the top of the pair distribution is symbol-DISJOINT.
  *
  * Two corpora make the two regimes measurable:
  *   - the natural `documents` table, where adjacent high-count pairs
  *     chain through shared symbols ("the"→(t,h),(th,e)) and counts are
  *     near-ties, so the safe prefix is short (merges/pass ≈ 1);
  *   - [[disjointPairCorpus]], whose top-of-distribution pairs share no
  *     symbols and whose counts are strictly decreasing, so every
  *     window retires `window` merges (merges/pass ≈ window) — the
  *     multi-domain/code/multilingual shape where vocabularies are wide.
  *
  *   sbt 'runMain graft.tools.BpeDepthBench /root/testdata/sf0.1'
  */
object BpeDepthBench {

  /** A corpus of `nPairs` words `XᵢYᵢXᵢYᵢ` over pairwise-DISJOINT
    * two-symbol alphabets, word i appearing `2·nPairs − i` times. The
    * doubled pair inside each word puts (Xᵢ,Yᵢ) at count 2cᵢ while every
    * induced secondary pair — (Yᵢ,Xᵢ) and the end-of-word (Yᵢ,</w>) —
    * sits at cᵢ, and `2·min(cᵢ) > max(cᵢ)` holds for every nPairs, so
    * the ENTIRE top of the distribution is the disjoint main pairs in
    * strict count order: every candidate window keeps its full width
    * (no shared symbols, no ties), and the first `nPairs` merge ranks
    * are known analytically — rank i+1 merges (Xᵢ,Yᵢ) at count
    * `2·(2·nPairs − i)` (merges past nPairs reach the secondary pool;
    * keep depth ≤ nPairs for the closed form). Driver-side construction
    * is ~nPairs·6 KB of literal strings — a bench/spec corpus, not a
    * data path.
    */
  def disjointPairCorpus(spark: SparkSession, nPairs: Int): DataFrame = {
    import spark.implicits._
    (0 until nPairs).map { i =>
      val x = (0x4E00 + 2 * i).toChar
      val y = (0x4E00 + 2 * i + 1).toChar
      val word = "" + x + y + x + y
      (i.toLong, Seq.fill(2 * nPairs - i)(word).mkString(" "))
    }.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir).cache()
    val nDocs = docs.count()
    println(s"docs=$nDocs sfDir=$sfDir")
    println("corpus\tform\trequested\tlearned\ttotal_s\tper_merge_ms\tpasses\tmerges_per_pass")
    def row(corpus: String, form: String, depth: Int, learned: Long,
        dt: Double, passes: Int): Unit = {
      val mpp = if (passes > 0) learned.toDouble / passes else 0.0
      println(f"$corpus\t$form\t$depth\t$learned\t$dt%.1f\t${dt * 1000 / math.max(1L, learned)}%.0f\t$passes\t$mpp%.2f")
    }
    // natural text: serial to 128 (each merge is one full count job —
    // past that the serial wall is just depth × the same per-job cost),
    // batched to 512 (this corpus exhausts at ~107 mergeable pairs —
    // `learned` is the denominator that matters, not `requested`)
    for (depth <- Seq(4, 16, 64, 128)) {
      val t0 = System.nanoTime()
      val n = graft.ext.Bpe.fit(docs, depth).count()
      row("documents", "serial", depth, n, (System.nanoTime() - t0) / 1e9, n.toInt)
    }
    for (depth <- Seq(64, 128, 256, 512)) {
      val t1 = System.nanoTime()
      val n = graft.ext.Bpe.fitBatched(docs, depth, window = 64).count()
      val dtB = (System.nanoTime() - t1) / 1e9
      row("documents", "batched", depth, n, dtB, graft.ext.Bpe.lastBatchSizes.size)
    }
    // disjoint-pair corpus: the wide-batch regime at the same depths
    val wide = disjointPairCorpus(spark, 600).cache()
    wide.count()
    for (depth <- Seq(128)) {
      val t0 = System.nanoTime()
      val n = graft.ext.Bpe.fit(wide, depth).count()
      row("disjoint", "serial", depth, n, (System.nanoTime() - t0) / 1e9, n.toInt)
    }
    for ((depth, w) <- Seq((128, 64), (512, 64), (512, 128))) {
      val t1 = System.nanoTime()
      val n = graft.ext.Bpe.fitBatched(wide, depth, window = w).count()
      val dtB = (System.nanoTime() - t1) / 1e9
      row(s"disjoint(w=$w)", "batched", depth, n, dtB, graft.ext.Bpe.lastBatchSizes.size)
    }
    spark.stop()
  }
}
