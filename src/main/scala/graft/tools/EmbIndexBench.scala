package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only measurement behind the embedding-LSH index compaction policy
  * (round 9, r8-verdict item 4): the per-batch probe of
  * `embeddingDedupStream` reads the WHOLE standing index directory, so
  * after N micro-batches the same logical index sits in N parquet file
  * groups and every probe pays N footer reads + N tiny row groups —
  * read amplification with zero row growth, the exact failure mode the
  * chunk index measured in round 8. This times the shared verdict
  * kernel (`Similarity.embeddingDedupVerdicts`) for one batch against
  * bit-identical index CONTENT in two LAYOUTS:
  *
  *   fragmented: `nGroups` appends (the stream's natural layout after
  *               nGroups batches, one file group each)
  *   compacted:  the same rows after `maybeCompactEmbeddingIndex`
  *               (one keyed rewrite, file count collapsed)
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.EmbIndexBench'
  *
  * Prints one line per layout (min of 2 passes) plus the file counts —
  * the SCALING.md row showing the policy bounds read amplification.
  */
object EmbIndexBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-emb-index-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    import spark.implicits._

    val nGroups = args.headOption.map(_.toInt).getOrElse(64)
    val perGroup = 2000 // index rows per micro-batch file group
    val batchN = 2000 // probe batch size
    val dim = graft.ext.Similarity.Dim
    val root = graft.util.Scratch.tempDir("graft-embidx")

    // deterministic synthetic vectors (id-seeded), bucketed once — the
    // exact shape the stream appends: (vec_id, bucket, embedding[, seq])
    def vectors(fromId: Long, n: Int): DataFrame =
      spark.range(fromId, fromId + n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => pmod(xxhash64(col("id"), i), lit(1000)).cast("float") / 1000f - 0.5f)
          .as("embedding"))
        .select(col("vec_id"),
          graft.ext.Similarity.lshBucket(col("embedding")).as("bucket"),
          col("embedding"))

    (0 until nGroups).foreach { g =>
      graft.pipeline.Ingest.appendWithSeq(
        vectors(g.toLong * perGroup, perGroup).coalesce(1), s"$root/frag", g.toLong)
    }
    // identical content, compacted layout: copy then run the policy
    spark.read.parquet(s"$root/frag").write.parquet(s"$root/compact-staging")
    (0 until nGroups).foreach { g =>
      graft.pipeline.Ingest.appendWithSeq(
        spark.read.parquet(s"$root/compact-staging")
          .filter(col("ingest_seq") === g).drop("ingest_seq").coalesce(1),
        s"$root/compact", g.toLong)
    }
    require(graft.streaming.StreamingIngest.maybeCompactEmbeddingIndex(
      spark, s"$root/compact", maxFiles = 1), "compaction should have triggered")

    val batch = vectors(1000000L, batchN).select(col("vec_id"), col("embedding"))
      .localCheckpoint(false)

    def files(dir: String): Long =
      graft.streaming.StreamingIngest.cdcIndexFileCount(spark, dir)
    def probe(dir: String): Double = {
      val idx = spark.read.parquet(dir).select(col("bucket"), col("embedding"))
      val t0 = System.nanoTime()
      graft.ext.Similarity.embeddingDedupVerdicts(idx, batch, 0.9)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for ((tag, dir) <- Seq("fragmented" -> s"$root/frag", "compacted" -> s"$root/compact")) {
      val secs = (1 to 2).map(_ => probe(dir)).min
      println(f"[embidx] $tag%-10s files=${files(dir)}%4d  probe_min=$secs%6.2f s  " +
        f"(index ${nGroups * perGroup} rows, batch $batchN)")
    }
    spark.stop()
  }
}
