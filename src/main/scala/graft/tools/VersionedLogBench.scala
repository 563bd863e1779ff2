package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quantifies the LSM trade on the versioned index logs (round-13, the
  * r12 verdict item 6): the `maxPostingFiles = 64` compaction default
  * was chosen with the read-amplification claim made in prose — this
  * measures it. For a postings log fragmented into B+B/4 per-batch
  * file groups (each micro-batch append = one file group, the
  * streaming loop's shape; B batches deliver the WHOLE corpus, then
  * B/4 update batches re-deliver the first quarter's docs so the
  * resolve join really filters stale versions — ~20% of rows):
  *
  *   - resolve cost FRAGMENTED: full `resolvedPostings` pass (the
  *     max-seq aggregate over the version log + the doc-keyed join)
  *     with B+B/4 file groups on both logs;
  *   - the compaction rewrite itself (`maybeCompactVersioned` forced);
  *   - resolve cost COMPACTED: the same pass over one file group per
  *     log, live rows only.
  *
  * Rows print per (factor, B): the knob's trade is (fragmented −
  * compacted) read tax per query vs the one-off rewrite cost, and the
  * 64-file default is justified (or re-tuned) from where the tax curve
  * crosses the rewrite amortization.
  *
  *   sbt 'runMain graft.tools.VersionedLogBench /root/testdata/sf0.1 10 16 64 256'
  */
object VersionedLogBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-versioned-log-bench")
      // the bucketed twin uses catalog tables — keep the warehouse out
      // of the repo working tree
      .config("spark.sql.warehouse.dir",
        graft.util.Scratch.tempDir("graft-vlog-warehouse") + "/warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val batchCounts = {
      val bs = args.drop(2).map(_.toInt)
      if (bs.nonEmpty) bs.toSeq else Seq(16, 64, 256)
    }

    // amplified corpus, one scratch write (the ScaleSmoke shift)
    val base = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs = (0 until factor).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionAll _)
      .localCheckpoint(true)
    val nDocs = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    batchCounts.foreach { b =>
      val root = graft.util.Scratch.tempDir(s"graft-vlog-x$factor-b$b")
      val (postingsDir, versionsDir) = (root + "/postings", root + "/versions")
      // Micro-batch appends, one file group each (coalesce(1) per
      // append — the small-batch streaming shape): B data batches
      // deliver EVERY doc (residue i of B), then B/4 additional update
      // batches RE-DELIVER the first quarter's residues (doc updates),
      // so the whole corpus is in the logs and ~20% of postings rows
      // are stale at read time. Total file groups per log: B + B/4.
      val bb = math.max(4, b)
      (0 until bb + bb / 4).foreach { i =>
        val residue = if (i < bb) i.toLong else (i - bb).toLong
        val batch = docs.filter(pmod(col("doc_id"), lit(bb.toLong)) === residue)
        graft.pipeline.Ingest.appendWithSeq(
          batch.select(col("doc_id")).coalesce(1), versionsDir, i.toLong)
        graft.pipeline.Ingest.appendWithSeq(
          graft.ext.TextRank.postings(batch).coalesce(1), postingsDir, i.toLong)
      }
      // BUCKETED twin (round-14, r13 verdict item 5): the same
      // micro-batch history appended as id-bucketed tables, so the
      // resolve's max-seq aggregate + doc-keyed join ride the bucket
      // partitioning with zero exchanges (BucketingSpec locks the plan;
      // this measures what the removed shuffles are worth at each
      // fragmentation level). Same per-batch coalesce(1) discipline —
      // appendBucketedWithSeq's repartition then caps files at
      // `buckets` per append.
      val (bDocsT, bVersT) = (s"vlog_docs_x${factor}_b$b", s"vlog_vers_x${factor}_b$b")
      spark.sql(s"DROP TABLE IF EXISTS $bDocsT")
      spark.sql(s"DROP TABLE IF EXISTS $bVersT")
      val buckets = 16
      (0 until bb + bb / 4).foreach { i =>
        val residue = if (i < bb) i.toLong else (i - bb).toLong
        val batch = docs.filter(pmod(col("doc_id"), lit(bb.toLong)) === residue)
        graft.pipeline.Ingest.appendBucketedWithSeq(
          batch.select(col("doc_id")), bVersT, "doc_id", buckets, i.toLong)
        graft.pipeline.Ingest.appendBucketedWithSeq(
          graft.ext.TextRank.postings(batch), bDocsT, "doc_id", buckets, i.toLong)
      }
      import graft.streaming.StreamingIngest.{cdcIndexFileCount, maybeCompactVersioned, resolvedPostings}
      def resolveCost(): Double = {
        val (_, s) = timed {
          resolvedPostings(spark, postingsDir, versionsDir)
            .agg(count(lit(1)), sum(col("tf")))
            .write.mode("overwrite").format("noop").save()
        }
        s
      }
      def resolveBucketedCost(): Double = {
        val (_, s) = timed {
          graft.pipeline.Bucketing.resolvedBucketed(spark, bDocsT, bVersT, "doc_id")
            .agg(count(lit(1)), sum(col("tf")))
            .write.mode("overwrite").format("noop").save()
        }
        s
      }
      val filesData = cdcIndexFileCount(spark, postingsDir)
      val filesVers = cdcIndexFileCount(spark, versionsDir)
      // two passes each, min (the Bench noise rationale)
      val fragSec = math.min(resolveCost(), resolveCost())
      val bucketSec = math.min(resolveBucketedCost(), resolveBucketedCost())
      val bucketExch = graft.pipeline.Bucketing.countExchanges(
        graft.pipeline.Bucketing.resolvedBucketed(spark, bDocsT, bVersT, "doc_id"))
      val (_, compactSec) = timed {
        require(maybeCompactVersioned(spark, postingsDir, versionsDir, maxFiles = 0),
          "forced compaction did not trigger")
      }
      val compSec = math.min(resolveCost(), resolveCost())
      val (_, bCompactSec) = timed {
        graft.pipeline.Bucketing.compactVersionedBucketed(
          spark, bDocsT, bVersT, "doc_id", buckets)
      }
      val bCompSec = math.min(resolveBucketedCost(), resolveBucketedCost())
      val liveRows = spark.read.parquet(postingsDir).count()
      spark.sql(s"DROP TABLE IF EXISTS $bDocsT")
      spark.sql(s"DROP TABLE IF EXISTS $bVersT")
      println(f"[vlog] x$factor%-4d B=$bb%-4d files=$filesData%d/$filesVers%d " +
        f"docs=$nDocs%d live_rows=$liveRows%d " +
        f"resolve_frag=$fragSec%.2fs resolve_bucketed=$bucketSec%.2fs " +
        f"(exchanges=$bucketExch) compact=$compactSec%.2fs resolve_comp=$compSec%.2fs " +
        f"bcompact=$bCompactSec%.2fs resolve_bucketed_comp=$bCompSec%.2fs")
    }
    spark.stop()
  }
}
