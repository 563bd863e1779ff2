package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.pipeline.Bucketing
import graft.streaming.StreamingIngest

/** Property-style lifecycle fuzz for the versioned-store machinery
  * (round-14): seeded random update/delete scripts are replayed against
  * an IN-MEMORY last-write-wins truth fold, and every read surface must
  * agree with it — the flat resolve, the bucketed resolve (row-identical
  * by contract), and the as-of reconstruction at EVERY intermediate
  * seq. The hand-written specs pin designed scenarios; this pins the
  * combinatorics those scenarios can miss (delete-then-reinsert chains,
  * same-wave multi-action interleavings across many ids, ids that churn
  * every wave vs ids that never move).
  */
class VersionedStorePropertySpec extends SparkSuite {
  import spark.implicits._

  private val NDocs = 8
  private val NWaves = 4

  /** One seeded lifecycle: per wave, each doc independently updates
    * (40%), deletes (20%), or stays absent; empty waves are topped up
    * so every batchId carries rows (the seq↔wave alignment the as-of
    * checks rely on).
    */
  private def script(seed: Long): Seq[Seq[(Long, Option[String])]] = {
    val rnd = new scala.util.Random(seed)
    (0 until NWaves).map { w =>
      val actions = (0L until NDocs).flatMap { id =>
        val r = rnd.nextDouble()
        if (w == 0 || r < 0.4) Some(id -> Some(s"doc$id wave$w ${rnd.nextInt(1000)}"))
        else if (r < 0.6) Some(id -> None) // deletion
        else None
      }
      if (actions.nonEmpty) actions else Seq(0L -> Some(s"doc0 forced wave$w"))
    }
  }

  private def truthSnapshots(waves: Seq[Seq[(Long, Option[String])]]): Seq[Map[Long, String]] = {
    val live = mutable.Map[Long, String]()
    waves.map { w =>
      w.foreach {
        case (id, Some(t)) => live(id) = t
        case (id, None) => live.remove(id)
      }
      live.toMap
    }
  }

  private def idText(d: org.apache.spark.sql.DataFrame): Map[Long, String] =
    d.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def runSeed(seed: Long): Unit = {
    val waves = script(seed)
    val snaps = truthSnapshots(waves)
    val root = tempDir(s"graft-vstore-prop$seed")
    waves.zipWithIndex.foreach { case (w, i) =>
      writeWaveTo(root + "/src", i,
        w.toDF("doc_id", "text_opt")
          .select(col("doc_id"), col("text_opt").as("text")))
    }
    def stream() = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
    StreamingIngest.docStoreStream(stream(), root + "/docs",
      root + "/versions", root + "/ckpt", maxFiles = Int.MaxValue)
    val (dt, vt) = (s"vprop_docs_$seed", s"vprop_vers_$seed")
    spark.sql(s"DROP TABLE IF EXISTS $dt")
    spark.sql(s"DROP TABLE IF EXISTS $vt")
    try {
      StreamingIngest.docStoreStreamBucketed(stream(), dt, vt,
        root + "/bckpt", buckets = 4)
      // live reads: truth == flat == bucketed
      assert(idText(StreamingIngest.resolvedDocs(spark, root + "/docs", root + "/versions"))
        == snaps.last, s"seed $seed: flat live read diverged from the truth fold")
      assert(idText(Bucketing.resolvedBucketed(spark, dt, vt, "doc_id"))
        == snaps.last, s"seed $seed: bucketed live read diverged from the truth fold")
      // as-of at every intermediate seq == the truth snapshot there
      snaps.zipWithIndex.foreach { case (snap, s) =>
        assert(idText(StreamingIngest.resolvedRowsAsOf(spark, root + "/docs",
          root + "/versions", "doc_id", s.toLong)) == snap,
          s"seed $seed: as-of($s) diverged from the truth snapshot")
      }
      // floor-compact mid-history: everything at/above the floor stays
      // exact, the live reads are invariant
      StreamingIngest.compactVersionedKeepAfter(
        spark, root + "/docs", root + "/versions", 1L)
      (1 until NWaves).foreach { s =>
        assert(idText(StreamingIngest.resolvedRowsAsOfChecked(spark, root + "/docs",
          root + "/versions", "doc_id", s.toLong)) == snaps(s),
          s"seed $seed: post-floor as-of($s) diverged")
      }
      assert(idText(StreamingIngest.resolvedDocs(spark, root + "/docs", root + "/versions"))
        == snaps.last, s"seed $seed: floor compaction changed the live read")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $dt")
      spark.sql(s"DROP TABLE IF EXISTS $vt")
    }
  }

  test("seeded random lifecycles: flat, bucketed, and as-of reads all equal the in-memory truth fold; the floor fold preserves at/above-floor history") {
    Seq(11L, 42L, 1337L).foreach(runSeed)
  }
}
