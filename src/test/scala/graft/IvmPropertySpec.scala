package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Seeded lifecycle fuzz for BOTH view-maintenance regimes (round-14):
  * the additive rollup (x139's subtraction idiom) and the monotone
  * rollup (x142's two-tier fold-or-rebuild policy) replayed over random
  * update/delete scripts against in-memory truth — group sums/extrema
  * over the live set after every script, plus the policy ledger: the
  * monotone rebuild count must equal EXACTLY the number of waves that
  * carried a retraction (a prior-version re-arrival or a deletion),
  * because a policy that rebuilds too often is quietly corpus-linear
  * and one that rebuilds too rarely serves stale extrema.
  */
class IvmPropertySpec extends SparkSuite {
  import spark.implicits._

  private val NDocs = 9
  private val NWaves = 4

  private def mk(rows: Seq[(Long, Option[String])]) =
    rows.toDF("doc_id", "text_opt")
      .select(col("doc_id"),
        col("text_opt").as("text"),
        concat(lit("g"), (col("doc_id") % 3).cast("string")).as("source"),
        lit("en").as("lang"))

  private def script(seed: Long): Seq[Seq[(Long, Option[String])]] = {
    val rnd = new scala.util.Random(seed)
    (0 until NWaves).map { w =>
      val actions = (0L until NDocs).flatMap { id =>
        val r = rnd.nextDouble()
        if (w == 0 || r < 0.4)
          Some(id -> Some(("x" * (1 + rnd.nextInt(12))) + s" w$w d$id"))
        else if (r < 0.6) Some(id -> None)
        else None
      }
      if (actions.nonEmpty) actions else Seq(0L -> Some(s"forced w$w"))
    }
  }

  // in-memory truth: live text per id, plus the per-wave retraction bit
  private def replay(waves: Seq[Seq[(Long, Option[String])]])
      : (Map[Long, String], Int) = {
    val live = mutable.Map[Long, String]()
    var rebuilds = 0
    waves.foreach { w =>
      val retracts = w.exists { case (id, t) => t.isEmpty || live.contains(id) }
      if (retracts) rebuilds += 1
      w.foreach {
        case (id, Some(t)) => live(id) = t
        case (id, None) => live.remove(id)
      }
    }
    (live.toMap, rebuilds)
  }

  private def groupsOf(live: Map[Long, String]): Map[String, (Long, Long, Long, Long, Long)] =
    live.groupBy { case (id, _) => s"g${id % 3}" }.map { case (g, docs) =>
      val lens = docs.values.map(_.length.toLong)
      val toks = docs.values.map(_.split(" ").length.toLong)
      g -> (docs.size.toLong, toks.sum, lens.sum, lens.min, lens.max)
    }

  private def runSeed(seed: Long): Unit = {
    val waves = script(seed)
    val (live, expectedRebuilds) = replay(waves)
    val truth = groupsOf(live)
    val root = tempDir(s"graft-ivm-prop$seed")
    waves.zipWithIndex.foreach { case (w, i) => writeWaveTo(root + "/src", i, mk(w)) }
    def stream() = spark.readStream.schema(mk(Seq(0L -> Some("t"))).schema)
      .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
    StreamingIngest.ivmRollupStream(stream(), root + "/a/docs",
      root + "/a/versions", root + "/a/rollup", root + "/a/ckpt",
      Seq("source", "lang"),
      Seq("n_tokens" -> size(split(col("text"), " ")).cast("long"),
        "n_chars" -> length(col("text")).cast("long")))
    StreamingIngest.monotoneRollupStream(stream(), root + "/m/docs",
      root + "/m/versions", root + "/m/view", root + "/m/rebuilds",
      root + "/m/ckpt", Seq("source", "lang"))
    val additive = StreamingIngest.resolvedRollup(
        spark, root + "/a/rollup", Seq("source", "lang"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"))).toMap
    assert(additive == truth.map { case (g, (n, t, c, _, _)) => g -> (n, t, c) },
      s"seed $seed: additive view diverged from the truth rollup")
    val mono = StreamingIngest.resolvedMonotoneRollup(spark, root + "/m/view")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("min_chars"), r.getAs[Long]("max_chars"))).toMap
    assert(mono == truth.map { case (g, (n, _, _, lo, hi)) => g -> (n, lo, hi) },
      s"seed $seed: monotone view diverged from the truth extrema")
    assert(StreamingIngest.monotoneRebuildCount(spark, root + "/m/rebuilds")
      == expectedRebuilds.toLong,
      s"seed $seed: the policy rebuilt on the wrong waves " +
        s"(expected $expectedRebuilds)")
  }

  test("seeded random lifecycles: both maintenance regimes equal the truth rollup and the monotone policy rebuilds on exactly the retraction waves") {
    Seq(7L, 99L, 2024L).foreach(runSeed)
  }
}
