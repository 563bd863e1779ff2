package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.streaming.StreamingIngest

/** The incrementally-maintained IVF serving index (round-13, x128):
  * per-arrival assignment to pinned cells equals the batch whole-corpus
  * assignment over the latest versions, an update MOVES the live row's
  * cell, a deletion removes the doc from the served index, serving off
  * the resolved rows equals batch knnIvf over the latest corpus, and
  * replay/compaction are invisible.
  */
class IvfUpsertStreamSpec extends SparkSuite {

  private lazy val emb = graft.sources.Tables.embeddings(spark, sf)
    .filter(col("vec_id") < 200).select(col("vec_id"), col("embedding"))
    .withColumn("h4", pmod(graft.ext.TextDedup.portableHashBuiltin(
      col("vec_id").cast("string"), ""), lit(4L)))
    .localCheckpoint(false)

  // pinned cell structure: a 5-centroid stride sample of the ORIGINAL
  // corpus (strideCentroids' 1000-row stride leaves too few hits on the
  // 200-row spec slice)
  private lazy val centroids = emb.filter(pmod(col("vec_id"), lit(40L)) === 0)
    .select(col("vec_id"), col("embedding")).localCheckpoint(false)

  private def writeWaves(root: String): DataFrame = {
    val neg = transform(col("embedding"), x => -x)
    def w(df: DataFrame) = df.select(col("vec_id"), col("embedding"))
    writeWaveTo(root + "/src", 0, w(emb))
    writeWaveTo(root + "/src", 1,
      w(emb.filter(col("h4") === 1).withColumn("embedding", neg))
        .unionByName(w(emb.filter(col("h4") === 3).withColumn("embedding", neg))))
    writeWaveTo(root + "/src", 2,
      w(emb.filter(col("h4") === 2)
          .withColumn("embedding", lit(null).cast("array<float>")))
        .unionByName(w(emb.filter(col("h4") === 3))))
    // the latest-version corpus in closed form
    emb.filter(col("h4") === 1).withColumn("embedding", neg).drop("h4")
      .unionByName(emb.filter(col("h4") === 0 || col("h4") === 3).drop("h4"))
  }

  private def run(root: String, ckpt: String, maxVecFiles: Int = 64): Unit = {
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.ivfIndexUpsertStream(stream, root + "/vecs",
      root + "/versions", root + s"/$ckpt", centroids,
      maxVecFiles = maxVecFiles)
  }

  test("live assignment equals batch ivfAssign over latest versions; updates move cells; deletions leave") {
    val root = tempDir("graft-ivfus1")
    val latest = writeWaves(root)
    run(root, "ckpt")
    val live = StreamingIngest.resolvedIvfVectors(spark, root + "/vecs", root + "/versions")
    val liveCells = live.select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchCells = Similarity.ivfAssign(latest, centroids)
      .select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(liveCells == batchCells,
      "per-arrival assignment diverged from whole-corpus assignment over latest versions")
    // deletions: no h4==2 id is served
    val deleted = emb.filter(col("h4") === 2).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(liveCells.forall(t => !deleted.contains(t._1)), "a deleted doc is still served")
    // updates moved cells: at least one negated doc changed assignment
    val before = Similarity.ivfAssign(emb.drop("h4"), centroids)
      .select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val negIds = emb.filter(col("h4") === 1).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(negIds.exists(id => liveCells.contains((id, before(id))) == false),
      "no negated vector moved cell — the update path is untested")
  }

  test("serving off the resolved rows equals batch knnIvf over the latest corpus") {
    val root = tempDir("graft-ivfus2")
    val latest = writeWaves(root)
    run(root, "ckpt")
    val live = StreamingIngest.resolvedIvfVectors(spark, root + "/vecs", root + "/versions")
      .localCheckpoint(false)
    val queries = emb.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
    def ranks(df: DataFrame): Set[(Long, Int, Long)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val served = ranks(Similarity.knnIvf(queries, live, centroids, 5, 2,
      assignedOpt = Some(live)))
    val batch = ranks(Similarity.knnIvf(queries, latest, centroids, 5, 2))
    assert(served == batch, "served results diverged from batch IVF over latest corpus")
  }

  test("refit-and-swap: new structure served, stamps preserved, superseded versions dropped, stream continues") {
    val root = tempDir("graft-ivfus4")
    val latest = writeWaves(root)
    run(root, "ckpt")
    val refitCents = StreamingIngest.ivfRefitSwap(spark, root + "/vecs", root + "/versions",
      centroidPolicy = df => df.filter(pmod(col("vec_id"), lit(40L)) === 0)
        .select(col("vec_id"), col("embedding")))
    // the refit policy ran on the LIVE corpus: deleted stride ids are
    // not centroids anymore
    val deleted = emb.filter(col("h4") === 2).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val centIds = refitCents.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(centIds.forall(id => !deleted.contains(id)))
    // served state equals batch assignment over latest versions with the
    // refit centroids
    val live = StreamingIngest.resolvedIvfVectors(spark, root + "/vecs", root + "/versions")
    val liveCells = live.select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchCells = Similarity.ivfAssign(latest, refitCents)
      .select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(liveCells == batchCells, "refit-swapped assignment diverged from batch over refit centroids")
    // the refit IS a compaction: no superseded versions remain, and
    // surviving rows keep their ORIGINAL seq stamps (resolution + the
    // landedSeq replay guards stay oblivious to the swap)
    val vecs = spark.read.parquet(root + "/vecs")
    assert(vecs.groupBy(col("vec_id")).agg(countDistinct(col("ingest_seq")).as("nv"))
      .filter(col("nv") > 1).count() == 0, "superseded versions survived the refit rewrite")
    val negSeqs = vecs.filter(col("vec_id").isin(
        emb.filter(col("h4") === 1).select("vec_id").collect().map(_.getLong(0)).toSeq: _*))
      .select("ingest_seq").distinct().collect().map(_.getLong(0)).toSet
    assert(negSeqs == Set(1L), s"updated docs' live rows must keep their wave-1 stamp: $negSeqs")
    // a post-refit wave flows through the SAME checkpoint with the new
    // centroids: a fresh doc enters a refit cell, an updated doc moves
    val extra = emb.filter(col("h4") === 0).limit(0) // schema donor
    writeWaveTo(root + "/src", 3,
      emb.filter(col("h4") === 0)
        .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
        .unionByName(extra.select(col("vec_id"), col("embedding")).limit(0)))
    val stream2 = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.ivfIndexUpsertStream(stream2, root + "/vecs",
      root + "/versions", root + "/ckpt", refitCents)
    val after = StreamingIngest.resolvedIvfVectors(spark, root + "/vecs", root + "/versions")
      .select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = Similarity.ivfAssign(
        latest.unionByName(emb.filter(col("h4") === 0)
          .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))),
        refitCents)
      .select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == expect, "post-refit arrivals diverged from batch assignment over refit centroids")
  }

  // ---- the gauge-triggered refit policy (round-14, x140) -----------------
  // Controlled occupancy geometry: two axis centroids, four unit
  // vectors, one update that moves exactly one vector's cell. The
  // occupancy shift is then EXACTLY (|1·4−2·4| + |3·4−2·4|)·10000 /
  // (2·4·4) = 2500 bp — the trigger boundary is exercised with the
  // gauge reading precisely AT the threshold, not near it.
  private def axisVec(i: Int): Array[Float] = {
    val a = Array.fill(8)(0f); a(i) = 1f; a
  }

  private def policyWaves(root: String): Unit = {
    import spark.implicits._
    writeWaveTo(root + "/src", 0, Seq(
      (1L, axisVec(0)), (2L, axisVec(0)),
      (3L, axisVec(1)), (4L, axisVec(1))).toDF("vec_id", "embedding"))
    writeWaveTo(root + "/src", 1,
      Seq((1L, axisVec(1))).toDF("vec_id", "embedding"))
  }

  private def runPolicy(root: String, thresholdBp: Long): Unit = {
    import spark.implicits._
    val initCents = Seq((100L, axisVec(0)), (101L, axisVec(1)))
      .toDF("vec_id", "embedding").localCheckpoint(false)
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.ivfPolicyStream(stream, root + "/vecs",
      root + "/versions", root + "/ckpt", initCents, root + "/cents",
      root + "/fit", root + "/gauge", thresholdBp,
      centroidPolicy = df => df.filter(col("vec_id").isin(2L, 3L))
        .select(col("vec_id"), col("embedding")))
  }

  private def gaugeRows(root: String): Seq[(Long, Long, Long, Boolean)] =
    StreamingIngest.ivfPolicyLog(spark, root + "/gauge")
      .orderBy(col("wave"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq

  test("occupancyDriftBp: exact TV arithmetic and degenerate-state conventions") {
    assert(StreamingIngest.occupancyDriftBp(
      Map(0L -> 1L, 1L -> 3L), Map(0L -> 2L, 1L -> 2L)) == 2500L)
    assert(StreamingIngest.occupancyDriftBp(
      Map(0L -> 2L, 1L -> 2L), Map(0L -> 2L, 1L -> 2L)) == 0L)
    // disjoint cell sets = total drift
    assert(StreamingIngest.occupancyDriftBp(
      Map(0L -> 5L), Map(1L -> 5L)) == 10000L)
    // empty corpus / empty fit read as total drift, never divide by zero
    assert(StreamingIngest.occupancyDriftBp(Map.empty, Map(0L -> 2L)) == 10000L)
    assert(StreamingIngest.occupancyDriftBp(Map(0L -> 2L), Map.empty) == 10000L)
    // strict-greater trigger: at the threshold does NOT fire
    assert(!StreamingIngest.ivfDriftFired(2500L, 2500L))
    assert(StreamingIngest.ivfDriftFired(2501L, 2500L))
  }

  test("policy loop: a gauge reading EXACTLY at the threshold does not fire — the structure stays pinned") {
    val root = tempDir("graft-ivfpol1")
    policyWaves(root)
    runPolicy(root, thresholdBp = 2500L)
    assert(gaugeRows(root) == Seq((0L, 4L, 0L, false), (1L, 4L, 2500L, false)),
      s"gauge history wrong: ${gaugeRows(root)}")
    val centIds = spark.read.parquet(root + "/cents")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(centIds == Set(100L, 101L), "the structure must stay the installed one")
    assert(spark.read.parquet(root + "/fit")
      .select("fit_seq").head().getLong(0) == 0L,
      "the fit reference must still be the install-time one")
  }

  test("policy loop: one bp below the threshold fires — refit swaps the structure and the fit reference") {
    val root = tempDir("graft-ivfpol2")
    policyWaves(root)
    runPolicy(root, thresholdBp = 2499L)
    assert(gaugeRows(root) == Seq((0L, 4L, 0L, false), (1L, 4L, 2500L, true)),
      s"gauge history wrong: ${gaugeRows(root)}")
    val centIds = spark.read.parquet(root + "/cents")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(centIds == Set(2L, 3L), "the refit must install the policy's new structure")
    // served state equals batch assignment of the live corpus against
    // the NEW structure, and the fit reference moved to the refit batch
    val live = StreamingIngest.resolvedIvfVectors(spark, root + "/vecs", root + "/versions")
      .select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    import spark.implicits._
    val latest = Seq((1L, axisVec(1)), (2L, axisVec(0)),
      (3L, axisVec(1)), (4L, axisVec(1))).toDF("vec_id", "embedding")
    val newCents = Seq((2L, axisVec(0)), (3L, axisVec(1))).toDF("vec_id", "embedding")
    val expect = Similarity.ivfAssign(latest, newCents)
      .select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live == expect, "post-refit serving diverged from batch assignment over the new structure")
    val fit = spark.read.parquet(root + "/fit").collect()
    assert(fit.head.getAs[Long]("fit_seq") == 1L, "fit reference must be re-stamped by the refit")
    assert(fit.map(r => r.getAs[Long]("cell_id") -> r.getAs[Long]("n_fit")).toMap
      == Map(2L -> 1L, 3L -> 3L), "the new structure's fit occupancy is wrong")
  }

  test("policy loop heals a crash between the landed fired-row and its refit: the next batch refits FIRST, then assigns") {
    val root = tempDir("graft-ivfpol3")
    import spark.implicits._
    // build a non-firing history (threshold high), so centsDir holds
    // the installed structure and fitDir is stamped at install
    policyWaves(root)
    runPolicy(root, thresholdBp = 9999L)
    assert(spark.read.parquet(root + "/cents")
      .select("vec_id").collect().map(_.getLong(0)).toSet == Set(100L, 101L))
    // simulate the crash window: a FIRED gauge row landed (stamped past
    // everything), but the refit never ran — fitDir still carries the
    // install stamp
    graft.pipeline.Ingest.appendWithSeq(
      Seq((4L, 9000L, true)).toDF("n_live", "tv_bp", "fired"),
      root + "/gauge", 7L)
    assert(spark.read.parquet(root + "/fit")
      .select("fit_seq").head().getLong(0) == 0L)
    // the next batch must heal BEFORE assigning: write one fresh vector
    // and continue the same checkpoint
    writeWaveTo(root + "/src", 2, Seq((5L, axisVec(1))).toDF("vec_id", "embedding"))
    runPolicy(root, thresholdBp = 9999L)
    // the refit ran with the policy's centroidPolicy (ids 2 and 3) and
    // re-stamped the fit reference at the fired row's seq
    val centIds = spark.read.parquet(root + "/cents")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(centIds == Set(2L, 3L), s"the healed refit must install the policy structure: $centIds")
    assert(spark.read.parquet(root + "/fit")
      .select("fit_seq").head().getLong(0) == 7L,
      "the fit reference must be re-stamped at the fired row's seq")
    // the new arrival was assigned against the HEALED structure, and the
    // whole live set matches batch assignment over it
    val live = StreamingIngest.resolvedIvfVectors(spark, root + "/vecs", root + "/versions")
      .select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val latest = Seq((1L, axisVec(1)), (2L, axisVec(0)), (3L, axisVec(1)),
      (4L, axisVec(1)), (5L, axisVec(1))).toDF("vec_id", "embedding")
    val newCents = Seq((2L, axisVec(0)), (3L, axisVec(1))).toDF("vec_id", "embedding")
    val expect = Similarity.ivfAssign(latest, newCents)
      .select(col("vec_id"), col("cell_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live == expect, "post-heal serving diverged from batch assignment over the healed structure")
  }

  test("policy loop heals the fired-without-refit crash AT STREAM START: a restart with NO new arrivals still converges the structure (r14 ADVICE)") {
    val root = tempDir("graft-ivfpol4")
    import spark.implicits._
    policyWaves(root)
    runPolicy(root, thresholdBp = 9999L)
    // crash window: fired row landed, refit never ran
    graft.pipeline.Ingest.appendWithSeq(
      Seq((4L, 9000L, true)).toDF("n_live", "tv_bp", "fired"),
      root + "/gauge", 7L)
    assert(spark.read.parquet(root + "/fit")
      .select("fit_seq").head().getLong(0) == 0L)
    // restart through the SAME checkpoint with nothing new in the
    // source: AvailableNow executes zero batches, so only the
    // stream-start heal can run the committed refit — before round 15,
    // serving continued indefinitely on the superseded structure
    runPolicy(root, thresholdBp = 9999L)
    val centIds = spark.read.parquet(root + "/cents")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(centIds == Set(2L, 3L),
      s"a no-new-arrivals restart must still execute the committed refit: $centIds")
    assert(spark.read.parquet(root + "/fit")
      .select("fit_seq").head().getLong(0) == 7L,
      "the fit reference must be re-stamped at the fired row's seq")
  }

  test("replay is a no-op; per-batch compaction keeps only live versions") {
    val root = tempDir("graft-ivfus3")
    writeWaves(root)
    run(root, "ckpt", maxVecFiles = 1) // compaction fires every batch
    val live = StreamingIngest.resolvedIvfVectors(spark, root + "/vecs", root + "/versions")
      .collect().map(_.getLong(0)).toSet
    run(root, "ckpt2") // full replay with original batchIds
    val after = StreamingIngest.resolvedIvfVectors(spark, root + "/vecs", root + "/versions")
      .collect().map(_.getLong(0)).toSet
    assert(after == live, "replay changed the served id set")
    val stale = spark.read.parquet(root + "/vecs")
      .groupBy(col("vec_id")).agg(countDistinct(col("ingest_seq")).as("nv"))
      .filter(col("nv") > 1)
    assert(stale.count() == 0, "superseded vector versions survived compaction")
  }
}
