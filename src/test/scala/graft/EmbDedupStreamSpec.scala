package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.streaming.StreamingIngest

/** Streaming embedding near-dup ingest (`embeddingDedupStream`) — the
  * vector member of the streaming dedup family (round-8): exact
  * re-arrivals and in-bucket near-duplicates drop against the standing
  * index, novel vectors survive and extend it, batch-internal rivals
  * resolve to the smaller id, and a replay with a fresh checkpoint
  * heals idempotently.
  */
class EmbDedupStreamSpec extends SparkSuite {
  import spark.implicits._

  private val D = Similarity.Dim

  /** A unit-ish basis-direction vector: 1.0 at `axis`, tiny elsewhere. */
  private def vec(axis: Int, eps: Float = 0f): Array[Float] =
    Array.tabulate(D)(i => if (i == axis) 1f else if (i == (axis + 1) % D) eps else 0f)

  // batch 0: two distinct directions. batch 1: 10 = exact copy of v1
  // (dup), 11 = novel direction. batch 2: 20 = small perturbation of 11
  // (same bucket, cosine ~0.995 — near-dup), 21 = novel; 22 arrives in
  // the same batch as a near-copy of 21 and must lose to the smaller id.
  private val batches = Seq(
    Seq(1L -> vec(0), 2L -> vec(7)),
    Seq(10L -> vec(0), 11L -> vec(13)),
    Seq(20L -> vec(13, 0.1f), 21L -> vec(23), 22L -> vec(23, 0.05f)))

  private def writeBatch(dir: String, i: Int, rows: Seq[(Long, Array[Float])]): Unit = {
    val f = new java.io.File(dir, f"batch$i%03d.parquet")
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(f.toString)
    val ts = 1700000000000L + i * 60000L
    f.listFiles().foreach(_.setLastModified(ts))
    f.setLastModified(ts)
  }

  private def writeBatches(dir: String): Unit =
    batches.zipWithIndex.foreach { case (rows, i) => writeBatch(dir, i, rows) }

  private def run(src: String, indexDir: String, survivorsDir: String, ckpt: String): Unit = {
    val vecs = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*")
    StreamingIngest.embeddingDedupStream(vecs, indexDir, survivorsDir, ckpt,
      threshold = 0.9)
  }

  test("near-dups drop against the standing index; novel vectors extend it; replay heals") {
    // the perturbed twins really do share a bucket and clear/flunk the
    // cosine bar the way the fixture intends
    val pairs = Seq((11L, vec(13)), (20L, vec(13, 0.1f)), (21L, vec(23)), (22L, vec(23, 0.05f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.lshBucket(col("embedding")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pairs(11L) == pairs(20L) && pairs(21L) == pairs(22L),
      "perturbed twins must share their original's bucket for this fixture")

    val root = tempDir("graft-embstream")
    writeBatches(root + "/src")
    run(root + "/src", root + "/index", root + "/survivors", root + "/ckpt")

    val survivors = spark.read.parquet(root + "/survivors")
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 11L, 21L),
      s"expected survivors {1,2,11,21}, got $survivors")

    // the index holds exactly the survivors (grows with distinct content)
    val index = spark.read.parquet(root + "/index")
    assert(index.select("vec_id").as[Long].collect().toSet == survivors)

    // replay with a fresh checkpoint: landed() guards must skip every
    // append, leaving both directories row-stable
    val before = (index.count(), spark.read.parquet(root + "/survivors").count())
    run(root + "/src", root + "/index", root + "/survivors", root + "/ckpt2")
    val after = (spark.read.parquet(root + "/index").count(),
      spark.read.parquet(root + "/survivors").count())
    assert(before == after, s"replay must not double-append: $before -> $after")

    // streaming result == the greedy batch semantics on the replayed
    // arrival order: every dropped vector has a surviving (or any
    // earlier/smaller-id) match at >= threshold
    val all = batches.flatten.toDF("vec_id", "embedding")
    val dupPairs = Similarity.embeddingNearDupPairs(all, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    for (dropped <- Seq(10L, 20L, 22L))
      assert(dupPairs.exists { case (a, b) => b == dropped && survivors.contains(a) },
        s"dropped $dropped has no surviving near-dup partner in ${dupPairs}")
  }

  test("bucketed vector index: the corpus probe plans fewer exchanges, same verdicts") {
    // round-9: the verdict kernel splits corpus probe and in-batch
    // rival probe into two joins, so a bucketed-on-`bucket` index table
    // keeps its layout visible to the planner — the union form
    // re-shuffled the corpus-sized index EVERY batch (the
    // IncrementalDedupSpec pattern for the vector family; measured
    // fragmentation numbers in SCALING.md's EmbIndexBench row).
    import graft.pipeline.Bucketing
    val index = (0 until 40).map(i => (100L + i, vec(i % Similarity.Dim)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        Similarity.lshBucket(col("embedding")).as("bucket"))
    val batch = Seq(1L -> vec(0), 2L -> vec(7, 0.05f), 3L -> vec(7, 0.04f))
      .toDF("vec_id", "embedding")
    Bucketing.writeBucketed(index.select("bucket", "embedding", "vec_id"),
      "emb_index", "bucket", 4, Some("bucket"))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = Similarity.embeddingDedupVerdicts(
        spark.table("emb_index"), batch, 0.9)
      val plain = Similarity.embeddingDedupVerdicts(
        index.select("bucket", "embedding"), batch, 0.9)
      val (nBucketed, nPlain) =
        (Bucketing.countExchanges(bucketed), Bucketing.countExchanges(plain))
      assert(nBucketed < nPlain,
        s"bucketed index should drop index-side exchanges ($nBucketed vs $nPlain):\n" +
          bucketed.queryExecution.executedPlan)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "keep").as[(Long, Int)].collect().toSet
      assert(rows(bucketed) == rows(plain), "layout must not change verdicts")
      assert(rows(plain).contains(1L -> 0), "exact re-arrival of an index vector must drop")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS emb_index")
    }
  }

  test("seeded random corpora: verdicts equal an independent sequential greedy reference") {
    // validates the round-9 split-join kernel against semantics stated
    // WITHOUT the operator: a batch vector survives iff no index vector
    // (any id) and no smaller-id batch rival shares its LSH bucket with
    // cosine >= threshold — computed driver-side from collected rows
    // with its own cosine, only the bucket fn shared.
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na) / math.sqrt(nb)
    }
    for (seed <- Seq(7L, 21L, 99L)) {
      val rnd = new scala.util.Random(seed)
      // clustered-ish corpus: vectors near a few random directions so
      // buckets collide and the threshold actually bites
      val dirs = Array.fill(4)(Array.fill(D)(rnd.nextFloat() - 0.5f))
      def near(d: Array[Float]): Array[Float] =
        d.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      val indexRows = (0 until 12).map(i => (100L + i, near(dirs(rnd.nextInt(4)))))
      val batchRows = (0 until 15).map(i => (200L + i, near(dirs(rnd.nextInt(4)))))

      val index = indexRows.toDF("vec_id", "embedding")
        .select(Similarity.lshBucket(col("embedding")).as("bucket"), col("embedding"))
      val batch = batchRows.toDF("vec_id", "embedding")
      val got = Similarity.embeddingDedupVerdicts(index, batch, 0.97)
        .select($"vec_id", $"keep").as[(Long, Int)].collect().toMap

      val bucketOf = (indexRows ++ batchRows).toDF("vec_id", "embedding")
        .select($"vec_id", Similarity.lshBucket($"embedding").as("b"))
        .as[(Long, Int)].collect().toMap
      val expected = batchRows.map { case (id, v) =>
        val idxHit = indexRows.exists { case (iid, iv) =>
          bucketOf(iid) == bucketOf(id) && cos(iv, v) >= 0.97 }
        val rivalHit = batchRows.exists { case (rid, rv) =>
          rid < id && bucketOf(rid) == bucketOf(id) && cos(rv, v) >= 0.97 }
        id -> (if (idxHit || rivalHit) 0 else 1)
      }.toMap
      assert(got == expected, s"seed $seed: $got vs $expected")
      assert(expected.values.sum < expected.size,
        s"seed $seed: fixture degenerate — no vector ever dropped")
    }
  }

  test("mid-stream index compaction: content identity, bounded file count, verdicts unchanged") {
    // round-9 (r8-verdict item 4): the vector index appends one file
    // group per micro-batch forever; `maybeCompactEmbeddingIndex` is
    // the same policy the chunk index got in round 8 — a keyed rewrite
    // that must be the IDENTITY on content (vec_id is unique by
    // construction) and invisible to the stream's exactly-once
    // machinery. Proven by running the same arrivals twice: once with a
    // compaction between batch 1 and batch 2, once without, and
    // asserting identical final verdicts.
    val root = tempDir("graft-embcompact")
    def runOn(tag: String): Unit =
      run(root + s"/src-$tag", root + s"/index-$tag", root + s"/survivors-$tag",
        root + s"/ckpt-$tag-" + System.nanoTime())

    // arm A (compacted): batches 0,1 -> quiescent compact -> batch 2
    batches.take(2).zipWithIndex.foreach { case (rows, i) => writeBatch(root + "/src-a", i, rows) }
    runOn("a")
    val idxDir = root + "/index-a"
    val before = spark.read.parquet(idxDir)
      .select("vec_id", "bucket", "ingest_seq").collect().toSet
    val filesBefore = StreamingIngest.cdcIndexFileCount(spark, idxDir)
    assert(filesBefore >= 2, "each micro-batch appends its own file group")
    // under-threshold: no-op; over-threshold: compacts
    assert(!StreamingIngest.maybeCompactEmbeddingIndex(spark, idxDir,
      maxFiles = filesBefore.toInt))
    assert(StreamingIngest.maybeCompactEmbeddingIndex(spark, idxDir, maxFiles = 1))
    val filesAfter = StreamingIngest.cdcIndexFileCount(spark, idxDir)
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count: $filesBefore -> $filesAfter")
    // pure rewrite: every (vec_id, bucket, ingest_seq) row bit-identical,
    // so the `ingest_seq < batchId` probe restriction still sees the
    // same index the uncompacted layout held
    assert(spark.read.parquet(idxDir)
      .select("vec_id", "bucket", "ingest_seq").collect().toSet == before)
    // batch 2 probes the COMPACTED index: near-dups 20/22 still drop,
    // novel 21 still survives
    writeBatch(root + "/src-a", 2, batches(2))
    runOn("a")

    // arm B (never compacted): identical arrivals, no maintenance
    batches.zipWithIndex.foreach { case (rows, i) => writeBatch(root + "/src-b", i, rows) }
    runOn("b")

    def state(tag: String): (Set[Long], Set[Long]) = (
      spark.read.parquet(root + s"/survivors-$tag").select("vec_id").as[Long].collect().toSet,
      spark.read.parquet(root + s"/index-$tag").select("vec_id").as[Long].collect().toSet)
    assert(state("a") == state("b"),
      s"compaction changed verdicts: ${state("a")} vs ${state("b")}")
    assert(state("a")._1 == Set(1L, 2L, 11L, 21L))
  }
}
