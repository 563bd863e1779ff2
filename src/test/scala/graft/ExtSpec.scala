package graft

import org.apache.spark.sql.functions._

import graft.ext.{Multimodal, Similarity, TextDedup, TextStats}

/** Behavior checks for the LLM-pipeline extension operators: planted
  * duplicates must be found, planted neighbors must rank first.
  */
class ExtSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank", "en"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bend", "en"), // near-dup of 0
    (2L, "completely different words about spark query engines and shuffles here", "en"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank", "en")  // exact dup of 0
  ).toDF("doc_id", "text", "lang")

  test("concatChunkPack: two-level cumsum equals the sequential global stream; span bits exact") {
    // hand-checkable stream at budget 10, two sources:
    //   srcA: d1 (4 tok) d2 (8 tok)  -> offsets 0, 4
    //   srcB: d3 (6 tok) d4 (2 tok)  -> offsets 12, 18
    // chunk ids: d1 [0..3]->0/0; d2 [4..11]->0/1 SPANS; d3 [12..17]->1/1;
    // d4 [18..19]->1/1
    val df = Seq(
      (1L, "srcA", "a b c d"),
      (2L, "srcA", "a b c d e f g h"),
      (3L, "srcB", "a b c d e f"),
      (4L, "srcB", "a b")
    ).toDF("doc_id", "source", "text")
    val got = TextStats.concatChunkPack(df, 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> ((4L, 0L, 0L)), 2L -> ((8L, 0L, 1L)),
      3L -> ((6L, 1L, 1L)), 4L -> ((2L, 1L, 1L))),
      s"packing diverged from the hand stream: $got")
    // the decomposed form equals a naive single-window global cumsum on
    // a larger random-ish frame (the oracle's formulation)
    val big = (1L to 200L).map(i => (i, s"src${i % 7}",
      Seq.fill((i % 13 + 1).toInt)("w").mkString(" "))).toDF("doc_id", "source", "text")
    val naive = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("source").asc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      big.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum_prev", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), expr("cum_prev DIV 32").as("f"),
          expr("(cum_prev + n_tokens - 1) DIV 32").as("l"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    // band-count invariance (round-16, r15 verdict item 2): the
    // three-level decomposition must be bit-equal to the sequential
    // global stream for ANY contiguous band count — 1 (the old
    // two-level shape), a non-divisor, and the session default
    Seq(0, 1, 3, 7).foreach { b =>
      val decomposed = TextStats.concatChunkPack(big, 32, bands = b)
        .select(col("doc_id"), col("first_chunk"), col("last_chunk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(decomposed == naive,
        s"three-level cumsum (bands=$b) diverged from the sequential global window")
    }
    // sparse, clustered, negative-spread ids: value-banding must stay
    // order-preserving and exact on ugly id distributions too
    val sparse = Seq(
      (-1000000L, "s0", "a b c"), (5L, "s0", "a b"), (6L, "s0", "a"),
      (7000000000L, "s0", "a b c d"), (1L, "s1", "a b"), (2L, "s1", "a b c d e"))
      .toDF("doc_id", "source", "text")
    val sparseNaive = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("source").asc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      sparse.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum_prev", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), expr("cum_prev DIV 4").as("f"),
          expr("(cum_prev + n_tokens - 1) DIV 4").as("l"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    Seq(1, 4).foreach { b =>
      val got = TextStats.concatChunkPack(sparse, 4, bands = b)
        .select(col("doc_id"), col("first_chunk"), col("last_chunk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == sparseNaive,
        s"sparse-id banding (bands=$b) diverged: $got vs $sparseNaive")
    }
  }

  test("concatChunkPack: null text fails BY NAME instead of silently shifting every later chunk id (round-16 ADVICE)") {
    val withNull = Seq(
      (1L, "srcA", "a b c d"),
      (2L, "srcA", null.asInstanceOf[String]),
      (3L, "srcB", "a b")
    ).toDF("doc_id", "source", "text")
    val e = intercept[Exception] {
      TextStats.concatChunkPack(withNull, 10).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("retractions belong upstream")),
      s"null-text failure must carry the contract by name, got: ${messages(e)}")
  }

  test("exactGroups collapses exact duplicates") {
    val g = TextDedup.exactGroups(docs).collect()
    assert(g.length == 3)
    val dupGroup = g.find(_.getLong(2) == 2).get
    assert(dupGroup.getLong(1) == 0L) // keep_id = min(doc_id)
  }

  test("minhash signatures: identical texts identical, near-dups mostly equal") {
    val sigs = TextDedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> (1 to TextDedup.NumHashes).map(r.getLong(_)))
      .toMap
    assert(sigs(0L) == sigs(3L))
    val matching = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    assert(matching >= TextDedup.NumHashes / 2, s"only $matching components match")
    assert(sigs(0L) != sigs(2L))
  }

  test("candidatePairs surfaces the planted near/exact dups, not the unrelated doc") {
    val pairs = TextDedup.candidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("bucket cap drops only the saturated group; oversizedBuckets reports it") {
    // 40 identical boilerplate docs (one saturated bucket per band) next
    // to the small near-dup pair — the dup-heavy shape that made x03
    // quadratic at ×100 in SCALING.md.
    val boiler = (100L until 140L).map(i =>
      (i, "identical boilerplate footer text repeated across every mirrored page of the site", "en"))
    val corpus = docs.unionAll(boiler.toDF("doc_id", "text", "lang"))
    val sigs = TextDedup.minhashSignatures(corpus)

    val capped = TextDedup.candidatePairsFrom(sigs, maxBucket = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((0L, 3L)), "cap must keep small-bucket pairs")
    assert(!capped.exists(p => p._1 >= 100L), "saturated bucket must be dropped")

    val uncapped = TextDedup.candidatePairsFrom(sigs, maxBucket = 0).collect()
    assert(uncapped.length == capped.size + 40 * 39 / 2, "uncapped = capped + C(40,2) boiler pairs")

    val over = TextDedup.oversizedBuckets(sigs, maxBucket = 10).collect()
    assert(over.nonEmpty && over.forall(_.getLong(2) == 40L))
    assert(over.forall(_.getLong(3) == 40L * 39 / 2))
    // default cap (256) is inert on this corpus: exact output
    assert(TextDedup.oversizedBuckets(sigs).collect().isEmpty)
    assert(TextDedup.candidatePairsFrom(sigs).collect().length == uncapped.length)
  }

  test("simhash: identical texts equal, near-dups close in hamming distance") {
    val sh = TextDedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(2L)))
  }

  test("ngramJaccardPairs: exact dup = 1.0, near-dup high, unrelated low") {
    val j = TextDedup.ngramJaccardPairs(docs, "lang", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 3L)) == 1.0)
    assert(j((0L, 1L)) > 0.5)
    assert(j((0L, 2L)) < 0.1)
  }

  test("knnBrute: planted identical vector ranks first") {
    val base = Array.tabulate(64)(i => math.sin(i).toFloat)
    val other = Array.tabulate(64)(i => math.cos(i * 2).toFloat)
    val emb = Seq(
      (0L, base), (1L, base.map(x => x * 2f)), // same direction as 0 → cos = 1
      (2L, other), (3L, other.map(_ * -1f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.knnBrute(emb.filter(col("vec_id") === 0), emb, 2)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(got.head == 1L)
  }

  test("top_k_by aggregate agrees with the window formulation on real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 20)
    val viaAgg = Similarity.knnBrute(q, emb, 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaWindow = Similarity.knnBruteWindow(q, emb, 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("top_k_by: bounded state, exact ranking, tie-break by id asc") {
    import graft.functions.top_k_by
    val df = Seq((1L, 5.0, 10L), (1L, 9.0, 11L), (1L, 9.0, 9L), (1L, 1.0, 12L),
      (2L, 3.0, 20L)).toDF("g", "s", "id")
    val got = df.groupBy(col("g")).agg(top_k_by(col("s"), col("id"), 2).as("top"))
      .select(col("g"), col("top")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getDouble(0), e.getLong(1)))).toMap
    assert(got(1L) == Seq((9.0, 9L), (9.0, 11L))) // ties rank by id asc
    assert(got(2L) == Seq((3.0, 20L)))
  }

  test("custom cosine_sim expression is bit-identical to the builtin composition") {
    val emb = graft.sources.Tables.embeddings(spark, sf).limit(50)
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ida") < col("idb"))
    val diff = pairs.select(
        graft.functions.cosine_similarity(col("va"), col("vb")).as("custom"),
        graft.functions.cosine_similarity_builtin(col("va"), col("vb")).as("builtin"))
      .filter(col("custom") =!= col("builtin"))
    assert(diff.count() == 0)
    // SQL registration path
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").first()
    assert(r.getDouble(0) == 1.0)
    // dirty data: length mismatch and in-array nulls → null, matching the
    // builtin composition's null-padding behavior
    val dirty = spark.sql(
      """SELECT cosine_sim(array(1.0D, 2.0D), array(1.0D)) AS a,
        |       cosine_sim(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS b""".stripMargin)
      .first()
    assert(dirty.isNullAt(0) && dirty.isNullAt(1))
  }

  test("ANN recall ladder: multi-probe LSH beats single-probe; recall harness sane") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 25)
    val k = 5
    val exact = Similarity.knnBrute(q, emb, k)
    // exact vs itself is perfect recall
    assert(Similarity.recallAtK(exact, exact, k) == 1.0)
    val single = Similarity.recallAtK(Similarity.knnLsh(q, emb, k), exact, k)
    val multi = Similarity.recallAtK(Similarity.knnLshMultiProbe(q, emb, k), exact, k)
    val ivf = Similarity.recallAtK(
      Similarity.knnIvf(q, emb, Similarity.strideCentroids(emb, 16), k, 4), exact, k)
    info(f"recall@$k: lsh-single=$single%.2f lsh-multiprobe=$multi%.2f ivf-nprobe4=$ivf%.2f")
    assert(multi >= single, "multi-probe must not lose recall vs single-probe")
    assert(multi > 0.0 && ivf > 0.0)
  }

  test("JL-projected KNN: projection shape, recall vs exact, determinism") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    // projection is 16 doubles; identical vectors project identically
    val p = emb.limit(3).select(col("vec_id"),
      Similarity.jlProject(col("embedding")).as("p")).collect()
    assert(p.forall(_.getSeq[Double](1).length == Similarity.JlDim))
    val q = emb.filter(col("vec_id") < 25)
    val exact = Similarity.knnBrute(q, emb, 5)
    val jl = Similarity.knnJl(q, emb, 5)
    val recall = Similarity.recallAtK(jl, exact, 5)
    info(f"jl recall@5 (${Similarity.Dim}d -> ${Similarity.JlDim}d) = $recall%.2f")
    // Random 64-d embeddings have near-uniform pairwise cosine (the
    // ROADMAP-documented ANN worst case: the top-5 are near-ties, so any
    // lossy method scores low — single-probe LSH measures 0.03 here,
    // multi-probe 0.10). 16-d JL measures 0.14: above the whole
    // bucketing ladder, and on clustered real embeddings it rises
    // sharply with the cosine gap. Floor at "beats multi-probe LSH".
    assert(recall > 0.1, f"JL recall collapsed: $recall%.2f")
    val again = Similarity.knnJl(q, emb, 5)
    assert(jl.orderBy("qid", "rank").collect().toSeq ==
      again.orderBy("qid", "rank").collect().toSeq)
  }

  test("bigramLmFit: add-one-smoothed conditionals match the hand computation") {
    import spark.implicits._
    // bigrams: doc1 -> (a,b) (b,a) (a,b); doc2 -> (b,a)
    // pair counts: (a,b)=2 (b,a)=2; marginals: a->2 b->2; V=|{a,b}|=2
    // P(b|a) = (2+1)/(2+2) = 0.75; P(a|b) = (2+1)/(2+2) = 0.75
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val out = graft.ext.TextStats.bigramLmFit(docs)
      .orderBy(col("pair_n").desc, col("w1"), col("w2")).collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq ==
      Seq(("a", "b", 2L, "0.750000"), ("b", "a", 2L, "0.750000")))
    // top-k truncation keeps the highest-count bigrams
    val many = Seq((1L, "x y x y x y z w")).toDF("doc_id", "text")
    val top1 = graft.ext.TextStats.bigramLmFit(many, topK = 1).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "x" && top1(0).getString(1) == "y")
  }

  test("vocabGrowth: first-seen accounting and cumulative curve, hand-computed") {
    import spark.implicits._
    // mx=2 -> bucket = doc_id*10 DIV 3: ids 0,1,2 -> buckets 0,3,6
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "b c d"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextStats.vocabGrowth(docs).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 2L, 2L),   // "a b": both new
      (3L, 2L, 1L, 3L, 4L),   // "a c": c new
      (6L, 3L, 1L, 4L, 7L)))  // "b c d": d new
  }

  test("media dedupExact: planted byte-identical payloads collapse with correct savings") {
    import spark.implicits._
    val docs = Seq((5L, "same bytes here"), (3L, "same bytes here"),
      (9L, "same bytes here"), (7L, "unique content")).toDF("doc_id", "text")
    val out = graft.ext.Multimodal.dedupExact(graft.ext.Multimodal.asMediaTable(docs))
      .collect().map(r => r.getLong(3) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // keeper = min id; 2 redundant copies of 15 bytes reclaim 30
    assert(out(3L) == (15L, 3L, 30L))
    assert(out(7L) == (14L, 1L, 0L))
  }

  test("sourceTvDistance: identical distributions measure 0, disjoint ones near 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c d", "s2"),   // identical distributions
      (3L, "w x y z", "s3")                            // disjoint vocabulary
    ).toDF("doc_id", "text", "source")
    val out = graft.ext.TextStats.sourceTvDistance(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(out(("s1", "s2")) == "0.000000")
    // disjoint vocabularies: TV = 1 unless hash buckets collide, which
    // can only LOWER it; it must stay far above the identical pair
    assert(BigDecimal(out(("s1", "s3"))) > BigDecimal("0.5"))
    assert(BigDecimal(out(("s1", "s3"))) <= BigDecimal(1))
    assert(out(("s1", "s3")) == out(("s2", "s3")), "same distribution, same distance")
  }

  test("kmeans-refined IVF centroids keep shape and competitive recall") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 25)
    val init = Similarity.strideCentroids(emb, 16)
    val refined = Similarity.kmeansIterate(emb, init, 2)
    val rows = refined.collect()
    // empty-cell retention: the cell COUNT is invariant under iteration
    assert(rows.length == init.count())
    assert(rows.forall(_.getSeq[Float](1).length == 64))

    val exact = Similarity.knnBrute(q, emb, 5)
    val base = Similarity.recallAtK(Similarity.knnIvf(q, emb, init, 5, 4), exact, 5)
    val tuned = Similarity.recallAtK(Similarity.knnIvf(q, emb, refined, 5, 4), exact, 5)
    info(f"ivf recall@5: stride-init=$base%.2f kmeans-2iter=$tuned%.2f")
    assert(tuned > 0.0)
  }

  test("kmeansFitExact partitions the corpus; assignment is repartition-invariant") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val fit = Similarity.kmeansFitExact(emb, c = 8, iters = 2)
    val rows = fit.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every vector assigned exactly once; sizes are consistent with the
    // assignment itself
    assert(rows.length == emb.count())
    assert(rows.map(_._1).distinct.length == rows.length)
    val byCell = rows.groupBy(_._2)
    assert(rows.forall(r => byCell(r._2).length == r._3))
    // cells come from the stride init id space
    val stride = math.max(1L, 1000L / 8)
    assert(byCell.keySet.forall(id => id % stride == 0 && id < stride * 8))
    // fixed-point means make the fit partition-order-independent: a
    // reshuffled corpus yields the identical assignment
    val shuffled = Similarity.kmeansFitExact(emb.repartition(7, col("vec_id")), 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(shuffled.sorted.sameElements(rows.sorted))
  }

  test("semDedupKmeans collapses planted colinear vectors into one component") {
    // colinear vectors share a cosine of 1.0, so whatever cell the fit
    // puts them in, they land there together and the pair must collapse
    val base = Array.tabulate(64)(i => math.sin(i * 0.53).toFloat)
    val rnd = new scala.util.Random(17)
    val noise = Seq.tabulate(60)(i =>
      ((i + 3).toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val emb = (Seq((0L, base), (1L, base.map(_ * 2f)), (2L, base.map(_ * 5f))) ++ noise)
      .toDF("vec_id", "embedding")
    val got = Similarity.semDedupKmeans(emb, c = 4, iters = 1, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = got.map(r => r._1 -> r).toMap
    assert(got.length == 63)
    assert(byId(0L)._2 == 0L && byId(1L)._2 == 0L && byId(2L)._2 == 0L,
      "colinear trio must share component 0")
    assert(byId(0L)._3 >= 3L)
  }

  test("IVF knn finds a planted identical vector through its cell") {
    val base = Array.tabulate(64)(i => math.sin(i * 0.37).toFloat)
    val rnd = new scala.util.Random(11)
    val noise = Seq.tabulate(60)(i =>
      ((i + 2).toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val emb = (Seq((0L, base), (1L, base.map(_ * 3f))) ++ noise)
      .toDF("vec_id", "embedding")
    val centroids = Similarity.strideCentroids(emb, 8)
    val got = Similarity.knnIvf(emb.filter(col("vec_id") === 0), emb, centroids, 3, 4)
      .orderBy("rank").collect()
    assert(got.nonEmpty)
    assert(got.head.getLong(2) == 1L) // colinear vector is rank 1
  }

  test("embeddingNearDupPairs surfaces planted colinear vectors") {
    val base = Array.tabulate(64)(i => math.cos(i * 0.73).toFloat)
    val rnd = new scala.util.Random(13)
    val noise = Seq.tabulate(40)(i =>
      ((i + 2).toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val emb = (Seq((0L, base), (1L, base.map(_ * 2f))) ++ noise)
      .toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(emb, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
  }

  test("lshBucket deterministic and direction-sensitive") {
    val base = Array.tabulate(64)(i => math.sin(i).toFloat)
    val emb = Seq((0L, base), (1L, base), (2L, base.map(_ * -1f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.lshBucket(col("embedding")).as("bucket"))
    val b = emb.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(2L)) // antipodal vector flips every plane
    assert(b(0L) + b(2L) == (1 << Similarity.Planes) - 1)
  }

  test("qualityFilter drops on the first failing rule, keeps clean docs") {
    val d = Seq(
      (0L, "the quick brown fox and the lazy dog run to the hills again today", "en"),
      (1L, "short text", "en"),                       // too few tokens
      (2L, ("antidisestablishmentarianism " * 12).trim, "en") // avg word len
    ).toDF("doc_id", "text", "lang")
    val got = TextStats.qualityFilter(d, minTokens = 5, maxAvgWordLen = 10.0, minStopRatio = 0.05)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("drop_reason")).asInstanceOf[String])).toMap
    assert(got(0L).isEmpty)                      // kept
    assert(got(1L).contains("too_few_tokens"))
    assert(got(2L).contains("words_too_long"))
  }

  test("hashSplit is deterministic and roughly proportional") {
    val d = graft.sources.Tables.documents(spark, sf)
    val s1 = TextStats.hashSplit(d, "doc_id", 80)
    val s2 = TextStats.hashSplit(d, "doc_id", 80)
    assert(s1.select("doc_id", "split").collect().toSeq ==
      s2.select("doc_id", "split").collect().toSeq)
    val train = s1.filter(col("split") === "train").count().toDouble / s1.count()
    assert(train > 0.7 && train < 0.9, s"train fraction $train far from 0.8")
  }

  test("stratifiedSample: per-stratum rates honored, stable under repartitioning") {
    val d = graft.sources.Tables.documents(spark, sf)
    val rates = Map("en" -> 5000, "zh" -> 2000)
    val s1 = TextStats.stratifiedSample(d, "lang", rates, defaultBp = 500)
    // deterministic under a different physical partitioning
    val s2 = TextStats.stratifiedSample(d.repartition(7), "lang", rates, defaultBp = 500)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).toSet ==
      s2.select("doc_id").collect().map(_.getLong(0)).toSet)
    // per-stratum keep fraction tracks the basis-point rate
    val en = d.filter(col("lang") === "en").count().toDouble
    val enKept = s1.filter(col("lang") === "en").count().toDouble
    assert(enKept / en > 0.35 && enKept / en < 0.65, s"en fraction ${enKept / en}")
    val rest = d.filter(!col("lang").isin("en", "zh")).count().toDouble
    val restKept = s1.filter(!col("lang").isin("en", "zh")).count().toDouble
    assert(restKept / rest < 0.15, s"default-rate fraction ${restKept / rest}")
  }

  test("languageId picks the language whose markers dominate") {
    val d = Seq(
      (0L, "the cat and the dog sat in the house of the king", "en"),
      (1L, "der hund und die katze das ist nicht gut und der baum", "de")
    ).toDF("doc_id", "text", "lang")
    val got = TextStats.languageId(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en")
    assert(got(1L) == "de")
  }

  test("languageIdNgram: corpus-trained bigram profiles separate distinct char distributions") {
    val d = Seq(
      (0L, "aaaaa", "aa"),
      (1L, "bbbbb", "bb"),
      (2L, "aaaab", "aa"), // mostly-a text must still score highest on "aa"
      (3L, "x", "aa")      // single char: zero bigrams, zero score everywhere
    ).toDF("doc_id", "text", "lang")
    val got = TextStats.languageIdNgram(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getInt(4)))).toMap
    assert(got(0L)._1 == "aa" && got(0L)._3 == 1)
    assert(got(1L)._1 == "bb" && got(1L)._3 == 1)
    assert(got(2L)._1 == "aa")
    // no bigrams → all-zero scores → tie broken to the largest lang code
    assert(got(3L) == (("bb", 0L, 0)))
  }

  test("contamination counts eval-shingle overlap; short docs survive with zero counts") {
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "x"),   // eval doc
      (1L, "alpha beta gamma delta epsilon eta theta", "x"), // shares 1 of its 3 5-grams
      (2L, "one two three four five six seven", "x"),     // clean
      (3L, "tiny", "x")                                    // too short to shingle
    ).toDF("doc_id", "text", "lang")
    val got = TextDedup.contamination(d, col("doc_id") === 0, n = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((3L, 1L, 1)))  // "alpha beta gamma delta epsilon" matches
    assert(got(2L) == ((3L, 0L, 0)))
    assert(got(3L) == ((0L, 0L, 0)))
  }

  test("capPerGroup: bounded per group, deterministic across repartitionings") {
    val d = (0L until 100L).map(i => (i, s"t$i", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val a = TextStats.capPerGroup(d, "source", 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a.size == 20)
    assert(a.groupBy(_._2).forall(_._2.size == 5))
    assert(a.forall(_._3 <= 5))
    val b = TextStats.capPerGroup(d.repartition(7), "source", 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b, "sample must not depend on physical partitioning")
  }

  test("packBins: prefix-sum bin assignment fills to budget with bounded overflow") {
    val d = Seq(
      (1L, "a b c d", "s"),       // 4 tokens, prefix 0  -> bin 0
      (2L, "a b c d", "s"),       // prefix 4            -> bin 0
      (3L, "a b c d", "s"),       // prefix 8 (<10)      -> bin 0 (overflows to 12)
      (4L, "a b c d", "s"),       // prefix 12           -> bin 1
      (5L, "a", "t")              // other group restarts -> bin 0
    ).toDF("doc_id", "text", "source")
    val got = TextStats.packBins(d, "source", budget = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("quality + fingerprint + token count are deterministic and sane") {
    val q = TextStats.quality(docs).filter(col("doc_id") === 0).first()
    assert(q.getLong(2) == 13L) // 13 tokens
    val f1 = TextStats.fingerprint(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(f1(0L) == f1(3L))
    assert(f1(0L) != f1(2L))
    val t = TextStats.bpeTokenCount(docs).filter(col("doc_id") === 0).first()
    assert(t.getLong(1) == 13L)
  }

  test("dupSpanCoverage: duplicated spans covered, unique docs zero, hashed = raw") {
    // docs 0/1 share the 12-word prefix "the quick ... the river"; with
    // n=8 that prefix holds five cross-doc 8-grams covering positions
    // 0..11 (12 tokens); docs 0/3 are identical (13 tokens fully covered)
    val cov = TextDedup.dupSpanCoverage(docs, n = 8, hashGrams = false).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(cov(0L) == ((13L, 13L, 1.0))) // exact dup of 3 → fully covered
    assert(cov(3L) == ((13L, 13L, 1.0)))
    assert(cov(1L)._2 == 12L) // shared prefix spans, not the full doc
    assert(cov(2L) == ((10L, 0L, 0.0))) // unique doc → zero coverage
    val hashed = TextDedup.dupSpanCoverage(docs, n = 8, hashGrams = true).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(hashed == cov, "hashed-gram production path must agree with raw strings")
  }

  test("quantizeInt8: codes bounded, reconstruction within one step, zero vector safe") {
    val emb = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(-2.0f, 1.0f, 0.5f, -0.125f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(emb).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getSeq[Long](3)))).toMap
    // codes in the int8 domain; the max-|v| component hits ±127 exactly
    // on these power-of-two fixtures (the seeded property test covers the
    // -128 rounding edge)
    q.foreach { case (_, (_, _, codes)) => assert(codes.forall(c => c >= -128 && c <= 127)) }
    assert(q(0L)._3(1) == -127L)
    assert(q(2L)._3(0) == -127L)
    // zero vector: scale 0, all-zero codes, no NaN poisoning
    assert(q(1L) == ((0.0, 0.0, Seq(0L, 0L, 0L, 0L))))
    // dequantized value within one quantization step of the original
    val (_, scale0, codes0) = q(0L)
    Seq(0.5, -1.0, 0.25, 0.0).zip(codes0).foreach { case (v, c) =>
      assert(math.abs(c / scale0 - v) <= 1.0 / scale0 + 1e-12)
    }
  }

  test("pqEncode: sampled vectors take their own codes; near-copies follow them") {
    // strideCentroids(corpus, 2) picks vec_id 0 and 500 (stride 500) as
    // codeword sources; dim 4, m 2 → 2 codewords per 2-dim subspace
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (500L, Array(0.0f, 1.0f, 1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.1f, 0.9f)), // near vec 0 in both subspaces
      (2L, Array(0.1f, 0.9f, 1.1f, -0.1f)) // near vec 500 in both subspaces
    ).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(emb, m = 2, k = 2, dim = 4)
    assert(cb.count() == 4) // 2 subspaces × 2 codes
    val codes = Similarity.pqEncode(emb, cb, m = 2, dim = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(codes(0L) == ((0L, 0L))) // zero distance to its own codewords
    assert(codes(500L) == ((1L, 1L)))
    assert(codes(1L) == ((0L, 0L)))
    assert(codes(2L) == ((1L, 1L)))
  }

  test("pqDecode round-trips sampled vectors exactly; recon knn recall is sane") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = Similarity.pqCodebooks(emb)
    val recon = Similarity.pqDecode(Similarity.pqEncode(emb, cb), cb)
    // a stride-sampled vector is its own codeword in every subspace →
    // exact reconstruction
    val sampledIds = Similarity.strideCentroids(emb, Similarity.PqK)
      .select("vec_id").as[Long].collect().toSet
    assert(sampledIds.nonEmpty)
    val origByid = emb.filter(col("vec_id").isin(sampledIds.toSeq: _*))
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    val reconById = recon.filter(col("vec_id").isin(sampledIds.toSeq: _*))
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(reconById == origByid)
    // PQ ANN recall against exact: better than chance, below perfect —
    // 16 codewords/subspace on a random corpus is a coarse quantizer
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.knnBrute(queries, emb, 5)
    val approx = Similarity.knnBrute(queries, recon, 5)
    val recall = Similarity.recallAtK(approx, exact, 5)
    assert(recall > 0.0, s"PQ recon recall $recall")
  }

  test("lmScore: repeated phrasing scores high, unique phrasing low, short docs drop") {
    val corpus = Seq(
      (0L, "the cat sat"), (1L, "the cat sat"), (2L, "the cat sat"),
      (3L, "a dog ran away quickly"), // every bigram unique in the corpus
      (4L, "word") // < 2 words → no bigrams → absent from output
    ).toDF("doc_id", "text")
    val scored = TextStats.lmScore(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), BigDecimal(r.getString(2))))).toMap
    assert(!scored.contains(4L))
    // docs 0-2: "the cat"=3/3, "cat sat"=3/3 → sum 2.0
    Seq(0L, 1L, 2L).foreach(id => assert(scored(id) == ((2L, BigDecimal("2.000000")))))
    // doc 3: each of its 4 bigrams is the only continuation of its prefix
    // in this corpus → each P=1; a corpus with alternative continuations
    // would push these below 1 — the discriminative case:
    assert(scored(3L)._1 == 4L)
    val corpus2 = corpus.union(Seq((5L, "a dog barked loudly today")).toDF("doc_id", "text"))
    val scored2 = TextStats.lmScore(corpus2).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getString(2))).toMap
    // "a dog" now continues two ways → doc 3's sum drops below doc 0's per-gram 1.0 rate
    assert(scored2(3L) < BigDecimal("4.000000"))
    assert(scored2(3L) > scored2(5L) - BigDecimal("0.000001")) // symmetric alternatives
  }

  test("property: quantizeInt8 bounds and reconstruction on random vectors (seeded)") {
    val rnd = new scala.util.Random(77)
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * rnd.nextInt(100))))
    val q = Similarity.quantizeInt8(vecs.toDF("vec_id", "embedding")).collect()
    assert(q.length == 50)
    q.foreach { r =>
      val maxAbs = r.getDouble(1); val scale = r.getDouble(2)
      val codes = r.getSeq[Long](3)
      val orig = vecs(r.getLong(0).toInt)._2
      // floor reaches -128 when the v*scale product rounds a hair below
      // -127.0 at v = -max_abs — exactly the int8 domain
      assert(codes.forall(c => c >= -128 && c <= 127))
      if (maxAbs > 0) orig.zip(codes).foreach { case (v, c) =>
        assert(math.abs(c / scale - v) <= 1.0 / scale + 1e-9,
          s"dequant error beyond one step: v=$v c=$c scale=$scale")
      }
    }
  }

  test("property: dupSpanCoverage hashed == raw, coverage bounded (seeded)") {
    val rnd = new scala.util.Random(99)
    // 6-word vocabulary forces heavy cross-doc gram collisions
    val corpus = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(12)("w" + rnd.nextInt(6)).mkString(" ")))
      .toDF("doc_id", "text")
    def run(hash: Boolean) =
      TextDedup.dupSpanCoverage(corpus, n = 3, hashGrams = hash).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val raw = run(false)
    assert(run(true) == raw)
    raw.values.foreach { case (nTokens, nCovered, cov) =>
      assert(nCovered <= nTokens && cov >= 0.0 && cov <= 1.0)
    }
  }

  test("multimodal resize + frame sampling plumbing") {
    val media = Multimodal.asMediaTable(docs.select(col("doc_id"), col("text")))
    val resized = Multimodal.resize(spark, media, 8, 4)
    assert(resized.select(length(col("payload"))).distinct().first().getInt(0) == 32)
    val frames = Multimodal.frameSample(spark, media, frameSize = 16, stride = 2)
    assert(frames.columns.toSeq == Seq("doc_id", "frame_index", "frame_bytes"))
    // doc 0 has 63 bytes → frames 0..3 (sizes 16,16,16,15), strided → idx 0,2
    val f0 = frames.filter(col("doc_id") === 0).orderBy("frame_index")
      .collect().map(_.getInt(1))
    assert(f0.toSeq == Seq(0, 2))
  }

  test("multimodal stub: payload bytes → deterministic features, schema stable") {
    val media = Multimodal.asMediaTable(docs.select(col("doc_id"), col("text")))
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.columns.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "head_hash", "features"))
    val r0 = feats.filter(col("doc_id") === 0).first()
    val r3 = feats.filter(col("doc_id") === 3).first()
    assert(r0.getLong(2) == 63L) // byte length of text 0
    assert(r0.getLong(3) == r3.getLong(3)) // same bytes → same head hash
    assert(r0.getSeq[Double](4) == r3.getSeq[Double](4))
  }

  test("shardAssign: (shard, pos) is a pure function of the id — stable under repartitioning") {
    val corpus = docs.select(col("doc_id"), col("text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      TextStats.shardAssign(df, "doc_id", nShards = 4)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val base = run(corpus)
    assert(run(corpus.repartition(7)) == base, "layout changed under repartition")
    // positions within each shard are 1..k dense, no gaps or duplicates
    base.values.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).toSeq.sorted == (1L to rows.size).toSeq,
        s"shard $shard positions not dense")
    }
    // a different salt reshuffles (epoch independence)
    val resalted = TextStats.shardAssign(corpus, "doc_id", 4, salt = "epoch2")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(resalted != base, "salt must give an independent shuffle")
  }

  test("vocabCoverage: ratios bounded, in-vocab docs score 0, rare words count as OOV") {
    val corpus = Seq(
      (1L, "a a a b"),      // all in vocab(2) = {a, b}
      (2L, "a b zzz"),      // 1 of 3 OOV
      (3L, "zzz yyy xxx")   // all OOV (each occurs once; vocab keeps a,b)
    ).toDF("doc_id", "text")
    val got = TextStats.vocabCoverage(corpus, vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 0L, 0.0)))
    assert(got(2L)._2 == 1L && math.abs(got(2L)._3 - 1.0 / 3.0) < 1e-15)
    assert(got(3L) == ((3L, 3L, 1.0)))
  }

  test("multimodal binaryFile path: real PNG bytes flow through the media schema unchanged") {
    // real image fixture (round-4 item 8) without external libs: the JDK's
    // ImageIO encodes genuine PNGs; only the decode STAGE stays stubbed
    val dir = new java.io.File(tempDir("graft-media"))
    (1 to 3).foreach { i =>
      val img = new java.awt.image.BufferedImage(
        4 * i, 4 * i, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until img.getWidth).foreach(x => (0 until img.getHeight)
        .foreach(y => img.setRGB(x, y, x * 31 + y * 17 + i * 1000)))
      javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, s"img$i.png"))
    }
    new java.io.File(dir, "notes.txt").createNewFile() // must be glob-filtered out

    val media = Multimodal.mediaTableFromFiles(spark, dir.toString, glob = "*.png")
    assert(media.columns.toSeq == Seq("doc_id", "media_type", "payload"))
    val rows = media.collect()
    assert(rows.length == 3, s"glob should keep only the 3 PNGs, got ${rows.length}")
    assert(rows.forall(_.getString(1) == "image/png"))
    assert(rows.map(_.getLong(0)).distinct.length == 3, "path-hash doc_ids must be unique")
    // every payload is a REAL PNG: 8-byte magic \x89PNG\r\n\x1a\n
    val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    rows.foreach(r => assert(
      r.getAs[Array[Byte]](2).take(8).sameElements(magic), "payload is not a PNG"))

    // the downstream stages run unchanged on the real-file frame
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length == 3 && feats.forall(_.getSeq[Double](4).length == 4))
    val frames = Multimodal.frameSample(spark, media, frameSize = 32, stride = 2)
    assert(frames.count() > 0)
  }

  test("splitOverlap: shared shingles counted distinct-once; zero-overlap pairs still appear") {
    // train = doc 0; eval = exact dup of 0 (shares all nine 5-grams) +
    // unique doc 2 (six unrelated 5-grams) → shared 9, train 9, eval 15;
    // test = fully disjoint split → its pairs must report n_shared = 0
    // (a leakage dashboard whose healthy outcome is a MISSING row is
    // useless), giving all C(3,2) = 3 pairs
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank", "train"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank", "eval"),
      (2L, "completely different words about spark query engines and shuffles here", "eval"),
      (9L, "held out benchmark sentences share no five gram with anything else", "test")
    ).toDF("doc_id", "text", "split")
    val got = TextDedup.splitOverlap(corpus, "split", n = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.size == 3)
    assert(got(("eval", "train")) == ((9L, 15L, 9L, 9.0 / 15.0)))
    assert(got(("eval", "test")) == ((0L, 15L, 7L, 0.0)))
    assert(got(("test", "train")) == ((0L, 7L, 9L, 0.0)))
  }

  test("stripDupSpans: covered positions removed in order, unique docs verbatim") {
    // docs 0/3 identical → fully covered, come back empty; doc 1 shares
    // the 12-token prefix (coverage test above) → only "bend" survives;
    // doc 2 unique → verbatim
    val got = TextDedup.stripDupSpans(docs, n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(0L) == ((13L, 0L, "")))
    assert(got(3L) == ((13L, 0L, "")))
    assert(got(1L) == ((13L, 1L, "bend")))
    assert(got(2L) == ((10L, 10L,
      "completely different words about spark query engines and shuffles here")))
  }

  test("domainMix: binding source kept whole, others thinned, unlisted dropped, stable") {
    // a:4 docs, b:2 docs, weights 50/50 → T = min(8, 4) = 4: b is binding
    // (threshold 10000, kept whole), a thins toward 2; c is unlisted → out
    val corpus = (1L to 4L).map(i => (i, "a")) ++ Seq((10L, "b"), (11L, "b"), (20L, "c"))
    val df = corpus.toDF("doc_id", "source")
    val w = Map("a" -> 5000, "b" -> 5000)
    val got = TextStats.domainMix(df, w, idCol = "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.filter(_._2 == "b") == Set((10L, "b"), (11L, "b")), "binding source kept whole")
    assert(!got.exists(_._2 == "c"), "unlisted source must be dropped")
    assert(got.count(_._2 == "a") <= 4)
    // deterministic: repartitioning must not change the kept set
    val again = TextStats.domainMix(df.repartition(5), w, idCol = "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == got)
    // binding-source invariant survives inexact division (the old
    // total-then-quota arithmetic double-floored and kept only 2/3 of
    // the binding source here): a:3 @7000bp binds against b:100 @3000bp
    val skew = ((1L to 3L).map(i => (i, "a")) ++ (101L to 200L).map(i => (i, "b")))
      .toDF("doc_id", "source")
    val keptSkew = TextStats.domainMix(skew, Map("a" -> 7000, "b" -> 3000), idCol = "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(keptSkew.count(_._2 == "a") == 3, "binding source must be kept whole")
    // b thins to rate (3000·3·10⁴) div (7000·100) = 128bp ⇒ a small tail
    assert(keptSkew.count(_._2 == "b") <= 5)
  }

  test("qualityPercentileGate: integer quota per group; small groups never gutted") {
    // g1 (3 docs): quota = floor(3·40/100) = 1 → only the 0-score doc
    // drops; g2 (2 docs): quota = floor(0.8) = 0 → BOTH kept (the old
    // percent_rank formulation always dropped at least one per group);
    // g3 (1 doc): quota 0 → the singleton survives — the small-domain
    // protection this operator exists for
    val corpus = Seq(
      (1L, "zzz yyy", "g1"), (2L, "the zzz", "g1"), (3L, "the a", "g1"),
      (10L, "xxx yyy", "g2"), (11L, "yyy xxx", "g2"),
      (20L, "qqq www", "g3")
    ).toDF("doc_id", "text", "source")
    val kept = TextStats.qualityPercentileGate(corpus, "source", dropBottomPct = 40)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 10L, 11L, 20L))
  }

  test("temperatureMix: smallest source binds whole, larger sources thin to ~sqrt(c*cb), stable") {
    // a:100 docs, b:4 docs → b binds (bp 10000, kept whole); a's
    // threshold is floor(10000·sqrt(400)/100) = 2000bp → a keeps the
    // docs whose mix-hash bucket lands under 2000 (exact, RNG-free)
    val corpus = ((1L to 100L).map(i => (i, "a")) ++ Seq((200L, "b"), (201L, "b"),
      (202L, "b"), (203L, "b"))).toDF("doc_id", "source")
    val got = TextStats.temperatureMix(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.count(_._2 == "b") == 4, "binding (smallest) source kept whole")
    val aKept = got.filter(_._2 == "a")
    assert(aKept.forall(_._3 < 2000L), "a's gate is exactly floor(10000*sqrt(400)/100)")
    assert(aKept.nonEmpty && aKept.length < 100)
    // exhaustive twin of the gate: every a-doc under the threshold is kept
    val expectA = corpus.filter(col("source") === "a")
      .withColumn("bucket",
        pmod(graft.ext.TextDedup.portableHash(col("doc_id").cast("string"), "mix"), lit(10000L)))
      .filter(col("bucket") < 2000).collect().map(_.getLong(0)).toSet
    assert(aKept.map(_._1).toSet == expectA)
    // deterministic under repartitioning
    val again = TextStats.temperatureMix(corpus.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSet == got.toSet)
  }

  test("dsirSelect: target-vocab raw docs outscore off-profile ones; target docs excluded; stable") {
    // target speaks alpha..delta; raw doc 10 is pure target-vocab, 12 is
    // half, 11 entirely off-profile — the importance order must be
    // 10 > 12 > 11, and no target doc may appear in the selection
    val corpus = Seq(
      (0L, "alpha beta gamma delta alpha beta gamma delta", "tgt"),
      (1L, "alpha beta gamma delta epsilon alpha beta gamma", "tgt"),
      (10L, "alpha beta gamma delta alpha beta gamma delta", "raw"),
      (11L, "zebra yak xylophone walrus quagga vole marmot stoat", "raw"),
      (12L, "alpha beta zebra yak alpha beta zebra yak", "raw")
    ).toDF("doc_id", "text", "source")
    val got = TextStats.dsirSelect(corpus, "tgt", k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), BigDecimal(r.getString(2))))
    assert(got.map(_._1).toSet == Set(10L, 11L, 12L), "exactly the raw docs selected")
    val score = got.map(t => t._1 -> t._3).toMap
    assert(score(10L) > score(12L) && score(12L) > score(11L),
      s"importance must track target-vocab share: $score")
    // selection order is the score order
    assert(got.map(_._1).toSeq == Seq(10L, 12L, 11L))
    // deterministic under repartitioning (decimal sum is order-independent)
    val again = TextStats.dsirSelect(corpus.repartition(5), "tgt", k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), BigDecimal(r.getString(2))))
    assert(again.toSeq == got.toSeq)
  }

  test("chunk: stride/overlap boundaries, short tail, reassembly covers the doc exactly") {
    // 10 words, size=4, overlap=1 (stride 3): starts 0,3,6 — consecutive
    // chunks share exactly one word; start 9 is NOT emitted (its window
    // [w9] is fully contained in chunk 2 — a duplicate chunk would be a
    // duplicate embedding downstream)
    val doc = Seq((1L, (0 until 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextStats.chunk(doc, 4, 1).orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, "w0 w1 w2 w3", 4L), (1L, "w3 w4 w5 w6", 4L),
      (2L, "w6 w7 w8 w9", 4L)))
    // overlap invariant: chunk i's last `overlap` words open chunk i+1
    got.sliding(2).foreach { case Array((_, a, _), (_, b, _)) =>
      assert(b.split(" ").head == a.split(" ").last, s"overlap broken: '$a' -> '$b'") }
    // exact-multiple edge: 6 words, stride 3 — no empty trailing chunk
    val even = Seq((2L, "a b c d e f")).toDF("doc_id", "text")
    assert(TextStats.chunk(even, 4, 1).count() == 2)
    // stable under repartitioning
    val again = TextStats.chunk(doc.repartition(4), 4, 1).orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(again.toSeq == got.toSeq)
  }

  test("epochOrder: exact permutation 1..N, shard-contiguous, salt-independent reshuffle") {
    val docs = (0L until 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val got = TextStats.epochOrder(docs, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq == (1L to 200L), "positions are a permutation 1..N")
    // each shard owns one contiguous position block (the prefix-count contract)
    val byShard = got.groupBy(_._2).view.mapValues(_.map(_._3).sorted)
    byShard.foreach { case (s, ps) =>
      assert(ps.last - ps.head + 1 == ps.length, s"shard $s positions not contiguous: $ps") }
    // deterministic under repartitioning
    val again = TextStats.epochOrder(docs.repartition(7), nShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
    // a different salt is a genuinely different epoch permutation
    val next = TextStats.epochOrder(docs, nShards = 8, salt = "epoch1").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val same = got.count(t => next(t._1) == t._3)
    assert(same < 50, s"epoch1 order too close to epoch0 ($same/200 fixed points)")
  }

  test("chunk: dropping each chunk's leading overlap reconstructs any doc exactly") {
    // property over varied lengths incl. the stride-boundary cases:
    // concatenating chunk 0 plus every later chunk minus its first
    // `overlap` tokens must be the original token stream
    val rng = new scala.util.Random(42)
    val docs = (1L to 20L).map { i =>
      val n = 1 + rng.nextInt(40)
      (i, (0 until n).map(j => s"t${i}_$j").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for ((size, overlap) <- Seq((4, 1), (8, 3), (5, 0), (3, 2))) {
      val byDoc = TextStats.chunk(df, size, overlap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      docs.foreach { case (id, text) =>
        val rebuilt = (byDoc(id).head +: byDoc(id).tail.map(
          _.split(" ").drop(overlap).mkString(" "))).filter(_.nonEmpty).mkString(" ")
        assert(rebuilt == text, s"doc $id size=$size overlap=$overlap:\n$rebuilt\n$text")
      }
    }
  }

  test("sourceOverlap: identical sources hit 1.0 on both paths; disjoint hit 0; est bounded") {
    // a and b are identical corpora (jaccard 1), c is disjoint (jaccard 0
    // against both); every estimate must be a multiple of 1/16 in [0,1]
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", "a"),
      (2L, "pack my box with five dozen liquor jugs again", "a"),
      (3L, "the quick brown fox jumps over the lazy dog today", "b"),
      (4L, "pack my box with five dozen liquor jugs again", "b"),
      (5L, "zeta eta theta iota kappa lambda mu nu xi omicron", "c")
    ).toDF("doc_id", "text", "source")
    val got = graft.ext.TextDedup.sourceOverlap(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // 8 + 7 distinct shingles (10- and 9-word docs) shared in full
    assert(got(("a", "b")) == ((1.0, 15L, 1.0)), s"identical sources: ${got(("a", "b"))}")
    assert(got(("a", "c"))._3 == 0.0 && got(("a", "c"))._2 == 0L)
    assert(got(("b", "c"))._3 == 0.0)
    got.values.foreach { case (est, _, ex) =>
      assert(est >= 0.0 && est <= 1.0 && (est * 16).isWhole, s"est not k/16: $est")
      assert(ex >= 0.0 && ex <= 1.0)
    }
    // deterministic under repartitioning
    val again = graft.ext.TextDedup.sourceOverlap(docs.repartition(4)).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(again == got)
  }

  test("keepBestPerCluster: highest score survives, ties keep the larger id, singletons pass") {
    val assigned = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), // cluster of three
      (4L, 200L), (5L, 200L),             // tied cluster
      (6L, 300L)                          // singleton
    ).toDF("doc_id", "component")
    val scored = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L),
      (4L, 7L), (5L, 7L),
      (6L, 1L)
    ).toDF("doc_id", "score")
    val got = graft.ext.TextDedup.keepBestPerCluster(assigned, scored).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (100L, 2L, 30L, 3L),  // best score wins
      (200L, 5L, 7L, 2L),   // tie -> larger id
      (300L, 6L, 1L, 1L)))
    // deterministic under repartitioning (struct max is order-independent)
    val again = graft.ext.TextDedup.keepBestPerCluster(
      assigned.repartition(5), scored.repartition(3)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(again.toSeq == got.toSeq)
  }

  test("hardNegatives: same-label vectors never returned; planted confusable negative ranks first") {
    // anchor 0 (label 1): its exact duplicate 1 shares the label (must be
    // excluded); 2 is the planted near-identical different-label vector
    // (must rank 1); 3 is an orthogonal different-label vector (rank 2)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 2),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 2),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(emb.filter(col("vec_id") === 0), emb, 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(got.map(_._2).toSeq == Seq(2L, 3L), "same-label 1 and 4 excluded; 2 most confusable")
    assert(got.forall(_._3 == 2), "neg_label is the negative's own label")
    // all-distinct labels degenerate to plain knnBrute ranking
    val distinct = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (1L, Array(0.8f, 0.2f, 0.0f, 0.0f), 2),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val hn = Similarity.hardNegatives(distinct.filter(col("vec_id") === 0), distinct, 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sorted.toSeq
    val knn = Similarity.knnBrute(distinct.filter(col("vec_id") === 0), distinct, 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(hn == knn)
  }

  test("groupCentroids: fixed-point sums give the exact mean, order-independent") {
    val emb = Seq(
      (0L, Array(1.0f, -1.0f, 0.5f, 0.0f), 7),
      (1L, Array(0.0f, 1.0f, 0.5f, 1.0f), 7),
      (2L, Array(0.25f, 0.25f, 0.25f, 0.25f), 8)
    ).toDF("vec_id", "embedding", "label")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.groupCentroids(df, "label", dims = 4).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    val got = run(emb)
    // exact: these floats are powers of two, so floor(v*1e6) loses nothing
    assert(got(7) == ((2L, 0.5, 0.0, 0.5, 0.5)))
    assert(got(8) == ((1L, 0.25, 0.25, 0.25, 0.25)))
    assert(run(emb.repartition(3)) == got, "centroids must not depend on partitioning")
  }

  test("embeddingDedupVerdicts: greedy keep-min-id against index and batch rivals (round-8)") {
    val D = Similarity.Dim
    def vec(axis: Int, eps: Float = 0f): Array[Float] =
      Array.tabulate(D)(i => if (i == axis) 1f else if (i == (axis + 1) % D) eps else 0f)
    // index holds direction 3; batch: 10 dups the index, 11 novel,
    // 12 near-dups 11 (same bucket, smaller-id rival wins), 13 novel
    val index = Seq(Tuple1(vec(3))).toDF("embedding")
      .select(Similarity.lshBucket(col("embedding")).as("bucket"), col("embedding"))
    val batch = Seq((10L, vec(3)), (11L, vec(21)), (12L, vec(21, 0.05f)),
      (13L, vec(40))).toDF("vec_id", "embedding")
    val keep = Similarity.embeddingDedupVerdicts(index, batch, 0.9)
      .select($"vec_id", $"keep").as[(Long, Int)].collect().toMap
    assert(keep == Map(10L -> 0, 11L -> 1, 12L -> 0, 13L -> 1), s"got $keep")

    // empty index: only batch rivals matter
    val keep2 = Similarity.embeddingDedupVerdicts(index.limit(0), batch, 0.9)
      .select($"vec_id", $"keep").as[(Long, Int)].collect().toMap
    assert(keep2 == Map(10L -> 1, 11L -> 1, 12L -> 0, 13L -> 1), s"got $keep2")
  }

  test("knnIvfPq: results only from probed cells, ranked by EXACT cosine (round-9)") {
    // structural invariants the DuckDB oracle can't state directly: the
    // result set is a subset of the probed cells' membership (cell
    // pruning is real), and the final ranking uses the RAW vectors, not
    // the PQ approximations (the exact-last half of the ladder)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 6)
    val centroids = Similarity.strideCentroids(emb, 16)
    val cb = Similarity.pqResidualCodebooks(emb, centroids)
    val got = Similarity.knnIvfPq(q, emb, centroids, cb, k = 5, nprobe = 4, shortlist = 12)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty)

    val cellOf = Similarity.ivfAssign(emb, centroids)
      .select($"vec_id", $"cell_id").as[(Long, Long)].collect().toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      dot / math.sqrt(na) / math.sqrt(nb)
    }
    for ((qid, rows) <- got.groupBy(_._1)) {
      // probed cells: top-4 centroid cosines for this query
      val top4 = centroids.collect().map(c => (c.getLong(0), cos(vecs(qid), c.getSeq[Float](1).toArray)))
        .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1).toSet
      rows.foreach { case (_, _, nid) =>
        assert(top4.contains(cellOf(nid)), s"neighbor $nid of $qid outside probed cells")
      }
      // ranks strictly follow exact cosine (desc, id asc tie-break)
      val byRank = rows.sortBy(_._2).map(_._3)
      val sims = byRank.map(nid => (cos(vecs(qid), vecs(nid)), nid))
      assert(sims.toSeq == sims.sortBy { case (s, id) => (-s, id) }.toSeq,
        s"ranks of $qid not ordered by exact cosine: ${sims.toSeq}")
    }
  }

  test("map-side PQ encode/decode are code- and value-identical to the exchange twins (round-10)") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val centroids = Similarity.strideCentroids(emb, 16)
    for (cb <- Seq(Similarity.pqCodebooks(emb),
                   Similarity.pqResidualCodebooks(emb, centroids))) {
      val corpus =
        if (cb.schema("codeword").dataType ==
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true) ||
            cb.schema("codeword").dataType ==
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
          emb
        else Similarity.residualize(emb, centroids)
      val a = Similarity.pqEncode(corpus, cb).orderBy("vec_id").collect().toSeq
      val b = Similarity.pqEncodeExchange(corpus, cb).orderBy("vec_id").collect().toSeq
      assert(a == b, "map-side codes differ from exchange codes")
      val codes = Similarity.pqEncode(corpus, cb)
      val da = Similarity.pqDecode(codes, cb)
        .select($"vec_id", $"embedding".cast("array<double>")).orderBy("vec_id").collect().toSeq
      val db = Similarity.pqDecodeJoin(codes, cb)
        .select($"vec_id", $"embedding".cast("array<double>")).orderBy("vec_id").collect().toSeq
      assert(da == db, "map-side reconstruction differs from join reconstruction")
    }
  }

  test("residual PQ codebooks: nonzero codewords, Lloyd fit keeps keys and arity (round-10)") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val centroids = Similarity.strideCentroids(emb, 16)
    val init = Similarity.pqResidualCodebooks(emb, centroids)
    val keys = init.select($"subspace", $"code").as[(Int, Long)].collect().toSet
    assert(keys.nonEmpty && keys.groupBy(_._1).size == 8, "8 subspaces")
    assert(init.select(size($"codeword")).distinct().as[Int].collect().toSeq == Seq(8),
      "codeword arity = dim/m")
    // the offset-31 sample is disjoint from the stride-62 cell anchors,
    // so no sample residual (hence no codeword) is the zero vector
    val norms = init.select(aggregate(transform($"codeword", x => x * x),
      lit(0.0), (a, v) => a + v).as("n2")).as[Double].collect()
    assert(norms.forall(_ > 0), "a zero codeword means the sample hit a cell anchor")
    // Lloyd refinement relabels nothing: same (subspace, code) keys, same arity
    val fitted = Similarity.pqResidualCodebooksFitted(emb, centroids, iters = 2)
    assert(fitted.select($"subspace", $"code").as[(Int, Long)].collect().toSet == keys)
    assert(fitted.select(size($"codeword")).distinct().as[Int].collect().toSeq == Seq(8))
  }

  test("annRecall: per-query overlap in exact basis points (round-8)") {
    val exact = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 20L), (2L, 2, 21L)).toDF("qid", "rank", "neighbor_id")
    // q1 recovers 2/3; q2 recovers 0/2 (disjoint ids); approx-only rows
    // (q1→99) must not count
    val approx = Seq((1L, 1, 11L), (1L, 2, 12L), (1L, 3, 99L),
      (2L, 1, 30L)).toDF("qid", "rank", "neighbor_id")
    val got = Similarity.annRecall(exact, approx)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 2L, 6666L)))
    assert(got(2L) == ((2L, 0L, 0L)))
  }

  test("pow2Bucket: matches the analytic smallest power of two over the full branch range (round-8)") {
    val probes = (1L to 70L) ++ Seq(127L, 128L, 129L, 1023L, 1024L, 1025L,
      (1L << 19) + 1, 1L << 20, (1L << 20) + 5)
    def analytic(n: Long): Long = {
      var p = 1L; while (p < n && p < (1L << 20)) p <<= 1; p
    }
    val got = probes.toDF("n")
      .select($"n", TextStats.pow2Bucket($"n").as("b"))
      .as[(Long, Long)].collect().toMap
    probes.foreach(n => assert(got(n) == analytic(n), s"n=$n: ${got(n)} != ${analytic(n)}"))
  }

  test("paddingEfficiency: exact waste shares and the global no-bucketing row (round-8)") {
    // tokens: 3,3,5,9 → buckets 4,4,8,16; global bucket 16
    val docs = Seq((1L, "a b c"), (2L, "d e f"), (3L, "a b c d e"),
      (4L, "a b c d e f g h i")).toDF("doc_id", "text")
    val rows = TextStats.paddingEfficiency(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(rows == Set(
      ("bucket", 4L, 2L, 6L, 2500L),   // 8 slots, 2 wasted
      ("bucket", 8L, 1L, 5L, 3750L),   // 8 slots, 3 wasted
      ("bucket", 16L, 1L, 9L, 4375L),  // 16 slots, 7 wasted
      ("global", 16L, 4L, 20L, 6875L)  // 64 slots, 44 wasted
    ), s"got $rows")
  }

  test("bloomMembershipStats: planted dup flagged, no false negatives, bound holds (round-8)") {
    val corpus = Seq("k1", "k2", "k3").toDF("fp")
    val batch = Seq((10L, "k1"), (11L, "novel-a"), (12L, "novel-b"))
      .toDF("doc_id", "fp")
    val row = TextDedup.bloomMembershipStats(corpus, batch).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getInt(3)) ==
      ((3L, 1L, 0L, 1)))

    // empty corpus: nothing can match, nothing can false-positive
    val empty = TextDedup.bloomMembershipStats(corpus.limit(0), batch).collect().head
    assert((empty.getLong(0), empty.getLong(1), empty.getLong(2), empty.getInt(3)) ==
      ((3L, 0L, 0L, 1)))
  }

  test("minhashErrorCalibration: exact duplicates land in the zero-error bucket (round-8)") {
    // two identical docs: every signature component matches (m = 16) and
    // exact Jaccard is 1 → err_bp = |16*u - 16*i| = 0; the third doc
    // shares no shingle so no candidate pair involves it
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val rows = TextDedup.minhashErrorCalibration(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq((0L, 1L, 0L, 0L)),
      s"expected one pair in the zero bucket, got $rows")
  }

  test("JSONL interchange round-trips hostile content exactly (round-9, the x91 path)") {
    // x91 proves the round-trip on the corpus; this pins the content
    // classes the corpus may not contain — embedded newlines (the
    // one-doc-per-line format MUST escape them or the file re-splits),
    // quotes/backslashes (JSON escaping), tabs and control chars,
    // non-BMP unicode (surrogate pairs), and whitespace-edged strings.
    val nasty = Seq(
      1L -> "line one\nline two\r\nline three",
      2L -> "quote \" backslash \\ slash / end",
      3L -> "tab\there and bellnull-ish",
      4L -> "emoji 😀 CJK 中文 accents éè",
      5L -> "  leading and trailing spaces  ",
      6L -> "{\"looks\":\"like json\"}",
      7L -> "")
    val df = nasty.toDF("doc_id", "text")
    val dir = tempDir("graft-jsonl-nasty") + "/d"
    df.write.option("compression", "gzip").json(dir)
    // one doc per physical LINE: 7 docs -> 7 lines across the shards
    val lineCount = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz")).map { f =>
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f)), "UTF-8"))
        try Iterator.continually(in.readLine()).takeWhile(_ != null).size
        finally in.close()
      }.sum
    assert(lineCount == 7, s"embedded newlines must be escaped, got $lineCount lines")
    val back = spark.read.schema("doc_id LONG, text STRING").json(dir)
      .as[(Long, String)].collect().toMap
    nasty.foreach { case (id, t) =>
      assert(back(id) == t, s"doc $id mangled: ${back(id)} vs $t")
    }
  }

  test("mediaTableFromFiles idPattern: non-matching filenames fail loudly, never null ids") {
    val dir = new java.io.File(tempDir("graft-idpat"))
    val img = Multimodal.renderImage(1L, 8, 8, 0)
    javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, "42.png"))
    javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, "not-a-number.png"))
    val pat = "/(\\d+)\\.png$"
    val ex = intercept[Exception] {
      Multimodal.mediaTableFromFiles(spark, dir.toString, "*.png", idPattern = pat).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("does not match idPattern")),
      s"expected a loud idPattern failure, got: ${msgs(ex)}")
    // the clean layout still parses
    new java.io.File(dir, "not-a-number.png").delete()
    val rows = Multimodal.mediaTableFromFiles(spark, dir.toString, "*.png", idPattern = pat)
      .select("doc_id").as[Long].collect()
    assert(rows.toSeq == Seq(42L))
  }

  test("CSV interchange: embedded newlines demand multiLine=true (the non-splittable trade)") {
    // why x91 standardizes on JSONL rather than CSV for corpus
    // interchange, as a measured fact: CSV quotes embedded newlines
    // LITERALLY (RFC 4180), so the default line-split reader sees more
    // records than documents and only multiLine=true — which makes each
    // file non-splittable, serializing a 100 TB read per shard —
    // recovers the content. JSON escapes newlines instead, keeping
    // one-doc-per-line and split-parallel gzip shards.
    val docs = Seq(1L -> "plain text", 2L -> "two\nlines", 3L -> "q\"uote, comma")
    val df = docs.toDF("doc_id", "text")
    val dir = tempDir("graft-csv-nasty") + "/d"
    df.coalesce(1).write.option("header", "true").csv(dir)

    // default (line-split) read: the quoted newline splits doc 2 into
    // garbage rows — a corrupted read, visibly NOT 3 clean docs
    val expected = docs.toMap
    val naive = spark.read.option("header", "true")
      .schema("doc_id LONG, text STRING").csv(dir)
    val naiveRows = naive.collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(naiveRows != expected.toSet.map(identity[(Long, String)]),
      "line-split CSV read should corrupt embedded-newline docs")

    // multiLine=true round-trips exactly — at the price of per-file
    // sequential parsing
    val correct = spark.read.option("header", "true").option("multiLine", "true")
      .schema("doc_id LONG, text STRING").csv(dir)
      .as[(Long, String)].collect().toMap
    assert(correct == docs.toMap)
  }

  test("retrievalMrr: hit rank, reciprocal fixed point, and the missed case") {
    val exact = Seq((1L, 1, 10L), (2L, 1, 20L), (3L, 1, 30L))
      .toDF("qid", "rank", "neighbor_id")
    val approx = Seq(
      (1L, 1, 99L), (1L, 2, 10L), // truth at rank 2
      (2L, 1, 20L),               // truth at rank 1
      (3L, 1, 77L), (3L, 2, 78L)  // truth missed
    ).toDF("qid", "rank", "neighbor_id")
    val got = Similarity.retrievalMrr(exact, approx).collect()
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("true_top1"), r.getAs[Long]("rank_in_sys"),
          r.getAs[Long]("rr_fp"))).toMap
    assert(got == Map(
      1L -> ((10L, 2L, 500000L)),
      2L -> ((20L, 1L, 1000000L)),
      3L -> ((30L, 0L, 0L))))
  }

  test("clusteredCorpus: missing center rows fail NAMED, never silently shrink (round-11 ADVICE)") {
    def mkEmb(ids: Seq[Long]) = ids.map(i =>
      (i, Seq.tabulate(4)(d => (i * 7 + d).toFloat)))
      .toDF("vec_id", "embedding")
    // contiguous ids covering every needed center: derivation keeps all rows
    val ok = mkEmb(0L until 60L)
    assert(Similarity.clusteredCorpus(ok, k = 3, centerStride = 10L).count() == 60)
    // non-contiguous corpus: center id 20 ((2 % 3) * 10) absent -> the
    // old code silently dropped cluster 2; now it names the missing id
    val holes = mkEmb((0L until 60L).filterNot(_ == 20L))
    val e = intercept[IllegalArgumentException] {
      Similarity.clusteredCorpus(holes, k = 3, centerStride = 10L)
    }
    assert(e.getMessage.contains("20") && e.getMessage.contains("center rows missing"))
  }
}
