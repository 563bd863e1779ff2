package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** MMR re-rank: greedy reference equality, shape, and the diversity
  * property the operator exists for.
  */
class MmrSpec extends SparkSuite {
  import spark.implicits._

  // the engine kernel's arithmetic: left-associated double fold
  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var (ab, aa, bb) = (0.0, 0.0, 0.0)
    for (i <- a.indices) {
      ab += a(i).toDouble * b(i).toDouble
      aa += a(i).toDouble * a(i).toDouble
      bb += b(i).toDouble * b(i).toDouble
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  test("agrees with a driver-side greedy reference on real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val vecs = emb.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    val got = Similarity.mmrRerank(emb.filter(col("vec_id") < 5), emb, 6, 3)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("mmr_rank"),
        r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    val want = (0L until 5L).map { qid =>
      val rel = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => id -> cos(vecs(qid), v) }
        .sortBy { case (id, s) => (-s, id) }.take(6)
      var sel = List(rel.head._1)
      for (_ <- 2 to 3) {
        val next = rel.filterNot { case (id, _) => sel.contains(id) }
          .map { case (id, r) =>
            val ms = sel.map(s => cos(vecs(id), vecs(s))).max
            (id, 0.5 * r - 0.5 * ms)
          }
          .minBy { case (id, sc) => (-sc, id) }._1
        sel = sel :+ next
      }
      qid -> sel
    }.toMap
    assert(got == want)
  }

  test("rank 1 is the brute top-1; exactly k ranks per query") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 8)
    val top1 = Similarity.knnBrute(q, emb, 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor_id")).toMap
    val mmr = Similarity.mmrRerank(q, emb, 8, 4).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("mmr_rank"),
        r.getAs[Long]("neighbor_id")))
    assert(mmr.filter(_._2 == 1).map(t => t._1 -> t._3).toMap == top1)
    mmr.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4))
    }
  }

  test("aggregate form is row-identical to the unrolled form") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("mmr_rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    Seq(0.5, 0.25).foreach { lam =>
      assert(rows(Similarity.mmrRerankAgg(q, emb, 8, 4, lam)) ==
        rows(Similarity.mmrRerank(q, emb, 8, 4, lam)), s"lambda=$lam")
    }
  }

  test("aggregate form is partitioning-invariant") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 8)
    def rows(c: org.apache.spark.sql.DataFrame) =
      Similarity.mmrRerankAgg(q, c, 8, 4).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("mmr_rank"),
          r.getAs[Long]("neighbor_id"))).toSet
    assert(rows(emb) == rows(emb.repartition(17)))
  }

  test("lambda=1 reduces MMR to plain relevance top-k") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 6)
    val plain = Similarity.knnBrute(q, emb, 4).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    val mmr = Similarity.mmrRerank(q, emb, 8, 4, lambda = 1.0).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("mmr_rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(mmr == plain)
  }

  test("diversity: MMR escapes a redundant cluster that plain top-k stays in") {
    // query q; a tight redundant cluster (pairwise sim ~0.9999) that
    // dominates relevance, and a clearly less relevant candidate on the
    // other side of q (sim to the cluster ~0.76)
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val emb = Seq(
      0L -> v(1, 0, 0, 0),
      1L -> v(0.98, 0.10, 0, 0), 2L -> v(0.98, 0.11, 0, 0),
      3L -> v(0.98, 0.12, 0, 0),
      4L -> v(0.80, -0.55, 0, 0)
    ).toDF("vec_id", "embedding")
    val plain = Similarity.knnBrute(emb.filter(col("vec_id") === 0), emb, 3)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(plain == Set(1L, 2L, 3L))
    val mmr = Similarity.mmrRerank(emb.filter(col("vec_id") === 0), emb, 4, 3)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(mmr.contains(4L))
  }

  test("duplicate candidate ids: deduped (keep higher rel), no NPE (round-11 ADVICE)") {
    // the same id fed twice per group — e.g. candidates unioned from two
    // retrieval lists. Pre-fix, duplicates inflated cands.size so the
    // greedy loop ran past the distinct-id supply and dereferenced a
    // null argmax. Group 1: k=3 > 2 distinct ids, all entries doubled.
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val dup = Seq(
      (1L, 10L, 0.9, v(1, 0, 0, 0)), (1L, 10L, 0.2, v(0, 1, 0, 0)),
      (1L, 11L, 0.8, v(0, 0, 1, 0)), (1L, 11L, 0.8, v(0, 0, 1, 0))
    ).toDF("qid", "id", "rel", "vec")
    val out = dup.groupBy(col("qid"))
      .agg(graft.functions.mmr_select(col("id"), col("rel"), col("vec"),
        shortlist = 8, k = 3, lambda = 0.5).as("sel"))
      .select(col("qid"), explode(col("sel")).as("s"))
      .select(col("qid"), col("s.rank"), col("s.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // 2 distinct ids -> exactly 2 ranks; id 10 kept its HIGHER-rel entry
    // so it outranks id 11 (0.9 > 0.8)
    assert(out == Set((1L, 1, 10L), (1L, 2, 11L)))
  }

  test("same-id-same-rel tie keeps the float-bit-min VECTOR regardless of arrival order (round-12 advisory: the allocation-free bit compare preserves the hex-string order)") {
    // the degenerate case the buffer's trailing vec key exists for: two
    // entries per id identical in (id, rel), different vectors — the
    // kept vector feeds the diversity term, so it must not depend on
    // which partition's partial merges first
    val v1 = Array(0.5f, -2.0f, 1.0f)
    val v2 = Array(0.5f, 3.0f, 1.0f)
    def keptVec(first: Array[Float], second: Array[Float]): Seq[Float] = {
      val b = new graft.functions.MmrBuffer(4)
      b.push(10L, 0.9, first)
      b.push(10L, 0.9, second)
      b.sorted.head._3.toSeq
    }
    val a = keptVec(v1, v2)
    assert(a == keptVec(v2, v1), "kept vector depends on arrival order")
    // and the order is the documented one: unsigned float-bit
    // lexicographic (positives before negatives at the sign bit)
    assert(a == v2.toSeq,
      "bit-compare order drifted from the zero-padded-hex encoding it replaced")
  }
}
