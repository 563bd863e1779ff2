package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Occupancy-derived IVF-PQ shortlist (round-11 verdict item 5): the
  * sizing formula, its floor, and the auto wrapper's equivalence to the
  * explicit-shortlist search.
  */
class AutoShortlistSpec extends SparkSuite {
  import spark.implicits._

  test("shortlist = max(2k, ceil(frac * nprobe * mean cell occupancy))") {
    // 4 cells with occupancies 10, 20, 30, 40 -> mean 25
    val assigned = (0 until 100).map(i =>
      (i.toLong, (if (i < 10) 0 else if (i < 30) 1 else if (i < 60) 2 else 3).toLong))
      .toDF("vec_id", "cell_id")
    assert(Similarity.occupancyShortlist(assigned, nprobe = 4, k = 5) == 25,
      "ceil(0.25 * 4 * 25) = 25")
    assert(Similarity.occupancyShortlist(assigned, nprobe = 1, k = 5, frac = 0.1) == 10,
      "floor 2k engages when the derived size is below it")
    assert(Similarity.occupancyShortlist(assigned, nprobe = 2, k = 5, frac = 0.5) == 25)
  }

  test("knnIvfPqAuto equals knnIvfPq at the derived shortlist (shared assignment)") {
    val emb = Similarity.clusteredCorpus(
      graft.sources.Tables.embeddings(spark, sf)).localCheckpoint(false)
    val q = emb.filter(col("vec_id") < 5)
    val centroids = Similarity.strideCentroids(emb, 16).localCheckpoint(false)
    val cb = Similarity.pqResidualCodebooks(emb, centroids).localCheckpoint(false)
    val assigned = Similarity.ivfAssign(emb, centroids).localCheckpoint(false)
    val sl = Similarity.occupancyShortlist(assigned, nprobe = 4, k = 5)
    assert(sl > 12, s"derived shortlist $sl should exceed the fixed-12 trap on this corpus")
    val auto = Similarity.knnIvfPqAuto(q, emb, centroids, cb, k = 5,
        nprobe = 4, assignedOpt = Some(assigned))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val explicit = Similarity.knnIvfPq(q, emb, centroids, cb, k = 5,
        nprobe = 4, shortlist = sl, assignedOpt = Some(assigned))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(auto == explicit)
  }
}
