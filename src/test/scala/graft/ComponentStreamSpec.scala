package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents
import graft.pipeline.ManifestTable
import graft.streaming.StreamingIngest

/** Streaming component maintenance (round-10, the x100 twin): the
  * standing component table folded per edge micro-batch equals
  * from-scratch CC over every edge ever streamed.
  */
class ComponentStreamSpec extends SparkSuite {
  import spark.implicits._

  // three batches whose edges braid across batches: {1,2} + {3,4} land
  // first, the MERGING edge (2,3) arrives last; a second community
  // grows one node per batch
  private val batches: Seq[Seq[(Long, Long)]] = Seq(
    Seq((1L, 2L), (3L, 4L)),
    Seq((100L, 101L)),
    Seq((2L, 3L), (101L, 102L)))

  private def writeBatch(dir: String, b: Int): Unit = {
    val f = new java.io.File(dir, f"batch$b%03d.parquet")
    batches(b).toDF("doc_a", "doc_b").coalesce(1)
      .write.mode("overwrite").parquet(f.toString)
    val t = 1700000000000L + b * 60000L
    f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
  }

  private def run(src: String, comps: String, ckpt: String): Unit = {
    val edges = spark.readStream
      .schema("doc_a LONG, doc_b LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(src + "/*")
    StreamingIngest.componentStream(edges, comps, ckpt)
  }

  private def standing(comps: String): Map[Long, Long] =
    ManifestTable.read(spark, comps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed fold equals from-scratch CC over all streamed edges") {
    val root = Files.createTempDirectory("graft-ccstream").toString
    batches.indices.foreach(b => writeBatch(root + "/src", b))
    run(root + "/src", root + "/comps", root + "/ckpt")

    val expect = ConnectedComponents.labels(
      batches.flatten.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(standing(root + "/comps") == expect)
    // and the braid really merged: node 4 (untouched by batch 2) reads 1
    assert(standing(root + "/comps")(4L) == 1L)
  }

  test("replaying all batches against the folded table is a no-op") {
    val root = Files.createTempDirectory("graft-ccstream2").toString
    batches.indices.foreach(b => writeBatch(root + "/src", b))
    run(root + "/src", root + "/comps", root + "/ckpt")
    val before = standing(root + "/comps")
    run(root + "/src", root + "/comps", root + "/ckpt2") // fresh checkpoint = full replay
    assert(standing(root + "/comps") == before)
  }
}
