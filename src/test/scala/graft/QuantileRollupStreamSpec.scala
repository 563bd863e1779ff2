package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Streaming KLL quantile-partial rollup (round-10, the x99 twin):
  * micro-batches append per-(event_type, day) KLL partials blind; the
  * read-side merge answers percentile questions from sketch bytes
  * alone, asserted through the rank-window error contract.
  */
class QuantileRollupStreamSpec extends SparkSuite {
  import spark.implicits._

  // values 0..1199 spread over 2 types x 2 days x 3 batches; the global
  // per-type distribution is uniform over 0..1199
  private def batchRows(b: Int): Seq[(String, java.sql.Timestamp, Double)] =
    for {
      i <- 0 until 400
      v = (b * 400 + i).toDouble
      ty <- Seq("view", "cart")
    } yield (ty,
      java.sql.Timestamp.valueOf(s"2024-01-0${1 + (i % 2)} 0$b:00:00"),
      v)

  private def writeBatch(dir: String, b: Int): Unit = {
    val f = new java.io.File(dir, f"batch$b%03d.parquet")
    batchRows(b).toDF("event_type", "ts", "value").coalesce(1)
      .write.mode("overwrite").parquet(f.toString)
    val t = 1700000000000L + b * 60000L
    f.listFiles().foreach(_.setLastModified(t)); f.setLastModified(t)
  }

  test("partials land per batch; merged quantile honors the rank window") {
    val root = tempDir("graft-kllstream")
    (0 until 3).foreach(b => writeBatch(root + "/src", b))
    val ev = spark.readStream
      .schema("event_type STRING, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(root + "/src/*")
    StreamingIngest.quantileRollupStream(ev, root + "/partials", root + "/ckpt")

    val partials = spark.read.parquet(root + "/partials")
    assert(partials.count() == 12) // 2 types x 2 days x 3 batches
    assert(partials.select("ingest_seq").distinct().count() == 3)

    val merged = StreamingIngest.quantilesFromPartials(spark, root + "/partials", 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    Seq("view", "cart").foreach { ty =>
      val (nPartials, nRows, p50) = merged(ty)
      assert(nPartials == 6L && nRows == 1200L)
      // true p50 of 0..1199 is ~600; k=200 rank error ~1.65% => ±20
      // ranks of 1200; allow 5x
      assert(math.abs(p50 - 600.0) < 100, s"$ty merged p50 $p50")
    }
  }
}
