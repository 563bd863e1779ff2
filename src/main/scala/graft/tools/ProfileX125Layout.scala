package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the fused band-dedup loop's storage layouts at an amplified
  * scale (round-15 triage): the migrated x125 read 2× slower than its
  * flat r14 reading at ×100, and the candidate terms are (a) the
  * per-append repartition+saveAsTable cost, (b) the bucketed
  * compaction cadence firing on a files>maxFiles gate that 32-bucket
  * appends trip after two waves, (c) the probe resolve itself. Runs
  * the SAME wave script through the flat loop, the bucketed loop with
  * compaction disabled, and the bucketed loop at the default cadence,
  * on one session/window, printing per-arm wall times.
  *
  *   sbt 'runMain graft.tools.ProfileX125Layout /tmp/graft-scale100'
  */
object ProfileX125Layout {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-x125-layout")
      .config("spark.sql.warehouse.dir",
        graft.util.Scratch.tempDir("graft-x125l-wh") + "/warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    val dir = args.headOption.getOrElse("/tmp/graft-scale100")
    val SI = graft.streaming.StreamingIngest
    import graft.ext.TextDedup

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("h4", pmod(TextDedup.portableHashBuiltin(
        col("doc_id").cast("string"), ""), lit(4L)))
      .localCheckpoint(false)
    def wave0 = docs.drop("h4")
    def wave1 = docs.filter(col("h4") === 1)
      .withColumn("text", concat(col("text"), lit(" "), col("text"))).drop("h4")
      .unionByName(docs.filter(col("h4") === 3)
        .withColumn("text", concat(col("text"), lit(" alpha"))).drop("h4"))
    def wave2 = docs.filter(col("h4") === 2)
      .withColumn("text", lit(null).cast("string")).drop("h4")
      .unionByName(docs.filter(col("h4") === 3).drop("h4"))

    def arm(name: String)(run: String => Unit): Unit = {
      val root = graft.util.Scratch.tempDir(s"graft-x125l-$name")
      Seq(wave0, wave1, wave2).zipWithIndex.foreach { case (w, i) =>
        graft.util.FileWaves.write(root + "/src", i, w)
      }
      val t0 = System.nanoTime()
      run(root)
      println(f"[x125-layout] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def stream(root: String) = spark.readStream
      .schema(spark.read.parquet(s"$dir/documents.parquet").schema)
      .option("maxFilesPerTrigger", 1).parquet(root + "/src/*")
    val signer: DataFrame => DataFrame = df => TextDedup.minhashSignaturesPortable(df)
    def tag(root: String) = root.split('/').last.replaceAll("[^a-zA-Z0-9]", "_")

    arm("flat") { root =>
      SI.bandIndexUpsertDedupStream(stream(root), root + "/bands",
        root + "/versions", root + "/verdicts", root + "/ckpt", signer = signer)
    }
    arm("bucketed-nocompact") { root =>
      val t = tag(root)
      SI.bandIndexUpsertDedupStreamBucketed(stream(root), s"b1_${t}", s"v1_${t}",
        root + "/verdicts", root + "/ckpt", buckets = cpus.toInt,
        maxFiles = Int.MaxValue, signer = signer)
    }
    arm("bucketed-default") { root =>
      val t = tag(root)
      SI.bandIndexUpsertDedupStreamBucketed(stream(root), s"b2_${t}", s"v2_${t}",
        root + "/verdicts", root + "/ckpt", buckets = cpus.toInt, signer = signer)
    }
    spark.stop()
  }
}
