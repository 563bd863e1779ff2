package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decompose the bucketed small-batch append floor (round-16, r15
  * verdict item 1): the migrated index families pay ~1.4-1.6x at sf0.1
  * wave sizes, attributed to "per-append repartition + saveAsTable x 2
  * logs x 4 waves". Before building a cheaper path, measure WHICH part
  * of a wave's append work is the floor:
  *
  *   - the catalog insert command (saveAsTable append) vs a plain
  *     parquet write of the identical shuffled batch;
  *   - the repartition exchange vs writing unshuffled;
  *   - two sequential log appends vs both submitted concurrently;
  *   - a direct bucket-file commit (staging write + rename into the
  *     table dir with bucket-suffixed names + REFRESH) vs the catalog
  *     round-trip;
  *   - one staging job carrying BOTH logs (partitionBy side-splits the
  *     data/version rows, task index = bucket id) vs two jobs.
  *
  *   sbt 'runMain graft.tools.ProfileAppendFloor'
  */
object ProfileAppendFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = cpus.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-append-floor")
      .config("spark.sql.warehouse.dir",
        graft.util.Scratch.tempDir("graft-apf-wh") + "/warehouse")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // wave frames shaped like the x125 band log: ~1-5k rows, (doc_id,
    // band, h) data rows + (doc_id) version rows
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).localCheckpoint(false)
    val nWaves = 4
    def dataWave(i: Int): DataFrame = docs
      .filter(pmod(col("doc_id"), lit(4)) <= i % 4)
      .select(col("doc_id"),
        explode(array((0 until 8).map(lit): _*)).as("band"))
      .withColumn("h", xxhash64(col("doc_id"), col("band")))
      .localCheckpoint(false)
    def versWave(i: Int): DataFrame =
      dataWave(i).select(col("doc_id")).distinct().localCheckpoint(false)
    val dataWaves = (0 until nWaves).map(dataWave)
    val versWaves = (0 until nWaves).map(versWave)
    println(s"[apf] wave rows: data ${dataWaves.map(_.count()).mkString(",")} " +
      s"vers ${versWaves.map(_.count()).mkString(",")}  buckets=$buckets")

    var armN = 0
    val armTables = scala.collection.mutable.LinkedHashMap[String, (String, String)]()
    def arm(name: String)(run: (String, String) => Unit): Double = {
      armN += 1
      val (dt, vt) = (s"apf_d$armN", s"apf_v$armN")
      armTables(name) = (dt, vt)
      spark.sql(s"DROP TABLE IF EXISTS $dt"); spark.sql(s"DROP TABLE IF EXISTS $vt")
      val t0 = System.nanoTime()
      run(dt, vt)
      val sec = (System.nanoTime() - t0) / 1e9
      val nf = try spark.table(dt).inputFiles.length catch { case _: Throwable => -1 }
      println(f"[apf] $name%-28s $sec%7.2f s  (data files: $nf)")
      sec
    }

    // JIT/codegen warmup outside every timed arm: one create + one
    // append through both the catalog and the direct path
    locally {
      spark.sql("DROP TABLE IF EXISTS apf_warm")
      graft.pipeline.Ingest.appendBucketedWithSeq(versWaves(0), "apf_warm", "doc_id", buckets, 0L)
      graft.pipeline.Ingest.appendBucketedWithSeq(versWaves(1), "apf_warm", "doc_id", buckets, 1L)
      versWaves(0).withColumn("ingest_seq", lit(0L))
        .repartition(buckets, col("doc_id"))
        .write.mode("append").bucketBy(buckets, "doc_id").sortBy("doc_id")
        .saveAsTable("apf_warm2")
      spark.sql("DROP TABLE IF EXISTS apf_warm")
      spark.sql("DROP TABLE IF EXISTS apf_warm2")
    }

    // ---- arm 0: the pre-round-16 path (pure saveAsTable appends) ------
    arm("OLD saveAsTable x2 seq") { (dt, vt) =>
      def old(df: DataFrame, table: String, seq: Long): Unit =
        df.withColumn("ingest_seq", lit(seq))
          .repartition(buckets, col("doc_id"))
          .write.mode("append").bucketBy(buckets, "doc_id").sortBy("doc_id")
          .saveAsTable(table)
      (0 until nWaves).foreach { i =>
        old(versWaves(i), vt, i.toLong)
        old(dataWaves(i), dt, i.toLong)
      }
    }

    // ---- arm 1: current path, sequential ------------------------------
    arm("saveAsTable x2 sequential") { (dt, vt) =>
      (0 until nWaves).foreach { i =>
        graft.pipeline.Ingest.appendBucketedWithSeq(versWaves(i), vt, "doc_id", buckets, i.toLong)
        graft.pipeline.Ingest.appendBucketedWithSeq(dataWaves(i), dt, "doc_id", buckets, i.toLong)
      }
    }

    // ---- arm 2: current path, two logs in parallel --------------------
    arm("saveAsTable x2 parallel") { (dt, vt) =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      (0 until nWaves).foreach { i =>
        val f1 = Future(graft.pipeline.Ingest.appendBucketedWithSeq(versWaves(i), vt, "doc_id", buckets, i.toLong))
        val f2 = Future(graft.pipeline.Ingest.appendBucketedWithSeq(dataWaves(i), dt, "doc_id", buckets, i.toLong))
        Await.result(f1, Duration.Inf); Await.result(f2, Duration.Inf)
      }
    }

    // ---- arm 3: plain parquet write of the SAME shuffled batch --------
    // (isolates the catalog-command overhead: identical exchange +
    // identical file count, no table machinery, no bucket names)
    arm("plain parquet x2 (no catalog)") { (dt, vt) =>
      val root = graft.util.Scratch.tempDir("graft-apf-plain")
      (0 until nWaves).foreach { i =>
        versWaves(i).withColumn("ingest_seq", lit(i.toLong))
          .repartition(buckets, col("doc_id"))
          .write.mode("append").parquet(s"$root/vers")
        dataWaves(i).withColumn("ingest_seq", lit(i.toLong))
          .repartition(buckets, col("doc_id"))
          .write.mode("append").parquet(s"$root/data")
      }
    }

    // ---- arm 4: plain parquet, no repartition -------------------------
    // (isolates the exchange: batch-partition-count files, no shuffle)
    arm("plain parquet x2 no-shuffle") { (dt, vt) =>
      val root = graft.util.Scratch.tempDir("graft-apf-noshuf")
      (0 until nWaves).foreach { i =>
        versWaves(i).withColumn("ingest_seq", lit(i.toLong))
          .write.mode("append").parquet(s"$root/vers")
        dataWaves(i).withColumn("ingest_seq", lit(i.toLong))
          .write.mode("append").parquet(s"$root/data")
      }
    }

    // ---- arm 5: direct bucket-file commit -----------------------------
    // staging parquet write (partition index = bucket id by the shared
    // murmur3-pmod placement), then driver-side renames into the table
    // location with bucket-suffixed names + REFRESH TABLE
    def directCommit(df: DataFrame, table: String, seq: Long): Unit = {
      val cat = spark.catalog
      if (!cat.tableExists(table)) {
        graft.pipeline.Ingest.appendBucketedWithSeq(df, table, "doc_id", buckets, seq)
      } else {
        val staging = graft.util.Scratch.tempDir(s"graft-apf-stage")
        df.withColumn("ingest_seq", lit(seq))
          .repartition(buckets, col("doc_id"))
          .sortWithinPartitions(col("doc_id"))
          .write.mode("overwrite").parquet(staging)
        val loc = new java.net.URI(spark.sql(s"DESCRIBE TABLE EXTENDED $table")
          .filter(col("col_name") === "Location").head().getString(1)).getPath
        val stDir = new java.io.File(staging)
        val uuid = java.util.UUID.randomUUID().toString
        stDir.listFiles().filter(f => f.getName.startsWith("part-")).foreach { f =>
          val idx = f.getName.substring(5, 10).toInt
          val tgt = new java.io.File(loc,
            f"part-$idx%05d-$uuid%s_$idx%05d.c000.snappy.parquet")
          java.nio.file.Files.move(f.toPath, tgt.toPath)
        }
        spark.sql(s"REFRESH TABLE $table")
      }
    }
    arm("direct bucket-file commit x2") { (dt, vt) =>
      (0 until nWaves).foreach { i =>
        directCommit(versWaves(i), vt, i.toLong)
        directCommit(dataWaves(i), dt, i.toLong)
      }
    }

    // ---- arm 6: ONE staging job for both logs -------------------------
    // union with a __log side column, partitionBy splits the files,
    // task index = bucket id for both sides
    arm("direct commit, 1 job both logs") { (dt, vt) =>
      (0 until nWaves).foreach { i =>
        val cat = spark.catalog
        if (!cat.tableExists(dt) || !cat.tableExists(vt)) {
          graft.pipeline.Ingest.appendBucketedWithSeq(versWaves(i), vt, "doc_id", buckets, i.toLong)
          graft.pipeline.Ingest.appendBucketedWithSeq(dataWaves(i), dt, "doc_id", buckets, i.toLong)
        } else {
          val staging = graft.util.Scratch.tempDir(s"graft-apf-stage2")
          val unioned = dataWaves(i).withColumn("__log", lit("data"))
            .unionByName(versWaves(i).withColumn("__log", lit("vers")), allowMissingColumns = true)
            .withColumn("ingest_seq", lit(i.toLong))
          unioned.repartition(buckets, col("doc_id"))
            .sortWithinPartitions(col("doc_id"))
            .write.mode("overwrite").partitionBy("__log").parquet(staging)
          val uuid = java.util.UUID.randomUUID().toString
          Seq("data" -> dt, "vers" -> vt).foreach { case (side, table) =>
            val loc = new java.net.URI(spark.sql(s"DESCRIBE TABLE EXTENDED $table")
              .filter(col("col_name") === "Location").head().getString(1)).getPath
            val sideDir = new java.io.File(staging, s"__log=$side")
            Option(sideDir.listFiles()).getOrElse(Array.empty)
              .filter(_.getName.startsWith("part-")).foreach { f =>
              val idx = f.getName.substring(5, 10).toInt
              val tgt = new java.io.File(loc,
                f"part-$idx%05d-$uuid%s_$idx%05d.c000.snappy.parquet")
              java.nio.file.Files.move(f.toPath, tgt.toPath)
            }
            spark.sql(s"REFRESH TABLE $table")
          }
        }
      }
    }

    // ---- arm 7: saveAsTable with coalesce(1) --------------------------
    // the bucketed V1 writer has a required ORDERING (bucket id), not a
    // required distribution: a single coalesced task sorts and splits
    // into one file per bucket present — NO exchange at all, at the
    // price of serializing the batch's write (fine when tiny)
    def appendCoalesced(df: DataFrame, table: String, seq: Long): Unit =
      df.withColumn("ingest_seq", lit(seq))
        .coalesce(1)
        .write.mode("append")
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .saveAsTable(table)
    arm("saveAsTable coalesce(1) x2") { (dt, vt) =>
      (0 until nWaves).foreach { i =>
        appendCoalesced(versWaves(i), vt, i.toLong)
        appendCoalesced(dataWaves(i), dt, i.toLong)
      }
    }

    // ---- arm 8: coalesce(1) + parallel submit -------------------------
    arm("saveAsTable coalesce(1) par") { (dt, vt) =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      (0 until nWaves).foreach { i =>
        val f1 = Future(appendCoalesced(versWaves(i), vt, i.toLong))
        val f2 = Future(appendCoalesced(dataWaves(i), dt, i.toLong))
        Await.result(f1, Duration.Inf); Await.result(f2, Duration.Inf)
      }
    }

    // ---- arm 9: direct commit, cheap location lookup, coalesced -------
    def tableLocation(table: String): String = {
      val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
      new java.io.File(spark.sessionState.catalog.getTableMetadata(id).location).getPath
    }
    def directCommit2(df: DataFrame, table: String, seq: Long): Unit = {
      if (!spark.catalog.tableExists(table)) {
        appendCoalesced(df, table, seq)
      } else {
        val staging = graft.util.Scratch.tempDir(s"graft-apf-stage9")
        df.withColumn("ingest_seq", lit(seq))
          .repartition(buckets, col("doc_id"))
          .sortWithinPartitions(col("doc_id"))
          .write.mode("overwrite").parquet(staging)
        val loc = tableLocation(table)
        val uuid = java.util.UUID.randomUUID().toString
        new java.io.File(staging).listFiles()
          .filter(_.getName.startsWith("part-")).foreach { f =>
          val idx = f.getName.substring(5, 10).toInt
          val tgt = new java.io.File(loc,
            f"part-$idx%05d-$uuid%s_$idx%05d.c000.snappy.parquet")
          java.nio.file.Files.move(f.toPath, tgt.toPath)
        }
        spark.catalog.refreshTable(table)
      }
    }
    arm("direct commit cheap-loc x2") { (dt, vt) =>
      (0 until nWaves).foreach { i =>
        directCommit2(versWaves(i), vt, i.toLong)
        directCommit2(dataWaves(i), dt, i.toLong)
      }
    }

    // ---- arm 10: direct commit cheap-loc, parallel --------------------
    arm("direct commit cheap-loc par") { (dt, vt) =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      (0 until nWaves).foreach { i =>
        val f1 = Future(directCommit2(versWaves(i), vt, i.toLong))
        val f2 = Future(directCommit2(dataWaves(i), dt, i.toLong))
        Await.result(f1, Duration.Inf); Await.result(f2, Duration.Inf)
      }
    }

    // sanity: arm-5/6 tables must still resolve bucketed with zero
    // exchanges and the same rows as arm 1
    def resolveHash(dt: String, vt: String): (Int, Int) = {
      val r = graft.pipeline.Bucketing.resolvedBucketed(spark, dt, vt, "doc_id")
      (graft.pipeline.Bucketing.countExchanges(r),
        r.orderBy("doc_id", "band").collect().map(_.toString).mkString("|").hashCode)
    }
    val tabular = armTables.filterNot(_._1.contains("plain parquet"))
    val ref = resolveHash(tabular.head._2._1, tabular.head._2._2)
    tabular.foreach { case (name, (dt, vt)) =>
      val (ex, h) = resolveHash(dt, vt)
      println(s"[apf] $name: exchanges=$ex hashMatch=${h == ref._2}")
    }
    spark.stop()
  }
}
