package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Similarity, TextDedup}
import graft.operators.ConnectedComponents
import graft.sources.Tables

/** Measures the three connected-components variants on the engine's REAL
  * dedup edge sets (x33's shared-shingle graph, x35's embedding near-dup
  * graph) plus the synthetic long-chain worst case — the
  * measure-before-adopting gate for the hybrid contraction variant
  * (round-5 stretch item 8): the hybrid becomes the default only if it
  * wins here, recorded in SCALING.md.
  *
  *   sbt 'runMain graft.tools.CcBench /root/testdata/sf0.1'
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cc-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.registerAll(spark)

    // warmup: shuffle + agg + parquet reader init outside every timed region
    spark.range(0, 100000, 1, 4).groupBy((col("id") % 7).as("k")).count().count()

    // materialize each edge set once so every variant times ONLY the CC
    // fixpoint, not the upstream LSH/shingle pipeline
    def frozen(df: DataFrame): DataFrame = {
      val f = df.localCheckpoint(false); f.count(); f
    }
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val cases: Seq[(String, DataFrame, String, String)] = Seq(
      ("x33_shingle_graph",
        frozen(TextDedup.sharedShingleEdges(docs.filter(col("doc_id") < 300), "lang", 4)
          .select(col("doc_a"), col("doc_b"))), "doc_a", "doc_b"),
      ("x35_embedding_graph",
        frozen(Similarity.embeddingNearDupPairs(emb, 0.35)
          .select(col("id_a"), col("id_b"))), "id_a", "id_b"),
      ("chain_100k_diam99",
        frozen(spark.range(100000L).filter(col("id") % 100 =!= 99)
          .selectExpr("id AS a", "id + 1 AS b")), "a", "b"))

    val variants: Seq[(String, (DataFrame, String, String) => (DataFrame, Int))] = Seq(
      ("altstar", (e, s, d) => ConnectedComponents.labelsWithRounds(e, s, d, 150)),
      ("hybrid", (e, s, d) => ConnectedComponents.labelsHybridWithRounds(e, s, d, 150)),
      ("adaptive", (e, s, d) => ConnectedComponents.labelsAdaptiveWithRounds(e, s, d, 150)),
      ("minlabel", (e, s, d) => ConnectedComponents.labelsMinLabelWithRounds(e, s, d, 150)))

    cases.foreach { case (caseName, edges, sc, dc) =>
      println(s"[cc] -- $caseName (${edges.count()} edges) --")
      variants.foreach { case (varName, run) =>
        // min of two passes, same convention as Bench
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val (labs, rounds) = run(edges, sc, dc)
          val nComps = labs.select("component").distinct().count()
          ((System.nanoTime() - t0) / 1e9, rounds, nComps)
        }
        val (secs, rounds, comps) = samples.minBy(_._1)
        println(f"[cc] $caseName%-22s $varName%-9s ${secs}%7.2fs  rounds=$rounds comps=$comps")
      }
    }

    // `--big`: a ~1,998,000-edge chain forest (range(2M) minus every
    // 1000th edge → 2000 chains of 999 edges) — ABOVE LocalEdgeThreshold
    // (2^20), so the adaptive default must take the distributed
    // min-label→star path (rounds > 1 proves the gate handed over);
    // local union-find timed next to it for the crossover picture.
    // (Label previously said "big_chain_1M" / the CC scaladoc said
    // "999k-edge chain" — both now cite the real ~2M-edge workload;
    // round-7 advisory.)
    if (args.contains("--big")) {
      val big = frozen(spark.range(2000000L).filter(col("id") % 1000 =!= 999)
        .selectExpr("id AS a", "id + 1 AS b"))
      println(s"[cc] -- big_chain_2M (${big.count()} edges, above gate) --")
      for ((varName, run) <- Seq(
          ("adaptive", (e: DataFrame, s: String, d: String) =>
            ConnectedComponents.labelsAdaptiveWithRounds(e, s, d, 150)),
          ("local", (e: DataFrame, s: String, d: String) =>
            (ConnectedComponents.labelsLocal(e, s, d), 1)))) {
        val t0 = System.nanoTime()
        val (labs, rounds) = run(big, "a", "b")
        val comps = labs.select("component").distinct().count()
        println(f"[cc] big_chain_2M           $varName%-9s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rounds=$rounds comps=$comps")
      }
    }
    spark.stop()
  }
}
