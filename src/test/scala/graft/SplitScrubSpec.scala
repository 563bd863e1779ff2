package graft

import org.apache.spark.sql.functions._

import graft.ext.{TextDedup, TextStats}

/** x94 cluster-safe split + x95 PII scrub (round-10 additions). */
class SplitScrubSpec extends SparkSuite {

  import spark.implicits._

  // three near-dup pairs + singletons; text overlap drives the edges
  private def docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta", "en"),
    (1L, "alpha beta gamma delta epsilon eta", "en"),   // near-dup of 0
    (2L, "one two three four five six", "en"),
    (3L, "one two three four five seven", "en"),        // near-dup of 2
    (4L, "lone document with unique words here", "en"),
    (5L, "short", "en"),                                 // < 4 tokens: no shingles
    (6L, "uno dos tres cuatro cinco seis", "es")
  ).toDF("doc_id", "text", "lang")

  private def split = TextDedup.clusterSafeSplit(
    docs, TextDedup.sharedShingleEdges(docs, "lang", 4))

  test("every doc gets exactly one row and a split") {
    val got = split.collect()
    assert(got.length == 7)
    assert(got.forall(r => Set("train", "val", "test")(r.getAs[String]("split_safe"))))
  }

  test("same component => same safe split, always") {
    val viol = split.groupBy("component")
      .agg(countDistinct(col("split_safe")).as("n"))
      .filter(col("n") > 1).count()
    assert(viol == 0L)
  }

  test("near-dup pairs share a component; singletons keep their own") {
    val comp = split.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    assert(comp(0L) == comp(1L))
    assert(comp(2L) == comp(3L))
    assert(comp(0L) != comp(2L))
    assert(comp(4L) == 4L && comp(5L) == 5L && comp(6L) == 6L)
  }

  test("leaky is exactly 'cluster straddles naive splits' and singletons never leak") {
    val rows = split.collect()
    val naiveByComp = rows.groupBy(_.getAs[Long]("component"))
      .view.mapValues(_.map(_.getAs[String]("split_naive")).toSet).toMap
    rows.foreach { r =>
      val expect = if (naiveByComp(r.getAs[Long]("component")).size > 1) 1 else 0
      assert(r.getAs[Int]("leaky") == expect, s"doc ${r.getAs[Long]("doc_id")}")
    }
    rows.filter(r => Seq(4L, 5L, 6L).contains(r.getAs[Long]("doc_id")))
      .foreach(r => assert(r.getAs[Int]("leaky") == 0))
  }

  test("split fractions converge to the 8/1/1 bucket weights on many singleton ids") {
    val many = spark.range(0, 5000).select(col("id").as("doc_id"))
    val empty = Seq.empty[(Long, Long, Long)].toDF("doc_a", "doc_b", "n_shared")
    val frac = TextDedup.clusterSafeSplit(many, empty)
      .groupBy("split_safe").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(frac("train") - 4000L) < 200)
    assert(math.abs(frac("val") - 500L) < 120)
    assert(math.abs(frac("test") - 500L) < 120)
  }

  test("piiScrub counts on original text and redacts every match in order") {
    val in = Seq(
      (1L, "write to bob@mail.com or ann7@web.org today"),
      (2L, "call 555-0001 or 555-9999"),
      (3L, "mixed bob@mail.com and 555-1234"),
      (4L, "nothing to see")
    ).toDF("doc_id", "txt")
    val got = TextStats.piiScrub(in, "txt",
        Seq(("email", "[a-z0-9]+@[a-z0-9]+\\.[a-z]+", "<EMAIL>"),
            ("phone", "555-[0-9]{4}", "<PHONE>")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"), r.getAs[String]("scrubbed"))).toMap
    assert(got(1L) == ((2L, 0L, "write to <EMAIL> or <EMAIL> today")))
    assert(got(2L) == ((0L, 2L, "call <PHONE> or <PHONE>")))
    assert(got(3L) == ((1L, 1L, "mixed <EMAIL> and <PHONE>")))
    assert(got(4L) == ((0L, 0L, "nothing to see")))
  }

  test("an earlier replacement token never feeds a later pattern's count") {
    // '<EMAIL>' contains no digits/555 runs, but guard the general
    // contract anyway: counts computed pre-replacement
    val in = Seq((1L, "a9@b.c 555-0000")).toDF("doc_id", "txt")
    val got = TextStats.piiScrub(in, "txt",
      Seq(("email", "[a-z0-9]+@[a-z0-9]+\\.[a-z]+", "x555-1111x"), // adversarial replacement
          ("phone", "555-[0-9]{4}", "<PHONE>"))).collect().head
    assert(got.getAs[Long]("n_phone") == 1L) // not 2: count saw the ORIGINAL text
    assert(got.getAs[String]("scrubbed") == "x<PHONE>x <PHONE>")
  }
}
