package graft

import org.apache.spark.sql.functions._

import graft.functions._

/** FIXTURES.md §B.2/3/7: pair-key commutativity, address padding,
  * shingles, JSON round-trip.
  */
class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("pair_key is commutative and '/'-joined sorted (FIXTURES §B.3)") {
    val df = Seq(("ETH", "USDC"), ("USDC", "ETH"), ("ETH", "ETH"), ("A/B", "A"))
      .toDF("a", "b")
      .select(pair_key(col("a"), col("b")).as("p"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("ETH/USDC", "ETH/USDC", "ETH/ETH", "A/A/B"))
  }

  test("pair_key commutativity property over random symbol pairs") {
    val rnd = new scala.util.Random(7)
    val syms = Seq.fill(100)((rnd.alphanumeric.take(5).mkString, rnd.alphanumeric.take(5).mkString))
    val fwd = syms.toDF("a", "b").select(pair_key(col("a"), col("b"))).collect().map(_.getString(0))
    val rev = syms.map(_.swap).toDF("a", "b").select(pair_key(col("a"), col("b"))).collect().map(_.getString(0))
    assert(fwd.sameElements(rev))
  }

  test("pair_key null behavior is recorded: concat_ws drops the null side") {
    // the reference would throw on sorted([None, 'b']); our engine keeps
    // the non-null symbol (concat_ws skips nulls after array_sort puts
    // them last) — a recorded divergence, upstream fills defaults first
    // (P-11) so nulls never reach the pair key in the pipeline
    val got = Seq((Option.empty[String], Some("ETH")))
      .toDF("a", "b").select(pair_key(col("a"), col("b"))).first().getString(0)
    assert(got == "ETH")
  }

  test("pad_address: short pads to 66 chars, 64-digit passthrough (FIXTURES §B.2)") {
    val df = Seq("0x157abc", "157abc", "0x" + "a" * 64)
      .toDF("a").select(pad_address(col("a")).as("p"))
    val got = df.collect().map(_.getString(0))
    assert(got.forall(_.length == 66))
    assert(got(0) == "0x" + "0" * 58 + "157abc")
    assert(got(1) == got(0))
    assert(got(2) == "0x" + "a" * 64)
  }

  test("pad_address: >64-digit input yields null, not a truncated address") {
    val df = Seq("0x" + "b" * 65, "c" * 70, "0x" + "a" * 64)
      .toDF("a").select(pad_address(col("a")).as("p"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got(0).isEmpty && got(1).isEmpty)
    assert(got(2).contains("0x" + "a" * 64))
  }

  test("md5_prefix60 kernel equals the composed-builtin conv form (property)") {
    val rnd = new scala.util.Random(11)
    val samples = Seq("", "a", "the quick brown fox", "0x1234", "多字节 текст ✓") ++
      Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val df = samples.toDF("s")
      .select(
        graft.ext.TextDedup.portableHash(col("s"), "").as("fast"),
        graft.ext.TextDedup.portableHashBuiltin(col("s"), "").as("ref"),
        graft.ext.TextDedup.portableHash(col("s"), "|salt").as("fast_salt"),
        graft.ext.TextDedup.portableHashBuiltin(col("s"), "|salt").as("ref_salt"))
    df.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"unsalted mismatch for row $r")
      assert(r.getLong(2) == r.getLong(3), s"salted mismatch for row $r")
      assert(r.getLong(0) >= 0)
    }
  }

  test("word_shingles kernel equals the composed-builtin form (property)") {
    val rnd = new scala.util.Random(23)
    val words = Seq("the", "a", "fox", "dog", "ran", "", "x")
    val samples = Seq("", " ", "  ", "a", "a b", "a b c", " a b c ", "a  b c") ++
      Seq.fill(200)(Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" "))
    for (n <- Seq(2, 3)) {
      val df = samples.toDF("s").select(
        word_shingles(col("s"), n).as("fast"),
        word_shingles_builtin(col("s"), n).as("ref"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("char_ngrams kernel equals the composed substring form; codepoint positions") {
    val rnd = new scala.util.Random(29)
    val alphabet = "ab 的是x"
    val samples = Seq("", "a", "ab", "的是", "a的b", " a ") ++
      Seq.fill(200)(Seq.fill(rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.size))).mkString)
    for (n <- Seq(2, 3)) {
      // composed reference: substring windows over codepoint positions
      val ref = (s: String) => {
        val cps = s.codePoints().toArray.toSeq
        if (cps.size < n) Seq.empty[String]
        else (0 to cps.size - n).map(i =>
          cps.slice(i, i + n).map(Character.toChars(_).mkString).mkString)
      }
      val got = samples.toDF("s")
        .select(col("s"), graft.functions.char_ngrams(col("s"), n).as("g"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      samples.distinct.foreach { s =>
        assert(got(s) == ref(s), s"n=$n mismatch for '$s': ${got(s)} vs ${ref(s)}")
      }
    }
  }

  test("word_ngrams keeps duplicates in order; word_shingles drops them") {
    val got = Seq("a b a b").toDF("s")
      .select(word_ngrams(col("s"), 2).as("all"), word_shingles(col("s"), 2).as("dst"))
      .first()
    assert(got.getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(got.getSeq[String](1) == Seq("a b", "b a"))
  }

  test("frequent_items: guaranteed heavy hitter survives with a valid lower bound") {
    val rnd = new scala.util.Random(31)
    // 2000 occurrences of "hot" in a stream of 6000 — frequency 1/3,
    // far above the 1/(capacity+1) guarantee for capacity 8
    val items = rnd.shuffle(
      Seq.fill(2000)("hot") ++ Seq.fill(4000)(s"cold_${rnd.nextInt(500)}"))
    val df = items.toDF("item").repartition(7)
      .agg(frequent_items(col("item"), 8).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.min_count"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.contains("hot"), s"guaranteed heavy hitter evicted: $got")
    // min_count is a lower bound of the true count, and the MG error
    // bound says it is within n/(capacity+1) of it
    assert(got("hot") <= 2000)
    assert(got("hot") >= 2000 - 6000 / 9, s"lower bound too loose: ${got("hot")}")
  }

  test("cm_estimate: in-plan probe equals the driver-side CountMinSketch probe") {
    val rnd = new scala.util.Random(17)
    val items = Seq.fill(3000)(s"t${rnd.nextInt(50)}")
    val df = items.toDF("term").repartition(5)
    val sketch = df.agg(
      org.apache.spark.sql.functions.count_min_sketch(
        col("term"), lit(1e-3), lit(0.99), lit(42)).as("sk"))
    val probes = Seq("t0", "t7", "t49", "absent").toDF("term")
    val got = probes.crossJoin(broadcast(sketch))
      .select(col("term"), cm_estimate(col("sk"), col("term")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference: deserialize on the driver and probe directly
    val bytes = sketch.first().getAs[Array[Byte]](0)
    val sk = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    got.foreach { case (term, est) =>
      assert(est == sk.estimateCount(term), s"$term: plan=$est driver=${sk.estimateCount(term)}")
    }
    val trueCounts = items.groupBy(identity).view.mapValues(_.size).toMap
    got.filterNot(_._1 == "absent").foreach { case (term, est) =>
      assert(est >= trueCounts(term).toLong, s"CM underestimated $term")
    }
  }

  test("frequent_items state stays bounded by capacity") {
    val items = (0 until 10000).map(i => s"unique_$i")
    val n = items.toDF("item").repartition(13)
      .agg(frequent_items(col("item"), 16).as("mg"))
      .select(size(col("mg"))).first().getInt(0)
    assert(n <= 16, s"buffer exceeded capacity: $n")
  }

  test("zorder_key matches the reference bit-interleave loop (property)") {
    def slow(x: Int, y: Int): Long = {
      var out = 0L
      for (b <- 0 until 32) {
        out |= ((x.toLong >> b) & 1L) << (2 * b)
        out |= ((y.toLong >> b) & 1L) << (2 * b + 1)
      }
      out
    }
    val rnd = new scala.util.Random(37)
    val pts = Seq((0, 0), (1, 0), (0, 1), (3, 5), (Int.MaxValue, Int.MaxValue)) ++
      Seq.fill(200)((rnd.nextInt(Int.MaxValue), rnd.nextInt(Int.MaxValue)))
    val got = pts.toDF("x", "y")
      .select(zorder_key(col("x"), col("y")).as("z")).collect().map(_.getLong(0))
    pts.zip(got).foreach { case ((x, y), z) =>
      assert(z == slow(x, y), s"($x, $y)")
    }
    // the defining property: z(0,0)=0, z(1,0)=1, z(0,1)=2, z(1,1)=3
    assert(slow(1, 1) == 3)
  }

  test("json_string_array round-trips to_json (FIXTURES §B.7)") {
    val df = Seq(Seq("0xa", "0xb"), Seq.empty[String])
      .toDF("arr")
      .select(json_string_array(to_json(col("arr"))).as("back"), col("arr"))
    df.collect().foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("element_at over a parsed JSON array is 1-based (arrayElement parity)") {
    // the reference's arrayElement(parsed_data, 2) is 1-based; Spark's
    // element_at matches, so positional payload access translates directly
    val r = Seq(Seq("0xaa", "0xbb", "0xcc")).toDF("arr")
      .select(element_at(json_string_array(to_json(col("arr"))), 2).as("second"))
      .first()
    assert(r.getString(0) == "0xbb")
  }

  test("pad_address divergence from the reference's pad-width quirk is canonical") {
    // parse_data.py:9-18 computes the pad as '0'*(66-len(address)) BEFORE
    // stripping the 0x prefix, so its output length depends on whether the
    // input carried the prefix. We canonicalize to lpad(...,64,'0') — every
    // output is exactly 66 chars regardless of input form (recorded,
    // tested decision per FIXTURES §B.2).
    val outs = Seq("0x157", "157").toDF("a")
      .select(pad_address(col("a"))).collect().map(_.getString(0))
    assert(outs.distinct.length == 1 && outs.head.length == 66)
  }

  test("word_shingles: n-grams in order, distinct, short text → empty") {
    val got = Seq("a b c d", "a b", "x y x y x y")
      .toDF("t").select(word_shingles(col("t"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("x y x", "y x y"))
  }
  test("nfc_normalize: composes canonical sequences, identity on NFC text, null-safe") {
    val acute = "\u0301" // COMBINING ACUTE ACCENT
    val eComposed = "\u00e9"
    val rows = Seq(
      "e" + acute,    // composes to U+00E9
      "q" + acute,    // no precomposed form -> stays 2 codepoints
      eComposed,      // already composed -> fast-path identity
      "plain ascii",
      "a" + acute + "b" + acute + "c" // a+acute composes, b+acute does not
    ).toDF("t").select(nfc_normalize(col("t")).as("n"),
      length(nfc_normalize(col("t"))).as("l1")).collect()
    assert(rows(0).getString(0) == eComposed && rows(0).getInt(1) == 1)
    assert(rows(1).getString(0) == "q" + acute && rows(1).getInt(1) == 2)
    assert(rows(2).getString(0) == eComposed)
    assert(rows(3).getString(0) == "plain ascii")
    assert(rows(4).getString(0) == "\u00e1b" + acute + "c")
    // SQL registration resolves and agrees with the Column wrapper
    val viaSql = spark.sql(s"SELECT nfc_normalize('e$acute')").collect()(0).getString(0)
    assert(viaSql == eComposed)
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .select(nfc_normalize(col("t"))).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("dedup_tokens kernel equals the composed indexed-filter array form (property)") {
    val rnd = new scala.util.Random(41)
    val words = Seq("a", "b", "ab", "的", "x1", "", "the")
    val samples = Seq("", " ", "  a  ", "a a a", "a b a b", "的 的 x 的") ++
      Seq.fill(300)(Seq.fill(rnd.nextInt(15))(words(rnd.nextInt(words.size))).mkString(" "))
    // composed reference: the exact x107 formulation
    val w = filter(split(col("s"), " "), x => length(x) > 0)
    val ref = array_join(filter(w, (x, i) => array_position(w, x) === i + 1), " ")
    val rows = samples.toDF("s")
      .select(dedup_tokens(col("s")).as("fast"), ref.as("slow")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"mismatch: '${r.getString(0)}' vs '${r.getString(1)}'")
    }
    val nullRow = Seq(Option.empty[String]).toDF("s")
      .select(dedup_tokens(col("s"))).collect()(0)
    assert(nullRow.isNullAt(0))
  }
}
