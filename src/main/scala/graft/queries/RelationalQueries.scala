package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.functions._
import graft.operators.{Dedup, Prefilter, RangeJoin, Ranks, Salt, SetOps}
import graft.pipeline.Report
import graft.sources.Tables

/** The reference's relational operator surface (SURVEY §2), one registered
  * query per operator row, each with a DuckDB oracle. Queries run over the
  * driver corpus (TESTDATA.md): `orders⋈lineitem` plays `events⋈blocks`,
  * `nation`/`customer` play the twice-joined `token` dimension.
  */
object RelationalQueries {

  private def revenue: Column =
    dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  /** Driver-compare canonicalization of a final decimal column: the exact
    * fixed-point string, identical in both engines. Rationale (round-2,
    * ADVICE.md): the driver's hash gate reads our parquet through pandas
    * (DECIMAL → Python Decimal) but the oracle through duckdb .df()
    * (DECIMAL → float64), so a decimal-typed output can never hash-match;
    * and DOUBLE is unsafe — DuckDB's decimal→double cast is off by 1 ulp
    * from the correctly-rounded value past ~15 significant digits
    * (measured). DECIMAL(38,6)→string is exact at any scale, on both
    * sides ("123.456000", scale always rendered). Engine-facing APIs
    * (graft.pipeline.Report etc.) stay decimal-typed; only the declared
    * query's last projection canonicalizes.
    */
  private def decStr(c: Column): Column = c.cast(DecimalType(38, 6)).cast("string")

  /** DuckDB-side exact uint256 → decimal digits, engineered around one
    * measured fact: DuckDB's 128-bit (U)HUGEINT division runs ~7 µs/op
    * (0.4 s per divmod over 60k rows — the whole oracle budget), while
    * 64-bit UBIGINT division is ~20× cheaper. Both q40/q41 oracles
    * therefore keep EVERY per-row division in 64 bits:
    *
    *  - q40 (per-row render): schoolbook base conversion in base 10^9.
    *    h splits into eight 32-bit words z0..z7 (value = Σ z_j·2^(32(7-j)));
    *    each constant 2^(32(7-j)) is embedded as its base-10^9 limbs c;
    *    every partial product z_j·c < 2^32·10^9 ≈ 4.3e18 fits UBIGINT and
    *    splits with ONE 64-bit divmod; per-limb accumulators stay < 7e10
    *    so the final carry chain is 64-bit too. ~36 fast divmods/row
    *    replace ~10 slow 128-bit ones: 3.7 s → 0.8 s at 60k rows.
    *  - q41 (grouped sum): the base conversion is deferred PAST the
    *    aggregation — per row only four UBIGINT word parses; per group
    *    Σw_i (< n·2^64, fits HUGEINT) — then the 128-bit-division-heavy
    *    base-10^18 conversion runs on the 3 post-agg rows, where its
    *    cost rounds to zero. 3.5 s → 0.55 s.
    *
    * Both forms are validated char-identical to the previous
    * UHUGEINT-division oracle AND to an independent bigint ground truth.
    */
  private def u256Pow2Limbs(exp: Int, base: BigInt): Seq[BigInt] = {
    var v = BigInt(2).pow(exp)
    val out = scala.collection.mutable.ArrayBuffer.empty[BigInt]
    while (v > 0) { out += v % base; v /= base }
    if (out.isEmpty) out += BigInt(0)
    out.toSeq
  }

  /** Carry chain c0..cN over u0..uN from CTE `from`, base `b`; emits
    * normalized limbs v0..vN (vN carries the unbounded top).
    */
  private def u256CarryChain(from: String, maxK: Int, b: String): String =
    (0 to maxK).map { k =>
      val prev = if (k == 0) from else s"c${k - 1}"
      val add = if (k == 0) "" else s" + k${k - 1}"
      if (k < maxK)
        s"c$k AS (SELECT *, (u$k$add) % $b AS v$k, (u$k$add) // $b AS k$k FROM $prev)"
      else
        s"c$k AS (SELECT *, u$k$add AS v$k FROM $prev)"
    }.mkString(",\n")

  private def u256RenderFrom(maxK: Int, width: Int): String = {
    val digits = (s"CAST(v$maxK AS VARCHAR)" +:
      (maxK - 1 to 0 by -1).map(k => s"lpad(CAST(v$k AS VARCHAR),$width,'0')"))
      .mkString(" || ")
    s"CASE WHEN ltrim($digits, '0') = '' THEN '0' ELSE ltrim($digits, '0') END"
  }

  /** q40 per-row CTE stack: expects `src(…, h)`; `(ctes, render, last)`
    * where `last` is the final carry CTE holding base-10^9 limbs.
    */
  private lazy val (u256SchoolbookCtes: String, u256SchoolbookRender: String, u256SchoolbookLast: String) = {
    val B9 = BigInt(10).pow(9)
    // products (j, k, c[j][k]) with the zero limbs dropped
    val prods = for {
      j <- 0 to 7
      (lv, k) <- u256Pow2Limbs(32 * (7 - j), B9).zipWithIndex
      if lv > 0
    } yield (j, k, lv)
    val parseSel = (0 to 7)
      .map(j => s"CAST(CAST('0x'||substr(h,${1 + 8 * j},8) AS UBIGINT) AS UBIGINT) AS z$j")
      .mkString(",\n    ")
    val prodSel = prods.map { case (j, k, lv) => s"z$j*$lv AS p${j}_$k" }.mkString(",\n    ")
    val splitSel = prods
      .map { case (j, k, _) => s"p${j}_$k // 1000000000 AS ph${j}_$k, p${j}_$k % 1000000000 AS pl${j}_$k" }
      .mkString(",\n    ")
    val accTerms = scala.collection.mutable.SortedMap.empty[Int, Vector[String]].withDefaultValue(Vector())
    prods.foreach { case (j, k, _) =>
      accTerms(k) = accTerms(k) :+ s"pl${j}_$k"
      accTerms(k + 1) = accTerms(k + 1) :+ s"ph${j}_$k"
    }
    val maxK = accTerms.keys.max
    val accSel = accTerms.map { case (k, ts) => s"(${ts.mkString(" + ")}) AS u$k" }.mkString(",\n    ")
    val ctes =
      s"""z AS (
         |  SELECT *, $parseSel FROM src),
         |p AS (
         |  SELECT *, $prodSel FROM z),
         |ps AS (
         |  SELECT *, $splitSel FROM p),
         |acc AS (
         |  SELECT *, $accSel FROM ps),
         |${u256CarryChain("acc", maxK, "1000000000")}""".stripMargin
    (ctes, u256RenderFrom(maxK, 9), s"c$maxK")
  }

  /** q41 post-aggregation conversion: expects `g(…, n, s0..s3)` where
    * s_i = Σ w_i (HUGEINT) and w0 is the MOST significant 64-bit word;
    * yields `c{maxK}` with base-10^18 limbs v0..v{maxK}.
    */
  private lazy val (u256DeferredCtes: String, u256DeferredRender: String, u256DeferredLast: String) = {
    val B18s = "1000000000000000000"
    val B18 = BigInt(10).pow(18)
    // S_i = a_i·10^18 + b_i; value = Σ S_i·2^(64(3-i)); constant limbs:
    val terms = scala.collection.mutable.SortedMap.empty[Int, Vector[String]].withDefaultValue(Vector())
    for {
      i <- 0 to 3
      (lv, k) <- u256Pow2Limbs(64 * (3 - i), B18).zipWithIndex
      if lv > 0
    } {
      terms(k) = terms(k) :+ s"b$i*$lv"       // b_i < 10^18, product < 10^36: HUGEINT-safe
      terms(k + 1) = terms(k + 1) :+ s"a$i*$lv" // a_i ≤ n·2^64/10^18, tiny
    }
    val maxK = terms.keys.max
    val uSel = terms.map { case (k, ts) => s"(${ts.mkString(" + ")}) AS u$k" }.mkString(",\n    ")
    val split = (0 to 3)
      .map(i => s"s$i // $B18s AS a$i, s$i % $B18s AS b$i")
      .mkString(",\n            ")
    val ctes =
      s"""g2 AS (
         |  SELECT *, $split FROM g),
         |u AS (
         |  SELECT *, $uSel FROM g2),
         |${u256CarryChain("u", maxK, B18s)}""".stripMargin
    (ctes, u256RenderFrom(maxK, 18), s"c$maxK")
  }


  val defs: Seq[Q] = Seq(

    Q("q01_scan_prune",
      "S-4 scan + column pruning + predicate pushdown: both must reach the parquet reader.",
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |WHERE l_extendedprice > 5000 ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .filter($"l_extendedprice" > 5000)),

    Q("q02_group_agg",
      "O-17 grouped multi-aggregate (sum + count), partial+final hash agg.",
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_qty,
             |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          decStr(sum(dec6($"l_quantity"))).as("sum_qty"),
          decStr(sum(revenue)).as("revenue"),
          count(lit(1)).as("n"))),

    Q("q03_join_fact",
      "J-1 fact-to-fact inner equi-join (events⋈blocks shape) + rollup.",
      Some("""SELECT o_orderstatus,
             |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue,
             |  count(*) AS n
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderstatus")
        .agg(
          decStr(sum(revenue)).as("revenue"),
          count(lit(1)).as("n"))),

    Q("q04_double_dim_join",
      "J-2 same dimension joined twice under different keys (token t0/t1 shape); dims broadcast.",
      Some("""SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
             |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue,
             |  count(*) AS n
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |GROUP BY n1.n_name, n2.n_name ORDER BY cust_nation, supp_nation""".stripMargin),
      (s, d) => {
        val n1 = Tables.nation(s, d).select(
          $"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
        val n2 = Tables.nation(s, d).select(
          $"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(n1), $"c_nationkey" === $"c_nk")
          .join(broadcast(n2), $"s_nationkey" === $"s_nk")
          .groupBy($"cust_nation", $"supp_nation")
          .agg(
            decStr(sum(revenue)).as("revenue"),
            count(lit(1)).as("n"))
      }),

    Q("q05_topk",
      "T-2 top-K by metric: plans as TakeOrderedAndProject (per-partition heaps, no global sort).",
      Some("""SELECT l_partkey, CAST(revenue AS VARCHAR) AS revenue FROM (
             |  SELECT l_partkey,
             |    CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS revenue
             |  FROM lineitem GROUP BY l_partkey
             |  ORDER BY revenue DESC, l_partkey LIMIT 30) t""".stripMargin),
      (s, d) => Ranks.topK(
        Tables.lineitem(s, d)
          .groupBy($"l_partkey")
          .agg(sum(revenue).cast(DecimalType(38, 6)).as("revenue")),
        30, col("revenue").desc, col("l_partkey"))
        // rank on the decimal, canonicalize after the limit
        .select($"l_partkey", decStr($"revenue").as("revenue"))),

    Q("q06_distinct",
      "O-19 DISTINCT projection (hash aggregate, partial map-side).",
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_linestatus").distinct()),

    Q("q07_union_unpivot",
      "U-1 UNION ALL unpivot of two key columns into one (token_0/token_1 shape).",
      Some("""SELECT key, count(*) AS n FROM (
             |  SELECT l_partkey AS key FROM lineitem
             |  UNION ALL SELECT l_suppkey AS key FROM lineitem) t
             |GROUP BY key ORDER BY key""".stripMargin),
      (s, d) => SetOps.unpivotUnion(Tables.lineitem(s, d), "key", "l_partkey", "l_suppkey")
        .groupBy($"key").agg(count(lit(1)).as("n"))),

    Q("q08_dedup_last_write",
      "O-21 ReplacingMergeTree + OPTIMIZE FINAL: keyed last-write-wins dedup via row_number window.",
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |  FROM orders) t
             |WHERE rn = 1 ORDER BY o_custkey""".stripMargin),
      (s, d) => Dedup.lastWriteWins(
          Tables.orders(s, d), Seq("o_custkey"),
          Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")),

    Q("q09_json_extract",
      "P-1/P-2 JSON payload extraction (JSONExtract shape) + grouped sum.",
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => Tables.events(s, d)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(sum($"k").cast("long").as("sum_k"), count(lit(1)).as("n"))),

    Q("q10_time_window",
      "P-4 trailing-24h filter with 'now' pinned to max(ts) for determinism.",
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS val_24h
             |FROM events
             |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 DAY
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val mx = ev.agg(max($"ts").as("mx"))
        ev.crossJoin(broadcast(mx))
          .filter($"ts" >= $"mx" - expr("INTERVAL 1 DAY"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            decStr(sum(dec6($"value"))).as("val_24h"))
      }),

    Q("q11_hex_to_decimal",
      "P-5 uint256-range hex→decimal via the custom HexToDecimal Catalyst expression (>64-bit; conv() would saturate).",
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(CAST(CAST(l_orderkey AS HUGEINT) * CAST('18446744073709551616' AS HUGEINT)
             |       + CAST(l_partkey AS HUGEINT) AS DECIMAL(38,0)) AS VARCHAR) AS amount
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber",
          hex_to_decimal(concat(lit("0x"), lower(hex($"l_orderkey")),
            lpad(lower(hex($"l_partkey")), 16, "0"))).cast("string").as("amount"))),

    Q("q12_pair_key",
      "P-9 canonical order-insensitive pair key ('/'.join(sorted([a,b]))).",
      Some("""SELECT CASE WHEN l_returnflag <= l_linestatus
             |            THEN l_returnflag || '/' || l_linestatus
             |            ELSE l_linestatus || '/' || l_returnflag END AS pair,
             |  count(*) AS n,
             |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS amt
             |FROM lineitem GROUP BY 1 ORDER BY pair""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .withColumn("pair", pair_key($"l_returnflag", $"l_linestatus"))
        .groupBy($"pair")
        .agg(count(lit(1)).as("n"),
          decStr(sum(dec6($"l_extendedprice"))).as("amt"))),

    Q("q13_pad_address",
      "P-10 zero-pad normalize to 0x + 64 hex digits.",
      Some("""SELECT p_partkey, '0x' || lpad(lower(to_hex(p_partkey)), 64, '0') AS addr
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, d) => Tables.part(s, d)
        .select($"p_partkey", pad_address(lower(hex($"p_partkey"))).as("addr"))),

    Q("q14_conditional_fill",
      "P-6 conditional column + P-11 null default fill + P-7 inequality filter.",
      Some("""SELECT c_custkey,
             |  CASE WHEN c_acctbal < 0 THEN CAST(0.0 AS DOUBLE) ELSE c_acctbal END AS bal,
             |  coalesce(c_mktsegment, 'No Segment') AS segment
             |FROM customer
             |WHERE (CASE WHEN c_acctbal < 0 THEN CAST(0.0 AS DOUBLE) ELSE c_acctbal END) != 0.0
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .select($"c_custkey",
          when($"c_acctbal" < 0, lit(0.0)).otherwise($"c_acctbal").as("bal"),
          coalesce($"c_mktsegment", lit("No Segment")).as("segment"))
        .filter($"bal" =!= 0.0)),

    Q("q15_swap_steps",
      "O-18 group→nested array-of-structs (parse_data.py swap_steps shape), serialized to a canonical string " +
        "in the last projection (round-2: the driver's row-sort dies on array cells, and the string form " +
        "upgrades this from rows-only to a full hash check; q32 keeps the posexplode-verified flat twin).",
      Some("""SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_steps,
             |  string_agg(l_linenumber || ':' || l_partkey || ':' || CAST(floor(l_quantity) AS BIGINT), '|'
             |             ORDER BY l_linenumber, l_partkey, l_quantity) AS steps
             |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(
          sort_array(collect_list(struct($"l_linenumber", $"l_partkey", $"l_quantity")))
            .as("steps"),
          count(lit(1)).as("n_steps"))
        .select($"l_orderkey", $"n_steps",
          // explicit floor() on BOTH sides: a bare long cast truncates in
          // Spark but rounds half-away in DuckDB — identical only while
          // l_quantity stays integral-valued
          concat_ws("|", transform($"steps", st => concat_ws(":",
            st.getField("l_linenumber"), st.getField("l_partkey"),
            floor(st.getField("l_quantity")).cast("long")))).as("steps"))),

    Q("q32_swap_steps_flat",
      "O-18 verified: build the nested swap_steps array, then re-flatten via posexplode — array ordering and completeness hash-checked against the window formulation.",
      Some("""SELECT l_orderkey,
             |  CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_steps,
             |  CAST(row_number() OVER (PARTITION BY l_orderkey
             |       ORDER BY l_linenumber, l_partkey, l_quantity) AS INT) AS step_pos,
             |  l_linenumber, l_partkey, l_quantity
             |FROM lineitem ORDER BY l_orderkey, step_pos""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_list(struct($"l_linenumber", $"l_partkey", $"l_quantity")))
          .as("steps"))
        .select($"l_orderkey", size($"steps").cast("long").as("n_steps"),
          posexplode($"steps"))
        .select($"l_orderkey", $"n_steps", ($"pos" + 1).cast("int").as("step_pos"),
          $"col.l_linenumber".as("l_linenumber"), $"col.l_partkey".as("l_partkey"),
          $"col.l_quantity".as("l_quantity"))),

    Q("q33_epoch_cast",
      "P-3 epoch-seconds -> timestamp cast (toDateTime shape): round-trip through unix seconds = second-truncation.",
      Some("""SELECT event_id, date_trunc('second', ts) AS ts_sec
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => Tables.events(s, d)
        .select($"event_id",
          timestamp_seconds(unix_timestamp($"ts")).cast("timestamp_ntz").as("ts_sec"))),

    Q("q16_watermark",
      "O-16 incremental watermark scalar: coalesce(max(offset), origin-1) + 1.",
      Some("""SELECT CAST(coalesce(max(event_id), 999999) + 1 AS BIGINT) AS next_from
             |FROM events""".stripMargin),
      (s, d) => Tables.events(s, d)
        .agg((coalesce(max($"event_id"), lit(999999L)) + 1).cast("long").as("next_from"))),

    Q("q17_global_sort",
      "T-1 global ORDER BY DESC (range-partitioned sort) with deterministic tie-break.",
      Some("""SELECT event_id, value FROM events
             |ORDER BY value DESC, event_id LIMIT 100""".stripMargin),
      (s, d) => Tables.events(s, d)
        .select($"event_id", $"value")
        .orderBy($"value".desc, $"event_id")
        .limit(100)),

    Q("q18_report_pairs",
      "Flagship §3.2 report: 24h window → JSON k → broadcast dim join → pair key → agg → top-30.",
      Some("""WITH e AS (
             |  SELECT event_type, value, user_id,
             |         CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
             |  FROM events
             |  WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 DAY),
             |j AS (
             |  SELECT CASE WHEN event_type <= seg THEN event_type || '/' || seg
             |              ELSE seg || '/' || event_type END AS pair,
             |         CAST(value * k AS DECIMAL(38,6)) AS vol
             |  FROM (SELECT e.*, coalesce(c_mktsegment, 'No Segment') AS seg
             |        FROM e LEFT JOIN customer ON user_id = c_custkey) t)
             |SELECT pair, CAST(vol_24h AS VARCHAR) AS vol_24h, txn_24h FROM (
             |  SELECT pair, CAST(SUM(vol) AS DECIMAL(38,6)) AS vol_24h, count(*) AS txn_24h
             |  FROM j GROUP BY pair ORDER BY vol_24h DESC, pair LIMIT 30) r""".stripMargin),
      (s, d) => Report.topPairs(s, d)
        // rank on the decimal inside topPairs, canonicalize after
        .select($"pair", decStr($"vol_24h").as("vol_24h"), $"txn_24h")),

    Q("q19_reingest_dedup",
      "K-2 at-least-once re-ingest collapsed by last-write-wins dedup; oracle = single clean copy.",
      Some("""SELECT event_type, count(*) AS n FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        // prune to the columns the downstream needs BEFORE the dedup
        // shuffle — full-row dedup pays for every byte it carries
        val slim = ev.select($"event_id", $"event_type")
        val redelivered = slim.withColumn("ingest_seq", lit(1L))
          .unionAll(slim.withColumn("ingest_seq", lit(2L)))
        // max_by aggregate plan (no window sort; map-side partials)
        Dedup.lastWriteWinsAgg(redelivered, Seq("event_id"), Seq(col("ingest_seq")))
          .groupBy($"event_type").agg(count(lit(1)).as("n"))
      }),

    Q("q20_anti_join",
      "left_anti: keys missing from the dimension ('tokens not yet scraped' shape).",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")),

    Q("q21_semi_join",
      "left_semi: EXISTS probe without row multiplication.",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")),

    Q("q23_token_backfill",
      "Entry-point-D shape (crawl_token): unpivot → distinct → anti-join dim → default fill.",
      Some("""WITH toks AS (SELECT DISTINCT key FROM (
             |  SELECT l_partkey AS key FROM lineitem
             |  UNION ALL SELECT l_suppkey AS key FROM lineitem) t)
             |SELECT key AS token, 'No Name' AS name, 'No Symbol' AS symbol, 0 AS decimals
             |FROM toks WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = key)
             |ORDER BY token""".stripMargin),
      (s, d) => graft.pipeline.TokenBackfill.withDefaults(
          graft.pipeline.TokenBackfill.missingKeys(
            Tables.lineitem(s, d), Seq("l_partkey", "l_suppkey"),
            Tables.supplier(s, d), "s_suppkey"))),

    Q("q27_asof_join",
      "As-of backward join (operator Spark lacks; union+window composition, one shuffle). Oracle: DuckDB native ASOF JOIN.",
      Some("""SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
             |FROM events e ASOF JOIN orders o
             |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
             |ORDER BY e.event_id""".stripMargin),
      (s, d) => graft.operators.AsOf.joinInner(
          Tables.events(s, d), Tables.orders(s, d),
          "user_id", "o_custkey", "ts", "o_orderdate")
        .select($"event_id", $"user_id", $"right_o_orderdate".as("last_order_date"))),

    Q("q28_pivot",
      "Pivot event_type counts per user (conditional-aggregate form both sides).",
      Some("""SELECT user_id,
             |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
             |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
             |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => Tables.events(s, d)
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase"))
        .select($"user_id", $"click".as("n_click"), $"view".as("n_view"),
          $"purchase".as("n_purchase"))),

    Q("q29_rollup",
      "ROLLUP subtotal hierarchy over (returnflag, linestatus).",
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          decStr(sum(dec6($"l_quantity"))).as("qty"))),

    Q("q30_except",
      "EXCEPT (set difference, distinct semantics) over key domains.",
      Some("""SELECT l_partkey AS key FROM lineitem
             |EXCEPT SELECT l_suppkey FROM lineitem ORDER BY key""".stripMargin),
      (s, d) => Tables.lineitem(s, d).select($"l_partkey".as("key"))
        .except(Tables.lineitem(s, d).select($"l_suppkey".as("key")))),

    Q("q31_intersect",
      "INTERSECT (distinct semantics) over key domains.",
      Some("""SELECT l_partkey AS key FROM lineitem
             |INTERSECT SELECT l_suppkey FROM lineitem ORDER BY key""".stripMargin),
      (s, d) => Tables.lineitem(s, d).select($"l_partkey".as("key"))
        .intersect(Tables.lineitem(s, d).select($"l_suppkey".as("key")))),

    Q("q26_count_distinct",
      "Exact distinct-aggregate per group (beyond reference parity; expand-based two-phase plan).",
      Some("""SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => Tables.events(s, d)
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users"), count(lit(1)).as("n"))),

    Q("x13_approx_distinct",
      "HLL++ approximate distinct (sketch aggregate — constant memory per group at any scale), oracled via its " +
        "error contract: output carries the exact count plus hll_ok = |approx-exact| <= 5%*exact (rsd 0.01), " +
        "so the hash check asserts the sketch actually met its bound.",
      Some("""SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
             |  count(*) AS n, CAST(1 AS INT) AS hll_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        // exact and sketch in SEPARATE aggregates joined on the tiny group
        // key: mixing countDistinct with approx_count_distinct in one agg
        // plans an Expand (every row duplicated per distinct-clause) and
        // drags the 1%-rsd HLL buffers through the distinct shuffle —
        // measured 1.8 s vs 0.8 s for this split at sf0.1
        val ev = Tables.events(s, d)
        val exact = ev.groupBy($"event_type")
          .agg(countDistinct($"user_id").as("n_users_exact"), count(lit(1)).as("n"))
        val approx = ev.groupBy($"event_type".as("event_type_a"))
          .agg(approx_count_distinct($"user_id", 0.01).as("approx"))
        // null-safe equality: groupBy keeps a NULL group (both engines),
        // and a plain equi-join would silently drop it (round-4 review)
        exact.join(approx, $"event_type" <=> $"event_type_a")
          .select($"event_type", $"n_users_exact", $"n",
            (abs($"approx" - $"n_users_exact") <= $"n_users_exact" * 0.05)
              .cast("int").as("hll_ok"))
      }),

    Q("q25_sessionize",
      "Session windows (30-min inactivity gap) per user — gap-based stateful windowing, batch twin of the streaming sessionizer.",
      Some("""WITH g AS (
             |  SELECT user_id,
             |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
             |  FROM events)
             |SELECT user_id, CAST(1 + SUM(brk) AS BIGINT) AS n_sessions
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => Tables.events(s, d)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"))),

    Q("q24_json_stringify",
      "K-4 JSON-stringify list column before load (to_json of a collected array).",
      Some("""SELECT user_id, to_json(list_sort(list(DISTINCT event_type))) AS types_json
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => Tables.events(s, d)
        .groupBy($"user_id")
        .agg(to_json(sort_array(collect_set($"event_type"))).as("types_json"))),

    Q("q22_hourly_rollup",
      "Tumbling 1h event-time window (batch twin of the streaming agg in graft.streaming).",
      Some("""SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS n,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS val
             |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin),
      (s, d) => Tables.events(s, d)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          decStr(sum(dec6($"value"))).as("val"))
        // cast LTZ→NTZ (identity under the UTC session tz) so the parquet
        // annotation matches the oracle's naive TIMESTAMP
        .select($"window.start".cast("timestamp_ntz").as("hour_start"),
          $"event_type", $"n", $"val")),

    Q("q46_sliding_window",
      "Sliding event-time window (2h duration, 1h slide): each event lands in exactly two overlapping " +
        "windows — completes the window family (q22 tumbling, q25 session). Spark plans one Expand " +
        "(2 rows/event) + hash agg; the oracle replays the window-grid membership as a 2-arm UNION ALL.",
      Some("""WITH arms AS (
             |  SELECT date_trunc('hour', ts) AS w_start, event_type, value FROM events
             |  UNION ALL
             |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM events)
             |SELECT w_start, w_start + INTERVAL 2 HOUR AS w_end, event_type, count(*) AS n,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS val
             |FROM arms GROUP BY 1, 2, 3""".stripMargin),
      (s, d) => Tables.events(s, d)
        .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          decStr(sum(dec6($"value"))).as("val"))
        .select($"window.start".cast("timestamp_ntz").as("w_start"),
          $"window.end".cast("timestamp_ntz").as("w_end"),
          $"event_type", $"n", $"val")),

    Q("q48_range_frame",
      "RANGE interval window frame — rolling trailing-24h sum per user (SURVEY §2.8's rolling-volume " +
        "example; the frame type q34's ROWS family does not cover). Ordered on exact integer " +
        "microseconds and summed in decimal, so every running value hash-matches; value-defined frames " +
        "make equal-timestamp peers share a frame deterministically.",
      Some("""SELECT event_id, user_id,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             |    PARTITION BY user_id ORDER BY epoch_us(ts)
             |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS VARCHAR) AS vol_24h
             |FROM events""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
          .rangeBetween(-86400000000L, Window.currentRow)
        Tables.events(s, d).select($"event_id", $"user_id",
          decStr(sum(dec6($"value")).over(w)).as("vol_24h"))
      }),

    Q("q34_window_funcs",
      "Window-function family over per-user event streams: row_number / lag / lead / rank / ntile + " +
        "running decimal sum (explicit ROWS frame; unique (ts, event_id) ordering keeps every rank deterministic).",
      Some("""SELECT event_id, user_id,
             |  CAST(row_number() OVER w AS INT) AS rn,
             |  lag(event_id) OVER w AS prev_id,
             |  lead(event_id) OVER w AS next_id,
             |  CAST(rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INT) AS type_rank,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS VARCHAR) AS run_val
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val wt = Window.partitionBy($"user_id").orderBy($"event_type")
        Tables.events(s, d).select(
          $"event_id", $"user_id",
          row_number().over(w).as("rn"),
          lag($"event_id", 1).over(w).as("prev_id"),
          lead($"event_id", 1).over(w).as("next_id"),
          rank().over(wt).as("type_rank"),
          ntile(4).over(w).as("quartile"),
          decStr(sum(dec6($"value"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .as("run_val"))
      }),

    Q("q35_range_join",
      "Range (interval) join via bucketed candidate generation + exact filter (operators.RangeJoin — " +
        "no nested loop, one (key, bucket) hash shuffle): same-user orders in the trailing 7 days of each event.",
      Some("""SELECT e.event_id, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders_7d
             |FROM events e LEFT JOIN orders o
             |  ON o.o_custkey = e.user_id
             | AND CAST(o.o_orderdate AS DATE) BETWEEN CAST(e.ts AS DATE) - 7 AND CAST(e.ts AS DATE)
             |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d).select($"event_id", $"user_id",
          unix_date(to_date($"ts")).cast("long").as("day"))
        val ords = Tables.orders(s, d).select($"o_custkey", $"o_orderkey",
          unix_date(to_date($"o_orderdate")).cast("long").as("o_day"))
          .withColumn("lo", $"o_day")
          .withColumn("hi", $"o_day" + 7)
        RangeJoin.countInRange(ev, ords, "event_id", "user_id", "o_custkey",
            "day", "lo", "hi", bucketWidth = 8)
          .select($"event_id", $"n_matches".as("n_orders_7d"))
      }),

    // q36_salted_join (blanket salt, every key split across 8 reducers)
    // was registered through round 4 as the measured contrast for q43;
    // demoted to library-only in round 5 (round-4 VERDICT: the registry
    // should hold plans you would ship, and blanket salting pays nSalts×
    // dim replication on EVERY key — SCALING.md keeps the 13.1s-vs-2.7s
    // ×10 contrast). The operator (Salt.saltedJoin) remains: it is the
    // hot-slice primitive inside skewAwareJoin and is property-tested
    // row-identical to the plain join in RangeJoinSpec.

    Q("q43_skew_join",
      "Skew-AWARE salted join: sampled Misra-Gries hot-key detection (2% Bernoulli, seeded) bounds dim " +
        "replication to the hot slice; cold keys take the plain join. Row-identical to the plain join " +
        "regardless of which keys the sample flags, so the oracle IS the plain join.",
      Some("""SELECT o_orderstatus,
             |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue,
             |  count(*) AS n
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      (s, d) => Salt.skewAwareJoin(Tables.lineitem(s, d), Tables.orders(s, d),
          "l_orderkey", "o_orderkey", col("l_linenumber"), 8)
        .groupBy($"o_orderstatus")
        .agg(decStr(sum(revenue)).as("revenue"), count(lit(1)).as("n"))),

    Q("q44_bloom_join",
      "Bloom semi-join reduction: fact rows probe a distributed-built bloom of the (predicate-filtered) " +
        "dim key set before the shuffle — only (selectivity+fpp) of the fact table moves. Row-identical " +
        "to the plain join (the join re-checks equality), so the oracle IS the plain join.",
      Some("""SELECT o_orderpriority,
             |  CAST(CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue,
             |  count(*) AS n
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY o_orderpriority""".stripMargin),
      (s, d) => Prefilter.bloomPrefilteredJoin(
          Tables.lineitem(s, d),
          Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT"),
          "l_orderkey", "o_orderkey", expectedKeys = 100000)
        .groupBy($"o_orderpriority")
        .agg(decStr(sum(revenue)).as("revenue"), count(lit(1)).as("n"))),

    Q("q38_full_outer",
      "Full outer join over partially-overlapping key domains (customer-only / both / part-only rows all " +
        "populated) — the join type snapshot reconciliation diffs use; completes the join-type inventory.",
      Some("""SELECT coalesce(c_custkey, p_partkey) AS k,
             |  CAST(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END AS INT) AS has_cust,
             |  CAST(CASE WHEN p_partkey IS NOT NULL THEN 1 ELSE 0 END AS INT) AS has_part
             |FROM customer FULL OUTER JOIN (SELECT p_partkey FROM part WHERE p_partkey % 2 = 0) p
             |  ON c_custkey = p_partkey""".stripMargin),
      (s, d) => Tables.customer(s, d).select($"c_custkey")
        .join(Tables.part(s, d).select($"p_partkey")
            .filter(pmod($"p_partkey", lit(2)) === 0),
          $"c_custkey" === $"p_partkey", "full_outer")
        .select(coalesce($"c_custkey", $"p_partkey").as("k"),
          $"c_custkey".isNotNull.cast("int").as("has_cust"),
          $"p_partkey".isNotNull.cast("int").as("has_part"))),

    Q("q39_scd2_intervals",
      "SCD-2 dimension versioning (operators.Scd): keyed snapshots → [valid_from, valid_to) intervals " +
        "with a current-version flag; pairs with the as-of join for temporal lookups.",
      Some("""SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
             |  lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
             |  CAST(CASE WHEN lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |       IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
             |FROM orders""".stripMargin),
      (s, d) => graft.operators.Scd.intervals(
          Tables.orders(s, d).select($"o_custkey", $"o_orderkey", $"o_orderdate"),
          Seq("o_custkey"), "o_orderdate", tieBreak = Seq("o_orderkey"))
        .select($"o_custkey", $"o_orderkey", $"valid_from", $"valid_to", $"is_current")),

    Q("q37_cube",
      "CUBE grouping-set hierarchy over (returnflag, linestatus): all four grouping combinations in one " +
        "Expand pass (completes the q29 ROLLUP family).",
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          decStr(sum(dec6($"l_quantity"))).as("qty"))),

    Q("q45_grouping_sets",
      "Explicit GROUPING SETS ((flag,status),(flag),(status)) — the general Expand form that q29 " +
        "ROLLUP and q37 CUBE specialize, with grouping_id() disambiguating aggregated-away nulls " +
        "from data nulls (same bitmask convention both engines: leftmost column = high bit).",
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |  count(*) AS n,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"), Seq($"l_linestatus")),
          $"l_returnflag", $"l_linestatus")
        .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
          decStr(sum(dec6($"l_quantity"))).as("qty"))),

    Q("q47_correlated_subquery",
      "Correlated scalar subqueries through the SQL surface (orders above their customer's average): " +
        "Catalyst decorrelates both subqueries into aggregate + equi-joins — no per-row re-execution. " +
        "The predicate is exact decimal (price*count > sum), so it is aggregation-order-independent; " +
        "oracle = the identical SQL text in DuckDB. Widths chosen so the product (18,6)×(19,0) stays " +
        "inside 38 digits in BOTH engines — DECIMAL(38,6)*BIGINT would overflow 38 in DuckDB and " +
        "silently fall back to DOUBLE there while Spark stayed exact (round-4 ADVICE).",
      Some("""SELECT o_orderkey, o_custkey,
             |       CAST(CAST(o_totalprice AS DECIMAL(38,6)) AS VARCHAR) AS total
             |FROM orders o
             |WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
             |      CAST((SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS DECIMAL(19,0))
             |    > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6))) FROM orders o3 WHERE o3.o_custkey = o.o_custkey)""".stripMargin),
      (s, d) => {
        graft.GraftSession.registerTables(s, d)
        s.sql("""SELECT o_orderkey, o_custkey,
                |       CAST(CAST(o_totalprice AS DECIMAL(38,6)) AS STRING) AS total
                |FROM orders o
                |WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
                |      CAST((SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS DECIMAL(19,0))
                |    > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6))) FROM orders o3 WHERE o3.o_custkey = o.o_custkey)""".stripMargin)
      }),

    Q("q49_nullsafe_join",
      "Null-safe equi-join (<=> / IS NOT DISTINCT FROM): null keys match each other instead of " +
        "dropping — the reconciliation-diff semantics plain equality silently loses. EqualNullSafe is " +
        "a first-class hash-join key in Catalyst, so the plan stays a shuffled/broadcast hash join " +
        "(registry-wide nested-loop audit applies).",
      Some("""WITH a AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
             |          FROM orders),
             |b AS (SELECT CASE WHEN c_custkey % 89 = 0 THEN NULL ELSE c_custkey END AS k
             |      FROM customer)
             |SELECT a.k, count(*) AS n_pairs
             |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
             |GROUP BY a.k""".stripMargin),
      (s, d) => {
        val a = Tables.orders(s, d).select(
          when(pmod($"o_orderkey", lit(97)) === 0, lit(null)).otherwise($"o_custkey").as("k"))
        val b = Tables.customer(s, d).select(
          when(pmod($"c_custkey", lit(89)) === 0, lit(null)).otherwise($"c_custkey").as("kb"))
        a.join(b, $"k" <=> $"kb")
          .groupBy($"k").agg(count(lit(1)).as("n_pairs"))
      }),

    Q("q40_u256_decimal",
      "uint256 past the Decimal(38,0) ceiling (ROADMAP): 64-hex-digit values (md5||md5, deterministic " +
        "256-bit corpus) rendered as exact ≤78-digit decimal strings two ways — the one-pass BigInteger " +
        "kernel (u256_dec) and the base-10^18 limb path (u256_limbs → u256_render) — both hash-checked " +
        "against a DuckDB oracle that re-derives the digits exactly via UHUGEINT halves and limb " +
        "carry arithmetic (no double ever touches the value).",
      Some(s"""WITH src AS (
              |  SELECT l_orderkey, l_linenumber,
              |    md5(CAST(l_orderkey AS VARCHAR)) || md5(CAST(l_partkey AS VARCHAR)) AS h
              |  FROM lineitem),
              |${u256SchoolbookCtes}
              |SELECT l_orderkey, l_linenumber, h AS hex,
              |  ${u256SchoolbookRender} AS dec_str, ${u256SchoolbookRender} AS dec_limb
              |FROM ${u256SchoolbookLast}
              |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => {
        val h = concat(md5($"l_orderkey".cast("string")), md5($"l_partkey".cast("string")))
        // fanned-out scan: the BigInteger parse/render kernels dominate,
        // and a row-group-bound scan would run them on one core
        Tables.loadFanout(s, d, "lineitem")
          .select($"l_orderkey", $"l_linenumber", h.as("hex"))
          .select($"l_orderkey", $"l_linenumber", $"hex",
            u256_dec($"hex").as("dec_str"),
            u256_render_limbs(u256_limbs($"hex")).as("dec_limb"))
      }),

    Q("q41_u256_sum",
      "Grouped EXACT 256-bit sum at Spark-native cost: u256_limbs decomposes each value into five " +
        "base-10^18 limbs, the group-sum is five built-in Decimal(38,0) SUMs (map-side partials, " +
        "whole-stage codegen, exact to ~10^20 rows), and one final carry/render projection emits the " +
        "decimal string — no BigInteger in the aggregation path. Oracle replays the identical limb " +
        "arithmetic in DuckDB HUGEINT (per-row carry-normalized limbs → per-limb sums → final carry).",
      Some(s"""WITH src AS (
              |  SELECT l_returnflag,
              |    md5(CAST(l_orderkey AS VARCHAR)) || md5(CAST(l_partkey AS VARCHAR)) AS h
              |  FROM lineitem),
              |w AS (
              |  SELECT l_returnflag,
              |    CAST(CAST('0x'||substr(h,1,16)  AS UBIGINT) AS HUGEINT) AS w0,
              |    CAST(CAST('0x'||substr(h,17,16) AS UBIGINT) AS HUGEINT) AS w1,
              |    CAST(CAST('0x'||substr(h,33,16) AS UBIGINT) AS HUGEINT) AS w2,
              |    CAST(CAST('0x'||substr(h,49,16) AS UBIGINT) AS HUGEINT) AS w3
              |  FROM src),
              |g AS (
              |  SELECT l_returnflag, count(*) AS n,
              |    sum(w0) AS s0, sum(w1) AS s1, sum(w2) AS s2, sum(w3) AS s3
              |  FROM w GROUP BY l_returnflag),
              |${u256DeferredCtes}
              |SELECT l_returnflag, n, ${u256DeferredRender} AS total
              |FROM ${u256DeferredLast} ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val h = concat(md5($"l_orderkey".cast("string")), md5($"l_partkey".cast("string")))
        // fanned-out scan: limb parse + five decimal partial sums are the
        // cost, all upstream of the 3-group exchange
        Tables.loadFanout(s, d, "lineitem")
          .select($"l_returnflag", u256_limbs(h).as("limbs"))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"), u256_sum_dec($"limbs").as("total"))
      }),

    Q("q42_block_source",
      "DataSourceV2 block-range source (S-2/S-3 as a planner-visible connector): one InputPartition " +
        "per 10k-block RPC slice, block_number bound predicates absorbed by pushFilters and PRUNING " +
        "whole slices before planning (the reference pushing its key filter into the getEvents " +
        "request), column pruning reaching the reader. Deterministic fake rows; oracle re-derives " +
        "them from DuckDB range().",
      Some("""SELECT r AS block_number, printf('0x%x', r * 2654435761) AS block_hash,
             |  1700000000 + r AS block_timestamp
             |FROM range(1005000, 1010000) t(r)""".stripMargin),
      (s, d) => s.read.format("blockrange")
        .option("from", 1000000).option("to", 1009999).option("slice", 2000).load()
        .filter($"block_number" >= 1005000)),

    Q("q50_partition_prune",
      "SURVEY §4 date-partition pruning over a hive-partitioned fact (events re-laid out by " +
        "event_date via Ingest.appendPartitioned — the reference's daily slice landing, " +
        "export_blocks_and_events_dag.py:56-57): a one-week calendar predicate prunes 23 of 30 " +
        "date partitions at planning time (locked in PlanSpec) instead of scanning the fact " +
        "history. Oracle re-derives the same week from the flat events table.",
      Some("""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date, event_type,
             |  count(*) AS n,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR) AS total_value
             |FROM events
             |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => graft.pipeline.Derived.eventsByDate(s, d)
        .filter($"event_date".between(
          lit(java.sql.Date.valueOf("2024-01-08")), lit(java.sql.Date.valueOf("2024-01-14"))))
        .groupBy($"event_date".cast("string").as("event_date"), $"event_type")
        .agg(count(lit(1)).as("n"),
          decStr(sum(dec6($"value"))).as("total_value"))),

    Q("q51_exact_median",
      "EXACT per-group median by rank arithmetic — percentile_cont's float interpolation is " +
        "engine-ambiguous (the interpolation formula is unspecified IEEE association), so the " +
        "median ships as the two middle ORDER STATISTICS: values at ranks (n+1) DIV 2 and " +
        "(n+2) DIV 2 under a deterministic (value, event_id) total order, in Decimal(38,6) — " +
        "equal for odd n, the exact bracketing pair for even n, no division anywhere. One " +
        "window pass (row_number and count share the partition sort) + one group aggregate.",
      Some("""WITH v AS (SELECT user_id, CAST(value AS DECIMAL(38,6)) AS v, event_id FROM events),
             |r AS (SELECT user_id, v,
             |        row_number() OVER (PARTITION BY user_id ORDER BY v ASC NULLS LAST, event_id) AS rn,
             |        count(*) OVER (PARTITION BY user_id) AS n FROM v)
             |SELECT user_id, CAST(n AS BIGINT) AS n,
             |  CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN v END) AS VARCHAR) AS median_lo,
             |  CAST(MIN(CASE WHEN rn = (n + 2) // 2 THEN v END) AS VARCHAR) AS median_hi
             |FROM r GROUP BY user_id, n ORDER BY user_id""".stripMargin),
      (s, d) => {
        // NULLS LAST pinned on BOTH sides: Spark windows default NULLs
        // first ascending, DuckDB defaults them last — a NULL value
        // would silently shift which rows sit at the median ranks
        val w = Window.partitionBy($"user_id")
          .orderBy($"v".asc_nulls_last, $"event_id")
        val wc = Window.partitionBy($"user_id")
        Tables.events(s, d)
          .select($"user_id", dec6($"value").as("v"), $"event_id")
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wc))
          .groupBy($"user_id", $"n")
          .agg(
            min(when($"rn" === expr("(n + 1) DIV 2"), $"v"))
              .cast("string").as("median_lo"),
            min(when($"rn" === expr("(n + 2) DIV 2"), $"v"))
              .cast("string").as("median_hi"))
          .select($"user_id", $"n", $"median_lo", $"median_hi")
      }),

    Q("q52_funnel",
      "Ordered funnel analysis (view -> click -> purchase): per user, the first view, the " +
        "first click STRICTLY AFTER it, the first purchase strictly after that — the " +
        "product-analytics sequence-match operator. Formulated as three filtered min-aggregates " +
        "chained by user-keyed equi-joins (each stage's scan pushes its event_type filter; " +
        "partial min-aggregation shrinks every shuffle to one row per user) — no per-user " +
        "sort, no window, so it scales as three hash aggregates. Exact-microsecond " +
        "timestamps make every MIN deterministic.",
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |v AS (SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
             |      WHERE e.event_type = 'click' GROUP BY e.user_id),
             |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
             |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
             |SELECT u.user_id,
             |  CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3 WHEN c.t_click IS NOT NULL THEN 2
             |            WHEN v.t_view IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage_reached,
             |  v.t_view, c.t_click, p.t_purchase
             |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
             |ORDER BY user_id""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        // each stage is consumed by the next stage AND the final left
        // join; un-pinned, the chain embeds v three times and c twice,
        // each a full events scan + user-keyed shuffle (ScanAudit: 7
        // events scans). The stages are per-user rows AFTER a shuffle —
        // the pin-when-rederivation-crosses-a-shuffle rule — so pin
        // each once: scans drop to the four intrinsic filtered passes.
        val v = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("t_view"))
          .localCheckpoint(false)
        val c = ev.filter($"event_type" === "click").join(v, Seq("user_id"))
          .filter($"ts" > $"t_view")
          .groupBy($"user_id").agg(min($"ts").as("t_click"))
          .localCheckpoint(false)
        val p = ev.filter($"event_type" === "purchase").join(c, Seq("user_id"))
          .filter($"ts" > $"t_click")
          .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
        ev.select($"user_id").distinct()
          .join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select($"user_id",
            when($"t_purchase".isNotNull, 3).when($"t_click".isNotNull, 2)
              .when($"t_view".isNotNull, 1).otherwise(0)
              .cast("int").as("stage_reached"),
            $"t_view".cast("timestamp_ntz").as("t_view"),
            $"t_click".cast("timestamp_ntz").as("t_click"),
            $"t_purchase".cast("timestamp_ntz").as("t_purchase"))
      }),

    Q("q53_volume_anomaly",
      "Ingest volume anomaly flags — the monitoring query an ETL owner runs over their own " +
        "landing tables (the reference logs per-batch elapsed/volume; this is that signal as " +
        "data): hourly event counts per type against the type's exact rank-median hour, " +
        "flagged when an hour carries at least double the median. DIVISION-FREE: the spike " +
        "predicate n >= med_lo + med_hi compares integers (the q51 order statistics summed = " +
        "2x the median), so no float enters. One hourly aggregate, one per-type window over " +
        "the hours frame (hours << events), one broadcast-size median join back.",
      Some("""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS n
             |           FROM events GROUP BY event_type, date_trunc('hour', ts)),
             |r AS (SELECT event_type, hr, n,
             |        row_number() OVER (PARTITION BY event_type ORDER BY n, hr) AS rn,
             |        count(*) OVER (PARTITION BY event_type) AS m FROM h),
             |med AS (SELECT event_type,
             |          MIN(CASE WHEN rn = (m + 1) // 2 THEN n END) AS med_lo,
             |          MIN(CASE WHEN rn = (m + 2) // 2 THEN n END) AS med_hi
             |        FROM r GROUP BY event_type, m)
             |SELECT h.event_type, h.hr, h.n, med.med_lo, med.med_hi,
             |  CAST(CASE WHEN h.n >= med.med_lo + med.med_hi THEN 1 ELSE 0 END AS INT) AS is_spike
             |FROM h JOIN med USING (event_type)
             |ORDER BY event_type, hr""".stripMargin),
      (s, d) => {
        val h = Tables.events(s, d)
          .groupBy($"event_type", date_trunc("hour", $"ts").as("hr"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy($"event_type").orderBy($"n", $"hr")
        val wc = Window.partitionBy($"event_type")
        val med = h
          .withColumn("rn", row_number().over(w))
          .withColumn("m", count(lit(1)).over(wc))
          .groupBy($"event_type", $"m")
          .agg(min(when($"rn" === expr("(m + 1) DIV 2"), $"n")).as("med_lo"),
            min(when($"rn" === expr("(m + 2) DIV 2"), $"n")).as("med_hi"))
          .drop("m")
        h.join(med, Seq("event_type"))
          .select($"event_type", $"hr".cast("timestamp_ntz").as("hr"), $"n",
            $"med_lo", $"med_hi",
            ($"n" >= $"med_lo" + $"med_hi").cast("int").as("is_spike"))
      }),

    Q("q54_window_navigation",
      "The second half of the window-function surface (round-8; q34 covers row_number/lag/lead/" +
        "rank/ntile + ROWS frames): first_value / last_value / nth_value over an explicit running " +
        "frame, dense_rank, and the distribution functions percent_rank / cume_dist rendered as " +
        "exact basis points — (rank-1)*10000 DIV (n-1) and rn*10000 DIV n are integer divisions " +
        "of window ranks, so the whole family hash-matches without any float crossing engines " +
        "(the unique (ts, event_id) ordering makes row_number the peer-inclusive cume count; " +
        "single-row partitions pin percent_rank to 0, the SQL-standard value).",
      Some("""SELECT event_id, user_id,
             |  first_value(event_id) OVER w AS first_id,
             |  last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_so_far,
             |  nth_value(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_id,
             |  CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INT) AS type_drank,
             |  CAST(CASE WHEN count(*) OVER p > 1
             |    THEN (rank() OVER w - 1) * 10000 // (count(*) OVER p - 1)
             |    ELSE 0 END AS BIGINT) AS pct_rank_bp,
             |  CAST(row_number() OVER w * 10000 // count(*) OVER p AS BIGINT) AS cume_dist_bp
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             |       p AS (PARTITION BY user_id)
             |ORDER BY event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.partitionBy($"user_id").orderBy($"event_type")
        Tables.events(s, d).select(
          $"event_id", $"user_id",
          first($"event_id").over(w).as("first_id"),
          last($"event_id").over(wRun).as("last_so_far"),
          nth_value($"event_id", 2).over(wRun).as("second_id"),
          dense_rank().over(wt).as("type_drank"),
          expr("CAST(CASE WHEN count(*) OVER (PARTITION BY user_id) > 1 " +
            "THEN (rank() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) * 10000 " +
            "DIV (count(*) OVER (PARTITION BY user_id) - 1) ELSE 0 END AS BIGINT)")
            .as("pct_rank_bp"),
          expr("CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) * 10000 " +
            "DIV count(*) OVER (PARTITION BY user_id) AS BIGINT)").as("cume_dist_bp"))
      }))



  // $"..." interpolator without a session-bound implicits import.
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
