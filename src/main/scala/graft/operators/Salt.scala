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
  * (property-tested in SaltSpec, oracled as q36).
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
    * bounded-state Misra-Gries pass over the fact keys —
    * [[graft.functions.frequent_items]], map-side partial state of
    * `hotCapacity` entries, one tiny shuffle) and salts ONLY the hot
    * slice; everything else takes the plain equi-join. Dim replication
    * drops from nSalts × |dim| to nSalts × |dim ∩ hot| — at 100 TB the
    * difference between "replicate the orders table 32×" and "replicate
    * 16 rows 32×". Misra-Gries returns a guaranteed SUPERSET of keys
    * with frequency > n/capacity (x27's containment contract); spurious
    * candidates only cost harmless extra salting, and which keys are
    * classified hot never changes the joined row set (property: both
    * branches produce exactly the plain join's rows — q43's oracle).
    * NULL fact keys match neither branch's condition, exactly like the
    * plain join. Cost: the fact side is scanned three times (detect,
    * hot-semi, cold-anti) — all map-side against a columnar scan of the
    * key column; the join shuffles dominate at scale.
    */
  def skewAwareJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, discriminator: Column, nSalts: Int,
      hotCapacity: Int = 16): DataFrame = {
    val hotKeys = fact
      .agg(graft.functions.frequent_items(col(factKey).cast("string"), hotCapacity).as("hh"))
      .select(explode(col("hh").getField("item")).as("__hot"))
    def hotSide(df: DataFrame, key: String, joinType: String) =
      df.join(broadcast(hotKeys), col(key).cast("string") === col("__hot"), joinType)
    val hotJoined = saltedJoin(hotSide(fact, factKey, "left_semi"),
      hotSide(dim, dimKey, "left_semi"), factKey, dimKey, discriminator, nSalts)
    val factCold = hotSide(fact, factKey, "left_anti")
    val coldJoined = {
      val j = factCold.join(dim, factCold(factKey) === dim(dimKey))
      if (factKey == dimKey) j.drop(dim(dimKey)) else j
    }
    hotJoined.unionByName(coldJoined)
  }
}
