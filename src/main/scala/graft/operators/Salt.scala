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

  /** @param discriminator any column that varies within the hot key. A
    *   null discriminator would hash every such row to ONE salt and
    *   silently reintroduce the skew, so nulls are folded into a
    *   round-robin-ish spread via a secondary hash of the key itself
    *   spread across all salts (monotonically_increasing_id is not used —
    *   it breaks determinism). Prefer a non-null discriminator.
    * @note `factKey` and `dimKey` may share a name: the join condition is
    *   qualified through the salted/replicated frames, and the dim-side
    *   key is dropped from the output when the names collide (matching
    *   `Seq("k")`-style join output).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, discriminator: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    // spark_partition_id varies within any multi-partition hot key, so a
    // null discriminator degrades to per-partition spreading instead of
    // collapsing onto the single seed-hash salt.
    val spread = coalesce(xxhash64(discriminator),
      xxhash64(col(factKey), spark_partition_id()))
    val salted = fact.withColumn("__salt", pmod(spread, lit(nSalts)).cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    val joined = salted.join(replicated,
        salted(factKey) === replicated(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
    if (factKey == dimKey) joined.drop(replicated(dimKey)) else joined
  }
}
