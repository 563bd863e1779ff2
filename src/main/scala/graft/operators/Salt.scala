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

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, discriminator: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = fact.withColumn("__salt", pmod(xxhash64(discriminator), lit(nSalts)).cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    salted.join(replicated,
        col(factKey) === col(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
