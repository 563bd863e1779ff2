package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Internal
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction by bloom filter — the join shape for a dim side
  * that is too big to broadcast-join (millions of rows with payload)
  * but whose KEY SET still fits a few megabytes of bloom bits
  * (~1.2 bytes/key at 3% fpp). Probing the bloom before the shuffle
  * drops non-matching fact rows at the scan, so the shuffle moves only
  * (selectivity + fpp) of the fact table instead of all of it — at
  * 100 TB the difference between shuffling terabytes and shuffling the
  * answer.
  *
  * Spark's own `InjectRuntimeFilter` plants the same
  * `BloomFilterAggregate`/`BloomFilterMightContain` pair, but only when
  * its heuristics fire (creation side under
  * `runtime.bloomFilter.creationSideThreshold`, selective filter
  * detected, no shuffle reuse conflict). This operator is the explicit
  * form for when the planner's cost model can't see the selectivity —
  * e.g. a dim filtered by a non-statistical predicate — with the same
  * false-positive transparency: the join itself re-checks equality, so
  * results are row-identical to the plain join (proven by the q44
  * oracle, which IS the plain join).
  *
  * The built bloom is pinned on the driver (one aggregated binary row —
  * same class as the broadcast-pin of hot keys in [[Salt]]) and ships
  * to executors as a plan literal; `BloomFilterMightContain`
  * deserializes it once per task, not per row.
  */
object Prefilter {

  /** numBits for a target false-positive rate: -n·ln(p)/ln(2)². */
  def optimalNumBits(expectedKeys: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    math.ceil(-expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Distributed build of the dim key-set bloom (partial+final typed
    * aggregate; only bloom bits travel, never keys). Keys are probed as
    * xxhash64 longs — mirror [[mightContain]] on the probe side.
    */
  def keyBloom(dim: DataFrame, key: String, expectedKeys: Long,
      fpp: Double = 0.03): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Internal.expression(col(key)))),
      Literal(expectedKeys), Literal(optimalNumBits(expectedKeys, fpp)))
      .toAggregateExpression()
    val row = dim.select(Internal.column(agg).as("bloom")).head()
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** Probe predicate: may return true for a small fpp fraction of
    * absent keys — always re-verify with the real join.
    */
  def mightContain(bloomBits: Array[Byte], key: Column): Column =
    if (bloomBits.isEmpty) lit(false) // empty dim: nothing can match
    else Internal.column(new BloomFilterMightContain(
      Literal(bloomBits, BinaryType),
      new XxHash64(Seq(Internal.expression(key)))))

  /** Inner equi-join with the fact side bloom-prefiltered on the join
    * key. Row-identical to the plain inner join; the bloom only thins
    * the fact scan before the shuffle.
    */
  def bloomPrefilteredJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long, fpp: Double = 0.03): DataFrame = {
    val bits = keyBloom(dim, dimKey, expectedKeys, fpp)
    val thinned = fact.filter(mightContain(bits, fact(factKey)))
    thinned.join(dim, thinned(factKey) === dim(dimKey))
  }
}
