package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed last-write-wins deduplication — the Spark rendering of
  * ClickHouse `ReplacingMergeTree` + `OPTIMIZE TABLE FINAL`
  * (reference: clickhouse.py:41-46,59-60; SURVEY §2 O-21).
  *
  * Scale notes: one hash-partitioned shuffle on the key columns; the
  * window is evaluated per key-group with no global sort. At 100 TB the
  * shuffle is unavoidable (same as ClickHouse's merge), but AQE coalesces
  * post-shuffle partitions and skewed keys split automatically.
  */
object Dedup {
  /** Keep exactly one row per `keys`, the first under `ordering`
    * (descending ingest sequence = "latest insert wins").
    */
  def lastWriteWins(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Any-winner dedup by key — cheaper (partial aggregation map-side)
    * when which duplicate survives does not matter.
    */
  def anyWinner(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Last-write-wins as a hash aggregate (`max_by` of the full row under
    * an ordering struct) instead of a row_number window. Same semantics
    * when the ordering is total per key (an ingest sequence is); at scale
    * this is the better plan — no per-partition sort, map-side partial
    * aggregation shrinks the shuffle to one row per key per mapper.
    */
  def lastWriteWinsAgg(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val others = df.columns.filterNot(keys.contains)
    val payload = struct(others.toIndexedSeq.map(col): _*)
    val ordering = struct(orderCols: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ordering).as("__row"))
      .select(keys.map(col) ++ others.map(c => col(s"__row.$c").as(c)): _*)
  }
}

/** Top-K patterns (SURVEY §2 T-1/T-2). `orderBy(...).limit(k)` plans as
  * `TakeOrderedAndProject`: per-partition heaps + driver merge, never a
  * global sort — the shape that survives a 100× scale-up.
  */
object Ranks {
  def topK(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** Top-K rows per group (row_number window), e.g. K nearest neighbors
    * per query vector.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], k: Int,
      ordering: Seq[Column], rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}

/** Slowly-changing-dimension (type 2) versioning: turn a stream of keyed
  * snapshots into validity intervals — the ETL pattern behind "what did
  * this token's metadata say at the time of the swap" (pairs with
  * [[AsOf]] for the temporal lookup). One window over (key, ts): cost
  * class of a single hash-partitioned sort, O(1) state per row.
  */
object Scd {
  /** Attach [valid_from, valid_to) to each version row: valid_from = its
    * own timestamp, valid_to = the next version's (null = current, also
    * flagged). `tieBreak` orders same-timestamp versions.
    */
  def intervals(df: DataFrame, keys: Seq[String], tsCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(c => col(c).asc): _*)
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }
}

/** Set/unpivot operators (SURVEY §2 U-1). */
object SetOps {
  /** UNION ALL of single-column projections (the reference's
    * `token_0 UNION ALL token_1` unpivot, crawl_token_dag.py:41-45).
    */
  def unpivotUnion(df: DataFrame, outName: String, cols: String*): DataFrame =
    cols.map(c => df.select(col(c).as(outName))).reduce(_ unionAll _)

  /** Same unpivot as a generator (single scan instead of N): explode an
    * array of the columns. Preferred at scale — one pass over the fact.
    */
  def unpivotExplode(df: DataFrame, outName: String, cols: String*): DataFrame =
    df.select(explode(array(cols.map(col): _*)).as(outName))

  /** Spark's native unpivot (melt): id columns stay, value columns fold
    * into (variable, value) rows — the generalized U-1 that also keeps
    * the row identity. Plans as Expand (single scan), same cost class as
    * [[unpivotExplode]] with the source column name preserved.
    */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
      varName: String = "variable", valName: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valName)
}
