package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SetOps

/** Entry point D of the reference (SURVEY §3.4, crawl_token_dag.py):
  * discover dimension keys appearing in the fact stream that the
  * dimension table does not know yet, enrich them, and upsert into the
  * dimension — the generic "backfill a scraped dimension" pipeline.
  *
  * Reference chain: CTE projection (P-1/P-2) → UNION ALL unpivot (U-1) →
  * DISTINCT (O-19) → scrape each (S-5, with 'No Name'/'No Symbol'/0
  * defaults, P-11) → ReplacingMergeTree upsert (K-2).
  *
  * Spark chain: explode-unpivot (one scan) → distinct → left_anti against
  * the dim → enrichment join/default fill → append with ingest_seq →
  * compaction. The anti-join replaces the reference's row-loop
  * `pd.isna(symbol)` check; enrichment is a pluggable DataFrame
  * transform (external scraping is out of scope for a zero-egress
  * engine — SURVEY §7.4; semantics = left join + default fill).
  */
object TokenBackfill {

  /** Distinct keys present in the facts but missing from the dimension.
    * The dim key is projected to a reserved name first — the J-2 alias
    * hygiene lesson (SURVEY §7.4): the dim's key may itself be named
    * `token`, which would make the join condition ambiguous.
    */
  def missingKeys(facts: DataFrame, keyCols: Seq[String], dim: DataFrame, dimKey: String): DataFrame =
    SetOps.unpivotExplode(facts, "token", keyCols: _*)
      .distinct()
      .join(dim.select(col(dimKey).as("__dim_key")),
        col("token") === col("__dim_key"), "left_anti")

  /** Default enrichment (the scrape-failure fallback row of the
    * reference: 'No Name'/'No Symbol'/0).
    */
  def withDefaults(missing: DataFrame): DataFrame =
    missing.select(col("token"),
      lit("No Name").as("name"),
      lit("No Symbol").as("symbol"),
      lit(0).as("decimals"))

  /** Enrich missing keys from a lookup source (the scraped/priced
    * details), falling back to defaults where the lookup has no row —
    * the left-join + coalesce rendering of P-13/J-4.
    */
  def enrich(missing: DataFrame, details: DataFrame): DataFrame =
    missing.join(broadcast(details), Seq("token"), "left")
      .select(col("token"),
        coalesce(col("name"), lit("No Name")).as("name"),
        coalesce(col("symbol"), lit("No Symbol")).as("symbol"),
        coalesce(col("decimals"), lit(0)).as("decimals"))

  /** Full backfill: discover → enrich → upsert-append → compact.
    *
    * Single-writer contract (round-2, ADVICE.md): the trailing
    * [[Ingest.compact]] swaps the table via rename(live→bak) then
    * rename(tmp→live), so there is a window where `dimPath` does not
    * exist — run() must not race concurrent readers in other JVMs (a
    * ReportApi on this dim retries via its ReportHandle, but a plain
    * spark.read fails mid-swap). Schedule like the reference schedules
    * its token crawl: one writer, no overlap. Pass `doCompact = false`
    * to defer compaction to a maintenance window; readers then see the
    * appended rows through last-write-wins dedup instead.
    */
  def run(spark: SparkSession, facts: DataFrame, keyCols: Seq[String],
      dimPath: String, details: DataFrame, seq: Long,
      doCompact: Boolean = true): Unit = {
    val dim = spark.read.parquet(dimPath)
    val newRows = enrich(missingKeys(facts, keyCols, dim, "token"), details)
    Ingest.appendWithSeq(newRows, dimPath, seq)
    if (doCompact) Ingest.compact(spark, dimPath, Seq("token"))
  }
}
