package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark build function over an sf
  * directory plus (when ANSI-SQL-expressible) the equivalent DuckDB
  * oracle the driver hash-compares against (SURVEY §5.1).
  *
  * Determinism contract for oracled queries:
  *   - every query ends in an ORDER BY over a unique key set;
  *   - no raw double aggregation — doubles are cast per-row to
  *     DECIMAL(38,6) before SUM so accumulation order cannot change bits;
  *   - integer aggregates are cast to BIGINT on the oracle side (DuckDB
  *     promotes integer SUM to HUGEINT);
  *   - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)
