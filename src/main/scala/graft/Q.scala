package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark build function over an sf
  * directory plus (when ANSI-SQL-expressible) the equivalent DuckDB
  * oracle the driver hash-compares against (SURVEY §5.1).
  *
  * Determinism contract for oracled queries:
  *   - row ORDER is not part of the contract: the driver's gate compares
  *     order-insensitively (it row-sorts both sides before hashing —
  *     proven by q05/q17 passing with DESC oracle ordering in round 1).
  *     Spark-side queries therefore carry ORDER BY only where it is
  *     semantic (feeding a LIMIT — top-k selection); a trailing global
  *     sort nobody consumes is pure shuffle+sort cost, exactly the waste
  *     the 100 TB posture forbids. Oracle SQL keeps its ORDER BY (free
  *     at oracle scale, keeps dumps readable);
  *   - row CONTENT is bit-deterministic: no raw double aggregation —
  *     doubles are cast per-row to DECIMAL(38,6) before SUM so
  *     accumulation order cannot change bits; final decimals are
  *     canonicalized to exact fixed-point strings at the last projection;
  *   - integer aggregates are cast to BIGINT on the oracle side (DuckDB
  *     promotes integer SUM to HUGEINT);
  *   - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)
