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
  *
  * Cross-engine scalar pitfalls catalogued while writing oracles (each
  * cost a would-be hash mismatch):
  *   - `round()` ties: Spark HALF_UP vs engine-specific — use `floor`
  *     when the code itself is the output (x37 quantization);
  *   - `epoch()` in DuckDB returns fractional DOUBLE seconds; order on
  *     exact integer `unix_micros`/`epoch_us` instead (q48);
  *   - `levenshtein` counts bytes in DuckDB, codepoints in Spark — they
  *     agree only on ASCII (x42 scopes its oracled slice accordingly);
  *   - `log()`/libm functions are not correctly-rounded identically
  *     across engines — reformulate in rational arithmetic (x41 sums
  *     one-division probabilities as decimals instead of log-probs);
  *   - single IEEE double ops (one divide, one multiply) ARE
  *     bit-portable; chains are, too, when both sides use the same
  *     literal association (generated left-associated sums — x06 etc).
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)
