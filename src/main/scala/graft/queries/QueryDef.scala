package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named DataFrame query over a
  * scale-factor directory, plus (when SQL-expressible) the equivalent ANSI
  * SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Contract notes (driver gate):
  *  - Column names must match between the Spark result and the oracle SQL —
  *    alias every computed column identically on both sides.
  *  - Aggregates over doubles are computed through DECIMAL (exact, engine-
  *    order-independent) and cast back to DOUBLE, so both engines produce
  *    bit-identical values regardless of summation order.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
