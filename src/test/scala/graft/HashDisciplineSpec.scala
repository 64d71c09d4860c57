package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical hash-discipline gate (the round-7 verdict's #2): the
  * driver's correctness checker hashes every output column, and seven
  * rounds of evidence say only exact-integer BIGINT columns never flake
  * across DuckDB versions — DOUBLEs survive only until the driver's
  * ROUND(x, n) implementation shifts, and wide DECIMALs (38,x) are
  * serialization-sensitive 16-byte values. So: no query output may carry
  * a FloatType/DoubleType column, nor a DecimalType wider than 18
  * digits, and every remaining DecimalType column must be on the
  * explicit allowlist below (reserved for values produced by EXACT
  * decimal arithmetic — money sums of parquet DECIMAL inputs — never by
  * rounding a double).
  *
  * Schemas are computed by building each query's DataFrame at sf0.001
  * (plan construction only — driver-iterative queries run their bounded
  * training loops, which is why this shares PlanBudgetSpec's SF).
  */
class HashDisciplineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** (query, column) pairs allowed to stay DecimalType: each must be the
    * result of exact decimal arithmetic over exact decimal inputs (sums /
    * products of parquet DECIMAL columns), never a rounded double.
    */
  private val decimalAllowlist: Set[(String, String)] = Set(
  )

  private def violations(name: String, schema: StructType): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          Seq(s"$name.${f.name}: ${f.dataType.simpleString} (floats never cross the hash)")
        case d: DecimalType if d.precision > 18 =>
          Seq(s"$name.${f.name}: ${d.simpleString} (wide decimal — the q122 flaky class)")
        case _: DecimalType if !decimalAllowlist((name, f.name)) =>
          Seq(s"$name.${f.name}: ${f.dataType.simpleString} (decimal not on exact-arithmetic allowlist)")
        case _ => Seq.empty
      }
    }

  test("no query output carries a float or non-allowlisted decimal across the driver hash") {
    val bad = SparkEntry.allDefs.flatMap { q =>
      violations(q.name, q.fn(spark, sfDir).schema)
    }
    assert(bad.isEmpty, s"\nhash-discipline violations:\n${bad.mkString("\n")}\n")
  }

  test("allowlist carries no stale entries") {
    val names = SparkEntry.allDefs.map(_.name).toSet
    val stale = decimalAllowlist.filterNot { case (q, _) => names(q) }
    assert(stale.isEmpty, s"stale allowlist entries: $stale")
  }
}
