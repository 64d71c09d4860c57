package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Privacy

/** Hand-computed fixtures for the privacy audit family. The shared
  * fixture is three QI classes over sensitive values {a, b, c}:
  *   class X: 4 rows, sources a,a,a,b     (ndv 2)
  *   class Y: 2 rows, sources a,c         (ndv 2)
  *   class Z: 1 row,  source  a           (ndv 1)
  * so N = 7 and the global distribution is a:5/7, b:1/7, c:1/7.
  */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    ("X", "a"), ("X", "a"), ("X", "a"), ("X", "b"),
    ("Y", "a"), ("Y", "c"),
    ("Z", "a"),
  ).toDF("qi", "s")

  test("kAnonymityAudit: classes and rows below k on the hand fixture") {
    val out = Privacy.kAnonymityAudit(fixture, Seq(col("qi")), Seq(2L, 5L))
      .select("k", "n_classes", "n_rows", "classes_below_k", "rows_below_k",
        "rows_below_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // k=2: only Z (1 row) is below; k=5: all three classes (7 rows).
    assert(out === Seq(
      (2L, 3L, 7L, 1L, 1L, 142857L),
      (5L, 3L, 7L, 3L, 7L, 1000000L)))
  }

  test("lDiversityAudit: distinct-sensitive counts are exact per class") {
    val out = Privacy.lDiversityAudit(fixture, Seq(col("qi")), col("s"),
        Seq(2L, 3L))
      .select("l", "n_classes", "n_rows", "classes_below_l", "rows_below_l",
        "rows_below_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // l=2: only Z (ndv 1); l=3: every class (ndv 2,2,1) → all 7 rows.
    assert(out === Seq(
      (2L, 3L, 7L, 1L, 1L, 142857L),
      (3L, 3L, 7L, 3L, 7L, 1000000L)))
  }

  test("tClosenessAudit: exact-fraction TVD matches the by-hand values") {
    // TVD(X) = 8/56 = 1/7 → 142857 ppm; TVD(Y) = 10/28 → 357142 ppm;
    // TVD(Z) = 4/14 → 285714 ppm (each verified against the direct
    // ½·Σ|p_class − p_global| definition in the scaladoc's closed form).
    val out = Privacy.tClosenessAudit(fixture, Seq(col("qi")), col("s"),
        Seq(200000L, 350000L))
      .select("t_ppm", "n_classes", "n_rows", "max_tvd_ppm",
        "classes_above_t", "rows_above_t", "rows_above_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (200000L, 3L, 7L, 357142L, 2L, 3L, 428571L),
      (350000L, 3L, 7L, 357142L, 1L, 2L, 285714L)))
  }

  test("tClosenessAudit: a class mirroring the global distribution scores 0") {
    // Two classes with IDENTICAL sensitive mixes: every per-value fraction
    // equals the global one, so both TVDs are exactly 0 regardless of
    // class size.
    val df = Seq(
      ("P", "a"), ("P", "a"), ("P", "b"),
      ("Q", "a"), ("Q", "a"), ("Q", "b"),
      ("Q", "a"), ("Q", "a"), ("Q", "b"),
    ).toDF("qi", "s")
    val out = Privacy.tClosenessAudit(df, Seq(col("qi")), col("s"), Seq(0L))
      .select("max_tvd_ppm", "classes_above_t")
      .as[(Long, Long)].head()
    assert(out === ((0L, 0L)))
  }
}
