package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must inject SQL functions at session build time. Uses
  * its own session (newSession shares the FunctionRegistry state injected
  * at build; extensions apply per-builder).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions injects graft SQL functions") {
    // getOrCreate returns the active session (ignoring extensions), so
    // clear active/default around the build to force a fresh SparkSession
    // over the same SparkContext, then restore.
    val base = SharedSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val got = s.sql(
        """SELECT hmac_sha256('Jefe', 'what do ya want for nothing?') AS sig,
          |dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
          |simhash64(array(CAST(1 AS BIGINT))) AS sh,
          |size(minhash_signature(array(CAST(7 AS BIGINT)), 16)) AS mhk""".stripMargin).head()
      assert(got.getString(0) ===
        "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
      assert(got.getDouble(1) === 11.0)
      assert(got.getLong(2) === 1L)
      assert(got.getInt(3) === 16)
      // misra_gries is an AGGREGATE injection: the analyzer must wrap the
      // bare AggregateFunction the builder returns.
      val mg = s.sql(
        """SELECT misra_gries(k, 2) AS c FROM VALUES ('a'),('a'),('a'),('b') t(k)"""
      ).head().getSeq[String](0)
      assert(mg.contains("a"), s"sketch lost the majority key: $mg")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
