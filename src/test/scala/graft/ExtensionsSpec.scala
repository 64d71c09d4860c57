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
      // count_min: a depth×width grid whose row sums each equal n — the
      // structural invariant any correct update preserves.
      val cm = s.sql(
        """SELECT count_min(k, 2, 8) AS g FROM VALUES ('a'),('a'),('b') t(k)"""
      ).head().getSeq[Long](0)
      assert(cm.length === 16)
      assert(cm.slice(0, 8).sum === 3L && cm.slice(8, 16).sum === 3L,
        s"row sums must equal n: $cm")
      // GROUP BY parity (SQL ≡ Scala for the injected AGGREGATE): the
      // grouped sketch through spark.sql must equal the column-API
      // aggregate on the same data — exercising the TypedImperativeAggregate
      // through partial/merge under hash aggregation, not just one point
      // call.
      locally {
        import s.implicits._
        val rows = Seq(("x", "a"), ("x", "a"), ("x", "b"), ("y", "c"))
        val viaSql = s.sql(
          """SELECT g, count_min(k, 2, 8) AS grid
            |FROM VALUES ('x','a'),('x','a'),('x','b'),('y','c') t(g, k)
            |GROUP BY g ORDER BY g""".stripMargin)
          .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSeq
        val viaApi = rows.toDF("g", "k").groupBy($"g")
          .agg(graft.functions.CountMin.count_min($"k", 2, 8).as("grid"))
          .orderBy($"g")
          .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSeq
        assert(viaSql === viaApi)
        assert(viaSql.map(_._1) === Seq("x", "y"))
      }
      // hll_registers: the injected HLL aggregate through spark.sql with
      // GROUP BY ≡ the column API (partial/merge exercised, not a point
      // call), and the vector is structurally a register table: 2^p
      // entries, ranks in [0, 61-p], at most |distinct keys| nonzero.
      locally {
        import s.implicits._
        val rows = Seq(("x", "a"), ("x", "a"), ("x", "b"), ("y", "c"))
        val viaSql = s.sql(
          """SELECT g, hll_registers(k, 4) AS regs
            |FROM VALUES ('x','a'),('x','a'),('x','b'),('y','c') t(g, k)
            |GROUP BY g ORDER BY g""".stripMargin)
          .collect().map(r => (r.getString(0), r.getSeq[Int](1))).toSeq
        val viaApi = rows.toDF("g", "k").groupBy($"g")
          .agg(graft.functions.HyperLogLog.hll_registers($"k", 4).as("regs"))
          .orderBy($"g")
          .collect().map(r => (r.getString(0), r.getSeq[Int](1))).toSeq
        assert(viaSql === viaApi)
        viaSql.foreach { case (_, regs) =>
          assert(regs.length === 16 && regs.forall(r => r >= 0 && r <= 57))
        }
        assert(viaSql.head._2.count(_ > 0) <= 2) // 'x' has 2 distinct keys
      }
      // Optimizer-rule injection: a jaro_winkler threshold filter above
      // the 0.8 floor gains the provably-implied length-ratio conjunct...
      import s.implicits._
      // A file source, not a LocalRelation: ConvertToLocalRelation would
      // constant-fold the filter away before the plan can be inspected.
      val pairsPath = java.nio.file.Files
        .createTempDirectory("graft-jw").resolve("pairs").toString
      Seq(
        ("MARTHA", "MARHTA"),      // jw 0.9611 — survives
        ("abcdefghij", "ab"),      // ratio 0.2 — length-pruned AND jw-low
        ("DWAYNE", "DUANE"))       // jw 0.84 < 0.95 — filtered either way
        .toDF("a", "b").write.parquet(pairsPath)
      val pairs = s.read.parquet(pairsPath)
      val q = pairs.filter(org.apache.spark.sql.functions.expr(
        "jaro_winkler(a, b) >= 0.95"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("length("),
        s"length-pruning conjunct missing from plan:\n$optimized")
      assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
        Seq(("MARTHA", "MARHTA")))
      // ...and the rewrite must not fire at vacuous thresholds (t <= 0.8).
      val low = pairs.filter(org.apache.spark.sql.functions.expr(
        "jaro_winkler(a, b) >= 0.5"))
      assert(!low.queryExecution.optimizedPlan.toString.contains("length("),
        "rule fired below its vacuous-bound floor")
      assert(low.collect().length === 3)
      // Fixed point: re-optimizing an already-rewritten plan adds nothing.
      val once = q.queryExecution.optimizedPlan
      val twice = graft.plans.JaroWinklerLengthPruning(once)
      assert(twice.toString === once.toString, "rule is not fixed-point stable")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
