package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import graft.core.Tables

/** t1-shaped smoke: every declared query runs at sf0.001 and the approximate
  * paths hit their recall floors against exact baselines.
  */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("LSH ANN recall ≥ 0.4 vs brute force at sf0.001 (approximate path sanity)") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val approx = pairs(Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      nBits = 16, prefixBits = 4))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall")
  }
}
