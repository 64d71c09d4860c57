package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact baseline — queries × corpus cross join.
  *    Correct at any scale where |queries| is small (the common "embed the
  *    prompt, find 5 neighbors" shape): the corpus side streams, never
  *    materializes pairs beyond the running top-k per query.
  *  - [[lshTopK]]: the scale path — random-hyperplane bucket join. Corpus
  *    and queries hash to signature buckets; only same-bucket pairs are
  *    scored. One shuffle on the bucket key replaces the cross join; probe
  *    multiple band prefixes to trade recall for cost.
  */
object Similarity {

  /** Exact cosine top-k for each query vector. Scores are rounded to 4
    * decimals BEFORE ranking, with the neighbor id as tie-break, so the
    * ranking is stable across engines and partitionings.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDoubles(col(vecCol)).as("v_c"))
    val q = queries.select(col(idCol).as("query_id"), asDoubles(col(vecCol)).as("v_q"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosine(col("v_q"), col("v_c")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** LSH-bucketed ANN: bucket = first `prefixBits` bits of the hyperplane
    * signature; score only same-bucket pairs, then top-k per query. Recall
    * < 1 by design; the exact top-1 neighbor of a query lands in the same
    * bucket with probability (1 - θ/π)^prefixBits for angle θ.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nBits: Int = 16, prefixBits: Int = 8): DataFrame = {
    def sig(df: DataFrame, id: String, vAlias: String) =
      df.select(col(idCol).as(id), asDoubles(col(vecCol)).as(vAlias))
        .withColumn("bucket",
          slice(hyperplaneSignature(col(vAlias), nBits), 1, prefixBits))
    val c = sig(corpus, "neighbor_id", "v_c")
    val q = sig(queries, "query_id", "v_q")
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosine(col("v_q"), col("v_c")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }
}
