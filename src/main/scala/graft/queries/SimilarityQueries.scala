package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Similarity-search capability queries over the `embeddings` table. */
object SimilarityQueries {

  val defs: Seq[QueryDef] = Seq(

    // ----------------------------------------------------------------
    // Brute-force cosine top-k (exact baseline): 10 query vectors × corpus.
    // Scores rounded to 4 decimals before ranking + id tie-break keeps the
    // ranking engine-stable.
    QueryDef(
      "q26_ann_topk",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.bruteForceTopK(
            corpus = emb, queries = emb.filter(col("vec_id") < 10),
            idCol = "vec_id", vecCol = "embedding", k = 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS vq
             |          FROM embeddings WHERE vec_id < 10),
             |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS vc FROM embeddings),
             |s AS (SELECT qid, nid, ROUND(list_cosine_similarity(vq, vc), 4) AS cos_sim
             |      FROM q CROSS JOIN c WHERE qid <> nid),
             |r AS (SELECT qid AS query_id, nid AS neighbor_id, cos_sim,
             |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
             |      FROM s)
             |SELECT query_id, rank, neighbor_id, cos_sim FROM r
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    ),

    // ----------------------------------------------------------------
    // LSH-bucketed ANN (the 100 TB path): hyperplane-signature bucket join
    // instead of a cross join. Approximate by design → rows-only check;
    // the ScalaTest suite measures recall against the brute-force baseline.
    QueryDef(
      "q27_ann_lsh",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.lshTopK(
            corpus = emb, queries = emb.filter(col("vec_id") < 10),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            prefixBits = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      None,
    ),

    // ----------------------------------------------------------------
    // IVF-bucketed ANN: training-free deterministic codebook, broadcast
    // centroid assignment, nProbe inverted-list probing. Approximate →
    // rows-only; ScalaTest measures recall vs brute force.
    QueryDef(
      "q35_ann_ivf",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        Similarity.ivfTopK(
            corpus = emb, queries = emb.filter(col("vec_id") < 10),
            idCol = "vec_id", vecCol = "embedding", k = 5,
            centroidEvery = 50, nProbe = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      None,
    ),
  )
}
