package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate-pair generation for record linkage.
  *
  * [[sortedNeighborhoodPairs]] is the classic sorted-neighborhood method
  * (Hernández & Stolfo 1995, public): sort all records by a blocking key
  * and emit every pair within a sliding window of `window` positions.
  * Where equality blocking (q119's first-token blocks) misses pairs whose
  * block key itself is dirty, the sorted neighborhood catches anything
  * that SORTS nearby — typos past the first token, prefix variants —
  * at a guaranteed bounded cost of ≤ n·window pairs.
  */
object Blocking {

  /** All (id_a, id_b) pairs within `window` positions of each other in
    * the (key, id) sort order, with their key strings and position
    * distance. Deterministic: the total order is (key, id), so the pair
    * set is a pure function of the data.
    *
    * Scale shape — no global sort, no single-partition data window:
    * global positions come from the two-phase banded prefix sum (the
    * q76/q91 discipline) with bands = the key's first `bandChars`
    * characters (band order IS key order, so band-local ranks + bounded
    * per-band offsets compose to the exact global rank). Pairing is an
    * EQUI-join on the position bucket `pos div window`: the left side
    * fans out to its own and the next bucket, the right side sits in its
    * own bucket only, so every qualifying pair (0 < Δpos ≤ window) meets
    * in exactly one bucket — never a positional NLJ, never a pair dedup.
    * The per-band offsets frame is #bands-sized (bounded by the key
    * alphabet, data-independent) — its single-partition window is the
    * same bounded phase-2 every banded prefix sum in this repo runs.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, keyCol: Column,
      window: Int, bandChars: Int = 1): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(bandChars >= 1, "bandChars must be >= 1")
    // NULL keys coalesce to '' instead of vanishing: substring(NULL) is a
    // NULL band that no equi-join below would ever match, so null-keyed
    // records — in linkage, exactly the dirty rows worth pairing — would
    // silently drop out of the candidate set. With '' they sort first and
    // pair with their positional neighbors like any other record.
    val keyed = df.select(col(idCol).as("id"), coalesce(keyCol, lit("")).as("k"))
      .withColumn("band", substring(col("k"), 1, bandChars))
    val wLocal = Window.partitionBy(col("band")).orderBy(col("k"), col("id"))
    val local = keyed.withColumn("lpos", row_number().over(wLocal).cast("long"))
    val wBand = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("band")).agg(count(lit(1)).as("n"))
      .select(col("band"), coalesce(sum(col("n")).over(wBand), lit(0L)).as("off"))
    val pos = local.join(broadcast(offsets), Seq("band"))
      .select(col("id"), col("k"), (col("off") + col("lpos")).as("pos"))
    val aSide = pos
      .select(col("id").as("id_a"), col("k").as("k_a"), col("pos").as("pos_a"))
      .withColumn("bkt", explode(array(expr(s"pos_a div $window"),
        expr(s"pos_a div $window + 1"))))
    val bSide = pos.select(col("id").as("id_b"), col("k").as("k_b"),
      col("pos").as("pos_b"), expr(s"pos div $window").as("bkt"))
    aSide.join(bSide, Seq("bkt"))
      .filter(col("pos_b") > col("pos_a") &&
        col("pos_b") - col("pos_a") <= window)
      .select(col("id_a"), col("id_b"), col("k_a"), col("k_b"),
        (col("pos_b") - col("pos_a")).as("dist"))
  }
}
