package graft.operators

import org.apache.spark.sql.DataFrame

/** The near-dup parameters of the production curation path (q97 batch +
  * [[graft.streaming.CurationStream]]), carried as ONE value so batch,
  * stream, and the corpus-scale LSH operator can never drift apart.
  *
  * `n`/`jaccardThreshold` drive the exact verification stage (shingle
  * width and the accept threshold), `containmentThreshold` the
  * incremental postings gate, and `minhashK`/`bands` the banded LSH
  * candidate generation ([[Dedup.minhashNearDupPairs]]) — the stage
  * whose cost/recall trade the q139 audit measures and
  * [[Dedup.recommendBandConfig]] picks from.
  */
final case class CurationConfig(
    n: Int,
    jaccardThreshold: Double,
    containmentThreshold: Double,
    minhashK: Int,
    bands: Int) {
  require(n >= 1, "shingle width n must be >= 1")
  require(bands >= 1 && bands <= minhashK && minhashK % bands == 0,
    s"bands ($bands) must divide the signature width k ($minhashK)")
}

object CurationConfig {

  /** The production configuration. NOT a guess: (minhashK, bands) is the
    * q141 chooser's measured pick on the documents corpus — bands=2 of a
    * k=16 signature is the cheapest config whose banding recall clears
    * the 0.8 floor at the 0.5 Jaccard threshold (audited 960000 ppm
    * recall / 1000000 ppm precision at sf0.01; CurationConfigSpec
    * re-derives the same pick from the sf0.001 fixture corpus, so a
    * recall regression in any audit stage fails the build here, not in
    * production). Re-pin by re-running [[fromAudit]] whenever the corpus
    * distribution or thresholds change.
    */
  val pinned: CurationConfig = CurationConfig(
    n = 3, jaccardThreshold = 0.5, containmentThreshold = 0.5,
    minhashK = 16, bands = 2)

  /** Derive the configuration from a corpus sample by closing the
    * audit→production loop in code: run the q139 banding audit, let
    * [[Dedup.recommendBandConfig]] pick the cheapest config clearing
    * `recallFloorPpm`, and wrap the pick. None = no audited config meets
    * the floor (widen `bandConfigs` or raise `k`; silently shipping an
    * under-recall dedup is the failure this Option prevents).
    *
    * The collect is the chooser's ≤1-row output — |configs|-bounded,
    * never corpus-sized.
    */
  def fromAudit(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, containment: Double = 0.5,
      k: Int = 16, bandConfigs: Seq[Int] = Seq(1, 2, 4, 8),
      recallFloorPpm: Long = 800000L): Option[CurationConfig] = {
    val pick = Dedup.recommendBandConfig(
      Dedup.lshBandAudit(corpus, idCol, textCol, n, threshold, k,
        bandConfigs, tokenHasher = Dedup.auditableTokenHash),
      recallFloorPpm)
    pick.select("bands").collect().headOption.map(r =>
      CurationConfig(n, threshold, containment, k, r.getLong(0).toInt))
  }
}
