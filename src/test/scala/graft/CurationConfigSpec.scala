package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationConfig, Dedup}

/** The audit→production loop, closed and GATED: the config the stream and
  * q97 actually consume must equal the q141 chooser's measured pick on
  * the fixture corpus — a recall regression in any audit stage (shingle,
  * signature, banding, candidate join) flips the pick and fails here,
  * before the driver's oracle gate ever runs.
  */
class CurationConfigSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("pinned production config IS the chooser's pick on the gated corpus") {
    // sf0.01 — the corpus the driver's q141 oracle gate actually hashes —
    // NOT the 50-doc sf0.001 sample, whose sparse true-pair set
    // under-measures banding recall and flips the pick to bands=4. The
    // pin must equal the measurement at the scale the choice ships for;
    // the audit itself is the config-count-independent one-join plan, so
    // the larger corpus costs seconds here, not minutes.
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val derived = CurationConfig.fromAudit(docs, "doc_id", "text")
    assert(derived === Some(CurationConfig.pinned),
      "the pinned CurationConfig no longer matches recommendBandConfig's " +
        "measured pick — re-pin (and say why) or fix the audit regression")
  }

  test("an unreachable recall floor yields None, never a silent fallback") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    assert(CurationConfig.fromAudit(docs, "doc_id", "text",
      recallFloorPpm = 1000001L).isEmpty)
  }

  test("config-driven LSH pairs are a subset of exact pairs (never invents)") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      org.apache.spark.sql.functions.lit(1),
      CurationConfig.pinned.n, CurationConfig.pinned.jaccardThreshold))
    val lsh = pairSet(Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      CurationConfig.pinned))
    assert(lsh.subsetOf(exact))
    // The pinned config cleared an 0.8 recall floor in the audit; the
    // production-hash path (xxhash64 signatures) should land in the same
    // regime — gate at 0.6 to leave room for hash-family variance while
    // still catching a broken banding stage outright.
    if (exact.nonEmpty)
      assert((exact intersect lsh).size.toDouble / exact.size >= 0.6,
        s"LSH recall collapsed: ${(exact intersect lsh).size}/${exact.size}")
  }
}
