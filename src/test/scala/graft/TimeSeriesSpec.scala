package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** Pins the TimeSeries operator semantics on hand-computed fixtures:
  * island merging (overlap / touch / disjoint / nested), spine + forward
  * fill, transition probabilities, and exact OLS recovery of a known line.
  */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("coalesceIntervals merges overlap and touch, splits on gaps, absorbs nested") {
    // user 1: [0,10] [5,20] (overlap) [20,30] (touch) | [40,50] — 2 islands
    // user 2: [0,100] [10,20] (nested) — 1 island, end stays 100
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L), (1L, 40L, 50L),
      (2L, 0L, 100L), (2L, 10L, 20L))
      .toDF("user_id", "s", "e")
    val out = TimeSeries.coalesceIntervals(iv, "user_id", col("s"), col("e"))
      .orderBy("user_id", "island")
      .select("user_id", "start_us", "end_us", "n_rows")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L, 30L, 3L), (1L, 40L, 50L, 1L), (2L, 0L, 100L, 2L)))
  }

  test("gapFillDaily densifies the span and forward-fills last_active_day") {
    // group a active on days 10, 13: spine 10..13 with gaps 11, 12.
    val daily = Seq(("a", 10L, 5L), ("a", 13L, 7L)).toDF("g", "day", "n")
    val out = TimeSeries.gapFillDaily(daily, "g", "day")
      .orderBy("day")
      .select("day", "is_gap", "last_active_day")
      .as[(Long, Boolean, Long)].collect().toSeq
    assert(out === Seq((10L, false, 10L), (11L, true, 10L),
      (12L, true, 10L), (13L, false, 13L)))
  }

  test("transitions counts adjacent pairs; probs sum to 1 per prev state") {
    // user 1: A B A B  -> A→B ×2, B→A ×1; user 2: A A -> A→A ×1
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "A"))
      .toDF("user_id", "seq", "state")
    val out = TimeSeries.transitions(ev, "user_id", "state", Seq(col("seq")))
      .orderBy("prev_state", "next_state")
      .select("prev_state", "next_state", "n_transitions")
      .as[(String, String, Long)].collect().toSeq
    assert(out === Seq(("A", "A", 1L), ("A", "B", 2L), ("B", "A", 1L)))
    val probSums = TimeSeries.transitions(ev, "user_id", "state", Seq(col("seq")))
      .groupBy("prev_state").agg(sum("prob").as("p"))
      .select("p").as[Double].collect()
    assert(probSums.forall(p => math.abs(p - 1.0) < 1e-12))
  }

  test("overlapJoin emits each overlapping pair exactly once, touch counts as 0") {
    // bucketUs = 10. Left interval [5, 35] spans buckets 0..3; right
    // [28, 40] shares buckets 2 and 3 with it — must appear ONCE.
    // [35, 50] touches left's end exactly → overlap 0. [36, 50] misses.
    val left = Seq((1L, 5L, 35L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 28L, 40L), (20L, 35L, 50L), (30L, 36L, 50L))
      .toDF("rid", "rs", "re")
    val out = TimeSeries.overlapJoin(left, right, "ls", "le", "rs", "re", 10L)
      .orderBy("rid").select("lid", "rid", "overlap_us")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 10L, 7L), (1L, 20L, 0L)))
  }

  test("overlapJoin is exact at bucket boundaries and rejects clashing names") {
    // Both intervals start exactly on a bucket boundary (s = k·bucketUs):
    // the floor-div must not misround k to k−1 (double-division trap).
    val b = 21600000000L // 6 h in µs
    val left = Seq((1L, 4L * b, 4L * b + 100L)).toDF("lid", "ls", "le")
    val right = Seq((9L, 4L * b, 4L * b + 50L)).toDF("rid", "rs", "re")
    val out = TimeSeries.overlapJoin(left, right, "ls", "le", "rs", "re", b)
      .select("lid", "rid", "overlap_us").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 9L, 50L)))
    val clash = intercept[IllegalArgumentException] {
      TimeSeries.overlapJoin(left.withColumnRenamed("lid", "id"),
        right.withColumnRenamed("rid", "id"), "ls", "le", "rs", "re", b)
    }
    assert(clash.getMessage.contains("disjoint"))
  }

  test("asofJoin: backward/forward/nearest directions, inclusive ties, tolerance") {
    val quotes = Seq((1L, 10L, 100L), (1L, 30L, 101L)).toDF("k", "qts", "qv")
    def probes(ts: Long*) = ts.zipWithIndex
      .map { case (t, i) => (1L, t, i.toLong) }.toDF("k", "pts", "pid")
    def run(p: org.apache.spark.sql.DataFrame, dir: String,
        tol: Long = Long.MaxValue) =
      TimeSeries.asofJoin(p, quotes, "k", "pts", "qts", "qv", dir, tol)
        .orderBy("pts")
        .select("pts", "asof_ts", "asof_val")
        .collect().map(r => (r.getLong(0),
          Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toSeq

    assert(run(probes(5, 10, 22, 40), "backward") === Seq(
      (5L, None, None), (10L, Some(10L), Some(100L)),   // equal ts inclusive
      (22L, Some(10L), Some(100L)), (40L, Some(30L), Some(101L))))
    assert(run(probes(5, 10, 22, 40), "forward") === Seq(
      (5L, Some(10L), Some(100L)), (10L, Some(10L), Some(100L)),
      (22L, Some(30L), Some(101L)), (40L, None, None)))
    assert(run(probes(5, 20, 22), "nearest") === Seq(
      (5L, Some(10L), Some(100L)),
      (20L, Some(10L), Some(100L)),  // equidistant → backward (pandas rule)
      (22L, Some(30L), Some(101L)))) // 8 forward beats 12 backward
    assert(run(probes(22), "backward", tol = 10L) === Seq((22L, None, None)))
  }

  test("olsByGroupXY (continuous x) recovers an exact line") {
    // x in micro-representable halves, y = -1.5x + 2 exactly.
    val pts = (0 to 40).map(i => ("g", i * 0.5, -1.5 * (i * 0.5) + 2.0))
    val row = TimeSeries.olsByGroupXY(pts.toDF("g", "x", "y"), "g",
        col("x"), col("y"))
      .select("n", "slope", "intercept").as[(Long, Double, Double)].head()
    assert(row === ((41L, -1.5, 2.0)))
  }

  test("olsByGroup recovers an exact line and is partitioning-invariant") {
    // y = 2.5x + 1 exactly, in micro-unit-representable values.
    val pts = (0L to 100L).map(x => ("g", x, 2.5 * x + 1.0))
    val df1 = pts.toDF("g", "x", "y")
    val df20 = pts.toDF("g", "x", "y").repartition(20)
    for (df <- Seq(df1, df20)) {
      val row = TimeSeries.olsByGroup(df, "g", col("x"), col("y"))
        .select("n", "slope", "intercept").as[(Long, Double, Double)].head()
      assert(row === ((101L, 2.5, 1.0)))
    }
  }
}
