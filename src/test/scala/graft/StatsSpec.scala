package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ks(a: Seq[Int], b: Seq[Int], bandWidth: Int = 1) = {
    val df = (a.map(v => (v, "A")) ++ b.map(v => (v, "B"))).toDF("v", "s")
    Stats.ksTwoSample(df, col("v"), col("s"), "A", "B", bandWidth)
      .select(col("n_a"), col("n_b"), col("d_num").cast("long"),
        col("d_ppm"), col("reject_05"))
      .as[(Long, Long, Long, Long, Boolean)].head()
  }

  test("ksTwoSample: hand-computed D on overlapping samples") {
    // A={1,2,3}, B={2,3,4}: at v∈{1,2,3} |ca·3−cb·3| = 3, at v=4 it is 0
    // → d_num=3, d_ppm=⌊3·10⁶/9⌋; far under the α=.05 critical value.
    assert(ks(Seq(1, 2, 3), Seq(2, 3, 4)) === ((3L, 3L, 3L, 333333L, false)))
  }

  test("ksTwoSample: disjoint supports give D=1 and reject") {
    val out = ks(1 to 10, 101 to 110)
    assert(out === ((10L, 10L, 100L, 1000000L, true)))
  }

  test("ksTwoSample: identical samples give D=0") {
    assert(ks(Seq(5, 6, 7, 8), Seq(5, 6, 7, 8)) === ((4L, 4L, 0L, 0L, false)))
  }

  test("ksTwoSample: result is bandWidth-invariant (two-phase prefix sum is exact)") {
    val a = (1 to 200).map(i => (i * 7) % 97)
    val b = (1 to 150).map(i => (i * 13) % 89 + 5)
    for (w <- Seq(1, 8, 1000)) {
      assert(ks(a, b, w) === ks(a, b, 1), s"bandWidth=$w")
    }
  }

  test("ksTwoSample: ignores rows from other sides and duplicates count multiply") {
    val df = Seq((1, "A"), (1, "A"), (2, "B"), (9, "C")).toDF("v", "s")
    val out = Stats.ksTwoSample(df, col("v"), col("s"), "A", "B", 10)
      .select(col("n_a"), col("n_b"), col("d_num").cast("long"))
      .as[(Long, Long, Long)].head()
    // at v=1: |2·1 − 0·2| = 2; side C never enters the pooled set.
    assert(out === ((2L, 1L, 2L)))
  }

  test("corrMatrix: perfect, inverse, hand-computed, and zero-variance pairs") {
    val df = Seq((1L, 2L, 9L, 5L), (2L, 4L, 8L, 5L), (3L, 6L, 7L, 5L),
      (4L, 8L, 1L, 5L)).toDF("x", "y2", "yneg", "c")
    val out = Stats.corrMatrix(df, Seq("x" -> col("x"), "y2" -> col("y2"),
        "yneg" -> col("yneg"), "c" -> col("c")))
      .orderBy("var_a", "var_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
    val m = out.map(t => (t._1, t._2) -> t._4).toMap
    assert(out.forall(_._3 === 4L) && out.length === 6)
    assert(m(("x", "y2")) === 1000000L)     // y2 = 2x exactly → r = 1
    assert(m(("x", "c")) === null)          // zero variance → NULL, not 0/0
    assert(m(("y2", "c")) === null && m(("yneg", "c")) === null)
    // x vs yneg: hand stats n=4 Σx=10 Σy=25 Σxy=50 Σx²=30 Σy²=195
    // → r = (200−250)/(sqrt(20)·sqrt(155)) = −0.8980265…
    // → corr_micro = ⌊−898026.5…⌋ = −898027 (floor toward −∞)
    assert(m(("x", "yneg")) === -898027L)
    // invariant to the fixed-point scale choice
    val scaled = Stats.corrMatrix(df, Seq("x" -> (col("x") * 100),
        "y2" -> (col("y2") * 1000), "yneg" -> (col("yneg") * 10),
        "c" -> (col("c") * 7)))
      .orderBy("var_a", "var_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
    assert(scaled === out)
  }

  test("giniByGroup: closed form matches hand ranks, band-width invariant") {
    import spark.implicits._
    // uniform → exactly 0; [0,0,0,10] → 2·Σi·x = 80, (n+1)·Σx = 50,
    // n·Σx = 40 → G = 30/40 = 750000 ppm; a tie run exercises the
    // value-run telescoping ([1,1,2]: 2Σix = 2(1+2+6)=18, 4·Σx=16,
    // 3·Σx=12 → 2/12 = 166666 ppm floored).
    val df = Seq(
      ("u", 5L), ("u", 5L), ("u", 5L),
      ("x", 0L), ("x", 0L), ("x", 0L), ("x", 10L),
      ("t", 1L), ("t", 1L), ("t", 2L)).toDF("g", "v")
    def run(bw: Long) = Stats.giniByGroup(df, col("g"), col("v"), bw)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null
        else r.getAs[Number](3).longValue()))
    val out = run(50L)
    assert(out === Array(("t", 3L, 4L, 166666L), ("u", 3L, 15L, 0L),
      ("x", 4L, 10L, 750000L)))
    // The banding is an implementation detail: any width gives the
    // same exact answer, including width 1 (every value its own band).
    assert(run(1L) === out)
    assert(run(1000000L) === out)
    // All-zero mass → the ratio is undefined, reported null not ÷0.
    val z = Stats.giniByGroup(Seq(("z", 0L), ("z", 0L)).toDF("g", "v"),
      col("g"), col("v"), 10L).collect()
    assert(z.length === 1 && z.head.isNullAt(3))
  }

  test("rrfFusion: hand-computed competition ranks, ties, nulls, band-width invariance") {
    import spark.implicits._
    // sigA desc ranks: 10,10 -> 1 (tie shares min), 5 -> 3, 1 -> 4,
    // null -> skipped; sigB desc ranks over [4,3,2,1,0]: plain 1..5.
    val df = Seq(
      (1L, Some(10L), 1L), (2L, Some(10L), 2L), (3L, Some(5L), 3L),
      (4L, Some(1L), 4L), (5L, None, 0L))
      .toDF("id", "a", "b")
    def nano(rk: Long) = 1000000000L / (60L + rk)
    def run(bw: Long) = Stats.rrfFusion(df, col("id"),
        Seq(("a", col("a"), bw), ("b", col("b"), bw)), k = 60)
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val out = run(7L)
    assert(out === Array(
      (1L, 1L, 4L, nano(1) + nano(4)),
      (2L, 1L, 3L, nano(1) + nano(3)),
      (3L, 3L, 2L, nano(3) + nano(2)),
      (4L, 4L, 1L, nano(4) + nano(1)),
      // the null signal is skipped: rank_a null, fusion sums the rest
      (5L, -1L, 5L, nano(5))))
    // banding is an implementation detail — any width, same exact ranks
    assert(run(1L) === out)
    assert(run(1000000L) === out)
  }

  test("benfordAudit: hand-counted digits, zero-mass digits emitted, non-positives dropped") {
    import spark.implicits._
    // amounts -> cents -> first digit: 1.00->1, 19.99->1, 2.50->2,
    // 0.31->3, 999.99->9; zero/negative/null excluded.
    val df = Seq(Some(1.00), Some(19.99), Some(2.50), Some(0.31),
      Some(999.99), Some(0.0), Some(-5.0), None).toDF("amt")
    val out = Stats.benfordAudit(df, col("amt")).orderBy("digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1) === (1L to 9L).toArray)
    assert(out.forall(_._3 === 5L))
    val counts = out.map(t => t._1 -> t._2).toMap
    assert(counts(1L) === 2L && counts(2L) === 1L && counts(3L) === 1L &&
      counts(9L) === 1L)
    assert((4L to 8L).forall(counts(_) === 0L))
    // obs_ppm of digit 1 = floor(2e6/5)
    assert(out.head._4 === 400000L)
  }
}
