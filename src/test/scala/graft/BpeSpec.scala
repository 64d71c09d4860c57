package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def trainOn(texts: Seq[String], n: Int) =
    Bpe.train(texts.toDF("text"), "text", n)
      .orderBy("rank")
      .as[(Int, String, String, Long, Long)]
      .collect()
      .toSeq

  test("train learns the hand-computed Sennrich merge sequence") {
    // Corpus: "low" ×3, "lower" ×1 (as separate whitespace tokens).
    // Initial symbols: l o w </w> (×3), l o w e r </w>.
    // Pair counts r0: (l,o)=4, (o,w)=4, (w,</w>)=3, (w,e)=1, (e,r)=1,
    // (r,</w>)=1 → tie (l,o) vs (o,w) broken lexicographically: (l,o).
    // r1: (lo,w)=4 wins. r2: (low,</w>)=3 wins.
    val out = trainOn(Seq("low low low lower"), 3)
    assert(out.map(t => (t._1, t._2, t._3, t._4)) ===
      Seq((0, "l", "o", 4L), (1, "lo", "w", 4L), (2, "low", "</w>", 3L)))
    // tokens: initial 3·4+6=18 → merge drops pair_cnt each here (no
    // overlaps): 14, 10, 7.
    assert(out.map(_._5) === Seq(14L, 10L, 7L))
  }

  test("applyMerge is greedy left-to-right: 'a a a' -> [aa, a]") {
    val syms = Seq(Seq("a", "a", "a")).toDF("symbols")
    val out = syms.select(Bpe.applyMerge(col("symbols"), "a", "a"))
      .as[Seq[String]].head()
    assert(out === Seq("aa", "a"))
    // Four in a row pairs up twice — the non-overlapping scan.
    val out4 = Seq(Seq("a", "a", "a", "a")).toDF("symbols")
      .select(Bpe.applyMerge(col("symbols"), "a", "a"))
      .as[Seq[String]].head()
    assert(out4 === Seq("aa", "aa"))
  }

  test("train counts overlapping pairs but merges non-overlapping (tokens_after)") {
    // "a a a" as ONE word "aaa": symbols a a a </w>; pair (a,a) counts 2
    // but one merge pass yields [aa, a, </w>] — tokens drop by 1, not 2.
    val out = trainOn(Seq("aaa"), 1)
    assert(out.head._2 === "a" && out.head._3 === "a" && out.head._4 === 2L)
    assert(out.head._5 === 3L) // aa, a, </w>
  }

  test("train stops when no pair remains (numMerges > available pairs)") {
    // Single 1-char word: symbols [x, </w>] → one possible merge, then
    // every word is a single symbol and training exhausts.
    val out = trainOn(Seq("x x"), 5)
    assert(out.map(t => (t._1, t._2, t._3)) === Seq((0, "x", "</w>")))
  }

  test("size<2 guard: empty/blank corpus trains nothing") {
    assert(trainOn(Seq("   "), 3).isEmpty)
  }

  test("merge sequence is partition-invariant") {
    val texts = (1 to 100).map(i => s"tok${i % 7} tok${i % 3} shared common")
    val a = trainOn(texts, 6)
    val b = Bpe.train(texts.toDF("text").repartition(13), "text", 6)
      .orderBy("rank").as[(Int, String, String, Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("encode round-trips train's final state; encodeTable matches encode") {
    val texts = Seq("low low low lower", "lowest low")
    val df = texts.toDF("text")
    val merges = Bpe.train(df, "text", 4)
      .orderBy("rank").select("left", "right")
      .as[(String, String)].collect().toSeq
    val viaExpr = df.select(Bpe.encode(col("text"), merges).as("tokens"))
      .as[Seq[String]].collect().toSeq
    // Expression form and the broadcast-UDF scale form must tokenize
    // identically — the contract that lets big merge lists switch paths.
    val viaUdf = Bpe.encodeTable(df, "text", merges)
      .select("tokens").as[Seq[String]].collect().toSeq
    assert(viaExpr === viaUdf)
    // Encoding the training corpus reproduces the trained word table's
    // token mass: Σ tokens == last tokens_after.
    val tokensAfter = trainOn(texts, 4).last._5
    assert(viaExpr.map(_.size.toLong).sum === tokensAfter)
  }

  test("train is invocation-isolated: repeated calls recompute and agree") {
    // The bench contract forbids cross-invocation memos keyed on the data:
    // two independent train() calls must each compute from the input and
    // (being deterministic) agree exactly.
    val c1 = Seq("low low low", "lower lower").toDF("text")
    val a = Bpe.train(c1, "text", 4).orderBy(col("rank")).collect()
    val b = Bpe.train(c1, "text", 4).orderBy(col("rank")).collect()
    assert(a sameElements b)
    // A different corpus trains a different table — nothing is memoized
    // across inputs.
    val other = Seq("zz zz zz zz").toDF("text")
    val fresh = Bpe.train(other, "text", 4).orderBy(col("rank")).collect()
    assert(!(fresh sameElements a))
  }

  test("encode enforces the expression-depth ceiling") {
    val big = (1 to Bpe.MaxExpressionMerges + 1).map(i => (s"a$i", s"b$i"))
    val e = intercept[IllegalArgumentException] {
      Bpe.encode(col("text"), big)
    }
    assert(e.getMessage.contains("encodeTable"))
  }

  test("replace-style oracle semantics equal the fold on overlap cases") {
    // The q126 oracle applies merges via non-overlapping left-to-right
    // string replace on ' l  r '-delimited symbol strings. Pin the
    // equivalence on the tricky shapes: runs, boundaries, multi-char
    // symbols that share prefixes/suffixes across symbol boundaries.
    def oracleMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
      val s = " " + syms.mkString("  ") + " "
      val out = s.replace(" " + l + "  " + r + " ", " " + l + r + " ")
      out.trim.split("  ").toSeq
    }
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),
      (Seq("a", "a", "a", "a"), "a", "a"),
      (Seq("x", "a", "a"), "a", "a"),
      (Seq("ba", "ab"), "a", "a"),        // no cross-boundary false match
      (Seq("lo", "w", "</w>"), "lo", "w"),
      (Seq("a", "ab", "b"), "a", "ab"),   // shared prefix/suffix symbols
      (Seq("ab", "b", "ab", "b"), "ab", "b"))
    cases.foreach { case (syms, l, r) =>
      val fold = Seq(syms).toDF("symbols")
        .select(Bpe.applyMerge(col("symbols"), l, r))
        .as[Seq[String]].head()
      assert(oracleMerge(syms, l, r) === fold, s"syms=$syms merge=($l,$r)")
    }
  }
}
