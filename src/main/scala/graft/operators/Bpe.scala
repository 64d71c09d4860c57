package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CacheScope

/** Distributed byte-pair-encoding tokenizer training.
  *
  * The standard LLM-tokenizer training loop (Sennrich et al. 2016, and
  * the shape used by production tokenizer trainers): collapse the corpus
  * to WORD TYPES with counts, then repeatedly (a) count weighted adjacent
  * symbol pairs over the word-type table, (b) merge the most frequent
  * pair everywhere it occurs.
  *
  * Scale design — why this survives 100 TB:
  *  - The corpus→word-type aggregation is the one corpus-sized pass
  *    (a hash groupBy on the word string, map-side combined). Zipf's law
  *    makes the word-type table orders of magnitude smaller than the
  *    corpus — THAT table, not the corpus, is what the merge loop
  *    iterates over.
  *  - Each merge iteration is one distributed aggregation (explode
  *    adjacent pairs, weighted count, argmax via a 1-row sort-limit
  *    collect) plus one narrow map applying the merge. No shuffle of the
  *    word table itself inside the loop; only the pair-count aggregate
  *    shuffles, and its key space is the pair vocabulary.
  *  - The merge is applied with a fold over the symbol array
  *    (`aggregate` higher-order function — codegen'd, no UDF). Left-to-
  *    right greedy application matches the reference algorithm: in
  *    "a a a" with merge (a,a) the fold produces ["aa","a"], never the
  *    overlapping ["a","aa"] — because the accumulator's LAST element is
  *    what the merge candidate is checked against.
  *  - Lineage across iterations grows linearly; the loop re-caches the
  *    word-type table every iteration into the caller's [[CacheScope]]
  *    and unpersists the previous generation, so the active plan stays
  *    O(1) deep.
  *
  * End-of-word convention: each word is split to characters and a
  * trailing `</w>` marker symbol is appended, so merges distinguish
  * word-final from word-internal contexts (the Sennrich convention).
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Corpus → (word, cnt) word-type table. The single corpus-sized pass. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbol decomposition: characters plus the `</w>` marker. */
  def initialSymbols(wordCol: Column): Column =
    concat(split(wordCol, ""), array(lit(EndOfWord)))

  /** Weighted adjacent-pair counts over a (symbols, cnt) word-type table.
    * Output: (left, right, pair_cnt) — the quantity BPE maximizes.
    */
  def pairCounts(words: DataFrame, symbolsCol: String = "symbols",
      cntCol: String = "cnt"): DataFrame = {
    val s = col(symbolsCol)
    val pairs = words.select(col(cntCol).as("cnt"),
      explode(when(size(s) < 2, array().cast("array<struct<l:string,r:string>>"))
        .otherwise(zip_with(slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
          (l, r) => struct(l.as("l"), r.as("r"))))).as("p"))
    pairs.groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("cnt")).as("pair_cnt"))
  }

  /** Apply one merge (left,right)→left+right to a symbol array column via
    * a left fold — greedy left-to-right, exactly the reference semantics.
    */
  def applyMerge(symbolsCol: Column, left: String, right: String): Column = {
    val merged = left + right
    aggregate(
      symbolsCol,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))
  }

  /** Train `numMerges` BPE merges over the corpus. Returns the learned
    * merge table (rank, left, right, pair_cnt) in learning order.
    *
    * Argmax tie-break is deterministic: highest count, then
    * lexicographic (left, right) — engine-order-independent, so two runs
    * (or two cluster layouts) learn the identical merge sequence.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    var words = wordCounts(df, textCol)
      .select(initialSymbols(col("word")).as("symbols"), col("cnt"))
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Int, String, String, Long)]

    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val cached = scope.cached(words)
      prev.foreach(_.unpersist())
      prev = Some(cached)
      val top = pairCounts(cached)
        .orderBy(col("pair_cnt").desc, col("left"), col("right"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case Some((l, r, c)) =>
          merges += ((rank, l, r, c))
          words = cached.select(applyMerge(col("symbols"), l, r).as("symbols"),
            col("cnt"))
          rank += 1
        case None => exhausted = true
      }
    }

    merges.result().toDF("rank", "left", "right", "pair_cnt")
  }

  /** Encode a text column with a learned merge list (applied in rank
    * order to each word). Returns the tokenized array column. Merges are
    * literals folded into the plan — the merge table is vocabulary-sized
    * and lives on the driver by construction, the natural "broadcast".
    */
  def encode(textCol: Column, merges: Seq[(String, String)]): Column = {
    val words = split(trim(lower(textCol)), "\\s+")
    flatten(transform(words, w =>
      merges.foldLeft(initialSymbols(w))((acc, m) => applyMerge(acc, m._1, m._2))))
  }
}
