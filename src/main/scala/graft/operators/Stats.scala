package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact distributional statistics for data-quality gates. The family
  * discipline (shared with the moment/OLS/chi-square queries): every
  * data-sized reduction happens in exact integer/DECIMAL arithmetic so
  * the result is independent of partitioning and engine summation order;
  * floating point appears only in final, identical-operand scalar steps
  * (IEEE +,−,×,÷,sqrt are correctly rounded — deterministic; only
  * transcendentals carry libm risk, and none is used here).
  */
object Stats {

  /** The suite-wide conversion for a COMPUTED identical-operand IEEE
    * double crossing the driver hash: ⌊x·10⁶ + 0.5⌋ as BIGINT — round
    * half up, but built from one multiply, one add and an exact floor,
    * never from ROUND-at-decimal-scale (whose double→decimal conversion
    * shifted between DuckDB releases and cost rounds 6–7 four red
    * cells). The +0.5 absorbs the common hazard of last-ulp noise
    * around INTEGRAL micro values (a perfect correlation computing as
    * 0.9999999999999999 via sqrt must still report 1000000); the
    * residual .5-boundary hazard requires the true value to sit within
    * an ulp of n+½ micro-units — an irrational-coincidence class that
    * plain floor shares at integral boundaries anyway. DuckDB replay:
    * CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT).
    */
  def micro(x: Column): Column = floor(x * lit(1000000.0) + lit(0.5))

  /** Two-sample Kolmogorov–Smirnov test: D = sup_x |F_a(x) − F_b(x)| —
    * the standard "did this batch's distribution drift from the
    * reference corpus" gate (feature drift, scraper regressions, mixture
    * shifts), sensitive to ANY distributional difference, not just the
    * mean/variance the z-score and moment gates watch.
    *
    * Exactness: at every distinct pooled value, D's numerator is the
    * integer |ca·n_b − cb·n_a| (ca, cb = cumulative counts ≤ x), so
    * `d_num` is exact and max() is order-independent. The reported
    * `d_ppm` = ⌊10⁶·d_num/(n_a·n_b)⌋ is an exact integral DECIMAL
    * division (no float ever crosses the output); the α=0.05 decision
    * (critical value c = 1.3581, the large-sample Smirnov approximation)
    * is computed from exact integers by identical-operand IEEE double ops.
    *
    * Scale: counts-per-distinct-value is one keyed aggregation. The
    * cumulative counts are a prefix sum in VALUE order — run as the
    * two-phase distributed shape (the Packing discipline): a window
    * inside fixed-width value bands plus one tiny window over the
    * per-band totals (#bands = value range / bandWidth, bounded and
    * data-independent), never a global single-partition sort. Products
    * route through DECIMAL(38,0) so n_a·n_b stays exact far past int64.
    *
    * `value` must be numeric with exact equality semantics (int /
    * decimal; binning floats first is the caller's call).
    */
  def ksTwoSample(df: DataFrame, value: Column, side: Column,
      sideA: String, sideB: String, bandWidth: Int): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val vals = df.select(value.as("v"), side.as("s"))
      .filter(col("s").isin(sideA, sideB))
    val byV = vals.groupBy(col("v")).agg(
      sum(when(col("s") === sideA, 1L).otherwise(0L)).as("da"),
      sum(when(col("s") === sideB, 1L).otherwise(0L)).as("db"))
      .withColumn("band", floor(col("v") / bandWidth))
    // Phase 1: inclusive cumsum inside each value band.
    val wLocal = Window.partitionBy(col("band")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = byV
      .withColumn("la", sum(col("da")).over(wLocal))
      .withColumn("lb", sum(col("db")).over(wLocal))
    // Phase 2: band base offsets from the bounded per-band totals frame.
    val wBand = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byV.groupBy(col("band"))
      .agg(sum(col("da")).as("ta"), sum(col("db")).as("tb"))
      .select(col("band"),
        coalesce(sum(col("ta")).over(wBand), lit(0L)).as("oa"),
        coalesce(sum(col("tb")).over(wBand), lit(0L)).as("ob"))
    // Totals from the reduced byV frame (ReuseExchange shares its shuffle
    // with the prefix-sum branches) — not from `vals`, which would re-scan
    // the raw input a second time just to count rows.
    val n = byV.agg(sum(col("da")).as("n_a"), sum(col("db")).as("n_b"))
    val dec = "cast(%s as decimal(38,0))"
    // band joins with <=> for the same reason as orderStatsPermille's cum
    // join: a plain equi-join infers isnotnull(FLOOR(v/w)) into THIS
    // branch's scan only, de-canonicalizing the shared byV subtree and
    // silently disabling AQE stage reuse (band is never null — v is
    // filtered non-null — so the semantics are identical).
    local.join(broadcast(offsets.withColumnRenamed("band", "band_o")),
        col("band") <=> col("band_o"))
      .select((col("oa") + col("la")).as("ca"), (col("ob") + col("lb")).as("cb"))
      .crossJoin(broadcast(n))
      .agg(max(abs(expr(dec.format("ca") + " * " + dec.format("n_b")) -
        expr(dec.format("cb") + " * " + dec.format("n_a")))).as("d_num"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      // d is reported as exact integer parts-per-million (integral DECIMAL
      // division) — a float d would be bit-identical across engines in
      // VALUE yet still hash-sensitive to the checker's serialization of
      // doubles; an integer crosses any hash unambiguously. d_num itself
      // is emitted as BIGINT, not DECIMAL(38,0): a 16-byte FLBA decimal
      // is the other empirically hash-flaky class, and d_num ≤ n_a·n_b
      // keeps it inside int64 to ~3e9 rows per side (the DECIMAL(38,0)
      // intermediates above stay exact far beyond that; only the
      // REPORTED copy narrows). The α=0.05 decision stays IEEE
      // (identical operands both sides — deterministic).
      .select(col("n_a"), col("n_b"), col("d_num").cast("long").as("d_num"),
        expr("(d_num * 1000000) div " +
          "(cast(n_a as decimal(38,0)) * cast(n_b as decimal(38,0)))")
          .as("d_ppm"),
        (col("d_num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")) >
          lit(1.3581) * sqrt((col("n_a") + col("n_b")).cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double"))))
          .as("reject_05"))
  }

  /** Exact interpolated order statistics per group over INTEGER values,
    * with the interpolation itself kept in integer arithmetic — the
    * round-8 replacement for percentile()/quantile_cont in every hashed
    * output. The classic linear-interpolated quantile at p = k/1000 sits
    * at position (n−1)·k/1000: lo = ((n−1)·k) div 1000 (0-based), frac =
    * ((n−1)·k) mod 1000, and the reported value is
    *
    *   p{k}_x1000 = v[lo]·(1000 − frac) + v[lo + (frac>0)]·frac
    *
    * — exactly 1000× the interpolated quantile, a pure BIGINT. No float
    * is ever computed, so there is nothing for two engines to disagree
    * on: quantile_cont's "last-ulp division noise" (and the ROUND-at-
    * scale drift between DuckDB releases that round 7 proved) is
    * structurally gone. Callers feed already-quantized values (e.g.
    * milli-units via cast(x as decimal(18,3))·1000), making p{k}_x1000
    * micro-units of the original.
    *
    * Scale: one (group, value)-keyed count aggregation, then cumulative
    * counts via the two-phase banded prefix sum (a window inside each
    * fixed-width value band plus one window over the bounded per-band
    * totals frame — never a global single-partition sort; ksTwoSample's
    * shape). The order statistics are picked by a plain conditional agg
    * over the cumulative table. Output: group cols, n, p{k}_x1000 per
    * requested permille.
    */
  def orderStatsPermille(df: DataFrame, grp: Column, value: Column,
      permilles: Seq[Int], bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(permilles.nonEmpty && permilles.forall(k => k >= 0 && k <= 1000),
      "permilles must be in [0, 1000]")
    // NULL group keys are dropped UP FRONT, as documented behavior: the
    // equi-joins below would silently drop them anyway (groupBy keeps a
    // null group; join-on-g does not), and an explicit isnotnull(g) in
    // the shared subtree also absorbs any isnotnull(g) a DOWNSTREAM
    // query's join infers and pushes in — without it, that inference
    // lands in one branch only, de-canonicalizes the three byV subtrees,
    // and silently disables AQE exchange reuse (+1 full input scan,
    // caught by the scan-leaf budgets on q69/q79/q113).
    val vals = df.select(grp.as("g"), value.cast("long").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
    val byV = vals.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("band", floor(col("v") / bandWidth))
    val wLocal = Window.partitionBy(col("g"), col("band")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = byV.withColumn("lc", sum(col("cnt")).over(wLocal))
    val wBand = Window.partitionBy(col("g")).orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byV.groupBy(col("g"), col("band"))
      .agg(sum(col("cnt")).as("t"))
      .select(col("g"), col("band"),
        coalesce(sum(col("t")).over(wBand), lit(0L)).as("off"))
    // n from the already-reduced byV frame, not `vals`: byV's exchange is
    // canonical-identical to the one under local/offsets, so ReuseExchange
    // serves all three from ONE input scan + shuffle — deriving n from
    // `vals` would cost a second full scan of the raw input per call.
    val n = byV.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    // cum = inclusive rank of the LAST occurrence of v; v is the r-th
    // smallest for every r in (cum−cnt, cum], so "the value at rank r"
    // is min(v where cum ≥ r).
    // Both join sides are bounded frames — offsets is (#groups × #bands)-
    // sized, n is #groups-sized — so broadcast explicitly: the estimator
    // can't see that through the agg-over-agg lineage, and a sort-merge
    // join here would re-shuffle the full distinct-value frame.
    // band joins with <=> — semantically identical (band = floor(v/w) of
    // a non-null v is never null) but it stops InferFiltersFromConstraints
    // from pushing an isnotnull(FLOOR(v/w)) predicate into THIS branch's
    // scan only, which made the three byV subtrees canonicalize
    // differently and silently disabled AQE stage reuse: measured 3 full
    // input scans + 3 identical (g,v) shuffles per call on the round-8
    // plans, vs 1 scan + 1 with reuse restored.
    val cum = local.join(
        broadcast(offsets.withColumnRenamed("g", "g_o")
          .withColumnRenamed("band", "band_o")),
        col("g") === col("g_o") && col("band") <=> col("band_o"))
      .select(col("g"), col("v"), (col("off") + col("lc")).as("c"))
      .join(broadcast(n), Seq("g"))
    def loRank(k: Int) = expr(s"((n - 1) * $k) div 1000") + lit(1L)
    def frac(k: Int)   = expr(s"((n - 1) * $k) % 1000")
    val picks = permilles.flatMap { k =>
      Seq(min(when(col("c") >= loRank(k), col("v"))).as(s"lo_$k"),
        min(when(col("c") >= loRank(k) +
          when(frac(k) > 0, 1L).otherwise(0L), col("v"))).as(s"hi_$k"))
    }
    val agg = cum.groupBy(col("g"), col("n")).agg(picks.head, picks.tail: _*)
    val outs = permilles.map { k =>
      (col(s"lo_$k") * (lit(1000L) - frac(k)) + col(s"hi_$k") * frac(k))
        .as(s"p${k}_x1000")
    }
    agg.select(col("g") +: col("n") +: outs: _*)
  }

  /** Exact Gini concentration per group, in ppm — the inequality read a
    * mixture allocator wants next to per-source token totals: a source
    * whose mass is a few huge documents (G → 1) behaves nothing like one
    * of uniform documents (G = 0) under any per-document sampling policy.
    *
    * Uses the discrete closed form over VALUE runs: with C the inclusive
    * rank of value v's last occurrence and c its count, the rank-weighted
    * sum 2·Σᵢ i·x₍ᵢ₎ telescopes to Σ_v v·c·(2C−c+1), so
    * G = (Σ v·c·(2C−c+1) − (n+1)·Σx) / (n·Σx) — every term an integer.
    * Ranks come from [[orderStatsPermille]]'s banded two-phase prefix sum
    * (value-count agg → band-local cumsum → #bands-sized offsets window),
    * NEVER a per-group global sort: the only per-group-sized frame is the
    * distinct-value table, and the unpartitioned work is #bands rows. The
    * band join keeps the `<=>` discipline (see orderStatsPermille's
    * comment — a plain equi-join on the computed band key
    * de-canonicalizes the shared byV subtree and silently kills AQE
    * exchange reuse). Final arithmetic rides DECIMAL(38,0): at extreme
    * scale v·c·2C exceeds a BIGINT.
    */
  def giniByGroup(df: DataFrame, grp: Column, value: Column,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    // NULL group keys dropped up front — documented behavior, and the
    // same branch-canonicalization guard as orderStatsPermille (see its
    // comment): the equi-join on g below would drop them silently.
    val vals = df.select(grp.as("g"), value.cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") >= 0 && col("g").isNotNull)
    val byV = vals.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("band", floor(col("v") / bandWidth))
    val wLocal = Window.partitionBy(col("g"), col("band")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = byV.withColumn("lc", sum(col("cnt")).over(wLocal))
    val wBand = Window.partitionBy(col("g")).orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byV.groupBy(col("g"), col("band"))
      .agg(sum(col("cnt")).as("t"))
      .select(col("g"), col("band"),
        coalesce(sum(col("t")).over(wBand), lit(0L)).as("off"))
    val cum = local.join(
        broadcast(offsets.withColumnRenamed("g", "g_o")
          .withColumnRenamed("band", "band_o")),
        col("g") === col("g_o") && col("band") <=> col("band_o"))
      .select(col("g"), col("v"), col("cnt"),
        (col("off") + col("lc")).as("c"))
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    cum.groupBy(col("g"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("v") * col("cnt")).as("s"),
        sum(col("v").cast(d38) * col("cnt") *
          (lit(2L) * col("c") - col("cnt") + 1L)).as("t"))
      .select(col("g"), col("n").as("n_rows"), col("s").as("value_total"),
        when(col("s") > 0, expr(
          "(t - (CAST(n AS DECIMAL(38,0)) + 1) * s) * 1000000 div (CAST(n AS DECIMAL(38,0)) * s)"))
          .as("gini_ppm"))
  }

  /** DuckDB replay of [[orderStatsPermille]] as a CTE chunk: `srcSql`
    * must select columns `g` and BIGINT `v`; the produced CTEs end in
    * `os_q` with columns (g, n, p{k}_x1000 ...). The rank picks ride
    * row_number() — the oracle replays RESULTS, not plans.
    */
  def orderStatsOracleSql(srcSql: String, permilles: Seq[Int],
      prefix: String = "os"): String = {
    val pickCols = permilles.flatMap { k =>
      Seq(s"MIN(CASE WHEN rn = (((n - 1) * $k) // 1000) + 1 THEN v END) AS lo_$k",
        s"MIN(CASE WHEN rn = (((n - 1) * $k) // 1000) + 1 + (CASE WHEN (((n - 1) * $k) % 1000) > 0 THEN 1 ELSE 0 END) THEN v END) AS hi_$k")
    }.mkString(",\n    ")
    val outCols = permilles.map { k =>
      s"CAST(lo_$k * (1000 - (((n - 1) * $k) % 1000)) + hi_$k * (((n - 1) * $k) % 1000) AS BIGINT) AS p${k}_x1000"
    }.mkString(",\n    ")
    s"""${prefix}_v AS ($srcSql),
       |${prefix}_r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn FROM ${prefix}_v),
       |${prefix}_n AS (SELECT g, COUNT(*) AS n FROM ${prefix}_v GROUP BY g),
       |${prefix}_p AS (SELECT ${prefix}_r.g, ${prefix}_n.n,
       |    $pickCols
       |  FROM ${prefix}_r JOIN ${prefix}_n USING (g) GROUP BY ${prefix}_r.g, ${prefix}_n.n),
       |${prefix}_q AS (SELECT g, n,
       |    $outCols
       |  FROM ${prefix}_p)""".stripMargin
  }

  /** Pairwise Pearson correlation matrix over fixed-point variables, in
    * ONE aggregation pass (feature-redundancy scan before training /
    * mart design). `vars` maps output names to already-quantized
    * integer-valued columns (e.g. a 2-decimal money column × 100); the
    * fixed-point scales cancel exactly in r, so the choice of scale
    * only bounds magnitudes.
    *
    * All sufficient statistics — n, Σx, Σx², Σxy for every pair — are
    * exact DECIMAL(38,0) sums computed in a single scan (k vars → one
    * row of 1 + 2k + C(k,2) aggregates; the melt to pair rows happens on
    * that one-row frame, never on data). r's final steps are identical-
    * operand IEEE double ops: the two variance numerators take separate
    * sqrt's before multiplying, keeping every intermediate inside both
    * double range and DECIMAL(38,0) (their direct product n²·σ²ₓσ²ᵧ
    * would overflow 38 digits at scale). Zero-variance columns yield
    * NULL rather than a 0/0. r is reported as `corr_micro` =
    * ⌊10⁶·r⌋ BIGINT (floor of one IEEE multiply — version-stable where
    * ROUND-at-scale is not; floor rounds toward −∞ identically in both
    * engines, which matters since r may be negative).
    *
    * Magnitude bound: n·Σx² must fit 38 digits — e.g. values ≤ 1e7
    * micro-units allow ~1e10 rows; pick the quantization accordingly.
    */
  def corrMatrix(df: DataFrame, vars: Seq[(String, Column)]): DataFrame = {
    require(vars.size >= 2, "corrMatrix needs at least two variables")
    val d38 = DecimalType(38, 0)
    val names = vars.map(_._1)
    val proj = df.select(vars.map { case (n, c) => c.cast("long").as(n) }: _*)
    val pairs = for (i <- names.indices; j <- (i + 1) until names.size)
      yield (names(i), names(j))
    val aggs =
      names.map(n => sum(col(n).cast(d38)).as(s"s_$n")) ++
      names.map(n => sum(col(n).cast(d38) * col(n).cast(d38)).as(s"ss_$n")) ++
      pairs.map { case (a, b) =>
        sum(col(a).cast(d38) * col(b).cast(d38)).as(s"sp_${a}_$b") }
    val one = proj.agg(count(lit(1)).cast(d38).as("n"), aggs: _*)
    def varNum(x: String) =
      (col("n") * col(s"ss_$x") - col(s"s_$x") * col(s"s_$x")).cast("double")
    val pairStructs = pairs.map { case (a, b) =>
      val covNum = (col("n") * col(s"sp_${a}_$b") -
        col(s"s_$a") * col(s"s_$b")).cast("double")
      struct(lit(a).as("var_a"), lit(b).as("var_b"),
        when(varNum(a) > 0 && varNum(b) > 0,
          micro(covNum / (sqrt(varNum(a)) * sqrt(varNum(b)))))
          .as("corr_micro"))
    }
    one.select(col("n").cast("long").as("n"),
        explode(array(pairStructs: _*)).as("p"))
      .select(col("p.var_a"), col("p.var_b"), col("n"), col("p.corr_micro"))
  }

  /** Benford first-significant-digit audit (Benford 1938; Nigrini's
    * forensic-accounting standard): naturally-grown multiplicative
    * amounts follow P(d) = log10(1 + 1/d), so a feed whose first-digit
    * mass deviates hard is synthetic, truncated, capped, or manually
    * keyed — the classic "is this amount column organic" gate, and a
    * cheap drift alarm per ingest batch. Measured here: the synthetic
    * TPC-H-ish prices read ~uniform over digits 1–4 (dev up to ~128k
    * ppm from Benford) — exactly the violation the audit exists to flag.
    *
    * Exactness discipline: amounts quantize to integer cents through
    * DECIMAL(18,2) (the q44 pattern); the first digit is the first char
    * of the INTEGER's decimal string — integer-to-string is unambiguous
    * on every engine, unlike float formatting — and the nine Benford
    * expectations are precomputed ppm literals (⌊log10(1+1/d)·10⁶+½⌋),
    * so no libm call happens at query time. Zero/negative/null amounts
    * are excluded (Benford is defined on positive magnitudes).
    *
    * Scale shape: one scan → one ≤9-group aggregation with map-side
    * partials; the expectation table is a 9-row literal explode and the
    * total rides a window over the 9-row joined frame (bounded by
    * construction, never data-sized). Always emits all 9 digits — a
    * digit with zero mass is the loudest signal and must not vanish.
    */
  def benfordAudit(df: DataFrame, amount: Column): DataFrame = {
    val benfordPpm = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
      9 -> 45757L)
    val cents = df
      .select((amount.cast(DecimalType(18, 2)) * lit(100)).cast("long")
        .as("cents"))
      .filter(col("cents").isNotNull && col("cents") > 0)
    val obs = cents
      .select(substring(col("cents").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val exp = df.sparkSession.range(1)
      .select(explode(array(benfordPpm.map { case (d, p) =>
        struct(lit(d.toLong).as("digit"), lit(p).as("benford_ppm"))
      }: _*)).as("e"))
      .select(col("e.digit").as("digit"), col("e.benford_ppm").as("benford_ppm"))
    // constant-key window over the 9-row joined frame: bounded by
    // construction (digits 1-9), never data-sized
    val wAll = Window.partitionBy(lit(0))
    exp.join(obs, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("n_rows", sum(col("n")).over(wAll))
      .withColumn("obs_ppm",
        when(col("n_rows") > 0, expr("(n * 1000000) div n_rows")))
      .select(col("digit"), col("n"), col("n_rows"), col("obs_ppm"),
        col("benford_ppm"),
        abs(col("obs_ppm") - col("benford_ppm")).as("abs_dev_ppm"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * per-row integer quality signals into one robust score: each row's
    * EXACT corpus-wide competition rank per signal (SQL `rank()`
    * descending — 1 = best, ties share the min rank), fused as
    * Σ_signals ⌊10⁹ / (k + rank)⌋. Rank fusion is the standard answer to
    * "combine quality signals whose scales can't be calibrated against
    * each other" (and hybrid lexical+vector retrieval): a signal only
    * contributes ORDER, so a miscalibrated scorer can't dominate by
    * magnitude, and k damps rank-1 outliers.
    *
    * The scale problem is the ranks: rank() over a 100 TB corpus is an
    * unpartitioned global sort. This rides the banded two-phase prefix
    * sum instead ([[orderStatsPermille]]'s discipline): per signal,
    * rank(v) = n − c(v) + 1 where c(v) is the inclusive cumulative count
    * of values ≤ v — computed from the (sig, v) distinct-value frame with
    * band-local window sums plus a bounded #bands-per-signal offsets
    * fold; ranks join back to rows on (sig, v). No corpus-sized frame is
    * ever globally sorted or single-partitioned; the band join keeps the
    * `<=>` discipline (see orderStatsPermille's comment).
    *
    * `signals` are (name, column, bandWidth): values must be
    * non-negative exact integers (the suite's fixed-point discipline —
    * ppm/milli encode ratios); bandWidth bounds #bands ≈ max_v/width per
    * signal. Rows where a signal is null skip that signal (its rank_
    * column is null, the fusion sums the rest) — documented fail-open.
    * Output: (id, rank_&lt;name&gt;..., rrf_nano).
    */
  def rrfFusion(df: DataFrame, idCol: Column,
      signals: Seq[(String, Column, Long)], k: Int = 60,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    require(signals.nonEmpty, "rrfFusion: need at least one signal")
    require(signals.forall(_._3 > 0), "rrfFusion: bandWidths must be > 0")
    require(k >= 0, s"rrfFusion: k must be >= 0, got $k")
    // Melt to one (id, sig, v) stream — cached: the distinct-value rank
    // frame AND the rank join both read it.
    val melted = scope.cached(
      df.select(idCol.as("id"),
          explode(array(signals.map { case (n, c, _) =>
            struct(lit(n).as("sig"), c.cast("long").as("v")) }: _*)).as("s"))
        .select(col("id"), col("s.sig").as("sig"), col("s.v").as("v"))
        .filter(col("v").isNotNull))
    val bandW = signals.tail.foldLeft(
        when(col("sig") === signals.head._1, lit(signals.head._3))) {
      case (acc, (n, _, w)) => acc.when(col("sig") === n, lit(w))
    }
    val byV = melted.groupBy(col("sig"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("band", floor(col("v") / bandW))
    val wLocal = Window.partitionBy(col("sig"), col("band")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = byV.withColumn("lc", sum(col("cnt")).over(wLocal))
    val wBand = Window.partitionBy(col("sig")).orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byV.groupBy(col("sig"), col("band"))
      .agg(sum(col("cnt")).as("t"))
      .select(col("sig"), col("band"),
        coalesce(sum(col("t")).over(wBand), lit(0L)).as("off"))
    val n = byV.groupBy(col("sig")).agg(sum(col("cnt")).as("n"))
    // Both join sides are bounded (see orderStatsPermille's comment on
    // why the estimator can't see that): broadcast explicitly.
    val ranks = local.join(
        broadcast(offsets.withColumnRenamed("sig", "sig_o")
          .withColumnRenamed("band", "band_o")),
        col("sig") === col("sig_o") && col("band") <=> col("band_o"))
      .join(broadcast(n), Seq("sig"))
      .select(col("sig"), col("v"),
        (col("n") - (col("off") + col("lc")) + lit(1L)).as("rnk"))
    val perSig = signals.map { case (nm, _, _) =>
      max(when(col("sig") === nm, col("rnk"))).as(s"rank_$nm") }
    val fused = sum(expr(s"1000000000 div (${k.toLong} + rnk)")).as("rrf_nano")
    melted.join(ranks, Seq("sig", "v"))
      .groupBy(col("id"))
      .agg(perSig.head, (perSig.tail :+ fused): _*)
  }
}
