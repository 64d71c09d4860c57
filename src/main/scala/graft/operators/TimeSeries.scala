package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series shapes a warehouse user expects for free: interval
  * coalescing (gaps-and-islands), calendar gap-fill with forward fill,
  * first-order state transitions, and per-group least-squares trend.
  *
  * The reference's analytics surface stops at daily marts
  * (`sql/marts/create_daily_sales_summary.sql`); these complete the
  * continuous-time family the same users reach for next. All four are
  * window/aggregate compositions — one shuffle on the series key, no
  * self-joins, no cross products — so each scales exactly like a keyed
  * groupBy at 100 TB.
  */
object TimeSeries {

  /** Merge overlapping-or-touching intervals per key (gaps-and-islands).
    *
    * Input columns are epoch-microsecond longs (exact arithmetic — double
    * epoch math corrupts sub-second digits, and timestamp-interval
    * arithmetic differs across engines at DST boundaries). An interval
    * whose start equals a prior end MERGES (closed-interval semantics).
    *
    * Shape: one shuffle on `key`, one per-key sort shared by both window
    * frames, one partial-aggregated groupBy — the running `max(end)` trick
    * needs no self-join, so cost is O(n log n) per key regardless of how
    * many intervals overlap. Per-key data (a user's events) is bounded, so
    * the per-key sort never spills pathologically at scale.
    *
    * Output: key, island, start_us, end_us, n_rows (one row per merged
    * interval).
    */
  def coalesceIntervals(df: DataFrame, key: String,
      startUs: Column, endUs: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("_s"), col("_e"))
    // Running max of PRIOR ends: an interval starts a new island iff it
    // begins strictly after everything before it has closed.
    val prevMaxEnd = max(col("_e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.select(col(key), startUs.as("_s"), endUs.as("_e"))
      .withColumn("_new",
        when(prevMaxEnd.isNull || col("_s") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("island"))
      .agg(min(col("_s")).as("start_us"), max(col("_e")).as("end_us"),
        count(lit(1)).as("n_rows"))
  }

  /** Densify a (group, day) daily series onto its per-group calendar spine
    * and forward-fill the last active day.
    *
    * `daily` must have one row per (group, day) (the output of a daily
    * groupBy); `day` is days-since-epoch as long. Missing days appear with
    * `is_gap = true` and `last_active_day` pointing at the most recent
    * observed day — the portable forward-fill: a running MAX over a
    * monotone column equals "last non-null", with no reliance on
    * IGNORE NULLS support. Joining `last_active_day` back to `daily`
    * carries any metric forward (see q103).
    *
    * Shape: the spine is generated per group from its own [min, max] span
    * (`sequence` + explode — rows materialize distributed, nothing on the
    * driver), then one key-partitioned left join + window. Spine size is
    * groups × span-days — calendar-bounded, orders of magnitude below row
    * count at 100 TB.
    */
  def gapFillDaily(daily: DataFrame, group: String, day: String): DataFrame = {
    val spine = daily.groupBy(col(group))
      .agg(min(col(day)).as("_d0"), max(col(day)).as("_d1"))
      .select(col(group), explode(sequence(col("_d0"), col("_d1"))).as(day))
    val w = Window.partitionBy(col(group)).orderBy(col(day))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily.withColumn("_present", lit(1)), Seq(group, day), "left")
      .withColumn("is_gap", col("_present").isNull)
      .withColumn("last_active_day",
        max(when(col("_present").isNotNull, col(day))).over(w))
      .drop("_present")
  }

  /** Interval-overlap join: all (left, right) pairs whose closed intervals
    * intersect (`lStart <= rEnd && rStart <= lEnd` — touching counts, with
    * `overlap_us = 0`), WITHOUT a nested-loop join.
    *
    * The naive range-predicate join plans as BroadcastNestedLoopJoin —
    * every left interval scans every right interval. This discretizes
    * time into `bucketUs`-sized buckets: each interval explodes to the
    * buckets it spans, the join is an EQUI-join on bucket + the exact
    * overlap predicate, so Spark shuffles both sides on the bucket key
    * and AQE's skew handling applies to hot buckets. A pair sharing
    * several buckets is emitted ONCE — only at the bucket containing
    * `greatest(lStart, rStart)` (which both sides span whenever they
    * overlap) — so no post-join distinct is needed.
    *
    * `bucketUs` is the caller's lever: ~ the typical interval length.
    * Too small → wide explodes (span/bucketUs rows per interval); too
    * large → buckets pair intervals that don't overlap and the exact
    * predicate discards them post-shuffle.
    *
    * Column names of the two sides must be disjoint (pre-rename);
    * outputs all left + right columns + `overlap_us`.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"overlapJoin requires disjoint column names; both sides have: ${clash.mkString(", ")}")
    // floor-div via (s − pmod(s, b)) / b, NOT floor(s / b): the bare
    // double division misrounds when s sits exactly on a bucket boundary
    // (quotient k can round to k−ε → floor k−1 → interval lands in the
    // wrong bucket and a boundary pair is silently missed). Subtracting
    // the mod makes the dividend an exact multiple, so the division is
    // exact for |k·b| < 2^53 — far above any epoch-µs timeline.
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(bucketUs))) / bucketUs).cast(LongType)
    def bucketed(df: DataFrame, s: String, e: String) = df.withColumn("__bucket",
      explode(sequence(bucketOf(col(s)), bucketOf(col(e)))))
    val l = bucketed(left, lStart, lEnd)
    val r = bucketed(right, rStart, rEnd).withColumnRenamed("__bucket", "__rbucket")
    l.join(r, col("__bucket") === col("__rbucket") &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bucket") === bucketOf(greatest(col(lStart), col(rStart))))
      .drop("__bucket", "__rbucket")
      .withColumn("overlap_us",
        least(col(lEnd), col(rEnd)) - greatest(col(lStart), col(rStart)))
  }

  /** Generalized as-of join (pandas merge_asof parity): for each probe
    * row, the nearest quote row per key at-or-before (`backward`),
    * at-or-after (`forward`), or closest-either-side (`nearest`, ties →
    * backward, pandas' rule) within `toleranceUs`.
    *
    * Same design as q41's backward composition: union both sides, ONE
    * key shuffle, window passes over the shared (ts, side) sort — never
    * a range self-join. Equal-timestamp ties are inclusive: the side
    * order in the sort puts quotes before probes for backward/nearest
    * (an equal-ts quote is "at-or-before") and after probes for forward.
    *
    * Output: every probe row (null-match rows kept) + `asof_ts`,
    * `asof_val` (the quote's `quoteVal`), `asof_dist_us` (unsigned).
    * Probe/quote ts are epoch-µs longs, exact arithmetic end to end.
    */
  def asofJoin(probe: DataFrame, quote: DataFrame, key: String,
      probeTs: String, quoteTs: String, quoteVal: String,
      direction: String = "backward",
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    val qType = new StructType()
      .add("ts", quote.schema(quoteTs).dataType)
      .add("v", quote.schema(quoteVal).dataType)
    val pType = StructType(probe.schema.fields)
    val pSide = probe.select(col(key).as("__k"), col(probeTs).as("__ts"),
      lit(0).as("__isq"), lit(null).cast(qType).as("__q"),
      struct(probe.columns.map(col): _*).as("__row"))
    val qSide = quote.filter(col(quoteTs).isNotNull)
      .select(col(key).as("__k"), col(quoteTs).as("__ts"),
        lit(1).as("__isq"),
        struct(col(quoteTs).as("ts"), col(quoteVal).as("v")).as("__q"),
        lit(null).cast(pType).as("__row"))
    // Tie order: quotes first for backward/nearest, probes first for
    // forward — makes the equal-ts quote land in the matching frame.
    val tie = if (direction == "forward") col("__isq").asc else col("__isq").desc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__ts").asc, tie, col("__q.v").asc_nulls_first)
    val back = last(col("__q"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val fwd = first(col("__q"), ignoreNulls = true)
      .over(w.rowsBetween(1, Window.unboundedFollowing))
    val withCand = direction match {
      case "backward" => pSide.unionByName(qSide).withColumn("__b", back)
        .withColumn("__f", lit(null).cast(pSide.schema("__q").dataType))
      case "forward" => pSide.unionByName(qSide)
        .withColumn("__b", lit(null).cast(pSide.schema("__q").dataType))
        .withColumn("__f", fwd)
      case "nearest" => pSide.unionByName(qSide)
        .withColumn("__b", back).withColumn("__f", fwd)
    }
    val bDist = col("__ts") - col("__b.ts")
    val fDist = col("__f.ts") - col("__ts")
    val pick = when(col("__b").isNotNull && col("__f").isNotNull,
        when(bDist <= fDist, col("__b")).otherwise(col("__f")))
      .otherwise(coalesce(col("__b"), col("__f")))
    withCand.filter(col("__isq") === 0)
      .withColumn("__m", pick)
      .withColumn("__m", when(
        col("__m").isNotNull &&
          abs(col("__ts") - col("__m.ts")) <= toleranceUs, col("__m")))
      .select(col("__row.*"), col("__m.ts").as("asof_ts"),
        col("__m.v").as("asof_val"),
        abs(col("__ts") - col("__m.ts")).as("asof_dist_us"))
  }

  /** First-order transition counts and probabilities of `state` along each
    * key's ordered series: lag over (key, order), then a (prev, next)
    * groupBy. `prob` is row-count / per-prev total — a single long/long
    * division in IEEE double, bit-identical across engines.
    *
    * Shape: one shuffle on `key` for the lag, one on (prev, next) for the
    * count (partial-aggregated), one tiny window over the |states|²-sized
    * count frame. The transition matrix itself is vocabulary-sized, never
    * data-sized.
    */
  def transitions(df: DataFrame, key: String, state: String,
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val counts = df
      .withColumn("prev_state", lag(col(state), 1).over(w))
      .filter(col("prev_state").isNotNull)
      .groupBy(col("prev_state"), col(state).as("next_state"))
      .agg(count(lit(1)).as("n_transitions"))
    val wp = Window.partitionBy(col("prev_state"))
    // prob is the convenient double; prob_ppm is the exact integral
    // fixed-point twin (⌊10⁶·n/total⌋ in DECIMAL(38,0) space) — emit the
    // latter when the result crosses an engine-comparison hash, so no
    // floating-point bit pattern is part of the contract.
    counts
      .withColumn("_total", sum(col("n_transitions")).over(wp))
      .withColumn("prob", col("n_transitions") / col("_total"))
      .withColumn("prob_ppm",
        expr("(cast(n_transitions as decimal(38,0)) * 1000000) div " +
          "cast(_total as decimal(38,0))"))
      .drop("_total")
  }

  /** Per-group ordinary-least-squares fit of y over integer x via EXACT
    * sufficient statistics: y is fixed-point micro-units (DECIMAL(18,6) →
    * long), all five sums (n, Σx, Σy, Σxy, Σx²) accumulate in
    * DECIMAL(38,0) integer space, and the slope/intercept formulas touch
    * floating point only in the final scalar divisions — so the result is
    * independent of partitioning/summation order, unlike builtin
    * regr_slope (double accumulation). One partial-aggregated shuffle on
    * `group`; the fit math runs on a groups-sized frame.
    *
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), intercept = (Σy − slope·Σx)/n.
    */
  def olsByGroup(df: DataFrame, group: String, x: Column, y: Column): DataFrame =
    olsFromUnits(df.select(col(group), x.cast(LongType).as("_xu"),
      (y.cast(DecimalType(18, 6)) * lit(1000000)).cast(LongType).as("_yu")),
      group, unitsPerX = 1L, unitsPerY = 1000000L)

  /** [[olsByGroup]] for CONTINUOUS x (e.g. log-log fits): both x and y are
    * quantized to fixed-point micro-units, so the sufficient statistics
    * stay exact-integer and the fit stays partitioning-order-independent.
    * Quantization granularity (1e-6) is the fit's resolution floor.
    */
  def olsByGroupXY(df: DataFrame, group: String, x: Column, y: Column): DataFrame =
    olsFromUnits(df.select(col(group),
      (x.cast(DecimalType(18, 6)) * lit(1000000)).cast(LongType).as("_xu"),
      (y.cast(DecimalType(18, 6)) * lit(1000000)).cast(LongType).as("_yu")),
      group, unitsPerX = 1000000L, unitsPerY = 1000000L)

  /** Shared OLS core over fixed-point inputs: `_xu = x·unitsPerX`,
    * `_yu = y·unitsPerY` as longs. All five sums in DECIMAL(38,0) integer
    * space; floating point only in the final scalar steps, whose exact
    * operation ORDER (divide, then ·unitsPerX, then /unitsPerY) is part of
    * the cross-engine contract — oracles must replay it verbatim.
    */
  private def olsFromUnits(base: DataFrame, group: String,
      unitsPerX: Long, unitsPerY: Long): DataFrame = {
    val d38 = DecimalType(38, 0)
    val stats = base.groupBy(col(group)).agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col("_xu").cast(d38)).as("sx"),
      sum(col("_yu").cast(d38)).as("sy_units"),
      sum((col("_xu").cast(d38) * col("_yu").cast(d38))).as("sxy_units"),
      sum((col("_xu").cast(d38) * col("_xu").cast(d38))).as("sxx"))
    // Exact integer numerator/denominator; the double steps see identical
    // operands in both engines, so the results match bit-for-bit.
    val slopeRaw =
      (col("n") * col("sxy_units") - col("sx") * col("sy_units")).cast(DoubleType) /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType) *
        lit(unitsPerX.toDouble) / lit(unitsPerY.toDouble)
    stats
      .withColumn("_slope_raw", slopeRaw)
      .select(col(group), col("n").cast(LongType).as("n"),
        round(col("_slope_raw"), 6).as("slope"),
        round((col("sy_units").cast(DoubleType) / lit(unitsPerY.toDouble) -
          col("_slope_raw") * (col("sx").cast(DoubleType) / lit(unitsPerX.toDouble))) /
          col("n").cast(DoubleType), 6).as("intercept"))
  }

  /** Point-in-time-correct feature snapshot (the feature-store
    * correctness contract, cf. the "time travel" requirement in the
    * public feature-store literature: a training row's features may use
    * ONLY what was known at its timestamp): per entity, features AS OF a
    * boundary T computed exclusively from rows with ts &lt; T — leakage-
    * free by construction, the producer the [[Sampling.purgedSplitAudit]]
    * consumer assumes. Features: event count, minutes since last event,
    * a recency-decayed activity weight, distinct event types, and the
    * exact micro-unit value sum.
    *
    * Everything is EXACT integers so a backfill replays identically:
    * ages ride `unix_micros` integer division; the decay is a sum of
    * powers of two (weight 2^(29−age_days) for events ≤ 29 days old,
    * 0 beyond — a half-life of exactly one day) so the fold is an
    * integer in [0, n·2^29], never a float exp whose summation order
    * could drift between engines or retries.
    *
    * Scale shape: ONE filtered scan, ONE per-entity aggregation (the
    * countDistinct adds its standard two-phase expand) — map-side
    * partials everywhere, no window, no join; exactly the keyed-groupBy
    * cost a 100 TB backfill can afford.
    */
  def pointInTimeFeatures(df: DataFrame, tsCol: Column, keyCol: Column,
      valueCol: Column, typeCol: Column, boundary: String,
      maxAgeDays: Int = 29): DataFrame = {
    require(boundary.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""),
      s"pointInTimeFeatures: boundary must be 'yyyy-MM-dd HH:mm:ss', got $boundary")
    // 32 is the overflow-safe ceiling, not a taste choice: the decay sum
    // accumulates up to 2^maxAgeDays PER EVENT, so at 32 a key needs
    // > 2^31 same-boundary-day events to overflow BIGINT (impossible for
    // any per-entity window this feature describes), while at the old cap
    // of 60 just 9 same-day events exceeded Long.MaxValue.
    require(maxAgeDays >= 0 && maxAgeDays <= 32,
      s"pointInTimeFeatures: maxAgeDays must be in [0, 32] (the per-event " +
        s"weight is 2^maxAgeDays; 32 leaves ~2^31 events of BIGINT " +
        s"headroom in the per-key sum), got $maxAgeDays")
    val b = expr(s"timestamp'$boundary'")
    val bUs = unix_micros(b)
    // exact non-negative integer division (a − a mod m)/m: the quotient
    // is an exact integer-valued double < 2^53 (ages are bounded), so
    // the cast is lossless — never a float ratio under the hash
    def idiv(a: Column, m: Long): Column =
      ((a - pmod(a, lit(m))) / lit(m)).cast("long")
    val ev = df
      .select(tsCol.as("ts"), keyCol.as("k"), valueCol.as("v"),
        typeCol.as("t"))
      .filter(col("ts").isNotNull && col("ts") < b)
      .withColumn("age_days", idiv(bUs - unix_micros(col("ts")), 86400000000L))
    ev.groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"),
        idiv(bUs - max(unix_micros(col("ts"))), 60000000L)
          .as("last_age_min"),
        sum(when(col("age_days") <= maxAgeDays,
          expr(s"shiftleft(1L, ${maxAgeDays} - age_days)"))
          .otherwise(0L)).as("recency_weight"),
        countDistinct(col("t")).as("n_event_types"),
        sum((col("v").cast(DecimalType(18, 6)) * lit(1000000)).cast("long"))
          .as("value_sum_micro"))
  }
}
