package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Typed rows for the stateful example (top-level for Encoder derivation). */
case class UserEvent(user_id: Long, value: Double)
case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

/** Typed rows for streaming changelog compaction. */
case class ChangeEvent(key: Long, seq: Long, op: String, payload: String)
case class CurrentState(key: Long, seq: Long, deleted: Boolean, payload: String)

/** Structured-Streaming parity for the reference's micro-batch semantics
  * (SURVEY §2.7): 10-min incremental cycles with overlapping lookback
  * windows, idempotent via PK dedup at the sink.
  *
  *  - trigger cadence  ≙ Trigger.ProcessingTime / AvailableNow (backfill)
  *  - lookback window  ≙ withWatermark + fail-open null handling
  *  - PK idempotency   ≙ dropDuplicates on business keys inside the stream
  */
object EventStream {

  /** The streaming twin of q19_hourly_events: hourly tumbling window per
    * event_type with a 1-hour watermark for late events.
    */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** The streaming twin of q101_sliding_distinct: overlapping 1 h / 30 min
    * windows of unique users. Exact COUNT DISTINCT is unsupported (and
    * its state unbounded) in a stream; the HLL++ sketch is the streaming
    * answer, and at per-window cardinalities far below the register count
    * it is exact in practice (q101's batch measurement: max relative
    * error 0 at every SF). The wide rsd-0.005 registers that made the
    * BATCH all-windows aggregation slow are affordable here: streaming
    * state holds only the watermark's few OPEN windows, not the whole
    * timeline.
    */
  def slidingDistinctUsers(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("win"))
      .agg(approx_count_distinct(col("user_id"), 0.005).as("approx_users"))
      .select(col("win.start").as("window_start"), col("approx_users"))

  /** In-stream exactly-once shaping: drop duplicate BUSINESS keys within
    * the watermark horizon — the streaming analogue of L4's PK dedup.
    * dropDuplicatesWithinWatermark dedups on the keys alone (a late
    * redelivery with a different event timestamp is still a duplicate);
    * dropDuplicates(keys :+ ts) would wrongly keep it.
    */
  def dedupedStream(events: DataFrame, keys: Seq[String]): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(keys.toArray)

  /** Backfill runner: process everything currently available, then stop —
    * the reference's manual-backfill DAG path (misa_crm_etl_dag.py:346-397)
    * with checkpointed exactly-once parquet output.
    */
  def runAvailableNow(transformed: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    transformed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Custom keyed state via flatMapGroupsWithState (SURVEY §2.7 notes the
    * reference needs none — this is the extension point a user of the
    * engine gets for state the built-in windows can't express): running
    * per-user event count + cumulative value, emitted on every batch.
    */
  def statefulUserTotals(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserTotal] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, UserTotal](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
          val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val updated = UserTotal(userId, n, v)
          state.update(updated)
          Iterator(updated)
      }
  }

  /** Streaming changelog compaction — the stateful twin of
    * `Relational.compactChangelog`: keyed state holds the highest-`seq`
    * event seen per key; each batch emits the key's refreshed current
    * state, flagged `deleted` when the winning op is a tombstone. Stale
    * redeliveries and out-of-order events collapse because state only
    * advances when `seq` increases — replaying the log (or re-reading a
    * checkpointed batch) converges to the same states, which is what
    * makes the sink idempotent.
    *
    * Like the batch operator, `seq` must be a total order per key. If two
    * DISTINCT events share a key and seq, the tie is broken by (op,
    * payload) so the winner is a pure function of the event set — never
    * of partition/file arrival order, which would diverge across replays.
    */
  def compactedChangelog(log: org.apache.spark.sql.Dataset[ChangeEvent])
      : org.apache.spark.sql.Dataset[CurrentState] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import log.sparkSession.implicits._
    log.groupByKey(_.key)
      .flatMapGroupsWithState[ChangeEvent, CurrentState](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[ChangeEvent], state: GroupState[ChangeEvent]) =>
          val latest = (state.getOption ++ batch)
            .maxBy(e => (e.seq, e.op, e.payload))
          state.update(latest)
          Iterator(CurrentState(key, latest.seq,
            deleted = latest.op == "del", payload = latest.payload))
      }
  }

  /** Stream-stream interval join: purchases matched to the same user's
    * clicks within `withinSeconds` BEFORE the purchase. Both sides carry
    * watermarks so the join state is bounded — the streaming twin of the
    * batch as-of shape (q41).
    */
  def streamStreamClickToPurchase(clicks: DataFrame, purchases: DataFrame,
      withinSeconds: Long): DataFrame =
    clickToPurchase(clicks, purchases, withinSeconds, "inner")

  /** Shared interval-join shape for the inner/left-outer variants: one
    * place owns the watermark horizon and the three-clause condition.
    */
  private def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      withinSeconds: Long, joinType: String): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $withinSeconds SECONDS"),
      joinType)
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** LEFT-OUTER stream-stream variant of the interval join: purchases
    * with NO qualifying click still emit (null-extended) once the
    * watermark passes their join window — attribution analyses need the
    * unattributed rows too, and the outer side's emission is exactly the
    * state-cleanup boundary, so state stays bounded like the inner form.
    */
  def streamStreamClickToPurchaseOuter(clicks: DataFrame, purchases: DataFrame,
      withinSeconds: Long): DataFrame =
    clickToPurchase(clicks, purchases, withinSeconds, "left_outer")

  /** Gap-based session windows IN the stream — the streaming twin of the
    * batch sessionization (q42): a silence longer than `gap` closes the
    * session. session_window keeps per-key open-session state bounded by
    * the watermark; output rows carry the session bounds.
    */
  def sessionizedStream(events: DataFrame, gap: String): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("n_events"))

  /** Read a parquet directory as a file stream (test/backfill source). */
  def parquetStream(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(srcDir)

  // --------------------------------------------- incremental mart in-stream

  /** Streaming incremental-mart maintenance — the reference's actual
    * production loop (a 10–15 min micro-batch cycle that aggregates ONLY
    * the new rows and folds them into the standing mart,
    * `dags/tiktok_shop_orders_etl_dag.py`-style) as a foreachBatch stream.
    *
    * Each micro-batch computes its line-grain partial
    * ([[graft.operators.Aggregations.dailySalesSummaryLines]]) and merges
    * it with the previous snapshot
    * ([[graft.operators.Aggregations.mergeDailySalesPartials]] —
    * bit-identical to a full recompute under the order-grain batch
    * contract: an order's lines arrive in one batch).
    *
    * Exactly-once discipline: the mart is VERSIONED SNAPSHOTS, one
    * `batch=<id>` directory per micro-batch, because a merge-and-
    * overwrite-in-place would DOUBLE-COUNT when foreachBatch replays a
    * failed batch. Writing snapshot `id` from snapshot `id−1` is a pure
    * function of (previous snapshot, batch) — a replay overwrites
    * `batch=<id>` with identical bytes. [[latestMart]] serves the newest
    * _SUCCESS-committed snapshot, so readers never see a torn write; the
    * snapshot is mart-sized (days × platforms), so rewriting it per cycle
    * is the cheap part of the job at any scale.
    */
  def incrementalMartStream(salesLines: DataFrame, martRoot: String,
      checkpointDir: String): StreamingQuery =
    salesLines.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val partial = graft.operators.Aggregations.dailySalesSummaryLines(batch)
        val parts = latestMart(spark, martRoot, maxBatchExclusive = id) match {
          case Some((_, prev)) => Seq(prev, partial)
          case None            => Seq(partial)
        }
        graft.operators.Aggregations.mergeDailySalesPartials(parts)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$martRoot/batch=$id")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow()).start()

  /** Newest _SUCCESS-committed mart snapshot under `martRoot`, optionally
    * restricted to batch ids below `maxBatchExclusive` (a replaying batch
    * must rebuild from its PREDECESSOR, never from its own torn write).
    */
  def latestMart(spark: SparkSession, martRoot: String,
      maxBatchExclusive: Long = Long.MaxValue): Option[(Long, DataFrame)] = {
    val root = new org.apache.hadoop.fs.Path(martRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val committed = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch=")) scala.util.Try(n.stripPrefix("batch=").toLong).toOption
        else None
      }
      .filter(id => id < maxBatchExclusive &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$martRoot/batch=$id/_SUCCESS")))
    if (committed.isEmpty) None
    else {
      val id = committed.max
      Some((id, spark.read.parquet(s"$martRoot/batch=$id")))
    }
  }
}
