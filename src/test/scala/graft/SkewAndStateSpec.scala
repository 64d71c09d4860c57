package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.streaming.{ChangeEvent, EventStream, UserEvent}

class SkewAndStateSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the unsalted join under skew") {
    // 90% of left rows share one hot key.
    val left = ((1 to 900).map(_ => (1L, "hot")) ++
      (2 to 101).map(i => (i.toLong, s"v$i"))).toDF("k", "lv")
    val right = (1 to 101).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).collect().map(_.toSeq).toList.sortBy(_.toString)
    val salted = Skew.saltedJoin(left, right, Seq("k"), factor = 8)
      .select(plain.headOption.map(_ => col("k")).getOrElse(col("k")),
        col("lv"), col("rv"))
      .collect().map(_.toSeq).toList.sortBy(_.toString)
    assert(salted === plain)
    assert(salted.count(_.head === 1L) === 900)
  }

  test("flatMapGroupsWithState accumulates per-user totals across batches") {
    val src = Files.createTempDirectory("graft-state-src").toString
    Seq(UserEvent(1L, 10.0), UserEvent(1L, 5.0), UserEvent(2L, 1.0))
      .toDF().write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(Seq.empty[UserEvent].toDF().schema).parquet(src)
      .as[UserEvent]
    val q = EventStream.statefulUserTotals(stream)
      .writeStream.format("memory").queryName("state_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("state_test")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(out === Array((1L, 2L, 15.0), (2L, 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming changelog compaction: seq wins across batches, stale events ignored") {
    val src = Files.createTempDirectory("graft-cdc-src").toString
    Seq(ChangeEvent(1L, 1L, "set", "a"), ChangeEvent(2L, 1L, "set", "x"))
      .toDF().write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema(Seq.empty[ChangeEvent].toDF().schema).parquet(src)
      .as[ChangeEvent]
    val q = EventStream.compactedChangelog(stream)
      .writeStream.format("memory").queryName("cdc_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: key 1 tombstoned (newer seq), key 2 gets a STALE event
      Seq(ChangeEvent(1L, 2L, "del", ""), ChangeEvent(2L, 0L, "set", "stale"))
        .toDF().write.mode("append").parquet(src)
      q.processAllAvailable()
      // latest emission per key = the compacted current state
      val out = spark.table("cdc_test")
        .groupBy("key")
        .agg(max_by(struct(col("seq"), col("deleted"), col("payload")),
          col("seq")).as("s"))
        .select(col("key"), col("s.seq"), col("s.deleted"), col("s.payload"))
        .orderBy("key").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getString(3)))
      assert(out === Array((1L, 2L, true, ""), (2L, 1L, false, "x")))
    } finally q.stop()
  }

  test("skewReport: exact shape stats on a known distribution") {
    val rows = (Seq.fill(6)("A") ++ Seq.fill(2)("B") ++ Seq("C", "D"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val out = Skew.skewReport(rows, "k").collect().head
    // counts sorted: [1, 1, 2, 6] -> p50 = 1.5, p99 = 2 + 0.97*(6-2) = 5.88
    // (reported ×1000 as exact integers — the round-8 hash discipline).
    assert(out.getLong(0) === 4L)       // n_keys
    assert(out.getLong(1) === 10L)      // n_rows
    assert(out.getLong(2) === 6L)       // max_cnt
    assert(out.getLong(3) === 1500L)    // p50_cnt_x1000
    assert(out.getLong(4) === 5880L)    // p99_cnt_x1000 = 2·30 + 6·970
    assert(out.getLong(5) === 2400000L) // skew_ratio_ppm = 6/(10/4) ppm
    assert(out.getLong(6) === 1000000L) // top10_share_ppm: only 4 keys exist
  }

  test("streaming changelog compaction: equal-seq tie resolves by (op, payload), not arrival order") {
    val src = Files.createTempDirectory("graft-cdc-tie").toString
    // Two DISTINCT events, same key and seq, in one batch: the winner must
    // be a pure function of the event set (max by (seq, op, payload) →
    // payload "b"), never of partition/file iteration order.
    Seq(ChangeEvent(9L, 5L, "set", "b"), ChangeEvent(9L, 5L, "set", "a"))
      .toDF().repartition(2).write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema(Seq.empty[ChangeEvent].toDF().schema).parquet(src)
      .as[ChangeEvent]
    val q = EventStream.compactedChangelog(stream)
      .writeStream.format("memory").queryName("cdc_tie_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("cdc_tie_test")
        .select("key", "seq", "payload").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(out === Array((9L, 5L, "b")))
    } finally q.stop()
  }
}
