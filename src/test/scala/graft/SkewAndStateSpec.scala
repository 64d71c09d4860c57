package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.streaming.{EventStream, UserEvent}

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
}
