package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** Bucketed staging tables must make key joins co-located: joining two
  * tables bucketed on the same key produces NO shuffle exchange on either
  * side.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def shuffles(plan: SparkPlan): Int =
    plan.collect { case e: ShuffleExchangeExec => e }.size

  test("same-key bucketed join plans without a shuffle exchange") {
    val orders = (1L to 1000L).map(i => (i, s"order$i")).toDF("id", "o")
    val details = (1L to 3000L).map(i => (i % 1000 + 1, s"d$i")).toDF("id", "d")
    Sinks.bucketedTable(orders, "b_orders", Seq("id"), buckets = 8)
    Sinks.bucketedTable(details, "b_details", Seq("id"), buckets = 8)

    // Disable broadcast so the join strategy must exploit bucketing.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_details"), "id")
      assert(joined.count() === 3000L)
      val plan = joined.queryExecution.executedPlan
      assert(shuffles(plan) === 0, plan.toString)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_details")
    }
  }

  test("bucketedTable survives a self-referential rebuild (write-then-swap)") {
    try {
      Sinks.bucketedTable((1L to 10L).toDF("id"), "b_self", Seq("id"), 4)
      // rebuild the table FROM a plan that reads the table itself — the
      // old data must stay readable until the new write completes
      val rebuilt = spark.table("b_self")
        .unionByName((11L to 15L).toDF("id"))
      Sinks.bucketedTable(rebuilt, "b_self", Seq("id"), 4)
      assert(spark.table("b_self").count() === 15L)
    } finally spark.sql("DROP TABLE IF EXISTS b_self")
  }
}
