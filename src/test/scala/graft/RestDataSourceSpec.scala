package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.restds.{RestCountingFetcher, RestFetcher, RestFetcherRegistry}

/** DSv2 REST source: filter + limit pushdown must reach the fetcher BEFORE
  * any fetch happens, and results must be correct regardless.
  */
class RestDataSourceSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  /** 1000 "orders" at epoch seconds 1000..1999; records every fetch call. */
  class FakeOrders extends RestFetcher {
    val calls = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long, Option[String], Option[Int])]()
    override def fullRange: (Long, Long) = (1000L, 2000L)
    override def fetch(from: Long, to: Long, status: Option[String],
        limit: Option[Int]): Seq[Map[String, Any]] = {
      calls.add((from, to, status, limit))
      val all = (math.max(from, 1000L) until math.min(to, 2000L)).map { t =>
        Map[String, Any]("order_id" -> s"o$t", "create_time" -> t,
          "order_status" -> (if (t % 2 == 0) "PAID" else "UNPAID"))
      }
      limit.fold(all)(all.take)
    }
  }

  private def read(fetcherKey: String) =
    spark.read.format("graft.sources.restds.RestDataSource")
      .option("fetcher", fetcherKey)
      .option("schema", "order_id STRING, create_time BIGINT, order_status STRING")
      .option("timeColumn", "create_time")
      .option("statusColumn", "order_status")
      .option("slices", "4")
      .load()

  test("full scan reads every row across slice partitions") {
    val f = new FakeOrders
    RestFetcherRegistry.register("full", f)
    assert(read("full").count() === 1000L)
    assert(f.calls.size() === 4) // one fetch per slice partition
  }

  test("time-range predicate narrows the fetch window BEFORE fetching") {
    val f = new FakeOrders
    RestFetcherRegistry.register("windowed", f)
    val got = read("windowed")
      .filter(col("create_time") >= 1500L && col("create_time") < 1600L)
    assert(got.count() === 100L)
    import scala.jdk.CollectionConverters._
    val fetched = f.calls.asScala.toSeq
    assert(fetched.nonEmpty)
    assert(fetched.forall { case (lo, hi, _, _) => lo >= 1500L && hi <= 1600L },
      s"fetch calls escaped the pushed window: $fetched")
  }

  test("status equality is forwarded; Spark re-applies the filter for correctness") {
    val f = new FakeOrders
    RestFetcherRegistry.register("status", f)
    val got = read("status").filter(col("order_status") === "PAID")
    assert(got.count() === 500L)
    import scala.jdk.CollectionConverters._
    assert(f.calls.asScala.forall(_._3.contains("PAID")))
  }

  test("LIMIT caps what each partition fetches") {
    val f = new FakeOrders
    RestFetcherRegistry.register("limited", f)
    val got = read("limited").limit(10)
    assert(got.count() === 10L)
    import scala.jdk.CollectionConverters._
    assert(f.calls.asScala.forall(_._4.contains(10)))
  }

  test("column pruning: ReadSchema shrinks to the projected columns") {
    val f = new FakeOrders
    RestFetcherRegistry.register("pruned", f)
    val got = read("pruned").select("order_id")
    assert(got.columns === Array("order_id"))
    assert(got.distinct().count() === 1000L)
    val plan = got.queryExecution.executedPlan.toString
    // the scan's output should not carry the unprojected columns
    assert(!plan.contains("order_status#") || !plan.contains("create_time#"),
      s"scan did not prune columns:\n$plan")
  }

  /** Counting fetcher: count() must come from countInWindow, not a fetch. */
  class CountableOrders extends FakeOrders with RestCountingFetcher {
    val countCalls = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long)]()
    override def countInWindow(from: Long, to: Long,
        status: Option[String]): Long = {
      countCalls.add((from, to))
      math.max(0L, math.min(to, 2000L) - math.max(from, 1000L))
    }
  }

  test("COUNT(*) pushes to the counting fetcher — no row fetch at all") {
    val f = new CountableOrders
    RestFetcherRegistry.register("countable", f)
    assert(read("countable").count() === 1000L)
    assert(f.calls.isEmpty, "aggregate pushdown still fetched rows")
    assert(f.countCalls.size() === 4) // one count per slice partition
  }

  test("filtered COUNT does NOT push (residual filters block it) and stays correct") {
    val f = new CountableOrders
    RestFetcherRegistry.register("countable2", f)
    val n = read("countable2")
      .filter(col("order_status") === "PAID").count()
    assert(n === 500L)
    assert(f.countCalls.isEmpty,
      "count pushed under a residual filter — would be wrong for over-fetching endpoints")
    assert(!f.calls.isEmpty)
  }

  test("non-counting fetcher count() still works via row fetch") {
    val f = new FakeOrders
    RestFetcherRegistry.register("plain-count", f)
    assert(read("plain-count").count() === 1000L)
    assert(!f.calls.isEmpty)
  }
}
