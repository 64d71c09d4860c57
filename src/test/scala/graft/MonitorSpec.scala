package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.monitoring.ProductionMonitor

class MonitorSpec extends AnyFunSuite {

  test("consecutive failures trip the alert at the threshold, reset on success") {
    val m = new ProductionMonitor(maxConsecutiveFailures = 3)
    assert(m.recordCycle(10, 1.0, success = false).isEmpty)
    assert(m.recordCycle(10, 1.0, success = false).isEmpty)
    val alerts = m.recordCycle(10, 1.0, success = false)
    assert(alerts.exists(_.kind == "consecutive_failures"))
    assert(m.recordCycle(10, 1.0, success = true)
      .forall(_.kind != "consecutive_failures"))
  }

  test("no-data cycles alert independently of success") {
    val m = new ProductionMonitor(maxNoDataCycles = 2)
    m.recordCycle(0, 1.0, success = true)
    val alerts = m.recordCycle(0, 1.0, success = true)
    assert(alerts.exists(_.kind == "no_data"))
  }

  test("slow cycle alert against the execution budget") {
    val m = new ProductionMonitor(maxExecutionSeconds = 600)
    assert(m.recordCycle(10, 700.0, success = true).exists(_.kind == "slow_cycle"))
  }

  test("rolling success rate over the window; low-rate alert needs history") {
    val m = new ProductionMonitor(windowSize = 10, minSuccessRate = 0.8)
    (1 to 5).foreach(_ => m.recordCycle(10, 1.0, success = true))
    (1 to 4).foreach(_ => m.recordCycle(10, 1.0, success = false))
    assert(m.successRate === 5.0 / 9.0)
    // 9 cycles: below the 10-cycle history floor, no rate alert yet
    val alerts = m.recordCycle(10, 1.0, success = false)
    assert(m.cycleCount === 10)
    assert(alerts.exists(_.kind == "low_success_rate"))
  }
}
