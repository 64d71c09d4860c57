package graft.monitoring

import scala.collection.mutable

/** A6 pipeline metrics + alerting (src/monitoring/production_monitor.py:
  * 43-230): per-cycle record counts, rolling success rate over the last N
  * cycles, consecutive-failure / no-data counters, and threshold-driven
  * alert evaluation (config/production.py:37-39).
  *
  * Driver-side state by design — SURVEY §2.4 A6: "driver-side accumulators
  * / SparkListener; not DataFrame work". Thread-safe for concurrent
  * pipeline callbacks.
  */
class ProductionMonitor(
    windowSize: Int = 100,
    maxExecutionSeconds: Long = 600,
    minSuccessRate: Double = 0.8,
    maxConsecutiveFailures: Int = 3,
    maxNoDataCycles: Int = 5) {

  final case class CycleMetrics(
      records: Long, durationSeconds: Double, success: Boolean)

  final case class Alert(kind: String, message: String)

  private val cycles = mutable.Queue.empty[CycleMetrics]
  private var consecutiveFailures = 0
  private var consecutiveNoData = 0

  def recordCycle(records: Long, durationSeconds: Double, success: Boolean): Seq[Alert] =
    synchronized {
      cycles.enqueue(CycleMetrics(records, durationSeconds, success))
      while (cycles.size > windowSize) cycles.dequeue()
      consecutiveFailures = if (success) 0 else consecutiveFailures + 1
      consecutiveNoData = if (records > 0) 0 else consecutiveNoData + 1
      evaluateAlerts(durationSeconds)
    }

  def successRate: Double = synchronized {
    if (cycles.isEmpty) 1.0
    else cycles.count(_.success).toDouble / cycles.size
  }

  def totalRecords: Long = synchronized(cycles.map(_.records).sum)
  def cycleCount: Int = synchronized(cycles.size)

  private def evaluateAlerts(lastDuration: Double): Seq[Alert] = {
    val alerts = mutable.Buffer.empty[Alert]
    if (lastDuration > maxExecutionSeconds)
      alerts += Alert("slow_cycle",
        f"cycle took $lastDuration%.0fs > ${maxExecutionSeconds}s budget")
    if (consecutiveFailures >= maxConsecutiveFailures)
      alerts += Alert("consecutive_failures",
        s"$consecutiveFailures consecutive failed cycles")
    if (consecutiveNoData >= maxNoDataCycles)
      alerts += Alert("no_data",
        s"$consecutiveNoData consecutive cycles with zero records")
    // Rate alert only once the window has enough history to be meaningful
    // (the reference evaluates over its last-10 window; smaller configured
    // windows use their own full size or the alert could never fire).
    if (cycles.size >= math.min(10, windowSize) && successRate < minSuccessRate)
      alerts += Alert("low_success_rate",
        f"success rate $successRate%.2f < $minSuccessRate%.2f over last ${cycles.size} cycles")
    alerts.toSeq
  }
}
