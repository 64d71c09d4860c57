package graft
import org.apache.spark.sql.SparkSession
object AuditMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (n <- args) {
      val a = PlanAudit.audit(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan)
      val e = PlanAudit.executedAudit(SparkEntry.queries(n)(spark, sfDir))
      println(s"AUDIT $n static: shuffles=${a.shuffles} smj=${a.smj}" +
        s" | executed: scans=${e.scans} shuffles=${e.shuffles}" +
        s" reusedShuffles=${e.reusedShuffles} broadcasts=${e.broadcasts}" +
        s" reusedBroadcasts=${e.reusedBroadcasts}")
    }
    spark.stop()
  }
}
