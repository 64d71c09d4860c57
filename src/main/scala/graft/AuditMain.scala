package graft
import org.apache.spark.sql.SparkSession
object AuditMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    for (n <- args) {
      val a = PlanAudit.audit(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan)
      println(s"AUDIT $n shuffles=${a.shuffles} smj=${a.smj}")
    }
    spark.stop()
  }
}
