package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round 15): print the executed physical plan of named declared
  * queries under auto-broadcast-off — the exact view PlanAuditSpec pins —
  * so plan iteration doesn't require editing a spec to see a plan.
  * Usage: graft.PlanDump <query> [query ...]; SPARK_GRAFT_SF_DIR selects
  * the corpus (default sf0.01, the audit's SF).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.maxPlanStringLength", "2000000")
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString)
      Cleanup.release(spark, blocking = true)
    }
    spark.stop()
  }
}
