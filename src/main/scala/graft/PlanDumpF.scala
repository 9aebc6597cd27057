package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool (round 21): write each named query's `.explain("formatted")`
  * text to a file — the before/after plan evidence the optimization
  * rounds commit under plans/rNN/. Same session shape as PlanDump
  * (local[4], broadcast threshold untouched so the plans match what the
  * bench actually runs at its SF).
  * Usage: graft.PlanDumpF <outDir> <suffix> <query> [query ...]
  * (SPARK_GRAFT_SF_DIR selects the corpus, default sf0.01.)
  */
object PlanDumpF {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      // Keep the plan-evidence session config in lockstep with Bench
      // (round-22 ADVICE): Bench/Verify/TimeQuery/ProfileQuery all set
      // this; the flag acts at AQE runtime so the static dump rarely
      // changes, but the committed evidence must not diverge in conf.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxPlanStringLength", "2000000")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.drop(2).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      Cleanup.release(spark, blocking = true)
    }
    spark.stop()
  }
}
