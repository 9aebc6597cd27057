package graft

import org.apache.spark.sql.SparkSession

/** Dev runner: execute ONE declared query standalone (timing) or print its
  * formatted physical plan — the `.explain`-and-iterate loop the plan pins
  * in PlanAuditSpec grew out of, without paying a full Bench sweep.
  *
  * Usage: QueryRun <query_name> <sfDir> [explain]
  */
object QueryRun {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 2 && args(2) == "explain")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    else {
      // Timer wraps the fn call too (like Bench): queries with driver-side
      // iteration do real work before returning the DataFrame.
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name: rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
