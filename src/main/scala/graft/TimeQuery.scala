package graft
import org.apache.spark.sql.SparkSession

/** Time ONE named query in a fresh JVM — the adjudication tool for
  * per-query bench swings (SURVEY §6): run it interleaved across code
  * variants on one boot, bracketed by tools/host_probe.py, and the swing
  * attributes itself to code or host. A fresh JVM per sample removes all
  * inter-sample session state (the failure mode Bench's blocking cleanup
  * exists for); the sf0.001 warm-up run JITs the whole query path so the
  * timed region measures the plan, not classloading.
  *
  * Usage: graft.TimeQuery <query_name> [sfDir]  (env as graft.Bench)
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false") // pinned, matches Bench
      // AQE-sized cached-plan partitioning (round 21; rationale in Bench).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    // Warm-up dir (round-9 ADVICE, shared resolution in WarmDir): smallest-
    // SF sibling of sfDir (or SPARK_GRAFT_WARM_DIR), not a hardcoded path —
    // and when it normalizes to sfDir itself the warm-up is SKIPPED and
    // flagged, because a same-dir warm-up would make the timed region a
    // second, cache-warmed execution rather than a cold plan.
    val (warmDir, warmed) = WarmDir.resolve(sfDir)
    if (warmed) q(spark, warmDir).count() // JIT + classload warm-up
    val t0 = System.nanoTime()
    q(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"query":"$name","sec":$sec,"sf":"$sfDir","warmed":$warmed}""")
    spark.stop()
  }
}
