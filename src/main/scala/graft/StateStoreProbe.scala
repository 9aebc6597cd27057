package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round 22, r20 verdict #4): measure the HDFS-backed (default)
  * vs RocksDB state-store providers on the declared stateful streaming
  * rows, at a base dir and optionally a staged N× dir (tools/make_sf1.py),
  * to locate the crossover the SURVEY §6 entry documents. Wall times only
  * — result identity is RocksDBStateSpec's job (asserted there for every
  * query probed here).
  *
  * Usage: graft.StateStoreProbe <sfDir> [query ...]
  *   (env as graft.Bench: SPARK_GRAFT_CPUS; default query set below)
  */
object StateStoreProbe {
  private val Default = Seq("stream_dedup", "stream_session",
    "stream_stream_join", "stream_funnel", "stream_watermark_late")

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Key = "spark.sql.streaming.stateStore.providerClass"

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val queries = if (args.length > 1) args.drop(1).toSeq else Default
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Cleanup.release(spark, blocking = true)
      dt
    }
    // One throwaway warm-up per provider so classloading/JIT lands outside
    // the readings (the RocksDB JNI library load is real cost but one-time
    // per executor in production — report it separately).
    for (q <- queries) {
      val hdfs = Seq(run(q), run(q))
      spark.conf.set(Key, Provider)
      val t0 = System.nanoTime()
      val rocksFirst = run(q) // includes one-time JNI/provider init
      val rocks = Seq(run(q), run(q))
      spark.conf.unset(Key)
      println(f"$q%-24s hdfs=${hdfs.map(t => f"$t%.2f").mkString("/")}  " +
        f"rocksdb=${rocks.map(t => f"$t%.2f").mkString("/")}  " +
        f"(rocksdb first-touch incl. init ${rocksFirst}%.2f)")
    }
    spark.stop()
  }
}
