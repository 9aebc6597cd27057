package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool (round 21, optimization): run ONE named query under the exact
  * Bench session shape (local[$SPARK_GRAFT_CPUS], shuffle.partitions=cpus)
  * and print a per-STAGE cost table — wall (submission→completion), summed
  * executor task time, shuffle read/write bytes, input bytes, task count
  * and the stage's call site — sorted by executor time. This is the §1
  * "where is the time actually going" view the bench total cannot give;
  * guide §7.1's UI is disabled in this sandbox, so the listener replays
  * the same numbers to stdout.
  *
  * Usage: graft.ProfileQuery <query_name> [sfDir]  (env as graft.Bench)
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      // AQE-sized cached-plan partitioning (round 21; rationale in Bench).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(name: String, site: String, wallMs: Long, execMs: Long,
      cpuMs: Long, tasks: Int, shRead: Long, shWrite: Long, input: Long,
      records: Long)
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {
          a <- si.submissionTime; b <- si.completionTime
        } yield b - a).getOrElse(-1L)
        stages += St(si.name, si.details.linesIterator
            .filter(l => l.contains("graft") && !l.contains("ProfileQuery"))
            .take(2).mkString(" <- ").trim,
          wall, m.executorRunTime, m.executorCpuTime / 1000000L,
          si.numTasks, m.shuffleReadMetrics.remoteBytesRead +
            m.shuffleReadMetrics.localBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
          m.outputMetrics.recordsWritten + m.shuffleWriteMetrics.recordsWritten)
      }
    })
    val q = SparkEntry.queries(name)
    val (warmDir, warmed) = WarmDir.resolve(sfDir)
    if (warmed) q(spark, warmDir).count() // JIT warm-up, not profiled
    Cleanup.release(spark, blocking = true)
    stages.clear()
    val t0 = System.nanoTime()
    q(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val mb = (b: Long) => f"${b / 1048576.0}%8.1f"
    println(f"\n== $name%s  total=${sec}%.2f s  stages=${stages.size}%d ==")
    println(f"${"execMs"}%8s ${"cpuMs"}%8s ${"wallMs"}%7s ${"tasks"}%5s " +
      f"${"shR_MB"}%8s ${"shW_MB"}%8s ${"in_MB"}%8s ${"recsW"}%9s  name / site")
    stages.sortBy(-_.execMs).take(40).foreach { s =>
      println(f"${s.execMs}%8d ${s.cpuMs}%8d ${s.wallMs}%7d ${s.tasks}%5d " +
        f"${mb(s.shRead)} ${mb(s.shWrite)} ${mb(s.input)} ${s.records}%9d" +
        f"  ${s.name.take(60)}%s | ${s.site.take(120)}%s")
    }
    val totalExec = stages.map(_.execMs).sum
    println(f"sum executorRunTime = ${totalExec / 1000.0}%.2f s across " +
      f"${stages.map(_.tasks).sum}%d tasks; wall $sec%.2f s on $cpus cores")
    spark.stop()
  }
}
