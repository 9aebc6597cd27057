package graft

/** Round-7 verdict "next round" #2: `graft.Cleanup.release` is the public
  * session-cleanup API for library consumers embedding the state-heavy
  * operators (cluster dedup / LSH / IVF) outside Bench/Verify. This spec
  * pins the contract: after the cluster query runs, the session holds
  * cache + eager-localCheckpoint blocks; one `release(blocking = true)`
  * returns the block manager to its pre-query baseline (zero registered
  * persistent RDDs, zero cached-RDD storage).
  */
class CleanupSpec extends GraftSpec {

  test("release returns the block manager to baseline after llm_dedup_cluster") {
    // Start from a clean slate regardless of what earlier suites left.
    Cleanup.release(spark, blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)

    val out = SparkEntry.queries("llm_dedup_cluster")(spark, TestEnv.Sf001)
    assert(out.count() > 0)
    // The documented leftovers: lshRepGraph's chunks cache + the final
    // labels checkpoint (plus the persisted edge list).
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected the cluster query to leave session state (the premise of Cleanup)")

    Cleanup.release(spark, blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "release must unregister every persistent RDD (incl. checkpoint RDDs)")
    val stillStored = spark.sparkContext.getRDDStorageInfo
      .filter(i => i.memSize > 0 || i.diskSize > 0)
    assert(stillStored.isEmpty,
      s"release(blocking) must leave no stored RDD blocks, got ${stillStored.toSeq}")
  }

  test("Tables.events leaves the session conf untouched (r5-carried nit)") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // Case 1: default state ("false" via the conf's default — getOption
    // reports defaults, never None) must be preserved, and the DataFrame
    // must still execute correctly post-restore (the conf is consulted
    // only at footer-schema inference, which read.parquet does eagerly).
    spark.conf.unset(key)
    val before = spark.conf.getOption(key)
    val df = Tables.events(spark, TestEnv.Sf001)
    assert(spark.conf.getOption(key) == before,
      "events reader must not leak a session-conf mutation")
    assert(df.count() > 0, "events must execute after the conf is restored")

    // Case 2: a caller's own explicit (non-default) value survives.
    spark.conf.set(key, "true")
    Tables.events(spark, TestEnv.Sf001)
    assert(spark.conf.get(key) == "true",
      "events reader must restore the caller's prior conf value")
    spark.conf.unset(key)
  }
}
