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
}
