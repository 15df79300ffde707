package graft

import org.apache.spark.storage.StorageLevel

/** The [[SparkEntry]] checkpoint-cache admission policy: localCheckpoint
  * blocks are pinned for the JVM lifetime, so a long-lived session
  * iterating many datasets must not accumulate one pinned relation per
  * dataset. Admitting a new (application, dir) key evicts every OTHER
  * dataset's entries across ALL the distributed-checkpoint caches and
  * unpersists their RDDs — executor storage stays bounded by ONE
  * dataset's worth of checkpoints regardless of how many datasets the
  * session visits. */
class EvictionSpec extends SparkSpec {
  private def checkpointRdd(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.getOrElse(fail("cached relation is not a checkpointed LogicalRDD"))

  test("admitting a second dataset evicts the first across all caches " +
      "and unpersists its pinned blocks") {
    val s = spark
    val appId = s.sparkContext.applicationId
    val dirA = "/root/testdata/sf0.001"
    val dirB = "/root/testdata/sf0.01"
    val keyA = appId + "|" + dirA
    val keyB = appId + "|" + dirB
    // admit dataset A into two DIFFERENT caches (cluster + NB model)
    SparkEntry.queries("q_dedup_cc")(s, dirA).count()
    SparkEntry.queries("q_probe_train")(s, dirA).count()
    assert(SparkEntry.clusterCache.containsKey(keyA))
    assert(SparkEntry.nbModelCache.containsKey(keyA))
    val rddA = checkpointRdd(SparkEntry.clusterCache.get(keyA))
    assert(rddA.getStorageLevel != StorageLevel.NONE,
      "checkpointed relation should hold pinned blocks while cached")
    // admitting dataset B through ANY one cache evicts A from all
    SparkEntry.queries("q_dedup_cc")(s, dirB).count()
    assert(SparkEntry.clusterCache.containsKey(keyB))
    assert(!SparkEntry.clusterCache.containsKey(keyA),
      "old dataset must leave the cache that admitted the new one")
    assert(!SparkEntry.nbModelCache.containsKey(keyA),
      "eviction must sweep the OTHER caches' entries for the old dir too")
    assert(rddA.getStorageLevel == StorageLevel.NONE,
      "evicted checkpoint must release its pinned storage")
    // bounded storage: per cache, at most ONE dataset per application
    SparkEntry.dfCaches.foreach { c =>
      var n = 0
      c.forEach((k, _) => if (k.startsWith(appId + "|")) n += 1)
      assert(n <= 1, s"cache holds $n datasets for this application")
    }
    // the evicted dataset re-admits cleanly (rebuild, not a stale hit)
    SparkEntry.queries("q_dedup_cc")(s, dirA).count()
    assert(SparkEntry.clusterCache.containsKey(keyA) &&
      !SparkEntry.clusterCache.containsKey(keyB))
  }
}
