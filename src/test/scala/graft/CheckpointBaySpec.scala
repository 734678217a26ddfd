package graft

/** CheckpointBay must capture exactly the localCheckpoint's persisted
  * RDD and release it on drain — the leak it exists for (r16 triage:
  * undrained checkpoint blocks from the iterative graph operators
  * slowed every later query in a sweep by up to 2×). */
class CheckpointBaySpec extends SparkSpec {
  import spark.implicits._
  import graft.core.CheckpointBay

  test("checkpoint registers the checkpoint RDD; drain releases it") {
    CheckpointBay.drain() // start clean of other suites' leftovers
    val before = spark.sparkContext.getPersistentRDDs.size
    val cp = CheckpointBay.checkpoint((1 to 100).toDF("x"))
    assert(cp.count() == 100)
    assert(CheckpointBay.liveCount == 1)
    val during = spark.sparkContext.getPersistentRDDs.size
    assert(during == before + 1,
      s"expected exactly the checkpoint RDD captured: $before -> $during")
    CheckpointBay.drain()
    assert(CheckpointBay.liveCount == 0)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "drain must release the checkpoint blocks")
  }

  test("a plain cached frame is NOT captured (isCheckpointed filter)") {
    CheckpointBay.drain()
    val cached = (1 to 50).toDF("y").persist()
    try {
      assert(cached.count() == 50)
      val live0 = CheckpointBay.liveCount
      val cp = CheckpointBay.checkpoint(cached.select($"y" * 2))
      assert(cp.count() == 50)
      // only the checkpoint RDD registered — never the cache's RDD
      assert(CheckpointBay.liveCount == live0 + 1)
      CheckpointBay.drain()
      // the cache survives a drain untouched
      assert(cached.count() == 50)
      assert(cached.storageLevel.useMemory)
    } finally { cached.unpersist(); () }
  }
}
