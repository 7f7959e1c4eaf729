package graft.algos

import graft.SparkSpec
import org.apache.spark.sql.graftshim.GraftShims

/** Pins the r16 storage-hygiene contract for iterative algos.
  *
  * Background (measured via a storage probe): `Dataset.unpersist()` on a
  * `localCheckpoint`-ed frame is a silent no-op — the CacheManager has no
  * entry for its LogicalRDD plan, and the checkpoint RDD's raw-row blocks
  * are only reclaimed by ContextCleaner GC. So a loop that "unpersists"
  * its previous iteration actually accumulates every iteration's blocks
  * for the life of the query; at 10× data under machine load this
  * surfaced as a flaky `localCheckpoint` INTERNAL_ERROR in the bench.
  * `GraftShims.releaseCheckpoint` frees the backing RDD directly, and
  * `Algos` calls it on dead iteration frames.
  */
class ReleaseSpec extends SparkSpec {

  private def storedRddIds: Set[Int] =
    spark.sparkContext.getRDDStorageInfo.map(_.id).toSet

  private def awaitGone(ids: Set[Int], label: String): Unit = {
    val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
    while ((storedRddIds & ids).nonEmpty && System.nanoTime < deadline)
      Thread.sleep(50)
    assert((storedRddIds & ids).isEmpty, s"$label: blocks still stored")
  }

  test("Dataset.unpersist on a checkpointed frame is a no-op; releaseCheckpoint frees it") {
    val before = storedRddIds
    val ck = spark.range(0, 10000).toDF("id").localCheckpoint(true)
    val mine = storedRddIds -- before
    assert(mine.nonEmpty, "eager localCheckpoint should store blocks")
    ck.unpersist(blocking = true)
    assert((storedRddIds & mine) == mine,
      "Dataset.unpersist must NOT free checkpoint blocks (the documented no-op this spec pins)")
    GraftShims.releaseCheckpoint(ck)
    awaitGone(mine, "releaseCheckpoint")
  }

  test("releaseCheckpoint is a safe no-op on plans that are not checkpoint roots") {
    val df = spark.range(0, 100).toDF("id").selectExpr("id * 2 as x")
    GraftShims.releaseCheckpoint(df) // no LogicalRDD root: must not throw
    assert(df.count() == 100)
  }

  test("repeated checkpoints carry real-size statistics, not chain-multiplied estimates") {
    import org.apache.spark.sql.functions.col
    // Dataset.localCheckpoint copies the ORIGIN plan's size estimate onto
    // the result; join estimation multiplies children, so a checkpoint-
    // per-step loop grows the recorded sizeInBytes ~cubically PER STEP —
    // after ~15 steps the BigInt has millions of bits and stats visits
    // hang the driver (measured on SCC's coloring loop in r16).
    // localCheckpointRealStats stamps the actual stored size instead.
    var df = GraftShims.localCheckpointRealStats(spark.range(0, 1000).toDF("id"))
    for (_ <- 1 to 10) {
      val step = df.join(df.select(col("id").as("id2")), col("id") === col("id2"))
        .select("id")
      val next = GraftShims.localCheckpointRealStats(step)
      GraftShims.releaseCheckpoint(df)
      df = next
    }
    val size = df.queryExecution.analyzed.stats.sizeInBytes
    assert(size.bitLength < 64,
      s"stats must stay at real block size; got a ${size.bitLength}-bit estimate")
    assert(df.count() == 1000)
    GraftShims.releaseCheckpoint(df)
  }

  test("iterative algos release their per-iteration frames (bounded residual storage)") {
    import spark.implicits._
    // a 64-node path graph forces multiple star-contraction rounds and a
    // multi-level BFS — before the r16 fix each round leaked one
    // checkpoint RDD (~1 per iteration, >6 here)
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("_src", "_dst")
    val before = storedRddIds
    Algos.connectedComponents(edges).count()
    Algos.shortestPaths(edges, source = 0L, maxDepth = 70).count()
    Algos.pageRank(edges, iterations = 6).count()
    val leaked = (storedRddIds -- before).size
    // live residuals: each algo's RETURNED frame (+ kCore-style final
    // frames) may stay stored; per-iteration frames must not
    assert(leaked <= 4, s"expected bounded residual storage, found $leaked new stored RDDs")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
