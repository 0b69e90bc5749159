package org.apache.spark

/** Narrow bridge to `private[spark]` internals (same-package access, the
  * pattern Spark's own test utilities use). Two concerns only:
  *
  *   1. listener-bus drain for the benchmark harnesses, so per-query
  *      metric windows don't bleed into each other;
  *   2. synchronous shuffle-file reclamation for the band-group-sliced
  *      LSH generator ([[graft.operators.Dedup.lshCandidatePairsSliced]]):
  *      a finished slice's exchange files are dead the moment its pairs
  *      are spilled, but the ContextCleaner only reaps them after the
  *      driver GCs the ShuffleDependency — nondeterministically late, and
  *      at the 100x rung the un-reaped slices accumulate to a disk-fill
  *      (measured: 60.9 GB written, ENOSPC, where one slice is ~6 GB).
  *      These helpers enumerate the registered shuffle ids and release a
  *      finished slice's ids through the cleaner's own blocking path
  *      (unregister from the MapOutputTracker + remove files on every
  *      block manager), so the next slice starts against a clean disk.
  *
  * Nothing else in the engine proper may depend on this file.
  */
object GraftSparkInternals {

  /** Block until the async listener bus has delivered every queued event.
    * Bench reads per-query metrics from a SparkListener immediately after
    * an action returns; stage-completed events are delivered
    * asynchronously, so without a drain the last stages of query N are
    * accumulated into query N+1's window. */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Shuffle ids currently registered with the driver's map-output
    * tracker. Snapshot before a bounded unit of work, diff after: the
    * difference is exactly the shuffles that unit created. */
  def registeredShuffleIds(sc: SparkContext): Set[Int] =
    sc.env.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m.shuffleStatuses.keySet.toSet
      case _ => Set.empty
    }

  /** Release the given shuffles NOW, blocking until their files are
    * removed from every block manager. Safe only for shuffles whose
    * downstream results are already materialized somewhere lineage-free
    * (parquet, checkpoint): a later job that still referenced one would
    * recompute the stage from source. Returns the count released. */
  def cleanupShufflesBlocking(sc: SparkContext, ids: Iterable[Int]): Int =
    sc.cleaner match {
      case Some(cleaner) =>
        var n = 0
        ids.foreach { id =>
          try { cleaner.doCleanupShuffle(id, blocking = true); n += 1 }
          catch { case _: Exception => () }
        }
        n
      case None => 0
    }
}
