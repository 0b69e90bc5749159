package graft.curation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.curation.Ck._

/** Distributed connected components over a bipartite membership relation
  * (entity, key): two entities are connected when they share a key. This is
  * the Spark-native replacement for the reference's in-memory union-find
  * (`oc_meta/lib/merge_registry.py:25-143`, SURVEY §2.6 D1).
  *
  * Algorithm: alternating min-label propagation on the bipartite graph —
  *   keyLabel(k)    = min entityLabel(e) over members e of k
  *   entityLabel(e) = min(entityLabel(e), min keyLabel(k) over keys of e)
  * repeated to fixpoint. Each round is two shuffles (groupBy key, groupBy
  * entity); rounds needed = half the graph diameter, which for id-sharing
  * graphs is tiny (entities linked through chains of shared identifiers).
  * No driver-side state beyond the loop counter and convergence check;
  * lineage is cut with localCheckpoint each round so plans stay flat at
  * scale.
  */
object ConnectedComponents {

  /** @param membership DataFrame with columns (entity: Long, key: any type)
    * @param maxIter iteration bound; rounds needed = half the graph
    *        diameter. Id-sharing graphs converge in a handful; near-dup
    *        corpora can form long templated chains, so the default is
    *        sized for diameter ~100 and hitting the bound THROWS rather
    *        than silently returning split components (labels would still
    *        be mid-propagation — every downstream dedup/merge decision
    *        would be quietly wrong).
    * @return DataFrame (entity: Long, component: Long) — component is the
    *         min entity label of the connected group. Entities absent from
    *         `membership` are their own components (callers union them in).
    */
  /** Membership-size bound under which the computation collects and runs
    * as a driver-local union-find: each distributed round costs 3-4 job
    * launches (2 shuffles + the convergence aggregate), so on a small
    * graph the scheduling fixed cost dominates the actual work by
    * 10-100x. 1M (entity, key) rows is tens of MB on the driver —
    * bounded by the constant, the same size-dispatch pattern as
    * Sequencing and the Jaccard verify join. Result is identical: the
    * component label is the min entity of the group either way. */
  private val LocalUnionFindMaxRows = 1000000L

  private def localUnionFind(spark: SparkSession,
      rows: Array[org.apache.spark.sql.Row]): DataFrame = {
    import spark.implicits._
    val par = new java.util.HashMap[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (par.get(r) != r) r = par.get(r)
      var c = x
      while (c != r) { val n = par.get(c); par.put(c, r); c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) par.put(math.max(ra, rb), math.min(ra, rb))
    }
    val keyRep = new java.util.HashMap[Any, Long]
    rows.foreach { r =>
      val e = r.getLong(0)
      if (!par.containsKey(e)) par.put(e, e)
      val k = r.get(1)
      // null keys join nothing in the distributed arm's equi-join (SQL
      // null != null), so they must not union here either — the entity
      // stays a singleton
      if (k != null) {
        if (keyRep.containsKey(k)) union(e, keyRep.get(k)) else keyRep.put(k, e)
      }
    }
    // canonical label = min entity of the component (union keeps the
    // smaller root, so the root IS the min)
    val out = new Array[(Long, Long)](par.size)
    var i = 0
    val it = par.keySet().iterator()
    while (it.hasNext) { val e = it.next(); out(i) = (e, find(e)); i += 1 }
    out.toSeq.toDF("entity", "component")
  }

  /** @param localMaxRows override of [[LocalUnionFindMaxRows]] (0 forces
    *        the distributed path — used by the equivalence spec). */
  def byShardKey(membership: DataFrame, maxIter: Int = 50,
      localMaxRows: Long = LocalUnionFindMaxRows): DataFrame = {
    val spark = membership.sparkSession
    import spark.implicits._
    val m = membership.select($"entity".cast("long").as("entity"), $"key")
      .distinct()
      .localCheckpointClamped()
    if (m.count() <= localMaxRows)
      return localUnionFind(spark, m.collect())

    var labels = m.select($"entity").distinct()
      .withColumn("label", $"entity")
      .localCheckpointClamped()

    // labels only ever decrease, so an unchanged sum(label) means a fixed
    // point — one cheap aggregate per round instead of a join-based diff.
    // decimal(38,0) accumulator: labels may be full-range hashes (e.g.
    // xxhash64 row ids), whose long sum overflows under ANSI mode
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum($"label".cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val keyLabels = m.join(labels, "entity")
        .groupBy($"key").agg(min($"label").as("keyLabel"))
      val proposed = m.join(keyLabels, "key")
        .groupBy($"entity").agg(min($"keyLabel").as("proposal"))
      val next = labels.join(proposed, Seq("entity"), "left")
        .select($"entity",
          least($"label", coalesce($"proposal", $"label")).as("label"))
        .localCheckpointClamped()
      val newSum = labelSum(next)
      labels = next
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "graph diameter exceeds 2*maxIter; raise maxIter")
    labels.select($"entity", $"label".as("component"))
  }
}
