package graft.curation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  def byShardKey(membership: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = membership.sparkSession
    import spark.implicits._
    val m = membership.select($"entity".cast("long").as("entity"), $"key")
      .distinct()
      .localCheckpoint()

    var labels = m.select($"entity").distinct()
      .withColumn("label", $"entity")
      .localCheckpoint()

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
        .localCheckpoint()
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
