package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** CI plan gate (the red/green twin of `graft.tools.ExplainAudit`): every
  * registered query is PLANNED (not executed) at sf0.001 and its physical
  * plan audited for the two scale-killers —
  *
  *  1. quadratic joins (CartesianProduct / BroadcastNestedLoopJoin) are
  *     allowed ONLY for the documented all-pairs oracle anchors, and
  *  2. unpartitioned window operators (single-task at corpus scale) are
  *     not allowed anywhere in the registry.
  *
  * A new operator that regresses into either shape fails here instead of
  * surfacing as a 100×-scale incident.
  */
class ExplainAuditSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  /** The documented quadratic oracle anchors (their production twins
    * q34_lsh/q45_lsh are LSH-bucketed equi-joins). */
  private val quadraticAnchors = Set(
    "q34_dedup_embedding_cosine", "q45_embedding_clusters")

  /** Bounded-broadcast nested-loop shapes: the NLJ's build side is a
    * broadcast of PROVABLY bounded cardinality, so the plan is linear in
    * the corpus no matter the scale —
    *  - q53/q58: crossJoin(broadcast(<1-row corpus aggregate>));
    *  - q56: broadcast of the fixed nQueries=10 eval query set;
    *  - q35: corpus × bounded query set — the brute-force ANN oracle
    *    anchor whose production twins (lshTopK, q43 IVF) are equi-joins.
    * A new query with an UNBOUNDED nested-loop side must extend neither
    * set without the same justification. */
  private val boundedBroadcastNlj = Set(
    "q35_ann_topk", "q53_corpus_stats", "q56_ann_label_eval",
    "q58_unigram_logprob")

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    expanded +: expanded.children.flatMap(allNodes)
  }

  test("no cartesian/BNLJ outside the documented all-pairs anchors") {
    // static plans: AQE re-plans at runtime but the initial physical plan
    // is what this audit grades (and AQE never introduces a BNLJ that the
    // static plan didn't already imply)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !quadraticAnchors(name) && !boundedBroadcastNlj(name) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
        val bad = allNodes(plan).collect {
          case _: BroadcastNestedLoopJoinExec => "BroadcastNestedLoopJoin"
          case j if j.nodeName.contains("CartesianProduct") => "CartesianProduct"
        }
        bad.map(b => s"$name: $b")
      case _ => Seq.empty
    }
    assert(offenders.isEmpty,
      s"quadratic join shapes outside the anchors:\n${offenders.mkString("\n")}")
  }

  test("no unpartitioned window operator in any registered query") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
        allNodes(plan).collect {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            s"$name: unpartitioned Window(${w.windowExpression.mkString(",").take(80)})"
        }
    }
    assert(offenders.isEmpty,
      s"single-task window shapes found:\n${offenders.mkString("\n")}")
  }

  test("the quadratic anchors still have registered production twins") {
    // the audit's exemption list must not outlive the production paths
    assert(SparkEntry.queries.contains("q34_lsh_embedding_pairs"))
    assert(SparkEntry.queries.contains("q45_lsh_embedding_clusters"))
    assert(SparkEntry.queries.contains("q57_sqrtn_semantic_dedup"))
  }

  test("q53/q58 crossJoin exemption is structurally a 1-row broadcast") {
    // the exemption list above is by NAME — back it with the structural
    // fact it encodes: the NLJ's build side must be a GLOBAL aggregate
    // (no grouping keys => exactly one row), so a refactor that widens
    // the broadcast side cannot hide behind the name exemption
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    Seq("q53_corpus_stats", "q58_unigram_logprob").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      val nljs = allNodes(plan).collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(nljs.nonEmpty, s"$name: expected the documented crossJoin")
      nljs.foreach { j =>
        val buildPlan = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        val oneRow = allNodes(buildPlan).exists {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
            a.groupingExpressions.isEmpty
          case _ => false
        }
        assert(oneRow,
          s"$name: crossJoin broadcast side is not a global (1-row) aggregate")
      }
    }
  }
}
