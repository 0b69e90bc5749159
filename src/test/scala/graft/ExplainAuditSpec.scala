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
class ExplainAuditSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  // r18: the answer-mass checkpoint before each final sort
  // (operators.Answer) truncates the inspectable plan to a Scan
  // ExistingRDD — and EXECUTES the pipeline at query-construction time.
  // Audits must grade the working pipeline (and stay plan-only), so the
  // whole suite runs with the spec-only bypass: the bypassed plan is
  // operator-for-operator the pipeline the checkpoint materializes.
  override def beforeAll(): Unit = {
    graft.operators.Answer.planAuditBypass = true
    super.beforeAll()
  }
  override def afterAll(): Unit = {
    graft.operators.Answer.planAuditBypass = false
    super.afterAll()
  }

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
    // static plan didn't already imply). DEEP walk (r17): cached
    // relations and materialized query stages are descended into — a
    // quadratic join hiding inside a .cache()'d sub-frame is the same
    // scale incident as a surface one.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !quadraticAnchors(name) && !boundedBroadcastNlj(name) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
        val bad = allNodesDeep(plan).collect {
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
        allNodesDeep(plan).collect {
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

  /** [[allNodes]] plus descent into cached-relation plans AND query
    * stages: the shingle/gram set frames are `.cache()`d, so the
    * scan→projection pipeline (where a regressed unconditional fan-out
    * exchange would sit) lives inside InMemoryRelation.cachedPlan — and
    * once the cache has materialized, that plan is a FINALIZED adaptive
    * plan whose exchanges are wrapped in leaf QueryStageExec nodes, so a
    * children-only walk never reaches them. */
  private def allNodesDeep(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val nested = expanded match {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq(s.relation.cachedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case _ => Seq.empty
    }
    expanded +: (expanded.children ++ nested).flatMap(allNodesDeep)
  }

  private def roundRobinExchanges(p: SparkPlan): Seq[SparkPlan] =
    allNodesDeep(p).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => e
    }

  test("fan-out guard: a multi-partition scan reaches the gram kernels with no round-robin exchange") {
    // Mechanizes the r16 latent-shuffle fix (Dedup.fanOutSmallScan): the
    // conditional fan-out must stay a NO-OP when the file scan already
    // offers >= defaultParallelism partitions — an unconditional
    // repartition() here is a round-robin exchange of the entire text
    // column at corpus scale. Build a deliberately multi-file twin of the
    // sf0.001 tables and force per-file splits (tiny files otherwise pack
    // into one partition via openCostInBytes), then assert every
    // fanOutSmallScan-consuming operator plans with ZERO round-robin
    // exchanges anywhere (their only no-column repartition IS the
    // fan-out; all production repartitions are hash-by-key).
    val split = java.nio.file.Files.createTempDirectory("graft-fanout-").toString
    Seq("documents", "part").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").repartition(8)
        .write.mode("overwrite").parquet(s"$split/$t.parquet")
    }
    val conf = spark.conf
    val savedOpen = conf.get("spark.sql.files.openCostInBytes", "4194304")
    val savedMax = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      conf.set("spark.sql.files.openCostInBytes", "0")
      conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val sites = Seq(
        "q31 (shingleSets)" -> (() => operators.Dedup.ngramJaccardPairs(spark, split)),
        "q32 (shingleSets)" -> (() => operators.Dedup.minhashLshPairs(spark, split)),
        "q48 (shingleSets)" -> (() => operators.Dedup.decontaminationHits(spark, split)),
        "q51 (chunk grams)" -> (() => operators.Dedup.crossDocDupFraction(spark, split)),
        "q61 (positional grams)" -> (() => operators.Dedup.substringDedup(spark, split)),
        "q22_auto (biblio shingles)" ->
          (() => operators.TextQueries.q22LshMatchScoreAuto(spark, split)))
      val offenders = sites.flatMap { case (name, mk) =>
        roundRobinExchanges(mk().queryExecution.executedPlan)
          .map(e => s"$name: ${e.nodeName}")
      }
      assert(offenders.isEmpty,
        s"round-robin exchange above a multi-partition scan:\n${offenders.mkString("\n")}")
      // positive control — over the SINGLE-file sf0.001 table the fan-out
      // must engage (one partition would serialize the per-row kernels),
      // so the guard above cannot pass vacuously with fanOutSmallScan
      // deleted outright
      conf.set("spark.sql.files.openCostInBytes", savedOpen)
      conf.set("spark.sql.files.maxPartitionBytes", savedMax)
      val control = roundRobinExchanges(
        operators.Dedup.ngramJaccardPairs(spark, dir).queryExecution.executedPlan)
      assert(control.nonEmpty,
        "expected the fan-out exchange on a single-file scan (positive control)")
    } finally {
      conf.set("spark.sql.files.openCostInBytes", savedOpen)
      conf.set("spark.sql.files.maxPartitionBytes", savedMax)
    }
  }

  test("q61 past-the-gate arm is a shuffled-hash semi join building the dup-gram side") {
    // ADVICE r16: a LEFT SEMI join can only build RIGHT, so a probe-side
    // shuffle_hash hint is silently ignored and the join sort-merges —
    // re-buffering a hot gram's positions in one sort task, the exact
    // skew the two-level count defused. The hint now sits on the build
    // (dup-gram) side; assert the PLAN shape with the broadcast gate
    // forced shut, and that both arms return identical rows.
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    val saved = operators.Dedup.DupGramBroadcastMaxRows
    val broadcastArm = operators.Dedup.substringDedup(spark, dir).collect()
    try {
      operators.Dedup.DupGramBroadcastMaxRows = 0
      val df = operators.Dedup.substringDedup(spark, dir)
      val plan = df.queryExecution.executedPlan
      val semis = allNodesDeep(plan).collect {
        case j: ShuffledHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(semis.nonEmpty, "expected a shuffled-hash LEFT SEMI past the gate")
      semis.foreach(j => assert(j.buildSide == BuildRight,
        "the dup-gram (right) side must be the build side"))
      val smjSemis = allNodesDeep(plan).collect {
        case j: SortMergeJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(smjSemis.isEmpty,
        "past-the-gate semi join regressed to sort-merge (hot-gram sort skew)")
      assert(df.collect().toSeq == broadcastArm.toSeq,
        "shuffle-hash arm result differs from the broadcast arm")
    } finally {
      operators.Dedup.DupGramBroadcastMaxRows = saved
    }
  }

  test("streaming microbatch plans: no cartesian/BNLJ/round-robin in the executed near-dup gates") {
    // r18 (VERDICT r17 #7): the deep walker above covers the 65 BATCH
    // queries; the streaming near-dup gates execute MICROBATCH plans it
    // never saw. Run each gate on a MemoryStream, process real batches,
    // and audit the EXECUTED microbatch plan (StreamExecution
    // .lastExecution — the IncrementalExecution that actually ran, state
    // operators included) with the same deep walk: a quadratic join or a
    // full-stream round-robin exchange inside a microbatch is the same
    // scale incident as in a batch query, at per-trigger frequency.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def auditLastExecution(name: String,
        q: org.apache.spark.sql.streaming.StreamingQuery): Seq[String] = {
      val plan = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      allNodesDeep(plan).collect {
        case _: BroadcastNestedLoopJoinExec => s"$name: BroadcastNestedLoopJoin"
        case j if j.nodeName.contains("CartesianProduct") => s"$name: CartesianProduct"
      } ++ roundRobinExchanges(plan).map(e => s"$name: round-robin ${e.nodeName}")
    }
    val t0 = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val offenders = Seq.newBuilder[String]
    // token near-dup gate
    locally {
      val in = MemoryStream[(Long, String, java.sql.Timestamp)]
      val out = streaming.EventStreams.nearDupCandidates(
        in.toDF().toDF("doc_id", "text", "ingest_ts"),
        watermark = "10 minutes", horizonMs = 10L * 60 * 1000)
      val q = out.writeStream.format("memory").queryName("audit_neardup")
        .outputMode("append").start()
      try {
        val txt = (1 to 30).map(i => s"tok$i").mkString(" ")
        in.addData((1L, txt, ts(t0)), (2L, txt, ts(t0 + 1000)))
        q.processAllAvailable()
        offenders ++= auditLastExecution("nearDupCandidates", q)
      } finally q.stop()
    }
    // distinct embedding near-dup gate (the exactly-once wrapper — the
    // widest streaming plan: banding + state + dedup state)
    locally {
      val in = MemoryStream[(Long, Seq[Double], java.sql.Timestamp)]
      val out = streaming.EventStreams.embeddingNearDupPairsDistinct(
        in.toDF().toDF("vec_id", "embedding", "ingest_ts"),
        watermark = "10 minutes", horizonMs = 10L * 60 * 1000)
      spark.conf.set(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
      val q = out.writeStream.format("memory").queryName("audit_embdup")
        .outputMode("append").start()
      try {
        val v = Seq.fill(64)(0.5)
        in.addData((1L, v, ts(t0)), (2L, v, ts(t0 + 1000)))
        q.processAllAvailable()
        offenders ++= auditLastExecution("embeddingNearDupPairsDistinct", q)
      } finally {
        q.stop()
        spark.conf.set(
          "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
      }
    }
    assert(offenders.result().isEmpty,
      s"scale-killer shapes in executed microbatch plans:\n${offenders.result().mkString("\n")}")
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
