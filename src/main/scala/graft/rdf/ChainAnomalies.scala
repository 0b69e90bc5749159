package graft.rdf

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** hasNext-chain anomaly detection and repair planning (reference
  * `run/find/hasnext_anomalies.py:83-270`, repair heuristics of
  * `run/patches/has_next.py:467-503` minus its external-API lookups).
  *
  * The reference walks one BR file at a time in a process pool; here the
  * (br, role) groups are built with predicate-pruned joins over the
  * `triples` table and the per-group logic runs under `flatMapGroups` —
  * groups are author/editor/publisher lists (bounded by the longest author
  * list in the corpus, not by corpus size), so the shuffle key is (br,
  * role) and every group is tiny. The four relational anomaly classes
  * (self-loop, multi-next, dangling, start-node counts) never leave
  * DataFrame algebra; only cycle detection — inherently a per-group DFS
  * over a multi-edge adjacency — drops to typed groups.
  */
object ChainAnomalies {

  final case class ArInfo(br: String, role: String, ar: String, nexts: Seq[String])
  final case class Anomaly(anomaly_type: String, br: String, role_type: String,
      ars_involved: Seq[String], details: String)
  /** Repaired edge list: `next_ar` is null for the chain tail. */
  final case class RepairedEdge(br: String, role: String, ar: String, next_ar: String)

  /** (br, role, ar, nexts) — one row per AR mention, built from the four
    * hot predicates (each a pruned partition scan when the triples frame
    * comes from [[TriplesTable.scanPredicate]]). */
  def arGroups(triples: DataFrame): Dataset[ArInfo] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val brAr = triples.filter($"p" === Vocab.IsDocumentContextFor)
      .select($"s".as("br"), $"o".as("ar"))
    val roles = triples.filter($"p" === Vocab.WithRole)
      .select($"s".as("ar"),
        regexp_replace($"o", lit("^" + java.util.regex.Pattern.quote(Vocab.Pro)), lit("")).as("role"))
    val nexts = triples.filter($"p" === Vocab.HasNext)
      .groupBy($"s".as("ar")).agg(sort_array(collect_list($"o")).as("nexts"))
    brAr.join(roles, Seq("ar"), "left")
      .join(nexts, Seq("ar"), "left")
      .select($"br", coalesce($"role", lit("unknown")).as("role"), $"ar",
        coalesce($"nexts", array().cast("array<string>")).as("nexts"))
      .as[ArInfo]
  }

  private def omidNumber(uri: String): Long = {
    val tail = uri.substring(uri.lastIndexOf('/') + 1)
    val digits = tail.dropWhile(!_.isDigit).takeWhile(_.isDigit)
    if (digits.isEmpty) Long.MaxValue else digits.toLong
  }

  /** All six anomaly classes of `find_anomalies` (hasnext_anomalies.py:
    * 131-240). Relational classes are joins/aggregations; `cycle` replays
    * the reference's iterative DFS per (br, role) group. */
  def anomalies(triples: DataFrame): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val groups = arGroups(triples).toDF().localCheckpoint()

    val selfLoop = groups.filter(array_contains($"nexts", $"ar"))
      .select(lit("self_loop").as("anomaly_type"), $"br", $"role".as("role_type"),
        array($"ar").as("ars_involved"),
        concat(lit("AR "), element_at(split($"ar", "/"), -1),
          lit(" hasNext points to itself")).as("details"))

    val multiNext = groups.filter(size($"nexts") > 1)
      .select(lit("multiple_has_next").as("anomaly_type"), $"br", $"role".as("role_type"),
        array($"ar").as("ars_involved"),
        concat(lit("AR "), element_at(split($"ar", "/"), -1), lit(" has "),
          size($"nexts"), lit(" hasNext targets")).as("details"))

    val members = groups.select($"br", $"role", $"ar".as("member"))
    val dangling = groups
      .select($"br", $"role", $"ar", explode($"nexts").as("target"))
      .join(members.withColumnRenamed("member", "target"),
        Seq("br", "role", "target"), "left_anti")
      .select(lit("dangling_has_next").as("anomaly_type"), $"br", $"role".as("role_type"),
        array($"ar").as("ars_involved"),
        concat(lit("AR "), element_at(split($"ar", "/"), -1),
          lit(" hasNext points to "), element_at(split($"target", "/"), -1),
          lit(" which is not in this BR/role group")).as("details"))

    // start-node census: a start node is a member no in-group edge targets
    val referenced = groups
      .select($"br", $"role", explode($"nexts").as("member"))
      .join(members, Seq("br", "role", "member"), "left_semi")
      .distinct()
    val starts = members.join(referenced, Seq("br", "role", "member"), "left_anti")
    val census = members.groupBy($"br", $"role")
      .agg(count(lit(1)).as("n_members"), sort_array(collect_list($"member")).as("all_ars"))
      .join(starts.groupBy($"br", $"role")
          .agg(count(lit(1)).as("n_starts"), sort_array(collect_list($"member")).as("start_ars")),
        Seq("br", "role"), "left")
      .withColumn("n_starts", coalesce($"n_starts", lit(0L)))
      .filter($"n_members" > 1)
    val noStart = census.filter($"n_starts" === 0)
      .select(lit("no_start_node").as("anomaly_type"), $"br", $"role".as("role_type"),
        $"all_ars".as("ars_involved"),
        concat(lit("All "), $"n_members",
          lit(" ARs are targets of hasNext (fully circular)")).as("details"))
    val multiStart = census.filter($"n_starts" > 1)
      .select(lit("multiple_start_nodes").as("anomaly_type"), $"br", $"role".as("role_type"),
        $"start_ars".as("ars_involved"),
        concat($"n_starts",
          lit(" ARs have no incoming hasNext (disconnected fragments)")).as("details"))

    val cycles = arGroups(triples).groupByKey(g => (g.br, g.role))
      .flatMapGroups { (key: (String, String), it: Iterator[ArInfo]) =>
        val (br, role) = key
        val ars = it.toSeq
        detectCycles(ars).map { cycle =>
          val ids = cycle.map(u => u.substring(u.lastIndexOf('/') + 1))
          Anomaly("cycle", br, role, cycle,
            s"${cycle.length}-node cycle: ${ids.mkString(" -> ")} -> ${ids.head}")
        }
      }.toDF()

    Seq(selfLoop, multiNext, dangling, noStart, multiStart, cycles)
      .reduce(_ unionByName _)
  }

  /** The reference's iterative DFS (hasnext_anomalies.py:83-128): cycles
    * over in-group, non-self edges; each cycle reported once as the path
    * slice from its first revisited node. */
  private[rdf] def detectCycles(ars: Seq[ArInfo]): Seq[Seq[String]] = {
    val inGroup = ars.map(_.ar).toSet
    val adj: Map[String, Seq[String]] = ars.iterator
      .map(a => a.ar -> a.nexts.filter(t => inGroup(t) && t != a.ar))
      .filter(_._2.nonEmpty).toMap
    val globallyVisited = collection.mutable.Set.empty[String]
    val cycles = collection.mutable.ListBuffer.empty[Seq[String]]
    for (start <- ars.map(_.ar).sorted if !globallyVisited(start)) {
      val path = collection.mutable.ArrayBuffer.empty[String]
      val pathSet = collection.mutable.Set.empty[String]
      val stack = collection.mutable.ArrayBuffer[(String, Int)]((start, -1))
      while (stack.nonEmpty) {
        val (node, ni) = stack.last
        if (ni == -1) {
          if (pathSet(node)) {
            cycles += path.slice(path.indexOf(node), path.length).toSeq
            stack.remove(stack.length - 1)
          } else if (globallyVisited(node)) {
            stack.remove(stack.length - 1)
          } else {
            path += node; pathSet += node
            stack(stack.length - 1) = (node, 0)
          }
        } else {
          val neighbors = adj.getOrElse(node, Nil)
          if (ni < neighbors.length) {
            stack(stack.length - 1) = (node, ni + 1)
            stack += ((neighbors(ni), -1))
          } else {
            path.remove(path.length - 1); pathSet -= node
            globallyVisited += node
            stack.remove(stack.length - 1)
          }
        }
      }
    }
    cycles.toSeq
  }

  /** Repair plan for every (br, role) group: the canonical chain is
    * [[ArChains.canonicalChain]] — the SAME rule the reader resolves by
    * (longest walkable chain, ties to lowest start; the has_next.py:
    * 467-503 ordering heuristic minus its external-API verification) —
    * with the leftover ARs appended in omid order. One chain semantics
    * for the whole engine: because the repaired group is a clean
    * single-next list headed by the canonical chain, re-reading it
    * returns the repaired order verbatim (repair is a fixed point of
    * read; ChainFixedPointSpec pins this). Emits the full repaired edge
    * list (tail rows have null next_ar) — diff against the store's
    * hasNext triples to get the patch. */
  def repairPlan(triples: DataFrame): Dataset[RepairedEdge] = {
    val spark = triples.sparkSession
    import spark.implicits._
    arGroups(triples).groupByKey(g => (g.br, g.role))
      .flatMapGroups { (key: (String, String), it: Iterator[ArInfo]) =>
        val (br, role) = key
        val ars = it.toSeq
        val best = ArChains.canonicalChain(
          ArChains.groupAdjacency(ars.map(a => (a.ar, a.nexts))))
        val rest = ars.map(_.ar).filterNot(best.toSet).sortBy(omidNumber)
        val order = best ++ rest
        order.zip(order.drop(1).map(Option(_)) :+ None).map {
          case (ar, nx) => RepairedEdge(br, role, ar, nx.orNull)
        }
      }
  }
}
