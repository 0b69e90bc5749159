package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** AR `hasNext` chain resolution — the reference's
  * `retrieve_ra_sequence_from_br_meta` (`lib/finder.py:313-408`)
  * re-expressed as ONE distributed pass.
  *
  * The reference walks each BR's role chain pointer-by-pointer against a
  * local graph. Degenerate stores (real ones, per its test suite) make
  * that walk non-trivial: circular chains have no head (start = lowest AR
  * number), corrupt data can leave SEVERAL disconnected chains under one
  * BR (the LONGEST wins; ties break to the lowest-numbered start), a
  * `next` pointer can dangle or point at an AR of another role (the walk
  * stops there), and an AR without a `pro:isHeldBy` agent is not a chain
  * member at all.
  *
  * Engine shape: a chain lives entirely inside one (br, role) group and is
  * bounded by the author list (~10^4 max — the reference's own stress
  * test is 10 001 roles), so resolution is groupBy(br, role) +
  * collect_list + a row-local walk — one shuffle keyed by (br, role),
  * instead of the previous head-BFS via iterative global joins (one Spark
  * job per chain HOP, hard-capped at 100 hops, and unable to express
  * longest-chain selection). Row-local multi-field graph logic is the
  * SURVEY §2.10-sanctioned UDF shape (same as Tools.collectIdentifiers).
  *
  * Deliberate determinism divergence: on the data-ERROR cases of multiple
  * `hasNext` / multiple `isHeldBy` per AR the reference takes whichever
  * triple its store yields first (storage order — its test only pins "no
  * crash"); this picks min-by-resource-number so results are stable
  * across partitionings.
  */
object ArChains {

  /** Numeric resource id from an omid URI tail (`ar/0601` -> 601) — the
    * reference's `get_resource_number` as used for chain tie-breaks. */
  private[graft] def resourceNumber(uri: String): Long = {
    val seg = uri.substring(uri.lastIndexOf('/') + 1)
    val digits = seg.filter(_.isDigit)
    if (digits.isEmpty || digits.length > 18) Long.MaxValue else digits.toLong
  }

  /** Per-member adjacency for one (br, role) group: targets restricted to
    * IN-GROUP, non-self ARs, ordered by resource number. The shared
    * pre-walk normalization of both the reader and the repairer — an
    * out-of-group or self `next` can stop a walk but never extend one
    * (finder.py:344-349), and the priority order makes the data-ERROR
    * multi-next case deterministic (the reference pins only "no crash"
    * there, taking storage order; this engine takes lowest-numbered). */
  private[graft] def groupAdjacency(
      nexts: Seq[(String, Seq[String])]): Map[String, Seq[String]] = {
    val inGroup = nexts.iterator.map(_._1).toSet
    nexts.groupBy(_._1).map { case (ar, rows) =>
      ar -> rows.flatMap(_._2)
        .filter(t => t != null && t.nonEmpty && t != ar && inGroup(t))
        .distinct.sortBy(resourceNumber)
    }
  }

  /** THE canonical-chain rule — the engine's single chain semantics,
    * shared by the reader ([[resolveGroup]]) and the repairer
    * ([[ChainAnomalies.repairPlan]]):
    *
    *   - start candidates = members no in-group edge targets (a fully
    *     circular group nominates every member);
    *   - walk = from the current AR, step to its first not-yet-visited
    *     target in adjacency priority order (for well-formed single-next
    *     data this is the plain pointer walk; on multi-next corruption
    *     it degenerates to min-next, falling back to the next-lowest
    *     when the min edge is dead);
    *   - winner = longest walk, ties to the lowest-numbered start.
    *
    * Because the repairer rewrites a group as the winner followed by the
    * leftovers in resource order — a clean single-next list — re-reading
    * a repaired group returns exactly the repaired order: repair is a
    * fixed point of read (ChainFixedPointSpec). */
  private[graft] def canonicalChain(
      adj: Map[String, Seq[String]]): Vector[String] = {
    if (adj.isEmpty) return Vector.empty
    val referenced = adj.valuesIterator.flatten.toSet
    val starts = {
      val s = adj.keysIterator.filterNot(referenced.contains).toSeq
      if (s.nonEmpty) s else adj.keys.toSeq
    }
    def walk(start: String): Vector[String] = {
      val visited = scala.collection.mutable.LinkedHashSet(start)
      var cur = start
      var continue = true
      while (continue) {
        adj.getOrElse(cur, Nil).find(!visited.contains(_)) match {
          case Some(t) => visited += t; cur = t
          case None => continue = false
        }
      }
      visited.toVector
    }
    starts.map(walk).minBy(c => (-c.length, resourceNumber(c.head)))
  }

  /** Row-local resolution of one (br, role) member group.
    * `members`: (ar, ra, next — null/empty when absent); output: the
    * winning chain as (ar, ra, pos) with pos 1..len, non-chain ARs
    * dropped (finder.py:341-408 semantics, incl. its tests' loop /
    * self-reference / two-chains / dangling-next cases), the chain rule
    * itself being [[canonicalChain]]. */
  private[graft] def resolveGroup(
      members: Seq[(String, String, String)]): Seq[(String, String, Long)] = {
    if (members.isEmpty) return Seq.empty
    val raOf: Map[String, String] = members.groupBy(_._1).map {
      case (ar, rows) => ar -> rows.map(_._2).minBy(resourceNumber)
    }
    val adj = groupAdjacency(members.map(m => (m._1, Seq(m._3))))
    canonicalChain(adj).zipWithIndex.map {
      case (ar, i) => (ar, raOf(ar), (i + 1).toLong)
    }
  }

  private val resolveUdf = udf((ms: Seq[Row]) =>
    resolveGroup(ms.map(r => (r.getString(0), r.getString(1), r.getString(2)))))

  /** Resolve every BR's per-role chain. Inputs are the standard predicate
    * slices: `brAr` (br, ar), `arRole` (ar, role), `arRa` (ar, ra),
    * `next` (ar, next_ar) — full URIs. Output (br, role, pos, ar, ra),
    * one row per winning-chain member, pos 1-based in chain order. */
  def resolve(brAr: DataFrame, arRole: DataFrame, arRa: DataFrame,
      next: DataFrame): DataFrame = {
    import brAr.sparkSession.implicits._
    brAr.join(arRole, "ar").join(arRa, "ar")
      .join(next, Seq("ar"), "left")
      .groupBy($"br", $"role")
      .agg(collect_list(struct($"ar", $"ra", $"next_ar")).as("ms"))
      .select($"br", $"role", explode(resolveUdf($"ms")).as("m"))
      .select($"br", $"role", $"m._3".as("pos"), $"m._1".as("ar"),
        $"m._2".as("ra"))
  }

  /** The finder's `_construct_full_name` (finder.py:301-311): family/given
    * compose; a foaf:name shows ONLY when both parts are absent, and all
    * three present yields "" (the reference's fall-through). */
  def finderFullName(orgName: Column, family: Column, given: Column): Column = {
    val n = coalesce(orgName, lit(""))
    val f = coalesce(family, lit(""))
    val g = coalesce(given, lit(""))
    when(n =!= "" && f === "" && g === "", n)
      .when(n === "" && f =!= "" && g === "", concat(f, lit(",")))
      .when(n === "" && f === "" && g =!= "", concat(lit(", "), g))
      .when(n === "" && f =!= "" && g =!= "", concat(f, lit(", "), g))
      .otherwise(lit(""))
  }

  /** The CSV export's name rule (generate_csv.py:218-236): family/given
    * take precedence over foaf:name even when all three are present. */
  def csvName(orgName: Column, family: Column, given: Column): Column = {
    val n = coalesce(orgName, lit(""))
    val f = coalesce(family, lit(""))
    val g = coalesce(given, lit(""))
    when(f =!= "" && g =!= "", concat(f, lit(", "), g))
      .when(f =!= "", concat(f, lit(",")))
      .when(g =!= "", concat(lit(", "), g))
      .otherwise(n)
  }
}
