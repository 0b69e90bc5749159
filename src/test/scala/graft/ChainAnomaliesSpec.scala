package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.curation.Curator
import graft.rdf.{ChainAnomalies, TriplesEmitter, Vocab}

/** hasNext anomaly detection/repair specs (reference
  * `run/find/hasnext_anomalies.py` classes, `run/patches/has_next.py`
  * chain-ordering heuristic) over deliberately corrupted chains.
  */
class ChainAnomaliesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ar(n: Int) = Vocab.uri(s"ar/06$n")
  def br(n: Int) = Vocab.uri(s"br/06$n")

  /** (br, ars..., edges ar->ar) for one author group. */
  def group(brN: Int, ars: Seq[Int], edges: Seq[(Int, Int)]): Seq[(String, String, String, String)] = {
    val ctx = ars.map(a => (br(brN), Vocab.IsDocumentContextFor, ar(a), null.asInstanceOf[String]))
    val roles = ars.map(a => (ar(a), Vocab.WithRole, Vocab.Pro + "author", null.asInstanceOf[String]))
    val next = edges.map { case (f, t) => (ar(f), Vocab.HasNext, ar(t), null.asInstanceOf[String]) }
    ctx ++ roles ++ next
  }

  lazy val corrupted = {
    import spark.implicits._
    (group(1, Seq(11, 12, 13), Seq(11 -> 12, 12 -> 13)) ++ // healthy
      group(2, Seq(24, 25), Seq(24 -> 24, 24 -> 25)) ++ // self-loop + multi-next
      group(3, Seq(36, 37, 38), Seq(36 -> 37, 37 -> 38, 38 -> 36)) ++ // cycle
      group(4, Seq(49, 410, 411, 412), Seq(49 -> 410, 411 -> 412)) ++ // fragments
      group(5, Seq(513), Seq(513 -> 599))) // dangling (ar/0599 not in group)
      .toDF("s", "p", "o", "o_datatype")
  }

  test("detects every anomaly class and nothing in the healthy chain") {
    import spark.implicits._
    val a = ChainAnomalies.anomalies(corrupted).localCheckpoint()
    val byType = a.groupBy($"anomaly_type").count().as[(String, Long)].collect().toMap
    assert(byType == Map(
      // no_start_node is 2: the reference counts self-loop targets in
      // referenced_ars (hasnext_anomalies.py:177-186), so the self-loop
      // group (24->24, 24->25) is also fully-circular — no unreferenced member.
      "self_loop" -> 1L, "multiple_has_next" -> 1L, "dangling_has_next" -> 1L,
      "no_start_node" -> 2L, "cycle" -> 1L, "multiple_start_nodes" -> 1L))
    assert(a.filter($"br" === br(1)).isEmpty, "healthy chain is clean")
    val selfLoop = a.filter($"anomaly_type" === "self_loop").head()
    assert(selfLoop.getSeq[String](selfLoop.fieldIndex("ars_involved")) == Seq(ar(24)))
    val cycle = a.filter($"anomaly_type" === "cycle").head()
    assert(cycle.getSeq[String](cycle.fieldIndex("ars_involved")).toSet == Set(ar(36), ar(37), ar(38)))
    assert(cycle.getAs[String]("details").contains("3-node cycle"))
    val frag = a.filter($"anomaly_type" === "multiple_start_nodes").head()
    assert(frag.getSeq[String](frag.fieldIndex("ars_involved")).toSet == Set(ar(49), ar(411)))
  }

  test("repair plan: longest chain, lowest start id, leftovers in omid order") {
    import spark.implicits._
    val plan = ChainAnomalies.repairPlan(corrupted).toDF().localCheckpoint()
    def chainOf(brN: Int): Seq[(String, String)] =
      plan.filter($"br" === br(brN)).select($"ar", $"next_ar")
        .as[(String, String)].collect().toSeq

    // healthy chain preserved verbatim
    assert(chainOf(1).toMap == Map(ar(11) -> ar(12), ar(12) -> ar(13), ar(13) -> null))
    // cycle: entered at the lowest omid, closed edge dropped
    assert(chainOf(3).toMap == Map(ar(36) -> ar(37), ar(37) -> ar(38), ar(38) -> null))
    // fragments: lowest-start chain first, the rest appended in omid order
    assert(chainOf(4).toMap == Map(ar(49) -> ar(410), ar(410) -> ar(411),
      ar(411) -> ar(412), ar(412) -> null))
    // dangling target removed: single AR, no next
    assert(chainOf(5).toMap == Map(ar(513) -> null))
  }

  test("curated batch triples produce zero anomalies") {
    val batch = Curator.curateFresh(
      Curator.readInput(spark, "/root/reference/example_metadata.csv"))
    val triples = TriplesEmitter.emit(batch)
    assert(ChainAnomalies.anomalies(triples).isEmpty)
  }
}
