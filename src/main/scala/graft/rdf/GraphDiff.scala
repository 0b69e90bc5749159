package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R2 — preexisting-graph overlay / diff-aware updates: the oc_ocdm
  * graph-diff (add/keep/delete sets per entity) as plain `except`-based set
  * algebra over the triples table (SURVEY §2.7 R2). The rendered
  * INSERT/DELETE text is the provenance `update_query` payload (R3).
  */
object GraphDiff {

  final case class Delta(additions: DataFrame, deletions: DataFrame)

  /** Triples to add/delete to move `snapshot` to `target`, restricted to
    * subjects present in `target` (entities untouched by the batch keep
    * their triples — "preexisting triples not re-asserted"). */
  def diff(snapshot: DataFrame, target: DataFrame): Delta = {
    import snapshot.sparkSession.implicits._
    val touched = target.select($"s").distinct()
    val relevant = snapshot.join(touched, Seq("s"), "left_semi")
    val cols = Seq($"s", $"p", $"o", $"o_datatype")
    Delta(
      additions = target.select(cols: _*).except(relevant.select(cols: _*)),
      deletions = relevant.select(cols: _*).except(target.select(cols: _*)))
  }

  /** Apply a delta to a snapshot (the MERGE the reference performs via
    * SPARQL UPDATE, S5). */
  def apply(snapshot: DataFrame, delta: Delta): DataFrame = {
    import snapshot.sparkSession.implicits._
    val cols = Seq($"s", $"p", $"o", $"o_datatype")
    snapshot.select(cols: _*)
      .except(delta.deletions.select(cols: _*))
      .union(delta.additions.select(cols: _*))
      .distinct()
  }

  /** Render per-entity SPARQL-update text (the reference stores this in
    * prov `hasUpdateQuery`; semantics matter, bytes don't — SURVEY §7.4
    * risk 5). */
  def updateQueries(delta: Delta): DataFrame = {
    import delta.additions.sparkSession.implicits._
    def term(o: org.apache.spark.sql.Column, dt: org.apache.spark.sql.Column) =
      when(dt.isNull, concat(lit("<"), o, lit(">")))
        .otherwise(concat(lit("\""), o, lit("\"^^<"), dt, lit(">")))
    val adds = delta.additions
      .select($"s", concat(lit("INSERT DATA { <"), $"s", lit("> <"), $"p", lit("> "),
        term($"o", $"o_datatype"), lit(" . }")).as("q"))
    val dels = delta.deletions
      .select($"s", concat(lit("DELETE DATA { <"), $"s", lit("> <"), $"p", lit("> "),
        term($"o", $"o_datatype"), lit(" . }")).as("q"))
    adds.union(dels)
      .groupBy($"s")
      .agg(concat_ws(";\n", sort_array(collect_list($"q"))).as("update_query"))
  }
}
