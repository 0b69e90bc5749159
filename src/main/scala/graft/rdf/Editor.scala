package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MetaEditor equivalents — surgical updates over the `triples` table
  * (reference `oc_meta/core/editor.py:90-188`: `update_property`, `delete`
  * with property/object, entity purge with inbound-reference cleanup).
  *
  * The reference loads ONE entity at a time from the triplestore into an
  * in-memory GraphSet, mutates it through oc_ocdm setters, and re-saves
  * with per-entity SPARQL round trips. Here every operation takes a
  * DataFrame OF EDITS and applies them with equi-joins over the triples
  * table, so a million-row patch plan is a handful of shuffles, not a
  * million round trips — the shape that survives a 100 TB store.
  *
  * Each operation returns the post-edit triples, the SCD2-upserted
  * provenance (a "modified"/"deleted" snapshot per touched entity, derived
  * from its previous open snapshot), and the [[GraphDiff.Delta]] whose
  * rendered [[GraphDiff.updateQueries]] is the reference's
  * `hasUpdateQuery` payload.
  */
object Editor {

  final case class EditResult(
      triples: DataFrame,
      prov: DataFrame,
      delta: GraphDiff.Delta) {
    /** Per-entity SPARQL update text for the new snapshots (R3 payload). */
    def updateQueries: DataFrame = GraphDiff.updateQueries(delta)
  }

  private val DefaultAgent = "https://w3id.org/oc/meta/prov/pa/1"

  private def tripleCols(df: DataFrame) =
    df.select(col("s"), col("p"), col("o"), col("o_datatype"))

  /** Full entity URI -> prov `entity` key (meta short form). */
  private def metaOf(c: org.apache.spark.sql.Column) =
    regexp_replace(c,
      lit("^" + java.util.regex.Pattern.quote(Vocab.BaseIri + "/")), lit(""))

  /** `update_property(res, property, new_value)` (editor.py:90-111), batched:
    * `updates` is (s, p, o, o_datatype) with full URIs and o_datatype NULL
    * for IRI objects. Functional-setter semantics: every existing value of
    * a touched (s, p) is replaced by the update rows for that (s, p) — the
    * oc_ocdm setter path the reference invokes for titles/dates/links. */
  def updateProperty(triples: DataFrame, prov: DataFrame, updates: DataFrame,
      generatedAt: String, agent: String = DefaultAgent): EditResult = {
    val u = tripleCols(updates)
    val touchedSP = u.select(col("s"), col("p")).distinct()
    val existingSP = tripleCols(triples.join(touchedSP, Seq("s", "p"), "left_semi"))
    val delta = GraphDiff.Delta(
      additions = u.except(existingSP),
      deletions = existingSP.except(u))
    applyDelta(triples, prov, delta, generatedAt, agent)
  }

  /** `delete(res, property[, object])` (editor.py:146-176), batched:
    * `deletes` is (s, p, o) with o NULL meaning "every value of (s, p)".
    * Both arms are pure equi-joins (s,p) / (s,p,o). */
  def deleteProperty(triples: DataFrame, prov: DataFrame, deletes: DataFrame,
      generatedAt: String, agent: String = DefaultAgent): EditResult = {
    val allValues = deletes.filter(col("o").isNull).select(col("s"), col("p")).distinct()
    val oneValue = deletes.filter(col("o").isNotNull).select(col("s"), col("p"), col("o")).distinct()
    val matched = tripleCols(triples.join(allValues, Seq("s", "p"), "left_semi"))
      .unionByName(tripleCols(triples.join(oneValue, Seq("s", "p", "o"), "left_semi")))
      .distinct()
    val delta = GraphDiff.Delta(
      additions = matched.limit(0),
      deletions = matched)
    applyDelta(triples, prov, delta, generatedAt, agent)
  }

  /** `delete(res)` entity purge (editor.py:177-188): drops every outgoing
    * triple of each subject in `entities` (column `s`, full URI) AND every
    * inbound IRI reference to it — the reference's `?s ?p <res>` loop +
    * `mark_as_to_be_deleted`. Purged entities get a closed "deleted"
    * snapshot; entities that merely lost a reference get a "modified" one. */
  def deleteEntities(triples: DataFrame, prov: DataFrame, entities: DataFrame,
      generatedAt: String, agent: String = DefaultAgent): EditResult = {
    val subj = entities.select(col("s")).distinct()
    val outgoing = tripleCols(triples.join(subj, Seq("s"), "left_semi"))
    val inbound = tripleCols(triples
      .filter(col("o_datatype").isNull)
      .join(subj.select(col("s").as("o")), Seq("o"), "left_semi"))
    val deletions = outgoing.unionByName(inbound).distinct()
    val delta = GraphDiff.Delta(additions = deletions.limit(0), deletions = deletions)

    val newTriples = GraphDiff.apply(triples, delta)
    val purged = subj.select(metaOf(col("s")).as("entity"))
    val referencing = inbound.select(metaOf(col("s")).as("entity")).distinct()
      .join(purged, Seq("entity"), "left_anti")
    val incoming =
      snapshotsFor(prov, purged, generatedAt, "Entity deleted", agent,
        closed = true)
      .unionByName(
        snapshotsFor(prov, referencing, generatedAt, "Entity modified", agent,
          closed = false))
    EditResult(newTriples, Provenance.upsert(prov, incoming, generatedAt), delta)
  }

  private def applyDelta(triples: DataFrame, prov: DataFrame,
      delta: GraphDiff.Delta, generatedAt: String, agent: String): EditResult = {
    val newTriples = GraphDiff.apply(triples, delta)
    val touched = delta.additions.select(col("s"))
      .unionByName(delta.deletions.select(col("s")))
      .distinct()
      .select(metaOf(col("s")).as("entity"))
    val incoming = snapshotsFor(prov, touched, generatedAt, "Entity modified",
      agent, closed = false)
    EditResult(newTriples, Provenance.upsert(prov, incoming, generatedAt), delta)
  }

  /** Batched point edits — the remove+add pair `update_property` performs
    * for one value (editor.py:90-111) WITHOUT the functional-setter
    * replacement of sibling values. Each edit row carries the OLD triple
    * (s, p, o, o_datatype) and the NEW object (o_new, o_new_datatype):
    * the old triple is deleted and the new one added in a single delta.
    * `o` NULL = pure insertion; `o_new` NULL = pure deletion. The fixer
    * programs ([[Fixers]]) are all expressed through this. */
  def replaceValues(triples: DataFrame, prov: DataFrame, edits: DataFrame,
      generatedAt: String, agent: String = DefaultAgent): EditResult = {
    val dels = edits.filter(col("o").isNotNull)
      .select(col("s"), col("p"), col("o"), col("o_datatype")).distinct()
    val adds = edits.filter(col("o_new").isNotNull)
      .select(col("s"), col("p"), col("o_new").as("o"),
        col("o_new_datatype").as("o_datatype")).distinct()
    applyDelta(triples, prov, GraphDiff.Delta(additions = adds, deletions = dels),
      generatedAt, agent)
  }

  /** One snapshot per entity, derived from the entity's currently-open
    * snapshot (`{uri}/prov/se/{n}`, same layout as [[Provenance]]). */
  private def snapshotsFor(prov: DataFrame, entities: DataFrame,
      generatedAt: String, description: String, agent: String,
      closed: Boolean): DataFrame = {
    val prevOpen = prov.filter(col("invalidated_at").isNull)
      .groupBy(col("entity")).agg(max(col("snapshot_n")).as("prev_open"))
    entities.join(prevOpen, Seq("entity"), "left")
      .select(
        col("entity"),
        lit(1L).as("snapshot_n"),
        lit(generatedAt).as("generated_at"),
        (if (closed) lit(generatedAt) else lit(null).cast("string")).as("invalidated_at"),
        when(col("prev_open").isNotNull,
          array(concat(lit(Vocab.BaseIri + "/"), col("entity"),
            lit("/prov/se/"), col("prev_open"))))
          .otherwise(array().cast("array<string>")).as("derived_from"),
        lit(description).as("description"),
        lit(agent).as("attributed_to"))
  }
}
