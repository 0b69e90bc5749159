package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.curation.Curator.CuratedBatch

/** R3 — provenance snapshot generation (SURVEY §1.1/§2.7): the SCD2-style
  * `prov_snapshots` table. A fresh load creates snapshot 1 ("entity
  * created") for every minted entity; subsequent batches append new
  * snapshots and invalidate the previous one (upsert), with merge
  * provenance recording multiple `wasDerivedFrom` (J10/G8 feed off this
  * table). Snapshot URIs follow the reference layout `{entity}/prov/se/N`
  * (`lib/finder.py:201-250`).
  */
object Provenance {

  /** All entity metas minted by a batch (br + id + ar + ra + re). */
  def allEntities(batch: CuratedBatch): DataFrame = {
    import batch.entities.sparkSession.implicits._
    batch.entities.select($"meta")
      .unionByName(batch.entityIds.select($"id_meta".as("meta")).distinct())
      .unionByName(batch.roles.select($"ar_meta".as("meta")))
      .unionByName(batch.raNames.select($"ra_meta".as("meta")))
      .unionByName(batch.pages.select($"re_meta".as("meta")))
      .distinct()
  }

  /** Snapshot 1 for every entity of a fresh batch.
    * @param generatedAt ISO timestamp of the batch run (caller-supplied so
    *   runs are reproducible). */
  def freshSnapshots(batch: CuratedBatch, generatedAt: String,
      agent: String = "https://w3id.org/oc/meta/prov/pa/1"): DataFrame = {
    import batch.entities.sparkSession.implicits._
    allEntities(batch)
      .select(
        $"meta".as("entity"),
        lit(1L).as("snapshot_n"),
        lit(generatedAt).as("generated_at"),
        lit(null).cast("string").as("invalidated_at"),
        array().cast("array<string>").as("derived_from"),
        lit("Entity created").as("description"),
        lit(agent).as("attributed_to"))
  }

  /** SCD2 upsert: close the currently-open snapshot of touched entities
    * and append the new ones. Pure DataFrame set logic — the MERGE the
    * reference performs via per-entity SPARQL updates. */
  def upsert(existing: DataFrame, incoming: DataFrame, closedAt: String): DataFrame = {
    import existing.sparkSession.implicits._
    val touched = incoming.select($"entity").distinct()
      .withColumn("_touched", lit(true))
    // Flip only the open snapshot of touched entities; every other existing
    // row (incl. previously-closed history) passes through unchanged, so
    // full SCD2 history survives repeated upserts.
    val carried = existing.join(touched, Seq("entity"), "left")
      .withColumn("invalidated_at",
        when($"_touched" && $"invalidated_at".isNull, lit(closedAt))
          .otherwise($"invalidated_at"))
      .drop("_touched")
    val maxN = existing.groupBy($"entity").agg(max($"snapshot_n").as("prev_n"))
    val renumbered = incoming.join(maxN, Seq("entity"), "left")
      .withColumn("snapshot_n", coalesce($"prev_n", lit(0L)) + $"snapshot_n")
      .drop("prev_n")
    carried.unionByName(renumbered.select(carried.columns.map(col): _*))
  }

  /** Merge provenance for ONE merge group — delegates to the distributed
    * [[mergeProvenance]]. */
  def mergeSnapshot(existing: DataFrame, surviving: String, merged: Seq[String],
      generatedAt: String): DataFrame = {
    import existing.sparkSession.implicits._
    mergeProvenance(existing,
      merged.map(m => (surviving, m)).toDF("surviving", "merged"), generatedAt)
  }

  private def snapUri(entity: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit(Vocab.BaseIri + "/"), entity, lit("/prov/se/"), n)

  /** Render snapshot rows as PROV-O triples — the shape of the
    * reference's prov JSON-LD documents (prov/se.json fixtures:
    * prov:Entity type, specializationOf, generatedAtTime/
    * invalidatedAtTime as xsd:dateTime, wasDerivedFrom per derivation,
    * dcterms:description, wasAttributedTo). Feeds the same serializers
    * as data triples ([[Serialization.writeJsonLd]], [[SparqlUpdate]]),
    * so the prov side of the reference's store_data_and_prov lifecycle
    * is one rendering away from the SCD2 table. One narrow projection
    * per predicate, unioned — no shuffle at all (the consumer groups by
    * subject where it needs to). */
  def provTriples(prov: DataFrame): DataFrame = {
    import prov.sparkSession.implicits._
    val s = snapUri($"entity", $"snapshot_n")
    val iri = lit(null).cast("string")
    def row(p: String, o: org.apache.spark.sql.Column,
        dt: org.apache.spark.sql.Column) =
      prov.select(s.as("s"), lit(p).as("p"), o.as("o"), dt.as("o_datatype"))
    row(Vocab.RdfType, lit(Vocab.ProvEntity), iri)
      .unionByName(row(Vocab.SpecializationOf,
        concat(lit(Vocab.BaseIri + "/"), $"entity"), iri))
      .unionByName(row(Vocab.GeneratedAtTime, $"generated_at",
        lit(Vocab.XsdDateTime)))
      .unionByName(prov.filter($"invalidated_at".isNotNull)
        .select(s.as("s"), lit(Vocab.InvalidatedAtTime).as("p"),
          $"invalidated_at".as("o"), lit(Vocab.XsdDateTime).as("o_datatype")))
      .unionByName(prov
        .select(s.as("s"), lit(Vocab.WasDerivedFrom).as("p"),
          explode($"derived_from").as("o"), iri.as("o_datatype")))
      .unionByName(row(Vocab.Description, $"description", lit(Vocab.XsdString)))
      .unionByName(row(Vocab.WasAttributedTo, $"attributed_to", iri))
  }

  /** Batch merge provenance (`run/merge/entities.py` + the oc_ocdm merge
    * snapshots its `check_merged_*_results.py` checkers expect):
    *  - the surviving entity gets a new open snapshot derived from its own
    *    last snapshot AND each merged entity's last snapshot (>= 2
    *    derivations — the merge marker G8 reads back);
    *  - every merged entity gets a closing deletion snapshot (generated
    *    and invalidated at the merge time, derived from its last
    *    snapshot), so no merged entity is left with an open snapshot.
    * `pairs` = (surviving, merged) META ids; one shuffle per side, no
    * driver-side state — N merge groups in one pass. */
  def mergeProvenance(existing: DataFrame, pairs: DataFrame,
      generatedAt: String): DataFrame = {
    import existing.sparkSession.implicits._
    val latest = existing.filter($"invalidated_at".isNull)
      .select($"entity", $"snapshot_n")
    val agent = lit("https://w3id.org/oc/meta/prov/pa/1")
    val survSnaps = pairs
      .join(latest.toDF("surviving", "s_n"), Seq("surviving"))
      .join(latest.toDF("merged", "m_n"), Seq("merged"))
      .groupBy($"surviving", $"s_n")
      .agg(array_sort(collect_list(struct($"merged", $"m_n"))).as("ms"))
      .select(
        $"surviving".as("entity"),
        lit(1L).as("snapshot_n"),
        lit(generatedAt).as("generated_at"),
        lit(null).cast("string").as("invalidated_at"),
        concat(array(snapUri($"surviving", $"s_n")),
          transform($"ms", m => snapUri(m.getField("merged"), m.getField("m_n"))))
          .as("derived_from"),
        concat(lit("Entity merged with "),
          concat_ws(", ", transform($"ms", _.getField("merged")))).as("description"),
        agent.as("attributed_to"))
    val delSnaps = pairs.select($"merged".as("entity")).distinct()
      .join(latest, Seq("entity"))
      .select(
        $"entity",
        lit(1L).as("snapshot_n"),
        lit(generatedAt).as("generated_at"),
        lit(generatedAt).as("invalidated_at"),
        array(snapUri($"entity", $"snapshot_n")).as("derived_from"),
        lit("Entity deleted").as("description"),
        agent.as("attributed_to"))
    upsert(existing, survSnaps.unionByName(delSnaps), generatedAt)
  }
}
