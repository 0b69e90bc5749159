package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R6 — post-batch verification suite (reference
  * `run/meta/check_results.py:271-567` + `check_rdf_files.py` datatype
  * checks): every assertion an operator runs after a curation batch,
  * re-expressed as violation-table anti-joins over the curated CSV rows,
  * the `triples` table, and the `prov_snapshots` table.
  *
  * The reference batches SPARQL VALUES queries against the store and
  * accumulates per-row error dicts; here each check IS one distributed
  * anti-join producing a violations DataFrame (empty == pass), so checking
  * a 100 TB store is the same plan shape as checking a test fixture.
  * Violation rows carry (check, entity, detail) and union into one report.
  */
object Checkers {

  private def violation(df: DataFrame, check: String,
      entity: org.apache.spark.sql.Column,
      detail: org.apache.spark.sql.Column): DataFrame =
    df.select(lit(check).as("check"), entity.cast("string").as("entity"),
      detail.cast("string").as("detail"))

  /** External-id mentions of the curated output CSV: one row per
    * `scheme:value` token with the omid expected to own it (the `omid:`
    * token of the same cell / bracket group — check_results.py:237-268).
    * Columns: (column, expected_omid, scheme, value). */
  def idMentions(rows: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    // id column: the whole cell is one token group
    val idCells = rows.select(lit("id").as("column"), $"id".as("grp"))
    // agent/venue columns: each [ ... ] bracket group
    val bracketed = Seq("author", "editor", "publisher", "venue").map { c =>
      rows.select(lit(c).as("column"),
        explode(expr(s"regexp_extract_all($c, '\\\\[([^\\\\]]+)\\\\]', 1)")).as("grp"))
    }.reduce(_ unionByName _)
    (idCells unionByName bracketed)
      .filter(length(trim($"grp")) > 0)
      .withColumn("toks", filter(split($"grp", " "), t => length(t) > 0))
      .withColumn("expected_omid",
        filter($"toks", t => t.startsWith("omid:")).getItem(0))
      .withColumn("expected_omid", expr("substring(expected_omid, 6)"))
      .withColumn("tok", explode(filter($"toks",
        t => !t.startsWith("omid:") && t.contains(":"))))
      .select($"column", $"expected_omid",
        substring_index($"tok", ":", 1).as("scheme"),
        expr("substring(tok, instr(tok, ':') + 1)").as("value"))
  }

  /** Store-side id entities: (scheme, value, owner_meta, id_meta). */
  def storeIds(triples: DataFrame): DataFrame = {
    import triples.sparkSession.implicits._
    val strip = (c: org.apache.spark.sql.Column) =>
      regexp_replace(c, lit("^" + java.util.regex.Pattern.quote(Vocab.BaseIri + "/")), lit(""))
    val values = triples.filter($"p" === Vocab.HasLiteralValue)
      .select($"s".as("id_uri"), $"o".as("value"))
    val schemes = triples.filter($"p" === Vocab.UsesIdentifierScheme)
      .select($"s".as("id_uri"),
        regexp_replace($"o", lit("^" + java.util.regex.Pattern.quote(Vocab.Datacite)), lit("")).as("scheme"))
    val owners = triples.filter($"p" === Vocab.HasIdentifier)
      .select($"o".as("id_uri"), strip($"s").as("owner_meta"))
    values.join(schemes, Seq("id_uri"))
      .join(owners, Seq("id_uri"), "left")
      .select($"scheme", $"value", $"owner_meta", strip($"id_uri").as("id_meta"))
  }

  /** check 1 — `identifier_not_in_triplestore` (check_results.py:443-455):
    * every external id of the curated CSV exists as an id entity. */
  def idsWithoutOmid(rows: DataFrame, triples: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    val missing = idMentions(rows)
      .join(storeIds(triples), Seq("scheme", "value"), "left_anti")
    violation(missing, "identifier_not_in_triplestore",
      concat($"scheme", lit(":"), $"value"),
      concat(lit("column "), $"column"))
  }

  /** check 2 — `omid_mismatch` (check_results.py:421-441): the id exists
    * but none of its owners is the omid the CSV row claims. */
  def omidMismatch(rows: DataFrame, triples: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    val owners = storeIds(triples).filter($"owner_meta".isNotNull)
      .groupBy($"scheme", $"value")
      .agg(collect_set($"owner_meta").as("owners"))
    val mismatched = idMentions(rows)
      .filter($"expected_omid".isNotNull)
      .join(owners, Seq("scheme", "value"))
      .filter(!array_contains($"owners", $"expected_omid"))
    violation(mismatched, "omid_mismatch",
      concat($"scheme", lit(":"), $"value"),
      concat(lit("expected "), $"expected_omid", lit(", found "),
        concat_ws(" ", sort_array($"owners"))))
  }

  /** check 3 — data-graph existence (check_results.py:471-500 file probe):
    * every omid the CSV mentions exists as a subject in the store. */
  def missingEntities(rows: DataFrame, triples: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    val cols = Seq("id", "author", "editor", "publisher", "venue")
    val omids = cols.map { c =>
      rows.select(explode(expr(
        s"regexp_extract_all($c, 'omid:([a-z]+/[0-9]+)', 1)")).as("meta"))
    }.reduce(_ unionByName _).distinct()
    val subjects = triples.select(
      regexp_replace($"s",
        lit("^" + java.util.regex.Pattern.quote(Vocab.BaseIri + "/")), lit("")).as("meta"))
      .distinct()
    violation(omids.join(subjects, Seq("meta"), "left_anti"),
      "entity_not_in_triplestore", $"meta", lit("no triples with this subject"))
  }

  /** check 4 — `missing_provenance` (check_results.py:87-129, 540-563):
    * every entity in the store has a snapshot-1 provenance record. */
  def missingProvenance(triples: DataFrame, prov: DataFrame): DataFrame = {
    import triples.sparkSession.implicits._
    val prefix = Vocab.BaseIri + "/"
    val entities = triples
      .filter($"s".startsWith(prefix))
      .select(expr(s"substring(s, ${prefix.length + 1})").as("entity"))
      .distinct()
    val provEntities = prov.filter($"snapshot_n" === 1L)
      .select($"entity").distinct()
    violation(entities.join(provEntities, Seq("entity"), "left_anti"),
      "missing_provenance", $"entity", lit("no snapshot 1"))
  }

  /** check 5 — open-snapshot invariant: a live entity must have EXACTLY one
    * open (un-invalidated) snapshot; zero is legal only for entities whose
    * latest snapshot records the deletion. */
  def openSnapshotInvariant(prov: DataFrame): DataFrame = {
    import prov.sparkSession.implicits._
    val counts = prov.groupBy($"entity")
      .agg(sum(when($"invalidated_at".isNull, 1).otherwise(0)).as("open_n"),
        max_by($"description", $"snapshot_n").as("last_desc"))
      .filter($"open_n" =!= 1 &&
        !($"open_n" === 0 && $"last_desc" === "Entity deleted"))
    violation(counts, "open_snapshot_violation", $"entity",
      concat(lit("open snapshots: "), $"open_n"))
  }

  /** check 6 — datatype validity (check_rdf_files.py date checks): date
    * literals must parse for their declared xsd type; IRI objects must look
    * like IRIs. */
  def invalidDatatypes(triples: DataFrame): DataFrame = {
    import triples.sparkSession.implicits._
    val badDate = triples.filter(
      ($"o_datatype" === Vocab.XsdDate && try_to_timestamp($"o", lit("yyyy-MM-dd")).isNull) ||
      ($"o_datatype" === Vocab.XsdGYearMonth && try_to_timestamp(concat($"o", lit("-01")), lit("yyyy-MM-dd")).isNull) ||
      ($"o_datatype" === Vocab.XsdGYear && !$"o".rlike("^-?[0-9]{4,}$")))
    val badIri = triples.filter($"o_datatype".isNull && !$"o".rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"))
    violation(badDate, "invalid_date_literal", $"s",
      concat($"o", lit(" is not a valid "), $"o_datatype"))
      .unionByName(violation(badIri, "invalid_iri_object", $"s",
        concat(lit("object "), $"o", lit(" of "), $"p", lit(" is not an IRI"))))
  }

  /** check 7 — misplaced editor ARs (`run/patches/
    * fix_misplaced_editor_ars.py:99-338` detection pass): an editor AR
    * hanging off a BR whose type is in CONTAINER_EDITOR_TYPES
    * (constants.py:60-68) violates D7 — editors of such types belong on
    * the frbr:partOf container. Pure equi-joins over the predicate
    * slices; [[Fixers.fixMisplacedEditorArs]] is the repair. */
  def misplacedEditorArs(triples: DataFrame): DataFrame = {
    import triples.sparkSession.implicits._
    val containerClasses = graft.curation.Validation.ContainerEditorTypes
      .toSeq.flatMap(Vocab.TypeLabelToClass.get).sorted
    val editorArs = triples
      .filter($"p" === Vocab.WithRole && $"o" === Vocab.Pro + "editor")
      .select($"s".as("ar"))
    val contentBrs = triples
      .filter($"p" === Vocab.RdfType && $"o".isin(containerClasses: _*))
      .select($"s".as("content")).distinct()
      // only contents WITH a container can host the violation (the
      // reference scans `frbr_part_of`-bearing entities only)
      .join(triples.filter($"p" === Vocab.PartOf).select($"s".as("content")),
        Seq("content"), "left_semi")
    val bad = triples.filter($"p" === Vocab.IsDocumentContextFor)
      .select($"s".as("content"), $"o".as("ar"))
      .join(contentBrs, Seq("content"))
      .join(editorArs, Seq("ar"))
    violation(bad, "misplaced_editor_ar", $"ar",
      concat(lit("editor AR on content "), $"content",
        lit(" instead of its container")))
  }

  /** The full report — union of every check; empty == the batch passes. */
  def checkAll(rows: DataFrame, triples: DataFrame, prov: DataFrame): DataFrame =
    Seq(
      idsWithoutOmid(rows, triples),
      omidMismatch(rows, triples),
      missingEntities(rows, triples),
      missingProvenance(triples, prov),
      openSnapshotInvariant(prov),
      invalidDatatypes(triples),
      misplacedEditorArs(triples),
    ).reduce(_ unionByName _)

  // ==== post-merge audit =================================================
  // The reference audits every D10 merge batch entity-by-entity over the
  // store and the RDF dump (`run/merge/check_merged_brs_results.py:37-120`,
  // `check_merged_ids_results.py:193-290`, `check_merged_ras_results.py:
  // 35-160` + the shared provenance walk `check_merged_brs_results.py:
  // 361-430`). Here the same assertions are per-kind anti-joins over
  // (surviving, merged) pairs x triples x prov_snapshots — one distributed
  // pass for the whole merge batch.

  /** Post-merge audit. `pairs` = (surviving, merged) full entity URIs (the
    * same frame [[graft.operators.Tools.applyMerges]] consumes); `prov`
    * entities are meta ids. Returns the violations union (empty == the
    * merge batch passes). */
  def mergeAudit(pairs: DataFrame, triples: DataFrame, prov: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    Seq(
      mergedStillPresent(pairs, triples),
      survivingConstraints(pairs, triples),
      mergeProvenanceAudit(pairs, prov),
    ).reduce(_ unionByName _)
  }

  /** Merged entities must be gone: no outgoing triples ("Merged entity
    * still exists") and no inbound references ("still referenced by other
    * entities"); surviving entities must still exist. */
  def mergedStillPresent(pairs: DataFrame, triples: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    val merged = pairs.select($"merged").distinct()
    val stillExists = merged.join(triples, merged("merged") === triples("s"), "left_semi")
    val stillReferenced = merged.join(triples,
      merged("merged") === triples("o") && triples("o_datatype").isNull, "left_semi")
    val survGone = pairs.select($"surviving").distinct()
      .join(triples.select($"s"), $"surviving" === $"s", "left_anti")
    violation(stillExists, "merged_entity_still_exists", $"merged", lit("has outgoing triples"))
      .unionByName(violation(stillReferenced, "merged_entity_still_referenced",
        $"merged", lit("is an object of other entities' triples")))
      .unionByName(violation(survGone, "surviving_entity_missing",
        $"surviving", lit("no triples for surviving entity")))
  }

  /** Shape constraints on each SURVIVING entity, dispatched on its kind
    * (br / id / ra from the URI path). One aggregation over the
    * survivors' triples serves all three checkers. */
  def survivingConstraints(pairs: DataFrame, triples: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    val surv = pairs.select($"surviving").distinct()
    val facts = surv.join(triples, surv("surviving") === triples("s"))
      .groupBy($"surviving")
      .agg(
        collect_set(when($"p" === Vocab.RdfType, $"o")).as("types"),
        count_distinct(when($"p" === Vocab.HasIdentifier, $"o")).as("id_n"),
        count_distinct(when($"p" === Vocab.Title, $"o")).as("title_n"),
        count_distinct(when($"p" === Vocab.PartOf, $"o")).as("part_of_n"),
        count_distinct(when($"p" === Vocab.PublicationDate, $"o")).as("date_n"),
        count_distinct(when($"p" === Vocab.HasSequenceIdentifier, $"o")).as("seq_n"),
        count_distinct(when($"p" === Vocab.UsesIdentifierScheme, $"o")).as("scheme_n"),
        count_distinct(when($"p" === Vocab.HasLiteralValue, $"o")).as("lit_n"),
        count_distinct(when($"p".isin(Vocab.FoafName, Vocab.FoafGivenName,
          Vocab.FoafFamilyName), $"o")).as("name_n"))
      .withColumn("kind", regexp_extract($"surviving", "/([a-z]+)/[0-9]+$", 1))
      .localCheckpoint()
    val br = facts.filter($"kind" === "br")
    val id = facts.filter($"kind" === "id")
    val ra = facts.filter($"kind" === "ra")
    def v(df: DataFrame, check: String, detail: org.apache.spark.sql.Column) =
      violation(df, check, $"surviving", detail)
    Seq(
      // BR: <=2 types including fabio:Expression, >=1 id, <=1 of title/
      // partOf/date/seqId, seqId only on volumes/issues
      v(br.filter(size($"types") === 0), "br_no_type", lit("no rdf:type")),
      v(br.filter(size($"types") > 2), "br_too_many_types",
        concat(lit("types: "), concat_ws(", ", $"types"))),
      v(br.filter(size($"types") > 0 &&
        !array_contains($"types", Vocab.Expression)), "br_not_expression",
        lit("missing fabio:Expression")),
      v(br.filter($"id_n" === 0), "br_no_identifier", lit("no datacite:hasIdentifier")),
      v(br.filter($"title_n" > 1), "br_multiple_titles", concat(lit("titles: "), $"title_n")),
      v(br.filter($"part_of_n" > 1), "br_multiple_part_of", concat(lit("partOf: "), $"part_of_n")),
      v(br.filter($"date_n" > 1), "br_multiple_pub_dates", concat(lit("dates: "), $"date_n")),
      v(br.filter($"seq_n" > 1), "br_multiple_seq_ids", concat(lit("seq ids: "), $"seq_n")),
      v(br.filter($"seq_n" >= 1 &&
        !(array_contains($"types", Vocab.Fabio + "JournalVolume") ||
          array_contains($"types", Vocab.Fabio + "JournalIssue"))),
        "br_seq_id_wrong_type", lit("sequence identifier on a non-volume/issue")),
      // ID: exactly one scheme and one literal value
      v(id.filter($"scheme_n" =!= 1), "id_bad_scheme_count",
        concat(lit("usesIdentifierScheme: "), $"scheme_n")),
      v(id.filter($"lit_n" =!= 1), "id_bad_literal_count",
        concat(lit("hasLiteralValue: "), $"lit_n")),
      // RA: exactly one type = foaf:Agent, >=1 id, >=1 name property
      v(ra.filter(size($"types") =!= 1 ||
        !array_contains($"types", Vocab.FoafAgent)), "ra_bad_type",
        concat(lit("types: "), concat_ws(", ", $"types"))),
      v(ra.filter($"id_n" === 0), "ra_no_identifier", lit("no datacite:hasIdentifier")),
      v(ra.filter($"name_n" === 0), "ra_no_name",
        lit("no foaf name/givenName/familyName")),
    ).reduce(_ unionByName _)
  }

  /** The reference's provenance walk over every merge participant
    * (check_merged_brs_results.py:361-430): >=2 snapshots, consecutive
    * numbering from 1, generation times everywhere, invalidation times on
    * every non-last snapshot (and on the merged entity's LAST one — it was
    * deleted), no invalidation on the surviving head, first snapshot
    * underived, merge snapshots derived from >=2, modification snapshots
    * from exactly 1. */
  def mergeProvenanceAudit(pairs: DataFrame, prov: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    val prefix = Vocab.BaseIri + "/"
    def toMeta(c: org.apache.spark.sql.Column) =
      when(c.startsWith(prefix), expr(s"substring(${c.toString()}, ${prefix.length + 1})")).otherwise(c)
    val participants = pairs.select(toMeta($"surviving").as("entity"), lit(true).as("is_surviving"))
      .unionByName(pairs.select(toMeta($"merged").as("entity"), lit(false).as("is_surviving")))
      .distinct()
    val snaps = participants.join(prov, Seq("entity"), "left")
      .groupBy($"entity", $"is_surviving")
      .agg(count($"snapshot_n").as("n_snaps"),
        array_sort(collect_list(struct($"snapshot_n", $"generated_at",
          $"invalidated_at", $"derived_from", $"description"))).as("snaps"))
      .localCheckpoint()
    def v(df: DataFrame, check: String, detail: org.apache.spark.sql.Column) =
      violation(df, check, $"entity", detail)
    val isMergeDesc = (d: String) => s"$d LIKE '%merged with%'"
    Seq(
      v(snaps.filter($"n_snaps" <= 1), "prov_less_than_two_snapshots",
        concat(lit("snapshots: "), $"n_snaps")),
      v(snaps.filter(expr(
        "exists(transform(snaps, (x, i) -> x.snapshot_n != CAST(i + 1 AS BIGINT)), b -> b)")),
        "prov_snapshot_numbering_gap",
        concat(lit("numbers: "), concat_ws(", ", expr("transform(snaps, x -> x.snapshot_n)")))),
      v(snaps.filter(expr("exists(snaps, x -> x.generated_at IS NULL)")),
        "prov_no_generation_time", lit("a snapshot lacks generatedAtTime")),
      v(snaps.filter($"n_snaps" > 0 && expr(
        "exists(transform(snaps, (x, i) -> x.invalidated_at IS NULL AND (i < size(snaps) - 1 OR NOT is_surviving)), b -> b)")),
        "prov_missing_invalidation_time",
        lit("a non-head (or merged-entity) snapshot lacks invalidatedAtTime")),
      v(snaps.filter($"is_surviving" && $"n_snaps" > 0 &&
        expr("element_at(snaps, -1).invalidated_at IS NOT NULL")),
        "prov_surviving_head_invalidated",
        lit("surviving entity's last snapshot is invalidated")),
      v(snaps.filter($"n_snaps" > 0 &&
        expr("size(element_at(snaps, 1).derived_from) > 0")),
        "prov_first_snapshot_derived",
        lit("snapshot 1 has wasDerivedFrom")),
      v(snaps.filter(expr(
        s"exists(snaps, x -> ${isMergeDesc("x.description")} AND size(x.derived_from) < 2)")),
        "prov_merge_snapshot_underived",
        lit("merge snapshot derived from < 2 snapshots")),
      v(snaps.filter(expr(
        s"exists(transform(snaps, (x, i) -> i > 0 AND NOT ${isMergeDesc("x.description")} AND size(x.derived_from) != 1), b -> b)")),
        "prov_modification_snapshot_bad_derivation",
        lit("a non-merge modification snapshot has != 1 wasDerivedFrom")),
    ).reduce(_ unionByName _)
  }
}
