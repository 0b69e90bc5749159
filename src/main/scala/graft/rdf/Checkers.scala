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

  /** The full report — union of every check; empty == the batch passes. */
  def checkAll(rows: DataFrame, triples: DataFrame, prov: DataFrame): DataFrame =
    Seq(
      idsWithoutOmid(rows, triples),
      omidMismatch(rows, triples),
      missingEntities(rows, triples),
      missingProvenance(triples, prov),
      openSnapshotInvariant(prov),
      invalidDatatypes(triples),
    ).reduce(_ unionByName _)
}
