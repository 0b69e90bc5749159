package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Detect -> fix compositions — the reference's patch-tool family
  * (`run/patches/fix_omid_mismatches.py`, `fix_literal_datatypes.py`,
  * `fix_duplicate_part_of.py`, `has_next.py`) re-expressed as: a
  * [[Checkers]]/[[ChainAnomalies]] detection pass feeding a batched
  * [[Editor]]/[[graft.operators.Tools]] correction, one distributed plan
  * per fixer instead of the reference's per-entity SPARQL loops.
  *
  * Out-of-scope by design (documented, not silently dropped): the
  * reference's external validations — doi.org/Crossref resolution in
  * `fix_omid_mismatches.py:144-270` deciding which duplicate is "real",
  * and `has_next.py`'s crossref API sequence verification — need network
  * egress; here the curated CSV (omid fixer) and the longest-chain
  * heuristic (hasNext fixer) are the authorities, which is exactly the
  * fallback both tools use when the external source is silent.
  */
object Fixers {

  private def uriOf(metaCol: Column): Column =
    concat(lit(Vocab.BaseIri + "/"), metaCol)

  private val IriShape = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  /** `fix_literal_datatypes.py:83-114`: publicationDate literals whose
    * datatype is not one of date/gYear/gYearMonth are re-typed from the
    * value's ISO-8601 shape (`get_datatype_from_iso_8601`), and every
    * other untyped non-IRI literal becomes xsd:string. One pass over the
    * triples, applied as a single [[Editor.replaceValues]] delta. */
  def fixLiteralDatatypes(triples: DataFrame, prov: DataFrame,
      generatedAt: String): Editor.EditResult = {
    import triples.sparkSession.implicits._
    val validDates = Seq(Vocab.XsdDate, Vocab.XsdGYear, Vocab.XsdGYearMonth)
    val badDate = triples
      .filter($"p" === Vocab.PublicationDate &&
        (!$"o_datatype".isin(validDates: _*) || $"o_datatype".isNull))
      .select($"s", $"p", $"o", $"o_datatype",
        when($"o".rlike("^[0-9]{4}$"), $"o")
          .when($"o".rlike("^[0-9]{4}-[0-9]{2}$"), $"o")
          .when($"o".rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}"), substring($"o", 1, 10))
          .otherwise($"o").as("o_new"),
        when($"o".rlike("^[0-9]{4}$"), lit(Vocab.XsdGYear))
          .when($"o".rlike("^[0-9]{4}-[0-9]{2}$"), lit(Vocab.XsdGYearMonth))
          .when($"o".rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}"), lit(Vocab.XsdDate))
          .otherwise(lit(Vocab.XsdString)).as("o_new_datatype"))
    val untyped = triples
      .filter($"p" =!= Vocab.PublicationDate &&
        $"o_datatype".isNull && !$"o".rlike(IriShape))
      .select($"s", $"p", $"o", $"o_datatype",
        $"o".as("o_new"), lit(Vocab.XsdString).as("o_new_datatype"))
    Editor.replaceValues(triples, prov, badDate.unionByName(untyped), generatedAt)
  }

  final case class OmidFixResult(
      triples: DataFrame,
      prov: DataFrame,
      /** (surviving, merged) URI pairs that were applied — feed to
        * [[Checkers.mergeAudit]]. */
      mergePairs: DataFrame)

  /** `fix_omid_mismatches.py:424-487`: every `omid_mismatch` violation
    * (an external id owned by a different entity than the curated CSV
    * claims) becomes a merge of the actual owner INTO the CSV's entity
    * (the CSV is the authority — the network-free arm of the reference's
    * classification), followed by dedup of id entities that now duplicate
    * the same (scheme, value) on one owner (the reference's
    * `duplicate_id_entities` deletion loop). Chained merges (a surviving
    * entity that is itself merged elsewhere in the same batch) are
    * deferred to the next run, mirroring the reference's per-case
    * progress loop. */
  def fixOmidMismatches(rows: DataFrame, triples: DataFrame, prov: DataFrame,
      generatedAt: String): OmidFixResult = {
    import rows.sparkSession.implicits._
    val owners = Checkers.storeIds(triples).filter($"owner_meta".isNotNull)
      .groupBy($"scheme", $"value")
      .agg(collect_set($"owner_meta").as("owners"))
    val subjects = triples.select($"s").distinct()
    val kind = (c: Column) => substring_index(c, "/", 1)
    val rawPairs = Checkers.idMentions(rows)
      .filter($"expected_omid".isNotNull)
      .join(owners, Seq("scheme", "value"))
      .filter(!array_contains($"owners", $"expected_omid"))
      .select($"expected_omid", explode($"owners").as("dup"))
      .filter(kind($"expected_omid") === kind($"dup"))
      // the surviving entity must exist in the store
      .join(subjects.select($"s".as("surv_uri")),
        uriOf($"expected_omid") === $"surv_uri", "left_semi")
      .groupBy($"dup")
      // one surviving per merged entity, smallest first (deterministic)
      .agg(min($"expected_omid").as("surviving_meta"))
    val pairs = rawPairs
      .select(uriOf($"surviving_meta").as("surviving"), uriOf($"dup").as("merged"))
      // defer chains: a survivor that is itself merged this batch
      .join(rawPairs.select(uriOf($"dup").as("surviving")), Seq("surviving"), "left_anti")
      .localCheckpoint()
    val prefix = Vocab.BaseIri + "/"
    val metaPairs = pairs.select(
      expr(s"substring(surviving, ${prefix.length + 1})").as("surviving"),
      expr(s"substring(merged, ${prefix.length + 1})").as("merged"))
    val mergedTriples = graft.operators.Tools.applyMerges(triples, pairs).localCheckpoint()
    val mergedProv = Provenance.mergeProvenance(prov, metaPairs, generatedAt)
      .localCheckpoint()
    // id entities now duplicating the same (owner, scheme, value): keep the
    // lowest-numbered, purge the rest (inbound hasIdentifier edges go with
    // them via deleteEntities)
    val dupIds = Checkers.storeIds(mergedTriples)
      .filter($"owner_meta".isNotNull)
      .groupBy($"owner_meta", $"scheme", $"value")
      .agg(sort_array(collect_set($"id_meta")).as("ims"))
      .filter(size($"ims") > 1)
      .select(explode(expr("slice(ims, 2, size(ims))")).as("id_meta"))
      .select(uriOf($"id_meta").as("s"))
    val r = Editor.deleteEntities(mergedTriples, mergedProv, dupIds, generatedAt)
    OmidFixResult(r.triples, r.prov, pairs)
  }

  final case class PartOfFixResult(
      edit: Editor.EditResult,
      /** Cases with genuinely different venues — the reference's
        * `manual_review` bucket (br, containers, n_venues). */
      manualReview: DataFrame)

  /** `fix_duplicate_part_of.py:234-438`: BRs with more than one
    * `frbr:partOf` keep only the lexicographically-first container IF all
    * their containment chains reach the same venue (`same_venue`) or
    * venues equivalent by normalized title + type set
    * (`equivalent_venues`); anything else is reported for manual review,
    * never auto-fixed. Chain roots are resolved with a bounded iterative
    * parent-hop join (lineage cut per hop) instead of the reference's
    * in-memory chain map. */
  def fixDuplicatePartOf(triples: DataFrame, prov: DataFrame,
      generatedAt: String, maxDepth: Int = 8): PartOfFixResult = {
    import triples.sparkSession.implicits._
    val po = triples.filter($"p" === Vocab.PartOf).select($"s", $"o")
      .localCheckpoint()
    val dup = po.groupBy($"s").agg(sort_array(collect_set($"o")).as("containers"))
      .filter(size($"containers") > 1)
      .localCheckpoint()
    // walk each container up to its chain root
    var roots = dup.select(explode($"containers").as("node")).distinct()
      .withColumn("root", $"node")
    for (_ <- 1 to maxDepth) {
      roots = roots
        .join(po.select($"s".as("root"), $"o".as("up")), Seq("root"), "left")
        .withColumn("root", coalesce($"up", $"root"))
        .select($"node", $"root").distinct()
        .localCheckpoint()
    }
    // venue equivalence key: normalized title + sorted type set, falling
    // back to the root URI when untitled (fix_duplicate_part_of.py:259-269)
    val titles = triples.filter($"p" === Vocab.Title)
      .select($"s".as("root"),
        trim(regexp_replace(lower($"o"), "\\s+", " ")).as("t"))
    val types = triples.filter($"p" === Vocab.RdfType)
      .groupBy($"s".as("root")).agg(sort_array(collect_set($"o")).as("tys"))
    val rootKey = roots
      .join(titles, Seq("root"), "left")
      .join(types, Seq("root"), "left")
      .select($"node",
        when($"t".isNotNull, concat_ws("|", $"t", concat_ws(",", $"tys")))
          .otherwise($"root").as("vkey"))
    val resolved = dup.select($"s", explode($"containers").as("node"))
      .join(rootKey, Seq("node"))
      .groupBy($"s")
      .agg(count_distinct($"vkey").as("nk"),
        sort_array(collect_set($"node")).as("cs"))
      .localCheckpoint()
    val deletes = resolved.filter($"nk" === 1)
      .select($"s", lit(Vocab.PartOf).as("p"),
        explode(expr("slice(cs, 2, size(cs))")).as("o"))
    val manual = resolved.filter($"nk" > 1)
      .select($"s".as("br"), $"cs".as("containers"), $"nk".as("n_venues"))
    PartOfFixResult(Editor.deleteProperty(triples, prov, deletes, generatedAt), manual)
  }

  /** `run/patches/has_next.py` (the repair arm): diff the store's hasNext
    * edges against [[ChainAnomalies.repairPlan]]'s canonical chains and
    * apply the difference — drop every edge not in the plan, insert every
    * planned edge the store lacks. Healthy chains diff to nothing, so the
    * edit touches exactly the anomalous groups. */
  def fixHasNextChains(triples: DataFrame, prov: DataFrame,
      generatedAt: String): Editor.EditResult = {
    import triples.sparkSession.implicits._
    val want = ChainAnomalies.repairPlan(triples).toDF()
      .filter($"next_ar".isNotNull)
      .select($"ar".as("s"), lit(Vocab.HasNext).as("p"), $"next_ar".as("o"))
      .localCheckpoint()
    val have = triples.filter($"p" === Vocab.HasNext).select($"s", $"p", $"o")
    val toDelete = have.except(want)
      .select($"s", $"p", $"o", lit(null).cast("string").as("o_datatype"),
        lit(null).cast("string").as("o_new"), lit(null).cast("string").as("o_new_datatype"))
    val toInsert = want.except(have)
      .select($"s", $"p", lit(null).cast("string").as("o"),
        lit(null).cast("string").as("o_datatype"),
        $"o".as("o_new"), lit(null).cast("string").as("o_new_datatype"))
    Editor.replaceValues(triples, prov, toDelete.unionByName(toInsert), generatedAt)
  }
}
