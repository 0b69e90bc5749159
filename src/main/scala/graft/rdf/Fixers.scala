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

  /** One candidate row for the per-container editor-dedup fold: a
    * misplaced content AR (existing=false) or one of the container's own
    * editor ARs (existing=true, seeds the known sets). */
  final case class EditorArCand(container: String, content: String,
      ar: String, ra: String, ids: Seq[String], name: String, existing: Boolean)

  /** Classification output, mirroring the reference report rows
    * (fix_misplaced_editor_ars.py:247-257). */
  final case class EditorArCase(container: String, content: String,
      ar: String, ra: String, action: String, match_reason: String)

  final case class MisplacedEditorFixResult(
      triples: DataFrame,
      prov: DataFrame,
      /** (container, content, ar, ra, action, match_reason) — the tool's
        * dry-run report, action in {move, skip_duplicate_ra,
        * skip_duplicate_id, skip_duplicate_name}. */
      cases: DataFrame)

  /** `run/patches/fix_misplaced_editor_ars.py`: editor ARs attached to a
    * content BR whose type is in CONTAINER_EDITOR_TYPES (the D7 rule —
    * editors of book chapters/proceedings articles/… belong on the
    * frbr:partOf container) are MOVED to the container, unless the
    * container already has an editor with the same RA, a shared external
    * identifier, or the same normalized name — those are duplicates and
    * are deleted (the reference's skip_duplicate_{ra,id,name} actions,
    * `_classify_actions` lines 203-258). Moved ARs are appended to the
    * container's hasNext chain (first existing chain-tail -> first moved
    * -> ...), in (content, ar) order per container like the reference's
    * sorted iteration.
    *
    * The reference's five multiprocess file-scan passes collapse into
    * predicate-slice equi-joins over the triples table; the only
    * sequential piece — the known-RA/id/name sets growing as ARs move —
    * is a per-container fold over a handful of editors, run as
    * groupByKey(container).flatMapGroups (bounded group size, one
    * shuffle). Like the reference, inbound references to moved ARs other
    * than the content attachment are left untouched, and the
    * resumed-run arm that re-creates ARs missing from the content
    * (fix_container lines 549-556) has no equivalent: detection and fix
    * run in one transaction here, so a case AR is always still on its
    * content. */
  def fixMisplacedEditorArs(triples: DataFrame, prov: DataFrame,
      generatedAt: String): MisplacedEditorFixResult = {
    val spark = triples.sparkSession
    import spark.implicits._
    def edges(pred: String) = triples.filter($"p" === pred).select($"s", $"o")
    val containerClasses = graft.curation.Validation.ContainerEditorTypes
      .toSeq.flatMap(Vocab.TypeLabelToClass.get).sorted

    val editorArRa = edges(Vocab.WithRole).filter($"o" === Vocab.Pro + "editor")
      .select($"s".as("ar"))
      .join(edges(Vocab.IsHeldBy).select($"s".as("ar"), $"o".as("ra")), Seq("ar"))
    val contentBrs = edges(Vocab.RdfType)
      .filter($"o".isin(containerClasses: _*)).select($"s".as("content")).distinct()
    val partOf = edges(Vocab.PartOf).select($"s".as("content"), $"o".as("container"))
    val dcf = edges(Vocab.IsDocumentContextFor)

    // misplaced: editor ARs on typed contents that have a container
    val misplaced = dcf.select($"s".as("content"), $"o".as("ar"))
      .join(contentBrs, Seq("content"))
      .join(editorArRa, Seq("ar"))
      .join(partOf, Seq("content"))
      .localCheckpoint()
    // the affected containers' own (already-correct) editor ARs
    val containerArs = dcf.select($"s".as("container"), $"o".as("ar"))
      .join(misplaced.select($"container").distinct(), Seq("container"), "left_semi")
      .join(editorArRa, Seq("ar"))
      .localCheckpoint()

    // RA identifiers (scheme:value) and normalized names, only for RAs in
    // play (the reference's targeted RA/ID scan passes)
    val ras = misplaced.select($"ra").union(containerArs.select($"ra")).distinct()
    val raIds = edges(Vocab.HasIdentifier).select($"s".as("ra"), $"o".as("id_ent"))
      .join(ras, Seq("ra"), "left_semi")
      .join(edges(Vocab.UsesIdentifierScheme)
        .select($"s".as("id_ent"), substring_index($"o", "/", -1).as("scheme")),
        Seq("id_ent"))
      .join(triples.filter($"p" === Vocab.HasLiteralValue)
        .select($"s".as("id_ent"), $"o".as("value")), Seq("id_ent"))
      .groupBy($"ra")
      .agg(collect_set(concat($"scheme", lit(":"), $"value")).as("ids"))
    def firstLit(p: String, n: String) = triples.filter($"p" === p)
      .groupBy($"s".as("ra")).agg(min($"o").as(n))
    val raName = ras
      .join(firstLit(Vocab.FoafFamilyName, "family"), Seq("ra"), "left")
      .join(firstLit(Vocab.FoafGivenName, "given"), Seq("ra"), "left")
      .join(firstLit(Vocab.FoafName, "full_name"), Seq("ra"), "left")
      .select($"ra",
        when(length($"family") > 0,
          when(length($"given") > 0, lower(concat($"family", lit(", "), $"given")))
            .otherwise(lower($"family")))
          .otherwise(coalesce(lower($"full_name"), lit(""))).as("name"))
    val raInfo = ras.join(raIds, Seq("ra"), "left").join(raName, Seq("ra"), "left")
      .select($"ra",
        coalesce($"ids", array().cast("array<string>")).as("ids"),
        coalesce($"name", lit("")).as("name"))

    val cands = misplaced.join(raInfo, Seq("ra"))
      .select($"container", $"content", $"ar", $"ra", $"ids", $"name",
        lit(false).as("existing"))
      .unionByName(containerArs.join(raInfo, Seq("ra"))
        .select($"container", lit("").as("content"), $"ar", $"ra", $"ids",
          $"name", lit(true).as("existing")))
      .as[EditorArCand]

    val cases = cands.groupByKey(_.container).flatMapGroups { (container, it) =>
      val all = it.toSeq
      val knownRas = scala.collection.mutable.Set.empty[String]
      val knownIds = scala.collection.mutable.Set.empty[String]
      val knownNames = scala.collection.mutable.Set.empty[String]
      for (e <- all if e.existing) {
        knownRas += e.ra; knownIds ++= e.ids
        if (e.name.nonEmpty) knownNames += e.name
      }
      all.filterNot(_.existing).sortBy(c => (c.content, c.ar)).map { c =>
        if (knownRas(c.ra))
          EditorArCase(container, c.content, c.ar, c.ra, "skip_duplicate_ra", c.ra)
        else {
          val shared = c.ids.filter(knownIds).sorted
          if (shared.nonEmpty)
            EditorArCase(container, c.content, c.ar, c.ra, "skip_duplicate_id", shared.head)
          else if (c.name.nonEmpty && knownNames(c.name))
            EditorArCase(container, c.content, c.ar, c.ra, "skip_duplicate_name", c.name)
          else {
            knownRas += c.ra; knownIds ++= c.ids
            if (c.name.nonEmpty) knownNames += c.name
            EditorArCase(container, c.content, c.ar, c.ra, "move", null)
          }
        }
      }
    }.toDF().localCheckpoint()

    val nullS = lit(null).cast("string")
    // deletes: every case AR loses its content attachment and its outgoing
    // hasNext (remove_contributor + remove_next, fix_container:533-537)
    val delContentEdge = cases.select($"content".as("s"),
      lit(Vocab.IsDocumentContextFor).as("p"), $"ar".as("o"))
    val delHasNext = triples.filter($"p" === Vocab.HasNext)
      .join(cases.select($"ar".as("s")).distinct(), Seq("s"), "left_semi")
      .select($"s", $"p", $"o")
    // adds: container attachment per move + chain edges (fix_container:
    // 558-568: the first existing chain-tail links to the first moved AR,
    // moved ARs chain in classification order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"container").orderBy($"content", $"ar")
    val moved = cases.filter($"action" === "move")
      .withColumn("rn", row_number().over(w))
      .localCheckpoint()
    val addContainerEdge = moved.select($"container".as("s"),
      lit(Vocab.IsDocumentContextFor).as("p"), $"ar".as("o"))
    val chainWithin = moved.as("a").join(moved.as("b"),
        $"a.container" === $"b.container" && $"b.rn" === $"a.rn" + 1)
      .select($"a.ar".as("s"), lit(Vocab.HasNext).as("p"), $"b.ar".as("o"))
    val arsWithNext = triples.filter($"p" === Vocab.HasNext)
      .select($"s".as("ar")).distinct()
    val tails = containerArs.join(arsWithNext, Seq("ar"), "left_anti")
      .groupBy($"container").agg(min($"ar").as("tail"))
    val chainHead = moved.filter($"rn" === 1)
      .join(tails, Seq("container"))
      .select($"tail".as("s"), lit(Vocab.HasNext).as("p"), $"ar".as("o"))

    val edits = delContentEdge.unionByName(delHasNext)
      .select($"s", $"p", $"o", nullS.as("o_datatype"),
        nullS.as("o_new"), nullS.as("o_new_datatype"))
      .unionByName(
        addContainerEdge.unionByName(chainWithin).unionByName(chainHead)
          .select($"s", $"p", nullS.as("o"), nullS.as("o_datatype"),
            col("o").as("o_new"), nullS.as("o_new_datatype")))
    val r1 = Editor.replaceValues(triples, prov, edits, generatedAt)
    // duplicate ARs are purged (mark_as_to_be_deleted, fix_container:
    // 539-542) unless the very same AR already hangs on the container
    val skipArs = cases.filter($"action" =!= "move")
      .join(containerArs.select($"container", $"ar"), Seq("container", "ar"),
        "left_anti")
      .select($"ar".as("s")).distinct()
    val r2 = Editor.deleteEntities(r1.triples, r1.prov, skipArs, generatedAt)
    MisplacedEditorFixResult(r2.triples, r2.prov, cases)
  }

  final case class CorruptedDoiFixResult(
      triples: DataFrame,
      prov: DataFrame,
      /** The tool's report rows (fix_corrupted_dois.py `build_report`):
        * (truncated_doi, correct_doi, duplicate_entity, surviving_entity,
        * matching_score, action, reason), action in {merge, manual_review}. */
      cases: DataFrame,
      /** Applied (surviving, merged) URI pairs — feed to
        * [[Checkers.mergeAudit]]. */
      mergePairs: DataFrame)

  /** `run/patches/fix_corrupted_dois.py` — the offline arm. SICI DOIs end
    * in `#`, which an upstream converter bug stripped, leaving a truncated
    * `...co;2-` DOI owned by a duplicate entity while the curated CSV
    * claims the correct entity (`extract_sici_mismatch_errors`,
    * `build_sici_cases`). Cases are the `omid_mismatch` violations with
    * scheme doi and a value ending `co;2-`; per found entity (the
    * reference's `found_omids[0]`) the candidate DOI is `value + "#"` and
    * the surviving entity is the CSV's first expected omid.
    *
    * Classification: the reference scores the duplicate's triplestore
    * metadata against Crossref's record for the candidate DOI
    * (`determine_actions`). Crossref needs network egress — out of scope
    * like D11's API arm — so the offline authority is the surviving
    * entity's OWN store metadata (the entity the curated CSV says the
    * candidate DOI belongs to): same [[graft.functions.BiblioMatch]]
    * score, same `MATCHING_THRESHOLD` accept/`manual_review` split.
    * Accepted cases merge the duplicate (and any further expected omids of
    * a 1-to-n group, `_execute_merge`) into the surviving entity, then
    * delete the truncated-DOI id entity it inherited; everything else is
    * reported for manual review and left untouched. Chained merges defer
    * to the next run like [[fixOmidMismatches]]. */
  def fixCorruptedDois(rows: DataFrame, triples: DataFrame, prov: DataFrame,
      generatedAt: String,
      threshold: Double = graft.functions.BiblioMatch.MatchingThreshold): CorruptedDoiFixResult = {
    import rows.sparkSession.implicits._
    val kind = (c: Column) => substring_index(c, "/", 1)
    val subjects = triples.select($"s").distinct()
    val owners = Checkers.storeIds(triples).filter($"owner_meta".isNotNull)
      .groupBy($"scheme", $"value")
      .agg(sort_array(collect_set($"owner_meta")).as("owners"))
    val rawCases = Checkers.idMentions(rows)
      .filter($"scheme" === "doi" && $"expected_omid".isNotNull &&
        lower($"value").endsWith("co;2-"))
      .join(owners, Seq("scheme", "value"))
      .filter(!array_contains($"owners", $"expected_omid"))
      .withColumn("dup", element_at($"owners", 1))
      .filter(kind($"expected_omid") === kind($"dup"))
      .join(subjects.select($"s".as("surv_uri")),
        uriOf($"expected_omid") === $"surv_uri", "left_semi")
      .groupBy($"dup")
      .agg(min($"value").as("truncated_doi"),
        sort_array(collect_set($"expected_omid")).as("all_expected"))
      .withColumn("surviving", element_at($"all_expected", 1))
      .filter($"surviving" =!= $"dup")
      .localCheckpoint()

    // offline classification: duplicate's store metadata vs the surviving
    // entity's store metadata under the reference's weighted score
    val meta = StoreMatch.brMetadata(triples)
    def side(pfx: String, key: String) =
      meta.columns.foldLeft(meta) { (df, c) =>
        df.withColumnRenamed(c, if (c == "br") key else pfx + c) }
    val scored = rawCases
      .withColumn("dup_uri", uriOf($"dup"))
      .withColumn("surv_uri", uriOf($"surviving"))
      .join(side("d_", "dup_uri"), Seq("dup_uri"), "left")
      .join(side("s_", "surv_uri"), Seq("surv_uri"), "left")
      .withColumn("matching_score", graft.functions.BiblioMatch.matchingScore(
        $"d_family", $"s_family", $"d_given", $"s_given",
        $"d_title", $"s_title", $"d_venue", $"s_venue",
        $"d_issn", $"s_issn", $"d_year", $"s_year",
        $"d_volume", $"s_volume", $"d_issue", $"s_issue",
        $"d_start_page", $"s_start_page", $"d_end_page", $"s_end_page"))
      .withColumn("action",
        when($"matching_score" >= lit(threshold), "merge")
          .otherwise("manual_review"))
      .localCheckpoint()
    val report = scored.select(
      $"truncated_doi",
      concat($"truncated_doi", lit("#")).as("correct_doi"),
      $"dup".as("duplicate_entity"),
      $"surviving".as("surviving_entity"),
      round($"matching_score", 2).as("matching_score"),
      $"action",
      when($"action" === "manual_review",
        format_string("Matching score %.1f below threshold %.1f.",
          $"matching_score", lit(threshold))).otherwise(lit("")).as("reason"))

    // merges: duplicate + the tail of a 1-to-n expected group, all into
    // the surviving entity (`_execute_merge`); chained survivors defer
    val rawPairs = scored.filter($"action" === "merge")
      .select($"surviving", $"truncated_doi",
        explode(concat(array($"dup"),
          expr("slice(all_expected, 2, greatest(size(all_expected) - 1, 0))")))
          .as("merged"))
      .filter($"merged" =!= $"surviving")
      .distinct()
    val pairs = rawPairs
      .select(uriOf($"surviving").as("surviving"), uriOf($"merged").as("merged"))
      .join(rawPairs.select(uriOf($"merged").as("surviving")),
        Seq("surviving"), "left_anti")
      .localCheckpoint()
    val prefix = Vocab.BaseIri + "/"
    val metaPairs = pairs.select(
      expr(s"substring(surviving, ${prefix.length + 1})").as("surviving"),
      expr(s"substring(merged, ${prefix.length + 1})").as("merged"))
    val mergedTriples = graft.operators.Tools.applyMerges(triples, pairs).localCheckpoint()
    val mergedProv = Provenance.mergeProvenance(prov, metaPairs, generatedAt)
      .localCheckpoint()
    // the surviving entity inherited the truncated-DOI id entity — delete
    // it (editor.delete(surviving, HAS_ID, id); editor.delete(id))
    val truncPairs = scored.filter($"action" === "merge")
      .select($"truncated_doi".as("t_value"), $"surviving".as("t_surv"))
    val truncIds = Checkers.storeIds(mergedTriples)
      .filter($"scheme" === "doi")
      .join(truncPairs, $"value" === $"t_value" && $"owner_meta" === $"t_surv",
        "left_semi")
      .select(uriOf($"id_meta").as("s")).distinct()
    val r = Editor.deleteEntities(mergedTriples, mergedProv, truncIds, generatedAt)
    CorruptedDoiFixResult(r.triples, r.prov, report, pairs)
  }

  final case class ProvBackfillResult(
      prov: DataFrame,
      /** entity metas that received a backfilled snapshot. */
      created: DataFrame)

  /** `run/patches/add_missing_provenance.py`: entities present in the data
    * graph but uncovered by any provenance snapshot (no `specializationOf`
    * pointing at them — here: no snapshot 1 in the prov table) get a
    * backfilled creation snapshot, stamped with the tool's run time and
    * attributed to the responsible agent, exactly like the reference's
    * `ProvSet.generate_provenance` backfill arm (`_backfill_file`,
    * add_missing_provenance.py:64-117). The reference's find pass is
    * [[Checkers.missingProvenance]]; this composes it with the snapshot
    * append — one anti-join + one union, no per-file loop.
    *
    * Robustness beyond the reference: an entity that somehow has LATER
    * snapshots but no snapshot 1 gets its backfilled snapshot
    * pre-invalidated at the earliest existing snapshot's timestamp, so the
    * open-snapshot invariant (Checkers check 5) still holds. */
  def addMissingProvenance(triples: DataFrame, prov: DataFrame,
      generatedAt: String,
      agent: String = "https://w3id.org/oc/meta/prov/pa/1"): ProvBackfillResult = {
    import triples.sparkSession.implicits._
    val prefix = Vocab.BaseIri + "/"
    val missing = triples.filter($"s".startsWith(prefix))
      .select(expr(s"substring(s, ${prefix.length + 1})").as("entity")).distinct()
      .join(prov.filter($"snapshot_n" === 1L).select($"entity").distinct(),
        Seq("entity"), "left_anti")
      .localCheckpoint()
    val earliest = prov.groupBy($"entity").agg(min($"generated_at").as("first_at"))
    val snaps = missing.join(earliest, Seq("entity"), "left")
      .select(
        $"entity",
        lit(1L).as("snapshot_n"),
        lit(generatedAt).as("generated_at"),
        $"first_at".as("invalidated_at"),
        array().cast("array<string>").as("derived_from"),
        lit("Entity created").as("description"),
        lit(agent).as("attributed_to"))
    ProvBackfillResult(prov.unionByName(snaps), missing)
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
