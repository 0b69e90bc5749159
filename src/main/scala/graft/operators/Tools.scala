package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's CLI tool suite (SURVEY §2: J7-J9, G7-G8, R7, D10,
  * S12) re-expressed as DataFrame programs over curated outputs and the
  * triples/prov tables. Each function is one tool's dataflow; the
  * process pools, Redis pipelines, and per-file loops of the originals
  * disappear into ordinary distributed joins.
  */
object Tools {

  /** J7 — citation id -> OMID resolution (`run/meta/convert_citations.py`):
    * build the external-id -> omid map from curated rows (lowercased ids,
    * reference line 46), then map citing/cited. Unresolved rows keep NULL.
    * Both joins are plain equi-joins; the map side is broadcast when small,
    * sort-merge otherwise (left to AQE). */
  def idToOmidMapping(curatedRows: DataFrame): DataFrame = {
    import curatedRows.sparkSession.implicits._
    curatedRows
      .select(split($"id", " ").as("parts"))
      .select(
        filter($"parts", p => p.startsWith("omid:")).as("omids"),
        filter($"parts", p => !p.startsWith("omid:")).as("others"))
      .select(explode($"omids").as("omid"), $"others")
      .select($"omid", explode($"others").as("ext_id"))
      .select(lower($"ext_id").as("ext_id"), $"omid")
      // last-write-wins in the reference dict; here keep min omid for determinism
      .groupBy($"ext_id").agg(min($"omid").as("omid"))
  }

  def convertCitations(citations: DataFrame, curatedRows: DataFrame): DataFrame = {
    import citations.sparkSession.implicits._
    val mapping = idToOmidMapping(curatedRows)
    citations
      .join(mapping.select(lower($"ext_id").as("citing_key"), $"omid".as("citing_omid")),
        lower($"citing_id") === $"citing_key", "left")
      .join(mapping.select(lower($"ext_id").as("cited_key"), $"omid".as("cited_omid")),
        lower($"cited_id") === $"cited_key", "left")
      .select($"citing_id", $"citing_omid", $"cited_id", $"cited_omid",
        ($"citing_omid".isNotNull && $"cited_omid".isNotNull).as("resolved"))
  }

  /** J8 — input pre-filter (`run/meta/preprocess_input.py:49-123`): drop
    * rows where ALL ids are already known. `known` = one-column frame of
    * known external ids. */
  def preprocessInput(input: DataFrame, known: DataFrame): DataFrame = {
    import input.sparkSession.implicits._
    val knownSet = known.select(lower(col(known.columns.head)).as("kid")).distinct()
    val withIds = input.withColumn("_ids",
      filter(split(col("id"), "\\s+"), x => length(x) > 0))
    val anyUnknown = withIds
      .select(col("id").as("_row_id"), explode($"_ids").as("one_id"))
      .join(knownSet, lower($"one_id") === $"kid", "left_anti")
      .select($"_row_id").distinct()
    withIds
      .join(anyUnknown, withIds("id") === anyUnknown("_row_id"), "left_semi")
      .drop("_ids")
      .union(input.filter(length(trim(col("id"))) === 0).select(input.columns.map(col): _*))
  }

  /** S6 seed surface — the reference's `Curator.collect_identifiers`
    * (`core/curator.py:162-248`): the (metavals, identifiers, VVIs)
    * mentioned anywhere in an input batch, which seed its subgraph
    * prefetch (`finder.get_everything_about_res`). In this engine the
    * prefetch dissolves into join pruning (SURVEY §2.1 S6), but the seed
    * sets remain useful as the store-side pre-filter of an incremental
    * run: joining the store against `identifiers`/`vvis` prunes the
    * curated-world scan to the rows a batch can touch.
    *
    * Per-row semantics mirror `extract_identifiers_and_metavals`
    * exactly: the id cell contributes external ids + its omid metaval;
    * author/editor/publisher/volume/issue cells contribute their
    * FIRST-bracket ids (E10 `split_name_and_ids` on the whole cell, like
    * the reference) to `identifiers`; the venue cell's bracket ids are
    * kept SEPARATE, surfacing only inside the VVI key
    * `(raw volume, raw issue, venue omid, sorted venue ids)`, emitted
    * when the row has a venue id/omid and a volume or issue. One
    * Parsing-family UDF per row, then explode + distinct — the
    * reference's ProcessPoolExecutor chunking becomes partitions.
    *
    * DELIBERATE divergence: tokens are split with
    * [[graft.curation.Parsing.splitIdTokens]] (collapses stray spaces
    * around ':', the main curation path's E11 rule), while the
    * reference's `extract_identifiers_and_metavals` splits on plain
    * whitespace (`curator.py:224 ids_str.split()`), so a malformed cell
    * like `[pmid: 123]` seeds `pmid:123` here but `pmid:` + `123` there.
    * The collapsed form is the one the curation join keys use, so the
    * pre-filter prunes consistently with what curation will actually
    * match; the reference's raw split would seed an id curation itself
    * never joins on. */
  def collectIdentifiers(input: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    import input.sparkSession.implicits._
    import graft.curation.Parsing
    val extract = udf((id: String, author: String, editor: String,
        publisher: String, venue: String, volume: String, issue: String) => {
      val metavals = scala.collection.mutable.LinkedHashSet.empty[String]
      val ids = scala.collection.mutable.LinkedHashSet.empty[String]
      if (id != null && id.trim.nonEmpty) {
        val (omid, idl) = Parsing.cleanIdList(Parsing.splitIdTokens(id))
        omid.foreach(m => metavals += s"omid:$m")
        ids ++= idl
      }
      var venueMeta = ""
      var venueIds = Seq.empty[String]
      for ((field, isVenue) <- Seq(author -> false, editor -> false,
          publisher -> false, venue -> true, volume -> false, issue -> false)) {
        if (field != null && field.trim.nonEmpty) {
          val idsStr = graft.functions.Cleaning.splitNameAndIds(field)._2
          if (idsStr.nonEmpty) {
            val (omid, idl) = Parsing.cleanIdList(Parsing.splitIdTokens(idsStr))
            val metaval = omid.map(m => s"omid:$m").getOrElse("")
            if (metaval.nonEmpty) metavals += metaval
            if (isVenue) { venueMeta = metaval; venueIds = idl }
            else ids ++= idl
          }
        }
      }
      val vvi =
        if ((venueMeta.nonEmpty || venueIds.nonEmpty) &&
            ((volume != null && volume.nonEmpty) || (issue != null && issue.nonEmpty)))
          Seq((Option(volume).getOrElse(""), Option(issue).getOrElse(""),
            venueMeta, venueIds.sorted))
        else Seq.empty
      (metavals.toSeq, ids.toSeq, vvi)
    })
    val ex = input.withColumn("_x", extract($"id", $"author", $"editor",
        $"publisher", $"venue", $"volume", $"issue"))
      .select($"_x").localCheckpoint()
    (ex.select(explode($"_x._1").as("metaval")).distinct(),
      ex.select(explode($"_x._2").as("id")).distinct(),
      ex.select(explode($"_x._3").as("v"))
        .select($"v._1".as("volume"), $"v._2".as("issue"),
          $"v._3".as("venue_metaid"), $"v._4".as("venue_ids"))
        .distinct())
  }

  /** G7 — duplicate-id scan (`run/find/duplicated_ids.py`): identifier
    * literals attached to more than one entity. Input: entityIds frame
    * (owner_meta, scheme, value). */
  def duplicatedIds(entityIds: DataFrame): DataFrame = {
    import entityIds.sparkSession.implicits._
    entityIds
      .groupBy($"scheme", $"value")
      .agg(collect_set($"owner_meta").as("entities"), countDistinct($"owner_meta").as("n"))
      .filter($"n" > 1)
      .select($"scheme", $"value", array_sort($"entities").as("entities"), $"n")
      .orderBy($"scheme", $"value")
  }

  /** G8 — prov-derived merge pairs (`run/find/merged_entities.py`):
    * snapshots with >=2 wasDerivedFrom yield (surviving, merged...) pairs. */
  def mergedEntityPairs(provSnapshots: DataFrame): DataFrame = {
    import provSnapshots.sparkSession.implicits._
    provSnapshots
      .filter(size($"derived_from") >= 2)
      .select($"entity".as("surviving"), explode($"derived_from").as("derived"))
      .select($"surviving",
        regexp_extract($"derived", "meta/((?:br|ra|ar|re|id)/\\d+)/prov", 1).as("merged"))
      .filter($"merged" =!= $"surviving" && length($"merged") > 0)
      .orderBy($"surviving", $"merged")
  }

  /** `run/find/duplicated_entities.py`: entities of a dump that share an
    * identifier. The tool's in-memory UnionFind over the
    * entity<->identifier bipartite graph (duplicated_entities.py:24-52,
    * 174-191) IS [[graft.curation.ConnectedComponents.byShardKey]] with
    * the identifier as the shard key, so the per-zip-file loop collapses
    * into one scan + one CC call. Input is the triples frame of a dump
    * tree (e.g. [[graft.rdf.Serialization.readJsonLd]]); `resourceType`
    * mirrors the tool's br/ra/both folder choice via rdf:type
    * (fabio:Expression / foaf:Agent — get_entity_type, lines 143-148).
    * Output rows are the tool's CSV shape: group sorted, first member
    * surviving, rest "; "-joined (save_duplicates_to_csv, lines 159-171). */
  def duplicatedEntities(triples: DataFrame, resourceType: String = "both"): DataFrame = {
    import triples.sparkSession.implicits._
    val v = graft.rdf.Vocab
    val wanted = resourceType match {
      case "br" => Seq(v.Expression)
      case "ra" => Seq(v.FoafAgent)
      case _    => Seq(v.Expression, v.FoafAgent)
    }
    val ents = triples.filter($"p" === v.RdfType && $"o".isin(wanted: _*))
      .select($"s".as("entity")).distinct()
    val edges = triples.filter($"p" === v.HasIdentifier)
      .select($"s".as("entity"), $"o".as("key"))
      .join(ents, Seq("entity"), "left_semi")
      .withColumn("eid", xxhash64($"entity"))
      .localCheckpoint()
    val cc = graft.curation.ConnectedComponents.byShardKey(
      edges.select($"eid".as("entity"), $"key"))
      .withColumnRenamed("entity", "eid")
    edges.select($"entity", $"eid").distinct()
      .join(cc, Seq("eid"))
      .groupBy($"component").agg(sort_array(collect_set($"entity")).as("members"))
      .filter(size($"members") > 1)
      .select(element_at($"members", 1).as("surviving_entity"),
        array_join(expr("slice(members, 2, size(members) - 1)"), "; ")
          .as("merged_entities"))
      .orderBy($"surviving_entity")
  }

  /** `run/meta/merge_csv.py`: concatenate every CSV of a directory into
    * one frame under the first file's header (merge_csv.py:38-60 — all
    * reference inputs share a schema, so Spark's positional union over
    * the directory is the same concat). Write with the S2 CSV sink for
    * the tool's single-file output. */
  def mergeCsvDir(spark: org.apache.spark.sql.SparkSession,
      inputDir: String): DataFrame =
    spark.read.option("header", "true").csv(inputDir)

  /** R7 — counter (info-dir) regeneration (`run/infodir/gen.py`): max
    * entity number per (kind, prefix) from the entity corpus. */
  def regenerateCounters(entityMetas: DataFrame, prefix: String): DataFrame = {
    import entityMetas.sparkSession.implicits._
    entityMetas
      .select(col(entityMetas.columns.head).as("meta"))
      .withColumn("kind", substring_index($"meta", "/", 1))
      .withColumn("n", expr(s"CAST(substring(substring_index(meta, '/', -1), ${prefix.length + 1}) AS BIGINT)"))
      .filter($"n".isNotNull)
      .groupBy($"kind").agg(max($"n").as("next_n"))
      .withColumn("prefix", lit(prefix))
      .select($"kind", $"prefix", $"next_n")
      .orderBy($"kind")
  }

  /** S11 — subset extraction (`run/migration/extract_subset.py`): pull the
    * full triple closure of a seed entity set, the standalone form of the
    * S6 BFS. Iterative frontier-join: each round joins the frontier
    * against the triples table on subject, collects the touched triples,
    * and advances the frontier to unvisited URI objects, skipping the
    * schema-ish predicates the reference's BFS also skips
    * (`constants.py:37-40`: rdf:type, withRole, usesIdentifierScheme).
    * Rounds are bounded by `maxDepth` (the reference's depth<=10);
    * lineage is cut per round so plans stay flat; state per round is two
    * narrow DataFrames (visited ids, frontier ids) — no driver-side data.
    *
    * @param seeds DataFrame with a single `uri` column
    * @return the distinct triples of the closure */
  def extractSubset(triples: DataFrame, seeds: DataFrame,
      maxDepth: Int = 10): DataFrame = {
    import triples.sparkSession.implicits._
    val skip = Seq(graft.rdf.Vocab.RdfType, graft.rdf.Vocab.WithRole,
      graft.rdf.Vocab.UsesIdentifierScheme)
    var visited = seeds.select($"uri").distinct().localCheckpoint()
    var frontier = visited
    var out: DataFrame = null
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      val touched = triples.join(frontier, triples("s") === frontier("uri"))
        .drop("uri").localCheckpoint()
      out = if (out == null) touched else out.unionByName(touched)
      val next = touched
        .filter(!$"p".isin(skip: _*) && $"o_datatype".isNull) // URI objects only
        .select($"o".as("uri")).distinct()
        .join(visited.withColumnRenamed("uri", "v"), $"uri" === $"v", "left_anti")
        .localCheckpoint()
      visited = visited.unionByName(next).localCheckpoint()
      frontier = next
      depth += 1
    }
    if (out == null) triples.limit(0) else out.distinct()
  }

  /** D10 — post-hoc merge (`run/merge/entities.py`, `core/editor.py:190-276`
    * + oc_ocdm `GraphEntity.merge`), reference-exact per the observable
    * contract its own suite pins (`test/entity_merger_test.py`):
    *
    *  - inbound references to a merged entity are redirected to the
    *    survivor (role re-assignment, entity_merger_test.py:393-402);
    *  - `hasIdentifier` edges move and then DEDUP BY CONTENT — two ids
    *    with the same scheme+value collapse to the lowest-numbered id
    *    entity, whose orphaned twin is purged
    *    (test_merge_with_conflicting_data:830-838);
    *  - non-BR merges take the MERGED entity's functional values, last
    *    merged (by `ord`) winning, replacing the survivor's
    *    (test_merge_authors_with_real_data name "John Smith"->"J. Smith";
    *    test_merge_multiple_entities "should take the last merged name");
    *  - BR merges (both `fabio:Expression` — editor.py:266-276
    *    `prefer_self=True`) keep the survivor's literals/embodiment,
    *    adopting the merged's only where the survivor has none — EXCEPT
    *    `frbr:partOf`, where the merged's container replaces the
    *    survivor's (test_merge_bibliographic_resources:1124-1130 pins
    *    partOf == the merged side's volume while embodiment stays the
    *    survivor's);
    *  - everything else of the merged subjects (rdf:type, leftover
    *    literals) drops with them.
    *
    * `pairs` = (surviving, merged) full URIs, optional `ord` (the CSV list
    * position; defaults to the merged entity's resource number). Group
    * transitivity (the tool's UnionFind batching) is the caller's
    * concern — pairs here are final. One pass of equi-joins; no
    * driver-side state. */
  def applyMerges(triples: DataFrame, pairs: DataFrame): DataFrame = {
    import triples.sparkSession.implicits._
    val v = graft.rdf.Vocab
    val pr = (if (pairs.columns.contains("ord"))
        pairs.select($"surviving", $"merged", $"ord".cast("long").as("ord"))
      else pairs.select($"surviving", $"merged",
        when($"merged".rlike("[0-9]+$"),
          regexp_extract($"merged", "([0-9]+)$", 1).cast("long"))
          .otherwise(lit(0L)).as("ord")))
      .localCheckpoint()

    // prefer-self dispatch: both sides typed fabio:Expression = BR merge
    val exprSubs = triples
      .filter($"p" === v.RdfType && $"o" === v.Expression)
      .select($"s").distinct().localCheckpoint()
    val prBr = pr
      .join(exprSubs.select($"s".as("surviving")), Seq("surviving"), "left_semi")
      .join(exprSubs.select($"s".as("merged")), Seq("merged"), "left_semi")
      .withColumn("is_br", lit(true))
    val prTyped = pr.join(prBr.select($"surviving", $"merged", $"is_br"),
      Seq("surviving", "merged"), "left")
      .withColumn("is_br", coalesce($"is_br", lit(false)))
      .localCheckpoint()

    // 1. redirect inbound references (IRI objects only)
    val redirect = prTyped.select($"merged".as("from"), $"surviving".as("to"))
    val base = triples
      .join(redirect, triples("o") === redirect("from") &&
        triples("o_datatype").isNull, "left")
      .withColumn("o", coalesce($"to", $"o")).drop("from", "to")

    // 2. split: outgoing triples of merged subjects vs the rest
    val mergedOut = base.join(
        prTyped.select($"merged".as("s"), $"surviving", $"ord", $"is_br"), Seq("s"))
      .select($"surviving", $"p", $"o", $"o_datatype", $"ord", $"is_br")
    val rest = base.join(prTyped.select($"merged".as("s")), Seq("s"), "left_anti")

    // functional value-set: the properties oc_ocdm merge carries over
    val funcProps = Seq(v.FoafName, v.FoafGivenName, v.FoafFamilyName,
      v.Title, v.PublicationDate, v.HasSequenceIdentifier,
      v.HasLiteralValue, v.UsesIdentifierScheme, v.StartingPage, v.EndingPage)

    def lastOrdPerProp(df: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"surviving", $"p")
      df.withColumn("mx", max($"ord").over(w)).filter($"ord" === $"mx")
        .select($"surviving".as("s"), $"p", $"o", $"o_datatype")
    }

    val movedIds = mergedOut.filter($"p" === v.HasIdentifier)
      .select($"surviving".as("s"), $"p", $"o", $"o_datatype")
    val movedRoles = mergedOut.filter($"p" === v.IsDocumentContextFor)
      .select($"surviving".as("s"), $"p", $"o", $"o_datatype")
    // non-BR: merged's functional values REPLACE the survivor's
    val replWinners = lastOrdPerProp(
      mergedOut.filter(!$"is_br" && $"p".isin(funcProps: _*)))
    // BR: complement-fill only (survivor keeps its own values)
    val survHasProp = rest.select($"s".as("surviving"), $"p").distinct()
    val fillWinners = lastOrdPerProp(
      mergedOut.filter($"is_br" &&
          ($"p".isin(funcProps: _*) || $"p" === v.Embodiment))
        .join(survHasProp, Seq("surviving", "p"), "left_anti"))
    // partOf: the merged side's container wins for BRs, replaces for all
    val partOfWinners = lastOrdPerProp(mergedOut.filter($"p" === v.PartOf))

    val replacedSP = replWinners.select($"s", $"p")
      .unionByName(partOfWinners.select($"s", $"p")).distinct()
    val kept = rest.join(replacedSP, Seq("s", "p"), "left_anti")
    val merged0 = kept
      .unionByName(movedIds).unionByName(movedRoles)
      .unionByName(replWinners).unionByName(fillWinners)
      .unionByName(partOfWinners)
      .distinct()

    // 3. id content dedup: same (scheme, value) under one owner collapses
    // to the lowest-numbered id entity; orphaned twins are purged
    val idContent = merged0.filter($"p" === v.UsesIdentifierScheme)
      .select($"s".as("id_uri"), $"o".as("scheme"))
      .join(merged0.filter($"p" === v.HasLiteralValue)
        .select($"s".as("id_uri"), $"o".as("value")), Seq("id_uri"))
    val owned = merged0.filter($"p" === v.HasIdentifier)
      .select($"s".as("owner"), $"o".as("id_uri"))
      .join(idContent, Seq("id_uri"), "left")
    val idW = org.apache.spark.sql.expressions.Window
      .partitionBy($"owner", $"scheme", $"value")
    val dupEdges = owned.filter($"scheme".isNotNull)
      .withColumn("keep_uri", min($"id_uri").over(idW))
      .filter($"id_uri" =!= $"keep_uri")
      .select($"owner", $"id_uri").localCheckpoint()
    if (dupEdges.isEmpty) merged0
    else {
      val deduped = merged0.join(
        dupEdges.select($"owner".as("s"), $"id_uri".as("o"),
          lit(v.HasIdentifier).as("p")), Seq("s", "p", "o"), "left_anti")
      // purge dropped id entities nothing references anymore
      val stillRef = deduped.filter($"p" === v.HasIdentifier)
        .select($"o".as("id_uri")).distinct()
      val orphans = dupEdges.select($"id_uri")
        .join(stillRef, Seq("id_uri"), "left_anti")
      deduped.join(orphans.select($"id_uri".as("s")), Seq("s"), "left_anti")
        .distinct()
    }
  }

  /** `run/merge/group_entities.py`: split a merge-row batch into
    * conflict-free groups — rows whose entities are RDF-connected (one
    * hop over non-schema predicates, either direction, neighbor must
    * itself be a subject — the tool's batched SPARQL probe) or whose
    * entities land in the same dump file must process in the same group.
    * The reference's driver-side UnionFind over per-row SPARQL round
    * trips becomes the SAME distributed connected-components operator
    * entity resolution uses, fed by one join against the triples table;
    * `optimize_groups`'s singleton packing (batches of `targetSize`, a
    * lone remainder folded into the smallest multi-row group) is a window
    * over the singleton set.
    * @param mergeRows (surviving_entity, merged_entities) — merged
    *        entities "; "-separated like the tool's CSV
    * @return input rows + group_id (stable strings, not the reference's
    *         arbitrary UF roots) */
  def groupMergeRows(mergeRows: DataFrame, triples: DataFrame,
      dirSplit: Long = 10000, itemsPerFile: Long = 1000,
      targetSize: Int = 50): DataFrame = {
    import mergeRows.sparkSession.implicits._
    val v = graft.rdf.Vocab
    val rows = mergeRows.select($"surviving_entity", $"merged_entities")
      .withColumn("row_id", xxhash64($"surviving_entity", $"merged_entities"))
      .localCheckpoint()
    val rowEnts = rows.select($"row_id", explode(array_union(
        array($"surviving_entity"),
        filter(transform(split($"merged_entities", ";"), t => trim(t)),
          t => length(t) > 0))).as("entity"))
      .localCheckpoint()
    // RDF connections: the entity itself plus its one-hop neighborhood
    val skip = Seq(v.RdfType, v.UsesIdentifierScheme, v.WithRole)
    val edges = triples.filter(!$"p".isin(skip: _*))
    val subs = triples.select($"s").distinct()
    val nbrs = edges.select($"s".as("entity"), $"o".as("key"))
      .unionByName(edges.select($"o".as("entity"), $"s".as("key")))
      .join(rowEnts, Seq("entity"))
      .join(subs.select($"s".as("key")), Seq("key"), "left_semi")
      .select($"row_id", $"key")
    val selfKeys = rowEnts.select($"row_id", $"entity".as("key"))
    // file-range conflicts: the dir-split bucket of each touched entity
    // when(rlike) guard: CaseWhen evaluates branches lazily, so the cast
    // never sees the empty string regexp_extract yields on non-match —
    // which would throw under Spark 4's default ANSI mode. Digit-less
    // (malformed) entities fall through as null and are filtered out.
    val fileKeys = rowEnts
      .withColumn("n", when($"entity".rlike("\\d+$"),
        regexp_extract($"entity", "(\\d+)$", 1).cast("long")))
      .filter($"n".isNotNull)
      .select($"row_id", concat(lit("FILE:"),
        regexp_extract($"entity", "/([a-z]+)/\\d+$", 1), lit("/"),
        (($"n" / dirSplit).cast("long") * dirSplit + dirSplit), lit("/"),
        (($"n" / itemsPerFile).cast("long") * itemsPerFile + itemsPerFile))
        .as("key"))
    val membership = selfKeys.unionByName(nbrs).unionByName(fileKeys)
      .select($"row_id".as("entity"), $"key")
    val cc = graft.curation.ConnectedComponents.byShardKey(membership)
      .select($"entity".as("row_id"), $"component")
    val labeled = rows.join(cc, Seq("row_id"), "left")
      .withColumn("component", coalesce($"component", $"row_id"))
      .localCheckpoint()
    val sizes = labeled.groupBy($"component").agg(count(lit(1)).as("gsz"))
      .localCheckpoint()
    val multis = labeled.join(sizes.filter($"gsz" > 1), Seq("component"))
      .select($"surviving_entity", $"merged_entities",
        concat(lit("group_"), $"component").as("group_id"))
    // optimize_groups: singles pack into chunks of targetSize...
    val singles = labeled.join(sizes.filter($"gsz" === 1), Seq("component"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"surviving_entity")))
    val nSingles = singles.count()
    val nMultis = sizes.filter($"gsz" > 1).count()
    // ...and a lone remainder folds into the smallest multi-row group
    val foldLast = nMultis > 0 && nSingles % targetSize == 1
    val smallestMulti: Long =
      if (foldLast)
        sizes.filter($"gsz" > 1).orderBy($"gsz", $"component")
          .select($"component").head.getLong(0)
      else 0L
    val packed = singles.select($"surviving_entity", $"merged_entities",
      when(lit(foldLast) && $"rk" === nSingles,
        lit("group_" + smallestMulti))
        .otherwise(concat(lit("singles_"), (($"rk" - 1) / targetSize).cast("long")))
        .as("group_id"))
    multis.unionByName(packed)
  }

  /** `run/merge/compact_output_csv.py`: keep only the Done=true rows of a
    * merge-output batch, projected to (surviving_entity, merged_entities).
    * The tool's per-file loop + totals report is the frame's own count. */
  def compactMergeRows(mergeOutput: DataFrame): DataFrame = {
    import mergeOutput.sparkSession.implicits._
    mergeOutput.filter(lower(trim(coalesce($"Done", lit("")))) === "true")
      .select(trim($"surviving_entity").as("surviving_entity"),
        trim($"merged_entities").as("merged_entities"))
  }

  /** `run/infodir/check.py`: verify stored counters against the store.
    * Two violation classes, reported as (check, entity, detail) rows like
    * [[graft.rdf.Checkers]]: an entity-kind counter smaller than the max
    * minted number (`max_resource_numbers` vs the counter files), and a
    * provenance counter that disagrees with the entity's max snapshot
    * number (`lookup_prov_counter != max_snapshot`).
    * @param storedCounters (kind, next_n) — the info-dir state, e.g. from
    *        [[regenerateCounters]] of an earlier run
    * @param provCounters (entity, counter) stored per-entity prov counters
    * @param prov the prov_snapshots table */
  def checkCounters(storedCounters: DataFrame, entityMetas: DataFrame,
      prefix: String, provCounters: DataFrame, prov: DataFrame): DataFrame = {
    import storedCounters.sparkSession.implicits._
    val actual = regenerateCounters(entityMetas, prefix)
      .select($"kind", $"next_n".as("actual_n"))
    val entityViol = storedCounters.select($"kind", $"next_n".as("stored_n"))
      .join(actual, Seq("kind"), "full_outer")
      .filter(coalesce($"stored_n", lit(-1L)) < coalesce($"actual_n", lit(0L)))
      .select(lit("counter_behind").as("check"), $"kind".as("entity"),
        concat(lit("stored "), coalesce($"stored_n", lit(0L)),
          lit(", max minted "), coalesce($"actual_n", lit(0L))).as("detail"))
    val maxSnap = prov.groupBy($"entity").agg(max($"snapshot_n").as("max_snap"))
    val provViol = provCounters.select($"entity", $"counter")
      .join(maxSnap, Seq("entity"), "full_outer")
      .filter(coalesce($"counter", lit(0L)) =!= coalesce($"max_snap", lit(0L)))
      .select(lit("prov_counter_mismatch").as("check"), $"entity",
        concat(lit("counter "), coalesce($"counter", lit(0L)),
          lit(", max snapshot "), coalesce($"max_snap", lit(0L))).as("detail"))
    entityViol.unionByName(provViol)
  }

  // ---- counting / statistics suite (G4 composes) ------------------------

  /** `run/count/triples.py`: triple/quad counts of a dump directory, per
    * file and in total. `format` mirrors the tool's `--format`:
    * `nquads`/`nt` count parseable statement lines, `json-ld` counts the
    * triples of each line's node document (its `_count_jsonld_object`
    * arithmetic — one per @type value, one per predicate value). The
    * reference walks files in a multiprocess pool; here it is one text
    * scan grouped by `input_file_name`. Returns (file, triples) plus a
    * `__total__` row. */
  def countDumpTriples(spark: org.apache.spark.sql.SparkSession, path: String,
      format: String = "nquads"): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
      .withColumn("file", input_file_name())
    val perLine = format match {
      case "json-ld" =>
        lines.as[(String, String)].map { case (line, file) =>
          import org.json4s._
          val n = org.json4s.jackson.JsonMethods.parseOpt(line) match {
            case Some(JObject(fields)) =>
              fields.map {
                case ("@id", _) => 0
                case ("@type", JArray(vs)) => vs.length
                case ("@type", _) => 1
                case (_, JArray(vs)) => vs.length
                case _ => 1
              }.sum
            case _ => 0
          }
          (file, n.toLong)
        }.toDF("file", "n")
      case _ => // nquads / nt: a statement per parseable line
        lines.select($"file",
          when(trim($"value").rlike("^<[^>]+>\\s+<[^>]+>\\s+\\S"), 1L)
            .otherwise(0L).as("n"))
    }
    val perFile = perLine.groupBy($"file").agg(sum($"n").as("triples"))
    perFile.unionByName(
      perFile.select(lit("__total__").as("file"),
        coalesce(sum($"triples"), lit(0L)).as("triples")))
      .orderBy($"file")
  }

  /** `run/count/meta_entities.py` (`OCMetaStatistics`): the statistics
    * report as one (metric, count) frame — distinct fabio:Expression
    * subjects, RoleInTime counts per pro:author/publisher/editor, and
    * distinct venues from the curated CSV (keyed by omid when the venue
    * carries other external ids, by lowercased name otherwise —
    * `_count_venues_in_file`). The reference runs one SPARQL COUNT per
    * metric plus a CSV-dump pass; here each metric is a distinct-count
    * over the same predicate slice and the union is a single report. */
  def metaEntityStats(triples: DataFrame, curatedRows: DataFrame): DataFrame = {
    import triples.sparkSession.implicits._
    val v = graft.rdf.Vocab
    val expressions = triples
      .filter($"p" === v.RdfType && $"o" === v.Expression)
      .agg(count_distinct($"s").as("count"))
      .select(lit("expressions").as("metric"), $"count")
    val roles = Seq("author", "publisher", "editor").map { r =>
      triples.filter($"p" === v.WithRole && $"o" === v.Pro + r)
        .agg(count_distinct($"s").as("count"))
        .select(lit("pro:" + r).as("metric"), $"count")
    }.reduce(_ unionByName _)
    val venueCell = curatedRows
      .select(trim(regexp_replace($"venue", "\\[[^\\]]*\\]", "")).as("name"),
        regexp_extract($"venue", "\\[([^\\]]*)\\]", 1).as("ids_str"))
      .filter(length(trim($"ids_str")) > 0)
      .withColumn("toks", filter(split($"ids_str", "\\s+"), t => length(t) > 0))
      .withColumn("omid", filter($"toks", t => t.startsWith("omid:")).getItem(0))
      .withColumn("others", size(filter($"toks", t => !t.startsWith("omid:"))))
      .select(when($"others" > 0 && $"omid".isNotNull, $"omid")
        .otherwise(lower($"name")).as("venue_key"))
    val venues = venueCell.agg(count_distinct($"venue_key").as("count"))
      .select(lit("venues").as("metric"), $"count")
    expressions.unionByName(roles).unionByName(venues)
  }
}
