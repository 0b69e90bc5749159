package graft.curation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdf.StoreViews

/** Store-backed curation — the reference's "update" scenario (SURVEY §6,
  * D2 store branches / J5 equalizer / D8 / D9): a batch is resolved
  * against an existing triples snapshot instead of an empty world.
  *
  * Strategy (set-oriented equivalent of the row-by-row id_worker):
  *  1. run the fresh pipeline in a TEMPORARY number space (offset 10^9 —
  *     disjoint from any real store numbering);
  *  2. match batch entities to store entities by shared identifier:
  *     exactly one store match -> ADOPT the store meta (D2(5) hit);
  *     two-plus -> CONFLICT, keep the new entity (D2(3): components
  *     spanning >=2 store entities must not union them);
  *  3. compactly renumber the remaining new entities per kind from the
  *     store's counters (stable first-appearance order preserved);
  *  4. rewrite every output frame through the resulting meta->meta map
  *     (broadcast — bounded by batch entity count, not store size) and
  *     apply the equalizer precedence (J5): store wins for title,
  *     pub_date, type, volume, issue, page; batch fills what the store
  *     lacks. Adopted entities are flagged preexisting (D9).
  */
object StoreCurator {

  private val TempBase = 1000000000L

  final case class UpdateResult(batch: Curator.CuratedBatch, preexisting: DataFrame)

  /** @param counterOffsets explicit per-kind numbering offsets for NEW
    *   entities. The reference numbers new entities from its counter
    *   FILES, not from the store's maximum (a fresh info_dir starts at 1
    *   even against a populated store — curator_test.py get_counter_
    *   handler); None = continue from the store maxima.
    * @param normalizeTitles forwarded to [[Curator.curateFresh]]. */
  def curateWithStore(input: DataFrame, store: StoreViews.Store,
      prefix: String = "060",
      silencedRoles: Set[String] = Set.empty,
      prov: Option[DataFrame] = None,
      counterOffsets: Option[Map[String, Long]] = None,
      normalizeTitles: Boolean = false): UpdateResult = {
    val spark = input.sparkSession
    import spark.implicits._

    // Phase 1: fresh curation in the temp number space. Every frame is
    // consumed several times below (adoption joins, renumber collect,
    // remapping) — checkpoint once so the curation DAG runs once.
    val fresh = {
      val f = Curator.curateFresh(input, prefix, numberOffset = TempBase,
        normalizeTitles = normalizeTitles)
      def ck(df: DataFrame) = df.localCheckpoint()
      Curator.CuratedBatch(ck(f.rows), ck(f.indexIdBr), ck(f.indexIdRa),
        ck(f.arIndex), ck(f.reIndex), ck(f.vviIndex), ck(f.entities),
        ck(f.entityIds), ck(f.roles), ck(f.raNames), ck(f.pages), ck(f.partOf))
    }

    // Phase 2: adoption by shared identifier, per entity kind.
    def adoptions(batchIds: DataFrame, storeKindPrefix: String): DataFrame = {
      val storeIds = store.entityIds
        .filter($"owner_meta".startsWith(storeKindPrefix))
        .select($"literal", $"owner_meta".as("store_meta"))
      batchIds
        .join(storeIds, "literal")
        .groupBy($"owner_meta")
        .agg(countDistinct($"store_meta").as("n_matches"),
          min($"store_meta").as("adopted"))
        // D2(3): two-plus distinct store entities -> conflict, no adoption
        .filter($"n_matches" === 1)
        .select($"owner_meta".as("from_meta"), $"adopted".as("to_meta"))
    }
    val batchIdLiterals = fresh.entityIds
      .select($"owner_meta", concat($"scheme", lit(":"), $"value").as("literal"))
    val brAdopt = adoptions(batchIdLiterals.filter($"owner_meta".startsWith("br/")), "br/")
    val raAdopt = adoptions(batchIdLiterals.filter($"owner_meta".startsWith("ra/")), "ra/")
    // id entities adopt by literal equality directly
    val idAdopt = fresh.entityIds.select($"id_meta",
        concat($"scheme", lit(":"), $"value").as("literal")).distinct()
      .join(store.entityIds.select($"literal", $"id_meta".as("store_id")).distinct(), "literal")
      .groupBy($"id_meta").agg(min($"store_id").as("to_meta"))
      .select($"id_meta".as("from_meta"), $"to_meta")
    // re entities of adopted BRs adopt the store re (store page wins, D8)
    val reAdopt = fresh.pages.select($"br_meta", $"re_meta".as("from_meta"))
      .join(brAdopt.withColumnRenamed("from_meta", "br_meta")
        .withColumnRenamed("to_meta", "store_br"), Seq("br_meta"))
      .join(store.pages.select($"br_meta".as("store_br"), $"re_meta".as("to_meta")),
        Seq("store_br"))
      .select($"from_meta", $"to_meta")

    // D2(1): an explicit omid present in the store adopts it outright
    // (highest priority). D2(2): an explicit omid UNKNOWN to the store is
    // looked up in the provenance merge history (finder.py:201-250,
    // `retrieve_metaid_from_merged_entity`): a dead omid absorbed by a
    // merge resolves to its surviving successor. If that also fails the
    // token is simply discarded (curator.py:1196-1205 sets metaval='') and
    // the component falls through to id-based resolution below or is
    // minted as a new entity — the row is never dropped.
    val explicitPerComp = fresh.rows
      .select($"br_meta".as("from_meta"), explode($"explicit_omids").as("ex"))
      .filter($"ex".isNotNull)
      .groupBy($"from_meta")
      .agg(countDistinct($"ex").as("n_ex"), min($"ex").as("ex_omid"))
      .filter($"n_ex" === 1)
    val storeBrs = store.entities.select($"meta".as("ex_omid")).distinct()
    val knownExplicit = explicitPerComp
      .join(storeBrs, Seq("ex_omid"), "left_semi")
      .select($"from_meta", $"ex_omid".as("to_meta"))
    val mergedHopExplicit = prov match {
      case None => spark.emptyDataFrame
        .withColumn("from_meta", lit("")).withColumn("to_meta", lit(""))
        .select($"from_meta", $"to_meta").limit(0)
      case Some(p) =>
        // (merged -> surviving) pairs from SCD2 merge snapshots (G8 shape);
        // follow successor chains so an omid whose successor was itself
        // later merged still lands on a live entity (the reference's
        // one-hop query composed to a fixpoint, bounded: chains are the
        // depth of the merge history, not data-sized).
        var hop = graft.operators.Tools.mergedEntityPairs(p)
          .select($"merged", $"surviving").localCheckpoint()
        var iter = 0
        var changed = true
        while (changed && iter < 8) {
          val next = hop.alias("a")
            .join(hop.alias("b"), col("a.surviving") === col("b.merged"), "left")
            .select(col("a.merged"),
              coalesce(col("b.surviving"), col("a.surviving")).as("surviving"))
            .groupBy($"merged").agg(min($"surviving").as("surviving"))
            .localCheckpoint()
          changed = next.alias("n").join(hop.alias("h"), Seq("merged"))
            .filter(col("n.surviving") =!= col("h.surviving")).head(1).nonEmpty
          hop = next
          iter += 1
        }
        explicitPerComp
          .join(storeBrs, Seq("ex_omid"), "left_anti")
          .join(hop.withColumnRenamed("merged", "ex_omid"), Seq("ex_omid"))
          // successor must be a live store entity
          .join(storeBrs.select($"ex_omid".as("surviving")), Seq("surviving"), "left_semi")
          .select($"from_meta", $"surviving".as("to_meta"))
    }
    val brAdoptExplicit = knownExplicit.unionByName(mergedHopExplicit)

    val adoptAll = brAdoptExplicit
      .unionByName(brAdopt.join(brAdoptExplicit.select($"from_meta"), Seq("from_meta"), "left_anti"))
      .unionByName(raAdopt).unionByName(idAdopt).unionByName(reAdopt)
      .groupBy($"from_meta").agg(min($"to_meta").as("to_meta"))

    // Phase 3: compact renumbering of non-adopted temp entities per kind.
    val allMetas = graft.rdf.Provenance.allEntities(fresh).select($"meta")
    val offsets = counterOffsets.getOrElse(store.counters.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap).withDefaultValue(0L)
    val fresh2 = allMetas.join(adoptAll.select($"from_meta".as("meta")), Seq("meta"), "left_anti")
      .withColumn("kind", substring_index($"meta", "/", 1))
      .withColumn("temp_n", expr(s"CAST(substring(substring_index(meta, '/', -1), ${prefix.length + 1}) AS BIGINT)"))
    val renumber: Seq[(String, String)] = fresh2.as[(String, String, Long)].collect()
      .groupBy(_._2)
      .toSeq
      .flatMap { case (kind, ms) =>
        val base = offsets(kind)
        ms.sortBy(_._3).zipWithIndex.map { case ((meta, k, _), i) =>
          meta -> s"$k/$prefix${base + i + 1}"
        }.toSeq
      }
    val mapping: Map[String, String] =
      adoptAll.as[(String, String)].collect().toMap ++ renumber.toMap

    // Phase 4: rewrite frames + equalizer.
    val bMapping = spark.sparkContext.broadcast(mapping)
    val remapUdf = udf((m: String) => if (m == null) null else bMapping.value.getOrElse(m, m))
    // Row cells mix external identifier literals with omids — rewrite only
    // `omid:`-anchored tokens so a DOI/url segment that happens to look
    // like `id/123` is never corrupted by the renumbering map.
    val remapCellUdf = udf((cell: String) =>
      if (cell == null) null
      else "omid:((?:br|ra|ar|re|id)/\\d+)".r.replaceAllIn(cell, mm =>
        java.util.regex.Matcher.quoteReplacement(
          "omid:" + bMapping.value.getOrElse(mm.group(1), mm.group(1)))))
    // Index cells are pure meta lists ("ar/N, ra/N; …") — bare patterns
    // are metas by construction there.
    val remapBareCellUdf = udf((cell: String) =>
      if (cell == null) null
      else "(?:br|ra|ar|re|id)/\\d+".r.replaceAllIn(cell,
        mm => java.util.regex.Matcher.quoteReplacement(bMapping.value.getOrElse(mm.matched, mm.matched))))

    def remapCols(df: DataFrame, metaCols: Seq[String], cellCols: Seq[String] = Nil,
        bareCellCols: Seq[String] = Nil): DataFrame = {
      val afterMeta = metaCols.foldLeft(df)((d, c) => d.withColumn(c, remapUdf(col(c))))
      val afterCells = cellCols.foldLeft(afterMeta)((d, c) => d.withColumn(c, remapCellUdf(col(c))))
      bareCellCols.foldLeft(afterCells)((d, c) => d.withColumn(c, remapBareCellUdf(col(c))))
    }

    // equalizer (J5/J6, curator.py:1402-1460 + finder retrieve_br_info):
    // store values win for title/date/type/volume/issue/page; volume/issue
    // and the venue come from the br's partOf chain (own seq for jv/ji,
    // parent issue seq, parent/grandparent volume seq, first non-jv/ji
    // titled container = venue).
    val storeFacts = store.entities.select($"meta".as("br_meta"),
      $"title".as("st_title"), $"date".as("st_date"), $"type_label".as("st_type"),
      lit(true).as("_adopted"))
    val storePages = store.pages.select($"br_meta", $"page".as("st_page"))
    val stVvi = {
      def entAs(n: String) = store.entities.select($"meta".as(s"${n}_meta"),
        $"type_label".as(s"${n}_type"), $"title".as(s"${n}_title"), $"seq_id".as(s"${n}_seq"))
      val po = store.partOf
      store.entities.select($"meta".as("br_meta"), $"type_label".as("own_type"),
          $"seq_id".as("own_seq"))
        .join(po.select($"child_meta".as("br_meta"), $"parent_meta".as("c1_meta")), Seq("br_meta"), "left")
        .join(entAs("c1"), Seq("c1_meta"), "left")
        .join(po.select($"child_meta".as("c1_meta"), $"parent_meta".as("c2_meta")), Seq("c1_meta"), "left")
        .join(entAs("c2"), Seq("c2_meta"), "left")
        .join(po.select($"child_meta".as("c2_meta"), $"parent_meta".as("c3_meta")), Seq("c2_meta"), "left")
        .join(entAs("c3"), Seq("c3_meta"), "left")
        .select($"br_meta",
          when($"own_type" === "journal issue", $"own_seq")
            .otherwise(when($"c1_type" === "journal issue", $"c1_seq")).as("st_issue"),
          when($"own_type" === "journal volume", $"own_seq")
            .otherwise(coalesce(
              when($"c1_type" === "journal volume", $"c1_seq"),
              when($"c2_type" === "journal volume", $"c2_seq"))).as("st_volume"),
          coalesce(
            when(!$"c1_type".isin("journal volume", "journal issue") && length($"c1_title") > 0, $"c1_meta"),
            when(!$"c2_type".isin("journal volume", "journal issue") && length($"c2_title") > 0, $"c2_meta"),
            when(length($"c3_title") > 0, $"c3_meta")).as("st_venue_meta"))
        .filter($"st_issue".isNotNull || $"st_volume".isNotNull || $"st_venue_meta".isNotNull)
    }
    val storeVenueCells = store.entities
      .join(store.entityIds.groupBy($"owner_meta")
        .agg(sort_array(collect_set($"literal")).as("st_venue_ids")),
        $"meta" === $"owner_meta", "left")
      .select($"meta".as("st_venue_meta"), $"title".as("st_venue_name"),
        coalesce($"st_venue_ids", array().cast("array<string>")).as("st_venue_ids"),
        concat($"title", lit(" ["), concat_ws(" ",
          flatten(array(array(concat(lit("omid:"), $"meta")), coalesce($"st_venue_ids", array())))),
          lit("]")).as("st_venue_cell"))

    // D6 silencer: for adopted BRs whose store graph ALREADY carries a
    // sequence for a silenced role, the batch's agents are ignored and the
    // store sequence is kept (curator.py:661-662 / creator.py:127-159).
    // Store cells are rebuilt from the store role/name/id frames.
    val storeRoleCells = store.roles
      .join(store.raNames, Seq("ra_meta"), "left")
      .join(store.entityIds.groupBy($"owner_meta".as("ra_meta"))
        .agg(concat_ws(" ", sort_array(collect_list($"literal"))).as("ra_ids")), Seq("ra_meta"), "left")
      .withColumn("agent_cell", concat(coalesce($"name", lit("")), lit(" ["),
        concat_ws(" ", when(nonBlank($"ra_ids"), $"ra_ids"),
          concat(lit("omid:"), $"ra_meta")), lit("]")))
      .groupBy($"br_meta", $"role")
      .agg(concat_ws("; ", transform(array_sort(collect_list(struct($"pos", $"ar_meta", $"agent_cell"))),
        x => x.getField("agent_cell"))).as("st_cell"),
        concat_ws("; ", transform(array_sort(collect_list(struct($"pos", $"ar_meta", $"ra_meta"))),
          x => concat(x.getField("ar_meta"), lit(", "), x.getField("ra_meta")))).as("st_pairs"))
    def silencedCell(role: String) =
      if (!silencedRoles.contains(role)) Seq.empty
      else Seq(storeRoleCells.filter($"role" === role)
        .select($"br_meta", $"st_cell".as(s"st_${role}_cell")))

    // Per-role store cells for the equalizer's fill-if-empty rule
    // (curator.py:1419-1421: store agents only when the batch cell is
    // empty — unlike pub_date/type/volume/issue where the store wins).
    def roleFillCell(role: String) = storeRoleCells.filter($"role" === role)
      .select($"br_meta", $"st_cell".as(s"st_fill_${role}"))

    val rows2base = remapCols(fresh.rows,
        Seq("br_meta", "re_meta"),
        Seq("id", "author", "venue", "publisher", "editor"))
      .join(storeFacts, Seq("br_meta"), "left")
      .join(storePages, Seq("br_meta"), "left")
      .join(stVvi, Seq("br_meta"), "left")
      .join(storeVenueCells, Seq("st_venue_meta"), "left")
      .join(roleFillCell("author"), Seq("br_meta"), "left")
      .join(roleFillCell("publisher"), Seq("br_meta"), "left")
      .join(roleFillCell("editor"), Seq("br_meta"), "left")
      .withColumn("title", when(nonBlank($"st_title"), $"st_title").otherwise($"title"))
      // J6: adopted components propagate first-non-empty across their rows
      // (merge_duplicate_entities, curator.py:1384-1387) before store
      // precedence; fresh components keep the last-row value from Curator.
      .withColumn("pub_date", when(nonBlank($"st_date"), $"st_date")
        .otherwise(when($"_adopted", $"fne_date").otherwise($"pub_date")))
      .withColumn("type", when(nonBlank($"st_type"), $"st_type")
        .otherwise(when($"_adopted", $"fne_type").otherwise($"type")))
      .withColumn("volume", when(nonBlank($"st_volume"), $"st_volume")
        .otherwise(when($"_adopted", $"fne_volume").otherwise($"volume")))
      .withColumn("issue", when(nonBlank($"st_issue"), $"st_issue")
        .otherwise(when($"_adopted", $"fne_issue").otherwise($"issue")))
      .withColumn("page", when(nonBlank($"st_page"), $"st_page").otherwise($"page"))
      // venue equalizer (curator.py:1422-1447): store venue replaces an
      // empty batch venue outright; with a batch venue, shared ids merge
      // (store name + sorted id union) and disjoint ids mean the store
      // venue wins wholesale.
      // The batch venue cell carries its own minted/remapped omid token;
      // when the batch venue resolved to a different meta than the store
      // venue, unioning it in would emit two omid: tokens — the reference
      // merges on the pre-curation input venue ids and emits exactly one
      // omid (curator.py:1422-1447), so strip omid tokens from the batch
      // side and let the store venue's omid be the only one.
      .withColumn("_batch_vids",
        filter(split(regexp_extract($"venue", "\\[([^\\]]*)\\]", 1), "\\s+"),
          t => !t.startsWith("omid:")))
      .withColumn("_st_vids_omid",
        when($"st_venue_meta".isNotNull, flatten(array(
          array(concat(lit("omid:"), $"st_venue_meta")), $"st_venue_ids"))))
      .withColumn("venue", when(nonBlank($"st_venue_cell"),
          when(!nonBlank($"venue"), $"st_venue_cell")
            .otherwise(when(arrays_overlap($"_batch_vids", $"_st_vids_omid"),
              concat($"st_venue_name", lit(" ["),
                concat_ws(" ", sort_array(array_union($"_batch_vids", $"_st_vids_omid"))),
                lit("]")))
              .otherwise($"st_venue_cell")))
        .otherwise($"venue"))
      // agent cells: fill-if-empty from the store sequences
      .withColumn("author", when(nonBlank($"author"), $"author")
        .otherwise(coalesce($"st_fill_author", lit(""))))
      .withColumn("publisher", when(nonBlank($"publisher"), $"publisher")
        .otherwise(coalesce($"st_fill_publisher", lit(""))))
      .withColumn("editor", when(nonBlank($"editor"), $"editor")
        .otherwise(coalesce($"st_fill_editor", lit(""))))
      .drop("st_title", "st_date", "st_type", "st_page", "st_volume", "st_issue",
        "st_venue_meta", "st_venue_name", "st_venue_ids", "st_venue_cell",
        "st_fill_author", "st_fill_publisher", "st_fill_editor",
        "_adopted", "_batch_vids", "_st_vids_omid")
    val rows2silenced = Seq("author", "publisher", "editor").foldLeft(rows2base) { (df, role) =>
      silencedCell(role).foldLeft(df) { (d, cellDf) =>
        d.join(cellDf, Seq("br_meta"), "left")
          .withColumn(role, when(nonBlank(col(s"st_${role}_cell")), col(s"st_${role}_cell"))
            .otherwise(col(role)))
          .drop(s"st_${role}_cell")
      }
    }
    // Distinct batch components can land on the SAME store entity (shared
    // ids through the store, or the merged-entity hop). The reference's
    // enrich() unions all ids per entity and its final `{id: row}` dedupe
    // keeps the last row's fields (curator.py:333) while the row keeps its
    // first position — reproduce that by grouping on the final br_meta.
    val rows2 = {
      val cols = rows2silenced.columns
      val others = cols.filterNot(c => c == "br_meta" || c == "id" || c == "first_row")
      val aggs: Seq[org.apache.spark.sql.Column] =
        Seq(
          min($"first_row").as("first_row"),
          concat_ws(" ", array_distinct(flatten(transform(
            array_sort(collect_list(struct($"first_row".as("k"), split($"id", " ").as("v")))),
            x => x.getField("v"))))).as("id")) ++
        others.map(c =>
          max(struct($"first_row".as("_k"), col(c).as("_v"))).getField("_v").as(c))
      val grouped = rows2silenced
        .groupBy($"br_meta")
        .agg(aggs.head, aggs.tail: _*)
      grouped.select(cols.map(col): _*)
    }

    val batch2 = Curator.CuratedBatch(
      rows = rows2,
      indexIdBr = remapCols(fresh.indexIdBr, Seq("meta")),
      indexIdRa = remapCols(fresh.indexIdRa, Seq("meta")),
      arIndex = remapCols(fresh.arIndex, Seq("meta"),
        bareCellCols = Seq("author", "editor", "publisher")),
      reIndex = remapCols(fresh.reIndex, Seq("br", "re")),
      vviIndex = remapCols(fresh.vviIndex, Seq("venue_meta", "meta")),
      entities = remapCols(fresh.entities, Seq("meta"))
        .join(storeFacts.select($"br_meta".as("meta"), $"st_title", $"st_date", $"st_type"), Seq("meta"), "left")
        .withColumn("title", when(nonBlank($"st_title"), $"st_title").otherwise($"title"))
        .withColumn("date", when(nonBlank($"st_date"), $"st_date").otherwise($"date"))
        .withColumn("type_label", when(nonBlank($"st_type"), $"st_type").otherwise($"type_label"))
        .drop("st_title", "st_date", "st_type"),
      entityIds = remapCols(fresh.entityIds, Seq("owner_meta", "id_meta")),
      roles = {
        val remapped = remapCols(fresh.roles, Seq("br_meta", "ar_meta", "ra_meta"))
        if (silencedRoles.isEmpty) remapped
        else {
          // silenced (br, role) pairs with a store sequence use the store
          // roles; the batch's roles for those pairs are dropped
          val silencedKeys = store.roles
            .filter($"role".isin(silencedRoles.toSeq: _*))
            .select($"br_meta", $"role").distinct()
          val kept = remapped.join(silencedKeys, Seq("br_meta", "role"), "left_anti")
          val substituted = store.roles
            .join(silencedKeys, Seq("br_meta", "role"), "left_semi")
            .select($"br_meta", $"role", $"pos", $"ar_meta", $"ra_meta")
          kept.unionByName(substituted)
        }
      },
      raNames = remapCols(fresh.raNames, Seq("ra_meta")),
      pages = remapCols(fresh.pages, Seq("br_meta", "re_meta")),
      partOf = remapCols(fresh.partOf, Seq("child_meta", "parent_meta")))

    val preexisting = adoptAll.select($"to_meta".as("meta")).distinct()

    UpdateResult(batch2, preexisting)
  }

  private def nonBlank(c: org.apache.spark.sql.Column) = c.isNotNull && length(c) > 0
}
