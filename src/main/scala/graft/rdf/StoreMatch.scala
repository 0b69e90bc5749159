package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bibliographic match metadata straight from the triples table — the
  * distributed re-expression of the reference's per-entity SPARQL probe
  * `fetch_triplestore_metadata` (`lib/bibliographic_matching.py:85-178`):
  * one frame with every field [[graft.functions.BiblioMatch]] scores
  * (title, first author, year, venue+issn, volume, issue, pages), for ALL
  * bibliographic resources at once instead of one SPARQL round-trip each.
  *
  * The reference's property paths map to bounded iterative joins:
  * `frbr:partOf+` becomes a depth-tracked ancestor closure (lineage cut
  * per hop), the venue is the root-most titled ancestor, and volume/issue
  * are the JournalVolume/JournalIssue ancestors' sequence identifiers.
  * The first author is the author AR not pointed to by any hasNext
  * (`bibliographic_matching.py:148-156`), smallest URI as the
  * deterministic stand-in for the reference's first-binding choice.
  */
object StoreMatch {

  /** (br, title, family, given, year, venue, issn, volume, issue,
    * start_page, end_page) for every subject with an rdf:type in the data
    * graph whose meta kind is `br`. Missing fields are empty strings —
    * the shape BiblioMatch's null/empty guards expect. */
  def brMetadata(triples: DataFrame, maxDepth: Int = 8): DataFrame = {
    import triples.sparkSession.implicits._
    def edges(p: String) = triples.filter($"p" === p).select($"s", $"o")

    val brs = triples.filter($"p" === Vocab.RdfType && $"s".contains("/br/"))
      .select($"s".as("br")).distinct().localCheckpoint()

    def firstLit(p: String, n: String) = triples.filter($"p" === p)
      .groupBy($"s".as("br")).agg(min($"o").as(n))

    val title = firstLit(Vocab.Title, "t0")
      .select($"br", trim(lower($"t0")).as("title"))
    val year = firstLit(Vocab.PublicationDate, "d0")
      .select($"br", substring($"d0", 1, 4).as("year"))

    // partOf ancestor closure with depth (frbr:partOf+), bounded
    val po = edges(Vocab.PartOf).localCheckpoint()
    var anc = brs.join(po, $"br" === $"s")
      .select($"br", $"o".as("node"), lit(1).as("depth"))
      .localCheckpoint()
    var frontier = anc
    var d = 1
    while (d < maxDepth && !frontier.isEmpty) {
      frontier = frontier.join(po, $"node" === $"s")
        .select($"br", $"o".as("node"), ($"depth" + 1).as("depth"))
        .localCheckpoint()
      anc = anc.unionByName(frontier)
      d += 1
    }
    anc = anc.groupBy($"br", $"node").agg(max($"depth").as("depth"))
      .localCheckpoint()

    // venue: the root-most titled ancestor (the journal in a article ->
    // issue -> volume -> journal chain), smallest node URI on depth ties
    val nodeTitle = triples.filter($"p" === Vocab.Title)
      .groupBy($"s".as("node")).agg(min($"o").as("nt"))
    val venuePick = anc.join(nodeTitle, Seq("node"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"br")
          .orderBy($"depth".desc, $"node")))
      .filter($"rn" === 1)
      .select($"br", $"node".as("venue_node"), trim(lower($"nt")).as("venue"))
    val issnOf = edges(Vocab.HasIdentifier)
      .select($"s".as("venue_node"), $"o".as("id_ent"))
      .join(edges(Vocab.UsesIdentifierScheme)
        .filter($"o" === Vocab.Datacite + "issn").select($"s".as("id_ent")), Seq("id_ent"))
      .join(triples.filter($"p" === Vocab.HasLiteralValue)
        .select($"s".as("id_ent"), $"o".as("v")), Seq("id_ent"))
      .groupBy($"venue_node").agg(min($"v").as("issn"))
    val venue = venuePick.join(issnOf, Seq("venue_node"), "left")
      .select($"br", $"venue", $"issn")

    // volume / issue: sequence identifiers of the typed ancestors
    def seqOfType(cls: String, n: String) = anc
      .join(edges(Vocab.RdfType).filter($"o" === cls).select($"s".as("node")), Seq("node"))
      .join(edges(Vocab.HasSequenceIdentifier).select($"s".as("node"), $"o".as("v")),
        Seq("node"))
      .groupBy($"br").agg(min($"v").as(n))
    val volume = seqOfType(Vocab.TypeLabelToClass("journal volume"), "volume")
    val issue = seqOfType(Vocab.TypeLabelToClass("journal issue"), "issue")

    // pages via embodiment
    val pages = edges(Vocab.Embodiment).select($"s".as("br"), $"o".as("re"))
      .join(triples.filter($"p" === Vocab.StartingPage)
        .select($"s".as("re"), $"o".as("sp0")), Seq("re"), "left")
      .join(triples.filter($"p" === Vocab.EndingPage)
        .select($"s".as("re"), $"o".as("ep0")), Seq("re"), "left")
      .groupBy($"br").agg(min($"sp0").as("start_page"), min($"ep0").as("end_page"))

    // first author: author AR with no inbound hasNext, smallest URI
    val authorArs = edges(Vocab.IsDocumentContextFor)
      .select($"s".as("br"), $"o".as("ar"))
      .join(edges(Vocab.WithRole).filter($"o" === Vocab.Pro + "author")
        .select($"s".as("ar")), Seq("ar"))
      .join(edges(Vocab.IsHeldBy).select($"s".as("ar"), $"o".as("ra")), Seq("ar"))
      .localCheckpoint()
    val pointed = edges(Vocab.HasNext).select($"o".as("ar")).distinct()
      .withColumn("pt", lit(1))
    // prefer chain heads (not pointed to by any hasNext); reference
    // fallback: if every AR is pointed to (a cycle), first candidate anyway
    val firstAr = authorArs.join(pointed, Seq("ar"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"br")
          .orderBy(coalesce($"pt", lit(0)), $"ar")))
      .filter($"rn" === 1)
      .join(firstLit(Vocab.FoafFamilyName, "fam0")
        .select($"br".as("ra"), $"fam0"), Seq("ra"), "left")
      .join(firstLit(Vocab.FoafGivenName, "giv0")
        .select($"br".as("ra"), $"giv0"), Seq("ra"), "left")
      .select($"br", trim(lower($"fam0")).as("family"), trim($"giv0").as("given"))

    def e(c: org.apache.spark.sql.Column) = coalesce(c, lit(""))
    brs
      .join(title, Seq("br"), "left")
      .join(firstAr, Seq("br"), "left")
      .join(year, Seq("br"), "left")
      .join(venue, Seq("br"), "left")
      .join(volume, Seq("br"), "left")
      .join(issue, Seq("br"), "left")
      .join(pages, Seq("br"), "left")
      .select($"br", e($"title").as("title"), e($"family").as("family"),
        e($"given").as("given"), e($"year").as("year"), e($"venue").as("venue"),
        e($"issn").as("issn"), e($"volume").as("volume"), e($"issue").as("issue"),
        e($"start_page").as("start_page"), e($"end_page").as("end_page"))
  }
}
