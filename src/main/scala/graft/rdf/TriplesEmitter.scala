package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.curation.Curator.CuratedBatch

/** R1 — curated batch -> OCDM triples (`oc_meta/core/creator.py:92-668`
  * re-expressed as per-entity-kind projections over the normalized frames;
  * each select below replaces one `add_*` method family of the reference's
  * row-at-a-time Creator).
  *
  * Output schema: (s, p, o, o_datatype) where o_datatype is NULL for IRI
  * objects and an xsd type for literals — SURVEY §7.1's `triples` table.
  * The `hasNext` chain (R4) is emitted from array positions at this sink
  * boundary only; order lives as `roles.pos` internally.
  */
object TriplesEmitter {

  def emit(batch: CuratedBatch): DataFrame = {
    val spark = batch.entities.sparkSession
    import spark.implicits._

    def iri(c: org.apache.spark.sql.Column) = concat(lit(Vocab.BaseIri + "/"), c)
    def t(s: org.apache.spark.sql.Column, p: String, o: org.apache.spark.sql.Column,
        dt: Option[String] = None) =
      Seq(s.as("s"), lit(p).as("p"), o.as("o"),
        dt.map(lit(_)).getOrElse(lit(null).cast("string")).as("o_datatype"))

    val typeMap = typedLit(Vocab.TypeLabelToClass)

    val e = batch.entities
    // BR: rdf:type Expression + specific class, title, date, seq
    val brType = e.select(t(iri($"meta"), Vocab.RdfType, lit(Vocab.Expression)): _*)
    val brClass = e.filter(length($"type_label") > 0)
      .withColumn("cls", typeMap($"type_label"))
      .filter($"cls".isNotNull)
      .select(t(iri($"meta"), Vocab.RdfType, $"cls"): _*)
    val brTitle = e.filter(length($"title") > 0)
      .select(t(iri($"meta"), Vocab.Title, $"title", Some(Vocab.XsdString)): _*)
    // E17 — date literal datatype by precision (creator.py:296-301)
    val brDate = e.filter(length($"date") > 0)
      .withColumn("dt",
        when(length($"date") === 4, Vocab.XsdGYear)
          .when(length($"date") === 7, Vocab.XsdGYearMonth)
          .otherwise(Vocab.XsdDate))
      .select($"meta", $"date", $"dt")
      .select(iri($"meta").as("s"), lit(Vocab.PublicationDate).as("p"),
        $"date".as("o"), $"dt".as("o_datatype"))
    val brSeq = e.filter($"seq_id".isNotNull && length($"seq_id") > 0)
      .select(t(iri($"meta"), Vocab.HasSequenceIdentifier, $"seq_id", Some(Vocab.XsdString)): _*)

    // identifiers
    val idOwner = batch.entityIds
      .select(t(iri($"owner_meta"), Vocab.HasIdentifier, iri($"id_meta")): _*)
    val idType = batch.entityIds.select($"id_meta").distinct()
      .select(t(iri($"id_meta"), Vocab.RdfType, lit(Vocab.IdentifierClass)): _*)
    val idScheme = batch.entityIds.select($"id_meta", $"scheme").distinct()
      .select(t(iri($"id_meta"), Vocab.UsesIdentifierScheme,
        concat(lit(Vocab.Datacite), $"scheme")): _*)
    val idValue = batch.entityIds.select($"id_meta", $"value").distinct()
      .select(t(iri($"id_meta"), Vocab.HasLiteralValue, $"value", Some(Vocab.XsdString)): _*)

    // agent roles: AR node + role + holder + document context + hasNext
    val r = batch.roles
    val arType = r.select(t(iri($"ar_meta"), Vocab.RdfType, lit(Vocab.RoleInTime)): _*)
    val arRole = r.select(t(iri($"ar_meta"), Vocab.WithRole, concat(lit(Vocab.Pro), $"role")): _*)
    val arHeld = r.select(t(iri($"ar_meta"), Vocab.IsHeldBy, iri($"ra_meta")): _*)
    val brAr = r.select(t(iri($"br_meta"), Vocab.IsDocumentContextFor, iri($"ar_meta")): _*)
    val nextW = org.apache.spark.sql.expressions.Window
      .partitionBy($"br_meta", $"role").orderBy($"pos")
    val arNext = r.withColumn("next_ar", lead($"ar_meta", 1).over(nextW))
      .filter($"next_ar".isNotNull)
      .select(t(iri($"ar_meta"), Vocab.HasNext, iri($"next_ar")): _*)

    // RA names: "Family, Given" -> family+given; orgs -> foaf:name
    val ra = batch.raNames.filter(length($"name") > 0)
    val raType = batch.raNames.select(t(iri($"ra_meta"), Vocab.RdfType, lit(Vocab.FoafAgent)): _*)
    val persons = ra.filter($"name".contains(","))
      .withColumn("family", trim(substring_index($"name", ",", 1)))
      .withColumn("given", trim(expr("substring(name, instr(name, ',') + 1)")))
    val raFamily = persons.filter(length($"family") > 0)
      .select(t(iri($"ra_meta"), Vocab.FoafFamilyName, $"family", Some(Vocab.XsdString)): _*)
    val raGiven = persons.filter(length($"given") > 0)
      .select(t(iri($"ra_meta"), Vocab.FoafGivenName, $"given", Some(Vocab.XsdString)): _*)
    val raOrg = ra.filter(!$"name".contains(","))
      .select(t(iri($"ra_meta"), Vocab.FoafName, $"name", Some(Vocab.XsdString)): _*)

    // pages (re) + embodiment
    val p = batch.pages
    val reType = p.select(t(iri($"re_meta"), Vocab.RdfType, lit(Vocab.Manifestation)): _*)
    val reStart = p.select(t(iri($"re_meta"), Vocab.StartingPage, $"start_page", Some(Vocab.XsdString)): _*)
    val reEnd = p.select(t(iri($"re_meta"), Vocab.EndingPage, $"end_page", Some(Vocab.XsdString)): _*)
    val brRe = p.select(t(iri($"br_meta"), Vocab.Embodiment, iri($"re_meta")): _*)

    // partOf chain
    val po = batch.partOf.select(t(iri($"child_meta"), Vocab.PartOf, iri($"parent_meta")): _*)

    Seq(brType, brClass, brTitle, brDate, brSeq, idOwner, idType, idScheme,
      idValue, arType, arRole, arHeld, brAr, arNext, raType, raFamily,
      raGiven, raOrg, reType, reStart, reEnd, brRe, po)
      .reduce(_ unionByName _)
      .distinct()
  }
}
