package graft.rdf

/** OCDM vocabulary constants (evidence: test/testcases/testcase_01.ttl,
  * oc_meta/run/meta/generate_csv.py:40-77 URI_TYPE_DICT,
  * oc_meta/lib/finder.py:31-58). */
object Vocab {
  val BaseIri = "https://w3id.org/oc/meta"

  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val Datacite = "http://purl.org/spar/datacite/"
  val HasIdentifier = Datacite + "hasIdentifier"
  val UsesIdentifierScheme = Datacite + "usesIdentifierScheme"
  val IdentifierClass = Datacite + "Identifier"
  val HasLiteralValue = "http://www.essepuntato.it/2010/06/literalreification/hasLiteralValue"
  val Title = "http://purl.org/dc/terms/title"
  val Description = "http://purl.org/dc/terms/description"
  // PROV-O — the snapshot vocabulary the reference's prov JSON-LD uses
  // (run/meta/check_rdf_files.py:67-68, run/find/merged_entities.py:23-24)
  val Prov = "http://www.w3.org/ns/prov#"
  val ProvEntity = Prov + "Entity"
  val GeneratedAtTime = Prov + "generatedAtTime"
  val InvalidatedAtTime = Prov + "invalidatedAtTime"
  val SpecializationOf = Prov + "specializationOf"
  val WasDerivedFrom = Prov + "wasDerivedFrom"
  val WasAttributedTo = Prov + "wasAttributedTo"
  val Pro = "http://purl.org/spar/pro/"
  val IsDocumentContextFor = Pro + "isDocumentContextFor"
  val WithRole = Pro + "withRole"
  val IsHeldBy = Pro + "isHeldBy"
  val RoleInTime = Pro + "RoleInTime"
  val HasNext = "https://w3id.org/oc/ontology/hasNext"
  val Frbr = "http://purl.org/vocab/frbr/core#"
  val PartOf = Frbr + "partOf"
  val Embodiment = Frbr + "embodiment"
  val Prism = "http://prismstandard.org/namespaces/basic/2.0/"
  val PublicationDate = Prism + "publicationDate"
  val StartingPage = Prism + "startingPage"
  val EndingPage = Prism + "endingPage"
  val Fabio = "http://purl.org/spar/fabio/"
  val Expression = Fabio + "Expression"
  val Manifestation = Fabio + "Manifestation"
  val HasSequenceIdentifier = Fabio + "hasSequenceIdentifier"
  val FoafAgent = "http://xmlns.com/foaf/0.1/Agent"
  val FoafName = "http://xmlns.com/foaf/0.1/name"
  val FoafFamilyName = "http://xmlns.com/foaf/0.1/familyName"
  val FoafGivenName = "http://xmlns.com/foaf/0.1/givenName"

  val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  val RdfLangString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
  /** Language-tagged literals carry `langString@<tag>` in `o_datatype` so
    * the tag survives the 4/5-column triples frame (rdflib parity: the
    * reference round-trips `"x"@en` as rdf:langString, not xsd:string). */
  val LangStringPrefix = RdfLangString + "@"
  val XsdDateTime = "http://www.w3.org/2001/XMLSchema#dateTime"
  val XsdGYear = "http://www.w3.org/2001/XMLSchema#gYear"
  val XsdGYearMonth = "http://www.w3.org/2001/XMLSchema#gYearMonth"
  val XsdDate = "http://www.w3.org/2001/XMLSchema#date"

  /** type label -> fabio/doco class (URI_TYPE_DICT inverted; 'book part'
    * and 'abstract' live in doco, 'peer review' in fr). */
  val TypeLabelToClass: Map[String, String] = Map(
    "abstract" -> "http://purl.org/spar/doco/Abstract",
    "archival document" -> (Fabio + "ArchivalDocument"),
    "audio document" -> (Fabio + "AudioDocument"),
    "book" -> (Fabio + "Book"),
    "book chapter" -> (Fabio + "BookChapter"),
    "book section" -> (Fabio + "ExpressionCollection"),
    "book series" -> (Fabio + "BookSeries"),
    "book set" -> (Fabio + "BookSet"),
    "computer program" -> (Fabio + "ComputerProgram"),
    "book part" -> "http://purl.org/spar/doco/Part",
    "dataset" -> (Fabio + "DataFile"),
    "data file" -> (Fabio + "DataFile"),
    "data management plan" -> (Fabio + "DataManagementPlan"),
    "dissertation" -> (Fabio + "Thesis"),
    "editorial" -> (Fabio + "Editorial"),
    "journal" -> (Fabio + "Journal"),
    "journal article" -> (Fabio + "JournalArticle"),
    "journal editorial" -> (Fabio + "JournalEditorial"),
    "journal issue" -> (Fabio + "JournalIssue"),
    "journal volume" -> (Fabio + "JournalVolume"),
    "newspaper" -> (Fabio + "Newspaper"),
    "newspaper article" -> (Fabio + "NewspaperArticle"),
    "newspaper issue" -> (Fabio + "NewspaperIssue"),
    "peer review" -> "http://purl.org/spar/fr/ReviewVersion",
    "proceedings" -> (Fabio + "AcademicProceedings"),
    "preprint" -> (Fabio + "Preprint"),
    "presentation" -> (Fabio + "Presentation"),
    "proceedings article" -> (Fabio + "ProceedingsPaper"),
    "reference book" -> (Fabio + "ReferenceBook"),
    "reference entry" -> (Fabio + "ReferenceEntry"),
    "report" -> (Fabio + "ReportDocument"),
    "report series" -> (Fabio + "ReportSeries"),
    "retraction notice" -> (Fabio + "RetractionNotice"),
    "series" -> (Fabio + "Series"),
    "standard" -> (Fabio + "SpecificationDocument"),
    "web content" -> (Fabio + "WebContent"),
  )

  val ClassToTypeLabel: Map[String, String] =
    TypeLabelToClass.map(_.swap) + ((Fabio + "DataFile") -> "dataset")

  def uri(meta: String): String = s"$BaseIri/$meta"
}
