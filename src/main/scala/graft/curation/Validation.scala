package graft.curation

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row validation & normalization passes (SURVEY §2.2 F1-F5) as single
  * Column expressions — fully codegen'd `when` chains, no UDFs.
  * Semantics from `oc_meta/core/curator.py` (line refs inline).
  */
object Validation {

  val InputColumns: Seq[String] = Seq("id", "title", "author", "pub_date",
    "venue", "volume", "issue", "page", "type", "publisher", "editor")

  /** VALID_ENTITY_TYPES (constants.py:69-109). */
  val ValidEntityTypes: Set[String] = Set(
    "abstract", "archival document", "audio document", "book", "book chapter",
    "book part", "book section", "book series", "book set", "computer program",
    "data file", "data management plan", "dataset", "dissertation", "editorial",
    "journal", "journal article", "journal editorial", "journal issue",
    "journal volume", "newspaper", "newspaper article", "newspaper editorial",
    "newspaper issue", "peer review", "preprint", "presentation", "proceedings",
    "proceedings article", "proceedings series", "reference book",
    "reference entry", "retraction notice", "series", "report", "standard",
    "web content")

  /** CONTAINER_EDITOR_TYPES (constants.py:60-68) — editors of these types
    * attach to the venue BR (D7). */
  val ContainerEditorTypes: Set[String] = Set("book chapter", "book part",
    "book section", "book track", "component", "proceedings article",
    "reference entry")

  private def nonEmpty(c: Column): Column = c.isNotNull && length(c) > 0
  private def empty(c: Column): Column = c.isNull || length(c) === 0

  /** F2 — preliminary invalidation pass (curator.py:130-137): with an id
    * and volume/issue but no venue, volume+issue are blanked; a missing
    * type defaults to 'journal article'. Returns (volume, issue, type)
    * replacement expressions. */
  def prePass(id: Column, venue: Column, volume: Column, issue: Column, typ: Column)
      : (Column, Column, Column) = {
    val hasVi = nonEmpty(volume) || nonEmpty(issue)
    val cond = nonEmpty(id) && hasVi
    val newVolume = when(cond && empty(venue), lit("")).otherwise(volume)
    val newIssue = when(cond && empty(venue), lit("")).otherwise(issue)
    val newType = when(cond && empty(typ), lit("journal article")).otherwise(typ)
    (newVolume, newIssue, newType)
  }

  /** F1 — `is_a_valid_row` (curator.py:1468-1535). Expects TRIMMED columns;
    * the type compared is lowercased/space-collapsed like the reference. */
  def isValidRow(id: Column, title: Column, author: Column, pubDate: Column,
      venue: Column, volume: Column, issue: Column, page: Column,
      typ: Column, publisher: Column, editor: Column): Column = {
    val t = trim(regexp_replace(lower(typ), "\\s+", " "))
    val allEmpty = Seq(id, title, author, pubDate, venue, volume, issue, page,
      typ, publisher, editor).map(empty).reduce(_ && _)
    val dateAgentTypes = Seq("book", "data file", "dataset", "dissertation",
      "edited book", "journal article", "monograph", "other", "peer review",
      "posted content", "web content", "proceedings article", "report",
      "reference book")
    val venueTypes = Seq("book chapter", "book part", "book section",
      "book track", "component", "reference entry")
    val titleOnlyTypes = Seq("book series", "book set", "journal",
      "proceedings", "proceedings series", "report series", "standard",
      "standard series")

    when(nonEmpty(id),
      // id-carrying rows: vol/issue require type and venue
      !((nonEmpty(volume) || nonEmpty(issue)) && (empty(t) || empty(venue))))
      .when(allEmpty, lit(false))
      .when(empty(t) || t.isin(dateAgentTypes: _*),
        nonEmpty(title) && nonEmpty(pubDate) && (nonEmpty(author) || nonEmpty(editor)))
      .when(t.isin(venueTypes: _*), nonEmpty(title) && nonEmpty(venue))
      .when(t.isin(titleOnlyTypes: _*), nonEmpty(title))
      .when(t === "journal volume", nonEmpty(venue) && (nonEmpty(volume) || nonEmpty(title)))
      .when(t === "journal issue", nonEmpty(venue) && (nonEmpty(issue) || nonEmpty(title)))
      .otherwise(lit(false))
  }

  /** F4 — type canonicalization (curator.py:404-419): lowercase, collapse
    * spaces, alias map, reject unknown -> "". */
  def canonicalType(typ: Column): Column = {
    val t = trim(regexp_replace(lower(typ), "\\s+", " "))
    val aliased = when(t.isin("edited book", "monograph"), lit("book"))
      .when(t.isin("report series", "standard series", "proceedings series"), lit("series"))
      .when(t === "posted content", lit("web content"))
      .otherwise(t)
    when(empty(typ), lit(""))
      .when(aliased.isin(ValidEntityTypes.toSeq: _*), aliased)
      .otherwise(lit(""))
  }

  /** F5 (first clause, curator.py:459-464): only journal article/volume/
    * issue may carry volume/issue — others lose both. */
  def dropViForNonJournal(typ: Column, volume: Column, issue: Column): (Column, Column) = {
    val keeps = typ.isin("journal article", "journal volume", "journal issue")
    val hasVi = nonEmpty(volume) || nonEmpty(issue)
    (when(!keeps && hasVi, lit("")).otherwise(volume),
      when(!keeps && hasVi, lit("")).otherwise(issue))
  }

  /** F5 (journal clause, curator.py:530-535): a `journal` with vol/issue
    * loses venue+vol+issue; `journal volume` with an issue loses both. */
  def journalViInvalidation(typ: Column, venue: Column, volume: Column, issue: Column)
      : (Column, Column, Column) = {
    val isJournalConflict = typ === "journal" && (nonEmpty(volume) || nonEmpty(issue))
    val isVolumeConflict = typ === "journal volume" && nonEmpty(issue)
    (when(isJournalConflict, lit("")).otherwise(venue),
      when(isJournalConflict || isVolumeConflict, lit("")).otherwise(volume),
      when(isJournalConflict || isVolumeConflict, lit("")).otherwise(issue))
  }
}
