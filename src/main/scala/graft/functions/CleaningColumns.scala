package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level API over the [[Cleaning]] kernel.
  *
  * Functions that are pure character translations (E1/E2/E16) are built from
  * codegen'd built-ins (`translate`, `regexp_replace`) so they stay inside
  * whole-stage codegen; the semantically rich cleaners (title/name/date/id,
  * E13 vol-iss) wrap the Scala kernel as UDFs — correct first, with the
  * Catalyst-`Expression` upgrade path noted in SURVEY §7.3 reserved for the
  * profiler-proven hot ones.
  */
object CleaningColumns {

  /** E1 — codegen'd: one `translate` call. */
  def normalizeHyphensCol(c: Column): Column =
    translate(c, Cleaning.HyphenVariants, "-" * Cleaning.HyphenVariants.length)

  /** E2 — codegen'd: `translate` + literal replace of "&nbsp;". */
  def normalizeSpacesCol(c: Column): Column =
    regexp_replace(
      translate(c, Cleaning.SpaceVariants, " " * Cleaning.SpaceVariants.length),
      "&nbsp;", " ")

  /** E16 — codegen'd: control/extended-ASCII to space, collapse. */
  def removeAsciiCol(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(c, "[\\x00-\\x1f\\x7f\\x80-\\xff]", " "), "\\s+", " "))

  // UDF-backed cleaners (null-safe: null in -> null out).
  private def stringUdf(f: String => String) =
    udf((s: String) => if (s == null) null else f(s))

  val cleanTitleUdf = stringUdf(Cleaning.cleanTitle)
  val cleanDateUdf = stringUdf(Cleaning.cleanDate)
  val cleanNameUdf = stringUdf(Cleaning.cleanName)
  val cleanAgentNameUdf = stringUdf(Cleaning.cleanAgentName)
  val normalizeRaNameUdf = stringUdf(Cleaning.normalizeRaName)
  val normalizeIdUdf = udf((s: String) =>
    if (s == null) None else Cleaning.normalizeId(s))
  val cleanRaListUdf = udf((xs: Seq[String]) =>
    if (xs == null) null else Cleaning.cleanRaList(xs))
  val splitNameAndIdsUdf = udf((s: String) =>
    if (s == null) None else { val (n, i) = Cleaning.splitNameAndIds(s); Some((n, i)) })
  /** E13 — returns struct(volume, issue, pub_date, type). */
  val cleanVolumeIssueUdf = udf(
    (v: String, i: String, d: String, t: String) => {
      val r = VolumeIssue.cleanVolumeAndIssue(v, i, d, t)
      (r.volume, r.issue, r.pubDate, r.typ)
    })

  def cleanTitleCol(c: Column): Column = cleanTitleUdf(c)
  def cleanDateCol(c: Column): Column = cleanDateUdf(c)
  def cleanNameCol(c: Column): Column = cleanNameUdf(c)
  def cleanAgentNameCol(c: Column): Column = cleanAgentNameUdf(c)
  def normalizeIdCol(c: Column): Column = normalizeIdUdf(c)

  /** E11 — `split_identifiers` (curator.py:250-251): collapse ": " to ":",
    * split on whitespace into an array of id tokens. */
  def splitIdentifiersCol(c: Column): Column =
    filter(split(regexp_replace(c, ":\\s+", ":"), "\\s+"), x => length(x) > lit(0))

  /** People-field splitter: `;` outside brackets separates agents
    * (master_of_regex.py:8). Spark's split supports lookahead regexes. */
  def splitPeopleCol(c: Column): Column =
    filter(split(c, "\\s*;\\s*(?=[^\\]]*(?:\\[|$))"), x => length(x) > lit(0))

  /** E22 — page-range build (finder.py:410-429): single-sided ranges are
    * duplicated ("57" -> "57-57"). */
  def pageRangeCol(start: Column, end: Column): Column = {
    val s = coalesce(start, end)
    val e = coalesce(end, start)
    when(s.isNull && e.isNull, lit(null))
      .otherwise(concat_ws("-", s, e))
  }

  /** E17 — date literal precision (creator.py:296-301). */
  def dateDatatypeCol(cleanDate: Column): Column =
    when(length(cleanDate) === 4, lit("http://www.w3.org/2001/XMLSchema#gYear"))
      .when(length(cleanDate) === 7, lit("http://www.w3.org/2001/XMLSchema#gYearMonth"))
      .when(length(cleanDate) === 10, lit("http://www.w3.org/2001/XMLSchema#date"))
      .otherwise(lit(null))

  /** E19 — full venue-type inference, the complete branch set of
    * `creator.py:393-431` (`get_venue_type(br_type, venue_ids)`): a base
    * type from the child BR's type, then — only when the venue carries at
    * least one non-omid identifier — the scheme cross-check that demotes
    * contradictory combinations to undecidable ("") or, for reference
    * books, re-decides between reference book and journal. Pure codegen'd
    * column logic (no UDF).
    *
    * @param brType the (cleaned) type of the row's BR
    * @param venueIds the venue's id tokens (`scheme:value`, omid included)
    */
  def venueTypeCol(brType: Column, venueIds: Column): Column = {
    val ids = coalesce(venueIds, array())
    val schemes = array_distinct(transform(ids, i => substring_index(i, ":", 1)))
    val hasExternal = exists(ids, i => !i.startsWith("omid:"))
    val issn = array_contains(schemes, "issn")
    val isbn = array_contains(schemes, "isbn")
    val base =
      when(brType.isin("journal article", "journal volume", "journal issue"), "journal")
        .when(brType.isin("book chapter", "book part", "book section", "book track"), "book")
        .when(brType.isin("book", "edited book", "monograph", "reference book"), "book series")
        .when(brType === "proceedings article", "proceedings")
        .when(brType.isin("proceedings", "report", "standard", "series"), "series")
        .when(brType === "reference entry", "reference book")
        .when(brType === "report series", "report series")
        .otherwise("")
    when(!hasExternal, base).otherwise(
      when(base.isin("journal", "book series", "series", "report series"),
        when(isbn || !issn, lit("")).otherwise(base))
        .when(base.isin("book", "proceedings"),
          when(issn || !isbn, lit("")).otherwise(base))
        .when(base === "reference book",
          when(issn && isbn, lit(""))
            .when(issn && !isbn, lit("journal"))
            .otherwise(lit("reference book")))
        .otherwise(base))
  }
}
