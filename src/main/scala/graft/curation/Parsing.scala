package graft.curation

import org.apache.spark.sql.functions.udf
import graft.functions.Cleaning

/** Micro-syntax parsers for the 11-column bibliographic CSV (SURVEY §1.2):
  * id-list cells, `Name [id id]` people cells, venue cells. Pure Scala
  * kernels wrapped as UDFs; the heavy regex work happens once per cell.
  */
object Parsing {

  /** E12 — `clean_id_list` (curator.py:744-780) fresh-world flavor:
    * hyphen-normalize, validate via E9, order-preserving dedup. `omid:`
    * tokens are separated out (returned first element); in a fresh store
    * they cannot resolve, so callers treat rows with unknown omids per
    * D2(2).
    *
    * `temp:` identifiers are KEPT here (F7): the reference's
    * `normalize_id` (cleaner.py:373-415) passes unknown schemas through,
    * so temp ids participate in deduplication exactly like external ids —
    * two rows sharing `temp:789` curate to ONE entity
    * (meta_process_test.py test_temporary_identifiers_deduplication) —
    * and only the RDF emission layer skips them (creator.py:629-631;
    * mirrored at Curator's `entityIds` feed). */
  def cleanIdList(tokens: Seq[String]): (Option[String], Seq[String]) = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    var omid: Option[String] = None
    for (tok0 <- tokens; tok = Cleaning.normalizeHyphens(tok0.trim) if tok.nonEmpty) {
      if (tok.toLowerCase.startsWith("omid:")) {
        // LAST omid wins: the reference's clean_id_list overwrites
        // `metaid` on every omid token (curator.py:769-770), so a
        // pathological multi-omid cell resolves to its final token
        omid = Some(tok.substring(5))
      } else {
        Cleaning.normalizeId(tok).foreach(seen += _)
      }
    }
    (omid, seen.toSeq)
  }

  /** E11 — the reference collapses spaces around the colon on BOTH sides
    * (`RE_COLON_AND_SPACES = \s*:\s*`, master_of_regex.py:16) before
    * splitting, so "vIAF : 123" tokenizes as one id. */
  private[graft] def splitIdTokens(s: String): Seq[String] =
    s.replaceAll("\\s*:\\s*", ":").split("\\s+").toSeq.filter(_.nonEmpty)

  /** E11 + E12 over a raw id cell. */
  def parseIdCell(cell: String): Seq[String] = {
    if (cell == null || cell.trim.isEmpty) return Seq.empty
    cleanIdList(splitIdTokens(cell))._2
  }

  /** @param omid explicit `omid:` token ("ra/N"), if any — resolvable only
    *   against a store (D2(1)); discarded in fresh-world curation. */
  final case class Agent(name: String, ids: Seq[String], omid: Option[String])

  /** People-cell parser: split on `;` outside brackets
    * (master_of_regex.py:8), E8 clean_ra_list, then per agent E10
    * split_name_and_ids + E5 clean_name + E12 id cleaning. */
  def parseAgents(cell: String): Seq[Agent] = {
    if (cell == null || cell.trim.isEmpty) return Seq.empty
    val raw = cell.split("\\s*;\\s*(?=[^\\]]*(?:\\[|$))").toSeq.filter(_.nonEmpty)
    val cleaned = Cleaning.cleanRaList(raw)
    cleaned.map { ra =>
      val (rawName, idsStr) = Cleaning.splitNameAndIds(ra)
      val name = Cleaning.cleanName(rawName)
      val (omid, ids) = cleanIdList(splitIdTokens(idsStr))
      Agent(name, ids, omid)
    }.filter(a => a.name.nonEmpty || a.ids.nonEmpty || a.omid.nonEmpty)
  }

  final case class Venue(name: String, ids: Seq[String], omid: Option[String])

  /** Venue-cell parser (curator.py:481-517): `Title [ids]`; the title is
    * kept verbatim (normalize_titles defaults to false in the reference
    * settings) minus surrounding whitespace. */
  def parseVenue(cell: String): Option[Venue] = {
    if (cell == null || cell.trim.isEmpty) return None
    val (rawName, idsStr) = Cleaning.splitNameAndIds(cell.trim)
    val (omid, ids) = cleanIdList(splitIdTokens(idsStr))
    val name = if (rawName.trim.nonEmpty) rawName.trim else cell.trim
    Some(Venue(name, ids, omid))
  }

  val parseIdCellUdf = udf(parseIdCell _)

  /** Explicit `omid:` token of an id cell (D2(1)/(2) input), as "br/N". */
  def explicitOmid(cell: String): Option[String] = {
    if (cell == null || cell.trim.isEmpty) return None
    cleanIdList(splitIdTokens(cell))._1
  }
  val explicitOmidUdf = udf((c: String) => explicitOmid(c))
  val parseAgentsUdf = udf((c: String) => parseAgents(c).map(a => (a.name, a.ids, a.omid)))
  val parseVenueUdf = udf((c: String) => parseVenue(c).map(v => (v.name, v.ids, v.omid)))
  val cleanDateUdf = udf((c: String) =>
    if (c == null) "" else Cleaning.cleanDate(Cleaning.normalizeHyphens(c)))
  val normalizeHyphensUdf = udf((c: String) =>
    if (c == null) "" else Cleaning.normalizeHyphens(c))
  val cleanVolumeIssueUdf = udf((v: String, i: String, d: String, t: String) => {
    val r = graft.functions.VolumeIssue.cleanVolumeAndIssue(v, i, d, t)
    (r.volume, r.issue, r.pubDate, r.typ)
  })
}
