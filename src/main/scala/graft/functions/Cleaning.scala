package graft.functions

import java.util.regex.Pattern

/** Pure string-cleaning kernel of the curation engine.
  *
  * Re-expresses the reference's field-cleaning semantics
  * (`oc_meta/lib/cleaner.py`, `oc_meta/lib/master_of_regex.py`) as pure
  * Scala — no Spark dependency, so the same code backs both the Column/UDF
  * layer (see [[CleaningColumns]]) and plain unit tests ported from the
  * reference's `test/cleaner_test.py` goldens.
  *
  * Everything here is deliberately allocation-light and deterministic: these
  * functions run once per cell inside whole-stage-codegen'd UDF calls over
  * billions of rows.
  */
object Cleaning {

  /** E1 — `normalize_hyphens` (cleaner.py:73-127): 12 Unicode dash variants
    * to HYPHEN-MINUS. */
  val HyphenVariants: String =
    "\u00ad\u06d4\u2010\u2011\u2012\u2013\u2014\u2043\u2212\u2796\u2cba\ufe58"

  def normalizeHyphens(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(if (HyphenVariants.indexOf(c) >= 0) '-' else c)
      i += 1
    }
    sb.toString
  }

  /** E2 — `normalize_spaces` (cleaner.py:130-159): 7 Unicode space variants
    * plus literal "&nbsp;" to plain space. */
  val SpaceVariants: String =
    "\u0009\u00a0\u200b\u202f\u2003\u2005\u2009"

  def normalizeSpaces(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(if (SpaceVariants.indexOf(c) >= 0) ' ' else c)
      i += 1
    }
    sb.toString.replace("&nbsp;", " ")
  }

  /** Python-style "cased" predicate: upper-, lower- or titlecase letter. */
  @inline private def isCased(c: Char): Boolean =
    Character.isUpperCase(c) || Character.isLowerCase(c) || Character.isTitleCase(c)

  /** Python `str.title()`: first cased char of each cased run titlecased,
    * the rest lowercased; uncased chars are boundaries. */
  def pyTitle(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isCased(c)) {
        sb.append(if (prevCased) Character.toLowerCase(c) else Character.toTitleCase(c))
        prevCased = true
      } else {
        sb.append(c)
        prevCased = false
      }
      i += 1
    }
    sb.toString
  }

  /** Python `str.isupper()`: at least one cased char, all cased chars upper. */
  def pyIsUpper(s: String): Boolean = {
    var any = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLowerCase(c) || Character.isTitleCase(c)) return false
      if (Character.isUpperCase(c)) any = true
      i += 1
    }
    any
  }

  /** E3 — `clean_title` (cleaner.py:162-180): smart title-case. All-caps
    * titles are lowered first; words containing any uppercase are kept
    * verbatim (acronym rule — `initcap` would be wrong). Whitespace is
    * collapsed. */
  def cleanTitle(s: String): String = {
    val t = if (pyIsUpper(s)) s.toLowerCase else s
    t.split("\\s+").filter(_.nonEmpty).map { w =>
      if (w.exists(Character.isUpperCase)) w else pyTitle(w)
    }.mkString(" ")
  }

  private val IsoDate = Pattern.compile("^\\s*(\\d{4})(?:-(\\d{1,2})(?:-(\\d{1,2}))?)?\\s*$")

  /** E4 — `clean_date` (cleaner.py:183-239): precision-preserving date
    * validation. Invalid day truncates to YYYY-MM, invalid month to YYYY,
    * unparseable to "". The reference's dateutil double-parse trick detects
    * which fields were present; here the ISO shape is matched directly
    * (the curator normalizes hyphens first, and the reference itself
    * rejects non-4-digit years — e.g. "11", "02-11" → ""). */
  def cleanDate(s: String): String = {
    val m = IsoDate.matcher(s)
    if (!m.find()) return ""
    val year = m.group(1).toInt
    if (year < 1 || year > 9999) return ""
    val y = f"$year%04d"
    val moS = m.group(2)
    if (moS == null) return y
    val mo = moS.toInt
    if (mo < 1 || mo > 12) return y
    val dS = m.group(3)
    if (dS == null) return f"$y-$mo%02d"
    val d = dS.toInt
    val maxDay =
      try java.time.YearMonth.of(year, mo).lengthOfMonth()
      catch { case _: Exception => 0 }
    if (d < 1 || d > maxDay) f"$y-$mo%02d" else f"$y-$mo%02d-$d%02d"
  }

  /** E5 — `clean_name` (cleaner.py:242-265): `Surname, Given` with both
    * parts word-wise smart-titled; surname-less comma names collapse to "". */
  def cleanName(s: String): String = {
    if (s.contains(",")) {
      val parts = s.split("\\s*,\\s*", -1)
      val surname = parts(0).split("\\s+").filter(_.nonEmpty).map(cleanTitle).mkString(" ")
      val given =
        if (parts.length > 1) parts(1).split("\\s+").filter(_.nonEmpty).map(cleanTitle).mkString(" ")
        else ""
      if (surname.nonEmpty) s"$surname, $given" else ""
    } else {
      s.split("\\s+").filter(_.nonEmpty).map(cleanTitle).mkString(" ")
    }
  }

  /** E6 — `clean_agent_name` (cleaner.py:268-290): drop `[ ] ; ?`, keep '.'
    * only when preceded by a letter (in the ORIGINAL string), collapse
    * whitespace, decode HTML entities, normalize hyphens. */
  def cleanAgentName(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.') {
        if (i > 0 && Character.isLetter(s.charAt(i - 1))) sb.append(c)
      } else if (c != '[' && c != ']' && c != ';' && c != '?') sb.append(c)
      i += 1
    }
    val collapsed = sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
    normalizeHyphens(HtmlEntities.unescape(collapsed))
  }

  /** E7 — `_normalize_ra_name` (cleaner.py:293-317): canonical RA name —
    * "", "Full Name", "Last, First" or "Last, " with 'Not Available'
    * scrubbing. */
  def normalizeRaName(raw: String): String = {
    val name = raw.trim
    if (name.isEmpty) return ""
    val ci = name.indexOf(',')
    if (ci >= 0) {
      var last = name.substring(0, ci).trim
      var first = name.substring(ci + 1).trim
      if (last.toLowerCase == "not available") last = ""
      if (first.toLowerCase == "not available") first = ""
      if (last.isEmpty) "" else if (first.nonEmpty) s"$last, $first" else s"$last, "
    } else {
      val cleaned = cleanAgentName(name)
      if (cleaned.toLowerCase == "not available") "" else cleaned
    }
  }

  // E10 — `split_name_and_ids` (master_of_regex.py:35-63). The name is lazy
  // so the FIRST '[ids]' block wins; id tokens exclude brackets on both
  // sides of the colon.
  private val IdToken = "[^\\s\\[\\]]+:[^\\s\\[\\]]+"
  private val NameAndIds = Pattern.compile(
    "\\s*(.*?)(?:\\s*\\[\\s*((?:" + IdToken + ")?(?:\\s+" + IdToken + ")*)\\s*\\]|\\s*\\z)",
    Pattern.DOTALL)

  /** E10 — parse `Name [id id]` into (name, ids-string). The pattern matches
    * any input by construction. */
  def splitNameAndIds(s: String): (String, String) = {
    val m = NameAndIds.matcher(s)
    if (!m.lookingAt()) throw new IllegalStateException(s"RE_NAME_AND_IDS failed on: $s")
    (m.group(1), Option(m.group(2)).getOrElse(""))
  }

  /** E8 — `clean_ra_list` (cleaner.py:320-370): per-row agent-list cleanup.
    * Phase 1 parses and normalizes; phase 2 drops ids shared by >1 distinct
    * agent key ("a shared id can't identify"); phase 3 drops later
    * duplicates sharing a name and >=1 surviving id. Order-preserving. */
  def cleanRaList(ras: Seq[String]): Seq[String] = {
    import scala.collection.mutable
    final case class Parsed(key: String, name: String, ids: Seq[String])
    val parsed = mutable.ArrayBuffer.empty[Parsed]
    val agentIds = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[String]]
    for (ra <- ras) {
      val (rawName, idsStr) = splitNameAndIds(ra)
      val name = normalizeRaName(rawName)
      val ids = idsStr.split("\\s+").filter(_.nonEmpty).toSeq
      if (name.nonEmpty || ids.nonEmpty) {
        val key = if (name.nonEmpty) name else ra
        parsed += Parsed(key, name, ids)
        if (ids.nonEmpty)
          agentIds.getOrElseUpdate(key, mutable.LinkedHashSet.empty) ++= ids
      }
    }
    val occurrences = mutable.HashMap.empty[String, Int]
    for (bucket <- agentIds.values; id <- bucket)
      occurrences(id) = occurrences.getOrElse(id, 0) + 1
    val shared = occurrences.collect { case (id, n) if n > 1 => id }.toSet

    val out = mutable.ArrayBuffer.empty[String]
    val seenIdsByName = mutable.HashMap.empty[String, mutable.HashSet[String]]
    for (Parsed(_, name, ids) <- parsed) {
      val kept = ids.filterNot(shared)
      if (name.isEmpty) {
        out += s"[${kept.mkString(" ")}]"
      } else {
        val keptSet = kept.toSet
        val prior = seenIdsByName.get(name)
        if (!(prior.isDefined && prior.get.exists(keptSet))) {
          seenIdsByName.getOrElseUpdate(name, mutable.HashSet.empty) ++= keptSet
          out += (if (kept.nonEmpty) s"$name [${kept.mkString(" ")}]" else name)
        }
      }
    }
    out.toSeq
  }

  /** E16 — `remove_ascii` (cleaner.py:497-499): control chars (0x00-0x1F,
    * 0x7F) and extended ASCII (0x80-0xFF) to space, collapse whitespace. */
  def removeAscii(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(if (c < 0x20 || (c >= 0x7f && c <= 0xff)) ' ' else c)
      i += 1
    }
    sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  // ---- E9: identifier validation / normalization (cleaner.py:373-415) ----
  // The reference delegates to oc_ds_converter.oc_idmanager; the validators
  // below implement the same public algorithms: DOI syntax, ISBN-10/13
  // checksums, ISSN mod-11 checksum (0000-0000 banned, constants.py:10),
  // ORCID ISO-7064 11,2 checksum.

  private val DoiSyntax = Pattern.compile("^10\\.(\\d{4,9}|[^\\s/]+(\\.[^\\s/]+)*)/\\S+$")

  def normalizeDoi(value: String): Option[String] = {
    var v = value.trim.toLowerCase
    for (p <- Seq("https://doi.org/", "http://doi.org/", "https://dx.doi.org/",
        "http://dx.doi.org/", "doi.org/", "doi:", "doi "))
      if (v.startsWith(p)) v = v.substring(p.length)
    v = v.trim
    if (DoiSyntax.matcher(v).matches()) Some(s"doi:$v") else None
  }

  def normalizeIsbn(value: String): Option[String] = {
    val v = value.replaceAll("[-  ]", "")
    if (v.length == 10 && v.substring(0, 9).forall(_.isDigit)) {
      val last = v.charAt(9)
      if (!last.isDigit && last != 'X' && last != 'x') return None
      var sum = 0
      for (i <- 0 until 9) sum += (10 - i) * (v.charAt(i) - '0')
      sum += (if (last == 'X' || last == 'x') 10 else last - '0')
      if (sum % 11 == 0) Some(s"isbn:${v.toUpperCase}") else None
    } else if (v.length == 13 && v.forall(_.isDigit)) {
      var sum = 0
      for (i <- 0 until 13) sum += (if (i % 2 == 0) 1 else 3) * (v.charAt(i) - '0')
      if (sum % 10 == 0) Some(s"isbn:$v") else None
    } else None
  }

  def normalizeIssn(value: String): Option[String] = {
    val v = value.replaceAll("[-– ]", "").toUpperCase
    if (v.length != 8) return None
    if (!v.substring(0, 7).forall(_.isDigit)) return None
    val last = v.charAt(7)
    if (!last.isDigit && last != 'X') return None
    var sum = 0
    for (i <- 0 until 7) sum += (8 - i) * (v.charAt(i) - '0')
    val check = (11 - sum % 11) % 11
    val expect = if (check == 10) 'X' else ('0' + check).toChar
    val norm = v.substring(0, 4) + "-" + v.substring(4)
    if (norm == "0000-0000") None // forbidden (constants.py:10)
    else if (last == expect) Some(s"issn:$norm") else None
  }

  def normalizeOrcid(value: String): Option[String] = {
    var v = value.trim.toUpperCase
    for (p <- Seq("HTTPS://ORCID.ORG/", "HTTP://ORCID.ORG/", "ORCID.ORG/"))
      if (v.startsWith(p)) v = v.substring(p.length)
    val digits = v.replace("-", "")
    if (digits.length != 16) return None
    if (!digits.substring(0, 15).forall(_.isDigit)) return None
    val last = digits.charAt(15)
    if (!last.isDigit && last != 'X') return None
    var total = 0
    for (i <- 0 until 15) total = (total + (digits.charAt(i) - '0')) * 2
    val rem = total % 11
    val check = (12 - rem) % 11
    val expect = if (check == 10) 'X' else ('0' + check).toChar
    if (last != expect) return None
    Some(s"orcid:${digits.grouped(4).mkString("-")}")
  }

  /** E9 — `normalize_id`: schema-dispatched validate+normalize; unknown
    * schemas pass through lowercased-schema; invalid ids yield None. */
  def normalizeId(s: String): Option[String] = {
    val ci = s.indexOf(':')
    if (ci < 0) return None
    val schema = s.substring(0, ci).toLowerCase
    val value = s.substring(ci + 1)
    schema match {
      case "doi" => normalizeDoi(value)
      case "isbn" => normalizeIsbn(value)
      case "issn" => normalizeIssn(value)
      case "orcid" => normalizeOrcid(value)
      case _ => Some(s"$schema:$value")
    }
  }

  /** E21 — full-name construction (finder.py:301-311). */
  def buildFullName(name: String, family: String, given: String): String =
    if (name.nonEmpty) name
    else if (family.nonEmpty && given.nonEmpty) s"$family, $given"
    else if (family.nonEmpty) s"$family, "
    else if (given.nonEmpty) s", $given"
    else ""
}
