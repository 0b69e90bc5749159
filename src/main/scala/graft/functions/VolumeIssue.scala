package graft.functions

import java.util.regex.{Matcher, Pattern}

/** E13 — `clean_volume_and_issue` (cleaner.py:418-494) and its ~40-regex
  * strategy table (master_of_regex.py:77-157), ported to Java regex.
  *
  * Porting notes:
  *  - Python compiles each pattern as `^…$` with re.IGNORECASE; here
  *    CASE_INSENSITIVE | UNICODE_CASE | UNICODE_CHARACTER_CLASS reproduces
  *    Python 3's Unicode-aware `\d`/`\s` and case folding.
  *  - bare `{`/`}` literals (the `${...}` template pattern) are escaped —
  *    Java rejects dangling brace quantifiers.
  *  - the invalid-pattern table is ORDER-SENSITIVE and the reference applies
  *    every matching pattern without breaking (last match wins for the field
  *    value, extraction output fields are overwritten per match) — the loop
  *    below replicates that exactly.
  */
object VolumeIssue {

  private val alphabets = "a-z\u00e0-\u00f6\u00f8-\u00ff\u0430-\u044f\u0391-\u03c9"
  private val goodSep = "\\-"
  private val badSep = "&\\/_,\\.:+;\\(\\[\\|"
  private val separators = goodSep + badSep

  private val vi =
    "((?:[" + alphabets + "]*\\d[" + alphabets + "\\d]*|[ivxlcdm]+)" +
      "(?:\\s?(?:[" + separators + "]|and|\\()\\s?[" + alphabets + "\\d]+\\)?)*?)"

  private val numero = "(?:\u2116|no?(?!v)\\.?|n[\u00ba\u00b0]\\.?|n[u\u00fa]m(?:[e\u00e9]ro)?|number)"
  private val year = "(\\d{4})"

  private def compile(p: String): Pattern =
    Pattern.compile("^" + p + "$",
      Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS)

  /** Ordered invalid-pattern table (master_of_regex.py:128-146). */
  private val invalidPatterns: Seq[(Pattern, String)] = Seq(
    (".*?(?:vol\\.?(?:ume)?|tome)(?:[" + separators + "]?\\s?)" + vi +
      "[\\-&\\/_,\\.:+;\\(\\)\\[\\]|\\s]*(?:" + numero + "|issues?)[" + separators + "|\\s]*" +
      "(?:sp[e\u00e9]cial\\s)?" + vi) -> "vol_iss",
    (vi + ",\\s?" + numero + "\\s?" + vi) -> "vol_iss",
    ("t\u1eadp\\s?" + vi + ",?\\s?s\u1ed1\\s?" + vi) -> "vol_iss",
    ("issues?\\s" + vi + "\\svol\\.?(?:ume)?\\s" + vi + "(?:.*?" + year + ".*?)?") -> "iss_vol_year",
    (vi + "\\s?\\(" + vi + "'" + year + "\\)") -> "vol_iss_year",
    ("cilt[" + separators + "\\s]\\s?" + vi + "[" + separators + "\\s]say\u0131[" + separators + "\\s]\\s?" + vi +
      "(?:[" + separators + "\\s]\\s?temmuz\\s" + year + ")?") -> "vol_iss_year",
    ("&na;|n\\/a|not\\savailable") -> "del",
    ("[\\:\\-\\.`\u0451/]") -> "del",
    ("\\$\\{[" + alphabets + "]+(\\.[" + alphabets + "]+)?\\}") -> "del",
    ("[&\\/_,:+;\\|`'#]\\s*" + vi) -> "all",
    ("[\\->+]" + vi) -> "do_nothing",
    (vi + "[\\.+]") -> "do_nothing",
    (numero + "?[" + separators + "]?\\s?" + vi + "[&\\/_,:;\\|`'\\(\\[\\{]") -> "all",
    (vi + "\\(\\)") -> "all",
    ("n[\ufffd?]+" + vi) -> "all",
    (vi + "(?:\u00e2\u0080[\u0092\u0093\u0094]|\ufffd+|\u00e2|\\?+)" + vi) -> "sep",
    (vi + "\\s?\\(first\\sserie") -> "s)",
  ).map { case (p, s) => (compile(p), s) }

  /** master_of_regex.py:112-115 */
  private val volumesValidPatterns: Seq[Pattern] = Seq(
    "original\\sseries,\\svolume\\s\\d+",
    "(vol(ume)?|tome|cilt)\\s?[" + separators + "]?\\s?" + vi,
  ).map(compile)

  /** master_of_regex.py:116-127 */
  private val issuesValidPatterns: Seq[Pattern] = Seq(
    "issue[\\.,]?\\s" + vi,
    "(" + vi + "\\s)?e?sp?e?(ecial)?[\\s_\\-\\.](issue)?(_number_)?[\\s_-]?(" + vi + ")?" +
      "([\"\u201c][" + alphabets + "\\s]+?[\"\u201d])?",
    "\u00f6(zel)?(\\ss(ay\u0131)?|\\(special\\))?(\\s?" + vi + ")?",
    "(" + numero + "[" + separators + "\\s]?)?hors[" + separators + "\\s]s\u00e9rie[" + separators + "\\s]" + vi,
    "\ud2b9\ubcc4\ud638",
    "([" + alphabets + "]+\\s" + year + "\\s)?\\(?(jan(uary)?|feb(ruary)?|mar(ch)?|apr(il)?|may|jun(e)?|jul(y)?|" +
      "aug(ust)?|sep(tember)?|oct(ober)?|(nov|dec)(ember)?|spring|summer|autumn|winter)(\\s" + year + ")?\\)?",
    vi + ",\\spart\\s" + vi + "\\sof\\s" + vi,
    "say\u0131[" + separators + "\\s]\\s?" + vi,
    "issues?\\s" + vi + ",\\s(supplement|part)\\s" + vi,
    "issues?\\s" + vi + "\\.?\\spp\\.\\s[a-z\\d]+[^a-z\\d]+[a-z\\d]+",
  ).map(compile)

  final case class VI(volume: String, issue: String, pubDate: String, typ: String)

  private def nz(s: String): String = if (s == null) "" else s

  /** `_fix_invalid_vi` (cleaner.py:474-494). */
  private def fixInvalid(m: Matcher, strategy: String): (String, String, String, String) = {
    val volGroup = if (strategy.contains("vol_iss")) 1 else 2
    val issGroup = if (strategy.contains("iss_vol")) 1 else 2
    var whatever: String = null
    var volume: String = null
    var issue: String = null
    var pubDate: String = null
    if (strategy.contains("vol") && strategy.contains("iss")) {
      volume = m.group(volGroup)
      issue = m.group(issGroup)
      if (strategy.contains("year")) pubDate = m.group(3)
    } else if (strategy == "all") {
      whatever = m.group(1)
    } else if (strategy == "sep") {
      whatever = nz(m.group(1)) + "-" + nz(m.group(2))
    }
    (whatever, volume, issue, pubDate)
  }

  /** `clean_volume_and_issue` (cleaner.py:418-471): returns the repaired
    * (volume, issue, pub_date, type). Fields already non-empty in the input
    * row keep precedence over extracted values; the vol<->iss switch pass
    * runs last. */
  def cleanVolumeAndIssue(volume0: String, issue0: String, pubDate0: String, type0: String): VI = {
    val row = scala.collection.mutable.Map(
      "volume" -> nz(volume0), "issue" -> nz(issue0))
    var rowDate = nz(pubDate0)
    var rowType = nz(type0)
    var outVol = ""
    var outIss = ""
    var outDate = ""
    for (field <- Seq("volume", "issue")) {
      var v = row(field)
      v = Cleaning.normalizeHyphens(v)
      v = Cleaning.normalizeSpaces(v).trim
      v = HtmlEntities.unescape(v)
      for ((pattern, strategy) <- invalidPatterns) {
        val m = pattern.matcher(v)
        if (m.find()) {
          strategy match {
            case "del" => row(field) = ""
            case "do_nothing" => row(field) = v
            case "s)" => row(field) = v + "s)"
            case _ =>
              row(field) = ""
              val (whatever, vol, iss, date) = fixInvalid(m, strategy)
              if (whatever != null && whatever.nonEmpty) row(field) = whatever
              outVol = if (vol != null && vol.nonEmpty) vol else ""
              outIss = if (iss != null && iss.nonEmpty) iss else ""
              outDate = if (date != null && date.nonEmpty) date else ""
          }
        }
      }
    }
    if (row("volume").isEmpty) row("volume") = outVol
    if (row("issue").isEmpty) row("issue") = outIss
    if (rowDate.isEmpty) rowDate = outDate

    var switchVol = ""
    var switchIss = ""
    for (field <- Seq("volume", "issue")) {
      val v = row(field)
      for (p <- volumesValidPatterns)
        if (p.matcher(v).find() && field == "issue") switchVol = v
      for (p <- issuesValidPatterns)
        if (p.matcher(v).find() && field == "volume") switchIss = v
    }
    if (switchVol.nonEmpty && switchIss.nonEmpty) {
      row("volume") = switchVol
      row("issue") = switchIss
    } else if (switchVol.nonEmpty && row("volume").isEmpty) {
      row("volume") = switchVol
      row("issue") = ""
      if (rowType == "journal issue") rowType = "journal volume"
    } else if (switchIss.nonEmpty && row("issue").isEmpty) {
      row("issue") = switchIss
      row("volume") = ""
      if (rowType == "journal volume") rowType = "journal issue"
    }
    VI(row("volume"), row("issue"), rowDate, rowType)
  }
}
