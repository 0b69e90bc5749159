package graft.functions

import java.util.regex.Pattern

/** Minimal HTML entity decoder mirroring Python's `html.unescape` for the
  * entity classes that occur in bibliographic agent names (Latin-1 accented
  * letters, the core XML set, and numeric references).
  *
  * Python's `html.unescape` also decodes *semicolon-less* named references
  * for the HTML5 legacy subset (e.g. "Andr&eacute" → "André",
  * cleaner_test.py golden) — reproduced here by matching the longest known
  * entity name prefix when no ';' terminates the reference.
  */
object HtmlEntities {

  private val named: Map[String, String] = {
    val accents = Map(
      "grave" -> Map('a' -> "à", 'e' -> "è", 'i' -> "ì", 'o' -> "ò", 'u' -> "ù",
        'A' -> "À", 'E' -> "È", 'I' -> "Ì", 'O' -> "Ò", 'U' -> "Ù"),
      "acute" -> Map('a' -> "á", 'e' -> "é", 'i' -> "í", 'o' -> "ó", 'u' -> "ú",
        'y' -> "ý", 'A' -> "Á", 'E' -> "É", 'I' -> "Í", 'O' -> "Ó", 'U' -> "Ú", 'Y' -> "Ý"),
      "circ" -> Map('a' -> "â", 'e' -> "ê", 'i' -> "î", 'o' -> "ô", 'u' -> "û",
        'A' -> "Â", 'E' -> "Ê", 'I' -> "Î", 'O' -> "Ô", 'U' -> "Û"),
      "uml" -> Map('a' -> "ä", 'e' -> "ë", 'i' -> "ï", 'o' -> "ö", 'u' -> "ü",
        'y' -> "ÿ", 'A' -> "Ä", 'E' -> "Ë", 'I' -> "Ï", 'O' -> "Ö", 'U' -> "Ü"),
      "tilde" -> Map('a' -> "ã", 'n' -> "ñ", 'o' -> "õ", 'A' -> "Ã", 'N' -> "Ñ", 'O' -> "Õ"),
      "ring" -> Map('a' -> "å", 'A' -> "Å"),
      "slash" -> Map('o' -> "ø", 'O' -> "Ø"),
      "cedil" -> Map('c' -> "ç", 'C' -> "Ç"),
    )
    val latin1 = for {
      (suffix, byLetter) <- accents
      (letter, repl) <- byLetter
    } yield s"$letter$suffix" -> repl
    latin1 ++ Map(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
      "nbsp" -> " ", "szlig" -> "ß", "aelig" -> "æ", "AElig" -> "Æ",
      "oelig" -> "œ", "OElig" -> "Œ", "eth" -> "ð", "ETH" -> "Ð",
      "thorn" -> "þ", "THORN" -> "Þ", "ndash" -> "–", "mdash" -> "—",
      "hellip" -> "…", "rsquo" -> "’", "lsquo" -> "‘",
      "rdquo" -> "”", "ldquo" -> "“", "deg" -> "°", "middot" -> "·",
      "copy" -> "©", "reg" -> "®", "trade" -> "™", "sect" -> "§",
    )
  }

  // Longest names first so prefix matching picks the longest legal entity.
  private val namesByLength: Seq[String] = named.keys.toSeq.sortBy(-_.length)

  private val entityRef = Pattern.compile("&(#[xX]?[0-9a-fA-F]+;?|[a-zA-Z][a-zA-Z0-9]*;?)")

  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val m = entityRef.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start)
      val body = m.group(1)
      val repl: String =
        if (body.startsWith("#")) {
          val digits = body.stripSuffix(";").substring(1)
          try {
            val cp =
              if (digits.startsWith("x") || digits.startsWith("X"))
                Integer.parseInt(digits.substring(1), 16)
              else Integer.parseInt(digits)
            if (Character.isValidCodePoint(cp) && cp != 0) new String(Character.toChars(cp))
            else m.group(0)
          } catch { case _: Exception => m.group(0) }
        } else if (body.endsWith(";")) {
          named.get(body.stripSuffix(";")) match {
            case Some(r) => r
            case None => m.group(0)
          }
        } else {
          // Python html.unescape: semicolon-less legacy entities decode by
          // longest matching name prefix; the unmatched tail is kept.
          namesByLength.find(body.startsWith) match {
            case Some(n) => named(n) + body.substring(n.length)
            case None => m.group(0)
          }
        }
      sb.append(repl)
      last = m.end
    }
    sb.append(s, last, s.length)
    sb.toString
  }
}
