package graft.plans

import org.apache.spark.unsafe.types.UTF8String

/** The full weighted bibliographic matching score
  * (`lib/bibliographic_matching.py:185-259`) as ONE static kernel over the
  * twenty metadata strings — r18 optimization of the hot verify stage.
  *
  * The Column formulation ([[graft.functions.BiblioMatch
  * .matchingScoreColumnTree]]) is a ~100-node Catalyst tree whose generated
  * code was measured at ~4.5 us/pair on q21's 1M-pair verify — ~9x the cost
  * of its three Levenshtein calls. Collapsing the tree into one JIT-friendly
  * method removes the codegen bloat while keeping every double operation in
  * the EXACT order and association of the tree (and of the DuckDB oracle
  * mirror), so scores stay bit-identical IEEE 754 doubles —
  * BiblioScoreEquivalenceSpec asserts tree == kernel on randomized inputs
  * including nulls, empties and non-ASCII.
  *
  * Null semantics: a null operand behaves exactly like an empty string
  * (every use site guards with `isNotNull && length > 0`), and the score
  * itself is never null.
  */
object BiblioScoreKernel {

  @inline private def nb(s: UTF8String): Boolean = s != null && s.numBytes > 0

  /** `lower(substring(g, 1, 1))` — Substring then Lower, the exact
    * expression pair of the column tree (both via UTF8String, so non-ASCII
    * single-char lowering matches Catalyst's). */
  @inline private def firstLower(g: UTF8String): UTF8String =
    g.substringSQL(1, 1).toLowerCase

  /** Score in the column tree's exact association order:
    * ((7*firstAuthor + 14*title) + 5*source) + 14*other. */
  def score(
      famA: UTF8String, famB: UTF8String, givA: UTF8String, givB: UTF8String,
      titleA: UTF8String, titleB: UTF8String,
      venA: UTF8String, venB: UTF8String, issnA: UTF8String, issnB: UTF8String,
      yearA: UTF8String, yearB: UTF8String, volA: UTF8String, volB: UTF8String,
      issA: UTF8String, issB: UTF8String, spA: UTF8String, spB: UTF8String,
      epA: UTF8String, epB: UTF8String): Double = {

    // first_author: 0.8 * (1 - lev/max_len) + 0.2 on matching given initials
    val fa =
      if (!nb(famA) || !nb(famB)) 0.0
      else {
        val lev = Lev.dist(famA, famB, -1)
        val maxLen = math.max(famA.numChars, famB.numChars)
        val famSim = 0.8 * (1.0 - lev.toDouble / maxLen.toDouble)
        val initial =
          if (nb(givA) && nb(givB) && firstLower(givA).equals(firstLower(givB))) 0.2
          else 0.0
        famSim + initial
      }

    // title: 1 - lev/max_len
    val ti =
      if (!nb(titleA) || !nb(titleB)) 0.0
      else {
        val lev = Lev.dist(titleA, titleB, -1)
        val maxLen = math.max(titleA.numChars, titleB.numChars)
        1.0 - lev.toDouble / maxLen.toDouble
      }

    // source: 1.0 on equal non-empty ISSNs, else the length-difference-
    // forgiving Levenshtein ratio on venue names clamped at 0
    val src =
      if (nb(issnA) && nb(issnB) && issnA.equals(issnB)) 1.0
      else if (!nb(venA) || !nb(venB)) 0.0
      else {
        val la = venA.numChars
        val lb = venB.numChars
        val lev = Lev.dist(venA, venB, -1)
        math.max(0.0, 1.0 - (lev - math.abs(la - lb)).toDouble / math.min(la, lb).toDouble)
      }

    // other: equality bonuses accumulated left-to-right like the Add chain
    @inline def eq(a: UTF8String, b: UTF8String, w: Double): Double =
      if (nb(a) && nb(b) && a.equals(b)) w else 0.0
    var other = eq(yearA, yearB, 0.1) + eq(volA, volB, 0.2)
    other = other + eq(issA, issB, 0.1)
    other = other + eq(spA, spB, 0.3)
    other = other + eq(epA, epB, 0.3)

    7.0 * fa + 14.0 * ti + 5.0 * src + 14.0 * other
  }
}
