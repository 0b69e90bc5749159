package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** G6/J12/D11 — the reference's weighted bibliographic matching score
  * (`lib/bibliographic_matching.py:185-259`), as pure column arithmetic:
  * no UDF, fully codegen'd, usable as the verify stage after any blocking
  * or LSH candidate join.
  *
  *   score = 7·first_author + 14·title + 5·source + 14·other
  *
  *  - first_author: 0.8·(1 − lev(family)/max_len) + 0.2 if the given-name
  *    initials match; 0 when either family is empty
  *    (`_score_first_author`, :203-217).
  *  - title: 1 − lev/max_len; 0 when either empty (`_score_title`).
  *  - source: 1.0 on equal non-empty ISSNs, else a length-difference-
  *    forgiving Levenshtein ratio on venue names clamped at 0
  *    (`_score_source`, :228-239).
  *  - other: +0.1 year, +0.2 volume, +0.1 issue, +0.3 start page,
  *    +0.3 end page, each on non-empty equality (`_score_other`).
  *
  * All double arithmetic is written in the same association order as the
  * DuckDB oracle mirror so both engines produce bit-identical IEEE 754
  * results (see operators/RelationalQueries.scala determinism rules).
  */
object BiblioMatch {

  /** The reference's acceptance threshold (`MATCHING_THRESHOLD`, :40). */
  val MatchingThreshold: Double = 25.0

  private def nb(c: Column): Column = c.isNotNull && length(c) > 0

  // bit-parallel Myers kernel, same code-point semantics as the built-in
  // levenshtein (LevSpec) but O(text) word ops — the score's hot path
  private def lev(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.lev(a, b)

  private def levRatio(a: Column, b: Column): Column =
    lit(1.0) - lev(a, b).cast("double") /
      greatest(length(a), length(b)).cast("double")

  def scoreFirstAuthor(famA: Column, famB: Column, givA: Column, givB: Column): Column = {
    val famSim = lit(0.8) * levRatio(famA, famB)
    val initial = when(nb(givA) && nb(givB) &&
      lower(substring(givA, 1, 1)) === lower(substring(givB, 1, 1)), lit(0.2))
      .otherwise(lit(0.0))
    when(!nb(famA) || !nb(famB), lit(0.0)).otherwise(famSim + initial)
  }

  def scoreTitle(a: Column, b: Column): Column =
    when(!nb(a) || !nb(b), lit(0.0)).otherwise(levRatio(a, b))

  def scoreSource(venA: Column, venB: Column, issnA: Column, issnB: Column): Column =
    when(nb(issnA) && nb(issnB) && issnA === issnB, lit(1.0))
      .when(!nb(venA) || !nb(venB), lit(0.0))
      .otherwise(greatest(lit(0.0), lit(1.0) -
        (lev(venA, venB) - abs(length(venA) - length(venB))).cast("double") /
          least(length(venA), length(venB)).cast("double")))

  private def eqTerm(a: Column, b: Column, w: Double): Column =
    when(nb(a) && nb(b) && a === b, lit(w)).otherwise(lit(0.0))

  /** year/volume/issue/page equality bonuses, summed in the reference's
    * accumulation order. */
  def scoreOther(yearA: Column, yearB: Column, volA: Column, volB: Column,
      issA: Column, issB: Column, spA: Column, spB: Column,
      epA: Column, epB: Column): Column =
    eqTerm(yearA, yearB, 0.1) + eqTerm(volA, volB, 0.2) + eqTerm(issA, issB, 0.1) +
      eqTerm(spA, spB, 0.3) + eqTerm(epA, epB, 0.3)

  /** Full weighted score. Args mirror the reference's metadata dict; all
    * text columns are expected pre-lowercased (the reference lowercases at
    * metadata extraction, `_extract_metadata`, :167-178).
    *
    * r18: evaluates through the single-expression kernel
    * ([[graft.plans.BiblioScoreKernel]]) — the equivalent ~100-node column
    * tree ([[matchingScoreColumnTree]]) generated ~4.5 us/pair of codegen
    * overhead on q21's 1M-pair verify, ~9x the cost of its three
    * Levenshtein kernels. Scores are bit-identical
    * (BiblioScoreEquivalenceSpec pins kernel == tree on randomized inputs;
    * the q21/q22/q60 DuckDB hash oracles gate the end-to-end chain). */
  def matchingScore(
      famA: Column, famB: Column, givA: Column, givB: Column,
      titleA: Column, titleB: Column,
      venA: Column, venB: Column, issnA: Column, issnB: Column,
      yearA: Column, yearB: Column, volA: Column, volB: Column,
      issA: Column, issB: Column, spA: Column, spB: Column,
      epA: Column, epB: Column): Column =
    graft.plans.VectorExpressions.biblioScore(Seq(
      famA, famB, givA, givB, titleA, titleB, venA, venB, issnA, issnB,
      yearA, yearB, volA, volB, issA, issB, spA, spB, epA, epB))

  /** The pre-r18 Column-tree formulation, kept as the kernel's executable
    * specification (BiblioScoreEquivalenceSpec asserts bit-identical
    * doubles between this and [[matchingScore]]); the arithmetic below is
    * the association-order contract the DuckDB oracle mirror copies. */
  private[graft] def matchingScoreColumnTree(
      famA: Column, famB: Column, givA: Column, givB: Column,
      titleA: Column, titleB: Column,
      venA: Column, venB: Column, issnA: Column, issnB: Column,
      yearA: Column, yearB: Column, volA: Column, volB: Column,
      issA: Column, issB: Column, spA: Column, spB: Column,
      epA: Column, epB: Column): Column =
    lit(7) * scoreFirstAuthor(famA, famB, givA, givB) +
      lit(14) * scoreTitle(titleA, titleB) +
      lit(5) * scoreSource(venA, venB, issnA, issnB) +
      lit(14) * scoreOther(yearA, yearB, volA, volB, issA, issB, spA, spB, epA, epB)
}
