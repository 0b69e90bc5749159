package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** r18: final-sort materialization for answer-mass results.
  *
  * Every registered query ends in a total `orderBy` (the determinism
  * contract with the DuckDB oracle). A global sort is a range exchange,
  * and Spark's RangePartitioner runs a SAMPLING job over the sort's child
  * to pick partition boundaries — re-executing the entire narrow pipeline
  * above the last exchange a SECOND time. For the quadratic verify stages
  * that means re-paying the whole candidate join + kernel pass: measured
  * at sf0.1, q19 6.9 s -> 16.1 s, q21 6.6 s -> 12.6 s, q34 2.9 s -> 5.1 s
  * once the trailing orderBy is attached (PerfProbe, r18).
  *
  * Fix (guide §3.3 "materialise an intermediate result"): eagerly
  * localCheckpoint the ANSWER rows — post-filter, orders of magnitude
  * smaller than the pair stream — so both the sampling pass and the sort
  * read materialized blocks instead of recomputing the pipeline. Rows and
  * final order are unchanged; this is a pure plan-shape change. At 100 TB
  * the answer set of a dedup/match query is ingest-batch-sized (the
  * pipeline's own spill discipline already assumes that), so pinning it
  * once before the output sort is the same trade the sliced LSH loop
  * already makes with its per-slice parquet.
  *
  * NOT applied to scan-shaped queries whose pipeline above the last
  * exchange is a cheap projection — there the extra materialization pass
  * costs about what the sampling recompute does (measured: q02-q18 class,
  * OPTIMIZATION_r18.md).
  */
object Answer {
  /** Plan-audit bypass (SPEC-ONLY, the [[Dedup.sliceReceiptHook]]
    * pattern): the eager checkpoint truncates the inspectable plan to a
    * `Scan ExistingRDD`, so specs that walk the executed plan for the
    * working operators (join strategy, window shape, fan-out exchange)
    * flip this to audit the un-truncated pipeline. The bypassed plan is
    * operator-for-operator the pipeline the checkpoint materializes;
    * production paths never set it. */
  @volatile private[graft] var planAuditBypass: Boolean = false

  def sorted(df: DataFrame, cols: Column*): DataFrame =
    if (planAuditBypass) df.orderBy(cols: _*)
    else df.localCheckpoint().orderBy(cols: _*)
}
