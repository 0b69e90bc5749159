package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Clamped local checkpoints — the fix for a PLANNING-time blowup found
  * by the r18 erosion sweep (a multi-batch MetaProcess run spent >90% of
  * wall time inside `BigInteger.multiply` under Catalyst's
  * `SizeInBytesOnlyStatsPlanVisitor`).
  *
  * Mechanism: `Dataset.localCheckpoint` preserves the origin plan's
  * `Statistics` on the resulting [[LogicalRDD]] (so broadcast decisions
  * still work across the lineage cut), and the size-only join estimate
  * MULTIPLIES child sizes. A curation batch is ~10 checkpointed stages of
  * ~10-50 joins each, so each stage's origin `sizeInBytes` is a product
  * over the previous stage's already-huge BigInts — digits grow
  * geometrically per stage AND per batch (the evolving store state is
  * itself a checkpoint carrying the previous batch's numbers). By batch
  * ~5 the estimates are BigInts with millions of digits and every
  * planning pass costs seconds of Toom-Cook multiplication; a 100-batch
  * run never finishes.
  *
  * The numbers carry zero information past the broadcast threshold
  * (~tens of MB): every planner decision is a `<= threshold` comparison,
  * so any value above 1 PB behaves identically to any other. Clamping
  * the origin stats to 1 PB at each checkpoint boundary therefore changes
  * NO plan shape while resetting the digit growth to a constant per
  * stage — planning returns to milliseconds.
  */
object StatsBridge {

  /** 1 PB — far above every size-threshold decision (broadcast joins,
    * shuffle-hash build sides), far below BigInt pain. */
  val CapBytes: BigInt = BigInt("1000000000000000")

  /** `df.localCheckpoint()` with origin statistics clamped to
    * [[CapBytes]] when they exceed it (both sizeInBytes and rowCount).
    * Identical to a plain localCheckpoint when the estimate is sane. */
  def clampedLocalCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val st = lr.computeStats()
        if (st.sizeInBytes <= CapBytes &&
            st.rowCount.forall(_ <= CapBytes)) cp
        else {
          val clamped = Statistics(
            sizeInBytes = st.sizeInBytes.min(CapBytes),
            rowCount = st.rowCount.map(_.min(CapBytes)))
          val session = cp.sparkSession.asInstanceOf[ClassicSession]
          Dataset.ofRows(session,
            new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
              lr.outputOrdering, lr.isStreaming, lr.stream)(
              session, Some(clamped), None))
        }
      case _ => cp
    }
  }
}
