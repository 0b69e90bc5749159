package graft.curation

import org.apache.spark.sql.DataFrame

/** Curation-path checkpoint syntax: `localCheckpointClamped()` is
  * `localCheckpoint()` with origin planning statistics clamped
  * ([[org.apache.spark.sql.graftbridge.StatsBridge]] — the multi-stage /
  * multi-batch BigInt stats blowup the r18 erosion sweep exposed). Every
  * checkpoint inside the curation pipeline (Curator, StoreCurator,
  * MetaProcess, StoreViews, ConnectedComponents) goes through this: those
  * are the frames whose origin stats compound geometrically across stages
  * and batches. */
private[graft] object Ck {
  implicit final class ClampedCheckpointOps(private val df: DataFrame)
      extends AnyVal {
    def localCheckpointClamped(): DataFrame =
      org.apache.spark.sql.graftbridge.StatsBridge.clampedLocalCheckpoint(df)
  }
}
