package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage fence for expensive in-plan intermediates.
  *
  * Why it exists: the test corpus RENDERS log lines in-plan from a
  * single-split parquet, and `PushDownPredicates` pushes any filter
  * over a line-derived column — with the whole render expression
  * inlined — through every exchange onto that raw single-split scan,
  * where it runs serially (see git log: Report.nameMatch,
  * WebLog.renderedLines, Style5.parseFastpath). A non-eager
  * `localCheckpoint` truncates the lineage so the filter binds to the
  * materialized attribute instead.
  *
  * 100 TB contract: in production these operators read lines from a
  * FILE SOURCE (the `ScaleTrial` shape — `spark.read.text` /
  * `readStream.text`), where the scan itself is the barrier, the
  * filter on a parsed column cannot be pushed into the render (there
  * is none), and the fence is unnecessary. Moreover local checkpoints
  * are NON-RELIABLE: losing an executor loses its checkpointed blocks
  * with no recompute path, which is unacceptable on a real cluster.
  * Set `spark.graft.lineageFence=false` there (or simply feed the
  * operators from files) — the fence is a test-corpus device, not a
  * scale device. Production alternatives when an expensive
  * multi-referenced intermediate DOES need a barrier at scale: write
  * it to a staging parquet, or `persist(StorageLevel.DISK_ONLY)`
  * (both recomputable / re-readable on loss).
  */
object Fence {

  /** Non-eager lineage fence, gated by `spark.graft.lineageFence`
    * (default true — the local test shape). */
  def lineage(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.lineageFence", "true").toBoolean)
      df.localCheckpoint(eager = false)
    else df
}
