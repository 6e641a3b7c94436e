package graft

import org.apache.spark.{Dependency, NarrowDependency, Partition, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow

/** Carries the parent Partition object itself (the CartesianPartition
  * discipline): partition arrays are driver-transient on many RDDs
  * (FileScanRDD), so an executor-side `parent.partitions` call is
  * illegal — the task must ship with its parent split. */
private[graft] class FanOutPartition(override val index: Int,
    val parentSplit: Partition, val mod: Int) extends Partition

/** Narrow fan-out of an RDD's partitions WITHOUT moving rows: child
  * partition (p, m) recomputes parent partition p and keeps rows whose
  * position ≡ m (mod fan). The CartesianRDD pattern — several child
  * tasks legally compute the same parent split — applied to the
  * fixture-scale one-split parquet scan floor: a sub-128 MB single-
  * row-group file plans ONE scan split, so every pre-exchange text
  * kernel ran one-wide; fanning out trades `fan` cheap re-decodes of
  * the same (page-cached) file for session-wide kernel parallelism,
  * while the heavy text column never crosses a shuffle (the d09/t28
  * pin) and never lands in an exchange, a cache, or a checkpoint.
  *
  * Deterministic by construction: position-sliced from a stable scan
  * order, so the row multiset is exactly the parent's at ANY fan —
  * Verify's cross-CPU-count hash comparison pins that. Rows are copied
  * on emit (the scan reuses row buffers); a retried task recomputes
  * the same slice.
  */
class FanOutRDD(parent: RDD[InternalRow], fan: Int)
    extends RDD[InternalRow](parent.sparkContext, Nil) {
  require(fan >= 1, "fan must be positive")

  override def getDependencies: Seq[Dependency[_]] = Seq(
    new NarrowDependency[InternalRow](parent) {
      override def getParents(partitionId: Int): Seq[Int] =
        Seq(partitionId / fan)
    })

  override def getPartitions: Array[Partition] =
    Array.tabulate(parent.partitions.length * fan) { i =>
      new FanOutPartition(i, parent.partitions(i / fan), i % fan)
    }

  override def compute(s: Partition, ctx: TaskContext): Iterator[InternalRow] = {
    val p = s.asInstanceOf[FanOutPartition]
    parent.iterator(p.parentSplit, ctx)
      .zipWithIndex
      .collect { case (r, i) if i % fan == p.mod => r.copy() }
  }
}
