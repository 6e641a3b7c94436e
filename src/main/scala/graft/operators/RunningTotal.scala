package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.Row

/** Exact GLOBAL running total without a single-task window —
  * [[DistributedRank]]'s sibling for `SUM(x) OVER (ORDER BY k ROWS
  * UNBOUNDED PRECEDING)`: the plain window form has an empty
  * PARTITION BY, so Spark gathers the ENTIRE table onto one task —
  * the canonical 100 TB scale killer for running totals.
  *
  * Two-pass shape:
  *  1. range-repartition + sort by the (unique) order column — each
  *     partition owns a contiguous slice of the total order;
  *  2. per-partition sums aggregate to ONE row per partition; their
  *     exclusive prefix is O(partitions) CONTROL data — bounded by
  *     cluster configuration, not by data size (unlike the
  *     O(partitions × groups) frame DistributedRank keeps in-plan),
  *     so collecting it to a broadcast map is safe at any scale;
  *  3. a map-only second pass accumulates within each partition and
  *     adds the partition's offset. No data row ever leaves its
  *     partition after the range exchange.
  *
  * Determinism: RangePartitioner's seeded sampling is deterministic
  * for a given input, and both passes read the same cached sorted
  * frame, so partition ids agree between them.
  */
object RunningTotal {

  /** Returns `df` plus `cumCol` = the INCLUSIVE global running sum of
    * long-typed `valueCol` in `orderCol` order. `orderCol` must be a
    * unique total order (the library's convention), `valueCol`
    * non-null.
    */
  // at-most-one cached frame alive across calls: the cache below is
  // load-bearing (both passes must see the SAME range partitioning),
  // but the returned DataFrame is lazy, so this call can't know when
  // its cache is safe to drop — instead each call evicts the previous
  // call's copy, bounding session storage to one frame. (Calls are
  // sequential in this library; the rule-rewritten exec path has no
  // cache at all and is the preferred form — see GlobalRunningTotalPlan.)
  private var previousCache: Option[DataFrame] = None

  /** `nParts <= 0` (the default) follows `spark.sql.shuffle.partitions`,
    * so the range exchange scales with cluster config rather than a
    * pinned constant.
    */
  def inclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                         nParts: Int = -1, cumCol: String = "cum_end"): DataFrame = {
    val spark = df.sparkSession
    val np = if (nParts > 0) nParts
             else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(np, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .cache() // both passes must see identical partitioning
    synchronized {
      previousCache.foreach(_.unpersist(false))
      previousCache = Some(sorted)
    }

    // pass 1: one row PER PARTITION (cluster-bounded control data)
    val partSums = sorted
      .groupBy(spark_partition_id().as("_pid"))
      .agg(sum(col(valueCol)).as("_s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = new Array[Long](np)
    var acc = 0L
    partSums.foreach { case (pid, s) => offsets(pid) = acc; acc += s }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    // pass 2: map-only accumulate + offset
    val valueIdx = sorted.schema.fieldIndex(valueCol)
    val outSchema = StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField(cumCol, LongType, nullable = false))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcOffsets.value(pid)
      it.map { r =>
        run += r.getLong(valueIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
