package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global per-group ranking WITHOUT single-task groups — the
  * distributed formulation of `Window.partitionBy(g).orderBy(o)` ranking
  * for LOW-CARDINALITY or skewed `g`, where the window operator would
  * serialize each group onto one task (a 3-value grouping key at 100 TB
  * = three 33 TB tasks).
  *
  * Classic two-pass shape:
  *  1. range-repartition + sort by (group, order) — each partition owns a
  *     contiguous slice of the total order, a group may SPAN partitions;
  *  2. per-(partition, group) row counts — O(partitions × groups) control
  *     rows to the driver — prefix-summed into start offsets, broadcast;
  *  3. map-only second pass: rank = group's offset for this partition +
  *     running counter. No group ever gathers onto one task.
  *
  * With the library's total-order convention (order columns tie-broken to
  * uniqueness) rank equals SQL rank/row_number, so percent_rank, ntile
  * and cume_dist all derive from (rank, group size) arithmetically.
  *
  * Determinism: range boundaries come from RangePartitioner's seeded
  * sampling (deterministic for a given input), and the two passes share
  * one cached sorted frame, so partition ids agree between them.
  *
  * Contract: group columns are simple scalar types (their rendered key
  * identifies the group across the two passes).
  */
object DistributedRank {

  private val Sep = 0.toChar // field separator
  private val Nul = 1.toChar // NULL marker (a bare marker, never escaped)
  private val Esc = 2.toChar // escape prefix for Sep/Nul/Esc inside values

  /** Unambiguous render of a group-key Row: fields joined by Sep, with
    * Sep/Nul/Esc escaped inside rendered values and NULL rendered as a
    * bare Nul marker. Distinct rows can never render to the same key --
    * ("a","b") vs ("ab","") and ("a<Sep>b") vs ("a","b") all differ --
    * unlike a plain `mkString`, which would silently merge two groups'
    * offsets and totals.
    */
  def renderKey(r: Row): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < r.length) {
      if (i > 0) sb.append(Sep)
      if (r.isNullAt(i)) sb.append(Nul)
      else {
        val s = String.valueOf(r.get(i))
        var j = 0
        while (j < s.length) {
          val c = s.charAt(j)
          if (c == Sep || c == Nul || c == Esc) sb.append(Esc)
          sb.append(c)
          j += 1
        }
      }
      i += 1
    }
    sb.toString
  }

  /** Returns `df` with two extra columns: `_rank0` (zero-based exact rank
    * of the row within its group under the total (order) sort) and `_gn`
    * (the group's total row count).
    */
  def withRankStats(df: DataFrame, groupCols: Seq[String],
                    orderCols: Seq[Column], nParts: Int): DataFrame = {
    val spark = df.sparkSession
    val sortCols = groupCols.map(col) ++ orderCols
    val sorted = df.repartitionByRange(nParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .cache() // both passes must see identical partitioning
    def keyOf(r: Row): String = DistributedRank.renderKey(r)

    // pass 1: per-(partition, group) counts — small control data
    val counts = sorted
      .select(spark_partition_id().as("_pid"),
              struct(groupCols.map(col): _*).as("_g"))
      .groupBy("_pid", "_g").count()
      .collect()
    val byGroup = counts.groupBy(r => keyOf(r.getStruct(1)))
    val totals: Map[String, Long] =
      byGroup.map { case (g, rs) => g -> rs.map(_.getLong(2)).sum }
    val offsets: Map[(Int, String), Long] = byGroup.flatMap { case (g, rs) =>
      var acc = 0L
      rs.sortBy(_.getInt(0)).map { r =>
        val o = ((r.getInt(0), g), acc); acc += r.getLong(2); o
      }
    }
    val bOff = spark.sparkContext.broadcast(offsets)
    val bTot = spark.sparkContext.broadcast(totals)

    // pass 2: map-only rank assignment
    val gIdx = groupCols.map(sorted.schema.fieldIndex)
    val outSchema = sorted.schema
      .add("_rank0", LongType, nullable = false)
      .add("_gn", LongType, nullable = false)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var curKey: String = null
      var ctr = 0L; var off = 0L; var tot = 0L
      it.map { r =>
        val g = keyOf(Row.fromSeq(gIdx.map(r.get)))
        if (g != curKey) {
          curKey = g; ctr = 0L
          off = bOff.value.getOrElse((pid, g), 0L)
          tot = bTot.value(g)
        }
        val rank0 = off + ctr
        ctr += 1
        Row.fromSeq(r.toSeq :+ rank0 :+ tot)
      }
    }
  }

  /** SQL ntile(k) from (zero-based rank, group size): the first n%k
    * buckets take ceil(n/k) rows, the rest floor(n/k).
    */
  def ntileFromRank(k: Int, rank0: Column, n: Column): Column = {
    // floor() over double division is exact here: ranks/sizes are far
    // below 2^53 (Column's `/` is double division; there is no infix
    // integer div in the Column API)
    val small = floor(n / lit(k)).cast("long") // floor bucket size
    val rem = n % k
    val big = small + 1
    when(rank0 < rem * big, floor(rank0 / big).cast("long") + 1)
      .otherwise(rem + floor((rank0 - rem * big) / small).cast("long") + 1)
      .cast("int")
  }
}
