package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Exact global per-group ranking WITHOUT single-task groups — the
  * distributed formulation of `Window.partitionBy(g).orderBy(o)` ranking
  * for LOW-CARDINALITY or skewed `g`, where the window operator would
  * serialize each group onto one task (a 3-value grouping key at 100 TB
  * = three 33 TB tasks).
  *
  * Two-pass shape, fully in-plan (no control data ever materializes on
  * the driver — the r7 review flagged the previous collect() of
  * O(partitions × groups) rows as an unbounded driver allocation):
  *  1. range-repartition + sort by (group, order) — each partition owns a
  *     contiguous slice of the total order, a group may SPAN partitions;
  *  2. per-(partition, group) row counts stay a DataFrame; a window over
  *     that CONTROL frame (partitioned by group, ordered by partition id)
  *     prefix-sums them into start offsets — each window group holds at
  *     most `partitions` rows, never data rows;
  *  3. map-only second pass tags each row with (partition id, index
  *     within its group run) — pure per-partition bookkeeping — and a
  *     broadcast hash join on (partition, group) attaches the offsets.
  *     BHJ streams the data side, so its partitioning and order are
  *     untouched. rank = offset + run index.
  *
  * The only driver-side value is `counts.count()` — ONE long — which
  * gates the join strategy: past `maxBroadcastControlRows` the control
  * frame would strain the broadcast path, so the join falls back to a
  * shuffle merge join of the tagged frame (slower, but bounded memory at
  * any group cardinality) and says so on stderr.
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
  * identifies group-run boundaries inside a partition).
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
    * run boundaries.
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
    *
    * `nParts <= 0` (the default) sizes the range exchange from
    * `spark.sql.shuffle.partitions` — the exchange then scales with
    * cluster configuration instead of a pinned constant (a fixed 32 at
    * 100× data is ~3 TB per task, exactly the gathering this operator
    * exists to avoid).
    */
  def withRankStats(df: DataFrame, groupCols: Seq[String],
                    orderCols: Seq[Column], nParts: Int = -1,
                    maxBroadcastControlRows: Long = 4L << 20): DataFrame = {
    val np = if (nParts > 0) nParts
             else df.sparkSession.sessionState.conf.numShufflePartitions
    val sortCols = groupCols.map(col) ++ orderCols
    val sorted = df.repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .cache() // both passes must see identical partitioning

    // pass 1: per-(partition, group) counts — an in-plan control frame
    // of at most (partitions × groups) rows; with range partitioning a
    // group spans few partitions, so in practice ~groups + partitions
    val counts = sorted
      .select(spark_partition_id().as("_cpid"),
              struct(groupCols.map(col): _*).as("_g"))
      .groupBy("_cpid", "_g").count()
    val wTot = Window.partitionBy(col("_g"))
    val wRun = wTot.orderBy(col("_cpid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("count")).over(wRun), lit(0L)))
      .withColumn("_gn", sum(col("count")).over(wTot))
      .select(col("_cpid"), col("_g"), col("_off"), col("_gn"))

    // exact control cardinality (one long to the driver) gates the join
    // strategy — broadcast when bounded, loud merge-join fallback past
    // the cap so extreme group cardinality degrades to a shuffle instead
    // of a driver/executor OOM
    val ctrlRows = counts.count()
    val joinable =
      if (ctrlRows <= maxBroadcastControlRows) broadcast(offsets)
      else {
        System.err.println(
          s"[DistributedRank] control frame has $ctrlRows rows " +
          s"(> $maxBroadcastControlRows): falling back to a merge join — " +
          "ranks stay exact, the second pass gains a shuffle")
        offsets.hint("merge")
      }

    // pass 2: map-only (partition id, index within the group run)
    val gIdx = groupCols.map(sorted.schema.fieldIndex)
    val tagSchema = sorted.schema
      .add("_tpid", IntegerType, nullable = false)
      .add("_ctr", LongType, nullable = false)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(tagSchema)
    val tagged = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var curKey: String = null
      var ctr = 0L
      it.map { r =>
        val g = renderKey(Row.fromSeq(gIdx.map(r.get)))
        if (g != curKey) { curKey = g; ctr = 0L }
        val out = Row.fromSeq(r.toSeq :+ pid :+ ctr)
        ctr += 1
        out
      }
    }

    // struct comparison is field-wise null-safe (same key semantics as
    // the groupBy that built `counts`)
    val cond = tagged.col("_tpid") === joinable.col("_cpid") &&
      (struct(gIdx.map(i => tagged.col(sorted.schema(i).name)): _*)
        <=> joinable.col("_g"))
    tagged.join(joinable, cond, "inner")
      .withColumn("_rank0", col("_off") + col("_ctr"))
      .drop("_tpid", "_ctr", "_cpid", "_g", "_off")
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
