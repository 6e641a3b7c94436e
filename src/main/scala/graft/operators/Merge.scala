package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The GENERAL three-way MERGE operator: caller-supplied
  * `WHEN [NOT] MATCHED [AND <cond>] THEN DELETE | UPDATE SET ... |
  * INSERT ...` clauses with FIRST-MATCH-WINS ordering — the full MERGE
  * INTO clause surface, of which q100's plain three-clause merge,
  * q110's conditional ladder, and the persisted
  * `SnapshotLog.mergeInto*` arbitrations are three configurations
  * (round-18 verdict #3: one machinery instead of hard-coded
  * (key, bal, amt, action) ladders).
  *
  * Semantics (standard MERGE):
  *  - target and source join FULL OUTER on the shared `key` column —
  *    ONE co-partitioned shuffle at any scale (bucket the target on
  *    the key and even that exchange deletes; a small source rides the
  *    AQE broadcast switch);
  *  - matchedness comes from JOIN EXISTENCE markers added before the
  *    join, never from value-column nullability — a NULL-valued target
  *    row is still matched;
  *  - a MATCHED row applies the first matched clause whose condition
  *    is TRUE (NULL = no match, SQL semantics): DELETE drops it,
  *    UPDATE SET rewrites exactly the assigned columns; no clause →
  *    the row is KEPT unchanged;
  *  - a source-only row applies the first not-matched clause whose
  *    condition is TRUE: INSERT builds the row from the assignment map
  *    (unassigned target columns → NULL); no clause → the row does not
  *    enter the table;
  *  - a target-only row is always kept.
  *
  * The whole ladder compiles to per-column CASE expressions over one
  * clause-index column — entirely builtin codegen'd expressions, no
  * UDF, no second join.
  */
object Merge {

  /** One MERGE clause. `assignments` = None means DELETE (matched
    * clauses) / ignore (not-matched clauses); Some(map) assigns target
    * columns from expressions over the joined row (target + source
    * columns are both in scope; unassigned columns keep their value on
    * UPDATE and NULL-fill on INSERT). `label` feeds the optional
    * provenance column. */
  final case class MergeClause(label: String, condition: Column,
                               assignments: Option[Map[String, Column]])

  /** Sugar mirrors of the SQL surface. */
  def update(label: String, condition: Column,
             set: (String, Column)*): MergeClause =
    MergeClause(label, condition, Some(set.toMap))
  def delete(label: String, condition: Column): MergeClause =
    MergeClause(label, condition, None)
  def insert(label: String, condition: Column,
             values: (String, Column)*): MergeClause =
    MergeClause(label, condition, Some(values.toMap))

  /** Run the clause ladder. Output columns: `key`, then the target's
    * value columns in target order, then `provenance` (clause label;
    * 'kept' for untouched rows) when requested. Target and source
    * value-column names must not collide (they're both in scope for
    * clause expressions). */
  def mergeClauses(target: DataFrame, source: DataFrame, key: String,
                   matched: Seq[MergeClause],
                   notMatched: Seq[MergeClause],
                   provenance: Option[String] = None): DataFrame = {
    val targetVals = target.columns.filterNot(_ == key).toSeq
    val sourceVals = source.columns.filterNot(_ == key).toSeq
    val collide = targetVals.toSet & sourceVals.toSet
    require(collide.isEmpty,
      s"target/source value columns collide: ${collide.mkString(",")}")
    require(matched.size < 100,
      "mergeClauses supports at most 99 matched clauses (not-matched " +
        "clause indexes start at 100)")
    provenance.foreach(p => require(
      !(target.columns ++ source.columns).contains(p),
      s"provenance column '$p' collides with an input column"))
    require(!(target.columns ++ source.columns)
        .exists(c => c == "_t_ex" || c == "_s_ex"),
      "column names _t_ex/_s_ex are reserved by mergeClauses")
    val j = target.withColumn("_t_ex", lit(true))
      .join(source.withColumn("_s_ex", lit(true)), Seq(key), "full_outer")
    val isMatched = col("_t_ex").isNotNull && col("_s_ex").isNotNull
    // first-match-wins: fold each ladder into one clause-index column
    // (−1 = kept target row, −2 = dropped source-only row, i = matched
    // clause i, 100+i = not-matched clause i); a NULL condition is NO
    // match, the SQL convention
    def ladder(cs: Seq[MergeClause], off: Int, miss: Int): Column =
      cs.zipWithIndex.foldRight(lit(miss)) { case ((cl, i), acc) =>
        when(coalesce(cl.condition, lit(false)), lit(off + i))
          .otherwise(acc)
      }
    val idx = when(isMatched, ladder(matched, 0, -1))
      .when(col("_t_ex").isNull, ladder(notMatched, 100, -2))
      .otherwise(lit(-1))
    val dropIdxs = matched.zipWithIndex
      .collect { case (cl, i) if cl.assignments.isEmpty => i } ++
      notMatched.zipWithIndex
        .collect { case (cl, i) if cl.assignments.isEmpty => 100 + i } :+
      -2
    def valueOf(c: String): Column = {
      val cases =
        matched.zipWithIndex.collect {
          case (cl, i) if cl.assignments.isDefined =>
            (i, cl.assignments.get.getOrElse(c, col(c)))
        } ++
        notMatched.zipWithIndex.collect {
          case (cl, i) if cl.assignments.isDefined =>
            (100 + i, cl.assignments.get.getOrElse(c, lit(null)))
        }
      // the otherwise covers kept rows (idx = −1): the target value —
      // which is also NULL for an unassigned insert column, since a
      // source-only row's target side is NULL
      cases.foldRight(col(c)) { case ((i, v), acc) =>
        when(idx === i, v).otherwise(acc)
      }.as(c)
    }
    val labelCol = provenance.map { p =>
      (matched.zipWithIndex.map { case (cl, i) => (i, cl.label) } ++
        notMatched.zipWithIndex.map { case (cl, i) => (100 + i, cl.label) })
        .foldRight(lit("kept")) { case ((i, l), acc) =>
          when(idx === i, lit(l)).otherwise(acc)
        }.as(p)
    }
    j.filter(!idx.isin(dropIdxs: _*))
      .select((col(key) +: targetVals.map(valueOf)) ++ labelCol: _*)
  }
}
