package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles sort-merge
  * skew at runtime, but (a) only for sort-merge, and (b) only when stats
  * surface the skew; explicit salting is the deterministic fallback when
  * one knows the key distribution (e.g. a power-law user_id in events at
  * 100 TB, where one hot key would otherwise pin a single task).
  *
  * Mechanics: the probe (skewed, large) side gets a deterministic salt in
  * [0, salts) derived from row content; the build side is exploded to all
  * salts; the join runs on (key, salt) — the hot key's rows spread over
  * `salts` tasks at the cost of replicating the build side `salts` times
  * (cheap when the build side is the smaller one).
  */
object SkewJoin {

  /** Equi-join `probe` (skewed side) with `build` on `key`, spreading each
    * probe key across `salts` partitions. Output columns = probe.* then
    * build.* minus its key (like a USING join).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // right/full outer would emit each unmatched build row once PER SALT
    // (the build side is replicated) — only probe-preserving types are sound
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
                "semi", "anti").contains(jt),
      s"saltedJoin supports probe-preserving join types only, got $joinType")
    // deterministic per-row salt: stable under retries/re-runs
    val salted = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col).toSeq: _*), lit(salts)))
    val exploded = build.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    val out = salted.join(exploded, Seq(key, "_salt"), joinType)
    out.drop("_salt")
  }
}
