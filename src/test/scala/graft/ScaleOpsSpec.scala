package graft

import graft.operators.SkewJoin
import graft.streaming.Sessionizer
import org.apache.spark.sql.functions._

/** Scale-technique operators: salted skew join equivalence, bottom-k
  * sketch merge-correctness, flatMapGroupsWithState sessionizer vs the
  * declarative session_window.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join (inner, skewed probe side)") {
    val probe = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"value")
    val build = Tables.events(spark, sf).groupBy($"user_id")
      .agg(count(lit(1)).as("user_events"))
    val plain = probe.join(build, Seq("user_id"))
      .select($"event_id", $"user_events").as[(Long, Long)].collect().toSet
    val salted = SkewJoin.saltedJoin(probe, build, "user_id", salts = 7)
      .select($"event_id", $"user_events").as[(Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("bottom-k sketch is parallelism-invariant (mergeable state)") {
    import graft.functions.BottomKAgg.bottom_k
    val base = Tables.documents(spark, sf)
    def sketch(parts: Int) = base.repartition(parts)
      .groupBy($"lang")
      .agg(bottom_k(Dets.phash($"text"), 8).as("sk"))
      .select($"lang", $"sk").as[(String, Seq[Long])].collect().toMap
    val a = sketch(1); val b = sketch(13)
    assert(a === b)
    assert(a.values.forall(s => s == s.sorted && s.size <= 8))
  }

  test("native AsOfJoinExec equals the composed as-of formulation") {
    val native = operators.TemporalJoins.queries("q46_asof_join_native")(spark, sf)
      .select($"event_id", $"purchase_value")
      .as[(Long, Option[Double])].collect().toMap
    val composed = operators.TemporalJoins.queries("q29_asof_join")(spark, sf)
      .select($"event_id", $"purchase_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(native === composed)
  }

  test("flatMapGroupsWithState sessionizer matches session_window counts") {
    val evs = Tables.events(spark, sf)
      .select($"user_id", date_trunc("second", $"ts").as("ts"), $"value")
      .as[Sessionizer.Ev]
    val custom = Sessionizer.sessionize(evs)
      .select($"user_id", $"start", $"n")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val declarative = streaming.Streaming.queries("q42_session_window")(spark, sf)
      .select($"user_id", $"sess_start", $"n")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(custom === declarative)
  }
}
