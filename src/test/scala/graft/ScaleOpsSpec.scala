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

  test("saltedJoin rejects non-probe-preserving join types") {
    val df = Tables.events(spark, sf).select($"event_id", $"user_id")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(df, df, "user_id", salts = 3, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(df, df, "user_id", salts = 3, joinType = "right")
    }
  }

  test("asofJoin is safe when left and right share a payload column name") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // left ALSO has a 'purchase_value' column — must not pollute the carry
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 100L, 999.0))
      .toDF("user_id", "ts", "event_id", "purchase_value")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 5.0))
      .toDF("user_id", "ts", "purchase_value")
    val out = operators.TemporalJoins.asofJoin(l, r, "user_id", "ts",
        Seq("purchase_value"))
      .select($"event_id", $"purchase_value", $"purchase_value_right")
      .as[(Long, Double, Double)].collect()
    // left's own column intact; right's carried value under _right suffix
    assert(out.toSeq === Seq((100L, 999.0, 5.0)))
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
