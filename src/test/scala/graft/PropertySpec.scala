package graft

import graft.weather.WeatherPipeline
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Property tests for the reference semantics (SURVEY §5: "cursor filter:
  * ∀ cursor, output timestamps strictly > cursor; upsert: idempotent under
  * re-application"). Uses seeded ScalaCheck generators sampled explicitly
  * (Spark jobs are too slow for large example counts, and the offline
  * cache has no scalatestplus bridge).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val base = 1704067200000L // 2024-01-01 00:00:00 UTC
  private lazy val df = (0 until 200)
    .map(i => (new Timestamp(base + i * 900000L), i.toDouble))
    .toDF("ts", "v").cache()

  private val cursorGen: Gen[Long] =
    Gen.choose(-10L, 210L).map(i => base + i * 900000L)

  test("∀ cursor: every output ts is strictly greater than the cursor") {
    samples(cursorGen, 8).foreach { cur =>
      val c = new Timestamp(cur)
      val out = WeatherPipeline.filterNewRecords(
          df, "ts", lit(new Timestamp(base + 300 * 900000L)), Some(lit(c)))
        .select($"ts").as[Timestamp].collect()
      assert(out.forall(_.getTime > cur), s"cursor $c leaked rows <= cursor")
      assert(out.length === (0 until 200).count(i => base + i * 900000L > cur),
        s"cursor $c dropped eligible rows")
    }
  }

  test("∀ batch split: upsert twice == upsert once (idempotence)") {
    samples(Gen.choose(0, 200), 6).foreach { split =>
      val sink = df.filter($"v" < split)
      val once = WeatherPipeline.upsertNew(df, sink, "ts")
      assert(once.count() === (200 - split).toLong, s"split $split")
      val again = WeatherPipeline.upsertNew(df, sink.unionByName(once), "ts")
      assert(again.count() === 0, s"split $split not idempotent")
    }
  }

  test("∀ duplication factor: within-batch dedup keeps exactly one per key") {
    samples(Gen.choose(2, 4), 3).foreach { k =>
      val dup = (1 to k).map(_ => df).reduce(_ unionByName _)
      val out = WeatherPipeline.upsertNew(dup, df.limit(0), "ts")
      assert(out.count() === 200, s"dup factor $k")
    }
  }

  test("∀ id: video decode-and-sample equals the pixel formula (JVM-only)") {
    import graft.datapipe.Multimodal.VideoCodec._
    def formulaSum(id: Long, f: Int): Long =
      (for (y <- 0 until H; x <- 0 until W)
        yield (x * 7 + y * 13 + f * 31 + id) % 256).sum
    samples(Gen.choose(0L, 1000000L), 50).foreach { id =>
      val payload = synthVideo(id)
      val ft = features(id, payload)
      assert(payload.length === ft.n_frames * W * H, s"id $id payload size")
      assert(ft.n_frames >= 16 && ft.n_frames <= 24)
      val step = math.max(ft.n_frames / 4, 1)
      val idx = (0 until 4).map(i => math.min(i * step, ft.n_frames - 1))
      val sums = Seq(ft.f0_sum, ft.f1_sum, ft.f2_sum, ft.f3_sum)
      idx.zip(sums).foreach { case (f, s) =>
        assert(s === formulaSum(id, f), s"id $id frame $f")
      }
      assert(ft.motion ===
        sums.sliding(2).map(p => math.abs(p(1) - p(0))).sum)
    }
  }

  test("∀ id: PCM roundtrip recovers every sample exactly (JVM-only)") {
    import graft.datapipe.Multimodal.PcmCodec._
    samples(Gen.choose(0L, 1000000L), 50).foreach { id =>
      val decoded = decode(synthPcm(id))
      assert(decoded.length === nSamples(id))
      decoded.zipWithIndex.foreach { case (v, i) =>
        assert(v === sample(id, i), s"id $id sample $i")
      }
    }
  }
}
