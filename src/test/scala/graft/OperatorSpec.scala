package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Operator-level unit tests on crafted micro-data (as-of join, dedup
  * recall on planted duplicates, similarity sanity, approx accuracy).
  */
class OperatorSpec extends SparkSpec {

  /** The index-order double fold — CosineSim's exact IEEE sequence;
    * shared by every similarity-family replay in this suite. */
  private def cosExact(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before each left ts") {
    val clicks = Seq((1L, ts("2024-01-01 10:00:00"), 100L),
                     (1L, ts("2024-01-01 12:00:00"), 101L),
                     (2L, ts("2024-01-01 09:00:00"), 102L))
      .toDF("user_id", "ts", "event_id")
    val purchases = Seq((1L, ts("2024-01-01 09:30:00"), 5.0),
                        (1L, ts("2024-01-01 11:00:00"), 7.0),
                        (3L, ts("2024-01-01 08:00:00"), 9.0))
      .toDF("user_id", "ts", "purchase_value")
    val out = TemporalJoins.asofJoin(clicks, purchases, "user_id", "ts",
        Seq("purchase_value"))
      .select($"event_id", $"purchase_value").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(100L) === Some(5.0))  // 09:30 is latest <= 10:00
    assert(out(101L) === Some(7.0))  // 11:00 is latest <= 12:00
    assert(out(102L) === None)       // user 2 has no purchase
  }

  test("q87: nearest join replays the (|delta|, backward, rid) tuple rule") {
    val out = operators.TemporalJoins.queries("q87_nearest_join")(spark, sf)
      .select($"event_id", $"match_id", $"delta_s", $"side")
      .as[(Long, Option[Long], Option[Long], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", date_trunc("second", $"ts"))
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp($"ts").as("s"))
      .as[(Long, Long, String, Long)].collect()
    val purch = ev.filter(_._3 == "purchase").groupBy(_._2)
    ev.filter(_._3 == "click").foreach { case (id, u, _, s) =>
      val cands = purch.getOrElse(u, Array.empty)
      if (cands.isEmpty) assert(out(id) === ((id, None, None, None)))
      else {
        val best = cands.minBy { case (rid, _, _, rs) =>
          (math.abs(rs - s), if (rs <= s) 0L else 1L, rid) }
        val (rid, _, _, rs) = best
        assert(out(id) === ((id, Some(rid), Some(math.abs(rs - s)),
          Some(if (rs <= s) "backward" else "forward"))), s"id=$id")
      }
    }
    // fixture exercises both directions and at least one no-match or
    // zero-delta/tie case is plausible but not guaranteed — pin only
    // the direction mix
    val sides = out.values.flatMap(_._4).toSet
    assert(sides === Set("backward", "forward"),
      s"fixture exercises only $sides")
  }

  test("q89: sequence chains replay the strict-after earliest-step rule") {
    val out = operators.TemporalJoins.queries("q89_sequence_match")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", date_trunc("second", $"ts"))
      .select($"event_id", $"user_id", $"event_type",
        unix_timestamp($"ts").as("s"))
      .as[(Long, Long, String, Long)].collect()
    def byType(t: String) = ev.filter(_._3 == t).groupBy(_._2)
    val (vs, cs, ps) = (byType("view"), byType("click"), byType("purchase"))
    // first event of `pool` strictly after `after`, within the gap,
    // earliest by (ts, id) — the chain step evaluated literally
    def step(pool: Array[(Long, Long, String, Long)], after: Long)
        : Option[(Long, Long)] =
      pool.filter(e => e._4 > after && e._4 - after <= 86400L)
        .sortBy(e => (e._4, e._1)).headOption.map(e => (e._1, e._4))
    val expected = vs.map { case (u, views) =>
      val chains = views.flatMap { case (vid, _, _, vts) =>
        for {
          (cid, cts) <- step(cs.getOrElse(u, Array.empty), vts)
          (pid, pts) <- step(ps.getOrElse(u, Array.empty), cts)
        } yield (vid, cid, pid, pts - vts)
      }
      u -> ((u, views.length.toLong, chains.length.toLong,
        chains.map(_._4).sum,
        chains.map(c => c._1 + c._2 + c._3).sum))
    }
    assert(out.keySet === expected.keySet)
    expected.foreach { case (u, e) => assert(out(u) === e, s"user=$u") }
    // the pattern must actually fire, partially and fully: some user
    // completes a chain, some user's views outnumber their matches
    assert(out.values.exists(_._3 > 0), "no completed chain — vacuous")
    assert(out.values.exists(r => r._2 > r._3),
      "every view converts — gap/order predicates untested")
  }

  test("as-of join: right row at exactly left ts is included (<= semantics)") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("user_id", "ts", "event_id")
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 42.0))
      .toDF("user_id", "ts", "purchase_value")
    val out = TemporalJoins.asofJoin(l, r, "user_id", "ts", Seq("purchase_value"))
      .select($"purchase_value").as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(42.0)))
  }

  test("exact dedup finds every planted exact copy") {
    val out = datapipe.Dedup.queries("d01_exact_dedup")(spark, sf)
    val canon = out.select($"canonical_id").as[Long].collect().toSet
    val docs = Tables.documents(spark, sf).select($"doc_id").as[Long]
      .collect().filter(_ % 7 == 0).toSet
    // every doc with a planted copy (doc_id % 7 == 0) must appear as canonical
    assert(docs.subsetOf(canon))
  }

  test("minhash LSH recovers planted near-duplicates with high recall") {
    val pairs = datapipe.Dedup.queries("d02_minhash_lsh")(spark, sf)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val planted = Tables.documents(spark, sf).select($"doc_id").as[Long]
      .collect().filter(_ % 10 == 0)
      .map(id => (id, id + 1000000L)).toSet
    val recall = planted.count(pairs.contains).toDouble / planted.size
    assert(recall >= 0.8, s"LSH recall $recall below 0.8")
  }

  test("embedding near-dup finds all planted exact vector copies") {
    val pairs = datapipe.Similarity.queries("d05_embedding_neardup")(spark, sf)
      .select($"v1", $"v2").as[(Long, Long)].collect().toSet
    val planted = Tables.embeddings(spark, sf).select($"vec_id").as[Long]
      .collect().filter(_ % 10 == 0)
      .map(id => (id, id + 1000000L)).toSet
    assert(planted.subsetOf(pairs))
  }

  test("brute-force top-k cosine: scores in [-1,1], sorted descending") {
    val rows = datapipe.Similarity.queries("s01_topk_cosine")(spark, sf)
      .select($"cosine").as[Double].collect()
    assert(rows.length === 10)
    assert(rows.forall(c => c >= -1.0001 && c <= 1.0001))
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
  }

  test("LSH ANN results are a subset of brute-force universe with same scores") {
    val ann = datapipe.Similarity.queries("s02_ann_lsh_bucket")(spark, sf)
      .select($"vec_id", $"cosine").as[(Long, Double)].collect().toMap
    val bf = datapipe.Similarity.queries("s01_topk_cosine")(spark, sf)
      .select($"vec_id", $"cosine").as[(Long, Double)].collect().toMap
    ann.foreach { case (id, c) =>
      bf.get(id).foreach(c2 => assert(math.abs(c - c2) < 1e-12))
    }
  }

  test("approx sketches land inside their error bands (q39 flags)") {
    val rows = operators.AdvancedAggs.queries("q39_approx_sketches")(spark, sf)
      .select($"l_returnflag", $"n_orders",
              $"hll_orders_ok", $"hll_parts_ok", $"median_ok")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"${r.getString(0)}: sketch outside error band")
    }
  }

  test("transcendental functions satisfy identities at full precision") {
    // q54's OUTPUTS are 6-dp-rounded for oracle parity, so recompute the
    // unrounded expressions here — a last-ulp regression must fail THIS
    val rows = Tables.lineitem(spark, sf)
      .filter($"l_orderkey" % 200 === 0)
      .selectExpr("sin(l_quantity) * sin(l_quantity) " +
                    "+ cos(l_quantity) * cos(l_quantity) AS one",
                  "exp(l_discount) AS e_disc",
                  "ln(l_extendedprice) AS ln_price",
                  "log10(l_extendedprice) AS log10_price")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12) // sin^2 + cos^2 = 1
      assert(r.getDouble(1) >= 1.0)                  // exp(discount >= 0) >= 1
      assert(math.abs(r.getDouble(2) / math.log(10) - r.getDouble(3)) < 1e-12)
    }
    // and the q54 query itself still executes with sane rounded outputs
    val q54 = operators.AdvancedAggs.queries("q54_scalar_transcendental")(spark, sf)
      .selectExpr("sin_qty * sin_qty + cos_qty * cos_qty AS one").collect()
    assert(q54.nonEmpty && q54.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-5))
  }

  test("gram_phashes equals the declarative transform chain bit-for-bit") {
    import graft.functions.GramPHashes.gram_phashes
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sf).filter($"n_chars" >= 4)
      .select($"doc_id", $"text")
      // non-ASCII row exercises the code-point fallback path
      .unionByName(Seq((-1L, "héllo wörld")).toDF("doc_id", "text"))
    val diff = docs
      .withColumn("fused", gram_phashes($"text", 4))
      .withColumn("declared", expr(
        """array_sort(array_distinct(transform(
          |  sequence(1, length(text) - 3),
          |  i -> graft_phash(substring(text, i, 4)))))""".stripMargin))
      .filter($"fused" =!= $"declared")
    assert(diff.count() === 0)
  }

  test("int_l2 equals the declarative zip_with/aggregate fold bit-for-bit") {
    import graft.functions.IntL2.int_l2
    // the PQ family's fixed-point pair distance: pre-rounded long
    // arrays from the REAL embeddings (full vectors and a shifted copy
    // as the counterpart), plus edge rows — mismatched lengths and a
    // NULL element must yield NULL exactly like the null-padding fold
    val fx = "transform(embedding, x -> " +
      "CAST(round(CAST(x AS DOUBLE) * 1e8) AS BIGINT))"
    val pairs = Tables.embeddings(spark, sf).filter(size($"embedding") > 0)
      .select(expr(fx).as("a"),
              expr(s"reverse($fx)").as("b"))
      .unionByName(Seq(
        (Seq(1L, 2L, 3L), Seq(1L, 2L)),       // length mismatch
        (Seq(2000000000L, -2000000000L), Seq(0L, 0L)) // 10x the 1e8 range
      ).toDF("a", "b"))
      .unionByName(
        Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
          .select(expr("array(1L, CAST(NULL AS BIGINT))").as("a"), $"b"))
    val diff = pairs
      .withColumn("fused", int_l2($"a", $"b"))
      .withColumn("declared", expr(
        "aggregate(zip_with(a, b, (x, y) -> x - y), " +
        "CAST(0 AS BIGINT), (acc, v) -> acc + v * v)"))
      .filter(!($"fused" <=> $"declared"))
    assert(diff.count() === 0)
  }

  test("word_shingle_phashes equals the declarative shingle chain bit-for-bit") {
    import graft.functions.WordShinglePHashes.word_shingle_phashes
    GraftExtensions.register(spark)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      // edge rows: consecutive/leading/trailing spaces, non-ASCII words
      .unionByName(Seq(
        (-1L, "a  b c d"), (-2L, " x y z "), (-3L, "héllo wörld déjà vu"))
        .toDF("doc_id", "text"))
    val diff = docs
      .withColumn("words", split($"text", " "))
      .filter(size($"words") >= 3)
      .withColumn("fused", word_shingle_phashes($"text", 3))
      .withColumn("declared", expr(
        """array_sort(array_distinct(transform(
          |  array_distinct(transform(sequence(0, size(words) - 3),
          |    i -> concat_ws(' ', element_at(words, i + 1),
          |                   element_at(words, i + 2), element_at(words, i + 3)))),
          |  s -> graft_phash(s))))""".stripMargin))
      .filter($"fused" =!= $"declared")
    assert(diff.count() === 0)
  }

  test("custom expressions compile under codegen (no janino fallback)") {
    // GenerateMutableProjection.generate THROWS on codegen compile
    // failure, unlike query execution which falls back to interpreted
    // eval silently (regression: companion helpers named `eval` get no
    // static forwarder — the instance Expression.eval shadows them — so
    // the generated Java failed to resolve and every stage fell back)
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types._
    val str = BoundReference(0, StringType, nullable = true)
    val longs = BoundReference(1, ArrayType(LongType, containsNull = false), nullable = true)
    val floats = BoundReference(2, ArrayType(FloatType), nullable = true)
    val cents = BoundReference(3, ArrayType(StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("centroid", ArrayType(FloatType)))), containsNull = false),
      nullable = true)
    val proj = GenerateMutableProjection.generate(Seq(
      functions.GramPHashes(str, 4),
      functions.WordShinglePHashes(str, 3),
      functions.MinHashSigs(longs, Array(7L, 29L), Array(13L, 71L), 2147483647L),
      functions.PortableHashExpr(str),
      functions.CosineSim(floats, floats),
      functions.SortedIntersectCount(longs, longs),
      functions.NearestCentroid(floats, cents),
      functions.SimHashFp(str, 32),
      functions.WinnowFingerprints(str, 8, 8),
      functions.BandedLevenshtein(str, str, 5)))
    assert(proj != null)
  }

  test("banded_levenshtein equals Spark's thresholded levenshtein everywhere") {
    import functions.BandedLevenshtein.banded_levenshtein
    // adversarial + random pairs across the contract surface: identical,
    // 1-edit, k-edit, k+1-edit, length-delta pruned, empty, non-ASCII
    // (codepoint semantics), and random far pairs
    val r = new scala.util.Random(13)
    def rs(n: Int) = (0 until n).map(_ => ('a' + r.nextInt(4)).toChar).mkString
    val cases = Seq(
      ("", ""), ("", "abc"), ("abcde", ""),
      ("same text here", "same text here"),
      ("käsehöhle", "käsehöhlen"), ("日本語テキスト", "日本語テキスト強"),
      ("abcdefghij", "abcdefghijklmnop")) ++
      (0 until 200).map { _ =>
        val s = rs(30 + r.nextInt(270))
        val edits = r.nextInt(9)
        val t = (0 until edits).foldLeft(s) { (acc, _) =>
          val p = r.nextInt(math.max(acc.length, 1))
          r.nextInt(3) match {
            case 0 if acc.nonEmpty => acc.updated(math.min(p, acc.length - 1), 'Z')
            case 1 => acc.patch(p, "Q", 0)
            case _ if acc.nonEmpty => acc.patch(math.min(p, acc.length - 1), "", 1)
            case _ => acc
          }
        }
        (s, t)
      } ++ (0 until 50).map(_ => (rs(200), rs(200)))
    val df = cases.toDF("l", "r")
      .withColumn("fused", banded_levenshtein($"l", $"r", 5))
      .withColumn("builtin", levenshtein($"l", $"r", 5))
    assert(df.filter($"fused" =!= $"builtin").count() === 0)
  }

  test("winnow_fps: rolling recurrence equals the from-scratch polynomial chain") {
    GraftExtensions.register(spark)
    val terms = (0 until 8).map { j =>
      val p = BigInt(functions.WinnowFingerprints.B).pow(7 - j)
        .mod(BigInt(functions.WinnowFingerprints.M))
      s"CAST(ascii(substring(text, CAST(i + $j AS INT), 1)) AS BIGINT) * ${p}L"
    }.mkString(" + ")
    // sample: the from-scratch chain interprets 8 lambdas per gram — the
    // point is bit-parity, not corpus coverage
    val diff = datapipe.Dedup.corpus(spark, sf)
      .filter(length($"text") >= 15 && $"doc_id" % 25 === 0)
      .withColumn("fused", functions.WinnowFingerprints.winnow_fps($"text", 8, 8))
      .withColumn("grams", expr(
        s"transform(sequence(1, length(text) - 7), i -> ($terms) % ${functions.WinnowFingerprints.M}L)"))
      .withColumn("declared", expr(
        "array_sort(array_distinct(transform(sequence(1, size(grams) - 7), " +
          "i -> array_min(slice(grams, i, 8)))))"))
      .filter($"fused" =!= $"declared")
    assert(diff.count() === 0)
  }

  test("winnowing: exact copies share the full fingerprint set (planted dups)") {
    import graft.functions.WinnowFingerprints.winnow_fps
    val fps = datapipe.Dedup.corpus(spark, sf)
      .filter(length($"text") >= 15)
      .withColumn("fps", winnow_fps($"text", 8, 8))
      .select($"doc_id", $"fps")
    // corpus plants exact copies at doc_id + 2e6 for doc_id % 7 == 0
    val pairs = fps.as("x").join(fps.as("y"),
        col("y.doc_id") === col("x.doc_id") + 2000000L &&
        col("x.doc_id") % 7 === 0)
    assert(pairs.count() > 0)
    assert(pairs.filter(col("x.fps") =!= col("y.fps")).count() === 0,
      "an exact copy must fingerprint identically")
  }

  test("simhash_fp equals the declarative phash+majority chain bit-for-bit") {
    GraftExtensions.register(spark)
    val diff = datapipe.Dedup.corpus(spark, sf)
      .withColumn("fused", functions.SimHashFp.simhash_fp($"text", 60))
      .withColumn("declared", expr(
        """aggregate(sequence(0, 59), 0L, (acc, j) -> acc +
          |  IF(2 * size(filter(transform(split(text, ' '), w -> graft_phash(w)),
          |                     m -> (shiftright(m, j) & 1) = 1))
          |       >= size(split(text, ' ')),
          |     CAST(round(pow(2, j)) AS BIGINT), 0L))""".stripMargin))
      .filter($"fused" =!= $"declared")
    assert(diff.count() === 0)
  }

  test("word_stats equals the declarative split/distinct/filter chain") {
    import graft.functions.WordStats.{word_stats, nWords, nDistinct, nStop}
    // corpus + adversarial token shapes: empty text (one empty token),
    // leading/trailing/consecutive spaces (empty tokens count and are
    // ONE distinct value), stopwords at boundaries, multi-byte UTF-8
    val adversarial = Seq("", "a", "the", " a", "a ", "the  the",
      "a a the b b", "  ", "über über the a", "a\tb c", "the a the a x")
      .toDF("text")
    val corpus = datapipe.Dedup.corpus(spark, sf).select($"text")
      .unionByName(adversarial)
    val diff = corpus
      .withColumn("ws", word_stats($"text"))
      .withColumn("words", split($"text", " "))
      .filter(
        nWords($"ws") =!= size($"words").cast("long") ||
        nDistinct($"ws") =!= expr("size(array_distinct(words))").cast("long") ||
        nStop($"ws") =!=
          expr("size(filter(words, w -> w = 'the' OR w = 'a'))").cast("long"))
    assert(diff.count() === 0)
  }

  test("simhash multi-band blocking: guaranteed recall at Hamming <= 3") {
    // adversarial pattern: 3 flipped bits spread over 3 DIFFERENT bands
    // (59, 44, 29) — a single-band block would separate these docs, the
    // 4-disjoint-band scheme must pair them via band 0
    val fps = Seq(
      (1L, 0L),                                  // base
      (2L, (1L << 59) | (1L << 44) | (1L << 29)), // hamming 3, bands 3/2/1 hit
      (3L, (1L << 0) | (1L << 15) | (1L << 30) | (1L << 45)) // hamming 4, all bands hit
    ).toDF("doc_id", "simhash")
      .select($"doc_id", array($"simhash").as("fps"),
              lit(15).as("bw"), lit(4).as("bpw"))
    val cands = datapipe.Dedup.simhashCandidates(fps)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)), "hamming-3 pair missed by banding")
    assert(!cands.contains((1L, 3L)),
      "pair differing in all 4 bands must not be a candidate")
    // exhaustive pigeonhole check over random <=3-bit perturbations
    val rnd = new scala.util.Random(7)
    val base = rnd.nextLong() >>> 4 // 60-bit
    val perturbed = (0 until 50).map { i =>
      val k = 1 + rnd.nextInt(3)
      val bits = rnd.shuffle((0 until 60).toList).take(k)
      (100L + i, bits.foldLeft(base)((f, b) => f ^ (1L << b)))
    }
    val all = (Seq((99L, base)) ++ perturbed).toDF("doc_id", "simhash")
      .select($"doc_id", array($"simhash").as("fps"),
              lit(15).as("bw"), lit(4).as("bpw"))
    val found = datapipe.Dedup.simhashCandidates(all)
      .as[(Long, Long)].collect().toSet
    perturbed.foreach { case (id, _) =>
      assert(found.contains((99L, id)), s"pair (99, $id) missed")
    }
  }

  test("widened simhash banding (bw=30, 2 words): recall holds past the 15-bit cap") {
    // bw=30, bpw=2: bands 0/1 are the halves of word 0, bands 2/3 the
    // halves of word 1 — disjoint across the 120-bit concatenation, so
    // <= 3 flipped bits anywhere still leave one band untouched
    def df(rows: Seq[(Long, Long, Long)]) = rows
      .toDF("doc_id", "w0", "w1")
      .select($"doc_id", array($"w0", $"w1").as("fps"),
              lit(30).as("bw"), lit(2).as("bpw"))
    val base0 = 0x0123456789abcdL // 60-bit
    val base1 = 0x0fedcba9876543L
    val probe = df(Seq(
      (1L, base0, base1),
      // 3 bits: bands 0 (bit 5), 1 (bit 35), 2 (word-1 bit 10) hit;
      // band 3 (word-1 high half) untouched
      (2L, base0 ^ (1L << 5) ^ (1L << 35), base1 ^ (1L << 10)),
      // 4 bits, one per band: must NOT be a candidate
      (3L, base0 ^ (1L << 5) ^ (1L << 35), base1 ^ (1L << 10) ^ (1L << 40))))
    val cands = datapipe.Dedup.simhashCandidates(probe)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)), "hamming-3 pair missed at bw=30")
    assert(!cands.contains((1L, 3L)),
      "pair differing in all 4 bands must not be a candidate at bw=30")
    // random <=3-bit perturbations over the full 120-bit concatenation
    val rnd = new scala.util.Random(11)
    val perturbed = (0 until 50).map { i =>
      val k = 1 + rnd.nextInt(3)
      val bits = rnd.shuffle((0 until 120).toList).take(k)
      val (p0, p1) = bits.foldLeft((base0, base1)) { case ((a, b), bit) =>
        if (bit < 60) (a ^ (1L << bit), b) else (a, b ^ (1L << (bit - 60)))
      }
      (100L + i, p0, p1)
    }
    val found = datapipe.Dedup.simhashCandidates(
        df(Seq((99L, base0, base1)) ++ perturbed))
      .as[(Long, Long)].collect().toSet
    perturbed.foreach { case (id, _, _) =>
      assert(found.contains((99L, id)), s"pair (99, $id) missed at bw=30")
    }
  }

  test("simhash_fps word 0 equals simhash_fp; word 1 is the upper md5 half") {
    GraftExtensions.register(spark)
    import graft.functions.SimHashFps.simhash_fps
    val diff = datapipe.Dedup.corpus(spark, sf)
      .withColumn("wide", simhash_fps($"text", 60, lit(2)))
      .withColumn("narrow", functions.SimHashFp.simhash_fp($"text", 60))
      // word 1 re-derived declaratively from md5 hex digits 17-31
      .withColumn("hi_declared", expr(
        """aggregate(sequence(0, 59), 0L, (acc, j) -> acc +
          |  IF(2 * size(filter(transform(split(text, ' '),
          |       w -> CAST(conv(substring(md5(w), 17, 15), 16, 10) AS BIGINT)),
          |     m -> (shiftright(m, j) & 1) = 1)) >= size(split(text, ' ')),
          |     CAST(round(pow(2, j)) AS BIGINT), 0L))""".stripMargin))
      .filter(element_at($"wide", 1) =!= $"narrow" ||
              element_at($"wide", 2) =!= $"hi_declared")
    assert(diff.count() === 0)
  }

  test("winnow join catches shared-span pairs that sit below d02/d04 thresholds") {
    GraftExtensions.register(spark)
    val found = datapipe.TextAnalysis.queries("d09_winnow_neardup")(spark, sf)
      .filter($"d2" === $"d1" + 3000000L).select($"d1").as[Long].collect().toSet
    assert(found.nonEmpty, "no planted shared-span pair found by d09")
    // the planted pairs' GLOBAL overlap is provably below both dedup bars:
    // word-3-shingle Jaccard < 0.5 (d02) and char-4-gram Jaccard < 0.85
    // (d04) — only the shared 60-byte span links them
    def shingles(c: String) =
      s"array_distinct(transform(sequence(0, size(split($c, ' ')) - 3), i -> " +
        s"concat_ws(' ', element_at(split($c, ' '), i + 1), " +
        s"element_at(split($c, ' '), i + 2), element_at(split($c, ' '), i + 3))))"
    def grams(c: String) =
      s"array_distinct(transform(sequence(1, length($c) - 3), i -> substring($c, i, 4)))"
    def jac(f: String => String) =
      s"size(array_intersect(${f("t1")}, ${f("t2")})) / " +
        s"CAST(size(array_distinct(concat(${f("t1")}, ${f("t2")}))) AS DOUBLE)"
    val corpus = datapipe.TextAnalysis.d09Corpus(spark, sf)
    val checked = corpus.as("x").join(corpus.as("y"),
        col("y.doc_id") === col("x.doc_id") + 3000000L)
      .select(col("x.doc_id").as("d1"), col("x.text").as("t1"),
              col("y.text").as("t2"))
      .filter($"d1".isin(found.toSeq: _*))
      .withColumn("sj", expr(jac(shingles)))
      .withColumn("gj", expr(jac(grams)))
      .select($"d1", $"sj", $"gj").collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      assert(r.getDouble(1) < 0.5, s"doc ${r.getLong(0)}: shingle jaccard not low")
      assert(r.getDouble(2) < 0.85, s"doc ${r.getLong(0)}: gram jaccard not low")
    }
  }

  test("multi-probe LSH finds a near-boundary pair single-bucket probing misses") {
    // two near-identical vectors straddling hyperplane 0: sign of dim 0
    // differs, so their sign buckets differ in exactly bit 0 and plain
    // bucket-equality blocking (p = 0) can never pair them; dim 0 is also
    // the smallest-|v| hashed dim, so probe-1 flips it and recovers the pair
    val base = Array(0.001f, 1f, -1f, 1f, -1f, 1f, 1f, -1f) ++ Array.fill(56)(0.5f)
    val flipped = base.clone(); flipped(0) = -0.001f
    val df = Seq((1L, base.toSeq, 0), (2L, flipped.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    assert(datapipe.Similarity.multiProbePairs(df, 0, 0.995).count() === 0,
      "p=0 must miss the cross-bucket pair")
    val p1 = datapipe.Similarity.multiProbePairs(df, 1, 0.995)
      .select($"v1", $"v2").as[(Long, Long)].collect().toSet
    assert(p1 === Set((1L, 2L)), "p=1 must recover the cross-bucket pair")
  }

  test("connected components converge on a diameter-4 chain (a short fixed budget would under-merge)") {
    // path graph 1-2-3-4-5: min-label propagation would need 4 pulls
    // to move label 1 to node 5; large-star/small-star roughly doubles
    // the pointed-to distance each cycle and the per-cycle
    // ground-truth check (implied labels constant across every
    // original edge) fires the moment labels are correct — cycle 2
    // here. A 1-cycle budget must fail loudly rather than leave a
    // phantom second cluster. Accepting symmetric (both-direction)
    // edges here also pins the canonicalization: the engine callers
    // pass one orientation, this test passes both.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val sym = edges.unionByName(edges.select($"b".as("a"), $"a".as("b")))
    val seed = (1L to 5L).toDF("doc_id").withColumn("lbl", $"doc_id")
    val labels = datapipe.Dedup.connectedComponents(seed, sym, 2)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // an insufficient budget fails loudly instead of under-merging
    intercept[IllegalArgumentException] {
      datapipe.Dedup.connectedComponents(seed, sym, 1)
    }
    // two components + a long chain: star rounds keep components
    // separate (no over-merge) while compressing the 8-chain in
    // O(log) cycles — 3 cycles suffice where propagation needs 7 pulls
    val twoCC = (Seq((10L, 11L)) ++ (1L to 7L).map(i => (i, i + 1)))
      .toDF("a", "b")
    val seed2 = twoCC.select($"a".as("doc_id"))
      .unionByName(twoCC.select($"b".as("doc_id"))).distinct()
      .withColumn("lbl", $"doc_id")
    val l2 = datapipe.Dedup.connectedComponents(seed2, twoCC, 3)
      .as[(Long, Long)].collect().toMap
    assert(l2 === ((1L to 8L).map(_ -> 1L) ++ Seq(10L -> 10L, 11L -> 10L)).toMap)
    // an edge-free graph converges immediately to an empty assignment
    assert(datapipe.Dedup.connectedComponents(
      sym.limit(0).select($"a".as("doc_id"), $"a".as("lbl")),
      sym.limit(0), 4).count() === 0L)
  }

  test("hub-split CC (hubDegree set) matches the window path: labels, cycle budget, loud failure") {
    // the hub-skew formulation (groupBy min + hub-broadcast/rest-join
    // split) must be label-identical to the window path and converge
    // within the SAME cycle budgets — the emission algebra is shared,
    // only the min computation differs. Covers: the diameter-4 chain
    // (2 cycles), the two-component 8-chain (3 cycles), a planted STAR
    // (the shape the split exists for — hub 0 with 50 leaves, 1 cycle:
    // already a star), the loud budget failure, and thresholds that
    // route most nodes down the broadcast path (T=1) vs only the true
    // hub (T=10) — both split ratios must agree.
    for (hubT <- Seq(1, 10)) {
      spark.conf.set("spark.graft.cc.hubDegree", hubT.toString)
      try {
        val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
        val sym = edges.unionByName(edges.select($"b".as("a"), $"a".as("b")))
        val seed = (1L to 5L).toDF("doc_id").withColumn("lbl", $"doc_id")
        assert(datapipe.Dedup.connectedComponents(seed, sym, 2)
          .as[(Long, Long)].collect().toMap ===
          (1L to 5L).map(_ -> 1L).toMap)
        intercept[IllegalArgumentException] {
          datapipe.Dedup.connectedComponents(seed, sym, 1)
        }
        val twoCC = (Seq((10L, 11L)) ++ (1L to 7L).map(i => (i, i + 1)))
          .toDF("a", "b")
        val seed2 = twoCC.select($"a".as("doc_id"))
          .unionByName(twoCC.select($"b".as("a")).select($"a".as("doc_id")))
          .distinct().withColumn("lbl", $"doc_id")
        assert(datapipe.Dedup.connectedComponents(seed2, twoCC, 3)
          .as[(Long, Long)].collect().toMap ===
          ((1L to 8L).map(_ -> 1L) ++ Seq(10L -> 10L, 11L -> 10L)).toMap)
        val star = (1L to 50L).map(i => (0L, i)).toDF("a", "b")
        val seedS = (0L to 50L).toDF("doc_id").withColumn("lbl", $"doc_id")
        assert(datapipe.Dedup.connectedComponents(seedS, star, 2)
          .as[(Long, Long)].collect().toMap ===
          (0L to 50L).map(_ -> 0L).toMap)
      } finally spark.conf.unset("spark.graft.cc.hubDegree")
    }
  }

  test("auto hub-split CC: probes fire on hubs and emergent components, 'window' forces") {
    // AUTO mode (hubDegree unset) must need NO operator knowledge from
    // the caller: with the test-scaled auto threshold (autoHubDegree=2),
    // (a) a planted star trips the INITIAL degree probe before cycle 1,
    // (b) a degree-2 chain trips the PER-CYCLE tentative-component
    // probe mid-run (no node ever exceeds degree 2 — only the growing
    // component can reveal the emerging star), and both finish label-
    // identical to the window path within the SAME cycle budgets; the
    // explicit "window" value forces the window formulation end-to-end.
    spark.conf.set("spark.graft.cc.autoHubDegree", "2")
    try {
      val star = (1L to 50L).map(i => (0L, i)).toDF("a", "b")
      val seedS = (0L to 50L).toDF("doc_id").withColumn("lbl", $"doc_id")
      assert(datapipe.Dedup.connectedComponents(seedS, star, 2)
        .as[(Long, Long)].collect().toMap ===
        (0L to 50L).map(_ -> 0L).toMap)
      val chain = (1L to 7L).map(i => (i, i + 1)).toDF("a", "b")
      val seedC = (1L to 8L).toDF("doc_id").withColumn("lbl", $"doc_id")
      assert(datapipe.Dedup.connectedComponents(seedC, chain, 3)
        .as[(Long, Long)].collect().toMap ===
        (1L to 8L).map(_ -> 1L).toMap)
      spark.conf.set("spark.graft.cc.hubDegree", "window")
      assert(datapipe.Dedup.connectedComponents(seedS, star, 2)
        .as[(Long, Long)].collect().toMap ===
        (0L to 50L).map(_ -> 0L).toMap)
    } finally {
      spark.conf.unset("spark.graft.cc.autoHubDegree")
      spark.conf.unset("spark.graft.cc.hubDegree")
    }
  }

  test("nearest_centroid: argmax ties break to the first (smallest) cell") {
    GraftExtensions.register(spark)
    // two identical centroids (cells 3 and 7) -> tie resolves to cell 3;
    // clear winner (cell 1) beats both when distinct
    val r = spark.range(1).select(
      expr("""nearest_centroid(
             |  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
             |  array(named_struct('cell', 3L, 'centroid', CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)),
             |        named_struct('cell', 7L, 'centroid', CAST(array(0.0, 1.0) AS ARRAY<FLOAT>))))""".stripMargin).as("tie"),
      expr("""nearest_centroid(
             |  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
             |  array(named_struct('cell', 3L, 'centroid', CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)),
             |        named_struct('cell', 1L, 'centroid', CAST(array(1.0, 0.1) AS ARRAY<FLOAT>))))""".stripMargin).as("win"))
      .as[(Long, Long)].head()
    assert(r === ((3L, 1L)))
  }

  test("multimodal: PNG round trip is lossless and NN resize samples even pixels") {
    import datapipe.Multimodal.ImageCodec
    val id = 42L
    val img = ImageCodec.decode(ImageCodec.synthPng(id))
    val (w, h) = ImageCodec.dims(id)
    assert((img.getWidth, img.getHeight) === ((w, h)))
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xff) === ImageCodec.pixel(id, x, y),
        s"decoded pixel ($x, $y) diverged from the formula")
    // odd dims: 7x5 -> 4x3, sampling (0,2,4,6) x (0,2,4)
    val odd = ImageCodec.decode(ImageCodec.synthPng(3L)) // dims (7, 6)
    val half = ImageCodec.halveNN(odd)
    assert((half.getWidth, half.getHeight) ===
      (((odd.getWidth + 1) / 2, (odd.getHeight + 1) / 2)))
    for (y <- 0 until half.getHeight; x <- 0 until half.getWidth)
      assert(half.getRGB(x, y) === odd.getRGB(2 * x, 2 * y))
  }

  test("multimodal: resize stub shrinks payloads deterministically, map-only") {
    val a = datapipe.Multimodal.assets(spark, sf)
    val r = datapipe.Multimodal.resize(a, 4).collect()
    val orig = a.collect().map(x => x.asset_id -> x.payload.length).toMap
    assert(r.nonEmpty)
    r.foreach { x =>
      val n = orig(x.asset_id)
      assert(x.payload.length === (n + 3) / 4) // ceil(n/4) stride sample
      assert(x.mime.endsWith(";resized=1/4"))
    }
  }

  test("multimodal: mapPartitions feature extraction is deterministic & sized") {
    val feats = datapipe.Multimodal.extractFeatures(
      datapipe.Multimodal.assets(spark, sf)).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(f => f.n_bytes > 0 && f.fake_class >= 0 && f.fake_class < 256))
    assert(feats.forall(_.sample_offsets.length == 5))
    val again = datapipe.Multimodal.extractFeatures(
      datapipe.Multimodal.assets(spark, sf)).collect()
    assert(feats.map(_.fake_class).toSeq === again.map(_.fake_class).toSeq)
  }

  test("DistributedRank: ambiguous multi-column groups do not collide") {
    import graft.operators.DistributedRank
    // ("a","b") and ("ab","") would render identically under a plain
    // mkString key; the escaped render must keep them distinct groups
    val df = Seq(
      ("a",  "b", 1), ("a",  "b", 2), ("a",  "b", 3),
      ("ab", "",  10), ("ab", "", 20),
      ("a",  null.asInstanceOf[String], 7) // null field vs the string "null"
    ).toDF("g1", "g2", "v")
    val ranked = DistributedRank.withRankStats(
      df, Seq("g1", "g2"), Seq(col("v")), nParts = 3)
      .select("g1", "g2", "v", "_rank0", "_gn").collect()
      .map(r => ((Option(r.getString(0)).orNull, Option(r.getString(1)).orNull),
                 r.getInt(2), r.getLong(3), r.getLong(4)))
    val byGroup = ranked.groupBy(_._1)
    assert(byGroup(("a", "b")).map(x => (x._2, x._3)).sorted.toSeq ===
      Seq((1, 0L), (2, 1L), (3, 2L)))
    assert(byGroup(("a", "b")).forall(_._4 === 3L), "group size of (a,b) is 3")
    assert(byGroup(("ab", "")).map(x => (x._2, x._3)).sorted.toSeq ===
      Seq((10, 0L), (20, 1L)))
    assert(byGroup(("ab", "")).forall(_._4 === 2L), "group size of (ab,) is 2")
    assert(byGroup(("a", null)).map(x => (x._2, x._3)).toSeq === Seq((7, 0L)))
    assert(byGroup(("a", null)).forall(_._4 === 1L))
  }

  test("DistributedRank: high-cardinality fallback (merge join) keeps ranks exact") {
    import graft.operators.DistributedRank
    // cap forced to 0 → every control row exceeds it → the offsets
    // attach via the shuffle merge join; ranks must be identical to the
    // Window reference at any cardinality
    val df = spark.range(500)
      .select(($"id" % 7).as("g"), (($"id" * 131) % 499).as("o"))
    val got = DistributedRank.withRankStats(
        df, Seq("g"), Seq(col("o")), nParts = 5,
        maxBroadcastControlRows = 0L)
      .select("g", "o", "_rank0", "_gn")
      .as[(Long, Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"o")
    val want = df
      .withColumn("_rank0", row_number().over(w).cast("long") - 1)
      .withColumn("_gn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g")))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("DistributedRank.renderKey is injective on adversarial rows") {
    import graft.operators.DistributedRank.renderKey
    import org.apache.spark.sql.Row
    val sep = 0.toChar.toString; val nul = 1.toChar.toString
    val rows = Seq(
      Row("a", "b"), Row("ab", ""), Row("", "ab"), Row("a" + sep, "b"),
      Row("a", sep + "b"), Row(null, "b"), Row(nul, "b"), Row("null", null),
      Row(null, null), Row("", ""), Row(sep, ""), Row("", sep))
    val keys = rows.map(renderKey)
    assert(keys.distinct.size === rows.size,
      s"collision among: ${keys.map(_.map(c => if (c < ' ') f"<${c.toInt}>" else c.toString).mkString).mkString(" | ")}")
  }

  test("d12: every planted leak is flagged; benchmark docs never appear") {
    val hits = datapipe.Dedup.queries("d12_decontaminate")(spark, sf)
      .select($"doc_id", $"n_hits").as[(Long, Long)].collect().toMap
    val bench = Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")))
      .as[(Long, Int)].collect().filter(_._1 % 50 == 0)
    val leakable = bench.filter(_._2 >= 8)
    assert(leakable.nonEmpty, "fixture has no benchmark docs with >= 8 words")
    leakable.foreach { case (id, _) =>
      assert(hits.contains(id + 5000000L), s"planted leak of doc $id missed")
    }
    // the held-out set itself is not training data
    assert(hits.keys.forall(id => id >= 5000000L || id % 50 != 0),
      "a benchmark doc appeared in the contamination report")
  }

  test("d40: paraphrase plants are invisible to the exact-gram gate yet all caught fuzzy") {
    val (bench, train) = datapipe.Dedup.fuzzyContaminationCorpus(spark, sf)
    val plants = train.filter($"doc_id" >= datapipe.Dedup.D40_OFFSET)
    val plantIds = plants.select($"doc_id").as[Long].collect().toSet
    assert(plantIds.nonEmpty)
    // 1. structural blindness of the d12-class gate: replacing every
    // 8th word caps kept runs at 7 words, so a plant shares NO 8-word
    // gram with the benchmark — the exact gate scores zero by
    // construction, which is the failure mode d40 exists to close
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ws", split($"text", " "))
      .filter(size($"ws") >= 8)
      .select(explode(expr("transform(sequence(1, size(ws) - 7), " +
        "i -> concat_ws(' ', slice(ws, i, 8)))")).as("g"))
    val sharedGrams = grams(plants)
      .join(grams(bench).distinct(), Seq("g")).count()
    assert(sharedGrams === 0L,
      "a plant shares an 8-gram with bench — the fixture no longer " +
        "separates the exact and fuzzy gates")
    // 2. the fuzzy gate catches EVERY plant, attributes it to its
    // source bench doc, and scores it in the paraphrase band
    val out = datapipe.Dedup.queries("d40_fuzzy_decontaminate")(spark, sf)
      .as[(Long, Long, Double)].collect()
    val flagged = out.map(r => r._1 -> r).toMap
    plantIds.foreach { id =>
      val r = flagged.getOrElse(id, fail(s"plant $id not flagged"))
      assert(r._2 === id - datapipe.Dedup.D40_OFFSET,
        s"plant $id best-matched bench ${r._2}, not its source")
      assert(r._3 >= 0.35 && r._3 < 1.0, s"plant $id jaccard ${r._3}")
    }
    // 3. benchmark docs themselves never appear as flagged training
    assert(out.forall { case (id, _, _) =>
      id >= datapipe.Dedup.D40_OFFSET || id % 50 != 0 })
  }

  test("d17: bloom prefilter loses no planted leak; bench docs never appear") {
    val hits = datapipe.Dedup.queries("d17_bloom_decontaminate")(spark, sf)
      .select($"doc_id", $"n_hits").as[(Long, Long)].collect().toMap
    val bench = Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")))
      .as[(Long, Int)].collect().filter(_._1 % 40 == 0)
    val leakable = bench.filter(_._2 >= 8)
    assert(leakable.nonEmpty, "fixture has no benchmark docs with >= 8 words")
    leakable.foreach { case (id, _) =>
      // no false negatives is the Bloom contract the exactness rests on
      assert(hits.contains(id + 7000000L), s"planted leak of doc $id missed")
    }
    assert(hits.keys.forall(id => id >= 7000000L || id % 40 != 0),
      "a benchmark doc appeared in the contamination report")
  }

  test("d13: planted exact copies and their originals keep no chunks") {
    val kept = datapipe.Dedup.queries("d13_chunk_dedup")(spark, sf)
      .select($"doc_id", $"kept_frac").as[(Long, Double)].collect().toMap
    val origs = Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")))
      .as[(Long, Int)].collect()
      .filter { case (id, n) => id % 7 == 0 && n >= 10 }
    assert(origs.nonEmpty, "fixture has no copyable docs with >= 10 words")
    origs.foreach { case (id, _) =>
      assert(kept(id) === 0.0, s"original $id kept chunks despite exact copy")
      assert(kept(id + 2000000L) === 0.0, s"copy of $id kept chunks")
    }
  }

  test("t11: top-word mass equals the exact per-doc mode count") {
    val got = datapipe.TextAnalysis.queries("t11_repetition")(spark, sf)
      .select($"doc_id",
        round($"top_word_frac" * $"n_words").cast("long").as("top"))
      .as[(Long, Long)].collect().toMap
    val truth = Tables.documents(spark, sf)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("m"),
        sum($"c").as("n"))
      .filter($"n" >= 3)
      .select($"doc_id", $"m").as[(Long, Long)].collect().toMap
    assert(truth.nonEmpty && got.keySet === truth.keySet)
    truth.foreach { case (id, m) =>
      assert(got(id) === m, s"doc $id: run-boundary max ${got(id)} != mode $m")
    }
  }

  test("t12: every injected PII item is counted and scrubbed") {
    val rows = datapipe.TextAnalysis.queries("t12_pii_scrub")(spark, sf)
      .select($"doc_id", $"n_emails", $"n_phones", $"n_ips", $"clean")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, e, p, i, clean) =>
      assert(e === (if (id % 3 == 0) 2L else 1L), s"doc $id email count $e")
      assert(p === 1L, s"doc $id phone count $p")
      assert(i === 1L, s"doc $id ip count $i")
      assert(clean, s"doc $id still contains PII after scrubbing")
    }
  }

  test("t13: sampling never exceeds input; saturated rates keep everything") {
    val rows = datapipe.TextAnalysis.queries("t13_domain_mix")(spark, sf)
      .select($"source", $"n_before", $"rate_ppm", $"n_kept")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, before, rate, keptN) =>
      assert(keptN <= before, s"$src kept more docs than it has")
      if (rate == 1000000L)
        assert(keptN === before, s"$src rate saturated but docs dropped")
    }
  }

  test("t16: no source exceeds the cap; under-cap sources keep everything") {
    val before = Tables.documents(spark, sf).groupBy($"source")
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    val rows = datapipe.TextAnalysis.queries("t16_domain_cap")(spark, sf)
      .select($"source", $"n_kept", $"max_rank")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, keptN, maxRank) =>
      assert(keptN <= 50L, s"$src kept $keptN docs, above the cap")
      assert(maxRank === keptN,
        s"$src rank sequence has gaps: max_rank=$maxRank kept=$keptN")
      if (before(src) <= 50L)
        assert(keptN === before(src), s"$src under cap but docs dropped")
    }
    // every source in the input survives capping (cap keeps, never empties)
    assert(rows.map(_._1).toSet === before.keySet)
  }

  test("d15: learned-cell SemDeDup still removes every planted copy") {
    val out = datapipe.Similarity.queries("d15_semdedup_cells")(spark, sf)
      .select($"vec_id", $"keeper_id").as[(Long, Long)].collect()
    val removed = out.map(_._1).toSet
    val planted = Tables.embeddings(spark, sf).select($"vec_id").as[Long]
      .collect().filter(_ % 10 == 0).map(_ + 1000000L)
    assert(planted.nonEmpty)
    // identical vectors share a learned cell (deterministic argmax), so
    // the clustering cannot cost planted-copy recall
    planted.foreach(id =>
      assert(removed.contains(id), s"planted copy $id not removed"))
    out.foreach { case (v, k) => assert(k < v, s"vec $v kept by higher id $k") }
  }

  test("t14: per-doc NLL is an exact integer sum inside the vocab bounds") {
    val rows = datapipe.TextAnalysis.queries("t14_unigram_nll")(spark, sf)
      .select($"doc_id", $"n_words", $"avg_nll")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // vocab nll range recomputed independently: every per-doc average of
    // per-word nlls must lie within [min, max] word nll
    val words = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("w")).filter($"w" =!= "")
    val nTot = words.count().toDouble
    val counts = words.groupBy($"w").agg(count(lit(1)).as("c"))
      .select($"c").as[Long].collect()
    val lo = -math.log(counts.max / nTot)
    val hi = -math.log(counts.min / nTot)
    rows.foreach { case (id, n, nll) =>
      assert(n >= 1, s"doc $id has no words")
      assert(nll >= lo - 1e-6 && nll <= hi + 1e-6,
        s"doc $id avg_nll $nll outside vocab range [$lo, $hi]")
    }
  }

  test("d14: every planted semantic copy is removed, kept by a lower id") {
    val out = datapipe.Similarity.queries("d14_semdedup")(spark, sf)
      .select($"vec_id", $"keeper_id").as[(Long, Long)].collect()
    val removed = out.map(_._1).toSet
    val planted = Tables.embeddings(spark, sf).select($"vec_id").as[Long]
      .collect().filter(_ % 10 == 0).map(_ + 1000000L)
    assert(planted.nonEmpty)
    planted.foreach(id =>
      assert(removed.contains(id), s"planted copy $id not removed"))
    out.foreach { case (v, k) =>
      assert(k < v, s"removed vec $v kept by a HIGHER id $k")
    }
  }

  test("m04: frame sums from the byte decode match the pixel formula") {
    import graft.datapipe.Multimodal.VideoCodec
    val rows = datapipe.Multimodal.queries("m04_video_frames")(spark, sf)
      .select($"asset_id", $"n_frames", $"f0_sum", $"f3_sum", $"motion")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // independent recomputation: straight from the pixel formula, never
    // touching the payload bytes the operator decoded
    def pxSum(id: Long, f: Int): Long =
      (for (y <- 0 until VideoCodec.H; x <- 0 until VideoCodec.W)
        yield (x * 7 + y * 13 + f * 31 + id) % 256).sum
    rows.foreach { case (id, n, f0, f3, motion) =>
      assert(n === VideoCodec.nFrames(id))
      val step = math.max(n / 4, 1)
      assert(f0 === pxSum(id, 0), s"asset $id frame-0 sum")
      assert(f3 === pxSum(id, math.min(3 * step, n - 1)), s"asset $id frame-3 sum")
      assert(motion >= 0)
    }
  }

  test("q66: SCD2 merge versions every changed key exactly once") {
    val rows = operators.Extras.queries("q66_scd2_merge")(spark, sf)
      .select($"c_custkey", $"c_acctbal", $"valid_from",
        $"valid_to", $"is_current")
      .as[(Long, Double, Long, Option[Long], Boolean)].collect()
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, vs) =>
      // exactly one current version per key, always open-ended
      val current = vs.filter(_._5)
      assert(current.length === 1, s"key $k has ${current.length} current rows")
      assert(current.head._4.isEmpty, s"key $k current row has valid_to")
      if (k % 5 == 0) {
        assert(vs.length === 2, s"changed key $k has ${vs.length} versions")
        val closed = vs.filter(!_._5).head
        assert(closed._4 === Some(1000L))
        assert(math.abs(current.head._2 - closed._2 - 100.0) < 1e-9,
          s"key $k new version does not carry the +100 update")
      } else assert(vs.length === 1, s"untouched key $k duplicated")
    }
  }

  test("q67: the funnel is monotone and its first stage count is exact") {
    val (nUsers, nView, nVC, nVCP) =
      operators.Extras.queries("q67_funnel")(spark, sf)
        .as[(Long, Long, Long, Long)].head()
    assert(nUsers >= nView && nView >= nVC && nVC >= nVCP && nVCP >= 0,
      s"funnel not monotone: $nUsers >= $nView >= $nVC >= $nVCP")
    val viewers = Tables.events(spark, sf)
      .filter($"event_type" === "view")
      .select($"user_id").distinct().count()
    assert(nView === viewers, "stage-1 count disagrees with a direct count")
  }

  test("q68: interpolated slots stay inside each user's value envelope") {
    val rows = operators.Extras.queries("q68_resample_interpolate")(spark, sf)
      .select($"user_id", $"tsec", $"value_interp")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, t, _) =>
      assert(t % 3600 === 0, s"user $u slot $t off the hourly grid")
    }
    val env = Tables.events(spark, sf).filter($"user_id" % 25 === 0)
      .groupBy($"user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (u, t, v) =>
      val (lo, hi) = env(u)
      // a convex combination of two observed values cannot escape the
      // observed envelope
      assert(v >= lo - 1e-9 && v <= hi + 1e-9,
        s"user $u slot $t interpolated $v outside [$lo, $hi]")
    }
  }

  test("q69: every user is active in their own cohort week") {
    val rows = operators.Extras.queries("q69_retention")(spark, sf)
      .select($"cohort", $"week_offset", $"n_users")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val atZero = rows.filter(_._2 == 0L).map(_._3).sum
    val users = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(atZero === users,
      s"offset-0 cohort sizes $atZero != $users distinct users")
    val cohortSize = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (c, o, n) =>
      assert(n <= cohortSize(c),
        s"cohort $c offset $o retains $n > cohort size ${cohortSize(c)}")
    }
  }

  test("q63: the kept row per key is the true (ts, event_id) argmax") {
    val kept = operators.Windows.queries("q63_keep_latest")(spark, sf)
      .select($"user_id", $"event_type", $"event_id")
      .as[(Long, String, Long)].collect()
      .map { case (u, t, e) => (u, t) -> e }.toMap
    val truth = Tables.events(spark, sf)
      .groupBy($"user_id", $"event_type")
      .agg(max(struct($"ts", $"event_id")).as("m"))
      .select($"user_id", $"event_type", $"m.event_id")
      .as[(Long, String, Long)].collect()
      .map { case (u, t, e) => (u, t) -> e }.toMap
    assert(kept === truth)
  }

  test("t43: confusion matrix aggregates t01 exactly; error structure visible") {
    val t01 = datapipe.TextAnalysis.queries("t01_langid")(spark, sf)
      .select($"lang", $"predicted").as[(String, String)].collect()
    val out = datapipe.TextAnalysis.queries("t43_langid_confusion")(spark, sf)
      .as[(String, String, Long, Long, Double)].collect()
    val conf = t01.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tot = t01.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(out.map(r => (r._1, r._2)).toSet === conf.keySet)
    out.foreach { case (l, p, n, t, sh) =>
      assert(n === conf((l, p)) && t === tot(l), s"($l,$p)")
      assert(sh === n.toDouble / t)
    }
    // per-true-lang shares sum to 1 and the matrix is non-trivial:
    // diagonal and off-diagonal mass both present. On this synthetic
    // corpus t01 reads NEAR-CHANCE (~0.22 diagonal vs 0.20 chance) —
    // the lexicon barely correlates with the label column — and
    // surfacing that is precisely the job of an eval harness: a router
    // shipped on t01's predictions without this table would silently
    // mix languages
    out.groupBy(_._1).foreach { case (l, rs) =>
      assert(math.abs(rs.map(_._5).sum - 1.0) < 1e-9, s"lang=$l")
    }
    assert(out.map(_._3).sum === t01.length.toLong)
    assert(out.exists(r => r._1 == r._2 && r._3 > 0))
    assert(out.exists(r => r._1 != r._2), "perfect classifier — eval vacuous")
  }

  test("q90: rolling median replays the sorted-middle rule; outlier-robust") {
    val out = operators.Windows.queries("q90_rolling_median")(spark, sf)
      .select($"event_id", $"med5").as[(Long, Double)].collect().toMap
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", date_trunc("second", $"ts"))
      .select($"user_id", unix_timestamp($"ts").as("s"), $"event_id",
        $"value")
      .as[(Long, Long, Long, Double)].collect()
    val expected = ev.groupBy(_._1).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.indices.drop(4).map { i =>
        val frame = sorted.slice(i - 4, i + 1).map(_._4).sorted
        sorted(i)._3 -> frame(2)
      }
    }
    assert(out.keySet === expected.keySet)
    expected.foreach { case (id, m) => assert(out(id) === m, s"id=$id") }
    assert(out.nonEmpty, "no full frames — fixture degenerate")
    // robustness: the median of a 5-frame is one of the frame's values,
    // so unlike the mean it can never leave the observed range
    assert(out.values.forall(m => ev.exists(_._4 == m)))
  }

  test("q64: islands are disjoint and separated by more than the gap") {
    val rows = operators.Windows.queries("q64_gaps_islands")(spark, sf)
      .select($"user_id", $"island", $"start_sec", $"end_sec", $"n_events")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, i, s0, e0, n) =>
      assert(s0 <= e0, s"user $u island $i inverted interval")
      assert(n >= 3)
    }
    rows.groupBy(_._1).values.foreach { isl =>
      isl.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 > a._4 + 86400,
            s"user ${a._1}: islands ${a._2}/${b._2} not gap-separated")
        case _ => ()
      }
    }
  }

  test("t15: learned merge is the true weighted argmax; token accounting exact") {
    val rows = datapipe.TextAnalysis.queries("t15_bpe_train")(spark, sf)
      .select($"round", $"pair", $"n", $"total_tokens")
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(rows.length === 2)
    // independent recomputation over RAW words — no distinct-word
    // compression, the path the query never takes
    val words = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("w")).filter($"w" =!= "")
    val chars = words.agg(sum(length($"w"))).as[Long].head()
    val top1 = words.filter(length($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> " +
        "concat(substring(w, i, 1), ' ', substring(w, i + 1, 1)))")).as("p"))
      .groupBy($"p").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"p").limit(1)
      .as[(String, Long)].head()
    assert((rows(0)._2, rows(0)._3) === top1)
    // each applied merge of a two-symbol pair removes exactly one token;
    // for these learned pairs (distinct symbols) merges == pair count
    assert(rows(0)._4 === chars - rows(0)._3,
      "round-1 token accounting drifted")
    assert(rows(1)._4 === rows(0)._4 - rows(1)._3,
      "round-2 token accounting drifted")
  }

  test("t15: 8 checkpointed rounds run linearly; artifact equals direct recompute at every depth") {
    // the eager trainer mode: per-round argmax materialized (1 row),
    // word table checkpointed every 4 rounds — lineage stays bounded,
    // so 8 rounds must not blow up analysis or recompute early rounds
    val t0 = System.nanoTime()
    val rows = datapipe.TextAnalysis.bpeTrain(
        Tables.documents(spark, sf), rounds = 8, eager = true)
      .select($"round", $"pair", $"n", $"vocab", $"total_tokens")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows.length === 8)
    // every round's merge count is positive and token totals fall by
    // EXACTLY the applied merge count, round over round
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 === a._5 - b._3,
        s"round ${b._1}: tokens ${a._5} -> ${b._5} but n=${b._3}")
    }
    assert(rows.forall(_._3 > 0))
    // artifact == direct recompute: the served entries (t15/t15b/t15c
    // read the persisted trained-tokenizer artifact) must be row-equal
    // to this from-scratch eager run at every published depth...
    Seq(("t15_bpe_train", 2), ("t15b_bpe_train_r4", 4),
        ("t15c_bpe_train_r8", 8)).foreach { case (q, depth) =>
      val served = datapipe.TextAnalysis.queries(q)(spark, sf)
        .select($"round", $"pair", $"n", $"vocab", $"total_tokens")
        .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
      assert(served.toSeq === rows.take(depth).toSeq,
        s"$q diverged from the direct eager trainer")
    }
    // ...and to the LAZY single-DAG trainer (the oracle-parity mode)
    val lazyRows = datapipe.TextAnalysis.bpeTrain(
        Tables.documents(spark, sf), rounds = 2)
      .select($"round", $"pair", $"n", $"vocab", $"total_tokens")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.take(2).toSeq === lazyRows.toSeq,
      "eager trainer diverged from the lazy single-DAG path")
    // the word-table snapshots the encoders broadcast match a direct
    // merge replay at each snapshot depth
    Seq(2, 4).foreach { depth =>
      val direct = datapipe.TextAnalysis.bpeMergedWords(
          Tables.documents(spark, sf), rounds = depth)
        .select($"w", $"freq", $"seq")
        .as[(String, Long, String)].collect().toSet
      val art = spark.read.parquet(
          s"${datapipe.TextAnalysis.bpeArtifact(spark, sf)}/words/round=$depth")
        .select($"w", $"freq", $"seq")
        .as[(String, Long, String)].collect().toSet
      assert(art === direct, s"artifact word table at depth $depth drifted")
    }
    // loose ceiling only to catch lineage blowup (8 rounds of this
    // corpus run in a few seconds when checkpointing works; an
    // unbounded-lineage run is minutes)
    assert(secs < 120, f"8 rounds took $secs%.0f s — lineage blowup?")
  }

  test("s09: quantized two-stage rerank agrees with the exact top-10") {
    val exact = datapipe.Similarity.queries("s01_topk_cosine")(spark, sf)
      .select($"vec_id").as[Long].collect().toSet
    val two = datapipe.Similarity.queries("s09_two_stage_rerank")(spark, sf)
      .select($"vec_id", $"approx_cosine", $"cosine")
      .as[(Long, Double, Double)].collect()
    assert(two.length === 10)
    val overlap = two.count(r => exact.contains(r._1))
    assert(overlap >= 8, s"two-stage top-10 overlaps exact only $overlap/10")
    two.foreach { case (id, approx, cos) =>
      assert(math.abs(approx - cos) <= 0.05,
        s"vec $id: int8 approximation drifted ${math.abs(approx - cos)}")
    }
  }

  test("m05: every planted byte-identical image copy meets its source") {
    val groups = datapipe.Multimodal.queries("m05_image_phash_dedup")(spark, sf)
      .select($"canonical_id", $"n_copies").as[(Long, Long)].collect().toMap
    // base-corpus hash keys, computed through the same decode kernel
    val keys = datapipe.Multimodal.imagePHash(
      datapipe.Multimodal.imageAssets(spark, sf)).collect()
      .map { case (id, w, h, a) => id -> (w, h, a) }.toMap
    val planted = keys.keys.filter(_ % 11 == 0)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      // the +10000 copy decodes to id's exact pixels, so id's bucket has
      // >= 2 members; its canonical is the smallest BASE id sharing the
      // key (copies are +10000, never the min)
      val canonical = keys.collect { case (i, k) if k == keys(id) => i }.min
      assert(groups.get(canonical).exists(_ >= 2),
        s"planted copy of image $id not grouped (canonical $canonical)")
    }
  }

  test("m06: every planted byte-identical track meets its source") {
    val groups = datapipe.Multimodal.queries("m06_audio_phash_dedup")(spark, sf)
      .select($"canonical_id", $"n_copies").as[(Long, Long)].collect().toMap
    val base = graft.Tables.documents(spark, sf)
      .select($"doc_id").as[Long]
      .mapPartitions(_.map(id => (id, datapipe.Multimodal.PcmCodec.synthPcm(id))))
    val keys = datapipe.Multimodal.audioPHash(base).collect()
      .map { case (id, n, a) => id -> (n, a) }.toMap
    val planted = keys.keys.filter(_ % 13 == 0)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val canonical = keys.collect { case (i, k) if k == keys(id) => i }.min
      assert(groups.get(canonical).exists(_ >= 2),
        s"planted copy of track $id not grouped (canonical $canonical)")
    }
  }

  test("q78: merged-sketch percentiles land within half a bin width") {
    val got = operators.AdvancedAggs.queries("q78_quantile_rollup")(spark, sf)
      .select($"week".cast("string"), $"p50_est", $"p90_est")
      .as[(String, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    // exact ranked values straight off the facts
    val byWeek = graft.Tables.events(spark, sf)
      .select(date_trunc("week", $"ts").cast("string").as("w"), $"value")
      .as[(String, Double)].collect().groupBy(_._1)
    val (lo, hi) = {
      val vs = byWeek.values.flatten.map(_._2)
      (vs.min, vs.max)
    }
    val halfBin = (hi - lo) / 64 / 2
    got.foreach { case (w, p50, p90) =>
      val sorted = byWeek(w).map(_._2).sorted
      def ranked(q: Double) = sorted(math.ceil(sorted.length * q).toInt - 1)
      assert(math.abs(p50 - ranked(0.5)) <= halfBin * 1.001,
        s"week $w p50 off by ${math.abs(p50 - ranked(0.5))} (> $halfBin)")
      assert(math.abs(p90 - ranked(0.9)) <= halfBin * 1.001,
        s"week $w p90 off by ${math.abs(p90 - ranked(0.9))} (> $halfBin)")
    }
  }

  test("s11: PQ codes are in-range, non-collapsed, and explain variance") {
    val rows = datapipe.Similarity.queries("s11_product_quantization")(spark, sf)
      .select($"vec_id", $"c0", $"c1", $"c2", $"c3", $"recon_d2")
      .as[(Long, Int, Int, Int, Int, Double)].collect()
    assert(rows.nonEmpty)
    val codes = rows.map(r => Seq(r._2, r._3, r._4, r._5))
    assert(codes.flatten.forall(c => c >= 0 && c < 8))
    // training from the %8 seeding must not collapse any subspace's
    // codebook to a single surviving codeword
    (0 until 4).foreach { j =>
      assert(codes.map(_(j)).distinct.length > 1, s"subspace $j collapsed")
    }
    // reconstruction strictly beats the zero codebook (mean squared
    // norm). On these isotropic synthetic embeddings that margin is
    // small by nature — 8 codewords in a 16-dim subspace can't explain
    // much variance of a random ball — so the pin is strict improvement,
    // not a variance ratio.
    val meanErr = rows.map(_._6).sum / rows.length
    val meanNorm = graft.Tables.embeddings(spark, sf)
      .select(expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
      .as[Double].collect()
    assert(meanErr < meanNorm.sum / meanNorm.length,
      s"PQ reconstruction no better than the zero codebook: $meanErr")
  }

  test("s12: rerank distances are exact and ADC recalls true neighbors") {
    val got = datapipe.Similarity.queries("s12_pq_adc")(spark, sf)
      .select($"vec_id", $"exact_d2").as[(Long, Double)].collect()
    assert(got.length === 10)
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
    // independent brute-force integer-L2: the rerank's exact_d2 must
    // match to the quantum (1e-16 per fixed-point unit), and the ADC
    // candidate stage must recall a nontrivial share of the TRUE top-10
    // (4-byte codes on isotropic vectors: observed 3/10; pin >= 2)
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    val q = emb(0L)
    def d2(x: Array[Float]): Long = x.zip(q).map { case (a, b) =>
      val t = math.round(a.toDouble * 1e8) - math.round(b.toDouble * 1e8); t * t
    }.sum
    got.foreach { case (id, e) =>
      assert(math.abs(e - d2(emb(id)).toDouble / 1e16) < 1e-9, s"vec $id") }
    val trueTop = emb.keys.filter(_ != 0L).toSeq
      .sortBy(id => (d2(emb(id)), id)).take(10).toSet
    assert(got.map(_._1).count(trueTop) >= 2,
      s"ADC recalled ${got.map(_._1).count(trueTop)}/10 true neighbors")
  }

  test("t18: encoder token totals reconcile with the trainer's accounting") {
    // t15 reports corpus total_tokens after each merge round; encoding
    // the corpus with the same 2-round tokenizer must sum to exactly
    // the round-2 figure — trainer and encoder agree on every merge
    val trained = datapipe.TextAnalysis.queries("t15_bpe_train")(spark, sf)
      .select($"round", $"total_tokens").as[(Int, Long)].collect().toMap
    val enc = datapipe.TextAnalysis.queries("t18_bpe_encode")(spark, sf)
      .select($"n_words", $"n_tokens").as[(Long, Long)].collect()
    assert(enc.map(_._2).sum === trained(2))
    // every word encodes to >= 1 token, and merges only shrink
    assert(enc.forall { case (w, t) => t >= w })
  }

  test("d18: exact-copy docs are covered end-to-end by one maximal span") {
    val spans = datapipe.Dedup.queries("d18_span_dedup")(spark, sf)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val nWords = datapipe.Dedup.corpus(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    // every %7 doc has a verbatim copy at +2000000 — all of its grams are
    // duplicated, so the island merge must yield exactly [0, n_words)
    val full = nWords.keys.filter(id => id < 1000000 && id % 7 == 0 &&
      nWords(id) >= 15)
    assert(full.nonEmpty)
    full.foreach { id =>
      Seq(id, id + 2000000L).foreach { side =>
        assert(spans(side).map(s => (s._2, s._3)).toSeq ===
          Seq((0L, nWords(id))),
          s"doc $side: expected one whole-doc span of ${nWords(id)} tokens")
      }
    }
  }

  test("RunningTotal: distributed prefix sum matches the sequential fold") {
    import graft.operators.RunningTotal
    // k = id * 131 mod 9973 (prime > max id) is INJECTIVE on 0..999 —
    // the operator's unique-total-order contract must hold, or a tie's
    // accumulation order would be ambiguous and the check circular
    val rows = (0L until 1000L).map(id => ((id * 131L) % 9973L, (id % 13) + 1))
    assert(rows.map(_._1).distinct.size === rows.size)
    val got = RunningTotal
      .inclusivePrefixSum(rows.toDF("k", "v"), "k", "v", nParts = 7)
      .select("k", "v", "cum_end").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    // reference computed INDEPENDENTLY from the input rows
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (k, v) => acc += v; (k, v, acc) }
    assert(got.toSeq === want)
    assert(got.length === rows.size)
  }

  test("RunningTotal: more partitions than rows (empty partitions) stays exact") {
    import graft.operators.RunningTotal
    val df = Seq((3L, 10L), (1L, 5L), (2L, 7L)).toDF("k", "v")
    val got = RunningTotal.inclusivePrefixSum(df, "k", "v", nParts = 16)
      .select("k", "cum_end").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 5L), (2L, 12L), (3L, 22L)))
  }

  test("t24: no duplicate group straddles train and eval, and groups exist") {
    // recompute the per-doc assignment with the query's own building
    // blocks and assert the INVARIANT the aggregate output can't show:
    // every content-hash group maps to exactly one split
    import org.apache.spark.sql.expressions.Window
    val assigned = datapipe.Dedup.corpus(spark, sf)
      .select($"doc_id", graft.Dets.phash($"text").as("h"))
      .withColumn("rep", min($"doc_id").over(Window.partitionBy($"h")))
      .withColumn("split",
        when(graft.Dets.phash(concat(lit("split:"), $"rep".cast("string")))
          % 100 < 90, lit("train")).otherwise(lit("eval")))
    val straddlers = assigned.groupBy($"h")
      .agg(countDistinct($"split").as("ns"), count(lit(1)).as("n"))
    assert(straddlers.filter($"ns" =!= 1).count() === 0L,
      "a duplicate group was split across train and eval")
    // the fixture's planted duplicates make the invariant non-vacuous
    assert(straddlers.filter($"n" > 1).count() > 0L,
      "no multi-doc groups in fixture — the leakage pin is vacuous")
    // and the registry output agrees with an independent total
    val out = datapipe.TextAnalysis.queries("t24_leakage_free_split")(spark, sf)
      .select($"split", $"n_docs").as[(String, Long)].collect().toMap
    assert(out.values.sum === datapipe.Dedup.corpus(spark, sf).count())
  }

  test("t23: feature count is 2n-1 grams per doc and the label is the sum's sign") {
    val out = datapipe.TextAnalysis.queries("t23_classifier_score")(spark, sf)
      .select($"doc_id", $"n_feats", $"mean_logit", $"label")
      .as[(Long, Long, Double, String)].collect()
    assert(out.nonEmpty)
    // independent token count: n tokens yield n unigrams + (n-1) bigrams
    val nToks = Tables.documents(spark, sf)
      .select($"doc_id", expr("size(filter(split(text, ' '), x -> x <> ''))")
        .cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    out.foreach { case (id, nf, logit, label) =>
      assert(nf === 2 * nToks(id) - 1, s"doc $id: feats $nf toks ${nToks(id)}")
      // milli-weights lie in [-1000, 1000], so the mean logit is in [-1, 1]
      assert(logit >= -1.0 && logit <= 1.0, s"doc $id logit $logit")
      // label is the integer sum's sign; away from the rounding boundary
      // the rounded mean must agree with it
      if (math.abs(logit) > 1e-6)
        assert((logit > 0) === (label == "keep"), s"doc $id $logit $label")
      assert(label == "keep" || label == "cut")
    }
    // every tokenizable doc scores — the classifier drops nothing silently
    assert(out.length === nToks.count(_._2 >= 1))
  }

  test("d20: the representative is the true quality argmax of its d06 cluster") {
    import graft.functions.WordStats
    val reps = datapipe.Dedup.queries("d20_cluster_representatives")(spark, sf)
      .as[(Long, Long, Double, Long)].collect()
    assert(reps.nonEmpty)
    // members come from the independently-green d06 registry output;
    // quality recomputed over the same corpus
    val members = datapipe.Dedup.queries("d06_dedup_clusters")(spark, sf)
      .as[(Long, Long)].collect()
    val qual = datapipe.Dedup.corpus(spark, sf)
      .withColumn("ws", WordStats.word_stats($"text"))
      .withColumn("n_words", WordStats.nWords($"ws"))
      .filter($"n_words" >= 1)
      .select($"doc_id",
        (WordStats.nDistinct($"ws") / $"n_words" * 0.4 +
         (lit(1.0) - WordStats.nStop($"ws") / $"n_words") * 0.3 +
         least($"n_words" / 100.0, lit(1.0)) * 0.3).as("q"))
      .as[(Long, Double)].collect().toMap
    val byCluster = members.groupBy(_._2)
    assert(reps.length === byCluster.size, "one representative per d06 cluster")
    reps.foreach { case (cid, repDoc, _, nMembers) =>
      val ms = byCluster(cid).map(_._1)
      assert(ms.length.toLong === nMembers, s"cluster $cid size mismatch")
      val want = ms.map(id => (id, qual(id))).sortBy { case (id, q) => (-q, id) }
      assert(repDoc === want.head._1,
        s"cluster $cid rep $repDoc is not the quality argmax ${want.head}")
    }
  }

  test("d19: every bench doc is exposed by its planted leak; fractions consistent") {
    val out = datapipe.Dedup.queries("d19_eval_exposure")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    // one row per bench doc (doc_id % modulus == 0), no drops
    val nBench = Tables.documents(spark, sf)
      .filter($"doc_id" % 50 === 0).count()
    assert(out.length.toLong === nBench)
    out.foreach { case (id, nGrams, nHit, nTrainDocs, frac) =>
      // the planted 16-word-prefix leak guarantees exposure; the exact
      // hit count is the prefix's DISTINCT gram count (repetition can
      // shrink the window's 9 grams), so pin positivity, not 9
      assert(nHit >= 1L, s"bench doc $id not exposed despite planted leak")
      assert(nHit <= nGrams)
      assert(nTrainDocs >= 1L)
      assert(math.abs(frac - nHit.toDouble / nGrams) < 1e-6)
    }
  }

  test("s13: every filtered-ANN hit shares the query's label AND bucket") {
    val out = datapipe.Similarity.queries("s13_filtered_ann")(spark, sf)
      .as[(Long, Int, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    // independent re-derivation of label and sign-bucket per vec_id
    val meta = Tables.embeddings(spark, sf)
      .as[(Long, Array[Float], Int)].collect()
      .map { case (id, e, l) =>
        val b = (0 until 8).map(j => if (e(j) > 0.0f) 1 << j else 0).sum
        id -> (l, b)
      }.toMap
    out.foreach { case (qid, label, rnk, vid, _) =>
      assert(vid !== qid)
      assert(meta(vid)._1 === label, s"hit $vid outside query $qid's label")
      assert(meta(vid)._1 === meta(qid)._1)
      assert(meta(vid)._2 === meta(qid)._2, s"hit $vid outside $qid's bucket")
      assert(rnk >= 1 && rnk <= 5)
    }
    // per query: ranks contiguous from 1, cosine non-increasing in rank
    out.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 >= b._5)
        case _ =>
      }
    }
  }

  test("d21: banding recall is measured against a complete exact ground truth") {
    val rows = datapipe.Dedup.queries("d21_lsh_recall")(spark, sf)
      .as[(Double, Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === Seq(0.5, 0.8))
    val Array(lo, hi) = rows
    assert(lo._3 === hi._3, "candidate set must not depend on the threshold")
    // threshold monotonicity (structural: truth@0.8 ⊆ truth@0.5)
    assert(hi._2 <= lo._2 && hi._4 <= lo._4)
    Seq(lo, hi).foreach { case (_, nTruth, nCand, hits, recall, precision) =>
      assert(hits <= nTruth && hits <= nCand)
      assert(recall === hits.toDouble / nTruth)
      assert(precision === hits.toDouble / nCand)
    }
    // the mid-similarity plants put truth pairs in [0.5, 0.8) …
    assert(lo._2 > hi._2, "no mid-similarity truth pairs — the plant is dead")
    // … and banding drops some of them: measured recall@0.5 < 1 is the
    // whole point of the eval (deterministic: hashes, not RNG)
    assert(lo._4 < lo._2, "bands caught every mid-sim pair — S-curve invisible")
  }

  test("d32: band-plan frontier is monotone in r and consistent with d21") {
    val out = datapipe.Dedup.queries("d32_band_plan")(spark, sf)
      .as[(Int, Int, Long, Long, Long, Double, Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq((2, 8), (4, 4), (8, 2), (16, 1)), "config order")
    out.foreach { case (_, _, nProbe, t50, h50, r50, t80, h80, r80) =>
      assert(h50 <= t50 && h80 <= t80 && t80 <= t50 && h80 <= h50)
      assert(r50 === h50.toDouble / t50 && r80 === h80.toDouble / t80)
      // every caught truth pair collides on >= 1 band, i.e. costs
      // >= 1 probe
      assert(nProbe >= h50)
    }
    // truth is config-independent
    assert(out.map(_._4).distinct.length === 1)
    assert(out.map(_._7).distinct.length === 1)
    // a pair colliding on a coarse band collides on every sub-band of
    // it, so shrinking r can only ADD probes; recall is monotone for
    // the same reason — and strictly so somewhere (the frontier bends)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, s"probe bill fell from r=${a._2} to r=${b._2}")
      assert(b._6 >= a._6 - 1e-12 && b._9 >= a._9 - 1e-12,
        s"recall fell from r=${a._2} to r=${b._2}")
    }
    assert(out.last._3 > out.head._3, "probe bill flat — vacuous")
    assert(out.last._6 > out.head._6, "recall@0.5 flat — frontier invisible")
    // the shipped (4,4) row must agree with d21's independent measure:
    // identical truth counts and hit counts (the hit predicate IS
    // candidate-set membership), and the probe bill — which counts
    // multiplicity — upper-bounds d21's distinct candidate-pair count
    val d21 = datapipe.Dedup.queries("d21_lsh_recall")(spark, sf)
      .as[(Double, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val shipped = out.find(r => r._1 == 4 && r._2 == 4).get
    assert((shipped._4, shipped._5) === ((d21(0.5)._2, d21(0.5)._4)))
    assert((shipped._7, shipped._8) === ((d21(0.8)._2, d21(0.8)._4)))
    assert(shipped._3 >= d21(0.5)._3,
      "probe bill below d21's distinct candidate count")
  }

  test("d33: containment pairs replay exactly; prefix quotes read C=1 at low J") {
    val out = datapipe.Dedup.queries("d33_containment")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // plain-Scala replay: corpus + near/exact copies + quote plants,
    // 3-word shingle sets (string_split grammar: single space, empties
    // kept by split then shingled), df cap, containment filter
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val all = docs ++
      docs.filter(_._1 % 10 == 0).map { case (i, t) =>
        (i + 1000000L, t + " near duplicate suffix") } ++
      docs.filter(_._1 % 7 == 0).map { case (i, t) => (i + 2000000L, t) } ++
      docs.filter { case (i, t) =>
        i % 11 == 0 && t.split(" ", -1).length >= 10 }
        .map { case (i, t) =>
          val w = t.split(" ", -1)
          (i + 4000000L,
            w.take(math.max(5, w.length * 3 / 10)).mkString(" ")) }
    val sets = all.map { case (i, t) =>
      val w = t.split(" ", -1)
      i -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    val df = sets.values.flatten.groupBy(identity).map {
      case (g, _) => g -> sets.values.count(_.contains(g)) }
    val capped = sets.view.mapValues(_.filter(df(_) <= 64)).toMap
    val inv = capped.toSeq.flatMap { case (i, gs) => gs.map(_ -> i) }
      .groupBy(_._1).values.filter(_.length >= 2)
    val inter = scala.collection.mutable.Map.empty[(Long, Long), Long]
    inv.foreach { ds =>
      val ids = ds.map(_._2).sorted
      for (a <- ids; b <- ids if a < b)
        inter((a, b)) = inter.getOrElse((a, b), 0L) + 1L
    }
    val expected = inter.flatMap { case ((a, b), n) =>
      val (sza, szb) = (capped(a).size.toLong, capped(b).size.toLong)
      val aSub = sza < szb || (sza == szb && a < b)
      val (dSub, dSup, szS, szP) =
        if (aSub) (a, b, sza, szb) else (b, a, szb, sza)
      val cont = n * 1000000L / szS
      val j = n.toDouble / (sza + szb - n)
      if (cont >= 800000L && j < 0.5)
        Some((dSub, dSup) -> ((dSub, dSup, n, szS, szP, cont, j)))
      else None
    }.toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (k, e) => assert(out(k) === e, s"pair=$k") }
    // every planted quote reads containment 1.0 against its host, and
    // the output contains ONLY sub-J-0.5 pairs (the asymmetric increment)
    val plants = out.filter { case ((sub, sup), _) =>
      sub >= 4000000L && sup === sub - 4000000L }
    assert(plants.nonEmpty, "no quote plant surfaced")
    plants.values.foreach { r =>
      assert(r._6 === 1000000L, s"quote ${r._1} not fully contained") }
    assert(out.values.forall(_._7 < 0.5))
  }

  test("d34: repetition-structure pairs replay; ciphered plants found byte-disjoint") {
    val out = datapipe.Dedup.queries("d34_crosslingual")(spark, sf)
      .as[(Long, Long, Long, String, String)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text", $"lang").as[(Long, String, String)].collect()
    def cipherWord(w: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      "z" + md.digest(s"c:$w".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
    }
    val corpus = docs ++ docs.filter(_._1 % 19 == 0).map { case (i, t, _) =>
      (i + 5000000L,
        t.split(" ").filter(_.nonEmpty).map(cipherWord).mkString(" "), "xx") }
    def pattern(t: String): Seq[Int] = {
      val ws = t.split(" ").filter(_.nonEmpty)
      val lastAt = scala.collection.mutable.Map.empty[String, Int]
      ws.zipWithIndex.map { case (w, i) =>
        val p = lastAt.get(w).map(_ + 1).getOrElse(0)
        lastAt(w) = i; p
      }.toSeq
    }
    // docs with no repeated word carry no repetition-structure signal
    // and are gated out before the pair join (the all-zeros pattern
    // would otherwise clique every equal-length all-distinct-word doc)
    val fps = corpus.map { case (i, t, l) => (i, l, pattern(t)) }
      .filter(_._3.exists(_ > 0))
    val expected = (for {
      x <- fps; y <- fps
      if x._1 < y._1 && x._2 != y._2 && x._3 == y._3
    } yield (x._1, y._1) ->
      ((x._1, y._1, x._3.length.toLong, x._2, y._2))).toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (k, e) => assert(out(k) === e, s"pair=$k") }
    // every planted translation WITH a repetition signal is found
    // despite sharing ZERO bytes of vocabulary with its original — the
    // structural signal is the only path to it
    val planted = docs.filter(_._1 % 19 == 0)
      .filter(d => pattern(d._2).exists(_ > 0))
    assert(planted.nonEmpty)
    planted.foreach { case (i, t, _) =>
      assert(out.contains((i, i + 5000000L)), s"cipher of $i missed")
      val cw = t.split(" ").filter(_.nonEmpty).map(cipherWord).toSet
      assert(t.split(" ").filter(_.nonEmpty).toSet.intersect(cw).isEmpty,
        s"cipher of $i shares vocabulary — plant too easy")
    }
    // and the detector is not trivially matching everything: most
    // cross-lang doc pairs differ structurally
    val nCross = (for { x <- fps; y <- fps
      if x._1 < y._1 && x._2 != y._2 } yield 1).sum
    assert(out.size.toDouble / nCross < 0.05,
      "structure fingerprint matches most pairs — no discrimination")
  }

  test("d22: source-overlap matrix is complete and matches a re-derived cell") {
    val out = datapipe.Dedup.queries("d22_source_overlap")(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    val k = Tables.documents(spark, sf).select($"source").distinct().count()
    assert(out.length.toLong === k * (k - 1) / 2, "matrix not complete")
    assert(out.forall { case (a, b, _, _, _, _) => a < b })
    out.foreach { case (_, _, na, nb, inter, j) =>
      assert(inter <= math.min(na, nb))
      assert(j === inter.toDouble / (na + nb - inter))
    }
    // independent re-derivation of one cell from raw per-source hash sets
    import graft.functions.WordShinglePHashes.word_shingle_phashes
    def hashes(src: String): Set[Long] = Tables.documents(spark, sf)
      .filter($"source" === src)
      .select(explode(word_shingle_phashes($"text", 3)).as("h"))
      .distinct().as[Long].collect().toSet
    val (h0, h1) = (hashes("src0"), hashes("src1"))
    val row = out.find(r => r._1 == "src0" && r._2 == "src1").get
    assert(row._3 === h0.size.toLong && row._4 === h1.size.toLong)
    assert(row._5 === (h0 & h1).size.toLong)
  }

  test("s29: per-label health stats replay exactly; every pathology surfaced") {
    def ph(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val out = datapipe.Similarity.queries("s29_embedding_health")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    val corpus = base ++
      base.filter(_._1 % 9 == 0).map { case (i, e, l) =>
        (i + 1000000L, e.map(_ * 4.0f), l) } ++
      base.filter(_._1 % 17 == 0).map { case (i, e, l) =>
        (i + 2000000L, e.map(_ => 0.0f), l) } ++
      base.filter(_._1 % 13 == 0).map { case (i, e, l) =>
        (i + 3000000L, e, l) }
    val stats = corpus.map { case (i, e, l) =>
      val fp = e.map(x => math.round(x.toDouble * 1e8))
      (i, l, fp.map(v => v * v).sum, ph(fp.mkString(",")))
    }
    val hCount = stats.groupBy(_._4).view.mapValues(_.size).toMap
    val expected = stats.groupBy(_._2).map { case (l, vs) =>
      l -> ((l, vs.size.toLong,
        vs.count(_._3 == 0L).toLong,
        vs.count(v => math.abs(v._3 - 10000000000000000L) >
          100000000000000L).toLong,
        vs.count(v => hCount(v._4) > 1).toLong,
        vs.map(_._3).min, vs.map(_._3).max))
    }
    assert(out.keySet === expected.keySet && out.keySet.size === 10)
    expected.foreach { case (l, e) => assert(out(l) === e, s"label=$l") }
    // every planted pathology visible: zeros, off-norm (zeros AND the
    // x4 scales both count — scaled norms sit near 16e16), value dups
    // (exact copies and the all-equal zero vectors); clean vectors
    // stay in-norm so the audit separates signal from noise
    assert(out.values.map(_._3).sum > 0, "no zero vector")
    assert(out.values.map(_._4).sum >
      out.values.map(_._3).sum, "x4 plants not off-norm")
    assert(out.values.map(_._5).sum >= 2 * base.count(_._1 % 13 == 0),
      "value duplicates missed")
    assert(out.values.exists(r => r._2 > r._4),
      "every vector off-norm — clean baseline invisible")
    assert(out.values.map(_._7).max > 15000000000000000L,
      "scaled norm extreme not reported")
  }

  test("s30: kNN graph replays exactly; ranks contiguous, cosine monotone") {
    val out = datapipe.Similarity.queries("s30_knn_graph")(spark, sf)
      .as[(Long, Long, Long, Int, Double)].collect()
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    // corpus-adaptive hyperplane count, the query's integer-only
    // formula: nb = max(8, len(bin(ceil(n/32) - 1))) — 8 at this SF
    val nb = math.max(8, java.lang.Long.toBinaryString(
      math.max((base.length + 31) / 32 - 1, 1)).length)
    def bucket(e: Seq[Float]): Long =
      (0 until nb).map(j => if (e(j).toDouble > 0.0) 1L << j else 0L).sum
    // probe list = own bucket + flip of the smallest-|v| hashed dim
    // (ties to the smallest dim), mirroring the query's probe-1
    def probes(e: Seq[Float], b: Long): Seq[Long] = {
      val jmin = (0 until nb).minBy(j => (math.abs(e(j).toDouble), j))
      Seq(b, b ^ (1L << jmin))
    }
    // index-order double fold — CosineSim's exact IEEE sequence
    val bks = base.map { case (id, e, l) => (id, e, l, bucket(e)) }
    val expected = bks.flatMap { case (sid, se, sl, sb) =>
      bks.filter { case (did, _, dl, db) =>
          did != sid && dl == sl && probes(se, sb).contains(db) }
        .map { case (did, de, _, _) => (did, cosExact(se, de)) }
        .sortBy { case (did, c) => (-c, did) }
        .take(4).zipWithIndex
        .map { case ((did, c), i) => (sid, (i + 1).toLong, did, sl, c) }
    }.sortBy(r => (r._1, r._2))
    assert(out.toSeq === expected.toSeq)
    assert(out.nonEmpty, "empty graph — blocking found no candidates")
    val bySrc = out.groupBy(_._1)
    // ranks contiguous from 1; at least one src fills K=4 (non-vacuous
    // truncation); cosine non-increasing within each src's list
    assert(bySrc.values.forall(es =>
      es.map(_._2).sorted.toSeq == (1L to es.length).toSeq))
    assert(bySrc.values.exists(_.length == 4), "no src ever fills K=4")
    bySrc.values.foreach { es =>
      val cs = es.sortBy(_._2).map(_._5)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("s32: beam search replays over the symmetrized search graph; search genuinely expands") {
    val out = datapipe.Similarity.queries("s32_graph_beam_recall")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(2, 4, 8))
    // the SEARCH graph replayed from scratch: s30's build at the
    // coarser connectivity blocking (nb = max(3, len(bin(ceil(n/256)
    // - 1)))), probe-1, exact-cosine top-4 per src, symmetrized
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    val nb = math.max(3, java.lang.Long.toBinaryString(
      math.max((all.length + 255) / 256 - 1, 1)).length)
    def bucket(e: Seq[Float]): Long =
      (0 until nb).map(j => if (e(j).toDouble > 0.0) 1L << j else 0L).sum
    def probes(e: Seq[Float], b: Long): Seq[Long] = {
      val jmin = (0 until nb).minBy(j => (math.abs(e(j).toDouble), j))
      Seq(b, b ^ (1L << jmin))
    }
    val bks = all.map { case (id, e, l) => (id, e, l, bucket(e)) }
    val g = bks.flatMap { case (sid, se, sl, sb) =>
      bks.filter { case (did, _, dl, db) =>
          did != sid && dl == sl && probes(se, sb).contains(db) }
        .map { case (did, de, _, _) => (did, cosExact(se, de)) }
        .sortBy { case (did, c) => (-c, did) }
        .take(4).map { case (did, _) => (sid, did) }
    }
    val sym = (g ++ g.map(e => (e._2, e._1))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val base = all.filter(_._2.nonEmpty)
    // the deterministic NQ sample (fixture derivation, not the operator
    // under test — phash only exists as a Column)
    val qs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(size($"embedding") > 0)
      .orderBy(graft.Dets.phash($"vec_id".cast("string")), $"vec_id")
      .limit(32).select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    var nTruthAll = 0L
    val perBeam = scala.collection.mutable.Map[Int, (Long, Long)]()
      .withDefaultValue((0L, 0L)) // beam -> (hits, n_scored), s32 seeding
    val perBeamMulti = scala.collection.mutable.Map[Int, (Long, Long)]()
      .withDefaultValue((0L, 0L)) // same, s34's 4 phash-spread seeds
    val perBeamHier = scala.collection.mutable.Map[Int, (Long, Long)]()
      .withDefaultValue((0L, 0L)) // same, s36's routed two-level entry
    // JVM mirror of Dets.phash: first 15 hex chars of md5 as a long
    def phashScala(str: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15), 16)
    qs.foreach { case (qid, qe, ql) =>
      val scored = base.filter { case (id, _, l) => id != qid && l == ql }
        .map { case (id, e, _) => id -> cosExact(qe, e) }
        .filterNot(p => p._2.isNaN).toMap
      val truth = scored.toSeq.sortBy { case (id, c) => (-c, id) }
        .take(10).map(_._1).toSet
      nTruthAll += truth.size
      if (scored.nonEmpty) {
        def search(entries: Seq[Long], beam: Int,
                   seedVisited: Seq[Long] = Seq.empty): (Long, Long) = {
          val visited =
            scala.collection.mutable.Set((entries ++ seedVisited): _*)
          var frontier = entries
          for (_ <- 1 to 6) {
            val fresh = frontier.flatMap(v => sym.getOrElse(v, Set.empty))
              .distinct
              .filter(d => !visited.contains(d) && scored.contains(d))
            visited ++= fresh
            frontier = fresh.sortBy(d => (-scored(d), d)).take(beam)
          }
          val top10 = visited.toSeq.sortBy(d => (-scored(d), d)).take(10)
          (top10.count(truth).toLong, visited.size.toLong)
        }
        val single = Seq(scored.keys.min)
        val multi = scored.keys.toSeq
          .sortBy(id => (phashScala(id.toString), id)).take(4)
        // s36: the 1/4 routing sample is scored up front; the single
        // best routed node seeds the walk, the whole sample is ranked
        val sample = scored.keys.filter(_ % 4 == 0).toSeq
        val routedEntry =
          if (sample.isEmpty) Seq.empty
          else Seq(sample.minBy(id => (-scored(id), id)))
        Seq(2, 4, 8).foreach { beam =>
          val (h, n) = perBeam(beam)
          val (dh, dn) = search(single, beam)
          perBeam(beam) = (h + dh, n + dn)
          val (h2, n2) = perBeamMulti(beam)
          val (dh2, dn2) = search(multi, beam)
          perBeamMulti(beam) = (h2 + dh2, n2 + dn2)
          val (h3, n3) = perBeamHier(beam)
          val (dh3, dn3) =
            if (routedEntry.isEmpty) (0L, 0L)
            else search(routedEntry, beam, seedVisited = sample)
          perBeamHier(beam) = (h3 + dh3, n3 + dn3)
        }
      }
    }
    def checkAgainst(rows: Seq[(Int, Long, Long, Long, Long, Double, Double)],
                     replay: collection.Map[Int, (Long, Long)],
                     tag: String): Unit =
      rows.foreach { case (beam, nq, nt, hits, nScored, recall, avgScored) =>
        assert(nq === qs.length.toLong)
        assert(nt === nTruthAll)
        assert((hits, nScored) === replay(beam), s"$tag beam=$beam replay")
        // derived doubles are exactly the integer ratios
        assert(recall === hits.toDouble / nt)
        assert(avgScored === nScored.toDouble / nq)
        assert(hits <= nt && nScored >= nq,
          s"$tag beam=$beam inconsistent counts")
      }
    checkAgainst(out.toSeq, perBeam, "s32")
    // non-vacuous: the search EXPANDED past its entry points (otherwise
    // the graph/rounds are broken and recall measures nothing), and the
    // widest beam found at least some of the truth
    assert(out.forall(_._5 > out.head._2), "search never left the entry")
    assert(out.last._4 > 0L, "beam-8 search found zero ground truth")

    // s34 = the same chain, 4 phash-spread seeds — replays exactly too
    val outM = datapipe.Similarity.queries("s34_multi_entry_beam")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect()
    assert(outM.map(_._1).toSeq === Seq(2, 4, 8))
    checkAgainst(outM.toSeq, perBeamMulti, "s34")
    // what entry diversity BUYS (the recall-vs-cost table): at the low
    // beam, 4 seeds must lift recall@10 strictly while still scoring
    // fewer nodes per query than s32 simply widening its beam to 4 —
    // recall for less than the next beam step's price
    val s32r = out.map(r => r._1 -> r).toMap
    val s34r = outM.map(r => r._1 -> r).toMap
    assert(s34r(2)._6 > s32r(2)._6,
      s"no beam-2 recall lift: s34=${s34r(2)._6} vs s32=${s32r(2)._6}")
    assert(s34r(2)._7 < s32r(4)._7,
      s"beam-2 multi-entry cost ${s34r(2)._7} not below s32's beam-4 " +
        s"${s32r(4)._7}")
    // at wider beams diversity must never cost more than a whisker of
    // recall (the beam itself already explores; ±1 hit of wiggle)
    Seq(4, 8).foreach { b =>
      assert(s34r(b)._4 >= s32r(b)._4 - 1,
        s"beam=$b: multi-entry lost recall ${s34r(b)._4} vs ${s32r(b)._4}")
    }

    // s36 = the routed two-level entry — replays exactly too
    val outH = datapipe.Similarity.queries("s36_hierarchical_beam")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect()
    checkAgainst(outH.toSeq, perBeamHier, "s36")
    // what ROUTING buys: at the low beam the routed entry must lift
    // recall over the blind min-id entry (that is the whole point of a
    // top layer — measured at sf0.01: 0.706 → 0.775 for ~1 extra
    // scored node/query; at wide beams a single entry, routed or not,
    // can trail the exhaustive walk — the negative result stays in the
    // registry comment, not as a pin)
    val s36r = outH.map(r => r._1 -> r).toMap
    assert(s36r(2)._6 > s32r(2)._6,
      s"no beam-2 routing lift: s36=${s36r(2)._6} vs s32=${s32r(2)._6}")
  }

  test("s37: both tombstone policies replay exactly over the live-truth walk") {
    val out = datapipe.Similarity.queries("s37_tombstone_beam")(spark, sf)
      .as[(String, Int, Long, Long, Long, Long, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq(("skip", 2), ("skip", 4), ("skip", 8),
          ("through", 2), ("through", 4), ("through", 8)))
    // rebuild the search graph exactly as the s32 spec does
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    val nb = math.max(3, java.lang.Long.toBinaryString(
      math.max((all.length + 255) / 256 - 1, 1)).length)
    def bucket(e: Seq[Float]): Long =
      (0 until nb).map(j => if (e(j).toDouble > 0.0) 1L << j else 0L).sum
    def probes(e: Seq[Float], b: Long): Seq[Long] = {
      val jmin = (0 until nb).minBy(j => (math.abs(e(j).toDouble), j))
      Seq(b, b ^ (1L << jmin))
    }
    val bks = all.map { case (id, e, l) => (id, e, l, bucket(e)) }
    val g = bks.flatMap { case (sid, se, sl, sb) =>
      bks.filter { case (did, _, dl, db) =>
          did != sid && dl == sl && probes(se, sb).contains(db) }
        .map { case (did, de, _, _) => (did, cosExact(se, de)) }
        .sortBy { case (did, c) => (-c, did) }
        .take(4).map { case (did, _) => (sid, did) }
    }
    val sym = (g ++ g.map(e => (e._2, e._1))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val base = all.filter(_._2.nonEmpty)
    val qs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(size($"embedding") > 0)
      .orderBy(graft.Dets.phash($"vec_id".cast("string")), $"vec_id")
      .limit(32).select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    def live(id: Long) = id % 5 != 1
    var nTruthAll = 0L
    val per = scala.collection.mutable.Map[(String, Int), (Long, Long)]()
      .withDefaultValue((0L, 0L))
    qs.foreach { case (qid, qe, ql) =>
      val scored = base.filter { case (id, _, l) => id != qid && l == ql }
        .map { case (id, e, _) => id -> cosExact(qe, e) }
        .filterNot(p => p._2.isNaN).toMap
      val scoredLive = scored.filter(p => live(p._1))
      val truth = scoredLive.toSeq.sortBy { case (id, c) => (-c, id) }
        .take(10).map(_._1).toSet
      nTruthAll += truth.size
      if (scoredLive.nonEmpty) {
        val entry = Seq(scoredLive.keys.min)
        def walk(sc: Map[Long, Double], beam: Int): Set[Long] = {
          val visited = scala.collection.mutable.Set(entry: _*)
          var frontier: Seq[Long] = entry
          for (_ <- 1 to 6) {
            val fresh = frontier.flatMap(v => sym.getOrElse(v, Set.empty))
              .distinct.filter(d => !visited.contains(d) && sc.contains(d))
            visited ++= fresh
            frontier = fresh.sortBy(d => (-sc(d), d)).take(beam)
          }
          visited.toSet
        }
        Seq(2, 4, 8).foreach { beam =>
          // skip: dead nodes invisible to the walk entirely
          val vS = walk(scoredLive, beam)
          val hS = vS.toSeq.sortBy(d => (-scoredLive(d), d)).take(10)
            .count(truth)
          val (h0, n0) = per(("skip", beam))
          per(("skip", beam)) = (h0 + hS, n0 + vS.size)
          // through: walk over everything, rank live only, pay for all
          val vT = walk(scored, beam)
          val hT = vT.toSeq.filter(live).sortBy(d => (-scored(d), d))
            .take(10).count(truth)
          val (h1, n1) = per(("through", beam))
          per(("through", beam)) = (h1 + hT, n1 + vT.size)
        }
      }
    }
    out.foreach { case (pol, beam, nq, nt, hits, nScored, recall, avg) =>
      assert(nq === qs.length.toLong && nt === nTruthAll)
      assert((hits, nScored) === per((pol, beam)), s"$pol beam=$beam replay")
      assert(recall === hits.toDouble / nt && avg === nScored.toDouble / nq)
    }
    // the decision table is non-vacuous: traversal-through pays a
    // strictly higher scored bill at every beam (it scores tombstones)
    val byKey = out.map(r => (r._1, r._2) -> r).toMap
    Seq(2, 4, 8).foreach { b =>
      assert(byKey(("through", b))._6 > byKey(("skip", b))._6,
        s"beam=$b: through did not pay a higher traversal bill")
    }
  }

  test("s38: all three freshness policies replay exactly; rebuilt equals s32") {
    val out = datapipe.Similarity.queries("s38_freshness_beam")(spark, sf)
      .as[(String, Int, Long, Long, Long, Long, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq(("hybrid", 2), ("hybrid", 4), ("hybrid", 8),
          ("rebuilt", 2), ("rebuilt", 4), ("rebuilt", 8),
          ("stale", 2), ("stale", 4), ("stale", 8)))
    val byKey = out.map(r => (r._1, r._2) -> r).toMap
    // rebuilt IS s32's walk (same graph, same entry, same truth) —
    // the upper-bound row comes for free and must match exactly
    val s32r = datapipe.Similarity.queries("s32_graph_beam_recall")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect()
    s32r.foreach { r =>
      val f = byKey(("rebuilt", r._1))
      assert((f._3, f._4, f._5, f._6, f._7, f._8) ===
        (r._2, r._3, r._4, r._5, r._6, r._7), s"rebuilt beam=${r._1} != s32")
    }
    // independent replay of stale and hybrid over the OLD-ONLY graph
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    def indexed(id: Long) = id % 4 != 3
    val old = all.filter(v => indexed(v._1))
    val nb = math.max(3, java.lang.Long.toBinaryString(
      math.max((old.length + 255) / 256 - 1, 1)).length)
    def bucket(e: Seq[Float]): Long =
      (0 until nb).map(j => if (e(j).toDouble > 0.0) 1L << j else 0L).sum
    def probes(e: Seq[Float], b: Long): Seq[Long] = {
      val jmin = (0 until nb).minBy(j => (math.abs(e(j).toDouble), j))
      Seq(b, b ^ (1L << jmin))
    }
    val bks = old.map { case (id, e, l) => (id, e, l, bucket(e)) }
    val g = bks.flatMap { case (sid, se, sl, sb) =>
      bks.filter { case (did, _, dl, db) =>
          did != sid && dl == sl && probes(se, sb).contains(db) }
        .map { case (did, de, _, _) => (did, cosExact(se, de)) }
        .sortBy { case (did, c) => (-c, did) }
        .take(4).map { case (did, _) => (sid, did) }
    }
    val sym = (g ++ g.map(e => (e._2, e._1))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val base = all.filter(_._2.nonEmpty)
    val qs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(size($"embedding") > 0)
      .orderBy(graft.Dets.phash($"vec_id".cast("string")), $"vec_id")
      .limit(32).select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    var nTruthAll = 0L
    val per = scala.collection.mutable.Map[(String, Int), (Long, Long)]()
      .withDefaultValue((0L, 0L))
    qs.foreach { case (qid, qe, ql) =>
      val scored = base.filter { case (id, _, l) => id != qid && l == ql }
        .map { case (id, e, _) => id -> cosExact(qe, e) }
        .filterNot(p => p._2.isNaN).toMap
      val truth = scored.toSeq.sortBy { case (id, c) => (-c, id) }
        .take(10).map(_._1).toSet
      nTruthAll += truth.size
      val scoredOld = scored.filter(p => indexed(p._1))
      if (scoredOld.nonEmpty) {
        val entry = Seq(scoredOld.keys.min)
        def walk(beam: Int): Set[Long] = {
          val visited = scala.collection.mutable.Set(entry: _*)
          var frontier: Seq[Long] = entry
          for (_ <- 1 to 6) {
            val fresh = frontier.flatMap(v => sym.getOrElse(v, Set.empty))
              .distinct.filter(d => !visited.contains(d) && scored.contains(d))
            visited ++= fresh
            frontier = fresh.sortBy(d => (-scored(d), d)).take(beam)
          }
          visited.toSet
        }
        val tail = scored.keys.filterNot(indexed).toSet
        Seq(2, 4, 8).foreach { beam =>
          val v = walk(beam)
          def tally(tag: String, ranked: Set[Long]): Unit = {
            val h = ranked.toSeq.sortBy(d => (-scored(d), d)).take(10)
              .count(truth)
            val (h0, n0) = per((tag, beam))
            per((tag, beam)) = (h0 + h, n0 + ranked.size)
          }
          tally("stale", v)
          tally("hybrid", v ++ tail)
        }
      }
    }
    Seq("stale", "hybrid").foreach { pol =>
      Seq(2, 4, 8).foreach { beam =>
        val r = byKey((pol, beam))
        assert(r._3 === qs.length.toLong && r._4 === nTruthAll)
        assert((r._5, r._6) === per((pol, beam)), s"$pol beam=$beam replay")
        assert(r._7 === r._5.toDouble / r._4 && r._8 === r._6.toDouble / r._3)
      }
    }
    // the freshness gap is non-vacuous and the buffer genuinely closes
    // it: stale loses to hybrid at every beam
    Seq(2, 4, 8).foreach { b =>
      assert(byKey(("stale", b))._5 < byKey(("hybrid", b))._5,
        s"beam=$b: tail scan bought no recall — freshness gap vacuous")
    }
  }

  test("s35: PQ-scored traversal tracks the exact-scored walk; re-rank restores recall") {
    // the DuckDB oracle already pins every value bit-for-bit (the PQ
    // fixed-point arithmetic, the walk, the re-rank); this spec pins
    // the CONTRACT vs s34 — same seeding, same graph, same rounds,
    // only the traversal score approximated — so the deltas isolate
    // what ADC costs (or luckily buys: a diverted walk can land in a
    // better basin, observed at sf0.001 beam 4)
    val exact = datapipe.Similarity.queries("s34_multi_entry_beam")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val pq = datapipe.Similarity.queries("s35_pq_beam_rerank")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(pq.keySet === Set(2, 4, 8))
    Seq(2, 4, 8).foreach { b =>
      val (e, a) = (exact(b), pq(b))
      assert(a._2 === e._2 && a._3 === e._3, s"beam=$b eval frame differs")
      assert(a._4 <= a._3 && a._5 >= a._2, s"beam=$b inconsistent counts")
      // the walk shape is s34's: visited volume within 15% either way
      assert(a._7 >= 0.85 * e._7 && a._7 <= 1.15 * e._7,
        s"beam=$b avg_scored ${a._7} vs exact ${e._7} — the traversal " +
          "is not walking the same graph regime")
      // approximation may cost a little recall, never much
      assert(math.abs(a._6 - e._6) <= 0.08,
        s"beam=$b recall ${a._6} vs exact ${e._6}")
    }
    // re-rank restores the wide-beam walk to near-exhaustive recall —
    // the DiskANN promise (approximate walk, exact final order)
    assert(pq(8)._6 >= 0.95, s"beam-8 recall ${pq(8)._6}")
    // the search genuinely expanded past its 4 seeds
    assert(pq.values.forall(_._5 > 4 * pq(2)._2))
  }

  test("s33: build-knob table replays per config; the pair bill falls as bits rise") {
    val out = datapipe.Similarity.queries("s33_build_knob_plan")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(3, 4, 5, 6))
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    val base = all.filter(_._2.nonEmpty)
    val qs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(size($"embedding") > 0)
      .orderBy(graft.Dets.phash($"vec_id".cast("string")), $"vec_id")
      .limit(32).select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    val truth4 = qs.flatMap { case (qid, qe, ql) =>
      base.filter { case (id, _, l) => id != qid && l == ql }
        .map { case (id, e, _) => (id, cosExact(qe, e)) }
        .filterNot(_._2.isNaN)
        .sortBy { case (id, c) => (-c, id) }.take(4)
        .map { case (id, _) => (qid, id) }
    }.toSet
    out.foreach { case (nb, nCells, maxCell, candPairs, nT, hits, rec, ppv) =>
      def bucket(e: Seq[Float]): Long =
        (0 until nb).map(j => if (e(j).toDouble > 0.0) 1L << j else 0L).sum
      def probes(e: Seq[Float], b: Long): Seq[Long] = {
        val jmin = (0 until nb).minBy(j => (math.abs(e(j).toDouble), j))
        Seq(b, b ^ (1L << jmin))
      }
      val cellCnt = all.groupBy(r => (r._3, bucket(r._2)))
        .view.mapValues(_.length.toLong).toMap
      assert(nCells === cellCnt.size.toLong, s"nb=$nb cells")
      assert(maxCell === cellCnt.values.max, s"nb=$nb max cell")
      val expPairs = all.map { case (_, e, l) =>
        probes(e, bucket(e)).map(pb => cellCnt.getOrElse((l, pb), 0L)).sum
      }.sum - all.length
      assert(candPairs === expPairs, s"nb=$nb pair bill")
      val expHits = qs.flatMap { case (qid, qe, ql) =>
        val pbs = probes(qe, bucket(qe)).toSet
        all.filter { case (id, e, l) =>
          id != qid && l == ql && pbs(bucket(e)) }
          .map(r => (qid, r._1))
      }.toSet.count(truth4)
      assert(nT === truth4.size.toLong && hits === expHits.toLong, s"nb=$nb recall")
      assert(rec === hits.toDouble / nT && ppv === candPairs.toDouble / all.length)
    }
    // the knob's economics: every added bit strictly cuts the pair bill
    // on this corpus (the quality column prices what it costs)
    val bills = out.map(_._4)
    assert(bills.zip(bills.tail).forall { case (a, b) => a > b },
      s"pair bill not decreasing: ${bills.toSeq}")
  }

  test("s31: IMI/IVF cell profiles well-formed; the cost asymmetry is the table") {
    val out = datapipe.Similarity.queries("s31_imi_cells")(spark, sf)
      .as[(String, Int, Long, Long, Long, Long, Long, Double, Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set("imi_16x16", "ivf_256"))
    out.values.foreach { case (l, nc, ne, nz, p50, p95, mx, imb, _) =>
      assert(nc === 256 && ne + nz === 256L && ne >= 1L, s"$l cells")
      // percentiles are cell-count-weighted minima over occupancy:
      // ordered, bounded by the max, and imbalance >= 1 since the max
      // occupancy is at least the mean
      assert(p50 >= 1L && p50 <= p95 && p95 <= mx, s"$l percentiles")
      assert(imb >= 1.0 - 1e-12, s"$l imbalance $imb")
    }
    // the layout trade the table exists to price: the product-space
    // quantizer trains 16x fewer parameters for the same 256 cells
    assert(out("imi_16x16")._9 * 16 === out("ivf_256")._9)
    // both quantizers saw the same corpus: occupancy mass must agree
    // (derivable from imbalance: n_vecs = max*n_nonempty/imbalance)
    def nVecs(r: (String, Int, Long, Long, Long, Long, Long, Double, Int)) =
      math.round(r._7 * r._3 / r._8)
    assert(nVecs(out("imi_16x16")) === nVecs(out("ivf_256")))
  }

  test("s14: probe-2 dominates single-bucket on recall AND cost; ratios exact") {
    val rows = datapipe.Similarity.queries("s14_ann_recall")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === Seq("lsh_bucket", "multiprobe_2"))
    val Array(l, m) = rows
    // fixed-SIZE sample: exactly 32 queries regardless of corpus size
    // (the fixture has > 32 valid vectors), and every query has a full
    // exact top-10 on this corpus, so n_truth = 10 * n_q here
    assert(l._2 === 32L && m._2 === 32L)
    assert(l._3 === 320L && m._3 === 320L)
    // the probe list CONTAINS the query's own bucket, so probe-2's
    // candidate set is a superset: recall and cost must both dominate
    assert(m._4 >= l._4, "multi-probe lost ground-truth hits vs its subset")
    assert(m._5 >= l._5, "multi-probe scanned fewer candidates than its subset")
    Seq(l, m).foreach { case (_, n, truth, hits, cand, recall, avgCand) =>
      assert(hits <= truth && hits <= cand)
      // derived doubles are exactly the integer ratios (one IEEE
      // division) — recall divides by the ACTUAL truth count
      assert(recall === hits.toDouble / truth.toDouble)
      assert(avgCand === cand.toDouble / n)
    }
  }

  test("s15: nprobe-2 dominates nprobe-1; both ride the same ground truth") {
    val rows = datapipe.Similarity.queries("s15_ivf_recall")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === Seq("ivf_nprobe_1", "ivf_nprobe_2"))
    val Array(p1, p2) = rows
    assert(p1._2 === 32L && p2._2 === 32L) // fixed-size sample, as s14
    assert(p1._3 === 320L && p2._3 === 320L)
    // probe list 2 CONTAINS probe list 1 (rn <= 2 ⊇ rn = 1): candidate
    // superset, so hits and cost must both dominate
    assert(p2._4 >= p1._4 && p2._5 >= p1._5)
    Seq(p1, p2).foreach { case (_, n, truth, hits, cand, recall, avgCand) =>
      assert(hits <= truth && hits <= cand)
      assert(recall === hits.toDouble / truth.toDouble)
      assert(avgCand === cand.toDouble / n)
    }
  }

  test("s16: ADC top-100 dominates top-30; ratios exact; truth full at this corpus") {
    val rows = datapipe.Similarity.queries("s16_pq_recall")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === Seq("adc_top100", "adc_top30"))
    val Array(c100, c30) = rows
    // fixed-size sample; int-L2 truth has no NaN path, so every query
    // carries a full exact top-10 (corpus >> 10)
    assert(c30._2 === 32L && c100._2 === 32L)
    assert(c30._3 === 320L && c100._3 === 320L)
    // top-30 ⊆ top-100 (one ranking, two cutoffs): hits and cost dominate
    assert(c100._4 >= c30._4 && c100._5 >= c30._5)
    // every query has >= 100 ADC-scored candidates at this corpus, so
    // the candidate bills are exactly n_q × C
    assert(c30._5 === 32L * 30 && c100._5 === 32L * 100)
    // ADC must be genuinely informative at C=30: well above the ~6% a
    // random 30-of-499 subset would recall in expectation (measured
    // 0.228 at this corpus — a one-Lloyd-iteration K=8 codebook is
    // coarse, which is exactly the number this eval exists to surface)
    assert(c30._6 > 0.15, s"ADC top-30 recall ${c30._6} — quantizer broken?")
    Seq(c30, c100).foreach { case (_, n, truth, hits, cand, recall, avgC) =>
      assert(hits <= truth && hits <= cand)
      assert(recall === hits.toDouble / truth.toDouble)
      assert(avgC === cand.toDouble / n)
    }
  }

  test("d23: removal curve is monotone in τ and anchored by the planted copies") {
    val rows = datapipe.Dedup.queries("d23_dedup_rate_curve")(spark, sf)
      .as[(Double, Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq === Seq(0.5, 0.7, 0.8, 0.9))
    val nDocs = rows.head._2
    assert(rows.forall(_._2 === nDocs), "denominator must be constant")
    // pairs and removals can only shrink as τ rises
    assert(rows.map(_._3).toSeq === rows.map(_._3).sortBy(-_).toSeq)
    assert(rows.map(_._4).toSeq === rows.map(_._4).sortBy(-_).toSeq)
    rows.foreach { case (_, nd, pairs, removed, frac) =>
      assert(removed <= pairs, "each removed doc carries >= 1 pair")
      assert(removed <= nd)
      assert(frac === removed.toDouble / nd.toDouble)
    }
    // exact copies (+2e6, J=1) survive every threshold: τ=0.9 removal
    // is at least the plant count; the mid-similarity partials (+3e6,
    // J≈0.55-0.65) must separate τ=0.5 from τ=0.8
    val exactPlants = Tables.documents(spark, sf)
      .filter($"doc_id" % 7 === 0).count()
    assert(rows.last._4 >= exactPlants,
      s"τ=0.9 removed ${rows.last._4} < $exactPlants planted exact copies")
    assert(rows.head._4 > rows(2)._4,
      "mid-similarity plants must add removals below τ=0.8")
  }

  test("d24: minhash estimate tracks true Jaccard per band; tails bounded") {
    val rows = datapipe.Dedup.queries("d24_minhash_estimator_error")(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
    val bands = Seq("0.50-0.70", "0.70-0.90", "0.90-1.00")
    assert(rows.map(_._1).toSeq.forall(bands.contains))
    assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted)
    // planted exact copies guarantee the top band is populated
    assert(rows.exists(r => r._1 == "0.90-1.00" && r._2 > 0))
    rows.foreach { case (band, n, trueJ, estJ, nErr) =>
      assert(n > 0)
      // the estimator is unbiased: K=16 gives per-pair std <= 0.125,
      // and micro-averaging every band's n >= 13 pairs makes a 0.15
      // corridor > 4 sigma wide — a miss means broken signatures, not
      // bad luck
      assert(math.abs(estJ - trueJ) < 0.15, s"$band: est $estJ vs $trueJ")
      // Hoeffding: P(|est - J| > 0.25) <= exp(-2) ~ 0.135 per pair;
      // half a band exceeding it would be astronomically unlikely
      assert(nErr <= n / 2 + 1, s"$band: $nErr/$n large errors")
    }
  }

  test("d37: gram-size sweep replays exactly; the 20-gram cliff shows") {
    def ph(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val out = datapipe.Dedup.queries("d37_gram_size_sweep")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val bench = docs.filter(_._1 % 50 == 0)
    val train = docs.filterNot(_._1 % 50 == 0) ++ bench.map { case (id, t) =>
      (id + 5000000L,
       (t.split(" ").take(16) ++
        (1 to 24).map(i => s"leak${id}x$i")).mkString(" "))
    }
    def grams(t: String, n: Int): Set[Long] = {
      val ws = t.split(" ")
      if (ws.length < n) Set.empty
      else ws.sliding(n).map(w => ph(w.mkString("_"))).toSet
    }
    Seq(8, 13, 20).foreach { n =>
      val bset = bench.flatMap(d => grams(d._2, n)).toSet
      val hits = train.map(d => grams(d._2, n).count(bset.contains))
        .filter(_ > 0)
      val e = (n, bset.size.toLong, train.length.toLong,
        hits.length.toLong, hits.map(_.toLong).sum,
        hits.length.toDouble / train.length)
      assert(out(n) === e, s"n=$n")
    }
    // the knob's cliff: every 16-word planted leak is caught at 8 and
    // 13, and a 20-gram gate is blind to all of them — flag counts
    // strictly fall across the sweep
    assert(out(8)._4 >= bench.length && out(13)._4 >= bench.length)
    assert(out(20)._4 < out(13)._4 && out(13)._4 <= out(8)._4)
  }

  test("d36: cluster-size profile partitions the corpus; buckets replay from d06") {
    val out = datapipe.Dedup.queries("d36_cluster_profile")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val clusters = datapipe.Dedup.queries("d06_dedup_clusters")(spark, sf)
      .as[(Long, Long)].collect()
    val nCorpus = datapipe.Dedup.corpus(spark, sf).count()
    // replay: per-cluster sizes -> integer next-pow2 buckets
    val sizes = clusters.groupBy(_._2).view.mapValues(_.length.toLong).values
    def bucket(sz: Long): Long =
      1L << java.lang.Long.toBinaryString(sz - 1).length
    val expected = sizes.groupBy(bucket).map { case (b, szs) =>
      val docs = szs.sum
      b -> ((b, szs.size.toLong, docs, docs - szs.size,
        (docs - szs.size) * 1000000L / nCorpus))
    } + (1L -> ((1L, nCorpus - clusters.length, nCorpus - clusters.length,
      0L, 0L)))
    assert(out === expected)
    // the table PARTITIONS the corpus: every doc in exactly one row
    assert(out.values.map(_._3).sum === nCorpus)
    // non-vacuous: the planted near-dups/copies make real >=2 buckets,
    // and every non-singleton bucket is redundant by construction
    assert(out.keySet.exists(_ >= 2L), "no non-singleton bucket")
    out.values.filter(_._1 >= 2L).foreach { r =>
      assert(r._4 >= r._2, s"bucket ${r._1}: fewer redundant than clusters")
    }
  }

  test("d39: token budget replays from the manifest; conservation holds per source") {
    val out = datapipe.Dedup.queries("d39_token_budget")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val corpus = datapipe.Dedup.corpus(spark, sf)
      .select($"source", $"doc_id",
        size(expr("filter(split(text, ' '), x -> x <> '')")).cast("long"))
      .as[(String, Long, Long)].collect()
    val removed = datapipe.Dedup.queries("d30_dedup_manifest")(spark, sf)
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    val expected = corpus.groupBy(_._1).map { case (src, rows) =>
      val toksIn = rows.map(_._3).sum
      val ex = rows.count(r => removed.get(r._2).contains("exact")).toLong
      val nr = rows.count(r => removed.get(r._2).contains("near")).toLong
      val toksRm = rows.filter(r => removed.contains(r._2)).map(_._3).sum
      val dOut = rows.length - ex - nr
      val tOut = toksIn - toksRm
      src -> ((src, rows.length.toLong, toksIn, ex, nr, toksRm,
        dOut, tOut, tOut * 1000000L / toksIn))
    }
    assert(out === expected)
    // conservation: the table partitions both docs and tokens exactly
    out.values.foreach { case (src, di, ti, ex, nr, trm, dout, tout, _) =>
      assert(di === ex + nr + dout, s"$src docs don't balance")
      assert(ti === trm + tout, s"$src tokens don't balance")
    }
    assert(out.values.map(_._2).sum === corpus.length.toLong)
    // non-vacuous: both manifest rules bite somewhere, and at least one
    // source genuinely loses tokens (kept_ppm < 1e6)
    assert(out.values.map(_._4).sum > 0, "no exact removals reached the budget")
    assert(out.values.map(_._5).sum > 0, "no near removals reached the budget")
    assert(out.values.exists(_._9 < 1000000L), "no source lost any tokens")
  }

  test("d38: cascade marginals replay exactly; every stage bites") {
    val out = datapipe.Dedup.queries("d38_cascade_report")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def wordsOf(t: String) = t.split(" ", -1)
    val cascade = docs ++
      docs.filter(_._1 % 10 == 0).map { case (i, t) =>
        (i + 1000000L, t + " near duplicate suffix") } ++
      docs.filter(_._1 % 7 == 0).map { case (i, t) => (i + 2000000L, t) } ++
      docs.filter { case (i, t) => i % 13 == 0 && wordsOf(t).length >= 6 }
        .map { case (i, t) =>
          val w = wordsOf(t)
          (i + 3000000L,
           w.take(math.max(3, w.length * 6 / 10)).mkString(" ") +
             " mid sim tail pad") } ++
      docs.filter { case (i, t) => i % 11 == 0 && wordsOf(t).length >= 10 }
        .map { case (i, t) =>
          val w = wordsOf(t)
          (i + 4000000L, w.take(math.max(5, w.length * 3 / 10)).mkString(" ")) }
    val keep1 = cascade.groupBy(_._2).map(_._2.map(_._1).min).toSet
    val surv1 = cascade.filter(r => keep1.contains(r._1))
    def cappedSets(rows: Seq[(Long, String)]): Map[Long, Set[String]] = {
      val sets = rows.map { case (i, t) =>
        i -> wordsOf(t).sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
      val df = sets.values.flatten.groupBy(identity).map {
        case (g, _) => g -> sets.values.count(_.contains(g)) }
      sets.view.mapValues(_.filter(df(_) <= 64)).toMap
    }
    def pairs(capped: Map[Long, Set[String]]): Seq[(Long, Long, Long)] = {
      val inv = capped.toSeq.flatMap { case (i, gs) => gs.map(_ -> i) }
        .groupBy(_._1).values.filter(_.length >= 2)
      val inter = scala.collection.mutable.Map.empty[(Long, Long), Long]
      inv.foreach { ds =>
        val ids = ds.map(_._2).sorted
        for (a <- ids; b <- ids if a < b)
          inter((a, b)) = inter.getOrElse((a, b), 0L) + 1L
      }
      inter.toSeq.map { case ((a, b), n) => (a, b, n) }
    }
    val c1 = cappedSets(surv1.toSeq)
    val rm2 = pairs(c1).filter { case (a, b, n) =>
      n.toDouble / (c1(a).size + c1(b).size - n) >= 0.8 }.map(_._2).toSet
    val surv2 = surv1.filterNot(r => rm2.contains(r._1))
    val c2 = cappedSets(surv2.toSeq)
    val rm3 = pairs(c2).flatMap { case (a, b, n) =>
      val (sza, szb) = (c2(a).size.toLong, c2(b).size.toLong)
      val aSub = sza < szb || (sza == szb && a < b)
      val szS = if (aSub) sza else szb
      val j = n.toDouble / (sza + szb - n)
      if (n * 1000000L / szS >= 800000L && j < 0.5)
        Some(if (aSub) a else b)
      else None
    }.toSet
    val n0 = cascade.length.toLong; val k1 = keep1.size.toLong
    val r2 = rm2.size.toLong; val r3 = rm3.size.toLong
    val e = Map(
      "1_exact" ->
        (("1_exact", n0, n0 - k1, k1, (n0 - k1).toDouble / n0)),
      "2_minhash" ->
        (("2_minhash", k1, r2, k1 - r2, r2.toDouble / k1)),
      "3_containment" ->
        (("3_containment", k1 - r2, r3, k1 - r2 - r3,
          r3.toDouble / (k1 - r2))))
    assert(out === e)
    // every stage removes something its predecessors missed — the
    // attribution table's reason to exist
    assert(out.values.forall(_._3 > 0), s"a stage is vacuous: $out")
  }

  test("d35: b-bit estimates track true Jaccard; full column equals d24's") {
    val rows = datapipe.Dedup.queries("d35_bbit_minhash")(spark, sf)
      .as[(String, Long, Double, Double, Double, Double, Long)].collect()
    val bands = Seq("0.50-0.70", "0.70-0.90", "0.90-1.00")
    assert(rows.map(_._1).toSeq.forall(bands.contains))
    assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted)
    assert(rows.exists(r => r._1 == "0.90-1.00" && r._2 > 0))
    rows.foreach { case (band, n, trueJ, ef, e2, e1, nErr) =>
      assert(n > 0)
      assert(math.abs(ef - trueJ) < 0.15, s"$band: full $ef vs $trueJ")
      // bias-corrected coarse estimates: per-pair std scales by
      // 1/(1 - 2^-b) — ×4/3 at b=2, ×2 at b=1 — so the corridors
      // widen accordingly; micro-averaging n >= 13 pairs keeps both
      // multiple sigmas wide
      assert(math.abs(e2 - trueJ) < 0.2, s"$band: 2bit $e2 vs $trueJ")
      assert(math.abs(e1 - trueJ) < 0.3, s"$band: 1bit $e1 vs $trueJ")
      assert(nErr <= n, s"$band: $nErr/$n")
    }
    // the full-width column must agree with d24's independent run
    // bit-for-bit — same truth, same capped-space signatures
    val d24 = datapipe.Dedup.queries("d24_minhash_estimator_error")(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    rows.foreach { r =>
      val o = d24(r._1)
      assert(r._2 === o._2 && r._3 === o._3 && r._4 === o._4,
        s"${r._1}: diverges from d24")
    }
  }

  test("t30: a source's LOO row re-derives exactly from raw text; gaps positive") {
    val out = datapipe.TextAnalysis.queries("t30_source_loo_nll")(spark, sf)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(out.length > 1)
    // removing a source's own mass can only make its text less likely
    // under the remaining corpus — on this corpus every gap is positive
    assert(out.forall(_._6 > 0), s"non-positive LOO gap: ${out.toSeq}")
    // full independent re-derivation of one source's row (tokenize,
    // count, smooth, round — in plain Scala, no Spark)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val big = docs.flatMap { case (id, src, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      toks.zipWithIndex.map { case (w, i) =>
        (id, src, if (i == 0) "<s>" else toks(i - 1), w) }
    }
    val c2s = big.groupBy(r => (r._2, r._3, r._4)).view.mapValues(_.size.toLong)
    val c2  = big.groupBy(r => (r._3, r._4)).view.mapValues(_.size.toLong)
    val c1s = big.groupBy(r => (r._2, r._3)).view.mapValues(_.size.toLong)
    val c1  = big.groupBy(_._3).view.mapValues(_.size.toLong)
    val v   = big.map(_._4).distinct.length.toLong
    def r0(x: Double): Long = // Spark round(col): BigDecimal HALF_UP
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val src = out.head._1
    val mine = big.filter(_._2 == src)
    val nb = mine.length.toLong
    val ownSum = mine.map(r => r0(-math.log(
      (c2s((src, r._3, r._4)) + 1.0) / (c1s((src, r._3)) + v)) * 1e6)).sum
    val looSum = mine.map(r => r0(-math.log(
      (c2((r._3, r._4)) - c2s((src, r._3, r._4)) + 1.0) /
      (c1(r._3) - c1s((src, r._3)) + v)) * 1e6)).sum
    val row = out.find(_._1 == src).get
    assert(row._2 === mine.map(_._1).distinct.length.toLong)
    assert(row._3 === nb)
    assert(row._4 === r6(ownSum.toDouble / nb / 1e6))
    assert(row._5 === r6(looSum.toDouble / nb / 1e6))
    assert(row._6 === r6((looSum - ownSum).toDouble / nb / 1e6))
  }

  test("s17: load profile is internally consistent for both generators") {
    val rows = datapipe.Similarity.queries("s17_index_load_profile")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq === Seq("ivf_cell", "lsh_bucket"))
    val Array(ivf, lsh) = rows
    // both profile the same filtered corpus
    assert(ivf._3 === lsh._3 && ivf._3 > 0)
    assert(ivf._2 <= 8 && lsh._2 <= 256) // bounded by index geometry
    rows.foreach { case (m, nb, nv, p50, p95, mx, imb) =>
      assert(nb > 0 && p50 <= p95 && p95 <= mx, s"$m: $p50/$p95/$mx")
      assert(mx < nv, s"$m: a bucket can't exceed the corpus")
      // max >= mean  =>  imbalance >= 1 (with the n-1 shift, >= ~1)
      assert(imb >= 1.0 - 1e-9, s"$m: imbalance $imb")
      // exact integer-ratio reproduction of the imbalance definition
      assert(imb === (mx + 1L) * nb / nv.toDouble, s"$m: imbalance formula")
    }
    // 256-bucket LSH must spread FAR thinner than 8 coarse cells
    assert(lsh._4 < ivf._4, "LSH p50 candidates should undercut IVF's")
  }

  test("s18: drift report conserves members and prices every defection") {
    val rows = datapipe.Similarity.queries("s18_centroid_drift")(spark, sf)
      .as[(Long, Long, Long, Long, Option[Long], Option[Double])].collect()
    assert(rows.map(_._1).toSeq === (0L to 7L), "one row per seeded cell")
    val nVecs = Tables.embeddings(spark, sf).count()
    // every vector is assigned in BOTH iterations: the counts conserve
    assert(rows.map(_._2).sum === nVecs)
    assert(rows.map(_._3).sum === nVecs)
    rows.foreach { case (c, n1, _, moved, drift, frac) =>
      assert(moved <= n1, s"cell $c: more defectors than members")
      // every cell stays alive on this corpus -> drift is a real value
      assert(drift.exists(_ >= 0L), s"cell $c: dead-cell NULL drift")
      assert(frac.exists(f => f >= 0.0 && f <= 1.0))
      assert(frac.get === moved.toDouble / n1, s"cell $c: frac formula")
    }
    // non-vacuity: Lloyd iteration 2 actually moved something somewhere
    assert(rows.exists(_._4 > 0), "no defections — the monitor sees nothing")
    assert(rows.exists(_._5.exists(_ > 0L)), "zero drift everywhere")
  }

  test("t31: per-source tokenizer health reconciles exactly with t18's per-doc encode") {
    val rows = datapipe.TextAnalysis.queries("t31_tokenizer_health")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nw, nt, nc, nu, fert, cpt, uf) =>
      assert(nw > 0 && nt >= nw, s"$src: fewer tokens than words")
      assert(nc >= nt, s"$src: a token never spans less than one char")
      assert(fert === nt.toDouble / nw && cpt === nc.toDouble / nt
        && uf === nu.toDouble / nw, s"$src: ratio formulas")
      assert(uf >= 0.0 && uf <= 1.0)
    }
    // same corpus, same rounds-2 vocab => the per-source totals and
    // t18's per-doc totals are the SAME numbers partitioned two ways
    val t18 = datapipe.TextAnalysis.queries("t18_bpe_encode")(spark, sf)
      .agg(sum($"n_words"), sum($"n_tokens")).as[(Long, Long)].first()
    assert((rows.map(_._2).sum, rows.map(_._3).sum) === t18,
      "t31/t18 token accounting diverged")
  }

  test("t25: the kept set is the true top-100 of the full pool-score frame") {
    val out = datapipe.TextAnalysis.queries("t25_dsir_resample")(spark, sf)
      .as[(Long, String, Long, Double)].collect()
    assert(out.length === 100)
    assert(out.forall(_._2 != "en"), "an in-target (en) doc leaked into the pool")
    // the reproducibility contract: (score desc, doc_id asc) total order
    val key = out.map { case (id, _, _, w) => (-w, id) }
    assert(key.sameElements(key.sorted), "output not in (avg_w desc, doc_id) order")
    // re-rank the UNLIMITED score frame in Scala and pin the selection —
    // TakeOrderedAndProject must agree with a full sort at any parallelism
    val all = datapipe.TextAnalysis.dsirScores(spark, sf)
      .as[(Long, String, Long, Double)].collect()
    val want = all.sortBy { case (id, _, _, w) => (-w, id) }.take(100).toSeq
    assert(out.toSeq === want, "top-k disagreed with the full ranking")
    // and the pool frame scores EVERY non-target doc (nothing silently drops)
    val nPool = Tables.documents(spark, sf).filter($"lang" =!= "en").count()
    assert(all.length.toLong === nPool)
  }

  test("t27: quartiles tile the corpus evenly with non-overlapping NLL ranges") {
    val out = datapipe.TextAnalysis.queries("t27_curriculum_buckets")(spark, sf)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1, 2, 3, 4))
    val n = out.map(_._2).sum
    assert(n === datapipe.TextAnalysis.bigramScores(spark, sf).count())
    // SQL ntile: first (n mod 4) buckets get the extra row
    out.foreach { case (b, nd, _, lo, hi) =>
      val want = n / 4 + (if (b <= n % 4) 1 else 0)
      assert(nd === want, s"bucket $b has $nd docs, want $want")
      assert(lo <= hi)
    }
    // curriculum stages are ordered: bucket k's hardest doc is no harder
    // than bucket k+1's easiest (ties across the cut are legal)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._4,
        s"bucket ${a._1} hi ${a._5} > bucket ${b._1} lo ${b._4}")
    }
  }

  test("t29: outlier counts match an exact BigInt recomputation; Chebyshev holds") {
    import graft.functions.WordStats
    val out = datapipe.TextAnalysis.queries("t29_quality_drift")(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // per-doc micro-quality via the production column, moment algebra
    // redone independently in BigInt (no Spark, no decimal, no double)
    val qm = Tables.documents(spark, sf)
      .withColumn("ws", WordStats.word_stats($"text"))
      .withColumn("n_words", WordStats.nWords($"ws"))
      .filter($"n_words" >= 1)
      .select($"source",
        round((WordStats.nDistinct($"ws") / $"n_words" * 0.4 +
          (lit(1.0) - WordStats.nStop($"ws") / $"n_words") * 0.3 +
          least($"n_words" / 100.0, lit(1.0)) * 0.3) * 1e6)
          .cast("long").as("qm"))
      .as[(String, Long)].collect()
    assert(out.keySet === qm.map(_._1).toSet)
    qm.groupBy(_._1).foreach { case (src, xs) =>
      val v = xs.map(x => BigInt(x._2))
      val n = BigInt(v.length)
      val s1 = v.sum
      val s2 = v.map(x => x * x).sum
      val want = v.count { q => val l = q * n - s1; l * l > (n * s2 - s1 * s1) * 4 }
      val (_, nDocs, _, stdQ, nOut) = out(src)
      assert(nDocs === v.length.toLong, s"$src doc count")
      assert(nOut === want.toLong, s"$src outliers: got $nOut want $want")
      // Chebyshev at 2 sigma: at most a quarter of the docs qualify
      assert(nOut * 4 <= nDocs, s"$src violates Chebyshev")
      assert(stdQ >= 0.0)
    }
  }

  test("t28: exact copies read shared_frac 1.0; near-copies sit strictly inside (0,1)") {
    val out = datapipe.TextAnalysis.queries("t28_crossdoc_grams")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    val m = out.map(r => r._1 -> r._4).toMap
    val baseIds = Tables.documents(spark, sf).select($"doc_id").as[Long].collect()
    val exact = baseIds.filter(_ % 7 == 0)
    assert(exact.nonEmpty, "no planted exact copies — pin is vacuous")
    exact.foreach { id =>
      // every 5-gram of an exact-copy pair exists on the other side
      Seq(id, id + 2000000L).foreach(x =>
        m.get(x).foreach(f => assert(f === 1.0, s"doc $x frac $f")))
    }
    // a near-copy shares the base doc's grams but owns the grams that
    // straddle its distinctive suffix
    baseIds.filter(_ % 10 == 0).map(_ + 1000000L).foreach(x =>
      m.get(x).foreach(f =>
        assert(f > 0.0 && f < 1.0, s"near-copy $x frac $f")))
  }

  test("m08: cuts land exactly on the planted 5-frame shot boundaries") {
    val out = datapipe.Multimodal.queries("m08_scene_cuts")(spark, sf)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(out.length > 0)
    out.foreach { case (id, n, cuts, first, total) =>
      assert(n === (16 + id % 9).toInt)
      // shots are 5 frames: boundaries at f = 5, 10, 15[, 20] — exactly
      // (n-1)/5 of them, the first always at 5; within-shot frames are
      // pixel-identical so EVERY unit of total_delta comes from a cut
      assert(cuts === (n - 1) / 5, s"id=$id n=$n cuts=$cuts")
      assert(first === 5L, s"id=$id first=$first")
      // within-shot frames are pixel-identical, so every unit of
      // total_delta comes from a boundary transition: each of the
      // `cuts` boundaries contributed more than the 384 threshold and
      // at most 48 pixels × 255
      assert(total > 384L * cuts && total <= 48L * 255 * cuts,
        s"id=$id: total=$total outside boundary-only range, cuts=$cuts")
    }
  }

  test("d25: planted leaks read exactly one 16-word head span; doc set equals d12's") {
    val out = datapipe.Dedup.queries("d25_decontaminate_spans")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    // d25 and d12 flag the SAME docs (>= 1 bench-gram hit) — only the
    // report differs (spans vs hit counts)
    val d12docs = datapipe.Dedup.queries("d12_decontaminate")(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet === d12docs)
    out.foreach { case (id, nw, ns, cov, mx, frac) =>
      assert(ns >= 1 && cov >= 8 && cov <= nw && mx <= cov, s"doc $id")
      assert(frac === cov.toDouble / nw, s"doc $id: frac formula")
    }
    // every planted leak whose bench source has >= 16 words is 16 bench
    // words + 24 unique filler: exactly ONE span, words [1, 16]
    val m = out.map(r => r._1 -> r).toMap
    val planted = Tables.documents(spark, sf)
      .filter($"doc_id" % 50 === 0)
      .filter(size(split($"text", " ")) >= 16)
      .select($"doc_id" + 5000000L).as[Long].collect()
    assert(planted.nonEmpty, "no planted leaks — pin is vacuous")
    planted.foreach { id =>
      val (_, nw, ns, cov, mx, frac) = m(id)
      assert(nw === 40L && ns === 1L && cov === 16L && mx === 16L,
        s"leak $id: ($nw, $ns, $cov, $mx)")
      assert(frac === 0.4)
    }
  }

  test("m09: VAD runs match the planted speech/silence segment pattern exactly") {
    val out = datapipe.Multimodal.queries("m09_audio_vad")(spark, sf)
      .as[(Long, Int, Int, Int, Int, Int, Int, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, n, nw, nAct, nSeg, longest, first, frac) =>
      assert(n === 128 + (id % 4).toInt * 32 && nw === n / 16)
      // 32-sample segments carry exactly 2 windows each, and a window's
      // activity equals its segment's planted speech-ness, so every
      // reported run statistic is derivable from (id + s) % 3 alone
      val active = (0 until n / 32).map(s => (id + s) % 3 != 0)
      assert(nAct === 2 * active.count(identity), s"id=$id")
      var runs = 0; var cur = 0; var mx = 0
      active.foreach { a =>
        if (a) { cur += 1; if (cur == 1) runs += 1; if (cur > mx) mx = cur }
        else cur = 0
      }
      assert(nSeg === runs, s"id=$id")
      assert(longest === 2 * mx, s"id=$id")
      assert(first ===
        (if (active.contains(true)) 2 * active.indexOf(true) else -1))
      assert(frac === nAct.toDouble / nw)
    }
  }

  test("m07: every planted caption variant surfaces as a multi-caption group") {
    val out = datapipe.Multimodal.queries("m07_caption_variants")(spark, sf)
      .as[(Long, Int, Int, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, _, _, _, nItems, nCaps) =>
      assert(nCaps > 1, "reported group has a single caption")
      assert(nItems >= nCaps, "more distinct captions than pairs")
    }
    // each %7 doc contributes (base, alt-caption) — both land in SOME
    // reported group (hash-collision merges only grow groups), so the
    // reported pair mass covers every planted variant
    val planted = Tables.documents(spark, sf)
      .filter($"doc_id" % 7 === 0).count()
    assert(planted > 0, "fixture has no planted variants — pin is vacuous")
    assert(out.map(_._5).sum >= 2 * planted,
      "planted caption-variant pairs missing from the report")
  }

  test("t26: each word carries exactly one bigram and NLLs are positive") {
    val out = datapipe.TextAnalysis.queries("t26_bigram_nll")(spark, sf)
      .as[(Long, Long, Double)].collect()
    val nToks = Tables.documents(spark, sf)
      .select($"doc_id", expr("size(filter(split(text, ' '), x -> x <> ''))")
        .cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    // the '<s>' start context makes bigram count == word count per doc,
    // and every tokenizable doc must appear
    assert(out.length === nToks.count(_._2 >= 1))
    out.foreach { case (id, nb, nll) =>
      assert(nb === nToks(id), s"doc $id: bigrams $nb words ${nToks(id)}")
      // add-one smoothing keeps every p(w|pw) strictly < 1 → NLL > 0
      assert(nll > 0.0, s"doc $id avg_nll $nll")
    }
  }

  test("t32: every rule flag equals a Scala recomputation; each rule fires and none is universal") {
    val out = datapipe.TextAnalysis.queries("t32_quality_rules")(spark, sf)
      .as[(Long, Long, Long, Long, Boolean, Boolean, Boolean, Boolean,
           Boolean, Long, Boolean)].collect()
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(out.length === docs.size)
    out.foreach { case (id, nw, nd, mx, rs, rl, rr, rt, rn, nf, keep) =>
      val ws = docs(id).split(" ").filter(_.nonEmpty)
      val c = ws.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
      val (n, dist, mc) = (ws.length.toLong, c.size.toLong, c.values.max)
      val sumCh = ws.map(_.length.toLong).sum
      val stop = c.getOrElse("a", 0L) + c.getOrElse("the", 0L)
      assert((nw, nd, mx) === ((n, dist, mc)), s"doc $id counts")
      assert(rs === (n < 15) && rl === (sumCh * 10 > n * 50) &&
             rr === (mc * 8 > n) && rt === (dist * 5 < n * 2) &&
             rn === (stop == 0L), s"doc $id flags")
      val flags = Seq(rs, rl, rr, rt, rn)
      assert(nf === flags.count(identity).toLong && keep === (nf == 0L),
        s"doc $id verdict")
    }
    // every rule must decide something on this corpus, and no rule may
    // decide everything — otherwise the battery is untested decoration
    val cols = Seq[((Long, Long, Long, Long, Boolean, Boolean, Boolean,
      Boolean, Boolean, Long, Boolean)) => Boolean](
      _._5, _._6, _._7, _._8, _._9)
    cols.zip(Seq("r_short", "r_longwords", "r_repeat", "r_lowttr",
                 "r_nostop")).foreach { case (f, name) =>
      val k = out.count(f)
      assert(k > 0 && k < out.length, s"$name vacuous: fires $k/${out.length}")
    }
    assert(out.exists(_._11) && out.exists(!_._11), "verdict vacuous")
  }

  test("t33: temperature ordering — lower alpha flattens the mixture toward uniform") {
    val out = datapipe.TextAnalysis.queries("t33_mixture_temperature")(spark, sf)
      .as[(String, Long, Double, Double, Double, Double, Double)].collect()
    assert(out.length >= 2)
    val nTot = out.map(_._2).sum
    // each weight column normalizes to 1 (integer-unit normalization:
    // only the final divisions are float)
    Seq[((String, Long, Double, Double, Double, Double, Double)) => Double](
      _._3, _._4, _._5, _._6).foreach { f =>
      assert(math.abs(out.map(f).sum - 1.0) < 1e-9, "weights don't normalize")
    }
    // epochs = weight * N / n, exactly as documented
    out.foreach { case (src, n, share, _, w50, _, ep) =>
      assert(math.abs(share - n.toDouble / nTot) < 1e-12, s"$src share")
      assert(math.abs(ep - w50 * nTot / n) < 1e-9, s"$src epochs")
    }
    // the flattening law: the max/min weight ratio is monotone in alpha
    // ((n_a/n_b)^alpha is increasing in alpha for n_a > n_b)
    def spread(f: ((String, Long, Double, Double, Double, Double, Double))
        => Double) = out.map(f).max / out.map(f).min
    val Seq(s25, s50, s75, s100) =
      Seq[((String, Long, Double, Double, Double, Double, Double)) => Double](
        _._4, _._5, _._6, _._3).map(spread)
    assert(s25 <= s50 + 1e-9 && s50 <= s75 + 1e-9 && s75 <= s100 + 1e-9,
      s"spread not monotone in alpha: $s25 $s50 $s75 $s100")
    assert(s100 > 1.0, "corpus has a flat mixture — ordering pin is vacuous")
  }

  test("d26: planted snapshot classes — exact re-crawls, boilerplate near-dups, reversed novels") {
    val out = datapipe.Dedup.queries("d26_snapshot_dedup")(spark, sf)
      .as[(Long, String, Option[Long], Option[Double])].collect()
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val exp = texts.keys.filter(_ % 7 == 0).map(_ + 2000000L).toSet ++
      texts.keys.filter(_ % 10 == 0).map(_ + 1000000L).toSet ++
      texts.keys.filter(_ % 9 == 4).map(_ + 4000000L).toSet
    assert(out.map(_._1).toSet === exp, "new-snapshot doc set")
    val byClass = out.groupBy(_._1 / 1000000L)
    // exact re-crawls: always detected (md5 layer needs no banding luck),
    // and the matched old doc carries byte-identical text
    byClass(2L).foreach { case (id, st, m, j) =>
      assert(st === "exact_dup" && j === Some(1.0), s"$id")
      assert(m.exists(o => texts(o) == texts(id - 2000000L)), s"$id match text")
    }
    // reversed docs: structurally novel — no 3-shingle survives reversal
    byClass(4L).foreach { case (id, st, m, j) =>
      assert(st === "novel" && m.isEmpty && j.isEmpty, s"$id")
    }
    // suffix plants: never exact; banding recall may drop a few to
    // novel (deterministically — the oracle mirrors the banding), but
    // the family must overwhelmingly land near_dup with J >= 0.5
    val near = byClass(1L)
    assert(near.forall(_._2 != "exact_dup"), "a suffix plant matched exactly")
    val hit = near.filter(_._2 == "near_dup")
    assert(hit.length * 5 >= near.length * 4,
      s"banding recall collapsed: ${hit.length}/${near.length}")
    hit.foreach { case (id, _, m, j) =>
      assert(j.exists(_ >= 0.5) && m.nonEmpty, s"$id")
    }
  }

  test("m10: detected margins and content box equal the planted geometry for every image") {
    val out = datapipe.Multimodal.queries("m10_border_detect")(spark, sf)
      .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int, Long, Long, Double)]
      .collect()
    assert(out.nonEmpty)
    out.foreach { case (id, w, h, t, b, l, r, cw, ch, bpx, csum, frac) =>
      val (et, eb, el, er, ecw, ech) =
        datapipe.Multimodal.ImageCodec.borderGeom(id)
      assert((t, b, l, r) === ((et, eb, el, er)), s"id=$id margins")
      assert((cw, ch) === ((ecw, ech)) && w === el + ecw + er &&
             h === et + ech + eb, s"id=$id box")
      val expSum = (for (y <- 0 until ech; x <- 0 until ecw)
        yield datapipe.Multimodal.ImageCodec.contentPixel(id, x, y).toLong).sum
      assert(csum === expSum && bpx === w.toLong * h - cw.toLong * ch,
        s"id=$id content")
      assert(frac === cw.toDouble * ch / (w * h), s"id=$id frac")
    }
    // every side must hit zero AND non-zero margins across the corpus —
    // otherwise the edge scans are only half-exercised
    Seq[((Long, Int, Int, Int, Int, Int, Int, Int, Int, Long, Long, Double))
        => Int](_._4, _._5, _._6, _._7).foreach { f =>
      assert(out.exists(f(_) == 0) && out.exists(f(_) > 0),
        "a margin side never varies — detector half-exercised")
    }
  }

  test("s21: reduced-space recall is lossy but real, and monotone in candidate depth") {
    val out = datapipe.Similarity.queries("s21_rp_recall")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val t30 = out("rp16_top30"); val t100 = out("rp16_top100")
    assert(t30._2 === 32L && t100._2 === 32L)
    assert(t30._3 === t100._3, "truth set differs between depths")
    assert(t30._4 <= t100._4, "hits not monotone in candidate depth")
    assert(t30._5 === 32L * 30 && t100._5 === 32L * 100)
    // the projection must carry signal (recall > chance) yet the eval
    // must measure LOSS (recall < 1) — both ends non-vacuous
    assert(t100._6 > 0.2 && t100._6 < 1.0, s"recall@100 ${t100._6}")
    assert(t30._6 > 0.0 && t30._6 <= t100._6)
    // the sign matrix is a frozen constant: 16×64 Rademacher rows
    val sg = datapipe.Similarity.RP_SIGNS
    assert(sg.length === 16 && sg.forall(_.length === 64))
    assert(sg.flatten.forall(v => v == 1L || v == -1L))
    val ones = sg.flatten.count(_ == 1L)
    assert(ones > 400 && ones < 624, s"sign matrix degenerate: $ones/1024")
  }

  test("s24: int8 codes are lossy at the component level yet lossless at rerank width") {
    val out = datapipe.Similarity.queries("s24_sq_recall")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val t30 = out("sq8_top30"); val t100 = out("sq8_top100")
    assert(t30._2 === 32L && t100._2 === 32L)
    assert(t30._3 === t100._3, "truth set differs between depths")
    assert(t30._4 <= t100._4, "hits not monotone in candidate depth")
    assert(t30._5 === 32L * 30 && t100._5 === 32L * 100)
    // SQ8's headline: 8 bits against one global scale costs nothing at
    // rerank width on this corpus — but only because the resolution is
    // adequate, which the first-principles recompute below makes
    // non-vacuous (the codes really do discard information)
    assert(t30._6 > 0.9 && t30._6 <= t100._6 && t100._6 <= 1.0)
    // quantizer from first principles: 1e6 grid, integer global maxabs,
    // symmetric round-half-up — codes within ±127, reconstruction
    // within the half-step bound, the negative round-UP branch (the
    // sign-reapplication subtlety) actually exercised, and at least one
    // component not exactly representable (the eval measures something)
    val fxAll = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"embedding").as[Array[Float]].collect()
      .filter(_.nonEmpty)
      .map(_.map(x => math.round(x.toDouble * 1e6)))
    val m = math.max(fxAll.iterator.flatten.map(math.abs).max, 1L)
    var negUp = false; var lossy = false
    fxAll.foreach(_.foreach { x =>
      val a = math.abs(x)
      val c0 = (254 * a + m) / (2 * m)
      val code = if (x >= 0) c0 else -c0
      assert(math.abs(code) <= 127, s"code $code out of int8 range")
      assert(math.abs(254 * x - 2 * m * code) <= m,
        s"reconstruction bound violated at x=$x m=$m")
      if (x < 0 && (254 * a) % (2 * m) >= m) negUp = true
      if (254 * x != 2 * m * code) lossy = true
    })
    assert(negUp, "no negative component takes the round-up branch")
    assert(lossy, "quantizer is exact on every component — eval vacuous")
  }

  test("s25: range counts, checksums, and NN distances equal the exact recompute") {
    val out = datapipe.Similarity.queries("s25_range_search")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 32)
    val R1 = 15000000000000000L; val R2 = 17000000000000000L
    def ph(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .filter(_._2.nonEmpty)
      .map { case (id, e) => id -> e.map(x => math.round(x.toDouble * 1e8)) }
    val qids = vecs.map(_._1).sortBy(id => (ph(id.toString), id)).take(32).toSet
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byQ = out.map(r => r._1 -> r).toMap
    assert(byQ.keySet === qids)
    vecs.filter(v => qids(v._1)).foreach { case (q, qv) =>
      val ds = vecs.filter(_._1 != q).map { case (id, v) => (id, d2(v, qv)) }
      val exp = (q, ds.map(_._2).min,
        ds.count(_._2 <= R1).toLong, ds.count(_._2 <= R2).toLong,
        ds.filter(_._2 <= R1).map(_._1).sum)
      assert(byQ(q) === exp, s"q=$q")
    }
    // structural coupling: the radius report and the NN stat must agree
    out.foreach { case (q, nn, n1, n2, _) =>
      assert(n1 <= n2, s"q=$q monotone")
      assert((n1 > 0) === (nn <= R1), s"q=$q nn/radius consistency")
    }
    assert(out.exists(_._3 > 0) && out.exists(r => r._4 > r._3),
      "radii fail to separate — both counts identical everywhere")
  }

  test("s26: the composed IVF+SQ8 report replays from assignment + integer rerank") {
    import datapipe.Similarity
    val out = Similarity.queries("s26_ivfsq_recall")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def ph(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    // cells via the library's own map-only argmax (its determinism is
    // pinned elsewhere); everything downstream — codes, probe ranking,
    // candidate rerank, truth, counts — replays in plain Scala
    val embF = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(size($"embedding") > 0)
    val centroids = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(($"vec_id" % 8).as("cell"),
              posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"cell", $"pos")
      .agg((sum($"v".cast("decimal(18,8)")).cast("double") / count(lit(1)))
        .cast("float").as("m"))
      .groupBy($"cell")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
        .as("centroid"))
    val centsRow = centroids.agg(
      expr("array_sort(collect_list(struct(cell, centroid)))").as("cents"))
    val cellOf = Similarity.assignCells(embF, centsRow, "home_cell")
      .select($"vec_id", $"home_cell".cast("int")).as[(Long, Int)]
      .collect().toMap
    val cents = centroids.select($"cell".cast("int"), $"centroid")
      .as[(Int, Array[Float])].collect().sortBy(_._1)
    val vecs = embF.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    val fx6 = vecs.map { case (id, e) =>
      id -> e.map(x => math.round(x.toDouble * 1e6)) }.toMap
    val m = math.max(fx6.valuesIterator.flatten.map(math.abs).max, 1L)
    def code(x: Long): Long = {
      val a = math.abs(x); val c = (254 * a + m) / (2 * m)
      if (x >= 0) c else -c
    }
    val codes = fx6.map { case (id, f) => id -> f.map(code) }
    val fx8 = vecs.map { case (id, e) =>
      id -> e.map(x => math.round(x.toDouble * 1e8)) }.toMap
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc / (math.sqrt(cos0(a)) * math.sqrt(cos0(b)))
    }
    def cos0(a: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * a(i).toDouble; i += 1 }
      acc
    }
    val qids = vecs.map(_._1).sortBy(id => (ph(id.toString), id)).take(32)
    val qemb = vecs.toMap
    var hits30 = 0L; var hits100 = 0L; var nc30 = 0L; var nc100 = 0L
    var nTruth = 0L
    qids.foreach { q =>
      val pcells = cents.map { case (c, ce) => (c, cos(qemb(q), ce)) }
        .sortBy { case (c, s) => (-s, c) }.take(2).map(_._1).toSet
      val cand = vecs.filter(v => v._1 != q && pcells(cellOf(v._1)))
        .map { case (id, _) => (id, l2(codes(id), codes(q))) }
        .sortBy { case (id, d) => (d, id) }
      val truth = vecs.filter(_._1 != q)
        .map { case (id, _) => (id, l2(fx8(id), fx8(q))) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      nTruth += truth.size
      val c30 = cand.take(30).map(_._1); val c100 = cand.take(100).map(_._1)
      hits30 += c30.count(truth); hits100 += c100.count(truth)
      nc30 += c30.length; nc100 += c100.length
    }
    assert(out("ivfsq_top30") ===
      (("ivfsq_top30", 32L, nTruth, hits30, nc30,
        hits30.toDouble / nTruth, nc30.toDouble / 32)))
    assert(out("ivfsq_top100") ===
      (("ivfsq_top100", 32L, nTruth, hits100, nc100,
        hits100.toDouble / nTruth, nc100.toDouble / 32)))
    // the composition must MEASURE loss on this fixture (cell pruning
    // bounds recall away from 1) while still beating chance
    assert(out("ivfsq_top100")._6 > 0.1 && out("ivfsq_top100")._6 < 1.0)
  }

  test("s27: curve endpoints pinned — np 1/2 equal s15 exactly, np 8 exhaustive") {
    val rows = datapipe.Similarity.queries("s27_nprobe_curve")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq ===
      Seq("ivf_nprobe_1", "ivf_nprobe_2", "ivf_nprobe_4", "ivf_nprobe_8"))
    val Array(p1, p2, p4, p8) = rows
    // same quantizer, sample, and candidate-set semantics as s15, so
    // the np=1/2 points must reproduce s15's oracle-checked rows to
    // the last integer — the pr_star formulation is a REFORMULATION,
    // not a new measurement
    val s15 = datapipe.Similarity.queries("s15_ivf_recall")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    for ((p, np) <- Seq((p1, "1"), (p2, "2"))) {
      val r = s15(s"ivf_nprobe_$np")
      assert((p._2, p._3, p._4, p._5, p._6, p._7) ===
        ((r._2, r._3, r._4, r._5, r._6, r._7)),
        s"np=$np disagrees with s15")
    }
    // np=8 probes every cell: exhaustive by construction
    val n = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(size($"embedding") > 0).count()
    assert(p8._4 === p8._3 && p8._6 === 1.0, "np=8 must recall everything")
    assert(p8._5 === p8._2 * (n - 1) && p8._8 === 1.0,
      "np=8 must scan the whole corpus minus self")
    // monotone: a larger probe list is a candidate superset
    assert(p1._4 <= p2._4 && p2._4 <= p4._4 && p4._4 <= p8._4)
    assert(p1._5 <= p2._5 && p2._5 <= p4._5 && p4._5 <= p8._5)
    assert(p1._6 < p8._6, "the curve must actually climb on this corpus")
    rows.foreach { case (_, nQ, truth, hits, cand, recall, avgC, frac) =>
      assert(hits <= truth && hits <= cand)
      assert(recall === hits.toDouble / truth)
      assert(avgC === cand.toDouble / nQ)
      assert(frac === cand.toDouble / (nQ * (n - 1)))
    }
  }

  test("s28: live recall replays from assignment + plain-Scala probe/truth") {
    import datapipe.{Similarity, VectorIndex}
    val out = datapipe.VectorIndex.queries("s28_deletion_recall")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double, Long)]
      .collect()
    assert(out.length === 1)
    val r = out.head
    def ph(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val embAll = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").filter(size($"embedding") > 0)
      .as[(Long, Array[Float])].collect()
    // cells from the library's lifecycle pieces (their determinism is
    // pinned in VectorIndexSpec); probe + truth replay in plain Scala
    val seed = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").filter($"vec_id" % 3 =!= 0)
    val batch = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").filter($"vec_id" % 3 === 0)
    val cents = VectorIndex.trainCentroids(seed).localCheckpoint()
    val cRow = cents.agg(
      expr("array_sort(collect_list(struct(cell, centroid)))").as("cents"))
    val cellOf =
      Similarity.assignCells(seed, cRow, "cell")
        .unionByName(Similarity.assignCells(batch, cRow, "cell"))
        .select($"vec_id", $"cell".cast("int"))
        .as[(Long, Int)].collect().toMap
    val centArr = cents.select($"cell".cast("int"), $"centroid")
      .as[(Int, Array[Float])].collect().sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val live = embAll.filter(_._1 % 5 != 0)
    val liveMap = live.toMap
    val qids = live.map(_._1).sortBy(id => (ph(id.toString), id)).take(32)
    var hits = 0L; var nCand = 0L; var nTruth = 0L; var dead = 0L
    qids.foreach { q =>
      val pcells = centArr
        .map { case (c, ce) => (c, cos(liveMap(q), ce)) }
        .sortBy { case (c, sc) => (sc.isNaN, -sc, c) }.take(2)
        .map(_._1).toSet
      val probed = embAll.filter(v => v._1 != q && pcells(cellOf(v._1)))
      val candSet = probed.filter(_._1 % 5 != 0).map(_._1).toSet
      dead += probed.count(_._1 % 5 == 0)
      nCand += candSet.size
      val truth = live.filter(_._1 != q)
        .map { case (id, e) => (id, cos(liveMap(q), e)) }
        .filterNot(_._2.isNaN)
        .sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1)
      nTruth += truth.size
      hits += truth.count(candSet)
    }
    assert(r === (("live_nprobe_2", 32L, nTruth, hits, nCand,
      hits.toDouble / nTruth, nCand.toDouble / 32, dead)))
    // the takedown must be visible in the probe stream, and the live
    // recall must stay in the index's known band (s15 measured 0.43
    // pre-deletion — a stale quantizer shouldn't crater it)
    assert(dead > 0L, "no dead candidates pruned — takedown invisible")
    assert(r._6 > 0.2 && r._6 < 1.0, s"live recall ${r._6} out of band")
  }

  test("m11: every pyramid level matches the exact floor-average recompute") {
    val out = datapipe.Multimodal.queries("m11_image_pyramid")(spark, sf)
      .as[(Long, Int, Int, Long, Int, Int, Long, Int, Int, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, w0, h0, s0, w1, h1, s1, w2, h2, s2) =>
      val (ew, eh) = datapipe.Multimodal.ImageCodec.pyrDims(id)
      assert((w0, h0) === ((ew, eh)), s"id=$id L0 dims")
      assert((w1, h1) === ((ew / 2, eh / 2)) &&
             (w2, h2) === ((ew / 2 / 2, eh / 2 / 2)), s"id=$id pooled dims")
      def px(x: Int, y: Int) = datapipe.Multimodal.ImageCodec.pixel(id, x, y)
      val v1 = Array.tabulate(w1, h1)((x, y) =>
        (px(2 * x, 2 * y) + px(2 * x + 1, 2 * y) +
         px(2 * x, 2 * y + 1) + px(2 * x + 1, 2 * y + 1)) / 4)
      val v2 = Array.tabulate(w2, h2)((x, y) =>
        (v1(2 * x)(2 * y) + v1(2 * x + 1)(2 * y) +
         v1(2 * x)(2 * y + 1) + v1(2 * x + 1)(2 * y + 1)) / 4)
      val e0 = (for (y <- 0 until h0; x <- 0 until w0) yield px(x, y).toLong).sum
      assert(s0 === e0 && s1 === v1.flatten.map(_.toLong).sum &&
             s2 === v2.flatten.map(_.toLong).sum, s"id=$id sums")
    }
  }

  test("s22: one prediction per (k, query); accuracy is hits over the fixed sample") {
    val out = datapipe.Similarity.queries("s22_knn_label_eval")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq("knn_k1", "knn_k10", "knn_k5"))
    out.foreach { case (m, nq, hits, acc) =>
      assert(nq === 32L, s"$m n_q")
      assert(hits >= 0L && hits <= nq, s"$m hits=$hits")
      assert(acc === hits.toDouble / nq, s"$m accuracy inconsistent")
    }
  }

  test("d27: planted template re-renders convict iff the kept head covers half the variant") {
    val out = datapipe.Dedup.queries("d27_prefix_dedup")(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.nonEmpty)
    val dupIds = out.map(_._2).toSet
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).as("n"))
      .as[(Long, Int)].collect()
    var convicted = 0; var acquitted = 0
    toks.filter { case (id, n) => id % 7 == 3 && n >= 8 }.foreach {
      case (id, n) =>
        val p = math.max(8, (n + 1) / 2) // kept head
        val m = p + 12                   // variant length
        val convicts = p >= math.max(8, (m + 1) / 2)
        assert(dupIds.contains(id + 10000000L) === convicts,
          s"src=$id n=$n p=$p")
        if (convicts) convicted += 1 else acquitted += 1
    }
    assert(convicted > 0 && acquitted > 0,
      s"one-sided fixture: $convicted convicted, $acquitted acquitted")
    // every reported LCP at least covers the blocking prefix
    assert(out.forall(_._3 >= 8L))
  }

  test("t34: the span plan replays exactly from the deterministic hash; zeros explicit") {
    def ph(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val exp = docs.map { case (id, text) =>
      val n = text.split(" ", -1).length
      var spans = List.empty[(Int, Int)]
      (1 to n).filter(i => ph(s"$id:$i") % 20 == 0).foreach { i =>
        val e = math.min(i + 2, n)
        spans = spans match {
          case (s0, e0) :: tail if i <= e0 => (s0, math.max(e0, e)) :: tail
          case _                           => (i, e) :: spans
        }
      }
      val sp = spans.reverse
      id -> ((n.toLong, sp.length.toLong,
        sp.map(x => (x._2 - x._1 + 1).toLong).sum,
        if (sp.isEmpty) 0L else sp.map(x => (x._2 - x._1 + 1).toLong).max,
        if (sp.isEmpty) 0L else sp.head._1.toLong))
    }.toMap
    val out = datapipe.TextAnalysis.queries("t34_span_corruption")(spark, sf)
      .as[(Long, Long, Long, Long, Double, Long, Long)].collect()
    assert(out.length === exp.size)
    out.foreach { case (id, n, ns, mt, frac, ls, fs) =>
      assert((n, ns, mt, ls, fs) === exp(id), s"doc=$id")
      assert(frac === mt.toDouble / n, s"doc=$id frac")
    }
    // the fixture must exercise merged spans AND explicit zero rows,
    // and land near the T5 ~15% target in aggregate
    assert(out.exists(_._3 === 0L) && out.exists(r => r._6 > 3L))
    val rate = out.map(_._4).sum.toDouble / out.map(_._2).sum
    assert(rate > 0.08 && rate < 0.25, s"global mask rate $rate")
  }

  test("m12: decimated waveform features equal the exact floor-average recompute") {
    import datapipe.Multimodal.PcmCodec
    val out = datapipe.Multimodal.queries("m12_audio_decimate")(spark, sf)
      .as[(Long, Int, Int, Int, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, nin, nout, peak, sa, ws) =>
      val n = PcmCodec.nSamples(id)
      val o = Array.tabulate(n / 2)(i =>
        (PcmCodec.sample(id, 2 * i) + PcmCodec.sample(id, 2 * i + 1)) >> 1)
      assert(nin === n && nout === n / 2, s"id=$id dims")
      assert(peak === o.map(math.abs).max &&
             sa === o.map(x => math.abs(x).toLong).sum, s"id=$id amp")
      assert(ws === o.zipWithIndex
        .map { case (v, i) => v.toLong * ((i % 7) + 1) }.sum, s"id=$id wsum")
    }
    // odd negative pair sums must occur, or the >>1-vs-floor pin is vacuous
    assert(out.exists { case (id, _, _, _, _, _) =>
      val n = PcmCodec.nSamples(id)
      (0 until n / 2).exists { i =>
        val s = PcmCodec.sample(id, 2 * i) + PcmCodec.sample(id, 2 * i + 1)
        s < 0 && s % 2 != 0
      }
    }, "no odd negative pair sum in the corpus — floor semantics untested")
  }

  test("m23: downmix and channel verdicts equal the formula recompute; all three classes planted") {
    import datapipe.Multimodal.PcmCodec
    val out = datapipe.Multimodal.queries("m23_stereo_downmix")(spark, sf)
      .as[(Long, Int, Long, Long, Long, Int, Long, Boolean, Boolean)]
      .collect()
    assert(out.nonEmpty)
    out.foreach { case (id, nf, lm, rm, mm, peak, chk, dead, cancel) =>
      val n = PcmCodec.nSamples(id)
      // independent recompute straight from the channel formulas
      def lS(i: Int) = (((id * 7L + i * 13L) % 201L) - 100L).toInt
      def rS(i: Int) =
        if (id % 7 == 0) 0
        else if (id % 11 == 0) -lS(i)
        else (((id * 11L + i * 17L) % 201L) - 100L).toInt
      val mono = Array.tabulate(n)(i => (lS(i) + rS(i)) >> 1)
      assert(nf === n, s"id=$id frames")
      assert(lm === (0 until n).map(i => math.abs(lS(i)).toLong).sum)
      assert(rm === (0 until n).map(i => math.abs(rS(i)).toLong).sum)
      assert(mm === mono.map(x => math.abs(x).toLong).sum)
      assert(peak === mono.map(math.abs).max)
      assert(chk === mono.zipWithIndex
        .map { case (v, i) => v.toLong * (i + 1) }.sum, s"id=$id chk")
      assert(dead === (rm == 0L) && cancel === (mm * 8 < lm), s"id=$id flags")
      // class semantics: the verdicts land exactly on the plants
      if (id % 7 == 0) assert(dead && !cancel, s"id=$id dead class")
      else if (id % 11 == 0) assert(cancel && !dead, s"id=$id inverted class")
      else assert(!dead && !cancel, s"id=$id normal class")
      // phase inversion cancels to AT MOST the floor residue (-1 per
      // odd L): the downmix genuinely destroys the track
      if (id % 7 != 0 && id % 11 == 0)
        assert(mm <= n.toLong, s"id=$id inverted residue $mm > $n")
    }
    Seq(7L, 11L).foreach(k => assert(out.exists(r => r._1 % k == 0),
      s"no %$k plant in the corpus — a verdict class is untested"))
    assert(out.exists(r => r._1 % 7 != 0 && r._1 % 11 != 0))
  }

  test("m14: gain, clip count, and post-gain stats equal the exact integer recompute") {
    import datapipe.Multimodal.PcmCodec
    val out = datapipe.Multimodal.queries("m14_audio_normalize")(spark, sf)
      .as[(Long, Int, Int, Long, Long, Int, Long, Long)].collect()
    assert(out.nonEmpty)
    var posClip = false; var negClip = false; var truncCase = false
    out.foreach { case (id, n, peakIn, sa, g, nClip, peakOut, sao) =>
      val v = Array.tabulate(PcmCodec.nSamples(id))(PcmCodec.sample(id, _))
      assert(n === v.length && peakIn === v.map(math.abs).max &&
             sa === v.map(x => math.abs(x).toLong).sum, s"id=$id pre")
      val eg = 20000L * 256 * v.length / math.max(sa, 1L)
      assert(g === eg && g > 256, s"id=$id gain") // > 256 = amplification
      val ys = v.map { x =>
        val y0 = x.toLong * g / 256
        math.max(-32767L, math.min(32767L, y0))
      }
      val clips = v.count { x =>
        val y0 = x.toLong * g / 256; y0 > 32767 || y0 < -32767
      }
      assert(nClip === clips && peakOut === ys.map(math.abs).max &&
             sao === ys.map(math.abs).sum, s"id=$id post")
      v.foreach { x =>
        val y0 = x.toLong * g / 256
        if (y0 > 32767) posClip = true
        if (y0 < -32767) negClip = true
        // a negative product not divisible by 256: floor would differ
        // from the symmetric truncation both engines use
        if (x < 0 && (x.toLong * g) % 256 != 0) truncCase = true
      }
    }
    assert(posClip && negClip, "clipping never hit one of the rails")
    assert(truncCase, "no negative non-divisible product — trunc-vs-floor untested")
  }

  test("s23: greedy MMR replays exactly in plain Scala; picks distinct per query") {
    def ph(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    def fx(x: Float): Long = BigDecimal(x.toDouble * 1e8)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val embs = Tables.embeddings(spark, sf)
      .filter(size($"embedding") > 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(fx) }.sortBy(_._1)
    val byId = embs.toMap
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val qids = embs.map(_._1).sortBy(id => (ph(id.toString), id)).take(32)
    val exp = qids.flatMap { q =>
      val cand = embs.filter(_._1 != q)
        .map { case (id, v) => (id, d2(v, byId(q))) }
        .sortBy { case (id, dd) => (dd, id) }.take(20)
      var sel = List(cand.head._1)
      (2 to 5).foreach { _ =>
        val pick = cand.filterNot(c => sel.contains(c._1))
          .map { case (id, dq) =>
            val mind = sel.map(s => d2(byId(id), byId(s))).min
            (id, mind - dq)
          }
          .sortBy { case (id, sc) => (-sc, id) }.head._1
        sel = sel :+ pick
      }
      sel.zipWithIndex.map { case (id, i) =>
        (q, i + 1, id, cand.find(_._1 == id).get._2)
      }
    }
    val out = datapipe.Similarity.queries("s23_mmr_rerank")(spark, sf)
      .as[(Long, Int, Long, Long)].collect()
    assert(out.toSeq.sorted === exp.toSeq.sorted)
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).distinct.length === 5, s"q=$q repeats a pick")
    }
  }

  test("m15: rotation preserves mass, moves positions, and undoes in four turns") {
    import datapipe.Multimodal.ImageCodec
    val out = datapipe.Multimodal.queries("m15_image_rotate")(spark, sf)
      .as[(Long, Int, Int, Int, Int, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, w, h, rw, rh, sum, chkO, chkR) =>
      val (ew, eh) = ImageCodec.pyrDims(id)
      assert((w, h, rw, rh) === ((ew, eh, eh, ew)), s"id=$id dims")
      def px(x: Int, y: Int) = ImageCodec.pixel(id, x, y)
      val eSum = (for (y <- 0 until h; x <- 0 until w) yield px(x, y).toLong).sum
      val eChkO = (for (y <- 0 until h; x <- 0 until w)
        yield px(x, y).toLong * ((x + 1) + 257L * (y + 1))).sum
      val eChkR = (for (ny <- 0 until w; nx <- 0 until h)
        yield px(ny, h - 1 - nx).toLong * ((nx + 1) + 257L * (ny + 1))).sum
      assert(sum === eSum && chkO === eChkO && chkR === eChkR, s"id=$id chk")
      assert(chkO !== chkR, s"id=$id rotation left the checksum fixed")
    }
    // four quarter turns are the identity on the real pixel path
    val img = ImageCodec.decode(ImageCodec.synthPyrPng(11L))
    val r4 = Iterator.iterate(img)(ImageCodec.rotate90).drop(4).next()
    assert((r4.getWidth, r4.getHeight) === ((img.getWidth, img.getHeight)))
    assert(ImageCodec.posChk(r4) === ImageCodec.posChk(img) &&
           ImageCodec.graySum(r4) === ImageCodec.graySum(img))
  }

  test("m16: the integer CDF remap replays exactly and anchors 0/255") {
    import datapipe.Multimodal.ImageCodec
    val out = datapipe.Multimodal.queries("m16_hist_equalize")(spark, sf)
      .as[(Long, Int, Int, Long, Long, Long, Int, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, w, h, sumIn, sumEq, chkEq, mn, mx) =>
      val (ew, eh) = ImageCodec.pyrDims(id)
      assert((w, h) === ((ew, eh)), s"id=$id dims")
      val n = w * h
      val vs = for (y <- 0 until h; x <- 0 until w)
        yield ImageCodec.pixel(id, x, y)
      val hist = vs.groupBy(identity).view.mapValues(_.size).toMap
      val cdf = (0 to 255).scanLeft(0)((a, v) => a + hist.getOrElse(v, 0)).tail
      val cdfMin = cdf((0 to 255).find(hist.contains).get)
      def q(v: Int) =
        if (n == cdfMin) 0 else ((cdf(v) - cdfMin).toLong * 255 / (n - cdfMin)).toInt
      val eq = vs.map(q)
      val eChk = eq.zipWithIndex.map { case (v, i) =>
        val (x, y) = (i % w, i / w)
        v.toLong * ((x + 1) + 257L * (y + 1))
      }.sum
      assert(sumIn === vs.map(_.toLong).sum && sumEq === eq.map(_.toLong).sum &&
             chkEq === eChk, s"id=$id remap")
      assert(mn === 0 && mx === 255, s"id=$id anchors")
      assert(sumEq !== sumIn, s"id=$id remap is the identity — vacuous")
      // equalization must preserve tonal ORDER on present values
      val present = (0 to 255).filter(hist.contains)
      present.sliding(2).filter(_.length == 2).foreach { case Seq(a, b) =>
        assert(q(a) <= q(b), s"id=$id monotonicity at $a<$b")
      }
    }
  }

  test("m17: every patch replays from the pixel formula; crop and grid non-trivial") {
    import datapipe.Multimodal.ImageCodec
    val out = datapipe.Multimodal.queries("m17_patch_tiles")(spark, sf)
      .as[(Long, Int, Int, Int, Int, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, w, h, gw, gh, np, mass, contrast, crop, chk) =>
      val (ew, eh) = ImageCodec.pyrDims(id)
      assert((w, h, gw, gh) === ((ew, eh, ew / 4, eh / 4)), s"id=$id dims")
      assert(np === gw.toLong * gh && crop === w.toLong * h - 16L * gw * gh)
      var eMass = 0L; var eContrast = 0L; var eChk = 0L
      for (py <- 0 until gh; px <- 0 until gw) {
        val vs = for (j <- 0 until 4; i <- 0 until 4)
          yield ImageCodec.pixel(id, px * 4 + i, py * 4 + j)
        val psum = vs.map(_.toLong).sum
        eMass += psum
        eContrast += (vs.max - vs.min)
        eChk += (py.toLong * gw + px + 1) * psum
      }
      assert((mass, contrast, chk) === ((eMass, eContrast, eChk)), s"id=$id")
    }
    // fixture must exercise both crop branches and both grid widths —
    // otherwise the trailing-edge rule is untested
    assert(out.exists(_._9 > 0) && out.exists(_._9 === 0L), "crop branches")
    assert(out.map(_._4).distinct.length > 1, "single grid width — vacuous")
    assert(out.forall(_._8 > 0), "zero contrast everywhere — vacuous")
  }

  test("m18: every lag sum replays from the sample formula; decay structure real") {
    import datapipe.Multimodal.PcmCodec
    val out = datapipe.Multimodal.queries("m18_audio_autocorr")(spark, sf)
      .as[(Long, Int, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, n, r0, r1, r2, r4, r8, ac1) =>
      assert(n === PcmCodec.nSamples(id), s"id=$id n")
      def r(lag: Int): Long =
        (0 until n - lag).map(i =>
          PcmCodec.sample(id, i).toLong * PcmCodec.sample(id, i + lag)).sum
      assert((r0, r1, r2, r4, r8) === ((r(0), r(1), r(2), r(4), r(8))),
        s"id=$id lags")
      assert(ac1 === math.max(r1, 0L) * 1000000L / r0, s"id=$id ac1")
      // the planted sawtooth is smooth at lag 1 and decorrelates with
      // distance — the profile must show it, or the lags are misaligned
      assert(r0 > r1 && r1 > r2 && r2 > r4 && r4 > r8, s"id=$id decay")
      assert(ac1 > 0L && ac1 < 1000000L, s"id=$id ac1 range")
    }
    assert(out.map(_._8).distinct.length > 100,
      "ac1_ppm nearly constant — vacuous")
  }

  test("m19: planted GCE delays replay from real container bytes") {
    import datapipe.Multimodal.{VideoCodec, GifWalk}
    val out = datapipe.Multimodal.queries("m19_gif_timing")(spark, sf)
      .as[(Long, Int, Int, Int, Int, Long, Int, Int, Long, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, w, h, nf, ng, dsum, dmin, dmax, chk, tr) =>
      val n = VideoCodec.nFrames(id)
      val delays = (0 until n).map(f => VideoCodec.delayCs(id, f).toLong)
      assert((w, h, nf, ng) === ((8, 6, n, n)), s"id=$id structure")
      assert((dsum, dmin.toLong, dmax.toLong) ===
        ((delays.sum, delays.min, delays.max)), s"id=$id delays")
      assert(chk === delays.zipWithIndex.map { case (dl, f) =>
        (f + 1) * dl }.sum, s"id=$id chk")
      assert(tr, s"id=$id trailer missing")
    }
    // variable timing actually planted — a constant-delay fixture
    // would let a "read the first GCE" bug pass
    assert(out.exists(r => r._7 != r._8), "all delays equal — vacuous")
    // the walker reads REAL bytes: corrupting a delay byte changes the
    // report, truncating the trailer flips trailer_ok, and the timed
    // container still decodes through the real ImageIO reader
    val b = VideoCodec.synthVideoTimed(3L)
    val clean = GifWalk.walk(3L, b)
    assert(clean.n_frames === VideoCodec.nFrames(3L))
    val cut = GifWalk.walk(3L, b.dropRight(1))
    assert(!cut.trailer_ok, "trailer check blind to truncation")
    val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    rdr.setInput(iis)
    assert(rdr.getNumImages(true) === VideoCodec.nFrames(3L))
    rdr.dispose(); iis.close()
  }

  test("m20: RIFF walk replays planted fields; pad rule and integrity bite") {
    import datapipe.Multimodal.{PcmCodec, WavCodec}
    val out = datapipe.Multimodal.queries("m20_wav_metadata")(spark, sf)
      .as[(Long, Int, Int, Int, Int, Int, Long, String, Long, Boolean)]
      .collect()
    assert(out.nonEmpty)
    out.foreach { case (id, rate, br, ba, bits, n, dur, tag, sa, ok) =>
      val eRate = WavCodec.sampleRate(id)
      val eN = PcmCodec.nSamples(id)
      assert((rate, br, ba, bits, n) === ((eRate, eRate * 2, 2, 16, eN)),
        s"id=$id fmt")
      assert(dur === eN.toLong * 1000000L / eRate, s"id=$id duration")
      assert(tag === s"src${id % 20}", s"id=$id tag")
      assert(sa === (0 until eN).map(i =>
        math.abs(PcmCodec.sample(id, i)).toLong).sum, s"id=$id checksum")
      assert(ok, s"id=$id riff_ok")
    }
    // all three planted rates appear, and both pad parities (odd
    // "srcN" tags of length 4 and 5) were walked successfully
    assert(out.map(_._2).distinct.sorted.toSeq === Seq(8000, 16000, 24000))
    assert(out.map(_._8.length).distinct.sorted.toSeq === Seq(4, 5),
      "pad-rule branches (even and odd chunk data) not both exercised")
    // integrity actually bites: truncation flips riff_ok
    val b = WavCodec.synthWav(5L)
    assert(WavCodec.walk(5L, b).riff_ok)
    assert(!WavCodec.walk(5L, b.dropRight(2)).riff_ok,
      "truncated container read as clean")
  }

  test("m22: packing plan conserves tokens; packs fill next-fit; straddlers bounded") {
    val out = datapipe.Multimodal.queries("m22_navit_pack")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // dims from m13's real-byte walk — the same source m22 tokenizes
    val dims = datapipe.Multimodal.queries("m13_png_metadata")(spark, sf)
      .select($"asset_id", $"width", $"height")
      .as[(Long, Int, Int)].collect()
    val tokOf = dims.map { case (id, w, h) =>
      id -> (((w + 3) / 4).toLong * ((h + 3) / 4)) }.toMap
    val bucketOf = dims.map { case (id, w, h) =>
      id -> (w * 4 / h).toLong }.toMap
    // token conservation per bucket: the plan never loses an image
    val planned = out.groupBy(_._1).view
      .mapValues(_.map(_._4).sum).toMap
    val expected = tokOf.keys.toSeq.groupBy(bucketOf).view
      .mapValues(_.map(tokOf).sum).toMap
    assert(planned === expected, "per-bucket token mass diverged")
    out.groupBy(_._1).foreach { case (bucket, packs) =>
      // contiguous pack ids from 0
      assert(packs.map(_._2).sorted.toSeq === (0L until packs.length).toSeq,
        s"bucket $bucket pack ids not contiguous")
      // next-fit fill: every non-final pack holds >= the budget minus
      // its straddler's spill (i.e. cum crosses the boundary), which
      // with max tok 24 < 64 means >= 41 tokens; and at most one
      // straddler per pack (no image spans two boundaries)
      packs.foreach { p =>
        assert(p._5 <= 1, s"bucket $bucket pack ${p._2}: ${p._5} straddlers")
      }
      val maxTok = tokOf.values.max
      packs.filter(_._2 < packs.length - 1).foreach { p =>
        assert(p._4 > 64 - maxTok,
          s"bucket $bucket pack ${p._2} underfilled: ${p._4}")
      }
    }
    // non-vacuous: several aspect classes, multi-image packs, and the
    // straddle case all genuinely occur
    assert(out.map(_._1).distinct.length >= 2)
    assert(out.exists(_._3 > 1))
    assert(out.exists(_._5 === 1L))
  }

  test("m13: chunk walk reads real bytes — corruption flips the CRC verdict") {
    import datapipe.Multimodal.{ImageCodec, PngChunks}
    val out = datapipe.Multimodal.queries("m13_png_metadata")(spark, sf)
      .as[(Long, Int, Int, String, Int, Boolean)].collect()
    assert(out.nonEmpty && out.forall(_._6), "a CRC failed on clean input")
    out.foreach { case (id, w, h, tag, nt, _) =>
      val (ew, eh) = ImageCodec.pyrDims(id)
      assert((w, h) === ((ew, eh)) && tag === s"src${id % 20}" && nt === 1,
        s"id=$id")
    }
    // the spliced container still decodes through the real reader
    val png = PngChunks.withTextChunk(
      ImageCodec.synthPyrPng(7L), "Source", "src7")
    val img = ImageCodec.decode(png)
    assert((img.getWidth, img.getHeight) === ImageCodec.pyrDims(7L))
    // flip one byte in the tail (IDAT data/CRC region) -> must be caught
    val bad = png.clone()
    bad(bad.length - 20) = (bad(bad.length - 20) ^ 0x40).toByte
    assert(!PngChunks.walk(7L, bad).crc_all_ok, "corruption not detected")
  }

  test("m21: strip removes every ancillary byte, keeps pixels and container validity") {
    import datapipe.Multimodal.{ImageCodec, PngChunks}
    val out = datapipe.Multimodal.queries("m21_metadata_strip")(spark, sf)
      .as[(Long, Int, Int, Int, Int, Int, String, Boolean, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, w, h, ntB, nd, ntA, tagA, crc, _) =>
      assert((w, h) === ImageCodec.pyrDims(id), s"id=$id dims")
      val planted = 1 + (if (id % 3 == 0) 1 else 0)
      assert(ntB === planted && nd === planted, s"id=$id counts")
      assert(ntA === 0 && tagA === "" && crc, s"id=$id scrub incomplete")
    }
    // byte-level proof on one asset: no tEXt type-tag survives in the
    // rewritten bytes, the rewrite is strictly shorter, and the strip
    // does NOT mask corruption (a flipped critical byte still fails
    // the post-strip walk — the validity column is non-vacuous)
    val png = PngChunks.withTextChunk(PngChunks.withTextChunk(
      ImageCodec.synthPyrPng(9L), "Source", "src9"), "Comment", "c9")
    val (stripped, dropped) = PngChunks.stripAncillary(png)
    assert(dropped === 2 && stripped.length < png.length)
    val tExt = "tEXt".getBytes("ISO-8859-1")
    assert(!stripped.sliding(4).exists(_.sameElements(tExt)),
      "a tEXt tag survived the strip")
    assert(ImageCodec.graySum(ImageCodec.decode(stripped)) ===
      ImageCodec.graySum(ImageCodec.decode(png)), "pixels changed")
    val bad = png.clone()
    bad(bad.length - 20) = (bad(bad.length - 20) ^ 0x40).toByte
    val (badStripped, _) = PngChunks.stripAncillary(bad)
    assert(!PngChunks.walk(9L, badStripped).crc_all_ok,
      "strip masked critical-chunk corruption")
  }

  test("d28: near-dup pairs never straddle the split; a doc-level split would leak") {
    val out = datapipe.Dedup.queries("d28_cluster_split")(spark, sf)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq("eval", "train"))
    assert(out.forall(_._4 === 0L), "a near-dup pair straddles the split")
    assert(out.forall(r => r._2 > 0 && r._3 > 0), "one side empty")
    assert(out.exists(r => r._2 > r._3), "no multi-member cluster assigned")
    // counter-factual: the same corpus split at DOC level (t24's hash on
    // the doc id instead of the cluster label) WOULD leak — the fixture
    // must be able to tell the two policies apart
    def ph(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val clusters = datapipe.Dedup.queries("d06_dedup_clusters")(spark, sf)
      .as[(Long, Long)].collect()
    val docLevelLeaks = clusters.groupBy(_._2).exists { case (_, ms) =>
      ms.map(m => ph(s"split:${m._1}") % 100 < 90).toSet.size == 2
    }
    assert(docLevelLeaks, "fixture cannot distinguish cluster- from doc-level split")
  }

  test("t35: per-source novel-shingle mass equals the cross-source df recompute") {
    val out = datapipe.TextAnalysis.queries("t35_source_novelty")(spark, sf)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").as[(String, String)].collect()
    val perSrc = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap { case (_, t) =>
        // words = segments between single spaces, empties kept — the
        // WordShinglePHashes/string_split grammar
        val ws = t.split(" ", -1)
        ws.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }.toSet
    }
    val dfAll = perSrc.values.flatten.groupBy(identity).map {
      case (g, _) => g -> perSrc.values.count(_.contains(g))
    }
    val expected = perSrc.map { case (src, gs) =>
      val novel = gs.count(g => dfAll(g) == 1).toLong
      src -> ((src, gs.size.toLong, novel, novel * 1000000L / gs.size))
    }
    assert(out.keySet === expected.keySet)
    expected.foreach { case (src, e) => assert(out(src) === e, s"src=$src") }
    assert(out.values.exists(_._3 > 0), "no novel gram anywhere — vacuous")
    assert(out.values.exists(r => r._3 < r._2),
      "every gram novel — cross-source sharing never exercised")
  }

  test("t36: chunk boundaries, overlap, and content hashes replay exactly") {
    def ph(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val out = datapipe.TextAnalysis.queries("t36_doc_chunks")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val C = 16; val S = 12
    docs.foreach { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      if (ws.nonEmpty) {
        val n = ws.length
        val nc = if (n <= C) 1 else 1 + (n - C + S - 1) / S
        val chunks = (0 until nc).map(ci => ws.slice(ci * S, ci * S + C))
        val hsum = chunks.map(c => ph(c.mkString(" ")) % 1000000000L).sum
        assert(out(id) === ((id, n.toLong, nc.toLong,
          (n - (nc - 1) * S).toLong, hsum)), s"id=$id")
        // every token covered; consecutive chunks share exactly the
        // C-S overlap (except a short last chunk, which shares more
        // of its predecessor's span)
        assert(chunks.map(_.length).sum >= n, s"id=$id coverage")
        chunks.sliding(2).filter(_.length == 2).foreach { case Seq(a, b) =>
          assert(a.takeRight(C - S).sameElements(b.take(C - S)) ||
                 b.length < C, s"id=$id overlap")
        }
      }
    }
    val ncs = out.values.map(_._3)
    assert(ncs.max >= 3 && ncs.min === 1L,
      "fixture lacks both multi-chunk and single-chunk docs")
  }

  test("t38: the context-length table replays from raw lengths; tradeoff monotone") {
    val out = datapipe.TextAnalysis.queries("t38_context_length_plan")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq(16L, 32L, 64L))
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").as[String].collect()
      .map(_.split(" ").count(_.nonEmpty).toLong)
    val total = lens.sum
    out.foreach { case (l, nDocs, nFit, nTrunc, pad, trunc, util) =>
      assert(nDocs === lens.length.toLong)
      assert(nFit === lens.count(_ <= l).toLong)
      assert(nTrunc === lens.count(_ > l).toLong)
      assert(pad === lens.map(x => l - math.min(x, l)).sum)
      assert(trunc === lens.map(x => math.max(x - l, 0L)).sum)
      val kept = lens.map(math.min(_, l)).sum
      assert(util === kept * 1000000L / (nDocs * l))
      // conservation: every token is kept or truncated; every slot is
      // kept or padding
      assert(kept + trunc === total && kept + pad === nDocs * l)
    }
    // the tradeoff the table exists to show: raising L buys truncation
    // with padding
    assert(out.map(_._5).sliding(2).forall(p => p(0) < p(1)), "pad not rising")
    assert(out.map(_._6).sliding(2).forall(p => p(0) > p(1)), "trunc not falling")
    assert(out.forall(r => r._4 > 0 && r._5 > 0),
      "a candidate L never truncates or never pads — fixture vacuous")
  }

  test("t39: per-source drift replays exactly; stationary corpus reads near zero") {
    val out = datapipe.TextAnalysis.queries("t39_distribution_drift")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"doc_id", $"text")
      .as[(String, Long, String)].collect()
    val half = (docs.map(_._2).max + 1) / 2
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val oldW = ds.filter(_._2 < half)
        .flatMap(_._3.split(" ").filter(_.nonEmpty))
      val newW = ds.filter(_._2 >= half)
        .flatMap(_._3.split(" ").filter(_.nonEmpty))
      val cO = oldW.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cN = newW.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val vocab = (cO.keySet ++ cN.keySet)
      val (nO, nN, v) = (oldW.length.toLong, newW.length.toLong,
        vocab.size.toLong)
      def unat(c: Long, n: Long): Long =
        math.round(-math.log((c + 1).toDouble / (n + v)) * 1e6)
      var nllO = 0L; var nllN = 0L
      vocab.foreach { w =>
        val cn = cN.getOrElse(w, 0L)
        nllO += cn * unat(cO.getOrElse(w, 0L), nO)
        nllN += cn * unat(cn, nN)
      }
      val drift = (nllO - nllN).toDouble / nN
      assert(out(src) === ((src, nO, nN, v, nllO, nllN, drift)), s"src=$src")
      // both halves draw from the same generator, so the drift must
      // read STATIONARY: well under the ~10% of per-token NLL a real
      // topic pivot would show (this corpus measures 0.7-1.9%)
      assert(drift >= 0.0 && drift < 0.1 * (nllN.toDouble / nN),
        s"src=$src drift=$drift not stationary-small")
    }
    assert(out.size === docs.map(_._1).distinct.length)
  }

  test("t40: line-df removal replays exactly; footers struck, unique lines kept") {
    def ph(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val out = datapipe.TextAnalysis.queries("t40_line_dedup")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    // replay: per-doc 8-word segments + the planted footer line
    val lines = docs.flatMap { case (id, src, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      if (ws.isEmpty) Seq.empty else {
        val nl = (ws.length + 7) / 8
        val nat = (0 until nl).map(li =>
          (id, li.toLong, ws.slice(li * 8, li * 8 + 8).mkString(" ")))
        if (id % 3 == 0)
          nat :+ ((id, nl.toLong,
            s"all rights reserved see terms at www dot $src"))
        else nat
      }
    }
    val df = lines.map(l => (l._3, l._1)).distinct.groupBy(_._1)
      .view.mapValues(_.size).toMap
    val expected = lines.groupBy(_._1).map { case (id, ls) =>
      val kept = ls.filter(l => df(l._3) < 4)
      id -> ((id, ls.length.toLong, (ls.length - kept.length).toLong,
        kept.map(_._3.split(" ").count(_.nonEmpty).toLong).sum,
        kept.map(l => (l._2 + 1) * (ph(l._3) % 1000000000L)).sum))
    }
    assert(out.keySet === expected.keySet)
    expected.foreach { case (id, e) => assert(out(id) === e, s"id=$id") }
    // the plant bites: every third doc's footer reaches df >= 4 per
    // source and is struck
    docs.foreach { case (id, _, t) =>
      if (id % 3 == 0 && t.split(" ").exists(_.nonEmpty))
        assert(out(id)._3 >= 1L, s"id=$id footer not removed")
    }
    // the rule also bites beyond the plant (short natural tail segments
    // repeat across the fixture corpus) and most lines survive
    assert(docs.exists { case (id, _, _) =>
      id % 3 != 0 && out.get(id).exists(_._3 > 0) },
      "no natural (non-planted) removal — df rule vacuous off-plant")
    val (totLines, totRemoved) =
      (out.values.map(_._2).sum, out.values.map(_._3).sum)
    assert(totRemoved.toDouble / totLines < 0.5,
      "rule strikes most of the corpus — fixture degenerate")
  }

  test("t42: encoding audit replays from raw text; scars come only from the plants") {
    val out = datapipe.TextAnalysis.queries("t42_encoding_audit")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    // the corpus itself must be scar-free, or the plant attribution
    // below proves nothing
    docs.foreach { case (id, _, t) =>
      assert(t.forall(c => c >= ' ' && c < '\u007f'),
        s"fixture doc $id is not pure printable ASCII — spec premise broken")
    }
    def scar(id: Long, t: String): String =
      t + (if (id % 23 == 0) "x" else "") +
        (if (id % 29 == 0) " caf�" else "") +
        (if (id % 31 == 0) " café naïve" else "")
    val expected = docs.groupBy(_._2).map { case (src, rows) =>
      val scarred = rows.map { case (id, _, t) => scar(id, t) }
      val ctrl = scarred.map(_.count(c =>
        c < ' ' && c != '\t' && c != '\n' && c != '\r').toLong)
      val fffd = scarred.map(_.count(_ == '�').toLong)
      val nonascii = scarred.map(_.count(_ > '\u007f').toLong)
      val chars = scarred.map(_.length.toLong).sum
      src -> ((src, rows.length.toLong,
        ctrl.count(_ > 0).toLong, fffd.count(_ > 0).toLong,
        nonascii.count(_ > 0).toLong, nonascii.sum,
        (chars - nonascii.sum) * 1000000L / chars))
    }
    assert(out === expected)
    // the plants fired: each scar class found somewhere, and a
    // co-divisible id (if the fixture has one) counts in EVERY class
    assert(out.values.map(_._3).sum > 0, "control plant never fired")
    assert(out.values.map(_._4).sum > 0, "U+FFFD plant never fired")
    assert(out.values.map(_._5).sum > 0, "non-ASCII plant never fired")
    // U+FFFD is itself non-ASCII: every fffd doc is a nonascii doc
    out.values.foreach(r => assert(r._5 >= r._4, s"${r._1} class nesting"))
  }

  test("t41: coverage table replays exactly; cumulative Zipf mass monotone") {
    def ph(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val out = datapipe.TextAnalysis.queries("t41_vocab_coverage")(spark, sf)
      .as[(Int, Long, Long, Long, Double)].collect()
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty)).map(ph)
    val wc = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (wh, c) => (-c, wh) }
    val total = words.length.toLong
    val expected = Seq(16, 64, 256, 1024).map { k =>
      val cov = wc.take(k).map(_._2).sum
      (k, wc.length.toLong, total, cov, cov.toDouble / total)
    }
    assert(out.toSeq === expected)
    // monotone nondecreasing in K, strictly informative at the head,
    // and Zipf-shaped: a 16-word vocabulary already covers a
    // non-trivial share while not everything
    assert(out.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
    assert(out.head._5 > 0.0 && out.head._5 < 1.0)
    assert(out.last._4 <= total)
  }

  test("t37: every source's vocabulary-growth curve replays from raw text") {
    val out = datapipe.TextAnalysis.queries("t37_vocab_growth")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"doc_id", $"text")
      .as[(String, Long, String)].collect()
    val bySrc = docs.groupBy(_._1)
    bySrc.foreach { case (src, ds) =>
      // replay with the word STRINGS (the query uses 60-bit hashes, so
      // equality here also proves the fixture vocabulary is
      // collision-free)
      val ordered = ds.sortBy(_._2)
        .map { case (_, _, t) => t.split(" ").filter(_.nonEmpty) }
      val n = ordered.length.toLong
      def cp(q: Long): Long = (q * n + 3) / 4
      val firstQ = scala.collection.mutable.Map.empty[String, Long]
      val tokQ = Array.fill(5)(0L); val typQ = Array.fill(5)(0L)
      ordered.zipWithIndex.foreach { case (ws, i) =>
        val rk = i + 1L
        val q = (1L to 4L).find(rk <= cp(_)).get
        tokQ(q.toInt) += ws.length
        ws.foreach { w =>
          if (!firstQ.contains(w)) { firstQ(w) = q; typQ(q.toInt) += 1 }
        }
      }
      var cumT = 0L; var cumY = 0L
      (1L to 4L).foreach { q =>
        cumT += tokQ(q.toInt); cumY += typQ(q.toInt)
        val ttr = if (cumT == 0) 0L else cumY * 1000000L / cumT
        assert(out((src, q)) ===
          ((src, q, n, cp(q), cumT, cumY, typQ(q.toInt), ttr)),
          s"source=$src q=$q")
      }
      // cumulative identities: quartile 4 covers the whole source
      assert(out((src, 4L))._5 === ordered.map(_.length.toLong).sum)
      assert(out((src, 4L))._6 === ordered.flatten.distinct.length.toLong)
    }
    assert(out.size === bySrc.size * 4, "exactly 4 quartile rows per source")
  }

  test("d30: the manifest replays from raw text + d06 labels; keepers never removed") {
    val out = datapipe.Dedup.queries("d30_dedup_manifest")(spark, sf)
      .as[(Long, Long, String, Long)].collect()
    val docs = datapipe.Dedup.corpus(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // exact stage replay
    val groups = docs.groupBy { case (_, t) => md5hex(t) }
    val exact = groups.values.filter(_.length > 1).flatMap { g =>
      val ids = g.map(_._1).sorted
      ids.tail.map(id => (id, ids.head, "exact", ids.length.toLong))
    }.toSet
    // near stage replay on survivors, from d06's oracle-checked labels
    val exactIds = exact.map(_._1)
    val clusters = datapipe.Dedup.queries("d06_dedup_clusters")(spark, sf)
      .as[(Long, Long)].collect()
    val near = clusters.filterNot(c => exactIds(c._1)).groupBy(_._2)
      .values.filter(_.length > 1).flatMap { g =>
        val ids = g.map(_._1).sorted
        ids.tail.map(id => (id, ids.head, "near", ids.length.toLong))
      }.toSet
    assert(out.toSet === exact ++ near)
    // structural pins: both rules fire; no doc removed twice; keepers
    // never themselves removed (near keepers survive the exact stage)
    assert(out.exists(_._3 == "exact") && out.exists(_._3 == "near"))
    val removed = out.map(_._1)
    assert(removed.distinct.length === removed.length, "double removal")
    val removedSet = removed.toSet
    assert(out.forall(r => !removedSet(r._2)), "a keeper was also removed")
  }

  test("d31: the weighted source rank replays from raw shingles, 5 exact rounds") {
    val out = datapipe.Dedup.queries("d31_source_graph_rank")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    def ph(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").as[(String, String)].collect()
    // distinct (source, 3-shingle hash) under the single-space grammar
    val hs = docs.flatMap { case (src, t) =>
      val ws = t.split(" ")
      if (ws.length < 3) Seq.empty
      else ws.sliding(3).map(g => (src, ph(g.mkString(" ")))).toSeq
    }.distinct
    val w = hs.groupBy(_._2).values.filter(_.length >= 2)
      .flatMap { g =>
        val ss = g.map(_._1).sorted
        for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val edges = w.toSeq.flatMap { case ((a, b), ww) =>
      Seq((a, b, ww), (b, a, ww)) }
    val wdeg = edges.groupBy(_._1).view
      .mapValues(es => (es.map(_._3).sum, es.length.toLong)).toMap
    var pr: Map[String, Long] = wdeg.keys.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, ww) => pr(u) * ww / wdeg(u)._1 }.sum
      }
      pr = in.map { case (v, s) => v -> (150000000L + 85L * s / 100L) }
    }
    val order = pr.toSeq.sortBy { case (src, p) => (-p, src) }.map(_._1)
    val rankOf = order.zipWithIndex.map { case (s2, i) => s2 -> (i + 1L) }.toMap
    assert(out.size === pr.size)
    pr.foreach { case (src, p) =>
      assert(out(src) ===
        ((src, wdeg(src)._2, wdeg(src)._1, p, rankOf(src))), s"src=$src")
    }
    // the graph must actually discriminate (the doc-level near-dup
    // graph does NOT — cliques are regular and PageRank is uniform on
    // them, which is why d31 ranks SOURCES)
    assert(pr.values.toSeq.distinct.length > 1, "uniform rank — vacuous")
  }

  test("d29: per-source effective mass equals the 1/|cluster| recompute exactly") {
    val out = datapipe.Dedup.queries("d29_soft_dedup")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // first principles: d06's multi-member clusters + singleton self-
    // groups; weight = 1e6 DIV csize in the same integer arithmetic
    val cluster = datapipe.Dedup.queries("d06_dedup_clusters")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val docs = datapipe.Dedup.corpus(spark, sf)
      .select($"doc_id", $"source", length($"text").cast("long"))
      .as[(Long, String, Long)].collect()
    val csize = docs.groupBy(d => cluster.getOrElse(d._1, d._1))
      .map { case (g, ms) => g -> ms.length.toLong }
    val expected = docs.groupBy(_._2).map { case (src, ms) =>
      val w = ms.map(m => 1000000L / csize(cluster.getOrElse(m._1, m._1)))
      src -> ((src, ms.length.toLong,
        ms.count(m => csize(cluster.getOrElse(m._1, m._1)) > 1).toLong,
        ms.map(_._3).sum, w.sum,
        ms.zip(w).map { case (m, wi) => m._3 * wi }.sum))
    }
    assert(out.keySet === expected.keySet)
    expected.foreach { case (src, e) => assert(out(src) === e, s"src=$src") }
    // deflation is real and the floor-loss path is exercised
    assert(out.values.exists(r => r._3 > 0 && r._5 < r._2 * 1000000L),
      "no source deflates — reweighting vacuous")
    assert(csize.values.exists(_ >= 3L),
      "no cluster of size >= 3 — the 1e6 DIV 3 floor path never runs")
  }

  test("q86: the delta merge equals the one-shot rollup; all three branches fire") {
    val out = operators.Extras.queries("q86_incremental_rollup")(spark, sf)
      .collect()
    // one-shot recompute inside Spark (the oracle repeats this in
    // DuckDB; here it pins merge == recompute engine-internally too)
    val full = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
           sum($"o_totalprice".cast("decimal(18,4)")).cast("double")
             .as("sum_price"),
           min($"o_totalprice").as("min_price"),
           max($"o_totalprice").as("max_price"),
           max($"o_orderdate").as("last_order"))
      .orderBy($"o_custkey")
      .collect()
    assert(out.length === full.length)
    out.zip(full).foreach { case (a, b) => assert(a === b) }
    // the cutoff must make every merge branch non-vacuous: keys only in
    // base, only in delta, and straddling both
    val sides = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(sum(when($"o_orderdate" < lit("1998-07-01"), 1L).otherwise(0L))
             .as("nb"),
           sum(when($"o_orderdate" >= lit("1998-07-01"), 1L).otherwise(0L))
             .as("nd"))
      .select(
        count(when($"nb" > 0 && $"nd" === 0, 1)).as("base_only"),
        count(when($"nb" === 0 && $"nd" > 0, 1)).as("delta_only"),
        count(when($"nb" > 0 && $"nd" > 0, 1)).as("both"))
      .head()
    assert(sides.getLong(0) > 0, "no base-only keys — carry branch vacuous")
    assert(sides.getLong(1) > 0, "no delta-only keys — insert branch vacuous")
    assert(sides.getLong(2) > 0, "no straddling keys — combine branch vacuous")
  }

  test("q85: doubling resolves every node to the recursive-definition depth and root") {
    val out = operators.Extras.queries("q85_hierarchy_rollup")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", length($"text").cast("long"))
      .as[(Long, Long)].collect()
    // the recursive definition, evaluated directly
    def rd(i: Long): (Long, Long) =
      if (i < 8) (i, 0L) else { val (r, d) = rd(i / 8); (r, d + 1) }
    val expected = docs.groupBy(d => rd(d._1)).map { case ((r, dep), ms) =>
      (r, dep, ms.length.toLong, ms.map(_._2).sum)
    }.toSet
    assert(out.toSet === expected)
    assert(out.map(_._3).sum === docs.length.toLong, "nodes lost in traversal")
    assert(out.map(_._2).max >= 2,
      "forest too shallow — one doubling round would mask a depth bug")
  }

  test("q84: the runtime filter admits exactly the top-3 error days") {
    val out = operators.Extras.queries("q84_runtime_filtered_scan")(spark, sf)
      .as[(java.sql.Date, Long, Long, Double)].collect()
    assert(out.length === 3, s"expected 3 hot days, got ${out.length}")
    assert(out.map(_._2).forall(_ > 0L) && out.map(_._3).forall(_ > 0L))
  }

  test("d41: all three shard strategies replay exactly; id-sharding genuinely leaks") {
    def md5hex(t: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // the d-family corpus replayed literally (docs + %10 near-dup
    // suffixes + %7 exact clones)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val corpus = docs ++
      docs.filter(_._1 % 10 == 0)
        .map { case (id, t) => (id + 1000000L, t + " near duplicate suffix") } ++
      docs.filter(_._1 % 7 == 0).map { case (id, t) => (id + 2000000L, t) }
    val hashed = corpus.map { case (id, t) => (id, md5hex(t)) }
    def shard(key: String): Long =
      "0123456789abcdef".indexOf(md5hex(key).head).toLong % 8
    val nDocs = hashed.length.toLong
    val keptG = hashed.map(_._2).distinct.length.toLong
    val keptI = hashed.map { case (id, h) => (shard(id.toString), h) }
      .distinct.length.toLong
    val keptC = hashed.map { case (_, h) => (shard(h), h) }
      .distinct.length.toLong
    val out = datapipe.Dedup.queries("d41_shard_dedup_error")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    Seq("global" -> keptG, "id_sharded" -> keptI,
        "content_sharded" -> keptC).foreach { case (st, kept) =>
      val r = out(st)
      assert(r._2 === nDocs && r._3 === kept, s"$st kept mismatch: $r")
      assert(r._4 === nDocs - kept)
      assert(r._5 === (nDocs - kept) * 1000000L / nDocs)
      assert(r._6 === kept - keptG)
    }
    // the table is non-vacuous: content-sharding is exact by
    // construction, id-sharding leaks cross-shard copies
    assert(out("content_sharded")._6 === 0L)
    assert(out("id_sharded")._6 > 0L,
      "no cross-shard duplicates — the pricing table pins nothing")
    assert(out("global")._4 > 0L, "corpus has no exact duplicates at all")
  }

  test("t44: the PMI table replays exactly from raw text; floor and order pinned") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").as[String].collect()
      .map(_.split(" ").filter(_.nonEmpty))
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong)
    val nUni = docs.map(_.length.toLong).sum
    val pairs = docs.flatMap(ws => ws.dropRight(1).zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nPairs = pairs.values.sum
    def pmiMicro(x: String, y: String, cxy: Long): Long =
      BigDecimal(math.log(cxy.toDouble * nUni * nUni /
        (nPairs.toDouble * uni(x) * uni(y))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = pairs.toSeq.collect { case ((x, y), c) if c >= 5 =>
      (x, y, c, uni(x), uni(y), pmiMicro(x, y, c)) }
      .sortBy { case (x, y, _, _, _, p) => (-p, x, y) }.take(20)
    val out = datapipe.TextAnalysis.queries("t44_pmi_collocations")(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out === expected)
    assert(out.nonEmpty && out.forall(_._3 >= 5L),
      "min-count floor not applied")
    // PMI genuinely reorders: the PMI top-20 must differ from a raw
    // count top-20 somewhere (else the score pins nothing over counts)
    val byCount = pairs.toSeq.filter(_._2 >= 5)
      .sortBy { case ((x, y), c) => (-c, x, y) }.take(20)
      .map { case ((x, y), _) => (x, y) }
    assert(out.map(r => (r._1, r._2)) !== byCount,
      "PMI ranking identical to raw-count ranking — score vacuous")
  }

  test("q100: every merge clause replays exactly; deletes leave no trace") {
    val target = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey", $"c_acctbal").as[(Long, Double)].collect().toMap
    // the not-matched re-key offset derives from the target's max key
    // (ttmInsertOffset — r18 advice: a hard-coded +1e6 aliases live
    // custkeys at high sf)
    val off = target.keys.max * 10
    val amt = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT")
      .groupBy($"o_custkey").agg(graft.Dets.dsum($"o_totalprice").as("a"))
      .as[(Long, Double)].collect()
    val expected = (
      // kept: target keys no surviving source row touches
      target.collect { case (k, b)
          if !amt.exists(x => x._1 == k && x._1 % 9 != 0) => (k, b, "kept") } ++
      // updated / deleted among matched non-rekeyed feed rows
      amt.collect { case (k, a) if k % 9 != 0 && k % 13 != 0 =>
        (k, target(k) + a, "updated") } ++
      // inserted: the re-keyed stream (never matches the target)
      amt.collect { case (k, a) if k % 9 == 0 => (k + off, a, "inserted") }
    ).toSeq.sortBy(_._1)
    val out = operators.Extras.queries("q100_merge_into")(spark, sf)
      .as[(Long, Double, String)].collect().toSeq
    assert(out === expected)
    // all three clauses fire, and a deleted key is genuinely gone
    Seq("kept", "updated", "inserted").foreach(st =>
      assert(out.exists(_._3 == st), s"clause $st never fired"))
    val deleted = amt.collect { case (k, _) if k % 9 != 0 && k % 13 == 0 => k }
    assert(deleted.nonEmpty, "no delete marker in the feed — clause untested")
    deleted.foreach(k => assert(!out.exists(_._1 == k), s"deleted key $k survived"))
  }

  test("t45: the yield curve replays from raw text; tau=0 equals t23's keep set") {
    def phashScala(str: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15), 16)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val logits = docs.map { case (_, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val grams = toks ++ toks.dropRight(1).zip(toks.drop(1))
        .map { case (a, b) => s"${a}_$b" }
      val feats = grams.map(g => phashScala(s"f:$g") % 65536L)
      val logit = feats.map(j => phashScala(s"w:$j") % 2001L - 1000L).sum
      (feats.length.toLong, logit)
    }
    val allDocs = logits.length.toLong
    val allFeats = logits.map(_._1).sum
    val expected = (-100L to 100L by 25L).map { tau =>
      val kept = logits.filter { case (nf, lg) => lg > tau * nf }
      (tau, kept.length.toLong, kept.map(_._1).sum,
        kept.length * 1000000L / allDocs,
        kept.map(_._1).sum * 1000000L / allFeats)
    }
    val out = datapipe.TextAnalysis.queries("t45_classifier_yield")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === expected)
    // the curve is a genuine knob: monotone non-increasing, and it
    // MOVES across the sweep (a flat curve prices nothing)
    assert(out.sliding(2).forall(p => p(1)._2 <= p(0)._2))
    assert(out.head._2 > out.last._2, "yield curve flat across the sweep")
    // tau = 0 is exactly t23's keep set
    val keeps = datapipe.TextAnalysis.queries("t23_classifier_score")(spark, sf)
      .filter($"label" === "keep").count()
    assert(out.find(_._1 == 0L).get._2 === keeps)
  }

  test("m24: both dedup levels replay from the pixel formula; the level knob genuinely costs") {
    val docIds = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id").as[Long].collect()
    // the plant-offset invariant (round-16 advice): a fixture whose
    // doc_ids reach the offset would alias plants onto real ids on BOTH
    // engines at once — oracle agreement would mask the mis-measure
    assert(docIds.max < 20000L,
      s"m24 plant offset 20000 no longer clears max doc_id ${docIds.max}")
    val ids = docIds.map(id => (id, id)) ++
      docIds.filter(_ % 11 == 0).map(id => (id + 20000L, id))
    def v0(src: Long, x: Int, y: Int) = ((x * 7L + y * 13L + src) % 256L)
    def keyAt(src: Long, k: Int): (Int, Int, Long) = {
      val (w0, h0) = ((4 + src % 5).toInt, (3 + src % 4).toInt)
      val (w, h) = if (k == 0) (w0, h0) else (w0 / 2, h0 / 2)
      def v(x: Int, y: Int): Long =
        if (k == 0) v0(src, x, y)
        else (v0(src, 2 * x, 2 * y) + v0(src, 2 * x + 1, 2 * y) +
              v0(src, 2 * x, 2 * y + 1) + v0(src, 2 * x + 1, 2 * y + 1)) / 4
      val n = w.toLong * h
      val s = (for { y <- 0 until h; x <- 0 until w } yield v(x, y)).sum
      val bits = (for { y <- 0 until h; x <- 0 until w
                        if v(x, y) * n > s } yield 1L << (y * w + x)).sum
      (w, h, bits)
    }
    val expected = Seq(0, 1).map { k =>
      val keys = ids.map { case (aid, src) => aid -> keyAt(src, k) }
      val nAssets = keys.length.toLong
      val nKeys = keys.map(_._2).distinct.length.toLong
      val km = keys.toMap
      val pairs = ids.collect { case (aid, src)
        if aid < 20000L && aid % 11 == 0 => (aid, src) }
      val cokeyed = pairs.count { case (aid, _) =>
        km(aid) == km(aid + 20000L) }.toLong
      (k.toLong, nAssets, nKeys, nAssets - nKeys,
        pairs.length.toLong, cokeyed,
        (nAssets - nKeys - cokeyed) * 1000000L / nAssets)
    }
    val out = datapipe.Multimodal.queries("m24_thumb_dedup_audit")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // level column is Int on the Spark side
    val outL = datapipe.Multimodal.queries("m24_thumb_dedup_audit")(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().toSeq
      .map(r => (r._1.toLong, r._2, r._3, r._4, r._5, r._6, r._7))
    assert(outL === expected, s"got $out")
    // the bet and its price, both non-vacuous: planted recall holds at
    // 100% on BOTH levels, and the thumbnail level genuinely merges
    // more distinct images than full resolution
    outL.foreach(r => assert(r._6 === r._5, s"level ${r._1} lost a plant"))
    assert(outL(1)._3 < outL(0)._3, "halving did not shrink the key space")
    assert(outL(1)._7 > outL(0)._7, "no marginal false-merge cost — knob vacuous")
  }

  test("q99: every try_* lane quarantines its planted failures and ONLY those") {
    val out = operators.Scalars.queries("q99_try_functions")(spark, sf)
      .as[(Long, Option[Double], Option[Long], Option[Long], Option[Long])]
      .collect()
    assert(out.nonEmpty)
    out.foreach { case (id, dv, ps, ml, el) =>
      assert(dv.isEmpty === (id % 5 == 0), s"id=$id try_divide")
      assert(ps.isEmpty === (id % 3 == 0), s"id=$id try_to_number")
      if (id % 3 != 0) assert(ps.contains(id), s"id=$id parsed value")
      // overflow: den 0 -> 0, den 1 -> MaxValue, den >= 2 -> NULL
      assert(ml.isEmpty === (id % 5 >= 2), s"id=$id try_multiply")
      if (id % 5 == 1) assert(ml.contains(Long.MaxValue))
      // 1-based idx 1..4 over a 2-element array: 3 and 4 miss
      assert(el.isEmpty === (id % 4 >= 2), s"id=$id try_element_at")
      if (id % 4 == 1) assert(el.contains(id), s"id=$id elem value")
    }
    // every lane fires BOTH ways somewhere, or a quarantine is vacuous
    assert(out.exists(_._2.isEmpty) && out.exists(_._2.nonEmpty))
    assert(out.exists(_._3.isEmpty) && out.exists(_._3.nonEmpty))
    assert(out.exists(_._4.isEmpty) && out.exists(_._4.nonEmpty))
    assert(out.exists(_._5.isEmpty) && out.exists(_._5.nonEmpty))
  }

  test("beam fixture artifact: persisted frames equal direct recompute; a regenerated source rebuilds") {
    // artifact == direct: every beam query (s32/s34/s35/s36/s37/s38)
    // now serves off the persisted fixture — each frame must be
    // value-identical to a from-scratch derivation, or the memoization
    // would change an oracle hash
    val art = datapipe.Similarity.beamArtifactFrames(spark, sf)
    val direct = datapipe.Similarity.beamDirectFrames(spark, sf)
    val names = Seq("edges_full", "qs", "scoredAll", "truth", "edges_old")
    art.zip(direct).zip(names).foreach { case ((a, d0), n) =>
      val ka = a.collect().map(_.toString).sorted.toSeq
      val kd = d0.collect().map(_.toString).sorted.toSeq
      assert(ka === kd, s"artifact frame $n drifted from direct recompute")
    }
    // same pin for the PQ artifact (codebook + codes, shared by
    // s11/s12/s16/s35)
    datapipe.Similarity.pqArtifactFrames(spark, sf)
      .zip(datapipe.Similarity.pqDirectFrames(spark, sf))
      .zip(Seq("codebook", "codes")).foreach { case ((a, d0), n) =>
        val ka = a.collect().map(_.toString).sorted.toSeq
        val kd = d0.collect().map(_.toString).sorted.toSeq
        assert(ka === kd, s"PQ artifact frame $n drifted from direct recompute")
      }
    // and for the dedup-eval artifact (signatures + capped truth,
    // shared by d21/d23/d24/d32/d35)
    datapipe.Dedup.dedupEvalArtifactFrames(spark, sf)
      .zip(datapipe.Dedup.dedupEvalDirectFrames(spark, sf))
      .zip(Seq("sigs", "capped_sh", "truth", "capped_sigs"))
      .foreach { case ((a, d0), n) =>
        val ka = a.collect().map(_.toString).sorted.toSeq
        val kd = d0.collect().map(_.toString).sorted.toSeq
        assert(ka === kd,
          s"dedup-eval artifact frame $n drifted from direct recompute")
      }
    // staleness: a regenerated embeddings.parquet (same bytes, new
    // mtime -> new source fingerprint) must REBUILD the artifact —
    // the marker flips to the new fingerprint, never serves stale
    val tmp = java.nio.file.Files.createTempDirectory("graft_beam_stale")
    val src = java.nio.file.Paths.get(s"$sf/embeddings.parquet")
    val cp = tmp.resolve("embeddings.parquet")
    java.nio.file.Files.copy(src, cp)
    def marker(dir: String): String =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir.stripPrefix("file:"),
          "_GRAFT_FINGERPRINT")), "UTF-8")
    val dir1 = datapipe.Similarity.beamArtifact(spark, tmp.toString)
    val fp1 = marker(dir1)
    java.nio.file.Files.setLastModifiedTime(cp,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(cp).toMillis + 2000))
    val dir2 = datapipe.Similarity.beamArtifact(spark, tmp.toString)
    assert(dir1 === dir2, "artifact dir must be stable per source dir")
    assert(marker(dir2) !== fp1,
      "regenerated source did not rebuild the beam artifact")
    // the rebuilt artifact still equals the one built off the original
    // fixture (same bytes -> same frames)
    val t1 = spark.read.parquet(s"$dir2/truth").collect()
      .map(_.toString).sorted.toSeq
    val t0 = spark.read.parquet(
        s"${datapipe.Similarity.beamArtifact(spark, sf)}/truth")
      .collect().map(_.toString).sorted.toSeq
    assert(t1 === t0, "rebuilt artifact truth drifted")
  }

  test("q98: every variant extraction equals the column it was assembled from") {
    val out = operators.Scalars.queries("q98_variant")(spark, sf)
      .as[(Long, String, Long, Long, Long, Option[Long], Double)].collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_id", $"user_id", $"event_type", $"props")
      .as[(Long, Long, String, String)].collect()
      .filter(_._1 % 25 == 0).sortBy(_._1)
    assert(out.length === ev.length && out.nonEmpty)
    out.zip(ev).foreach { case ((eid, vt, vu, v2, vpk, vmiss, vud),
                                (id, uid, tpe, props)) =>
      assert(eid === id)
      assert(vt === tpe, "nested object string path")
      assert(vu === uid, "nested object int path")
      assert(v2 === id, "array index path")
      // the raw props payload nested verbatim: $.p.k
      val k = """-?\d+""".r.findFirstIn(props).get.toLong
      assert(vpk === k, "verbatim-nested payload path")
      assert(vmiss.isEmpty, "missing path must be NULL, not an error")
      assert(vud === uid.toDouble, "widening int->double variant cast")
    }
  }

  test("q88: layout table replays exactly; z-order strictly cheaper on the box") {
    val out = operators.Extras.queries("q88_zorder_layout")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey".cast("long"), $"l_suppkey".cast("long"))
      .as[(Long, Long)].collect()
    val px = li.map(_._1).max; val sx = li.map(_._2).max
    val g = li.map { case (p0, s0) =>
      val xb = p0 * 1024 / (px + 1); val yb = s0 * 1024 / (sx + 1)
      val z = (0 until 10).map(j =>
        (((xb >> j) & 1L) << (2 * j)) + (((yb >> j) & 1L) << (2 * j + 1))).sum
      (xb, yb, z, xb >= 192 && xb <= 319 && yb >= 192 && yb <= 319)
    }
    def fold(bk: Map[Long, Array[(Long, Long, Long, Boolean)]]) = {
      val st = bk.values.map { rs =>
        (rs.length.toLong, rs.map(_._1).min, rs.map(_._1).max,
         rs.map(_._2).min, rs.map(_._2).max, rs.count(_._4).toLong)
      }
      val t = st.filter(s =>
        s._2 <= 319 && s._3 >= 192 && s._4 <= 319 && s._5 >= 192)
      (st.size.toLong, t.size.toLong, t.map(_._1).sum, st.map(_._6).sum)
    }
    for ((name, key) <- Seq(
        ("linear", (r: (Long, Long, Long, Boolean)) => r._1 / 16),
        ("zorder", (r: (Long, Long, Long, Boolean)) => r._3 / 16384))) {
      val (nb, bt, rr, rm) = fold(g.groupBy(key))
      assert(out(name) === ((name, nb, bt, rr, rm, rr.toDouble / rm)),
        s"layout=$name")
    }
    // same predicate, same matches — only the layout differs; the
    // interleaved layout must read strictly less than the linear sort,
    // and neither reads less than it matches (the pruning model is an
    // over-approximation, never an under-read)
    assert(out("zorder")._5 === out("linear")._5)
    assert(out("zorder")._5 > 0L, "box matches nothing — table vacuous")
    assert(out("zorder")._4 < out("linear")._4,
      "z-order no cheaper — the table's decision is invisible")
    assert(out("linear")._4 >= out("linear")._5 &&
           out("zorder")._4 >= out("zorder")._5)
  }
}
