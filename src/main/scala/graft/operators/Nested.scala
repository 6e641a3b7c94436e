package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nested-type surface: struct construction/field access and table-
  * generating functions (explode/posexplode) — the lateral-view family.
  *
  * Scale note: posexplode is a narrow (no-shuffle) row multiplier; the
  * down-stream aggregate pairs it with partial aggregation so fan-out
  * never crosses the wire unaggregated.
  */
object Nested {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Struct build + nested field access round-trip.
    "q44_struct_nested" -> { (s, d) =>
      import s.implicits._
      T.documents(s, d)
        .withColumn("meta", struct($"lang", $"n_chars"))
        // struct serialized to JSON: the driver's row-sort can't order
        // struct cells; Spark and DuckDB render identical compact JSON.
        // ignoreNullFields=false pins parity: Spark would otherwise OMIT
        // null fields where DuckDB emits "field":null
        .select($"doc_id",
          to_json($"meta", Map("ignoreNullFields" -> "false")).as("meta_json"),
                $"meta.lang".as("meta_lang"),
                ($"meta.n_chars" * 2).as("twice_chars"))
        .orderBy($"doc_id")
    },

    // posexplode (LATERAL VIEW): word stream with positions, re-aggregated.
    "q45_posexplode" -> { (s, d) =>
      import s.implicits._
      T.documents(s, d)
        .filter($"doc_id" % 25 === 0)
        .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "word")))
        .filter($"pos" < 10)
        .orderBy($"doc_id", $"pos")
    },

    // Map functions: build, access, introspect — outputs are the extracted
    // scalars (map cell layout is engine-specific; its *contents* are not).
    "q47_map_functions" -> { (s, d) =>
      import s.implicits._
      T.documents(s, d)
        .withColumn("m", map(
          lit("lang"), $"lang",
          lit("src"), $"source",
          lit("len"), $"n_chars".cast("string")))
        .select($"doc_id",
          element_at($"m", "lang").as("m_lang"),
          element_at($"m", "src").as("m_src"),
          element_at($"m", "len").cast("long").as("m_len"),
          size($"m").as("m_size"),
          array_contains(map_keys($"m"), "lang").as("has_lang"))
        .orderBy($"doc_id")
    },

    // Salted skew join: the hot-key mitigation, oracle = the plain join
    // (salting must be semantically invisible).
    "q48_salted_join" -> { (s, d) =>
      import s.implicits._
      val probe = T.events(s, d).select($"event_id", $"user_id", $"value")
      val build = T.events(s, d).groupBy($"user_id")
        .agg(count(lit(1)).as("user_events"))
      SkewJoin.saltedJoin(probe, build, "user_id", salts = 7)
        .select($"event_id", $"user_id", $"user_events")
        .orderBy($"event_id")
    },

    // AQE SKEW JOIN — the runtime half of the skew family (q76
    // diagnoses, q48 salts by hand; a 100 TB deployment mostly lets
    // ADAPTIVE EXECUTION split the hot partition at runtime, because
    // hand-salting every join that MIGHT skew is unmaintainable): the
    // probe side carries a planted hot key (one user replicated ×127 —
    // deterministic ids, so the oracle states the same plant) whose
    // hash partition dwarfs the median, and AQE's OptimizeSkewedJoin
    // must split it into parallel sub-partitions while replicating the
    // matching build rows — semantically invisible (the oracle is the
    // plain join), which is exactly the property that makes it safe to
    // leave ON globally. Conf hygiene: the skew thresholds are tuned
    // for fixture scale on a derived newSession (q91's isolation
    // pattern); broadcast is disabled because skew splitting only
    // applies to shuffle joins — at real scale neither side broadcasts
    // anyway, so the tuned plan IS the production plan. PlanShapeSpec
    // pins `skew=true` inside the executed adaptive plan.
    "q92_aqe_skew_join" -> { (s, d) =>
      skewJoinFrame(s, d)
        .select(col("event_id"), col("user_id"), col("user_events"))
        .orderBy(col("event_id"))
    },

    // AQE PARTITION COALESCE — q92's sibling and the OTHER always-on
    // runtime knob a 100 TB deployment leans on: shuffle partition
    // count is a static global guess (set high so the biggest join in
    // the job survives), so every SMALLER shuffle in that job produces
    // hundreds of near-empty reducers — scheduler overhead, tiny
    // files, cold caches. AQE's CoalesceShufflePartitions folds them
    // into sane reads at runtime from the map output sizes. The query
    // is a plain keyed agg on a derived session whose shuffle count is
    // deliberately overprovisioned (200); the executed adaptive plan
    // must show AQEShuffleRead(coalesced) with far fewer partitions —
    // PlanShapeSpec pins it — while the result is the plain agg
    // (runtime re-planning must be semantically invisible, q92's
    // discipline; the oracle is that plain agg).
    "q93_aqe_coalesce" -> { (s, d) =>
      coalesceAggFrame(s, d)
    },

    // AQE JOIN-STRATEGY SWITCH — the third leg of the runtime trilogy
    // (q92 splits skew, q93 folds empty reducers; this one re-picks
    // the JOIN ALGORITHM): the static planner only sees the dim side's
    // FILE size, so a selective filter it cannot price (modulus on a
    // key — no stats help) leaves a sort-merge join planned for what
    // is, at runtime, a broadcast-sized build. AQE's
    // DynamicJoinSelection reads the TRUE post-filter shuffle bytes
    // and converts SMJ → broadcast-hash mid-query, deleting the probe
    // side's sort (at 100 TB, the difference between shuffling the
    // fact table and not). PlanShapeSpec pins BOTH halves: the static
    // sparkPlan carries the sort-merge join, the executed adaptive
    // plan carries BroadcastHashJoin. Semantically invisible — the
    // oracle is the plain join+agg (the trilogy's shared discipline).
    "q95_aqe_broadcast_switch" -> { (s, d) =>
      broadcastSwitchFrame(s, d)
    },

    // RUNTIME BLOOM-FILTER PRUNING — the quartet's scan-side member
    // (q92 splits skew, q93 folds reducers, q95 re-picks the join
    // algorithm; this one shrinks WHAT THE JOIN EVER SEES): a
    // selective dim filter the fact scan cannot use directly (the
    // pruning key is a JOIN key, not a partition column — q84's DPP
    // needs a partitioned layout; most 100 TB fact tables aren't
    // partitioned by every join key) makes Spark's InjectRuntimeFilter
    // build a bloom filter over the filtered dim's join keys and apply
    // `might_contain` to the fact side BEFORE the shuffle — at scale
    // that is the difference between shuffling the whole fact table
    // and shuffling the ~1% that can possibly match. PlanShapeSpec
    // pins the injected BloomFilterAggregate/BloomFilterMightContain
    // pair in the optimized plan; the oracle is the plain filtered
    // join+agg (the family's semantic-invisibility discipline).
    "q96_runtime_bloom_filter" -> { (s, d) =>
      bloomFilterFrame(s, d)
    },

    // Skew profile — the diagnostic that DECIDES q48's salting: per-key
    // group sizes (one narrow (key, count) shuffle), a 1-row global
    // stats frame broadcast back (no driver scalar), and the top-5
    // hottest keys via TakeOrderedAndProject — per-partition heaps, no
    // global sort. share = the fraction of all rows one key carries;
    // x_mean = how many average-sized groups it equals. At 100 TB this
    // is the cheap pre-join check that turns "the join hung" into
    // "key 42 is 400× the mean — salt it or segregate it".
    "q76_skew_profile" -> { (s, d) =>
      import s.implicits._
      val g = T.events(s, d).groupBy($"user_id").agg(count(lit(1)).as("n"))
      val tot = g.agg(sum($"n").as("total"), count(lit(1)).as("n_keys"))
      g.crossJoin(broadcast(tot))
        .select($"user_id", $"n",
          ($"n".cast("double") / $"total").as("share"),
          (($"n".cast("double") * $"n_keys") / $"total").as("x_mean"))
        .orderBy($"n".desc, $"user_id")
        .limit(5)
    },

    // Theta join = cross join + non-equi predicate (SURVEY §2.2 joins row).
    // Kept to dimension-sized inputs: an unconstrained theta join is a
    // Cartesian product and must never touch a fact table at scale.
    "q49_theta_join" -> { (s, d) =>
      import s.implicits._
      val n1 = T.nation(s, d).select($"n_name".as("name_a"), $"n_regionkey".as("reg_a"))
      val n2 = T.nation(s, d).select($"n_name".as("name_b"), $"n_regionkey".as("reg_b"))
      n1.crossJoin(n2)
        .filter($"reg_a" === $"reg_b" && $"name_a" < $"name_b")
        .select($"reg_a".as("regionkey"), $"name_a", $"name_b")
        .orderBy($"regionkey", $"name_a", $"name_b")
    },

    // Null-safe equality (<=> / IS NOT DISTINCT FROM) vs plain equality.
    "q50_nullsafe_predicates" -> { (s, d) =>
      import s.implicits._
      T.events(s, d)
        .withColumn("maybe_type", nullif($"event_type", lit("error")))
        .select($"event_id",
          ($"maybe_type" <=> lit("click")).as("nullsafe_click"),
          ($"maybe_type" <=> lit(null)).as("is_masked"),
          ($"maybe_type" === lit("click")).as("plain_click"))
        .orderBy($"event_id")
    }
  )

  /** q92's skew-planted shuffle join on a derived AQE-tuned session —
    * factored out so PlanShapeSpec can execute it and pin the
    * `skew=true` marks in the final adaptive plan. Thresholds are
    * fixture-scaled (production keeps the defaults — hundreds of MB);
    * what is NOT fixture-specific is the shape: a hot hash partition
    * ≥ factor × median split into parallel sub-reads with the matching
    * build partition replicated. */
  private[graft] def skewJoinFrame(s: SparkSession, d: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1kb")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1kb")
    // the split must not be declined for introducing an extra shuffle:
    // the build side is derived from the probe, so they arrive
    // co-partitioned and AQE's conservative default would skip them
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val ev = T.events(s2, d).select(col("event_id"), col("user_id"))
    // the replicated side STREAMS over 16 range slices (the broadcast is
    // the small event slice): a reducer partition can only be split at
    // map-block granularity, so the hot rows must come from MANY map
    // tasks — hot data born in one mapper is structurally unsplittable,
    // which is itself a scale lesson (a skewed source file needs a
    // repartition before AQE can save the join)
    val reps = s2.range(1, 128, 1, 16).select(col("id").as("rep"))
    val hot = reps.crossJoin(broadcast(ev.filter(col("user_id") === 7L)))
      .select((col("event_id") + col("rep") * 10000000L).as("event_id"),
        col("user_id"))
    val probe = ev.unionByName(hot)
    // the build aggregate is materialized BEFORE the join
    // (localCheckpoint): OptimizeSkewedJoin only matches a sort-merge
    // join whose children are plain shuffle reads — an aggregate
    // sitting between the sort and the exchange defeats the pattern,
    // so a fused build side would silently forfeit the skew handling
    // (measured before this split: no skew marks at any threshold)
    val build = probe.groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_events")).localCheckpoint()
    probe.hint("merge").join(build.hint("merge"), Seq("user_id"))
  }

  /** q93's overprovisioned-shuffle agg on a derived AQE session —
    * factored out so PlanShapeSpec can execute it and pin the coalesced
    * AQEShuffleRead. 200 initial shuffle partitions stands in for the
    * production "sized for the job's biggest join" global; nothing else
    * is fixture-tuned — coalescing is on by default in Spark, which is
    * the point: this is the plan every small-shuffle stage gets for
    * free once AQE is left on. */
  private[graft] val CoalesceInitialPartitions = 200
  private[graft] def coalesceAggFrame(s: SparkSession, d: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", CoalesceInitialPartitions)
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    T.events(s2, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           graft.Dets.dsum(col("value")).as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** q95's statically-mispriced join on a derived AQE session —
    * factored out so PlanShapeSpec can pin the static SMJ and the
    * runtime broadcast conversion on the same frame. The static
    * broadcast threshold sits BELOW the dim's file size (the only
    * number the planner has) and the ADAPTIVE threshold above the true
    * post-filter bytes — production keeps both at their defaults; what
    * is pinned is the capability, not the fixture numbers. */
  private[graft] def broadcastSwitchFrame(s: SparkSession,
                                          d: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    // the static planner sees only the file size — keep it too big to
    // broadcast at plan time
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    // the runtime sees the true post-filter shuffle bytes — tiny
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
    val li = T.lineitem(s2, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val ord = T.orders(s2, d)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_custkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_items"),
           graft.Dets.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_custkey"))
  }

  /** q96's bloom-prunable fact-dim join on a derived session —
    * factored out so PlanShapeSpec can pin the injected runtime filter
    * on the same frame. Conf hygiene (q91's isolation pattern): the
    * application-side size gate drops to 0 because the fixture fact
    * table is far below the 10 GB production default — the GATE is
    * sized for real deployments, the CAPABILITY is what's pinned —
    * and broadcast is disabled because a 100 TB fact-dim join on an
    * unfiltered-size dim is a shuffle join (which is also the shape
    * the injection rule targets: a broadcast build already prunes via
    * its hash table). */
  private[graft] def bloomFilterFrame(s: SparkSession,
                                      d: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = T.lineitem(s2, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    val ord = T.orders(s2, d)
      .filter(col("o_orderpriority") === "3-MEDIUM" &&
        col("o_custkey") % 89 === 0)
      .select(col("o_orderkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
           graft.Dets.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  def oracleSql: Map[String, String] = Map(
    // q95: the plain filtered join+agg — the runtime algorithm switch
    // must be invisible.
    "q95_aqe_broadcast_switch" ->
      """SELECT o_custkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_custkey % 97 = 0
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    // q96: the plain filtered join+agg — the injected bloom filter is
    // conservative (false positives only re-admit rows the join drops
    // anyway), so it must be invisible here too.
    "q96_runtime_bloom_filter" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '3-MEDIUM' AND o_custkey % 89 = 0
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // q93: the plain agg — partition coalescing must be invisible.
    "q93_aqe_coalesce" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    // q92: the plain join over the same planted probe — skew splitting
    // must be semantically invisible.
    "q92_aqe_skew_join" ->
      """WITH reps AS (SELECT unnest(range(1, 128)) AS rep),
        |hot AS (
        |  SELECT event_id + rep * 10000000 AS event_id, user_id
        |  FROM events, reps WHERE user_id = 7),
        |probe AS (
        |  SELECT event_id, user_id FROM events
        |  UNION ALL SELECT event_id, user_id FROM hot),
        |b AS (SELECT user_id, COUNT(*) AS user_events
        |      FROM probe GROUP BY 1)
        |SELECT p.event_id, p.user_id, b.user_events
        |FROM probe p JOIN b USING (user_id)
        |ORDER BY p.event_id""".stripMargin,
    "q44_struct_nested" ->
      """SELECT doc_id,
        |  to_json(struct_pack(lang := lang, n_chars := n_chars)) AS meta_json,
        |  lang AS meta_lang,
        |  n_chars * 2 AS twice_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q45_posexplode" ->
      """SELECT doc_id, CAST(u.pos AS INT) AS pos, u.word AS word FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, least(len(words), 10)),
        |    i -> struct_pack(pos := i, word := words[i+1]))) AS u
        |  FROM (SELECT doc_id, string_split(text, ' ') AS words
        |        FROM documents WHERE doc_id % 25 = 0))
        |ORDER BY doc_id, pos""".stripMargin,

    "q47_map_functions" ->
      """SELECT doc_id, lang AS m_lang, source AS m_src, n_chars AS m_len,
        |  3 AS m_size, TRUE AS has_lang
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q48_salted_join" ->
      """SELECT e.event_id, e.user_id, b.user_events
        |FROM events e
        |JOIN (SELECT user_id, COUNT(*) AS user_events FROM events GROUP BY 1) b
        |  ON e.user_id = b.user_id
        |ORDER BY e.event_id""".stripMargin,

    "q49_theta_join" ->
      """SELECT a.n_regionkey AS regionkey, a.n_name AS name_a, b.n_name AS name_b
        |FROM nation a, nation b
        |WHERE a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
        |ORDER BY regionkey, name_a, name_b""".stripMargin,

    "q76_skew_profile" ->
      """WITH g AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
        |             COUNT(*) AS n_keys FROM g)
        |SELECT g.user_id, g.n,
        |  CAST(g.n AS DOUBLE) / t.total AS share,
        |  (CAST(g.n AS DOUBLE) * t.n_keys) / t.total AS x_mean
        |FROM g, t
        |ORDER BY g.n DESC, g.user_id
        |LIMIT 5""".stripMargin,

    "q50_nullsafe_predicates" ->
      """SELECT event_id,
        |  NULLIF(event_type, 'error') IS NOT DISTINCT FROM 'click' AS nullsafe_click,
        |  NULLIF(event_type, 'error') IS NOT DISTINCT FROM NULL AS is_masked,
        |  NULLIF(event_type, 'error') = 'click' AS plain_click
        |FROM events ORDER BY event_id""".stripMargin
  )
}
