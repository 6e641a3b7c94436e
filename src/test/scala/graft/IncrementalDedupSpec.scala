package graft

import graft.datapipe.IncrementalDedup
import org.apache.spark.sql.functions._

/** Physical round trip of the cross-run dedup store: build from run 1,
  * ingest run 2 against it, re-ingest idempotently. The decision logic
  * itself is oracle-checked (d08); this suite pins the parquet store
  * plumbing the query form cannot exercise.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_inc_dedup").toString
    dir + "/store"
  }

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private val longA = ("alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
  private val longB = ("one two three four five six seven eight nine ten " +
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen")

  test("cross-batch near-dups are caught against the persisted store") {
    val store = freshStore()
    IncrementalDedup.buildStore(docsDf(1L -> longA, 2L -> longB), store)

    val batch = docsDf(
      10L -> (longA + " tiny suffix"), // near-dup of stored doc 1
      11L -> "completely different words entirely novel content here today",
      12L -> "completely different words entirely novel content here today",
      13L -> longB)                    // exact dup of stored doc 2
    val dec = IncrementalDedup.ingestBatch(batch, store)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap

    assert(dec(10L) === ("dup_store", 1L))
    assert(dec(13L) === ("dup_store", 2L))
    assert(dec(11L) === ("kept", -1L))
    assert(dec(12L) === ("dup_batch", 11L)) // within-batch, smaller id wins
    // store grew by exactly the kept docs
    assert(spark.read.parquet(store).count() === 3)
  }

  test("re-ingesting the same batch inserts zero rows (idempotent upsert)") {
    val store = freshStore()
    IncrementalDedup.buildStore(docsDf(1L -> longA), store)
    val batch = docsDf(20L -> longB, 21L -> (longA + " extra token"))

    IncrementalDedup.ingestBatch(batch, store)
    val afterFirst = spark.read.parquet(store).count()
    assert(afterFirst === 2) // doc 20 kept, doc 21 dup_store of 1

    val dec2 = IncrementalDedup.ingestBatch(batch, store)
    val afterSecond = spark.read.parquet(store).count()
    assert(afterSecond === afterFirst, "second run must insert zero rows")
    // the re-ingested kept doc now matches its own stored fingerprint
    val d20 = dec2.filter($"doc_id" === 20L).select($"status", $"matched_id")
      .as[(String, Long)].head()
    assert(d20 === ("dup_store", 20L))
  }

  test("reused doc_id with different content reports id_conflict, stale fp kept out") {
    val store = freshStore()
    IncrementalDedup.buildStore(docsDf(1L -> longA, 2L -> longB), store)
    // id 1 reused for COMPLETELY different text: judging it against the
    // stale stored fingerprint would silently report 'kept' while future
    // near-dups of the new text go undetected — surface it instead
    val dec = IncrementalDedup.ingestBatch(
      docsDf(1L -> "entirely new content under a recycled identifier today",
             3L -> (longB + " small suffix")), store)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(dec(1L) === ("id_conflict", -1L))
    assert(dec(3L) === ("dup_store", 2L))
    // neither the conflicting fp nor the dup was appended
    assert(spark.read.parquet(store).count() === 2)
    // same id + same content is NOT a conflict — it reports dup_store
    // against its own fingerprint (idempotent re-ingest)
    val dec2 = IncrementalDedup.ingestBatch(docsDf(1L -> longA), store)
      .collect().head
    assert(dec2.getString(1) === "dup_store" && dec2.getLong(2) === 1L)
  }

  test("a SHORT doc reusing a stored id is still an id_conflict") {
    val store = freshStore()
    IncrementalDedup.buildStore(docsDf(1L -> longA), store)
    // "no words" is < 3 words, so it carries no fingerprint — the conflict
    // check must run on batch doc_ids, not fingerprinted ones, or this doc
    // would report 'kept' while the stale stored fp for id 1 survives
    val dec = IncrementalDedup.ingestBatch(docsDf(1L -> "no words"), store)
      .collect()
    assert(dec.length === 1 && dec.head.getString(1) === "id_conflict")
    assert(dec.head.isNullAt(2))
    assert(spark.read.parquet(store).count() === 1) // store unchanged
  }

  test("a doc too short to fingerprint is kept, not dropped") {
    val store = freshStore()
    IncrementalDedup.buildStore(docsDf(1L -> longA), store)
    val dec = IncrementalDedup.ingestBatch(docsDf(30L -> "two words"), store)
      .collect()
    assert(dec.length === 1 && dec.head.getString(1) === "kept")
    // but its (absent) fingerprint adds nothing to the store
    assert(spark.read.parquet(store).count() === 1)
  }

  test("streaming twin: micro-batches reproduce sequential ingestBatch exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val seed = Seq(1L -> longA, 2L -> longB)
    val b1 = Seq(
      10L -> (longA + " tiny suffix"), // dup_store of 1
      11L -> "completely different words entirely novel content here today",
      12L -> "completely different words entirely novel content here today")
    val b2 = Seq(
      13L -> longB,                    // dup_store of 2
      14L -> ("completely different words entirely novel content here " +
        "today plus drift"),           // dup_store of 11 (kept in b1)
      15L -> "yet another fully unrelated document body with many words")

    // batch path: two sequential ingestBatch calls
    val storeB = freshStore()
    IncrementalDedup.buildStore(docsDf(seed: _*), storeB)
    val batchDecs =
      (IncrementalDedup.ingestBatch(docsDf(b1: _*), storeB).collect() ++
       IncrementalDedup.ingestBatch(docsDf(b2: _*), storeB).collect())
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    // stream path: the same two batches as micro-batches through
    // ingestStream against an identically-seeded fresh store
    val storeS = freshStore()
    IncrementalDedup.buildStore(docsDf(seed: _*), storeS)
    val tmp = java.nio.file.Files.createTempDirectory("graft_d08_stream")
    val input = MemoryStream[(Long, String)]
    val q = IncrementalDedup.ingestStream(
      input.toDF().toDF("doc_id", "text"),
      storeS, s"$tmp/decisions", s"$tmp/ckpt")
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamDecs = spark.read.parquet(s"$tmp/decisions")
      .select($"doc_id", $"status", coalesce($"matched_id", lit(-1L)))
      .as[(Long, String, Long)].collect().toSet
    assert(streamDecs === batchDecs,
      "per-doc decisions must be identical across batch and stream paths")
    // and the two stores converged to the same fingerprint set
    val sB = spark.read.parquet(storeB).select($"doc_id")
      .as[Long].collect().sorted.toSeq
    val sS = spark.read.parquet(storeS).select($"doc_id")
      .as[Long].collect().sorted.toSeq
    assert(sS === sB)
    // cross-batch dependency actually exercised: 14 deduped against a
    // fingerprint APPENDED by micro-batch 1, not the seed store
    assert(streamDecs.contains((14L, "dup_store", 11L)))
  }
}
