package graft.sources

import org.apache.spark.sql.DataFrame

/** The reference store's upsert, as a distributed writer: PostgreSQL
  * `INSERT ... ON CONFLICT (key) DO NOTHING` over batched VALUES with the
  * inserted rowcount reported back (lambda_function.py:176-191,
  * psycopg2 `execute_values` + `cur.rowcount`).
  *
  * No JDBC driver jar resolves in this environment, so the writer runs
  * against a narrow session SPI instead of `java.sql.Connection`: a real
  * deployment adapts a driver connection in ~10 lines (prepare
  * [[insertSql]], addBatch per row, executeBatch, sum update counts);
  * the spec plugs an in-memory store that implements the same conflict
  * and transaction semantics. The SHAPE is the deliverable: one session
  * per PARTITION (a 1000-executor run opens 1000 connections, not one
  * driver-side bottleneck), rows streamed in bounded batches (constant
  * executor memory), NaN → NULL on the way out
  * (lambda_function.py:170-173), inserted counts accumulated back to the
  * driver as the `cur.rowcount` analog (:184-186).
  *
  * Commit granularity is PER PARTITION — a mid-job failure can leave some
  * partitions committed (exactly-once needs the idempotence the conflict
  * key provides, which is WHY the reference uses DO NOTHING; re-running
  * the job inserts only what's missing).
  */
object JdbcUpsert {

  /** One writer session (≈ one connection + transaction). Implementations
    * must be constructible ON EXECUTORS via a serializable factory.
    */
  trait UpsertSession extends AutoCloseable {
    /** Insert a batch; rows with an existing conflict-key are skipped.
      * Returns the number of rows actually inserted (psycopg2
      * `cur.rowcount` after `execute_values`, lambda_function.py:184-186
      * — conflicts do NOT count).
      */
    def insertBatch(rows: Seq[Seq[Any]]): Long
    def commit(): Unit
    def rollback(): Unit
  }

  /** Serializable factory — shipped to executors, one session per
    * partition. The (table, columns, conflictKey) triple is fixed at
    * factory construction so the session API stays data-only.
    */
  trait SessionFactory extends Serializable {
    def open(): UpsertSession
  }

  /** The reference statement, verbatim in shape
    * (lambda_function.py:176-183) — what a `java.sql.Connection` adapter
    * prepares (with `?` placeholders substituted for the VALUES stub).
    */
  def insertSql(table: String, columns: Seq[String],
                conflictKey: Seq[String]): String =
    s"""INSERT INTO $table (
       |    ${columns.mkString(", ")}
       |) VALUES %s
       |ON CONFLICT (${conflictKey.mkString(", ")}) DO NOTHING""".stripMargin

  /** The real-driver adapter the Scaladoc above promises: wraps any
    * `java.sql.Connection` provider (the interface ships in the JDK's
    * java.sql module) as an [[UpsertSession]] factory. One connection
    * per partition, autocommit off, [[insertSql]] prepared with `?`
    * placeholders, addBatch per row, executeBatch per chunk; conflict-
    * skipped rows report 0 in the update counts, so summing positives
    * reproduces psycopg2's `cur.rowcount` (lambda_function.py:184-186).
    * `connect` must be serializable (a Scala function literal is) — it
    * runs on executors.
    *
    * `statementSql` overrides the prepared text for engines that spell
    * conflict-skip differently (the reference's `ON CONFLICT DO
    * NOTHING` is PostgreSQL; Apache Derby — the embedded engine the
    * real-connection spec drives — uses single-row `MERGE ... WHEN NOT
    * MATCHED THEN INSERT`, same first-write-wins semantics and the
    * same 0/1 update counts). Defaults to the reference statement.
    * `paramColumns` maps placeholder positions to row-column indexes
    * for dialects whose statement repeats a column (Derby's MERGE
    * binds the conflict key once in ON and once in INSERT: its map for
    * a (key, value) row is Seq(0, 0, 1)). Defaults to one placeholder
    * per column in order.
    *
    * Drivers running in batch-rewrite mode (e.g. PostgreSQL
    * `reWriteBatchedInserts=true`) return SUCCESS_NO_INFO (-2) for
    * every row; silently counting that as 0 would report rowcount 0
    * despite successful inserts, so the adapter fails LOUDLY instead —
    * the rowcount analog and rewrite mode are mutually exclusive by
    * contract, and the caller must disable one deliberately.
    */
  class ConnectionSessionFactory(connect: () => java.sql.Connection,
      table: String, columns: Seq[String], conflictKey: Seq[String],
      statementSql: Option[String] = None,
      paramColumns: Option[Seq[Int]] = None)
      extends SessionFactory {
    private val bindOrder: Seq[Int] =
      paramColumns.getOrElse(columns.indices)
    def open(): UpsertSession = new UpsertSession {
      private val conn = connect()
      // anything failing between connect() and a usable session must
      // close the connection HERE: upsert()'s rollback/close path only
      // guards sessions open() already returned, so a throw from
      // setAutoCommit/prepareStatement would otherwise leak one
      // physical connection per task attempt
      private val stmt =
        try {
          conn.setAutoCommit(false)
          conn.prepareStatement(statementSql.getOrElse(
            insertSql(table, columns, conflictKey).replace("VALUES %s",
              columns.map(_ => "?").mkString("VALUES (", ", ", ")"))))
        } catch { case e: Throwable =>
          try conn.close()
          catch { case e2: Throwable if e2 ne e => e.addSuppressed(e2) }
          throw e
        }
      def insertBatch(rows: Seq[Seq[Any]]): Long = {
        rows.foreach { r =>
          bindOrder.iterator.zipWithIndex.foreach { case (ci, i) =>
            stmt.setObject(i + 1, r(ci))
          }
          stmt.addBatch()
        }
        stmt.executeBatch().iterator.map {
          case java.sql.Statement.SUCCESS_NO_INFO =>
            throw new IllegalStateException(
              "driver returned SUCCESS_NO_INFO for a batched upsert - " +
                "batch-rewrite modes (e.g. reWriteBatchedInserts) hide " +
                "per-row counts and are unsupported for the rowcount " +
                "analog; disable rewrite or drop the count contract")
          case c => if (c > 0) c.toLong else 0L
        }.sum
      }
      def commit(): Unit = conn.commit()
      def rollback(): Unit = conn.rollback()
      def close(): Unit = try stmt.close() finally conn.close()
    }
  }

  /** Distributed upsert: `foreachPartition` opens one session, streams the
    * partition in `batchSize` chunks, commits once per partition, rolls
    * back on failure. Returns total rows inserted across all partitions.
    * Double.NaN / Float.NaN render as NULL (the reference's pd.isna
    * mapping, :170-173 — NaN means "sensor gap", and a NaN would poison
    * the conflict-key equality a re-run depends on).
    */
  // Rowcount caveat: accumulator updates count once per SUCCESSFUL task
  // (Spark's exactly-once guarantee for actions), so a task that dies
  // AFTER its commit undercounts - the retry re-inserts nothing (the
  // conflict key skips) and the lost attempt's count is discarded. The
  // STORE is always correct; treat the returned count as the reference
  // does its logged rowcount: operational telemetry, not a ledger.
  def upsert(df: DataFrame, factory: SessionFactory,
             batchSize: Int = 1000): Long = {
    require(batchSize > 0, "batchSize must be positive")
    val acc = df.sparkSession.sparkContext.longAccumulator("rows_inserted")
    val nCols = df.columns.length
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val sess = factory.open()
        try {
          it.grouped(batchSize).foreach { chunk =>
            val rows = chunk.map { r =>
              (0 until nCols).map { i =>
                r.get(i) match {
                  case null => null
                  case d: java.lang.Double if d.isNaN => null
                  case f: java.lang.Float if f.isNaN => null
                  case v => v
                }
              }
            }
            acc.add(sess.insertBatch(rows))
          }
          sess.commit()
        } catch {
          case e: Throwable =>
            // a rollback/close failure on a dead connection must not
            // REPLACE the root cause - attach it instead
            try { try sess.rollback() finally sess.close() }
            catch { case e2: Throwable if e2 ne e => e.addSuppressed(e2) }
            throw e
        }
        sess.close()
      }
    }
    acc.value
  }
}
