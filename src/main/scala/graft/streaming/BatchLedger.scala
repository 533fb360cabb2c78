package graft.streaming

import java.sql.{DriverManager, SQLException}
import java.util.Properties

/** Sink-side micro-batch ledger — the transactional-idempotence half of
  * Structured Streaming's exactly-once recipe for non-transactional sinks:
  * `foreachBatch` is at-least-once (a crash between the sink write and the
  * engine's commit-log write replays the batch), so the SINK records each
  * applied (sink_id, batch_id) and skips re-deliveries. Combined with the
  * keyed idempotent MERGE (which absorbs the half-applied-then-crashed
  * case), the observable result is exactly-once.
  *
  * The ledger lives in the SAME database as the data tables so a DBA sees
  * one consistent system of record; `sink_id` namespaces multiple streams
  * sharing one database.
  */
object BatchLedger {

  val Table = "batch_ledger"

  /** Idempotent ledger DDL bootstrap (same current-schema-scoped metadata
    * probe as [[graft.etl.Ddl.createTables]]).
    */
  def ensure(url: String, props: Properties = new Properties()): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val (catalog, schema) = (
        try Option(conn.getCatalog) catch { case _: SQLException => None: Option[String] },
        try Option(conn.getSchema) catch { case _: SQLException => None: Option[String] })
      val exists = Seq(Table.toUpperCase, Table.toLowerCase).exists { t =>
        val rs = conn.getMetaData.getTables(catalog.orNull, schema.orNull, t, null)
        try rs.next() finally rs.close()
      }
      if (!exists) {
        val st = conn.createStatement()
        try st.execute(
          s"""CREATE TABLE $Table (
             |  "sink_id" VARCHAR(200) NOT NULL,
             |  "batch_id" BIGINT NOT NULL,
             |  "applied_at" TIMESTAMP NOT NULL,
             |  PRIMARY KEY ("sink_id", "batch_id"))""".stripMargin)
        catch {
          // Two streams bootstrapping one database concurrently: the loser's
          // CREATE fails table-exists (Derby X0Y32 / Postgres 42P07 — not
          // SQLState class 23, so it can't ride the record() path's guard).
          // The race is benign exactly when the table now exists; anything
          // else propagates.
          case e: SQLException =>
            // same catalog/schema scoping as the initial probe: an unscoped
            // lookup could find a same-named table in another schema and
            // swallow a genuine CREATE failure
            val nowExists = Seq(Table.toUpperCase, Table.toLowerCase).exists { t =>
              val r = conn.getMetaData.getTables(catalog.orNull, schema.orNull, t, null)
              try r.next() finally r.close()
            }
            if (!nowExists) throw e
        } finally st.close()
      }
    } finally conn.close()
  }

  def alreadyApplied(
      url: String,
      sinkId: String,
      batchId: Long,
      props: Properties = new Properties()): Boolean = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(
        s"""SELECT 1 FROM $Table WHERE "sink_id" = ? AND "batch_id" = ?""")
      try {
        st.setString(1, sinkId)
        st.setLong(2, batchId)
        val rs = st.executeQuery()
        try rs.next() finally rs.close()
      } finally st.close()
    } finally conn.close()
  }

  /** Record a batch as applied. A duplicate-key failure means a concurrent
    * retry of the SAME batch already recorded it — both attempts wrote
    * identical data through the idempotent MERGE, so the race is benign and
    * swallowed; any other failure propagates (an unrecorded applied batch
    * re-applies on replay and converges — at-least-once degraded, never
    * wrong).
    */
  def record(
      url: String,
      sinkId: String,
      batchId: Long,
      props: Properties = new Properties()): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(
        s"""INSERT INTO $Table ("sink_id", "batch_id", "applied_at")
           |VALUES (?, ?, CURRENT_TIMESTAMP)""".stripMargin)
      try {
        st.setString(1, sinkId)
        st.setLong(2, batchId)
        st.executeUpdate()
      } catch {
        case e: SQLException if Option(e.getSQLState).exists(_.startsWith("23")) => ()
      } finally st.close()
    } finally conn.close()
  }
}
