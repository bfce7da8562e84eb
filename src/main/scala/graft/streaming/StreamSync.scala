package graft.streaming

import java.sql.Connection
import org.apache.spark.sql.{DataFrame, Row}
import graft.sources.{Introspection, SqlDialect, SyncConf}

/** Incremental (CDC-ish) sync: a stream of keyed change rows is applied
  * to a JDBC target as idempotent upserts, micro-batch by micro-batch via
  * `foreachBatch`.
  *
  * This is the streaming completion of [[graft.sources.TableSync]] (the
  * reference only ever snapshots whole tables; its "incremental" story is
  * re-running the full copy). Spark has no JDBC streaming sink, so the
  * standard pattern is foreachBatch + per-batch MERGE emulation: DELETE
  * the batch's keys, INSERT the batch's rows, one transaction per
  * partition. Re-delivered micro-batches (at-least-once) re-apply the
  * same terminal state, so the sink is effectively exactly-once for
  * keyed upserts.
  */
object StreamSync {

  /** Apply one micro-batch of upserts to `table`: per partition, one
    * transaction of batched DELETE-by-key + INSERT. Usable directly as
    * `stream.writeStream.foreachBatch(upsertBatch(conf, dialect, table, keys))`.
    *
    * If a batch can contain several versions of one key, pass `orderCol`
    * (a monotone version/sequence/timestamp column): the row with the
    * greatest value wins. Without it, rows are applied as-is — correct
    * only when the upstream guarantees at most one row per key per batch
    * (shuffle merge order is otherwise nondeterministic, so no silent
    * "last wins" is attempted). */
  def upsertBatch(conf: SyncConf, dialect: SqlDialect, table: String,
                  keyCols: Seq[String], orderCol: Option[String] = None)
                 (batch: DataFrame, batchId: Long): Unit = {
    val cols = batch.schema.fieldNames.toSeq
    val keyIdx = keyCols.map(cols.indexOf)
    require(keyIdx.forall(_ >= 0), s"key columns $keyCols must be in $cols")
    val quotedTable = dialect.quote(table)
    val deleteSql = s"DELETE FROM $quotedTable WHERE " +
      keyCols.map(k => s"${dialect.quote(k)} = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $quotedTable (" +
      cols.map(dialect.quote).mkString(", ") + ") VALUES (" +
      cols.map(_ => "?").mkString(", ") + ")"
    val (url, props, batchSize) = (conf.targetUrl, conf.targetProps, conf.batchSize)
    val deduped = orderCol match {
      case Some(oc) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.{col, row_number}
        val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(oc).desc)
        batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None => batch
    }
    deduped.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) Introspection.withConnection(url, props) { conn =>
        conn.setAutoCommit(false)
        try {
          applyRows(conn, deleteSql, insertSql, keyIdx, rows, batchSize)
          conn.commit()
        } catch { case e: Throwable => conn.rollback(); throw e }
      }
    }
  }

  private def applyRows(conn: Connection, deleteSql: String, insertSql: String,
                        keyIdx: Seq[Int], rows: Iterator[Row], batchSize: Int): Unit = {
    val del = conn.prepareStatement(deleteSql)
    val ins = conn.prepareStatement(insertSql)
    try {
      var n = 0
      rows.foreach { row =>
        keyIdx.zipWithIndex.foreach { case (ki, pi) =>
          del.setObject(pi + 1, row.get(ki))
        }
        del.addBatch()
        (0 until row.length).foreach { i =>
          ins.setObject(i + 1, row.get(i))
        }
        ins.addBatch()
        n += 1
        // the reference's commit cadence: every `batchSize` rows
        // (JdbcPageSink.java:99-104)
        if (n % batchSize == 0) { del.executeBatch(); ins.executeBatch() }
      }
      del.executeBatch(); ins.executeBatch()
    } finally { del.close(); ins.close() }
  }
}
