package graft.sources

import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** End-to-end round-trip sync against embedded Derby (source and target
  * are separate in-memory databases) — the reference's whole capability
  * surface in one spec: catalog scan, introspection, silent-drop, CHAR
  * rtrim, DDL create, batched insert, count invariant, re-run overwrite. */
class JdbcSyncSpec extends AnyFunSuite {

  private val srcUrl = "jdbc:derby:memory:syncsrc;create=true"
  private val tgtUrl = "jdbc:derby:memory:synctgt;create=true"

  private def conf = SyncConf(
    sourceUrl = srcUrl, targetUrl = tgtUrl, database = "APP",
    numPartitions = 2, tableParallelism = 2)

  private def execAll(url: String, sqls: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      sqls.foreach { s =>
        try st.execute(s)
        catch { case e: java.sql.SQLException if e.getSQLState == "42Y55" => () } // no such table on DROP
      }
      st.close()
    } finally conn.close()
  }

  private def setupSource(): Unit = execAll(srcUrl,
    "DROP TABLE T_GAUNTLET",
    """CREATE TABLE T_GAUNTLET (
      | ID BIGINT NOT NULL,
      | I INT, S SMALLINT, D DOUBLE, R REAL,
      | DEC1 DECIMAL(10,2),
      | C CHAR(8), V VARCHAR(40),
      | DT DATE, TS TIMESTAMP,
      | B BOOLEAN,
      | X XML)""".stripMargin,
    "INSERT INTO T_GAUNTLET (ID,I,S,D,R,DEC1,C,V,DT,TS,B) VALUES " +
      "(1, 42, 7, 1.5, 2.5, 1234.56, 'pad     ', 'hello', " +
      "DATE('2024-01-15'), TIMESTAMP('2024-01-15 10:30:00'), true)",
    "INSERT INTO T_GAUNTLET (ID,I,S,D,R,DEC1,C,V,DT,TS,B) VALUES " +
      "(2, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)",
    "INSERT INTO T_GAUNTLET (ID,I,S,D,R,DEC1,C,V,DT,TS,B) VALUES " +
      "(3, -1, -2, -0.25, -0.5, -99.99, 'x', '', " +
      "DATE('1999-12-31'), TIMESTAMP('1999-12-31 23:59:59'), false)",
    "DROP TABLE T_SMALL",
    "CREATE TABLE T_SMALL (K INT NOT NULL PRIMARY KEY, NOTE VARCHAR(20))",
    "INSERT INTO T_SMALL VALUES (1, 'one'), (2, 'two'), (3, NULL), (4, 'four')")

  test("catalog scan lists the source tables") {
    setupSource()
    val tables = TableSync.listTables(conf, DerbyDialect)
    assert(tables.toSet == Set("T_GAUNTLET", "T_SMALL"))
  }

  test("introspection silently drops the unmappable XML column") {
    setupSource()
    val cols = Introspection.withConnection(srcUrl, Map.empty) { conn =>
      Introspection.mappedColumns(conn, "APP", "T_GAUNTLET", DerbyDialect, strict = false)
    }
    assert(!cols.exists(_.name == "X"))
    assert(cols.map(_.name).contains("ID"))
  }

  test("strict mode fails on the unmappable column instead") {
    setupSource()
    assertThrows[UnmappableColumnException] {
      Introspection.withConnection(srcUrl, Map.empty) { conn =>
        Introspection.mappedColumns(conn, "APP", "T_GAUNTLET", DerbyDialect, strict = true)
      }
    }
  }

  test("syncAll round-trips both tables with the count invariant") {
    setupSource()
    val results = TableSync.syncAll(SharedSpark.spark, conf, DerbyDialect)
    assert(results.size == 2)
    assert(results.forall(_.countInvariantHolds))
    assert(results.find(_.table == "T_GAUNTLET").get.targetRows == 3)
    assert(results.find(_.table == "T_SMALL").get.targetRows == 4)
  }

  test("synced values survive the trip; CHAR is right-trimmed on read") {
    setupSource()
    // the read-side projection trims CHAR padding
    // (reference StandardReadMappings.java:98-101)
    val (df, _) = TableSync.readTable(SharedSpark.spark, conf, "T_GAUNTLET", DerbyDialect)
    val trimmed = df.filter(df("ID") === 1).collect()(0)
    assert(trimmed.getString(trimmed.fieldIndex("C")) == "pad")

    TableSync.sync(SharedSpark.spark, conf, "T_GAUNTLET", DerbyDialect)
    val conn = DriverManager.getConnection(tgtUrl)
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT "I", "C", "V", "DEC1" FROM "T_GAUNTLET" WHERE "ID" = 1""")
      assert(rs.next())
      assert(rs.getInt("I") == 42)
      // target column is CHAR(8), so the database pads the trimmed value
      // back on storage — same observable behavior as the reference's
      // char(n) target DDL
      assert(rs.getString("C") == "pad     ")
      assert(rs.getString("V") == "hello")
      assert(rs.getBigDecimal("DEC1") == new java.math.BigDecimal("1234.56"))
      rs.close()
      val rs2 = conn.createStatement().executeQuery(
        """SELECT COUNT(*) FROM "T_GAUNTLET" WHERE "I" IS NULL""")
      rs2.next()
      assert(rs2.getLong(1) == 1L) // NULL row survived
      rs2.close()
    } finally conn.close()
  }

  test("re-running sync overwrites (drop + recreate), not duplicates") {
    setupSource()
    TableSync.sync(SharedSpark.spark, conf, "T_SMALL", DerbyDialect)
    val r2 = TableSync.sync(SharedSpark.spark, conf, "T_SMALL", DerbyDialect)
    assert(r2.targetRows == 4)
  }

  test("partitioned read is used for the integral primary key table") {
    setupSource()
    val cols = Introspection.withConnection(srcUrl, Map.empty) { conn =>
      Introspection.mappedColumns(conn, "APP", "T_SMALL", DerbyDialect, strict = false)
    }
    assert(TableSync.partitionColumn(conf, "T_SMALL", cols, DerbyDialect).contains("K"))
    // T_GAUNTLET has no PK → single-partition read
    val gcols = Introspection.withConnection(srcUrl, Map.empty) { conn =>
      Introspection.mappedColumns(conn, "APP", "T_GAUNTLET", DerbyDialect, strict = false)
    }
    assert(TableSync.partitionColumn(conf, "T_GAUNTLET", gcols, DerbyDialect).isEmpty)
  }
}
