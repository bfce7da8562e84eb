package graft.sources

import java.sql.Types
import org.apache.spark.sql.types._

/** Target/source SQL dialect: identifier quoting, catalog enumeration,
  * and Spark-type → DDL-type-text mapping.
  *
  * The reference's dialect surface is: backtick quoting with quote
  * doubling (Utils.java:82-95), LIKE-pattern escaping of `_`/`%`
  * (Utils.java:108-118), uppercase-identifier normalization for H2
  * targets (M2H2SchemaConverter.java:56-60,83-87), and a Presto-type →
  * MySQL-DDL-text table with tiered text types
  * (M2H2SchemaConverter.java:169-225, Utils.java:38-52 — written but dead
  * code in the reference; we implement the *intended* mapping).
  *
  * DERBY STANDS IN FOR H2: the reference's uppercase-identifier target is
  * H2 (M2H2SchemaConverter.java:56-60,83-87 uppercases every schema/table/
  * column name before DDL and metadata lookups). This environment ships no
  * H2 jar (zero egress), so [[GraftDerbyDialect]] exercises the same
  * semantic surface against embedded Derby — which, like H2 in its default
  * mode, stores unquoted identifiers uppercase and matches
  * DatabaseMetaData patterns case-sensitively. Every uppercase-target
  * behavior the reference relies on (normalize-before-lookup, quoted DDL,
  * pattern escaping) is therefore tested for real; only the jar differs.
  */
trait SqlDialect {
  def quote(ident: String): String

  /** SQL returning one row per table of `database` (reference: the
    * information_schema scan at Handler.java:28-29). */
  def catalogTablesQuery(database: String): String

  /** Column-type DDL text for the target CREATE TABLE. */
  def ddlType(dt: DataType, meta: ColumnMeta): String

  /** Normalize a configured database/schema name for DatabaseMetaData
    * patterns (Derby stores schemas uppercase and matches patterns
    * case-sensitively; MySQL uses the name as-is). */
  def metadataSchema(database: String): String = database

  /** LIKE-pattern escaping for DatabaseMetaData name patterns
    * (reference Utils.escapeNamePattern, Utils.java:108-118). */
  def escapeNamePattern(name: String, escape: String): String =
    name.replace(escape, escape + escape)
      .replace("_", escape + "_")
      .replace("%", escape + "%")
}

/** MySQL-flavored dialect — the reference's source and (as shipped)
  * target flavor. */
object MySqlDialect extends SqlDialect {
  /** Backtick quoting with quote doubling (Utils.java:82-95). */
  override def quote(ident: String): String =
    "`" + ident.replace("`", "``") + "`"

  override def catalogTablesQuery(database: String): String =
    s"SELECT table_name FROM information_schema.tables " +
      s"WHERE table_schema = '$database' AND table_type = 'BASE TABLE'"

  /** The intended toMysqlSqlType mapping (M2H2SchemaConverter.java:169-225):
    * REAL→float, TIMESTAMP→datetime, VARBINARY→mediumblob, VARCHAR tiered
    * by length into tinytext/text/mediumtext/longtext. */
  override def ddlType(dt: DataType, meta: ColumnMeta): String = dt match {
    case BooleanType   => "boolean"
    case ByteType      => "tinyint"
    case ShortType     => "smallint"
    case IntegerType   => "int"
    case LongType      => "bigint"
    case FloatType     => "float"
    case DoubleType    => "double"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case StringType if meta.jdbcType == Types.CHAR || meta.jdbcType == Types.NCHAR =>
      s"char(${math.min(meta.size, 255)})"
    case StringType =>
      // tiered text types by declared length (M2H2SchemaConverter.java:182-197)
      val n = meta.size
      if (n > 0 && n <= 255) "tinytext"
      else if (n <= 65535) "text"
      else if (n <= 16777215) "mediumtext"
      else "longtext"
    case BinaryType    => "mediumblob"
    case DateType      => "date"
    case TimestampType => "datetime"
    case other => throw new IllegalArgumentException(
      s"no MySQL DDL mapping for $other (column ${meta.name})")
  }
}

/** Derby dialect, used by the round-trip test harness (Derby ships with
  * Spark and runs embedded). Derby normalizes unquoted identifiers to
  * uppercase — the same convention the reference special-cases for H2
  * targets (M2H2SchemaConverter.java:56-60). */
object DerbyDialect extends SqlDialect {
  override def quote(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  override def metadataSchema(database: String): String = database.toUpperCase

  override def catalogTablesQuery(database: String): String =
    s"""SELECT t.tablename AS table_name
       |FROM sys.systables t JOIN sys.sysschemas s ON t.schemaid = s.schemaid
       |WHERE t.tabletype = 'T' AND s.schemaname = '${database.toUpperCase}'""".stripMargin

  override def ddlType(dt: DataType, meta: ColumnMeta): String = dt match {
    case BooleanType   => "boolean"
    case ByteType      => "smallint" // Derby has no tinyint
    case ShortType     => "smallint"
    case IntegerType   => "int"
    case LongType      => "bigint"
    case FloatType     => "real"
    case DoubleType    => "double"
    case d: DecimalType =>
      // Derby caps precision at 31
      s"decimal(${math.min(d.precision, 31)},${math.min(d.scale, 28)})"
    case StringType if meta.jdbcType == Types.CHAR || meta.jdbcType == Types.NCHAR =>
      s"char(${math.max(1, math.min(meta.size, 254))})"
    case StringType    => s"varchar(${math.max(1, math.min(meta.size, 32672))})"
    case BinaryType    => "blob"
    case DateType      => "date"
    case TimestampType => "timestamp"
    case other => throw new IllegalArgumentException(
      s"no Derby DDL mapping for $other (column ${meta.name})")
  }
}
