package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.analyse.{ColumnInfo, ForeignKey, TableMeta}
import graft.config.{Retain, RetainAll, RetainAfter, RetainCount}

/** Source abstraction ≈ the reference's `Driver` interface
  * (/root/reference/internal/database/driver.go:38-69): catalog listing,
  * DDL/column/FK metadata, and a retain-aware scan.
  *
  * The scan returns a lazy DataFrame — Catalyst pushes the retain
  * predicate and the projection down to the format (the reference builds
  * the same pushdown by hand into its scan SQL, mysql.go:138-166).
  */
trait Source {
  def spark: SparkSession

  /** Sorted base-table names (O1; reference orders by table_name). */
  def tables: Seq[String]

  /** CREATE TABLE text (O2). */
  def schemaDDL(table: String): String

  /** Column metadata (O3). */
  def columns(table: String): Seq[ColumnInfo]

  /** All FK edges (O4). */
  def foreignKeys: Seq[ForeignKey]

  /** Row count (O5); parquet resolves from footer metadata, no scan. */
  def rowCount(table: String): Long = read(table).count()

  /** Raw full-projection scan. */
  def read(table: String): DataFrame

  /** Scan with retain spec applied (O6 + O7 + O8):
    *  - RetainAfter → strict `>` on the column (mysql.go:157-161)
    *  - RetainCount → LIMIT without ORDER BY (mysql.go:163-166); we
    *    deliberately do NOT sort — same arbitrary-order contract.
    */
  def scan(table: String, retain: Retain): DataFrame = retain match {
    case RetainAll         => read(table)
    case RetainCount(n)    => read(table).limit(n)
    case RetainAfter(c, t) =>
      read(table).filter(col(c) > lit(java.sql.Timestamp.from(t)))
  }

  def tableMeta(table: String): TableMeta =
    TableMeta(table, schemaDDL(table), columns(table), rowCount(table))
}

object Source {

  /** Map a Spark type to a portable SQL type string, mirroring the shape
    * of the reference's Postgres DDL reconstruction (postgres.go:68-114),
    * which renders types from catalog metadata (and, like it, loses
    * FK/unique/index clauses — documented parity).
    */
  def sqlType(dt: DataType): String = dt match {
    case BooleanType          => "BOOLEAN"
    case ByteType             => "TINYINT"
    case ShortType            => "SMALLINT"
    case IntegerType          => "INTEGER"
    case LongType             => "BIGINT"
    case FloatType            => "REAL"
    case DoubleType           => "DOUBLE PRECISION"
    case d: DecimalType       => s"DECIMAL(${d.precision},${d.scale})"
    case StringType           => "TEXT"
    case BinaryType           => "BLOB"
    case DateType             => "DATE"
    case TimestampType        => "TIMESTAMP"
    case TimestampNTZType     => "TIMESTAMP"
    case ArrayType(et, _)     => s"ARRAY<${sqlType(et)}>"
    case other                => other.sql
  }

  /** Reconstruct CREATE TABLE text from a StructType. */
  def ddlFor(table: String, schema: StructType,
             quote: String => String = id => "\"" + id + "\""): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"  ${quote(f.name)} ${sqlType(f.dataType)}$nn"
    }
    s"CREATE TABLE ${quote(table)} (\n${cols.mkString(",\n")}\n);"
  }
}

/** Parquet-directory source: one `<table>.parquet` per table, FK edges
  * supplied statically (parquet has no FK catalog — the fixture map comes
  * from FIXTURES.md §B).
  */
final case class ParquetSource(
    spark: SparkSession,
    dir: String,
    fks: Seq[ForeignKey] = ParquetSource.fixtureForeignKeys) extends Source {

  override lazy val tables: Seq[String] = {
    val d = new java.io.File(dir)
    d.listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet"))
      .sorted.toSeq
  }

  private val cache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  override def read(table: String): DataFrame =
    cache.getOrElseUpdate(table,
      ParquetSource.normalizeNanoTimestamps(spark.read.parquet(s"$dir/$table.parquet")))

  override def schemaDDL(table: String): String =
    Source.ddlFor(table, read(table).schema)

  override def columns(table: String): Seq[ColumnInfo] =
    read(table).schema.fields.toSeq.map { f =>
      ColumnInfo(f.name, Source.sqlType(f.dataType), f.nullable, None)
    }

  override def foreignKeys: Seq[ForeignKey] = fks
}

object ParquetSource {

  /** Spark's TimestampType is microsecond-precision, so parquet
    * TIMESTAMP(NANOS) columns are unreadable unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` surfaces them as
    * nanosecond longs. This converts such columns (recognised by the
    * `isNanoTs` field metadata set by that flag, plus the known fixture
    * column `ts`) back to proper µs timestamps — the same ns→µs floor
    * DuckDB applies in epoch_us(), keeping engines comparable.
    */
  def normalizeNanoTimestamps(df: DataFrame, nanoCols: Seq[String] = Seq("ts")): DataFrame = {
    val longNanoCols = df.schema.fields.collect {
      case f if f.dataType == LongType &&
        (f.metadata.contains("isNanoTs") || nanoCols.contains(f.name)) => f.name
    }
    longNanoCols.foldLeft(df)((acc, c) =>
      acc.withColumn(c, timestamp_micros(expr(s"$c div 1000"))))
  }

  /** FK edges of the driver fixture star schema (FIXTURES.md §B). */
  val fixtureForeignKeys: Seq[ForeignKey] = Seq(
    ForeignKey("nation", "n_regionkey", "region", "r_regionkey"),
    ForeignKey("customer", "c_nationkey", "nation", "n_nationkey"),
    ForeignKey("supplier", "s_nationkey", "nation", "n_nationkey"),
    ForeignKey("orders", "o_custkey", "customer", "c_custkey"),
    ForeignKey("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ForeignKey("lineitem", "l_partkey", "part", "p_partkey"),
    ForeignKey("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ForeignKey("events", "user_id", "customer", "c_custkey"),
  )
}

/** JDBC source against a live database — the parity path for the
  * reference's MySQL/Postgres drivers. Metadata flows through
  * `java.sql.DatabaseMetaData` on the driver (like the reference's
  * information_schema queries, mysql.go:44-135); data flows through
  * `spark.read.jdbc` with partitioned scans. No database drivers exist
  * on this classpath (SURVEY.md §7), so the metadata paths are exercised
  * against a proxy-mocked JDBC driver in `JdbcSourceSpec`.
  */
final case class JdbcSource(
    spark: SparkSession,
    url: String,
    user: String,
    password: String,
    schemaName: String = "public") extends Source {

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url, user, password)
    try f(c) finally c.close()
  }

  override lazy val tables: Seq[String] = withConn { c =>
    val rs = c.getMetaData.getTables(null, schemaName, "%", Array("TABLE"))
    val b = Vector.newBuilder[String]
    while (rs.next()) b += rs.getString("TABLE_NAME")
    b.result().sorted
  }

  override def read(table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .option("fetchsize", 1000)
      .load()

  override def schemaDDL(table: String): String =
    Source.ddlFor(table, read(table).schema)

  override def columns(table: String): Seq[ColumnInfo] = withConn { c =>
    val rs = c.getMetaData.getColumns(null, schemaName, table, "%")
    val b = Vector.newBuilder[ColumnInfo]
    while (rs.next()) b += ColumnInfo(
      rs.getString("COLUMN_NAME"),
      rs.getString("TYPE_NAME"),
      rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
      Option(rs.getString("COLUMN_DEF")))
    b.result()
  }

  override lazy val foreignKeys: Seq[ForeignKey] = withConn { c =>
    tables.flatMap { t =>
      val rs = c.getMetaData.getImportedKeys(null, schemaName, t)
      val b = Vector.newBuilder[ForeignKey]
      while (rs.next()) b += ForeignKey(
        rs.getString("FKTABLE_NAME"), rs.getString("FKCOLUMN_NAME"),
        rs.getString("PKTABLE_NAME"), rs.getString("PKCOLUMN_NAME"))
      b.result()
    }
  }
}
