package graft

import java.io.{File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.dialect.{MySqlDialect, PostgresDialect, SqliteDialect, Dialect}
import graft.export.DumpWriter
import graft.analyse.TableMeta
import graft.sources.{Source, SqlDumpSource}

/** The DSv2 SQL-dump reader: round-trip fidelity against the engine's
  * own DumpWriter output, statement-aligned splitting, column pruning,
  * and escape decoding.
  */
class SqlDumpSourceSpec extends AnyFunSuite with SparkSuite {

  private def writeDump(df: DataFrame, table: String, dialect: Dialect = MySqlDialect,
                        batchSize: Int = 3): File = {
    val dir = Files.createTempDirectory("sqldump_spec").toFile
    val f = new File(dir, s"$table.sql")
    val w = new OutputStreamWriter(new FileOutputStream(f), UTF_8)
    try {
      val dw = new DumpWriter(w, dialect, batchSize = batchSize,
        timestamp = () => "1970-01-01T00:00:00Z")
      dw.writeHeader()
      val meta = TableMeta(table, Source.ddlFor(table, df.schema), Seq.empty, () => 0L)
      dw.exportTable(meta, Some(df))
      dw.writeFooter()
    } finally w.close()
    f
  }

  private def readBack(path: String, table: String, split: Long = 1L << 20): DataFrame =
    spark.read.format("graft.sources.SqlDumpSource")
      .option("table", table)
      .option("maxSplitBytes", split.toString)
      .load(path)

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("round-trip: every type survives writer -> reader bit-exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, 7, "plain", 3.25, true, java.sql.Date.valueOf("2024-02-29"),
        java.sql.Timestamp.valueOf("2024-02-29 13:45:09"), Option(9.5f)),
      (2L, -8, "it's quoted", -0.5, false, java.sql.Date.valueOf("1999-12-31"),
        java.sql.Timestamp.valueOf("1970-01-01 00:00:01"), None)
    ).toDF("id", "n", "s", "d", "b", "dt", "ts", "f")
    val dump = writeDump(df, "t_types")
    val back = readBack(dump.getPath, "t_types")
    // inferred schema: names and arity match the source
    assert(back.schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
    // compare everything as strings under the UTC session (the writer
    // renders wall-clock text, so the read-back type is TIMESTAMP_NTZ)
    def norm(d: DataFrame): Set[String] =
      d.select(col("id"), col("n"), col("s"), col("d"), col("b"),
        col("dt").cast("string"), col("ts").cast("timestamp_ntz").cast("string"),
        col("f"))
        .collect().map(_.toString).toSet
    assert(norm(back) == norm(df))
  }

  test("escape gauntlet: quotes, backslashes, control chars, NULL") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "line\nbreak and\rcr"),
      (2L, "quote ' and double '' quote"),
      (3L, "back\\slash \\n literal"),
      (4L, "nul \u0000 char and sub \u001a char"),
      (5L, null.asInstanceOf[String]),
      (6L, "comma, paren), INSERT INTO decoy (x) VALUES")
    ).toDF("id", "text")
    val dump = writeDump(nasty, "t_esc", batchSize = 2)
    val back = readBack(dump.getPath, "t_esc")
    assert(rowSet(back) == rowSet(nasty))
  }

  test("binary round-trip: arbitrary non-UTF-8 bytes survive via hex literals") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array[Byte](0, 1, -1, -128, 127)),          // NUL + invalid-UTF-8 bytes
      (2L, Array[Byte](0x27, 0x5c, 0x0a, 0x0d, 0x1a)), // the escape-set bytes
      (3L, "plain ascii".getBytes(UTF_8)),
      (4L, Array.empty[Byte]),
      (5L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("id", "blob")
    val dump = writeDump(df, "t_bin", batchSize = 2)
    val back = readBack(dump.getPath, "t_bin")
    val got = back.collect().map(r =>
      r.getLong(0) -> Option(r.getAs[Array[Byte]](1)).map(_.toSeq)).toMap
    for ((id, bytes) <- rows)
      assert(got(id) == Option(bytes).map(_.toSeq), s"id=$id")
  }

  test("binary round-trip: postgres-dialect bytea hex form decodes identically") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array[Byte](0, 10, 27, -1, -128)),
      (2L, "pg".getBytes(UTF_8)))
    val df = rows.toDF("id", "blob")
    val dump = writeDump(df, "t_pgbin", dialect = PostgresDialect)
    val text = new String(Files.readAllBytes(dump.toPath), UTF_8)
    assert(text.contains("'\\x000a1bff80'"), text.linesIterator.filter(_.startsWith("(")).mkString("\n"))
    val back = readBack(dump.getPath, "t_pgbin")
    val got = back.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    for ((id, bytes) <- rows) assert(got(id) == bytes.toSeq, s"id=$id")
  }

  test("timestamp round-trip keeps sub-second micros") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampNTZType)))
    val rows = Seq(
      Row(1L, java.time.LocalDateTime.parse("2024-02-29T13:45:09.123456")),
      Row(2L, java.time.LocalDateTime.parse("2024-02-29T13:45:09")),
      Row(3L, java.time.LocalDateTime.parse("1999-12-31T23:59:59.000001")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dump = writeDump(df, "t_micros")
    val back = readBack(dump.getPath, "t_micros")
    assert(rowSet(back.select(col("id"), col("ts").cast("string"))) ==
      rowSet(df.select(col("id"), col("ts").cast("string"))))
  }

  test("multi-path load: two dump files read as one DataFrame") {
    import spark.implicits._
    val a = Seq((1L, "x1"), (2L, "x2")).toDF("id", "v")
    val b = Seq((3L, "x3"), (4L, "x4"), (5L, "x5")).toDF("id", "v")
    val fa = writeDump(a, "t_mp")
    val fb = writeDump(b, "t_mp")
    val both = spark.read.format("graft.sources.SqlDumpSource")
      .option("table", "t_mp").load(fa.getPath, fb.getPath)
    assert(rowSet(both) == rowSet(a.union(b)))
  }

  test("splitting: many tiny statement-aligned splits read every tuple exactly once") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"row_$i", i * 1.5)).toDF("id", "name", "v")
    val dump = writeDump(df, "t_split", batchSize = 7)
    // one-split baseline vs 512-byte splits (hundreds of partitions)
    val whole = readBack(dump.getPath, "t_split")
    val split = readBack(dump.getPath, "t_split", split = 512L)
    assert(split.rdd.getNumPartitions > 10,
      s"expected many splits, got ${split.rdd.getNumPartitions}")
    assert(rowSet(split) == rowSet(whole))
    assert(split.count() == 500L)
  }

  test("multi-table dump: each table reads only its own statements") {
    import spark.implicits._
    val a = Seq((1L, "a1"), (2L, "a2")).toDF("id", "va")
    val b = Seq((10L, 1.5), (20L, 2.5), (30L, 3.5)).toDF("id", "vb")
    val dir = Files.createTempDirectory("sqldump_multi").toFile
    val f = new File(dir, "dump.sql")
    val w = new OutputStreamWriter(new FileOutputStream(f), UTF_8)
    try {
      val dw = new DumpWriter(w, PostgresDialect, batchSize = 2,
        timestamp = () => "1970-01-01T00:00:00Z")
      dw.writeHeader()
      dw.exportTable(TableMeta("ta", Source.ddlFor("ta", a.schema), Seq.empty, () => 0L), Some(a))
      dw.exportTable(TableMeta("tb", Source.ddlFor("tb", b.schema), Seq.empty, () => 0L), Some(b))
      dw.writeFooter()
    } finally w.close()
    assert(rowSet(readBack(f.getPath, "ta")) == rowSet(a))
    assert(rowSet(readBack(f.getPath, "tb")) == rowSet(b))
    // no table option: first CREATE TABLE wins
    assert(spark.read.format("graft.sources.SqlDumpSource")
      .load(f.getPath).schema.fieldNames.toSeq == Seq("id", "va"))
  }

  test("column pruning reaches the reader: pruned scan decodes only required columns") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "v")
    val dump = writeDump(df, "t_prune")
    val pruned = readBack(dump.getPath, "t_prune").select("name")
    assert(pruned.schema.fieldNames.toSeq == Seq("name"))
    assert(pruned.collect().map(_.getString(0)).toSet == (1L to 50L).map(i => s"n$i").toSet)
    // the pushed-down read schema (what the reader decodes) is pruned
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }
    assert(scan.isDefined, pruned.queryExecution.executedPlan.toString)
    assert(scan.get.scan.readSchema().fieldNames.toSeq == Seq("name"))
  }

  test("filter pushdown: claimed predicates leave no Filter node and skip rows in the reader") {
    import spark.implicits._
    val df = (1L to 500L).map(i =>
      (i, s"n$i", i * 0.5, if (i % 7 == 0) null else s"x$i")).toDF("id", "name", "v", "opt")
    val dump = writeDump(df, "t_filter", batchSize = 9)
    val base = readBack(dump.getPath, "t_filter")

    // Count actual Filter operators in the physical plan — the scan's
    // describe string prints `pushedFilters=[…] RuntimeFilters: []`, so a
    // substring match on "Filter" false-positives on every plan.
    import org.apache.spark.sql.execution.FilterExec
    def filterNodes(q: org.apache.spark.sql.DataFrame): Seq[FilterExec] =
      q.queryExecution.executedPlan.collect { case f: FilterExec => f }

    // numeric range + null test: all claimable — plan must have NO Filter
    val q1 = base.filter(col("id") > 400 && col("v") <= 230.0 && col("opt").isNotNull)
    assert(filterNodes(q1).isEmpty, q1.queryExecution.executedPlan.toString)
    val expect1 = (401L to 460L).filterNot(_ % 7 == 0).toSet
    assert(q1.collect().map(_.getLong(0)).toSet == expect1)

    // string EQUALITY is claimable; string ORDERING is not (UTF-16 vs
    // UTF-8 order) — the residual comparison keeps a Filter node and
    // still evaluates correctly
    val q2 = base.filter(col("name") === "n42")
    assert(filterNodes(q2).isEmpty, q2.queryExecution.executedPlan.toString)
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(42L))
    val q3 = base.filter(col("name") > "n98")
    assert(filterNodes(q3).nonEmpty, q3.queryExecution.executedPlan.toString)
    assert(q3.collect().map(_.getString(1)).forall(_ > "n98"))

    // pushdown must not break when the filter column is pruned from output
    val q4 = base.filter(col("id") === 123L).select("name")
    assert(q4.collect().map(_.getString(0)).toSeq == Seq("n123"))
  }

  test("NOT NULL columns in the dump DDL infer as non-nullable") {
    val dir = Files.createTempDirectory("sqldump_ddl").toFile
    val f = new File(dir, "d.sql")
    val w = new OutputStreamWriter(new FileOutputStream(f), UTF_8)
    w.write(
      """CREATE TABLE "t" (
        |  "a" BIGINT NOT NULL,
        |  "b" TEXT,
        |  "c" DECIMAL(10,2) NOT NULL,
        |  "d" VARCHAR(40)
        |);
        |INSERT INTO "t" ("a", "b", "c", "d") VALUES
        |(1, 'x', 12.34, 'y');
        |""".stripMargin)
    w.close()
    val back = readBack(f.getPath, "t")
    val fields = back.schema.fields
    assert(!fields(0).nullable && fields(1).nullable && !fields(2).nullable)
    assert(fields(2).dataType == DecimalType(10, 2))
    assert(fields(3).dataType == StringType)
    val r = back.collect().head
    assert(r.getLong(0) == 1L && r.getString(1) == "x"
      && r.getDecimal(2).toPlainString == "12.34" && r.getString(3) == "y")
  }

  test("parallel sink: partitioned write commits part files, round-trips exactly") {
    import spark.implicits._
    val df = (1L to 1000L).map(i =>
      (i, s"v'$i", i * 0.5, i % 3 == 0)).toDF("id", "s", "v", "b")
    val dir = Files.createTempDirectory("sqldump_sink").toFile
    val out = new File(dir, "dump")
    df.repartition(6).write.format("graft.sources.SqlDumpSource")
      .option("table", "t_par").option("insertBatchSize", "50")
      .mode("append").save(out.getPath)
    val names = out.listFiles().map(_.getName).toSet
    assert(names.contains("00_schema.sql") && names.contains("_SUCCESS"), names)
    assert(names.count(_.startsWith("part-")) == 6, names)
    assert(!names.exists(_.endsWith(".inprogress")), names)
    val back = readBack(out.getPath, "t_par")
    assert(back.schema.fieldNames.toSeq == Seq("id", "s", "v", "b"))
    assert(rowSet(back) == rowSet(df))
  }

  test("parallel sink: a second append job adds part files, never overwrites") {
    import spark.implicits._
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val df2 = Seq((3L, "c"), (4L, "d")).toDF("id", "s")
    val dir = Files.createTempDirectory("sqldump_append").toFile
    val out = new File(dir, "dump")
    def save(d: DataFrame): Unit =
      d.coalesce(1).write.format("graft.sources.SqlDumpSource")
        .option("table", "t_app").mode("append").save(out.getPath)
    save(df1); save(df2)
    assert(out.listFiles().count(_.getName.startsWith("part-")) == 2)
    assert(rowSet(readBack(out.getPath, "t_app")) == rowSet(df1.unionByName(df2)))
  }

  test("parallel sink and serial DumpWriter render byte-identical tuple literals") {
    import spark.implicits._
    val df = Seq((7L, "esc'aped\ntext", 2.5, java.sql.Timestamp.valueOf("2001-02-03 04:05:06")))
      .toDF("id", "s", "v", "ts")
    val dir = Files.createTempDirectory("sqldump_parity").toFile
    val out = new File(dir, "dump")
    df.coalesce(1).write.format("graft.sources.SqlDumpSource")
      .option("table", "t_parity").mode("append").save(out.getPath)
    val serial = writeDump(df, "t_parity")
    def tuples(f: File): Seq[String] = {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().filter(_.startsWith("(")).toList finally src.close()
    }
    val parPart = out.listFiles().filter(_.getName.startsWith("part-")).head
    assert(tuples(parPart).map(_.stripSuffix(";").stripSuffix(",")) ==
           tuples(serial).map(_.stripSuffix(";").stripSuffix(",")))
  }

  test("sqlite-dialect dump (double-quoted INSERT identifiers) reads back too") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val dump = writeDump(df, "t_sqlite", dialect = SqliteDialect)
    assert(rowSet(readBack(dump.getPath, "t_sqlite")) == rowSet(df))
  }

  test("nasty goldens read back: reserved-word table, BLOB literals, composite PK, FK cycle") {
    // end-to-end over the committed per-dialect NASTY dump goldens (the
    // JdbcDumpGoldenSpec fixtures): a `table` named with a reserved word
    // (`order`) holding a reserved-word COLUMN (`select`), a composite
    // PK, a BLOB (X'..' mysql/sqlite raw token vs postgres '\x..' bytea
    // form), NULLs, and the employees<->teams FK cycle — the reader must
    // parse each dialect's actual emitted bytes, not just the writer's
    // round-trip of a friendly schema.
    for (dialect <- Seq("mysql", "postgres", "sqlite")) {
      val path = getClass.getResource(s"/golden/dump_${dialect}_nasty.sql").getPath
      val order = readBack(path, "order")
      assert(order.schema.fieldNames.toSeq ==
        Seq("region_code", "order_no", "select", "payload"), s"$dialect schema")
      // sqlite's golden declares integer affinity (INTEGER/INT8 mix
      // across dialects) — read ids dialect-agnostically
      def asLong(r: Row, i: Int): Long = r.getAs[Number](i).longValue
      val rows = order.collect().sortBy(asLong(_, 1))
      assert(rows.length == 2, s"$dialect rows")
      assert(rows(0).getString(0) == "eu" && rows(0).getString(2) == "keep")
      assert(rows(0).getAs[Array[Byte]](3).toSeq ==
        Seq(0x00.toByte, 0xff.toByte, 0x41.toByte), s"$dialect blob bytes")
      assert(rows(1).isNullAt(2) && rows(1).isNullAt(3), s"$dialect nulls")
      // both sides of the FK cycle read independently
      val employees = readBack(path, "employees").collect().sortBy(asLong(_, 0))
      assert(employees.map(asLong(_, 0)).toSeq == Seq(10L, 11L))
      assert(employees(0).getString(1).endsWith("@mailbox.example"))
      val teams = readBack(path, "teams").collect().sortBy(asLong(_, 0))
      assert(teams.map(r => (asLong(r, 0), r.getString(1))).toSeq ==
        Seq((1L, "Core"), (2L, "Data")))
      assert(teams(1).isNullAt(2), s"$dialect teams null lead")
      // column pruning still reaches the scan on a nasty schema
      val pruned = readBack(path, "order").select(col("order_no"))
      assert(pruned.collect().map(asLong(_, 0)).sorted.toSeq == Seq(1L, 2L))
    }
  }
}
