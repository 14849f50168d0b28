package graft

import org.apache.spark.sql.SparkSession
import graft.anonymise.Anonymiser
import graft.config.GraftConfig
import graft.dialect.Dialect
import graft.export.ExportPipeline
import graft.sources.{JdbcSource, ParquetSource, Source}

/** CLI mirroring the reference's command surface
  * (/root/reference/cmd/dbmask/main.go:30-315):
  *
  *   graft export -c config.yaml -o out.sql [--dry-run] [--batch-size N]
  *   graft sync   -c config.yaml [--truncate] [--dry-run]
  *   graft version
  *
  * One extension: `--source parquet:<dir>` scans the fixture directory
  * instead of a live JDBC database (this environment ships no JDBC
  * drivers; `JdbcSource` covers the live path when one is present).
  */
object Main {

  private val version = "0.1.0"

  def main(args: Array[String]): Unit = args.toList match {
    case "version" :: Nil =>
      println(s"graft $version")
    case "export" :: rest => run(parseFlags(rest), export = true)
    case "sync" :: rest   => run(parseFlags(rest), export = false)
    case _ =>
      System.err.println(
        """usage:
          |  graft export -c <config.(yaml|json)> -o <out.sql> [--dry-run] [--batch-size N] [--source parquet:<dir>]
          |  graft sync   -c <config> [--truncate] [--dry-run] [--source parquet:<dir>]
          |  graft version""".stripMargin)
      sys.exit(2)
  }

  private final case class Flags(
      config: String = "", out: String = "", dryRun: Boolean = false,
      truncate: Boolean = false, batchSize: Int = 1000, source: String = "")

  private def parseFlags(args: List[String]): Flags = {
    @annotation.tailrec
    def go(rest: List[String], f: Flags): Flags = rest match {
      case "-c" :: v :: t            => go(t, f.copy(config = v))
      case "-o" :: v :: t            => go(t, f.copy(out = v))
      case "--dry-run" :: t          => go(t, f.copy(dryRun = true))
      case "--truncate" :: t         => go(t, f.copy(truncate = true))
      case "--batch-size" :: v :: t  => go(t, f.copy(batchSize = v.toInt))
      case "--source" :: v :: t      => go(t, f.copy(source = v))
      case Nil                       => f
      case other :: _ =>
        System.err.println(s"unknown flag: $other"); sys.exit(2)
    }
    val f = go(args, Flags())
    if (f.config.isEmpty) { System.err.println("missing -c <config>"); sys.exit(2) }
    f
  }

  private def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def buildSource(spark: SparkSession, cfg: GraftConfig, flag: String): Source =
    if (flag.startsWith("parquet:")) ParquetSource(spark, flag.stripPrefix("parquet:"))
    else if (flag.startsWith("jdbc:")) {
      // explicit JDBC URL override (any driver on the classpath),
      // optionally suffixed `#schema`; credentials come from the config
      val (url, schema) = flag.lastIndexOf('#') match {
        case i if i > 0 => (flag.substring(0, i), flag.substring(i + 1))
        case _          => (flag, null)
      }
      JdbcSource(spark, url, cfg.connection.username, cfg.connection.password,
        schemaName = schema)
    }
    else JdbcSource(spark, cfg.connection.dsn,
      cfg.connection.username, cfg.connection.password)

  private def run(flags: Flags, export: Boolean): Unit = {
    val cfg = GraftConfig.load(flags.config)
    // step 2: validation warnings, non-fatal (main.go:97-103)
    Anonymiser.validateRules(cfg).foreach(w => System.err.println(s"Warning: $w"))

    // only stop a session this invocation created — embedded callers
    // (tests, notebooks) keep theirs
    val preExisting = org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
    val spark = buildSession()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val source = buildSource(spark, cfg, flags.source)
      if (!export) {
        // sync: set-difference → extend config (main.go:230-315)
        val (updated, missing) = ExportPipeline.sync(source, cfg, flags.truncate)
        missing.foreach(t => println(s"  + $t"))
        println(s"${missing.size} table(s) missing from configuration")
        if (!flags.dryRun && missing.nonEmpty) {
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(flags.config), GraftConfig.render(updated, flags.config))
          println(s"updated ${flags.config}")
        }
      } else if (flags.dryRun) {
        // dry-run planner (main.go:201-228)
        for (p <- ExportPipeline.plan(source, cfg)) {
          val anon = if (p.anonymisedColumns.nonEmpty)
            s" anonymised=[${p.anonymisedColumns.mkString(",")}]" else ""
          println(f"${p.meta.name}%-12s ${p.meta.rowCount}%8d rows  ${p.action}$anon")
        }
      } else {
        if (flags.out.isEmpty) { System.err.println("missing -o <out.sql>"); sys.exit(2) }
        val t0 = System.nanoTime()
        val writer = new java.io.FileWriter(flags.out)
        val stats = try
          ExportPipeline.run(source, cfg, Dialect.forName(cfg.connection.dbType),
            writer, flags.batchSize)
        finally writer.close()
        val secs = (System.nanoTime() - t0) / 1e9
        // end-of-run stats report (main.go:176-191)
        System.err.println(
          f"Exported ${stats.tablesExported} tables (${stats.tablesTruncated} truncated), " +
            f"${stats.rowsExported} rows in $secs%.1fs " +
            f"(cores=${Runtime.getRuntime.availableProcessors})")
      }
    } finally if (!preExisting) spark.stop()
  }
}
