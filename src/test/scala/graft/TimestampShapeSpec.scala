package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ParquetSource

/** The fixture's `ts` column has shipped in three physical shapes across
  * driver regenerations: TIMESTAMP(µs, isAdjustedToUTC=true) (reads as
  * TimestampType), TIMESTAMP(µs, isAdjustedToUTC=false) (Spark 4 infers
  * TIMESTAMP_NTZ — broke `unix_micros` in round 4's driver run), and
  * TIMESTAMP(NANOS) (unreadable without `nanosAsLong`, surfacing as a
  * LongType named `ts`). `ParquetSource.normalizeNanoTimestamps` must
  * fold all three to TimestampType with identical instants — this spec
  * locks that in so the next regeneration can't silently break the
  * event-time catalog again.
  */
class TimestampShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.session
  import spark.implicits._

  // 2024-03-01T12:34:56.789012Z — instant chosen with sub-ms precision
  // so a ns→µs or µs→ms truncation bug shifts the value visibly
  private val micros = 1709296496789012L

  private def roundTrip(write: String => Unit): (DataType, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_shape").toString
    write(dir)
    val df = ParquetSource.normalizeNanoTimestamps(spark.read.parquet(dir))
    val tpe = df.schema("ts").dataType
    val got = df.select(unix_micros(col("ts"))).as[Long].head()
    (tpe, got)
  }

  test("TIMESTAMP_LTZ fixture shape passes through unchanged") {
    val (tpe, got) = roundTrip { dir =>
      Seq(1L).toDF("id")
        .select(col("id"), timestamp_micros(lit(micros)).as("ts"))
        .write.mode("overwrite").parquet(dir)
    }
    assert(tpe == TimestampType)
    assert(got == micros)
  }

  test("TIMESTAMP_NTZ fixture shape is cast to TimestampType at the UTC instant") {
    val (tpe, got) = roundTrip { dir =>
      Seq(1L).toDF("id")
        .select(col("id"),
          timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"))
        .write.mode("overwrite").parquet(dir)
    }
    assert(tpe == TimestampType)
    assert(got == micros)
  }

  test("nanos-as-long fixture shape converts with the ns->micros floor") {
    val (tpe, got) = roundTrip { dir =>
      // +999 ns beyond the µs boundary: the normalizer must floor, the
      // same division DuckDB's epoch_us applies to TIMESTAMP(NANOS)
      Seq((1L, micros * 1000L + 999L)).toDF("id", "ts")
        .write.mode("overwrite").parquet(dir)
    }
    assert(tpe == TimestampType)
    assert(got == micros)
  }

  test("non-ts NTZ columns normalize too; unrelated longs are left alone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_shape").toString
    Seq(1L).toDF("id")
      .select(col("id"),
        timestamp_micros(lit(micros)).cast(TimestampNTZType).as("created_at"),
        lit(42L).as("n"))
      .write.mode("overwrite").parquet(dir)
    val df = ParquetSource.normalizeNanoTimestamps(spark.read.parquet(dir))
    assert(df.schema("created_at").dataType == TimestampType)
    assert(df.schema("n").dataType == LongType)
    assert(df.select(unix_micros(col("created_at"))).as[Long].head() == micros)
  }
}
