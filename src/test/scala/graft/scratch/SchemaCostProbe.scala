package graft.scratch

import org.apache.spark.sql.SparkSession

/** How much does each `spark.read.parquet(path)` construction cost in
  * driver-side footer/schema resolution? 50 reps bare vs with an
  * explicit schema (no inference) vs full tbl-equivalent.
  */
object SchemaCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[schema] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val path = s"$dir/lineitem.parquet"
    val schema = spark.read.parquet(path).schema
    for (pass <- 1 to 3) {
      t(s"p$pass 50x inferred")((1 to 50).foreach(_ => spark.read.parquet(path).schema))
      t(s"p$pass 50x explicit")((1 to 50).foreach(_ => spark.read.schema(schema).parquet(path).schema))
    }
    spark.stop()
  }
}
