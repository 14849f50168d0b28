package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** MinHash-signature + LSH-band aggregator (Broder 1997): input is one
  * 64-bit shingle hash per row; the buffer holds the running element-wise
  * minimum of the k-member hash family; `finish` collapses the signature
  * into its band keys (one hash per `rowsPerBand` slots).
  *
  * Why an Aggregator instead of k separate `min(xxhash64(h, i))` agg
  * columns: a 64-column aggregate plus the band projection generates a
  * very wide whole-stage-codegen class that Janino recompiles per query
  * (seconds per run, measured); this aggregator is one narrow column
  * whose update is a tight JVM loop — the standard shape for sketch
  * aggregates (HLL, KLL, minhash).
  *
  * The hash family is splitmix64-derived: hᵢ = mix64(h XOR seedᵢ), an
  * independent-enough family for minhash banding (the downstream verify
  * step is exact, so family quality affects only candidate recall).
  */
class MinHashBandsAgg(k: Int, rowsPerBand: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val seeds: Array[Long] =
    Array.tabulate(k)(i => graft.anonymise.Faker.mix64(0x9e3779b97f4a7c15L * (i + 1)))

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val v = graft.anonymise.Faker.mix64(h ^ seeds(i))
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = {
    val bands = k / rowsPerBand
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var acc = graft.anonymise.Faker.mix64(j.toLong + 0x51L)
      var r = 0
      while (r < rowsPerBand) {
        acc = graft.anonymise.Faker.mix64(acc ^ buf(j * rowsPerBand + r))
        r += 1
      }
      out(j) = acc
      j += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
  override def outputEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
}

private object ExprEncoders {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashBandsAgg {
  /** Column form: `minhashBands(hashCol)` over a group. */
  def apply(k: Int, rowsPerBand: Int): Column => Column = {
    val fn = udaf(new MinHashBandsAgg(k, rowsPerBand), Encoders.scalaLong)
    (h: Column) => fn(h)
  }
}
