package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * / resize / frame-sample as batched per-partition transforms.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration, output contract. The actual media codecs are NOT available
  * in this environment, so the decode kernel is a clearly-marked
  * deterministic STUB (`StubCodec`): it derives plausible metadata from
  * the payload bytes alone. Swapping in a real codec changes only the
  * kernel body, not the pipeline.
  *
  * Scale notes: decode is a narrow per-partition map (no shuffle); batch
  * size is bounded so peak memory is `batchSize × payload` regardless of
  * partition size; payloads stay binary end-to-end (never stringified).
  */
object Multimodal {

  final case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])
  final case class AssetMeta(
      asset_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, duration_ms: Long, checksum: String)

  /** STUB decode kernel — deterministic fake in place of the real
    * image/audio/video codec (libs not present in this container).
    * Metadata is derived from the payload's own bytes so the pipeline is
    * fully testable end-to-end.
    */
  object StubCodec {
    def decode(a: Asset): AssetMeta = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(a.payload)
      def b(i: Int): Int = md(i) & 0xff
      // ??? real codec goes here; fake dims/duration from the digest:
      val (w, h, dur) = a.media_type match {
        case "image" => (64 + b(0) * 8, 64 + b(1) * 8, 0L)
        case "audio" => (0, 0, 1000L + b(2) * 256L)
        case "video" => (320 + b(0) * 4, 180 + b(1) * 4, 5000L + b(3) * 512L)
        case _       => (0, 0, 0L)
      }
      AssetMeta(a.asset_id, a.media_type, a.payload.length.toLong, w, h, dur,
        md.map("%02x".format(_)).mkString)
    }
  }

  /** Build an asset table from the documents fixture: payload = UTF-8
    * bytes of the text (an opaque stand-in for real media bytes),
    * media_type assigned round-robin.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batched per-partition decode: iterate each partition in bounded
    * batches (the `mapInPandas` batch shape, Scala-side), apply the
    * kernel, emit typed metadata rows.
    */
  def decodeMeta(assets: DataFrame, batchSize: Int = 128): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a vectorised codec would process a chunk
        batch.iterator.map(StubCodec.decode)
      }
    }.toDF()
  }

  /** STUB feature extraction — an L2-normalised byte histogram in place
    * of a real image/audio embedding model (same shape contract:
    * `(vec_id, embedding: Array[Float])`, unit norm). Output plugs
    * directly into `Similarity.bruteForceTopK` / `lshTopK` / `ivfTopK`,
    * which is the point: the media → features → ANN pipeline is the
    * composition a training-data pipeline runs, and its Spark plumbing
    * is identical with a real model behind the kernel.
    */
  def extractFeatures(assets: DataFrame, bins: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val h = new Array[Float](bins)
        a.payload.foreach(b => h(((b & 0xff) * bins) / 256) += 1f)
        val norm = math.sqrt(h.map(x => x.toDouble * x).sum)
        val n = if (norm < 1e-9) 1f else norm.toFloat
        (a.asset_id, h.map(_ / n))
      }
    }.toDF("vec_id", "embedding")
  }

  /** Resize spec transform: pure metadata math (target box, preserve
    * aspect ratio) — the part of an image pipeline that IS plain columns.
    */
  def withResizeSpec(meta: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide).cast("double") / greatest(col("width"), lit(1)),
      lit(maxSide).cast("double") / greatest(col("height"), lit(1)),
      lit(1.0))
    meta
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sample spec for video rows: every `everyMs` up to duration —
    * a lazy `sequence`, exploded only where needed.
    */
  def frameSamples(meta: DataFrame, everyMs: Long): DataFrame =
    meta.filter(col("media_type") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ms"))
}
