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

  /** REAL pure-JVM image header parser: width/height decoded from the
    * container header bytes alone — PNG IHDR, GIF87a/89a logical screen
    * descriptor, JPEG SOF0/1/2 frame header (walking the marker
    * segments), BMP BITMAPINFOHEADER. No pixel decode, no native libs:
    * this is the slice of the codec boundary that CAN be genuinely real
    * in this container. Pixel-level decode stays behind `StubCodec`.
    */
  object ImageHeaders {
    def parse(bytes: Array[Byte]): Option[(String, Int, Int)] = {
      def u8(i: Int): Int = bytes(i) & 0xff
      def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Int =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      if (bytes.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' &&
          u8(2) == 'N' && u8(3) == 'G')
        Some(("png", be32(16), be32(20)))
      else if (bytes.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F')
        Some(("gif", le16(6), le16(8)))
      else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8)
        jpegSof(bytes)
      else if (bytes.length >= 26 && u8(0) == 'B' && u8(1) == 'M')
        // BITMAPINFOHEADER: height is signed (negative = top-down rows)
        Some(("bmp", le32(18), math.abs(le32(22))))
      else None
    }

    /** Walk JPEG marker segments to the first start-of-frame. SOF layout
      * after the 2-byte length: precision(1), height(2 BE), width(2 BE).
      * C4/C8/CC in the C0-CF range are huffman/arithmetic tables, not
      * frames.
      */
    private def jpegSof(b: Array[Byte]): Option[(String, Int, Int)] = {
      def u8(i: Int): Int = b(i) & 0xff
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xff) return None // lost marker sync: corrupt header
        val marker = u8(i + 1)
        if (marker == 0xff) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2 // standalone
        else {
          val len = (u8(i + 2) << 8) | u8(i + 3)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 8 >= b.length) return None
            return Some(("jpeg", (u8(i + 7) << 8) | u8(i + 8), (u8(i + 5) << 8) | u8(i + 6)))
          }
          i += 2 + len
        }
      }
      None
    }
  }

  /** REAL pure-JVM WAV/RIFF header parser — the audio twin of
    * [[ImageHeaders]]: channel count, sample rate, bits per sample and
    * the data-chunk byte length decoded from the container bytes alone
    * (no sample decode, no native codec). Duration follows from the
    * header's own byte rate: `data_bytes * 1000 / byte_rate`.
    *
    * The chunk walk honours the RIFF spec: chunks are (id, LE32 size,
    * payload) triples padded to even offsets, in any order, with
    * unknown chunks (LIST/INFO/fact/...) skipped — so WAVs written by
    * arbitrary encoders parse, not just our own writer
    * (`MultimodalSpec` checks against `javax.sound.sampled`-encoded
    * bytes as the independent reference).
    */
  object WavHeaders {
    final case class WavMeta(channels: Int, sampleRate: Int,
                             bitsPerSample: Int, byteRate: Long, dataBytes: Long) {
      def durationMs: Long = if (byteRate <= 0) 0L else dataBytes * 1000L / byteRate
    }

    def parse(bytes: Array[Byte]): Option[WavMeta] = {
      def u8(i: Int): Int = bytes(i) & 0xff
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)).toLong & 0xffffffffL
      def tag(i: Int): String =
        new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var fmt: Option[(Int, Int, Int, Long)] = None // channels, rate, bits, byteRate
      var data: Option[Long] = None
      var i = 12
      while (i + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(i)
        val size = le32(i + 4)
        val body = i + 8
        if (id == "fmt ") {
          if (size < 16 || body + 16 > bytes.length) return None
          fmt = Some((le16(body + 2), le32(body + 4).toInt, le16(body + 14), le32(body + 8)))
        } else if (id == "data") {
          // size may legitimately exceed the buffer only for a truncated
          // file; the header still tells the true payload length
          data = Some(size)
        }
        // RIFF pads every odd-sized chunk to the next even offset; a
        // corrupt size that would overflow Int or fail to advance ends
        // the walk instead of looping or indexing negative
        val next = body.toLong + size + (size & 1L)
        if (next <= i || next > Int.MaxValue) i = bytes.length
        else i = next.toInt
      }
      for ((ch, rate, bits, byteRate) <- fmt; d <- data)
        yield WavMeta(ch, rate, bits, byteRate, d)
    }

    /** Minimal canonical PCM WAV writer (RIFF + fmt + data) — the
      * counterpart used to synthesise real parseable audio payloads.
      */
    def build(channels: Int, sampleRate: Int, bitsPerSample: Int,
              data: Array[Byte]): Array[Byte] = {
      val blockAlign = channels * bitsPerSample / 8
      val byteRate = sampleRate * blockAlign
      val bb = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort) // PCM
        .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
        .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
        .put("data".getBytes("US-ASCII")).putInt(data.length)
        .put(data)
      bb.array()
    }
  }

  final case class AudioMeta(
      asset_id: Long, channels: Int, sample_rate: Int, bits_per_sample: Int,
      data_bytes: Long, duration_ms: Long)

  /** Synthesise REAL 16-bit PCM WAV payloads from the documents fixture:
    * format parameters derive from `doc_id` (channels 1-2, one of four
    * standard sample rates), sample data is the text's UTF-8 bytes
    * truncated down to a whole number of frames. The payloads are
    * genuine WAV files — `javax.sound.sampled` opens them — so the
    * decode below exercises the real parser, not a stub.
    */
  def audioAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = Array(8000, 16000, 22050, 44100)
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, raw) =>
          val channels = (id % 2).toInt + 1
          val rate = rates((id % 4).toInt)
          val blockAlign = channels * 2
          val nData = raw.length / blockAlign * blockAlign
          (id, WavHeaders.build(channels, rate, 16, java.util.Arrays.copyOf(raw, nData)))
        }
      }.toDF("asset_id", "payload")
  }

  /** Batched per-partition audio header decode — REAL parsing (the mm1
    * counterpart for audio): every field in the output is read back out
    * of the payload's RIFF structure. Narrow map, no shuffle; unparseable
    * payloads are dropped (a real ingest would route them to a reject
    * sink).
    */
  def decodeAudioMeta(assets: DataFrame, batchSize: Int = 128): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, payload) =>
            WavHeaders.parse(payload).map(m =>
              AudioMeta(id, m.channels, m.sampleRate, m.bitsPerSample,
                m.dataBytes, m.durationMs))
          }
        }
      }.toDF()
  }

  /** STUB decode kernel — deterministic fake in place of the real
    * pixel/audio/video codec (media libs not present in this container).
    * Image WIDTH/HEIGHT are real when the payload carries a recognised
    * container header (`ImageHeaders` — PNG/GIF/JPEG/BMP); everything
    * else (pixel decode, audio/video duration) is derived from the
    * payload's own bytes so the pipeline is fully testable end-to-end.
    */
  object StubCodec {
    def decode(a: Asset): AssetMeta = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(a.payload)
      def b(i: Int): Int = md(i) & 0xff
      // ??? real pixel/audio codec goes here; header-only dims are real,
      // the rest is faked from the digest:
      val (w, h, dur) = a.media_type match {
        case "image" => ImageHeaders.parse(a.payload) match {
          case Some((_, rw, rh)) => (rw, rh, 0L)
          case None              => (64 + b(0) * 8, 64 + b(1) * 8, 0L)
        }
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

  /** Scene-change detection over sampled video frames: per-frame
    * 16-bin "pixel" histograms, L1 distance between consecutive
    * frames, a cut wherever the distance exceeds `threshold` — the
    * standard histogram-difference shot-boundary detector, integer-
    * exact end to end so a SQL twin reproduces every distance.
    *
    * Frame pixels come from the StubCodec boundary (a real decoder
    * slots in where the digest is computed): each sampled frame's
    * "pixels" are the 32 hex nibbles of `md5(asset_id:frame_ms)`, the
    * per-frame analogue of [[perceptualHash]]'s per-asset digest.
    * The histogram is 16 codegen'd character counts — no UDF.
    *
    * Scale shape: frames explode from metadata (duration), so the
    * relation is frames-not-bytes; the lag window partitions by asset
    * (state = one row's histogram, O(1) per partition stream); the
    * summary is a mergeable per-asset aggregate. One shuffle total.
    */
  def sceneChanges(meta: DataFrame, everyMs: Long = 1000L,
                   threshold: Long = 26L): DataFrame = {
    val hexDigits = "0123456789abcdef"
    val withDigest = frameSamples(meta, everyMs)
      .withColumn("_dg", md5(concat(col("asset_id").cast("string"),
        lit(":"), col("frame_ms").cast("string"))))
    val hist = array(hexDigits.map(c =>
      (lit(32L) - length(replace(col("_dg"), lit(c.toString), lit(""))))
        .cast("long")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("asset_id").orderBy("frame_ms")
    withDigest.withColumn("_h", hist)
      .withColumn("_prev", lag(col("_h"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .withColumn("l1", aggregate(
        zip_with(col("_h"), col("_prev"), (x, y) => abs(x - y)),
        lit(0L), (acc, x) => acc + x))
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_transitions"),
        sum(when(col("l1") > threshold, 1L).otherwise(0L)).as("n_cuts"),
        max(col("l1")).as("max_l1"))
  }

  /** Perceptual hash of an asset — the aHash recipe (average hash, the
    * simplest of the pHash family): histogram the decoded pixels into
    * 16 buckets, set bit i iff bucket i is STRICTLY above the mean.
    * The mean test is integer cross-multiplied (`h_i · 16 > total`),
    * so the hash is exact integer arithmetic end to end and a SQL twin
    * reproduces every bit.
    *
    * The PIXELS come from the stub decode (the StubCodec boundary):
    * the asset's md5 digest read as 32 hex nibbles, one "pixel" value
    * 0–15 per nibble. A real image pipeline feeds downsampled
    * grayscale pixels through the IDENTICAL bit recipe — only the
    * pixel source changes. (Hashing the raw payload bytes instead is a
    * trap worth documenting: for text-backed fixtures every byte
    * histogram is dominated by ASCII letter frequencies, all hashes
    * collide, and the near-dup pair set degenerates to quadratic —
    * measured, not hypothetical.) Narrow per-partition kernel, no
    * shuffle.
    */
  def perceptualHash(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(a.payload).map("%02x".format(_)).mkString
        val h = new Array[Long](16)
        hex.foreach { c =>
          val v = if (c <= '9') c - '0' else c - 'a' + 10
          h(v) += 1L
        }
        val total = hex.length.toLong
        var sig = 0
        var i = 0
        while (i < 16) {
          if (h(i) * 16L > total) sig |= (1 << i)
          i += 1
        }
        (a.asset_id, a.media_type, sig)
      }
    }.toDF("asset_id", "media_type", "phash")
  }

  /** Near-duplicate IMAGE pairs within `maxDist` hamming distance of
    * their perceptual hashes — the d3 pigeonhole recipe on media: split
    * the `bins`-bit hash into `maxDist + 1` bands; two hashes within
    * `maxDist` must agree EXACTLY on at least one band (pigeonhole), so
    * candidates come from band-equality joins and only candidates pay
    * the hamming check. Output is exact for the hash metric: every pair
    * at distance ≤ maxDist appears once (`asset_a < asset_b`).
    *
    * Scale shape: never all-pairs — the corpus shuffles once per band
    * on the band value (bounded by maxDist+1 passes over the hash
    * table, which is id+int rows, not payloads). A degenerate corpus
    * (all hashes equal) degrades to the true pair set, which IS
    * quadratic in that case — same posture as d3.
    */
  def imageNearDups(assets: DataFrame, maxDist: Int = 2): DataFrame = {
    val bins = 16
    val ph = OpCaches.persist(
      Partitioning.ensureParallelism(
        perceptualHash(assets).filter(col("media_type") === "image")
          .select(col("asset_id"), col("phash"))))
    val nBands = maxDist + 1
    val bandCols = (0 until nBands).map { b =>
      val lo = b * bins / nBands
      val hi = (b + 1) * bins / nBands
      struct(lit(b).as("band"),
        shiftright(col("phash"), lo).bitwiseAND(lit((1 << (hi - lo)) - 1))
          .as("band_val"))
    }
    val bands = ph.select(col("asset_id"), col("phash"),
      explode(array(bandCols: _*)).as("bd"))
      .select(col("asset_id"), col("phash"),
        col("bd.band").as("band"), col("bd.band_val").as("band_val"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("asset_a"), col("x.phash").as("ph_a"),
        col("y.asset_id").as("asset_b"), col("y.phash").as("ph_b"))
      .distinct() // a pair may collide on several bands
    cand.withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select(col("asset_a"), col("asset_b"), col("hamming"))
  }
}
