package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a partition-wise feature-extraction
  * operator.
  *
  * The Spark-side machinery here is real — schema, batch shape,
  * partitioning, magic-number sniffing — while the actual codec work
  * (JPEG decode, resampling, frame sampling) is STUBBED with a
  * deterministic fake, because no image/audio native libs exist in this
  * environment. Swap [[MediaCodec.decodeStub]] for a real codec (e.g.
  * javacpp-ffmpeg) without touching the dataflow.
  */
object Multimodal {

  /** Canonical media-table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Magic-number format sniff over the first payload bytes — pure column
    * algebra on the binary column (hex of an 8-byte prefix). */
  def sniffFormat(payload: Column): Column = {
    val prefix = upper(substring(hex(payload), 1, 16))
    when(prefix.startsWith("FFD8FF"), "jpeg")
      .when(prefix.startsWith("89504E47"), "png")
      .when(prefix.startsWith("47494638"), "gif")
      .when(prefix.startsWith("52494646"), "riff") // wav/avi container
      .when(prefix.startsWith("494433"), "mp3")
      .when(prefix.startsWith("1A45DFA3"), "mkv/webm")
      .otherwise("unknown")
  }

  /** Cheap metadata columns computable without decoding. */
  def withMediaMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)).cast("long"))
      .withColumn("format", sniffFormat(col(payloadCol)))
      .withColumn("content_md5", md5(col(payloadCol)))

  /** Feature-extraction batch contract: each partition is processed as a
    * stream of rows; the codec returns a fixed-length float vector per
    * payload. This is the Scala analog of `mapInPandas` — per-partition
    * batching, codec state initialized once per partition (not per row),
    * output schema declared up front. A TYPED `Dataset.mapPartitions`
    * with a Row encoder, so the stage stays in the Tungsten pipeline
    * (no RDD drop-out; upstream scans/filters still fuse). */
  def extractFeatures(
      df: DataFrame,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      dim: Int = 8): DataFrame = {
    import org.apache.spark.sql.Encoders
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition codec init happens HERE (once), not per row
      val codec = MediaCodec.open(dim)
      rows.map { r =>
        val payload = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        Row(r.getLong(idIdx), codec.decodeStub(payload))
      }
    }(Encoders.row(outSchema))
  }

  /** MM5: 64-bit perceptual-hash column — the fingerprint a real image
    * pipeline derives from decoded pixels (DCT low-frequency sign bits,
    * pHash). The kernel here is a STUB like every codec kernel in this
    * module: it splices the payload's md5 into a 64-bit value (pure
    * column algebra, so the oracle reproduces it bit-for-bit). The
    * honest consequence: the stub matches only byte-identical payloads
    * (md5 avalanches), where a real pHash also catches re-encodes and
    * resizes — the banding/verify dataflow downstream is identical
    * either way and is the part under test. */
  def perceptualHashStub(payload: Column): Column =
    when(payload.isNotNull,
      shiftleft(conv(substring(md5(payload), 1, 8), 16, 10).cast("long"), 32)
        .bitwiseOR(conv(substring(md5(payload), 9, 8), 16, 10).cast("long")))

  /** MM5: perceptual near-duplicate pairs over a media table — pHash
    * each payload, then hamming-LSH banding + exact popcount verify via
    * [[graft.dedup.Dedup.fingerprintNearPairs]] (pigeonhole-complete
    * for maxHamming < bands, maxBucket-guarded like every other pair
    * site). 16-bit bands default: 65k buckets per band, maxHamming ≤ 3.
    * Output (id_a, id_b, hamming). */
  def perceptualNearPairs(
      df: DataFrame,
      idCol: String = "media_id",
      payloadCol: String = "payload",
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucket: Int = 10000): DataFrame = {
    val fp = df.select(col(idCol),
      perceptualHashStub(col(payloadCol)).as("__fp"))
    graft.dedup.Dedup.fingerprintNearPairs(fp, idCol, "__fp", maxHamming,
      bits = 64, bands = bands, maxBucket = maxBucket,
      metricName = "phash_buckets")
  }

  /** Resize plumbing: binary → binary through the same typed
    * mapPartitions contract (codec opened once per partition, declared
    * output schema, no RDD drop-out). The stub kernel is a deterministic
    * center crop to width×height bytes — contiguous, so a SQL oracle
    * reproduces the output bytes exactly; a real pixel resampler swaps
    * in at the codec seam. */
  def resize(
      df: DataFrame,
      width: Int,
      height: Int,
      idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    import org.apache.spark.sql.Encoders
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("resized", BinaryType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val codec = MediaCodec.open(width * height)
      rows.map { r =>
        val payload = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        Row(r.getLong(idIdx), codec.resizeStub(payload, width, height))
      }
    }(Encoders.row(outSchema))
  }

  /** Frame-sample plumbing: one media row explodes into n frame rows —
    * the typed-mapPartitions flatMap shape real video sampling needs
    * (output cardinality decided per row by the codec, schema declared
    * up front). The stub samples fixed-width byte windows every
    * `strideBytes`; a real demuxer/decoder swaps in at the seam. */
  def sampleFrames(
      df: DataFrame,
      frameBytes: Int,
      strideBytes: Int,
      maxFrames: Int,
      idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    import org.apache.spark.sql.Encoders
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val codec = MediaCodec.open(frameBytes)
      rows.flatMap { r =>
        val payload = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        codec.frameStub(payload, frameBytes, strideBytes, maxFrames).map {
          case (i, frame) => Row(r.getLong(idIdx), i, frame)
        }
      }
    }(Encoders.row(outSchema))
  }
}

/** Codec seam. `decodeStub` is a deterministic fake — a STUB standing in
  * for the real decode (JPEG/PNG pixel decode, audio resample, video
  * frame-sample), which requires native libraries not present in this
  * container. The fake derives a stable feature vector from payload
  * bytes so the Spark-side plumbing (schema, partitioning, batch shape)
  * is real and testable; swap in a real codec without touching it. */
final class MediaCodec private (dim: Int) {
  def decodeStub(payload: Array[Byte]): Seq[Float] = {
    if (payload == null) return null
    // STUB: real implementation would decode pixels/samples here.
    // Deterministic fake: k-strided byte sums (exact integer arithmetic,
    // order-free — so a SQL oracle reproduces them bit-for-bit),
    // normalized to ~[0,1) by one double division, cast to float.
    val sums = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      sums(i % dim) += (payload(i) & 0xff)
      i += 1
    }
    val n = math.max(1, payload.length / dim)
    sums.map(s => (s / 255.0 / n).toFloat).toSeq
  }

  /** STUB resize kernel: center crop to width×height bytes (whole
    * payload when shorter). Real implementation: pixel decode +
    * resample. Contiguous by design so oracles can reproduce it. */
  def resizeStub(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
    if (payload == null) return null
    val n = width * height
    val len = math.min(n, payload.length)
    val off = (payload.length - len) / 2
    java.util.Arrays.copyOfRange(payload, off, off + len)
  }

  /** STUB frame sampler: fixed-width windows every `strideBytes`, capped
    * at `maxFrames`; payloads shorter than one frame yield none. Real
    * implementation: container demux + keyframe decode. */
  def frameStub(
      payload: Array[Byte],
      frameBytes: Int,
      strideBytes: Int,
      maxFrames: Int): Seq[(Int, Array[Byte])] = {
    if (payload == null || payload.length < frameBytes) return Nil
    val n = math.min(maxFrames, (payload.length - frameBytes) / strideBytes + 1)
    (0 until n).map(i =>
      (i, java.util.Arrays.copyOfRange(
        payload, i * strideBytes, i * strideBytes + frameBytes)))
  }
}

object MediaCodec {
  def open(dim: Int): MediaCodec = new MediaCodec(dim)
}
