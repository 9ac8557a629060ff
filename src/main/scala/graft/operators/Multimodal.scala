package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (north star): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed batch-wise per
  * partition.
  *
  * The decode step itself is a STUB (no media libraries ship in this
  * environment) — deterministic fake features derived from the payload
  * bytes — but the Spark-side plumbing is real and tested: schema contract,
  * binary batching via mapPartitions (the JVM analogue of arrow-batched
  * pandas UDFs: one iterator per partition, amortized per-batch setup),
  * partition sizing, and the metadata join-back.
  *
  * Scale notes: payloads never pass through a shuffle — feature extraction
  * is map-side; only the (id, features) projection moves. Partition sizing
  * for ~100 MB binary batches is the caller's `maxPartitionBytes` concern.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType),       // images/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),    // audio/video
    StructField("payload", BinaryType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Wrap a string-keyed corpus into the multimodal contract (used by tests
    * to fabricate payloads; production ingestion reads real binaries). */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("media_type"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"),
      col(textCol).cast("binary").as("payload"))

  /** STUB decode/feature-extract: a real deployment swaps the body for a
    * JNI/FFI call into a codec (the batch shape — one partition iterator,
    * per-batch init — is exactly what that call needs). The fake feature is
    * deterministic: 8 floats derived from byte histogram moments. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition (≈ per-batch) init happens once, here — the stub
        // has nothing to init, a real codec would.
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val feat = new Array[Float](8)
          var i = 0
          while (i < bytes.length) {
            feat(i % 8) += (bytes(i) & 0xff) / 255.0f
            i += 1
          }
          Row(id, bytes.length.toLong, feat.toSeq)
        }
      }(outEnc)
  }

  /** End-to-end: payloads → features, joined back to metadata. */
  def withFeatures(media: DataFrame): DataFrame =
    media.join(extractFeatures(media).drop("n_bytes"), Seq("media_id"))

  /** STUB resize: a real deployment decodes, scales to `w`×`h`, re-encodes.
    * The stub keeps the batch shape and metadata contract honest —
    * deterministic truncation of the payload proportional to the target
    * area so downstream size accounting is exercised. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(metadataSchema)
    media.select(metadataSchema.fieldNames.map(col): _*)
      .mapPartitions { rows =>
        rows.map { r =>
          val payload =
            if (r.isNullAt(6)) Array.emptyByteArray else r.getAs[Array[Byte]](6)
          val scaled = java.util.Arrays.copyOf(
            payload, math.min(payload.length, math.max(1, w * h / 64)))
          Row(r.getLong(0), r.getString(1), r.getString(2),
            Integer.valueOf(w), Integer.valueOf(h),
            if (r.isNullAt(5)) null else java.lang.Long.valueOf(r.getLong(5)),
            scaled)
        }
      }(outEnc)
  }

  /** STUB frame sampling for video payloads: every `everyNth` chunk of the
    * payload becomes one "frame" row (media_id, frame_no, frame bytes) —
    * the explode shape a real decoder's keyframe sampler produces. */
  def sampleFrames(media: DataFrame, everyNth: Int = 4, chunk: Int = 256): DataFrame = {
    val frameSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload =
            if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val nChunks = math.max(1, payload.length / chunk)
          (0 until nChunks by everyNth).map { i =>
            val from = i * chunk
            val until = math.min(payload.length, from + chunk)
            Row(r.getLong(0), Integer.valueOf(i),
              java.util.Arrays.copyOfRange(payload, from, math.max(from, until)))
          }
        }
      }(outEnc)
  }
}
