package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run as batched per-partition transforms.
  *
  * The container ships no media codecs, so THE DECODE STEP IS A STUB — a
  * deterministic fake (content-hash-seeded feature vector) clearly marked
  * below. Everything around it is real and tested: the schema, the
  * mapPartitions batch shape (the Scala analog of a pandas-batch UDF), the
  * partition-size control, and the downstream similarity join via
  * [[Similarity]].
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true)
    )), nullable = true)
  ))

  /** STUB — deterministic fake decode. A real deployment replaces this body
    * with the actual codec call (e.g. JNI/ffmpeg or a pandas-batch UDF on a
    * PySpark edge); signature and batch shape stay identical. */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 0x9e3779b97f4a7c15L
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001b3L; i += 1 }
    }
    Array.tabulate(dim) { d =>
      var z = h + (d + 1) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) & 0xffff).toFloat / 65535.0f
    }
  }

  private def featureSchema(dim: Int): StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)
  ))

  /** Batched feature extraction: one partition = one decode batch (the Spark
    * executor keeps codec state warm across the iterator, exactly like a
    * pandas-batch UDF holds a model per batch). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val bytesIdx = media.schema.fieldIndex("bytes")
    val idIdx = media.schema.fieldIndex("media_id")
    val modIdx = media.schema.fieldIndex("modality")
    media.mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        Row(
          r.getLong(idIdx),
          r.getString(modIdx),
          if (bytes == null) 0 else bytes.length,
          decodeStub(bytes, dim)
        )
      }
    }(Encoders.row(featureSchema(dim)))
  }

  /** Frame sampling stub for video rows: emits `fps`-spaced frame indices
    * from the metadata duration — the exploded (media_id, frame_idx) layout a
    * real frame extractor fills with pixels. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media
      .filter(col("modality") === "video")
      .select(
        col("media_id"),
        explode(
          sequence(lit(0L), (coalesce(col("meta.duration_ms"), lit(0L)) / everyMs).cast("long"))
        ).as("frame_idx")
      )

  /** Test/bench helper: wrap any (doc_id, text) table as fake media rows. */
  def synthesize(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("modality"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit(640).as("width"),
        lit(480).as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms"),
        lit("fake").as("codec")
      ).as("meta")
    )
}
