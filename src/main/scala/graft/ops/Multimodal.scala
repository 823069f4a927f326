package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run as batched per-partition transforms.
  *
  * The IMAGE modality is decoded for REAL: the JDK's `javax.imageio` reads
  * PNG/JPEG/BMP with zero external jars, so image rows carry actual pixel
  * statistics (width/height, per-channel sums, an 8x8 block-mean feature
  * vector). The AUDIO modality is ALSO real: `javax.sound.sampled` parses
  * WAV/PCM in the bare JDK, so audio rows carry the decoded sample rate,
  * frame count, exact amplitude sum and a block-mean waveform feature. Only
  * VIDEO (no codec in the runtime image) remains an honestly-labeled
  * deterministic stub ([[decodeStub]]); the schema, mapPartitions batch
  * shape and partitioning are real for all modalities.
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

  /** STUB — deterministic fake decode for the one modality whose codecs the
    * runtime image lacks (video). A real deployment replaces this body
    * with the codec call; signature and batch shape stay identical. */
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

  /** Real image decode: width/height, exact per-channel pixel sums, and a
    * block-mean grayscale feature vector of EXACTLY `dim` floats in [0,1]
    * (grid ceil(sqrt(dim)) x ceil(dim/gridW), first `dim` blocks — an 8x8
    * grid at the default dim=64) — all read from the decoded raster, not
    * from metadata. Returns None on undecodable bytes (callers keep the row
    * with null pixel fields). */
  private[ops] def decodeImage(bytes: Array[Byte], dim: Int): Option[(Int, Int, Long, Long, Long, Array[Float])] = {
    if (bytes == null) return None
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val gray = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        gray(y * w + x) = (r + g + b) / 3.0
        x += 1
      }
      y += 1
    }
    val gridW = math.max(1, math.ceil(math.sqrt(dim.toDouble)).toInt)
    val gridH = math.max(1, (dim + gridW - 1) / gridW)
    val feat = new Array[Float](dim)
    var cell = 0
    while (cell < dim) {
      val bx = cell % gridW
      val by = cell / gridW
      val x0 = bx * w / gridW; val x1 = math.max(x0 + 1, (bx + 1) * w / gridW)
      val y0 = by * h / gridH; val y1 = math.max(y0 + 1, (by + 1) * h / gridH)
      var s = 0.0; var n = 0
      var yy = y0
      while (yy < y1 && yy < h) {
        var xx = x0
        while (xx < x1 && xx < w) { s += gray(yy * w + xx); n += 1; xx += 1 }
        yy += 1
      }
      feat(cell) = if (n == 0) 0.0f else (s / n / 255.0).toFloat
      cell += 1
    }
    Some((w, h, sr, sg, sb, feat))
  }

  /** Real audio decode via the JDK's `javax.sound.sampled`: parses the WAV
    * container + PCM format for REAL (sample rate, channel count, frame
    * count from the stream, samples from the data chunk — nothing comes
    * from caller metadata). Supports the synth corpus' shape (16-bit signed
    * little-endian PCM); other encodings return None (callers fall back to
    * the stub like any undecodable payload). Returns (sampleRate, nSamples,
    * sumAmplitude, block-mean waveform feature of `dim` floats in [0,1]). */
  private[ops] def decodeWav(bytes: Array[Byte], dim: Int): Option[(Int, Long, Long, Array[Float])] = {
    if (bytes == null) return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val ok = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian
      if (!ok) return None
      val data = ais.readAllBytes()
      val n = data.length / 2
      val samples = new Array[Int](n)
      var sum = 0L
      var i = 0
      while (i < n) {
        // little-endian signed 16-bit
        val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort.toInt
        samples(i) = s
        sum += s
        i += 1
      }
      val feat = new Array[Float](dim)
      if (n > 0) {
        var cell = 0
        while (cell < dim) {
          val i0 = (cell.toLong * n / dim).toInt
          val i1 = math.max(i0 + 1, (((cell + 1).toLong * n) / dim).toInt)
          var s = 0.0; var c = 0
          var j = i0
          while (j < i1 && j < n) { s += (samples(j) + 32768) / 65535.0; c += 1; j += 1 }
          feat(cell) = if (c == 0) 0.0f else (s / c).toFloat
          cell += 1
        }
      }
      Some((fmt.getSampleRate.toInt, n.toLong, sum, feat))
    } finally ais.close()
  }

  private def featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("sum_amp", LongType, nullable = true),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)
  ))

  /** Batched feature extraction: one partition = one decode batch (the Spark
    * executor keeps codec state warm across the iterator, exactly like a
    * pandas-batch UDF holds a model per batch). Image rows are decoded with
    * javax.imageio (real pixels), audio rows with javax.sound.sampled (real
    * WAV/PCM samples); video embeddings come from the labeled stub and have
    * null pixel/sample fields — as does any undecodable payload. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val bytesIdx = media.schema.fieldIndex("bytes")
    val idIdx = media.schema.fieldIndex("media_id")
    val modIdx = media.schema.fieldIndex("modality")
    media.mapPartitions { it =>
      // per-partition setup would open the video codec once here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        val modality = r.getString(modIdx)
        val nBytes = if (bytes == null) 0 else bytes.length
        val img = if (modality == "image") decodeImage(bytes, dim) else None
        val wav = if (modality == "audio") decodeWav(bytes, dim) else None
        (img, wav) match {
          case (Some((w, h, sr, sg, sb, feat)), _) =>
            Row(r.getLong(idIdx), modality, nBytes, w, h, sr, sg, sb, null, null, null, feat)
          case (_, Some((rate, n, sum, feat))) =>
            Row(r.getLong(idIdx), modality, nBytes, null, null, null, null, null, rate, n, sum, feat)
          case _ =>
            Row(r.getLong(idIdx), modality, nBytes, null, null, null, null, null, null, null, null, decodeStub(bytes, dim))
        }
      }
    }(Encoders.row(featureSchema))
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

  /** Deterministic real PNG for id: a (16 + id%17) x (16 + id%13) image whose
    * channels are x-gradients ((c0 + x) mod 256 with c0 = id*{7,11,13} mod
    * 256) — per-pixel varying, so a feature extractor must actually decode,
    * yet every pixel statistic is closed-form for the SQL oracle. */
  def synthPng(id: Long): Array[Byte] = {
    val w = 16 + math.floorMod(id, 17L).toInt
    val h = 16 + math.floorMod(id, 13L).toInt
    val r0 = math.floorMod(id * 7, 256L).toInt
    val g0 = math.floorMod(id * 11, 256L).toInt
    val b0 = math.floorMod(id * 13, 256L).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = (((r0 + x) % 256) << 16) | (((g0 + x) % 256) << 8) | ((b0 + x) % 256)
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic real WAV for id: mono 16-bit signed little-endian PCM at
    * 8 kHz, n = 256 + id%256 samples, sample[i] = ((id*7919 + i*2663) mod
    * 65536) - 32768 — per-sample varying, so a feature extractor must
    * actually parse the container and data chunk, yet every decoded
    * statistic is closed-form for the SQL oracle. The JDK's canonical WAVE
    * writer emits a 44-byte RIFF/fmt/data header, so the byte size is
    * 44 + 2n (pinned by the test suite). */
  def synthWav(id: Long): Array[Byte] = {
    val n = 256 + math.floorMod(id, 256L).toInt
    val data = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val s = (math.floorMod(id * 7919 + i.toLong * 2663, 65536L) - 32768L).toInt
      data(2 * i) = (s & 0xff).toByte // little-endian
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val baos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Test/bench helper: wrap any (doc_id, text) table as media rows — image
    * rows carry REAL PNG bytes ([[synthPng]]), audio rows REAL WAV bytes
    * ([[synthWav]]), video carries the UTF-8 text as its (stub-decoded)
    * payload. */
  def synthesize(documents: DataFrame): DataFrame = {
    val pngUdf = udf((id: Long) => synthPng(id))
    val wavUdf = udf((id: Long) => synthWav(id))
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("modality"),
      when(col("doc_id") % 3 === 0, pngUdf(col("doc_id")))
        .when(col("doc_id") % 3 === 1, wavUdf(col("doc_id")))
        .otherwise(encode(col("text"), "UTF-8")).as("bytes"),
      struct(
        when(col("doc_id") % 3 === 0, (lit(16) + col("doc_id") % 17).cast("int"))
          .otherwise(lit(640)).as("width"),
        when(col("doc_id") % 3 === 0, (lit(16) + col("doc_id") % 13).cast("int"))
          .otherwise(lit(480)).as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms"),
        when(col("doc_id") % 3 === 0, lit("png"))
          .when(col("doc_id") % 3 === 1, lit("wav"))
          .otherwise(lit("fake")).as("codec")
      ).as("meta")
    )
  }
}
