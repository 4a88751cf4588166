package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training pipelines.
  *
  * Media are opaque `BinaryType` payloads + a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run per-partition over batches so
  * a real decoder plugs in without changing the plan shape.
  *
  * Kernel status: all three modality paths are REAL, on JDK-shipped codecs
  * (no external libraries needed). IMAGE — [[imageDecodeBatch]] /
  * [[resizeImageBatch]] decode/re-encode PNG/JPEG/BMP/GIF via
  * `javax.imageio`. AUDIO — [[audioDecodeBatch]] decodes RIFF/WAVE PCM via
  * `javax.sound.sampled` and computes signal stats over the samples.
  * VIDEO — [[extractFrames]] demuxes the animated-GIF container (the one
  * multi-frame format with an in-JDK codec; MP4/H.264 would need external
  * codec libs and plugs into the same per-partition hook). Undecodable
  * payloads degrade to empty features / zero rows instead of failing the
  * job. [[stubDecodeBatch]] remains as the pluggable-kernel default whose
  * md5 math is SQL-expressible for the exact-oracle path.
  *
  * Scale notes: payload bytes never shuffle — all media operators are
  * per-row projections or mapPartitions; joins against media tables go
  * through `media_id` only. Feature vectors (small) flow into the ANN path.
  */
object Multimodal {

  // ImageIO's default stream cache spools every decode/encode through a
  // TEMP FILE (FileCacheImageInputStream) — one disk round trip per
  // image. All payloads here are in-memory byte arrays; the heap cache
  // is strictly better. Executor-side object init runs this once per JVM.
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata carried next to the opaque payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType),
    StructField("meta", MetaType)))

  /** ======== STUB ========
    * Deterministic fake "decode → feature vector": features derive from the
    * md5 of the payload so they are reproducible and SQL-expressible. A real
    * deployment replaces this expression with a decoder invoked in
    * [[mapPartitionsDecode]]. */
  def pseudoFeatures(payload: Column, dims: Int): Column =
    array((0 until dims).map { i =>
      (Dedup.stableHash(concat(payload.cast("string"), lit(s":$i")))
        % Dedup.MinhashPrime).cast("double") / lit(Dedup.MinhashPrime.toDouble)
    }: _*)

  /** ======== STUB ========
    * Fake resize: emits the target geometry in metadata and truncates the
    * payload proportionally (a real kernel rewrites pixels). Plan shape —
    * projection over (payload, meta) — is what production code uses. */
  def resizeStub(payload: Column, meta: Column, w: Int, h: Int): Column =
    struct(
      substring(payload, 1, 256).as("payload"), // ??? real: decoded+resized bytes
      meta.withField("width", lit(w)).withField("height", lit(h)).as("meta"))

  /** Frame sampling for video: every `everyMs` milliseconds of duration
    * yields one (media_id, frame_idx, t_ms) row — the explode is real; the
    * frame payload extraction is the stubbed part. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("modality") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L),
          greatest(coalesce(col("meta.duration_ms"), lit(0L)) - 1, lit(0L)),
          lit(everyMs))).as("t_ms"))
      .withColumn("frame_idx", (col("t_ms") / everyMs).cast("int"))

  /** Per-partition decode hook: iterates rows in partition-sized batches,
    * calling `decodeBatch` (the pluggable kernel) — this is the Scala
    * analogue of `mapInPandas` with an Arrow batch. The default kernel is
    * the deterministic stub above. */
  def mapPartitionsDecode(
      df: DataFrame,
      dims: Int,
      batchSize: Int = 64,
      decodeBatch: Seq[Array[Byte]] => Seq[Array[Double]] = stubDecodeBatch)
      : DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    val dimsB = dims
    val result = df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = decodeBatch(batch.map(r =>
          Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)))
        batch.zip(feats).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f.take(dimsB).toSeq)
        }
      }
    }(enc)
    result.toDF()
  }

  /** REAL image kernel (JDK `javax.imageio` — PNG/JPEG/BMP/GIF decode
    * ships in the Java runtime): per payload, decode and emit an 8-dim
    * feature vector [width, height, components, mean R, mean G, mean B,
    * mean luma, luma variance]. Undecodable or empty payloads yield an
    * EMPTY feature array — a poisoned image must degrade that row, never
    * fail the 100 TB job. Plug into [[mapPartitionsDecode]]. */
  def imageDecodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Double]] =
    payloads.map { bytes =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) Array.empty[Double]
        else {
          val w = img.getWidth
          val h = img.getHeight
          // bulk getRGB into one int array: the per-pixel getRGB(x,y) path
          // re-resolves the color model per call — the bulk read is the
          // same conversion vectorized over the raster
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sr, sg, sb, sl, sl2 = 0.0
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            val l = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sl += l; sl2 += l * l
            i += 1
          }
          val n = (w.toLong * h).toDouble
          Array(w.toDouble, h.toDouble,
            img.getColorModel.getNumComponents.toDouble,
            sr / n, sg / n, sb / n, sl / n, sl2 / n - (sl / n) * (sl / n))
        }
      } catch { case _: Exception => Array.empty[Double] }
    }

  /** REAL image resize kernel (JDK `Graphics2D` bilinear scale +
    * `ImageIO.write` PNG re-encode): payload in → resized PNG payload out;
    * undecodable payloads pass through as null. The batch analogue of
    * [[resizeStub]] for rows whose modality is actually decodable. */
  def resizeImageBatch(w: Int, h: Int)(payloads: Seq[Array[Byte]]): Seq[Option[Array[Byte]]] =
    payloads.map { bytes =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, w, h, null)
          g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case _: Exception => None }
    }

  /** REAL audio kernel (JDK `javax.sound.sampled` — the WAV/PCM codec
    * ships in the Java runtime): per payload, decode the RIFF/WAVE
    * container and emit an 8-dim feature vector [sample_rate, channels,
    * n_frames, duration_ms, mean, rms, peak, zero-crossing count] over the
    * 16-bit PCM samples (first channel). Undecodable or empty payloads
    * yield an EMPTY feature array — a poisoned clip degrades that row,
    * never fails the 100 TB job. Plug into [[mapPartitionsDecode]]. */
  def audioDecodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Double]] =
    payloads.map { bytes =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val chans = fmt.getChannels
          val bytesPerFrame = fmt.getFrameSize
          val data = in.readAllBytes()
          val nFrames = if (bytesPerFrame > 0) data.length / bytesPerFrame else 0
          if (nFrames == 0 || fmt.getSampleSizeInBits != 16) Array.empty[Double]
          else {
            val bb = java.nio.ByteBuffer.wrap(data).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            var sum, sumSq = 0.0
            var peak = 0.0
            var zc = 0
            var prev = 0
            var i = 0
            while (i < nFrames) {
              val s = bb.getShort(i * bytesPerFrame).toInt // first channel
              sum += s; sumSq += s.toDouble * s
              val a = math.abs(s.toDouble); if (a > peak) peak = a
              if (i > 0 && ((s >= 0) != (prev >= 0))) zc += 1
              prev = s
              i += 1
            }
            val sr = fmt.getSampleRate.toDouble
            Array(sr, chans.toDouble, nFrames.toDouble,
              math.round(nFrames * 1000.0 / sr).toDouble,
              sum / nFrames, math.sqrt(sumSq / nFrames), peak, zc.toDouble)
          }
        } finally in.close()
      } catch { case _: Exception => Array.empty[Double] }
    }

  /** Synthesize REAL audio payloads from any (id) frame: one short 16-bit
    * PCM mono WAV per row (frequency / amplitude / length derived from the
    * id — deterministic), encoded through the same JDK codec
    * [[audioDecodeBatch]] decodes. PCM16 round-trips exactly, so the
    * decoded sample stream equals the synthesized one bit-for-bit. */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame =
    synthPayloads(df, idCol)(synthWavBytes)

  /** Shared synthesis scaffold: one (media_id, payload) row per id, bytes
    * from `bytesFor` — the three per-modality generators differ only in
    * the JDK codec they encode through.
    *
    * The id frame is repartitioned to the session's default parallelism
    * BEFORE synthesis: the corpus tables are single parquet files, so
    * without it the whole synthesize→encode→decode chain (mapPartitions
    * all the way down) runs in ONE task — measured 45 s single-threaded
    * vs ~2 s spread over local[32] for the resize round trip at sf0.1.
    * Only the narrow id column shuffles; payload bytes are created after
    * the exchange and never move. A real media table read from parquet
    * splits by file bytes instead and skips this. */
  private def synthPayloads(df: DataFrame, idCol: String)(
      bytesFor: Long => Array[Byte]): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val result = df.select(col(idCol).cast("long"))
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          Row(id, bytesFor(id))
        }
      }(enc)
    result.toDF()
  }

  /** One deterministic sine-burst WAV (8 kHz, mono, 16-bit PCM): freq
    * 200–1300 Hz, amplitude and frame count derived from the id. Shared by
    * [[syntheticAudio]] and the spec that pins [[audioDecodeBatch]]'s
    * features against the known sample stream. */
  def synthWavBytes(id: Long): Array[Byte] = {
    val sr = 8000f
    val freq = 200.0 + (id % 23) * 50.0
    val amp = 0.2 + (id % 5) * 0.15
    val nFrames = (160 + (id % 11) * 40).toInt
    val samples = new Array[Byte](nFrames * 2)
    val bb = java.nio.ByteBuffer.wrap(samples).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nFrames) {
      val v = math.round(amp * 32767.0 * math.sin(2.0 * math.Pi * freq * i / sr)).toShort
      bb.putShort(i * 2, v)
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Whole-table resize through [[resizeImageBatch]]: (media_id, payload)
    * in → (media_id, payload) out with each payload decoded, bilinear-
    * scaled to w×h and PNG re-encoded per partition-sized batch;
    * undecodable payloads come back as NULL payloads (degrade, don't
    * fail). Same shape as [[mapPartitionsDecode]] — payload bytes never
    * shuffle. */
  def resizeImages(
      df: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val result = df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val out = resizeImageBatch(w, h)(batch.map(r =>
          Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)))
        batch.zip(out).map { case (r, p) => Row(r.getLong(idIdx), p.orNull) }
      }
    }(enc)
    result.toDF()
  }

  /** ======== STUB ======== batch kernel: md5-seeded pseudo features (kept
    * as the pluggable-kernel default and the SQL-expressible oracle path —
    * see the image/audio/video kernels above/below for the real paths). */
  def stubDecodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Double]] =
    payloads.map { bytes =>
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(bytes)
      Array.tabulate(8) { i =>
        val h = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils
            .md5Hex(hex + ":" + i).substring(0, 15), 16)
        (h % Dedup.MinhashPrime).toDouble / Dedup.MinhashPrime.toDouble
      }
    }

  /** REAL video-container frame extraction (JDK `ImageIO` GIF sequence
    * reader — animated GIF is the one multi-frame container with a codec
    * in the Java runtime; MP4/H.264 demux needs external codec libraries
    * this container doesn't have, and would plug into the same hook): per
    * media row, decode every frame of the animated payload and emit one
    * (media_id, frame_idx, n_frames, width, height, mean_r, mean_g,
    * mean_b) row. Runs per-partition; undecodable payloads yield zero
    * rows instead of failing the job. The row explosion happens AFTER
    * decode, so payload bytes still never shuffle. */
  def extractFrames(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex("media_id")
    val payloadIdx = df.schema.fieldIndex("payload")
    val result = df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = Option(r.getAs[Array[Byte]](payloadIdx)).getOrElse(Array.emptyByteArray)
        try {
          // memory-backed stream: the payload is already in RAM — the
          // ImageIO.createImageInputStream default (useCache=true) would
          // spool every payload to a disk temp file in the decode hot path
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Seq.empty
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val n = reader.getNumImages(true)
                (0 until n).map { fi =>
                  val img = reader.read(fi)
                  val w = img.getWidth
                  val h = img.getHeight
                  // bulk raster read — see imageDecodeBatch
                  val px = img.getRGB(0, 0, w, h, null, 0, w)
                  var sr, sg, sb = 0.0
                  var i = 0
                  while (i < px.length) {
                    val rgb = px(i)
                    sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                    i += 1
                  }
                  val np = (w.toLong * h).toDouble
                  Row(id, fi, n, w, h, sr / np, sg / np, sb / np)
                }
              } finally reader.dispose()
            }
          } finally iis.close()
        } catch { case _: Exception => Seq.empty }
      }
    }(enc)
    result.toDF()
  }

  /** Synthesize REAL multi-frame video payloads from any (id) frame: one
    * small animated GIF per row (2–6 solid-color frames; geometry and
    * per-frame palette derived from the id — deterministic), written
    * through the JDK's own GIF sequence writer. Frames use an explicit
    * `IndexColorModel`, so the palette — and therefore the decoded pixel
    * values — round-trip exactly. */
  def syntheticVideos(df: DataFrame, idCol: String): DataFrame =
    synthPayloads(df, idCol)(synthGifBytes)

  /** Deterministic frame color for video `id`, frame `fi` (24-bit RGB). */
  def synthFrameColor(id: Long, fi: Int): Int =
    (((id * 31 + fi) * 2654435761L) & 0xffffffL).toInt

  /** One deterministic animated GIF: (id%5)+2 solid frames of
    * (id%6+2)×(id%4+2) px, each frame's color from [[synthFrameColor]].
    * Shared by [[syntheticVideos]] and the spec pinning [[extractFrames]]. */
  def synthGifBytes(id: Long): Array[Byte] = {
    val w = (id % 6 + 2).toInt
    val h = (id % 4 + 2).toInt
    val nFrames = (id % 5 + 2).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var fi = 0
      while (fi < nFrames) {
        val c = synthFrameColor(id, fi)
        val cm = new java.awt.image.IndexColorModel(8, 1,
          Array(((c >> 16) & 0xff).toByte), Array(((c >> 8) & 0xff).toByte),
          Array((c & 0xff).toByte))
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        // raster is all zero = palette slot 0 = the frame color; no fill needed
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        fi += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Synthesize REAL image payloads from any (id) frame: one small solid
    * PNG per row (geometry/color derived from the id — deterministic),
    * encoded through the same JDK codec [[imageDecodeBatch]] decodes. The
    * end-to-end codec harness for the image pipeline where no binary
    * media column exists in the corpus. */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame =
    synthPayloads(df, idCol)(synthPngBytes)

  /** One deterministic solid PNG: (id%13+2)×(id%7+2) px, color from a
    * Knuth-hash of the id. Shared by [[syntheticImages]] and the specs. */
  def synthPngBytes(id: Long): Array[Byte] = {
    val w = (id % 13 + 2).toInt
    val h = (id % 7 + 2).toInt
    val rgb = (id * 2654435761L & 0xffffffL).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a media table from any (id, text) corpus — the test harness
    * for the plumbing (payload = utf8 bytes, metadata derived from length). */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("synthetic").as("format"),
        length(col(textCol)).cast("int").as("width"),
        lit(1).as("height"),
        lit(3).as("channels"),
        lit(16000).as("sample_rate"),
        (length(col(textCol)).cast("long") * 10).as("duration_ms")).as("meta"))
}
