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
  * Kernel status: the IMAGE path is REAL — [[imageDecodeBatch]] and
  * [[resizeImageBatch]] decode/re-encode PNG/JPEG/BMP/GIF through the JDK's
  * own `javax.imageio` (no external libraries needed), with undecodable
  * payloads degrading to empty features instead of failing the job. The
  * AUDIO/VIDEO kernels remain deterministic STUBS (clearly marked below;
  * no codec libraries exist in this container), behind the same
  * [[mapPartitionsDecode]] batch hook a real FFI decoder would use.
  *
  * Scale notes: payload bytes never shuffle — all media operators are
  * per-row projections or mapPartitions; joins against media tables go
  * through `media_id` only. Feature vectors (small) flow into the ANN path.
  */
object Multimodal {

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
    val spark = df.sparkSession
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
    spark.createDataFrame(result.rdd, outSchema)
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
          var sr, sg, sb, sl, sl2 = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              val l = 0.299 * r + 0.587 * g + 0.114 * b
              sr += r; sg += g; sb += b; sl += l; sl2 += l * l
              x += 1
            }
            y += 1
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

  /** ======== STUB ======== batch kernel: md5-seeded pseudo features (the
    * AUDIO/VIDEO stand-in — see the image kernels above for the real
    * path). */
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

  /** Synthesize REAL image payloads from any (id) frame: one small solid
    * PNG per row (geometry/color derived from the id — deterministic),
    * encoded through the same JDK codec [[imageDecodeBatch]] decodes. The
    * end-to-end codec harness for the image pipeline where no binary
    * media column exists in the corpus. */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val ids = df.select(col(idCol).cast("long"))
    val result = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (id % 13 + 2).toInt
        val h = (id % 7 + 2).toInt
        val rgb = (id * 2654435761L & 0xffffffL).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray)
      }
    }(enc)
    spark.createDataFrame(result.rdd, outSchema)
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
