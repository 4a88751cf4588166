package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training pipelines.
  *
  * Media are opaque `BinaryType` payloads + a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run per-partition over batches so
  * a real decoder (JNI/FFI image lib) plugs in without changing the plan
  * shape. The decode kernels themselves are STUBS — deterministic fakes
  * clearly marked below, because no image/audio libraries exist in this
  * container — but the Spark-side plumbing (schema, partitioning, batch
  * iteration, null/error channels) is real and tested.
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

  /** ======== STUB ======== batch kernel: md5-seeded pseudo features. */
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
