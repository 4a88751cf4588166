package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing and kernels: schema, batch decode shape, frame
  * explode, and the REAL JDK-codec paths (ImageIO images, javax.sound WAV
  * audio, animated-GIF video demux) pinned against known pixel/sample
  * streams. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(
    Seq((0L, "hello world"), (1L, "a longer audio-ish payload"), (2L, "video bytes here"))
      .toDF("doc_id", "text"), "doc_id", "text")

  test("synthetic media matches the canonical schema") {
    assert(media.schema.simpleString == Multimodal.MediaSchema.simpleString)
    assert(media.select("modality").distinct().count() == 3)
  }

  test("pseudo features: deterministic, unit-range, dims respected") {
    val f = media.select(col("media_id"),
      Multimodal.pseudoFeatures(col("payload"), 8).as("features"))
    val rows = f.as[(Long, Seq[Double])].collect().toMap
    assert(rows.values.forall(v => v.length == 8 && v.forall(x => x >= 0 && x < 1)))
    val again = f.as[(Long, Seq[Double])].collect().toMap
    assert(rows == again)
  }

  test("mapPartitions decode: batch kernel runs, features appended") {
    val out = Multimodal.mapPartitionsDecode(media, dims = 8, batchSize = 2)
    assert(out.schema.fieldNames.contains("features"))
    val feats = out.select("media_id", "features").as[(Long, Seq[Double])]
      .collect().toMap
    assert(feats.size == 3 && feats.values.forall(_.length == 8))
    // kernel is deterministic: same features across runs
    val feats2 = Multimodal.mapPartitionsDecode(media, dims = 8, batchSize = 64)
      .select("media_id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(feats == feats2)
  }

  test("frame sampling explodes duration into frame rows (videos only)") {
    val frames = Multimodal.sampleFrames(media, everyMs = 50)
    val byId = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    // only media_id 2 is video ((2 % 3)+1 = index 3 = "video")
    assert(byId.keySet == Set(2L))
    val durations = media.filter(col("media_id") === 2L)
      .select("meta.duration_ms").as[Long].head()
    assert(byId(2L) == (durations - 1) / 50 + 1)
  }

  test("resize stub rewrites geometry metadata") {
    val resized = media.select(
      Multimodal.resizeStub(col("payload"), col("meta"), 224, 224).as("r"))
    val m = resized.select("r.meta.width", "r.meta.height")
      .as[(Int, Int)].collect()
    assert(m.forall(_ == ((224, 224))))
  }

  // real PNG bytes, generated in-test through the same JDK codec the
  // kernel decodes with — no fixtures, fully deterministic
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("REAL image decode: exact geometry + channel means via JDK ImageIO") {
    val rows = Seq(
      (1L, pngBytes(10, 8, 0xff0000)), // solid red
      (2L, pngBytes(4, 4, 0x0080ff)), // solid (0,128,255)
      (3L, "not an image at all".getBytes("UTF-8")), // poisoned payload
      (4L, Array.emptyByteArray))
      .toDF("media_id", "payload")
    val out = Multimodal.mapPartitionsDecode(rows, dims = 8, batchSize = 2,
        decodeBatch = Multimodal.imageDecodeBatch)
      .select("media_id", "features").as[(Long, Seq[Double])].collect().toMap
    // solid red 10x8: [w, h, comps, rMean, gMean, bMean, luma, lumaVar≈0]
    assert(out(1L).take(6) == Seq(10.0, 8.0, 3.0, 255.0, 0.0, 0.0))
    assert(math.abs(out(1L)(6) - 0.299 * 255) < 1e-9)
    assert(math.abs(out(1L)(7)) < 1e-6) // solid color ⇒ ~zero variance (fp sum)
    assert(out(2L).take(6) == Seq(4.0, 4.0, 3.0, 0.0, 128.0, 255.0))
    assert(math.abs(out(2L)(7)) < 1e-6)
    // poisoned rows degrade to empty features, never a job failure
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("REAL audio decode: WAV round trip recovers the exact sample stream stats") {
    val id = 7L // freq 550 Hz, amp 0.5, 440 frames
    val rows = Seq(
      (id, Multimodal.synthWavBytes(id)),
      (99L, "not audio".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.mapPartitionsDecode(rows, dims = 8, batchSize = 2,
        decodeBatch = Multimodal.audioDecodeBatch)
      .select("media_id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(out(99L).isEmpty) // poisoned payload degrades, never fails
    val f = out(id)
    // recompute expected stats from the same deterministic synth formula:
    // PCM16 round-trips bit-for-bit, so equality is exact
    val freq = 200.0 + (id % 23) * 50.0
    val amp = 0.2 + (id % 5) * 0.15
    val n = (160 + (id % 11) * 40).toInt
    val samples = Array.tabulate(n)(i =>
      math.round(amp * 32767.0 * math.sin(2.0 * math.Pi * freq * i / 8000.0)).toInt)
    val rms = math.sqrt(samples.map(s => s.toDouble * s).sum / n)
    val zc = (1 until n).count(i => (samples(i) >= 0) != (samples(i - 1) >= 0))
    assert(f(0) == 8000.0 && f(1) == 1.0 && f(2) == n.toDouble)
    assert(f(3) == math.round(n * 1000.0 / 8000.0).toDouble)
    assert(f(4) == samples.map(_.toDouble).sum / n)
    assert(f(5) == rms)
    assert(f(6) == samples.map(s => math.abs(s.toDouble)).max)
    assert(f(7) == zc.toDouble)
  }

  test("REAL video demux: animated GIF frames recover exact palette colors") {
    val id = 9L // 5x3 px, (9%5)+2 = 6 frames
    val rows = Seq(
      (id, Multimodal.synthGifBytes(id)),
      (98L, "not a gif".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.extractFrames(rows)
      .orderBy("media_id", "frame_idx").collect()
    assert(out.forall(_.getLong(0) == id)) // poisoned row yields zero rows
    assert(out.length == 6)
    out.zipWithIndex.foreach { case (r, fi) =>
      assert(r.getInt(1) == fi && r.getInt(2) == 6)
      assert(r.getInt(3) == (id % 6 + 2).toInt && r.getInt(4) == (id % 4 + 2).toInt)
      val c = Multimodal.synthFrameColor(id, fi)
      // solid indexed frame: mean == the exact palette entry per channel
      assert(r.getDouble(5) == ((c >> 16) & 0xff).toDouble)
      assert(r.getDouble(6) == ((c >> 8) & 0xff).toDouble)
      assert(r.getDouble(7) == (c & 0xff).toDouble)
    }
  }

  test("codec round trips hold across the id parameter space (sweep 0..24)") {
    (0L to 24L).foreach { id =>
      // video: frame count, geometry, exact per-frame palette colors
      val frames = Multimodal.extractFrames(
        Seq((id, Multimodal.synthGifBytes(id))).toDF("media_id", "payload"))
        .orderBy("frame_idx").collect()
      assert(frames.length == (id % 5 + 2).toInt, s"id=$id frame count")
      frames.zipWithIndex.foreach { case (r, fi) =>
        val c = Multimodal.synthFrameColor(id, fi)
        assert(r.getInt(3) == (id % 6 + 2).toInt && r.getInt(4) == (id % 4 + 2).toInt)
        assert(r.getDouble(5) == ((c >> 16) & 0xff).toDouble, s"id=$id f=$fi r")
      }
      // audio: container fields recover the synth parameters exactly
      val af = Multimodal.audioDecodeBatch(Seq(Multimodal.synthWavBytes(id))).head
      assert(af(0) == 8000.0 && af(1) == 1.0, s"id=$id audio format")
      assert(af(2) == (160 + (id % 11) * 40).toDouble, s"id=$id audio frames")
      // image: decoded geometry + solid color means match the id formula
      val imf = Multimodal.imageDecodeBatch(Seq(Multimodal.synthPngBytes(id))).head
      val rgb = (id * 2654435761L & 0xffffffL).toInt
      assert(imf(0) == (id % 13 + 2).toDouble && imf(1) == (id % 7 + 2).toDouble)
      assert(imf(3) == ((rgb >> 16) & 0xff).toDouble &&
        imf(4) == ((rgb >> 8) & 0xff).toDouble &&
        imf(5) == (rgb & 0xff).toDouble, s"id=$id image color")
    }
  }

  test("poisoned payloads survive the driver-surface projection under ANSI") {
    // the image/audio feature queries project positions out of `features`;
    // a degraded row's EMPTY array must yield nulls (try_element_at), not
    // an ANSI INVALID_ARRAY_INDEX job failure
    val rows = Seq((1L, "garbage, not media".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.mapPartitionsDecode(rows, dims = 8,
        decodeBatch = Multimodal.imageDecodeBatch)
      .select(col("media_id"),
        try_element_at(col("features"), lit(1)).cast("int").as("width"))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(1))
  }

  test("golden-bytes fixtures: checked-in PNG/WAV/GIF vs hand-computed features") {
    // The codec-round-trip specs encode AND decode with the running JDK, so
    // a JDK behavior change would shift both sides and pass silently. These
    // payloads are CHECKED-IN byte literals (PNG/GIF authored once; WAV
    // hand-written byte-for-byte) and every expectation is computed from
    // the pixel/sample DEFINITION, never from running a codec.

    // -- PNG: 2x2, row-major pixels red, green, blue, white
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAIAAAACCAIAAAD91JpzAAAAEklEQVR4XmP4z8DAAMIM" +
        "/4EAAB/uBfs4L1ZQAAAAAElFTkSuQmCC")
    val pf = Multimodal.imageDecodeBatch(Seq(png)).head
    // hand model: same per-pixel luma formula, same summation order
    val pixels = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255))
    var sr, sg, sb, sl, sl2 = 0.0
    pixels.foreach { case (r, g, b) =>
      val l = 0.299 * r + 0.587 * g + 0.114 * b
      sr += r; sg += g; sb += b; sl += l; sl2 += l * l
    }
    val expected = Array(2.0, 2.0, 3.0, sr / 4, sg / 4, sb / 4, sl / 4,
      sl2 / 4 - (sl / 4) * (sl / 4))
    assert(pf.toSeq == expected.toSeq, s"png features ${pf.toSeq}")

    // -- WAV: RIFF/PCM16 mono 8 kHz, 4 samples, header written by hand
    val samples = Seq[Short](1000, -1000, 2000, -32768)
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * samples.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000) // rate, byte rate
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(2 * samples.length)
    samples.foreach(bb.putShort)
    val af = Multimodal.audioDecodeBatch(Seq(bb.array())).head
    val mean = samples.map(_.toDouble).sum / 4
    val rms = math.sqrt(samples.map(s => s.toDouble * s).sum / 4)
    // signs +,-,+,- => 3 zero crossings; |−32768| is the peak
    assert(af.toSeq == Seq(8000.0, 1.0, 4.0, 1.0, mean, rms, 32768.0, 3.0),
      s"wav features ${af.toSeq}")

    // -- animated GIF: 3x2, frame 0 solid red, frame 1 solid blue
    val gif = java.util.Base64.getDecoder.decode(
      "R0lGODlhAwACAPAAAP8AAP8AACH5BAAAAAAALAAAAAADAAIAQAgGAAEIHBgQACH5BAAA" +
        "AAAALAAAAAADAAIAwAAA/wAA/wgGAAEIHBgQADs=")
    val frames = Multimodal.extractFrames(
        Seq((7L, gif)).toDF("media_id", "payload"))
      .orderBy("frame_idx").collect()
    assert(frames.length == 2)
    assert(frames.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
      r.getInt(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSeq == Seq(
      (7L, 0, 2, 3, 2, 255.0, 0.0, 0.0),
      (7L, 1, 2, 3, 2, 0.0, 0.0, 255.0)))
  }

  test("REAL image resize: payload re-encodes at the target geometry") {
    val resized = Multimodal.resizeImageBatch(5, 3)(
      Seq(pngBytes(10, 8, 0x00ff00), "garbage".getBytes("UTF-8")))
    assert(resized(1).isEmpty) // undecodable passes through as None
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(0).get))
    assert(back.getWidth == 5 && back.getHeight == 3)
    // bilinear scale of a solid color stays that color
    assert((back.getRGB(2, 1) & 0xffffff) == 0x00ff00)
  }
}
