package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, batch decode shape, frame explode. The
  * decode kernels are deterministic stubs (no media libs in-container) —
  * these tests pin the plan shape and the stub's reproducibility. */
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
}
