package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-jsonl").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("round trip: parquet -> jsonl -> DataFrame is value-identical") {
    val docs = spark.read.parquet(sf("documents"))
    val path = tmpDir() + "/docs"
    Jsonl.write(docs, path)
    // cached: Spark disallows queries whose referenced columns are only
    // the corrupt-record column (see Jsonl.read scaladoc)
    val back = Jsonl.read(spark, path, docs.schema).cache()
    assert(back.filter(col(Jsonl.CorruptCol).isNotNull).count() == 0)
    val clean = back.drop(Jsonl.CorruptCol)
    assert(clean.schema == docs.schema)
    assert(clean.exceptAll(docs).count() == 0 && docs.exceptAll(clean).count() == 0)
    // JSON escaping survives hostile text: quotes, backslashes, newlines,
    // tabs, unicode, empty string
    val hostile = Seq(
      (1L, "plain"), (2L, "with \"quotes\" and \\backslash\\"),
      (3L, "line\nbreak\tand tab"), (4L, "unicode: 首尔 ölçü İI émoji é"),
      (5L, "")).toDF("id", "text")
    val p2 = tmpDir() + "/hostile"
    Jsonl.write(hostile, p2)
    val h = Jsonl.read(spark, p2, hostile.schema).drop(Jsonl.CorruptCol)
    assert(h.exceptAll(hostile).count() == 0 && hostile.exceptAll(h).count() == 0)
  }

  test("schema contract: no inference, corrupt lines quarantined not job-failed") {
    val path = tmpDir() + "/mixed"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "part-0.json"),
      ("""{"id": 1, "text": "good"}""" + "\n" +
        """{"id": "not-a-number", "text": "type poison"}""" + "\n" +
        """not json at all""" + "\n" +
        """{"id": 4, "text": "also good", "extra": "ignored"}""" + "\n")
        .getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val r = Jsonl.read(spark, path, schema).cache()
    val good = r.filter(col(Jsonl.CorruptCol).isNull)
      .select("id", "text").as[(Long, String)].collect().toSet
    // the declared-schema rows parse; extra fields are ignored, not widened
    assert(good == Set((1L, "good"), (4L, "also good")))
    // poisoned lines land in quarantine with the raw line preserved
    val bad = r.filter(col(Jsonl.CorruptCol).isNotNull)
      .select(Jsonl.CorruptCol).as[String].collect().toSet
    assert(bad.exists(_.contains("not-a-number")) && bad.contains("not json at all"))
    // strict mode fails instead
    intercept[Exception] {
      Jsonl.readStrict(spark, path, schema).collect()
    }
    // a schema already claiming the quarantine column is rejected loudly
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, path, schema.add(StructField(Jsonl.CorruptCol, StringType)))
    }
  }

  test("build-once materialization: second call reuses, fingerprint change rebuilds") {
    val src = spark.read.parquet(sf("documents"))
    val path = tmpDir() + "/cached"
    val before = graft.sources.IndexStorage.rebuilds.get()
    val a = Jsonl.materializeCached(spark, sf("documents"), path, src.schema)(src)
    assert(graft.sources.IndexStorage.rebuilds.get() == before + 1)
    assert(a.count() == src.count())
    val b = Jsonl.materializeCached(spark, sf("documents"), path, src.schema)(src)
    assert(graft.sources.IndexStorage.rebuilds.get() == before + 1) // reused
    assert(b.count() == src.count())
  }

  test("compressed sink: gzip files round-trip") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val path = tmpDir() + "/gz"
    Jsonl.write(df, path, compression = "gzip")
    assert(new java.io.File(path).listFiles.exists(_.getName.endsWith(".json.gz")))
    val back = Jsonl.read(spark, path, df.schema).drop(Jsonl.CorruptCol)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }
}
