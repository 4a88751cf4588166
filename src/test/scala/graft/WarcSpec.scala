package graft

import graft.sources.Warc
import org.apache.spark.sql.functions.col

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-warc").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("round trip: parquet -> warc -> DataFrame is value-identical") {
    val docs = spark.read.parquet(sf("documents"))
    val path = tmpDir() + "/docs"
    Warc.write(docs, path, "doc_id", "text", nFiles = 4)
    val files = new java.io.File(path).listFiles.filter(_.getName.endsWith(".warc"))
    assert(files.length == 4, "one archive file per write task")
    val back = Warc.read(spark, path, docs.schema, "text").cache()
    assert(back.filter(col(Warc.CorruptCol).isNotNull).count() == 0)
    val clean = back.drop(Warc.CorruptCol)
    assert(clean.schema == docs.schema)
    assert(clean.exceptAll(docs).count() == 0 && docs.exceptAll(clean).count() == 0)
  }

  test("length-delimited framing survives header-lookalike payload bytes") {
    // payloads that embed the record marker, header syntax, CRLFs, base64
    // padding chars, unicode — a delimiter-scan parser dies on these
    val hostile = Seq(
      (1L, "WARC/1.0\r\nContent-Length: 9999\r\n\r\nfake record"),
      (2L, "crlf\r\nand bare\nnewlines"),
      (3L, ""), // empty payload: Content-Length 0
      (4L, "unicode: 首尔 émoji ✓ ölçü"),
      (5L, "WARC-Graft-Col-id: aGk=")).toDF("id", "text")
    val path = tmpDir() + "/hostile"
    Warc.write(hostile, path, "id", "text", nFiles = 2)
    val back = Warc.read(spark, path, hostile.schema, "text")
      .filter(col(Warc.CorruptCol).isNull).drop(Warc.CorruptCol)
    assert(back.exceptAll(hostile).count() == 0 &&
      hostile.exceptAll(back).count() == 0)
  }

  test("null metadata round-trips as null; text must be non-null") {
    val withNull = Seq((1L, Some("src"), "a"), (2L, None, "b"))
      .toDF("id", "source", "text")
    val path = tmpDir() + "/nulls"
    Warc.write(withNull, path, "id", "text", nFiles = 1)
    val back = Warc.read(spark, path, withNull.schema, "text")
      .drop(Warc.CorruptCol)
    assert(back.exceptAll(withNull).count() == 0 &&
      withNull.exceptAll(back).count() == 0)
    val nullText = Seq((1L, null: String)).toDF("id", "text")
    intercept[org.apache.spark.SparkException] {
      Warc.write(nullText, tmpDir() + "/bad", "id", "text", nFiles = 1)
    }
  }

  test("malformed region quarantines the remainder, keeps prior records") {
    val path = tmpDir() + "/corrupt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    val good = "WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Graft-Col-id: " +
      java.util.Base64.getEncoder.encodeToString("7".getBytes("UTF-8")) +
      "\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    // second record claims more payload than the file holds
    val truncated = "WARC/1.0\r\nWARC-Graft-Col-id: " +
      java.util.Base64.getEncoder.encodeToString("8".getBytes("UTF-8")) +
      "\r\nContent-Length: 99999\r\n\r\nshort"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "part-00000.warc"),
      (good + truncated).getBytes("UTF-8"))
    val schema = Seq((0L, "")).toDF("id", "text").schema
    val r = Warc.read(spark, path, schema, "text").cache()
    val clean = r.filter(col(Warc.CorruptCol).isNull)
    assert(clean.select("id", "text").as[(Long, String)].collect()
      .toSeq == Seq((7L, "hello")))
    // the undecodable remainder lands in ONE quarantine row, not dropped
    assert(r.filter(col(Warc.CorruptCol).isNotNull).count() == 1)
  }

  test("read parallelism is per archive file") {
    val docs = spark.read.parquet(sf("documents"))
    val path = tmpDir() + "/par"
    Warc.write(docs, path, "doc_id", "text", nFiles = 3)
    val parts = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc").load(path)
      .rdd.getNumPartitions
    assert(parts >= 1) // binaryFile may pack small files; the UNIT is files
    // per-file independence: one file alone parses to a strict subset
    val one = new java.io.File(path).listFiles
      .filter(_.getName.endsWith(".warc")).minBy(_.getName)
    val soloDir = tmpDir() + "/solo"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(soloDir))
    java.nio.file.Files.copy(one.toPath,
      java.nio.file.Paths.get(soloDir, one.getName))
    val single = Warc.read(spark, soloDir, docs.schema, "text")
      .filter(col(Warc.CorruptCol).isNull).drop(Warc.CorruptCol)
    val n = single.count()
    assert(n > 0 && n < docs.count())
    assert(single.exceptAll(docs).count() == 0, "subset of the original rows")
  }
}
