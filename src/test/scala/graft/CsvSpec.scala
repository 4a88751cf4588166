package graft

import graft.sources.Csv
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class CsvSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-csv").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("round trip: parquet -> csv -> DataFrame is value-identical") {
    val docs = spark.read.parquet(sf("documents"))
    val path = tmpDir() + "/docs"
    Csv.write(docs, path)
    val back = Csv.read(spark, path, docs.schema).cache()
    assert(back.filter(col(Csv.CorruptCol).isNotNull).count() == 0)
    val clean = back.drop(Csv.CorruptCol)
    assert(clean.schema == docs.schema)
    assert(clean.exceptAll(docs).count() == 0 && docs.exceptAll(clean).count() == 0)
  }

  test("hostile cells: delimiters, quotes, newlines, null-vs-empty") {
    val hostile = Seq(
      (1L, Some("a,b,\"c\"")),          // embedded delimiter + quotes
      (2L, Some("line\nbreak\r\nCRLF")), // multiline cell
      (3L, Some("")),                    // EMPTY string (must stay "")
      (4L, None: Option[String]),        // NULL (must stay null)
      (5L, Some("\\backslash\\ and \ttab"))
    ).toDF("id", "text")
    val path = tmpDir() + "/hostile"
    Csv.write(hostile, path)
    val back = Csv.read(spark, path, hostile.schema).drop(Csv.CorruptCol)
    assert(back.exceptAll(hostile).count() == 0 &&
      hostile.exceptAll(back).count() == 0)
    // the classic CSV ambiguity pinned explicitly
    val byId = back.collect().map(r => r.getLong(0) ->
      Option(r.getString(1))).toMap
    assert(byId(3L) == Some("") && byId(4L) == None)
  }

  test("schema contract: corrupt lines quarantined, not job-failed") {
    val path = tmpDir() + "/mixed"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "part-0.csv"),
      ("\"id\",\"text\"\n" +
        "\"1\",\"good\"\n" +
        "\"not-a-number\",\"type poison\"\n" +
        "\"4\",\"also good\"\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val r = Csv.read(spark, path, schema).cache()
    assert(r.filter(col(Csv.CorruptCol).isNull).count() == 2)
    assert(r.filter(col(Csv.CorruptCol).isNotNull).count() == 1)
  }
}
