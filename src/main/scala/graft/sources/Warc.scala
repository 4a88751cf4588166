package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** WARC-style archive source/sink — the container format web-crawl corpora
  * arrive in (Common Crawl ships ~90k WARC files per monthly snapshot; the
  * crawl-ingest half of an LLM data pipeline starts by fanning those files
  * across the cluster, one task per file, exactly as here).
  *
  * Format (ISO 28500 framing, reduced to what a corpus archive needs):
  * each record is `WARC/1.0` + CRLF header lines + blank line + exactly
  * `Content-Length` payload bytes + CRLF CRLF. Payloads are parsed BY
  * LENGTH, never by delimiter scan, so a document whose text embeds
  * `WARC/1.0` (or any header bytes) round-trips exactly — the property a
  * delimiter-split parser silently loses. Row metadata (ids, language,
  * source labels) rides as `WARC-Graft-Col-<name>` headers, base64-coded
  * so arbitrary strings can never smuggle a CRLF into the framing.
  *
  * Contracts, mirroring [[Jsonl]]:
  *  - reads take an EXPLICIT schema (string/integral/bool columns restore
  *    exactly via cast — never inference);
  *  - a malformed region quarantines into `_corrupt_record` (the
  *    remainder of that file, base64 of the bytes) instead of failing the
  *    job or being silently dropped;
  *  - parallelism is per-file on read (`binaryFile` — each archive file
  *    is one task, the Common Crawl unit of work) and per-task on write
  *    (each partition streams one archive file; text bytes never
  *    shuffle beyond the one repartition that sizes the files).
  *
  * The in-memory per-file buffer bounds file size at 2 GiB — the same
  * bound Common Crawl targets (~1 GiB/file); size `nFiles` accordingly. */
object Warc {

  val CorruptCol = "_corrupt_record"
  private val ColHeader = "WARC-Graft-Col-"
  private val CRLF = "\r\n"

  /** One parsed record: metadata headers (decoded), payload text, or the
    * quarantined remainder of a malformed file. */
  private[sources] case class WarcRecord(
      meta: Map[String, String], payload: String, corrupt: Option[String])

  // ---- write ---------------------------------------------------------------

  /** Write `df` as `nFiles` WARC archive files under `path` (one file per
    * task — the write is distributed; rows land in a file by hash of
    * `idCol` and are CRLF-framed in `idCol` order within it, so the
    * archive bytes are deterministic for a given df). `textCol` becomes
    * the record payload (must be non-null — an archive record IS its
    * payload); every other column becomes a metadata header. */
  def write(df: DataFrame, path: String, idCol: String, textCol: String,
      nFiles: Int = 8): Unit = {
    val schema = df.schema
    require(schema.fieldNames.contains(textCol), s"missing $textCol")
    val metaCols = schema.fieldNames.filterNot(_ == textCol).toSeq
    val textIdx = schema.fieldIndex(textCol)
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    df.repartition(nFiles, col(idCol)).sortWithinPartitions(idCol)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = TaskContext.getPartitionId()
        val file = new org.apache.hadoop.fs.Path(
          path, f"part-$pid%05d.warc")
        val taskFs = file.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = taskFs.create(file, true)
        try it.foreach { row =>
          require(!row.isNullAt(textIdx), s"null $textCol is not archivable")
          val payload = row.getAs[Any](textCol).toString.getBytes(UTF_8)
          val sb = new StringBuilder
          sb.append("WARC/1.0").append(CRLF)
          sb.append("WARC-Type: resource").append(CRLF)
          metaCols.foreach { c =>
            val v = row.getAs[Any](c)
            if (v != null) sb.append(ColHeader).append(c).append(": ")
              .append(Base64.getEncoder.encodeToString(v.toString.getBytes(UTF_8)))
              .append(CRLF)
          }
          sb.append("Content-Length: ").append(payload.length).append(CRLF)
          sb.append(CRLF)
          out.write(sb.toString.getBytes(UTF_8))
          out.write(payload)
          out.write((CRLF + CRLF).getBytes(UTF_8))
        } finally out.close()
      }
  }

  // ---- read ----------------------------------------------------------------

  /** Read WARC archives under `path` back into the declared `schema` (+
    * [[CorruptCol]]): payload → `textCol`, `WARC-Graft-Col-*` headers →
    * the remaining columns cast to their declared types. One task per
    * archive file; a malformed region yields one quarantine row per file
    * with the undecodable remainder in [[CorruptCol]]. */
  def read(spark: SparkSession, path: String, schema: StructType,
      textCol: String): DataFrame = {
    require(schema.fieldNames.contains(textCol), s"missing $textCol")
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    import spark.implicits._
    val records = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(parseFile _)
    val cols = schema.fields.map { f =>
      if (f.name == textCol)
        when(col("corrupt").isNull, col("payload"))
          .cast(f.dataType).as(f.name)
      else element_at(col("meta"), f.name).cast(f.dataType).as(f.name)
    } :+ col("corrupt").as(CorruptCol)
    records.toDF("meta", "payload", "corrupt").select(cols.toSeq: _*)
  }

  /** Length-delimited record parse of one archive file. Returns data
    * records up to the first malformed byte, then (if any) ONE corrupt
    * record carrying the remainder base64-coded. */
  private[sources] def parseFile(bytes: Array[Byte]): Iterator[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    var bad = false
    def line(): Option[String] = {
      var i = pos
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) None
      else { val s = new String(bytes, pos, i - pos, UTF_8); pos = i + 2; Some(s) }
    }
    while (!bad && pos < bytes.length) {
      val start = pos
      line() match {
        case Some("WARC/1.0") =>
          var meta = Map.empty[String, String]
          var contentLength = -1
          var headerOk = true
          var done = false
          while (headerOk && !done) line() match {
            case Some("") => done = true
            case Some(h) if h.contains(": ") =>
              val Array(k, v) = h.split(": ", 2)
              if (k == "Content-Length")
                contentLength = try v.toInt catch { case _: NumberFormatException => -1 }
              else if (k.startsWith(ColHeader))
                meta += (k.stripPrefix(ColHeader) ->
                  new String(Base64.getDecoder.decode(v), UTF_8))
            case _ => headerOk = false
          }
          if (!headerOk || contentLength < 0 ||
              pos + contentLength > bytes.length) { pos = start; bad = true }
          else {
            val payload = new String(bytes, pos, contentLength, UTF_8)
            pos += contentLength
            // record terminator: two CRLFs (tolerate truncation at EOF)
            (0 until 2).foreach { _ =>
              if (pos + 1 < bytes.length &&
                bytes(pos) == '\r' && bytes(pos + 1) == '\n') pos += 2
            }
            out += WarcRecord(meta, payload, None)
          }
        case _ => pos = start; bad = true
      }
    }
    if (bad) out += WarcRecord(Map.empty, null,
      Some(Base64.getEncoder.encodeToString(
        java.util.Arrays.copyOfRange(bytes, pos, bytes.length))))
    out.iterator
  }

  /** Build-once WARC materialization (fingerprint-cached like the index
    * stores): export the table once, serve reads from the archive. */
  def materializeCached(
      spark: SparkSession, baseFile: String, path: String,
      schema: StructType, idCol: String, textCol: String)(
      build: => DataFrame): DataFrame = {
    IndexStorage.buildOnce(baseFile, path)(
      write(build, path, idCol, textCol))
    read(spark, path, schema, textCol)
  }
}
