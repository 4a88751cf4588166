package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV source/sink with the same contracts as [[Jsonl]] — the third leg of
  * the interchange-format family (tabular exports, eval sheets, labeling
  * vendor round trips all still speak CSV). Spark's csv reader is already
  * the distributed reader (one task per split); what this wraps is the
  * contracts that matter at scale:
  *
  *  - reads NEVER infer (inference is a full extra pass and one poisoned
  *    cell widens a column for the whole dataset) — the schema is an
  *    explicit contract; undecodable lines quarantine into
  *    `_corrupt_record` instead of failing the job;
  *  - writes are round-trip-exact for string/numeric/bool columns:
  *    minimal quoting + RFC 4180 quote-doubling (escape = the quote
  *    char — a distinct escape char like backslash collides with
  *    literal backslashes in the data) so embedded delimiters, quotes,
  *    CRLFs and backslashes survive; `multiLine` on read parses the
  *    quoted newlines back (multiLine degrades split granularity to
  *    whole files — the archival trade, same as gzip'd JSONL; keep
  *    newline-free columns for scan-heavy sources);
  *  - null vs "" — CSV's classic ambiguity — round-trips because the
  *    two serialize DIFFERENTLY under minimal quoting: null is the
  *    bare empty field, the empty string is a quoted `""` (QUOTE_ALL
  *    would collapse both to `""` and lose the distinction).
  */
object Csv {

  val CorruptCol = "_corrupt_record"

  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .option("compression", compression)
      .csv(path)

  /** Schema-contract read (PERMISSIVE + quarantine column). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType, nullable = true)))
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      // quoted "" is the EMPTY STRING; only the bare empty field is
      // null. Spark compares the parsed token against nullValue AFTER
      // unquoting, so the default nullValue="" folds both cases into
      // null — a sentinel no text cell can contain (NUL) keeps them
      // apart: univocity hands back the sentinel for the bare field
      // (-> null) and the real "" for the quoted one.
      .option("emptyValue", "")
      .option("nullValue", "\u0000")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
  }

  /** Strict read: any undecodable line fails the job. */
  def readStrict(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true").option("emptyValue", "")
      .option("nullValue", "\u0000")
      .option("mode", "FAILFAST").csv(path)

  /** Build-once CSV materialization (fingerprint-cached like the index
    * stores) — export once, serve reads. */
  def materializeCached(
      spark: SparkSession, baseFile: String, path: String,
      schema: StructType)(build: => DataFrame): DataFrame = {
    IndexStorage.buildOnce(baseFile, path)(write(build, path))
    read(spark, path, schema)
  }
}
