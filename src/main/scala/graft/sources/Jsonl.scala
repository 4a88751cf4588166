package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines source/sink — the interchange format LLM data pipelines
  * actually speak (HF dataset dumps, WebDataset manifests, fine-tune
  * files: one JSON object per line). Spark's json reader already IS the
  * distributed JSONL reader — newline-delimited, one task per file
  * split — so what this wraps is the contracts that matter at 100 TB,
  * not the I/O:
  *
  *  - reads NEVER infer. Schema inference is a full extra pass over the
  *    data before the real one, and a single poisoned line silently
  *    widens a column to string for the whole dataset. The schema is an
  *    explicit contract; lines that don't parse land in
  *    `_corrupt_record` (PERMISSIVE) for quarantine instead of failing
  *    the job or skewing the schema.
  *  - writes are exact: every value serializes losslessly (UTF-8 text
  *    with JSON escaping, numerics as-is), so parquet → jsonl →
  *    DataFrame round-trips value-identical (spec + `jsonl_roundtrip`
  *    oracle pin this against DuckDB reading the original parquet).
  *  - compression is a per-file property (`gzip`/`zstd`/none) — split
  *    boundaries degrade to file boundaries under gzip, which is the
  *    right trade for archival sinks and the wrong one for scan-heavy
  *    sources; callers choose per use.
  */
object Jsonl {

  /** Quarantine column name for unparseable lines. */
  val CorruptCol = "_corrupt_record"

  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Schema-contract read: parseable lines get the declared columns,
    * unparseable ones get nulls + the raw line in [[CorruptCol]].
    * Filter `col(CorruptCol).isNull` for the clean view; the corrupt
    * slice is the quarantine feed.
    *
    * Spark restriction: a query whose referenced columns are ONLY
    * [[CorruptCol]] (e.g. `filter($"_corrupt_record".isNotNull).count()`)
    * is disallowed by the JSON reader — `.cache()` the parsed frame or
    * keep a data column in the projection when auditing the quarantine. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Strict read: any unparseable line fails the job (ingest gates that
    * must not silently drop data). */
  def readStrict(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Build-once JSONL materialization of a table (fingerprint-cached like
    * the index stores) — the export-once/serve-many shape. */
  def materializeCached(
      spark: SparkSession, baseFile: String, path: String,
      schema: StructType)(build: => DataFrame): DataFrame = {
    IndexStorage.buildOnce(baseFile, path)(write(build, path))
    read(spark, path, schema)
  }
}
