package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-vintage guard for [[Tables.load]]: the driver-generated
  * events.ts column has shipped both as TIMESTAMP(NANOS) — which the
  * legacy nanosAsLong conf reads as a raw nanos long — and as
  * TIMESTAMP(MICROS), which reads as TIMESTAMP_NTZ (the legacy conf only
  * covers nanos). Every downstream operator and DuckDB oracle treats ts
  * as epoch NANOS in a long; the loader must present that for every
  * vintage, or all ts arithmetic fails analysis (round-7 regression). */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-vintage").toString

  test("micros-timestamp (NTZ) vintage loads as epoch-nanos long") {
    val dir = tmpDir()
    val micros = 1700000000123456L
    Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == LongType)
    assert(loaded.select("ts").as[Long].head() == micros * 1000L)
  }

  test("instant-timestamp (LTZ) vintage also normalizes") {
    val dir = tmpDir()
    val micros = 1700000000123456L
    Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == LongType)
    assert(loaded.select("ts").as[Long].head() == micros * 1000L)
  }

  test("long ts (nanos-as-long vintage) passes through untouched") {
    val dir = tmpDir()
    Seq((1L, 42L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == LongType)
    assert(loaded.select("ts").as[Long].head() == 42L)
  }

  test("current driver fixture presents nanos-long ts") {
    val loaded = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(loaded.schema("ts").dataType == LongType)
    // sanity: values are epoch nanos (≥ year 2000 in ns), not micros
    val minTs = loaded.agg(min(col("ts"))).as[Long].head()
    assert(minTs > 946684800L * 1000000000L, s"ts=$minTs is not epoch nanos")
  }
}
