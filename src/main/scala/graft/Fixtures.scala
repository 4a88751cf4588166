package graft

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FIXTURES.md materializations: the reference's test-table shapes derived
  * deterministically from the driver parquet (seed-free — embeddings come
  * from md5 of the key, unit-normalized).
  *
  * F1 `items`       — pk/ck int keys, filtering col, dim-3 embedding,
  *                    per-column writetimes (SURVEY §2 S2)
  * F2 `itemsTextPk` — text partition key (text comparison restrictions)
  * F3 `itemsLocal`  — local-index partition column + filtering column
  * F4 `itemsTyped`  — one column per native type (cql_cmp semantics)
  * F6 `cdcEvents`   — change-stream shape over the events table
  */
object Fixtures {

  /** Deterministic unit-norm embedding of dimension `dims` from a key. */
  def derivedEmbedding(key: Column, dims: Int): Column = {
    val raw = array((0 until dims).map { i =>
      ((Dedup.stableHash(concat(key.cast("string"), lit(s"#$i")))
        % 2000001L) - 1000000L).cast("double") / 1000000.0
    }: _*)
    val nrm = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
    transform(raw, x => (x / nrm).cast("float"))
  }

  /** Synthetic writetime (micros) derived from the key — stable per row. */
  private def wt(key: Column, salt: String): Column =
    lit(1700000000000000L) + pmod(Dedup.stableHash(
      concat(key.cast("string"), lit(salt))), lit(1000000000L))

  /** 32-hex digest formatted as a dashed (8-4-4-4-12) UUID string — the
    * canonical form `java.util.UUID.fromString` (the F7 uuid conversion)
    * accepts, so uuid restrictions round-trip the JSON boundary. */
  private def uuidish(hex32: Column): Column = {
    val h = lower(hex32)
    concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
      substring(h, 13, 4), substring(h, 17, 4), substring(h, 21, 12))
  }

  /** F1: canonical vector table (vs_index.rs:65-175). */
  def items(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer").select(
      pmod(col("c_custkey"), lit(97)).cast("int").as("pk"),
      col("c_custkey").as("ck"),
      col("c_nationkey").as("c1"),
      derivedEmbedding(col("c_custkey"), 3).as("embedding"),
      wt(col("c_custkey"), ":e").as("_wt_embedding"),
      wt(col("c_custkey"), ":c").as("_wt_c1"))

  /** F2: text-keyed table (vs_index.rs:1529). */
  def itemsTextPk(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "nation").select(
      col("n_name").as("pk"),
      col("n_nationkey").as("ck"),
      derivedEmbedding(col("n_name"), 3).as("embedding"))

  /** F3: partition-local index table (filtering.rs:676-1084). */
  def itemsLocal(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(
      pmod(col("o_orderkey"), lit(1000)).cast("int").as("pk"),
      col("o_orderkey").as("ck"),
      pmod(col("o_custkey"), lit(50)).cast("int").as("part_col"),
      year(col("o_orderdate")).as("f1"),
      derivedEmbedding(col("o_orderkey"), 8).as("embedding"))

  /** F4: all-native-types filtering table (table/column.rs:30-50). */
  def itemsTyped(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part").select(
      col("p_partkey").as("pk"),
      col("p_name").cast("string").as("c_text"),
      col("p_size").cast("tinyint").as("c_tinyint"),
      (col("p_size") * 100).cast("smallint").as("c_smallint"),
      col("p_size").cast("int").as("c_int"),
      col("p_partkey").cast("bigint").as("c_bigint"),
      col("p_retailprice").cast("float").as("c_float"),
      col("p_retailprice").cast("double").as("c_double"),
      // decimal with differing trailing zeros per row parity (F9 semantics)
      when(pmod(col("p_partkey"), lit(2)) === 0,
        col("p_retailprice").cast("decimal(18,2)").cast("decimal(38,18)"))
        .otherwise(col("p_retailprice").cast("decimal(38,18)")).as("c_decimal"),
      col("p_partkey").cast("decimal(38,0)").as("c_varint"),
      (pmod(col("p_partkey"), lit(2)) === 0).as("c_boolean"),
      date_add(to_date(lit("2024-01-01")),
        pmod(col("p_partkey"), lit(365)).cast("int")).as("c_date"),
      (pmod(col("p_partkey"), lit(86400)) * 1000000000L).as("c_time"), // nanos-of-day
      timestamp_micros(lit(1704067200000000L) + col("p_partkey") * 1000000L)
        .as("c_timestamp"),
      uuidish(md5(col("p_partkey").cast("string"))).as("c_uuidish"),
      col("p_name").cast("binary").as("c_blob"),
      concat(lit("10.0."), pmod(col("p_partkey"), lit(256)).cast("string"),
        lit(".1")).as("c_inet"),
      derivedEmbedding(col("p_partkey"), 3).as("embedding"))

  /** F6: change-stream shape over the events table (lib.rs:708-728). */
  def cdcEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events").select(
      when(col("event_type") === "error", "DELETE").otherwise("UPSERT").as("op"),
      pmod(col("user_id"), lit(97)).cast("int").as("pk"),
      col("user_id").as("ck"),
      when(col("event_type") === "error", lit(null))
        .otherwise(derivedEmbedding(col("user_id") + col("event_id"), 3))
        .as("embedding"),
      col("value").cast("int").as("c1"),
      expr("ts div 1000").as("ts"), // micros
      col("event_id").as("seq"))
}
