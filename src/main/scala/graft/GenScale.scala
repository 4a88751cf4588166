package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator: derives an sfN' corpus from an existing sfN
  * by unioning `copies` transformed replicas of every fact table — the
  * 10× validation corpus the scale-readiness claims get measured against
  * (plan shapes are checked by PlanQualitySpec; THIS checks the constants).
  *
  * The transform is designed so every operator family's workload scales
  * LINEARLY in the copy count — i.e. a replica must never correlate with
  * another replica, or pairwise operators (dedup, fuzzy join, ANN) would
  * super-scale quadratically in ways the original corpus doesn't:
  *
  *  - entity keys (custkey/orderkey/user_id/…) shift by
  *    `copy * KeyStride`, so replicas are disjoint key ranges with intact
  *    referential integrity inside each replica; doc_id/vec_id shift by
  *    the DOCUMENT COUNT instead, keeping replica doc ids contiguous in
  *    [0, copies·n) — the link-graph operators contract on that (see
  *    [[docKeyCols]]). Dimension FKs (nationkey/regionkey) are NOT
  *    shifted — region/nation are copied verbatim, like TPC-H dims at
  *    any sf.
  *  - document text gets a per-replica letter suffix on every letter/digit
  *    run (`word` → `wordbb` for copy 1) — a BIJECTION on tokens, so
  *    cross-replica shingle/minhash/token overlap is exactly zero while
  *    within-replica token counts and df distributions mirror the
  *    original exactly (see the inline note for why a `_c` separator
  *    suffix would instead skew the token stream).
  *  - name columns get `~cccc` (copy digit ×4) so cross-replica names sit
  *    ≥4 edits apart — outside every fuzzy-join radius in the suite.
  *  - embeddings are sign-flipped per (copy, dimension) — an orthogonal
  *    transform, so within-replica distances/cosines are EXACTLY preserved
  *    while cross-replica vectors decorrelate (expected cosine ≈ 0).
  *  - timestamps are untouched: the time range stays, the population
  *    grows — the "more users, same weeks" growth axis.
  *
  * Copy 0 is always the identity, so sfN ⊂ sfN'.
  */
object GenScale {

  /** Disjoint key ranges per replica; far above any sf0.1 key. */
  val KeyStride = 100000000L

  /** Entity-key columns to shift (dimension FKs deliberately absent). */
  private val keyCols = Set(
    "c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "event_id", "user_id")

  /** doc_id / vec_id shift by the DOCUMENT count instead of [[KeyStride]]:
    * the link-graph operators' synthetic edge formula (and its oracle SQL)
    * contract on doc ids being CONTIGUOUS in [0, n) — `(17·d + j) mod n`
    * must land on a real doc id. A sparse 1e8 stride broke that (measured:
    * the replica sweep's pagerank/hits oracles diverged because Spark's
    * src ∪ dst node universe gained ~n phantom ids the oracle's
    * documents-anchored rank vector never saw). Doc-count striding keeps
    * replica doc ids exactly [0, copies·n) and preserves doc↔vec id
    * alignment by using the SAME stride for both. */
  private val docKeyCols = Set("doc_id", "vec_id")

  private val nameCols = Set("c_name", "s_name", "p_name")

  /** Per-(copy, dim) deterministic sign flip — orthogonal, so distances
    * and cosines within a replica are exactly those of the original. */
  def signFlip(emb: Column, c: Int): Column =
    if (c == 0) emb
    else transform(emb, (x, i) =>
      when(pmod(i * lit(2654435761L) + lit(c.toLong * 40503L), lit(2)) === 1, -x)
        .otherwise(x))

  /** One replica of `df` with all decorrelation transforms applied.
    * `docStride` = the source corpus's document count (see [[docKeyCols]]). */
  def replica(df: DataFrame, table: String, c: Int, docStride: Long): DataFrame = {
    val keyed = df.schema.fields.foldLeft(df) { (acc, f) =>
      val stride =
        if (keyCols(f.name)) Some(KeyStride)
        else if (docKeyCols(f.name)) Some(docStride)
        else None
      stride match {
        case Some(st) =>
          acc.withColumn(f.name,
            (col(f.name).cast("long") + lit(c.toLong * st)).cast(f.dataType))
        case None if nameCols(f.name) && c != 0 =>
          acc.withColumn(f.name,
            concat(col(f.name), lit("~" + c.toString * 4)))
        case None => acc
      }
    }
    if (table == "documents" && c != 0)
      keyed
        // suffix every LETTER/DIGIT RUN (the tokenizer's token unit) with a
        // per-replica letter pair — "word" → "wordbb". A separator like "_"
        // is not \p{L}\p{N}, so "word_3" would TOKENIZE as two tokens with
        // every second one a constant digit: measured 136× within-replica
        // shingle df inflation and a 2300× containment-join blowup at 10×.
        // The letter suffix keeps the original→replica token map a
        // BIJECTION: token counts, shingle counts and df distributions
        // mirror the original exactly; values stay replica-disjoint.
        .withColumn("text", regexp_replace(col("text"),
          "([\\p{L}\\p{N}]+)", "$1" + (('a' + c).toChar.toString * 2)))
        .withColumn("n_chars", length(col("text")).cast("long"))
    else if (table == "embeddings")
      keyed.withColumn("embedding", signFlip(col("embedding"), c))
    else keyed
  }

  def scaled(df: DataFrame, table: String, copies: Int, docStride: Long): DataFrame =
    (0 until copies).map(c => replica(df, table, c, docStride)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/testdata-sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dims = Set("region", "nation")
    val docStride = spark.read.parquet(s"$src/documents.parquet").count()
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val res = if (dims(t)) df else scaled(df, t, copies, docStride)
      // 32 output files per fact table: per-file task parallelism for the
      // bench scans (the sf0.1 fixtures are single files; at 10× a single
      // file would serialize every scan's first stage)
      val parts = if (dims(t)) 1 else 32
      res.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[genscale] $t: ${df.count()} -> " +
        spark.read.parquet(s"$out/$t.parquet").count())
    }
    spark.stop()
  }
}
