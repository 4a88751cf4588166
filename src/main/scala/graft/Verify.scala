package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names (local iteration), or
    // the literal `@sf1` — the scale-correctness gate's subset: every query
    // EXCEPT the ones whose oracle is a deliberately-quadratic brute-force
    // replay (SparkEntry.sf1OracleExclusions). The driver's sf0.01 run
    // passes no third arg and always gets the full set.
    val only = args.lift(2).map {
      case "@sf1" => SparkEntry.queries.keySet -- SparkEntry.sf1OracleExclusions
      // the sf10 (100×) spot gate: linear-oracle family representatives
      case "@sf10" => SparkEntry.sf10SpotQueries
      // the sf100 (1000×) spot gate: the fourth measured decade
      case "@sf100" => SparkEntry.sf100SpotQueries
      case csv => csv.split(",").toSet
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS); read as long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // direct task commits: halves the per-directory rename cost of
      // partitionBy index materialization (local FS, no job-abort risk)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json mirrors the DUMPED subset — an entry without its
    // parquet dir would read as a failure to the compare step.
    // oracleSqlFor: the LSH `_auto` / `_sqrt` oracles inline parameters
    // derived from THIS data directory's corpus count (deterministic
    // replay) — invoked only when a dynamic-oracle query is in the dumped
    // subset, so a subset dump against a fixture WITHOUT an embeddings
    // table neither fails nor pays the count job.
    val needsDynamic =
      only.forall(o => (o & SparkEntry.dynamicOracleQueries).nonEmpty)
    // a full dump against a fixture WITHOUT an embeddings table must
    // degrade to the static map (the per-query try above already skipped
    // the embedding queries), not lose the whole oracle file (ADVICE r10)
    val json = (if (needsDynamic)
                  try SparkEntry.oracleSqlFor(spark, sfDir)
                  catch { case e: Throwable =>
                    System.err.println(
                      s"[verify] dynamic oracles skipped: ${e.getMessage}")
                    SparkEntry.oracleSql
                  }
                else SparkEntry.oracleSql)
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // quantitative gate for the rows-only k-means `_auto` queries
    // (VERDICT r10 #2): exact-baseline agreement/recall with floors,
    // merged into the correctness artifact by check_oracle.py. A floor
    // violation is loud here too, not just in the artifact.
    val dumpedSet = SparkEntry.queries.keySet
      .filter(name => only.forall(_.contains(name)))
    try {
      val scores = VerifyAgreement.compute(spark, sfDir, outDir, dumpedSet)
      if (scores.nonEmpty) {
        Files.writeString(Paths.get(s"$outDir/agreement.json"),
          VerifyAgreement.toJson(scores))
        scores.foreach { case (qn, ms) => ms.foreach { case (m, s) =>
          if (!s.pass)
            System.err.println(
              s"[verify] AGREEMENT FLOOR VIOLATED $qn/$m: ${s.value} < ${s.floor}")
        } }
      }
    } catch { case e: Throwable =>
      // FAIL CLOSED (ADVICE r11): an exception must not silently revert
      // the `_auto` rows to bare rows-only — write an agreement.json whose
      // pass=false record check_oracle.py counts as a gate failure. (A
      // compute() that legitimately decides the gate doesn't apply — no
      // embeddings table dumped, corpus over MaxExactN — returns empty
      // WITHOUT throwing and writes nothing; scale runs keep their
      // documented skip.)
      System.err.println(s"[verify] agreement gate failed: ${e.getMessage}")
      val targets = dumpedSet & Set("knn_join_ivf_auto", "semantic_dedup_auto")
      if (targets.nonEmpty) {
        val err = VerifyAgreement.toJson(targets.map(_ -> Map(
          "gate_error" -> VerifyAgreement.Score(-1.0, 0.0))).toMap)
        Files.writeString(Paths.get(s"$outDir/agreement.json"), err)
      }
    }
    spark.stop()
  }
}
