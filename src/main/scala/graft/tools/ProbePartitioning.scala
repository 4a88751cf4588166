package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical probe: does a localCheckpoint()ed frame keep its
  * HashPartitioning through LogicalRDD, so a downstream join on the same
  * key skips the Exchange on that side? Decides whether pre-partitioning
  * the static edge frames of the iterative graph operators can remove the
  * per-round edge-cardinality exchange (guide §2.4). Prints the relevant
  * plan excerpts; exits 0 always — a human reads the output.
  */
object ProbePartitioning {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = spark.range(0, 100000)
      .select((col("id") % 997).as("src"), (col("id") % 9973).as("dst"))
    val r = spark.range(0, 997).select(col("id").as("src"), (col("id") * 2).as("rank"))

    def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains("Exchange hashpartitioning"))

    // A: no pre-partitioning (baseline) — expect 2 exchanges in the join
    val a = e.join(r, "src").groupBy("dst").agg(sum("rank"))
    println(s"A baseline exchanges=${nExchanges(a)}")

    // B: eager localCheckpoint after repartition(src)
    val eB = e.repartition(col("src")).localCheckpoint(true)
    val b = eB.join(r, "src").groupBy("dst").agg(sum("rank"))
    println(s"B eager-ckpt-after-repartition exchanges=${nExchanges(b)}")

    // C: lazy localCheckpoint after repartition(src)
    val eC = e.repartition(col("src")).localCheckpoint(false)
    val c = eC.join(r, "src").groupBy("dst").agg(sum("rank"))
    println(s"C lazy-ckpt-after-repartition exchanges=${nExchanges(c)}")

    // D: lazy ckpt of a groupBy output, rejoined on the (aliased) group key
    val gD = e.groupBy("src").agg(count(lit(1)).as("od")).localCheckpoint(false)
    val d = gD.join(r, "src").groupBy("od").agg(count(lit(1)))
    println(s"D lazy-ckpt-after-groupBy exchanges=${nExchanges(d)}")

    // E: same as C but the join key is an ALIAS of the partition key
    val eE = e.repartition(col("src")).localCheckpoint(false)
      .withColumnRenamed("src", "s2")
    val ee = eE.join(r.withColumnRenamed("src", "s2"), "s2")
      .groupBy("dst").agg(sum("rank"))
    println(s"E alias-propagation exchanges=${nExchanges(ee)}")

    // F: execute C and report the FINAL adaptive plan's exchanges
    c.write.format("noop").mode("overwrite").save()
    println(s"F lazy-ckpt final plan:\n${c.queryExecution.executedPlan}")

    spark.stop()
  }
}
