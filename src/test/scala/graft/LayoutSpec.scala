package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def ref(a: Long, b: Long, bits: Int = 16): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("z interleave matches the bit-reference on corners and mixed patterns") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL), (0xABCDL, 0x1234L))
    val got = cases.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z")).as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => ref(a, b) })
    // a occupies even bits, b odd bits: disjoint masks
    assert(ref(0xFFFFL, 0L) == 0x55555555L && ref(0L, 0xFFFFL) == 0xAAAAAAAAL)
  }

  test("z locality: nearby (a,b) cells share high-order z prefixes") {
    // the whole point of the curve: both dimensions influence the TOP bits,
    // so a small (a,b) rectangle is a contiguous-ish z range
    assert((ref(3, 3) >> 4) == (ref(2, 2) >> 4))
    assert(math.abs(ref(100, 100) - ref(101, 101)) < ref(100, 100 + 64) - ref(100, 100))
  }

  test("zorder: range exchange + within-partition sort, never a global single partition") {
    val df = (0L until 1000L).map(i => (i, i % 37, i % 53)).toDF("id", "x", "y")
    val out = Layout.zorder(df, col("x"), col("y"))
    val sortedPerPartition = out.select("z").as[Long]
      .mapPartitions(it => Iterator.single {
        val s = it.toSeq; s == s.sorted
      }).collect()
    assert(sortedPerPartition.forall(identity))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(1500))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
  }

  test("bucketed tables: equi-join plans with zero shuffle exchanges") {
    val base = s"${sys.props("java.io.tmpdir")}/graft-bucketed-spec"
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("av"))
    val b = spark.range(500).select(col("id").as("k"), (col("id") * 3).as("bv"))
    spark.sql("DROP TABLE IF EXISTS bkt_a_spec")
    spark.sql("DROP TABLE IF EXISTS bkt_b_spec")
    val ta = Layout.bucketedOnce(a, "bkt_a_spec", s"$base/a", "k", 4)
    val tb = Layout.bucketedOnce(b, "bkt_b_spec", s"$base/b", "k", 4)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ta.join(tb, "k")
      val plan = joined.queryExecution.executedPlan.toString
      // the whole point of the layout: the join itself shuffles NOTHING —
      // bucket-to-bucket alignment replaces both Exchanges
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not re-shuffle:\n${plan.take(2000)}")
      assert(joined.count() == 500)
      // layout is invisible to semantics
      val plain = a.join(b, "k").agg(sum(col("av") + col("bv"))).head.getLong(0)
      assert(joined.agg(sum(col("av") + col("bv"))).head.getLong(0) == plain)
      // second call serves from the session catalog without a rewrite
      val again = Layout.bucketedOnce(a, "bkt_a_spec", s"$base/a", "k", 4)
      assert(again.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
