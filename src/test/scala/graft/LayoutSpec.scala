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
}
