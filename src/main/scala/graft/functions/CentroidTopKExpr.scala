package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native codegen'd k-nearest-centroid selection — the IVF assignment /
  * probe-routing hot loop.
  *
  * The HOF formulation (`array_min(transform(lit(centroids), …))` /
  * `slice(array_sort(transform(…)), 1, nprobe)`) is exact but evaluates
  * INTERPRETED: every row walks a k-element array literal through lambda
  * dispatch, and at k ≈ √n cells the assignment pass costs O(n·k·dims)
  * lambda-interpreted flops — measured as the DOMINANT term of the
  * sf100 IVF rows (2M rows × 1414 centroids × 64 dims ≈ 180 G interpreted
  * ops; semantic_dedup_auto spent ~90% of its 213 s there). This
  * expression keeps the whole scan inside whole-stage codegen: a tight
  * primitive loop over a flattened float[] of centroids with an
  * insertion-select of the k smallest (d, cid) pairs.
  *
  * BIT-IDENTICAL to the HOF form, which remains its executable spec
  * (CentroidTopKSpec pins equality, ties included): per-centroid
  * distance is the [[VectorFunctions.l2sq]] rule (left-to-right
  * accumulation over min(len) elements, floats widened to double), and
  * the output is the lexicographic (d, cid)-sorted prefix — exactly
  * `array_sort`'s struct ordering, so every oracle replays unchanged. */
object CentroidTopKExpr {
  def topK(vec: Column, centroids: Seq[(Int, Seq[Float])], k: Int): Column =
    GraftSqlBridge.column(
      CentroidTopK(GraftSqlBridge.expression(vec), centroids, k))
}

case class CentroidTopK(
    child: Expression,
    centroids: Seq[(Int, Seq[Float])],
    k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty, "need at least one centroid")
  require(k >= 1, "k must be >= 1")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("d", DoubleType, nullable = false),
      StructField("cid", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "centroid_topk"

  // flattened centroid matrix: equal-stride rows of the max dims, with the
  // true per-centroid length alongside (ragged centroid lists keep l2sq's
  // min-length contract)
  @transient private lazy val cids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val lens: Array[Int] = centroids.map(_._2.length).toArray
  @transient private lazy val stride: Int = lens.max
  @transient private lazy val flat: Array[Float] = {
    val a = new Array[Float](centroids.size * stride)
    var j = 0
    while (j < centroids.size) {
      val c = centroids(j)._2
      var i = 0
      while (i < c.length) { a(j * stride + i) = c(i); i += 1 }
      j += 1
    }
    a
  }
  private def keep: Int = math.min(k, centroids.size)

  /** Insertion-select of the `keep` lexicographically-smallest (d, cid)
    * pairs — shared by eval and (structurally) the generated code.
    * Ordering is `java.lang.Double.compare` (NaN greater than +Inf, NaN
    * equal to NaN) — exactly Spark's struct/array_sort double ordering, so
    * a NaN-bearing vector still selects real centroids by cid tiebreak
    * instead of leaking the (Inf, Int.MaxValue) sentinel as a cell id
    * (ADVICE r11). The unfilled sentinel is therefore NaN (nothing sorts
    * after it), not +Inf (a legitimate overflow distance ties with it). */
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vn = v.numElements()
    val m = keep
    val bd = Array.fill(m)(Double.NaN)
    val bc = Array.fill(m)(Int.MaxValue)
    var j = 0
    while (j < cids.length) {
      val n = math.min(vn, lens(j))
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = v.getFloat(i).toDouble - flat(j * stride + i).toDouble
        acc += d * d; i += 1
      }
      val cid = cids(j)
      val cLast = java.lang.Double.compare(acc, bd(m - 1))
      if (cLast < 0 || (cLast == 0 && cid < bc(m - 1))) {
        var p = m - 1
        var cont = true
        while (p > 0 && cont) {
          val c = java.lang.Double.compare(acc, bd(p - 1))
          if (c < 0 || (c == 0 && cid < bc(p - 1))) {
            bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1
          } else cont = false
        }
        bd(p) = acc; bc(p) = cid
      }
      j += 1
    }
    val out = new Array[Any](m)
    var r = 0
    while (r < m) {
      out(r) = new GenericInternalRow(Array[Any](bd(r), bc(r))); r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("cents", flat, "float[]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
    val lensRef = ctx.addReferenceObj("lens", lens, "int[]")
    val m = keep
    nullSafeCodeGen(ctx, ev, v => {
      val bd = ctx.freshName("bd")
      val bc = ctx.freshName("bc")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val cid = ctx.freshName("cid")
      val p = ctx.freshName("p")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val vn = ctx.freshName("vn")
      val cl = ctx.freshName("cl")
      val cp = ctx.freshName("cp")
      s"""
         |int $vn = $v.numElements();
         |double[] $bd = new double[$m];
         |int[] $bc = new int[$m];
         |for (int $r = 0; $r < $m; $r++) {
         |  $bd[$r] = Double.NaN; $bc[$r] = Integer.MAX_VALUE;
         |}
         |for (int $j = 0; $j < ${cids.length}; $j++) {
         |  int $n = java.lang.Math.min($vn, $lensRef[$j]);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double d = ((double) $v.getFloat($i))
         |      - ((double) $flatRef[$j * $stride + $i]);
         |    $acc += d * d;
         |  }
         |  int $cid = $cidsRef[$j];
         |  int $cl = java.lang.Double.compare($acc, $bd[$m - 1]);
         |  if ($cl < 0 || ($cl == 0 && $cid < $bc[$m - 1])) {
         |    int $p = $m - 1;
         |    while ($p > 0) {
         |      int $cp = java.lang.Double.compare($acc, $bd[$p - 1]);
         |      if (!($cp < 0 || ($cp == 0 && $cid < $bc[$p - 1]))) break;
         |      $bd[$p] = $bd[$p - 1]; $bc[$p] = $bc[$p - 1]; $p--;
         |    }
         |    $bd[$p] = $acc; $bc[$p] = $cid;
         |  }
         |}
         |Object[] $out = new Object[$m];
         |for (int $r = 0; $r < $m; $r++) {
         |  $out[$r] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $bd[$r], $bc[$r] });
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopK =
    copy(child = newChild)
}
