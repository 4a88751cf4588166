package graft

import graft.functions.VectorFunctions
import graft.functions.VectorFunctions.Euclidean
import graft.operators._
import graft.operators.Ann.AnnRequest
import graft.operators.Catalog._
import org.apache.spark.sql.functions._

/** FIXTURES.md table shapes + the reference comparison semantics they pin
  * (decimal value-equality F9/P3, writetime columns S2, local routing F3). */
class FixturesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("F1 items: keys, dim-3 unit embeddings, writetime columns") {
    val df = Fixtures.items(spark, dir)
    assert(df.columns.toSeq ==
      Seq("pk", "ck", "c1", "embedding", "_wt_embedding", "_wt_c1"))
    val norms = df.select(VectorFunctions.norm(col("embedding"))).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    assert(df.filter(col("_wt_embedding") <= 0).count() == 0)
  }

  test("F4 decimal comparison is value-based: 1.0 == 1.00 (F9/P3)") {
    val df = Fixtures.itemsTyped(spark, dir)
    // same source value, alternating trailing-zero representation: Eq by
    // value must match both representations
    val sample = df.select(col("c_decimal")).as[BigDecimal].head()
    val eq = RestrictionCompiler.compileAll(df.schema,
      Seq(Restriction.Eq("c_decimal", sample)))
    val viaValue = df.filter(eq).count()
    val direct = df.filter(col("c_decimal") === lit(sample)).count()
    assert(viaValue == direct && viaValue >= 1)
    // varint semantic compare (BigInt-valued decimal(38,0))
    assert(df.filter(RestrictionCompiler.compileAll(df.schema,
      Seq(Restriction.Lt("c_varint", BigDecimal(100))))).count() ==
      df.filter(col("pk") < 100).count())
  }

  test("F2 text pk: string comparison restrictions order lexicographically") {
    val df = Fixtures.itemsTextPk(spark, dir)
    val got = df.filter(RestrictionCompiler.compileAll(df.schema,
        Seq(Restriction.Gt("pk", "JAPAN")))).select("pk").as[String].collect().toSet
    val expected = df.select("pk").as[String].collect().filter(_ > "JAPAN").toSet
    assert(got == expected && got.nonEmpty)
  }

  test("F3 items_local: routed local query consumes partition Eq") {
    val df = Fixtures.itemsLocal(spark, dir)
    val eng = new Engine
    eng.addIndex(IndexMetadata("ks", "local", "items_local", "embedding",
      primaryKeyColumns = Seq("pk", "ck"), partitioning = Local(Seq("part_col")),
      filteringColumns = Seq("f1"),
      kind = Vs(IndexOptionsVs(8, Euclidean))), df)
    val qv = df.select("embedding").head.getSeq[Float](0)
    val res = eng.ann("ks", "local", AnnRequest(qv, limit = 5,
      restrictions = Seq(Restriction.Eq("part_col", 7)), allowFiltering = false))
    assert(res.count() == 5)
    // residual f1 range restriction on top still requires allowFiltering
    intercept[QueryException] {
      eng.ann("ks", "local", AnnRequest(qv, limit = 5,
        restrictions = Seq(Restriction.Eq("part_col", 7), Restriction.Gt("f1", 1995)),
        allowFiltering = false))
    }
  }

  test("F6 cdc events compact to the same state as direct query compaction") {
    val ev = Fixtures.cdcEvents(spark, dir)
    val state = Lww.compactState(ev, Seq("pk", "ck"), "ts",
      Some("op"), Some("embedding"), Some("seq"))
    assert(state.count() == ev.select("pk", "ck").distinct().count())
  }

  test("S6 catalog reconciliation: set-diff add/remove, version fast-path") {
    val eng = new Engine
    val df = Fixtures.items(spark, dir)
    def meta(n: String) = IndexMetadata("ks", n, "items", "embedding",
      primaryKeyColumns = Seq("pk", "ck"), kind = Vs(IndexOptionsVs(3, Euclidean)))
    val (r1, v1) = CatalogSync.reconcile(eng, Seq(meta("a"), meta("b")),
      _ => df, None, "v1")
    assert(r1.added.map(_.index).sorted == Seq("a", "b") && r1.removed.isEmpty)
    assert(eng.catalog.get(IndexKey("ks", "a")).get.status == FullScanning)
    // same version ⇒ no-op even if definitions differ
    val (r2, _) = CatalogSync.reconcile(eng, Seq(meta("a")), _ => df, v1, "v1")
    assert(r2.added.isEmpty && r2.removed.isEmpty)
    // new version ⇒ b removed
    val (r3, _) = CatalogSync.reconcile(eng, Seq(meta("a")), _ => df, v1, "v2")
    assert(r3.removed.map(_.index) == Seq("b"))
    assert(eng.catalog.get(IndexKey("ks", "b")).isEmpty)
  }

  test("property: tuple restrictions match reference lexicographic compare (seeded random)") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(60)((rnd.nextInt(5), rnd.nextInt(5).toLong, rnd.nextInt(5)))
    val df = rows.toDF("a", "b", "c")
    def lex(x: (Int, Long, Int), y: (Int, Long, Int)): Int = {
      val c1 = x._1.compare(y._1)
      if (c1 != 0) c1 else { val c2 = x._2.compare(y._2); if (c2 != 0) c2 else x._3.compare(y._3) }
    }
    for (_ <- 1 to 20) {
      val pivot = (rnd.nextInt(5), rnd.nextInt(5).toLong, rnd.nextInt(5))
      val got = df.filter(RestrictionCompiler.compileAll(df.schema, Seq(
          Restriction.LteTuple(Seq("a", "b", "c"), Seq(pivot._1, pivot._2, pivot._3)))))
        .as[(Int, Long, Int)].collect().sorted.toSeq
      val want = rows.filter(r => lex(r, pivot) <= 0).sorted
      assert(got == want, s"pivot $pivot")
    }
  }

  test("property: b1 pack bits equal sign bits for random vectors (seeded)") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(30)(Seq.fill(rnd.nextInt(20) + 1)(rnd.nextFloat() * 2 - 1))
    val df = vecs.map(Tuple1(_)).toDF("v")
      .select(col("v"), VectorFunctions.b1Pack(col("v")).as("p"))
    df.as[(Seq[Float], Seq[Byte])].collect().foreach { case (v, p) =>
      assert(p.length == (v.length + 7) / 8)
      v.zipWithIndex.foreach { case (x, i) =>
        val bit = (p(i / 8) >> (i % 8)) & 1
        assert(bit == (if (x > 0) 1 else 0), s"bit $i of $v")
      }
    }
  }
}
