package graft

import graft.functions.VectorFunctions.Euclidean
import graft.operators.Catalog
import graft.operators.Catalog._
import org.scalatest.funsuite.AnyFunSuite

/** Routing/scoring semantics vs indexes.rs:193-238 (score_index),
  * 360-431 (best_index), 35-58 (NeedsFiltering ordering). */
class CatalogSpec extends AnyFunSuite {

  private def vs(dims: Int = 3) = Vs(IndexOptionsVs(dims, Euclidean))

  private def meta(index: String, partitioning: Partitioning = Global,
      filtering: Seq[String] = Nil, version: Long = 0) =
    IndexMetadata("ks", index, "items", "embedding",
      primaryKeyColumns = Seq("pk", "ck"), partitioning = partitioning,
      filteringColumns = filtering, version = version, kind = vs())

  test("global: no restrictions ⇒ NoFiltering; any restriction ⇒ Yes(n)") {
    val m = meta("g", filtering = Seq("c1"))
    assert(scoreIndex(m, Nil, Nil).contains(NoFiltering))
    assert(scoreIndex(m, Seq("pk"), Nil).contains(YesFiltering(1)))
    assert(scoreIndex(m, Seq("pk"), Seq("c1")).contains(YesFiltering(2)))
  }

  test("column outside pk/partition/filtering set ⇒ cannot serve") {
    val m = meta("g")
    assert(scoreIndex(m, Seq("nope"), Nil).isEmpty)
  }

  test("local: requires Eq on all partition columns; they are consumed") {
    val m = meta("l", partitioning = Local(Seq("part")), filtering = Seq("c1"))
    assert(scoreIndex(m, Nil, Nil).isEmpty)                       // no partition Eq
    assert(scoreIndex(m, Seq("part"), Nil).contains(NoFiltering)) // consumed
    assert(scoreIndex(m, Seq("part", "c1"), Nil).contains(YesFiltering(1)))
    assert(scoreIndex(m, Seq("part"), Seq("c1")).contains(YesFiltering(1)))
    assert(scoreIndex(m, Seq("c1"), Nil).isEmpty)                 // part missing
  }

  test("NeedsFiltering ordering: No > Yes(fewer) > Yes(more)") {
    val ord = Catalog.needsFilteringOrdering
    assert(ord.compare(NoFiltering, YesFiltering(1)) > 0)
    assert(ord.compare(YesFiltering(1), YesFiltering(2)) > 0)
    assert(ord.compare(YesFiltering(2), YesFiltering(2)) == 0)
  }

  test("best_index picks least-residual serving candidate, tie by version") {
    val cat = new Catalog
    cat.register(meta("idx_a", filtering = Nil, version = 1))
    cat.register(meta("idx_b", filtering = Seq("c1"), version = 2))
    // restriction on c1: only idx_b can serve
    cat.bestIndex(IndexKey("ks", "idx_a"), Seq("c1"), Nil) match {
      case ServingIndex(m, YesFiltering(1)) => assert(m.index == "idx_b")
      case other => fail(s"unexpected: $other")
    }
    // no restrictions: both NoFiltering; newest version wins
    cat.bestIndex(IndexKey("ks", "idx_a"), Nil, Nil) match {
      case ServingIndex(m, NoFiltering) => assert(m.index == "idx_b")
      case other => fail(s"unexpected: $other")
    }
  }

  test("NotFound / NotServing / NoGlobalIndex states") {
    val cat = new Catalog
    assert(cat.bestIndex(IndexKey("ks", "missing"), Nil, Nil) == NotFound)

    cat.register(meta("building"), status = FullScanning, progressPct = 40.0)
    assert(cat.bestIndex(IndexKey("ks", "building"), Nil, Nil) == NotServing(40.0))

    val cat2 = new Catalog
    cat2.register(meta("local_only", partitioning = Local(Seq("part"))))
    // serving candidate exists but cannot serve a global (no partition Eq) query
    assert(cat2.bestIndex(IndexKey("ks", "local_only"), Nil, Nil) == NoGlobalIndex)
  }
}
