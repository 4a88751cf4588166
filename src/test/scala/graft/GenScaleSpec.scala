package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Pins GenScale's decorrelation CONTRACT — the properties the sf1/sf10
  * linear-scaling validation rests on. Each case is a regression guard for
  * a measured fixture bug (see the scaladoc on GenScale):
  *  - sign-flip patterns must differ across ALL copy pairs (a linear
  *    parity hash once made all odd copies share one pattern, so
  *    same-parity replicas were bit-identical and cross-replica cosine
  *    was 1, not ≈0);
  *  - replica codes need pairwise hamming ≥2 so same-doc text prefixes
  *    across replicas sit outside the fuzzy joins' levenshtein ≤3 radius;
  *  - the token transform must be a bijection with replica-disjoint
  *    codomains (an `_c` suffix once skewed shingle df 136×).
  */
class GenScaleSpec extends SparkSpec {
  import spark.implicits._

  private def flipPattern(c: Int, dim: Int): Seq[Float] = {
    val ones = Seq(Array.fill(dim)(1.0f))
    ones.toDF("embedding")
      .select(GenScale.signFlip(col("embedding"), c).as("e"))
      .as[Array[Float]].head().toSeq
  }

  test("signFlip patterns differ across every copy pair, incl. same parity") {
    val dim = 64
    val pats = (1 to 10).map(c => c -> flipPattern(c, dim)).toMap
    for (a <- 1 to 10; b <- (a + 1) to 10) {
      val diff = pats(a).zip(pats(b)).count { case (x, y) => x != y }
      // murmur3-mixed bits: expect ~dim/2 differing positions; anything
      // near 0 (identical) or dim (pure negation ⇒ cosine −1) re-correlates
      assert(diff >= dim / 4 && diff <= 3 * dim / 4,
        s"copies $a,$b flip patterns differ in $diff/$dim dims")
    }
  }

  test("signFlip is orthogonal: within-replica dot products exactly preserved") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(6)(Array.fill(32)(rnd.nextFloat() * 2 - 1))
    def dots(vs: Seq[Array[Float]]): Seq[Double] =
      for (a <- vs; b <- vs)
        yield a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val flipped = vecs.toDF("embedding")
      .select(GenScale.signFlip(col("embedding"), 3).as("e"))
      .as[Array[Float]].collect().toSeq
    // diagonal ±1 transform: sign cancels in x_i*y_i, sums match bit-exactly
    assert(dots(vecs) == dots(flipped))
  }

  test("replicaCode: pairwise hamming >= 2 over the sf10 range") {
    val codes = (1 until 120).map(GenScale.replicaCode)
    assert(codes.distinct.size == codes.size)
    for (i <- codes.indices; j <- (i + 1) until codes.size) {
      val h = codes(i).zip(codes(j)).count { case (x, y) => x != y }
      assert(h >= 2, s"codes ${codes(i)}/${codes(j)} differ in only $h position(s)")
    }
  }

  test("replicaCode: 4-letter band (sf100's 1000 copies) keeps every pair " +
      ">= 2 EDITS apart, 3-letter band unchanged") {
    // the sf100 extension must not perturb the bands sf1/sf10 were
    // generated with (regenerating those corpora must stay byte-identical)
    assert(GenScale.replicaCode(1) == "abb" && GenScale.replicaCode(675) == "zzy")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val four = (Seq(999, 1000, 1300, 14999) ++ (676 until 800)).distinct
      .map(GenScale.replicaCode)
    assert(four.forall(_.length == 4) && four.distinct.size == four.size)
    for (i <- four.indices; j <- (i + 1) until four.size)
      assert(lev(four(i), four(j)) >= 2,
        s"4-band codes ${four(i)}/${four(j)} within 1 edit")
    // CROSS-band: no 4-code may sit one deletion from a valid 3-code —
    // the property the x,y,z exclusions exist for (a naive base-26
    // extension put copy 676 one edit from copy 26)
    val three = (1 until 676).map(GenScale.replicaCode)
    for (f <- four; t <- three)
      assert(lev(f, t) >= 2, s"cross-band codes $f/$t within 1 edit")
  }

  test("text transform: token bijection, replica-disjoint, df shape preserved") {
    val docs = Seq(
      (0L, "alpha beta alpha", "en", "s0", 16L),
      (1L, "beta gamma delta", "en", "s0", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def tokens(c: Int): Seq[String] =
      GenScale.replica(docs, "documents", c, docStride = 2L)
        .select(explode(split(col("text"), " ")).as("t"))
        .as[String].collect().toSeq
    val t0 = tokens(0); val t1 = tokens(1); val t2 = tokens(2)
    // bijection: same multiset SHAPE (counts per distinct token)
    def shape(ts: Seq[String]) = ts.groupBy(identity).values.map(_.size).toSeq.sorted
    assert(shape(t0) == shape(t1) && shape(t1) == shape(t2))
    // disjoint codomains: zero token overlap across replicas
    assert(t0.toSet.intersect(t1.toSet).isEmpty)
    assert(t1.toSet.intersect(t2.toSet).isEmpty)
  }

  test("same-doc prefixes across replicas sit outside levenshtein radius 3") {
    val docs = Seq(
      // worst case for the 24-char window: longest corpus words (8 chars)
      // so the window holds the FEWEST suffixed tokens
      (0L, "aaaaaaaa bbbbbbbb cccccccc dddddddd", "en", "s0", 35L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def prefix(c: Int): String =
      GenScale.replica(docs, "documents", c, 1L)
        .select(substring(col("text"), 1, 24)).as[String].head()
    for (a <- 1 to 8; b <- (a + 1) to 8) {
      val d = Seq((prefix(a), prefix(b))).toDF("x", "y")
        .select(levenshtein(col("x"), col("y"))).as[Int].head()
      assert(d > 3, s"copies $a,$b 24-char prefixes at distance $d (<= fuzzy radius)")
    }
  }
}
