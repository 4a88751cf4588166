package graft

import graft.operators.{Bm25, Dedup}
import org.apache.spark.sql.functions._

/** The native single-pass tokenizer must be EXACTLY equal to the regex
  * pipeline it replaced — oracle SQL reproduces the regex semantics, so any
  * divergence breaks the hash gate. */
class TokenizeParitySpec extends SparkSpec {
  import spark.implicits._

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit = {
    val diff = df
      .select(
        (Dedup.tokens(col("text")) =!= Dedup.tokensRegex(col("text"))).as("d1"),
        (Bm25.tokenize(col("text")) =!= Bm25.tokenizeRegex(col("text"))).as("d2"))
      .filter(col("d1") || col("d2"))
    assert(diff.count() == 0)
  }

  test("exact equality with regex pipeline on the full fixture corpus") {
    assertParity(spark.read.parquet(sf("documents")))
  }

  test("exact equality on adversarial strings") {
    assertParity(Seq(
      "",
      "   \t\n  ",
      "!@#$ ,.;:",
      "hello,world!rust.programming",
      "the quick brown fox and a lazy dog",
      "Café Über Naïve Straße",
      "ends with separator...",
      "...starts with separator",
      "under_score and 123 digits42mixed",
      "Ⅻ roman numerals ① circled",   // Nl and No categories
      "ＦＵＬＬｗｉｄｔｈ１２３",
      "emoji 😀 inside",
      "a",
      "ALLCAPS MiXeD").toDF("text"))
  }
}
