package graft

import graft.operators.Bm25
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.KeyedEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL function injection via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would return another suite's session and silently ignore
    // withExtensions; clear the JVM-wide handles so a fresh session (sharing
    // the SparkContext) is built with the extensions applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      // MUST carry the same data-affecting confs as SparkSpec.session:
      // this session becomes the JVM default, and with parallel suite
      // scheduling another suite's lazy SparkSpec.session can resolve to
      // it via getOrCreate — without nanosAsLong the events.parquet ts
      // column then infers as TIMESTAMP_NTZ and every events-based spec
      // fails on (ts div 1000)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("vector functions usable from SQL text") {
    import spark.implicits._
    Seq((Seq(0f, 0f), Seq(3f, 4f))).toDF("a", "b").createOrReplaceTempView("v")
    val row = spark.sql(
      "SELECT vector_l2sq(a, b) AS l2, vector_dot(a, b) AS d, vector_hamming(a, b) AS h FROM v")
      .head()
    assert(row.getDouble(0) == 25.0)
    assert(row.getDouble(1) == 0.0)
    assert(row.getDouble(2) == 2.0) // signs: (0,0) vs (+,+)
  }

  test("wrong arity is a clear error") {
    val e = intercept[Exception](spark.sql("SELECT vector_l2sq(array(1.0F))").collect())
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("vector_l2sq"))
  }

  test("unicode_nfc / unicode_nfkc usable from SQL text") {
    // 'e' + U+0301 composes to é under NFC; U+FB01 (ﬁ ligature) only
    // decomposes under the compatibility (NFKC) form
    val row = spark.sql(
      "SELECT unicode_nfc('Café') AS c, unicode_nfkc('ﬁn') AS f, unicode_nfc(NULL) AS n")
      .head()
    assert(row.getString(0) == "Café")
    assert(row.getString(1) == "fin")
    assert(row.isNullAt(2))
    // non-string arguments fail at ANALYSIS, not as a mid-job cast error
    val e = intercept[Exception](spark.sql("SELECT unicode_nfc(array(1))").collect())
    assert(e.getMessage.contains("string argument"))
  }
}

/** ST6: FTS commit batching — a streaming corpus becomes searchable batch by
  * batch via foreachBatch index rebuild (the reference commits every 3 s /
  * 10k docs; tantivy.rs:129-130). */
class StreamingFtsSpec extends SparkSpec {
  import spark.implicits._

  test("documents become searchable after their micro-batch commits") {
    val mem = MemoryStream[KeyedEvent](spark)
    @volatile var searchable: Map[Long, Long] = Map.empty
    val q = mem.toDS().toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // commit = rebuild the postings for all docs seen so far (test-size);
        // production appends per-batch postings partitions instead
        val docs = batch.select(col("seq").as("doc_id"), col("payload").as("body"))
        val hits = Bm25.search(docs, "doc_id", "body", "needle", 10).count()
        searchable = searchable.updated(id, hits)
        ()
      }
      .start()
    try {
      mem.addData(Seq(
        KeyedEvent("d1", 1L, 1L, tombstone = false, Some("no match here")),
        KeyedEvent("d2", 2L, 2L, tombstone = false, Some("a needle in the haystack"))))
      q.processAllAvailable()
      mem.addData(Seq(
        KeyedEvent("d3", 3L, 3L, tombstone = false, Some("another needle appears"))))
      q.processAllAvailable()
      assert(searchable(0L) == 1) // first batch: one matching doc
      assert(searchable(1L) == 1) // second batch: its own matching doc
    } finally q.stop()
  }
}
