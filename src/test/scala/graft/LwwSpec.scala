package graft

import graft.operators.Lww
import org.apache.spark.sql.functions._

/** LWW truth-table tests vs reference `table/mod.rs:616-1003`
  * (compare_timestamps / UpdateWork / update_index). */
class LwwSpec extends SparkSpec {
  import spark.implicits._

  // (op, pk, embedding, part, ts, seq)
  private def compact(rows: (String, Int, Seq[Float], Int, Long, Long)*) =
    Lww.compactState(
      rows.toDF("op", "pk", "embedding", "part", "ts", "seq"),
      pkCols = Seq("pk"), tsCol = "ts",
      opCol = Some("op"), targetCol = Some("embedding"), seqCol = Some("seq"))

  private def live(rows: (String, Int, Seq[Float], Int, Long, Long)*) =
    compact(rows: _*).filter(!col(Lww.TombstoneCol))

  private val v1 = Seq(1f, 0f)
  private val v2 = Seq(0f, 1f)
  private val v3 = Seq(1f, 1f)

  test("newer timestamp wins; stale event dropped") {
    val r = live(
      ("UPSERT", 1, v1, 10, 100L, 0L),
      ("UPSERT", 1, v2, 10, 300L, 1L),
      ("UPSERT", 1, v3, 10, 200L, 2L)) // stale vs ts=300
      .select("pk", "embedding").as[(Int, Seq[Float])].collect()
    assert(r.toSeq == Seq((1, v2)))
  }

  test("equal timestamp: first-arriving event wins (mod.rs:905-910)") {
    val r = live(
      ("UPSERT", 1, v1, 10, 100L, 5L),
      ("UPSERT", 1, v2, 10, 100L, 9L)) // same ts, arrives later ⇒ ignored
      .select("embedding").as[Seq[Float]].collect()
    assert(r.toSeq == Seq(v1))
  }

  test("delete tombstones a row; newer reinsert revives it") {
    assert(live(
      ("UPSERT", 1, v1, 10, 100L, 0L),
      ("DELETE", 1, null, 10, 200L, 1L)).count() == 0)
    val revived = live(
      ("UPSERT", 1, v1, 10, 100L, 0L),
      ("DELETE", 1, null, 10, 200L, 1L),
      ("UPSERT", 1, v3, 10, 300L, 2L))
      .select("embedding").as[Seq[Float]].collect()
    assert(revived.toSeq == Seq(v3))
  }

  test("stale delete does not kill a newer upsert") {
    val r = live(
      ("UPSERT", 1, v1, 10, 300L, 1L),
      ("DELETE", 1, null, 10, 200L, 0L))
      .select("embedding").as[Seq[Float]].collect()
    assert(r.toSeq == Seq(v1))
  }

  test("upsert with null target value is a tombstone (mod.rs:912-915)") {
    val st = compact(
      ("UPSERT", 1, v1, 10, 100L, 0L),
      ("UPSERT", 1, null, 10, 200L, 1L))
    assert(st.count() == 1)
    assert(st.filter(col(Lww.TombstoneCol)).count() == 1)
  }

  test("partition movement: membership recomputed from compacted state (ST4)") {
    val events = Seq(
      ("UPSERT", 1, v1, 10, 100L, 0L),
      ("UPSERT", 2, v2, 10, 100L, 1L),
      ("UPSERT", 1, v1, 20, 200L, 2L)) // pk 1 moves partition 10 → 20
    val liveDf = live(events: _*)
    val sizes = Lww.partitionSizes(liveDf, Seq("part"))
      .as[(Int, Long)].collect().toMap
    assert(sizes == Map(10 -> 1L, 20 -> 1L))
    // emptied partition disappears entirely
    val afterMove2 = live((events :+ (("UPSERT", 2, v2, 30, 300L, 3L))): _*)
    val sizes2 = Lww.partitionSizes(afterMove2, Seq("part"))
      .as[(Int, Long)].collect().toMap
    assert(sizes2 == Map(20 -> 1L, 30 -> 1L)) // partition 10 removed
  }

  test("compaction is insensitive to event order (idempotent replay, ST3)") {
    val events = Seq(
      ("UPSERT", 1, v1, 10, 100L, 0L),
      ("DELETE", 1, null, 10, 250L, 1L),
      ("UPSERT", 1, v2, 10, 200L, 2L),
      ("UPSERT", 2, v3, 10, 150L, 3L),
      ("UPSERT", 2, v1, 20, 150L, 4L)) // same ts as seq=3, later arrival
    val expected = compact(events: _*).orderBy("pk")
      .select("pk", "embedding", Lww.TombstoneCol, Lww.TsCol)
      .collect().toSeq
    for (perm <- Seq(events.reverse, events.sortBy(_._5), scala.util.Random.shuffle(events))) {
      val got = compact(perm: _*).orderBy("pk")
        .select("pk", "embedding", Lww.TombstoneCol, Lww.TsCol)
        .collect().toSeq
      assert(got == expected)
    }
  }

  test("applyChanges: merge into base; replay of applied changes is a no-op") {
    val base = Lww.compactState(
      Seq(("UPSERT", 1, v1, 10, 100L, 0L), ("UPSERT", 2, v2, 10, 150L, 1L))
        .toDF("op", "pk", "embedding", "part", "ts", "seq"),
      Seq("pk"), "ts", Some("op"), Some("embedding"), Some("seq"))
    val changes = Seq(
      ("UPSERT", 1, v3, 10, 200L, 2L), // newer: wins
      ("UPSERT", 2, v3, 10, 120L, 3L), // stale: ignored
      ("DELETE", 3, null, 10, 180L, 4L)) // delete of unknown pk: tombstone row
      .toDF("op", "pk", "embedding", "part", "ts", "seq")
    def apply1(b: org.apache.spark.sql.DataFrame) =
      Lww.applyChanges(b, changes, Seq("pk"), "ts", Some("op"), Some("embedding"), Some("seq"))
    val once = apply1(base)
    val liveOnce = once.filter(!col(Lww.TombstoneCol))
      .select("pk", "embedding").as[(Int, Seq[Float])].collect().toSet
    assert(liveOnce == Set((1, v3), (2, v2)))
    // idempotence: re-applying the same change batch changes nothing
    val twice = apply1(once)
    assert(twice.orderBy("pk").collect().toSeq == once.orderBy("pk").collect().toSeq)
  }

  test("null op with a live payload is an upsert, not a delete (three-valued-null guard)") {
    val ev = Seq(
      (Option("UPSERT"), 1, Option(Seq(1f)), 100L, 0L),
      (Option.empty[String], 1, Option(Seq(2f)), 200L, 1L), // null op, newer: must UPSERT
      (Option.empty[String], 2, Option(Seq(3f)), 100L, 2L)) // null op only ever seen
      .toDF("op", "pk", "embedding", "ts", "seq")
    val state = Lww.compactState(ev, Seq("pk"), "ts", Some("op"), Some("embedding"), Some("seq"))
    val live = state.filter(!col(Lww.TombstoneCol))
      .select("pk", "embedding").as[(Int, Seq[Float])].collect().toSet
    assert(live == Set((1, Seq(2f)), (2, Seq(3f))))
  }
}
