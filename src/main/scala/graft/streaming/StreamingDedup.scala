package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication: the continuous analogue of
  * [[graft.operators.Dedup.exact]] — a document stream deduplicated by
  * content digest as it arrives, so downstream index maintenance and
  * training-data sinks only ever see first occurrences.
  *
  * This is CONTENT dedup (same text, any id, any time), distinct from
  * [[StreamingIngest.withDedup]]'s delivery dedup (same key+ts redelivered
  * within the watermark window).
  *
  * Scale notes (100 TB stream):
  *  - state is one boolean entry per distinct digest, partitioned by digest
  *    hash across executors — the streaming state store (RocksDB-backed in
  *    a cluster deployment) holds it off-heap/on-disk, and state never
  *    carries the document payload, only the 128-bit digest key;
  *  - the digest is computed BEFORE the stateful shuffle, so the exchange
  *    carries (digest, id) + payload once, exactly like the batch
  *    operator's (digest, id) shuffle;
  *  - emission is append-mode: a doc is emitted iff its digest was unseen,
  *    so replays of an already-processed batch emit nothing (idempotent
  *    sink contract, same as the LWW replay guarantee).
  */
object StreamingDedup {

  final case class Doc(id: Long, text: String)
  final case class DigestedDoc(digest: String, id: Long, text: String)

  /** Digest a typed document stream. md5 over the content — the same
    * digest [[graft.operators.Dedup.exact]] groups on. */
  def digested(docs: Dataset[Doc]): Dataset[DigestedDoc] = {
    val spark: SparkSession = docs.sparkSession
    import spark.implicits._
    docs.select(md5(col("text")).as("digest"), col("id"), col("text"))
      .as[DigestedDoc]
  }

  /** First-seen-wins streaming dedup: emits each distinct digest's first
    * arrival (ties within a micro-batch broken by min id — deterministic
    * under replay, matching the batch operator's min(id) survivor rule). */
  def firstSeen(docs: Dataset[Doc]): Dataset[DigestedDoc] = {
    val spark: SparkSession = docs.sparkSession
    import spark.implicits._
    digested(docs)
      .groupByKey(_.digest)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[DigestedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // min-id arrival wins within the batch, like Dedup.exact
            Iterator(it.minBy(_.id))
          }
      }
  }
}
