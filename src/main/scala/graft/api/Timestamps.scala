package graft.api

/** The reference's `Timestamped` wire codec (SURVEY §2.7 F13;
  * crates/vector-store/src/timestamp.rs:13-151): a 63-bit count of
  * 100-nanosecond ticks since the UNIX epoch, with the MSB reserved as the
  * tombstone flag (timestamp.rs: `Timestamped`, MSB internal use).
  *
  * Inside the Spark engine we carry `(writetime: LONG micros, tombstone:
  * BOOLEAN)` columns — columnar, filter-friendly — and use this codec only
  * at interop boundaries (ingesting reference-encoded state, emitting it).
  */
object Timestamps {

  /** Max representable tick count (u64 >> 1 in the reference; we hold ticks
    * in a Long, whose non-negative range is exactly the reference's 63-bit
    * space). */
  val MaxTicks: Long = Long.MaxValue
  val MaxMicros: Long = MaxTicks / 10

  private val TombstoneBit: Long = Long.MinValue // MSB of the 64-bit word

  /** micros → saturating 100-ns ticks (timestamp.rs from_micros). */
  def ticksFromMicros(micros: Long): Long = {
    val m = if (micros < 0) 0L else micros
    if (m > MaxMicros) MaxTicks else m * 10
  }

  def ticksToMicros(ticks: Long): Long = (ticks & MaxTicks) / 10

  /** Encode (ticks, tombstone) into the single 64-bit word (MSB = tombstone). */
  def encode(ticks: Long, tombstone: Boolean): Long = {
    val t = if (ticks < 0) 0L else ticks
    if (tombstone) t | TombstoneBit else t
  }

  def isTombstone(encoded: Long): Boolean = (encoded & TombstoneBit) != 0
  def ticksOf(encoded: Long): Long = encoded & MaxTicks

  /** Decode to (micros, tombstone). */
  def decode(encoded: Long): (Long, Boolean) =
    (ticksToMicros(encoded), isTombstone(encoded))
}
