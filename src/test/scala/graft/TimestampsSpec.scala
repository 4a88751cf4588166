package graft

import graft.api.Timestamps
import org.scalatest.funsuite.AnyFunSuite

/** Timestamped codec vs timestamp.rs:13-151: 100-ns ticks, MSB tombstone,
  * saturating conversions. */
class TimestampsSpec extends AnyFunSuite {

  test("micros ↔ ticks round trip, 10 ticks per micro") {
    assert(Timestamps.ticksFromMicros(1L) == 10L)
    assert(Timestamps.ticksToMicros(10L) == 1L)
    val wt = 1706500487905753L
    assert(Timestamps.ticksToMicros(Timestamps.ticksFromMicros(wt)) == wt)
  }

  test("saturation at the 63-bit boundary") {
    assert(Timestamps.ticksFromMicros(Long.MaxValue) == Timestamps.MaxTicks)
    assert(Timestamps.ticksFromMicros(-5L) == 0L)
  }

  test("MSB tombstone flag: encode/decode, ordering preserved for live values") {
    val enc = Timestamps.encode(12345L, tombstone = true)
    assert(Timestamps.isTombstone(enc))
    assert(Timestamps.ticksOf(enc) == 12345L)
    assert(Timestamps.decode(enc) == ((1234L, true)))
    val live = Timestamps.encode(12345L, tombstone = false)
    assert(!Timestamps.isTombstone(live))
    assert(live == 12345L) // live encoding is the raw tick count
    // live encodings compare like their timestamps
    assert(Timestamps.encode(1L, false) < Timestamps.encode(2L, false))
  }
}
