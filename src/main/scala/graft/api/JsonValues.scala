package graft.api

import java.time.{LocalDate, LocalTime, OffsetDateTime}
import java.time.format.DateTimeFormatter

/** JSON-boundary value conversions for the 18 CQL native types
  * (SURVEY §2.7 F7/F8).
  *
  * Mirrors the reference exactly:
  *  - `try_from_json` (httproutes.rs:1327-1477): strict typing — a JSON
  *    string only converts to string-ish/temporal/blob/varint/decimal types,
  *    a number only to numeric types (with range checks), a bool only to
  *    boolean; anything else is a [[JsonValueException]] (HTTP 400), never a
  *    silent coercion. CQL's space-separated timestamps are normalized to
  *    ISO 'T' only after a YYYY-MM-DD prefix (httproutes.rs:1358-1366).
  *  - `try_to_json` (httproutes.rs:1271-1325): blob → 0x-hex, varint/decimal
  *    → decimal string, timestamp → ISO-8601 with ms precision, date/time →
  *    ISO strings.
  *
  * Values land as Scala types that `lit()` maps onto the SURVEY §1.2 Spark
  * column types (time → Long nanos-of-day, uuid/timeuuid/inet → canonical
  * strings, varint → BigDecimal scale 0, decimal → BigDecimal).
  */
final class JsonValueException(msg: String) extends IllegalArgumentException(msg)

object JsonValues {

  sealed abstract class NativeType(val name: String)
  case object Ascii extends NativeType("ascii")
  case object Text extends NativeType("text")
  case object TinyIntT extends NativeType("tinyint")
  case object SmallIntT extends NativeType("smallint")
  case object IntT extends NativeType("int")
  case object BigIntT extends NativeType("bigint")
  case object FloatT extends NativeType("float")
  case object DoubleT extends NativeType("double")
  case object BooleanT extends NativeType("boolean")
  case object DateT extends NativeType("date")
  case object TimeT extends NativeType("time")
  case object TimestampT extends NativeType("timestamp")
  case object UuidT extends NativeType("uuid")
  case object TimeuuidT extends NativeType("timeuuid")
  case object BlobT extends NativeType("blob")
  case object InetT extends NativeType("inet")
  case object VarintT extends NativeType("varint")
  case object DecimalT extends NativeType("decimal")

  private def fail(msg: String): Nothing = throw new JsonValueException(msg)

  private val CqlTimestampSpace = "^(\\d{4}-\\d{2}-\\d{2}) ".r

  /** JSON value (String | Boolean | Number as Double/Long/BigDecimal) →
    * typed Scala value for the given CQL native type. */
  def fromJson(value: Any, t: NativeType): Any = (value, t) match {
    // ---- strings ----
    case (s: String, Ascii) =>
      if (s.forall(_ < 128)) s else fail(s"non-ASCII characters in ascii value")
    case (s: String, Text) => s
    case (s: String, UuidT) =>
      try java.util.UUID.fromString(s).toString
      catch { case e: Exception => fail(s"Failed to parse UUID from string '$s': $e") }
    case (s: String, TimeuuidT) =>
      val u = try java.util.UUID.fromString(s)
      catch { case e: Exception => fail(s"Failed to parse TimeUUID from string '$s': $e") }
      if (u.version != 1) fail(s"TimeUUID must be version 1, got version ${u.version}")
      u.toString
    case (s: String, DateT) =>
      try java.sql.Date.valueOf(LocalDate.parse(s, DateTimeFormatter.ISO_LOCAL_DATE))
      catch { case e: Exception => fail(s"Failed to parse Date from string '$s': $e") }
    case (s: String, TimeT) =>
      val body = if (s.startsWith("T")) s.substring(1) else s
      try LocalTime.parse(body, DateTimeFormatter.ISO_LOCAL_TIME).toNanoOfDay
      catch { case e: Exception => fail(s"Failed to parse Time from string '$s': $e") }
    case (s: String, TimestampT) =>
      // CQL allows '2024-01-01 00:00:00Z'; normalize the space only at the
      // date-time boundary (httproutes.rs:1358-1366). A date-only value is a
      // valid CQL timestamp meaning midnight UTC — VECTOR-593 regression
      // (validator/src/filtering.rs local_ann_with_timestamp_gte_filter).
      val dated =
        if (s.matches("^\\d{4}-\\d{2}-\\d{2}$")) s + "T00:00:00.000Z" else s
      val normalized = CqlTimestampSpace.replaceFirstIn(dated, "$1T")
      try java.sql.Timestamp.from(OffsetDateTime.parse(normalized).toInstant)
      catch { case e: Exception => fail(s"Failed to parse Timestamp from string '$s': $e") }
    case (s: String, BlobT) =>
      if (!s.startsWith("0x")) fail("Blob value must be a '0x'-prefixed hex string")
      val hex = s.substring(2)
      if (hex.length % 2 != 0 || !hex.forall(c => Character.digit(c, 16) >= 0))
        fail(s"Invalid hex in blob value: $s")
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    case (s: String, InetT) =>
      // strict literal parse, never a DNS lookup (httproutes.rs inet
      // conversion): dotted-quad IPv4 validated octet-by-octet; IPv6 only
      // when the string cannot be a hostname (hex digits + colons)
      val ipv4 = "^(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})$".r
      // Rust's IpAddr grammar: leading-zero octets are invalid ('010.0.0.1'
      // is NOT 10.0.0.1), and IPv6 may end with an embedded dotted quad
      // ('::ffff:1.2.3.4') subject to the same octet rules
      def validQuad(quad: Seq[String]): Boolean = quad.forall(p =>
        p.toInt <= 255 && !(p.length > 1 && p.startsWith("0")))
      val mappedV6 = "^[0-9a-fA-F:]+:((?:\\d{1,3}\\.){3}\\d{1,3})$".r
      s match {
        case ipv4(a, b, c, d) =>
          if (validQuad(Seq(a, b, c, d))) Seq(a, b, c, d).map(_.toInt).mkString(".")
          else fail(s"Failed to parse inet from string '$s': invalid octet")
        case mappedV6(quad) if validQuad(quad.split('.').toSeq) =>
          // Rust's Ipv6Addr Display keeps the mapped form ("::ffff:1.2.3.4");
          // Java normalizes an Inet4Address to bare dotted-quad — re-prefix
          // so equal addresses canonicalize identically to the reference
          try java.net.InetAddress.getByName(s) match {
            case v4: java.net.Inet4Address => "::ffff:" + v4.getHostAddress
            case other => other.getHostAddress
          } catch { case e: Exception => fail(s"Failed to parse inet from string '$s': $e") }
        case _ if s.contains(":") && s.matches("^[0-9a-fA-F:]+$") =>
          try java.net.InetAddress.getByName(s).getHostAddress
          catch { case e: Exception => fail(s"Failed to parse inet from string '$s': $e") }
        case _ => fail(s"Failed to parse inet from string '$s'")
      }
    case (s: String, VarintT) =>
      try BigDecimal(BigInt(s))
      catch { case e: Exception => fail(s"Failed to parse Varint from string '$s': $e") }
    case (s: String, DecimalT) =>
      try BigDecimal(s)
      catch { case e: Exception => fail(s"Failed to parse Decimal from string '$s': $e") }
    case (_: String, other) => fail(s"Cannot convert string to ${other.name}")

    // ---- booleans ----
    case (b: Boolean, BooleanT) => b
    case (_: Boolean, other) => fail(s"Cannot convert bool to ${other.name}")

    // ---- numbers ----
    case (n: Number, t) => fromNumber(n, t)

    case (v, t) => fail(s"Cannot convert JSON value '$v' to ${t.name}")
  }

  private def fromNumber(n: Number, t: NativeType): Any = {
    def asLongExact: Long = n match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
      case d: java.lang.Double if d == d.longValue().toDouble => d.longValue()
      case bd: java.math.BigDecimal if bd.scale() <= 0 => bd.longValueExact()
      case other => fail(s"Expected integer, got $other")
    }
    t match {
      case DoubleT => n.doubleValue()
      case FloatT =>
        val d = n.doubleValue()
        if (!d.isFinite || d < Float.MinValue.toDouble || d > Float.MaxValue.toDouble)
          fail("Expected f32 for float: value out of range")
        d.toFloat
      case IntT =>
        val l = asLongExact
        if (l < Int.MinValue || l > Int.MaxValue) fail(s"Expected i32 for int: $l out of range")
        l.toInt
      case BigIntT => asLongExact
      case SmallIntT =>
        val l = asLongExact
        if (l < Short.MinValue || l > Short.MaxValue) fail(s"Expected i16 for smallint: $l out of range")
        l.toShort
      case TinyIntT =>
        val l = asLongExact
        if (l < Byte.MinValue || l > Byte.MaxValue) fail(s"Expected i8 for tinyint: $l out of range")
        l.toByte
      case VarintT =>
        // integer only; reject fractional numbers (httproutes.rs:1455-1462).
        // CQL varint is ARBITRARY precision — values beyond i64 (the
        // serde.rs varint filter uses -98765432109876543210) must not be
        // squeezed through a long.
        n match {
          case d: java.lang.Double if d != math.floor(d) => fail("Varint is always an integer")
          case bd: java.math.BigDecimal =>
            if (bd.stripTrailingZeros.scale > 0) fail("Varint is always an integer")
            else BigDecimal(new java.math.BigDecimal(bd.toBigIntegerExact))
          case _ => BigDecimal(asLongExact)
        }
      case DecimalT => BigDecimal(n.toString)
      case other => fail(s"Cannot convert number to ${other.name}")
    }
  }

  private val TimestampFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .withZone(java.time.ZoneOffset.UTC)

  /** Typed value → JSON-layer representation (String for string-encoded
    * types, Boolean, or Number), matching try_to_json. */
  def toJson(value: Any, t: NativeType): Any = (value, t) match {
    case (null, _) => null
    case (s: String, Ascii | Text | UuidT | TimeuuidT | InetT) => s
    case (b: Boolean, BooleanT) => b
    case (n: Number, TinyIntT | SmallIntT | IntT | BigIntT) => n.longValue()
    case (n: Number, FloatT | DoubleT) =>
      val d = n.doubleValue()
      if (!d.isFinite) fail(s"${t.name} should be finite")
      d
    case (d: java.sql.Date, DateT) => d.toLocalDate.toString
    case (l: Long, TimeT) => LocalTime.ofNanoOfDay(l).format(DateTimeFormatter.ISO_LOCAL_TIME)
    case (ts: java.sql.Timestamp, TimestampT) => TimestampFmt.format(ts.toInstant)
    case (b: Array[Byte], BlobT) => "0x" + b.map("%02x".format(_)).mkString
    case (bd: BigDecimal, VarintT) => bd.toBigInt.toString
    case (bd: BigDecimal, DecimalT) => bd.bigDecimal.toPlainString
    case (v, t) => fail(s"Cannot serialize $v as ${t.name}")
  }
}
