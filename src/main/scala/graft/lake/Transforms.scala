package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hidden-partitioning transforms (ref: Berlin Buzzwords 2023.ipynb:105
  * `days(tpep_pickup_datetime)`, `:285` `hours(...)`, Java API.ipynb:83-86
  * `.hour(...).identity(...)`). Transform outputs are Iceberg-style integer
  * ordinals (days/hours since epoch, months since 1970-01) so partition
  * pruning is integer range math regardless of the source column type. */
object Transforms {
  val MicrosPerHour: Long = 3600L * 1000000L
  val MicrosPerDay: Long = 24L * MicrosPerHour

  private val Bucket = """bucket\[(\d+)\]""".r

  /** Column expression computing the transform over the *logical* source
    * column expression. All ordinals are computed in UTC regardless of the
    * session timezone — the prune side ([[applyToMicros]]) is pure UTC
    * math, and a session-tz-dependent write ordinal would mis-prune under
    * any non-UTC session (a 2024-03-01T02:00Z row is Feb 29 in New York:
    * `year()`/`month()` on timestamps use the SESSION zone). Date-typed
    * sources extract fields directly (DateType has no timezone); timestamp
    * sources go through their absolute epoch-micros. (NTZ sources cast
    * through LTZ using the session zone — under the UTC session NTZ and
    * LTZ agree, same caveat as before.) */
  def expr(transform: String, source: Column, sourceType: DataType): Column = {
    def micros: Column = unix_micros(source.cast(TimestampType))
    def dayOrdinal: Column = sourceType match {
      case DateType => datediff(source, to_date(lit("1970-01-01"))).cast(LongType)
      case _ => floor(micros.cast(DoubleType) / lit(MicrosPerDay.toDouble)).cast(LongType)
    }
    // the instant's UTC calendar date — DateType field extraction is
    // timezone-free, unlike year()/month() on timestamps
    def utcDate: Column = sourceType match {
      case DateType => source
      case _ => date_add(to_date(lit("1970-01-01")), dayOrdinal.cast(IntegerType))
    }
    transform match {
      case "identity" => source
      case "days"     => dayOrdinal
      case "hours"    => sourceType match {
        case DateType => (dayOrdinal * lit(24L)).cast(LongType)
        case _ => floor(micros.cast(DoubleType) / lit(MicrosPerHour.toDouble)).cast(LongType)
      }
      case "months"   => ((year(utcDate) - lit(1970)) * lit(12) + month(utcDate) - lit(1)).cast(LongType)
      case "years"    => (year(utcDate) - lit(1970)).cast(LongType)
      case Bucket(n)  => pmod(hash(source), lit(n.toInt)).cast(LongType)
      case other      => throw new IllegalArgumentException(s"unknown transform: $other")
    }
  }

  /** Apply the transform to a literal value (for predicate → partition-range
    * conversion in pruning). `v` is the external Scala value of the source
    * column type; timestamps are epoch-micros Long. */
  def applyToMicros(transform: String, micros: Long): Long = transform match {
    case "days"   => Math.floorDiv(micros, MicrosPerDay)
    case "hours"  => Math.floorDiv(micros, MicrosPerHour)
    case "months" =>
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC)
      (ldt.getYear - 1970).toLong * 12 + (ldt.getMonthValue - 1)
    case "years" =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC).getYear - 1970L
    case other => throw new IllegalArgumentException(s"not a time transform: $other")
  }

  def isTimeTransform(t: String): Boolean =
    t == "days" || t == "hours" || t == "months" || t == "years"

  /** bucket[N] → N, else None. */
  def bucketCount(t: String): Option[Int] = t match {
    case Bucket(n) => Some(n.toInt)
    case _ => None
  }

  /** Bucket ordinal of an EXTERNAL literal under the write-side transform
    * (`pmod(hash(col), n)` — Spark murmur3, seed 42): the point-predicate
    * half of bucket partition pruning. None when the value can't be
    * faithfully hashed as the column's type (no pruning, never a wrong
    * prune). */
  def bucketOf(v: Any, dt: DataType, n: Int): Option[Long] =
    try {
      if (v == null) return None
      val widened = (v, dt) match {
        case (x: java.lang.Integer, LongType) => x.longValue()
        case (x: java.lang.Short, LongType) => x.longValue()
        case (x: java.lang.Short, IntegerType) => x.intValue()
        case _ => v
      }
      val internal = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(dt)(widened)
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(internal, dt, 42L).toInt
      Some((((h % n) + n) % n).toLong)
    } catch { case _: Exception => None }
}
