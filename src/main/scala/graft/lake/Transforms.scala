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
    * column expression (timestamps are cast to LTZ micros under the UTC
    * session, so NTZ and LTZ sources agree). */
  def expr(transform: String, source: Column, sourceType: DataType): Column = {
    def micros: Column = unix_micros(source.cast(TimestampType))
    transform match {
      case "identity" => source
      case "days"     => floor(micros.cast(DoubleType) / lit(MicrosPerDay.toDouble)).cast(LongType)
      case "hours"    => floor(micros.cast(DoubleType) / lit(MicrosPerHour.toDouble)).cast(LongType)
      case "months"   => ((year(source) - lit(1970)) * lit(12) + month(source) - lit(1)).cast(LongType)
      case "years"    => (year(source) - lit(1970)).cast(LongType)
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
}
