package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** File-level pruning over per-file column stats and hidden-partition values.
  *
  * This is the scan-planning half of what the reference's stack gets from
  * Iceberg manifests ("Simple predicates in WHERE clauses are automatically
  * converted to partition filters that prune out files" — Getting
  * Started.ipynb:317, cell 26; PyIceberg `row_filter` pruning —
  * PyIceberg….ipynb:174). Spark still applies row-group/page pruning inside
  * the files we do hand it; this layer keeps whole files out of the scan,
  * which is the part that matters at 100 TB.
  *
  * Three-valued semantics per file:
  *   - `mayMatch`: some row might satisfy the predicate (false → skip file)
  *   - `allMatch`: provably every row satisfies it (true → for DELETE, the
  *     whole file can be dropped metadata-only — Getting Started.ipynb c20)
  */
object Pruning {

  sealed trait Pred
  final case class Eq(col: String, v: Any) extends Pred
  final case class Lt(col: String, v: Any) extends Pred
  final case class LtE(col: String, v: Any) extends Pred
  final case class Gt(col: String, v: Any) extends Pred
  final case class GtE(col: String, v: Any) extends Pred
  final case class In(col: String, vs: Seq[Any]) extends Pred
  final case class IsNull(col: String) extends Pred
  final case class NotNull(col: String) extends Pred
  final case class And(l: Pred, r: Pred) extends Pred
  final case class Or(l: Pred, r: Pred) extends Pred
  final case class Not(p: Pred) extends Pred
  /** Untranslatable subtree: mayMatch=true, allMatch=false. */
  case object Unknown extends Pred

  /** Translate a user Column's expression into our Pred ADT (conservative:
    * anything unrecognized becomes Unknown). Mirrors DSv2 filter pushdown. */
  def translate(c: Column): Pred =
    translateExpr(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c))

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case UnresolvedAttributeLike(n) => Some(n)
    case _ => None
  }

  /** Unresolved attributes appear when the Column was built standalone
    * (e.g. col("ts") > lit(...)), which is the common case for our scan API. */
  private object UnresolvedAttributeLike {
    def unapply(e: Expression): Option[String] = e match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(u.name)
      case _ => None
    }
  }

  private def litValue(e: Expression): Option[Any] = e match {
    case l: Literal => Some(CatalystTypeConverters.convertToScala(l.value, l.dataType))
    case Cast(l: Literal, dt, _, _) =>
      // fold the cast so `ts >= TIMESTAMP '...'` style predicates translate
      try Some(CatalystTypeConverters.convertToScala(Cast(l, dt).eval(null), dt))
      catch { case _: Throwable => None }
    case _ => None
  }

  private def translateExpr(e: Expression): Pred = e match {
    case EqualTo(a, b) => asym(a, b, Eq.apply, Eq.apply)
    case LessThan(a, b) => asym(a, b, Lt.apply, Gt.apply)
    case LessThanOrEqual(a, b) => asym(a, b, LtE.apply, GtE.apply)
    case GreaterThan(a, b) => asym(a, b, Gt.apply, Lt.apply)
    case GreaterThanOrEqual(a, b) => asym(a, b, GtE.apply, LtE.apply)
    case org.apache.spark.sql.catalyst.expressions.IsNull(a) =>
      attrName(a).map(IsNull.apply).getOrElse(Unknown)
    case org.apache.spark.sql.catalyst.expressions.IsNotNull(a) =>
      attrName(a).map(NotNull.apply).getOrElse(Unknown)
    case org.apache.spark.sql.catalyst.expressions.In(a, list) =>
      (attrName(a), list.map(litValue)) match {
        case (Some(n), vs) if vs.forall(_.isDefined) => In(n, vs.map(_.get))
        case _ => Unknown
      }
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      And(translateExpr(l), translateExpr(r))
    case org.apache.spark.sql.catalyst.expressions.Or(l, r) =>
      Or(translateExpr(l), translateExpr(r))
    case org.apache.spark.sql.catalyst.expressions.Not(p) => Not(translateExpr(p))
    // Columns built with the public API (col("a") >= lit(v)) arrive as
    // *unresolved* function calls in Spark 4 — resolve the common ones by name.
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      val name = u.nameParts.last.toLowerCase(java.util.Locale.ROOT)
      (name, u.arguments) match {
        case ("=" | "==", Seq(a, b)) => asym(a, b, Eq.apply, Eq.apply)
        case ("<", Seq(a, b)) => asym(a, b, Lt.apply, Gt.apply)
        case ("<=", Seq(a, b)) => asym(a, b, LtE.apply, GtE.apply)
        case (">", Seq(a, b)) => asym(a, b, Gt.apply, Lt.apply)
        case (">=", Seq(a, b)) => asym(a, b, GtE.apply, LtE.apply)
        case ("isnull", Seq(a)) => attrName(a).map(IsNull.apply).getOrElse(Unknown)
        case ("isnotnull", Seq(a)) => attrName(a).map(NotNull.apply).getOrElse(Unknown)
        case ("and", Seq(a, b)) => And(translateExpr(a), translateExpr(b))
        case ("or", Seq(a, b)) => Or(translateExpr(a), translateExpr(b))
        case ("!" | "not", Seq(a)) => Not(translateExpr(a))
        case ("in", a +: rest) =>
          (attrName(a), rest.map(litValue)) match {
            case (Some(n), vs) if vs.nonEmpty && vs.forall(_.isDefined) => In(n, vs.map(_.get))
            case _ => Unknown
          }
        case _ => Unknown
      }
    case _ => Unknown
  }

  private def asym(a: Expression, b: Expression,
                   direct: (String, Any) => Pred,
                   flipped: (String, Any) => Pred): Pred =
    (attrName(a), litValue(b), attrName(b), litValue(a)) match {
      case (Some(n), Some(v), _, _) => direct(n, v)
      case (_, _, Some(n), Some(v)) => flipped(n, v)
      case _ => Unknown
    }

  // ---- value ordering ----------------------------------------------------

  /** Normalize an external value to an orderable Long/Double/String/Boolean. */
  def norm(v: Any): Any = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000
    // full micros, NOT toEpochMilli*1000 (which truncates sub-ms and
    // would prune files containing exact sub-millisecond matches)
    case l: java.time.LocalDateTime =>
      l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case f: Float => f.toDouble
    case d: Double => d
    case d: java.math.BigDecimal => d.doubleValue
    case d: BigDecimal => d.doubleValue
    case other => other
  }

  /** Decode a string-encoded stat bound into the same normalized domain. */
  def decodeStat(s: String, dt: DataType): Any = dt match {
    case ByteType | ShortType | IntegerType | LongType => s.toLong
    case FloatType | DoubleType => s.toDouble
    case _: DecimalType => s.toDouble
    case TimestampType | TimestampNTZType => s.toLong // epoch micros
    case DateType => s.toLong // epoch days
    case BooleanType => s.toBoolean
    case StringType => s
    case _ => s
  }

  /** Identity partition values ride in DIRECTORY-string form (what the
    * write path parses from `key=value` dirs and `add_files` parses from
    * hive layouts): dates are ISO strings there, unlike the epoch-day
    * stat encoding. */
  def decodePartitionValue(s: String, dt: DataType): Any = dt match {
    case DateType =>
      scala.util.Try(java.time.LocalDate.parse(s).toEpochDay.toLong)
        .getOrElse(s.toLong)
    case other => decodeStat(s, other)
  }

  def compare(a: Any, b: Any): Option[Int] = (norm(a), norm(b)) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Double) => Some(java.lang.Double.compare(x.toDouble, y))
    case (x: Double, y: Long) => Some(java.lang.Double.compare(x, y.toDouble))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  // ---- three-valued evaluation over one file's stats ----------------------

  /** Stats access for one file, with logical→physical column resolution. */
  final case class FileBounds(
      rowCount: Long,
      /** logical column name → (stat, sparkType). */
      cols: Map[String, (ColStat, DataType)],
      /** logical column name → set of partition transform values, e.g.
        * ("days", 19723L) meaning every row's days(col) == 19723. */
      partition: Map[String, (String, String)],
      /** logical column name → the partition SOURCE column's type — the
        * decode key when the file has no footer stats for the column
        * (hive-layout imports store identity values only in the path). */
      partitionTypes: Map[String, DataType] = Map.empty)

  /** Could any row in the file satisfy `p`? (false ⇒ prune the file) */
  def mayMatch(p: Pred, f: FileBounds): Boolean = p match {
    case Unknown => true
    case And(l, r) => mayMatch(l, f) && mayMatch(r, f)
    case Or(l, r) => mayMatch(l, f) || mayMatch(r, f)
    case Not(q) => !allMatch(q, f)
    case IsNull(c) => f.cols.get(c).forall(_._1.nullCount > 0)
    case NotNull(c) => f.cols.get(c).forall(s => s._1.nullCount < f.rowCount)
    case Eq(c, v) => boundsOverlap(c, v, v, f)
    case In(c, vs) => vs.exists(v => boundsOverlap(c, v, v, f))
    case Lt(c, v) => lowerBelow(c, v, f, strict = true)
    case LtE(c, v) => lowerBelow(c, v, f, strict = false)
    case Gt(c, v) => upperAbove(c, v, f, strict = true)
    case GtE(c, v) => upperAbove(c, v, f, strict = false)
  }

  /** Does provably every row in the file satisfy `p`? (true ⇒ for DELETE the
    * file can be dropped without rewrite) */
  def allMatch(p: Pred, f: FileBounds): Boolean = p match {
    case Unknown => false
    case And(l, r) => allMatch(l, f) && allMatch(r, f)
    case Or(l, r) => allMatch(l, f) || allMatch(r, f)
    // NOT(q) holds for a row only when q is FALSE there — not when q is NULL.
    // !mayMatch proves no row makes q TRUE; we must also prove q never
    // evaluates NULL (else null-rows would be wrongly dropped by the
    // metadata-only DELETE fast path).
    case Not(q) => !mayMatch(q, f) && nullFree(q, f)
    case IsNull(c) => f.cols.get(c).exists(s => s._1.nullCount >= f.rowCount)
    case NotNull(c) => f.cols.get(c).exists(_._1.nullCount == 0L)
    case Eq(c, v) => noNulls(c, f) && boundsWithin(c, v, v, f)
    case In(c, vs) => noNulls(c, f) && vs.exists(v => boundsWithin(c, v, v, f))
    case Lt(c, v) => noNulls(c, f) && maxRel(c, v, f).exists(_ < 0)
    case LtE(c, v) => noNulls(c, f) && maxRel(c, v, f).exists(_ <= 0)
    case Gt(c, v) => noNulls(c, f) && minRel(c, v, f).exists(_ > 0)
    case GtE(c, v) => noNulls(c, f) && minRel(c, v, f).exists(_ >= 0)
  }

  private def noNulls(c: String, f: FileBounds): Boolean =
    f.cols.get(c).exists(_._1.nullCount == 0L)

  /** Does `p` provably evaluate to a non-NULL boolean on every row of the
    * file? Comparisons are NULL when the column value (or literal) is NULL;
    * IS [NOT] NULL never is. Conservative: Unknown → false. */
  private def nullFree(p: Pred, f: FileBounds): Boolean = p match {
    case Unknown => false
    case And(l, r) => nullFree(l, f) && nullFree(r, f)
    case Or(l, r) => nullFree(l, f) && nullFree(r, f)
    case Not(q) => nullFree(q, f)
    case IsNull(_) | NotNull(_) => true
    case Eq(c, v) => v != null && noNulls(c, f)
    case In(c, vs) => vs.forall(_ != null) && noNulls(c, f)
    case Lt(c, v) => v != null && noNulls(c, f)
    case LtE(c, v) => v != null && noNulls(c, f)
    case Gt(c, v) => v != null && noNulls(c, f)
    case GtE(c, v) => v != null && noNulls(c, f)
  }

  private def bound(c: String, f: FileBounds, min: Boolean): Option[Any] =
    f.cols.get(c).flatMap { case (st, dt) =>
      (if (min) st.min else st.max).map(decodeStat(_, dt))
    }

  /** sign of compare(file.min(c), v) if both known. */
  private def minRel(c: String, v: Any, f: FileBounds): Option[Int] =
    bound(c, f, min = true).flatMap(compare(_, v))
  private def maxRel(c: String, v: Any, f: FileBounds): Option[Int] =
    bound(c, f, min = false).flatMap(compare(_, v))

  /** may: [min,max] ∩ [lo,hi] ≠ ∅ (missing stats ⇒ true). Also consults
    * hidden-partition values for time transforms. */
  private def boundsOverlap(c: String, lo: Any, hi: Any, f: FileBounds): Boolean = {
    val statOk = (minRel(c, hi, f), maxRel(c, lo, f)) match {
      case (Some(a), _) if a > 0 => false // file.min > hi
      case (_, Some(b)) if b < 0 => false // file.max < lo
      case _ => true
    }
    statOk && partitionMay(c, lo, hi, f)
  }

  /** all: min >= lo && max <= hi. */
  private def boundsWithin(c: String, lo: Any, hi: Any, f: FileBounds): Boolean =
    minRel(c, lo, f).exists(_ >= 0) && maxRel(c, hi, f).exists(_ <= 0)

  private def lowerBelow(c: String, v: Any, f: FileBounds, strict: Boolean): Boolean =
    minRel(c, v, f) match {
      case Some(r) => if (strict) r < 0 else r <= 0
      case None => true
    }

  private def upperAbove(c: String, v: Any, f: FileBounds, strict: Boolean): Boolean =
    maxRel(c, v, f) match {
      case Some(r) => if (strict) r > 0 else r >= 0
      case None => true
    }

  /** Hidden-partition check for Eq-style ranges on a time-transformed
    * column: days(col)==D constrains col ∈ [D*day, (D+1)*day).
    *
    * norm() yields epoch-MICROS for timestamp values but epoch-DAYS for
    * date values — convert to micros based on the source column's type
    * before applying the transform, else a days(date_col) table would
    * compare applyToMicros(days, epochDay)≈0 against the stored ordinal
    * and silently prune every file. Unknown source type → no pruning. */
  private def partitionMay(c: String, lo: Any, hi: Any, f: FileBounds): Boolean =
    f.partition.get(c) match {
      // null partition values (rows where the partition source is NULL)
      // are stored as Hive's sentinel — not parseable as a number/date;
      // no range predicate can be vouched against them, so don't prune
      // (and don't crash the scan with NumberFormatException)
      case Some((_, vStr)) if vStr == "__HIVE_DEFAULT_PARTITION__" => true
      case Some((t, vStr)) if Transforms.isTimeTransform(t) =>
        val toMicros: Option[Long => Long] = f.cols.get(c).map(_._2) match {
          case Some(DateType) => Some((d: Long) => d * Transforms.MicrosPerDay)
          case Some(TimestampType) | Some(TimestampNTZType) => Some(identity[Long] _)
          case _ => None
        }
        (toMicros, norm(lo), norm(hi)) match {
          case (Some(fm), l: Long, h: Long) =>
            val pv = vStr.toLong
            Transforms.applyToMicros(t, fm(l)) <= pv && pv <= Transforms.applyToMicros(t, fm(h))
          case _ => true
        }
      case Some(("identity", vStr)) =>
        f.cols.get(c).map(_._2).orElse(f.partitionTypes.get(c)) match {
          case Some(dt) =>
            // identity values are stored in DIRECTORY-string form (dates
            // as ISO strings, not stat-encoded epoch days); an undecodable
            // value vouches nothing rather than crashing the planner
            scala.util.Try {
              val pv = decodePartitionValue(vStr, dt)
              compare(pv, lo).forall(_ >= 0) && compare(pv, hi).forall(_ <= 0)
            }.getOrElse(true)
          case None => true
        }
      // bucket[N] partitions prune POINT predicates only (Eq / In members
      // arrive here with lo == hi): the literal's write-side bucket must
      // equal the file's partition ordinal. Ranges can't prune (hash
      // destroys order), and an unhashable value falls through to "may".
      case Some((t, vStr)) if Transforms.bucketCount(t).isDefined =>
        (f.cols.get(c), Transforms.bucketCount(t)) match {
          case (Some((_, dt)), Some(n)) if compare(lo, hi).contains(0) =>
            Transforms.bucketOf(lo, dt, n) match {
              case Some(b) => vStr.toLong == b
              case None => true
            }
          case _ => true
        }
      case _ => true
    }
}
