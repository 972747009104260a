package graft.lake

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table-level column statistics — the `ANALYZE TABLE … COMPUTE
  * STATISTICS` surface (Iceberg's statistics files / Delta's ANALYZE):
  * per-column NDV, null count, min/max and length stats, persisted with
  * the snapshot they describe and fed back to the planner through the
  * DSv2 scan's `columnStats()` so CBO can order joins and pick broadcast
  * sides WITHOUT scanning 100 TB at plan time.
  *
  * File-level min/max/null stats already ride every commit for free
  * ([[Stats.fromFooter]] — parquet footers); what ANALYZE adds is the
  * one thing footers cannot give: DISTINCT counts, which is what
  * join-cardinality estimation actually needs.
  *
  * Persistence: ONE compact JSON blob in the `graft.stats` table
  * property, stamped with the analyzed snapshot id. Stats are snapshot-
  * scoped facts, not live state — readers decide staleness by comparing
  * the stamp with the snapshot they scan (the `stats` metadata table
  * exposes a `stale` flag; the DSv2 scan only reports FRESH stats).
  *
  * 100 TB shape: default NDV is `approx_count_distinct` (HyperLogLog++,
  * one non-distinct pass over the table for ALL columns together — no
  * Expand, partial-aggregated map-side). `exactNdv = true` is the
  * audit mode (n distinct aggregates plan an Expand that multiplies the
  * scan by the column count — documented cost, only for oracles and
  * small tables). NOSCAN runs ZERO jobs: row count and size come off the
  * snapshot's file metadata.
  */
object Analyze {

  /** Table property carrying the serialized [[TableStats]]. */
  val PropKey = "graft.stats"

  final case class AnalyzedColumn(
      name: String,
      dataType: String,
      // contentAs guards against Jackson's erasure default (Option[Integer])
      @com.fasterxml.jackson.databind.annotation.JsonDeserialize(contentAs = classOf[java.lang.Long])
      ndv: Option[Long],
      nullCount: Long,
      /** min/max as Spark `CAST(col AS STRING)` of the column value —
        * portable, human-auditable; absent for all-null columns. */
      min: Option[String],
      max: Option[String],
      /** length stats (string/binary columns only): truncated mean and
        * max of `length(col)` over non-null rows. */
      @com.fasterxml.jackson.databind.annotation.JsonDeserialize(contentAs = classOf[java.lang.Long])
      avgLen: Option[Long],
      @com.fasterxml.jackson.databind.annotation.JsonDeserialize(contentAs = classOf[java.lang.Long])
      maxLen: Option[Long])

  final case class TableStats(
      snapshotId: Long,
      rowCount: Long,
      exactNdv: Boolean,
      columns: Seq[AnalyzedColumn])

  private val mapper: ObjectMapper with ClassTagExtensions = {
    val m = new ObjectMapper() with ClassTagExtensions
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
  def toJson(s: TableStats): String = mapper.writeValueAsString(s)
  def fromJson(json: String): TableStats = mapper.readValue[TableStats](json)

  /** Columns whose stats the planner can use (atomic, orderable). */
  private def analyzable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }
  private def sized(dt: DataType): Boolean =
    dt == StringType || dt == BinaryType

  /** Compute + persist stats for the CURRENT main snapshot. `columns`
    * empty = all analyzable columns; naming an un-analyzable or unknown
    * column fails loudly. Returns the persisted stats. */
  def run(table: LakeTable, columns: Seq[String] = Seq.empty,
          exactNdv: Boolean = false, noscan: Boolean = false): TableStats = {
    val snap = table.resolveSnapshot().getOrElse(
      throw new IllegalStateException(
        s"ANALYZE ${table.meta.name}: table has no snapshot"))
    val schema = table.read(snapshotId = Some(snap.snapshotId)).schema
    val targets: Seq[StructField] =
      if (columns.isEmpty) schema.fields.toSeq.filter(f => analyzable(f.dataType))
      else columns.map { c =>
        val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(
            s"ANALYZE: no such column '$c' in ${table.meta.name}"))
        if (!analyzable(f.dataType)) throw new IllegalArgumentException(
          s"ANALYZE: column '$c' has un-analyzable type ${f.dataType.simpleString}")
        f
      }

    val stats =
      if (noscan) {
        TableStats(snap.snapshotId, snap.files.map(_.rowCount).sum,
          exactNdv = false, columns = Seq.empty)
      } else {
        // pin the scan to the snapshot being stamped: a concurrent commit
        // (or WAP/branch session routing) must not let the stats describe
        // different bytes than their stamp claims
        val df = table.read(snapshotId = Some(snap.snapshotId))
        val aggs = targets.flatMap { f =>
          val c = col(s"`${f.name}`")
          val ndv = if (exactNdv) count_distinct(c) else approx_count_distinct(c)
          Seq(ndv.cast("long"), sum(c.isNull.cast("long")),
            min(c).cast("string"), max(c).cast("string")) ++
            (if (sized(f.dataType))
               Seq(sum(length(c).cast("long")), max(length(c)).cast("long"))
             else Seq.empty)
        }
        val row = df.agg(count(lit(1)).as("_rows"), aggs: _*).head()
        var i = 1
        val cols = targets.map { f =>
          val ndv = row.getLong(i)
          val nulls = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
          val mn = Option(row.get(i + 2)).map(_.toString)
          val mx = Option(row.get(i + 3)).map(_.toString)
          i += 4
          val (al, ml) =
            if (sized(f.dataType)) {
              val sumLen = if (row.isNullAt(i)) None else Some(row.getLong(i))
              val maxLen = if (row.isNullAt(i + 1)) None else Some(row.getLong(i + 1))
              i += 2
              val nonNull = row.getLong(0) - nulls
              (sumLen.filter(_ => nonNull > 0).map(_ / nonNull), maxLen)
            } else (None, None)
          AnalyzedColumn(f.name, f.dataType.simpleString,
            ndv = Some(ndv), nullCount = nulls, min = mn, max = mx,
            avgLen = al, maxLen = ml)
        }
        TableStats(snap.snapshotId, row.getLong(0), exactNdv, cols)
      }

    table.updateProperties(_ + (PropKey -> toJson(stats)))
    stats
  }

  /** The persisted stats, if any. */
  def of(meta: TableMeta): Option[TableStats] =
    meta.properties.get(PropKey).map(fromJson)

  /** The persisted stats ONLY if they describe `snapshotId` — what the
    * DSv2 scan reports to the planner (stale stats would mis-estimate
    * join cardinalities in the wrong direction silently). */
  def fresh(meta: TableMeta, snapshotId: Option[Long]): Option[TableStats] =
    of(meta).filter(s => snapshotId.contains(s.snapshotId))
}
