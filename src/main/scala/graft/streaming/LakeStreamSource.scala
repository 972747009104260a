package graft.streaming

import graft.lake.LakeTable

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Snapshot-driven streaming source over a lake table — the Spark-first
  * analog of Iceberg's incremental streaming scan (and of the reference's
  * `toChangelogStream` read-back, StreamRead.java:31-34).
  *
  * Offsets are MAIN-branch snapshot ids; each micro-batch delivers the
  * `app-*` files newly added on main's ancestry between the previous and
  * current offset ([[LakeTable.readAddedBetween]]). Because delivery is
  * driven by COMMITTED snapshot metadata — never by listing the data
  * directory — the stream cannot see:
  *   - files of a write whose commit hasn't happened yet (or failed and
  *     left orphans for remove_orphan_files),
  *   - staged WAP snapshots (invisible until cherry-picked onto main, at
  *     which point the publish commit delivers them),
  *   - side-branch commits (delivered only if fast-forwarded/published
  *     to main).
  * A directory-glob file stream violates all three (it sees every file
  * ever renamed into `data/`), which is why streamRead moved off it.
  *
  * Append-only contract: CoW rewrite output (`rw-*` survivors of
  * DELETE/UPDATE/compaction) is never re-delivered; appends later deleted
  * by a rewrite still appear, as in Iceberg's incremental scan.
  *
  * Schema is pinned at source creation (the streaming engine requires a
  * stable schema); renames/adds during the stream need a restart to pick
  * up, same caveat as before. */
class LakeStreamSource(sqlContext: SQLContext, location: String,
                       changelogMode: Boolean = false,
                       store: Option[graft.lake.MetaStore] = None) extends Source {

  private val table: LakeTable = store match {
    case Some(s) => LakeTable.at(sqlContext.sparkSession, location, s)
    case None => LakeTable.at(sqlContext.sparkSession, location)
  }
  private val pinnedSchema: StructType = table.meta.schema.sparkSchema

  override def schema: StructType =
    if (changelogMode) LakeStreamSource.withChangeColumns(pinnedSchema)
    else pinnedSchema

  /** Latest committed main snapshot; None before the first commit (the
    * engine polls again next trigger). */
  override def getOffset: Option[OffsetV1] =
    table.meta.currentSnapshot.map(s => LongOffset(s.snapshotId))

  private def toLong(o: OffsetV1): Long = o match {
    case LongOffset(v) => v
    case SerializedOffset(json) => json.trim.toLong // checkpoint-recovered
    case other => throw new IllegalArgumentException(s"unexpected offset $other")
  }

  /** A checkpointed offset can stop being resolvable: rollback_to_snapshot
    * moves main past it, or expire_snapshots drops its snapshot. Without
    * this translation the raw `not an ancestor` require fails every
    * trigger and the stream is permanently wedged with no hint of the
    * cause or the fix. */
  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val df =
      try {
        // changelog mode = the reference's `toChangelogStream` proper:
        // each micro-batch delivers the per-commit row-level diff
        // (insert AND delete events, updates as delete+insert pairs)
        // instead of append-only new rows
        if (changelogMode) table.changelog(start.map(toLong), toLong(end))
        else table.readAddedBetween(start.map(toLong), toLong(end))
      }
      catch {
        case e: IllegalArgumentException =>
          throw new IllegalStateException(
            s"Streaming read of lake table at $location cannot resume: checkpointed " +
              s"offset range [${start.map(toLong).getOrElse("-")}, ${toLong(end)}] is no " +
              "longer on main's ancestry — the table was rolled back past it, or the " +
              "snapshot was removed by expire_snapshots. Recovery: (a) delete this " +
              "stream's checkpoint directory to restart from the current table state " +
              "(rows in the lost range are re-delivered or skipped depending on the " +
              "rollback), or (b) rollback_to_snapshot to a state that still contains " +
              "the offset. Prevention: keep expire_snapshots retention longer than " +
              "the stream's maximum downtime, and restart streams after a rollback.",
            e)
      }
    // pin to the source schema by name (table may have evolved mid-stream)
    val pinned = df.select(schema.fields.map(f =>
      col(f.name).cast(f.dataType)).toIndexedSeq: _*)
    StreamBridge.asStreaming(pinned)
  }

  override def stop(): Unit = ()
}

object LakeStreamSource {
  /** Changelog-mode output schema: table columns + CDC event columns,
    * Iceberg's changelog contract (`_change_type` INSERT|DELETE uppercase,
    * `_change_ordinal` local to each micro-batch's commit range,
    * `_commit_snapshot_id`). */
  def withChangeColumns(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_change_ordinal",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_snapshot_id",
        org.apache.spark.sql.types.LongType, nullable = false)))
}

/** `spark.readStream.format(<this class name>).option("location", …)` —
  * [[Changelog.streamRead]] wires it up. */
class LakeStreamSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake-stream"

  private def isChangelog(parameters: Map[String, String]): Boolean =
    parameters.get("mode").exists(_.equalsIgnoreCase("changelog"))

  /** Wire-catalog tables carry their authority in `uri` + `ident`
    * options (there is no metadata under the location to probe in uri
    * mode); filesystem tables resolve by location alone (r12). */
  private def storeFor(parameters: Map[String, String]): Option[graft.lake.MetaStore] =
    parameters.get("uri").map(u =>
      new graft.lake.HttpMetaStore(u, parameters.getOrElse("ident",
        throw new IllegalArgumentException(
          "wire-mode stream source needs both uri and ident options"))))

  private def tableFor(sqlContext: SQLContext,
                       parameters: Map[String, String]): LakeTable =
    storeFor(parameters) match {
      case Some(s) => LakeTable.at(sqlContext.sparkSession, parameters("location"), s)
      case None => LakeTable.at(sqlContext.sparkSession, parameters("location"))
    }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val base = tableFor(sqlContext, parameters).meta.schema.sparkSchema
      if (isChangelog(parameters)) LakeStreamSource.withChangeColumns(base) else base
    })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new LakeStreamSource(sqlContext, parameters("location"), isChangelog(parameters),
      storeFor(parameters))
}
