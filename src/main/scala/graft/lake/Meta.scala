package graft.lake

import com.fasterxml.jackson.databind.annotation.JsonDeserialize
import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.{ClassTagExtensions, DefaultScalaModule}
import org.apache.spark.sql.types.{DataType, StructField, StructType, Metadata => SparkMetadata}

/** Table-metadata model for graft's versioned lake tables.
  *
  * Provides the *capabilities* of the reference's Iceberg tables (snapshots,
  * refs/branches, WAP staging, schema & partition evolution, per-file column
  * stats — see SURVEY.md §2.9 and /root/reference/src/main/java/com/arecadata/
  * clickstream/IcebergStream.java:67-80 for the reference's table model), but
  * as a small JSON manifest of our own design, not the Iceberg format.
  *
  * Layout on disk:
  * {{{
  *   <tableDir>/data/<uuid>.parquet          (physical column names = "c<id>")
  *   <tableDir>/metadata/v<N>.json           (immutable TableMeta versions)
  *   <tableDir>/metadata/version-hint.text   (atomic pointer to current N)
  * }}}
  *
  * Columns are identified by stable integer ids; files are written with
  * physical names `c<id>` so renames / reorders / widenings are
  * metadata-only and files written under older schemas stay readable.
  */
final case class LakeColumn(
    id: Int,
    name: String,
    /** DataType.json string (round-trips via DataType.fromJson). */
    dataType: String,
    nullable: Boolean = true,
    comment: Option[String] = None,
    /** SQL of the column's DEFAULT for NEW writes (ANSI column default;
      * `ALTER COLUMN … SET DEFAULT` updates it). Surfaced as the
      * `CURRENT_DEFAULT` field metadata Spark's INSERT resolution reads. */
    currentDefaultSql: Option[String] = None,
    /** SQL of the value rows that PRE-DATE the column logically hold —
      * frozen at ADD COLUMN time (never changed by SET DEFAULT), filled
      * by the read mapping for files written under older schemas. This
      * is what makes "add a column with a default" metadata-only: no
      * file is rewritten, old rows just read the frozen literal. */
    existsDefaultSql: Option[String] = None,
    /** SQL of a GENERATED ALWAYS AS expression (over sibling columns).
      * Writes compute it when the column is absent and ASSERT agreement
      * when a value is supplied (Delta generated-column semantics);
      * stored physically so reads pay nothing. Mutually exclusive with
      * defaults (Spark's DDL enforces that). */
    generationSql: Option[String] = None) {
  def sparkType: DataType = DataType.fromJson(dataType)
  def physicalName: String = s"c$id"
  def toField: StructField = {
    val b = new org.apache.spark.sql.types.MetadataBuilder()
    comment.foreach(b.putString("comment", _))
    currentDefaultSql.foreach(b.putString("CURRENT_DEFAULT", _))
    existsDefaultSql.foreach(b.putString("EXISTS_DEFAULT", _))
    generationSql.foreach(b.putString("GENERATION_EXPRESSION", _))
    StructField(name, sparkType, nullable, b.build())
  }
}

final case class LakeSchema(schemaId: Int, columns: Seq[LakeColumn]) {
  def sparkSchema: StructType = StructType(columns.map(_.toField))
  def physicalSchema: StructType =
    StructType(columns.map(c => StructField(c.physicalName, c.sparkType, c.nullable)))
  def byName(name: String): Option[LakeColumn] = columns.find(_.name == name)
  def byId(id: Int): Option[LakeColumn] = columns.find(_.id == id)
}

/** One partition-spec field: `transform(sourceColumn)` (hidden partitioning,
  * ref: Berlin Buzzwords 2023.ipynb:105 `PARTITIONED BY (days(...))`).
  * Transforms: identity | years | months | days | hours | bucket[N].
  * Partition values are string-encoded transform outputs (Iceberg-style
  * ordinals for time transforms: days since epoch, etc.). */
final case class PartitionField(sourceId: Int, transform: String) {
  /** Physical partition directory column name (stable across renames). */
  def physicalName: String = s"_p_${transform.replaceAll("[\\[\\]]", "_")}_$sourceId"
}

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField])

/** Column stats string-encoded by type (timestamps as epoch-micros strings)
  * so JSON round-trips are lossless and engine-agnostic. */
final case class ColStat(min: Option[String], max: Option[String], nullCount: Long)

final case class DataFile(
    path: String,
    specId: Int,
    schemaId: Int,
    /** physical partition column name → string-encoded value ("" key absent for unpartitioned). */
    partitionValues: Map[String, String],
    rowCount: Long,
    sizeBytes: Long,
    /** physical column name ("c<id>") → stats. */
    stats: Map[String, ColStat],
    /** Snapshot that first added this file (stamped at commit time — the
      * data-sequence-number analog of Iceberg v2). Equality deletes mask
      * only files with a STRICTLY lower addedSnapshotId, so an upsert's
      * own inserted rows survive its own delete. 0 on files written
      * before this field existed — lower than any real snapshot id, so
      * legacy files are maskable (they predate every delete). */
    addedSnapshotId: Long = 0L)

/** Merge-on-read positional delete file (Iceberg v2 position deletes, ref:
  * `write.delete.mode=merge-on-read` in the reference's Iceberg tables):
  * a parquet file of `(file_name STRING, pos BIGINT)` rows marking data-file
  * positions as deleted WITHOUT rewriting the data file — a point DELETE on
  * a 100 TB table writes kilobytes instead of re-writing gigabyte files.
  * Readers subtract the positions at scan time; `rewrite_position_deletes`
  * or any CoW rewrite of the referenced files retires the entries.
  *
  * `counts` is keyed by data-file NAME (the UUID basename — unique per
  * table, and exactly what Spark's `_metadata.file_name` yields at both
  * delete-encode and scan time, so the join key needs no URI
  * normalization). Commits prune `counts` to files still live in the new
  * snapshot, so `Σ counts` stays an EXACT deleted-row count and the
  * metadata-only COUNT(*) fast path remains exact under merge-on-read. */
final case class DeleteFile(
    path: String,
    sizeBytes: Long,
    /** referenced data-file name → deleted-position count in that file.
      * Positions are globally disjoint across a snapshot's delete files
      * (delete writes anti-join already-deleted positions).
      * contentAs guards against Jackson's erasure default (Integer values
      * for small counts → ClassCastException on first use after reload). */
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    counts: Map[String, Long]) {
  def rowCount: Long = counts.values.sum
}

/** Equality delete file (Iceberg v2 equality deletes — the Flink/CDC
  * upsert mechanism, ref: `IcebergStream.java:118` equalityFieldColumns
  * with upsert mode): a parquet file of distinct KEY tuples; every row in
  * a data file with `addedSnapshotId < addedAt` whose key equals a stored
  * tuple is deleted. A streaming upsert batch commits as ONE equality
  * delete + appended row versions — O(batch) writes, zero data-file
  * rewrites, which is what makes CDC ingestion survive a 100 TB table.
  * Unlike positional deletes the masked-row count is unknowable without a
  * scan, so the COUNT(*)/MIN-MAX metadata fast paths and SPJ disable
  * while any equality delete is live; compaction retires them. */
final case class EqualityDeleteFile(
    path: String,
    sizeBytes: Long,
    /** Stable column ids of the equality key (schema-evolution-proof;
      * the parquet columns are the matching physical names "c<id>"). */
    keyIds: Seq[Int],
    /** Schema the key columns were written under (type reconstruction). */
    schemaId: Int,
    /** Number of distinct key tuples in the file. */
    rowCount: Long,
    /** Snapshot that committed this delete — masks files with
      * addedSnapshotId strictly below. Filled at commit time. */
    addedAt: Long,
    /** String-encoded bounds of the FIRST key column (ColStat encoding)
      * for pruning which files need the mask join at all. */
    keyMin: Option[String] = None,
    keyMax: Option[String] = None)

final case class Snapshot(
    snapshotId: Long,
    // contentAs guards against Jackson's erasure default (Option[Integer])
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    parentId: Option[Long],
    timestampMs: Long,
    /** append | overwrite | delete | replace | truncate. */
    operation: String,
    summary: Map[String, String],
    /** The snapshot's data files. In-memory this is always resolved; ON DISK
      * it is serialized EMPTY and the file list lives in content-addressed
      * manifest chunks ([[Manifests]]) named by `manifests` — so the root
      * metadata document stays O(snapshots × chunk-refs) and a commit
      * writes O(churn) manifest bytes, never the full history × file list
      * (the Iceberg manifest-list design, SURVEY §1.1 metadata row). */
    files: Seq[DataFile],
    /** WAP: staged snapshots are not reachable from any ref until
      * cherry-picked (ref: Integrated Audits….ipynb c16/c27). */
    staged: Boolean = false,
    /** Ordered manifest-chunk names whose concatenation equals `files`.
      * Empty on a freshly constructed snapshot — [[Manifests.assign]] fills
      * it at commit time (reusing the parent's unchanged chunks). A commit
      * transform that alters an EXISTING snapshot's `files` must reset this
      * (and `manifestList`) so assignment re-chunks (none do today —
      * snapshots are immutable once committed). In-memory only: the version
      * JSON persists `manifestList` instead, so the root stays O(snapshots)
      * rather than O(snapshots × chunks). */
    manifests: Seq[String] = Seq.empty,
    /** Name of the content-addressed manifest-LIST file holding
      * `manifests` (`metadata/manifest-list-<hash>.json`) — the one
      * per-snapshot pointer the root document serializes, exactly
      * Iceberg's snapshot → manifest-list indirection. */
    manifestList: Option[String] = None,
    /** Merge-on-read positional delete files applying to `files` (empty on
      * copy-on-write-only tables). In-memory always resolved; ON DISK the
      * list is serialized EMPTY and lives in one content-addressed chunk
      * named by `deleteManifest` — consecutive snapshots that share a
      * delete set (every append) share the chunk by name, so the root
      * document carries one name per snapshot, not the entry list
      * (Iceberg's delete-manifest indirection). Bounded by churn since the
      * last compaction: `rewrite_position_deletes` / `rewrite_data_files`
      * reset it. */
    deleteFiles: Seq[DeleteFile] = Seq.empty,
    /** Live equality delete files (merge-on-read upserts). Same
      * persistence scheme as `deleteFiles`: serialized EMPTY on disk,
      * carried by the `deleteManifest` chunk, bounded by churn since the
      * last compaction. */
    eqDeleteFiles: Seq[EqualityDeleteFile] = Seq.empty,
    /** Content-addressed chunk (`metadata/manifest-del-<hash>.json`)
      * holding `deleteFiles` + `eqDeleteFiles`; None when both are empty.
      * Filled by [[Manifests.assign]] at commit time. */
    deleteManifest: Option[String] = None)

/** Named ref: `branch` (movable, writable) or `tag` (immutable marker). */
final case class Ref(snapshotId: Long, kind: String = "branch")

final case class HistoryEntry(timestampMs: Long, snapshotId: Long, ref: String)

final case class TableMeta(
    formatVersion: Int,
    tableId: String,
    name: String,
    location: String,
    schemas: Seq[LakeSchema],
    currentSchemaId: Int,
    partitionSpecs: Seq[PartitionSpec],
    defaultSpecId: Int,
    snapshots: Seq[Snapshot],
    refs: Map[String, Ref],
    history: Seq[HistoryEntry],
    properties: Map[String, String],
    lastColumnId: Int,
    lastSnapshotId: Long,
    version: Int) {

  def schema: LakeSchema = schemas.find(_.schemaId == currentSchemaId).get
  def spec: PartitionSpec = partitionSpecs.find(_.specId == defaultSpecId).get
  def snapshot(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)
  def currentSnapshot: Option[Snapshot] =
    refs.get(LakeTable.MainBranch).flatMap(r => snapshot(r.snapshotId))
  def snapshotFor(branch: String): Option[Snapshot] =
    refs.get(branch).flatMap(r => snapshot(r.snapshotId))
}

/** Serialization model of one manifest chunk: an immutable, content-addressed
  * slice of a snapshot's data-file list (`metadata/manifest-<hash>.json`).
  * Chunks are shared structurally across snapshots — an append's new
  * snapshot references all of its parent's chunks plus one new chunk for
  * the appended files. */
final case class ManifestChunk(files: Seq[DataFile])

/** Wire form of one snapshot's [[DeleteFile]] + [[EqualityDeleteFile]]
  * lists (content-addressed — shared by name across every snapshot with
  * the same live delete set). */
final case class DeleteManifestChunk(
    deleteFiles: Seq[DeleteFile],
    eqDeleteFiles: Seq[EqualityDeleteFile] = Seq.empty)

object Meta {
  private val mapper: ObjectMapper with ClassTagExtensions = {
    val m = new ObjectMapper() with ClassTagExtensions
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
  def toJson(meta: TableMeta): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta)
  def fromJson(json: String): TableMeta = mapper.readValue[TableMeta](json)
  /** Compact (not pretty) — chunk bytes are the dominant metadata cost. */
  def chunkToJson(files: Seq[DataFile]): String =
    mapper.writeValueAsString(ManifestChunk(files))
  def chunkFromJson(json: String): Seq[DataFile] =
    mapper.readValue[ManifestChunk](json).files
  def listToJson(names: Seq[String]): String = mapper.writeValueAsString(names)
  def listFromJson(json: String): Seq[String] = mapper.readValue[Seq[String]](json)
  def deleteChunkToJson(dels: Seq[DeleteFile],
                        eqDels: Seq[EqualityDeleteFile]): String =
    mapper.writeValueAsString(DeleteManifestChunk(dels, eqDels))
  def deleteChunkFromJson(json: String): DeleteManifestChunk =
    mapper.readValue[DeleteManifestChunk](json)
}
