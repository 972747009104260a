package graft.lake.dsv2

import graft.lake.{DataFile, LakeCatalog, LakeColumn, LakeSchema, LakeTable, PartitionField, PartitionSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

import java.util

/** Atomic `CREATE OR REPLACE TABLE … AS SELECT` (RTAS) — Spark's
  * StagingTableCatalog protocol mapped onto the lake's single-commit
  * metadata versioning:
  *
  *   - the SELECT's data files are written into the table directory with
  *     the PENDING schema/spec ([[LakeTable.stageFilesFor]]) — invisible,
  *     since no ref points at them;
  *   - `commitStagedChanges` publishes schema + partition spec +
  *     properties + content in ONE metadata version
  *     ([[LakeTable.replaceTable]]) — readers see the old table or the
  *     new one, never an empty or mixed intermediate (the failure mode of
  *     non-atomic DROP+CTAS);
  *   - `abortStagedChanges` leaves only orphan data files (harvested by
  *     `remove_orphan_files`), best-effort deleted immediately.
  *
  * A table that did not exist is bootstrapped empty up front (metadata
  * only) and dropped on abort — the brief empty-table visibility window
  * only exists for plain CREATE, where there is no prior content to
  * protect. The pending schema takes FRESH column ids: replace defines a
  * new logical table, so pre-replace files share no column lineage with
  * it (time travel still reads them under their own written schema). */
class GraftStagedTable(
    lakeCat: LakeCatalog,
    identName: String,
    sparkSchema: StructType,
    partitionBy: Seq[(String, String)],
    props: Map[String, String],
    existedBefore: Boolean)
  extends StagedTable with SupportsWrite {

  private val lakeTable: LakeTable =
    if (existedBefore) lakeCat.loadTable(identName)
    else lakeCat.createTable(identName, sparkSchema, partitionBy, props)

  private val (pendingSchema, pendingSpec): (LakeSchema, PartitionSpec) =
    if (!existedBefore) {
      val m = lakeTable.meta
      (m.schema, m.spec)
    } else {
      val m = lakeTable.meta
      val base = m.lastColumnId
      val cols = sparkSchema.fields.zipWithIndex.map { case (f, i) =>
        LakeColumn(base + i + 1, f.name, f.dataType.json, f.nullable,
          currentDefaultSql = if (f.metadata.contains("CURRENT_DEFAULT"))
            Some(f.metadata.getString("CURRENT_DEFAULT")) else None,
          existsDefaultSql = if (f.metadata.contains("EXISTS_DEFAULT"))
            Some(f.metadata.getString("EXISTS_DEFAULT")) else None,
          generationSql = if (f.metadata.contains("GENERATION_EXPRESSION"))
            Some(f.metadata.getString("GENERATION_EXPRESSION")) else None)
      }.toSeq
      val sch = LakeSchema(m.schemas.map(_.schemaId).max + 1, cols)
      val fields = partitionBy.map { case (c, t) =>
        PartitionField(sch.byName(c).getOrElse(
          throw new IllegalArgumentException(s"partition column $c not in schema")).id, t)
      }
      (sch, PartitionSpec(m.partitionSpecs.map(_.specId).max + 1, fields))
    }

  @volatile private var stagedFiles: Seq[DataFile] = Seq.empty

  override def name(): String = identName
  override def schema(): StructType = sparkSchema
  override def partitioning(): Array[Transform] =
    partitionBy.map {
      case (c, "identity") => Expressions.identity(c)
      case (c, t) if t.startsWith("bucket[") =>
        Expressions.bucket(t.stripPrefix("bucket[").stripSuffix("]").toInt, c)
      case (c, t) => Expressions.apply(t, Expressions.column(c))
    }.toArray
  override def properties(): util.Map[String, String] = {
    val j = new util.HashMap[String, String]()
    props.foreach { case (k, v) => j.put(k, v) }
    j
  }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // RTAS plans a truncate-then-write; staging IS a full replacement,
      // so truncate is absorbed
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: DataFrame, _: Boolean) => {
            stagedFiles = lakeTable.stageFilesFor(data, pendingSchema, pendingSpec)
            ()
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    lakeTable.replaceTable(pendingSchema, pendingSpec, props, stagedFiles)
    ()
  }

  override def abortStagedChanges(): Unit = {
    val conf = lakeTable.spark.sessionState.newHadoopConf()
    stagedFiles.foreach { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f.path)
        p.getFileSystem(conf).delete(p, false)
      } catch { case _: Exception => () } // orphans; remove_orphan_files harvests
    }
    if (!existedBefore) lakeCat.dropTable(identName)
  }
}
