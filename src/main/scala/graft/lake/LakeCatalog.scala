package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import java.util.UUID

/** Catalog of lake tables under a warehouse directory:
  * `<warehouse>/<namespace>/<table>/`. Mirrors the reference's catalog
  * surface (D1-D3: CREATE DATABASE / CREATE TABLE / DROP TABLE —
  * Getting Started.ipynb c5-c6, IcebergStream.java:76-80). */
class LakeCatalog(val spark: SparkSession, val warehouse: String) {

  private val hadoopConf = spark.sessionState.newHadoopConf()
  private def fs: FileSystem = new Path(warehouse).getFileSystem(hadoopConf)

  private def tableLocation(ident: String): String = {
    val parts = ident.split("\\.")
    (warehouse +: parts).mkString("/")
  }

  def createNamespace(name: String): Unit =
    fs.mkdirs(new Path(s"$warehouse/$name"))

  def namespaceExists(name: String): Boolean = fs.exists(new Path(s"$warehouse/$name"))

  /** CREATE TABLE with typed columns, hidden-partition transforms and
    * properties (D2). `partitionBy` entries are (columnName, transform). */
  def createTable(ident: String, schema: StructType,
                  partitionBy: Seq[(String, String)] = Seq.empty,
                  properties: Map[String, String] = Map.empty): LakeTable = {
    require(!tableExists(ident), s"table $ident already exists")
    require(ident.split("\\.").last != "_views",
      "'_views' is a reserved identifier (the catalog's view-store directory)")
    // identity columns are BIGINT-only (Delta's rule): assignment uses
    // monotonically_increasing_id(), which jumps 2^33 per partition — a
    // narrower declared type would silently wrap/null the cast and break
    // the uniqueness guarantee
    schema.fields.foreach { f =>
      if (f.metadata.contains("IDENTITY_START"))
        require(f.dataType == org.apache.spark.sql.types.LongType,
          s"identity column ${f.name} must be BIGINT (got " +
            s"${f.dataType.simpleString}): identity values are allocated " +
            "sparsely across partitions and need the full 64-bit domain")
    }
    val location = tableLocation(ident)
    // a recreate at a reused location restarts version numbering — stale
    // cached metas from the dropped incarnation must not be served
    LakeTable.invalidateLocation(location)
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      LakeColumn(i + 1, f.name, f.dataType.json, f.nullable,
        comment = if (f.metadata.contains("comment"))
          Some(f.metadata.getString("comment")) else None,
        // CREATE TABLE (col … DEFAULT …): Spark ships the default in
        // field metadata — persist both current + frozen exists defaults
        currentDefaultSql = if (f.metadata.contains("CURRENT_DEFAULT"))
          Some(f.metadata.getString("CURRENT_DEFAULT")) else None,
        existsDefaultSql = if (f.metadata.contains("EXISTS_DEFAULT"))
          Some(f.metadata.getString("EXISTS_DEFAULT")) else None,
        generationSql = if (f.metadata.contains("GENERATION_EXPRESSION"))
          Some(f.metadata.getString("GENERATION_EXPRESSION")) else None,
        identityStart = if (f.metadata.contains("IDENTITY_START"))
          Some(f.metadata.getLong("IDENTITY_START")) else None,
        identityStep = if (f.metadata.contains("IDENTITY_STEP"))
          Some(f.metadata.getLong("IDENTITY_STEP")) else None,
        identityAllowExplicit = f.metadata.contains("IDENTITY_ALLOW_EXPLICIT") &&
          f.metadata.getBoolean("IDENTITY_ALLOW_EXPLICIT"))
    }.toSeq
    val lakeSchema = LakeSchema(0, cols)
    val specFields = partitionBy.map { case (colName, transform) =>
      val c = lakeSchema.byName(colName).getOrElse(
        throw new IllegalArgumentException(s"partition column $colName not in schema"))
      PartitionField(c.id, transform)
    }
    val meta = TableMeta(
      formatVersion = 1,
      tableId = UUID.randomUUID().toString,
      name = ident,
      location = location,
      schemas = Seq(lakeSchema),
      currentSchemaId = 0,
      partitionSpecs = Seq(PartitionSpec(0, specFields)),
      defaultSpecId = 0,
      snapshots = Seq.empty,
      refs = Map.empty,
      history = Seq.empty,
      properties = properties,
      lastColumnId = cols.map(_.id).maxOption.getOrElse(0),
      lastSnapshotId = 0L,
      version = 1)
    val metaDir = new Path(location, "metadata")
    fs.mkdirs(metaDir)
    val out = fs.create(new Path(metaDir, "v1.json"), false)
    try out.write(Meta.toJson(meta).getBytes("UTF-8")) finally out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write("1".getBytes("UTF-8")) finally hint.close()
    loadTable(ident)
  }

  def tableExists(ident: String): Boolean =
    fs.exists(new Path(s"${tableLocation(ident)}/metadata/v1.json"))

  def loadTable(ident: String): LakeTable = {
    require(tableExists(ident), s"table $ident does not exist")
    new LakeTable(spark, tableLocation(ident))
  }

  def dropTable(ident: String): Unit = {
    LakeTable.invalidateLocation(tableLocation(ident))
    fs.delete(new Path(tableLocation(ident)), true)
    ()
  }

  def listTables(namespace: String): Seq[String] = {
    val ns = new Path(s"$warehouse/$namespace")
    if (!fs.exists(ns)) Seq.empty
    else fs.listStatus(ns).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(t => tableExists(s"$namespace.$t"))
  }

  /** Register `<name>` plus `<name>__snapshots` etc. as temp views — the
    * SQL-parity route for S3/S6 metadata-table scans. */
  def registerViews(ident: String, viewName: String): LakeTable = {
    val t = loadTable(ident)
    t.toDF.createOrReplaceTempView(viewName)
    MetadataTables.kinds.foreach { k =>
      MetadataTables(t, k).createOrReplaceTempView(s"${viewName}__$k")
    }
    t
  }
}
