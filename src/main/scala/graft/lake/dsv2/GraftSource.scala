package graft.lake.dsv2

import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-based access without a catalog — the `format("delta")`-style
  * pattern, for tooling that has a table LOCATION rather than a catalog
  * entry:
  *
  * {{{
  *   spark.read.format("graft").load("/warehouse/db/events")          // head
  *   spark.read.format("graft").option("snapshot-id", 7).load(loc)    // pin
  *   spark.read.format("graft").option("branch", "audit").load(loc)
  *   spark.read.format("graft").option("as-of-timestamp", ms).load(loc)
  *   df.write.format("graft").mode("append").save(loc)                // commit
  * }}}
  *
  * Loads the same [[GraftTable]] the catalog serves, so every read/write
  * semantic (pruning, WAP session routing, snapshot-per-append, the
  * GraftReadRule substitution under extensions, SPJ under v2 bucketing)
  * is identical — this is an ADDRESSING shortcut, not a second engine
  * path. Time-travel option names follow the Iceberg read-option
  * convention. */
class GraftSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def tableFor(options: CaseInsensitiveStringMap): GraftTable = {
    val path = options.get("path")
    require(path != null && path.nonEmpty,
      """format("graft") requires .load(<table location>) / .save(<table location>)""")
    val spark = SparkSession.active
    // wire-catalog tables (r12): `uri` + `ident` options name the
    // metadata authority — the location holds data only in uri mode
    val lt = Option(options.get("uri")) match {
      case Some(u) =>
        val ident = Option(options.get("ident")).getOrElse(throw
          new IllegalArgumentException(
            """format("graft") with uri needs the ident option too"""))
        LakeTable.at(spark, path, new graft.lake.HttpMetaStore(u, ident))
      case None => LakeTable.at(spark, path)
    }
    GraftTable(lt, s"graft.`$path`",
      pinnedSnapshotId = Option(options.get("snapshot-id")).map(_.toLong),
      pinnedBranch = Option(options.get("branch")),
      pinnedTimestampMs = Option(options.get("as-of-timestamp")).map(_.toLong))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableFor(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    tableFor(new CaseInsensitiveStringMap(properties))
}
