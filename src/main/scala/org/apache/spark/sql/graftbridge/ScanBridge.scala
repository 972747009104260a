package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Bridge into the `private[sql]` file-source read machinery, for the DSv2
  * batch scan behind storage-partitioned joins ([[graft.lake.dsv2]]).
  *
  * [[ParquetFileFormat.buildReaderWithPartitionValues]] is exactly the
  * function `FileSourceScanExec` ships to executors: vectorized parquet
  * decode, row-group statistics + bloom + dictionary pruning from pushed
  * filters, and schema clipping to the required columns. Building our
  * reader from it means the v2 scan path decodes parquet byte-for-byte the
  * way the substituted-relation path does — one implementation to trust.
  */
object ScanBridge {

  /** Driver-side: build the serializable per-file reader function.
    * `dataSchema`/`requiredSchema` are WRITE-TIME physical schemas;
    * `filters` must already reference physical column names. The returned
    * closure is safe to ship to executors (it captures a broadcast of the
    * hadoop conf, as FileSourceScanExec does). Rows are returned one at a
    * time (`OPTION_RETURNING_BATCH=false`) — the vectorized reader still
    * runs underneath; only the hand-off is row-oriented. */
  def parquetReader(
      spark: SparkSession,
      dataSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val fmt = new ParquetFileFormat()
    fmt.buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = dataSchema,
      partitionSchema = new StructType(),
      requiredSchema = requiredSchema,
      filters = filters,
      options = Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = hadoopConf)
  }

  /** A whole-file PartitionedFile with no partition-directory columns (the
    * lake keeps partition values in table metadata, and source columns are
    * physically present in the data files). */
  def wholeFile(path: String, sizeBytes: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path), 0L,
      sizeBytes, Array.empty, 0L, sizeBytes, Map.empty)
}
