package graft.lake.dsv2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewChange, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.charset.StandardCharsets

/** Catalog views for the lake (Iceberg-view analog): the view's SQL text,
  * resolution context (catalog + namespace the text was written against),
  * schema, and properties persist as one JSON document per view under
  * `<warehouse>/<db>/_views/<name>.json` — engine-agnostic metadata, like
  * the table format itself. Spark re-parses the stored SQL against the
  * stored context at read time, so views survive session restarts and are
  * visible to any engine that reads the warehouse.
  *
  * The `_views` directory name cannot collide with tables (table
  * locations are `<warehouse>/<db>/<table>/`, and `_views` is reserved by
  * construction since identifiers with leading underscores are permitted
  * but a table named `_views` is refused at creation). */
object GraftViews {

  private case class Stored(
      sql: String, currentCatalog: String, currentNamespace: Seq[String],
      schemaJson: String, queryColumnNames: Seq[String],
      columnAliases: Seq[String], columnComments: Seq[String],
      properties: Map[String, String])

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  private def viewPath(warehouse: String, ident: Identifier): Path =
    new Path(new Path(warehouse, ident.namespace().mkString(".")),
      s"_views/${ident.name()}.json")

  def exists(spark: org.apache.spark.sql.SparkSession, warehouse: String,
             ident: Identifier): Boolean = {
    val p = viewPath(warehouse, ident)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def create(spark: org.apache.spark.sql.SparkSession, warehouse: String,
             info: ViewInfo, orReplace: Boolean): Unit = {
    val p = viewPath(warehouse, info.ident())
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val stored = Stored(info.sql(), info.currentCatalog(),
      info.currentNamespace().toSeq, info.schema().json,
      info.queryColumnNames().toSeq, info.columnAliases().toSeq,
      info.columnComments().toSeq,
      { val b = Map.newBuilder[String, String]
        info.properties().forEach((k, v) => b += (k -> v)); b.result() })
    fs.mkdirs(p.getParent)
    val out = fs.create(p, orReplace)
    try out.write(mapper.writeValueAsString(stored).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def load(spark: org.apache.spark.sql.SparkSession, warehouse: String,
           ident: Identifier): Option[View] = {
    val p = viewPath(warehouse, ident)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      val st = mapper.readValue(s, classOf[Stored])
      Some(new View {
        override def name(): String = (ident.namespace() :+ ident.name()).mkString(".")
        override def query(): String = st.sql
        override def currentCatalog(): String = st.currentCatalog
        override def currentNamespace(): Array[String] = st.currentNamespace.toArray
        override def schema(): StructType =
          DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
        override def queryColumnNames(): Array[String] = st.queryColumnNames.toArray
        override def columnAliases(): Array[String] = st.columnAliases.toArray
        override def columnComments(): Array[String] = st.columnComments.toArray
        override def properties(): java.util.Map[String, String] = {
          val j = new java.util.HashMap[String, String]()
          st.properties.foreach { case (k, v) => j.put(k, v) }
          j
        }
      })
    }
  }

  def drop(spark: org.apache.spark.sql.SparkSession, warehouse: String,
           ident: Identifier): Boolean = {
    val p = viewPath(warehouse, ident)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, false)
  }

  def list(spark: org.apache.spark.sql.SparkSession, warehouse: String,
           namespace: Array[String]): Seq[Identifier] = {
    val dir = new Path(new Path(warehouse, namespace.mkString(".")), "_views")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(n => Identifier.of(namespace, n.stripSuffix(".json")))
  }

  def rename(spark: org.apache.spark.sql.SparkSession, warehouse: String,
             from: Identifier, to: Identifier): Unit = {
    val pf = viewPath(warehouse, from)
    val pt = viewPath(warehouse, to)
    val fs = pf.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(pt.getParent)
    if (!fs.rename(pf, pt))
      throw new IllegalStateException(s"failed to rename view $from -> $to")
  }
}
