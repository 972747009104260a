package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Bridge to the session's CatalogManager cache (private[sql]).
  *
  * Catalog plugin instances are cached per session at first use and keep
  * the `spark.sql.catalog.<name>.*` conf values they were instantiated
  * with — a later `conf.set` of the same catalog name is silently
  * ignored. Anything that repoints a catalog name on a live session
  * (tests building isolated warehouses, [[graft.queries.LakeOps]]
  * pointing `lake` at a scratch warehouse) must drop the cache so the
  * next use re-reads the conf. */
object CatalogBridge {
  def resetCatalogs(spark: SparkSession): Unit =
    spark.sessionState.catalogManager.reset()
}
