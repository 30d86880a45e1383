package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full driver-facing inventory: SURVEY §2 parity ops + scale extensions. */
object Catalog {
  def defs: Seq[QueryDef] =
    RelationalCatalog.all ++ JoinCatalog.all ++ AggWindowCatalog.all ++
      ParityCatalog.all ++
      DedupCatalog.all ++ TextCatalog.all ++ EventsCatalog.all ++ SimilarityCatalog.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  lazy val oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql.trim)).toMap
}
