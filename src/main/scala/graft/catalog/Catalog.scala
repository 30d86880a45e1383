package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full driver-facing inventory: SURVEY §2 parity ops + scale extensions. */
object Catalog {
  val defs: Seq[QueryDef] = {
    val all =
      RelationalCatalog.all ++ JoinCatalog.all ++ AggWindowCatalog.all ++
        ParityCatalog.all ++ ExtensionCatalog.all ++
        DedupCatalog.all ++ TextCatalog.all ++ EventsCatalog.all ++
        SimilarityCatalog.all ++ MultimodalCatalog.all
    // a duplicate name would silently shadow an earlier query in the toMap
    // below, shrinking the verified surface with no error
    val dupes = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate catalog query names: ${dupes.mkString(", ")}")
    all
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  lazy val oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql.trim)).toMap
}
