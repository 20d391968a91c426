package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-TABLE transactional catalog: one manifest whose entries are
  * `tableName → pinned table version`, committed atomically — so a reader
  * resolving every table THROUGH the catalog sees a consistent multi-table
  * snapshot, never a half-applied transaction.
  *
  * Why this exists: a CDC source like the reference's Debezium emits one
  * topic PER TABLE (`connectors/pg-src-connector.json`), but the upstream
  * OLTP writes are cross-table transactions (an order and its lines commit
  * together). Applying each topic to its own table independently reproduces
  * the rows but loses the transaction boundary: a join can observe order v2
  * against lines v1. Single-table formats stop there — even Delta scopes a
  * commit to one table. This catalog restores the boundary with the same
  * machinery the repo's tables already trust: stage every table's new
  * version first (data files + per-table manifest), then flip ONE catalog
  * manifest naming all of them.
  *
  * Failure semantics: a crash after some table commits but before the
  * catalog commit leaves catalog readers on the previous consistent pair —
  * staged table versions are invisible through the catalog (spec'd), which
  * is exactly the ManifestStore staged-orphan rule one level up. Catalog
  * versions are themselves time-travelable: `tableVersionsAt` replays any
  * historical consistent snapshot.
  */
object TxnCatalog {

  /** Atomically publish a new catalog version pinning `tableVersions`
    * (tableName → that table's already-committed version). Tables not
    * mentioned carry forward from the previous catalog version.
    */
  def commitTxn(spark: SparkSession, catalogRoot: String,
                tableVersions: Map[String, Long]): Long = {
    val snap = ManifestStore.latest(spark, catalogRoot)
    val prev = snap.map(_.entries).getOrElse(Map.empty[String, String])
    val version = ManifestStore.versionAfter(snap)
    ManifestStore.commit(spark, catalogRoot, version,
      prev ++ tableVersions.map { case (t, v) => t -> v.toString })
    version
  }

  /** The pinned table versions at a catalog version (latest if None). */
  def tableVersionsAt(spark: SparkSession, catalogRoot: String,
                      catalogVersion: Option[Long] = None): Map[String, Long] = {
    val snap = (catalogVersion match {
      case Some(v) => ManifestStore.snapshotAt(spark, catalogRoot, v)
      case None => ManifestStore.latest(spark, catalogRoot)
    }).getOrElse(throw new IllegalStateException(
      s"no catalog version $catalogVersion at $catalogRoot"))
    snap.entries.collect {
      case (t, v) if !ManifestStore.isMetaSlot(t) => t -> v.toLong
    }
  }

  /** Read one table AS PINNED by the catalog — never the table's own
    * latest, so a committed-but-not-yet-cataloged table version (a
    * mid-transaction state) is invisible.
    */
  def readTable(spark: SparkSession, catalogRoot: String,
                tableRoots: Map[String, String], table: String,
                catalogVersion: Option[Long] = None): DataFrame = {
    val pinned = tableVersionsAt(spark, catalogRoot, catalogVersion)
      .getOrElse(table,
        throw new IllegalStateException(s"table $table not in catalog"))
    MergeInto.readTableAt(spark, tableRoots(table), pinned)
  }
}
