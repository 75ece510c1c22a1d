package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-wide ledger of every persist GRAFT created — the release half of
  * the repo's cache-loan convention.
  *
  * The loan convention (see [[graft.operators.Dedup]]'s `withPersistedSets`)
  * deliberately leaves some persists alive past the call that created them:
  * a shared pair cache that three sibling queries re-read, a
  * budget-bounded result frame whose persist replaces the internal
  * candidate cache it was materialized from. That is the right trade
  * DURING a run — unpersisting a shared frame mid-run poisons its sibling
  * consumers (measured: d6c 0.53→2.30 s with an eager unpersist) — but in a
  * long-lived session the loans are residue unless someone can call them
  * all in. This ledger is that someone: every graft-internal
  * `persist()` whose lifetime extends past its creating call registers via
  * [[loan]], and [[releaseAll]] unpersists exactly those frames — never a
  * frame the USER persisted, which a blunt `spark.catalog.clearCache()`
  * would also destroy.
  *
  * Scale note: a ledger entry is a plan reference (driver-side, KB), not
  * data; entries for frames the caller already unpersisted are harmless
  * (`unpersist` on a non-persisted frame is a no-op) and are dropped with
  * the rest on release. [[drain]] is the end-of-run form Bench/Verify use:
  * ledger + the Tables/Meta memo caches, then a count of whatever is STILL
  * persisted in the SparkContext (0 = the run left no graft residue;
  * asserted in CachesSpec and printed by Bench).
  */
object Caches {

  // identity-keyed (Dataset doesn't override equals); value = owning session
  // so a multi-session process releases per-session
  private val ledger = TrieMap.empty[DataFrame, SparkSession]

  /** Register `df` (already persisted by the caller) as a graft-owned loan;
    * returns it unchanged so call sites can wrap their `.persist(...)`.
    *
    * Settled-but-unremoved entries (a site that unpersisted without
    * calling [[settled]]) are swept opportunistically once the ledger
    * grows past a small bound, so a long-lived library session looping
    * over loaning operators cannot retain plans without limit even if a
    * call site misses its settle.
    */
  def loan(df: DataFrame): DataFrame = {
    if (ledger.size > 256)
      ledger.keys.foreach { k => if (!isLive(k)) ledger.remove(k) }
    ledger.put(df, df.sparkSession)
    df
  }

  /** Persist-and-register in one step — MEMORY_AND_DISK, the repo default
    * (spill-safe: partitions that outgrow executor memory go to disk).
    */
  def persistLoaned(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    loan(df.persist(level))

  /** A caller settled a loan itself (explicit unpersist) — forget it. */
  def settled(df: DataFrame): Unit = ledger.remove(df)

  /** Unpersist every ledgered frame belonging to `spark` (blocking, so the
    * storage is actually gone when this returns) and drop the entries.
    * Returns how many frames were still persisted when called.
    */
  def releaseAll(spark: SparkSession): Int = {
    var live = 0
    ledger.keys.foreach { df =>
      if (df.sparkSession eq spark) {
        if (isLive(df)) live += 1
        try df.unpersist(blocking = true) catch { case _: Exception => () }
        ledger.remove(df)
      }
    }
    live
  }

  // storageLevel throws on a stopped SparkContext — treat dead as settled
  private def isLive(df: DataFrame): Boolean =
    try df.storageLevel != StorageLevel.NONE catch { case _: Exception => false }

  /** Frames ledgered for `spark` that are persisted right now. */
  def outstanding(spark: SparkSession): Int =
    ledger.keys.count(df => (df.sparkSession eq spark) && isLive(df))

  /** End-of-run drain: release the ledger, the Tables memo, and the Meta
    * table memo, then report how many RDDs the SparkContext STILL holds
    * persisted. 0 means the run left no cache residue at all; >0 means an
    * unledgered persist leaked (a bug — CachesSpec pins 0 across the loan
    * sites).
    */
  def drain(spark: SparkSession): Int = {
    releaseAll(spark)
    Tables.clearMemo()
    Meta.clearCachedTables()
    spark.sparkContext.getPersistentRDDs.size
  }
}
