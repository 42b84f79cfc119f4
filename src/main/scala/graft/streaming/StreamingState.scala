package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the stateful streaming operators
  * ([[Sessionize]], [[StreamingDedup]], [[TrendingTokens]], stream-
  * stream joins).
  *
  * The default HDFS-backed provider keeps every key's state ON HEAP —
  * fine for the keyed-aggregate traffic pipeline (state = one row per
  * window bucket), an operational cliff for the 100 TB ops whose state
  * is corpus-shaped: a streaming dedup index or million-user session
  * map grows past executor heap and dies in GC long before it runs out
  * of machine. RocksDB keeps state off-heap on local SSD with
  * changelog checkpointing (delta files instead of full snapshots per
  * commit), which is the production posture at that scale.
  *
  * The provider is a per-query binding read from the session conf when
  * the query STARTS — switching it mid-query is undefined, hence the
  * scoped helper. Results are provider-invariant (pinned by
  * StateStoreProviderSpec across both providers); only the storage
  * engine changes.
  */
object StreamingState {
  val HeapProvider: String =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Bind RocksDB (off-heap, changelog-checkpointed) state for queries
    * started after this call. */
  def useRocksDB(spark: SparkSession): Unit = {
    spark.conf.set(ProviderKey, RocksDBProvider)
    spark.conf.set(ChangelogKey, "true")
  }

  /** Bind the default heap-backed provider for queries started after
    * this call. */
  def useHeap(spark: SparkSession): Unit = {
    spark.conf.set(ProviderKey, HeapProvider)
    spark.conf.unset(ChangelogKey)
  }

  def currentProvider(spark: SparkSession): String =
    spark.conf.get(ProviderKey, HeapProvider)

  /** Run `body` with `provider` bound, restoring the previous binding
    * after — queries STARTED inside pick up the provider; the scope
    * must outlive them. */
  def withProvider[T](spark: SparkSession, provider: String)(body: => T): T = {
    val before = spark.conf.getOption(ProviderKey)
    val beforeChangelog = spark.conf.getOption(ChangelogKey)
    if (provider == RocksDBProvider) useRocksDB(spark) else useHeap(spark)
    try body
    finally {
      before match {
        case Some(p) => spark.conf.set(ProviderKey, p)
        case None => spark.conf.unset(ProviderKey)
      }
      beforeChangelog match {
        case Some(c) => spark.conf.set(ChangelogKey, c)
        case None => spark.conf.unset(ChangelogKey)
      }
    }
  }
}
