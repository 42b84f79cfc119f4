package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned, keyed, last-writer-wins parquet store — the local
  * stand-in for the reference's Kudu sink (SURVEY §7.1 "UpsertSink
  * trait … local keyed-Parquet implementation for tests, Kudu behind
  * the same interface in production").
  *
  * Layout: `<path>/v=N/` parquet snapshots + `<path>/_LATEST` pointer.
  * A commit writes the next snapshot dir, then atomically swaps the
  * pointer — readers never see a partial snapshot, and a crashed commit
  * leaves the previous version live (the foreachBatch retry then
  * re-runs idempotently: same keys, same values, last-writer-wins).
  *
  * Single-writer by design: Structured Streaming serializes
  * `foreachBatch` invocations per query, matching Kudu's
  * one-session-per-batch usage in the reference
  * (KafkaToKuduScala.scala:51).
  *
  * Scale: merge is a keyed dropDuplicates — one shuffle over
  * |base| + |delta|, fine while the keyed state is OLTP-table-sized
  * (the reference's sink holds one row per window). A 100 TB keyed sink
  * is what Kudu/Delta are for; this interface is the seam where they
  * plug in.
  */
object UpsertStore {
  private val LatestFile = "_LATEST"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def latestVersion(spark: SparkSession, path: String): Option[Long] = {
    val f = fs(spark, path)
    val p = new Path(path, LatestFile)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
        in.readFully(0, buf)
        Some(new String(buf, "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  /** Current table contents (empty DataFrame with the given schema when
    * the store has never been written). */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    latestVersion(spark, path).map(v => spark.read.parquet(s"$path/v=$v"))

  private def commit(spark: SparkSession, path: String, next: DataFrame): Unit = {
    val v = latestVersion(spark, path).getOrElse(-1L) + 1L
    // keyed sinks are small relative to the pipeline (one row per window/
    // key-group); without coalesce every snapshot inherits the shuffle
    // partition count and writes N tiny files per batch
    next.coalesce(4).write.mode(SaveMode.Overwrite).parquet(s"$path/v=$v")
    val f = fs(spark, path)
    val tmp = new Path(path, s"$LatestFile.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // atomic pointer swap: FileContext.rename(OVERWRITE) replaces the
    // old pointer in one metadata op on posix/HDFS — readers always see
    // either the old or the new version, never a missing pointer
    val dst = new Path(path, LatestFile)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dst.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // retire all snapshots older than v-1 (keep the previous one for
    // in-flight readers). One listing of the store dir — O(live dirs),
    // which stays ~3 steady-state and self-heals after a crashed
    // commit's orphan
    f.listStatus(new Path(path)).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("v=")) {
        val ver = name.stripPrefix("v=").toLongOption
        if (ver.exists(_ < v - 1)) f.delete(st.getPath, true)
      }
    }
  }

  /** Keep exactly one row per key from `df` itself. A distributed batch
    * has no row order, so "last writer" is undefined within it;
    * dropDuplicates would keep a partitioning-dependent row. Instead the
    * GREATEST value-tuple wins (lexicographic struct max) — fully
    * deterministic, so a foreachBatch retry/replay converges to the
    * same row (the reference's three same-key writes still collapse to
    * one row, SURVEY §2.2; across separate calls, the later call wins).
    */
  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => false
    case st: org.apache.spark.sql.types.StructType => st.forall(f => orderable(f.dataType))
    case at: org.apache.spark.sql.types.ArrayType => orderable(at.elementType)
    case _ => true
  }

  private def dedupByKey(df: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains)
    val allOrderable = valueCols.forall(c => orderable(df.schema(c).dataType))
    if (valueCols.isEmpty || !allOrderable) {
      // map-typed values have no ordering; fall back to arbitrary-row
      // dedup (documented caveat: retry determinism not guaranteed then)
      df.dropDuplicates(keys)
    } else {
      val merged = df.groupBy(keys.map(k => df(s"`$k`")): _*)
        .agg(max(struct(valueCols.map(c => df(s"`$c`")): _*)).as("__v"))
      merged.select(df.columns.toIndexedSeq.map { c =>
        if (keys.contains(c)) merged(s"`$c`") else col("__v").getField(c).as(c)
      }: _*)
    }
  }

  /** Replace the entire store contents in ONE commit (atomic at the
    * pointer swap — readers see old-complete or new-complete, never
    * an empty intermediate). */
  def replace(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String]): Unit =
    commit(spark, path, dedupByKey(df, keys))

  def upsert(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String]): Unit = {
    val delta = dedupByKey(df, keys)
    val next = read(spark, path) match {
      case None => delta
      case Some(base) =>
        base.join(delta.select(keys.map(col): _*), keys, "left_anti").unionByName(delta)
    }
    commit(spark, path, next)
  }

  /** Strict insert: duplicate key (vs base or within the batch) errors —
    * Kudu INSERT semantics. */
  def insert(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String]): Unit = {
    read(spark, path) match {
      case Some(base) =>
        val clash = base.join(df, keys, "left_semi").count()
        require(clash == 0, s"insert: $clash row(s) violate primary key ${keys.mkString(",")}")
        val dupIn = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
        require(dupIn == 0, s"insert: batch contains $dupIn duplicated key group(s)")
        commit(spark, path, base.unionByName(df))
      case None =>
        val dupIn = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
        require(dupIn == 0, s"insert: batch contains $dupIn duplicated key group(s)")
        commit(spark, path, df)
    }
  }

  /** Insert rows whose keys are absent; silently skip the rest. */
  def insertIgnore(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String]): Unit = {
    val delta = dedupByKey(df, keys)
    val next = read(spark, path) match {
      case None => delta
      case Some(base) => base.unionByName(delta.join(base.select(keys.map(col): _*), keys, "left_anti"))
    }
    commit(spark, path, next)
  }

  /** Update only rows whose keys already exist. */
  def update(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String]): Unit = {
    read(spark, path) match {
      case None => () // nothing to update
      case Some(base) =>
        val delta = dedupByKey(df, keys).join(base.select(keys.map(col): _*), keys, "left_semi")
        commit(spark, path,
          base.join(delta.select(keys.map(col): _*), keys, "left_anti").unionByName(delta))
    }
  }

  /** Delete by key. */
  def delete(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String]): Unit = {
    read(spark, path) match {
      case None => ()
      case Some(base) =>
        commit(spark, path, base.join(df.select(keys.map(col): _*), keys, "left_anti"))
    }
  }
}

/** The five mutation verbs of the reference's KuduContext
  * (KafkaToKuduScala.scala:49-50), behind one interface. */
trait UpsertSink extends Serializable {
  def keys: Seq[String]
  def insert(df: DataFrame): Unit
  def insertIgnore(df: DataFrame): Unit
  def upsert(df: DataFrame): Unit
  def update(df: DataFrame): Unit
  def delete(df: DataFrame): Unit
  def read(spark: SparkSession): DataFrame
}

/** Local keyed-parquet implementation (tests / single-node). */
final class ParquetUpsertSink(spark: SparkSession, path: String, val keys: Seq[String])
    extends UpsertSink {
  override def insert(df: DataFrame): Unit       = UpsertStore.insert(spark, path, df, keys)
  override def insertIgnore(df: DataFrame): Unit = UpsertStore.insertIgnore(spark, path, df, keys)
  override def upsert(df: DataFrame): Unit       = UpsertStore.upsert(spark, path, df, keys)
  override def update(df: DataFrame): Unit       = UpsertStore.update(spark, path, df, keys)
  override def delete(df: DataFrame): Unit       = UpsertStore.delete(spark, path, df, keys)
  override def read(s: SparkSession): DataFrame =
    UpsertStore.read(s, path).getOrElse(
      throw new IllegalStateException(s"upsert store at $path has no committed version"))
}

/** Production Kudu binding, compiled behind the same interface
  * (SURVEY §7.1). This environment has no Kudu client jars or cluster,
  * so every verb is a documented stub — the seam is the deliverable:
  * `TrafficPipeline.run(src, new KuduUpsertSink(...), ...)` is the
  * production wiring, mirroring the reference's
  * `KuduContext.upsertRows(df, table)` (KafkaToKuduScala.scala:51)
  * and write paths K1–K3 without any pipeline change.
  */
final class KuduUpsertSink(
    masterAddresses: String, table: String, val keys: Seq[String])
    extends UpsertSink {
  private def unavailable(verb: String): Nothing =
    throw new UnsupportedOperationException(
      s"Kudu $verb on $table@$masterAddresses: kudu-spark client not present " +
        "in this environment; bind org.apache.kudu:kudu-spark3 and replace " +
        "these bodies with KuduContext.{insert,upsert,update,delete}Rows")
  override def insert(df: org.apache.spark.sql.DataFrame): Unit       = unavailable("INSERT")
  override def insertIgnore(df: org.apache.spark.sql.DataFrame): Unit = unavailable("INSERT_IGNORE")
  override def upsert(df: org.apache.spark.sql.DataFrame): Unit       = unavailable("UPSERT")
  override def update(df: org.apache.spark.sql.DataFrame): Unit       = unavailable("UPDATE")
  override def delete(df: org.apache.spark.sql.DataFrame): Unit       = unavailable("DELETE")
  override def read(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    unavailable("SCAN")
}
