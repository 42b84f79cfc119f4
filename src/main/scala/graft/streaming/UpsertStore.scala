package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned, keyed, last-writer-wins parquet store with a Delta-style
  * delta log — the local stand-in for the reference's Kudu sink
  * (SURVEY §7.1 "UpsertSink trait … local keyed-Parquet implementation
  * for tests, Kudu behind the same interface in production").
  *
  * Layout: `<path>/v=N/` base snapshots, `<path>/d=N/` upsert deltas,
  * `<path>/_LATEST` manifest (`seq`, live base, live delta list, key
  * columns). A hot-path upsert writes ONLY its deduped batch as a new
  * delta dir and swaps the manifest — O(|batch|) I/O instead of
  * rewriting the whole keyed table every micro-batch (the round-1 B2
  * bottleneck). Readers merge base + deltas last-writer-wins (highest
  * manifest seq per key). Every `maxDeltas` upserts — and on every
  * non-upsert verb — the store compacts back to a single base snapshot,
  * so read cost stays bounded.
  *
  * The manifest swap is a FileContext.rename(OVERWRITE): readers see
  * old-complete or new-complete, never partial state; a crashed commit
  * leaves an unreferenced dir that the next compaction's GC removes.
  * A foreachBatch retry appends a second identical delta whose merge
  * result equals the first — contents converge, preserving the
  * reference's idempotent-upsert semantics (KafkaToKuduScala.scala:47).
  *
  * Single-writer by design: Structured Streaming serializes
  * `foreachBatch` invocations per query, matching Kudu's
  * one-session-per-batch usage in the reference
  * (KafkaToKuduScala.scala:51).
  *
  * Scale: the delta append is the same shape as Kudu's MemRowSet flush
  * or a Delta-Lake commit; compaction is one keyed shuffle over
  * |base| + Σ|deltas|, amortized across `maxDeltas` batches. A 100 TB
  * keyed sink is what Kudu/Delta are for; this interface is the seam
  * where they plug in.
  *
  * Schema EVOLVES additively: a batch carrying new columns widens the
  * table (missing values read as null on both old and new rows) — all
  * merges union by name with missing columns allowed, the Delta
  * mergeSchema behavior a long-lived ingest table needs.
  */
object UpsertStore {
  private val LatestFile = "_LATEST"
  private val LogDir = "_log"
  /** Compact after this many live deltas (amortizes the full-merge cost
    * over that many micro-batches; read merges at most this many parts
    * on top of the base). */
  val DefaultMaxDeltas = 8

  private case class Manifest(seq: Long, base: Option[Long], deltas: Seq[Long],
                              keys: Seq[String], txn: Long = -1L)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parseManifest(text: String): Manifest = {
    val fields = text.trim.split(';').map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap
    Manifest(
      fields("seq").toLong,
      fields("base") match { case "-" => None; case v => Some(v.toLong) },
      fields("deltas") match { case "-" => Nil; case v => v.split(',').toSeq.map(_.toLong) },
      fields("keys").split(',').toSeq,
      fields.getOrElse("txn", "-1").toLong)
  }

  private def readFileText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(0, buf)
      new String(buf, "UTF-8")
    } finally in.close()
  }

  private def readManifest(spark: SparkSession, path: String): Option[Manifest] = {
    val f = fs(spark, path)
    val p = new Path(path, LatestFile)
    if (!f.exists(p)) None else Some(parseManifest(readFileText(f, p)))
  }

  private def writeManifest(spark: SparkSession, path: String, m: Manifest): Unit = {
    val f = fs(spark, path)
    val text = Seq(
      s"seq=${m.seq}",
      s"base=${m.base.map(_.toString).getOrElse("-")}",
      s"deltas=${if (m.deltas.isEmpty) "-" else m.deltas.mkString(",")}",
      s"keys=${m.keys.mkString(",")}",
      s"txn=${m.txn}").mkString(";")
    // immutable per-commit manifest copy (the Delta-log pattern) BEFORE
    // the pointer swap: the commit log is what makes snapshots
    // addressable for time travel; an orphan log entry from a crash in
    // this window is inert because versions()/readVersion() serve only
    // entries at or below the committed _LATEST head
    val logEntry = new Path(path, s"$LogDir/${m.seq}")
    f.mkdirs(new Path(path, LogDir))
    val lout = f.create(logEntry, true)
    try lout.write(text.getBytes("UTF-8")) finally lout.close()
    val tmp = new Path(path, s"$LatestFile.tmp")
    val out = f.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    // atomic pointer swap: FileContext.rename(OVERWRITE) replaces the
    // old manifest in one metadata op on posix/HDFS
    val dst = new Path(path, LatestFile)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dst.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Exists/version probe (used by the relation provider). */
  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    readManifest(spark, path).map(_.seq)

  /** Highest committed txn id in the manifest ledger (−1 when none) —
    * a maintainer that composes non-ledgered verbs around its upserts
    * (e.g. the join-view maintainer's stale-row delete) checks this
    * FIRST, so a replayed foreachBatch skips the whole composition
    * instead of re-running the side verbs against post-batch state. */
  def committedTxn(spark: SparkSession, path: String): Long =
    readManifest(spark, path).map(_.txn).getOrElse(-1L)

  /** Total bytes of the CURRENT manifest's live part files — the stats
    * surface for planner broadcast decisions (VERDICT r15 #7): a keyed
    * store registered as a catalog table reports this size, so the
    * planner broadcasts metadata-sized stores WITHOUT per-query hints.
    * Key-overlapping deltas make this an overestimate of the merged
    * frame — the safe direction (never broadcasts something too big).
    * One metadata listing per live part dir, no data read. */
  def sizeInBytes(spark: SparkSession, path: String): Option[Long] =
    readManifest(spark, path).map { m =>
      val f = fs(spark, path)
      val dirs = m.base.map(v => new Path(path, s"v=$v")).toSeq ++
        m.deltas.map(v => new Path(path, s"d=$v"))
      dirs.map { d =>
        try f.getContentSummary(d).getLength catch { case _: Exception => 0L }
      }.sum
    }

  private def mergeParts(spark: SparkSession, path: String, m: Manifest,
                         scope: Option[DataFrame] = None): DataFrame = {
    val parts =
      m.base.map(v => spark.read.parquet(s"$path/v=$v").withColumn("__seq", lit(v))).toSeq ++
        m.deltas.map(v => spark.read.parquet(s"$path/d=$v").withColumn("__seq", lit(v)))
    val all0 = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    // SCOPED merge (round 19, guide §2.3/§2.4): restrict the
    // last-writer-wins merge to key GROUPS any of whose live versions
    // matches `scope` (semi-join on scope's columns). Whole groups are
    // kept — filtering individual versions could crown a superseded
    // row. When every scope column is a KEY column, all versions of a
    // key share the scope values, so group membership IS row
    // membership and one semi-join (pushed below the merge) suffices;
    // a value-column scope needs the key-collecting first pass. Either
    // way the merge shuffle is scope-fan-out-sized, not store-sized.
    val all = scope match {
      case None => all0
      case Some(sc) =>
        val scCols = sc.columns.toSeq
        if (parts.size == 1 || scCols.forall(m.keys.contains))
          all0.join(sc, scCols, "left_semi")
        else {
          val hit = all0.join(sc, scCols, "left_semi")
            .select(m.keys.map(k => col(s"`$k`")): _*).distinct()
          all0.join(hit, m.keys, "left_semi")
        }
    }
    if (m.deltas.isEmpty || parts.size == 1) all.drop("__seq")
    else {
      val cols = all.columns.filterNot(_ == "__seq")
      val valueCols = cols.filterNot(m.keys.contains)
      if (valueCols.isEmpty) all.select(cols.toIndexedSeq.map(c => col(s"`$c`")): _*).distinct()
      else {
        val merged = all.groupBy(m.keys.map(k => col(s"`$k`")): _*)
          .agg(max_by(struct(valueCols.toIndexedSeq.map(c => col(s"`$c`")): _*), col("__seq")).as("__v"))
        merged.select(cols.toIndexedSeq.map { c =>
          if (m.keys.contains(c)) merged(s"`$c`") else col("__v").getField(c).as(c)
        }: _*)
      }
    }
  }

  /** Current table contents: base + deltas merged last-writer-wins
    * (highest commit seq per key; each part is already key-unique). */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    readManifest(spark, path).map(m => mergeParts(spark, path, m))

  /** Current contents RESTRICTED to key groups whose ANY live version
    * semi-joins `scope` (on scope's column names). When the scope
    * columns are the store's keys this is exactly `read().semiJoin(
    * scope)`; for value-column scopes (e.g. an FK) it is a SUPERSET of
    * the current rows matching scope — a current row whose older
    * version matched rides along and must be re-filtered by the
    * caller's join, which every call site already does. The point is
    * the plan shape (guide §2.3/§2.4): the last-writer-wins merge
    * shuffle runs over the scope's fan-out instead of the whole store
    * — at 100 TB a dimension trickle must not re-shuffle the fact
    * store. */
  def readScoped(spark: SparkSession, path: String, scope: DataFrame): Option[DataFrame] =
    readManifest(spark, path).map(m => mergeParts(spark, path, m, Some(scope)))

  /** Committed snapshot ids, oldest first, with whether each is still
    * READABLE (every data dir its manifest references still exists).
    * Compaction GC retires dirs below the previous base, so readable
    * history spans roughly the last two compaction windows — the same
    * contract as Delta/Iceberg history after VACUUM. */
  def versions(spark: SparkSession, path: String): Seq[(Long, Boolean)] = {
    val f = fs(spark, path)
    val logDir = new Path(path, LogDir)
    // gate on the committed pointer: a crash between the `_log/<seq>`
    // write and the `_LATEST` swap leaves an orphan entry whose seq is
    // ABOVE the committed head — a state that never became the table
    // must not be servable via time travel
    val committed = readManifest(spark, path).map(_.seq).getOrElse(-1L)
    if (!f.exists(logDir)) Seq.empty
    else f.listStatus(logDir).toSeq
      .flatMap(st => st.getPath.getName.toLongOption)
      .filter(_ <= committed)
      .sorted
      .map { v =>
        val m = parseManifest(readFileText(f, new Path(logDir, v.toString)))
        val dirs = m.base.map(b => s"v=$b").toSeq ++ m.deltas.map(d => s"d=$d")
        v -> dirs.forall(dir => f.exists(new Path(path, dir)))
      }
  }

  /** Explicit retention (Delta VACUUM analogue): delete every data dir
    * the CURRENT manifest does not reference, plus the commit-log
    * entries those dirs served — compaction's lazy GC keeps the
    * previous base chain for in-flight readers; vacuum reclaims it on
    * demand. Time travel afterwards reaches exactly the commits the
    * live base+delta chain can reconstruct. Returns (data dirs, log
    * entries) removed. */
  def vacuum(spark: SparkSession, path: String): (Int, Int) = {
    val f = fs(spark, path)
    val m = readManifest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no store at $path"))
    val live: Set[String] =
      (m.base.map(b => s"v=$b").toSeq ++ m.deltas.map(d => s"d=$d")).toSet
    val removedDirs = f.listStatus(new Path(path)).count { st =>
      val name = st.getPath.getName
      val stale = (name.startsWith("v=") || name.startsWith("d=")) && !live.contains(name)
      if (stale) f.delete(st.getPath, true)
      stale
    }
    val logDir = new Path(path, LogDir)
    val removedLogs = if (!f.exists(logDir)) 0 else f.listStatus(logDir).count { st =>
      val readable = st.getPath.getName.toLongOption.exists { v =>
        val cm = parseManifest(readFileText(f, st.getPath))
        (cm.base.map(b => s"v=$b").toSeq ++ cm.deltas.map(d => s"d=$d"))
          .forall(dir => f.exists(new Path(path, dir)))
      }
      if (!readable) f.delete(st.getPath, false)
      !readable
    }
    (removedDirs, removedLogs)
  }

  /** Change feed (Delta CDF analogue): the upserted rows of every
    * commit STRICTLY AFTER `sinceVersion`, tagged `__commit_version` —
    * what an incremental consumer reads instead of re-scanning the
    * table. Works while every newer commit is still a live delta
    * append; a compaction or replace in the window folds per-commit
    * granularity away, and the feed fails loudly telling the consumer
    * to re-snapshot (the same contract Delta CDF has after VACUUM /
    * rewrite). Rows here are the UPSERTS as written — a consumer
    * applying them in `__commit_version` order reproduces the table's
    * last-writer-wins state. */
  def changesSince(spark: SparkSession, path: String, sinceVersion: Long): DataFrame = {
    val f = fs(spark, path)
    val m = readManifest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no store at $path"))
    require(sinceVersion <= m.seq,
      s"sinceVersion $sinceVersion is ahead of the store (latest ${m.seq})")
    val wanted = (sinceVersion + 1) to m.seq
    val parts = wanted.map { w =>
      val entry = new Path(path, s"$LogDir/$w")
      if (!f.exists(entry))
        throw new IllegalArgumentException(
          s"commit $w of $path has no log entry; re-snapshot from read()")
      val cm = parseManifest(readFileText(f, entry))
      val isDeltaAppend = cm.deltas.lastOption.contains(w) && f.exists(new Path(path, s"d=$w"))
      if (!isDeltaAppend)
        throw new IllegalArgumentException(
          s"commit $w of $path is a compaction/replace — per-commit changes were " +
            "folded; re-snapshot from read() and resume the feed from there")
      spark.read.parquet(s"$path/d=$w").withColumn("__commit_version", lit(w))
    }
    if (parts.isEmpty) {
      val empty = read(spark, path).get.limit(0)
      empty.withColumn("__commit_version", lit(0L))
    } else parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Time travel: the table AS OF commit `version` (`VERSION AS OF` /
    * `option("versionAsOf", v)`). Fails loudly when the version was
    * never committed or its data dirs have been compacted away. */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val f = fs(spark, path)
    val entry = new Path(path, s"$LogDir/$version")
    // same crash-window gate as versions(): an orphan log entry above
    // the committed `_LATEST` head was never committed
    val committed = readManifest(spark, path).map(_.seq).getOrElse(-1L)
    if (version > committed || !f.exists(entry)) {
      val avail = versions(spark, path).filter(_._2).map(_._1)
      throw new IllegalArgumentException(
        s"version $version of $path was never committed; readable versions: " +
          s"${avail.mkString("[", ",", "]")}")
    }
    val m = parseManifest(readFileText(f, entry))
    val missing = (m.base.map(b => s"v=$b").toSeq ++ m.deltas.map(d => s"d=$d"))
      .filterNot(dir => f.exists(new Path(path, dir)))
    if (missing.nonEmpty) {
      val avail = versions(spark, path).filter(_._2).map(_._1)
      throw new IllegalArgumentException(
        s"version $version of $path has been compacted away (missing " +
          s"${missing.mkString(",")}); readable versions: ${avail.mkString("[", ",", "]")}")
    }
    mergeParts(spark, path, m)
  }

  /** Full-snapshot commit: write `next` as the new base, clear the
    * delta list, GC dirs older than the previous manifest's live set
    * (kept for in-flight readers). */
  private def commitBase(spark: SparkSession, path: String, next: DataFrame,
                         keys: Seq[String], txn: Long = -1L): Unit = {
    val prev = readManifest(spark, path)
    val v = prev.map(_.seq).getOrElse(-1L) + 1L
    val effTxn = math.max(txn, prev.map(_.txn).getOrElse(-1L))
    // keyed sinks are small relative to the pipeline (one row per window/
    // key-group); without coalesce every snapshot inherits the shuffle
    // partition count and writes N tiny files per batch
    next.coalesce(4).write.mode(SaveMode.Overwrite).parquet(s"$path/v=$v")
    writeManifest(spark, path, Manifest(v, Some(v), Nil, keys, effTxn))
    // retire dirs below the previous manifest's live horizon (previous
    // base + its deltas stay for in-flight readers). One listing —
    // O(live dirs), ~2 + maxDeltas steady-state, self-heals orphans
    val horizon = prev.flatMap(_.base).getOrElse(v)
    val f = fs(spark, path)
    f.listStatus(new Path(path)).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("v=") || name.startsWith("d=")) {
        val ver = name.drop(2).toLongOption
        if (ver.exists(ver => ver < horizon && ver != v)) f.delete(st.getPath, true)
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

  /** graft-visible (ADVICE r16): a composing maintainer that feeds the
    * SAME batch to two stores (e.g. the join-view maintainer's side
    * store + view join) must dedup ONCE and hand the identical deduped
    * frame to both — two independent dedups of a key-repeating batch
    * are deterministic here (greatest value-tuple), but sharing one
    * frame makes the winners agree by construction, not by argument. */
  private[graft] def dedupByKey(df: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains)
    val allOrderable = valueCols.forall(c => orderable(df.schema(c).dataType))
    if (valueCols.isEmpty || !allOrderable) {
      // map-typed values have no ordering; fall back to arbitrary-row
      // dedup (documented caveat: retry determinism not guaranteed then)
      df.dropDuplicates(keys)
    } else {
      val merged = df.groupBy(keys.map(k => df(s"`$k`")): _*)
        .agg(max(struct(valueCols.toIndexedSeq.map(c => df(s"`$c`")): _*)).as("__v"))
      merged.select(df.columns.toIndexedSeq.map { c =>
        if (keys.contains(c)) merged(s"`$c`") else col("__v").getField(c).as(c)
      }: _*)
    }
  }

  /** Replace the entire store contents in ONE commit (atomic at the
    * pointer swap — readers see old-complete or new-complete, never
    * an empty intermediate). `assumeKeyUnique` skips the within-batch
    * dedup shuffle when the caller guarantees one row per key (e.g.
    * the output of a keyed aggregation, or a single meta row) — the
    * same contract as [[upsert]]'s flag; wrongly asserting it makes
    * the kept row partitioning-dependent, nothing worse. */
  def replace(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String],
              assumeKeyUnique: Boolean = false): Unit =
    commitBase(spark, path, if (assumeKeyUnique) df else dedupByKey(df, keys), keys)

  /** Hot-path upsert: append the deduped batch as a delta (O(|batch|)
    * I/O); compact to a fresh base once the delta list reaches
    * `maxDeltas`. `assumeKeyUnique` skips the within-batch dedup
    * shuffle when the caller guarantees one row per key (e.g. the
    * output of a keyed aggregation) — wrongly asserting it makes the
    * kept row partitioning-dependent, nothing worse. `txnId` makes the
    * write TRANSACTIONALLY idempotent: the manifest records the highest
    * committed id, and a replayed foreachBatch (same batchId) is
    * skipped outright instead of relying on value-convergence —
    * exactly-once to this sink, the same ledger trick as Structured
    * Streaming's own commit log. Monotonically increasing ids per
    * store are the caller's contract (batchId is). */
  def upsert(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String],
             maxDeltas: Int = DefaultMaxDeltas, assumeKeyUnique: Boolean = false,
             txnId: Option[Long] = None): Unit = {
    val prev = readManifest(spark, path)
    if (txnId.exists(t => prev.exists(_.txn >= t))) return // replay: already committed
    val txn = txnId.orElse(prev.map(_.txn)).getOrElse(-1L)
    val delta = if (assumeKeyUnique) df else dedupByKey(df, keys)
    prev match {
      case None =>
        commitBase(spark, path, delta, keys, txn)
      case Some(m) if m.deltas.size >= maxDeltas - 1 =>
        // compaction turn: fold base + deltas + this batch into one base
        val merged = read(spark, path).get
          .join(delta.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(delta, allowMissingColumns = true)
        commitBase(spark, path, merged, keys, txn)
      case Some(m) =>
        val v = m.seq + 1
        delta.coalesce(4).write.mode(SaveMode.Overwrite).parquet(s"$path/d=$v")
        writeManifest(spark, path, m.copy(seq = v, deltas = m.deltas :+ v, txn = txn))
    }
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
        commitBase(spark, path, base.unionByName(df, allowMissingColumns = true), keys)
      case None =>
        val dupIn = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
        require(dupIn == 0, s"insert: batch contains $dupIn duplicated key group(s)")
        commitBase(spark, path, df, keys)
    }
  }

  /** Insert rows whose keys are absent; silently skip the rest.
    * Hot-path friendly: the batch is anti-joined down to genuinely new
    * keys and DELTA-appended via [[upsert]] (new keys can't collide, so
    * last-writer-wins merge preserves first-writer semantics) — the
    * streaming near-dup index calls this every micro-batch, and a full
    * rewrite per batch would be the round-1 B2 mistake again. */
  def insertIgnore(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String]): Unit = {
    val delta = dedupByKey(df, keys)
    read(spark, path) match {
      case None => commitBase(spark, path, delta, keys)
      case Some(base) =>
        val fresh = delta.join(base.select(keys.map(col): _*), keys, "left_anti")
          .localCheckpoint() // materialize once: emptiness check + write
        if (!fresh.isEmpty) upsert(spark, path, fresh, keys, assumeKeyUnique = true)
        // all keys already present: no empty delta dir, no version churn
    }
  }

  /** Update only rows whose keys already exist. */
  def update(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String]): Unit = {
    read(spark, path) match {
      case None => () // nothing to update
      case Some(base) =>
        val delta = dedupByKey(df, keys).join(base.select(keys.map(col): _*), keys, "left_semi")
        commitBase(spark, path,
          base.join(delta.select(keys.map(col): _*), keys, "left_anti")
            .unionByName(delta, allowMissingColumns = true), keys)
    }
  }

  /** DELETE by key and UPSERT rows in ONE commit (round 19 — VERDICT
    * r18 #4): the takedown path pairs a keyed delete with a keyed
    * upsert against the same store at five sites (gate seen +
    * decisions, facts, clusters, manifest), and each [[delete]] is
    * already a full base rewrite — paying a second manifest commit
    * for the paired upsert is pure per-store commit latency. The
    * fused rewrite (kept = base ∖ (delKeys ∪ rows' keys); next =
    * kept ∪ rows) is row-equal to delete-then-upsert by construction
    * — and being one ATOMIC pointer swap it also removes the
    * deleted-but-not-yet-upserted crash window. Readers see
    * old-complete or new-complete, never the gap. */
  def deleteUpsert(spark: SparkSession, path: String, delKeys: DataFrame,
                   rows: DataFrame, keys: Seq[String],
                   assumeKeyUnique: Boolean = false): Unit = {
    val up = if (assumeKeyUnique) rows else dedupByKey(rows, keys)
    read(spark, path) match {
      case None => commitBase(spark, path, up, keys)
      case Some(base) =>
        val delAll = delKeys.select(keys.map(col): _*)
          .unionByName(up.select(keys.map(col): _*))
        val kept = base.join(delAll, keys, "left_anti")
          .select(base.columns.toIndexedSeq.map(c => col(s"`$c`")): _*)
        commitBase(spark, path,
          kept.unionByName(up, allowMissingColumns = true), keys)
    }
  }

  /** Delete by key. The kept rows re-select the base's column order —
    * a `join(…, usingColumns)` hoists the join keys to the front, and
    * a delete must not reshape the table it prunes. */
  def delete(spark: SparkSession, path: String, df: DataFrame, keys: Seq[String]): Unit = {
    read(spark, path) match {
      case None => ()
      case Some(base) =>
        val kept = base.join(df.select(keys.map(col): _*), keys, "left_anti")
          .select(base.columns.toIndexedSeq.map(c => col(s"`$c`")): _*)
        commitBase(spark, path, kept, keys)
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

  /** Upsert with optimization hints from a streaming caller: the batch
    * is key-unique by construction and `txnId` identifies the
    * micro-batch for transactional replay skipping. Default ignores
    * the hints (plain upsert — always correct); implementations that
    * can exploit them (dedup-shuffle skip, commit-ledger idempotence)
    * should override, so foreachBatch callers need no instanceof
    * special-casing per sink. */
  def upsertUnique(df: DataFrame, txnId: Option[Long] = None): Unit = upsert(df)
}

/** Local keyed-parquet implementation (tests / single-node). */
final class ParquetUpsertSink(spark: SparkSession, path: String, val keys: Seq[String])
    extends UpsertSink {
  /** Exploits both hints: skips the within-batch dedup shuffle and
    * records `txnId` in the manifest for transactional replay skipping
    * (see [[UpsertStore.upsert]]). */
  override def upsertUnique(df: DataFrame, txnId: Option[Long] = None): Unit =
    UpsertStore.upsert(spark, path, df, keys, assumeKeyUnique = true, txnId = txnId)
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
