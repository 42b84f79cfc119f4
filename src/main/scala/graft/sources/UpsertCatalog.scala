package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation, TableScan}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.UpsertStore

/** DataSource V2 catalog over [[graft.streaming.UpsertStore]] — the
  * catalog-visible face of the keyed upsert sink (SURVEY §2.1 S2's "V2
  * `Table` registered in a catalog" mapping; the V1
  * [[UpsertRelationProvider]] stays for `format("graft-upsert")` and
  * temp-view SQL INSERT parity).
  *
  * Register:
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.UpsertCatalog
  *   spark.sql.catalog.graft.path = /warehouse/graft
  * }}}
  * then tables live at `<path>/<namespace...>/<name>` and the full V2
  * surface works against the store:
  *
  *  - `df.writeTo("graft.t").tableProperty("keys", "k").create()` — CTAS
  *  - `df.writeTo("graft.t").append()` — append ⇒ UPSERT (the Kudu
  *    append-as-upsert contract, reference KafkaToKuduScala.scala:53-56)
  *  - `INSERT INTO graft.t …` / `INSERT OVERWRITE graft.t …` — upsert /
  *    atomic replace
  *  - `spark.table("graft.t")`, `SELECT … FROM graft.t` — merged
  *    last-writer-wins read-back
  *  - `DROP TABLE graft.t`
  *
  * Read and write bridge through the stable V1 connector adapters
  * ([[V1Scan]] / [[V1Write]], the same shape Spark's own JDBC V2
  * connector uses): the store's commit protocol is driver-coordinated
  * (delta append + atomic manifest swap), so the honest V2 integration
  * delegates to that protocol rather than faking per-task commits it
  * doesn't have. Distributed I/O still happens in the store's own
  * DataFrame writes.
  *
  * Catalog metadata is one `_TABLE` sidecar per table (key columns +
  * created schema). `loadTable` prefers the LIVE store schema once data
  * exists, so additive schema evolution through any write path is
  * immediately visible to catalog readers.
  *
  * Caveat (Spark catalog lifecycle, not ours): the session instantiates
  * each catalog ONCE, caching the warehouse path from the conf at first
  * use — a later `spark.conf.set("spark.sql.catalog.<name>.path", …)`
  * is silently ignored for that session. To point at a second
  * warehouse, register a second catalog name.
  */
class UpsertCatalog extends TableCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  /** The warehouse this INSTANCE serves (see the class-doc caveat:
    * the conf may have drifted since instantiation; writers must
    * target this path, not the conf's). */
  private[graft] def warehousePath: String = warehouse

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires option spark.sql.catalog.$name.path"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def dirOf(ident: Identifier): Path =
    new Path((warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/"))
  private def sidecar(ident: Identifier): Path = new Path(dirOf(ident), "_TABLE")

  override def tableExists(ident: Identifier): Boolean = fs.exists(sidecar(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = new Path((warehouse +: namespace.toSeq).mkString("/"))
    if (!fs.exists(nsDir)) Array.empty
    else fs.listStatus(nsDir).toSeq
      .filter(st => st.isDirectory && fs.exists(new Path(st.getPath, "_TABLE")))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val (keys, createdSchema) = readSidecar(ident)
    val path = dirOf(ident).toString
    // live store schema wins once data exists (additive evolution)
    val schema = UpsertStore.read(spark, path).map(_.schema).getOrElse(createdSchema)
    new UpsertV2Table(ident.toString, path, keys, schema)
  }

  /** `SELECT … FROM graft.t VERSION AS OF n` — a read-only snapshot at
    * commit n (readable history spans back to the previous compaction
    * base; see [[UpsertStore.versions]]). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val (keys, _) = readSidecar(ident)
    val path = dirOf(ident).toString
    val v = version.trim.toLong
    val schema = UpsertStore.readVersion(spark, path, v).schema
    new UpsertV2Table(s"${ident.toString}@v$v", path, keys, schema, versionAsOf = Some(v))
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "graft-upsert tables are keyed, not partitioned: use the 'keys' table property")
    val keys = Option(properties.get("keys"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "graft-upsert tables require a 'keys' table property (comma-separated key columns)"))
    val missing = keys.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"key columns not in schema: ${missing.mkString(",")}")
    fs.mkdirs(dirOf(ident))
    writeSidecar(ident, keys, schema)
    new UpsertV2Table(ident.toString, dirOf(ident).toString, keys, schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-upsert schema evolves additively through writes; ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(dirOf(ident), true)

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    fs.mkdirs(dirOf(to).getParent)
    fs.rename(dirOf(from), dirOf(to))
  }

  /** `_TABLE` sidecar: line 1 = comma-separated keys, rest = schema JSON. */
  private def writeSidecar(ident: Identifier, keys: Seq[String], schema: StructType): Unit = {
    val out = fs.create(sidecar(ident), true)
    try out.write(s"${keys.mkString(",")}\n${schema.json}".getBytes("UTF-8"))
    finally out.close()
  }

  private def readSidecar(ident: Identifier): (Seq[String], StructType) = {
    val p = sidecar(ident)
    val in = fs.open(p)
    val text = try {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(0, buf)
      new String(buf, "UTF-8")
    } finally in.close()
    val (keysLine, schemaJson) = text.span(_ != '\n')
    (keysLine.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      DataType.fromJson(schemaJson.trim).asInstanceOf[StructType])
  }
}

/** The V2 `Table`: batch read via [[V1Scan]] (merged last-writer-wins
  * snapshot, or the pinned commit when `versionAsOf` is set), batch
  * write via [[V1Write]] (append ⇒ upsert; truncate ⇒ atomic replace;
  * rejected on a version-pinned snapshot). */
class UpsertV2Table(tableName: String, path: String, keys: Seq[String],
                    tableSchema: StructType, versionAsOf: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def properties(): util.Map[String, String] =
    Map("keys" -> keys.mkString(","), "path" -> path).asJava
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  /** Scan builder WITH filter + column pushdown (VERDICT r10 #8): the
    * V1Scan bridge casts its relation to plain TableScan, so pushdown
    * must happen HERE, at the V2 layer — accepted filters and the
    * pruned schema ride into the relation, whose TableScan serves the
    * already-cut frame. Without this every catalog SQL read
    * materialized the full merged store through the Row-conversion
    * boundary (q100's probe side read the whole cell table for 5
    * rows). Untranslatable filters are returned as residual and Spark
    * re-applies them above the scan. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
      private var pruned: Option[StructType] = None

      override def pushFilters(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        val (ok, residual) = filters.partition(f => UpsertRelation.translate(f).isDefined)
        pushed = ok
        residual
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
      override def pruneColumns(requiredSchema: StructType): Unit =
        // empty projection (e.g. COUNT(*)) keeps the full schema — the
        // relation must still produce rows
        if (requiredSchema.nonEmpty) pruned = Some(requiredSchema)

      // SupportsReportStatistics (VERDICT r15 #7): the optimized plan's
      // DataSourceV2ScanRelation takes its stats from the SCAN, so the
      // join planner sees the store's true (manifest-listed) size and
      // broadcasts metadata-sized catalog tables without SQL hints
      override def build(): Scan = new V1Scan
          with org.apache.spark.sql.connector.read.SupportsReportStatistics {
        override def readSchema(): StructType = pruned.getOrElse(tableSchema)
        override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
          new org.apache.spark.sql.connector.read.Statistics {
            override def sizeInBytes(): util.OptionalLong =
              UpsertStore.sizeInBytes(SparkSession.active, path)
                .map(util.OptionalLong.of).getOrElse(util.OptionalLong.empty())
            override def numRows(): util.OptionalLong = util.OptionalLong.empty()
          }
        override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T =
          UpsertRelation(ctx.sparkSession, path, keys, Some(tableSchema), versionAsOf,
            pushed.toIndexedSeq, pruned)
            .asInstanceOf[T]
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(versionAsOf.isEmpty, s"$tableName is a read-only snapshot (VERSION AS OF)")
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation = new InsertableRelation {
          override def insert(data: DataFrame, overwrite: Boolean): Unit = {
            val s = data.sparkSession
            if (doTruncate || overwrite) UpsertStore.replace(s, path, data, keys)
            else UpsertStore.upsert(s, path, data, keys)
          }
        }
      }
    }
  }
}
