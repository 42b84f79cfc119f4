package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.streaming.UpsertStore

/** Spark DataSource ("graft-upsert") over the keyed
  * [[graft.streaming.UpsertStore]] — the rebuild of the reference's
  * Kudu connector surface (SURVEY §2.1 S2, §2.2 K2/K3):
  *
  *  - `spark.read.format("graft-upsert").option("path", p).load()` —
  *    sink read-back (S2);
  *  - `df.write.format("graft-upsert").option("path", p)
  *    .option("keys", "k1,k2").mode("append").save()` — append mode
  *    translates to UPSERT, exactly like the Kudu writer the reference
  *    relies on (KafkaToKuduScala.scala:53-56);
  *  - register the loaded DataFrame as a temp view and
  *    `INSERT INTO <view> SELECT ...` — [[InsertableRelation]] routes
  *    the SQL write back through the same upsert (K3).
  *
  * The V1 `RelationProvider` API is used deliberately: it is the only
  * stable API where one class provides scan + writer + SQL-INSERT with
  * upsert semantics (the same reason the Kudu connector stayed V1).
  */
class UpsertRelationProvider
    extends RelationProvider
    with CreatableRelationProvider
    with SchemaRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-upsert"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-upsert requires option 'path'"))

  private def keysOf(parameters: Map[String, String]): Seq[String] =
    parameters.get("keys").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

  private def versionOf(parameters: Map[String, String]): Option[Long] =
    parameters.get("versionAsOf").map(_.trim.toLong)

  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation =
    UpsertRelation(ctx.sparkSession, pathOf(parameters), keysOf(parameters), None,
      versionOf(parameters))

  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String], schema: StructType): BaseRelation =
    UpsertRelation(ctx.sparkSession, pathOf(parameters), keysOf(parameters), Some(schema),
      versionOf(parameters))

  /** `df.write...save()` — append ⇒ upsert; overwrite ⇒ replace. */
  override def createRelation(
      ctx: SQLContext, mode: SaveMode, parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val spark = ctx.sparkSession
    val path = pathOf(parameters)
    val keys = keysOf(parameters)
    require(keys.nonEmpty, "graft-upsert write requires option 'keys'")
    def exists = UpsertStore.latestVersion(spark, path).isDefined
    mode match {
      case SaveMode.Append =>
        UpsertStore.upsert(spark, path, data, keys)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft-upsert store at $path already exists (SaveMode.ErrorIfExists); " +
            "use mode(\"append\") for upsert semantics")
        UpsertStore.upsert(spark, path, data, keys)
      case SaveMode.Overwrite =>
        UpsertStore.replace(spark, path, data, keys) // one atomic commit
      case SaveMode.Ignore =>
        if (!exists) UpsertStore.upsert(spark, path, data, keys)
    }
    UpsertRelation(spark, path, keys, None)
  }
}

object UpsertRelation {
  /** Translate a V1 pushdown [[Filter]] into a Column predicate over
    * the MERGED view — semantically identical to the post-scan filter
    * Spark would apply, so always correct to push; untranslatable
    * filters stay above the scan. Catalyst then pushes key-column
    * predicates further down through the last-writer-wins merge to
    * the parquet scans themselves (predicates on grouping columns
    * pass below the merge aggregate), so a keyed point/range read
    * touches only matching row groups. Shared by the V1 relation's
    * [[PrunedFilteredScan]] and the catalog's V2 ScanBuilder. */
  private[sources] def translate(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.col
    f match {
      case EqualTo(a, v)            => Some(col(s"`$a`") === v)
      case LessThan(a, v)           => Some(col(s"`$a`") < v)
      case LessThanOrEqual(a, v)    => Some(col(s"`$a`") <= v)
      case GreaterThan(a, v)        => Some(col(s"`$a`") > v)
      case GreaterThanOrEqual(a, v) => Some(col(s"`$a`") >= v)
      case In(a, vs)                => Some(col(s"`$a`").isin(vs.toIndexedSeq: _*))
      case IsNull(a)                => Some(col(s"`$a`").isNull)
      case IsNotNull(a)             => Some(col(s"`$a`").isNotNull)
      case And(l, r) =>
        for (lc <- translate(l); rc <- translate(r)) yield lc && rc
      case Or(l, r) =>
        for (lc <- translate(l); rc <- translate(r)) yield lc || rc
      case _ => None
    }
  }
}

case class UpsertRelation(
    spark: SparkSession,
    path: String,
    keys: Seq[String],
    providedSchema: Option[StructType],
    versionAsOf: Option[Long] = None,
    pushedFilters: Seq[Filter] = Nil,
    prunedTo: Option[StructType] = None)
    extends BaseRelation with TableScan with PrunedFilteredScan with InsertableRelation {

  override def sqlContext: SQLContext = spark.sqlContext

  private def current: DataFrame = versionAsOf match {
    case Some(v) => UpsertStore.readVersion(spark, path, v)
    case None => UpsertStore.read(spark, path).getOrElse {
      providedSchema match {
        case Some(s) => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], s)
        case None => throw new IllegalStateException(
          s"graft-upsert at $path is empty and no schema was provided")
      }
    }
  }

  override def schema: StructType =
    prunedTo.getOrElse(providedSchema.getOrElse(current.schema))

  /** Planner statistics from the store manifest (VERDICT r15 #7):
    * live-part file bytes, so joins against metadata-sized stores
    * broadcast without hints. Parquet bytes UNDERSTATE in-memory row
    * size, but the stores this matters for (centroids, codebooks,
    * probe tables) sit orders of magnitude below the broadcast
    * threshold; a missing manifest falls back to Spark's default
    * (never-broadcast) size. */
  override def sizeInBytes: Long =
    UpsertStore.sizeInBytes(spark, path).getOrElse(super.sizeInBytes)

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(f => UpsertRelation.translate(f).isEmpty)

  /** Pruned + filtered scan (the V1 read path — Spark's planner
    * prefers this over the plain [[TableScan]] when both are
    * implemented): without it, every SQL read of a derived store
    * materialized the FULL merged table through the Row-conversion
    * boundary — a `WHERE vec_id < 5` probe-side read of a 100 TB cell
    * table would scan all of it (q100's plan before round 11).
    * Filters cut rows before the conversion; pruning cuts the
    * converted width. */
  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    import org.apache.spark.sql.functions.col
    val filtered = filters.flatMap(UpsertRelation.translate)
      .foldLeft(applyPushed)(_.filter(_))
    val pruned =
      if (requiredColumns.isEmpty) filtered
      else filtered.select(requiredColumns.toIndexedSeq.map(c => col(s"`$c`")): _*)
    pruned.rdd
  }

  /** Plain scan (the DSv2 [[org.apache.spark.sql.connector.read.V1Scan]]
    * bridge casts to [[TableScan]] — the catalog path): serves
    * whatever the V2 ScanBuilder already pushed into this relation. */
  override def buildScan(): RDD[Row] = applyPushed.rdd

  private def applyPushed: DataFrame = {
    import org.apache.spark.sql.functions.col
    val filtered = pushedFilters.flatMap(UpsertRelation.translate)
      .foldLeft(current)(_.filter(_))
    prunedTo match {
      case Some(s) if s.nonEmpty =>
        filtered.select(s.fieldNames.toIndexedSeq.map(c => col(s"`$c`")): _*)
      case _ => filtered
    }
  }

  /** SQL `INSERT INTO <view> SELECT ...` → upsert (reference K3). */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(versionAsOf.isEmpty, "a versionAsOf snapshot is read-only")
    require(keys.nonEmpty, "graft-upsert INSERT requires option 'keys'")
    if (overwrite) UpsertStore.replace(spark, path, data, keys) // one atomic commit
    else UpsertStore.upsert(spark, path, data, keys)
  }
}
