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

case class UpsertRelation(
    spark: SparkSession,
    path: String,
    keys: Seq[String],
    providedSchema: Option[StructType],
    versionAsOf: Option[Long] = None)
    extends BaseRelation with TableScan with InsertableRelation {

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

  override def schema: StructType = providedSchema.getOrElse(current.schema)

  override def buildScan(): RDD[Row] = current.rdd

  /** SQL `INSERT INTO <view> SELECT ...` → upsert (reference K3). */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(versionAsOf.isEmpty, "a versionAsOf snapshot is read-only")
    require(keys.nonEmpty, "graft-upsert INSERT requires option 'keys'")
    if (overwrite) UpsertStore.replace(spark, path, data, keys) // one atomic commit
    else UpsertStore.upsert(spark, path, data, keys)
  }
}
