package graft.javaapi;

import static org.apache.spark.sql.functions.avg;
import static org.apache.spark.sql.functions.col;
import static org.apache.spark.sql.functions.expr;
import static org.apache.spark.sql.functions.max;
import static org.apache.spark.sql.functions.min;
import static org.apache.spark.sql.functions.round;
import static org.apache.spark.sql.functions.timestamp_millis;
import static org.apache.spark.sql.functions.unix_timestamp;
import static org.apache.spark.sql.functions.window;

import java.util.List;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.streaming.StreamingQuery;
import org.apache.spark.sql.streaming.Trigger;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;

import graft.streaming.ParquetUpsertSink;
import graft.streaming.TrafficPipeline;
import graft.streaming.UpsertSink;

/**
 * Java-API entry point — multi-language parity with the Scala engine.
 *
 * The reference ships the SAME pipeline three times, once per language
 * (KafkaToKuduScala.scala:12, KafkaToKuduJava.java:48,
 * kafka_to_kudu.py:7), with the Java copy demonstrating the
 * explicit-StructType schema idiom (KafkaToKuduJava.java:97-101,
 * SURVEY §1.3 style 2). This class is the rebuild's Java twin: the
 * batch transforms are declared with the Java column API (identical
 * Catalyst plans to the Scala declarations — pinned by
 * JavaApiParitySpec), and the streaming wiring reuses the Scala
 * {@link TrafficPipeline} and {@link UpsertSink} directly, so a Java
 * caller gets the exact same engine, not a re-implementation.
 */
public final class GraftJava {
  private GraftJava() {}

  /**
   * Explicit programmatic schema of a parsed traffic record — the
   * reference's Java schema idiom (KafkaToKuduJava.java:97-101):
   * {@code DataTypes.createStructType(new StructField[]{...})}.
   */
  public static StructType parsedSchema() {
    return DataTypes.createStructType(new StructField[] {
      DataTypes.createStructField("measurement_time", DataTypes.LongType, false),
      DataTypes.createStructField("number_of_vehicles", DataTypes.IntegerType, false)
    });
  }

  /**
   * Parse raw {@code "<epoch_ms>,<n_vehicles>"} lines in a string
   * {@code value} column (reference T1/T3/T4 incl. the
   * trailing-whitespace trim, KafkaToKuduJava.java:85-95). Same
   * declarative plan as {@code TrafficPipeline.parse}.
   */
  public static Dataset<Row> parse(Dataset<Row> raw) {
    return raw
        .withColumn("measurement_time",
            expr("try_cast(trim(get(split(value, ','), 0)) AS LONG)"))
        .withColumn("number_of_vehicles",
            expr("try_cast(trim(get(split(value, ','), 1)) AS INT)"))
        .filter(col("measurement_time").isNotNull()
            .and(col("number_of_vehicles").isNotNull()))
        .select("measurement_time", "number_of_vehicles");
  }

  /**
   * The reference's aggregation (SURVEY §2.4 A1-A4, F2) over sliding
   * event-time windows, declared with the Java column API —
   * deterministic window-start key, like the Scala twin.
   */
  public static Dataset<Row> aggregate(Dataset<Row> parsed, String windowLen, String slide) {
    return parsed
        .withColumn("ts", timestamp_millis(col("measurement_time")))
        .groupBy(window(col("ts"), windowLen, slide))
        .agg(
            round(avg("number_of_vehicles"), 2).as("avg_num_veh"),
            min("number_of_vehicles").as("min_num_veh"),
            max("number_of_vehicles").as("max_num_veh"),
            min("measurement_time").as("first_meas_time"),
            max("measurement_time").as("last_meas_time"))
        .select(
            unix_timestamp(col("window.start")).multiply(1000).as("as_of_time"),
            col("avg_num_veh"), col("min_num_veh"), col("max_num_veh"),
            col("first_meas_time"), col("last_meas_time"));
  }

  /**
   * The same aggregation through the SQL entry point (the reference's
   * registerTempTable + spark.sql path, KafkaToKuduJava.java:101-110).
   */
  public static Dataset<Row> aggregateSql(SparkSession spark, Dataset<Row> parsed) {
    parsed.createOrReplaceTempView("traffic");
    return spark.sql(
        "SELECT unix_timestamp(window.start) * 1000 AS as_of_time, "
            + "ROUND(AVG(number_of_vehicles), 2) AS avg_num_veh, "
            + "MIN(number_of_vehicles) AS min_num_veh, "
            + "MAX(number_of_vehicles) AS max_num_veh, "
            + "MIN(measurement_time) AS first_meas_time, "
            + "MAX(measurement_time) AS last_meas_time "
            + "FROM (SELECT *, timestamp_millis(measurement_time) AS ts FROM traffic) "
            + "GROUP BY window(ts, '60 seconds', '5 seconds')");
  }

  /**
   * Catalog registration of the near-dup pair graph + cluster table
   * from Java (the q99 serve path): build-or-gate-serve over
   * {@code docs} and register {@code graft.<name>} /
   * {@code graft.<name>__clusters}; after this, plain
   * {@code spark.sql} reads the live tables. Returns the store path to
   * hand to the incremental maintenance entry points. Requires
   * {@code spark.sql.catalog.graft} to be configured.
   */
  public static String registerPairGraph(SparkSession spark, String name,
      Dataset<Row> docs, String dataDir, double tau) {
    return graft.operators.PairGraph.registerCatalog(
        spark, name, docs, dataDir, tau, "graft");
  }

  /** The embedding twin (the q100 pure-SQL ANN serve path): IVF cells
   *  + centroids registered as {@code graft.<name>} /
   *  {@code graft.<name>__centroids}. */
  public static String registerVectorIndex(SparkSession spark, String name,
      Dataset<Row> emb, String dataDir, int centroids) {
    return graft.operators.VectorIndex.registerCatalog(
        spark, name, emb, dataDir, centroids, "graft");
  }

  /** The sparse-retrieval twin (the q106 pure-SQL BM25 serve path):
   *  postings / vocabulary / corpus stats registered as
   *  {@code graft.<name>} / {@code graft.<name>__df} /
   *  {@code graft.<name>__stats}. */
  public static String registerPostingsIndex(SparkSession spark, String name,
      Dataset<Row> docs) {
    return graft.operators.PostingsIndex.registerCatalog(
        spark, name, docs, "graft");
  }

  /** The compressed-ANN twin (the q127 pure-SQL PQ serve path):
   *  packed codes + per-subspace codebooks registered as
   *  {@code graft.<name>} / {@code graft.<name>__codebooks}.
   *  {@code emb} carries (vec_id, emb double[]). */
  public static String registerPqIndex(SparkSession spark, String name,
      Dataset<Row> emb) {
    return graft.operators.PqIndex.registerCatalog(
        spark, name, emb, "graft");
  }

  /** The contamination twin (the q160 pure-SQL adjudication path):
   *  the train split's 8-gram postings + gram frequencies registered
   *  as {@code graft.<name>} / {@code graft.<name>__df}.
   *  {@code trainDocs} carries (doc_id, text). */
  public static String registerShingleIndex(SparkSession spark, String name,
      Dataset<Row> trainDocs) {
    return graft.operators.ShingleIndex.registerCatalog(
        spark, name, trainDocs, "graft");
  }

  /** The distinct-set twin (the q175 pure-SQL retention path):
   *  per-day theta sketches of {@code events}' distinct users
   *  registered as {@code graft.<name>} (day_ms, sk), theta set-op
   *  functions registered in the session.
   *  {@code events} carries (ts, user_id). */
  public static String registerThetaStore(SparkSession spark, String name,
      Dataset<Row> events, int k) {
    return graft.streaming.ThetaMaintainer.registerCatalog(
        spark, name, events, k, "graft");
  }

  /** The composed-ANN twin (the q186 pure-SQL IVFADC serve path):
   *  one (vec_id, cell, codes) row per vector registered as
   *  {@code graft.<name>} with {@code graft.<name>__centroids} /
   *  {@code graft.<name>__codebooks}. {@code emb} carries
   *  (vec_id, emb double[]). */
  public static String registerIvfPqIndex(SparkSession spark, String name,
      Dataset<Row> emb, int centroids) {
    return graft.operators.IvfPqIndex.registerCatalog(
        spark, name, emb, centroids, "graft");
  }

  /** The substring-search twin (the q179 pure-SQL serve path): the
   *  corpus' character-trigram postings + gram frequencies registered
   *  as {@code graft.<name>} / {@code graft.<name>__df}.
   *  {@code docs} carries (doc_id, text). */
  public static String registerTrigramIndex(SparkSession spark, String name,
      Dataset<Row> docs) {
    return graft.operators.TrigramIndex.registerCatalog(
        spark, name, docs, "graft");
  }

  /** The exact-phrase twin (the q193 pure-SQL serve path): the
   *  corpus' positional postings (term, doc_id, positions) registered
   *  as {@code graft.<name>}. {@code docs} carries (doc_id, text). */
  public static String registerPhraseIndex(SparkSession spark, String name,
      Dataset<Row> docs) {
    return graft.operators.PhraseIndex.registerCatalog(
        spark, name, docs, "graft");
  }

  /** The near-dup-probe twin (the q180 pure-SQL serve path): the
   *  corpus' doc→SimHash fingerprints + banded chunk postings
   *  registered as {@code graft.<name>} / {@code graft.<name>__chunks}
   *  (probe SQL uses the session-registered {@code simhash64}).
   *  {@code docs} carries (doc_id, text). */
  public static String registerSimhashIndex(SparkSession spark, String name,
      Dataset<Row> docs) {
    return graft.operators.SimhashIndex.registerCatalog(
        spark, name, docs, "graft");
  }

  /** The materialized-join-view twin (the q196 pure-SQL serve path):
   *  orders x customer maintained as {@code graft.<name>} (+
   *  {@code __left}/{@code __right} side tables), readable and
   *  VERSION-AS-OF-readable by table name; the returned maintainer
   *  takes delta ingests on either side. */
  public static graft.streaming.JoinViewMaintainer registerJoinView(
      SparkSession spark, String name, Dataset<Row> orders, Dataset<Row> customer) {
    return graft.streaming.JoinViewMaintainer.registerCatalog(
        spark, name, orders, customer, "graft");
  }

  /** TAKEDOWN verbs by store path (round 18): the compliance tool that
   *  files a right-to-be-forgotten batch is usually not Scala — each
   *  verb drives the family's exact inverse (blast-radius-sized keyed
   *  deletes, df recounts for exactly the touched terms/grams,
   *  XOR fingerprint retreat so a gated rebuild is skipped) behind the
   *  SEPARATE retraction ledger; {@code txnId} ids must be monotonic
   *  per store across takedowns (replays self-skip). {@code gone}
   *  carries full (doc_id, text) rows — (vec_id, emb) for the dense
   *  stores. The store path is what the matching register* returned. */
  public static void retractPostings(SparkSession spark, Dataset<Row> gone,
      String path, long txnId) {
    graft.operators.PostingsIndex.retract(spark, gone, path, some(txnId));
  }

  public static void retractTrigramIndex(SparkSession spark, Dataset<Row> gone,
      String path, long txnId) {
    graft.operators.TrigramIndex.retract(spark, gone, path, some(txnId));
  }

  public static void retractPhraseIndex(SparkSession spark, Dataset<Row> gone,
      String path, long txnId) {
    graft.operators.PhraseIndex.retract(spark, gone, path, some(txnId));
  }

  public static void retractSimhashIndex(SparkSession spark, Dataset<Row> gone,
      String path, long txnId) {
    graft.operators.SimhashIndex.retract(spark, gone, path, some(txnId));
  }

  /** {@code n} is the gram width the index was built with (8 by
   *  default — a retracted TRAIN doc must stop adjudicating eval docs
   *  as contaminated, the q200 lifecycle). */
  public static void retractShingleIndex(SparkSession spark, Dataset<Row> gone,
      String path, int n, long txnId) {
    graft.operators.ShingleIndex.retract(spark, gone, path, n, some(txnId));
  }

  public static void retractIvfPqIndex(SparkSession spark, Dataset<Row> gone,
      String path, long txnId) {
    graft.operators.IvfPqIndex.retract(spark, gone, path, some(txnId));
  }

  /** CURATION-COMPOSITION registration (round 19 — VERDICT r18 #3):
   *  bootstrap the gate → pairs/clusters → facts → manifest
   *  composition at the catalog warehouse and register its auditable
   *  stores ({@code graft.<name>__manifest} / {@code __facts} /
   *  {@code __gate}) so a takedown's effect — manifest row gone,
   *  canonical promoted in the gate's seen table — is plain SQL.
   *  The returned maintainer's {@code storePath()} is what
   *  {@link #retractManifest} takes. */
  public static graft.streaming.ManifestMaintainer registerManifest(
      SparkSession spark, String name, String dataDir, Dataset<Row> corpus) {
    return graft.streaming.ManifestMaintainer.registerCatalog(
        spark, name, dataDir, corpus, "graft");
  }

  /** The takedown verb a compliance tool calls FIRST: drive the whole
   *  curation composition's retraction — gate re-point + canonical
   *  promotion, pair/cluster splits, facts refresh, scoped manifest
   *  refresh — behind the composition's separate retraction ledger.
   *  {@code gone} carries full (doc_id, text) rows; {@code storePath}
   *  is what {@link #registerManifest}'s maintainer reports. */
  public static void retractManifest(SparkSession spark, Dataset<Row> gone,
      String dataDir, String storePath, long txnId) {
    new graft.streaming.ManifestMaintainer(spark, dataDir, storePath, 0.6)
        .retract(gone, txnId);
  }

  /** DSIR count-store takedown: exact subtraction with the persisted
   *  pre-mutation targets (replay-idempotent), doc_id-deduped batch.
   *  {@code targetLang} must match what the store was built with. */
  public static void retractDsir(SparkSession spark, Dataset<Row> gone,
      String storePath, String targetLang, long txnId) {
    new graft.streaming.DsirMaintainer(spark, storePath, targetLang)
        .retract(gone, txnId);
  }

  /** Rollup takedown: the additive inverse — gone events aggregate
   *  alone and subtract exactly; emptied (event_type, day) rows lose
   *  their row. {@code gone} carries (event_type, ts, value) events. */
  public static void retractRollup(SparkSession spark, Dataset<Row> gone,
      String storePath, long txnId) {
    new graft.streaming.RollupMaintainer(spark, storePath).retract(gone, txnId);
  }

  /** EXTERNAL-query ANN serve (round 19 — VERDICT r18 #7): top-k from
   *  the registered IVF-PQ store for a (query_id, qe double[]) batch
   *  that brings its own vectors — no self-exclusion, the production
   *  retrieval shape. {@code nProbe <= 0} resolves to the fraction
   *  pin. {@code emb} supplies corpus raw vectors for the re-rank. */
  public static Dataset<Row> serveIvfPqQueries(SparkSession spark,
      Dataset<Row> emb, String path, Dataset<Row> queries, int nProbe, int k) {
    // poolC -1 = the default measured k<=3 pool margin; a deeper k
    // needs its own measured pool (the q204 contract)
    return graft.operators.IvfPqIndex.searchQueries(
        spark, emb, path, queries, nProbe, k, -1);
  }

  private static scala.Option<Object> some(long v) {
    return scala.Option.apply((Object) Long.valueOf(v));
  }

  /** Local keyed-parquet upsert sink (the KuduContext verb set behind
   *  one interface), constructed from Java. */
  public static UpsertSink parquetSink(SparkSession spark, String path, List<String> keys) {
    return new ParquetUpsertSink(spark, path,
        scala.jdk.javaapi.CollectionConverters.asScala(keys).toSeq());
  }

  /**
   * End-to-end streaming pipeline from Java: source with a string
   * {@code value} column → parse → windowed aggregate → keyed upsert —
   * delegates to the Scala {@link TrafficPipeline#run}, so Java callers
   * run the identical two-level-aggregation engine (checkpointed,
   * replay-idempotent).
   */
  public static StreamingQuery run(Dataset<Row> source, UpsertSink sink,
      String checkpointDir, Trigger trigger) {
    return TrafficPipeline.run(source, sink, checkpointDir, trigger,
        "60 seconds", "5 seconds", "10 seconds");
  }
}
