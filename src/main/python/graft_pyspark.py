"""PySpark entry point -- multi-language parity with the Scala engine.

The reference ships the same pipeline three times, once per language
(KafkaToKuduScala.scala:12, KafkaToKuduJava.java:48,
kafka_to_kudu.py:7).  This module is the rebuild's Python twin, closing
the three-language surface next to ``graft.SparkEntry`` (Scala) and
``graft.javaapi.GraftJava`` (Java):

 - the batch transforms (``parse`` / ``aggregate`` / ``aggregate_sql``)
   are declared NATIVELY with the PySpark column API -- same
   declarative plan, so Catalyst compiles Python callers to the
   identical physical execution as the Scala/Java twins (checked by
   ``scripts/check_python_parity.py``);
 - everything stateful or engine-shaped (declared queries, the keyed
   upsert sink verb set, the streaming traffic pipeline) is BRIDGED via
   Py4J to the one JVM engine rather than re-implemented, so Python
   callers cannot drift from it.

Usage requires the graft jar on the driver classpath::

    spark = (SparkSession.builder
        .config("spark.driver.extraClassPath", GRAFT_JAR)
        .config("spark.jars", GRAFT_JAR)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate())

The reference's Python copy used a processing-time ``UNIX_TIMESTAMP()``
as-of key (kafka_to_kudu.py:32) and upserted through two equivalent
write paths (kafka_to_kudu.py:44-52); here the deterministic
event-time window key is the default (parity with the Scala twin) and
both write paths exist as ``df.write.format("graft-upsert")`` and the
sink verb set below.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------- batch

def parse(raw: DataFrame) -> DataFrame:
    """Parse raw ``"<epoch_ms>,<n_vehicles>"`` lines in a string
    ``value`` column (reference T1/T3/T4 incl. the trailing-whitespace
    trim) -- same declarative plan as ``TrafficPipeline.parse``."""
    return (raw
            .withColumn("measurement_time",
                        F.expr("try_cast(trim(get(split(value, ','), 0)) AS LONG)"))
            .withColumn("number_of_vehicles",
                        F.expr("try_cast(trim(get(split(value, ','), 1)) AS INT)"))
            .filter(F.col("measurement_time").isNotNull()
                    & F.col("number_of_vehicles").isNotNull())
            .select("measurement_time", "number_of_vehicles"))


def aggregate(parsed: DataFrame, window_len: str = "60 seconds",
              slide: str = "5 seconds") -> DataFrame:
    """The reference aggregation (A1-A4, F2) over sliding event-time
    windows with the deterministic window-start key."""
    return (parsed
            .withColumn("ts", F.timestamp_millis(F.col("measurement_time")))
            .groupBy(F.window(F.col("ts"), window_len, slide))
            .agg(F.round(F.avg("number_of_vehicles"), 2).alias("avg_num_veh"),
                 F.min("number_of_vehicles").alias("min_num_veh"),
                 F.max("number_of_vehicles").alias("max_num_veh"),
                 F.min("measurement_time").alias("first_meas_time"),
                 F.max("measurement_time").alias("last_meas_time"))
            .select((F.unix_timestamp(F.col("window.start")) * 1000).alias("as_of_time"),
                    "avg_num_veh", "min_num_veh", "max_num_veh",
                    "first_meas_time", "last_meas_time"))


def aggregate_sql(spark: SparkSession, parsed: DataFrame) -> DataFrame:
    """The same aggregation through the SQL entry point (the reference's
    registerTempTable + spark.sql path, kafka_to_kudu.py:30-38)."""
    parsed.createOrReplaceTempView("traffic")
    return spark.sql(
        "SELECT unix_timestamp(window.start) * 1000 AS as_of_time, "
        "ROUND(AVG(number_of_vehicles), 2) AS avg_num_veh, "
        "MIN(number_of_vehicles) AS min_num_veh, "
        "MAX(number_of_vehicles) AS max_num_veh, "
        "MIN(measurement_time) AS first_meas_time, "
        "MAX(measurement_time) AS last_meas_time "
        "FROM (SELECT *, timestamp_millis(measurement_time) AS ts FROM traffic) "
        "GROUP BY window(ts, '60 seconds', '5 seconds')")


# ------------------------------------------------- declared query bridge

def query_names(spark: SparkSession):
    """All declared query names (SURVEY.md section 2 inventory)."""
    return list(spark._jvm.graft.SparkEntry.queryNames())


def run_query(spark: SparkSession, name: str, data_dir: str) -> DataFrame:
    """Run a declared engine query by name over the parquet tables in
    ``data_dir`` -- the same QueryDef the driver's correctness gate
    executes, bridged so Python drives the identical plan."""
    jdf = spark._jvm.graft.SparkEntry.runQuery(spark._jsparkSession, name, data_dir)
    return DataFrame(jdf, spark)


# ------------------------------------------- derived-store catalog (round 8)

def register_pair_graph(spark: SparkSession, name: str, docs: DataFrame,
                        data_dir: str, tau: float = 0.6,
                        catalog: str = "graft") -> str:
    """Build (or gate-serve) the near-dup pair graph + cluster table for
    ``docs`` at the ``catalog`` warehouse and register them as
    ``<catalog>.<name>`` / ``<catalog>.<name>__clusters`` -- after this,
    plain ``spark.sql`` reads the live tables (the q99 serve path).
    Requires ``spark.sql.catalog.<catalog>`` to be configured.  Returns
    the store path to pass to the incremental maintenance entry points.
    """
    return spark._jvm.graft.operators.PairGraph.registerCatalog(
        spark._jsparkSession, name, docs._jdf, data_dir, float(tau), catalog)


def register_vector_index(spark: SparkSession, name: str, emb: DataFrame,
                          data_dir: str, centroids: int = 16,
                          catalog: str = "graft") -> str:
    """The embedding twin: IVF cells + centroids registered as
    ``<catalog>.<name>`` / ``<catalog>.<name>__centroids`` (the q100
    pure-SQL ANN serve path reads these)."""
    return spark._jvm.graft.operators.VectorIndex.registerCatalog(
        spark._jsparkSession, name, emb._jdf, data_dir, int(centroids), catalog)


def register_postings_index(spark: SparkSession, name: str, docs: DataFrame,
                            catalog: str = "graft") -> str:
    """The sparse-retrieval twin: BM25 postings / vocabulary / corpus
    stats registered as ``<catalog>.<name>`` / ``<catalog>.<name>__df``
    / ``<catalog>.<name>__stats`` (the q106 pure-SQL BM25 serve path
    reads these)."""
    return spark._jvm.graft.operators.PostingsIndex.registerCatalog(
        spark._jsparkSession, name, docs._jdf, catalog)


def register_pq_index(spark: SparkSession, name: str, emb: DataFrame,
                      catalog: str = "graft") -> str:
    """The compressed-ANN twin: product-quantization codes + codebooks
    registered as ``<catalog>.<name>`` / ``<catalog>.<name>__codebooks``
    (the q127 pure-SQL PQ serve path reads these).  ``emb`` carries
    ``(vec_id, emb: array<double>)``."""
    return spark._jvm.graft.operators.PqIndex.registerCatalog(
        spark._jsparkSession, name, emb._jdf, catalog)


def register_shingle_index(spark: SparkSession, name: str,
                           train_docs: DataFrame,
                           catalog: str = "graft") -> str:
    """The contamination twin: the train split's 8-gram postings +
    gram frequencies registered as ``<catalog>.<name>`` /
    ``<catalog>.<name>__df`` (the q160 pure-SQL contamination
    adjudication reads these by table name).  ``train_docs`` carries
    ``(doc_id, text)``."""
    return spark._jvm.graft.operators.ShingleIndex.registerCatalog(
        spark._jsparkSession, name, train_docs._jdf, catalog)


def register_theta_store(spark: SparkSession, name: str, events: DataFrame,
                         k: int = 512, catalog: str = "graft") -> str:
    """The distinct-set twin: per-day theta (KMV) sketches of
    ``events``' distinct users registered as ``<catalog>.<name>``
    (day_ms, sk), with the ``theta_*`` set-op functions put in the
    session registry -- the q175 pure-SQL retention adjudication
    (intersect / a-not-b / union estimates between any two days) runs
    by table name.  ``events`` carries ``(ts timestamp, user_id)``."""
    return spark._jvm.graft.streaming.ThetaMaintainer.registerCatalog(
        spark._jsparkSession, name, events._jdf, int(k), catalog)


def register_ivfpq_index(spark: SparkSession, name: str, emb: DataFrame,
                         centroids: int = 16, catalog: str = "graft") -> str:
    """The composed-ANN twin: IVF cell + 8-byte PQ code per vector
    registered as ``<catalog>.<name>`` (vec_id, cell, codes) with
    ``<catalog>.<name>__centroids`` / ``<catalog>.<name>__codebooks``
    (the q186 pure-SQL IVFADC serve reads all three by table name).
    ``emb`` carries ``(vec_id, emb: array<double>)``."""
    return spark._jvm.graft.operators.IvfPqIndex.registerCatalog(
        spark._jsparkSession, name, emb._jdf, int(centroids), catalog)


def register_trigram_index(spark: SparkSession, name: str, docs: DataFrame,
                           catalog: str = "graft") -> str:
    """The substring-search twin: the corpus' character-trigram
    postings + gram document frequencies registered as
    ``<catalog>.<name>`` / ``<catalog>.<name>__df`` (the q179 pure-SQL
    LIKE-'%pat%' serve reads these by table name: rarest-K grams by
    stored df, posting-list intersection, candidate-only verify).
    ``docs`` carries ``(doc_id, text)``."""
    return spark._jvm.graft.operators.TrigramIndex.registerCatalog(
        spark._jsparkSession, name, docs._jdf, catalog)


def register_phrase_index(spark: SparkSession, name: str, docs: DataFrame,
                          catalog: str = "graft") -> str:
    """The exact-phrase twin: the corpus' positional postings
    (term, doc_id, positions) registered as ``<catalog>.<name>`` (the
    q193 pure-SQL phrase serve reads it by table name: phrase offsets
    via ``posexplode``, matched-posting join, start votes, the
    all-offsets-present group, overlap-aware hit counts).  ``docs``
    carries ``(doc_id, text)``."""
    return spark._jvm.graft.operators.PhraseIndex.registerCatalog(
        spark._jsparkSession, name, docs._jdf, catalog)


def register_join_view(spark: SparkSession, name: str, orders: DataFrame,
                       customer: DataFrame, catalog: str = "graft"):
    """The materialized-join-view twin: ``orders x customer``
    maintained as ``<catalog>.<name>`` (+ ``__left``/``__right`` side
    tables), readable — and ``VERSION AS OF``-readable — in plain SQL
    by table name (the q196 serve path).  Returns the JVM maintainer
    handle; ``ingestLeft``/``ingestRight`` fold deltas in."""
    return spark._jvm.graft.streaming.JoinViewMaintainer.registerCatalog(
        spark._jsparkSession, name, orders._jdf, customer._jdf, catalog)


def register_simhash_index(spark: SparkSession, name: str, docs: DataFrame,
                           catalog: str = "graft") -> str:
    """The near-dup-probe twin: the corpus' doc→SimHash fingerprints +
    banded chunk postings registered as ``<catalog>.<name>`` /
    ``<catalog>.<name>__chunks`` (the q180 pure-SQL probe reads these
    by table name, with ``simhash64`` from the session function
    registry).  ``docs`` carries ``(doc_id, text)``."""
    return spark._jvm.graft.operators.SimhashIndex.registerCatalog(
        spark._jsparkSession, name, docs._jdf, catalog)


# ------------------------------------------------------- takedown verbs

def retract_postings(spark: SparkSession, gone: DataFrame, path: str,
                     txn_id: int) -> None:
    """TAKEDOWN by store path (round 18): drive the BM25 postings
    family's exact inverse — keyed deletes recomputed from the gone
    docs' text, df recounted for exactly the touched terms, corpus
    stats + fingerprint retreat — behind the separate retraction
    ledger (``txn_id`` monotonic per store; replays self-skip).
    ``gone`` carries full ``(doc_id, text)`` rows; ``path`` is what
    :func:`register_postings_index` returned."""
    spark._jvm.graft.javaapi.GraftJava.retractPostings(
        spark._jsparkSession, gone._jdf, path, int(txn_id))


def retract_trigram_index(spark: SparkSession, gone: DataFrame, path: str,
                          txn_id: int) -> None:
    """Substring-search takedown — :func:`retract_postings`'s contract
    for the trigram family."""
    spark._jvm.graft.javaapi.GraftJava.retractTrigramIndex(
        spark._jsparkSession, gone._jdf, path, int(txn_id))


def retract_phrase_index(spark: SparkSession, gone: DataFrame, path: str,
                         txn_id: int) -> None:
    """Phrase-search takedown — a pure keyed delete (the family's
    content-idempotent inverse)."""
    spark._jvm.graft.javaapi.GraftJava.retractPhraseIndex(
        spark._jsparkSession, gone._jdf, path, int(txn_id))


def retract_simhash_index(spark: SparkSession, gone: DataFrame, path: str,
                          txn_id: int) -> None:
    """Near-dup-probe takedown — chunk rows are dropped only when no
    surviving doc shares the fingerprint."""
    spark._jvm.graft.javaapi.GraftJava.retractSimhashIndex(
        spark._jsparkSession, gone._jdf, path, int(txn_id))


def retract_shingle_index(spark: SparkSession, gone: DataFrame, path: str,
                          n: int = 8, txn_id: int = 0) -> None:
    """Contamination takedown (the q200 lifecycle): a retracted TRAIN
    doc must stop adjudicating eval docs as contaminated.  ``n`` is
    the gram width the index was built with."""
    spark._jvm.graft.javaapi.GraftJava.retractShingleIndex(
        spark._jsparkSession, gone._jdf, path, int(n), int(txn_id))


def retract_ivfpq_index(spark: SparkSession, gone: DataFrame, path: str,
                        txn_id: int) -> None:
    """Dense-ANN takedown — keyed tombstone, NO retrain (the
    fixed-sample quantizer geometry is membership-independent).
    ``gone`` carries ``(vec_id, emb)``."""
    spark._jvm.graft.javaapi.GraftJava.retractIvfPqIndex(
        spark._jsparkSession, gone._jdf, path, int(txn_id))


def register_manifest(spark: SparkSession, name: str, data_dir: str,
                      corpus: DataFrame) -> str:
    """Register the CURATION COMPOSITION (round 19): bootstrap the
    gate -> pairs/clusters -> facts -> manifest chain at the catalog
    warehouse and register its auditable stores
    (``graft.<name>__manifest`` / ``__facts`` / ``__gate``) so a
    takedown's effect — manifest row gone, canonical promoted — reads
    in plain SQL.  Returns the composition's store path (what
    :func:`retract_manifest` takes)."""
    mm = spark._jvm.graft.javaapi.GraftJava.registerManifest(
        spark._jsparkSession, name, data_dir, corpus._jdf)
    return mm.storePath()


def retract_manifest(spark: SparkSession, gone: DataFrame, data_dir: str,
                     store_path: str, txn_id: int) -> None:
    """The takedown verb a compliance tool calls FIRST: drive the whole
    curation composition's retraction (gate re-point + canonical
    promotion, cluster splits, facts refresh, scoped manifest refresh)
    behind the composition's separate retraction ledger.  ``gone``
    carries full ``(doc_id, text)`` rows."""
    spark._jvm.graft.javaapi.GraftJava.retractManifest(
        spark._jsparkSession, gone._jdf, data_dir, store_path, int(txn_id))


def retract_dsir(spark: SparkSession, gone: DataFrame, store_path: str,
                 target_lang: str, txn_id: int) -> None:
    """DSIR count-store takedown: exact subtraction with persisted
    pre-mutation targets (replay-idempotent), doc_id-deduped batch.
    ``target_lang`` must match what the store was built with."""
    spark._jvm.graft.javaapi.GraftJava.retractDsir(
        spark._jsparkSession, gone._jdf, store_path, target_lang, int(txn_id))


def retract_rollup(spark: SparkSession, gone: DataFrame, store_path: str,
                   txn_id: int) -> None:
    """Rollup takedown: the additive inverse — gone events aggregate
    alone and subtract exactly; emptied (event_type, day) rows lose
    their row.  ``gone`` carries ``(event_type, ts, value)`` events."""
    spark._jvm.graft.javaapi.GraftJava.retractRollup(
        spark._jsparkSession, gone._jdf, store_path, int(txn_id))


def serve_ivfpq_queries(spark: SparkSession, emb: DataFrame, path: str,
                        queries: DataFrame, n_probe: int = -1,
                        k: int = 3) -> DataFrame:
    """EXTERNAL-query ANN serve (round 19): top-k from the registered
    IVF-PQ store for a ``(query_id, qe double[])`` batch that brings
    its own vectors — no self-exclusion, the production retrieval
    shape.  ``n_probe <= 0`` resolves to the fraction pin."""
    return DataFrame(spark._jvm.graft.javaapi.GraftJava.serveIvfPqQueries(
        spark._jsparkSession, emb._jdf, path, queries._jdf,
        int(n_probe), int(k)), spark)


# ------------------------------------------------------- upsert sink

class UpsertSink:
    """The KuduContext verb set (insert / insertIgnore / upsert /
    update / delete) over the engine's keyed store, from Python.  The
    reference notes PySpark had no KuduContext (kafka_to_kudu.py:54);
    this bridge closes that gap against the rebuild's sink."""

    def __init__(self, spark: SparkSession, path: str, keys):
        self._spark = spark
        self._jsink = spark._jvm.graft.javaapi.GraftJava.parquetSink(
            spark._jsparkSession, path, list(keys))

    def insert(self, df: DataFrame):        self._jsink.insert(df._jdf)
    def insert_ignore(self, df: DataFrame): self._jsink.insertIgnore(df._jdf)
    def upsert(self, df: DataFrame):        self._jsink.upsert(df._jdf)
    def update(self, df: DataFrame):        self._jsink.update(df._jdf)
    def delete(self, df: DataFrame):        self._jsink.delete(df._jdf)

    def read(self) -> DataFrame:
        return DataFrame(self._jsink.read(self._spark._jsparkSession), self._spark)


# ------------------------------------------------------- streaming

def run_traffic_pipeline(source: DataFrame, sink: UpsertSink,
                         checkpoint_dir: str,
                         trigger_interval: str = "5 seconds"):
    """End-to-end streaming pipeline from Python: source with a string
    ``value`` column -> parse -> windowed aggregate -> keyed upsert.
    Delegates to the Scala ``TrafficPipeline.run`` (two-level
    aggregation, checkpointed, replay-idempotent), so Python callers
    run the exact same engine.  Returns a ``StreamingQuery``."""
    from pyspark.sql.streaming import StreamingQuery
    jtrigger = source.sparkSession._jvm.org.apache.spark.sql.streaming.Trigger \
        .ProcessingTime(trigger_interval)
    jsq = source.sparkSession._jvm.graft.javaapi.GraftJava.run(
        source._jdf, sink._jsink, checkpoint_dir, jtrigger)
    return StreamingQuery(jsq)
