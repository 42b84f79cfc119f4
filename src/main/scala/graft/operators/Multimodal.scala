package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal column convention: opaque `binary` payload + typed
  * metadata struct, with feature extraction as a per-partition batch
  * map. The container has no image/audio codecs, so the decode step is
  * a clearly-marked deterministic stub ([[StubDecoder]]); everything
  * Spark-side — schema, partitioning, batch iteration shape — is real
  * and tested.
  *
  * Scale: assets repartition by doc_id hash so payload bytes spread
  * evenly; decode is mapPartitions (one decoder instance per partition,
  * amortized init — same shape as a Pandas-UDF batch loop); features
  * come back as a fixed-width array<float> column ready for the
  * [[Similarity]] operators.
  */
object Multimodal {

  /** One media asset: payload + metadata (mime, dims filled by decode). */
  case class Asset(doc_id: Long, content: Array[Byte], mime: String)

  case class AssetFeatures(
      doc_id: Long, mime: String, n_bytes: Long, feature: Array[Float])

  /** Pluggable decoder: production would bind an image/audio codec here
    * (JNI / javax.imageio); this container ships only the stub. */
  trait AssetDecoder extends Serializable {
    def decode(a: Asset): Array[Float]
  }

  /** Deterministic fake decode: 16-bin byte histogram, L1-normalized.
    * Stands in for pixel/PCM feature extraction; real decode is
    * intentionally NOT implemented in this environment (no codec libs).
    */
  object StubDecoder extends AssetDecoder {
    override def decode(a: Asset): Array[Float] = {
      val bins = new Array[Float](16)
      var i = 0
      while (i < a.content.length) { bins((a.content(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(1, a.content.length).toFloat
      bins.map(_ / n)
    }
  }

  /** Build the asset table from documents (text bytes stand in for the
    * binary media payload). */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("content"),
        lit("text/plain").as("mime"))
      .as[Asset]
  }

  /** Batch feature extraction: one decoder per partition, streaming
    * iterator (no materialization of the whole partition). */
  def extractFeatures(ds: Dataset[Asset], decoder: AssetDecoder): Dataset[AssetFeatures] = {
    import ds.sparkSession.implicits._
    ds.repartition(col("doc_id"))
      .mapPartitions { it =>
        it.map { a =>
          AssetFeatures(a.doc_id, a.mime, a.content.length.toLong, decoder.decode(a))
        }
      }
  }

  /** Declared query: the full multimodal plumbing — binary column,
    * metadata, partitioned batch decode, feature summary. The stub
    * decode is a 16-bin byte histogram, which DuckDB can recompute
    * from the same payload (the corpus is ASCII, so `ord(char)` IS the
    * byte) — the oracle pins byte length, feature dimensionality, L1
    * normalization, and the dominant bin end-to-end through the
    * mapPartitions decode path. */
  val q54Multimodal: QueryDef = QueryDef.sql(
    "q54_multimodal_features",
    """WITH h AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n,
      |         list_transform(range(0, 16),
      |           b -> len(list_filter(split(text, ''), c -> ord(c) // 16 = b))) AS bins
      |  FROM documents)
      |SELECT doc_id, 'text/plain' AS mime, CAST(n AS BIGINT) AS n_bytes,
      |       CAST(16 AS BIGINT) AS feature_dim,
      |       ROUND(list_sum(list_transform(bins, c -> CAST(c AS DOUBLE) / n)), 4) AS feature_l1,
      |       CAST(list_position(bins, list_max(bins)) - 1 AS BIGINT) AS top_bin
      |FROM h
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    extractFeatures(assets(s, d), StubDecoder).toDF()
      .select(
        col("doc_id"), col("mime"), col("n_bytes"),
        size(col("feature")).cast("long").as("feature_dim"),
        round(aggregate(col("feature"),
          lit(0.0), (acc, v) => acc + v.cast("double")), 4).as("feature_l1"),
        (array_position(col("feature"), array_max(col("feature"))) - 1)
          .cast("long").as("top_bin"))
      .orderBy("doc_id")
  }

  /** Frame decode: one asset → many fixed-width frames, each decoded
    * independently (the video/audio sampling shape — a frame stands in
    * for a video keyframe / PCM window). */
  case class AssetFrame(
      doc_id: Long, frame_idx: Int, n_bytes: Long, feature: Array[Float])

  /** Per-frame batch decode: mapPartitions emits a row per 64-byte
    * frame — the one-to-many decode shape (frame sampling / chunked
    * PCM). Frames stay with their asset's partition; no shuffle. */
  def extractFrames(ds: Dataset[Asset], decoder: AssetDecoder,
                    frameBytes: Int = 64): Dataset[AssetFrame] = {
    import ds.sparkSession.implicits._
    ds.repartition(col("doc_id"))
      .mapPartitions { it =>
        it.flatMap { a =>
          a.content.grouped(frameBytes).zipWithIndex.map { case (frame, i) =>
            AssetFrame(a.doc_id, i,
              frame.length.toLong, decoder.decode(Asset(a.doc_id, frame, a.mime)))
          }
        }
      }
  }

  /** Declared frame-sampling query: every asset explodes into 64-byte
    * frames, each with its own decoded feature. Same oracle trick as
    * q54 — DuckDB recomputes the per-frame byte histogram from
    * substrings of the (ASCII) payload, pinning the frame boundaries,
    * per-frame byte counts, and dominant bin through the one-to-many
    * mapPartitions path. */
  val q65MultimodalFrames: QueryDef = QueryDef.sql(
    "q65_multimodal_frames",
    """WITH f AS (
      |  SELECT doc_id, i AS frame_idx,
      |         substr(text, i * 64 + 1, 64) AS frame
      |  FROM documents, unnest(range(0, CAST(CEIL(octet_length(encode(text)) / 64.0) AS BIGINT))) AS u(i)),
      |h AS (
      |  SELECT doc_id, frame_idx, octet_length(encode(frame)) AS n,
      |         list_transform(range(0, 16),
      |           b -> len(list_filter(split(frame, ''), c -> ord(c) // 16 = b))) AS bins
      |  FROM f)
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, CAST(n AS BIGINT) AS n_bytes,
      |       CAST(list_position(bins, list_max(bins)) - 1 AS BIGINT) AS top_bin
      |FROM h
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    extractFrames(assets(s, d), StubDecoder).toDF()
      .select(
        col("doc_id"), col("frame_idx"), col("n_bytes"),
        (array_position(col("feature"), array_max(col("feature"))) - 1)
          .cast("long").as("top_bin"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize / downsample a decoded feature vector by average-pooling
    * adjacent pairs (the 2× spatial-resize analogue on histogram
    * features) — pure higher-order array math, usable on any
    * array<float|double> feature column. */
  def poolFeature(feature: org.apache.spark.sql.Column, factor: Int = 2): org.apache.spark.sql.Column =
    transform(
      sequence(lit(0), (size(feature) / factor).cast("int") - 1),
      i => {
        val window = transform(sequence(lit(0), lit(factor - 1)),
          j => element_at(feature, (i * factor + j + 1).cast("int")))
        aggregate(window, lit(0.0d), (a, x) => a + x.cast("double")) / factor
      })

  /** Declared resize query: decode → 16-bin feature → 2× average-pool
    * → dominant coarse bin. The oracle recomputes the pooled histogram
    * from the payload in SQL, pinning the pooling arithmetic through
    * the same end-to-end path as q54/q65. */
  val q75MultimodalResize: QueryDef = QueryDef.sql(
    "q75_multimodal_resize",
    """WITH h AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n,
      |         list_transform(range(0, 16),
      |           b -> len(list_filter(split(text, ''), c -> ord(c) // 16 = b))) AS bins
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, n,
      |         list_transform(range(0, 8),
      |           b -> (CAST(bins[b * 2 + 1] AS DOUBLE) + bins[b * 2 + 2]) / (2.0 * n)) AS pooled
      |  FROM h)
      |SELECT doc_id,
      |       CAST(8 AS BIGINT) AS pooled_dim,
      |       CAST(list_position(pooled, list_max(pooled)) - 1 AS BIGINT) AS coarse_top_bin
      |FROM p
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // argmax only: pooled masses are 1/(2n)-quantized (gaps ≫ float32
    // noise) so the argmax is engine-stable, while the mass VALUE sits
    // on exact .5 rounding boundaries where the stub's float32 math and
    // the oracle's double math round apart
    extractFeatures(assets(s, d), StubDecoder).toDF()
      .withColumn("pooled", poolFeature(col("feature")))
      .select(
        col("doc_id"),
        size(col("pooled")).cast("long").as("pooled_dim"),
        (array_position(col("pooled"), array_max(col("pooled"))) - 1)
          .cast("long").as("coarse_top_bin"))
      .orderBy("doc_id")
  }

  case class FrameHash(doc_id: Long, frame_idx: Int, frame_sha: String)

  /** Frame content hashes for exact frame-level dedup: the same
    * per-partition batch loop as [[extractFrames]], but emitting a
    * SHA-256 of the raw frame bytes instead of decoded features — one
    * digest instance per partition, frames never leave the row as
    * anything wider than the 64-hex digest. */
  def frameHashes(ds: Dataset[Asset], frameBytes: Int = 64): Dataset[FrameHash] = {
    import ds.sparkSession.implicits._
    ds.repartition(col("doc_id"))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.flatMap { a =>
          a.content.grouped(frameBytes).zipWithIndex.map { case (frame, i) =>
            md.reset()
            FrameHash(a.doc_id, i, md.digest(frame).map("%02x".format(_)).mkString)
          }
        }
      }
  }

  /** Frame-level exact dedup — the video-corpus shape of q45: explode
    * every asset into frames, group frames BY CONTENT HASH corpus-wide,
    * and report per asset how many of its frames also occur elsewhere
    * (intros, credits, repeated stock footage — the segments a training
    * pipeline drops before sampling clips). The oracle groups frames by
    * their literal content (the corpus is ASCII, so `substr` slices
    * bytes), so the driver's hash compare proves the mapPartitions
    * framing + SHA grouping end-to-end; a SHA-256 collision would fail
    * it.
    *
    * Scale: the only corpus-sized shuffle carries (doc_id, 32 B digest)
    * — frame bytes never enter an exchange; the count join is
    * group-cardinality sized. */
  val q110FrameDedup: QueryDef = QueryDef.sql(
    "q110_frame_dedup",
    """WITH f AS (
      |  SELECT doc_id, substr(text, CAST(i * 64 + 1 AS BIGINT), 64) AS frame
      |  FROM documents,
      |       unnest(range(0, CAST(CEIL(octet_length(encode(text)) / 64.0) AS BIGINT))) AS u(i)),
      |c AS (SELECT frame, COUNT(*) AS n FROM f GROUP BY frame)
      |SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
      |       CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_frames
      |FROM f JOIN c ON f.frame = c.frame
      |GROUP BY f.doc_id
      |ORDER BY f.doc_id""".stripMargin) { (s, d) =>
    val fr = frameHashes(assets(s, d)).toDF()
    val counts = fr.groupBy("frame_sha").agg(count(lit(1)).as("n"))
    fr.join(counts, "frame_sha")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_frames"))
      .orderBy("doc_id")
  }

  // ---- embedding-producer seam (VERDICT r12 #6) ----

  case class AssetEmbedding(vec_id: Long, emb: Array[Double])

  /** The ENCODER seam — the [[graft.operators.Retrieval]] PairScorer
    * idiom applied to embedding production: a per-partition BATCHED
    * model call that turns raw assets into fixed-dim embedding
    * columns. Production binds a CLIP/SigLIP-style image (or audio)
    * tower here — one ONNX Runtime / TorchScript session per
    * partition, `embed` called once per `batchSize` group so the
    * accelerator sees full batches, exactly where
    * [[embedAssets]]'s `it.grouped(batchSize)` loop invokes it. The
    * container ships only the deterministic
    * [[HashProjectionEmbedder]] stand-in. */
  trait AssetEmbedder extends Serializable {
    def dim: Int
    /** One model invocation: a batch of assets in, one embedding per
      * asset out (order-aligned). */
    def embed(batch: Seq[Asset]): Seq[Array[Double]]
  }

  /** Deterministic stand-in encoder: 16-bin byte histogram (integer
    * counts) projected to `dim` dims by a fixed integer hash matrix
    * w(i,j) = ((31i + 17j) · 2654435761) mod 97 − 48, divided by the
    * payload length once at the end. All intermediate sums are
    * integer-exact and ≪ 2⁵³, so a DuckDB replay computes bit-equal
    * doubles — the property that lets the downstream ANN output be
    * hash-compared cross-engine. */
  object HashProjectionEmbedder extends AssetEmbedder {
    override val dim = 8
    override def embed(batch: Seq[Asset]): Seq[Array[Double]] =
      batch.map { a =>
        val bins = new Array[Long](16)
        var i = 0
        while (i < a.content.length) { bins((a.content(i) & 0xff) >> 4) += 1L; i += 1 }
        val n = math.max(1, a.content.length).toDouble
        Array.tabulate(dim) { j =>
          var s = 0L
          var k = 0
          while (k < 16) { s += bins(k) * w(k, j); k += 1 }
          s / n
        }
      }
    private def w(i: Int, j: Int): Long =
      ((i * 31L + j * 17L) * 2654435761L) % 97L - 48L
  }

  /** Batched encoding: repartition by id so payload bytes spread
    * evenly, then one [[AssetEmbedder.embed]] call per `batchSize`
    * group per partition — the exact loop a GPU-backed encoder needs
    * (amortized session init, full inference batches), with the
    * embedding column coming back ready for [[VectorIndex]] /
    * [[PqIndex]]. */
  def embedAssets(ds: Dataset[Asset], embedder: AssetEmbedder,
                  batchSize: Int = 64): Dataset[AssetEmbedding] = {
    import ds.sparkSession.implicits._
    ds.repartition(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { b =>
          b.zip(embedder.embed(b)).map { case (a, e) => AssetEmbedding(a.doc_id, e) }
        }
      }
  }

  /** The embedding-producer seam, declared end-to-end: raw assets →
    * batched encode ([[embedAssets]] + [[HashProjectionEmbedder]]) →
    * exact top-3 cosine neighbors for assets with id < 5 (the q50
    * output contract over PRODUCED embeddings instead of the shipped
    * embeddings table). The oracle replays the whole pipeline —
    * histogram, integer projection, single division, cosine rank —
    * from the raw text bytes in DuckDB, so the driver's hash compare
    * proves the mapPartitions batch-encode path end-to-end;
    * MultimodalEmbedSpec additionally pins batch-size invariance and
    * feeds the same embeddings through [[VectorIndex]]. Scale: encode
    * is one map-side pass (no shuffle beyond the even-spread
    * repartition); the serve is the q50 scan + bounded-heap top-k,
    * and the stored-index path for repeat queries is [[VectorIndex]]/
    * [[PqIndex]] exactly as for the shipped embeddings. */
  /** The asset-ANN contract both q162 (one-shot brute force) and q163
    * (streamed maintainer, exhaustive-probe serve) must hash-match:
    * DuckDB replays the whole pipeline — histogram, integer
    * projection, single division, cosine rank — from the raw text
    * bytes. */
  private val assetAnnSql =
    """WITH h AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n,
      |         list_transform(range(0, 16),
      |           b -> len(list_filter(split(text, ''), c -> ord(c) // 16 = b))) AS bins
      |  FROM documents),
      |e AS (
      |  SELECT doc_id,
      |         list_transform(range(0, 8), j ->
      |           list_sum(list_transform(range(0, 16), i ->
      |             CAST(bins[i + 1] AS DOUBLE) *
      |             (((i * 31 + j * 17) * 2654435761) % 97 - 48)))
      |           / GREATEST(n, 1)) AS emb
      |  FROM h),
      |q AS (SELECT doc_id AS query_id, emb AS qe FROM e WHERE doc_id < 5),
      |c AS (SELECT doc_id AS neighbor_id, emb AS ce FROM e),
      |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qe, ce) AS sim
      |      FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
      |r AS (SELECT query_id, neighbor_id,
      |             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
      |      FROM s)
      |SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id
      |FROM r WHERE rk <= 3
      |ORDER BY query_id, rk""".stripMargin

  val q162AssetEmbeddings: QueryDef = QueryDef.sql(
    "q162_asset_embeddings", assetAnnSql) { (s, d) =>
    val emb = embedAssets(assets(s, d), HashProjectionEmbedder).toDF()
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"))
    val cands = emb.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"))
    cands.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        nanvl(graft.functions.VectorFunctions.cosine_similarity(col("qe"), col("ce")),
          lit(-1.0)))
      .groupBy("query_id")
      .agg(graft.functions.TopKFunctions.top_k_by_score(col("sim"), col("neighbor_id"), 3)
        .as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  /** The embedding-producer seam run CONTINUOUSLY (the ninth
    * maintainer, [[graft.streaming.AssetEmbedMaintainer]]): bootstrap
    * the encoder + IVF index on the first 80% of the assets, fold the
    * rest in as two encode+extend batches (`ingestBatch` IS the
    * foreachBatch body; the streaming-harness variant with checkpoint
    * restart is MultimodalEmbedSpec's job), then serve top-3 neighbors
    * among the PRODUCED embeddings with nProbe = centroids — every
    * cell probed makes the IVF serve EXACT, so this shares q162's
    * brute-force oracle and the driver's hash compare proves streamed
    * embedding production ≡ one-shot over the same asset history.
    * Scale: encode touches only new assets (map-side, batched),
    * extend is one delta-sized assignment pass against frozen
    * centroids, and the serve reads probed cells only; fresh scratch
    * store per run (honest bench: bootstrap + 2×encode/extend +
    * serve). */
  val q163AssetEmbedMaintain: QueryDef = QueryDef.sql(
    "q163_asset_embed_maintain", assetAnnSql) { (s, d) =>
    val ds = assets(s, d)
    val store = graft.Scratch.dir("graft_embed_maint") + "/index"
    val em = new graft.streaming.AssetEmbedMaintainer(s, d, store,
      HashProjectionEmbedder, centroids = 4)
    val cut = ds.toDF().selectExpr("percentile(doc_id, 0.8)").head()
      .getDouble(0).toLong
    val rest = ds.filter(col("doc_id") > cut)
    val mid = rest.toDF().selectExpr("percentile(doc_id, 0.5)").head()
      .getDouble(0).toLong
    em.bootstrap(ds.filter(col("doc_id") <= cut))
    em.ingestBatch(rest.filter(col("doc_id") <= mid), Some(0L))
    em.ingestBatch(rest.filter(col("doc_id") > mid), Some(1L))
    em.searchMembers(col("vec_id") < 5, nProbe = 4, k = 3)
  }

  val all: Seq[QueryDef] = Seq(q54Multimodal, q65MultimodalFrames,
    q75MultimodalResize, q110FrameDedup, q162AssetEmbeddings,
    q163AssetEmbedMaintain)
}
