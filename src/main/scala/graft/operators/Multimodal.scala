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

  val all: Seq[QueryDef] = Seq(q54Multimodal, q65MultimodalFrames,
    q75MultimodalResize, q110FrameDedup)
}
