package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload row: opaque binary column + typed metadata.
  * At 100 TB the binary column lives in parquet alongside its metadata;
  * scans prune to metadata-only unless the decode stage is requested. */
final case class MediaRecord(doc_id: Long, media_type: String,
                             media: Array[Byte])

/** Decoded/extracted features for one media payload. */
final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, format: String,
                           features: Seq[Float])

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * per-partition workers.
  *
  * The decode step itself is a STUB — the real image/audio codecs are
  * not available in this container — but everything Spark-side is real
  * and tested: the schema, the binary column handling, the
  * `mapPartitions` batch shape (one worker per partition processing an
  * iterator, the JVM analogue of `mapInPandas` batches), and the
  * partition-parallel, no-driver-collect dataflow.
  */
object Multimodal {

  /** Synthesize a binary media column from the documents fixture (the
    * fixtures carry no real media): payload = utf-8 bytes of the text,
    * media_type assigned deterministically. */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("media"))

  /** STUB decoder: deterministic fake in place of a real codec.
    * A production build would replace the body marked below with e.g.
    * `javax.imageio.ImageIO.read` / an audio frame parser; the
    * signature, batching, and output schema would not change. */
  def decodeMeta(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        // --- STUB: deterministic fake decode (no codecs in container).
        // Derives stable pseudo-dimensions/features from the payload
        // length so tests are reproducible AND the summary is
        // DuckDB-oracle-checkable (a real codec would read the bytes;
        // the Spark-side plumbing is identical either way).
        val n = r.media.length
        val width = 16 + math.floorMod(n, 1024)
        val height = 16 + math.floorMod(31 * n, 1024)
        val format = r.media_type match {
          case "image" => if (n % 2 == 0) "png" else "jpeg"
          case "audio" => if (n % 2 == 0) "wav" else "flac"
          case _       => if (n % 2 == 0) "mp4" else "webm"
        }
        val features = r.media.take(8).map(b => (b & 0xff) / 255.0f).toSeq
        // --- end STUB
        MediaMeta(r.doc_id, r.media_type, n.toLong, width, height, format,
          features)
      }
    }
  }

  /** STUB resize: scale media metadata (and, in a real build, the
    * payload) to fit a bounding box, preserving aspect ratio. Batched
    * per partition like decode; the deterministic fake rescales the
    * stub dimensions and truncates the payload proportionally, so tests
    * can assert exact outputs. */
  def resizeMeta(metas: Dataset[MediaMeta], maxSide: Int)
      : Dataset[MediaMeta] = {
    import metas.sparkSession.implicits._
    metas.mapPartitions { it =>
      it.map { m =>
        // --- STUB: a real build calls the codec's scaler here
        val scale = math.min(1.0, maxSide.toDouble / math.max(m.width,
          m.height))
        m.copy(
          width = math.max(1, (m.width * scale).toInt),
          height = math.max(1, (m.height * scale).toInt),
          n_bytes = math.max(1L, (m.n_bytes * scale * scale).toLong))
        // --- end STUB
      }
    }
  }

  /** Frame/chunk sampling on the binary column itself — pure column
    * expressions, no decode: k evenly spaced fixed-size byte windows
    * (the shape of video frame-sampling before decode). The stride is
    * span/(k-1), so the FIRST window starts at byte 1 and the LAST
    * ends exactly at the payload's end — a /k stride would never
    * sample the final chunkBytes. Payloads of at most chunkBytes
    * yield k copies of the whole payload. */
  def sampleChunks(media: org.apache.spark.sql.Column, k: Int,
                   chunkBytes: Int): org.apache.spark.sql.Column = {
    require(k >= 1 && chunkBytes >= 1, "k and chunkBytes must be >= 1")
    if (k == 1) array(substring(media, 1, chunkBytes))
    else ExprUtils.let(
      greatest(octet_length(media) - chunkBytes, lit(0))) { span =>
      transform(sequence(lit(0), lit(k - 1)),
        i => substring(media, (i * span / (k - 1) + 1).cast("int"),
          lit(chunkBytes)))
    }
  }

  /** End-to-end stub pipeline over the documents fixture: attach binary,
    * decode per partition, aggregate per (media_type, format). */
  def metaSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val recs = attachBinary(docs).as[MediaRecord]
    decodeMeta(recs).groupBy("media_type", "format")
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 6).as("avg_width"))
      .orderBy("media_type", "format")
  }
}
