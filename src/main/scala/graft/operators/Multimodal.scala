package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal decode plumbing: opaque binary payloads flow through a
  * typed Dataset and are decoded per-partition (the mapPartitions
  * batch shape a real image/audio decoder needs — open codec once per
  * partition, stream records through it).
  *
  * The decode itself is a clearly-marked STUB — image/audio libraries
  * are not available in this container — computing deterministic fake
  * dimensions and a byte-mean "brightness". A deployment swaps
  * [[Multimodal.decodeStub]] for a real decoder; every other part
  * (schema, Encoders, partition batching, feature shape) is real and
  * tested.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, source: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, source: String, n_bytes: Int,
                           width: Int, height: Int, brightness: Double)

  /** STUB decoder: byte-length arithmetic in place of image dims; mean
    * of the first 256 bytes normalized to [0,1] as "brightness".
    * Unrounded: the raw IEEE double (int sum / take / 255, same op
    * order as the DuckDB oracle) is bit-identical across engines,
    * while a half-even rint diverges from SQL ROUND on ties. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val take = math.min(n, 256)
    val brightness =
      if (take == 0) 0.0
      else payload.iterator.take(take).map(b => b & 0xff).sum.toDouble / take / 255.0
    (n % 640, n * 7 % 480, brightness)
  }

  /** Per-partition feature extraction — one decoder instance per
    * partition, records streamed through; no driver involvement. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // a real decoder would be initialized HERE, once per partition
      it.map { r =>
        val (w, h, b) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.source, r.payload.length, w, h, b)
      }
    }
  }

  case class MediaEmbedding(doc_id: Long, source: String, hist: Seq[Double])

  /** STUB embedding: a 64-bin byte-value histogram over the first 256
    * payload bytes (bin = byte DIV 4), as exact integer counts in
    * doubles. A deployment swaps this for a real perceptual/CLIP-style
    * embedder; the downstream contract — a fixed-dimension double
    * vector per record — is what the dedup/ANN families consume, and
    * integer counts make the cosine replayable in the oracle. */
  def embedStub(payload: Array[Byte]): Seq[Double] = {
    val counts = new Array[Double](64)
    val take = math.min(payload.length, 256)
    var i = 0
    while (i < take) { counts((payload(i) & 0xff) / 4) += 1.0; i += 1 }
    counts.toIndexedSeq
  }

  /** Per-partition media embedding — the feature half of the
    * multimodal near-dup pipeline (p05): same mapPartitions batch
    * shape as [[extractFeatures]]. */
  def embed(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaEmbedding] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // a real embedder (model weights, codec) would be initialized
      // HERE, once per partition
      it.map(r => MediaEmbedding(r.doc_id, r.source, embedStub(r.payload)))
    }
  }
}
