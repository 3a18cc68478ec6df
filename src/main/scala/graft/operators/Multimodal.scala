package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §2 #37): media as opaque
  * `binary` columns with typed metadata beside them. The container has
  * no image/audio codecs, so the DECODE step is a clearly-marked
  * deterministic stub — everything around it (binary plumbing, schema,
  * per-frame explode shape, partition-friendly projections) is the
  * real Spark machinery a production decode (e.g. `mapInPandas` with
  * PIL/ffmpeg on the executors) would slot into.
  */
object Multimodal {

  /** Attach an opaque binary payload (here: the utf-8 bytes of the
    * text standing in for an image blob). */
  def binarize(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("lang"))

  /** Typed metadata over the binary column: size, fingerprint, leading
    * "magic" bytes — all computable without decoding, which is what a
    * 100 TB triage pass wants (decode only what survives filtering).
    *
    * STUB: `width`/`height`/`n_frames` are a deterministic fake decode
    * seeded from the payload md5 — a real deployment replaces exactly
    * these three expressions with a decode UDF. The seed is md5 (not a
    * CRC) deliberately: every column of this row is then plain hex
    * arithmetic a SQL oracle replays, so the stub PLUMBING itself is
    * gate-verified — only a true codec decode stays unverifiable. */
  def metadata(binarized: DataFrame): DataFrame = {
    // first 8 md5 hex chars as an integer — fits a long (< 2^32)
    val seed = conv(substring(md5(col("payload")), 1, 8), 16, 10).cast("long")
    binarized.select(
      col("doc_id"), col("lang"),
      length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("fp"),
      hex(substring(col("payload"), 1, 4)).as("magic"),
      (seed % 640 + 1).cast("int").as("width"),                      // STUB decode
      (seed % 480 + 1).cast("int").as("height"),                     // STUB decode
      (length(col("payload")) % 16 + 1).cast("int").as("n_frames"))  // STUB decode
  }

  /** Decode-free triage projection — the subset of [[metadata]] that
    * needs NO codec and no stub: byte length, leading magic bytes,
    * full-payload md5. This is the pass that decides what ever gets
    * decoded at 100 TB (dedupe on fp, route on magic, drop on size),
    * and because every column is bytewise-deterministic it is
    * oracle-checked through the driver gate (as is [[metadata]] since
    * its stub went md5-seeded; only [[decodeBatched]]'s true-codec
    * seam stays outside the gate, honestly marked). */
  def triage(binarized: DataFrame): DataFrame =
    binarized.select(
      col("doc_id"), col("lang"),
      length(col("payload")).cast("long").as("byte_len"),
      hex(substring(col("payload"), 1, 4)).as("magic"),
      md5(col("payload")).as("fp"))

  /** Batched decode seam — the JVM analog of `mapInPandas`: payloads
    * flow through a pluggable `decode` in bounded batches per
    * partition, because real codecs amortize model/codec init over a
    * batch and must NOT materialize a whole partition (a partition is
    * sized in input-split bytes; decoded frames can be 100× larger).
    * `Iterator.grouped` keeps the laziness contract: at most
    * `maxBatch` payloads and their decoded outputs are live at once,
    * whatever the partition size.
    *
    * The decoder signature is the production seam: `Seq[bytes] =>
    * Seq[(width, height, features)]`, one output per input, order
    * preserved — swap in a PIL/ffmpeg-backed implementation on a
    * cluster with codecs and nothing else changes (schema, batching,
    * partitioning are already real). The default is the same
    * deterministic md5-seeded stub as [[metadata]], so the plumbing is
    * spec-testable here. */
  def decodeBatched(binarized: DataFrame, maxBatch: Int = 64,
                    decode: Seq[Array[Byte]] => Seq[(Int, Int, Array[Float])] = stubDecode)
      : DataFrame = {
    require(maxBatch >= 1)
    val spark = binarized.sparkSession
    import spark.implicits._
    binarized.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(maxBatch).flatMap { batch =>
          val out = decode(batch.map(_._2))
          require(out.length == batch.length,
            s"decoder returned ${out.length} outputs for ${batch.length} inputs")
          batch.lazyZip(out).map { case ((id, _), (w, h, f)) => (id, w, h, f) }
        }
      }
      .toDF("doc_id", "width", "height", "features")
  }

  /** Deterministic stand-in decoder for [[decodeBatched]]: width and
    * height from the payload md5 EXACTLY as the [[metadata]] stub
    * computes them (java.security MD5 is the same digest as Spark's
    * `md5` — spec-pinned), features a fixed-width byte prefix
    * scaled to [0, 1]. */
  private[graft] def stubDecode(payloads: Seq[Array[Byte]]): Seq[(Int, Int, Array[Float])] =
    payloads.map { bytes =>
      val md = java.security.MessageDigest.getInstance("MD5")
      // first 8 hex chars == first 4 digest bytes, big-endian
      val seed = md.digest(bytes).take(4)
        .foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      val feats = bytes.take(8).padTo(8, 0.toByte).map(b => (b & 0xff) / 255.0f)
      ((seed % 640 + 1).toInt, (seed % 480 + 1).toInt, feats)
    }

  /** Frame sampling: one row per sampled frame index with a per-frame
    * byte-slice checksum — the explode shape (and shuffle-free
    * projection) a video frame-extraction job has. */
  def frameSample(meta: DataFrame, binarized: DataFrame, stride: Int = 4): DataFrame =
    meta
      .join(binarized.select(col("doc_id"), col("payload")), "doc_id")
      .select(col("doc_id"), col("n_frames"), col("payload"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        expr("crc32(substring(payload, frame_idx * 16 + 1, 16))").as("frame_checksum"))
}
