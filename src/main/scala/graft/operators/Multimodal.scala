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

  /** Typed metadata over the binary column: size, checksum, leading
    * "magic" bytes — all computable without decoding, which is what a
    * 100 TB triage pass wants (decode only what survives filtering).
    *
    * STUB: `width`/`height`/`n_frames` are a deterministic fake decode
    * derived from the checksum — a real deployment replaces exactly
    * these three expressions with a decode UDF. */
  def metadata(binarized: DataFrame): DataFrame =
    binarized.select(
      col("doc_id"), col("lang"),
      length(col("payload")).cast("long").as("byte_len"),
      crc32(col("payload")).as("checksum"),
      hex(substring(col("payload"), 1, 4)).as("magic"),
      (crc32(col("payload")) % 640 + 1).cast("int").as("width"),     // STUB decode
      (crc32(col("payload")) % 480 + 1).cast("int").as("height"),    // STUB decode
      (length(col("payload")) % 16 + 1).cast("int").as("n_frames"))  // STUB decode

  /** Decode-free triage projection — the subset of [[metadata]] that
    * needs NO codec and no stub: byte length, leading magic bytes,
    * full-payload md5. This is the pass that decides what ever gets
    * decoded at 100 TB (dedupe on fp, route on magic, drop on size),
    * and because every column is bytewise-deterministic it is
    * oracle-checked through the driver gate (the stubbed width/height
    * decode in [[metadata]] stays rows-only, honestly marked). */
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
    * deterministic CRC stub as [[metadata]], so the plumbing is
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
    * height from the payload CRC EXACTLY as the [[metadata]] stub
    * computes them (java.util.zip.CRC32 is the same CRC-32 as Spark's
    * `crc32` — spec-pinned), features a fixed-width byte prefix
    * scaled to [0, 1]. */
  private[graft] def stubDecode(payloads: Seq[Array[Byte]]): Seq[(Int, Int, Array[Float])] =
    payloads.map { bytes =>
      val crc = new java.util.zip.CRC32
      crc.update(bytes)
      val c = crc.getValue
      val feats = bytes.take(8).padTo(8, 0.toByte).map(b => (b & 0xff) / 255.0f)
      ((c % 640 + 1).toInt, (c % 480 + 1).toInt, feats)
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
