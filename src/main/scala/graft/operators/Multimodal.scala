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
