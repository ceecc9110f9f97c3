package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and batch decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark-side contract is real and tested — schema, partition
  * shape, per-partition batch processing (the Scala analog of
  * `mapInPandas`: one decoder instantiation per partition, records
  * streamed through it). IMAGE metadata decode is REAL: the JDK's
  * `javax.imageio` reads true width/height/format from PNG/JPEG/GIF/
  * BMP headers (header-only — the pixel raster is never decoded).
  * Payloads no installed reader recognizes (incl. audio/video — this
  * container has no media codecs) fall back to the deterministic
  * stub; `resize`/`sampleFrames`/`extractFeatures` remain stubs with
  * real dataflow, to be swapped for codec/model bindings at
  * deployment.
  *
  * Scale notes: media bytes never pass through a shuffle — decode is
  * a narrow map; only the (small) extracted features/metadata flow
  * into joins/aggregations. Partition sizing for ~MB-scale blobs is
  * the file-source's `maxPartitionBytes` job, not the operator's.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, bytes: Array[Byte])
  final case class MediaMeta(doc_id: Long, media_type: String, byte_len: Long,
                             digest: String, width: Int, height: Int)
  final case class Frame(doc_id: Long, frame_idx: Int, bytes: Array[Byte])

  /** Wrap a text/binary column as a media table (for testing the
    * plumbing against the `documents` corpus).
    */
  def asMedia(df: DataFrame, id: String, payload: String,
              mediaType: String = "image/fake"): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    df.select(col(id).cast("long").as("doc_id"),
        lit(mediaType).as("media_type"),
        col(payload).cast("binary").as("bytes"))
      .as[MediaRow]
  }

  /** STUB decoder: deterministic fake "decode" for payloads no real
    * reader recognizes (audio/video in this container). Produces
    * stable pseudo-dimensions from the byte length and an MD5 digest.
    */
  private[graft] def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = md.map("%02x".format(_)).mkString
    (64 + (bytes.length % 577), 64 + ((bytes.length * 31) % 433), hex)
  }

  /** REAL image header decode via the JDK's `javax.imageio`: true
    * width/height/format for any format an installed ImageReader
    * recognizes (PNG/JPEG/GIF/BMP/WBMP in a stock JDK). Header-only —
    * `getWidth/getHeight(0)` parse the header; the pixel raster is
    * never materialized, so cost is O(header), not O(pixels). None
    * for unrecognized/corrupt payloads.
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    // magic-byte gate before consulting ImageIO: the JDK's WBMP
    // reader has NO magic number and would claim arbitrary binary
    // payloads, turning stub rows into bogus "images" — only formats
    // whose headers are unambiguous get a real decode
    val hasMagic = bytes.length >= 4 && (
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G') ||                                       // PNG
      (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte &&
        bytes(2) == 0xff.toByte) ||                               // JPEG
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8') ||                                       // GIF
      (bytes(0) == 'B' && bytes(1) == 'M'))                       // BMP
    if (!hasMagic) return None
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          Some((reader.getWidth(0), reader.getHeight(0),
            reader.getFormatName.toLowerCase(java.util.Locale.ROOT)))
        } catch { case _: Exception => None }
        finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Batch decode → metadata: one decoder per partition, rows
    * streamed through (mapPartitions = the mapInPandas batch shape).
    * Recognized images report their REAL dimensions and refine
    * media_type to `image/<format>`; everything else falls back to
    * the deterministic stub with the declared media_type. The digest
    * is always MD5 of the raw payload.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts are
      // expensive; never per-record) — imageio readers are obtained
      // per payload because format dispatch is per-record by design
      rows.map { r =>
        val (sw, sh, digest) = decodeStub(r.bytes)
        decodeImage(r.bytes) match {
          case Some((w, h, fmt)) =>
            MediaMeta(r.doc_id, s"image/$fmt", r.bytes.length.toLong,
              digest, w, h)
          case None =>
            MediaMeta(r.doc_id, r.media_type, r.bytes.length.toLong,
              digest, sw, sh)
        }
      }
    }
  }

  /** Resize stub: deterministic "resample" of the payload to a target
    * byte budget (stride-sampled bytes — a real codec binding would
    * decode, scale, re-encode). Keeps the batch shape: narrow map,
    * bytes never shuffled.
    */
  def resize(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    implicit val enc = Encoders.product[MediaRow]
    media.map { r =>
      if (r.bytes.length <= targetBytes) r
      else {
        val stride = math.max(1, r.bytes.length / targetBytes)
        // primitive-array tabulate: no boxing, output-sized allocation
        val n = math.min(targetBytes, (r.bytes.length + stride - 1) / stride)
        r.copy(bytes = Array.tabulate(n)(i => r.bytes(i * stride)))
      }
    }
  }

  /** Frame sampling for "video" payloads: emit every `stride`-th
    * fixed-size slice as a frame record (stub slicing; the partition/
    * batch shape is what a real ffmpeg binding would use).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
                   stride: Int): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    media.flatMap { r =>
      r.bytes.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => Frame(r.doc_id, i, chunk) }
    }
  }

  /** Feature extraction stub: fixed-width deterministic "embedding"
    * from the bytes (replace with a model runtime at deployment).
    * Output shape matches the `embeddings` table contract.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      val feats = Array.tabulate(dim) { i =>
        val h = scala.util.hashing.MurmurHash3.bytesHash(r.bytes, i)
        (h % 1000) / 1000.0f
      }
      (r.doc_id, feats)
    }.toDF("doc_id", "embedding")
  }
}
