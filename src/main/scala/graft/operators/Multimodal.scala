package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata.
  *
  * The Spark-side shape is the real thing — schema, batch iteration,
  * partitioning, column pruning all behave exactly as they would with
  * a real codec. For IMAGES the decode is real too: [[decodeImages]]
  * rides `javax.imageio` (in the JDK — PNG/JPEG/GIF/BMP header
  * probes, no external library). Audio/video decode remains a STUB
  * (this container ships no such codecs), replaced by a
  * deterministic parser of the payload's leading bytes — the oracle
  * queries pin the deterministic path; swap `decodeOne` for a
  * JNI/JavaCV call and nothing else changes.
  *
  * Scale design (100 TB):
  *  - payloads stay opaque end-to-end: metadata-only queries never
  *    deserialize them, and parquet column pruning means a query that
  *    doesn't select `payload` never reads those pages off disk;
  *  - decode runs via `mapPartitions` (the documented imperative seam
  *    — SURVEY.md §7.3's "last resort", appropriate here because a
  *    codec is genuinely per-row imperative native code): one codec
  *    init per PARTITION, not per row — the same batch shape a
  *    vectorized Python UDF would give;
  *  - frame sampling explodes bounded arrays (fps * duration), so
  *    output size is controlled by the sampling rate, not input size.
  */
object Multimodal {

  /** Typed metadata for one media payload. */
  case class MediaMeta(kind: String, width: Int, height: Int, durationMs: Long)

  /** One decoded record (id + payload + metadata). */
  case class Decoded(id: Long, payload: Array[Byte], meta: MediaMeta)

  private val Kinds = Array("image", "audio", "video")

  /** STUB decode of one payload. Deterministic function of the bytes:
    * stands in for a real codec probe (magic-number sniff + header
    * parse). Replace with the real library call at deployment. */
  def decodeOne(bytes: Array[Byte]): MediaMeta = {
    // ??? real codec goes here; deterministic fake below ???
    def b(i: Int): Int = if (bytes.length > i) bytes(i) & 0xff else 0
    MediaMeta(
      kind = Kinds(b(0) % Kinds.length),
      width = 16 * (1 + b(1) % 64),
      height = 16 * (1 + b(2) % 64),
      durationMs = 1000L * (1 + b(3) % 60))
  }

  /** Decode a (id, payload) frame into typed records. The
    * `mapPartitions` boundary is where a real pipeline would
    * initialize its codec once per partition and stream the batch
    * through it. */
  def decode(df: DataFrame, idCol: String, payloadCol: String): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // (real impl: val codec = Codec.open() — once per partition)
        it.map { case (id, bytes) => Decoded(id, bytes, decodeOne(bytes)) }
      }
  }

  /** REAL image decode of one payload via `javax.imageio` (ships in
    * the JDK — no external codec needed for PNG/JPEG/GIF/BMP):
    * format sniff by magic bytes, then a HEADER-ONLY width/height
    * read (`ImageReader.getWidth/getHeight` parse the header without
    * decoding the raster — exactly the cheap probe a 100 TB metadata
    * pass wants). `kind` is `image/<format>`; `durationMs` is 0 for
    * stills. None when no installed reader recognizes the bytes —
    * the caller decides whether unknowns are errors or pass-through
    * rows (never a silent drop). */
  def decodeImageOne(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null) return None // a NULL payload is an unknown row
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in, true, true) // seekForwardOnly, ignoreMetadata
          Some(MediaMeta(
            kind = "image/" + r.getFormatName.toLowerCase(java.util.Locale.ROOT),
            width = r.getWidth(0), height = r.getHeight(0),
            durationMs = 0L))
        } finally r.dispose()
      }
      // NonFatal, not just IOException: the JDK imageio plugins throw
      // ArrayIndexOutOfBounds/IllegalArgument/NegativeArraySize on
      // fuzzed headers whose magic bytes still selected a reader — a
      // corrupt payload must stay a per-row property, never a task kill
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (in != null) in.close()
  }

  /** [[decode]]'s REAL-codec sibling for image payloads: same
    * mapPartitions seam, same Decoded shape, `javax.imageio` doing
    * the byte-level work. Unrecognized payloads keep their row with
    * `kind = "unknown"` and zero dimensions — corrupt bytes are a
    * per-row data property, not a job failure. */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          Decoded(id, bytes, decodeImageOne(bytes)
            .getOrElse(MediaMeta("unknown", 0, 0, 0L)))
        }
      }
  }

  /** Decoded records as a DataFrame with a typed `meta` struct. */
  def withMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    decode(df, idCol, payloadCol).toDF()

  /** Frame-sample STUB: one row per sampled frame timestamp. Bounded
    * by fps * duration; frame payload extraction (`frame_bytes`) is
    * the part a real video codec would fill in. Step is clamped to
    * >= 1ms (fps > 1000 would otherwise generate a zero step) and
    * zero-duration payloads yield zero frames. */
  def frameSample(decoded: DataFrame, fps: Double): DataFrame = {
    require(fps > 0, "fps must be positive")
    val stepMs = math.max(1L, (1000 / fps).toLong)
    decoded
      .withColumn("frame_ms",
        explode(expr(s"sequence(0L, greatest(meta.durationMs - 1, 0L), ${stepMs}L)")))
      .where(col("frame_ms") < col("meta.durationMs"))
      .select(col("id"), col("meta.kind").as("kind"), col("frame_ms"))
  }

  /** Resize STUB: pure metadata transform (a real impl would also
    * rewrite payload bytes). Aspect-preserving fit into a box. */
  def resizeMeta(decoded: DataFrame, maxDim: Int): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("meta.width"), col("meta.height"))))
      .withColumn("out_width", (col("meta.width") * col("scale")).cast("int"))
      .withColumn("out_height", (col("meta.height") * col("scale")).cast("int"))
      .drop("scale")
}
