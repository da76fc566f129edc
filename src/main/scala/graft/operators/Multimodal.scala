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

  /** 64-bit DIFFERENCE HASH (dHash) of one image payload — the
    * standard perceptual fingerprint for near-duplicate IMAGE dedup
    * (crops/recompressions/small edits keep most bits; distinct
    * images differ in ~32): decode via `javax.imageio`, luminance-
    * resample to a 9×8 grid by area averaging (bounded: at most 4×4
    * sample points per cell regardless of source size, so a 100 MP
    * payload costs the same as a thumbnail once decoded), bit `8i+j`
    * = cell (i,j) brighter than cell (i,j+1). None when the payload
    * doesn't decode. NOTE: unlike [[decodeImageOne]]'s header probe
    * this decodes the RASTER — budget it like a codec pass, not a
    * metadata pass. */
  def dHashOne(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) return None
    val img =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.filter(i => i.getWidth > 0 && i.getHeight > 0).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      // 9x8 grid of mean luminances, ≤16 samples per cell
      val grid = Array.ofDim[Double](8, 9)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 9) {
          val x0 = gx * w / 9; val x1 = math.max(x0 + 1, (gx + 1) * w / 9)
          val y0 = gy * h / 8; val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
          val sx = math.max(1, (x1 - x0) / 4); val sy = math.max(1, (y1 - y0) / 4)
          var sum = 0.0; var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = im.getRGB(math.min(x, w - 1), math.min(y, h - 1))
              sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000.0
              n += 1; x += sx
            }
            y += sy
          }
          grid(gy)(gx) = if (n == 0) 0.0 else sum / n
          gx += 1
        }
        gy += 1
      }
      var bits = 0L; var i = 0
      while (i < 8) {
        var j = 0
        while (j < 8) {
          if (grid(i)(j) > grid(i)(j + 1)) bits |= 1L << (i * 8 + j)
          j += 1
        }
        i += 1
      }
      bits
    }
  }

  /** Annotate `(id, payload)` with the 64-bit dHash (`out` column,
    * nullable — undecodable payloads keep their row with a null
    * hash). Same mapPartitions codec seam as [[decodeImages]]. */
  def withImageDHash(df: DataFrame, idCol: String, payloadCol: String,
                     out: String = "dhash"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(!df.columns.contains(out),
      s"withImageDHash reserves column name $out")
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, dHashOne(bytes)) })
      .toDF(idCol, out) // Option[Long] encodes as nullable BIGINT
  }

  /** Near-duplicate IMAGE pairs by banded dHash: split the 64-bit
    * hash into `bands` equal bit-slices, equi-join per band (two
    * images sharing ANY band become a candidate), verify candidates
    * with the exact Hamming distance ≤ `maxHamming`. The pigeonhole
    * guarantee: `maxHamming < bands` ⇒ every qualifying pair shares
    * at least one untouched band, so banding loses NOTHING (enforced
    * with a require — raise `bands` to chase larger distances).
    *
    * Scale shape: the family pattern of [[DedupOps.lshNearDupPairs]]
    * — band-keyed equi-joins only, never all-pairs; a boilerplate
    * band value (solid-color images all hash to 0L) is dropped by a
    * TWO-PHASE hot-key cap (map-side-combined `groupBy(band).count`
    * + anti-join of over-cap keys, this round's
    * [[DedupOps.boundaryOverlapPairs]] idiom) before the self-join;
    * verification is one codegen'd `bit_count(a ^ b)` per candidate.
    * Undecodable payloads (null hash) never pair.
    *
    * Output: `(a_id, b_id, hamming)`, `a_id < b_id`. */
  def nearDupImagePairs(df: DataFrame, idCol: String, payloadCol: String,
                        maxHamming: Int = 6, bands: Int = 8,
                        maxBandFreq: Long = 10000L): DataFrame = {
    val hashed = withImageDHash(df, idCol, payloadCol, "__dh")
      .where(col("__dh").isNotNull)
    nearDupHashPairs(hashed, idCol, "__dh", maxHamming, bands, maxBandFreq)
  }

  /** The banded-Hamming core of [[nearDupImagePairs]], over ANY
    * precomputed 64-bit fingerprint column (dHash, simhash, audio
    * chromaprint slice, …) — exposed separately so non-image
    * fingerprints ride the same machinery and so the band/cap/verify
    * pipeline is oracle-checkable without a codec. Contract and
    * shape as [[nearDupImagePairs]]; null fingerprints never pair. */
  def nearDupHashPairs(df: DataFrame, idCol: String, hashCol: String,
                       maxHamming: Int = 6, bands: Int = 8,
                       maxBandFreq: Long = 10000L): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands, " +
        s"got $maxHamming >= $bands")
    require(maxBandFreq >= 1, "maxBandFreq must be positive")
    val width = 64 / bands
    val banded = df.where(col(hashCol).isNotNull)
      .select(col(idCol).as("__id"), col(hashCol).cast("long").as("__dh"))
      .select(col("__id"), col("__dh"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"struct(b AS bk, shiftright(__dh, b * $width) & " +
          s"${(1L << width) - 1}L AS bv))")).as("__b"))
      .select(col("__id"), col("__dh"),
        col("__b.bk").as("__bk"), col("__b.bv").as("__bv"))
    // two-phase hot-band cap: boilerplate band values (solid fills)
    // would make the self-join quadratic; the over-cap key set is
    // tiny by construction and AQE-broadcastable
    val hot = banded.groupBy(col("__bk"), col("__bv"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxBandFreq)
      .select(col("__bk"), col("__bv"))
    val kept = banded.join(hot, Seq("__bk", "__bv"), "left_anti")
    val cand = kept.select(col("__id").as("a_id"), col("__dh").as("__ha"),
        col("__bk"), col("__bv"))
      .join(kept.select(col("__id").as("b_id"), col("__dh").as("__hb"),
        col("__bk"), col("__bv")), Seq("__bk", "__bv"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("__ha"), col("__hb"))
      .distinct()
    cand
      .withColumn("hamming",
        expr("bit_count(__ha ^ __hb)").cast("bigint"))
      .where(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

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
