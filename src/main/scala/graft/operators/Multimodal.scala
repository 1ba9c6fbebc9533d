package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): image/audio/video travel as
  * opaque `binary` columns with typed metadata; the engine owns the
  * schema, partitioning and batch shape while the codec itself is a
  * stub (no media libraries in this environment — the decode is a
  * deterministic fake clearly marked below).
  *
  * Layout: media rows are (media_id, kind, bytes, meta) where bytes
  * carries a 12-byte header (magic ++ width ++ height, big-endian i32)
  * followed by the payload. Header parsing is pure Catalyst expressions
  * (substring on binary + hex + conv) — codegen'd, no UDF, so metadata
  * extraction never leaves WholeStageCodegen and predicate pushdown on
  * (kind, meta) survives.
  *
  * Scale notes: payloads stay off the shuffle path — every transform
  * here either projects metadata (narrow) or repartitions by media_id
  * once before per-partition decode. The decode stage is the only
  * mapPartitions, sized by `spark.sql.files.maxPartitionBytes` so one
  * task never holds more than a bounded byte volume.
  */
object Multimodal {

  private val MAGIC = "47524654" // "GRFT" in hex

  /** Big-endian i32 at byte offset `off` (1-based) of a binary column. */
  private def beInt(colName: String, off: Int): org.apache.spark.sql.Column =
    expr(s"cast(conv(hex(substring($colName, $off, 4)), 16, 10) AS INT)")

  /** Deterministic fake encoder: builds a valid media blob from plain
    * columns (width, height, payload string). Stands in for real image
    * bytes so the plumbing is testable end-to-end. */
  def encodeFake(df: DataFrame, widthCol: String, heightCol: String,
      payloadCol: String): DataFrame =
    df.withColumn("bytes",
      expr(s"""concat(
           unhex('$MAGIC'),
           unhex(lpad(hex($widthCol), 8, '0')),
           unhex(lpad(hex($heightCol), 8, '0')),
           cast($payloadCol AS BINARY))"""))

  /** Metadata extraction from the binary header — pure expressions. */
  def extractMeta(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    df.withColumn("is_valid",
        expr(s"hex(substring($bytesCol, 1, 4))") === MAGIC)
      .withColumn("width", beInt(bytesCol, 5))
      .withColumn("height", beInt(bytesCol, 9))
      .withColumn("payload_bytes",
        expr(s"length($bytesCol) - 12").cast("long"))

  /** STUB — the real decoder (JPEG/PNG/audio frames) would run here via
    * per-partition native-lib calls. This deterministic fake "decodes"
    * the payload to its byte histogram so the batch shape (one output
    * row per media row, bounded memory per partition) is real and
    * tested while the codec is not. */
  def decodeStub(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    df.withColumn("decoded_checksum",
        expr(s"crc32(substring($bytesCol, 13, 1073741824))"))
      .withColumn("decoded_n_bytes",
        expr(s"length($bytesCol) - 12").cast("long"))

  /** One decoded media row — the typed output of the per-partition
    * decode stage. */
  case class MediaFeature(media_id: Long, n_bytes: Long, byte_mode: Int,
      mode_count: Long)

  /** Per-partition decode — the batch shape a REAL codec runs in: one
    * task iterates its partition's rows, holding a single blob (plus the
    * codec's working set) at a time; partition size is bounded by
    * `spark.sql.files.maxPartitionBytes`. The decode body here is the
    * STUB (byte-histogram mode stands in for pixel decode); swap the
    * body for an image/audio library call and the plumbing — typed
    * Dataset in/out, encoders, partition iteration — is unchanged. */
  def decodePartitioned(df: DataFrame, idCol: String = "media_id",
      bytesCol: String = "bytes"): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // null blob (failed fetch / corrupt record) decodes like empty —
          // a sentinel feature row, never a task-killing NPE
          val payload = if (bytes == null) Array.emptyByteArray
            else bytes.drop(12)
          // --- stubbed decode body begins (would be the codec call) ---
          val hist = new Array[Long](256)
          payload.foreach(b => hist(b & 0xff) += 1)
          val mode = if (payload.isEmpty) -1
            else hist.indexOf(hist.max)
          // --- stubbed decode body ends ---
          MediaFeature(id, payload.length.toLong, mode,
            if (mode >= 0) hist(mode) else 0L)
        }
      }
  }

  /** One media perceptual signature — 64-bit aHash-shaped. */
  case class MediaSig(media_id: Long, phash: Long)

  /** Perceptual hash of the decoded content, in the same per-partition
    * batch shape as [[decodePartitioned]]. Real aHash: resize to an 8×8
    * luma grid, set bit i when cell i ≥ the grid mean. The STUB stands
    * the 64 equal payload slices in for the 8×8 grid (no image libs in
    * this environment) — identical payloads hash identically and local
    * byte edits flip only the slices they touch, so the signature has
    * the aHash locality the dedup tier needs. Swap the slice means for
    * decoded-pixel cell means and nothing downstream changes. */
  def perceptualHashPartitioned(df: DataFrame, idCol: String = "media_id",
      bytesCol: String = "bytes"): Dataset[MediaSig] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val payload = if (bytes == null) Array.emptyByteArray
            else bytes.drop(12)
          val n = payload.length
          val sig = if (n == 0) 0L else {
            // --- stubbed "decode to 8×8 grid" begins (codec call) ---
            val cell = new Array[Double](64)
            var i = 0
            while (i < 64) {
              val lo = i * n / 64
              val hi = math.max(lo + 1, (i + 1) * n / 64)
              var s = 0L
              var j = lo
              while (j < math.min(hi, n)) { s += (payload(j) & 0xff); j += 1 }
              cell(i) = s.toDouble / math.max(1, math.min(hi, n) - lo)
              i += 1
            }
            // --- stubbed decode ends ---
            val mean = cell.sum / 64
            var acc = 0L
            var b = 0
            while (b < 64) {
              if (cell(b) >= mean) acc |= (1L << b)
              b += 1
            }
            acc
          }
          MediaSig(id, sig)
        }
      }
  }

  /** Near-duplicate media pairs by perceptual-hash Hamming distance —
    * image dedup as a first-class corpus stage. Pigeonhole banding makes
    * the candidate join EXACT: with 4 disjoint 16-bit bands, any pair
    * within Hamming ≤ 3 agrees on at least one whole band, so the
    * (band, value) equi-join misses nothing while signatures — 8 bytes a
    * row, never the blobs — are all that shuffles. The verify filter is
    * one codegen'd bit_count. `maxHamming` must stay < 4 for exactness. */
  def mediaNearDups(sigs: Dataset[MediaSig], maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      s"pigeonhole over 4 bands is exact only for hamming < 4, got $maxHamming")
    val bandStructs = (0 until 4).map(b =>
      s"named_struct('b', $b, 'v', shiftright(phash, ${b * 16}) & 65535)")
      .mkString(", ")
    val bands = sigs.toDF()
      .selectExpr("media_id", "phash",
        s"explode(array($bandStructs)) AS band")
      .selectExpr("media_id", "phash", "band.b AS b", "band.v AS v")
    bands.as("a").join(bands.as("c"),
        col("a.b") === col("c.b") && col("a.v") === col("c.v") &&
          col("a.media_id") < col("c.media_id"))
      .select(col("a.media_id").as("id_a"), col("c.media_id").as("id_b"),
        col("a.phash").as("pa"), col("c.phash").as("pb"))
      .distinct()
      .filter(expr(s"bit_count(pa ^ pb) <= $maxHamming"))
      .select("id_a", "id_b")
  }

  /** Frame sampling: emit every `stride`-th byte offset of the payload as
    * a "frame" row — the explode shape (row → many frames) of video
    * frame extraction, with deterministic content. */
  def frameSample(df: DataFrame, stride: Int,
      bytesCol: String = "bytes"): DataFrame =
    df.withColumn("frame_off",
        // empty/truncated payloads (≤ header) produce zero frames rather
        // than an illegal descending sequence
        explode(expr(s"""CASE WHEN length($bytesCol) >= 13
             THEN sequence(13, length($bytesCol), $stride)
             ELSE array() END""")))
      .withColumn("frame_byte",
        expr(s"cast(conv(hex(substring($bytesCol, frame_off, 1)), 16, 10) AS INT)"))
}
