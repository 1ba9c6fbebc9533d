package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): image/audio/video travel as
  * opaque `binary` columns with typed metadata; the engine owns the
  * schema, partitioning and batch shape, and the image codec is REAL —
  * JDK `javax.imageio` (PNG/JPEG, zero added dependencies) decodes
  * actual pixels in the per-partition batch shape.
  *
  * Two blob tiers:
  *   - engine-framed blobs: a 12-byte header (magic ++ width ++ height,
  *     big-endian i32) followed by an opaque payload. Header parsing is
  *     pure Catalyst expressions (substring on binary + hex + conv) —
  *     codegen'd, no UDF, so metadata extraction never leaves
  *     WholeStageCodegen and predicate pushdown on metadata survives.
  *   - standard image blobs (PNG/JPEG bytes as produced by cameras /
  *     crawlers): decoded executor-side by [[decodeImagePartitioned]] /
  *     [[perceptualHashImagePartitioned]] via `javax.imageio.ImageIO`.
  *
  * Scale notes: payloads stay off the shuffle path — every transform
  * here either projects metadata (narrow) or decodes per-partition and
  * emits FIXED-WIDTH feature rows (the only thing that ever shuffles).
  * The decode stage holds one blob plus the codec working set at a
  * time; partition byte volume is bounded by
  * `spark.sql.files.maxPartitionBytes`.
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

  // ========================================================================
  // Real image codec — JDK javax.imageio (PNG lossless, JPEG), no new deps
  // ========================================================================

  /** One decoded image row — the fixed-width output of the per-partition
    * decode stage. `ok=false` marks undecodable bytes (corrupt blob,
    * non-image payload): a sentinel row, never a task-killing exception.
    * `px_sum` is the exact integer luma sum; `phash_hi`/`phash_lo` are
    * the two 32-bit halves of the 64-bit aHash, kept as separate
    * non-negative BIGINTs so they survive engines without unsigned 64-bit
    * (and the driver's oracle compare). */
  case class ImageFeature(media_id: Long, ok: Boolean, width: Long,
      height: Long, px_sum: Long, phash_hi: Long, phash_lo: Long)

  /** Integer luma of pixel (x,y): the raw band-0 sample for grayscale
    * images (exact PNG round-trip), Rec.601 integer luma for color. */
  private def luma(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
    if (img.getRaster.getNumBands == 1) img.getRaster.getSample(x, y, 0)
    else {
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      (r * 299 + g * 587 + b * 114) / 1000
    }

  /** Decode + feature-extract ONE image blob. The aHash uses the exact
    * integer decision rule `cellSum·nPx >= totSum·cellPx` (cell luma mean
    * vs whole-image luma mean by cross-multiplication) — no floats, so
    * the signature is bit-reproducible across JVMs and re-derivable by a
    * SQL oracle. Exact for images up to ~190 MP (255·nPx² < 2⁶³); beyond
    * that, downscale first. Cell (cy,cx) of the 8×8 grid covers pixels
    * with y·8/h == cy, x·8/w == cx — same floor-division blocks on any
    * engine. */
  def imageFeature(id: Long, bytes: Array[Byte]): ImageFeature = {
    val img =
      try {
        if (bytes == null || bytes.isEmpty) null
        else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      } catch {
        // NOT just IOException: the JDK readers throw RuntimeExceptions
        // (IllegalArgument, ArrayIndexOutOfBounds, CMMException, …) on
        // malformed blobs — exactly the crawler input this codec is for;
        // the contract is a sentinel row, never a task-killing exception
        case scala.util.control.NonFatal(_) => null
      }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
      ImageFeature(id, ok = false, 0L, 0L, 0L, 0L, 0L)
    else {
      val w = img.getWidth; val h = img.getHeight
      val cellSum = new Array[Long](64)
      val cellPx = new Array[Long](64)
      var tot = 0L
      var y = 0
      while (y < h) {
        val cy = y * 8 / h
        var x = 0
        while (x < w) {
          val g = luma(img, x, y)
          val b = cy * 8 + x * 8 / w
          cellSum(b) += g; cellPx(b) += 1; tot += g
          x += 1
        }
        y += 1
      }
      val nPx = w.toLong * h
      var hi = 0L; var lo = 0L
      var b = 0
      while (b < 64) {
        if (cellPx(b) > 0 && cellSum(b) * nPx >= tot * cellPx(b)) {
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
        b += 1
      }
      ImageFeature(id, ok = true, w.toLong, h.toLong, tot, hi, lo)
    }
  }

  /** REAL per-partition image decode: one task iterates its partition's
    * rows, `ImageIO.read`s each blob (PNG/JPEG/anything the JDK
    * registry handles) and emits one fixed-width [[ImageFeature]] —
    * blobs never shuffle, only 7-column feature rows do. */
  def decodeImagePartitioned(df: DataFrame, idCol: String = "media_id",
      bytesCol: String = "bytes"): Dataset[ImageFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // no temp-file cache: decode stays in-memory per blob
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) => imageFeature(id, bytes) }
      }
  }

  /** Real perceptual hash (aHash over decoded pixels) in the same
    * per-partition shape, recombined to the single 64-bit signature the
    * banded near-dup join consumes. Undecodable blobs are dropped here
    * (they have no pixels to hash) — route them through
    * [[decodeImagePartitioned]] when the ok/not-ok split matters. */
  def perceptualHashImagePartitioned(df: DataFrame,
      idCol: String = "media_id",
      bytesCol: String = "bytes"): Dataset[MediaSig] = {
    val spark = df.sparkSession
    import spark.implicits._
    decodeImagePartitioned(df, idCol, bytesCol)
      .filter(_.ok)
      .map(f => MediaSig(f.media_id, (f.phash_hi << 32) | f.phash_lo))
  }

  case class ResizedImage(media_id: Long, ok: Boolean, src_w: Long,
      src_h: Long, bytes: Array[Byte])

  /** REAL image resize, executor-side: decode the blob, downscale to
    * `tw`×`th` by EXACT integer area-averaging — target pixel (cy,cx)
    * covers the source pixels with y·th/h == cy and x·tw/w == cx (the
    * same floor-division blocks as the aHash grid, so a SQL oracle can
    * re-derive every output pixel), its value = cellSum / cellPx in
    * integer division — then re-encode through the real PNG writer.
    * Deliberately NOT `java.awt.Image.getScaledInstance`: AWT's scaler
    * is implementation-defined, which would make the output
    * unverifiable; exact area-averaging is also what a training-data
    * thumbnail stage wants (antialiased, deterministic). Downscale
    * only (a source smaller than the target in either dimension yields
    * ok=false, like an undecodable blob — training pipelines shrink,
    * never invent pixels). Blobs never shuffle: decode, average and
    * re-encode happen inside one partition pass. */
  def resizeImagePartitioned(df: DataFrame, tw: Int, th: Int,
      idCol: String = "media_id",
      bytesCol: String = "bytes"): Dataset[ResizedImage] = {
    require(tw > 0 && th > 0, s"resize target must be positive: $tw x $th")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val img =
            try {
              if (bytes == null || bytes.isEmpty) null
              else javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
            } catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || img.getWidth < tw || img.getHeight < th)
            ResizedImage(id, ok = false, 0L, 0L, Array.emptyByteArray)
          else {
            val w = img.getWidth; val h = img.getHeight
            val cellSum = new Array[Long](tw * th)
            val cellPx = new Array[Long](tw * th)
            var y = 0
            while (y < h) {
              val cy = y * th / h
              var x = 0
              while (x < w) {
                val b = cy * tw + x * tw / w
                cellSum(b) += luma(img, x, y); cellPx(b) += 1
                x += 1
              }
              y += 1
            }
            val out = new java.awt.image.BufferedImage(
              tw, th, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = out.getRaster
            var b = 0
            while (b < tw * th) {
              raster.setSample(b % tw, b / tw, 0,
                (cellSum(b) / cellPx(b)).toInt)
              b += 1
            }
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", baos)
            ResizedImage(id, ok = true, w.toLong, h.toLong,
              baos.toByteArray)
          }
        }
      }
  }

  /** [[MediaSig]] plus the row's event time — the streaming-assigner
    * shape, where the watermark column must survive the decode. */
  case class TimedMediaSig(media_id: Long, ts: java.sql.Timestamp,
      phash: Long)

  /** [[perceptualHashImagePartitioned]] with an event-time column
    * carried through the per-partition decode — works on a STREAMING
    * DataFrame (the decode is stateless), so an arriving blob stream
    * can be signatured and banded without losing its watermark.
    * Undecodable blobs are dropped, as in the untimed variant. */
  def perceptualHashTimedPartitioned(df: DataFrame,
      idCol: String = "media_id", tsCol: String = "ts",
      bytesCol: String = "bytes"): Dataset[TimedMediaSig] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(tsCol).cast("timestamp"),
        col(bytesCol))
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, ts, bytes) =>
          val f = imageFeature(id, bytes)
          if (f.ok)
            Some(TimedMediaSig(id, ts, (f.phash_hi << 32) | f.phash_lo))
          else None
        }
      }
  }

  /** Deterministic synthetic test image: w×h 8-bit grayscale,
    * luma(x,y) = (37·seed + x² + 5·y) mod 256, written through the REAL
    * PNG encoder — so tests and oracle queries exercise genuine
    * encode→decode byte round-trips while the expected pixel content
    * stays analytically derivable. */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          java.lang.Math.floorMod(37L * seed + x.toLong * x + 5L * y, 256L).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Executor-side synthetic-PNG generator: (id, w, h) rows → real PNG
    * blobs, encoded per-partition (blobs are born on executors and never
    * visit the driver — the ingest shape of a crawler fetch stage). */
  def encodeSynthPngPartitioned(df: DataFrame, idCol: String,
      wCol: String, hCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wCol).cast("int"),
        col(hCol).cast("int"))
      .as[(Long, Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, w, h) => (id, synthPng(id, w, h)) }
      }
      .toDF("media_id", "bytes")
  }

  /** Deterministic synthetic PCM: `n` signed-8-bit samples for media id
    * `id`, stored offset-binary (byte = sample + 128). The waveform is a
    * 13-step sawtooth with every third frame (64-sample block, phased by
    * id) attenuated to a near-silent ±4 dither — so framed features see
    * both active and silent regions and VAD-style segmentation has real
    * structure to find. Pure integer arithmetic on non-negative operands,
    * hence bit-identical on any engine (the SQL oracle re-derives every
    * sample analytically). */
  def synthPcm(id: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val base = java.lang.Math.floorMod(id * 31 + 13L * i, 256L).toInt
      val frame = i / 64
      val v = if (java.lang.Math.floorMod(frame + id, 3L) == 0L) base % 8 - 4
        else base - 128
      out(i) = (v + 128).toByte
      i += 1
    }
    out
  }

  /** Executor-side synthetic-PCM generator: (id, n) rows → framed audio
    * blobs (12-byte header: magic ++ n_samples ++ sample_rate, then the
    * offset-binary payload). Blobs are born per-partition and never visit
    * the driver — the same ingest shape as [[encodeSynthPngPartitioned]]. */
  val PcmSampleRate = 8000
  def encodeSynthPcmPartitioned(df: DataFrame, idCol: String,
      nCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(nCol).cast("int"))
      .as[(Long, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, n) =>
          val payload = synthPcm(id, n)
          val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
          bb.putInt(0x47524654) // "GRFT"
          bb.putInt(n)
          bb.putInt(PcmSampleRate)
          bb.put(payload)
          (id, bb.array())
        }
      }
      .toDF("media_id", "bytes")
  }

  /** Deterministic synthetic video-frame luma track: one byte per frame,
    * constant-within-scene base (5-frame scenes, each jumping the base
    * by 97 mod 251 — |Δ| ≥ 93 at every cut) plus a ±4 in-scene texture
    * ramp (|Δ| = 1 between in-scene neighbours). Base capped at 250 so
    * the texture never wraps mod 256 — wraparound would fake a cut.
    * Pure integer arithmetic on non-negative operands, analytically
    * re-derivable by the SQL oracle. */
  def synthVideoLuma(id: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var f = 0
    while (f < n) {
      val base = java.lang.Math.floorMod(id * 11 + (f / 5).toLong * 97, 251L)
      out(f) = (base + f % 5).toByte
      f += 1
    }
    out
  }

  /** Executor-side synthetic-video generator: (id, n_frames) rows →
    * GRFT-framed blobs whose payload is the per-frame luma track
    * (header: magic ++ n_frames ++ fps). Same born-on-executor ingest
    * shape as the PNG and PCM generators. */
  val VideoFps = 24
  def encodeSynthVideoPartitioned(df: DataFrame, idCol: String,
      nCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(nCol).cast("int"))
      .as[(Long, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, n) =>
          val payload = synthVideoLuma(id, n)
          val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
          bb.putInt(0x47524654) // "GRFT"
          bb.putInt(n)
          bb.putInt(VideoFps)
          bb.put(payload)
          (id, bb.array())
        }
      }
      .toDF("media_id", "bytes")
  }

  /** Framed audio features over a PCM blob column — entirely pure
    * Catalyst expressions (substring/conv byte decode, array transform/
    * aggregate), so the whole decode→frame→feature path stays inside
    * WholeStageCodegen: no UDF, no mapPartitions, blobs never shuffle,
    * only fixed-width (media_id, frame, n_samp, energy, zc) rows do.
    * Per frame of `frameLen` samples (last frame may be partial):
    * exact integer energy Σv² and the zero-crossing count — the two
    * classic VAD / speech-activity features. Empty payloads produce zero
    * frames rather than a descending-sequence error. */
  def pcmFrameFeatures(df: DataFrame, frameLen: Int = 64,
      idCol: String = "media_id", bytesCol: String = "bytes"): DataFrame =
    df.selectExpr(s"$idCol AS media_id",
        s"substring($bytesCol, 13, length($bytesCol) - 12) AS payload")
      .selectExpr("media_id", "payload",
        s"""explode(CASE WHEN length(payload) > 0
             THEN sequence(0, (length(payload) + ${frameLen - 1})
                              div $frameLen - 1)
             ELSE array() END) AS frame""")
      .selectExpr("media_id", "frame",
        s"""transform(
             sequence(frame * $frameLen + 1,
                      least((frame + 1) * $frameLen, length(payload))),
             j -> cast(conv(hex(substring(payload, j, 1)), 16, 10) AS INT)
                  - 128) AS s""")
      .selectExpr("media_id", "cast(frame AS BIGINT) AS frame",
        "cast(size(s) AS BIGINT) AS n_samp",
        "aggregate(s, 0L, (a, x) -> a + cast(x AS BIGINT) * x) AS energy",
        """cast(CASE WHEN size(s) >= 2
             THEN size(filter(sequence(1, size(s) - 1),
               j -> element_at(s, j) * element_at(s, j + 1) < 0))
             ELSE 0 END AS BIGINT) AS zc""")

  /** One media perceptual signature — 64-bit aHash. */
  case class MediaSig(media_id: Long, phash: Long)

  /** Locality signature for OPAQUE payloads (audio frames, video
    * containers, formats the JDK codec registry lacks): 64 equal payload
    * slices stand in for the 8×8 pixel grid — identical payloads hash
    * identically and local byte edits flip only the slices they touch.
    * For decodable images use [[perceptualHashImagePartitioned]], which
    * hashes real pixels; both emit [[MediaSig]] and feed the same banded
    * [[mediaNearDups]] join. */
  def payloadSliceHash(df: DataFrame, idCol: String = "media_id",
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
            // 64 equal byte slices play the role of the 8×8 pixel grid
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

  /** Band-bucket size cap for [[mediaCandidates]]: a (band, value) bucket
    * larger than this is an UNINFORMATIVE band value (the image analogue
    * of boilerplate shingles — "dark left half" matches every
    * underexposed photo) and is dropped before the pair join. Without it
    * candidate pairs grow as Σ n_bucket² — quadratic in corpus size on
    * realistic skewed hash distributions; with it they are provably
    * ≤ 4·N·cap/2, i.e. linear. Recall tradeoff, mirroring the text
    * side's `StopShingleDf`: a pair is missed only when EVERY band it
    * agrees on is over-popular — exactly the pairs of
    * crowd-indistinguishable images a dedup pass cares least about. */
  val BandBucketCap = 64

  /** Candidate pairs from pigeonhole banding over 4 disjoint 16-bit
    * bands with the [[BandBucketCap]] hot-bucket cut. Only 8-byte
    * signatures ever shuffle; the bucket-count pass and the self-join
    * shuffle on the same (b, v) key. */
  def mediaCandidates(sigs: Dataset[MediaSig],
      bucketCap: Int = BandBucketCap): DataFrame = {
    val bandStructs = (0 until 4).map(b =>
      s"named_struct('b', $b, 'v', shiftright(phash, ${b * 16}) & 65535)")
      .mkString(", ")
    // Signatures MATERIALIZE ONCE (the computation above may be a full
    // image decode): every consumer — bucket census, both self-join
    // sides — reads the checkpointed RDD, the same shared-artifact
    // pattern as the dedup cluster labels. Naive spellings re-ran the
    // decode per consumer (consumer-specific column pruning defeats
    // exchange reuse on otherwise-identical subtrees).
    val sigDf = sigs.toDF().localCheckpoint()
    val bands = sigDf
      .selectExpr("media_id", "phash",
        s"explode(array($bandStructs)) AS band")
      .selectExpr("media_id", "phash", "band.b AS b", "band.v AS v")
    // Hot-bucket census and cut, shaped so NO task ever holds a hot
    // bucket's raw rows: the census is a map-side-combinable groupBy
    // (each task emits one (b, v, partial) — a corpus-wide hot value
    // reaches the reduce side as ≤ #tasks partials, never raw rows), and
    // the cut is a broadcast ANTI join, so hot rows are dropped map-side
    // BEFORE the (b, v) shuffle that co-locates the self-join. A window
    // count over (b, v) — the previous spelling — materialized every hot
    // bucket on one task first, precisely the pile-up the cap exists to
    // prevent. The hot list is tiny by construction: ≤ 4N/cap entries.
    val hot = bands.groupBy("b", "v")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > bucketCap)
      .select("b", "v")
    val okb = bands.join(broadcast(hot), Seq("b", "v"), "left_anti")
    // SHUFFLE_HASH-hinted on both sides (round 19): BOTH sides are the
    // corpus's band table, so broadcastability is a small-corpus accident
    // with a mid-scale cliff — the round-18 jaccard audit showed Catalyst
    // statically broadcasting a corpus-sized side that sat under the
    // 64 MB estimate, with the exchange-free probe inheriting the sig
    // source's (often single-file) scan partitioning: the whole pair
    // generation in ONE task. The hint pins the plan every deployment
    // size wants — hash-exchange both sides on (b, v), parallelism =
    // shuffle partitions — while keeping the module's no-sort-merge
    // stance (8-byte signatures hash-join; the per-partition build side
    // is band rows / partitions, bounded by the hot-bucket cap's skew
    // ceiling). Same policy at every okb self-join in MultimodalQueries.
    okb.as("a").hint("SHUFFLE_HASH")
      .join(okb.as("c").hint("SHUFFLE_HASH"),
        col("a.b") === col("c.b") && col("a.v") === col("c.v") &&
          col("a.media_id") < col("c.media_id"))
      .select(col("a.media_id").as("id_a"), col("c.media_id").as("id_b"),
        col("a.phash").as("pa"), col("c.phash").as("pb"))
      .distinct()
  }

  /** Near-duplicate media pairs by perceptual-hash Hamming distance —
    * image dedup as a first-class corpus stage. Pigeonhole banding: with
    * 4 disjoint 16-bit bands, any pair within Hamming ≤ 3 agrees on at
    * least one whole band, so candidates come from a (band, value)
    * equi-join — never an all-pairs comparison — and the one codegen'd
    * bit_count filter afterwards makes surviving pairs exact. The only
    * approximation is the [[BandBucketCap]] hot-bucket cut (see there for
    * the recall argument); at bucket sizes under the cap the result
    * equals the brute-force Hamming join. `maxHamming` must stay < 4 for
    * the pigeonhole to cover all pairs. */
  def mediaNearDups(sigs: Dataset[MediaSig], maxHamming: Int = 3,
      bucketCap: Int = BandBucketCap): DataFrame = {
    require(maxHamming < 4,
      s"pigeonhole over 4 bands is exact only for hamming < 4, got $maxHamming")
    mediaCandidates(sigs, bucketCap)
      .filter(expr(s"bit_count(pa ^ pb) <= $maxHamming"))
      .select(col("id_a"), col("id_b"),
        expr("cast(bit_count(pa ^ pb) AS BIGINT)").as("hamming"))
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
