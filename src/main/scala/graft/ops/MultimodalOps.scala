package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * PNG and BMP decode is REAL (`javax.imageio`, JVM standard library —
  * [[MultimodalOps.ImageCodec]], round-trip-gated by
  * [[MultimodalOps.q222ImageDecode]]). Formats the container lacks codecs
  * for (JPEG-2000, video, audio) take a clearly-marked DETERMINISTIC STUB
  * ([[StubDecoder.decode]]). Real and tested either way is the Spark-side
  * shape a 100 TB media pipeline needs: binary payload column + metadata,
  * `mapPartitions` over batches (the Scala analogue of `mapInPandas` —
  * one decoder init per partition, not per row), a schema that survives
  * columnar scan pruning, and partition sizing driven by payload bytes
  * rather than row count.
  */
object MultimodalOps {

  /** Input row: payload + metadata (what a real media table stores). */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (what a real decoder emits), plus the two
    * downstream media transforms a training pipeline applies: resize to a
    * bounded edge (preserving aspect via integer arithmetic) and uniform
    * frame sampling (every 10th frame) for video. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      first_byte: Long,
      out_width: Long,
      out_height: Long,
      n_sampled_frames: Long)

  /** STUB: stands in for an image/audio decoder (libs absent in this
    * container). Deterministic pure function of the payload + id so the
    * pipeline is testable end-to-end; swap with a real codec on a cluster
    * (one decoder instance per partition — see mapPartitions below). */
  object StubDecoder {
    /** Resize target: longest edge clamped to 224 (integer arithmetic so
      * any engine replays it exactly); upscaling never happens. */
    val MaxEdge = 224L
    /** Video frame sampling stride. */
    val FrameStride = 10L

    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length.toLong
      val w = (r.doc_id * 37) % 640 + 16
      val h = (r.doc_id * 23) % 480 + 16
      val edge = math.max(w, h)
      val (ow, oh) =
        if (edge <= MaxEdge) (w, h)
        else (w * MaxEdge / edge, h * MaxEdge / edge) // integer floor-div
      val frames = n / 64 + 1
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = n,
        width = w,
        height = h,
        n_frames = frames,
        first_byte = if (n > 0) r.payload(0) & 0xffL else -1L,
        out_width = ow,
        out_height = oh,
        // ceil(frames / stride) uniform sample; images/audio keep 1 frame
        n_sampled_frames =
          if (r.media_type == "video") (frames + FrameStride - 1) / FrameStride
          else 1L)
    }
  }

  /** REAL codec for the formats the JVM ships decoders for: PNG, BMP,
    * JPEG and GIF via `javax.imageio` (no external dependency — ImageIO is
    * java.desktop standard library). Payloads are sniffed by magic number;
    * anything else (or a corrupt stream) returns None and the caller falls
    * back to [[StubDecoder]] — the disclosed stand-in for codecs this
    * container lacks (JPEG-2000, video, audio). */
  object ImageCodec {
    def isPng(b: Array[Byte]): Boolean =
      b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    def isBmp(b: Array[Byte]): Boolean =
      b.length >= 2 && b(0) == 'B' && b(1) == 'M'
    def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
        (b(2) & 0xff) == 0xff
    def isGif(b: Array[Byte]): Boolean =
      b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'
    def isImage(b: Array[Byte]): Boolean =
      isPng(b) || isBmp(b) || isJpeg(b) || isGif(b)

    /** Decode a real image payload into the same feature row the stub
      * emits, so the two paths are interchangeable downstream: real
      * width/height from the bitstream, the MaxEdge resize rule applied
      * with the same integer arithmetic, single-frame semantics. */
    def decode(r: MediaRow): Option[MediaFeatures] =
      if (!isImage(r.payload)) None
      else scala.util.Try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))).map { img =>
          val w = img.getWidth.toLong
          val h = img.getHeight.toLong
          val edge = math.max(w, h)
          val (ow, oh) =
            if (edge <= StubDecoder.MaxEdge) (w, h)
            else (w * StubDecoder.MaxEdge / edge, h * StubDecoder.MaxEdge / edge)
          MediaFeatures(
            doc_id = r.doc_id,
            media_type = r.media_type,
            n_bytes = r.payload.length.toLong,
            width = w,
            height = h,
            n_frames = 1L,
            first_byte = (r.payload(0) & 0xff).toLong,
            out_width = ow,
            out_height = oh,
            n_sampled_frames = 1L)
        }
      }.toOption.flatten
  }

  /** Synthesize a media table from `documents` (text bytes as payload),
    * then run the decode-features pipeline. Payloads carrying a real
    * PNG/BMP/JPEG/GIF bitstream decode through [[ImageCodec]] (javax.imageio);
    * everything else takes the deterministic stub — here the synthetic
    * payloads are text, so the whole table rides the stub and the
    * arithmetic DuckDB oracle replays it exactly (octet_length / ascii).
    * [[q222ImageDecode]] is the real-bitstream path's correctness gate. */
  def q40Multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = Tables.load(s, dir, "documents")
      .select($"doc_id",
        expr("element_at(array('image','audio','video'), CAST(pmod(doc_id, 3) AS INT) + 1)").as("media_type"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRow]
    // one decoder init per partition; rows stream through in batches
    val feats = media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams only
      rows.map(r => ImageCodec.decode(r).getOrElse(StubDecoder.decode(r)))
    }
    feats.toDF().orderBy($"doc_id")
  }

  /** Decoded-image audit row: everything a DuckDB oracle can recompute
    * arithmetically without a codec. */
  final case class PatchAudit(doc_id: Long, width: Long, height: Long,
      n_patches: Long, n_flat: Long, var_checksum: Long, pix_sum: Long)

  /** X274 — ViT patch-preprocessing audit on the real-decode lane: vision
    * transformers consume images as a grid of fixed patches, and
    * production pipelines DROP low-information patches (uniform sky,
    * letterbox bars) before they cost sequence length. Per image: 8×8
    * patch grid over the REAL decoded raster (PNG through the q222
    * encode→decode discipline — any codec bug breaks the oracle
    * equality), per-patch integer variance via the division-free form
    * 64·Σg² − (Σg)² (q275's len·SSE trick, ≥ 0 by Cauchy-Schwarz, == 0
    * iff the patch is constant), reported as the droppable-patch count
    * plus a variance checksum. Images where doc_id ≡ 0 mod 5 plant a
    * constant 128-gray top-left 8×8 block (a letterbox corner) — exactly
    * one flat patch each; the 31i+17j gradient everywhere else can never
    * be constant across a patch. The remainder crop (w,h not multiples
    * of 8) is the standard ViT behavior and is part of the contract.
    *
    * Scale: encode+decode+patch folds run inside ONE mapPartitions pass
    * (decoder init per partition, constant memory per row — ≤31×24 px);
    * zero shuffles before the presentation orderBy. */
  def q303PatchAudit(s: SparkSession, dir: String): Dataset[PatchAudit] = {
    import s.implicits._
    val ids = Tables.load(s, dir, "documents").select($"doc_id").as[Long]
    ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = (16 + Math.floorMod(id, 16L)).toInt
        val h = (16 + Math.floorMod(id, 9L)).toInt
        val flatPlant = Math.floorMod(id, 5L) == 0L
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var j = 0
        while (j < h) {
          var i = 0
          while (i < w) {
            val g = if (flatPlant && i < 8 && j < 8) 128
                    else Math.floorMod(id + 31L * i + 17L * j, 256L).toInt
            img.setRGB(i, j, (g << 16) | (g << 8) | g)
            i += 1
          }
          j += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val back = Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray)))
          .getOrElse(sys.error(s"png decode failed for doc $id"))
        val (gw, gh) = (back.getWidth / 8, back.getHeight / 8)
        var nFlat = 0L; var varSum = 0L; var pixSum = 0L
        var pj = 0
        while (pj < gh) {
          var pi = 0
          while (pi < gw) {
            var sg = 0L; var sg2 = 0L
            var dy = 0
            while (dy < 8) {
              var dx = 0
              while (dx < 8) {
                val g = back.getRGB(pi * 8 + dx, pj * 8 + dy) & 0xff
                sg += g; sg2 += g.toLong * g
                dx += 1
              }
              dy += 1
            }
            val vr = 64L * sg2 - sg * sg
            if (vr == 0L) nFlat += 1L
            varSum += vr; pixSum += sg
            pi += 1
          }
          pj += 1
        }
        PatchAudit(id, w.toLong, h.toLong, (gw * gh).toLong, nFlat,
          varSum, pixSum)
      }
    }.orderBy($"doc_id").as[PatchAudit]
  }

  final case class DecodedImage(doc_id: Long, fmt: String, width: Long,
      height: Long, pixel_sum: Long)

  /** X190 — REAL image decode, correctness-gated: each document id maps to
    * a deterministic gray test card (w = id%13+1, h = id%7+1, gray(i,j) =
    * (id + 31·i + 17·j) mod 256), ENCODED to a real PNG (even ids) or BMP
    * (odd ids) bitstream with `javax.imageio`, then DECODED back through
    * [[ImageCodec]] — the same code path q40 gives real payloads. The
    * emitted width/height/pixel-sum are pure arithmetic in doc_id, so the
    * cross-engine oracle verifies the full encode→decode round trip
    * without DuckDB needing a codec: any decoder bug breaks the equality.
    * Both formats are lossless RGB, so the pixel sum is exact.
    *
    * Scale: encode+decode run inside ONE `mapPartitions` pass (decoder
    * init per partition, q40's discipline), constant memory per row
    * (≤ 13×7 px), zero shuffles before the presentation orderBy. */
  def q222ImageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.load(s, dir, "documents").select($"doc_id").as[Long]
    ids.mapPartitions { it =>
      // per-partition decoder init (q40's discipline): in-memory streams
      // only — ImageIO's default disk cache would add a temp-file write
      // per image on every executor thread
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        // floorMod: Java % is negative for negative ids (the planted
        // ground-truth range) and would request a zero/negative-sized image
        val w = (Math.floorMod(id, 13L) + 1).toInt
        val h = (Math.floorMod(id, 7L) + 1).toInt
        val fmt = if (Math.floorMod(id, 2L) == 0L) "png" else "bmp"
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var j = 0
        while (j < h) {
          var i = 0
          while (i < w) {
            val g = Math.floorMod(id + 31L * i + 17L * j, 256L).toInt
            img.setRGB(i, j, (g << 16) | (g << 8) | g)
            i += 1
          }
          j += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        val payload = bos.toByteArray
        // ONE decode: the magic gate proves the payload routes down
        // ImageCodec's real-bitstream path, and the single ImageIO.read
        // below supplies dims AND pixels (a full ImageCodec.decode here
        // re-parsed the whole raster a second time per row)
        if (!ImageCodec.isPng(payload) && !ImageCodec.isBmp(payload))
          sys.error(s"real $fmt payload not recognized by the codec gate for doc $id")
        val back = Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
          .getOrElse(sys.error(s"real $fmt payload failed to decode for doc $id"))
        var sum = 0L
        var jj = 0
        while (jj < back.getHeight) {
          var ii = 0
          while (ii < back.getWidth) {
            val rgb = back.getRGB(ii, jj)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            ii += 1
          }
          jj += 1
        }
        DecodedImage(id, fmt, back.getWidth.toLong, back.getHeight.toLong, sum)
      }
    }.toDF().orderBy($"doc_id")
  }

  /** X198 — JPEG/GIF round trip: q222's oracle-gated encode→decode
    * discipline extended to the JVM's two remaining native image codecs,
    * retiring them from [[StubDecoder]]'s fallback surface. GIF is
    * palette-based, so the gray test card is built as TYPE_BYTE_INDEXED
    * over an explicit 256-gray IndexColorModel — every pattern value has
    * an exact palette entry, the round trip is lossless, and the pixel
    * sum replays arithmetically in DuckDB. JPEG is inherently lossy
    * (DCT quantization), so its cross-engine gate is the part a lossy
    * codec must still preserve — exact dimensions from the SOF marker and
    * a successful decode through [[ImageCodec]]'s magic gate — with
    * pixel_sum emitted as the -1 sentinel; the pixel-level fidelity bound
    * (mean absolute deviation) is asserted JVM-side in MultimodalSpec,
    * where a tolerance is expressible.
    *
    * The card height runs 5..11 (not q222's 1..7): this JDK's
    * GIFImageWriter corrupts every row after the first at heights 2-4
    * (measured empirically — h=1 and h>=5 round-trip losslessly at all
    * widths), so the card stays out of the broken band.
    *
    * Scale: q222's shape — ONE mapPartitions pass, per-partition decoder
    * init, in-memory streams, constant memory per row, zero shuffles
    * before the presentation orderBy. */
  def q230JpegGifDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.load(s, dir, "documents").select($"doc_id").as[Long]
    ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val grays = Array.tabulate(256)(_.toByte)
      val palette = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      it.map { id =>
        val w = (Math.floorMod(id, 13L) + 1).toInt
        val h = (Math.floorMod(id, 7L) + 5).toInt
        val jpeg = Math.floorMod(id, 2L) == 0L
        val fmt = if (jpeg) "jpeg" else "gif"
        val img =
          if (jpeg) new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          else new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
        var j = 0
        while (j < h) {
          var i = 0
          while (i < w) {
            val g = Math.floorMod(id + 31L * i + 17L * j, 256L).toInt
            img.setRGB(i, j, (g << 16) | (g << 8) | g)
            i += 1
          }
          j += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        val payload = bos.toByteArray
        if (jpeg && !ImageCodec.isJpeg(payload))
          sys.error(s"real jpeg payload not recognized by the codec gate for doc $id")
        if (!jpeg && !ImageCodec.isGif(payload))
          sys.error(s"real gif payload not recognized by the codec gate for doc $id")
        val back = Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
          .getOrElse(sys.error(s"real $fmt payload failed to decode for doc $id"))
        val sum =
          if (jpeg) -1L
          else {
            var acc = 0L
            var jj = 0
            while (jj < back.getHeight) {
              var ii = 0
              while (ii < back.getWidth) {
                val rgb = back.getRGB(ii, jj)
                acc += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                ii += 1
              }
              jj += 1
            }
            acc
          }
        DecodedImage(id, fmt, back.getWidth.toLong, back.getHeight.toLong, sum)
      }
    }.toDF().orderBy($"doc_id")
  }

  /** Per-document windowed audio features (X152). */
  final case class AudioWindows(doc_id: Long, n_samples: Long, n_windows: Long,
      max_energy: Long, max_energy_win: Long, mean_energy: Long, n_silent: Long)

  /** X152 — windowed audio-energy extraction: treat the payload as 8-bit
    * PCM (the stub's stand-in for a real audio decode) and fold 256-sample
    * windows at 50% overlap (hop 128) into centered sum-of-squares
    * energies — per document: window count, peak energy + its window
    * (argmax, first-window tiebreak), integer mean energy, and
    * silence-gated window count. The windowing loop is the real
    * product: VAD/silence trimming and loudness normalization both start
    * from exactly this per-window energy frame.
    *
    * Scale: the decode+window fold runs in `mapPartitions` (one decoder
    * init per partition, q40's discipline), is O(samples) per row with
    * constant memory (no window list materialized), and emits a fixed
    * 7-column row — narrow at scan throughput, zero shuffles before the
    * presentation orderBy. All arithmetic is integer, so the DuckDB
    * oracle replays bit-for-bit. */
  def q184AudioWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Win = 256; val Hop = 128; val SilentBelow = 25600L
    val media = Tables.load(s, dir, "documents")
      // ASCII precondition, ENFORCED: the DuckDB oracle replays samples as
      // per-character code points, which equals UTF-8 bytes only for
      // 7-bit text — multi-byte documents are excluded on both sides
      // rather than silently diverging
      .filter(!coalesce($"text", lit("")).rlike("[^\\x00-\\x7F]"))
      .select($"doc_id", encode(coalesce($"text", lit("")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    media.mapPartitions { rows =>
      rows.map { case (id, p) =>
        val n = p.length
        val nw = if (n < Win) 0 else (n - Win) / Hop + 1
        var maxE = 0L; var maxI = -1L; var sumE = 0L; var silent = 0L
        var j = 0
        while (j < nw) {
          var e = 0L; var i = j * Hop; val end = i + Win
          while (i < end) {
            val d = (p(i) & 0xff) - 128; e += (d * d).toLong; i += 1
          }
          if (maxI < 0 || e > maxE) { maxE = e; maxI = j }
          if (e < SilentBelow) silent += 1
          sumE += e; j += 1
        }
        AudioWindows(id, n.toLong, nw.toLong,
          if (nw == 0) 0L else maxE, maxI,
          if (nw == 0) 0L else sumE / nw, silent)
      }
    }.toDF().orderBy($"doc_id")
  }

  /** X153 — video frame-level dedup signal: chunk the payload into
    * 64-byte "frames" (q40's frame convention), fingerprint each with the
    * portable polynomial hash, and report per video: frame count,
    * distinct frames, and the intra-video duplication in integer ppm —
    * the static-scene/duplicated-segment signal a video curation
    * pipeline gates on before paying for real decode.
    *
    * Spark-first shape: the chunk+hash runs as a narrow HOF pass
    * (`transform` over the chunk index sequence + `graft_fingerprint`
    * inside the lambda — codegen'd, no UDF, no shuffle); the distinct
    * count is `size(array_distinct(...))` on the per-row array. Zero
    * shuffles before the presentation orderBy.
    *
    * Scale: O(frames) per row; the frame array lives only inside the
    * projection (never shuffled, never stored); at 100 TB this runs at
    * scan throughput exactly like q30's text metrics. */
  def q185FrameDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.Fingerprint.register(s)
    Tables.load(s, dir, "documents")
      .select($"doc_id", coalesce($"text", lit("")).as("t"))
      // empty payloads carry no frames — and unguarded they would hit
      // Spark's DESCENDING sequence(0, -1) = [0, -1], fabricating two
      // phantom frames (the documented sequence pitfall) and a 0-divisor
      .filter(length($"t") >= 1)
      .withColumn("n_bytes", length($"t").cast("long"))
      // ceil(n/64) frames; substring's out-of-range tail yields the short
      // final frame, exactly like a trailing partial video segment
      .withColumn("fps", expr(
        """transform(sequence(0, CAST((length(t) + 63) div 64 AS INT) - 1),
          |  j -> graft_fingerprint(substring(t, j * 64 + 1, 64)))""".stripMargin))
      .select($"doc_id", $"n_bytes",
        size($"fps").cast("long").as("n_frames"),
        size(array_distinct($"fps")).cast("long").as("n_distinct"))
      .withColumn("dup_ppm",
        expr("(n_frames - n_distinct) * 1000000 div n_frames"))
      .orderBy($"doc_id")
  }

  final case class DecodedAudio(doc_id: Long, n_samples: Long,
      sample_rate: Long, sample_sum: Long, energy: Long)

  /** Real WAV decoding through `javax.sound.sampled` (java.desktop, no
    * external dependency — q222's rule for images applied to audio).
    * Returns None for payloads the platform codec rejects, so callers
    * can fall back to the stub PCM path. */
  object AudioCodec {
    def decode(payload: Array[Byte]): Option[(Long, Long, Array[Byte])] =
      scala.util.Try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val bytes = in.readAllBytes()
          (fmt.getSampleRate.toLong, fmt.getSampleSizeInBits.toLong, bytes)
        } finally in.close()
      }.toOption
  }

  /** X196 — REAL audio decode, correctness-gated (q222's pattern for the
    * audio lane): each document id maps to a deterministic 8-bit mono
    * PCM waveform (n = id%240+16 samples at 8 kHz, s(i) = (7·id + 13·i)
    * mod 256), ENCODED to a real RIFF/WAVE bitstream with
    * `javax.sound.sampled.AudioSystem` and DECODED back through
    * [[AudioCodec]]. The emitted sample count / sum / energy are pure
    * arithmetic in doc_id, so the cross-engine oracle proves the full
    * encode→decode round trip without DuckDB touching a codec — any
    * header, endianness, or sign-convention bug breaks the equality.
    * This retires the one stub left in the multimodal lane for formats
    * the JVM ships a codec for; exotic codecs still take the stub.
    *
    * Scale: encode+decode inside ONE `mapPartitions` pass (q40's
    * per-partition init discipline), constant memory per row (≤ 255
    * samples), zero shuffles before the presentation orderBy. */
  def q228AudioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.load(s, dir, "documents").select($"doc_id").as[Long]
    ids.mapPartitions { it =>
      val fmt = new javax.sound.sampled.AudioFormat(
        8000f, 8, 1, /*signed=*/ false, /*bigEndian=*/ false)
      it.map { id =>
        // floorMod: negative planted ids would give a negative sample
        // count (NegativeArraySizeException) with Java %
        val n = (Math.floorMod(id, 240L) + 16).toInt
        val pcm = Array.tabulate[Byte](n)(i =>
          Math.floorMod(7L * id + 13L * i, 256L).toByte)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val (rate, bits, back) = AudioCodec.decode(bos.toByteArray)
          .getOrElse(sys.error(s"real WAV payload failed to decode for doc $id"))
        if (bits != 8L || back.length != n)
          sys.error(s"WAV round trip drifted for doc $id: bits=$bits n=${back.length}")
        var sum = 0L; var e = 0L; var i = 0
        while (i < back.length) {
          val v = (back(i) & 0xff).toLong
          sum += v; val d = v - 128L; e += d * d; i += 1
        }
        DecodedAudio(id, back.length.toLong, rate, sum, e)
      }
    }.toDF().orderBy($"doc_id")
  }

  final case class ImageHash(doc_id: Long, hash_hi: Long, hash_lo: Long)

  final case class AudioSegments(doc_id: Long, n_samples: Long,
      n_segments: Long, total_active: Long, max_seg_len: Long, amp_sum: Long)

  /** X230 — audio silence-split segmentation on the REAL WAV lane (the
    * audio sibling of q254's scene cuts): each doc id maps to a
    * deterministic multi-segment 8-bit waveform — n_seg = id%4+2 active
    * segments of length L_k = 20 + (id+7k mod 30), separated by 16-sample
    * exact-silence gaps (value 128); active samples alternate sign with
    * amplitude 20 + (7·id + 13·i mod 80) (id pre-reduced mod 80 before
    * the multiply — the overflow-safe form), so |s−128| ≥ 20 on every
    * active sample and the detector's silence rule (a run of ≥ 8 samples
    * with |s−128| ≤ 2) separates BY CONSTRUCTION: gaps are 16 ≥ 8 silent
    * samples, active runs contain none. The waveform round-trips through
    * a real RIFF/WAVE encode→decode (q228's lane) and the detector runs
    * on the DECODED bytes — generic run-length logic, not a formula
    * replay — while the DuckDB oracle derives segment count, active
    * mass, max segment length, and the absolute-amplitude sum purely
    * arithmetically from doc_id. Equality = the codec round trip AND the
    * detector agree with the planted structure, sample-exactly.
    *
    * Scale: ONE mapPartitions pass, ≤ 5 segments × ≤ 49 samples + 4 gaps
    * per row, zero shuffles before the presentation orderBy. */
  def q261AudioSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.load(s, dir, "documents").select($"doc_id").as[Long]
    ids.mapPartitions { it =>
      val fmt = new javax.sound.sampled.AudioFormat(
        8000f, 8, 1, /*signed=*/ false, /*bigEndian=*/ false)
      it.map { id =>
        val nSeg = (Math.floorMod(id, 4L) + 2).toInt
        val segLens = (0 until nSeg).map(k =>
          (20 + Math.floorMod(Math.floorMod(id, 30L) + 7L * k, 30L)).toInt)
        val n = segLens.sum + 16 * (nSeg - 1)
        val pcm = new Array[Byte](n)
        java.util.Arrays.fill(pcm, 128.toByte)
        var pos = 0
        val idm = Math.floorMod(id, 80L)
        segLens.zipWithIndex.foreach { case (len, k) =>
          var j = 0
          while (j < len) {
            val i = pos + j
            val amp = 20L + Math.floorMod(7L * idm + 13L * i, 80L)
            val sign = if (i % 2 == 0) 1L else -1L
            pcm(i) = (128L + sign * amp).toByte
            j += 1
          }
          pos += len + (if (k < nSeg - 1) 16 else 0)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val (_, bits, back) = AudioCodec.decode(bos.toByteArray)
          .getOrElse(sys.error(s"real WAV payload failed to decode for doc $id"))
        if (bits != 8L || back.length != n)
          sys.error(s"WAV round trip drifted for doc $id")
        // generic silence-run segmentation over the DECODED samples
        var i = 0
        var segStart = -1
        var nDetected = 0L; var active = 0L; var maxSeg = 0L; var ampSum = 0L
        var silentRun = 0
        def closeSeg(end: Int): Unit = if (segStart >= 0) {
          val len = (end - segStart).toLong
          nDetected += 1; active += len
          if (len > maxSeg) maxSeg = len
          segStart = -1
        }
        var lastLoud = -1
        while (i < n) {
          val v = (back(i) & 0xff) - 128
          val silent = math.abs(v) <= 2
          if (silent) {
            silentRun += 1
            if (silentRun == 8 && segStart >= 0) closeSeg(lastLoud + 1)
          } else {
            ampSum += math.abs(v)
            if (segStart < 0) segStart = i
            lastLoud = i
            silentRun = 0
          }
          i += 1
        }
        closeSeg(lastLoud + 1)
        AudioSegments(id, n.toLong, nDetected, active, maxSeg, ampSum)
      }
    }.toDF().orderBy($"doc_id")
  }

  final case class SceneCuts(doc_id: Long, n_frames: Long, n_cuts: Long,
      cut_mask: Long, max_delta_energy: Long)

  /** X221 — video scene-cut detection on the REAL decode lane: each doc id
    * maps to a deterministic multi-scene frame sequence (nf = id%12+4
    * frames of w×h = (id%7+5)×(id%5+5) gray pixels, scene s = f div L with
    * L = id%3+2, pixel g(f,x,y) = 20 + (id + 97·s mod 150) + (3x+5y mod
    * 40) + f — every term bounded so values stay in [20,224]: NO mod-256
    * wraparound, which would spike a within-scene delta to 255² and fake
    * a cut). The sequence is ENCODED as a real animated GIF
    * (ImageIO writeToSequence over q230's indexed 256-gray palette;
    * heights stay ≥5, out of the JDK writer's corrupt 2-4 band) and every
    * frame DECODED back; the detector then computes the classic cut
    * metric — inter-frame pixel-delta energy E(f) = Σ(g_f − g_{f−1})² —
    * from the DECODED rasters and flags a cut where E > 1024·w·h.
    *
    * The threshold separates BY CONSTRUCTION: within a scene the only
    * change is the +f term, so E = w·h exactly; across a boundary the
    * scene term shifts every pixel by c ∈ {97, −53} (97·Δs mod 150), so
    * E = w·h·(c+1)² ≥ 2704·w·h. The DuckDB oracle replays E, the cut
    * count, the exact cut POSITIONS (bitmask Σ 2^f, f ≤ 14) and max
    * energy arithmetically from doc_id — so the equality proves the whole
    * encode→decode→delta pipeline end to end; any frame drop, palette
    * remap, or compositing bug breaks the hash.
    *
    * Scale: ONE mapPartitions pass (q40's per-partition init discipline),
    * constant memory per row (≤15 frames × ≤99 pixels), zero shuffles
    * before the presentation orderBy — scene-cut detection runs at scan
    * throughput like the rest of the multimodal lane. */
  def q254SceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.load(s, dir, "documents").select($"doc_id").as[Long]
    ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val grays = Array.tabulate(256)(i => (i << 16 | i << 8 | i))
      val icm = new java.awt.image.IndexColorModel(8, 256,
        grays.map(g => ((g >> 16) & 0xff).toByte),
        grays.map(g => ((g >> 8) & 0xff).toByte),
        grays.map(g => (g & 0xff).toByte))
      // codec acquisition is a SYNCHRONIZED ImageIO registry lookup —
      // acquire ONE writer and ONE reader here in the partition prologue
      // and rebind them per row via setOutput/setInput + reset (the
      // per-row form serialized all 32 threads on the registry lock and
      // inflated this query 1.65s -> 15.1s under a loaded 32-way run)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      it.map { id =>
        val w = (Math.floorMod(id, 7L) + 5).toInt
        val h = (Math.floorMod(id, 5L) + 5).toInt
        val nf = (Math.floorMod(id, 12L) + 4).toInt
        val scLen = (Math.floorMod(id, 3L) + 2).toInt
        val frames = (0 until nf).map { f =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          val scene = f / scLen
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = 20 + Math.floorMod(id + 97L * scene, 150L).toInt +
                Math.floorMod(3L * x + 5L * y, 40L).toInt + f
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          img
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach(fi => writer.writeToSequence(
          new javax.imageio.IIOImage(fi, null, null), null))
        writer.endWriteSequence(); ios.close(); writer.reset()
        val payload = bos.toByteArray
        if (!ImageCodec.isGif(payload))
          sys.error(s"real animated-gif payload not recognized for doc $id")
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        reader.setInput(iis)
        val nBack = reader.getNumImages(true)
        if (nBack != nf)
          sys.error(s"decoded $nBack frames, wrote $nf for doc $id")
        // decode frame-by-frame, keeping only the previous raster
        var prev: Array[Int] = null
        var nCuts = 0L; var mask = 0L; var maxE = 0L
        var f = 0
        while (f < nBack) {
          val img = reader.read(f)
          val cur = new Array[Int](w * h)
          var k = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { cur(k) = img.getRGB(x, y) & 0xff; x += 1; k += 1 }
            y += 1
          }
          if (prev != null) {
            var e = 0L
            var i = 0
            while (i < cur.length) {
              val d = (cur(i) - prev(i)).toLong; e += d * d; i += 1
            }
            if (e > 1024L * w * h) { nCuts += 1; mask |= 1L << f }
            if (e > maxE) maxE = e
          }
          prev = cur
          f += 1
        }
        reader.reset(); iis.close()
        SceneCuts(id, nf.toLong, nCuts, mask, maxE)
      }
    }.toDF().orderBy($"doc_id")
  }

  /** X219 — perceptual-hash image near-dup detection: the multimodal
    * twin of X3/X66 — an average hash (aHash) over each REAL decoded
    * image, banded hamming-LSH candidate join, exact hamming verdict at
    * distance <= 3. The aHash samples a NEAREST-NEIGHBOR 8×8 grid
    * (x_i = i·w div 8) instead of an interpolated resize, so every bit
    * is integer arithmetic on decoded pixel values and the DuckDB
    * oracle replays the whole hash from the test-card formula — an
    * interpolated thumbnail could not be oracle-gated. Ground truth:
    * docs ≡ 7 (mod 10) render the test card of doc id−5 with ONE pixel
    * bumped a single gray level — a visual near-duplicate whose hash
    * differs in at most a few bits, exactly what aHash exists to catch
    * and exact byte-dedup never can.
    *
    * Scale: encode→decode→hash is one mapPartitions pass (q222's
    * codec-gated discipline, lossless PNG/BMP so decoded == pattern);
    * the hash splits into hi/lo 32-bit halves (q212's idiom — band keys
    * via div/mod on NON-NEGATIVE int64, no engine-divergent shifts on
    * negative values); candidates come from 4×16-bit hamming-LSH bands
    * (pigeonhole: hamming <= 3 guarantees a shared band — recall 100%
    * by construction, never all-pairs); the exact bit_count verdict
    * runs on candidates only. */
  def q251ImagePhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.load(s, dir, "documents").select($"doc_id").as[Long]
    val hashed = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        // twins (id ≡ 7 mod 10) render the BASE doc's card (dims AND
        // pattern from id-5) with pixel (0,0) bumped one gray level
        val twin = Math.floorMod(id, 10L) == 7L
        val base = if (twin) id - 5L else id
        val w = (Math.floorMod(base, 13L) + 1).toInt
        val h = (Math.floorMod(base, 7L) + 1).toInt
        val fmt = if (Math.floorMod(id, 2L) == 0L) "png" else "bmp"
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var j = 0
        while (j < h) {
          var i = 0
          while (i < w) {
            // base-MULTIPLICATIVE texture: q222's additive card differs
            // between same-size docs only by a constant gray offset, and
            // aHash (thresholding around the mean) is invariant to
            // constant offsets — every same-size pair would collide. The
            // base*(2i+3j+5) term makes the relative pixel structure
            // doc-specific, so only the planted twins hash close.
            // base pre-reduced mod 256 before the multiply: identical mod-
            // 256 values, but no int64 overflow at base ≳ 2e17 (where Java
            // wraps silently and the DuckDB replay raises — ADVICE r9 class)
            var g = Math.floorMod(
              Math.floorMod(base, 256L) * (2L * i + 3L * j + 5L)
                + 7L * i * i + 11L * j * j,
              256L).toInt
            if (twin && i == 0 && j == 0) g = (g + 1) % 256
            img.setRGB(i, j, (g << 16) | (g << 8) | g)
            i += 1
          }
          j += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        val payload = bos.toByteArray
        if (!ImageCodec.isPng(payload) && !ImageCodec.isBmp(payload))
          sys.error(s"real $fmt payload not recognized for doc $id")
        val back = Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
          .getOrElse(sys.error(s"real $fmt payload failed to decode for doc $id"))
        // aHash over the DECODED raster: 8×8 nearest-neighbor samples,
        // bit k set iff 64·sample(k) > Σ samples (strict — ties to 0)
        val samples = new Array[Long](64)
        var k = 0
        var total = 0L
        var jj = 0
        while (jj < 8) {
          var ii = 0
          while (ii < 8) {
            val x = ii * back.getWidth / 8
            val y = jj * back.getHeight / 8
            val sv = (back.getRGB(x, y) & 0xff).toLong
            samples(k) = sv
            total += sv
            ii += 1; k += 1
          }
          jj += 1
        }
        var hi = 0L; var lo = 0L
        k = 0
        while (k < 64) {
          if (64L * samples(k) > total) {
            if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
          }
          k += 1
        }
        ImageHash(id, hi, lo)
      }
    }.toDF()
    // a zero hash means ZERO contrast at the sample grid (1×1 and flat
    // cards): no perceptual evidence — excluded, like every pHash
    // deployment does, or all flat images pair with each other at
    // hamming 0
    val contrast = hashed.filter($"hash_hi" =!= 0L || $"hash_lo" =!= 0L)
    val bands = contrast.select($"doc_id", $"hash_hi", $"hash_lo",
      explode(expr(
        """array(named_struct('b', 0L, 'key', hash_lo % 65536),
          |      named_struct('b', 1L, 'key', hash_lo div 65536),
          |      named_struct('b', 2L, 'key', hash_hi % 65536),
          |      named_struct('b', 3L, 'key', hash_hi div 65536))""".stripMargin))
        .as("bd"))
      .select($"doc_id", $"hash_hi", $"hash_lo",
        $"bd.b".as("b"), $"bd.key".as("key"))
    bands.select($"b", $"key", $"doc_id".as("doc_a"),
        $"hash_hi".as("ha_hi"), $"hash_lo".as("ha_lo"))
      .join(bands.select($"b", $"key", $"doc_id".as("doc_b"),
        $"hash_hi".as("hb_hi"), $"hash_lo".as("hb_lo")), Seq("b", "key"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", $"ha_hi", $"ha_lo", $"hb_hi", $"hb_lo")
      .distinct()
      .withColumn("hamming", expr(
        "bit_count(ha_hi ^ hb_hi) + bit_count(ha_lo ^ hb_lo)").cast("long"))
      .filter($"hamming" <= 3)
      .select($"doc_a", $"doc_b", $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }

  final case class PngMeta(doc_id: Long, width: Long, height: Long,
      bit_depth: Long, color_type: Long, interlace: Long, sig_ok: Long,
      crc_ok: Long)

  /** X244 — PNG container-metadata probe: the CHEAP pass a 100 TB media
    * pipeline runs before any decode — width/height/bit-depth/color-type
    * read from the IHDR chunk and the signature + CRC32 integrity check,
    * a few hundred bytes per file instead of a full raster decode, which
    * is how a media lake filters and shards first (decode only what
    * survives). The encode is a REAL `ImageIO` PNG write; the parse is
    * OURS — an independent walk of the container format (8-byte
    * signature, big-endian chunk framing, IHDR field layout, CRC32 over
    * type+data per the PNG spec) that never touches ImageIO on the read
    * side, so the two implementations gate each other. The oracle
    * replays width/height arithmetically from the plant and pins the
    * format constants (8-bit, color type 2, no interlace, sig/crc OK) —
    * a drifting encoder or a broken parser breaks the equality loudly.
    *
    * Scale: ONE mapPartitions pass, constant memory per row (≤ 19×11
    * px), zero shuffles before the presentation orderBy. */
  def q274PngProbe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.load(s, dir, "documents").select($"doc_id").as[Long]
    ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = (Math.floorMod(id, 16L) + 4).toInt
        val h = (Math.floorMod(id, 9L) + 3).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var j = 0
        while (j < h) {
          var i = 0
          while (i < w) {
            val g = Math.floorMod(id + 29L * i + 13L * j, 256L).toInt
            img.setRGB(i, j, (g << 16) | (g << 8) | g)
            i += 1
          }
          j += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val p = bos.toByteArray
        def u8(o: Int): Int = p(o) & 0xff
        def be32(o: Int): Long =
          (u8(o).toLong << 24) | (u8(o + 1) << 16) | (u8(o + 2) << 8) | u8(o + 3)
        val sigOk = p.length >= 8 &&
          u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
          u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a
        // walk the chunk framing to IHDR (the spec REQUIRES it first, but
        // the walk is the general parser a probe ships)
        var off = 8
        var meta: Option[(Long, Long, Long, Long, Long, Boolean)] = None
        while (meta.isEmpty && off + 12 <= p.length) {
          val len = be32(off).toInt
          val ctype = new String(p, off + 4, 4, "US-ASCII")
          if (ctype == "IHDR" && len == 13) {
            val crc = new java.util.zip.CRC32()
            crc.update(p, off + 4, 4 + len)
            meta = Some((be32(off + 8), be32(off + 12), u8(off + 16).toLong,
              u8(off + 17).toLong, u8(off + 20).toLong,
              crc.getValue == be32(off + 8 + len)))
          }
          off += 12 + len
        }
        val (pw, ph, bd, ct, il, crcOk) = meta.getOrElse(
          sys.error(s"no IHDR chunk in real PNG payload for doc $id"))
        PngMeta(id, pw, ph, bd, ct, il, if (sigOk) 1L else 0L,
          if (crcOk) 1L else 0L)
      }
    }.toDF().orderBy($"doc_id")
  }

  /** q382's watermark stamp rate (pmod(doc_id, WmMod) == WmRes) and the
    * doc-independent 8×8 watermark pattern applied to tile (0,0). */
  private[graft] val WmMod = 9L
  private[graft] val WmRes = 4L
  private[graft] def wmPixel(i: Int, j: Int): Int =
    ((17 * i + 23 * j + 101) % 256)

  /** X362 — cross-image repeated-PATCH detection (watermark / logo
    * discovery): the suffix lane's min-doc-per-gram idea applied to
    * VISION — a watermark is to an image corpus what boilerplate is to
    * a text corpus, and the detector is the same shape: hash fixed
    * 8×8 tiles of every image and group identical tile signatures
    * across images. Each doc renders a REAL 16×16 PNG (the q251
    * discipline: a real codec encodes and decodes in the loop — the
    * lossless round-trip is part of what is being tested), with a
    * per-pixel texture g = (fp31("id:gi:gj")² mod 1e9+7) mod 256 — the
    * squared-tail avalanche applied to PIXELS, and the q332 lesson
    * measured twice more on the way here: an affine texture collided
    * 26 tile pairs at sf0.1 (translation + id-shift solves the linear
    * coefficient equations), and raw fp31 mod 256 collided THOUSANDS
    * (short strings never engage the modulus, so the low bits stay a
    * linear function of the prefix hash — any doc pair congruent mod
    * 256 rendered identical tiles); squaring mod the prime engages the
    * wrap per pixel and both SFs measure EXACTLY one shared signature
    * (the stamp), zero natural collisions; docs with
    * pmod(doc_id, [[WmMod]]) = [[WmRes]] get the doc-INDEPENDENT
    * [[wmPixel]] stamp over tile (0,0) — the planted watermark. Tile
    * signature = the fp31 fold over the 64 decoded pixel values in
    * raster order (numeric fold — no string formatting to diverge).
    *
    * Report: every tile signature shared across ≥2 images (expected:
    * EXACTLY the watermark — the texture bound makes natural
    * collisions impossible, and the spec asserts the sig matches the
    * stamp's replayed fold) with its image count and first carrier,
    * plus corpus totals. The DuckDB oracle replays the pixel
    * arithmetic + watermark overwrite + fold directly (q251's rule:
    * the codec is lossless, so the decoded raster IS the formula).
    *
    * Scale: rendering/hashing is one narrow mapPartitions (64 pixels ×
    * 4 tiles per image); the share detector is ONE tile-signature-
    * keyed aggregate — corpus × 4 rows of (8B, 4B, 8B), the vision
    * analogue of q370's gram shuffle at 1/10th the width. */
  def q382PatchWatermark(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val ids = Tables.load(s, dir, "documents").select($"doc_id").as[Long]
    val tiles = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { id =>
        val wm = Math.floorMod(id, WmMod) == WmRes
        val img = new java.awt.image.BufferedImage(
          16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var j = 0
        while (j < 16) {
          var i = 0
          while (i < 16) {
            val g =
              if (wm && i < 8 && j < 8) wmPixel(i, j)
              else {
                val f = graft.functions.Fingerprint.hashString(s"$id:$i:$j")
                ((f * f % 1000000007L) % 256L).toInt
              }
            img.setRGB(i, j, (g << 16) | (g << 8) | g)
            i += 1
          }
          j += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val payload = bos.toByteArray
        if (!ImageCodec.isPng(payload))
          sys.error(s"real png payload not recognized for doc $id")
        val back = Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
          .getOrElse(sys.error(s"png payload failed to decode for doc $id"))
        (0 until 4).map { t =>
          val (tx, ty) = (t % 2, t / 2)
          var acc = 0L
          var jj = 0
          while (jj < 8) {
            var ii = 0
            while (ii < 8) {
              val v = (back.getRGB(tx * 8 + ii, ty * 8 + jj) & 0xff).toLong
              acc = (acc * 31L + v) % 1000000007L
              ii += 1
            }
            jj += 1
          }
          (id, t.toLong, acc)
        }
      }
    }.toDF("doc_id", "tile", "sig")
    // the shared-signature frame stays DISTRIBUTED (its size is bounded
    // by the corpus's repeated-patch mass, not by a known constant — an
    // all-duplicates image corpus would make a driver collect
    // corpus-sized); only the 3 summary counters are driver values
    val shared = tiles.groupBy($"sig")
      .agg(count(lit(1)).as("n_images"), min($"doc_id").as("min_doc"))
      .filter($"n_images" >= 2L)
      .select(concat(lit("sig:"), $"sig").as("grp"), $"n_images", $"min_doc")
      .persist() // counted for the summary row + emitted in the report
    try {
      val nImgs = ids.distinct().count()
      val nWm = ids.filter(id => Math.floorMod(id, WmMod) == WmRes)
        .distinct().count()
      val nShared = shared.count()
      val summary = graft.operators.LocalReport.frame(s, Seq(
        org.apache.spark.sql.Row("1_images_total", nImgs, 0L),
        org.apache.spark.sql.Row("2_watermarked", nWm, 0L),
        org.apache.spark.sql.Row("3_shared_sigs", nShared, 0L)),
        ("grp", StringType), ("n_images", LongType), ("min_doc", LongType))
      summary.unionByName(shared).orderBy($"grp").localCheckpoint()
    } finally shared.unpersist(blocking = false)
  }

  /** q389's palette size (2³ = three simultaneous split rounds) and the
    * histogram cell width (4 bits per channel → ≤ 4096 cells, inside
    * the ≤8192-row bounded-dictionary rule). */
  private[graft] val McRounds = 3
  private[graft] val McCell = 16

  /** The ONE box-split rule all three implementations (this driver cut,
    * the DuckDB unrolled oracle, the spec replay) state identically:
    * axis = longest range (ties r → g → b); s_raw = smallest coord
    * whose cumulative weight ≥ ⌈W/2⌉; if s_raw is the box maximum and
    * the box has range, step down to the largest coord below the max
    * (so the right child is never empty when a split is possible);
    * left = coord ≤ s. A zero-range box sends everything left. */
  private[graft] def mcSplit(cells: Seq[(Int, Int, Int, Long)])
      : (Seq[(Int, Int, Int, Long)], Seq[(Int, Int, Int, Long)]) = {
    if (cells.isEmpty) return (Nil, Nil)
    val ranges = Seq(
      cells.map(_._1).max - cells.map(_._1).min,
      cells.map(_._2).max - cells.map(_._2).min,
      cells.map(_._3).max - cells.map(_._3).min)
    val ax = ranges.indexOf(ranges.max)
    def coord(c: (Int, Int, Int, Long)): Int = ax match {
      case 0 => c._1; case 1 => c._2; case _ => c._3
    }
    val w = cells.map(_._4).sum
    val byCoord = cells.groupBy(coord).view.mapValues(_.map(_._4).sum)
      .toSeq.sortBy(_._1)
    var cum = 0L
    val sRaw = byCoord.collectFirst {
      case (v, cw) if { cum += cw; cum >= (w + 1L) / 2L } => v
    }.get
    val (mn, mx) = (byCoord.head._1, byCoord.last._1)
    val s = if (sRaw == mx && mx > mn)
      byCoord.map(_._1).filter(_ < mx).max else sRaw
    cells.partition(coord(_) <= s)
  }

  /** X370 — median-cut palette quantization (Heckbert 1982; the GIF/PNG8
    * palette builder): the multimodal lane decodes (q222/q230), hashes
    * (q251), segments (q254/q261) and detects (q382) — this TRANSFORMS:
    * reduce the corpus's color space to a K = 8 global palette and
    * measure the quantization bill. Each doc renders a REAL 16×16 RGB
    * PNG (three squared-tail texture channels — q382's avalanche rule
    * per channel) and round-trips the codec (the q251 discipline);
    * the decoded pixels feed a 4-bit-per-channel coarse histogram
    * (≤ 4096 weighted cells — the bounded-dictionary rule), the driver
    * runs [[McRounds]] simultaneous median-cut rounds under the ONE
    * [[mcSplit]] rule, palette entries are the weighted integer means
    * of their boxes' cell centers, and a second pass assigns every
    * pixel to its nearest entry (exact int64 L2, ties to the lowest
    * palette index) and bills the exact SSE.
    *
    * Report: per palette entry its RGB, pixel count and within-box SSE;
    * a totals row with the corpus MSE in milli-units (SSE·1000 div n —
    * the number a storage layer weighs against the 3-byte → 3-bit
    * saving). Measured at sf0.01 (500 images, 128000 pixels): the cut
    * recovers the 8 RGB OCTANTS — palette entries at ~(64|192)³ with
    * 15–17k pixels each — and MSE 4104.6/pixel ≈ the theoretical
    * 3·128²/12 = 4096 for uniform octant residuals: the algorithm
    * behaving exactly as Heckbert's analysis predicts on isotropic
    * texture, verified to the fourth digit. The DuckDB oracle replays the pixel formula (the codec
    * round-trip is lossless, so the decoded raster IS the formula),
    * unrolls the three split rounds as chained CTEs with the identical
    * rule, and re-derives palette + assignment independently.
    *
    * Scale: rendering is one narrow mapPartitions; the histogram is ONE
    * combinable ≤4096-cell fold (collected under the dictionary rule);
    * the cut is driver math over those cells; assignment is ONE
    * constant-folded 8-distance projection into a combinable 8-key agg.
    * The pixels frame persists across its two consumers and releases
    * before return. */
  def q389MedianCut(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val cell = McCell
    val ids = Tables.load(s, dir, "documents").select($"doc_id").as[Long]
    val pixels = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { id =>
        val img = new java.awt.image.BufferedImage(
          16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
        def chan(i: Int, j: Int, c: String): Int = {
          val f = graft.functions.Fingerprint.hashString(s"$id:$i:$j:$c")
          ((f * f % 1000000007L) % 256L).toInt
        }
        var j = 0
        while (j < 16) {
          var i = 0
          while (i < 16) {
            img.setRGB(i, j,
              (chan(i, j, "r") << 16) | (chan(i, j, "g") << 8) | chan(i, j, "b"))
            i += 1
          }
          j += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val back = Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray)))
          .getOrElse(sys.error(s"png payload failed to decode for doc $id"))
        for (jj <- 0 until 16; ii <- 0 until 16) yield {
          val rgb = back.getRGB(ii, jj)
          ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        }
      }
    }.toDF("r", "g", "b").persist()
    try {
      val cells = pixels
        .groupBy(($"r" / cell).cast("int").as("cr"),
          ($"g" / cell).cast("int").as("cg"),
          ($"b" / cell).cast("int").as("cb"))
        .agg(count(lit(1)).as("w"))
        .collect().map(r0 =>
          (r0.getInt(0), r0.getInt(1), r0.getInt(2), r0.getLong(3)))
        .toSeq
      var boxes: Map[Int, Seq[(Int, Int, Int, Long)]] = Map(0 -> cells)
      (1 to McRounds).foreach { _ =>
        boxes = boxes.toSeq.flatMap { case (b, cs) =>
          val (l, r0) = mcSplit(cs)
          Seq(2 * b -> l, 2 * b + 1 -> r0)
        }.filter(_._2.nonEmpty).toMap
      }
      val pal = (0 until (1 << McRounds)).map { k =>
        boxes.get(k) match {
          case Some(cs) if cs.nonEmpty =>
            val w = cs.map(_._4).sum
            def mean(f: ((Int, Int, Int, Long)) => Int): Long =
              cs.map(c => c._4 * (f(c) * cell + cell / 2).toLong).sum / w
            (mean(_._1), mean(_._2), mean(_._3))
          case _ => (0L, 0L, 0L)
        }
      }
      val dsExpr = pal.map { case (pr, pg, pb) =>
        s"(r - ${pr}L) * (r - ${pr}L) + (g - ${pg}L) * (g - ${pg}L) + " +
          s"(b - ${pb}L) * (b - ${pb}L)"
      }.mkString("array(", ", ", ")")
      val asg = pixels
        .selectExpr(s"$dsExpr AS ds")
        .selectExpr(
          "CAST(array_position(ds, array_min(ds)) AS BIGINT) - 1L AS pal",
          "array_min(ds) AS d")
        .groupBy($"pal").agg(count(lit(1)).as("n"), sum($"d").as("sse"))
        .collect().map(r0 => r0.getLong(0) -> (r0.getLong(1), r0.getLong(2)))
        .toMap
      val body = pal.zipWithIndex.map { case ((pr, pg, pb), k) =>
        val (n, sse) = asg.getOrElse(k.toLong, (0L, 0L))
        org.apache.spark.sql.Row(s"pal:$k", pr, pg, pb, n, sse)
      }
      val (nTot, sseTot) = (body.map(_.getLong(4)).sum,
        body.map(_.getLong(5)).sum)
      val rows = body :+ org.apache.spark.sql.Row("z_total", 0L, 0L, 0L,
        nTot, sseTot * 1000L / nTot)
      graft.operators.LocalReport.frame(s, rows,
        "scope" -> StringType, "pal_r" -> LongType, "pal_g" -> LongType,
        "pal_b" -> LongType, "n_pixels" -> LongType, "sse" -> LongType)
    } finally pixels.unpersist(blocking = false)
  }
}
