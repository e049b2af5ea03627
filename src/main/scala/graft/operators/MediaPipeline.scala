package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.TrackedPersist

/** Multimodal-column processing: image/audio/video handled as opaque
  * `BINARY` columns with typed metadata, the standard lakehouse layout
  * for multimodal training data.
  *
  * The Spark-side plumbing here is real and tested — schema, typed
  * Dataset encoders, per-partition batch processing (`mapPartitions`, so
  * a real decoder would amortize native-library init per partition, not
  * per row), and feature extraction as columnar aggregates. The image
  * path decodes REAL PNG bytes through `javax.imageio` and the audio
  * path REAL WAV bytes through `javax.sound.sampled` (both pure-JDK).
  * Video has no in-JDK codec, so the video path uses the GVID container
  * ([[videoMediaFromDocs]]): a real demux of a length-prefixed frame stream
  * whose frames are genuine PNGs decoded by the real image path —
  * swapping in an MP4/H.264 codec changes only the demux/frame-decode
  * functions, not the pipeline shape.
  *
  * 100 TB design notes:
  *  - binary payloads stay columnar in parquet; metadata columns
  *    (width/height/format) are scalars, so filters like
  *    `width >= 64` prune row groups WITHOUT touching payload bytes;
  *  - feature extraction is a narrow map — no shuffle; the only shuffle
  *    in this module is the optional group-by-format stats;
  *  - `mapPartitions` keeps the decode batch-shaped: one iterator pass
  *    per partition, no per-row session/codec setup.
  */
object MediaPipeline {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      format: String, // fake codec tag
      width: Int,
      height: Int,
      data: Array[Byte])

  /** Decoded form: header fields + payload "pixels". */
  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_bytes: Int,
      pixels: Array[Byte])

  // ==== REAL image decode path ==============================================

  /** Exact per-image features — all-integer so the gate hash-matches the
    * oracle bit-for-bit (no doubles anywhere).
    */
  final case class PngFeatures(media_id: Long, width: Long, height: Long,
      n_pixels: Long, sum_byte: Long, hist: String)

  /** Real PNG bytes, one image per document: an 8-bit grayscale image
    * whose pixels follow the analytically-known formula
    * `gray(i) = (doc_id*31 + i*7) mod 256`, encoded with the pure-JDK
    * `javax.imageio` PNG writer (no external codec dependencies). The
    * formula makes the decoded features SQL-recomputable, so the DuckDB
    * oracle can verify the REAL encode→decode round trip.
    */
  def pngMediaFromDocs(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.map { id =>
        val width = (16 + (id % 4) * 8).toInt
        val height = (16 + (id % 3) * 8).toInt
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < width * height) {
          raster.setSample(i % width, i / width, 0,
            ((id * 31 + i * 7) % 256).toInt)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(id, "image", "image/png", width, height, bos.toByteArray)
      }
    }
  }

  /** REAL byte decode via `javax.imageio`. Per-partition init
    * (`setUseCache`), batch-shaped iteration; reads any
    * ImageIO-supported format (PNG/BMP/GIF ship with the JDK).
    */
  def decodeImage(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        // ImageIO.read signals "no decoder matched" with null, not an
        // exception — surface a descriptive per-record error instead of
        // an opaque NPE killing the task
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.data))
        if (img == null)
          throw new IllegalArgumentException(
            s"media_id=${m.media_id}: undecodable image bytes " +
              s"(${m.data.length} bytes, format=${m.format})")
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val pixels = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) {
          pixels(i) = raster.getSample(i % w, i / w, 0).toByte
          i += 1
        }
        DecodedMedia(m.media_id, m.kind, w, h, pixels.length, pixels)
      }
    }
  }

  /** Gate query: documents → real PNG encode → real ImageIO decode →
    * exact integer features (pixel sum + 16-bucket histogram packed as a
    * '|'-joined string, identical spelling on the DuckDB side).
    */
  def pngFeatureTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    decodeImage(pngMediaFromDocs(docs)).map { d =>
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < d.pixels.length) {
        val b = d.pixels(i) & 0xff
        hist(b / 16) += 1
        sum += b
        i += 1
      }
      PngFeatures(d.media_id, d.width.toLong, d.height.toLong,
        d.pixels.length.toLong, sum, hist.mkString("|"))
    }.toDF().orderBy("media_id")
  }

  /** Per-image perceptual hash row. */
  final case class AHashRow(media_id: Long, ahash: String)

  /** Average-hash (aHash) perceptual fingerprint over the REAL decoded
    * raster: 8×8 strided downsample (integer strides w/8 × h/8 — exact
    * for the generator's dimension family), integer mean, one bit per
    * sample (`sample > mean`), packed little-endian-within-nibble into
    * a 16-hex-char string — the same signature layout as
    * [[Dedup.simhash]], so block bucketing and hex-digit hamming
    * machinery apply unchanged. Brightness-shift-tolerant by
    * construction (a non-wrapping constant shift moves samples and
    * mean together, leaving every bit unchanged), which is exactly the
    * near-dup class pixel-exact hashing misses.
    */
  def imageAHash(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    decodeImage(pngMediaFromDocs(docs)).map { d =>
      val sx = d.width / 8
      val sy = d.height / 8
      val s = new Array[Int](64)
      var sum = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val v = d.pixels(y * sy * d.width + x * sx) & 0xff
          s(y * 8 + x) = v
          sum += v
          x += 1
        }
        y += 1
      }
      val mean = sum / 64
      val sb = new StringBuilder(16)
      var j = 0
      while (j < 16) {
        var n = 0
        var b = 0
        while (b < 4) {
          if (s(4 * j + b) > mean) n |= 1 << b
          b += 1
        }
        sb.append("0123456789abcdef".charAt(n))
        j += 1
      }
      AHashRow(d.media_id, sb.toString)
    }.toDF()
  }

  /** Image perceptual near-duplicate report: images collapse to their
    * aHash first (exact perceptual groups — LINEAR, one hash agg),
    * then near-links are found between GROUP REPRESENTATIVES via the
    * q46 machinery: 4×4-hex-digit block bucketing (pigeonhole-complete
    * for hamming ≤ 3) + per-hex-digit XOR popcount. Joining
    * representatives, not members, bounds the pair join by the number
    * of DISTINCT hashes — the collapse-then-link composition that
    * keeps "report near-dups" from going quadratic in group size when
    * a template image floods the corpus. Emits (a, b, n_a, n_b,
    * hamming), 1 ≤ hamming ≤ `maxHamming`.
    */
  def imagePerceptualDup(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    signatureNearDup(imageAHash(docs), maxHamming)

  /** 64-bit audio envelope hash over the REAL WAV decode: the PCM
    * stream splits into 64 equal windows (the generator's lengths are
    * all 64-divisible; a production stream pads the tail), each
    * window's mean |amplitude| is its energy (integer floor), and a
    * bit is set where window energy exceeds the clip's mean energy —
    * the same 16-hex signature layout as [[imageAHash]], tolerant of
    * uniform gain changes the way aHash tolerates brightness shifts.
    */
  def audioEnvelopeHash(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    decodeWav(amWavMediaFromDocs(docs)).map { d =>
      val n = d.samples.length
      val winLen = n / 64
      val e = new Array[Long](64)
      var j = 0
      while (j < 64) {
        var sumAbs = 0L
        var i = j * winLen
        while (i < (j + 1) * winLen) {
          sumAbs += math.abs(d.samples(i).toLong)
          i += 1
        }
        e(j) = sumAbs / winLen
        j += 1
      }
      var tot = 0L
      j = 0
      while (j < 64) { tot += e(j); j += 1 }
      val mean = tot / 64
      val sb = new StringBuilder(16)
      j = 0
      while (j < 16) {
        var nib = 0
        var b = 0
        while (b < 4) {
          if (e(4 * j + b) > mean) nib |= 1 << b
          b += 1
        }
        sb.append("0123456789abcdef".charAt(nib))
        j += 1
      }
      AHashRow(d.media_id, sb.toString)
    }.toDF()
  }

  /** Audio perceptual near-dup report — [[imagePerceptualDup]]'s
    * collapse-then-link composition over [[audioEnvelopeHash]].
    */
  def audioPerceptualDup(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    signatureNearDup(audioEnvelopeHash(docs), maxHamming)

  /** Video shared-frame detection: per-frame aHash over the REAL
    * demux + per-frame PNG decode (ALL frames, stride 1), then pairs
    * of videos sharing at least `minShared` DISTINCT frame hashes —
    * the clip-reuse / re-upload signal a video-dedup pass ranks
    * before collapsing. Frame hashes carried by more than `maxDf`
    * videos are dropped first (the black-frame/title-card analog —
    * template frames, not reuse evidence), which bounds per-hash pair
    * fan-out at maxDf² regardless of corpus size.
    *
    * Scale shape: frames reduce to DISTINCT (video, hash) before the
    * hash-keyed self-join (one row per distinct frame signature per
    * video); the persisted frame table is two narrow columns; output
    * is df-capped pair rows.
    */
  def videoSharedFrames(docs: DataFrame, maxDf: Int = 20,
      minShared: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fh = demuxVideo(videoMediaFromDocs(docs), stride = 1).map { fr =>
      val sx = fr.width / 8
      val sy = fr.height / 8
      val s = new Array[Int](64)
      var sum = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val v = fr.pixels(y * sy * fr.width + x * sx) & 0xff
          s(y * 8 + x) = v
          sum += v
          x += 1
        }
        y += 1
      }
      val mean = sum / 64
      val sb = new StringBuilder(16)
      var j = 0
      while (j < 16) {
        var nib = 0
        var b = 0
        while (b < 4) {
          if (s(4 * j + b) > mean) nib |= 1 << b
          b += 1
        }
        sb.append("0123456789abcdef".charAt(nib))
        j += 1
      }
      AHashRow(fr.media_id, sb.toString)
    }.toDF("media_id", "fhash")
    val vf = fh.distinct()
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keep = vf.groupBy(col("fhash")).agg(count(lit(1)).as("c"))
      .where(col("c") <= maxDf).select(col("fhash"))
    vf.as("x")
      .join(vf.as("y"),
        col("x.fhash") === col("y.fhash") &&
          col("x.media_id") < col("y.media_id"))
      .join(keep.as("k"), col("x.fhash") === col("k.fhash"), "left_semi")
      .groupBy(col("x.media_id").as("a"), col("y.media_id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .orderBy("a", "b")
  }

  /** Shared collapse-then-link machinery over a (media_id, ahash)
    * signature frame: exact groups collapse linearly on the 16-hex
    * signature; near-links join group REPRESENTATIVES via q46's
    * 4-block pigeonhole bucketing + per-hex-digit XOR popcount, so the
    * pair join is bounded by the number of DISTINCT signatures.
    */
  private def signatureNearDup(hashes: DataFrame,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4-block bucketing is only complete for <= 3")
    val rep = hashes
      .groupBy(col("ahash"))
      .agg(min(col("media_id")).as("rep_id"),
        count(lit(1)).as("n_images"))
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blocks = rep.select(col("rep_id"), col("ahash"), col("n_images"),
      explode(expr(
        "transform(sequence(0, 3), bk -> struct(bk AS bk, substr(ahash, 1 + bk * 4, 4) AS block))"))
        .as("b"))
      .select(col("rep_id"), col("ahash"), col("n_images"),
        col("b.bk"), col("b.block"))
    val cand = blocks.as("b1")
      .join(blocks.as("b2"),
        col("b1.bk") === col("b2.bk") && col("b1.block") === col("b2.block") &&
          col("b1.rep_id") < col("b2.rep_id"))
      .select(col("b1.rep_id").as("a"), col("b2.rep_id").as("b"),
        col("b1.ahash").as("ha"), col("b2.ahash").as("hb"),
        col("b1.n_images").as("n_a"), col("b2.n_images").as("n_b"))
      .distinct()
    cand.select(col("a"), col("b"), col("n_a"), col("n_b"),
        expr("""aggregate(sequence(0, 15), 0L, (acc, i) ->
                  acc + CAST(substr('0112122312232334',
                    CAST((instr('0123456789abcdef', substr(ha, i + 1, 1)) - 1)
                       ^ (instr('0123456789abcdef', substr(hb, i + 1, 1)) - 1)
                     AS INT) + 1, 1) AS BIGINT))""").as("hamming"))
      .where(col("hamming") >= 1 && col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  /** REAL image downsample: nearest-neighbor by integer stride over the
    * decoded raster — `out(x, y) = in(x·k, y·k)` — so the result is
    * deterministic across JVMs (no interpolation kernel) and, for the
    * formula-generated PNGs, SQL-recomputable by the oracle. Output
    * dims are `floor(w/k) × floor(h/k)`.
    */
  def resizeImage(decoded: Dataset[DecodedMedia], k: Int = 2):
      Dataset[DecodedMedia] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.mapPartitions { it =>
      it.map { d =>
        val w2 = d.width / k
        val h2 = d.height / k
        val out = new Array[Byte](w2 * h2)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            out(y * w2 + x) = d.pixels(y * k * d.width + x * k)
            x += 1
          }
          y += 1
        }
        DecodedMedia(d.media_id, d.kind, w2, h2, out.length, out)
      }
    }
  }

  /** Gate query: documents → real PNG encode → real decode → real
    * nearest-neighbor ÷2 resize → exact integer features. The oracle
    * recomputes each resized pixel straight from the generating formula
    * at the strided source index, so a broken decode OR resize flips
    * the hash.
    */
  def resizedPngFeatureTable(docs: DataFrame, k: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    resizeImage(decodeImage(pngMediaFromDocs(docs)), k).map { d =>
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < d.pixels.length) {
        val b = d.pixels(i) & 0xff
        hist(b / 16) += 1
        sum += b
        i += 1
      }
      PngFeatures(d.media_id, d.width.toLong, d.height.toLong,
        d.pixels.length.toLong, sum, hist.mkString("|"))
    }.toDF().orderBy("media_id")
  }

  // ---- audio: REAL WAV encode → decode via pure-JDK javax.sound ----

  final case class DecodedAudio(media_id: Long, sample_rate: Long,
      samples: Array[Int])

  final case class WavFeatures(media_id: Long, sample_rate: Long,
      n_samples: Long, sum_sample: Long, sum_abs: Long, max_abs: Long,
      hist: String)

  /** Real WAV bytes, one clip per document: 16-bit signed PCM mono at
    * 8 kHz whose samples follow the analytically-known formula
    * `s(i) = ((doc_id*37 + i*11) mod 65536) - 32768`, encoded with the
    * pure-JDK `javax.sound.sampled` WAV writer (headless-safe file I/O —
    * no audio device, no external codec). The formula makes the decoded
    * features SQL-recomputable, so the DuckDB oracle verifies the REAL
    * encode→decode round trip, mirroring the PNG path above.
    */
  def wavMediaFromDocs(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (512 + (id % 4) * 128).toInt
        val pcm = new Array[Byte](n * 2) // little-endian int16 frames
        var i = 0
        while (i < n) {
          val s = (((id * 37 + i * 11) % 65536) - 32768).toInt
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
          /* signed = */ true, /* bigEndian = */ false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRecord(id, "audio", "audio/wav", n, 1, bos.toByteArray)
      }
    }
  }

  /** Amplitude-modulated clip family for the perceptual-dedup gate:
    * the carrier is [[wavMediaFromDocs]]'s sawtooth, scaled per 64th
    * window by an id-keyed integer gain
    * `g(i) = 1 + (doc_id*13 + (i/(n/64))*7) mod 16`, i.e.
    * `s(i) = (carrier(i) · g(i)) / 16` with TRUNCATING division —
    * exact integer arithmetic any engine replays (DuckDB's integer
    * `//` truncates toward zero exactly like JVM `/`; floorDiv would
    * disagree on negative samples — measured, one clip in 500 flipped
    * a bit). The plain sawtooth is spectrally FLAT
    * (measured: every clip's 64-window energy profile is constant, so
    * envelope hashing collapses the whole corpus to one signature);
    * the AM family gives clips a real envelope, with clips whose gain
    * pattern aligns (same `doc_id·13 mod 16` phase) forming genuine
    * perceptual-dup classes. Same REAL WAV encode as the base
    * generator.
    */
  def amWavMediaFromDocs(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (512 + (id % 4) * 128).toInt
        val wl = n / 64
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val base = (((id * 37 + i * 11) % 65536) - 32768).toInt
          val g = (1 + (id * 13 + (i / wl).toLong * 7) % 16).toInt
          val s = (base * g) / 16 // truncating, = DuckDB's integer //
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
          /* signed = */ true, /* bigEndian = */ false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRecord(id, "audio", "audio/wav", n, 1, bos.toByteArray)
      }
    }
  }

  /** REAL WAV decode: parse the RIFF container + PCM frames back out of
    * the bytes through `AudioSystem.getAudioInputStream` — the audio
    * counterpart of [[decodeImage]].
    */
  def decodeWav(media: Dataset[MediaRecord]): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.data))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian || fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          throw new IllegalArgumentException(
            s"media_id=${m.media_id}: expected 16-bit signed little-endian " +
              s"mono PCM, got $fmt")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
          i += 1
        }
        DecodedAudio(m.media_id, fmt.getSampleRate.toLong, samples)
      }
    }
  }

  /** Gate query: documents → real WAV encode → real javax.sound decode →
    * exact integer features (signed sum, abs sum, peak, 16-bucket
    * amplitude histogram packed '|'-joined — identical spelling on the
    * DuckDB side, recomputed from the generating formula).
    */
  def wavFeatureTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    decodeWav(wavMediaFromDocs(docs)).map { d =>
      val hist = new Array[Long](16)
      var sum = 0L; var sumAbs = 0L; var maxAbs = 0L
      var i = 0
      while (i < d.samples.length) {
        val s = d.samples(i)
        val a = math.abs(s.toLong)
        sum += s; sumAbs += a; if (a > maxAbs) maxAbs = a
        hist((s + 32768) / 4096) += 1
        i += 1
      }
      WavFeatures(d.media_id, d.sample_rate, d.samples.length.toLong,
        sum, sumAbs, maxAbs, hist.mkString("|"))
    }.toDF().orderBy("media_id")
  }

  // ---- video: REAL container demux + per-frame PNG codec ------------------

  final case class VideoFrame(media_id: Long, frame_idx: Int, n_frames: Int,
      width: Int, height: Int, pixels: Array[Byte])

  final case class VideoFeatures(media_id: Long, width: Long, height: Long,
      n_frames: Long, n_sampled: Long, sum_byte: Long, hist: String)

  private val GvidMagic = 0x47564944 // "GVID"

  /** Real video bytes, one clip per document: a binary container
    * (`"GVID"` magic, int32 width/height/frame-count, then length-prefixed
    * frames — all big-endian) whose frames are REAL PNGs encoded with the
    * pure-JDK `javax.imageio` writer. Frame pixels follow the
    * analytically-known formula
    * `gray(f, i) = (doc_id*31 + f*13 + i*7) mod 256`, so the sampled-frame
    * features are SQL-recomputable and the DuckDB oracle verifies the
    * whole demux → per-frame decode round trip. The container itself is
    * ours (real-world codecs — H.264/VP9 — need native libs this
    * container lacks), but everything the engine DOES with it is real:
    * binary demux, frame sampling, per-frame image decode, all
    * batch-shaped on executors.
    */
  def videoMediaFromDocs(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val width = (8 + (id % 2) * 8).toInt
        val height = (8 + (id % 3) * 4).toInt
        val nFrames = (6 + (id % 5)).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(bos)
        out.writeInt(GvidMagic)
        out.writeInt(width)
        out.writeInt(height)
        out.writeInt(nFrames)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var i = 0
          while (i < width * height) {
            raster.setSample(i % width, i / width, 0,
              ((id * 31 + f * 13 + i * 7) % 256).toInt)
            i += 1
          }
          val frameBytes = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", frameBytes)
          val png = frameBytes.toByteArray
          out.writeInt(png.length)
          out.write(png)
          f += 1
        }
        out.flush()
        MediaRecord(id, "video", "video/x-graft-gvid", width, height,
          bos.toByteArray)
      }
    }
  }

  /** REAL demux + frame-sample: parse the GVID container and decode every
    * `stride`-th frame through `javax.imageio`. Sampling happens BEFORE
    * decode — skipped frames are length-skipped in the byte stream and
    * never hit the PNG decoder, which is the order that matters at scale
    * (decode is the expensive step; a stride-10 sample does ~10% of the
    * decode work). One input row flat-maps to its sampled frames; no
    * shuffle.
    */
  def demuxVideo(media: Dataset[MediaRecord], stride: Int = 2):
      Dataset[VideoFrame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      javax.imageio.ImageIO.setUseCache(false)
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(m.data))
      val magic = in.readInt()
      if (magic != GvidMagic)
        throw new IllegalArgumentException(
          s"media_id=${m.media_id}: not a GVID container " +
            f"(magic 0x$magic%08x)")
      val w = in.readInt()
      val h = in.readInt()
      val nFrames = in.readInt()
      (0 until nFrames).iterator.flatMap { f =>
        val len = in.readInt()
        if (f % stride != 0) { in.skipBytes(len); Iterator.empty }
        else {
          val png = new Array[Byte](len)
          in.readFully(png)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          if (img == null)
            throw new IllegalArgumentException(
              s"media_id=${m.media_id} frame=$f: undecodable frame bytes")
          val raster = img.getRaster
          val pixels = new Array[Byte](w * h)
          var i = 0
          while (i < w * h) {
            pixels(i) = raster.getSample(i % w, i / w, 0).toByte
            i += 1
          }
          Iterator.single(VideoFrame(m.media_id, f, nFrames, w, h, pixels))
        }
      }
    }
  }

  /** Gate query: documents → real GVID encode → real demux (stride-2
    * frame sample, sampled frames PNG-decoded) → exact integer features
    * over the sampled frames. The oracle recomputes every sampled pixel
    * from the generating formula, so a broken demux, a wrong sampling
    * phase, or a broken per-frame decode all flip the hash. Per-video
    * aggregation is a hash agg on `media_id` — frames of one clip need
    * no co-location.
    */
  def videoFeatureTable(docs: DataFrame, stride: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val frames = demuxVideo(videoMediaFromDocs(docs), stride)
    // per-frame partial: (media_id, width, height, n_frames, 1 sampled,
    // pixel sum, 16-bucket histogram) — merged by a hash agg on media_id
    // (map-side combine; frames of one clip need no co-location)
    frames.map { fr =>
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < fr.pixels.length) {
        val b = fr.pixels(i) & 0xff
        hist(b / 16) += 1
        sum += b
        i += 1
      }
      (fr.media_id, fr.width.toLong, fr.height.toLong, fr.n_frames.toLong,
        1L, sum, hist)
    }
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < 16) { hist(i) = a._7(i) + b._7(i); i += 1 }
        (a._1, a._2, a._3, a._4, a._5 + b._5, a._6 + b._6, hist)
      }
      .map { case (_, v) =>
        VideoFeatures(v._1, v._2, v._3, v._4, v._5, v._6, v._7.mkString("|"))
      }
      .toDF()
      .orderBy("media_id")
  }
}
