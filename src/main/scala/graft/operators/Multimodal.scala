package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * content is carried as opaque `binary` payload columns with a typed
  * metadata struct, flowing through the same partition/shuffle machinery as
  * every other column.
  *
  * Image and audio DECODE are REAL, using the JDK's own codecs: images
  * through `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF — decode, resize,
  * aHash below) and audio through `javax.sound.sampled.AudioSystem`
  * (WAV/AU PCM — sample extraction, energy/VAD), both inside batched
  * `mapPartitions` so one task amortizes codec setup across its rows.
  * The documented boundary is INTER-FRAME VIDEO: no bare-JVM codec
  * exists, so video flows as opaque bytes with deterministic byte-range
  * frame sampling ([[frameSample]]) standing in for codec-true frame
  * extraction — swapping in a JNI/ffmpeg decode keeps the plan shape
  * identical.
  */
object Multimodal {

  /** ImageIO's stream plumbing defaults to a DISK-backed cache: every
    * `ImageIO.read(InputStream)` / `write(..., OutputStream)` call wraps the
    * stream in a `FileCache{Input,Output}Stream`, i.e. creates, writes and
    * deletes ONE TEMP FILE PER IMAGE. On the codec hot path (one tiny PNG
    * per document × 32 concurrent tasks) the temp-file churn dominates the
    * actual decode and degrades as the tmp filesystem ages — measured this
    * round at 3.3→8.2 s across three same-session m_image_resize runs.
    * Payloads here are in-memory byte arrays, so the memory cache is
    * strictly better. Called at the head of every ImageIO-using task
    * closure (idempotent static flag, nanosecond cost) so executors are
    * covered in cluster mode too, where the object initializer of the
    * driver never runs. */
  private[operators] def imageIoNoDiskCache(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

  /** Typed payload metadata carried next to every binary column. */
  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("digest", StringType)))

  /** Attach a payload column built from raw bytes: (payload: binary,
    * payload_meta: struct). For tests the "media" is the utf-8 text itself.
    */
  def attachPayload(df: DataFrame, bytesCol: Column, mime: String): DataFrame =
    df.withColumn("payload", bytesCol)
      .withColumn("payload_meta", struct(
        lit(mime).as("mime"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"),
        md5(col("payload")).as("digest")))

  /** Deterministic frame sampling: split the payload into `n` byte ranges
    * ("frames") and digest each — the plumbing shape of video frame
    * extraction (frame idx + per-frame feature), minus the codec. */
  def frameSample(df: DataFrame, n: Int, idCol: String = "doc_id"): DataFrame = {
    val len = octet_length(col("payload"))
    val frames = (0 until n).map { i =>
      val start = (floor(len * i / n) + 1).cast(IntegerType)
      val flen = (floor(len * (i + 1) / n) - floor(len * i / n)).cast(IntegerType)
      struct(lit(i).as("frame_idx"),
        md5(col("payload").substr(start, flen)).as("frame_digest"),
        flen.cast(LongType).as("frame_bytes"))
    }
    df.select(col(idCol), explode(array(frames: _*)).as("f"))
      .select(col(idCol), col("f.frame_idx"), col("f.frame_digest"),
        col("f.frame_bytes"))
  }

  /** STUB — media decode. A real implementation would decode the payload
    * (image pixels / audio samples) per partition in batches; here it emits
    * a deterministic fake feature vector derived from the payload digest so
    * the downstream schema and partition behavior are exercised end-to-end.
    *
    * Runs via mapPartitions-style batching on the JVM: the expression below
    * is whole-stage-codegen'd per row; a native decoder would swap in a
    * `mapPartitions` over Arrow batches with the same output schema.
    */
  def decodeStub(df: DataFrame, featureDims: Int = 8,
                 idCol: String = "doc_id"): DataFrame = {
    import graft.functions.TextFunctions.hash60
    // fake "features": hash60 of (digest, dim) scaled to [-0.5, 0.5)
    val feats = sequence(lit(0), lit(featureDims - 1))
    df.select(col(idCol), col("payload_meta.digest").as("digest"))
      .withColumn("features", transform(feats, d =>
        (hash60(concat(col("digest"), lit(":"), d)) % 1000000L)
          .cast(DoubleType) / 1000000.0 - 0.5))
      .select(col(idCol), col("features"))
  }

  /** The BATCHED decode plumbing — the exact execution shape a real codec
    * plugs into (the JVM analog of `mapInPandas`): rows stream through
    * `mapPartitions`, grouped into fixed-size batches; a native decoder
    * would hand each whole batch to the library in one call (amortizing
    * model/codec setup) and emit one feature row per input. The per-batch
    * "decode" here is the same deterministic stub as [[decodeStub]] — the
    * two paths produce IDENTICAL output (tested), so swapping in a real
    * decoder changes only the closure body, never the plan or schema.
    */
  def decodeStubBatched(df: DataFrame, featureDims: Int = 8,
                        batchSize: Int = 64,
                        idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col("payload_meta.digest"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch-granular boundary: a real implementation decodes the
          // whole `batch` here in one library call
          batch.iterator.map { case (id, digest) =>
            val feats = Array.tabulate(featureDims)(d =>
              (graft.plans.HashUtil.hash60(s"$digest:$d") % 1000000L)
                .toDouble / 1000000.0 - 0.5)
            (id, feats)
          }
        }
      }
      .toDF(idCol, "features")
  }

  /** REAL image decode — `javax.imageio` ships with the JDK (PNG, JPEG,
    * GIF, BMP readers), so this needs no external dependency: the decode
    * step of the multimodal pipeline is a genuine codec, not a stub. Same
    * batched `mapPartitions` shape as [[decodeStubBatched]] — rows stream
    * through in partition order, each payload is decoded in-JVM, and the
    * output schema is fixed regardless of decode success.
    *
    * Emits exact-integer pixel statistics (no float summation anywhere):
    * `(idCol, width, height, n_px, sum_r, sum_g, sum_b)` — channel sums
    * over all pixels in row-major order. Undecodable payloads (truncated,
    * wrong format, null) yield a row with all-null stats: the pipeline
    * keeps the document visible for triage instead of dropping it. */
  def decodeImage(df: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        imageIoNoDiskCache()
        rows.map { case (id, bytes) =>
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null)
            (id, None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long], None: Option[Long])
          else {
            val w = img.getWidth
            val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xFF
                sg += (p >> 8) & 0xFF
                sb += p & 0xFF
                x += 1
              }
              y += 1
            }
            (id, Some(w.toLong), Some(h.toLong), Some(w.toLong * h),
              Some(sr), Some(sg), Some(sb))
          }
        }
      }
      .toDF(idCol, "width", "height", "n_px", "sum_r", "sum_g", "sum_b")
  }

  /** REAL audio decode — `javax.sound.sampled` ships with the JDK (WAV /
    * AIFF / AU container parsing + PCM frames), so like [[decodeImage]]
    * this is a genuine codec with no external dependency. Batched
    * mapPartitions shape; exact-integer output only:
    * `(idCol, sample_rate, channels, bits, n_frames, sum_abs)` where
    * `sum_abs` is the sum of |sample| over every frame and channel
    * (16-bit signed PCM). Undecodable payloads (truncated header, wrong
    * format, null, or non-16-bit encodings) yield an all-null stats row. */
  def decodeAudio(df: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val decoded =
            if (bytes == null) None
            else
              try {
                val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.ByteArrayInputStream(bytes))
                val fmt = in.getFormat
                if (fmt.getSampleSizeInBits != 16) None
                else {
                  val frameBytes = fmt.getFrameSize
                  val data = in.readAllBytes()
                  val nFrames = data.length / frameBytes
                  var sumAbs = 0L
                  var i = 0
                  val bigEndian = fmt.isBigEndian
                  while (i + 1 < data.length) {
                    val s =
                      if (bigEndian) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
                      else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
                    sumAbs += math.abs(s.toLong)
                    i += 2
                  }
                  Some((fmt.getSampleRate.toLong, fmt.getChannels.toLong,
                    fmt.getSampleSizeInBits.toLong, nFrames.toLong, sumAbs))
                }
              } catch {
                case _: javax.sound.sampled.UnsupportedAudioFileException => None
                case _: java.io.IOException => None
              }
          decoded match {
            case Some((sr, ch, bits, nf, sa)) =>
              (id, Some(sr), Some(ch), Some(bits), Some(nf), Some(sa))
            case None =>
              (id, None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF(idCol, "sample_rate", "channels", "bits", "n_frames", "sum_abs")
  }

  /** Deterministic WAV fixture payloads, one per document: real
    * `AudioSystem`-encoded 16-bit PCM whose geometry and samples derive
    * arithmetically from the id — `channels = 1 + id % 2`,
    * `n_frames = 50 + id % 100`, sample(t, c) =
    * `((id*31 + t*7 + c*13) % 65536) - 32768` — so an oracle predicts the
    * DECODED statistics without a codec. Every 10th payload is truncated
    * to its first 16 bytes (a broken RIFF header), exercising the
    * corrupt-payload null path. */
  def syntheticWavPayloads(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val channels = 1 + (id % 2).toInt
          val nFrames = 50 + (id % 100).toInt
          val pcm = new Array[Byte](nFrames * channels * 2)
          var t = 0
          while (t < nFrames) {
            var c = 0
            while (c < channels) {
              val v = (((id * 31 + t * 7 + c * 13) % 65536) - 32768).toInt
              val off = (t * channels + c) * 2
              pcm(off) = (v & 0xFF).toByte          // little-endian PCM16
              pcm(off + 1) = ((v >> 8) & 0xFF).toByte
              c += 1
            }
            t += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels,
            true, false)
          val stream = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(stream,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          val wav = baos.toByteArray
          (id, if (id % 10 == 0) wav.take(16) else wav)
        }
      }
      .toDF(idCol, "payload")
  }

  /** Deterministic frame SAMPLING over a decoded frame table (the
    * [[decodeFrames]] schema): keep every `every`-th frame by frame
    * index — the stride sampler a video pipeline runs before feature
    * extraction (no RNG: the same video always yields the same frames).
    * Corrupt rows (null frame_idx) pass through — triage stays visible. */
  def sampleFrames(frames: DataFrame, every: Int,
                   frameCol: String = "frame_idx"): DataFrame = {
    require(every >= 1, "need every >= 1")
    frames.filter(col(frameCol).isNull || col(frameCol) % every === 0)
  }

  /** Exact block-average RESIZE of a decoded image to (at most) a
    * `gridW x gridH` gray grid — the downscale step of an image feature
    * pipeline, and the standalone form of [[imageAHash]]'s first stage.
    * Output one row per target pixel: (idCol, gw, gh, bx, by, v) with
    * `v = sum(gray) DIV count` over the source block (integer floor
    * division — exact, SQL-replayable) and block membership
    * `bx = x * gw DIV w` (pure integers, the aHash convention). Images
    * smaller than the grid produce their own size (`gw = min(gridW, w)`).
    * Undecodable payloads yield ONE all-null row. */
  def imageResize(df: DataFrame, gridW: Int = 8, gridH: Int = 8,
                  idCol: String = "doc_id",
                  payloadCol: String = "payload"): DataFrame = {
    require(gridW >= 1 && gridH >= 1, "need gridW >= 1 and gridH >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        imageIoNoDiskCache()
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
        if (img == null)
          Seq((id, None: Option[Long], None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long]))
        else {
          val w = img.getWidth
          val h = img.getHeight
          val gw = math.min(gridW, w)
          val gh = math.min(gridH, h)
          val sums = Array.ofDim[Long](gh, gw)
          val cnts = Array.ofDim[Long](gh, gw)
          var y = 0
          while (y < h) {
            val by = y * gh / h
            var x = 0
            while (x < w) {
              sums(by)(x * gw / w) += (img.getRGB(x, y) >> 8) & 0xFF
              cnts(by)(x * gw / w) += 1
              x += 1
            }
            y += 1
          }
          for (by <- 0 until gh; bx <- 0 until gw) yield
            (id, Some(gw.toLong), Some(gh.toLong), Some(bx.toLong),
              Some(by.toLong), Some(sums(by)(bx) / cnts(by)(bx)))
        }
      }
      .toDF(idCol, "gw", "gh", "bx", "by", "v")
  }

  /** Gradient-PAIR PNG fixtures for the image-dedup path: consecutive ids
    * form a near-duplicate pair — the even id carries the base gradient
    * `(base*37 + x*11 + y*29) % 200` (headroom below 255 on purpose), the
    * odd id the SAME image brightened by +7. aHash is exactly invariant
    * to a uniform brightness shift, so each pair hashes identically and
    * hash-equality dedup must group them (`m_image_dups`). Geometry from
    * the PAIR id, so both members agree. Every 10th payload truncated. */
  def syntheticGradientPairPayloads(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        imageIoNoDiskCache()
        ids.map { id =>
          val base = id - id % 2
          val shift = (id % 2).toInt * 7
          val w = 4 + (base % 12).toInt
          val h = 4 + ((base / 12) % 9).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = ((base * 37 + x * 11 + y * 29) % 200).toInt + shift
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          val png = baos.toByteArray
          (id, if (id % 10 == 0) png.take(12) else png)
        }
      }
      .toDF(idCol, "payload")
  }

  /** Burst WAV fixtures for the energy-segmentation path: mono PCM16,
    * `n_frames = 200 + id % 100`, with amplitude alternating per 25-frame
    * block — quiet blocks (`(t/25) % 2 == 0`) hold samples in [-64, 64),
    * loud blocks in [-16384, 16384), each sample
    * `((id*31 + t*7) % (2*amp)) - amp`. Blocks align with the
    * segmentation windows so the oracle predicts every window's energy
    * arithmetically. Every 10th payload is truncated. */
  def syntheticBurstWavPayloads(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val nFrames = 200 + (id % 100).toInt
          val pcm = new Array[Byte](nFrames * 2)
          var t = 0
          while (t < nFrames) {
            val amp = if ((t / 25) % 2 == 0) 64L else 16384L
            val v = (((id * 31 + t * 7) % (2 * amp)) - amp).toInt
            pcm(t * 2) = (v & 0xFF).toByte
            pcm(t * 2 + 1) = ((v >> 8) & 0xFF).toByte
            t += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val stream = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(stream,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          val wav = baos.toByteArray
          (id, if (id % 10 == 0) wav.take(16) else wav)
        }
      }
      .toDF(idCol, "payload")
  }

  /** Energy-based audio SEGMENTATION over real decoded PCM — the VAD-ish
    * primitive speech pipelines run before transcription/training: frame
    * the track into `winFrames`-frame windows, mark a window ACTIVE when
    * its energy exceeds `factor` times the track's per-sample mean, and
    * merge consecutive active windows into segments.
    *
    * Engine-exact: energy is the sum of |sample| (integers), and the
    * active test cross-multiplies — `sa_win * n_track_samples > factor *
    * sa_track * n_win_samples` — so no float mean ever exists and the
    * DuckDB oracle (`m_audio_segments`) predicts every segment from the
    * fixture formula (classic gaps-and-islands merge on its side).
    *
    * Output: one row per segment (idCol, seg_idx 1-based, start_win,
    * n_wins, sum_abs). A decoded track with NO active window emits no
    * rows (silence); an UNDECODABLE payload emits one all-null row
    * (triage-visible, the [[decodeFrames]] convention). */
  def audioEnergySegments(df: DataFrame, winFrames: Int = 25,
                          factor: Long = 1, idCol: String = "doc_id",
                          payloadCol: String = "payload"): DataFrame = {
    require(winFrames >= 1 && factor >= 1, "need winFrames >= 1 and factor >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val decoded: Option[(Array[Long], Array[Long])] =
          if (bytes == null) None
          else
            try {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val fmt = in.getFormat
              if (fmt.getSampleSizeInBits != 16) None
              else {
                val channels = fmt.getChannels
                val data = in.readAllBytes()
                val nFrames = data.length / fmt.getFrameSize
                val nWins = (nFrames + winFrames - 1) / winFrames
                val sa = new Array[Long](math.max(nWins, 1))
                val ns = new Array[Long](math.max(nWins, 1))
                val bigEndian = fmt.isBigEndian
                var i = 0
                while (i + 1 < data.length) {
                  val s =
                    if (bigEndian) ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
                    else ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
                  val t = (i / 2) / channels
                  sa(t / winFrames) += math.abs(s.toLong)
                  ns(t / winFrames) += 1
                  i += 2
                }
                Some((sa, ns))
              }
            } catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException => None
              case _: java.io.IOException => None
            }
        decoded match {
          case None =>
            Seq((id, None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long]))
          case Some((sa, ns)) =>
            val tsa = sa.sum
            val tns = ns.sum
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
            var segStart = -1
            var segSum = 0L
            var w = 0
            while (w < sa.length) {
              val active = ns(w) > 0 && sa(w) * tns > factor * tsa * ns(w)
              if (active) {
                if (segStart < 0) { segStart = w; segSum = 0L }
                segSum += sa(w)
              } else if (segStart >= 0) {
                out += ((id, Some((out.length + 1).toLong), Some(segStart.toLong),
                  Some((w - segStart).toLong), Some(segSum)))
                segStart = -1
              }
              w += 1
            }
            if (segStart >= 0)
              out += ((id, Some((out.length + 1).toLong), Some(segStart.toLong),
                Some((sa.length - segStart).toLong), Some(segSum)))
            out.toSeq
        }
      }
      .toDF(idCol, "seg_idx", "start_win", "n_wins", "sum_abs")
  }

  /** REAL multi-frame decode — frame extraction from an animated-GIF
    * container via `javax.imageio`'s GIF reader (the JDK's only
    * multi-frame codec; inter-frame video codecs like H.264 don't ship
    * with the JVM and stay out of scope). One output row PER FRAME with
    * exact-integer pixel statistics:
    * `(idCol, frame_idx, width, height, n_px, sum_r, sum_g, sum_b)`.
    * Undecodable payloads yield ONE all-null frame row (frame_idx null),
    * keeping the document visible for triage. Batched mapPartitions shape
    * like [[decodeImage]]/[[decodeAudio]]. */
  def decodeFrames(df: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nullRow = (id, None: Option[Long], None: Option[Long],
          None: Option[Long], None: Option[Long], None: Option[Long],
          None: Option[Long], None: Option[Long])
        if (bytes == null) Seq(nullRow)
        else {
          val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
          if (!readers.hasNext) Seq(nullRow)
          else {
            val reader = readers.next()
            try {
              reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(bytes)), false, true)
              val n = reader.getNumImages(true)
              if (n <= 0) Seq(nullRow)
              else (0 until n).map { f =>
                val img = reader.read(f)
                val w = img.getWidth
                val h = img.getHeight
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val p = img.getRGB(x, y)
                    sr += (p >> 16) & 0xFF
                    sg += (p >> 8) & 0xFF
                    sb += p & 0xFF
                    x += 1
                  }
                  y += 1
                }
                (id, Some(f.toLong), Some(w.toLong), Some(h.toLong),
                  Some(w.toLong * h), Some(sr), Some(sg), Some(sb))
              }
            } catch {
              case _: java.io.IOException => Seq(nullRow)
              case _: IndexOutOfBoundsException => Seq(nullRow)
            } finally reader.dispose()
          }
        }
      }
      .toDF(idCol, "frame_idx", "width", "height", "n_px",
        "sum_r", "sum_g", "sum_b")
  }

  /** Deterministic animated-GIF fixture payloads, one per document: a real
    * `ImageIO`-encoded GIF sequence whose frame count, geometry, and
    * per-frame solid colors derive arithmetically from the id —
    * `n_frames = 2 + id % 4`, `w = 4 + id % 5`, `h = 3 + id % 3`, frame f
    * color `rgb = (37 id + 11 f, 59 id + 23 f, 83 id + 41 f) % 256`.
    * Solid-color frames survive GIF's 256-color palette exactly, so an
    * oracle predicts the DECODED per-frame statistics without a codec.
    * Every 10th payload is truncated to 8 bytes (a broken GIF header). */
  def syntheticGifPayloads(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val nFrames = 2 + (id % 4).toInt
          val w = 4 + (id % 5).toInt
          val h = 3 + (id % 3).toInt
          val baos = new java.io.ByteArrayOutputStream()
          val out = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          writer.setOutput(out)
          writer.prepareWriteSequence(null)
          for (f <- 0 until nFrames) {
            val rgb = (((id * 37 + f * 11) % 256).toInt << 16) |
              (((id * 59 + f * 23) % 256).toInt << 8) |
              ((id * 83 + f * 41) % 256).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
          }
          writer.endWriteSequence()
          writer.dispose()
          out.close()
          val gif = baos.toByteArray
          (id, if (id % 10 == 0) gif.take(8) else gif)
        }
      }
      .toDF(idCol, "payload")
  }

  /** Deterministic PNG fixture payloads, one per document: a real
    * `ImageIO`-encoded solid-color PNG whose geometry and color derive
    * arithmetically from the id — `w = 1 + id % 8`, `h = 1 + (id/8) % 5`,
    * `rgb = (37 id, 59 id, 83 id) % 256` — so an oracle can predict the
    * DECODED statistics without running a codec. Every 10th payload is
    * truncated to its first 12 bytes (a broken PNG header), exercising the
    * corrupt-payload null path end-to-end. */
  def syntheticImagePayloads(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        imageIoNoDiskCache()
        ids.map { id =>
          val w = 1 + (id % 8).toInt
          val h = 1 + ((id / 8) % 5).toInt
          val rgb = (((id * 37) % 256).toInt << 16) |
            (((id * 59) % 256).toInt << 8) | ((id * 83) % 256).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          val png = baos.toByteArray
          (id, if (id % 10 == 0) png.take(12) else png)
        }
      }
      .toDF(idCol, "payload")
  }

  /** Gradient PNG fixtures for the perceptual-hash path: pixel (x, y) of
    * doc `id` is the GRAY value `(id * 37 + x * 11 + y * 29) % 256` (all
    * three channels equal), sized `w = 4 + id % 12`, `h = 4 + (id / 12)
    * % 9`. Non-uniform by construction — a flat image hashes to all-zero
    * bits and proves nothing. PNG is lossless, so the decoded pixels ARE
    * the formula and the oracle can predict every block sum
    * arithmetically. Every 10th payload is truncated (undecodable). */
  def syntheticGradientPayloads(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType)).as[Long]
      .mapPartitions { ids =>
        imageIoNoDiskCache()
        ids.map { id =>
          val w = 4 + (id % 12).toInt
          val h = 4 + ((id / 12) % 9).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = ((id * 37 + x * 11 + y * 29) % 256).toInt
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          val png = baos.toByteArray
          (id, if (id % 10 == 0) png.take(12) else png)
        }
      }
      .toDF(idCol, "payload")
  }

  /** Perceptual AVERAGE HASH (aHash) over REAL decoded pixels — the
    * image-dedup fingerprint (resize-to-grid, bit = block brighter than
    * the image mean): near-identical images (recompress, small crop,
    * brightness-preserving noise) land within a few bits, so image
    * near-dup detection becomes the SAME banded-Hamming machinery the
    * text path uses (SRP sign bits, [[Dedup.simhash]]).
    *
    * Engine-exact: gray = green channel (fixtures are gray anyway; a
    * luminance formula would drag in rounding), the grid cell of pixel x
    * is `x * gw DIV w` (pure integers), and the bit test cross-multiplies
    * — `sum_block * n_total > sum_total * n_block` — instead of comparing
    * float means. The 64 bits pack into TWO 32-bit words (`ahash_hi` =
    * grid rows 0..gh/2-1, `ahash_lo` = the rest): DuckDB's BIGINT `<<`
    * refuses to shift into the sign bit, so a single 64-bit word could
    * not be oracle-replayed (the same reason the SRP path packs 60 bits).
    * Images smaller than the grid use gw = min(grid, w) cells per row —
    * positions stay dense, nothing is padded.
    *
    * Undecodable payloads yield null hash fields (triage-visible, like
    * [[decodeImage]]). Output: (idCol, gw, gh, ahash_hi, ahash_lo). */
  def imageAHash(df: DataFrame, grid: Int = 8, idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame = {
    require(grid >= 1 && grid % 2 == 0 && grid <= 8,
      "grid must be even and in [2, 8] (two 32-bit words)")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        imageIoNoDiskCache()
        rows.map { case (id, bytes) =>
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null)
            (id, None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long])
          else {
            val w = img.getWidth
            val h = img.getHeight
            val gw = math.min(grid, w)
            val gh = math.min(grid, h)
            val sums = Array.ofDim[Long](gh, gw)
            val cnts = Array.ofDim[Long](gh, gw)
            var total = 0L
            var y = 0
            while (y < h) {
              val by = y * gh / h
              var x = 0
              while (x < w) {
                val g = (img.getRGB(x, y) >> 8) & 0xFF
                sums(by)(x * gw / w) += g
                cnts(by)(x * gw / w) += 1
                total += g
                x += 1
              }
              y += 1
            }
            val nTotal = w.toLong * h
            var hi = 0L
            var lo = 0L
            var by = 0
            while (by < gh) {
              var bx = 0
              while (bx < gw) {
                if (sums(by)(bx) * nTotal > total * cnts(by)(bx)) {
                  if (by < gh / 2) hi |= 1L << (by * gw + bx)
                  else lo |= 1L << ((by - gh / 2) * gw + bx)
                }
                bx += 1
              }
              by += 1
            }
            (id, Some(gw.toLong), Some(gh.toLong), Some(hi), Some(lo))
          }
        }
      }
      .toDF(idCol, "gw", "gh", "ahash_hi", "ahash_lo")
  }

  /** Container-format magic numbers: (mime, uppercase hex prefix). Order is
    * match priority — longer/more specific prefixes first (PNG's 8-byte
    * signature before the 2-byte gzip one). Public so callers (and the SQL
    * oracle) can build payloads against the same table. */
  val MagicNumbers: Seq[(String, String)] = Seq(
    "image/png" -> "89504E470D0A1A0A",
    "image/gif" -> "47494638",
    "image/jpeg" -> "FFD8FF",
    "application/pdf" -> "25504446",
    "application/zip" -> "504B0304",
    // RIFF container (WAV/AVI/WebP share it; disambiguating needs bytes
    // 9-12, beyond the 8-byte sniff prefix — container-level is the
    // honest claim)
    "application/x-riff" -> "52494646",
    "application/gzip" -> "1F8B")

  /** MIME sniffing by magic bytes — the triage step a mixed-media crawl
    * needs BEFORE any decode is dispatched (the declared content-type of
    * crawled data lies; the first bytes don't). Pure column expression over
    * the binary payload: one `hex` of the first 8 bytes per row, compared
    * against the magic table — whole-stage-codegen'd, no UDF, no shuffle.
    * Unmatched payloads fall through to `application/octet-stream`. */
  def sniffMime(bytes: Column): Column = {
    val prefix = hex(substring(bytes, 1, 8)) // uppercase, like DuckDB's
    MagicNumbers.foldRight(lit("application/octet-stream"): Column) {
      case ((mime, magic), acc) =>
        when(substring(prefix, 1, magic.length) === magic, lit(mime))
          .otherwise(acc)
    }
  }
}
