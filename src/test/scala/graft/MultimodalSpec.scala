package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Encode a w x h image whose pixel (x, y) has per-channel values from
    * `px`, in the named ImageIO format; returns the container bytes. */
  private def encode(w: Int, h: Int, fmt: String)
                    (px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val baos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
    baos.toByteArray
  }

  test("decodeImage: PNG gradient round-trips to exact pixel sums") {
    // non-solid image so a real decode (not metadata sniffing) is required
    val (w, h) = (7, 5)
    def px(x: Int, y: Int) = ((x * 17 + y * 29) % 256, (x * 3) % 256, (y * 11) % 256)
    var (er, eg, eb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      er += r; eg += g; eb += b
    }
    val df = Seq((1L, encode(w, h, "png")(px))).toDF("doc_id", "payload")
    val row = Multimodal.decodeImage(df).collect().head
    assert(row.getLong(1) == w && row.getLong(2) == h)
    assert(row.getLong(3) == w.toLong * h)
    assert((row.getLong(4), row.getLong(5), row.getLong(6)) == ((er, eg, eb)))
  }

  test("decodeImage: BMP and GIF decode through the same path") {
    def solid(x: Int, y: Int) = (200, 100, 50)
    val df = Seq(
      (1L, encode(4, 3, "bmp")(solid)),
      (2L, encode(2, 6, "gif")(solid))).toDF("doc_id", "payload")
    val rows = Multimodal.decodeImage(df).orderBy("doc_id").collect()
    assert(rows(0).getLong(1) == 4 && rows(0).getLong(2) == 3)
    assert(rows(0).getLong(4) == 200L * 12)
    assert(rows(1).getLong(1) == 2 && rows(1).getLong(2) == 6)
    assert(rows(1).getLong(6) == 50L * 12)
  }

  test("decodeImage: corrupt, non-image, and null payloads yield null stats") {
    val png = encode(3, 3, "png")((_, _) => (1, 2, 3))
    val df = Seq(
      (1L, png.take(12)),                     // truncated header
      (2L, "not an image".getBytes("UTF-8")), // wrong format entirely
      (3L, null: Array[Byte]),                // missing payload
      (4L, png)                               // control: still decodes
    ).toDF("doc_id", "payload")
    val rows = Multimodal.decodeImage(df).orderBy("doc_id").collect()
    for (i <- 0 until 3; c <- 1 to 6) assert(rows(i).isNullAt(c), s"row $i col $c")
    assert(rows(3).getLong(3) == 9 && rows(3).getLong(4) == 9)
  }

  test("decodeAudio: WAV PCM16 round-trips to exact sample statistics") {
    // hand-built stereo WAV with known samples, decoded through the real
    // javax.sound codec; sum_abs recomputed independently here
    val (channels, nFrames) = (2, 40)
    def sample(t: Int, c: Int): Int = (t * 131 + c * 17) % 32768 - 16384
    val pcm = new Array[Byte](nFrames * channels * 2)
    var expected = 0L
    for (t <- 0 until nFrames; c <- 0 until channels) {
      val v = sample(t, c)
      expected += math.abs(v.toLong)
      val off = (t * channels + c) * 2
      pcm(off) = (v & 0xFF).toByte
      pcm(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, channels, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val row = Multimodal.decodeAudio(
      Seq((7L, baos.toByteArray)).toDF("doc_id", "payload")).collect().head
    assert(row.getLong(1) == 16000L && row.getLong(2) == 2L)
    assert(row.getLong(3) == 16L && row.getLong(4) == nFrames.toLong)
    assert(row.getLong(5) == expected)
  }

  test("decodeAudio: corrupt, non-audio, and null payloads yield null stats") {
    val good = Multimodal.syntheticWavPayloads(Seq(3L).toDF("doc_id"))
      .collect().head.getAs[Array[Byte]]("payload")
    val df = Seq(
      (1L, good.take(16)),
      (2L, "not audio at all".getBytes("UTF-8")),
      (3L, null: Array[Byte]),
      (4L, good)).toDF("doc_id", "payload")
    val rows = Multimodal.decodeAudio(df).orderBy("doc_id").collect()
    for (i <- 0 until 3; c <- 1 to 5) assert(rows(i).isNullAt(c), s"row $i col $c")
    assert(rows(3).getLong(2) == 2L && rows(3).getLong(4) == 53L) // id 3: 2ch, 53 frames
  }

  test("decodeFrames: animated GIF yields one exact row per frame") {
    val ids = Seq(1L, 6L, 10L, 23L) // 10 -> corrupt
    val rows = Multimodal.decodeFrames(
        Multimodal.syntheticGifPayloads(ids.toDF("doc_id")))
      .orderBy("doc_id", "frame_idx").collect()
    val byId = rows.groupBy(_.getLong(0))
    for (id <- ids) {
      if (id % 10 == 0) {
        assert(byId(id).length == 1 && byId(id).head.isNullAt(1))
      } else {
        val (nf, w, h) = (2 + id % 4, 4 + id % 5, 3 + id % 3)
        assert(byId(id).length == nf, s"id $id frame count")
        byId(id).zipWithIndex.foreach { case (r, f) =>
          assert(r.getLong(1) == f && r.getLong(2) == w && r.getLong(3) == h)
          assert(r.getLong(5) == w * h * ((id * 37 + f * 11) % 256), s"id $id f $f red")
          assert(r.getLong(6) == w * h * ((id * 59 + f * 23) % 256), s"id $id f $f green")
          assert(r.getLong(7) == w * h * ((id * 83 + f * 41) % 256), s"id $id f $f blue")
        }
      }
    }
  }

  test("sniffMime routes mixed PNG/WAV/opaque payloads to the right decoder") {
    val png = Multimodal.syntheticImagePayloads(Seq(2L).toDF("doc_id"))
    val wav = Multimodal.syntheticWavPayloads(Seq(3L).toDF("doc_id"))
    val junk = Seq((4L, "neither".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val sniffed = png.union(wav).union(junk)
      .withColumn("mime", Multimodal.sniffMime(col("payload")))
    val mimes = sniffed.orderBy("doc_id").select("mime").as[String].collect()
    assert(mimes.toSeq == Seq("image/png", "application/x-riff",
      "application/octet-stream"))
    // truncated payloads keep their magic prefix: triage still classifies
    // them, the decoder is what nulls them out
    val corrupt = Multimodal.syntheticImagePayloads(Seq(10L).toDF("doc_id"))
      .union(Multimodal.syntheticWavPayloads(Seq(20L).toDF("doc_id")))
      .withColumn("mime", Multimodal.sniffMime(col("payload")))
    assert(corrupt.orderBy("doc_id").select("mime").as[String].collect().toSeq
      == Seq("image/png", "application/x-riff"))
    val imgRow = Multimodal.decodeImage(
      sniffed.filter(col("mime") === "image/png")).collect().head
    assert(imgRow.getLong(1) == 3 && imgRow.getLong(2) == 1) // id 2: w=3 h=1
    val audRow = Multimodal.decodeAudio(
      sniffed.filter(col("mime") === "application/x-riff")).collect().head
    assert(audRow.getLong(2) == 2L && audRow.getLong(4) == 53L)
  }

  test("syntheticImagePayloads: geometry/color arithmetic matches the decode") {
    val ids = Seq(1L, 7L, 13L, 20L, 39L) // 20 -> corrupt (id % 10 == 0)
    val decoded = Multimodal.decodeImage(
        Multimodal.syntheticImagePayloads(ids.toDF("doc_id")))
      .orderBy("doc_id").collect()
    ids.sorted.zip(decoded).foreach { case (id, row) =>
      if (id % 10 == 0) assert(row.isNullAt(1) && row.isNullAt(4))
      else {
        val (w, h) = (1 + id % 8, 1 + (id / 8) % 5)
        assert(row.getLong(1) == w && row.getLong(2) == h)
        assert(row.getLong(4) == w * h * ((id * 37) % 256))
        assert(row.getLong(5) == w * h * ((id * 59) % 256))
        assert(row.getLong(6) == w * h * ((id * 83) % 256))
      }
    }
  }

  test("imageAHash: identity, brightness invariance, near-dup Hamming") {
    val (w, h) = (16, 12)
    def grad(x: Int, y: Int) = (x * 13 + y * 31) % 200 // < 200: +10 can't wrap
    def gray(v: Int) = (v, v, v)
    val base = encode(w, h, "png")((x, y) => gray(grad(x, y)))
    val brighter = encode(w, h, "png")((x, y) => gray(grad(x, y) + 10))
    // one corner block's pixels nudged: most grid bits must survive
    val nudged = encode(w, h, "png")((x, y) =>
      gray(if (x < 2 && y < 2) math.min(255, grad(x, y) + 120) else grad(x, y)))
    val other = encode(w, h, "png")((x, y) => gray((x * 97 + y * 53) % 256))
    val df = Seq((1L, base), (2L, base), (3L, brighter), (4L, nudged),
      (5L, other), (6L, base.take(12)),
      (7L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    val out = Multimodal.imageAHash(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    def hash(id: Long) = (out(id).getLong(3), out(id).getLong(4))
    def hamming(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(hash(1L) == hash(2L))                  // identical bytes: equal
    // aHash is exactly invariant to a uniform brightness shift: adding c
    // to every pixel adds c*nb to each block sum and c*nt to the total,
    // which cancels in the cross-multiplied bit test
    assert(hash(1L) == hash(3L))
    val dNear = hamming(hash(1L), hash(4L))
    val dFar = hamming(hash(1L), hash(5L))
    assert(dNear <= 8, s"near-dup moved $dNear bits")
    assert(dFar > dNear, s"unrelated image ($dFar) not farther than near-dup ($dNear)")
    assert(out(6L).isNullAt(1) && out(6L).isNullAt(3)) // corrupt: null row
    assert(out(7L).isNullAt(3))                        // null payload
    // hashes are non-degenerate (gradient sets and clears bits)
    assert(hash(1L) != ((0L, 0L)))
  }

  test("imageResize: block means, small-image grid clamp, corrupt null row") {
    // uniform image: every target pixel IS the color; 3x2 source under an
    // 8x8 grid clamps to its own size; truncated payload -> one null row
    val uni = encode(16, 16, "png")((_, _) => (0, 77, 0))
    val tiny = encode(3, 2, "png")((x, y) => (0, x * 10 + y * 40, 0))
    val df = Seq((1L, uni), (2L, tiny), (3L, uni.take(12)))
      .toDF("doc_id", "payload")
    val out = Multimodal.imageResize(df).collect()
    val u = out.filter(_.getLong(0) == 1L)
    assert(u.length == 64 && u.forall(_.getLong(5) == 77L))
    val t = out.filter(_.getLong(0) == 2L)
    assert(t.length == 6 && t.forall(r => r.getLong(1) == 3L && r.getLong(2) == 2L))
    // 1:1 blocks: value is the exact source pixel
    assert(t.map(r => ((r.getLong(3), r.getLong(4)), r.getLong(5))).toMap ==
      (for (x <- 0 until 3; y <- 0 until 2) yield ((x.toLong, y.toLong), (x * 10 + y * 40).toLong)).toMap)
    val c = out.filter(_.getLong(0) == 3L)
    assert(c.length == 1 && c.head.isNullAt(1) && c.head.isNullAt(5))
  }

  test("audioEnergySegments: merges consecutive loud windows, exact energies") {
    // mono PCM16, 25-frame windows; amplitude per window:
    // [quiet, LOUD, LOUD, quiet, LOUD] -> segments (1,2) and (4,1)
    def wav(amps: Seq[Int]): Array[Byte] = {
      val nFrames = amps.length * 25
      val pcm = new Array[Byte](nFrames * 2)
      for (t <- 0 until nFrames) {
        val amp = amps(t / 25)
        val v = ((t * 7) % (2 * amp)) - amp
        pcm(t * 2) = (v & 0xFF).toByte
        pcm(t * 2 + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val baos = new ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val bursty = wav(Seq(64, 16384, 16384, 64, 16384))
    // truly constant samples: every window's energy EQUALS the track mean,
    // and the strictly-greater test marks none active
    val flat = {
      val nFrames = 100
      val pcm = new Array[Byte](nFrames * 2)
      for (t <- 0 until nFrames) {
        pcm(t * 2) = (512 & 0xFF).toByte
        pcm(t * 2 + 1) = ((512 >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val baos = new ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val df = Seq((1L, bursty), (2L, flat), (3L, bursty.take(16)))
      .toDF("doc_id", "payload")
    val out = Multimodal.audioEnergySegments(df, winFrames = 25, factor = 1)
      .collect()
    val segs = out.filter(r => r.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(segs.map(t => (t._2, t._3)).toSeq == Seq((1L, 2L), (4L, 1L)),
      s"got ${segs.toSeq}")
    // exact energy: segment 1's sum_abs is the two loud windows' |s| sums
    val expected = (25 until 75).map(t => math.abs(((t * 7) % 32768) - 16384).toLong).sum
    assert(out.find(r => r.getLong(0) == 1L && r.getLong(1) == 1L)
      .get.getLong(4) == expected)
    assert(!out.exists(_.getLong(0) == 2L))            // silence: no rows
    val corrupt = out.filter(_.getLong(0) == 3L)
    assert(corrupt.length == 1 && corrupt.head.isNullAt(1)) // triage row
  }
}
