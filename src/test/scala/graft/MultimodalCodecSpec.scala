package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.StubDecoder

/** Round-11 verdict #4: a REAL codec (the JDK's javax.imageio PNG
  * decoder) behind the StubDecoder interface, proven through the same
  * columnar path the stub oracles gate — real encoded bytes in, real
  * pixels out, batch shape unchanged. q55/q60/q79's deterministic stub
  * oracles stay untouched; this suite pins the production swap.
  */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  /** A 4x2 RGB PNG with known pixel values, encoded in-memory. */
  private def encodePng(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels.head.length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixels(y)(x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    baos.toByteArray
  }

  private def luma(r: Int, g: Int, b: Int): Int =
    (r * 299 + g * 587 + b * 114) / 1000

  private val pixels: Array[Array[(Int, Int, Int)]] = Array(
    Array((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)),
    Array((0, 0, 0), (128, 128, 128), (10, 200, 30), (250, 40, 90)))
  private val expectedLuma: Array[Byte] =
    pixels.flatten.map { case (r, g, b) => luma(r, g, b).toByte }

  test("real PNG bytes decode through the columnar batch path") {
    val png = encodePng(pixels)
    val wav = "RIFF1234WAVEfmt fake-audio-payload".getBytes("UTF-8")
    val media = Multimodal.ingest(
      Seq((1L, png), (2L, wav)).toDF("id", "bytes"), "id", "bytes")
    // magic-byte sniffing sees REAL magic now, not fixture constants
    val types = media.select(col("media_id"), col("meta.media_type"))
      .as[(Long, String)].collect().toMap
    assert(types == Map(1L -> "png", 2L -> "wav"))
    val feats = Multimodal.decodeImageFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    val p = feats(1L)
    assert(p.width == 4 && p.height == 2, "decoded dimensions wrong")
    assert(p.luma_checksum == StubDecoder.checksum(expectedLuma),
      "decoded luma plane differs from the BT.601 reference")
    assert(math.abs(p.brightness -
      expectedLuma.map(b => (b & 0xff).toDouble).sum / 8 / 256.0) < 1e-12)
    // the non-image row passes through on byte-level features
    val a = feats(2L)
    assert(a.media_type == "wav" && a.width == -1)
    assert(a.luma_checksum == StubDecoder.checksum(wav))
  }

  test("decode -> box downsample: real pixels through the real thumbnail") {
    val png = encodePng(pixels)
    val media = Multimodal.ingest(
      Seq((7L, png)).toDF("id", "bytes"), "id", "bytes")
    val row = Multimodal.decodeAndDownsample(media, target = 4).head()
    // 8 luma pixels -> 4 cells of 2: each cell the floor-mean of its pair
    val cells = expectedLuma.grouped(2)
      .map(p => ((p(0) & 0xff) + (p(1) & 0xff)) / 2)
      .map(_.toByte).toArray
    assert(row.getAs[Long]("ds_len") == 4L)
    assert(row.getAs[Long]("ds_checksum") == StubDecoder.checksum(cells),
      "box-downsampled real pixels differ from the hand-computed cells")
    assert(row.getAs[Int]("width") == 4 && row.getAs[Int]("height") == 2)
  }

  /** A 16-bit mono PCM WAV with known samples, encoded in-memory by the
    * JDK's own writer — the audio twin of [[encodePng]].
    */
  private def encodeWav(samples: Array[Short], rate: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("real WAV bytes decode through the columnar batch path") {
    // a waveform with hand-checkable features: peak 3000, three sign flips
    val samples = Array[Short](0, 1000, -2000, 3000, -50, 0, 7, -7)
    val wav = encodeWav(samples, rate = 8000)
    val png = encodePng(pixels)
    val media = Multimodal.ingest(
      Seq((1L, wav), (2L, png)).toDF("id", "bytes"), "id", "bytes")
    // the WRITER's magic is what the sniffer sees — real RIFF header
    val types = media.select(col("media_id"), col("meta.media_type"))
      .as[(Long, String)].collect().toMap
    assert(types == Map(1L -> "wav", 2L -> "png"))
    val feats = Multimodal.decodeAudioFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    val a = feats(1L)
    assert(a.sample_rate == 8000 && a.channels == 1)
    assert(a.n_samples == samples.length.toLong, "sample count wrong")
    assert(a.peak_abs == 3000, s"peak: ${a.peak_abs}")
    assert(a.sum_abs == samples.map(s => math.abs(s.toInt)).sum.toLong)
    // sign convention: 0 is non-negative; flips at 1000->-2000,
    // -2000->3000, 3000->-50, -50->0, 7->-7
    assert(a.zero_crossings == 5L, s"zero crossings: ${a.zero_crossings}")
    // the non-audio row passes through with -1 dimensions
    val p = feats(2L)
    assert(p.media_type == "png" && p.sample_rate == -1 && p.channels == -1)
  }

  /** In-memory JPEG encode via the JDK's own writer — the lossy sibling
    * of [[encodePng]]. */
  private def encodeJpeg(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels.head.length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixels(y)(x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    baos.toByteArray
  }

  test("real JPEG bytes decode through the columnar batch path " +
      "(r12 verdict #2)") {
    // an 8x8 smooth gradient: JPEG's DCT quantization stays mild on
    // smooth content, so decoded brightness lands near the source's —
    // dimensions pin exactly, pixel statistics pin to a tolerance
    // (lossy codec: bit-exactness is not a sane contract)
    val grad: Array[Array[(Int, Int, Int)]] = Array.tabulate(8, 8) {
      (y, x) => { val v = 16 * (y + x); (v, v, v) }
    }
    val jpeg = encodeJpeg(grad)
    val png = encodePng(pixels)
    val media = Multimodal.ingest(
      Seq((1L, jpeg), (2L, png)).toDF("id", "bytes"), "id", "bytes")
    // the real JFIF magic routes the row into the decode branch
    val types = media.select(col("media_id"), col("meta.media_type"))
      .as[(Long, String)].collect().toMap
    assert(types == Map(1L -> "jpeg", 2L -> "png"))
    val feats = Multimodal.decodeImageFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    val j = feats(1L)
    assert(j.media_type == "jpeg")
    assert(j.width == 8 && j.height == 8,
      "JPEG decoded dimensions must be exact")
    val srcBrightness = grad.flatten
      .map { case (r, g, b) => luma(r, g, b).toDouble }.sum / 64 / 256.0
    assert(math.abs(j.brightness - srcBrightness) < 0.02,
      s"JPEG brightness ${j.brightness} too far from $srcBrightness")
    // the PNG row still decodes bit-exactly alongside
    assert(feats(2L).luma_checksum == StubDecoder.checksum(expectedLuma))
    // and the thumbnail path handles a JPEG row end-to-end
    val ds = Multimodal.decodeAndDownsample(
        Multimodal.ingest(Seq((9L, jpeg)).toDF("id", "bytes"), "id",
          "bytes"), target = 4)
      .head()
    assert(ds.getAs[Int]("width") == 8 && ds.getAs[Long]("ds_len") == 4L)
  }

  test("16-bit WAV signedness: the decode contract matches the format") {
    // decodePcm's 16-bit branch reads two's complement, and its require
    // now rejects PCM_UNSIGNED at 16 bits (round-12 advice: the old
    // guard accepted the combination and silently offset every sample
    // by 32768). The combination is UNREACHABLE from real WAV bytes —
    // RIFF carries no signedness flag, so the JDK parser reports every
    // 16-bit PCM WAV as signed (pinned here); the require is defense in
    // depth for any other container the parser might hand us.
    val samples = Array[Short](100, -100, 32767, -32768)
    val bytes = encodeWav(samples, 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try assert(in.getFormat.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      "JDK WAV parser must report 16-bit PCM as signed")
    finally in.close()
    // and the signed decode is sample-exact across the full range
    val ok = Multimodal.WavDecoder.decodePcm(bytes)
    assert(ok._3.toSeq == Seq(100, -100, 32767, -32768))
  }

  test("frame extraction slices REAL encoded bytes columnar-side") {
    val png = encodePng(pixels)
    val media = Multimodal.ingest(
      Seq((3L, png)).toDF("id", "bytes"), "id", "bytes")
    val frames = Multimodal.sampleFrames(media, chunkBytes = 16, everyK = 1)
      .orderBy("frame_offset")
      .as[(Long, Long, Array[Byte])].collect()
    assert(frames.nonEmpty)
    // re-assembling the sampled frames must reproduce the prefix of the
    // real payload (columnar substr on binary, 1-based, chunk-aligned)
    val reassembled = frames.flatMap(_._3)
    assert(reassembled.take(png.length).sameElements(
      png.take(reassembled.length)))
    // and the first frame carries the true PNG magic
    assert((frames.head._3.take(4).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47)))
  }
}
