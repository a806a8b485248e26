package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.data.{ImageGen, Images}
import graft.sql.GraftSpark

class MediaOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.session("local[4]", appName = "media-spec")

  lazy val imgs = Images.generate(spark, 60).toDF().cache()

  test("derive_lon/derive_lat/caption_of expressions == ImageGen functions, no UDF in plan") {
    val got = Images.withPosition(imgs)
      .withColumn("cap2", graft.sql.functions.caption_of(org.apache.spark.sql.functions.col("image_id")))
      .select("image_id", "lon", "lat", "cap2").collect()
    got.foreach { r =>
      val id = r.getString(0)
      assert(r.getDouble(1) == ImageGen.posLonOf(id), s"lon mismatch for $id")
      assert(r.getDouble(2) == ImageGen.posLatOf(id), s"lat mismatch for $id")
      assert(r.getString(3) == ImageGen.captionOf(id))
    }
    // the headline path must stay inside WholeStageCodegen — no Scala UDF;
    // codegen'd projects print with the "*(n)" stage prefix
    val plan = Images.withTile(imgs, 30).queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    val deriveLine = plan.linesIterator.find(_.contains("derive_lon")).get
    assert(deriveLine.trim.stripPrefix("+- ").startsWith("*("),
      s"derive_lon project not codegen'd: $deriveLine")
  }

  test("decodeMeta: every generated image decodes to its declared dims") {
    val metas = MediaOps.decodeMeta(imgs).collect()
    assert(metas.length == 60)
    assert(metas.forall(_.ok), metas.filterNot(_.ok).mkString(","))
  }

  test("resize: output decodes at target dims, deterministic across runs") {
    val a = MediaOps.resize(imgs, 8, 8).collect().sortBy(_.image_id)
    val b = MediaOps.resize(imgs, 8, 8).collect().sortBy(_.image_id)
    a.zip(b).foreach { case (x, y) =>
      assert(java.util.Arrays.equals(x.bytes, y.bytes))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(x.bytes))
      assert(img.getWidth == 8 && img.getHeight == 8)
    }
  }

  test("frameSample: REAL MJPEG-AVI parse — sampled frames decode to the source images") {
    import spark.implicits._
    // synthesize 12-frame MJPEG videos from deterministic images: each
    // frame is a distinct 16x12 image JPEG-encoded by javax.imageio
    def jpeg(seed: Int): Array[Byte] = {
      val img = ImageGen.toBufferedImage(
        ImageGen.pixelsOf(f"img$seed%012d", 16, 12), 16, 12)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val vids = (0 until 5).map { v =>
      (f"vid$v%03d", graft.core.Avi.encode((0 until 12).map(k => jpeg(v * 100 + k)), 16, 12, fps = 8.0))
    }
    val frames = MediaOps.frameSample(vids.toDF("media_id", "bytes"), "media_id", "bytes", 4)
      .collect()
    assert(frames.length == 5 * 4)
    assert(frames.groupBy(_.media_id).forall(_._2.map(_.frame_idx).sorted.sameElements(0 until 4)))
    // every sampled frame is a decodable JPEG at the declared dims, and
    // frame 0 / frame 3 are the first/last source frames (even spacing)
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame))
      assert(img != null && img.getWidth == 16 && img.getHeight == 12, f.media_id)
    }
    vids.foreach { case (id, bytes) =>
      val src = graft.core.Avi.decode(bytes)
      val byIdx = frames.filter(_.media_id == id).map(f => f.frame_idx -> f.frame).toMap
      assert(java.util.Arrays.equals(byIdx(0), src.frames.head))
      assert(java.util.Arrays.equals(byIdx(3), src.frames.last))
      assert(src.fps == 8.0 && src.width == 16 && src.height == 12)
    }
    // malformed payloads (raw image bytes) become error rows, not failures
    val bad = MediaOps.frameSample(imgs.limit(3), "image_id", "bytes", 4).collect()
    assert(bad.length == 3 && bad.forall(f => f.frame_idx == -1 && f.frame.isEmpty))
  }

  test("audioFeatures: REAL WAV parse — golden sine features") {
    import spark.implicits._
    // 440 Hz sine, amplitude 0.5, 0.5 s @ 16 kHz mono, no noise
    val bytes = graft.core.Wav.synth(seed = 1L, freqHz = 440.0, amplitude = 0.5,
      noise = 0.0, seconds = 0.5)
    val f = MediaOps.audioFeatures(
      Seq(("a0", bytes)).toDF("media_id", "bytes"), "media_id", "bytes").collect().head
    assert(f.duration_s == 0.5, s"duration ${f.duration_s}")
    // sine RMS = A/sqrt(2)
    assert(math.abs(f.rms - 0.5 / math.sqrt(2.0)) < 0.005, s"rms ${f.rms}")
    // sine crosses zero 2f times per second -> zcr = 2*440/16000
    assert(math.abs(f.zcr - 2.0 * 440.0 / 16000.0) < 0.003, s"zcr ${f.zcr}")
  }

  test("audioFeatures: dual path — pipeline features == direct-sample arithmetic") {
    import spark.implicits._
    val rows = (0 until 20).map { i =>
      (f"aud$i%03d", graft.core.Wav.synth(seed = i.toLong, freqHz = 100.0 + 37.0 * i,
        amplitude = 0.1 + 0.04 * i, noise = 0.02 * (i % 5), seconds = 0.1 + 0.01 * i))
    }
    val got = MediaOps.audioFeatures(rows.toDF("media_id", "bytes"), "media_id", "bytes")
      .collect().map(a => a.media_id -> a).toMap
    rows.foreach { case (id, bytes) =>
      // independent second path: decode here and recompute the features
      val pcm = graft.core.Wav.decode(bytes)
      var sumSq = 0.0; var cr = 0
      pcm.samples.indices.foreach { i =>
        sumSq += pcm.samples(i) * pcm.samples(i)
        if (i > 0 && (pcm.samples(i) >= 0) != (pcm.samples(i - 1) >= 0)) cr += 1
      }
      val a = got(id)
      assert(a.duration_s == pcm.durationS, id)
      assert(a.rms == math.sqrt(sumSq / pcm.samples.length), id)
      assert(a.zcr == cr.toDouble / pcm.samples.length, id)
    }
  }

  test("Wav codec: encode/decode round-trip, 8-bit support, malformed -> error row") {
    import spark.implicits._
    val samples = Array.tabulate(1000)(i => math.sin(i * 0.05) * 0.8)
    val pcm = graft.core.Wav.decode(graft.core.Wav.encode(samples, 22050, 1))
    assert(pcm.sampleRate == 22050 && pcm.channels == 1 && pcm.samples.length == 1000)
    samples.zip(pcm.samples).foreach { case (a, b) =>
      // encode scales by 32767, decode divides by 32768: quantization plus
      // the scale asymmetry bounds the error by (0.5 + |a|)/32768
      assert(math.abs(a - b) <= (0.5 + math.abs(a)) / 32768.0, s"$a vs $b")
    }
    // stereo framing: duration counts frames, not raw samples
    val st = graft.core.Wav.decode(graft.core.Wav.encode(new Array[Double](800), 8000, 2))
    assert(st.frames == 400 && st.durationS == 0.05)
    // 8-bit unsigned PCM decodes around the 128 midpoint
    val b8 = java.nio.ByteBuffer.allocate(44 + 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b8.put("RIFF".getBytes).putInt(36 + 4).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
      .put("data".getBytes).putInt(4).put(Array[Byte](128.toByte, 255.toByte, 0, 128.toByte))
    val p8 = graft.core.Wav.decode(b8.array())
    assert(p8.samples(0) == 0.0 && p8.samples(1) > 0.99 && p8.samples(2) == -1.0)
    // non-WAV payloads (the image bytes) become error rows, not failures
    val bad = MediaOps.audioFeatures(imgs.limit(3), "image_id", "bytes").collect()
    assert(bad.forall(a => a.duration_s == -1.0 && a.rms.isNaN))
  }
}
