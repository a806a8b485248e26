package graft.engine

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.data.ImageGen

/** Multimodal column operators: image/audio/video travel as opaque BINARY
  * columns with typed metadata; per-partition batch processing is the Scala
  * analogue of `mapInPandas` (one JVM decode context reused across the
  * partition's rows, no per-row UDF setup).
  *
  * Real vs stubbed: image decode/resize/metadata are REAL (javax.imageio);
  * `audioFeatures` is REAL (pure-spec RIFF/WAVE PCM parser in
  * [[graft.core.Wav]] — WAV needs no codec library); only `frameSample`
  * (video) remains a STUB — a deterministic fake behind the same
  * schema/partitioning/batch plumbing, clearly marked, because no video
  * codec exists in this container.
  */
object MediaOps {

  final case class Meta(image_id: String, decoded_w: Int, decoded_h: Int, ok: Boolean)
  final case class Resized(image_id: String, bytes: Array[Byte], w: Int, h: Int, fmt: String)
  final case class Frames(media_id: String, frame_idx: Int, frame: Array[Byte])
  final case class AudioFeat(media_id: String, duration_s: Double, rms: Double, zcr: Double)

  /** REAL: decode headers and report actual dimensions (validates the
    * binary payload without materializing pixels into the plan). */
  def decodeMeta(df: DataFrame): Dataset[Meta] = {
    import df.sparkSession.implicits._
    df.select("image_id", "bytes", "w", "h", "fmt").as[(String, Array[Byte], Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, w, h, fmt) =>
          try {
            if (fmt == "raw") Meta(id, w, h, bytes.length == w * h * 3)
            else {
              val img = ImageIO.read(new ByteArrayInputStream(bytes))
              Meta(id, img.getWidth, img.getHeight, img.getWidth == w && img.getHeight == h)
            }
          } catch { case _: Exception => Meta(id, -1, -1, ok = false) }
        }
      }
  }

  /** REAL: bilinear resize to (w2, h2), re-encoded as PNG. Batch shape:
    * one Graphics2D pipeline per partition iteration, rows streamed. */
  def resize(df: DataFrame, w2: Int, h2: Int): Dataset[Resized] = {
    import df.sparkSession.implicits._
    df.select("image_id", "bytes", "w", "h", "fmt").as[(String, Array[Byte], Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, w, h, fmt) =>
          val rgb = ImageGen.decodeBytes(bytes, w, h, fmt)
          val src = ImageGen.toBufferedImage(rgb, w, h)
          val dst = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w2, h2, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          ImageIO.write(dst, "png", bos)
          Resized(id, bos.toByteArray, w2, h2, "png")
        }
      }
  }

  /** STUB (no video codec in this container): deterministic fake frame
    * sampler — emits `n` evenly-spaced byte windows of the payload as
    * "frames". The Spark plumbing (explode one row → n typed rows,
    * partition-preserving, schema'd) is the real deliverable; replace the
    * window slice with a codec call to make it real. */
  def frameSample(df: DataFrame, idCol: String, bytesCol: String, n: Int): Dataset[Frames] = {
    import df.sparkSession.implicits._
    df.select(col(idCol), col(bytesCol)).as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val len = math.max(1, bytes.length / n)
        (0 until n).map { k =>
          val off = math.min(bytes.length - 1, k * bytes.length / n)
          Frames(id, k, java.util.Arrays.copyOfRange(bytes, off, math.min(bytes.length, off + len)))
        }
      }
  }

  /** REAL: parse the payload as RIFF/WAVE PCM ([[graft.core.Wav]] — a
    * pure-spec parser, no codec library needed) and compute duration, RMS
    * and zero-crossing rate over the normalized samples. Non-WAV or
    * malformed payloads yield a (-1, NaN, NaN) error row instead of
    * failing the partition — at 10⁹ rows a handful of corrupt blobs must
    * not kill the job. Batch shape: rows streamed per partition, no
    * per-row parser setup. */
  def audioFeatures(df: DataFrame, idCol: String, bytesCol: String): Dataset[AudioFeat] = {
    import df.sparkSession.implicits._
    df.select(col(idCol), col(bytesCol)).as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val pcm = graft.core.Wav.decode(bytes)
            val s = pcm.samples
            var sumSq = 0.0; var crossings = 0
            var i = 0
            while (i < s.length) {
              sumSq += s(i) * s(i)
              if (i > 0 && (s(i) >= 0.0) != (s(i - 1) >= 0.0)) crossings += 1
              i += 1
            }
            val n = math.max(1, s.length)
            AudioFeat(id, pcm.durationS, math.sqrt(sumSq / n), crossings.toDouble / n)
          } catch {
            case _: IllegalArgumentException => AudioFeat(id, -1.0, Double.NaN, Double.NaN)
          }
        }
      }
  }
}
