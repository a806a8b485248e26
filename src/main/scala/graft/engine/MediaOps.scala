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
  * All three modalities are REAL in this container, each without a codec
  * library: image decode/resize/metadata via javax.imageio;
  * `audioFeatures` via the pure-spec RIFF/WAVE PCM parser
  * ([[graft.core.Wav]]); `frameSample` via the pure-spec RIFF/AVI MJPEG
  * container walk ([[graft.core.Avi]] — frames are plain JPEG, which
  * javax.imageio decodes). Codec-compressed formats beyond these (H.264,
  * MP3, …) would need external libraries that do not exist here.
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

  /** REAL: parse the payload as RIFF/AVI MJPEG ([[graft.core.Avi]] — a
    * pure-spec container walk; frames are plain JPEG, decodable by
    * javax.imageio) and emit `n` evenly-spaced frames as (media_id,
    * frame_idx, jpeg_bytes) rows. Malformed/non-AVI payloads yield a
    * single (id, -1, empty) error row instead of failing the partition.
    * Batch shape: one row explodes to ≤n typed rows, streamed per
    * partition. */
  def frameSample(df: DataFrame, idCol: String, bytesCol: String, n: Int): Dataset[Frames] = {
    import df.sparkSession.implicits._
    df.select(col(idCol), col(bytesCol)).as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        try {
          val video = graft.core.Avi.decode(bytes)
          val total = video.frames.length
          val take = math.min(n, total)
          (0 until take).map { k =>
            val src = if (take == 1) 0 else k * (total - 1) / (take - 1)
            Frames(id, k, video.frames(src))
          }
        } catch {
          case _: IllegalArgumentException => Seq(Frames(id, -1, Array.emptyByteArray))
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
