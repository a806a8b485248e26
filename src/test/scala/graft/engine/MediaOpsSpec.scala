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

  test("frameSample stub: n typed rows per input, deterministic slices") {
    val frames = MediaOps.frameSample(imgs, "image_id", "bytes", 4).collect()
    assert(frames.length == 60 * 4)
    assert(frames.groupBy(_.media_id).forall(_._2.map(_.frame_idx).sorted.sameElements(0 until 4)))
  }

  test("audioFeatures stub: schema + determinism + sane ranges") {
    val f = MediaOps.audioFeatures(imgs, "image_id", "bytes").collect()
    assert(f.length == 60)
    f.foreach { x =>
      assert(x.duration_s > 0 && x.rms >= 0 && x.rms <= 1.01 && x.zcr >= 0 && x.zcr <= 1)
    }
  }
}
