package graft.data

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.BBox
import graft.engine.SpatialOps
import graft.sql.{GraftSpark, functions => gf}

/** End-to-end north_rule pipeline over the image+caption table:
  * generate → tile-assign → Iceberg-style checkpointed write → box-query
  * join → per-row invariants (PSNR ≥ 40 dB lossy / exact lossless, caption
  * byte-equality, phash integrity) → kill/resume parity. */
class ImagePipelineSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.session("local[4]", appName = "img-spec")
  import spark.implicits._

  val N = 600L

  test("generator is deterministic and schema matches input_hint") {
    val a = Images.generate(spark, 50, 4).collect().sortBy(_.image_id)
    val b = Images.generate(spark, 50, 2).collect().sortBy(_.image_id)
    assert(a.length == 50)
    a.zip(b).foreach { case (x, y) =>
      assert(x.image_id == y.image_id && x.caption == y.caption && x.phash == y.phash)
      assert(java.util.Arrays.equals(x.bytes, y.bytes))
    }
    val schema = Images.generate(spark, 1).toDF().schema
    assert(schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "image_id" -> "string", "bytes" -> "binary", "w" -> "int", "h" -> "int",
      "fmt" -> "string", "caption" -> "string", "phash" -> "bigint"))
  }

  test("per-row invariants: phash integrity + PSNR thresholds") {
    val df = Images.withPsnr(Images.withRehash(Images.generate(spark, N).toDF())).cache()
    try {
      assert(df.where($"phash" =!= $"phash_recomputed").count() == 0, "phash mismatch")
      // lossless fmts decode exactly; jpg must clear the 40 dB bar
      assert(df.where($"fmt".isin("png", "raw") && $"psnr_db" < 1e9).count() == 0)
      val worstJpg = df.where($"fmt" === "jpg").agg(min($"psnr_db")).collect()(0).getDouble(0)
      assert(worstJpg >= 40.0, s"worst jpg PSNR $worstJpg < 40 dB")
    } finally df.unpersist()
  }

  test("tile assignment + box join preserves caption and pixels") {
    val tiled = Images.withTile(Images.generate(spark, N).toDF(), 20)
    val box = BBox(-0.25, 51.375, 0.0, 51.625) // hot cluster 0
    val got = SpatialOps.boxQuery(tiled, "lon", "lat", box, 20)
    // oracle: brute-force position filter recomputed from scratch
    val expect = (0L until N).map(ImageGen.idOf).filter { id =>
      val (lon, lat) = ImageGen.posOf(id)
      lon >= box.minLon && lon <= box.maxLon && lat >= box.minLat && lat <= box.maxLat
    }.toSet
    val gotRows = got.select("image_id", "caption", "bytes", "w", "h", "fmt").collect()
    assert(gotRows.map(_.getString(0)).toSet == expect)
    assert(expect.nonEmpty, "hot-cluster box should not be empty")
    gotRows.foreach { r =>
      val id = r.getString(0)
      assert(r.getString(1) == ImageGen.captionOf(id), s"caption corrupted for $id")
      val rgb = ImageGen.decodeBytes(r.getAs[Array[Byte]](2), r.getInt(3), r.getInt(4), r.getString(5))
      val p = ImageGen.psnr(rgb, ImageGen.pixelsOf(id, r.getInt(3), r.getInt(4)))
      if (r.getString(5) == "jpg") assert(p >= 40.0, s"PSNR $p < 40 for $id")
      else assert(p.isInfinity, s"lossless decode not exact for $id")
    }
  }

  test("iceberg-lite: write/read round-trip, snapshot visibility, resume after kill") {
    val dir = Files.createTempDirectory("iceberg_lite").toString
    val tbl = s"$dir/images"
    // partition by coarse tile prefix (the table layout for partition pruning)
    def tiled = Images.withTile(Images.generate(spark, N).toDF(), 30)
      .withColumn("tile_p1", gf.gh_parent($"tile", 30, 5))
      .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "tile", "tile_p1")

    // one-shot reference write to a separate location
    val refTbl = s"$dir/images_ref"
    IcebergLite.write(tiled, refTbl, "tile_p1")
    val ref = IcebergLite.read(spark, refTbl)

    // crash after 3 partitions
    val crashed = intercept[RuntimeException] {
      IcebergLite.write(tiled, tbl, "tile_p1", failAfterPartitions = 3)
    }
    assert(crashed.getMessage.contains("injected"))
    val partial = IcebergLite.readManifest(tbl).get
    assert(partial.entries.size == 3, "checkpoint shows exactly the 3 committed partitions")
    assert(IcebergLite.read(spark, tbl).count() ==
      partial.entries.map(_.rows).sum, "read sees only committed partitions")

    // resume: completes the remaining partitions
    val m = IcebergLite.write(tiled, tbl, "tile_p1")
    assert(m.parentSnapshotId == partial.snapshotId, "lineage chains snapshots")
    val resumed = IcebergLite.read(spark, tbl)
    assert(resumed.count() == N)
    // byte-identical content vs one-shot write (order-independent)
    assert(resumed.exceptAll(ref).isEmpty && ref.exceptAll(resumed).isEmpty,
      "resumed table differs from one-shot write")
    // checksums match partition-for-partition
    val refM = IcebergLite.readManifest(refTbl).get
    assert(m.entries.map(e => (e.partition, e.rows, e.checksum)).sortBy(_._1) ==
      refM.entries.map(e => (e.partition, e.rows, e.checksum)).sortBy(_._1))
    // second resume is a no-op returning the same snapshot
    assert(IcebergLite.write(tiled, tbl, "tile_p1").snapshotId == m.snapshotId)
    // lineage emission
    assert(IcebergLite.lineageJson(tbl).size == m.entries.size)
  }

  test("iceberg-lite: update replaces partitions, extend appends to them") {
    val dir = Files.createTempDirectory("iceberg_upd").toString
    val tbl = s"$dir/t"
    import spark.implicits._
    def rows(ids: Seq[Long], part: Int, payload: String) =
      ids.map(i => (s"r$i", payload, part)).toDF("id", "payload", "p")
    IcebergLite.write(rows(0L to 9L, 0, "v1").unionAll(rows(10L to 19L, 1, "v1")), tbl, "p")
    assert(IcebergLite.read(spark, tbl).count() == 20)

    // update: replace partition 0 wholesale (reference GeoHash.update)
    val m1 = IcebergLite.update(rows(100L to 102L, 0, "v2"), tbl, "p")
    val afterUpdate = IcebergLite.read(spark, tbl)
    assert(afterUpdate.where($"p" === 0).count() == 3)
    assert(afterUpdate.where($"p" === 1).count() == 10, "untouched partition intact")
    assert(afterUpdate.where($"p" === 0 && $"payload" === "v1").count() == 0)

    // extend: append rows to partition 1 (reference GeoHash.extend).
    // FILE-LEVEL: the append must only ADD files — no pre-existing data file
    // may be rewritten or removed (the 100 TB append contract).
    def dataFiles(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tbl, "data")).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = dataFiles()
    val m2 = IcebergLite.extend(rows(200L to 204L, 1, "v3"), tbl, "p")
    val after = dataFiles()
    assert(before.keySet.subsetOf(after.keySet), "extend removed existing data files")
    before.foreach { case (f, mtime) =>
      assert(after(f) == mtime, s"extend rewrote existing file $f") }
    assert(after.size > before.size, "extend added no files")
    val afterExtend = IcebergLite.read(spark, tbl)
    assert(afterExtend.where($"p" === 1).count() == 15, "10 original + 5 appended")
    assert(afterExtend.where($"p" === 0).count() == 3, "update result intact")
    assert(m2.snapshotId > m1.snapshotId && m1.parentSnapshotId >= 0, "snapshot lineage chains")
    // snapshot isolation / time travel: the pre-extend snapshot still reads
    // consistently through its own manifest
    assert(IcebergLite.read(spark, tbl, asOfSnapshot = m1.snapshotId)
      .where($"p" === 1).count() == 10)
    // per-partition row counts sum across snapshots
    assert(IcebergLite.rowsByPartition(m2) == Map("0" -> 3L, "1" -> 15L))

    // compact: same content, ONE entry per partition, then expire drops the
    // superseded snapshot dirs while the compacted table reads unchanged
    val before2 = IcebergLite.read(spark, tbl).collect().map(_.toString).sorted
    val mc = IcebergLite.compact(spark, tbl)
    assert(mc.entries.size == 2 && mc.entries.map(_.snapshotId).distinct == Seq(mc.snapshotId))
    val afterCompact = IcebergLite.read(spark, tbl).collect().map(_.toString).sorted
    assert(afterCompact.toSeq == before2.toSeq, "compact changed table content")
    val expired = IcebergLite.expireSnapshots(tbl)
    assert(expired.nonEmpty, "expire should drop superseded snapshot dirs")
    assert(IcebergLite.read(spark, tbl).collect().map(_.toString).sorted.toSeq == before2.toSeq,
      "expire damaged the current snapshot")
    assert(IcebergLite.rowsByPartition(IcebergLite.readManifest(tbl).get) ==
      Map("0" -> 3L, "1" -> 15L))
  }
}
