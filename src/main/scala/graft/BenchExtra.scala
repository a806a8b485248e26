package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round helper bench (guide §1.4/§1.5): NOT the driver
  * contract — Bench.scala stays the frozen harness. This main
  *  - times individual queries with the noop sink (same action as Bench),
  *  - records /proc/loadavg before/after each query so a contaminated
  *    window is identifiable from the artifact alone,
  *  - optionally dumps .explain("formatted") per query to a directory.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.BenchExtra [q32_minhash_lsh,...] [explainDir] [iters]"
  */
object BenchExtra {
  private def loadavg(): String =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(" ").take(3).mkString(",")
    catch { case _: Throwable => "?" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only: Set[String] =
      if (args.length > 0 && args(0).nonEmpty && args(0) != "-") args(0).split(",").toSet
      else SparkEntry.queries.keySet
    val explainDir = if (args.length > 1 && args(1).nonEmpty && args(1) != "-") Some(args(1)) else None
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)

    explainDir.foreach(d => new java.io.File(d).mkdirs())
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.contains(name) }
      .map { case (name, fn) =>
        spark.sparkContext.setJobDescription(name)
        explainDir.foreach { d =>
          val plan = try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"explain failed: $e" }
          java.nio.file.Files.writeString(java.nio.file.Paths.get(d, s"$name.txt"), plan)
        }
        val la0 = loadavg()
        val ts = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          val err = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
                    catch { case e: Throwable => Some(e.getClass.getSimpleName + ": " + e.getMessage) }
          err.foreach(m => System.err.println(s"[benchextra] $name FAILED: $m"))
          (System.nanoTime() - t0) / 1e9
        }
        val la1 = loadavg()
        (name, ts, la0, la1)
      }
    results.foreach { case (name, ts, la0, la1) =>
      println(f"$name%-28s min=${ts.min}%8.3f med=${ts.sorted.apply(ts.length / 2)}%8.3f all=[${ts.map(t => f"$t%.3f").mkString(", ")}] load0=$la0 load1=$la1")
    }
    println(s"TOTAL(min) ${results.map(_._2.min).sum}")
    spark.stop()
  }
}
