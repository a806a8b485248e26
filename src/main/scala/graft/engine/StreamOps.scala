package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators. The reference is a batch library
  * (SURVEY.md §3.3: streaming absent); this is the engine extension that
  * makes the tiling pipeline incremental: the same tumbling-window
  * aggregation shape that per-tile metrics use, fed by a file stream.
  *
  * For verification the stream is driven to completion over a static
  * parquet directory (processAllAvailable) and the result must equal the
  * batch GROUP BY — exactly the incremental-view guarantee Structured
  * Streaming makes.
  */
object StreamOps {
  /** Tumbling-window event aggregation, streaming end-to-end, returned as a
    * finished DataFrame. Decimal sums keep parity with the DuckDB oracle. */
  def streamedWindowAgg(spark: SparkSession, parquetPath: String): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val name = s"q50_out_${System.nanoTime()}"
    // the file source needs a directory: stream the parent dir, filtered to
    // this one file (works for both a file and a directory input)
    val f = new java.io.File(parquetPath)
    val (dir, glob) = if (f.isDirectory) (parquetPath, "*") else (f.getParent, f.getName)
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob).parquet(dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           expr("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").as("sum_val"))
    val q = stream.writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_val"))
  }
}
