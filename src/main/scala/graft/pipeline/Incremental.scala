package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Batch high-watermark incremental reads (SURVEY §4.3 engine
  * obligation): the principled replacement for the reference's
  * re-extract-everything sync. The watermark (max ingest timestamp seen)
  * persists in a tiny sidecar file; each sync reads only rows past it.
  * The predicate is a plain column comparison, so it pushes down to the
  * parquet scan — an incremental sync touches only new row groups, which
  * is what makes periodic syncs affordable at 100 TB (append-only tiers
  * + min/max row-group stats ≈ reading just the new files).
  */
object Incremental {

  private def readWatermark(file: String): Option[String] = {
    val p = Paths.get(file)
    if (Files.exists(p)) Some(Files.readString(p).trim).filter(_.nonEmpty)
    else None
  }

  private def writeWatermark(file: String, v: String): Unit = {
    val p = Paths.get(file)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, v, StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
  }

  /** Rows of `path` with `tsCol` strictly beyond the stored watermark.
    * Call [[commit]] after the downstream write succeeds — watermark
    * advancement is separate from the read so a failed sync retries the
    * same slice (at-least-once, like the reference's idempotent
    * aggregate refresh).
    */
  def readNew(spark: SparkSession, path: String, watermarkFile: String,
      tsCol: String): DataFrame = {
    val df = spark.read.parquet(path)
    readWatermark(watermarkFile) match {
      case Some(wm) => df.filter(col(tsCol) > lit(wm).cast("timestamp"))
      case None => df
    }
  }

  /** Advance the watermark to the max `tsCol` of the processed slice. */
  def commit(processed: DataFrame, watermarkFile: String,
      tsCol: String): Unit = {
    val mx = processed.agg(max(col(tsCol)).cast("string"))
      .collect().head.getString(0)
    if (mx != null) writeWatermark(watermarkFile, mx)
  }
}
