package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange formats for the pipeline tiers. Parquet is the native
  * tier format (columnar, stats, pruning); these cover the exchange
  * boundaries a reference user has: CSV/JSON-lines export-import and
  * ORC as the alternative columnar container. All readers take explicit
  * schemas — schema inference is an extra full pass at 100 TB and can
  * silently widen types.
  */
object Formats {

  /** CSV with header; timestamps serialized ISO-8601 so a re-read with
    * the same schema round-trips exactly.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  def readCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  /** JSON lines (the document-tier interchange shape). */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonLines(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — alternative columnar container, same pushdown/pruning story
    * as parquet.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
