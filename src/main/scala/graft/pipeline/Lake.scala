package graft.pipeline

import graft.functions.Fns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake tier: raw-document ingest + enrichment (SURVEY.md §2.1 S8/S9,
  * §2.4 A1, §2.3 F1–F3/F14, §2.2 P2/P4/P8 — mongodb_etl.py:22-93
  * behavior, re-expressed as array column expressions so each document
  * enriches without exploding: one narrow projection, no shuffle, fully
  * parallel across documents at any scale).
  */
object Lake {

  /** Read raw weather documents (JSON lines) with the explicit schema —
    * no inference pass, struct-field pruning stays effective.
    */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(WeatherSchemas.rawDocument).json(path)

  private def metricValues(allObs: Column, field: String): Column =
    filter(
      transform(allObs, o =>
        o.getField("properties").getField(field).getField("value")),
      v => v.isNotNull)

  private def arrAvg(a: Column): Column =
    when(size(a) > 0,
      aggregate(a, lit(0.0), (acc, v) => acc + v) / size(a))

  private def arrSum(a: Column): Column =
    when(size(a) > 0, aggregate(a, lit(0.0), (acc, v) => acc + v))

  /** Enrich a raw document: per-document aggregates over the combined
    * observation arrays (union-all P2), heuristic unit conversions
    * (F1/F2), first-7 forecast periods converted F→C (P8/F3), lineage
    * metadata (F14). Mirrors the reference enricher's semantics exactly,
    * including sum/len averaging over only the non-null values.
    */
  def enrich(raw: DataFrame): DataFrame = {
    val allObs = concat(
      coalesce(col("observations"), array()),
      coalesce(col("historical_observations"), array()))
    val temps = transform(metricValues(allObs, "temperature"),
      v => kelvinToC(v))
    val rains = transform(metricValues(allObs, "precipitationLastHour"),
      v => metersToMm(v))
    val hums = metricValues(allObs, "relativeHumidity")
    raw
      .withColumn("calculated_metrics", struct(
        arrAvg(temps).as("avg_temperature_c"),
        arrSum(rains).as("total_rainfall_mm"),
        arrAvg(rains).as("avg_rainfall_mm"),
        arrAvg(hums).as("avg_humidity_percent"),
        size(allObs).as("observation_count"),
        size(temps).as("temperature_count"),
        size(rains).as("rainfall_count"),
        size(hums).as("humidity_count")))
      .withColumn("forecast_summary",
        transform(slice(col("forecast.properties.periods"), 1, 7), p =>
          struct(p.getField("name").as("name"),
            p.getField("temperature").as("temperature_f"),
            fToC(p.getField("temperature")).as("temperature_c"))))
      .withColumn("ingest_time_utc",
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .withColumn("record_source", lit("NWS_API"))
      .withColumn("transform_status", lit("enriched"))
  }

  /** Append documents to the lake (parquet stand-in for the document
    * store). At scale this would be partitioned by ingest date.
    */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** S10: latest enriched document by ingest time. */
  def latest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .orderBy(col("ingest_time_utc").desc).limit(1)
}
