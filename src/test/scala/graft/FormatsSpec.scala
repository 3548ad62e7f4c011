package graft

import graft.pipeline.{Warehouse, WeatherSchemas}
import graft.sources.Formats
import org.apache.spark.sql.functions._

/** Interchange-format round-trips for the observation tier. */
class FormatsSpec extends SparkSuite {

  private lazy val obs = {
    val dir = tmpDir("fmt_fix")
    WeatherFixtures.writeJson(dir, "batch1.json",
      WeatherFixtures.standardBatch)
    Warehouse.parseObservations(
      spark.read.schema(WeatherSchemas.rawDocument).json(dir))
      .cache()
  }

  private def key(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("observation_id"), col("timestamp").cast("string"),
      col("temperature_c"), col("rainfall_mm"))
      .collect().map(_.toString).toSet

  test("CSV round-trips observations with explicit schema") {
    val dir = tmpDir("fmt_csv")
    Formats.writeCsv(obs, s"$dir/obs")
    val back = Formats.readCsv(spark, s"$dir/obs", obs.schema)
    // file sources relax nullability; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      obs.schema.map(f => (f.name, f.dataType)))
    assert(key(back) === key(obs))
  }

  test("JSON-lines round-trips observations") {
    val dir = tmpDir("fmt_json")
    Formats.writeJsonLines(obs, s"$dir/obs")
    val back = Formats.readJsonLines(spark, s"$dir/obs", obs.schema)
    assert(key(back) === key(obs))
  }

  test("ORC round-trips observations and carries the schema") {
    val dir = tmpDir("fmt_orc")
    Formats.writeOrc(obs, s"$dir/obs")
    val back = Formats.readOrc(spark, s"$dir/obs")
    assert(back.schema.fieldNames.toSeq === obs.schema.fieldNames.toSeq)
    assert(key(back) === key(obs))
  }
}
