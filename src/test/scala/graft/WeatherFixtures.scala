package graft

/** Deterministic raw weather-document JSON fixtures (FIXTURES.md §1.1):
  * covers the conversion boundary matrix (Kelvin 100/>100, precip <1/≥1),
  * nulls in each quantity, a missing-timestamp feature (must be dropped),
  * and exact duplicate features (masked by the hourly dedup aggregate).
  */
object WeatherFixtures {

  private def feature(ts: String, station: String, temp: Option[Double],
      precip: Option[Double], hum: Option[Double]): String = {
    def q(v: Option[Double]) =
      v.map(x => s"""{"value": $x}""").getOrElse("""{"value": null}""")
    val tsJson = if (ts == null) "null" else s""""$ts""""
    s"""{"properties": {"timestamp": $tsJson,
       |  "station": "https://api.example.test/stations/$station",
       |  "temperature": ${q(temp)},
       |  "precipitationLastHour": ${q(precip)},
       |  "relativeHumidity": ${q(hum)},
       |  "windSpeed": {"value": 4.1},
       |  "seaLevelPressure": {"value": 101325.0}}}""".stripMargin
      .replaceAll("\n", " ")
  }

  /** One raw document with the full edge matrix in its arrays. */
  def rawDoc(batch: String, obsFeatures: Seq[String],
      histFeatures: Seq[String]): String =
    s"""{"source_timestamp": "2026-08-01T18:00:00Z",
       |"source_database": "NWS_API", "data_quality": "raw",
       |"api_request_id": "req_1754071200000",
       |"etl_batch_id": "$batch",
       |"location": {"city": "Stockton", "state": "CA",
       |  "latitude": 37.9577, "longitude": -121.2908,
       |  "grid_point": {"office": "STO", "grid_x": 40, "grid_y": 60}},
       |"forecast": {"properties": {"periods": [
       |  {"name": "Today", "temperature": 95.0},
       |  {"name": "Tonight", "temperature": 68.0}]}},
       |"observations": [${obsFeatures.mkString(",")}],
       |"historical_observations": [${histFeatures.mkString(",")}],
       |"stations": ["KSCK"], "sync_type": "full",
       |"metadata": {"team_name": "graft", "data_source": "NWS_API"}}
       |""".stripMargin.replaceAll("\n", " ")

  /** The standard fixture batch. Hand-computable goldens:
    *  - 6 valid observation rows (1 dropped for null timestamp)
    *  - Kelvin 308.15→35.0; boundary 100.0 stays 100.0 (not converted)
    *  - precip 0.0005 m→0.5 mm; boundary 1.0 stays 1.0
    *  - duplicate feature appears twice (same hour → max/avg masks it)
    */
  def standardBatch: Seq[String] = {
    val dup = feature("2026-08-01T17:53:00+00:00", "KSCK",
      Some(308.15), Some(0.0005), Some(42.0))
    Seq(
      rawDoc("batch_1", Seq(
        dup, dup,
        feature("2026-08-01T17:10:00+00:00", "KSCK",
          Some(100.0), Some(1.0), Some(120.0)),
        feature(null, "KSCK", Some(300.0), None, None)),
        Seq(
          feature("2026-08-01T05:00:00+00:00", "KSCK",
            Some(25.5), Some(2.5), None),
          feature("2026-07-31T23:45:00+00:00", "KSJC",
            Some(290.15), Some(0.001), Some(55.0)),
          feature("2026-07-31T22:05:00+00:00", "KSJC",
            None, Some(3.0), Some(61.0)))))
  }

  def writeJson(dir: String, name: String, lines: Seq[String]): String = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      String.join("\n", lines: _*).getBytes("UTF-8"))
    p.toString
  }
}
