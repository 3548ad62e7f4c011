package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-shot batch pipeline (SURVEY.md §3.1 run_pipeline.py behavior):
  * raw docs → lake(enrich) → warehouse(observations) → aggregates →
  * serving cache. Each stage is a pure DataFrame function; tier
  * boundaries are parquet dirs instead of external systems, so the only
  * physical boundaries are shuffle exchanges.
  */
object Pipeline {

  final case class Paths(root: String) {
    val rawLake     = s"$root/lake/raw"
    val enriched    = s"$root/lake/enriched"
    val observations = s"$root/warehouse/observations"
    val dailyAgg    = s"$root/warehouse/daily_aggregates"
    val monthlyAgg  = s"$root/warehouse/monthly_aggregates"
    val cache       = s"$root/serving/cache"
  }

  /** Full pipeline pass. Returns the serving monthly result for
    * inspection. `loadMode` mirrors the reference's incremental (append,
    * duplicate-tolerant — SURVEY §8.5) vs overwrite semantics.
    */
  def run(spark: SparkSession, rawJsonPath: String, paths: Paths,
      loadMode: String = "incremental"): DataFrame = {
    // Stage 1: API→lake (the fetch boundary is file-based here)
    val raw = Lake.readRaw(spark, rawJsonPath)
    Lake.append(raw, paths.rawLake)
    val enriched = Lake.enrich(raw)
    Lake.append(enriched, paths.enriched)

    // Stage 2: lake→warehouse (parity mode re-extracts everything, like
    // the reference; checkpointed incremental reads live in the
    // streaming tier)
    val docs = spark.read.schema(
      spark.read.parquet(paths.enriched).schema)
      .parquet(paths.enriched)
    val obs = Warehouse.parseObservations(docs)
    Warehouse.writeObservations(obs, paths.observations, loadMode)

    val allObs = Warehouse.readObservations(spark, paths.observations)
    Warehouse.refreshAggregate(
      Warehouse.dailyAggregates(allObs), paths.dailyAgg, 60, loadMode)
    Warehouse.refreshAggregate(
      Warehouse.monthlyAggregates(allObs), paths.monthlyAgg, 60, loadMode)

    // Stage 3: warehouse→serving cache
    val monthly = Serving.monthlyAverages(allObs, 12)
    val overall = Serving.overallAverages(monthly)
    Serving.writeCache(Serving.cacheEnvelope(monthly, overall), paths.cache)
    monthly
  }
}
