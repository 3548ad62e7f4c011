package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Shared plan-shape counters for the standing exchange-budget gate
  * (`EntrySpec`) and its regeneration main ([[PlanBudget]]).
  */
object PlanAudit {
  private val shufflePat = java.util.regex.Pattern.compile(
    "Exchange (hashpartitioning|rangepartitioning)")

  /** Number of per-key shuffle exchanges in the physical plan (the
    * SCALE.md "shuffles" class; one-row `Exchange SinglePartition`
    * collapses are excluded — they carry scalars, not data). Counted
    * on the pre-execution plan string, so nothing runs.
    */
  def shuffleCount(df: DataFrame): Int = {
    val m = shufflePat.matcher(df.queryExecution.executedPlan.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }
}

/** Regenerates `tools/plan_budget.json` — the pinned per-query shuffle
  * exchange counts the EntrySpec budget gate enforces. Run after any
  * intentional plan change (and after a driver testdata regen, which
  * can flip the conditional parallelism-floor repartitions):
  * `sbt "runMain graft.PlanBudget"`. Session config mirrors
  * SparkSuite's exactly — the counts are config-sensitive.
  */
object PlanBudget {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("tools/plan_budget.json")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.prepare(spark, sfDir)
    val entries = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        s"""  "$name": ${PlanAudit.shuffleCount(fn(spark, sfDir))}"""
    }
    Files.writeString(Paths.get(out),
      entries.mkString("{\n", ",\n", "\n}\n"))
    println(s"[plan-budget] wrote ${entries.size} entries to $out")
    spark.stop()
  }
}
