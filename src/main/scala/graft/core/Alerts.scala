package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T2+T3 — the Rain-Detector: filter humidity > 70 and project the alert
  * string (ref: Rain-Detector/Main.java:34-46). Works identically on batch
  * and streaming DataFrames (same declarative plan).
  *
  * The predicate reads the nested field `weather.humidity` — Catalyst pushes
  * nested-column pruning + the comparison into the scan; null/absent weather
  * structs fail the predicate (three-valued logic), matching the reference's
  * defensive null check.
  */
object Alerts {

  val AlertPrefix = "Raining alert! High humidity detected: "

  /** Rows that should alert, from wire- or archive-shaped frames. */
  def rainingRows(df: DataFrame, humidityThreshold: Double = 70.0): DataFrame =
    df.filter(col("weather.humidity") > humidityThreshold)

  /** The derived alert stream: (station key, alert string) — the shape
    * written to the raining-alerts topic (ref: Rain-Detector/Main.java:46-48).
    */
  def alerts(df: DataFrame, keyCol: String, humidityThreshold: Double = 70.0): DataFrame =
    rainingRows(df, humidityThreshold)
      .select(
        col(keyCol).cast("string").as("key"),
        concat(lit(AlertPrefix), col("weather.humidity").cast("string"))
          .as("value"))
}
