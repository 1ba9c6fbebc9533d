package graft.render

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Glue from oracle-checked registry queries to the SVG chart tier —
  * the engine's version of the reference's two batch dashboard
  * artifacts (`include/tasks/generate_dashboard.py:49,59`) plus the
  * live dashboard's volume bars (`analytics_service/dashboard.py:162`).
  * Every number on a chart has already passed the DuckDB differential;
  * this layer only selects, collects the SMALL rendered subset (a
  * handful of series / a K×K matrix / top-N bars — never the corpus)
  * and hands it to [[Svg]].
  */
object Render {

  /** CLI: `runMain graft.render.Render <sfDir> <outDir>` writes the four
    * dashboard artifacts as .svg files — the engine's equivalent of the
    * reference's output-dir PNG generation run. */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    Seq(
      "cumulative_returns.svg" -> cumulativeReturns(spark, sfDir),
      "correlation_heatmap.svg" -> correlationHeatmap(spark, sfDir),
      "total_value_bars.svg" -> totalValueBars(spark, sfDir),
      "share_pie.svg" -> sharePie(spark, sfDir)
    ).foreach { case (name, svg) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name"), svg)
    }
    spark.stop()
  }

  /** Cumulative-return line chart over the first `nSeries` user series of
    * q_cum_return (the reference plots a chosen symbol subset the same
    * way); x = event_id sequence, y = cumulative return in %. */
  def cumulativeReturns(spark: SparkSession, dir: String,
      nSeries: Int = 4): String = {
    val rows = Registry.byName("q_cum_return").fn(spark, dir)
      .select("user_id", "event_id", "cumulative_return")
      .na.drop(Seq("cumulative_return"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = rows.map(_._1).distinct.sorted.take(nSeries)
    val series = keys.toSeq.map { u =>
      (s"user $u", rows.filter(_._1 == u).sortBy(_._2)
        .map(t => (t._2.toDouble, t._3 * 100)).toSeq)
    }
    Svg.lineChart(series, "Cumulative return", "event sequence",
      "cumulative return (%)")
  }

  /** Annotated correlation heatmap over q_corr_matrix (upper-triangle
    * rows expanded to the full symmetric matrix, unit diagonal — exactly
    * how the reference's seaborn heatmap reads its pivoted `corr()`). */
  def correlationHeatmap(spark: SparkSession, dir: String): String = {
    val rows = Registry.byName("q_corr_matrix").fn(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
    val m = rows.toMap
    val labels = rows.flatMap(p => Seq(p._1._1, p._1._2)).distinct.sorted.toSeq
    def v(a: String, b: String): Double =
      if (a == b) 1.0 else m.getOrElse((a, b), m.getOrElse((b, a), 0.0))
    Svg.heatmap(labels, v, "Daily-return correlation")
  }

  /** Share-of-total pie over q_share_of_total — the market-cap
    * distribution panel shape (`dashboard.py:149-156`). */
  def sharePie(spark: SparkSession, dir: String): String = {
    val items = Registry.byName("q_share_of_total").fn(spark, dir)
      .select("event_type", "total_value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy(_._1).toSeq
    Svg.pieChart(items, "Share of total value")
  }

  /** Top-N total-value bars from q_dashboard — the live dashboard's
    * volume-bar panel shape. */
  def totalValueBars(spark: SparkSession, dir: String, n: Int = 8): String = {
    val items = Registry.byName("q_dashboard").fn(spark, dir)
      .select("user_id", "total_value")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(-_._2).take(n)
      .map(t => (s"u${t._1}", t._2)).toSeq
    Svg.barChart(items, "Top users by total value", "total value")
  }
}
