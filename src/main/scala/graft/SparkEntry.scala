package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.CoreQueries.q13RevenueByNation(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.CoreQueries.entries ++
      operators.TextQueries.entries ++
      operators.DedupQueries.entries ++
      operators.VectorQueries.entries ++
      operators.IngestQueries.entries ++
      operators.MultimodalQueries.entries ++
      operators.PipelineQueries.entries ++
      operators.QualityQueries.entries ++
      operators.SearchQueries.entries ++
      operators.SamplingQueries.entries ++
      operators.TemporalQueries.entries ++
      operators.SketchQueries.entries ++
      operators.SkewTools.entries ++
      operators.IncrementalQueries.entries ++
      operators.ProfileQueries.entries ++
      operators.LayoutQueries.entries ++
      operators.GraphQueries.entries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.CoreQueries.oracle ++
      operators.TextQueries.oracle ++
      operators.DedupQueries.oracle ++
      operators.VectorQueries.oracle ++
      operators.IngestQueries.oracle ++
      operators.MultimodalQueries.oracle ++
      operators.PipelineQueries.oracle ++
      operators.QualityQueries.oracle ++
      operators.SearchQueries.oracle ++
      operators.SamplingQueries.oracle ++
      operators.TemporalQueries.oracle ++
      operators.SketchQueries.oracle ++
      operators.SkewTools.oracle ++
      operators.IncrementalQueries.oracle ++
      operators.ProfileQueries.oracle ++
      operators.LayoutQueries.oracle ++
      operators.GraphQueries.oracle
}
