package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data profiling — the ANALYZE-style one-pass column statistics sweep
  * every curation pipeline runs before touching a new corpus drop:
  * null counts, distinct cardinalities, and min/max per column, all
  * out of ONE aggregate over the table (never one scan per column).
  *
  * Scale notes: multiple exact COUNT(DISTINCT)s in one aggregate plan
  * as a single Expand (+1 row copy per distinct column) feeding one
  * shuffle — the standard exact plan. At 100 TB you flip the exact
  * distincts to `approx_count_distinct` (q19's contract) and the
  * Expand disappears; everything else in the pass is a plain
  * partial+final aggregate.
  */
object ProfileQueries {

  private val cols = Seq("doc_id", "lang", "n_chars", "source", "text")

  /** q85: profile every column of `documents` into tidy rows
    * (column_name, n_null, n_distinct, min_val, max_val) — min/max
    * surfaced as strings so one schema carries all column types
    * (cast AFTER the aggregate, so numeric columns keep numeric
    * ordering).
    */
  def q85Profile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    docs.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_null, n_distinct, min_val, max_val)")
      .orderBy("column_name")
  }

  val q85Sql: String = cols.map { c =>
    s"""SELECT '$c' AS column_name,
       |  COUNT(*) - COUNT($c) AS n_null,
       |  COUNT(DISTINCT $c) AS n_distinct,
       |  min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
       |FROM documents""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_profile" -> (q85Profile _),
  )

  val oracle: Map[String, String] = Map(
    "q85_profile" -> q85Sql,
  )
}
