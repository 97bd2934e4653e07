package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Manual skew-mitigation tools, for the cases AQE's runtime skew-join
  * splitting cannot reach (e.g. a non-sort-merge join, or a key so hot
  * one task would still own it after splitting).
  *
  * Salting trades one skewed shuffle for `salts`× replication of the
  * small side: the big side's rows scatter across salt buckets by a
  * DETERMINISTIC hash of a tiebreak column (reproducible runs — no
  * rand()), the small side replicates to every bucket, and the join
  * key becomes (key, salt). Results are identical to the unsalted
  * join; only the task-size distribution changes.
  */
object SkewTools {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * `tiebreak` must be a column of `big` with high cardinality (e.g.
    * a row id); it drives the deterministic salt assignment.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      tiebreak: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(tiebreak), lit(salts)))
    val saltedSmall = small
      .withColumn("_salt", explode(typedlit((0 until salts).map(_.toLong))))
    saltedBig.join(saltedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** The salted join as an oracled query: events carry only ~5 distinct
    * `event_type` values — the textbook hot-key join, where an unsalted
    * shuffle hands one task a fifth of a 100 TB fact table. Each event
    * is enriched with its type's corpus share through an 8-way
    * [[saltedJoin]] (shuffle key `(event_type, _salt)` → 40 balanced
    * buckets instead of 5 hot ones), then re-aggregated. The oracle is
    * the PLAIN join — salting must be result-invisible, and the hash
    * gate proves it. The small side carries a SHUFFLE_HASH hint so the
    * salted SHUFFLE join actually executes (a broadcast join has no
    * skew to fix and would silently bypass the salt).
    */
  def q78SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val dim = e.groupBy("event_type").agg(count(lit(1)).as("type_n"))
      .hint("shuffle_hash")
    saltedJoin(e, dim, "event_type", tiebreak = col("event_id"), salts = 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum((col("value") * col("type_n")).cast("decimal(18,4)"))
          .cast("double").as("weighted"))
      .orderBy("event_type")
  }

  val q78Sql: String =
    """WITH dim AS (
      |  SELECT event_type, COUNT(*) AS type_n FROM events GROUP BY event_type)
      |SELECT e.event_type, COUNT(*) AS n,
      |  SUM((e.value * d.type_n)::DECIMAL(18,4))::DOUBLE AS weighted
      |FROM events e JOIN dim d USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_salted_join" -> (q78SaltedJoin _),
  )

  val oracle: Map[String, String] = Map(
    "q78_salted_join" -> q78Sql,
  )
}
