package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
