package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed iterative graph primitives for dedup clustering.
  *
  * A training-data pipeline rarely stops at near-dup PAIRS: the edges
  * are clustered into groups and one canonical document per group
  * survives. The clustering step is connected components — here as
  * min-label propagation with pointer compression, the join-based
  * formulation that scales to edge sets far beyond one machine
  * (the same algorithmic family as large-star/small-star; converges
  * in O(log n) rounds on real graphs thanks to the compression step).
  */
object GraphOps {

  /** Connected components over an undirected edge list.
    *
    * @param nodes one `id` column, every vertex (isolated vertices
    *              become their own singleton component)
    * @param edges `src`/`dst` columns (undirected; one orientation
    *              suffices)
    * @return (id, comp) where comp = min vertex id in the component
    *
    * Each round: (1) every vertex takes the min label among itself and
    * its neighbors (one shuffle on vertex id); (2) labels compress one
    * pointer-hop (labels are vertex ids, so a self-join resolves
    * label → label's label). Convergence = label sum unchanged (labels
    * only ever decrease; summed as decimal so the test cannot overflow
    * at any vertex-id scale). Per-round state is one (id, comp) row
    * per vertex, persisted and swapped — nothing grows with iteration
    * count except the logical plan, and rounds are logarithmic.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIterations: Int = 50): DataFrame = {
    val spark = nodes.sparkSession
    val e2 = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Size the loop's shuffles to the LABEL table (one ~16-byte row per
    // vertex, ~2M rows/partition ≈ 32 MB), and run the rounds without
    // AQE: each round's frames are tiny relative to the corpus, and at
    // that size the cost is pure scheduling — AQE turns every shuffle
    // stage into its own job, which multiplied wall time ~4× here. At
    // 1e9 vertices this still yields hundreds of partitions — the
    // setting follows the data, it does not assume smallness.
    val nVertices = nodes.count()
    if (nVertices == 0) { // empty graph: avoid the loop entirely (the
      e2.unpersist()      // convergence sum over zero rows is NULL)
      return nodes.select(col("id"), col("id").as("comp"))
    }
    val loopParts = math.max(1L, nVertices / 2000000L).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try connectedComponentsLoop(nodes, e2, maxIterations)
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      e2.unpersist()
    }
  }

  private def connectedComponentsLoop(nodes: DataFrame, e2: DataFrame,
      maxIterations: Int): DataFrame = {
    // localCheckpoint (not persist): `m` below is referenced TWICE per
    // round, so without lineage truncation the LOGICAL plan doubles
    // every iteration and Catalyst analysis goes exponential long
    // before the data does — the classic iterative-DataFrame trap.
    // Each round's state restarts from a LogicalRDD of constant size.
    var labels = nodes.select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).collect()(0)
        .getDecimal(0)
    var lastSum = labelSum(labels)
    // one propagation round: (1) every vertex takes the min label among
    // itself and its neighbors; (2) labels compress one pointer-hop
    // (labels are vertex ids, so a self-join resolves label → label's
    // label — one post-agg row per vertex, which AQE auto-broadcasts at
    // small scale and shuffle-joins at cluster scale)
    def round(labels: DataFrame): DataFrame = {
      val viaNeighbors = e2
        .join(labels.select(col("id").as("src"), col("comp")), Seq("src"))
        .select(col("dst").as("id"), col("comp"))
      val m = labels.unionByName(viaNeighbors)
        .groupBy("id").agg(min("comp").as("comp"))
      val parent = m.select(col("id").as("comp"), col("comp").as("pcomp"))
      m.join(parent, Seq("comp"), "left")
        .select(col("id"), coalesce(col("pcomp"), col("comp")).as("comp"))
    }
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      // exactly ONE round per materialization: the round references its
      // aggregate twice, so chaining un-materialized rounds re-evaluates
      // the inner subtree per reference (measured 2× slower) — the
      // checkpoint is what makes each round's work linear
      val next = round(labels)
        .localCheckpoint(false) // lazy: the labelSum action below both
                                // materializes it and truncates lineage
      val s = labelSum(next)
      labels = next
      converged = s.compareTo(lastSum) == 0
      lastSum = s
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG")) println(s"[cc] round $iter sum=$s")
    }
    labels
  }
}
