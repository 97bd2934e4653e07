package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.rag.AnnIndex
import graft.store.SnapshotStore

/** MLlib-LSH ANN index + partitioned snapshot layout. */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("LSH index recalls the exact top neighbor for most probes") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val index = AnnIndex.build(emb, numHashTables = 6, bucketLength = 1.0)
    import graft.functions.VectorFunctions.dotFold
    val probes = emb.filter(col("vec_id") < 10).collect()
    var hits = 0
    probes.foreach { row =>
      val vid = row.getLong(0)
      val vec = row.getSeq[Float](1).toArray
      // exact best neighbor by cosine
      val exact = emb.filter(col("vec_id") =!= vid)
        .withColumn("cos", dotFold(col("embedding"), typedlit(vec.toSeq)))
        .orderBy(desc("cos")).limit(1).collect()(0).getLong(0)
      val approx = index.query(vec, 5).filter(col("id") =!= vid)
        .collect().map(_.getLong(0))
      if (approx.contains(exact)) hits += 1
    }
    // LSH is approximate: require strong-but-not-perfect recall
    assert(hits >= 7, s"recall@5 too low: $hits/10")
  }

  test("IVF-Flat: recall rises with nprobe, all-lists = exact, probes prune") {
    import graft.functions.VectorFunctions.dotFold
    import graft.rag.IvfIndex
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lists = 16
    val index = IvfIndex.build(emb, lists = lists)
    assert(index.centroids.length == lists)
    val qv = emb.filter(col("vec_id") === 7).collect()(0).getSeq[Float](1).toArray
    val exact = emb.filter(col("vec_id") =!= 7)
      .withColumn("cos", dotFold(col("embedding"), typedlit(qv.toSeq)))
      .orderBy(desc("cos"), asc("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    def recallAt(nprobe: Int): Double = {
      val got = index.query(qv, 11, nprobe).filter(col("id") =!= 7)
        .limit(10).collect().map(_.getLong(0)).toSet
      got.intersect(exact).size / 10.0
    }
    val r1 = recallAt(1); val r4 = recallAt(4); val rAll = recallAt(lists)
    assert(r1 <= r4 && r4 <= rAll, s"recall not monotone: $r1 $r4 $rAll")
    assert(rAll == 1.0, s"probing every list must equal exact, got $rAll")
    // a probe reads a strict subset of the corpus
    val probed = index.table
      .filter(col("list_id").isin(index.probeLists(qv, 1): _*)).count()
    assert(probed < emb.count(), "nprobe=1 must not scan the whole corpus")
  }

  test("multi-probe cells: recall rises with probes, all-cells = exact") {
    import graft.functions.VectorFunctions._
    val planes = 6
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cells = emb.withColumn("cell", hyperplaneSignature(col("embedding"), planes))
    val qv = emb.filter(col("vec_id") === 7).collect()(0).getSeq[Float](1).toArray
    def top10(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("vec_id") =!= 7)
        .withColumn("cos", dotFold(col("embedding"), typedlit(qv.toSeq)))
        .orderBy(desc("cos"), asc("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    val exact = top10(emb)
    def recallAt(probes: Int): Double = {
      val pc = multiProbeCellsLocal(qv, planes, probes)
      assert(pc.length == math.min(probes, 1 << planes) && pc.distinct == pc)
      top10(cells.filter(col("cell").isin(pc: _*))).intersect(exact).size / 10.0
    }
    // first probe is always the query's own cell
    assert(multiProbeCellsLocal(qv, planes, 1) ==
      Seq(hyperplaneSignatureLocal(qv, planes)))
    val r1 = recallAt(1); val r8 = recallAt(8); val rAll = recallAt(1 << planes)
    assert(r1 <= r8 && r8 <= rAll, s"recall not monotone: $r1 $r8 $rAll")
    assert(rAll == 1.0, s"probing every cell must equal exact, got $rAll")
    assert(r8 > r1, s"multi-probe should recover cross-cell neighbors here " +
      s"(r1=$r1 r8=$r8)") // data-dependent but pinned: vec 7's top-10 spans cells
  }

  test("IVF-PQ ADC scan (q86): deterministic, sane recall, faithful codes") {
    import graft.operators.VectorQueries
    val dir = "/root/testdata/sf0.001"
    val pq = VectorQueries.q86AnnIvfPq(spark, dir).collect()
    assert(pq.length == 10)
    // deterministic across runs
    val pq2 = VectorQueries.q86AnnIvfPq(spark, dir).collect()
    assert(pq.map(_.toSeq).toSeq == pq2.map(_.toSeq).toSeq)
    // every code is a valid codebook id
    pq.foreach { r =>
      (1 to 4).foreach(i => assert(r.getLong(i) >= 0 && r.getLong(i) < 16))
    }
    // unit vectors: L2² = 2 - 2·cos, so PQ's L2 ranking approximates
    // the exact cosine ranking; seeded (unrefined) codebooks give
    // partial recall — measured 3/10 here, pinned at ≥ 2.
    val exact = VectorQueries.q40AnnBruteForce(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val overlap = pq.map(_.getLong(0)).count(exact.contains)
    assert(overlap >= 2, s"PQ recall@10 collapsed: $overlap/10")
  }

  test("ann cosine matches exact cosine for returned neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = AnnIndex.build(emb)
    val probe = emb.filter(col("vec_id") === 0).collect()(0)
      .getSeq[Float](1).toArray
    import graft.functions.VectorFunctions.dotFold
    val res = index.query(probe, 3)
      .join(emb, col("id") === col("vec_id"))
      .withColumn("exact", dotFold(col("embedding"), typedlit(probe.toSeq)))
      .withColumn("diff", abs(col("cosine") - col("exact")))
    // d^2 = 2 - 2cos identity holds to float rounding
    assert(res.agg(max("diff")).collect()(0).getDouble(0) < 1e-5)
  }

  test("partitioned snapshot write prunes by partition column") {
    import spark.implicits._
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-part").toString)
    val df = Seq((1, 2022, "a"), (2, 2023, "b"), (3, 2023, "c"))
      .toDF("id", "year", "v")
    store.write("cases_by_year", df, partitionCols = Seq("year"))
    val back = store.read("cases_by_year").get
    assert(back.count() == 3)
    val pruned = back.filter(col("year") === 2023)
    assert(pruned.count() == 2)
    // partition pruning: the filter runs against the directory layout,
    // not the data (inputFiles reflects the pre-pruning relation, so
    // inspect the scan's PartitionFilters instead)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2023"), scan)
  }
}
