package graft.cli

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.api.GraftApi
import graft.ingest.IngestJob
import graft.quality.QualityReport
import graft.rag.{HashingEmbedder, RagPipeline}
import graft.store.SnapshotStore

/** Command-line entry mirroring the reference's three CLIs
  * (ingest.py / rag.py / data_quality.py) over a SnapshotStore.
  *
  *   ingest <json-file> --store <dir>          (ingest.py main)
  *   backfill --store <dir>                    (rag.py backfill)
  *   search --store <dir> --q <text> [--k N]   (rag.py search)
  *   report --store <dir> [--run-id N]         (data_quality.py; exit code = gate)
  *   list --store <dir> [--judge J] [--year Y] (GET /cases)
  *   get --store <dir> <case_number>           (GET /cases/{cn})
  *   serve --store <dir> [--port N]            (uvicorn api:app — HTTP layer)
  *
  * Store-maintenance commands (no reference equivalent — Postgres does
  * these inside the engine; a snapshot store surfaces them):
  *
  *   vacuum --store <dir> [--table T] [--keep N]        drop old versions
  *   compact --store <dir> [--table T] [--max-files N]  merge small files
  *   changes --store <dir> --table T --from V --to V --keys k1,k2  CDC diff
  *   forget --store <dir> --case-numbers a,b             expunge dockets
  *   follow --store <dir> --table T [--index postings|ann|neardup|rag]
  *          [--lww] [--fold-every N] [--fold-max-buckets N]  CDC catch-up
  *          (segment maintenance by default; --lww = whole-bucket mode)
  */
object GraftCli {

  private def opt(args: Array[String], name: String): Option[String] =
    args.sliding(2).collectFirst { case Array(`name`, v) => v }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: <ingest|backfill|search|report|list|get> ...")
    val spark = GraftSession.get()
    try sys.exit(dispatch(spark, args))
    finally spark.stop()
  }

  private[graft] def dispatch(spark: SparkSession, args: Array[String]): Int = {
    val storeDir = opt(args, "--store").getOrElse("/tmp/graft-store")
    // --evolve-schema: opt-in additive schema evolution on every merge
    // this invocation performs (the store-level flag; see SnapshotStore)
    val store = new SnapshotStore(spark, storeDir,
      allowSchemaEvolution = args.contains("--evolve-schema"))
    args(0) match {
      case "ingest" =>
        val file = args(1)
        val runId = store.read("ingest_runs")
          .map(_.count()).getOrElse(0L) + 1
        val ts = new Timestamp(System.currentTimeMillis())
        val prior = store.read("cases").map(_.select("case_number"))
        val r = IngestJob.run(spark, IngestJob.readRaw(spark, file), runId,
          file.split('/').last, file, ts, prior)
        // the SAME merge choreography as the streaming commit (shared
        // code — the two ingest entrances can never drift in layout)
        graft.streaming.StreamingIngest.mergeResult(store, r)
        store.append("ingest_runs", r.runLedger)
        if (!r.quarantine.isEmpty) {
          // the reference's per-run JSONL quarantine file
          // (ingest.py:170-202): one JSON object per line, envelope
          // field order = schema order
          r.quarantine.write.mode("overwrite")
            .json(s"$storeDir/quarantine_jsonl/ingest_run_$runId")
        }
        // FTS index maintenance in the same run (the GIN index on
        // cases.docket_text, schema.sql:141) — LWW on the case
        // surrogate id, the exact call the streaming commit makes
        locally {
          import org.apache.spark.sql.functions.{coalesce, col, lit}
          graft.streaming.StreamingPostings.processBatch(store,
            r.cases.select(col("id").as("doc_id"),
              coalesce(col("docket_text"), lit("")).as("text")), runId)
        }
        // the reference's JSON summary (ingest.py:768-773)
        println(
          s"""{"run_id": ${r.summary.runId}, "summary": {"read": ${r.summary.read}, "inserted": ${r.summary.inserted}, "updated": ${r.summary.updated}, "failed": ${r.summary.failed}}}""")
        0

      case "backfill" =>
        val cases = store.read("cases").getOrElse(sys.error("no cases ingested"))
        val existing = store.read("case_chunk_embeddings")
        // materialize once: counted, appended, AND index-merged below
        val delta = RagPipeline.backfill(cases, existing, HashingEmbedder())
          .localCheckpoint(true)
        val n = delta.count()
        if (n > 0) {
          val materialized = delta
          // bucketed layout: the append lands in the delta's own
          // case_bucket dirs; untouched buckets carry forward
          RagPipeline.ensureCaseBucketed(store, "case_chunk_embeddings")
          store.append("case_chunk_embeddings",
            RagPipeline.withCaseBucket(materialized),
            partitionCols = Seq("case_bucket"))
          // keep the stored chunk-ANN index in step with the embedding
          // table (the reference's CREATE INDEX ... ivfflat moment,
          // rag.py:83-86) — searchDockets then probes nprobe pruned
          // lists instead of scanning every chunk. Incremental: only
          // the DELTA assigns (pgvector's insert path); first backfill
          // trains + builds.
          RagPipeline.mergeChunkIndex(store, materialized)
        }
        println(s"""{"chunks_embedded": $n}""")
        0

      case "search" =>
        val api = apiOf(spark, store)
        val k = opt(args, "--k").map(_.toInt).getOrElse(5)
        val q = opt(args, "--q").getOrElse(sys.error("--q required"))
        api.searchDockets(q, k).foreach { r =>
          println(s"${r.case_number}  ${r.best_similarity}  ${r.title}")
        }
        0

      case "report" =>
        val runId = opt(args, "--run-id").map(_.toLong)
        val runs = store.read("ingest_runs").getOrElse(sys.error("no runs"))
        val errorsOr = store.read("ingest_errors").getOrElse {
          import spark.implicits._
          Seq.empty[(Long, String, Timestamp)]
            .toDF("run_id", "error_code", "last_seen_at")
        }
        val cases = store.read("cases").getOrElse(sys.error("no cases"))
        val judges = store.read("judges").get
        val courts = store.read("courts").get
        val caseParties = store.read("case_parties").get
        val volume = QualityReport.volumeSummary(runs, runId)
        val complete = QualityReport.completeness(cases, None)
        print(QualityReport.render(volume,
          QualityReport.errorBreakdown(errorsOr, runId), complete,
          QualityReport.dateSanity(cases, errorsOr, runId),
          QualityReport.entityNormalization(judges, courts),
          QualityReport.partiesCoverage(caseParties, cases),
          QualityReport.roleHistogram(caseParties),
          QualityReport.recentDaily(runs)))
        val v = volume.collect()(0)
        val c = complete.collect()(0)
        QualityReport.exitCode(v.getLong(0), v.getLong(3), c.getLong(0),
          c.getLong(1), c.getLong(2), c.getLong(3))

      case "list" =>
        val api = apiOf(spark, store)
        api.listCases(opt(args, "--judge"), opt(args, "--year").map(_.toInt))
          .collect().foreach { c =>
            println(s"${c.case_number}  ${c.filed_date}  ${c.judge.getOrElse("-")}  ${c.title}")
          }
        0

      case "get" =>
        val api = apiOf(spark, store)
        val cn = args.drop(1).filterNot(_.startsWith("--"))
          .filterNot(a => opt(args, "--store").contains(a)).head
        api.getCase(cn) match {
          case Some(c) =>
            println(s"${c.case_number}  ${c.filed_date}  status=${c.status}")
            api.getParties(cn).foreach(p => println(s"  ${p.role}: ${p.name}"))
            0
          case None =>
            System.err.println(s"case not found: $cn"); 1
        }

      case "serve" =>
        // the reference's `uvicorn api:app --port 8000` (api.py:280-281)
        val port = opt(args, "--port").map(_.toInt).getOrElse(8000)
        val server = new graft.api.GraftHttpServer(apiOf(spark, store), port)
        server.start()
        println(s"graft api serving on http://127.0.0.1:${server.boundPort}")
        Thread.currentThread().join() // serve until killed
        0

      case "vacuum" =>
        val keep = opt(args, "--keep").map(_.toInt).getOrElse(1)
        val tables = opt(args, "--table").map(Seq(_)).getOrElse(store.tables())
        tables.foreach { t =>
          val dropped = store.vacuum(t, keep)
          println(s"""{"table": "$t", "dropped_versions": [${dropped.mkString(",")}]}""")
        }
        0

      case "compact" =>
        val maxFiles = opt(args, "--max-files").map(_.toInt).getOrElse(4)
        val tables = opt(args, "--table").map(Seq(_)).getOrElse(store.tables())
        tables.foreach { t =>
          val v = store.compact(t, maxFiles)
          println(s"""{"table": "$t", "compacted_to_version": ${v.getOrElse(null)}}""")
        }
        0

      case "forget" =>
        // expungement: erase the named dockets end-to-end (case row,
        // party links, chunks, chunk-ANN rows, docket postings, AND
        // the quarantine/error-ledger envelopes carrying the raw
        // record, including the per-run quarantine JSONL side files)
        // then vacuum so the old versions' bytes actually disappear —
        // sealed/expunged-record compliance as one command. The
        // vacuum scopes to the tables the erasure actually rewrote:
        // every other table keeps its version history (time travel,
        // the `changes` CDC surface).
        val cns = opt(args, "--case-numbers")
          .getOrElse(sys.error("--case-numbers required")).split(',').toSeq
        val before = store.read("cases").map(_.count()).getOrElse(0L)
        val report = graft.streaming.IndexDeletes.forgetCases(store, cns,
          quarantineJsonlDir = Some(s"$storeDir/quarantine_jsonl"))
        val after = store.read("cases").map(_.count()).getOrElse(0L)
        report.tables.foreach(t => store.vacuum(t, keepLast = 1))
        println(s"""{"forgotten": ${before - after}, "requested": ${cns.size}, "tables_rewritten": ${report.tables.size}}""")
        0

      case "follow" =>
        // keep a stored index in step with a base table maintained by
        // ANY writer: cursor-tracked CDC catch-up — bootstrap on first
        // touch, per-version feed steps, full resync when the feed gap
        // was vacuumed (CdcIndexMaintenance)
        val table = opt(args, "--table").getOrElse(sys.error("--table required"))
        val index = opt(args, "--index").getOrElse("postings")
        // segment (O(batch) tombstone+append) maintenance is the
        // DEFAULT since r14; --lww keeps the simple whole-bucket
        // rewrite mode, --fold-every N sets the fold cadence (8), and
        // --fold-max-buckets bounds each fold round's rewrite
        val segment = !args.contains("--lww")
        val foldEvery = opt(args, "--fold-every").map(_.toInt).getOrElse(8)
        val foldMax = opt(args, "--fold-max-buckets").map(_.toInt)
          .getOrElse(Int.MaxValue)
        val report = index match {
          case "postings" =>
            graft.streaming.CdcIndexMaintenance.followPostings(store, table,
              segment = segment, foldEvery = foldEvery,
              foldMaxBuckets = foldMax)
          case "ann" =>
            graft.streaming.CdcIndexMaintenance.followAnn(store, table,
              segment = segment, foldEvery = foldEvery,
              foldMaxLists = foldMax)
          case "neardup" =>
            graft.streaming.CdcIndexMaintenance.followNearDup(store, table)
          case "rag" =>
            graft.streaming.CdcIndexMaintenance.followRag(store, table)
          case other =>
            sys.error(s"unknown index: $other (postings|ann|neardup|rag)")
        }
        println(s"""{"index": "$index", "table": "$table", "action": "${report.action}", "applied_version": ${report.appliedVersion}, "steps": ${report.steps}}""")
        0

      case "changes" =>
        val table = opt(args, "--table").getOrElse(sys.error("--table required"))
        val from = opt(args, "--from").getOrElse(sys.error("--from required")).toLong
        val to = opt(args, "--to").getOrElse(sys.error("--to required")).toLong
        val keys = opt(args, "--keys").getOrElse(sys.error("--keys required"))
          .split(',').toSeq
        store.readChanges(table, from, to, keys) match {
          case Some(df) => df.show(1000, truncate = false); 0
          case None => System.err.println("unknown version(s)"); 1
        }

      case other => System.err.println(s"unknown command: $other"); 2
    }
  }

  private def apiOf(spark: SparkSession, store: SnapshotStore): GraftApi =
    new GraftApi(spark,
      store.read("cases").getOrElse(sys.error("no cases ingested")),
      store.read("judges").get, store.read("courts").get,
      store.read("case_types").get, store.read("parties").get,
      store.read("case_parties").get,
      store.read("case_chunk_embeddings"),
      // the store IS the search index home: docket postings (the
      // streaming ingest commit maintains them) power the
      // keyword/bm25/phrase/hybrid endpoints, the chunk-ANN tables
      // (backfill maintains them) the pruned searchDockets pool
      searchStore = Some(store))
}
