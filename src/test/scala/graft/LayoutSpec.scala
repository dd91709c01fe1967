package graft

import graft.operators.{AnnOps, DedupOps, LayoutOps, TextOps}
import graft.sources.LayoutStore
import org.apache.spark.sql.DataFrame

/** D36 persisted layouts: the write → catalog-death → re-register →
  * serve lifecycle, with parity against the session-built operators
  * and the physical-plan properties the bucketing exists for (bucket
  * pruning on probes, exchange elision on co-keyed joins).
  */
class LayoutSpec extends GraftSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  /** Run `body` with every layout family freshly purged, simulating a
    * first-ever deployment build; purge again after so repeated sbt
    * test runs never serve a stale layout from spark-warehouse.
    */
  private def withCleanLayouts[T](body: => T): T =
    try { LayoutOps.purgeAll(spark, Sf); body }
    finally LayoutOps.purgeAll(spark, Sf)

  test("layout lifecycle: written once, catalog-served, re-registered over surviving files after catalog death") {
    withCleanLayouts {
      assert(LayoutOps.ensure(spark, Sf, "postings") == "written")
      assert(LayoutOps.ensure(spark, Sf, "postings") == "catalog")

      val sessionBuilt = rows(TextOps.invertedPostings(spark, Sf))

      // simulate the JVM restart: catalog entries die, files survive,
      // and the session memo (every derived frame) is gone
      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      assert(LayoutOps.ensure(spark, Sf, "postings") == "reregistered")

      val served = rows(LayoutOps.postingsServed(spark, Sf))
      assert(served == sessionBuilt)
    }
  }

  test("layout_ann_graph hop builds scan the persisted layout tables (audit-exemption backing)") {
    // ExplainAudit exempts layout_ann_graph from the must-scan-layout
    // check because its FINAL serve plan is a heap over memoized
    // re-rooted hop pins; this test backs the exemption (r15 judge #3):
    // the frames the hop builds walk over must read graft_layout_v
    // tables, and a serve whose beam memos were dropped (so the hop
    // builds re-run against the tables) must equal the session twin.
    withCleanLayouts {
      Seq("graph_adj", "graph_down", "graph_anchors").foreach { fam =>
        val plan = LayoutOps.table(spark, Sf, fam)
          .queryExecution.executedPlan.toString
        assert(plan.contains("graft_layout_v"),
          s"layout family $fam does not scan its persisted table")
      }
      Memo.invalidatePrefix(spark, s"layoutGraphBeam:$Sf:")
      val served = rows(LayoutOps.annGraphServed(spark, Sf))
      val twin = rows(AnnOps.annGraph(spark, Sf))
      assert(served == twin,
        "layout graph serve diverged from the session-built walk")
    }
  }

  test("postings_incremental: delta merge == full rebuild, restart parity, base untouched") {
    withCleanLayouts {
      val fullRebuild = rows(TextOps.invertedPostings(spark, Sf))
      val merged = rows(TextOps.postingsIncremental(spark, Sf))
      assert(merged == fullRebuild,
        "incremental postings merge diverges from the full rebuild")
      // the merge never rewrites the base layout: serving it again is
      // a catalog hit, and a catalog death re-registers over the same
      // surviving files — the daily-delta restart path
      assert(LayoutOps.ensure(spark, Sf, "postings_base") == "catalog")
      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      assert(LayoutOps.ensure(spark, Sf, "postings_base") == "reregistered")
      assert(rows(TextOps.postingsIncremental(spark, Sf)) == fullRebuild)
    }
  }

  test("doc_pareto_incremental: maintained front == full skyline, restart parity") {
    import graft.operators.CurationOps
    withCleanLayouts {
      val full = rows(CurationOps.paretoFront(spark, Sf))
      assert(rows(CurationOps.paretoIncremental(spark, Sf)) == full,
        "maintained front diverges from the full skyline")
      // the standing front is persisted, tiny, and restart-servable
      assert(LayoutOps.ensure(spark, Sf, "pareto_front") == "catalog")
      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      assert(LayoutOps.ensure(spark, Sf, "pareto_front") == "reregistered")
      assert(rows(CurationOps.paretoIncremental(spark, Sf)) == full)
    }
  }

  test("z-order rectangle probe: partition pruning, lossless cover, restart parity") {
    import graft.operators.ZOrderOps
    import org.apache.spark.sql.functions.col
    withCleanLayouts {
      assert(ZOrderOps.ensure(spark, Sf) == (("written", "written")))
      val probe = ZOrderOps.rectProbe(spark, Sf)
      // pruning is PARTITION-level (file listing), not a post-scan filter
      val plan = probe.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      assert(plan.contains("PartitionFilters") && plan.contains("zp"),
        "rectangle probe lost its partition filter")
      // ...and the cover genuinely skips cells on this fixture
      val zTable = ZOrderOps.tableNames(Sf)(1) // the partitioned events layout
      val allZp = spark.table(zTable).select("zp").distinct().count()
      val m = spark.table(ZOrderOps.tableNames(Sf).head).first()
      val cover = ZOrderOps.coveringZp(m.getAs[Long]("tmin"),
        m.getAs[Long]("tmax"), m.getAs[Double]("vmin"),
        m.getAs[Double]("vmax"),
        java.sql.Timestamp.valueOf(ZOrderOps.RectT1).getTime,
        java.sql.Timestamp.valueOf(ZOrderOps.RectT2).getTime,
        ZOrderOps.RectV1, ZOrderOps.RectV2)
      assert(cover.size < allZp / 2,
        s"cover ${cover.size} cells of $allZp — no skipping happening")
      // lossless: the served rows == the plain full-scan rectangle
      val direct = rows(Tables.events(spark, Sf)
        .filter(col("ts") >= ZOrderOps.RectT1 && col("ts") < ZOrderOps.RectT2 &&
          col("value") >= ZOrderOps.RectV1 && col("value") < ZOrderOps.RectV2)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id"))
      val served = rows(probe)
      assert(served == direct && direct.nonEmpty)
      // restart: catalog death, files survive, probe unchanged
      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      assert(ZOrderOps.ensure(spark, Sf) ==
        (("reregistered", "reregistered")))
      assert(rows(ZOrderOps.rectProbe(spark, Sf)) == direct)
    }
  }

  test("retention purge rewrites ONLY the covering cells — the rest are untouched bytes") {
    import graft.operators.ZOrderOps
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    withCleanLayouts {
      ZOrderOps.ensure(spark, Sf)
      val modelT = ZOrderOps.tableNames(Sf).head
      val baseT = ZOrderOps.tableNames(Sf)(1)
      val purgedT = ZOrderOps.tableNames(Sf)(2)
      val m = spark.table(modelT).first()
      val cover = ZOrderOps.coveringZp(m.getAs[Long]("tmin"),
        m.getAs[Long]("tmax"), m.getAs[Double]("vmin"),
        m.getAs[Double]("vmax"), ZOrderOps.msOf(ZOrderOps.PurgeT1),
        ZOrderOps.msOf(ZOrderOps.PurgeT2),
        Double.MinValue, Double.MaxValue).toSet
      ZOrderOps.retentionPurge(spark, Sf)
      def cellFiles(table: String): Map[Long, Seq[(String, String)]] = {
        val root = Paths.get(LayoutStore.location(spark, table))
        val it = Files.list(root)
        try it.iterator().asScala.toSeq
          .filter(p => p.getFileName.toString.startsWith("zp="))
          .map { d =>
            val c = d.getFileName.toString.stripPrefix("zp=").toLong
            val fit = Files.list(d)
            val fs = try fit.iterator().asScala.toSeq
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .map(f => f.getFileName.toString ->
                java.util.Base64.getEncoder.encodeToString(
                  java.security.MessageDigest.getInstance("MD5")
                    .digest(Files.readAllBytes(f))))
              .sortBy(_._1)
            finally fit.close()
            c -> fs
          }.filter(_._2.nonEmpty).toMap // empty dirs hold no data
        finally it.close()
      }
      val base = cellFiles(baseT)
      val purged = cellFiles(purgedT)
      // only cells inside the cover may vanish (fully-purged cells
      // lose their directory — that IS the delete)
      assert(purged.keySet.subsetOf(base.keySet))
      assert((base.keySet -- purged.keySet).subsetOf(cover))
      val untouched = base.keySet -- cover
      assert(cover.intersect(base.keySet).nonEmpty && untouched.nonEmpty)
      // untouched cells: identical file NAMES and identical BYTES —
      // the purge never listed, read, or rewrote them
      untouched.foreach(c => assert(purged(c) == base(c),
        s"cell $c was rewritten though outside the purge cover"))
      // covered cells holding purged rows really were rewritten
      assert(cover.intersect(base.keySet).exists(c => purged(c) != base(c)))
    }
  }

  test("bloom point lookup: no false negatives, real pruning, restart parity") {
    import graft.operators.ZOrderOps
    import org.apache.spark.sql.functions.col
    withCleanLayouts {
      val first = rows(ZOrderOps.pointLookup(spark, Sf)) // builds all tables
      assert(first.nonEmpty)
      val zTable = ZOrderOps.tableNames(Sf)(1)
      val truth = spark.table(zTable)
        .select(col("event_id"), col("zp").cast("long")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val totalCells = truth.values.toSet.size
      val bloom = spark.table(ZOrderOps.tableNames(Sf)(3)).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      def cands(id: Long): Seq[Long] = {
        val wm = ZOrderOps.bloomPositions(id)
          .map(p => (p / 64L, 1L << (p % 64)))
          .groupBy(_._1).view.mapValues(_.map(_._2).reduce(_ | _)).toMap
        truth.values.toSet.toSeq.filter(zp => wm.forall { case (w, m) =>
          (bloom.getOrElse((zp, w), 0L) & m) == m })
      }
      val ids = truth.keys.toSeq.sorted.grouped(5).map(_.head).take(200).toSeq
      ids.foreach { id =>
        assert(cands(id).contains(truth(id)), s"bloom dropped id $id's cell")
      }
      val mean = ids.map(cands(_).size).sum.toDouble / ids.size
      assert(mean < totalCells / 4.0,
        s"mean candidate cells $mean of $totalCells — no pruning")
      // the operator's own driver-side path agrees with the pure math
      val opCands = ZOrderOps.candidateCells(spark, Sf, ids.head)
      assert(opCands == cands(ids.head).sorted)
      // restart: catalog death, files survive
      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      assert(rows(ZOrderOps.pointLookup(spark, Sf)) == first)
    }
  }

  test("served more-like-this over reloaded shingle postings == session doc_similar on anchors") {
    withCleanLayouts {
      val anchorSet = rows(TextOps.docSimilar(spark, Sf)
        .filter(org.apache.spark.sql.functions.col("a_id") % 20 === 3))
      assert(LayoutOps.ensure(spark, Sf, "shingle_postings") == "written")

      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      assert(LayoutOps.ensure(spark, Sf, "shingle_postings") == "reregistered")
      assert(rows(LayoutOps.docSimilarServed(spark, Sf)) == anchorSet)
    }
  }

  test("drift served from the reloaded standing counts == session corpus_drift, across a restart") {
    withCleanLayouts {
      val session = rows(graft.operators.ProfileOps.corpusDrift(spark, Sf))
      assert(LayoutOps.ensure(spark, Sf, "drift_base") == "written")

      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      assert(LayoutOps.ensure(spark, Sf, "drift_base") == "reregistered")
      assert(rows(LayoutOps.corpusDriftServed(spark, Sf)) == session)
    }
  }

  test("serving config persisted, tuned ivfpq face defaults its nprobe from the table, across a restart") {
    withCleanLayouts {
      // the session tuner's choice and the search at that knob
      val np = AnnOps.tunedNprobe(spark, Sf, "ivfpq")
      val session = rows(AnnOps.annIvfPq(spark, Sf, nprobe = np))
      Seq("serving_config", "ivf_quantizer", "pq_book", "ivfpq_lists")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "written"))

      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      Seq("serving_config", "ivf_quantizer", "pq_book", "ivfpq_lists")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "reregistered"))
      // the restarted server resolves the SAME knob from the table…
      assert(AnnOps.tunedNprobeFrom(
        LayoutOps.servingConfigServed(spark, Sf), "ivfpq") == np)
      // …and the face defaulting from it reproduces the session search
      assert(rows(LayoutOps.annIvfPqServedTuned(spark, Sf)) == session)
    }
  }

  test("sq8 served from reloaded codes + model == session ann_sq8_rerank, across a restart") {
    withCleanLayouts {
      val session = rows(AnnOps.annSq8Rerank(spark, Sf))
      Seq("sq8_codes", "sq8_model")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "written"))

      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      Seq("sq8_codes", "sq8_model")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "reregistered"))
      assert(rows(LayoutOps.annSq8Served(spark, Sf)) == session)
    }
  }

  test("graph ANN served from reloaded adjacency + anchors == session ann_graph, across a restart") {
    withCleanLayouts {
      val session = rows(AnnOps.annGraph(spark, Sf))
      Seq("graph_adj", "graph_down", "graph_anchors")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "written"))

      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      Seq("graph_adj", "graph_down", "graph_anchors")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "reregistered"))
      assert(rows(LayoutOps.annGraphServed(spark, Sf)) == session)
    }
  }

  test("NB classification served from reloaded model tables == session classifyLang, across a restart") {
    withCleanLayouts {
      val session = rows(graft.operators.TextOps.classifyLang(spark, Sf))
      Seq("nb_counts", "nb_classes")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "written"))

      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      Seq("nb_counts", "nb_classes")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "reregistered"))
      assert(rows(LayoutOps.classifyLangServed(spark, Sf)) == session)
    }
  }

  test("filtered ANN served from reloaded labeled lists == session filteredIvf, across a restart") {
    withCleanLayouts {
      val session = rows(AnnOps.filteredIvf(spark, Sf, _ =!= 0))
      Seq("ivf_quantizer", "ivf_labeled_lists")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "written"))

      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      Seq("ivf_quantizer", "ivf_labeled_lists")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "reregistered"))
      assert(rows(LayoutOps.annFilteredServed(spark, Sf)) == session)
    }
  }

  test("RRF ensemble served from reloaded shingle postings == session doc_similar_rrf") {
    withCleanLayouts {
      val session = rows(TextOps.docSimilarRrf(spark, Sf))
      assert(LayoutOps.ensure(spark, Sf, "shingle_postings") == "written")

      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      assert(LayoutOps.ensure(spark, Sf, "shingle_postings") == "reregistered")
      assert(rows(LayoutOps.docSimilarRrfServed(spark, Sf)) == session)
    }
  }

  test("ivfpq serving from reloaded tables matches session ann_ivfpq bit-for-bit") {
    withCleanLayouts {
      val sessionBuilt = rows(AnnOps.annIvfPq(spark, Sf))
      Seq("ivf_quantizer", "pq_book", "ivfpq_lists")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "written"))

      // restart: catalog death + memo wipe, then re-register and serve
      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      Seq("ivf_quantizer", "pq_book", "ivfpq_lists")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "reregistered"))
      assert(rows(LayoutOps.annIvfPqServed(spark, Sf)) == sessionBuilt)
    }
  }

  test("residual ivfpq serving from reloaded tables matches session ann_ivfpq_res bit-for-bit") {
    withCleanLayouts {
      val sessionBuilt = rows(AnnOps.annIvfPqRes(spark, Sf))
      Seq("ivf_quantizer", "pq_book_res", "ivfpq_res_lists")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "written"))

      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      Seq("ivf_quantizer", "pq_book_res", "ivfpq_res_lists")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "reregistered"))
      assert(rows(LayoutOps.annIvfPqResServed(spark, Sf)) == sessionBuilt)
    }
  }

  test("streaming ANN serving from the persisted layout == session batch search, across a restart") {
    withCleanLayouts {
      import org.apache.spark.sql.functions.col
      val qIds = Seq(0L, 100L, 250L)
      val qVecs = Tables.embeddings(spark, Sf)
        .filter(col("vec_id").isin(qIds: _*))
        .select("vec_id", "embedding")
      // the session-memoized batch serving path is the parity target
      val expected = AnnOps.ivfPqSearch(spark, Sf, qVecs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSeq.sorted

      Seq("ivf_quantizer", "pq_book", "ivfpq_lists")
        .foreach(f => LayoutOps.ensure(spark, Sf, f))
      // the restart: catalog death + memo wipe — the stream must serve
      // from re-registered tables with no session state at all
      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)

      val d = java.nio.file.Files.createTempDirectory("ann_layout_stream")
        .toFile.getAbsolutePath
      qVecs.filter(col("vec_id") < 200).write.mode("overwrite").parquet(d)
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Double, Long)]
      val q = graft.streaming.StreamOps.annSearchStreamFromLayout(spark, Sf,
        spark.readStream.schema(qVecs.schema).parquet(d),
        (res, _) => got.synchronized {
          got ++= res.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        })
      try {
        q.processAllAvailable()
        qVecs.filter(col("vec_id") >= 200).write.mode("append").parquet(d)
        q.processAllAvailable()
        assert(got.toSeq.sorted == expected,
          s"layout-served stream ${got.length} rows vs batch ${expected.length}")
      } finally q.stop()
    }
  }

  test("streaming graph-ANN serving from the persisted layout == session batch search, across a restart") {
    withCleanLayouts {
      import org.apache.spark.sql.functions.col
      val qIds = Seq(0L, 100L, 250L)
      val qVecs = Tables.embeddings(spark, Sf)
        .filter(col("vec_id").isin(qIds: _*))
        .select("vec_id", "embedding")
      // the session-built batch serving path is the parity target
      val expected = rows(AnnOps.graphSearch(spark, Sf, qVecs))

      Seq("graph_adj", "graph_down", "graph_anchors")
        .foreach(f => LayoutOps.ensure(spark, Sf, f))
      // the restart: catalog death + memo wipe — the stream must serve
      // from re-registered tables with no session state at all
      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      Seq("graph_adj", "graph_down", "graph_anchors")
        .foreach(f => assert(LayoutOps.ensure(spark, Sf, f) == "reregistered"))

      val d = java.nio.file.Files.createTempDirectory("graph_layout_stream")
        .toFile.getAbsolutePath
      qVecs.filter(col("vec_id") < 200).write.mode("overwrite").parquet(d)
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      val q = graft.streaming.StreamOps.graphSearchStreamFromLayout(spark, Sf,
        spark.readStream.schema(qVecs.schema).parquet(d),
        (res, _) => got.synchronized { got ++= rows(res) })
      try {
        q.processAllAvailable()
        qVecs.filter(col("vec_id") >= 200).write.mode("append").parquet(d)
        q.processAllAvailable()
        assert(got.toSeq.sorted == expected.sorted,
          s"layout-served graph stream ${got.length} rows vs batch ${expected.length}")
      } finally q.stop()
    }
  }

  test("streaming graph upkeep: stream-grown graph == batch append bit-for-bit across a split, replay is a no-op") {
    withCleanLayouts {
      import org.apache.spark.sql.functions.col
      val off = AnnOps.GraphAppendIdOffset
      val expected = rows(AnnOps.annGraphAppended(spark, Sf))
      Seq("graph_adj", "graph_down", "graph_anchors", "graph_delta")
        .foreach(f => LayoutOps.ensure(spark, Sf, f))
      val delta = AnnOps.graphDelta(spark, Sf)
        .select(col("vec_id"), col("v").as("embedding"))
      val first = delta.filter((col("vec_id") - off) % 20 === 0)
      val second = delta.filter((col("vec_id") - off) % 20 =!= 0)
      val d = java.nio.file.Files.createTempDirectory("graph_upkeep")
        .toFile.getAbsolutePath
      first.write.mode("overwrite").parquet(d)
      val q = graft.streaming.StreamOps.graphUpkeepStream(spark, Sf,
        spark.readStream.schema(delta.schema).parquet(d))
      try {
        q.processAllAvailable()
        second.write.mode("append").parquet(d)
        q.processAllAvailable()
        assert(rows(LayoutOps.annGraphUpkeptServed(spark, Sf)) == expected,
          "stream-grown serve != batch append")
        // replay: re-deliver the whole first batch — the fold must be
        // exactly-once (no new delta rows, served rows unchanged)
        val t = LayoutOps.tableName(
          LayoutOps.families.find(_.name == "graph_delta").get, Sf)
        val before = graft.sources.LayoutStore.read(spark, t).count()
        first.write.mode("append").parquet(d)
        q.processAllAvailable()
        assert(graft.sources.LayoutStore.read(spark, t).count() == before,
          "replayed batch appended rows")
        assert(rows(LayoutOps.annGraphUpkeptServed(spark, Sf)) == expected)
      } finally q.stop()
    }
  }

  test("graph upkeep crash healing: a partial fold re-walks on replay, the serve dedups exactly, touched-base srcs never block arrivals") {
    withCleanLayouts {
      import org.apache.spark.sql.functions.col
      val expected = rows(AnnOps.annGraphAppended(spark, Sf))
      Seq("graph_adj", "graph_down", "graph_anchors", "graph_delta")
        .foreach(f => LayoutOps.ensure(spark, Sf, f))
      val fam = LayoutOps.families.find(_.name == "graph_delta").get
      val t = LayoutOps.tableName(fam, Sf)
      val delta = AnnOps.graphDelta(spark, Sf)
        .select(col("vec_id"), col("v").as("embedding"))
      // the on-disk state a crash mid-append leaves: HALF of one
      // arrival's forward edges persisted, the rest lost
      val victim = delta.orderBy("vec_id").limit(1)
      val vid = victim.collect()(0).getLong(0)
      val vEdges = AnnOps.graphUpkeepEdges(spark, Sf,
        LayoutOps.table(spark, Sf, "graph_adj"),
        LayoutOps.table(spark, Sf, "graph_down"),
        LayoutOps.table(spark, Sf, "graph_anchors"), victim)
      graft.sources.LayoutStore.append(spark, t,
        vEdges.filter(col("src") === vid).limit(AnnOps.GraphK / 2),
        Seq(fam.bucketKey), fam.buckets)
      // the partial fold ALSO left rev proposals' base srcs in the
      // delta in a real crash; simulate the worst case by appending
      // one rev row too — its src is a TOUCHED BASE node, which the
      // r12 guard would have treated as "folded" for any colliding id
      graft.sources.LayoutStore.append(spark, t,
        vEdges.filter(col("src") =!= vid).limit(1),
        Seq(fam.bucketKey), fam.buckets)
      val d = java.nio.file.Files.createTempDirectory("graph_heal")
        .toFile.getAbsolutePath
      delta.write.mode("overwrite").parquet(d)
      val q = graft.streaming.StreamOps.graphUpkeepStream(spark, Sf,
        spark.readStream.schema(delta.schema).parquet(d))
      try {
        q.processAllAvailable()
        // the victim re-folded (its on-disk fwd rows fell short of its
        // completion marker's count): its COMPLETE edge set is
        // present, the duplicate partials are collapsed by the
        // serve's (src,dst) dedup — served rows equal the batch twin
        // exactly. The marker self-row is guard metadata, not an edge.
        val fwd = graft.sources.LayoutStore.read(spark, t)
          .filter(col("src") === vid && col("dst") =!= vid)
          .select("dst").distinct().count()
        assert(fwd == AnnOps.GraphK, s"victim fwd degree $fwd")
        val marker = graft.sources.LayoutStore.read(spark, t)
          .filter(col("src") === vid && col("dst") === vid)
        assert(marker.select("dst").distinct().count() == 1 &&
          marker.head.getDouble(2) == AnnOps.GraphK.toDouble,
          "victim completion marker missing or wrong count")
        assert(rows(LayoutOps.annGraphUpkeptServed(spark, Sf)) == expected,
          "healed serve != batch append")
      } finally q.stop()
    }
  }

  test("graph upkeep fold completion on a small corpus: a walk reaching fewer than GraphK candidates folds ONCE, replay adds nothing") {
    // 8-vector corpus: no walk can ever reach GraphK=16 candidates,
    // so the r13 guard's fixed `fwd count >= GraphK` floor re-walked
    // (and re-appended) such arrivals on EVERY batch forever (ADVICE
    // r13). The completion marker records the fold's actual edge
    // count, so the guard converges.
    import org.apache.spark.sql.functions.col
    val tiny = java.nio.file.Files.createTempDirectory("tiny_corpus")
      .toFile.getAbsolutePath
    Tables.embeddings(spark, Sf).orderBy("vec_id").limit(8)
      .write.mode("overwrite").parquet(s"$tiny/embeddings.parquet")
    try {
      Seq("graph_adj", "graph_down", "graph_anchors", "graph_delta")
        .foreach(f => LayoutOps.ensure(spark, tiny, f))
      val t = LayoutOps.tableName(
        LayoutOps.families.find(_.name == "graph_delta").get, tiny)
      val arrival = Tables.embeddings(spark, tiny).limit(1)
        .select((col("vec_id") + AnnOps.GraphAppendIdOffset).as("vec_id"),
          col("embedding"))
      val d = java.nio.file.Files.createTempDirectory("tiny_upkeep")
        .toFile.getAbsolutePath
      arrival.write.mode("overwrite").parquet(d)
      val q = graft.streaming.StreamOps.graphUpkeepStream(spark, tiny,
        spark.readStream.schema(arrival.schema).parquet(d))
      try {
        q.processAllAvailable()
        val after1 = LayoutStore.read(spark, t).count()
        val marker = LayoutStore.read(spark, t)
          .filter(col("src") === col("dst")).collect()
        assert(marker.length == 1, s"expected one marker, ${marker.length}")
        val nFwd = marker(0).getDouble(2)
        assert(nFwd > 0 && nFwd < AnnOps.GraphK,
          s"tiny corpus must fold fewer than GraphK edges, got $nFwd")
        // re-deliver the same arrival twice: the fold is complete, so
        // the guard must drop it both times (the old floor re-walked
        // and re-appended here, growing the delta per batch)
        (1 to 2).foreach { _ =>
          arrival.write.mode("append").parquet(d)
          q.processAllAvailable()
        }
        assert(LayoutStore.read(spark, t).count() == after1,
          "replayed small-corpus arrival re-appended its fold")
      } finally q.stop()
    } finally LayoutOps.purgeAll(spark, tiny)
  }

  test("streaming line dedup from the persisted digest layout == direct path, across a restart") {
    withCleanLayouts {
      import org.apache.spark.sql.functions.{col, lit}
      val incoming = Tables.documents(spark, Sf)
        .filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"), col("text"),
          lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")).as("ts"))
      // expected digest set via the session (memoized-corpus) path
      val d0 = java.nio.file.Files.createTempDirectory("lines_lay0")
        .toFile.getAbsolutePath
      incoming.write.mode("overwrite").parquet(d0)
      val q0 = graft.streaming.StreamOps.dedupLinesStreamFor(spark, Sf,
          spark.readStream.schema(incoming.schema).parquet(d0),
          watermark = "1 hour")
        .writeStream.format("memory").queryName("lines_lay0")
        .outputMode("append").start()
      val expected = try {
        q0.processAllAvailable()
        spark.table("lines_lay0").select("h").collect()
          .map(_.getString(0)).toSet
      } finally q0.stop()

      LayoutOps.ensure(spark, Sf, "line_digests")
      // restart: catalog death + memo wipe — the stream must serve
      // from the re-registered table, never re-lining the corpus
      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      assert(LayoutOps.ensure(spark, Sf, "line_digests") == "reregistered")

      val d = java.nio.file.Files.createTempDirectory("lines_lay")
        .toFile.getAbsolutePath
      incoming.write.mode("overwrite").parquet(d)
      val q = graft.streaming.StreamOps.dedupLinesStreamFromLayout(spark, Sf,
          spark.readStream.schema(incoming.schema).parquet(d),
          watermark = "1 hour")
        .writeStream.format("memory").queryName("lines_lay")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("lines_lay").select("h").collect()
          .map(_.getString(0)).toSet
        assert(got == expected,
          s"layout-served ${got.size} digests vs direct ${expected.size}")
        assert(expected.nonEmpty)
      } finally q.stop()
    }
  }

  test("served phrase search prunes each term's scan to its bucket") {
    withCleanLayouts {
      LayoutOps.ensure(spark, Sf, "postings_pos")
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val served = LayoutOps.phraseServed(spark, Sf)
      val plan = served.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val ms = sel.findAllMatchIn(plan).toSeq
      assert(ms.nonEmpty, s"no bucket pruning in phrase plan:\n$plan")
      // every term branch scans at most its own bucket
      ms.foreach { m =>
        assert(m.group(1).toInt <= 1 && m.group(2).toInt == 16,
          s"expected 1 of 16 buckets per term scan, got ${m.matched}")
      }
      // and it answers exactly like the session explode
      val session = operators.TextOps.phraseSearch(spark, Sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val got = served.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == session)
    }
  }

  test("postings probe prunes to the probed terms' buckets") {
    withCleanLayouts {
      LayoutOps.ensure(spark, Sf, "postings")
      // pruning is only visible on a bucketed scan; the auto-disable
      // rule doesn't credit pruning (GraftSession turns it off for
      // serving sessions — mirror that here)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val probe = LayoutOps.postingsProbeServed(spark, Sf)
      val plan = probe.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val m = sel.findFirstMatchIn(plan).getOrElse(
        fail(s"no bucket pruning in probe plan:\n$plan"))
      assert(m.group(1).toInt <= TextOps.Bm25Terms.size &&
        m.group(2).toInt == 16,
        s"expected ≤${TextOps.Bm25Terms.size} of 16 buckets, got ${m.matched}")
      // and it still answers correctly
      assert(probe.count() == TextOps.Bm25Terms.size)
    }
  }

  test("lsh self-join over the bucketed signature table elides both exchanges") {
    withCleanLayouts {
      LayoutOps.ensure(spark, Sf, "minhash_sigs")
      val prev = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val served = LayoutOps.minhashLshServed(spark, Sf)
        val plan = served.queryExecution.executedPlan.toString
        // the self-join must reuse the persisted clustering: below the
        // join node (its children are everything printed after it)
        // there may be Sorts but NO Exchange; the pair-aggregation and
        // global orderBy above it legitimately shuffle
        val joinAt = plan.indexOf("SortMergeJoin")
        assert(joinAt >= 0, s"expected a sort-merge self-join:\n$plan")
        val subtree = plan.substring(joinAt)
        assert(!subtree.contains("Exchange"),
          s"bucketed LSH self-join still shuffles its inputs:\n$plan")
        // parity with the session-built operator
        Memo.clear(spark)
        assert(rows(served) == rows(DedupOps.dedupMinhashLsh(spark, Sf)))
      } finally {
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", prev)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      }
    }
  }

  test("manifest probe resolves delta verdicts from the persisted keeper map alone") {
    withCleanLayouts {
      LayoutOps.ensure(spark, Sf, "corpus_ck")
      LayoutOps.dropCatalogEntries(spark, Sf)
      Memo.clear(spark)
      assert(LayoutOps.ensure(spark, Sf, "corpus_ck") == "reregistered")
      val probe = LayoutOps.manifestProbeServed(spark, Sf)
      val got = probe.collect()
      assert(got.nonEmpty)
      // every incoming doc gets a verdict; keeper present iff dup
      assert(got.forall(r => r.getBoolean(1) == !r.isNullAt(2)))
      // spot-check against first principles: a doc is an exact dup iff
      // its md5 exists in the corpus split
      val docs = Tables.documents(spark, Sf)
      import org.apache.spark.sql.functions._
      val corpusCks = docs.filter(col("doc_id") % 10 =!= 7)
        .select(md5(col("text"))).collect().map(_.getString(0)).toSet
      val incoming = docs.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"), md5(col("text"))).collect()
        .map(r => r.getLong(0) -> corpusCks(r.getString(1))).toMap
      assert(got.forall(r => incoming(r.getLong(0)) == r.getBoolean(1)))
    }
  }

  test("geometry tag is part of the table name: a changed geometry can never serve a stale layout") {
    val fam = LayoutOps.families.find(_.name == "ivfpq_lists").get
    val name = LayoutOps.tableName(fam, Sf)
    assert(name.contains(s"m${AnnOps.DefaultM}") &&
      name.contains(s"s${AnnOps.PqS}k${AnnOps.PqK}"))
  }
}
