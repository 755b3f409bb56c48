package graft

import org.apache.spark.sql.functions._

/** Round-11 specs: the narrowed gid canonicalization (ADVICE r10 —
  * the old whole-line segment sort over-normalized), plus this
  * round's incremental-index and training operators.
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------- canonGid
  // RewriteDistinctAggregates' labeling freedom is exactly: which gid
  // integer tags which distinct-group projection, and the enumeration
  // order of the projections. Both must collapse; anything else on
  // the line must stay digest-visible.

  test("canonGid: the two legal gid labelings collapse to one string") {
    val a = "Expand [[a#x, null, 1], [null, b#x, 2]], [a#x, b#x, gid#x]"
    val b = "Expand [[null, b#x, 1], [a#x, null, 2]], [a#x, b#x, gid#x]"
    assert(PlanSnapshot.canonGid(a) == PlanSnapshot.canonGid(b))
  }

  test("canonGid: output-list and intermediate-key permutations collapse") {
    // the rewrite also permutes INTERIOR attributes of the Expand
    // output list and the downstream aggregate key lists (the q21
    // full-sweep residual flake) — segments outside the projection
    // region sort, so a permutation that keeps the bracket-edge
    // segments fixed collapses (two identical-code full sweeps agree
    // on all 413 digests under exactly this rule)
    val a = "Expand [[a#x, null, 1]], [o#x, a#x, b#x, gid#x]"
    val b = "Expand [[a#x, null, 1]], [o#x, b#x, a#x, gid#x]"
    assert(PlanSnapshot.canonGid(a) == PlanSnapshot.canonGid(b))
    val c = "HashAggregate(keys=[k#x, a#x, b#x, gid#x], functions=[])"
    val d = "HashAggregate(keys=[k#x, b#x, a#x, gid#x], functions=[])"
    assert(PlanSnapshot.canonGid(c) == PlanSnapshot.canonGid(d))
  }

  test("canonGid: gid filter predicates normalize across labelings") {
    val a = "HashAggregate [count(if ((gid#x = 1)) c#x else null)]"
    val b = "HashAggregate [count(if ((gid#x = 2)) c#x else null)]"
    assert(PlanSnapshot.canonGid(a) == PlanSnapshot.canonGid(b))
    // and a line with no projection list keeps everything else verbatim
    assert(PlanSnapshot.canonGid(a).contains("count(if ((gid#x = n)) c#x"))
  }

  test("canonGid: a changed NON-trailing projection constant still flips") {
    val a = "Expand [[a#x, 5, 1]], [a#x, c#x, gid#x]"
    val b = "Expand [[a#x, 6, 1]], [a#x, c#x, gid#x]"
    assert(PlanSnapshot.canonGid(a) != PlanSnapshot.canonGid(b))
  }

  test("canonGid: reordered columns WITHIN a projection still flip") {
    // the round-10 whole-line segment sort collapsed these — the
    // over-normalization ADVICE r10 flagged; the narrowed form keeps
    // within-group order digest-visible
    val a = "Expand [[a#x, b#x, 1]], [a#x, b#x, gid#x]"
    val b = "Expand [[b#x, a#x, 1]], [a#x, b#x, gid#x]"
    assert(PlanSnapshot.canonGid(a) != PlanSnapshot.canonGid(b))
  }

  test("canonGid: nested brackets never split a projection group") {
    val a = "Expand [[map_keys(m#x)[0], x, 1], [cast(y as array<int>)[1], null, 2]], [o#x, gid#x]"
    val b = "Expand [[cast(y as array<int>)[1], null, 1], [map_keys(m#x)[0], x, 2]], [o#x, gid#x]"
    val ca = PlanSnapshot.canonGid(a)
    assert(ca == PlanSnapshot.canonGid(b))
    // the nested index literals survive (only the TRAILING gid is erased)
    assert(ca.contains("map_keys(m#x)[0]") && ca.contains("[1]"))
  }

  test("normalize: truncated renders are id-width-shift stable") {
    // the SAME logical filter rendered with 3- vs 5-digit expr ids
    // truncates at a shifted point; both must normalize identically
    val plan = (frag: String) =>
      s"+- FileScan parquet [doc_id#x] DataFilters: [(size(filter(transform(split(text#x, x, -1), $frag..., Format: Parquet"
    val n1 = PlanSnapshot.normalize(plan("lambdafunction(lower(regexp_extra"))
    val n2 = PlanSnapshot.normalize(plan("lambdafunction(lower(regexp_ex"))
    assert(n1 == n2 && n1.head.endsWith("..."))
    // untruncated lines stay verbatim
    assert(PlanSnapshot.normalize("+- Filter (a#1L > 5)").head ==
      "+- Filter (a#x > 5)")
  }

  test("canonGid: projection multiset changes flip the digest") {
    val a = "Expand [[a#x, null, 1], [null, b#x, 2]], [a#x, b#x, gid#x]"
    val b = "Expand [[a#x, null, 1], [null, c#x, 2]], [a#x, b#x, gid#x]"
    assert(PlanSnapshot.canonGid(a) != PlanSnapshot.canonGid(b))
  }

  // ------------------------------------------- incremental CF index

  private def inc(rows: (Long, Long)*) = rows.toDF("c", "p")

  test("cfDeltas: every emitted pair has a delta endpoint (no crossing)") {
    // 10 base customers all share part 100 — the base×base pair set
    // C(10,2) = 45 would dominate if the delta path ever enumerated
    // it; one delta pair must touch exactly its 10 Δ×base pairs
    val cpB = inc((1L to 10L).map(c => (c, 100L)): _*)
    val (_, _, dsh, ddeg) = graft.sources.CfIndex.cfDeltas(
      inc((99L, 100L)), cpB, cpB.select("p", "c"),
      cpB.groupBy("p").agg(count(lit(1)).as("df")), maxDf = 30)
    val pairs = dsh.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == (1L to 10L).map(c => (c, 99L, 1L)).toSet)
    assert(ddeg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((99L, 1L)))
  }

  test("cfDeltas: a df-crossing part retracts exactly its base pairs") {
    // part 7 sits AT maxDf = 3; the delta pushes it over, so its three
    // base pairs retract, its three owners each lose one degree, and
    // the delta customer contributes NOTHING (the part is now banned)
    val cpB = inc((1L, 7L), (2L, 7L), (3L, 7L), (1L, 8L), (2L, 8L))
    val (_, _, dsh, ddeg) = graft.sources.CfIndex.cfDeltas(
      inc((4L, 7L)), cpB, cpB.select("p", "c"),
      cpB.groupBy("p").agg(count(lit(1)).as("df")), maxDf = 3)
    val pairs = dsh.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, -1L), (1L, 3L, -1L), (2L, 3L, -1L)))
    assert(ddeg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, -1L), (2L, -1L), (3L, -1L)))
  }

  test("cfDeltas: a repeated purchase adds nothing to the incidence") {
    val cpB = inc((1L, 7L), (2L, 7L))
    val (_, _, dsh, ddeg) = graft.sources.CfIndex.cfDeltas(
      inc((1L, 7L)), cpB, cpB.select("p", "c"),
      cpB.groupBy("p").agg(count(lit(1)).as("df")), maxDf = 3)
    assert(dsh.count() == 0 && ddeg.count() == 0)
  }

  // ------------------------------------- in-engine classifier training

  test("classifierTrain round 1 from zero = sum of positive-doc features") {
    // zero weights → margin 0 → pred 0 → err = y, so after one round
    // w_s must equal the summed feature counts of the lang='en' docs
    val docs = Tables.documents(spark, sf0001)
    val got = operators.TextAnalysis.classifierTrain(docs, 64, rounds = 1)
      .where(col("w") =!= 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = operators.TextAnalysis.classifierFeatures(
        docs.where(col("lang") === "en"), 64)
      .groupBy("slot").agg(sum("cnt").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      .filter(_._2 != 0L)
    assert(got == want && got.nonEmpty)
  }

  test("classifierTrainedScore: correct ⟺ accept agrees with label") {
    val sc = operators.TextAnalysis.classifierTrainedScore(
      Tables.documents(spark, sf0001), 64, 2)
    assert(sc.where(col("correct") =!=
      (col("accept") === (col("is_en") === 1L))).count() == 0)
    // the learned model must carry SOME signal: more correct than not
    val n = sc.count(); val ok = sc.where(col("correct")).count()
    assert(ok * 2 > n, s"trained classifier below coin-flip: $ok/$n")
  }

  test("classifierEval: held-out confusion counts are self-consistent") {
    val docs = Tables.documents(spark, sf0001)
    val cut = (docs.agg(max("doc_id")).head().getLong(0) + 1L) * 4L / 5L
    val r = operators.TextAnalysis.classifierEval(docs, 64, 2).collect()(0)
    val (nTest, nPos, tp, fp, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nTest == docs.where(col("doc_id") >= cut).count())
    assert(tp + fn == nPos, "positives partition into tp + fn")
    assert(r.getLong(5) == (nTest - fp - fn) * 1000000L / nTest)
    // leakage check by reconstruction: the reported confusion equals
    // scoring the held-out split with weights trained on the REST
    val w = operators.TextAnalysis.classifierTrain(
      docs.where(col("doc_id") < cut), 64, 2)
    val sc = operators.TextAnalysis.classifierTrainedScore(
      docs.where(col("doc_id") >= cut), 64, 2, weights = Some(w))
    assert(sc.where(col("accept") && col("is_en") === 1L).count() == tp)
  }

  test("streaming classifier serving equals the batch trained score") {
    val got = graft.streaming.Streams
      .classifierServeAvailableNow(spark, sf0001, 64, 2)
      .collect().map(_.toString).toSeq
    val w = operators.TextAnalysis.classifierTrainCached(spark, sf0001, 64, 2)
    val want = operators.TextAnalysis.classifierTrainedScore(
        Tables.documents(spark, sf0001), 64, 2, weights = Some(w))
      .collect().map(_.toString).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("classifierTrain is deterministic across runs") {
    val docs = Tables.documents(spark, sf0001)
    val a = operators.TextAnalysis.classifierTrain(docs, 64, 2)
      .collect().map(_.toString).toSeq
    val b = operators.TextAnalysis.classifierTrain(docs, 64, 2)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  // ------------------------------------------------ corpus build v2

  test("corpusBuildV2: non-empty, consistent mixture shares per split") {
    val r = operators.TextAnalysis.corpusBuildV2(
      Tables.documents(spark, sf0001))
    val rows = r.collect()
    assert(rows.nonEmpty, "capstone must keep SOME documents")
    // floor-rounded shares per split must sum to ≤ 1e6 and close to it
    rows.groupBy(_.getString(0)).foreach { case (split, rs) =>
      val s = rs.map(_.getLong(5)).sum
      assert(s <= 1000000L && s > 1000000L - rs.length,
        s"split $split share sum $s")
      // every (split, source) cell carries documents and tokens
      rs.foreach(row => assert(row.getLong(2) > 0 && row.getLong(4) > 0))
    }
    // chunk accounting: n_chunks >= n_docs (every kept doc chunks)
    rows.foreach(row => assert(row.getLong(3) >= row.getLong(2)))
  }

  // ------------------------------------------ incremental ANN index

  test("ANN append: base posting files untouched; equals one-shot build") {
    import graft.sources.AnnIndex
    val emb = Tables.embeddings(spark, sf0001)
    val cut = AnnIndex.incCut(spark, sf0001)
    val base = emb.where(col("vec_id") < cut)
    AnnIndex.writeIncBase(base, base, "r11inc", nClusters = 8, iters = 5)
    val loc = new java.io.File(new java.net.URI(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "graft_anni_cells_r11inc")).location.toString))
    def snap = loc.listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.length, f.lastModified)).toSet
    val before = snap
    // two appends (delta split by id parity): the nightly loop run
    // twice, so the postings dir accumulates strictly more files than
    // one bucket round — making the compaction shrink check meaningful
    // regardless of how many files one bucketed write happens to land
    val delta = emb.where(col("vec_id") >= cut)
    AnnIndex.appendDelta(spark, "r11inc", delta.where(col("vec_id") % 2 === 0))
    AnnIndex.appendDelta(spark, "r11inc", delta.where(col("vec_id") % 2 =!= 0))
    val after = snap
    assert(before.subsetOf(after), "append must not rewrite base postings")
    assert(after.size > before.size, "append must add new posting files")
    // the incremented index answers exactly like a one-shot build with
    // the same frozen (base-trained) centroids over ALL vectors
    AnnIndex.writeIncBase(base, emb, "r11ref", nClusters = 8, iters = 5)
    val q = emb.where(col("vec_id") < 10)
    val got = AnnIndex.queryTables(spark, "graft_anni_cent_r11inc",
      "graft_anni_cells_r11inc", q, 5).collect().map(_.toString).toSeq
    val want = AnnIndex.queryTables(spark, "graft_anni_cent_r11ref",
      "graft_anni_cells_r11ref", q, 5).collect().map(_.toString).toSeq
    assert(got == want)
    // compaction: a NEW table with one file per bucket, same rows,
    // same answers; the source table is untouched (it is the recovery
    // path if the compaction write dies) and the serving pointer swaps
    val rowsBefore = spark.table("graft_anni_cells_r11inc").count()
    val cellsC = AnnIndex.compact(spark, "r11inc")
    assert(cellsC != "graft_anni_cells_r11inc")
    assert(spark.table(cellsC).count() == rowsBefore)
    assert(snap == after, "compaction must not touch the source table")
    val locC = new java.io.File(new java.net.URI(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        cellsC)).location.toString))
    val filesAfter = locC.listFiles()
      .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(filesAfter <= 8, s"compaction must leave <= 1 file/bucket, got $filesAfter")
    assert(filesAfter < after.size, "compaction must shrink the file count")
    val gotC = AnnIndex.queryTables(spark, "graft_anni_cent_r11inc",
      cellsC, q, 5).collect().map(_.toString).toSeq
    assert(gotC == want, "compaction must not change a single answer")
    assert(AnnIndex.servingTables("r11inc") ==
      ("graft_anni_cent_r11inc", cellsC),
      "the serving pointer must track the compaction swap")
  }

  test("ANN increment drift: counts partition the corpus, ppm positive") {
    val d = graft.sources.AnnIndex.annIncrementDrift(spark, sf0001)
      .collect()(0)
    assert(d.getLong(0) + d.getLong(1) ==
      Tables.embeddings(spark, sf0001).count())
    assert(d.getLong(4) > 0L) // drift_ppm
  }

  test("cfPromote: the promoted state equals a from-scratch base build") {
    import graft.sources.CfIndex
    // probe-visible contract first: the promoted nb equals the full
    // recompute (the shared oracle)
    val got = CfIndex.cfPromote(spark, sf0001).collect().map(_.toString).toSeq
    val want = operators.Basket.cfNeighbors(
      Tables.lineitem(spark, sf0001), Tables.orders(spark, sf0001))
      .collect().map(_.toString).toSeq
    assert(got == want)
    // state contract: every promoted table equals its from-scratch
    // derivation over the FULL incidence — so tomorrow's delta can
    // probe the promoted base exactly as today's probed the original
    val tag = graft.sources.StagedTags.tagOf(sf0001)
    val cpFull = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(spark.table(s"graft_cfp_cp_$tag")) == rows(cpFull))
    assert(rows(spark.table(s"graft_cfp_pdf_$tag")) ==
      rows(cpFull.groupBy("p").agg(count(lit(1)).as("df"))))
    val kept = operators.Basket.cfPruned(cpFull, 30)
    assert(rows(spark.table(s"graft_cfp_sh_$tag")) ==
      rows(operators.Basket.cfSharedUpper(kept)))
    assert(rows(spark.table(s"graft_cfp_deg_$tag")) ==
      rows(kept.groupBy("c").agg(count(lit(1)).as("deg"))))
  }

  test("cfIncrement equals the full recompute, probing graft_cfi tables") {
    val got = graft.sources.CfIndex.cfIncrement(spark, sf0001)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("graft_cfi_"),
      "increment must serve from the persisted base-split index")
    val want = operators.Basket.cfNeighbors(
      Tables.lineitem(spark, sf0001), Tables.orders(spark, sf0001))
    assert(got.collect().map(_.toString).toSeq ==
      want.collect().map(_.toString).toSeq)
  }
}
