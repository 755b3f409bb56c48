package graft

import org.apache.spark.sql.functions._

/** Round-12 specs: the ANN maintenance loop's missing end (rebuild +
  * atomic swap, consuming the drift tripwire), the session-scoped CF
  * increment cache (ADVICE r11), and the truncated-render guard.
  */
class Round12Spec extends SparkSpec {

  private def tableFiles(t: String): Set[(String, Long, Long)] = {
    val loc = new java.io.File(new java.net.URI(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .location.toString))
    loc.listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.length, f.lastModified)).toSet
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ------------------------------------------------ ANN rebuild

  test("ANN rebuild: equals a from-scratch build over base∪delta; " +
    "old tables untouched; serving pointer swaps") {
    import graft.sources.AnnIndex
    val emb = Tables.embeddings(spark, sf0001)
    val cut = AnnIndex.incCut(spark, sf0001)
    val base = emb.where(col("vec_id") < cut)
    AnnIndex.writeIncBase(base, base, "r12rb", nClusters = 8, iters = 5)
    AnnIndex.appendDelta(spark, "r12rb", emb.where(col("vec_id") >= cut))
    val beforeCent = tableFiles("graft_anni_cent_r12rb")
    val beforeCells = tableFiles("graft_anni_cells_r12rb")
    val (centR, cellsR) = AnnIndex.rebuild(spark, "r12rb", 8, 5)
    assert(centR.startsWith("graft_annr_cent_r12rb") &&
      cellsR.startsWith("graft_annr_cells_r12rb"))
    // the superseded index is the recovery path — never rewritten
    assert(tableFiles("graft_anni_cent_r12rb") == beforeCent)
    assert(tableFiles("graft_anni_cells_r12rb") == beforeCells)
    // the atomic swap: production probes now read the rebuilt tables
    assert(AnnIndex.servingTables("r12rb") == ((centR, cellsR)))
    // rebuilt state ≡ from-scratch writeIncBase over base∪delta:
    // same centroids table, same probe answers
    AnnIndex.writeIncBase(emb, emb, "r12ref", nClusters = 8, iters = 5)
    assert(rows(spark.table(centR)) ==
      rows(spark.table("graft_anni_cent_r12ref")),
      "retrained centroids must equal the from-scratch Lloyd run")
    assert(rows(spark.table(cellsR)) ==
      rows(spark.table("graft_anni_cells_r12ref")),
      "re-encoded postings must equal the from-scratch assignment")
    val q = emb.where(col("vec_id") < 10)
    val got = AnnIndex.queryTables(spark, centR, cellsR, q, 5)
      .collect().map(_.toString).toSeq
    val want = AnnIndex.queryTables(spark, "graft_anni_cent_r12ref",
      "graft_anni_cells_r12ref", q, 5).collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("ANN maintain consumes the tripwire: drifted delta → rebuild, " +
    "in-distribution delta → keep") {
    import graft.sources.{AnnIndex, StagedTags}
    // synthetic corpus: base = the fixture, delta shifted +10 per
    // coordinate — a fresh delta far from the frozen base-trained
    // centroids, so quantization error explodes and drift fires
    val emb = Tables.embeddings(spark, sf0001)
    val cut = AnnIndex.incCut(spark, sf0001)
    val dir = TempDirs.scratchString("graft_r12_drift_")
    emb.withColumn("embedding",
        when(col("vec_id") >= lit(cut),
          expr("transform(embedding, x -> x + cast(10.0 as float))"))
          .otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rep = AnnIndex.annMaintain(spark, dir).collect()(0)
    assert(rep.getAs[Boolean]("rebuild_due"),
      s"shifted delta must trip the drift wire: $rep")
    assert(rep.getAs[String]("action") == "rebuild")
    // ADVICE r12: the rebuild runs on a DEDICATED maintenance family —
    // the shared increment tag's serving pointer must stay untouched,
    // so a later compact on it still pairs matching centroid/posting
    // tables (rebuilding the shared tag would swap its pointer and
    // poison annCompactReport's frozen-centroid pinning)
    val shared = StagedTags.tagOf(s"$dir#8#5")
    assert(AnnIndex.servingTables(shared) ==
      ((s"graft_anni_cent_$shared", s"graft_anni_cells_$shared")),
      "shared increment tag must not be rebuilt or swapped by maintain")
    val mt = AnnIndex.maintainTag(dir)
    val (centS, cellsS) = AnnIndex.servingTables(mt)
    assert(centS.startsWith(s"graft_annr_cent_$mt") &&
      cellsS.startsWith(s"graft_annr_cells_$mt"))
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(rows(spark.table(centS)) ==
      rows(operators.Clustering.lloydCentroids(all, 8, 5)))
    // ADVICE r12: the decision is memoized per (dir, params) — the
    // tripwire never clears (it always compares against the frozen
    // anni centroids), so without the memo every call would retrain
    // and write fresh _g<N> generations
    val rep2x = AnnIndex.annMaintain(spark, dir).collect()(0)
    assert(rep2x.getAs[String]("action") == "rebuild")
    assert(AnnIndex.servingTables(mt) == ((centS, cellsS)),
      "repeat maintain must not retrain: serving pointer unchanged")
    // in-distribution delta (the fixture): the tripwire stays quiet
    // and nothing is rebuilt
    val rep2 = AnnIndex.annMaintain(spark, sf0001).collect()(0)
    assert(!rep2.getAs[Boolean]("rebuild_due"))
    assert(rep2.getAs[String]("action") == "keep")
  }

  test("repeat maintenance on one tag: each round writes a NEW table, " +
    "answers unchanged, pointer tracks") {
    import graft.sources.AnnIndex
    val emb = Tables.embeddings(spark, sf0001)
    val cut = AnnIndex.incCut(spark, sf0001)
    AnnIndex.writeIncBase(emb.where(col("vec_id") < cut),
      emb.where(col("vec_id") < cut), "r12mx", nClusters = 8, iters = 5)
    AnnIndex.appendDelta(spark, "r12mx", emb.where(col("vec_id") >= cut))
    val q = emb.where(col("vec_id") < 10)
    def probe(): Seq[String] = {
      val (c, p) = AnnIndex.servingTables("r12mx")
      AnnIndex.queryTables(spark, c, p, q, 5).collect().map(_.toString).toSeq
    }
    val before = probe()
    // compact → rebuild → compact again: the second compact reads the
    // REBUILT postings through the pointer and must not overwrite them
    // (each maintenance round gets its own _g<N> table)
    val c1 = AnnIndex.compact(spark, "r12mx")
    assert(probe() == before)
    val (centR, cellsR) = AnnIndex.rebuild(spark, "r12mx", 8, 5)
    assert(cellsR != c1)
    val afterRebuild = probe() // full-retrain answers (may differ)
    val c2 = AnnIndex.compact(spark, "r12mx")
    assert(c1 != c2, "each compaction must write a fresh table")
    assert(AnnIndex.servingTables("r12mx") == ((centR, c2)))
    assert(probe() == afterRebuild,
      "compaction after a rebuild must not change an answer")
  }

  // ------------------------------------- CF increment cache scoping

  test("cf increment state is session-scoped (ADVICE r11)") {
    import graft.sources.CfIndex
    val s2 = spark.newSession()
    val st1 = CfIndex.incrementState(spark, sf0001)
    val st2 = CfIndex.incrementState(s2, sf0001)
    // a second session must get frames bound to ITSELF — served from
    // its own derivation, never another session's checkpoint blocks
    assert(st1.nb.sparkSession eq spark)
    assert(st2.nb.sparkSession eq s2)
    // and the derivations agree row for row
    assert(rows(st2.nb) == rows(st1.nb))
  }

  test("cf increment stats: the diagnostic matches first principles") {
    import graft.sources.CfIndex
    val st = CfIndex.incrementState(spark, sf0001)
    val stats = CfIndex.cfIncrementStats(spark, sf0001).collect()(0)
    assert(stats.getAs[Long]("n_touched") == st.touched.count())
    assert(stats.getAs[Long]("n_customers") == st.deg1.count())
    assert(stats.getAs[Long]("changed_pairs") == st.dsh.count())
    assert(stats.getAs[Long]("touched_ppm") ==
      st.touched.count() * 1000000L / st.deg1.count())
    // the ratio is the degeneracy signal: it must be a ppm in (0, 1e6]
    val ppm = stats.getAs[Long]("touched_ppm")
    assert(ppm > 0L && ppm <= 1000000L)
  }

  // ------------------------------------------- HTML extraction

  test("htmlExtractCol: script decoys, entities, inline/block tags") {
    import operators.TextAnalysis
    val html = "<html><head><script>if (a < b) { emit(\"</div>\") }" +
      "</script><style>p {x: 1}</style></head><body><p>x &amp;amp; y" +
      "</p><b>z</b>&nbsp;&#39;q&#39;</body></html>"
    val got = spark.range(1).select(
      TextAnalysis.htmlExtractCol(lit(html)).as("t")).head().getString(0)
    // &amp;amp; must decode to the LITERAL &amp; (amp decodes last),
    // the script's decoy </div> and comparison operators must vanish
    assert(got == "x &amp; y z 'q'")
  }

  test("htmlExtract recovers exactly the planted-wrapper contract") {
    import operators.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.htmlExtract(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.select(col("doc_id"),
        trim(regexp_replace(
          concat(lit("doc & meta heading <"), col("doc_id").cast("string"),
            lit("> "), col("text")),
          operators.WordCount.WhitespacePattern, " ")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want,
      "extraction must recover title + h1 + body text, nothing else")
  }

  // ------------------------------------------- streaming ANN ingest

  test("streaming ANN ingest equals the batch increment") {
    val got = graft.streaming.Streams
      .annIncrementAvailableNow(spark, sf0001)
      .collect().map(_.toString).toSeq
    val want = graft.sources.AnnIndex
      .annIncrementReport(spark, sf0001, nQueries = 10, k = 5)
      .collect().map(_.toString).toSeq
    assert(got == want)
  }

  // ------------------------------------------ truncated-render guard

  test("canonGid: mixed distinct+regular layout (gid NOT trailing) " +
    "collapses across labelings") {
    // two countDistinct groups + a regular-agg column AFTER the gid —
    // the rec_eval shape; the rewrite may tag either distinct group 1
    val a = "Expand [[CASE WHEN (hit#x = 1) THEN custkey#x END, null, " +
      "1, null], [null, custkey#x, 2, null], [null, null, 0, " +
      "coalesce(hit#x, 0)]], [CASE#x, custkey#x, gid#x, coalesce#x]"
    val b = "Expand [[null, custkey#x, 1, null], [CASE WHEN (hit#x = " +
      "1) THEN custkey#x END, null, 2, null], [null, null, 0, " +
      "coalesce(hit#x, 0)]], [CASE#x, custkey#x, gid#x, coalesce#x]"
    assert(PlanSnapshot.canonGid(a) == PlanSnapshot.canonGid(b))
    // a changed NON-gid constant in a group still flips
    val c = a.replace("coalesce(hit#x, 0)]]", "coalesce(hit#x, 1)]]")
    assert(PlanSnapshot.canonGid(a) != PlanSnapshot.canonGid(c))
  }

  test("canonGid: the FULL labeling swap (output list + group columns " +
    "permute together) collapses") {
    // the q21 residual: relabeling reorders the Expand output
    // attributes, and every group's internal layout follows
    val a = "Expand [[k#x, CASE WHEN late#x THEN s#x END, null, 1], " +
      "[k#x, null, s#x, 2]], " +
      "[k#x, CASE WHEN late THEN s END#x, s#x, gid#x]"
    val b = "Expand [[k#x, s#x, null, 1], " +
      "[k#x, null, CASE WHEN late#x THEN s#x END, 2]], " +
      "[k#x, s#x, CASE WHEN late THEN s END#x, gid#x]"
    assert(PlanSnapshot.canonGid(a) == PlanSnapshot.canonGid(b))
    // same output order but a genuinely different group layout flips
    val c = a.replace("[k#x, null, s#x, 2]", "[null, k#x, s#x, 2]")
    assert(PlanSnapshot.canonGid(a) != PlanSnapshot.canonGid(c))
  }

  test("normalize: early '…' falls back to a position-independent cut") {
    // a line whose '…' lands before column 48 (e.g. a path collapse
    // shrank it) must not cut at the id-width-sensitive index — it
    // coarsens to the first token
    val early = Seq("Scan parquet x... tail").mkString
    val got = PlanSnapshot.normalize(early)
    assert(got == Seq("Scan..."))
    // the standard case still cuts at the 48-char word boundary
    val long = "PushedFilters: [IsNotNull(a), EqualTo(b, 12), GreaterThan(c, 5)] and more te... x"
    val g2 = PlanSnapshot.normalize(long).head
    assert(g2.endsWith("...") && g2.length <= 51)
  }
}
