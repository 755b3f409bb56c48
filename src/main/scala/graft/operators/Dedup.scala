package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, over the
  * `documents` table: exact (hash-groupBy), n-gram-shingle Jaccard
  * (the exactness baseline), MinHash+LSH (the 100 TB scale path), and
  * SimHash with Hamming-band candidate generation.
  *
  * Scale posture:
  *  - exact dedup is one shuffle on a 128-bit fingerprint — optimal;
  *  - brute Jaccard is quadratic in per-shingle document frequency; it
  *    is the *correctness oracle* for the LSH paths, run on samples —
  *    at full scale use [[minhashPairs]], whose cost is one shuffle on
  *    (band, bucket) with bucket sizes bounded by collision probability;
  *  - all signatures are fixed-size arrays computed per-document inside
  *    codegen (no explode of k×shingles rows, no driver state).
  */
object Dedup {

  /** Exact duplicate groups keyed by md5 fingerprint of the text:
    * (fp, keep_id = min doc_id, n_copies). At 100 TB: shuffle on fp
    * only, with map-side partial agg; never shuffles the text itself.
    */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  /** Per-source exact-duplication report: docs, distinct fingerprints,
    * and the surplus-copy ratio in ppm — the dedup OBSERVABILITY
    * rollup a corpus pipeline publishes per ingest source (which feed
    * is sending us copies?). One shuffle on source with a fused
    * distinct-aggregate; output is one row per source at any scale.
    */
  def dupStatsBySource(docs: DataFrame): DataFrame =
    docs.select(col("source"), md5(col("text")).as("fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        expr("(n_docs - n_distinct) * 1000000 div n_docs").as("dup_ppm"))
      .orderBy("source")

  /** Distinct word-n-gram shingles per document: (doc_id, shingle).
    * Built from the cleaned token array so dedup and word count agree
    * on tokenization (SURVEY.md §2 rows 3-6).
    */
  def shingles(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), WordCount.cleanWords(col(textCol)).as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ws) - $n), i -> concat_ws(' ', slice(ws, i + 1, $n)))"))
        .as("shingle"))
      .distinct()

  /** Near-duplicate pairs by n-gram Jaccard, integer-exact: emits
    * (id_a, id_b, inter, uni) where `inter * den > uni * num` encodes
    * jaccard > num/den without any float comparison (so the DuckDB
    * oracle matches bit-for-bit).
    */
  def jaccardPairs(docs: DataFrame, n: Int, num: Int, den: Int): DataFrame =
    jaccardPairsUnsorted(docs, n, num, den).orderBy("id_a", "id_b")

  /** [[jaccardPairs]] without the final sort — the form consumers that
    * re-aggregate or re-join (CC, keep lists, reports) should take,
    * and the form [[graft.sources.DedupStage]] checkpoints.
    */
  private[graft] def jaccardPairsUnsorted(docs: DataFrame, n: Int, num: Int,
                                          den: Int): DataFrame = {
    // r15 A/B note: checkpointing the shared shingle frame here was
    // measured a WASH (mins 2.3-2.7 s unchanged on the three live
    // consumers) — AQE's runtime stage reuse already dedupes the
    // identical distinct-exchange subtrees in this shape, unlike the
    // divergent-branch shapes (prefixFilterPairs, dedupIncrement)
    // where an explicit checkpoint measured 2x. Left live.
    val sh = shingles(docs, n)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"), "shingle")
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("sa.n_sh") + col("sb.n_sh") - col("inter")).as("uni"))
      .where(col("inter") * den > col("uni") * num)
  }

  /** Exact substring-duplication signal (the span-level dedup of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): slide a `w`-token window (stride 1) over every document,
    * mark windows whose text occurs at least twice anywhere in the
    * corpus — including within the same document — and report each
    * document's duplicated-window coverage as an integer ratio ×1000.
    * Whole-document (exact/minhash) and paragraph
    * ([[TextAnalysis.boilerplateScrub]]) dedup both miss this: a long
    * quote copied into an otherwise-unique page only shows up here.
    *
    * Scale shape: the window stream is materialized once (the global
    * count and the per-doc mark both consume it); one shuffle keyed on
    * the span text for the count, one shuffle semi-join back (NOT a
    * broadcast — duplicated spans are corpus-sized in the worst case),
    * one shuffle on doc_id for the rollup. At 100 TB carry
    * xxhash64(span) instead of the text so every shuffle moves 8-byte
    * keys, and tune `w` up to keep the dup set selective.
    */
  def dupSpanRatio(docs: DataFrame, w: Int): DataFrame = {
    val spans = docs.select(col("doc_id"), WordCount.cleanWords(col("text")).as("ws"))
      .where(size(col("ws")) >= w)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ws) - $w), i -> concat_ws(' ', slice(ws, i + 1, $w)))"))
        .as("span"))
      .localCheckpoint()
    val dup = spans.groupBy("span").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select("span")
    val dupPerDoc = spans.join(dup, Seq("span"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_spans"))
    spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_ratio_x1000", expr("n_dup_spans * 1000 div n_spans"))
      .orderBy("doc_id")
  }

  /** Maximal cross-document duplicated token ranges — the "cut these
    * spans out" output of substring-level dedup (Lee et al.), one step
    * past [[dupSpanRatio]]'s per-document coverage number: every
    * `w`-token window whose text also appears in at least one OTHER
    * document is marked, and runs of marked windows are merged into
    * maximal `[tok_start, tok_end]` intervals per document
    * (gaps-and-islands over window positions: two marked windows chain
    * while the gap between their starts is ≤ `w`, i.e. their token
    * ranges overlap or touch).
    *
    * Cross-document test is `min(doc_id) <> max(doc_id)` per span —
    * one map-side-combinable agg, NO count-distinct expansion.
    *
    * Scale shape: windows materialized once (localCheckpoint) and
    * consumed by the dup-set agg and the mark semi-join; one shuffle on
    * span text for the agg, one for the semi-join (dup spans are
    * corpus-sized worst-case — not broadcastable), one shuffle on
    * doc_id for the islands window + rollup. At 100 TB carry
    * xxhash64(span) so shuffles move 8-byte keys, and raise `w` to keep
    * the marked set selective.
    */
  def crossDocSpans(docs: DataFrame, w: Int): DataFrame = {
    val spans = docs
      .select(col("doc_id"), WordCount.cleanWords(col("text")).as("ws"))
      .where(size(col("ws")) >= w)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(ws) - $w), i -> concat_ws(' ', slice(ws, i + 1, $w)))")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("span"))
      .localCheckpoint()
    val dup = spans.groupBy("span")
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .where(col("d0") =!= col("d1"))
      .select("span")
    val marked = spans.join(dup, Seq("span"), "left_semi").select("doc_id", "pos")
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    marked
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byPos) > w, 1L).otherwise(0L))
      .withColumn("island", sum("brk").over(byPos))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("tok_start"),
        (max("pos") + lit(w.toLong - 1)).as("tok_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "tok_start", "tok_end", "n_windows")
      .orderBy("doc_id", "tok_start")
  }

  /** Fuzzy-match pairs within a nation (entity resolution) via
    * SYMMETRIC-DELETE blocking (the SymSpell scheme): every name emits
    * itself plus each string obtained by deleting one character; two
    * names within edit distance 1 ALWAYS share a variant (substitution
    * → delete the differing position from both; insertion/deletion →
    * the longer's deletion equals the shorter), so the variant
    * equi-join generates a candidate set that is complete AND
    * proportional to the true-pair count — not to Σ block² like naive
    * attribute blocking. A first cut of this operator blocked on
    * (nation, name length) and spent 25 s at sf0.1 running banded
    * levenshtein over ~9M block pairs; deletion blocking runs the
    * verify on ~8k candidates instead.
    *
    * Verify = Spark's 3-arg `levenshtein(a, b, threshold)` (Ukkonen
    * band, returns -1 past the threshold). Catalyst pushes the `d >= 0`
    * filter below the `distinct()` into the variant join, so the band
    * runs once per variant-candidate ROW — up to (len+1)× per true
    * pair, still ∝ true pairs, and the pushdown prunes non-matches
    * BEFORE the distinct shuffle, which is the better trade.
    *
    * Scale shape: one shuffle on (nation, variant) — a (len+1)×
    * row explosion of the name column only for maxDist = 1, C(len,2)×
    * for maxDist = 2 — one shuffle to distinct the pair ids, both
    * map-side combinable.
    *
    * maxDist = 2 uses the k-deletion neighborhood: every string
    * reachable by deleting UP TO two characters. Completeness is the
    * SymSpell invariant at k = 2: align an edit script of cost ≤ 2
    * between a and b; each substitution deletes the differing position
    * from both sides, each insertion/deletion deletes one character
    * from the longer side — ≤ 2 deletions per side land both on the
    * aligned common string, so the variant equi-join cannot miss a
    * true pair. Repeated characters collapse (array_distinct), which
    * only removes duplicate join rows, never a needed variant.
    */
  def blockedFuzzyPairs(customer: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      "symmetric-delete blocking is implemented for maxDist in {1, 2}")
    // fillCores (r16, guide §2.6/§6): customer fits one parquet split,
    // so the variant GENERATION — the C(len,2)-per-row native kernel at
    // d = 2, the dominant cost (qmetrics: ~5 s on 15 tasks, 31 cores
    // idle) — ran as one task per join side. Hash-redistributing the
    // narrow projection spreads the per-row kernel across the session;
    // identity at production scale (the condition is input size, never
    // core count). Measured r16 matched min-of-3: d2 5.77 → 3.69 s
    // (variant-join shuffle 7.5 → 1.7 MB / 858 k → 193 k records — the
    // spread map side partial-combines the duplicate candidate rows).
    val b = WordCount.fillCores(customer.select(col("c_custkey"),
        col("c_name"), col("c_nationkey").cast("long").as("nk")),
      "c_custkey")
    // native expression (one tight loop per row) — the declarative
    // transform × flatten × array_distinct tree interprets every lambda
    // and cost ~3 s per join side at sf0.1 just to build variants
    val neighborhood =
      graft.functions.functions.deletion_neighborhood(col("c_name"), maxDist)
    if (maxDist == 1) {
      // k = 1 shape (measured 1.9 s at sf0.1): names ride the variant
      // join and Catalyst pushes the banded-lev filter BELOW the
      // distinct — cheap here because a dist-1 pair shares only 1-2
      // variants, so the join emits few duplicate rows per pair
      val variants = b.select(col("c_custkey"), col("c_name"), col("nk"),
        explode(neighborhood).as("v"))
      val cand = variants.as("a").join(variants.as("b"),
          col("a.nk") === col("b.nk") && col("a.v") === col("b.v") &&
            col("a.c_custkey") < col("b.c_custkey"))
        .select(col("a.c_custkey").as("id_a"), col("b.c_custkey").as("id_b"),
          col("a.c_name").as("name_a"), col("b.c_name").as("name_b"))
        .distinct()
      cand.select(col("id_a"), col("id_b"),
          levenshtein(col("name_a"), col("name_b"), maxDist).as("d"))
        .where(col("d") >= 0)  // -1 = band abandoned above maxDist
        .select(col("id_a"), col("id_b"), col("d").cast("long").as("dist"))
        .orderBy("id_a", "id_b")
    } else {
      // k = 2 shape: the C(len,2) neighborhood makes variant-join
      // multiplicity EXPLODE (a dist-1 pair shares ~len exact-2-delete
      // variants; near-sequential ids collide at deletion distance up
      // to 4), so running lev per join row is the bottleneck — instead
      // the join stays NARROW (8-byte ids + the variant), the pair set
      // is distinct'd first (map-side-combinable agg over two longs),
      // and names are re-fetched for ONE banded lev per candidate pair
      // (the name side auto-broadcasts locally; at dictionary scale the
      // optimizer falls back to a candidate-sized shuffle join)
      val slim = b.select(col("c_custkey"), col("nk"),
        explode(neighborhood).as("v"))
      val candIds = slim.as("a").join(slim.as("b"),
          col("a.nk") === col("b.nk") && col("a.v") === col("b.v") &&
            col("a.c_custkey") < col("b.c_custkey"))
        .select(col("a.c_custkey").as("id_a"), col("b.c_custkey").as("id_b"))
        .distinct()
      val names = b.select(col("c_custkey"), col("c_name"))
      candIds
        .join(names.as("na"), col("id_a") === col("na.c_custkey"))
        .join(names.as("nb"), col("id_b") === col("nb.c_custkey"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("na.c_name"), col("nb.c_name"), maxDist).as("d"))
        .where(col("d") >= 0)
        .select(col("id_a"), col("id_b"), col("d").cast("long").as("dist"))
        // materialize before the sort (lazily — no job at plan-build
        // time): RangePartitioner's sampling pass triggers the
        // checkpoint and the sort itself reuses it; without the barrier
        // the variant join would execute twice
        .localCheckpoint(eager = false)
        .orderBy("id_a", "id_b")
    }
  }

  /** Blocking-quality report for the SymSpell candidate generator —
    * the two numbers every ER blocking scheme must publish (Christen's
    * survey metrics): REDUCTION RATIO (what fraction of the all-pairs
    * comparison space the blocks avoid) and PAIRS COMPLETENESS (what
    * fraction of true lev≤1 pairs the blocks retain — the SymSpell
    * deletion-variant invariant says 10⁶ ppm, and this MEASURES it
    * instead of assuming it, the `dedup_winnow_eval` posture). Truth
    * is the same-nation banded-lev join — quadratic BY CONTRACT within
    * each nation block (the declared sample-scale baseline, same
    * contract as `dedup_ngram_jaccard`); candidates are the
    * deletion-variant equi-join BEFORE any verify, so the report
    * prices the blocking itself, not the verified output. Scale
    * shape: candidates ∝ true pairs (one narrow shuffle on
    * (nation, variant)); the truth join is the eval-only cost —
    * which is why the gate runs it SAMPLE-BOUNDED: `samplePct` keeps
    * a deterministic md5-hash sample of the customers (the
    * `doc_sample_hash` idiom, mirrored bit-for-bit in the oracle),
    * so the quadratic truth join pays pct²/10⁴ of the full cost
    * while both metrics stay measurements over a well-defined
    * population. samplePct = 100 is the exact full-population eval.
    */
  def blockingEval(customer: DataFrame, samplePct: Int = 100): DataFrame = {
    val all = customer.select(col("c_custkey"), col("c_name"),
      col("c_nationkey").cast("long").as("nk"))
    val b = if (samplePct >= 100) all
    else all.where(pmod(expr(
      "cast(conv(substr(md5(cast(c_custkey AS string)), 1, 15), 16, 10) AS bigint)"),
      lit(100L)) < samplePct)
    val variants = b.select(col("c_custkey"), col("nk"),
      explode(graft.functions.functions.deletion_neighborhood(col("c_name"), 1))
        .as("v"))
    // both pair sets feed TWO consumers (their count and the hit
    // join); measured: an explicit localCheckpoint does NOT help —
    // the shared shuffle subtrees are already deduplicated by
    // exchange reuse, and the barrier only adds materialization cost
    val cand = variants.as("a").join(variants.as("b"),
        col("a.nk") === col("b.nk") && col("a.v") === col("b.v") &&
          col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("id_a"), col("b.c_custkey").as("id_b"))
      .distinct()
    val truth = b.as("a").join(b.as("b"),
        col("a.nk") === col("b.nk") &&
          col("a.c_custkey") < col("b.c_custkey") &&
          levenshtein(col("a.c_name"), col("b.c_name"), 1) >= 0)
      .select(col("a.c_custkey").as("id_a"), col("b.c_custkey").as("id_b"))
    val nAll = b.groupBy("nk").agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2")).as("n_all_pairs"))
    val nCand = cand.agg(count(lit(1)).as("n_cand"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val nHit = cand.join(truth, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_hit"))
    nAll.crossJoin(nTruth).crossJoin(nCand).crossJoin(nHit) // 1-row frames
      .select(col("n_all_pairs"), col("n_truth"), col("n_cand"),
        col("n_hit"),
        expr("n_hit * 1000000 div n_truth").as("completeness_ppm"),
        expr("(n_all_pairs - n_cand) * 1000000 div n_all_pairs")
          .as("reduction_ppm"))
  }

  /** The corpus AFTER span-level dedup — applies [[crossDocSpans]]'s
    * intervals by dropping every token they cover and reassembling the
    * survivors in position order (the `string_agg ORDER BY` /
    * sort_array-transform idiom, exact on both engines). Emits per-doc
    * kept/cut counts and the md5 of the cleaned text, which is what a
    * pipeline would fingerprint next. Docs too short to window (or
    * fully covered) survive with n_kept = 0 rather than vanishing.
    *
    * Scale shape: adds to crossDocSpans one anti join of the token
    * stream against the islands — equi on doc_id with the range
    * predicate as the join condition (hash anti join, NOT a nested
    * loop) — and one doc_id rollup for the reassembly; both ride the
    * same hash(doc_id) partitioning.
    */
  def cutSpans(docs: DataFrame, w: Int): DataFrame =
    cutSpansFrom(docs, crossDocSpans(docs, w))

  /** [[cutSpans]] over a pre-built islands frame (the staged entry
    * point — [[graft.sources.DedupStage.islands]]). `w` only shapes
    * island detection, so the cut itself needs no window parameter.
    */
  private[graft] def cutSpansFrom(docs: DataFrame,
                                  islandsIn: DataFrame): DataFrame = {
    val islands = islandsIn
      .select(col("doc_id").as("i_doc"), col("tok_start"), col("tok_end"))
    val toks = docs
      .select(col("doc_id"), posexplode(WordCount.cleanWords(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("tok"))
    val kept = toks.join(islands,
      toks("doc_id") === islands("i_doc") &&
        col("pos").between(col("tok_start"), col("tok_end")), "left_anti")
    val agg = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok")))).as("clean_fp"))
    val totals = toks.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    docs.select(col("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_toks"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_cut"),
        coalesce(col("clean_fp"), md5(lit(""))).as("clean_fp"))
      .orderBy("doc_id")
  }

  /** Within-document repetition stats (the Gopher-style duplicate
    * n-gram quality signal): total vs distinct n-grams per document,
    * integer-exact. High (total − distinct) flags boilerplate/looping
    * text before training.
    */
  def repetitionStats(docs: DataFrame, n: Int): DataFrame =
    WordCount.fillCores(docs)
      .select(col("doc_id"), WordCount.cleanWords(col("text")).as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"), expr(
        s"transform(sequence(0, size(ws) - $n), i -> concat_ws(' ', slice(ws, i + 1, $n)))")
        .as("grams"))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct_grams"))
      .orderBy("doc_id")

  /** Per-document n-gram NOVELTY against everything earlier in the
    * corpus (doc_id order): the fraction of a document's distinct
    * n-grams whose FIRST corpus appearance is this document — the
    * staleness profile a curation pipeline watches to decide when a
    * crawl stops adding information (novelty decays as the corpus
    * saturates). `min(doc_id)` per shingle is one map-side-combinable
    * aggregation; a doc's novel count is a join back on (shingle,
    * first = own id) — no ordered scan, no cross-doc window.
    */
  def ngramNovelty(docs: DataFrame, n: Int): DataFrame = {
    val sh = shingles(docs, n).localCheckpoint()
    val first = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
    val tot = sh.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val novel = sh.join(first, "shingle")
      .where(col("doc_id") === col("first_doc"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    tot.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_x1000", expr("n_novel * 1000 div n_grams"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: corpus documents sharing any n-gram
    * with the benchmark set. The benchmark's distinct n-grams are tiny
    * relative to the corpus — broadcast them; the corpus side streams
    * through one shuffle-free semi-join probe, then aggregates per doc.
    */
  def decontaminate(docs: DataFrame, benchMaxId: Long, n: Int,
                    fill: Boolean = true): DataFrame = {
    val bench = shingles(docs.where(col("doc_id") <= benchMaxId), n)
      .select("shingle").distinct()
    // fillCores (r16): the corpus probe is per-row shingling + a
    // broadcast-probe — shuffle-free by design, so it all ran on the
    // single scan split; the downstream agg keys on doc_id, which the
    // spread's hashpartitioning satisfies (the winning r15 shape).
    // Compositions opt OUT (`fill = false`): inside corpusFilterReport
    // the four verdict branches already overlap across cores and the
    // fan-out only added tasks (measured 1.7 → 2.5 s — the
    // corpusBuildV3 lesson).
    val corpus = docs.where(col("doc_id") > benchMaxId)
    shingles(if (fill) WordCount.fillCores(corpus) else corpus, n)
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  /** Per-document n-gram NOVELTY against the base corpus — the
    * INCREMENTAL-BATCH twin of [[ngramNovelty]] (which profiles
    * first-appearance novelty inside one corpus pass) and the
    * memorization/curation signal next to [[decontaminate]]'s
    * benchmark screen: for each new arrival (doc_id > baseMaxId), how
    * many of its distinct n-grams the base corpus (doc_id ≤ baseMaxId)
    * already contains, and the novel fraction in ppm. Low novelty =
    * boilerplate or near-copy (dedup it); a curation pipeline tracks
    * the corpus-level novelty trend per ingest batch.
    *
    * Scale shape: one shuffle on the gram for the base semi-join
    * (grams, not documents, are the join key — identical posture to
    * [[decontaminate]]), one count-up per new doc. Docs too short to
    * shingle emit no row (they carry no n-gram evidence either way).
    */
  def noveltyReport(docs: DataFrame, baseMaxId: Long, n: Int): DataFrame = {
    val base = shingles(docs.where(col("doc_id") <= baseMaxId), n)
      .select("shingle").distinct()
    shingles(docs.where(col("doc_id") > baseMaxId), n)
      .join(base.withColumn("seen", lit(1)), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("seen"), lit(0))).cast("long").as("n_seen"))
      .select(col("doc_id"), col("n_grams"), col("n_seen"),
        expr("(n_grams - n_seen) * 1000000 div greatest(1L, n_grams)")
          .as("novelty_ppm"))
      .orderBy("doc_id")
  }

  /** Strict decontamination: corpus documents sharing NO n-gram with
    * the benchmark set — the keep side of [[decontaminate]], via a
    * left-anti join against the contaminated ids. Documents too short
    * to shingle are trivially clean and kept.
    */
  def decontaminateStrict(docs: DataFrame, benchMaxId: Long, n: Int): DataFrame = {
    val bench = shingles(docs.where(col("doc_id") <= benchMaxId), n)
      .select("shingle").distinct()
    val corpus = docs.where(col("doc_id") > benchMaxId)
    // same fillCores reasoning as [[decontaminate]] (r16)
    val contaminated = shingles(WordCount.fillCores(corpus), n)
      .join(broadcast(bench), "shingle")
      .select("doc_id").distinct()
    corpus.select("doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** The post-dedup corpus ("keep list"): the min-id representative of
    * every exact-duplicate group, minus the higher-id member of every
    * near-duplicate pair — i.e. what a training pipeline actually
    * materializes after dedup. One aggregation + one left-anti join.
    */
  def keepList(docs: DataFrame, n: Int, num: Int, den: Int): DataFrame =
    keepListFrom(docs, jaccardPairsUnsorted(docs, n, num, den))

  /** [[keepList]] over a pre-built near-dup pair frame (the staged
    * entry point — [[graft.sources.DedupStage.pairs]]).
    */
  private[graft] def keepListFrom(docs: DataFrame,
                                  pairs: DataFrame): DataFrame = {
    val reps = exact(docs).select(col("keep_id").as("doc_id"))
    val drops = pairs.select(col("id_b").as("doc_id")).distinct()
    reps.join(drops, Seq("doc_id"), "left_anti").orderBy("doc_id")
  }

  /** Connected components over near-duplicate pairs by iterative
    * min-label propagation — the clustering step after pair generation
    * (note [[keepList]]'s pair-wise drop under-deletes on transitive
    * chains: pairs (1,3),(2,3) keep {1,2}, but the component keeps
    * only 1). Each iteration is ONE Spark job: the propagation join's
    * result is materialized, cutting lineage, while the changed flag
    * rides the same rows — no separate convergence join. Converges in
    * O(component diameter) steps; if `maxIter` is hit first the loop
    * THROWS rather than silently returning labels that would
    * under-delete duplicates downstream. Output:
    * (doc_id, comp = min doc_id of the component).
    *
    * `reliable = true` switches the per-iteration materialization from
    * executor-memory `localCheckpoint` (fast; lost blocks kill the
    * job) to reliable `checkpoint` into
    * `spark.sparkContext.getCheckpointDir` — set that and pass true on
    * a real cluster where executor loss must be survivable.
    */
  def components(pairs: DataFrame, maxIter: Int = 100,
                 reliable: Boolean = false): DataFrame = {
    val (labels, _, converged) = propagate(pairs, maxIter, reliable)
    if (!converged)
      throw new IllegalStateException(
        s"Dedup.components did not converge within $maxIter iterations " +
          "(component diameter exceeds maxIter); raise maxIter — " +
          "returning early would silently under-delete duplicates")
    labels.select(col("id").as("doc_id"), col("comp")).orderBy("doc_id")
  }

  /** Min-label propagation for up to `maxIter` rounds; the shared loop
    * behind [[components]] (which demands convergence) and
    * [[componentsAdaptive]] (which falls back to star contraction).
    * Returns (labels(id, comp), symmetric edge set, converged).
    */
  /** Free a materialized (checkpointed) frame that has been superseded:
    * drop its block-manager blocks, and in reliable mode delete its
    * checkpoint files — iterative loops otherwise grow storage linearly
    * with rounds. Shared by every iterative operator (CC, PageRank,
    * Lloyd, BPE).
    */
  private[operators] def release(df: DataFrame, reliable: Boolean = false): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
        if (reliable) l.rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(
            df.sparkSession.sparkContext.hadoopConfiguration).delete(p, true)
        }
      case _ => // not a checkpointed frame; nothing to free
    }

  private def propagate(pairs: DataFrame, maxIter: Int, reliable: Boolean)
      : (DataFrame, DataFrame, Boolean) = {
    require(!reliable || pairs.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "reliable checkpointing needs spark.sparkContext.setCheckpointDir(...)")
    def materialize(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    // NOTE (measured, round 6): pre-partitioning sym/labels before the
    // checkpoint does NOT make the per-round join exchange-free under
    // AQE — adaptive planning discards LogicalRDD outputPartitioning
    // (verified with explicit partition counts and with AQE disabled,
    // where it DOES work) — so the loop deliberately leaves the frames
    // unpartitioned rather than paying a useless extra shuffle up front
    val sym = materialize(
      edges.union(edges.select(col("dst").as("src"), col("src").as("dst"))))
    // labelsM tracks the materialized frame (labels wraps it with a
    // projection) so superseded rounds can be released
    var labelsM = materialize(sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")))
    var labels = labelsM
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym.join(labels, col("dst") === col("id"))
        .groupBy("src").agg(min("comp").as("ncomp"))
      // the changed flag rides the propagation row, and the convergence
      // probe IS the materializing action (r15, the componentsStar
      // signed() discipline): the round's frame is checkpointed lazily
      // and a single count-changed aggregate both persists every
      // partition and returns the signal — one action per round instead
      // of checkpoint + isEmpty. (Reliable mode keeps the eager
      // checkpoint; Spark's checkpoint-write job subsumes the pass.)
      val updated = labels
        .join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (coalesce(col("ncomp"), col("comp")) < col("comp")).as("changed"))
      val updatedM = if (reliable) updated.checkpoint()
                     else updated.localCheckpoint(eager = false)
      // lazy path: the count-changed aggregate IS the materializing
      // action (one job does both). Reliable path (ADVICE r15): the
      // eager checkpoint already materialized the frame, so the probe
      // is a limit-1 filter over the checkpointed blocks, not a second
      // full aggregate pass.
      converged =
        if (reliable) updatedM.where(col("changed")).isEmpty
        else updatedM
          .agg(count(when(col("changed"), 1)).as("n")).head().getLong(0) == 0L
      // the aggregate scanned every partition, so the lazy checkpoint is
      // fully persisted BEFORE the superseded round's blocks are freed
      release(labelsM, reliable)
      labelsM = updatedM
      labels = updatedM.drop("changed")
      iter += 1
    }
    (labels, sym, converged)
  }

  /** Diameter-adaptive connected components — the front door the
    * dedup pipelines use. Min-label propagation is the cheapest
    * per-round plan (one join + one combinable agg) and near-dup
    * graphs at any scale are USUALLY shallow (most clusters are small
    * and star-shaped), so propagation runs first; but the diameter is
    * unknown in advance — one chain of incremental edits makes
    * O(diameter) rounds the pipeline bottleneck — so if `propRounds`
    * rounds don't converge, the remaining problem is CONTRACTED
    * through the partial labels (edge (u,v) → (label u, label v),
    * loops dropped — sound because label(u) is always a node of u's
    * component, so label-edges preserve components exactly) and
    * finished by [[componentsStar]] in O(log n) rounds. Every
    * component's global minimum id survives contraction as its own
    * label, so the star pass still lands the same fixed point, mapped
    * back with one broadcast-sized join (the contracted label table is
    * ≤ one row per unconverged node). Measured at sf0.1: matches
    * propagation's time on the (shallow) jaccard/minhash near-dup
    * graphs where pure star contraction ran ~25% slower, while
    * bounding the deep-chain worst case at propRounds + O(log n)
    * rounds instead of O(diameter).
    */
  def componentsAdaptive(pairs: DataFrame, propRounds: Int = 8,
                         reliable: Boolean = false): DataFrame = {
    val (labels, sym, converged) = propagate(pairs, propRounds, reliable)
    if (converged) {
      labels.select(col("id").as("doc_id"), col("comp")).orderBy("doc_id")
    } else {
      val contracted = sym
        .join(labels.select(col("id").as("src"), col("comp").as("ca")), "src")
        .join(labels.select(col("id").as("dst"), col("comp").as("cb")), "dst")
        .where(col("ca") =!= col("cb"))
        .select(col("ca").as("id_a"), col("cb").as("id_b"))
      val roots = componentsStar(contracted, reliable = reliable)
        .select(col("doc_id").as("lbl"), col("comp").as("root"))
      labels.join(roots, col("comp") === col("lbl"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("root"), col("comp")).as("comp"))
        .orderBy("doc_id")
    }
  }

  /** Connected components in O(log n) ROUNDS via alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — same fixed point as
    * [[components]] (every node labeled with its component's minimum
    * id) but exponentially fewer rounds: min-label propagation needs
    * O(diameter) iterations, which on a chain-shaped component (the
    * worst case near-dup chains actually produce) means thousands of
    * jobs at 100 TB; star contraction collapses the same chain in
    * ~log₂ rounds. The spec drives a 65-node chain (diameter 64)
    * through in well under 20 rounds.
    *
    * Round = large-star (attach each strictly-larger neighbor of u to
    * min(N(u) ∪ {u})) then small-star (attach each down-neighbor of u,
    * and u itself, to the minimum down-neighbor). Connectivity is
    * preserved because every edge is re-emitted from its lower
    * endpoint's group; at the fixed point the edge set is exactly the
    * (member → root) stars, which IS the label table.
    *
    * Convergence probe: each round runs exactly ONE job — a single-row
    * order-independent signature aggregate
    * (count, bit_xor(xxhash64(hi,lo)), bit_xor(xxhash64(lo,hi))) over
    * the lazily-localCheckpointed round, which doubles as the action
    * that materializes it. Equal edge sets always produce equal
    * signatures; a spurious match needs the symmetric difference to
    * cancel in both independent 64-bit xor channels AND the count —
    * probability ~2⁻¹²⁸ per round. (The first cut re-counted both edge
    * frames and ran `exceptAll` every round: two extra edge-scale
    * shuffles per round on the operator whose whole point is cheap
    * rounds.) The previous round's checkpoint blocks are unpersisted as
    * soon as the next round is materialized, so block-manager storage
    * holds at most two rounds of edges, not O(rounds).
    *
    * `reliable = true` (requires `setCheckpointDir`) swaps the
    * per-round materialization to reliable `checkpoint` — the mode for
    * a real cluster where an executor loss mid-run must not kill a
    * many-round contraction (localCheckpoint blocks die with their
    * executor). Costs one extra job per round (Spark re-runs the round
    * to write the checkpoint files); the prior round's files are
    * deleted once the next round lands, so the dir holds ≤ 2 rounds.
    */
  def componentsStar(pairs: DataFrame, maxIter: Int = 60,
                     reliable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    val sc = pairs.sparkSession.sparkContext
    require(!reliable || sc.getCheckpointDir.isDefined,
      "reliable checkpointing needs spark.sparkContext.setCheckpointDir(...)")
    // lazy checkpoint + signature head(): the ONE action per round
    // (plus Spark's checkpoint-write job in reliable mode)
    def signed(df: DataFrame): (DataFrame, Row) = {
      val cp = if (reliable) df.checkpoint(eager = false)
               else df.localCheckpoint(eager = false)
      val s = cp.agg(
        count(lit(1)),
        expr("bit_xor(xxhash64(hi, lo))"),
        expr("bit_xor(xxhash64(lo, hi))")).head()
      (cp, s)
    }
    def unpersistEdges(df: DataFrame): Unit = release(df, reliable)
    var (edges, sig) = signed(pairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("hi"),
        least(col("u"), col("v")).as("lo"))
      .distinct())
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val gmin = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      // large-star: v > u ≥ m, so (v, m) is already (hi, lo)-canonical
      val large = sym.join(gmin, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .where(col("hi") =!= col("lo"))
        .distinct()
      val smin = large.groupBy("hi").agg(min("lo").as("m"))
      val joined = large.join(smin, "hi")
      // small-star: attach every down-neighbor AND the center to m
      val (next, nextSig) = signed(joined
        .select(col("lo").as("a"), col("m").as("b"))
        .union(joined.select(col("hi").as("a"), col("m").as("b")))
        .where(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("hi"),
          least(col("a"), col("b")).as("lo"))
        .distinct())
      converged = nextSig == sig
      unpersistEdges(edges)
      edges = next
      sig = nextSig
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"Dedup.componentsStar did not converge within $maxIter rounds — " +
          "raise maxIter (log-round contraction should never need this)")
    edges.select(col("hi").as("doc_id"), col("lo").as("comp"))
      .union(edges.select(col("lo").as("doc_id"), col("lo").as("comp")))
      .distinct()
      .orderBy("doc_id")
  }

  /** Component-correct keep list: exact-dup representatives minus every
    * near-dup cluster member that is not its component's minimum —
    * handles transitive chains that pair-wise [[keepList]] misses.
    * Clusters via [[componentsAdaptive]]: propagation speed on the
    * usual shallow graphs, star-contraction bound on deep chains.
    */
  def keepListCC(docs: DataFrame, n: Int, num: Int, den: Int): DataFrame =
    keepListCCFrom(docs,
      componentsAdaptive(jaccardPairsUnsorted(docs, n, num, den)))

  /** [[keepListCC]] over pre-built component labels (doc_id, comp) —
    * the staged entry point ([[graft.sources.DedupStage.ccLabels]]).
    */
  private[graft] def keepListCCFrom(docs: DataFrame,
                                    comp: DataFrame): DataFrame = {
    val reps = exact(docs).select(col("keep_id").as("doc_id"))
    val drops = comp.where(col("doc_id") =!= col("comp")).select("doc_id")
    reps.join(drops, Seq("doc_id"), "left_anti").orderBy("doc_id")
  }

  /** Quality-aware keep list: within each near-dup cluster keep the
    * BEST document — (quality_ok, n_tokens) maximal, ties to the
    * smaller doc_id — instead of [[keepListCC]]'s cluster root. This is
    * the curation rule real pipelines want: near-dups often differ by
    * truncation or boilerplate, and id-order keeps whichever crawled
    * first. Exact copies have identical scores, so the tie-break keeps
    * the exact-dedup representative. One aggregate per cluster (the
    * argmax rides a struct max — no window, no second shuffle).
    */
  def keepBestQuality(docs: DataFrame, n: Int, num: Int, den: Int): DataFrame =
    keepBestQualityFrom(docs,
      componentsAdaptive(jaccardPairsUnsorted(docs, n, num, den)))

  /** [[keepBestQuality]] over pre-built component labels — the staged
    * entry point ([[graft.sources.DedupStage.ccLabels]]).
    */
  private[graft] def keepBestQualityFrom(docs: DataFrame,
                                         comp: DataFrame): DataFrame = {
    val winners = comp
      .join(graft.operators.TextAnalysis.qualityScore(docs), "doc_id")
      .groupBy("comp")
      .agg(max(struct(col("quality_ok").cast("int").as("ok"),
        col("n_tokens").as("nt"), (-col("doc_id")).as("nid"))).as("m"))
      .select((-col("m.nid")).as("doc_id"))
    val reps = exact(docs).select(col("keep_id").as("doc_id"))
    reps.join(comp.select("doc_id"), Seq("doc_id"), "left_anti")
      .union(winners)
      .orderBy("doc_id")
  }

  /** Leakage-proof train/val/test split: the split is assigned by a
    * deterministic hash of the NEAR-DUP COMPONENT id, not the doc id —
    * so a document and all its near-duplicates land in the same split
    * by construction. Splitting by doc id (the naive
    * [[graft.operators.TextAnalysis.datasetSplit]]) silently leaks:
    * two near-identical crawls of one page can straddle train and
    * test, and the eval score measures memorization of the duplicate,
    * not generalization — the classic contamination bug group-wise
    * splitting exists to prevent. Docs in no near-dup pair are their
    * own singleton group (comp = doc_id), so the split rates still
    * hold corpus-wide. Plan: pair generation + adaptive CC (both
    * existing scale paths) + one left join; the hash is the
    * dual-engine md5-prefix used by every sampling operator.
    */
  def splitLeakproof(docs: DataFrame, n: Int, num: Int, den: Int): DataFrame =
    splitLeakproofFrom(docs,
      componentsAdaptive(jaccardPairsUnsorted(docs, n, num, den)))

  /** [[splitLeakproof]] over pre-built component labels — the staged
    * entry point ([[graft.sources.DedupStage.ccLabels]]).
    */
  private[graft] def splitLeakproofFrom(docs: DataFrame,
                                        cc: DataFrame): DataFrame = {
    docs.select("doc_id")
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
      .withColumn("h", expr(
        "cast(conv(substr(md5(cast(comp AS string)), 1, 15), 16, 10) AS bigint)"))
      .select(col("doc_id"), col("comp"),
        when(pmod(col("h"), lit(10L)) < 8, "train")
          .when(pmod(col("h"), lit(10L)) === 8, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- MinHash

  /** MinHash signatures: (doc_id, sig: array<long> of length k).
    * Shingle hashes once via xxhash64 (codegen), then the k affine
    * permutations + elementwise min run inside one native Expression
    * eval per document ([[graft.functions.MinHashSignature]]) — the
    * declarative `transform × array_min` version interpreted k×|shingles|
    * lambdas per doc and was ~100× slower at sf0.1.
    * No shuffle, no UDF, no exploded (doc × perm × shingle) rows.
    */
  def minhashSignatures(docs: DataFrame, n: Int, k: Int, seed: Long = 42L): DataFrame =
    // fillCores (r16): the k-permutation minhash over every shingle
    // hash is the family's heaviest per-row kernel and the documents
    // table fits one scan split — the signature pass serialized on one
    // core (the charCollision winning shape; identity at corpus scale)
    WordCount.fillCores(docs)
      .select(col("doc_id"), WordCount.cleanWords(col("text")).as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"), expr(
        s"transform(sequence(0, size(ws) - $n), i -> xxhash64(concat_ws(' ', slice(ws, i + 1, $n))))")
        .as("hs"))
      .select(col("doc_id"),
        graft.functions.functions.minhash_sig(col("hs"), k, seed).as("sig"))

  /** (doc_id, band, bucket) banding of signatures: b bands of r rows
    * (k = b*r); two documents collide in a band iff that slice of the
    * signatures is identical.
    */
  private[graft] def bandedSigs(sigs: DataFrame, b: Int, r: Int): DataFrame =
    sigs.select(col("doc_id"),
      explode(expr(
        s"""transform(sequence(0, ${b - 1}), i -> struct(
           |  i AS band,
           |  xxhash64(concat_ws('_',
           |    transform(slice(sig, i * $r + 1, $r),
           |              x -> cast(x AS string)))) AS bucket))""".stripMargin))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** LSH candidate pairs from banded signatures. One shuffle on
    * (band, bucket-hash); a pair collides iff some band of the
    * signatures is identical.
    */
  def lshCandidates(sigs: DataFrame, b: Int, r: Int): DataFrame = {
    val banded = bandedSigs(sigs, b, r)
    banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact shingle-Jaccard verification of candidate (id_a, id_b)
    * pairs — emits the survivors of `jaccard > num/den` with their
    * integer evidence, unsorted. Semi-join prune: only candidate
    * documents' shingles enter the verify joins — non-candidate docs
    * (the vast majority at scale) never shuffle their shingle sets.
    */
  private def verifyJaccard(docs: DataFrame, cands: DataFrame, n: Int,
                            num: Int, den: Int): DataFrame =
    verifyJaccardSh(shingles(docs, n), cands, num, den)

  /** [[verifyJaccard]] over a PRE-BUILT (doc_id, shingle) frame — the
    * entry point for index-backed callers whose base shingles are
    * persisted rather than recomputed.
    */
  /** Per-(session, operator) registry of the LAST invocation's eager
    * per-call checkpoints (ADVICE r15): verifyJaccardSh / dedupIncrement
    * / prefixFilterPairs checkpoint at DataFrame-construction time and
    * the frames' blocks otherwise accumulate for the session lifetime —
    * a bench min-of-3 or a test suite piles up one generation per run.
    * Superseding an invocation releases the previous one's blocks
    * (bounded at ONE retained generation per operator); every harness
    * sinks a result before re-invoking the operator, and a released
    * frame fails loudly (truncated lineage) if that contract is broken.
    */
  private val perCallCheckpoints =
    new graft.sources.SessionCache[String,
      java.util.concurrent.atomic.AtomicReference[Seq[DataFrame]]]()

  private def trackPerCall(tag: String, frames: Seq[DataFrame]): Unit = {
    val ref = perCallCheckpoints.getOrDerive(frames.head.sparkSession, tag)(
      new java.util.concurrent.atomic.AtomicReference(Seq.empty))
    ref.getAndSet(frames).foreach(release(_))
  }

  private[graft] def verifyJaccardSh(shAll: DataFrame, cands: DataFrame,
                                     num: Int, den: Int): DataFrame = {
    // r15: the verify consumed its two inputs from THREE subtree copies
    // each (cands: candIds ∪ the pair join; sh: sz + both join sides) —
    // with no runtime exchange reuse, the candidate generator and the
    // shingle derivation re-ran per copy. Both frames are checkpointed
    // once: cands is bounded by band/prefix collisions and sh by
    // candidate documents (the semi-join prune runs INSIDE the
    // checkpointed derivation — [[prunedShingles]] — so non-candidate
    // docs still never materialize their shingles; plan-audited).
    val candsM = cands.localCheckpoint()
    val sh = prunedShingles(shAll, candsM).localCheckpoint()
    trackPerCall("verifyJaccardSh", Seq(candsM, sh))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    candsM
      .join(sh.as("a"), col("id_a") === col("a.doc_id"))
      .join(sh.as("b"), col("id_b") === col("b.doc_id") &&
        col("a.shingle") === col("b.shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sz.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("sa.n_sh") + col("sb.n_sh") - col("inter")).as("uni"))
      .where(col("inter") * den > col("uni") * num)
  }

  /** The verify's candidate-document shingle frame: `shAll` semi-join
    * pruned to documents appearing in `cands` — split out so the
    * 100 TB prune contract (non-candidate docs never shuffle their
    * shingles) stays plan-auditable now that [[verifyJaccardSh]]
    * checkpoints the pruned result.
    */
  private[graft] def prunedShingles(shAll: DataFrame,
                                    cands: DataFrame): DataFrame = {
    val candIds = cands.select(col("id_a").as("doc_id"))
      .union(cands.select(col("id_b").as("doc_id"))).distinct()
    shAll.join(candIds, Seq("doc_id"), "left_semi")
  }

  /** MinHash near-duplicate pairs: LSH candidates verified by exact
    * shingle Jaccard (integer threshold num/den). The 100 TB path:
    * candidate generation is the only quadratic step and is bounded by
    * band collisions, not corpus size.
    */
  def minhashPairs(docs: DataFrame, n: Int, b: Int, r: Int,
                   num: Int, den: Int, seed: Long = 42L): DataFrame =
    minhashPairsUnsorted(docs, n, b, r, num, den, seed)
      .orderBy("id_a", "id_b")

  /** [[minhashPairs]] without the final sort — the form
    * [[graft.sources.DedupStage]] checkpoints and CC consumes.
    */
  private[graft] def minhashPairsUnsorted(docs: DataFrame, n: Int, b: Int,
                                          r: Int, num: Int, den: Int,
                                          seed: Long = 42L): DataFrame =
    verifyJaccard(docs,
      lshCandidates(minhashSignatures(docs, n, b * r, seed), b, r),
      n, num, den)

  /** Incremental dedup — the nightly-increment production shape: which
    * INCOMING documents (doc_id > baseMaxId) duplicate the existing
    * corpus or an earlier-id incoming doc, WITHOUT ever re-pairing the
    * base against itself. Output: (doc_id, reason) with reason `exact`
    * (fingerprint already exists at a smaller id) taking priority over
    * `near` (verified MinHash near-duplicate of a smaller id).
    *
    * Scale shape: the exact probe is one shuffle on the 128-bit
    * fingerprint (min-id per group rides the same agg). The near probe
    * bands ALL signatures but restricts the bucket join to pairs whose
    * RIGHT side is incoming — candidate volume ∝ increment size ×
    * collision rate, never base²; in production the base's banded
    * index and shingle sizes are precomputed once and reused across
    * increments (bucket by (band, bucket) at write time), so each
    * nightly run shuffles only the increment.
    */
  def dedupIncrement(docs: DataFrame, baseMaxId: Long, n: Int, b: Int, r: Int,
                     num: Int, den: Int, seed: Long = 42L): DataFrame = {
    // r15: the fingerprint scan fed two subtree copies (the min-id agg
    // and the join-back), the banded-signature derivation two (both
    // sides of the bucket join), and the exact-drop set two (the
    // output union and the near-drop anti join) — with no runtime
    // exchange reuse each copy re-ran from parquet (52 scan nodes in
    // the plan). Checkpoint each shared frame once: fp and banded are
    // corpus-linear narrow rows, exactDrops is increment-bounded.
    val fp = docs.select(col("doc_id"), md5(col("text")).as("fp"))
      .localCheckpoint()
    val exactDrops = fp.groupBy("fp").agg(min("doc_id").as("keep_id"))
      .join(fp, "fp")
      .where(col("doc_id") > baseMaxId && col("doc_id") > col("keep_id"))
      .select("doc_id")
      .localCheckpoint()
    val banded = bandedSigs(minhashSignatures(docs, n, b * r, seed), b, r)
      .localCheckpoint()
    trackPerCall("dedupIncrement", Seq(fp, exactDrops, banded))
    val cands = banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
      .where(col("b.doc_id") > baseMaxId && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val nearDrops = verifyJaccard(docs, cands, n, num, den)
      .select(col("id_b").as("doc_id")).distinct()
    exactDrops.select(col("doc_id"), lit("exact").as("reason"))
      .union(nearDrops.join(exactDrops, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit("near").as("reason")))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document from token hashes: bit j of the
    * signature is the sign of Σ_tokens (±1 by bit j of hash(token)).
    * Pure per-row array math.
    *
    * Token hash: the first 15 hex chars of md5 as a 60-bit integer —
    * chosen over xxhash64 because it is bit-identically computable in
    * other engines (the DuckDB oracle reproduces it with strpos/shift
    * arithmetic), making the whole simhash pipeline hash-verifiable.
    * Bits 60-63 of the signature are always 0 (counts are −n there),
    * identically on both engines; the 4×16-bit banding is unaffected.
    */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), WordCount.cleanWords(col(textCol)).as("ws"))
      .where(size(col("ws")) > 0)
      .select(col("doc_id"), expr(
        "transform(ws, w -> cast(conv(substr(md5(w), 1, 15), 16, 10) AS bigint))")
        .as("hs"))
      .select(col("doc_id"),
        graft.functions.functions.simhash64(col("hs")).as("simhash"))

  /** SimHash near-duplicate pairs with Hamming distance <= maxDist,
    * found via pigeonhole banding on four 16-bit blocks (a pair within
    * distance 3 must agree on at least one block), then verified with
    * bit_count(xor). Output: (id_a, id_b, hamming).
    */
  /** The corpus ∪ deterministic "half-doc" plants: for every doc with
    * `doc_id % mod == 0`, a synthetic document whose text is the first
    * ⌊len/2⌋ cleaned tokens — a sub-document fully CONTAINED in its
    * source (containment ≈ 1.0) while its Jaccard is only ≈ 0.5, the
    * phenomenon [[containmentPairs]] exists to catch and
    * [[jaccardPairs]] provably misses. Cleaning is idempotent, so both
    * engines rebuild the identical plant from the same tokens.
    */
  def plantHalfDocs(docs: DataFrame, mod: Int = 83, idOffset: Long = 300000L): DataFrame = {
    val plants = docs.where(col("doc_id") % mod === 0)
      .select((col("doc_id") + idOffset).as("doc_id"),
        WordCount.cleanWords(col("text")).as("ws"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("ws"), lit(1),
          floor(size(col("ws")) / 2).cast("int"))).as("text"))
    docs.select("doc_id", "text").unionByName(plants)
  }

  /** Asymmetric near-duplicate pairs by n-gram CONTAINMENT of the
    * smaller document in the larger: emits (id_a, id_b, inter, n_small)
    * where `inter * den > min(|A|,|B|) * num` — i.e. containment >
    * num/den, integer-exact. Jaccard misses a short document pasted
    * verbatim into a long one (J = |A|/|B| → 0 as B grows); containment
    * is 1.0 there. Same inverted-shingle blocking and one-shuffle
    * pair-count as [[jaccardPairs]]; only the acceptance predicate
    * differs, so the 100 TB posture is identical (sample-scale oracle;
    * the banded paths are the scale siblings).
    */
  def containmentPairs(docs: DataFrame, n: Int, num: Int, den: Int): DataFrame = {
    val sh = shingles(docs, n)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"), "shingle")
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"), col("inter"),
        least(col("sa.n_sh"), col("sb.n_sh")).as("n_small"))
      .where(col("inter") * den > col("n_small") * num)
      .orderBy("id_a", "id_b")
  }

  /** Ratio-based fuzzy decontamination (the GPT-3/PaLM-style "dirty
    * document" rule): a corpus document is flagged when at least
    * `thrX1000`/1000 of its own distinct n-grams also occur in the
    * benchmark set — [[decontaminate]]'s absolute shared-gram count
    * normalized by document size, so long documents aren't flagged for
    * one incidental collision. Benchmark grams broadcast; the corpus
    * side is a shuffle-free probe (broadcast left outer join) plus one
    * per-doc aggregation.
    */
  def decontaminateFuzzy(docs: DataFrame, benchMaxId: Long, n: Int,
                         thrX1000: Int): DataFrame = {
    val bench = shingles(docs.where(col("doc_id") <= benchMaxId), n)
      .select("shingle").distinct().withColumn("hit", lit(1L))
    // same fillCores reasoning as [[decontaminate]] (r16)
    shingles(WordCount.fillCores(docs.where(col("doc_id") > benchMaxId)), n)
      .join(broadcast(bench), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .where(col("n_shared") * 1000 >= col("n_grams") * thrX1000)
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        expr("n_shared * 1000 div n_grams").as("ratio_x1000"))
      .orderBy("doc_id")
  }

  /** The corpus-build VERDICT table: every corpus document with a
    * bitmask of the filter rules it fails — bit 0 (1) Gopher rule
    * screen, bit 1 (2) exact-duplicate copy (not its group's min-id
    * representative), bit 2 (4) benchmark contamination, bit 3 (8)
    * near-duplicate drop (the higher id of a Jaccard pair) — and
    * `keep = (mask == 0)`. This is the attribution report a real
    * pipeline publishes next to the keep list: WHY each document was
    * dropped, one row per doc. Each signal keeps its own scale shape
    * (per-row codegen rules, one fp shuffle, broadcast bench probe,
    * banded-verify pairs at scale); the verdict is three left joins on
    * doc_id against frames far smaller than the corpus.
    */
  def corpusFilterReport(docs: DataFrame, benchMaxId: Long = 50L,
                         benchN: Int = 8, n: Int = 3, num: Int = 4,
                         den: Int = 5): DataFrame = {
    val corpus = docs.where(col("doc_id") > benchMaxId)
    corpusFilterReportFrom(docs, jaccardPairsUnsorted(corpus, n, num, den),
      benchMaxId, benchN)
  }

  /** [[corpusFilterReport]] over a pre-built pair frame covering AT
    * LEAST the post-benchmark corpus — the staged entry point.
    * Accepts the full-corpus pair set ([[graft.sources.DedupStage
    * .pairs]]): Jaccard is pair-local, so pairs-over-the-subset equals
    * pairs-over-everything filtered to `id_a > benchMaxId` (id_a < id_b
    * makes that condition cover both endpoints).
    */
  private[graft] def corpusFilterReportFrom(docs: DataFrame,
                                            pairs: DataFrame,
                                            benchMaxId: Long = 50L,
                                            benchN: Int = 8): DataFrame = {
    val corpus = docs.where(col("doc_id") > benchMaxId)
    val gopher = TextAnalysis.gopherRules(corpus)
      .select(col("doc_id"), col("gopher_ok"))
    val keepers = exact(corpus)
      .select(col("keep_id").as("doc_id"), lit(true).as("is_keeper"))
    val contam = decontaminate(docs, benchMaxId, benchN, fill = false)
      .select(col("doc_id"), lit(true).as("contam"))
    val drops = pairs.where(col("id_a") > benchMaxId)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("neardup", lit(true))
    gopher.join(keepers, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (when(!col("gopher_ok"), 1L).otherwise(0L) +
          when(col("is_keeper").isNull, 2L).otherwise(0L) +
          when(col("contam").isNotNull, 4L).otherwise(0L) +
          when(col("neardup").isNotNull, 8L).otherwise(0L)).as("reason_mask"))
      .withColumn("keep", col("reason_mask") === 0L)
      .orderBy("doc_id")
  }

  /** Threshold-sensitivity report for Jaccard dedup: with the
    * (inter, uni) pair frame computed ONCE, the surviving-pair count
    * at several thresholds — the tuning sweep that shows how sharp
    * the duplicate/distinct boundary is before anyone locks a
    * threshold in. Conditional aggregation over the pair frame; no
    * recomputation per threshold.
    */
  def thresholdSweep(docs: DataFrame, n: Int): DataFrame = {
    val sh = shingles(docs, n)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"), "shingle")
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.toDF("id_a", "na"), "id_a")
      .join(sz.toDF("id_b", "nb"), "id_b")
      .select(col("inter"), (col("na") + col("nb") - col("inter")).as("uni"))
    pairs.agg(
        count(lit(1)).as("n_candidates"),
        sum(when(col("inter") * 10 > col("uni") * 7, 1L).otherwise(0L))
          .as("n_over_70"),
        sum(when(col("inter") * 5 > col("uni") * 4, 1L).otherwise(0L))
          .as("n_over_80"),
        sum(when(col("inter") * 10 > col("uni") * 9, 1L).otherwise(0L))
          .as("n_over_90"))
  }

  /** Near-duplicate CLUSTER-SIZE histogram — the dedup observability
    * rollup one level above [[dupStatsBySource]]: connected components
    * over the near-dup pairs, then (cluster size → number of
    * clusters). Singleton documents (no near-dup) are counted as
    * size-1 clusters so the histogram masses sum to the corpus. A
    * fat tail here means one template is flooding the corpus — the
    * first thing a curation on-call looks at. Cost beyond the CC run:
    * two tiny keyed aggs over component-sized frames.
    */
  def clusterSizeHistogram(docs: DataFrame, n: Int, num: Int,
                           den: Int): DataFrame =
    clusterSizeHistogramFrom(docs,
      componentsAdaptive(jaccardPairsUnsorted(docs, n, num, den),
        propRounds = 1))

  /** [[clusterSizeHistogram]] over pre-built component labels — the
    * staged entry point ([[graft.sources.DedupStage.ccLabels]]; every
    * CC variant converges to the same min-id fixed point, so the
    * propRounds used to derive the labels doesn't change them).
    */
  private[graft] def clusterSizeHistogramFrom(docs: DataFrame,
                                              comp: DataFrame): DataFrame = {
    val sizes = comp.groupBy("comp").agg(count(lit(1)).as("sz"))
    val nonSingleton = sizes.agg(sum("sz").as("covered"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val singletons = total.crossJoin(broadcast(nonSingleton))
      .select((col("n_docs") - coalesce(col("covered"), lit(0L))).as("n_clusters"))
      .withColumn("cluster_size", lit(1L))
      .where(col("n_clusters") > 0)
      .select("cluster_size", "n_clusters")
    sizes.groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .unionByName(singletons)
      .groupBy("cluster_size").agg(sum("n_clusters").as("n_clusters"))
      .orderBy("cluster_size")
  }

  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    // 4-block banding only guarantees a shared block for distance <= 3
    // (pigeonhole); a larger radius needs maxDist+1 blocks.
    require(maxDist >= 0 && maxDist <= 3, "4-block banding covers maxDist <= 3")
    // r16: the block self-join consumed TWO copies of the signature
    // subtree (plan: two parquet scans, the per-word md5 + simhash64
    // kernel — the dominant cost — run per side), and the whole
    // derivation sat on one scan split. fillCores spreads the per-row
    // kernel; the checkpoint makes both join sides read the one
    // materialized signature frame (un-hinted join: tiny shuffle here,
    // and at corpus scale the banding self-join is a shuffle anyway).
    val sigs = simhash(WordCount.fillCores(docs)).localCheckpoint()
    trackPerCall("simhashPairs", Seq(sigs))
    val blocks = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("blk"),
          shiftrightunsigned(col("simhash"), 16 * i)
            .bitwiseAND(lit(0xFFFFL)).as("v"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.blk").as("blk"), col("bb.v").as("v"))
    blocks.as("a").join(blocks.as("b"), Seq("blk", "v"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
      .orderBy("id_a", "id_b")
  }

  /** Jaccard near-dup pairs via PPJoin-style PREFIX FILTERING — the
    * third scale path next to MinHash-LSH and SimHash, and unlike
    * those it is LOSSLESS: for J(A,B) ≥ t = num/den, the pair must
    * share at least one shingle among each side's first
    * |X| − ⌈t·|X|⌉ + 1 shingles in a global rarest-first order
    * (ascending document frequency), so joining only the prefixes
    * generates a candidate superset of the answer, then the exact
    * verify runs per-candidate on the full sets. Emits the same
    * (id_a, id_b, inter, uni) rows as [[jaccardPairs]] — the oracle
    * is literally that query.
    *
    * 100 TB posture: the inverted index is built over PREFIX shingles
    * only (the rarest ~20% at t = 0.8), and candidate volume is
    * Σ df_prefix² over rare shingles — orders below the full-index
    * join; the verify joins two sorted arrays per candidate pair
    * (array_intersect), never re-scanning the corpus. The df ranking
    * costs one extra aggregate + window over (doc, shingle).
    */
  def prefixFilterPairs(docs: DataFrame, n: Int, num: Int, den: Int): DataFrame = {
    // ONE pass builds the per-doc sorted distinct shingle-set frame and
    // materializes it (r15): the df ranking, the prefix index, BOTH
    // sides of the candidate join and the verify all re-derived
    // `shingles()` before — five scan+explode+distinct subtrees per run
    // (16 parquet scans in the plan, 0 reused exchanges; 22.5 MB
    // shuffled). collect_set replaces the standalone distinct shuffle
    // (map-side partial sets dedup before the exchange), and every
    // branch now explodes the checkpointed blocks instead of rescanning
    // text. The checkpoint is doc-keyed (corpus-linear) — the same
    // frame the verify step needed anyway.
    val sets = docs
      .select(col("doc_id"), WordCount.cleanWords(col("text")).as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ws) - $n), i -> concat_ws(' ', slice(ws, i + 1, $n)))"))
        .as("shingle"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("shingle"))).as("shs"))
      .select(col("doc_id"), col("shs"),
        size(col("shs")).cast("long").as("n_sh"))
      .localCheckpoint()
    trackPerCall("prefixFilterPairs", Seq(sets))
    val sh = sets.select(col("doc_id"), col("n_sh"),
      explode(col("shs")).as("shingle"))
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    // rarest-first global order; (df, shingle) is a deterministic total
    // order so both plan runs and the spec agree on the prefix
    val ranked = sh.join(dfreq, "shingle")
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "shingle")))
      // prefix length: n_sh − ⌈t·n_sh⌉ + 1 with ⌈num·x/den⌉ in ints
      .where(col("r") <=
        col("n_sh") - expr(s"($num * n_sh + $den - 1) div $den") + 1)
      .select("doc_id", "shingle")
    val cand = ranked.as("a").join(ranked.as("b"), "shingle")
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // exact verify: sorted shingle arrays meet per candidate pair.
    // The two sides are DISTINCT projections (renamed columns), not
    // dataset aliases of one frame — a self-aliased join would let the
    // analyzer resolve sa.shs and sb.shs to the same attribute and
    // make the intersect trivially the whole set.
    val setsA = sets.select(col("doc_id").as("id_a"),
      col("shs").as("shs_a"), col("n_sh").as("n_a"))
    val setsB = sets.select(col("doc_id").as("id_b"),
      col("shs").as("shs_b"), col("n_sh").as("n_b"))
    cand
      .join(setsA, "id_a")
      .join(setsB, "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long").as("inter"),
        col("n_a"), col("n_b"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("n_a") + col("n_b") - col("inter")).as("uni"))
      .where(col("inter") * den > col("uni") * num)
      .orderBy("id_a", "id_b")
  }

  /** MOSS winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003): hash
    * every word k-gram, then in each window of `w` consecutive hashes
    * keep the RIGHTMOST minimum — guaranteed density 2/(w+1) with a
    * coverage guarantee (any shared run of w+k-1 tokens shares at least
    * one selected fingerprint). Emits (doc_id, n_fps, fp_xor), the
    * per-doc fingerprint-set digest.
    *
    * Scale posture: entirely per-row array math inside codegen — zero
    * shuffles, and the fingerprint set is ~2/(w+1) the size of the full
    * gram stream, which is exactly the win over shingle-based indexes
    * at 100 TB (the index that gets shuffled/joined downstream is 2.5×
    * smaller at w=4 while keeping the match guarantee).
    *
    * Both engines compute the rightmost-min by the same primitive
    * formula — the oracle spells it
    * `j + w − position(reverse(window), min(window))`; the Spark side
    * runs [[graft.functions.WinnowFingerprints]], a native codegen
    * expression with the identical contract (60-bit md5-prefix gram
    * hash, rightmost-min per window, distinct positions). The native
    * kernel replaced the transform/slice/reverse/array_min lambda
    * chain — spec-pinned equal to it, and measured ~3× faster at
    * sf0.1 (interpreted per-element closures were the cost, the
    * [[graft.operators.TextAnalysis.charCollision]] lesson again).
    */
  private[graft] def winnowSelected(docs: DataFrame, k: Int, w: Int): DataFrame =
    docs.select(col("doc_id"),
        graft.operators.WordCount.cleanWords(col("text")).as("ws"))
      .where(size(col("ws")) >= k + w - 1)
      .select(col("doc_id"),
        graft.functions.functions.winnow_fps(col("ws"), k, w).as("fps"))

  /** Per-doc winnowing digest: (doc_id, n_fps, fp_xor). */
  def winnowFingerprints(docs: DataFrame, k: Int = 4, w: Int = 4): DataFrame =
    winnowSelected(docs, k, w)
      .select(col("doc_id"), size(col("fps")).cast("long").as("n_fps"),
        expr("aggregate(fps, 0L, (acc, x) -> acc ^ x)").as("fp_xor"))
      .orderBy("doc_id")

  /** Index cost model: for each candidate index (distinct 3-gram
    * shingles, distinct 4-gram shingles, winnowed 4-gram fingerprints)
    * the key count, posting count, and the candidate-pair volume a
    * self-join of that index would emit — est_pairs = Σ df·(df−1)/2
    * over keys. This is the number that decides index choice at
    * 100 TB BEFORE running the join; the winnow row quantifies the
    * density claim (≈ 2/(w+1) of the 4-gram postings) directly.
    * One df rollup per index, 1-row outputs unioned.
    */
  def dedupCostModel(docs: DataFrame): DataFrame = {
    def stat(name: String, keyed: DataFrame): DataFrame =
      keyed.groupBy("key").agg(count(lit(1)).as("df"))
        .agg(count(lit(1)).as("n_keys"), sum("df").as("n_postings"),
          sum(expr("df * (df - 1) div 2")).as("est_pairs"))
        .select(lit(name).as("method"), col("n_keys"), col("n_postings"),
          col("est_pairs"))
    val sh3 = shingles(docs, 3).select(col("shingle").as("key"))
    val sh4 = shingles(docs, 4).select(col("shingle").as("key"))
    val wn = winnowSelected(docs, 4, 4)
      .select(col("doc_id"), explode(array_distinct(col("fps"))).as("key"))
      .select("key")
    stat("shingle3", sh3)
      .unionByName(stat("shingle4", sh4))
      .unionByName(stat("winnow4", wn))
      .orderBy("method")
  }

  /** Candidate-generator evaluation: winnow pairs (minShared = 1, the
    * recall setting) scored against the exact n-gram-Jaccard truth —
    * (n_truth, n_detected, n_hit, precision_ppm, recall_ppm). The
    * measured contract behind using winnowing as the first stage of a
    * dedup pipeline: recall_ppm = 10⁶ at every SF (the w+k−1 coverage
    * guarantee catches every Jaccard-0.8 pair on this corpus), while
    * precision is what the cheap verify stage exists to fix. All three
    * counts are 1-row aggregates crossed broadcast-style.
    */
  def winnowEval(docs: DataFrame, n: Int = 3, num: Int = 4, den: Int = 5,
                 k: Int = 4, w: Int = 4): DataFrame =
    winnowEvalFrom(docs, jaccardPairsUnsorted(docs, n, num, den), k, w)

  /** [[winnowEval]] over a pre-built truth pair set — the staged entry
    * point ([[graft.sources.DedupStage.pairs]] IS the same
    * jaccardPairs(3, 4, 5) derivation, materialized once per session;
    * r16 stops this gate re-deriving it from raw text).
    */
  private[graft] def winnowEvalFrom(docs: DataFrame, truthPairs: DataFrame,
                                    k: Int = 4, w: Int = 4): DataFrame = {
    val det = winnowPairs(docs, k, w, minShared = 1).select("id_a", "id_b")
    val truth = truthPairs.select("id_a", "id_b")
    val hit = truth.join(det, Seq("id_a", "id_b"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(det.agg(count(lit(1)).as("n_detected"))))
      .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hit"))))
      .select(col("n_truth"), col("n_detected"), col("n_hit"),
        expr("n_hit * 1000000 div greatest(1L, n_detected)").as("precision_ppm"),
        expr("n_hit * 1000000 div greatest(1L, n_truth)").as("recall_ppm"))
  }

  /** Incremental winnow probe — the nightly-batch shape of
    * [[winnowPairs]]: only documents with `doc_id > baseMaxId` (the
    * new arrivals) probe the base corpus' winnowed fingerprint index;
    * base documents are NEVER re-paired with each other, so the join
    * volume is |new index| × collision rate, not |corpus|². Emits
    * (new_id, base_id, shared).
    */
  def winnowIncrement(docs: DataFrame, baseMaxId: Long, k: Int = 4,
                      w: Int = 4, minShared: Int = 3): DataFrame = {
    val e = winnowSelected(docs, k, w)
      .select(col("doc_id"), explode(array_distinct(col("fps"))).as("fp"))
    val base = e.where(col("doc_id") <= baseMaxId)
      .select(col("doc_id").as("base_id"), col("fp"))
    val fresh = e.where(col("doc_id") > baseMaxId)
      .select(col("doc_id").as("new_id"), col("fp"))
    fresh.join(base, "fp")
      .groupBy("new_id", "base_id").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
      .orderBy("new_id", "base_id")
  }

  /** Golden-record construction (MDM survivorship) over the fuzzy
    * entity clusters: per cluster the canonical name is the longest
    * (ties to the lexicographically smallest), plus member count and
    * summed balance cents — the merge step that turns ER clusters into
    * one master record each. Cluster shape is [[componentsStar]] over
    * [[blockedFuzzyPairs]]; the survivorship pick is one window over
    * cluster-sized groups, so the whole merge is two keyed shuffles.
    */
  def goldenRecord(customer: DataFrame, maxDist: Int = 1): DataFrame =
    goldenRecordFrom(customer,
      componentsStar(blockedFuzzyPairs(customer, maxDist))
        .select(col("doc_id").as("custkey"), col("comp")))

  /** [[goldenRecord]] over pre-built entity clusters (custkey, comp) —
    * the staged entry point ([[graft.sources.DedupStage
    * .fuzzyClusters]]).
    */
  private[graft] def goldenRecordFrom(customer: DataFrame,
                                      cl: DataFrame): DataFrame = {
    // NOTE: m feeds two consumers (survivorship window + balance
    // rollup); componentsStar already materializes the expensive CC
    // state internally, so re-deriving the cheap join twice measured
    // FASTER than localCheckpointing m here (5.0 vs 6.1 s at sf0.1)
    val m = cl.join(customer, cl("custkey") === customer("c_custkey"))
      .select(col("comp"), col("c_name"),
        expr("cast(round(c_acctbal * 100) AS bigint)").as("bal_c"))
    val best = m
      .withColumn("rn", row_number().over(Window.partitionBy("comp")
        .orderBy(length(col("c_name")).desc, col("c_name"))))
      .where(col("rn") === 1)
      .select(col("comp"), col("c_name").as("golden_name"))
    m.groupBy("comp")
      .agg(count(lit(1)).as("n_members"), sum(col("bal_c")).as("bal_cents"))
      .join(best, "comp")
      .select(col("comp"), col("golden_name"), col("n_members"), col("bal_cents"))
      .orderBy("comp")
  }

  /** Near-duplicate pairs by shared winnowing fingerprints: the
    * fingerprint inverted index is 2/(w+1) the size of the full shingle
    * index, and the coverage guarantee means any pair sharing a run of
    * ≥ w+k-1 tokens still collides. One shuffle on fp; pair volume is
    * Σ df² over the winnowed (not full) index.
    */
  def winnowPairs(docs: DataFrame, k: Int = 4, w: Int = 4,
                  minShared: Int = 3): DataFrame = {
    val e = winnowSelected(docs, k, w)
      .select(col("doc_id"), explode(array_distinct(col("fps"))).as("fp"))
    val a = e.select(col("doc_id").as("id_a"), col("fp"))
    val b = e.select(col("doc_id").as("id_b"), col("fp"))
    a.join(b, "fp")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
      .orderBy("id_a", "id_b")
  }

  /** Pair-counting Rand index between two dedup CLUSTERINGS — the
    * cluster-level eval above [[winnowEval]]'s pair-level one: the
    * exact-Jaccard components (truth) vs the winnow-fingerprint
    * components (the cheap index's view), compared on every unordered
    * document pair (together-in-both + apart-in-both over C(n,2), in
    * exact ppm). The quadrant counts (pairs_exact / pairs_winnow /
    * pairs_both) show WHERE the index clustering diverges — extra
    * merges (winnow-only pairs) vs missed merges (exact-only) —
    * which a single recall number cannot.
    *
    * Scale shape: both clusterings run the existing CC machinery;
    * co-clustered pair explosion is Σ C(|cluster|,2) — bounded by
    * true duplication, never corpus² — and the quadrant counts are
    * three count-aggregates. C(n,2) enters only as arithmetic on the
    * 1-row doc count, never as a frame. The eval-only quadratic is
    * the exact-Jaccard TRUTH side ([[jaccardPairs]]); the gate runs
    * it SAMPLE-BOUNDED: `samplePct` keeps a deterministic md5-hash
    * sample of the documents (mirrored bit-for-bit in the oracle), so
    * the truth join pays pct²/10⁴ of the full cost while the Rand
    * index stays an exact measurement over a well-defined
    * sub-population. samplePct = 100 is the full-corpus eval.
    */
  def randIndexEval(docs: DataFrame, n: Int = 3, num: Int = 4,
                    den: Int = 5, k: Int = 4, w: Int = 4,
                    minShared: Int = 3, samplePct: Int = 100): DataFrame =
    randIndexEvalFrom(docs, jaccardPairsUnsorted(docs, n, num, den),
      k, w, minShared, samplePct)

  /** [[randIndexEval]] over a pre-built FULL-corpus truth pair set —
    * the staged entry point ([[graft.sources.DedupStage.pairs]]).
    * Jaccard of a pair depends only on the two documents' own shingle
    * sets, so the sampled-corpus truth `jaccardPairs(sample(docs))`
    * equals the full-corpus pair set filtered to pairs whose BOTH
    * endpoints pass the sample predicate — the r16 rewrite that lets
    * the gate probe the session-staged frame instead of re-running the
    * quadratic truth join over the sample.
    */
  private[graft] def randIndexEvalFrom(docs: DataFrame, fullPairs: DataFrame,
                                       k: Int = 4, w: Int = 4,
                                       minShared: Int = 3,
                                       samplePct: Int = 100): DataFrame = {
    def pri(c: String) = pmod(expr(
      s"cast(conv(substr(md5(cast($c AS string)), 1, 15), 16, 10) AS bigint)"),
      lit(100L))
    val d = if (samplePct >= 100) docs
    else docs.where(pri("doc_id") < samplePct)
    val truth = if (samplePct >= 100) fullPairs.select("id_a", "id_b")
    else fullPairs.where(pri("id_a") < samplePct && pri("id_b") < samplePct)
      .select("id_a", "id_b")
    def coPairs(cc: DataFrame): DataFrame = {
      val a = cc.select(col("doc_id").as("x"), col("comp"))
      val b = cc.select(col("doc_id").as("y"), col("comp"))
      a.join(b, Seq("comp")).where(col("x") < col("y")).select("x", "y")
    }
    // the two CC chains are independent iterative loops whose rounds
    // block the driver; overlapping them on two driver threads (guide
    // §2.6) lets each loop's tiny jobs back-fill the other's idle
    // cores — results are deterministic regardless of scheduling
    val ec = scala.concurrent.ExecutionContext.global
    val fa = scala.concurrent.Future(coPairs(componentsAdaptive(truth)))(ec)
    val fb = scala.concurrent.Future(coPairs(componentsAdaptive(
      winnowPairs(d, k, w, minShared).select("id_a", "id_b"))))(ec)
    val pa = scala.concurrent.Await.result(
      fa, scala.concurrent.duration.Duration.Inf)
    val pb = scala.concurrent.Await.result(
      fb, scala.concurrent.duration.Duration.Inf)
    val both = pa.join(pb, Seq("x", "y"))
    d.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(pa.agg(count(lit(1)).as("pairs_exact"))))
      .crossJoin(broadcast(pb.agg(count(lit(1)).as("pairs_winnow"))))
      .crossJoin(broadcast(both.agg(count(lit(1)).as("pairs_both"))))
      .select(col("n_docs"), col("pairs_exact"), col("pairs_winnow"),
        col("pairs_both"),
        // agree = both + apart-in-both = C - pe - pw + 2*ab
        expr("(pairs_both + (n_docs * (n_docs - 1) div 2) - pairs_exact" +
          " - pairs_winnow + pairs_both) * 1000000" +
          " div greatest(1L, n_docs * (n_docs - 1) div 2)")
          .as("rand_index_ppm"))
  }

  /** MinHash ESTIMATOR accuracy — the sketch-error twin of
    * [[winnowEval]] (which measures candidate-generator recall): for
    * every true near-dup pair (exact shingle Jaccard > num/den), the
    * k-permutation signature-agreement estimate `matches·10⁶ div k`
    * is compared against the exact `inter·10⁶ div uni`; emits one row
    * (n_pairs, mean_abs_err_ppm, max_abs_err_ppm). Shingles hash
    * through the dual-engine md5-prefix 60-bit hash (not xxhash64) so
    * the signatures — and hence the error ppm values — are
    * reproducible outside the JVM; permutation constants are the
    * seed-derived affine family of
    * [[graft.functions.MinHashSignature]].
    *
    * At 100 TB this runs over a pair SAMPLE next to the production
    * minhash job and answers "how many signature rows do I need for
    * the banding thresholds I chose" with a measurement, not the
    * textbook 1/sqrt(k) bound.
    */
  def minhashEval(docs: DataFrame, n: Int = 3, k: Int = 16,
                  seed: Long = 42L, num: Int = 1, den: Int = 5): DataFrame = {
    // (r16 NEGATIVE RESULT: fillCores on this derivation measured and
    // rejected — 2.15 → 2.57 s; the truth join dominates the gate and
    // shuffles on shingle, so the spread buys nothing it keeps)
    val hs = docs
      .select(col("doc_id"), WordCount.cleanWords(col("text")).as("ws"))
      .where(size(col("ws")) >= n)
      .select(col("doc_id"), expr(
        s"transform(sequence(0, size(ws) - $n), i -> " +
          s"cast(conv(substr(md5(concat_ws(' ', slice(ws, i + 1, $n))), 1, 15), 16, 10) AS bigint))")
        .as("hs"))
    val sigs = hs.select(col("doc_id"),
      graft.functions.functions.minhash_sig(col("hs"), k, seed).as("sig"))
    val scored = jaccardPairs(docs, n, num, den)
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(
        expr(s"cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) AS bigint)" +
          s" * 1000000 div $k").as("est_ppm"),
        expr("inter * 1000000 div uni").as("exact_ppm"))
      .select(abs(col("est_ppm") - col("exact_ppm")).as("err"))
    scored.agg(count(lit(1)).as("n_pairs"),
      expr("coalesce(sum(err), 0L) div greatest(1L, count(1))")
        .as("mean_abs_err_ppm"),
      coalesce(max(col("err")), lit(0L)).as("max_abs_err_ppm"))
  }

  /** Measured Bloom-filter false-positive rate — the sketch-error eval
    * for the membership prefilter the exact-dedup increment path would
    * deploy at 100 TB (probe a compact bit set BEFORE the exact
    * fingerprint anti-join; every Bloom negative skips the shuffle).
    * The filter is expressed RELATIONALLY so both engines share it
    * bit-for-bit: positions j∈[0,k) of a fingerprint are the
    * Kirsch–Mitzenmacher double hashes `(h1 + j·h2) mod m` over two
    * 60-bit md5 slices; the "bit array" is the distinct position set
    * of the base corpus (one small broadcastable frame), and a probe
    * is Bloom-positive iff all k of its positions join. Probes are the
    * fingerprints provably ABSENT from the base, so every positive is
    * false: fpr_ppm is a ground-truth measurement, not an estimate.
    */
  def bloomFprEval(docs: DataFrame, baseMaxId: Long = 250L,
                   m: Int = 2048, k: Int = 4): DataFrame = {
    val fp = docs.groupBy(md5(col("text")).as("f")).agg(min("doc_id").as("mn"))
    val h = fp.select(col("f"), col("mn"),
      expr(s"cast(conv(substr(f, 1, 15), 16, 10) AS bigint) % $m").as("h1"),
      expr(s"cast(conv(substr(f, 16, 15), 16, 10) AS bigint) % $m").as("h2"))
    def positions = expr(s"transform(sequence(0, ${k - 1}), j -> (h1 + j * h2) % $m)")
    val base = h.where(col("mn") <= baseMaxId)
    val baseBits = base.select(explode(positions).as("pos")).distinct()
    val probes = h.where(col("mn") > baseMaxId)
    val falsePos = probes.select(col("f"), explode(positions).as("pos"))
      .join(baseBits, "pos")
      .groupBy("f").agg(count(lit(1)).as("c"))
      .where(col("c") === k)
    baseBits.agg(count(lit(1)).as("bits_set"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("n_base"))))
      .crossJoin(broadcast(probes.agg(count(lit(1)).as("n_probes"))))
      .crossJoin(broadcast(falsePos.agg(count(lit(1)).as("n_fp"))))
      .select(col("bits_set"), col("n_base"), col("n_probes"), col("n_fp"),
        expr("n_fp * 1000000 div greatest(1L, n_probes)").as("fpr_ppm"))
  }
}
