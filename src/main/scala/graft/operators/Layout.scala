package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (z-order) interleaving, the
  * standard technique for making ONE sorted file order serve range
  * filters on TWO columns. At 100 TB this is what turns "scan
  * everything" into "skip most row groups": parquet min/max stats on a
  * z-sorted layout prune files for predicates on either interleaved
  * dimension, where a plain sort only prunes on its leading column.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of two non-negative
    * integer columns (`x` takes the odd bit positions, `y` the even).
    * The bit loop is unrolled at plan-build time into plain shift/and/or
    * arithmetic — whole-stage codegen, no UDF, and the very same math
    * runs in the DuckDB oracle.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Inverse of [[zValue]] for one dimension: gather every second bit
    * starting at `offset` (1 = the x dimension, 0 = y). Used by the
    * round-trip spec; handy for debugging a layout.
    */
  def zExtract(z: Column, offset: Int, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(z, 2 * i + offset).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)

  /** Z-bucket summary of (user, day) events: per aligned z-range
    * bucket, the row count and the bounding rectangle of the two
    * dimensions. This IS the file-skipping story made visible: each
    * bucket (≈ one file / row group after [[zorderWrite]]) covers a
    * tight (user, day) rectangle, so a predicate on either dimension
    * eliminates most buckets by min/max alone. Single shuffle on the
    * bucket key; per-row math is codegen'd integer ops.
    */
  def zorderStats(events: DataFrame, bits: Int, bucketShift: Int): DataFrame =
    events
      .select(col("user_id").cast("long").as("user_id"),
        expr("ts_ms div 86400000").as("epoch_day"))
      .select(col("user_id"), col("epoch_day"),
        zValue(col("user_id"), col("epoch_day"), bits).as("zval"))
      .groupBy(shiftright(col("zval"), bucketShift).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min("user_id").as("min_user"), max("user_id").as("max_user"),
        min("epoch_day").as("min_day"), max("epoch_day").as("max_day"))
      .orderBy("zbucket")

  /** Compaction planning: pack key-ordered "files" (any (key, size)
    * frame — per-partition row counts, file bytes) into sequential
    * bins of ≈ `target` size: bin = (running size BEFORE this file)
    * div target. A file that crosses a boundary stays with its
    * predecessors (bins can overflow by < one file — the classic
    * streaming bin rule), order is preserved so each compacted output
    * stays range-contiguous on the key (min/max pruning survives the
    * rewrite). Input is a per-partition ROLLUP (days, files — bounded
    * rows), so the single global cumulative window is over file
    * metadata, never data rows — same bounded-window contract as the
    * daily momentum rollup.
    */
  def compactionBins(files: DataFrame, keyCol: String, sizeCol: String,
                     target: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(keyCol))
      .rowsBetween(Long.MinValue, -1)
    files
      .withColumn("cum_before",
        coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .select(col(keyCol), col(sizeCol),
        expr(s"cum_before div $target").as("bin"))
      .orderBy(keyCol)
  }

  /** Zone-map (per-file min/max) skipping effectiveness A/B: the same
    * 30-day ship-date range predicate evaluated against two simulated
    * file layouts of lineitem — `natural` (files = arrival order,
    * binned by orderkey) and `date_sorted` (files = clustered by ship
    * day). Per layout: file count, files whose [min,max] day range
    * intersects the predicate (those must be scanned), total rows, and
    * rows inside scanned files — the measured "why you cluster your
    * lake" number that parquet min/max pruning realizes at scale. Two
    * bin rollups plus a 2-row union; no other shuffle.
    */
  def zoneMapSkipping(lineitem: DataFrame, loDay: Long = 9500L,
                      hiDay: Long = 9529L, keyBin: Long = 512L,
                      daysPerFile: Long = 7L): DataFrame = {
    val base = lineitem.select(
      expr("l_orderkey div " + keyBin).as("nat_file"),
      expr("unix_millis(cast(l_shipdate as timestamp)) div 86400000").as("d"))
      .withColumn("srt_file", expr(s"d div $daysPerFile"))
    def layout(name: String, fileCol: String): DataFrame =
      base.groupBy(col(fileCol).as("file"))
        .agg(min("d").as("mn"), max("d").as("mx"), count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("mx") >= loDay && col("mn") <= hiDay, 1L).otherwise(0L))
            .as("n_scanned"),
          sum("n").as("rows_total"),
          sum(when(col("mx") >= loDay && col("mn") <= hiDay, col("n"))
            .otherwise(0L)).as("rows_scanned"))
        .select(lit(name).as("layout"), col("n_files"), col("n_scanned"),
          col("rows_total"), col("rows_scanned"),
          expr("rows_scanned * 1000000 div rows_total").as("scan_ppm"))
    layout("date_sorted", "srt_file")
      .unionByName(layout("natural", "nat_file"))
      .orderBy("layout")
  }

  /** Deletion-vector lifecycle accounting — the merge-on-read
    * bookkeeping a lakehouse delete (GDPR purge, retention window)
    * produces when row-level deletes land as per-file position vectors
    * instead of eager rewrites. Files are modeled as `l_orderkey div
    * keyBin` bins (the arrival-order layout, so a date-range delete
    * scatters across every file — the worst case zone maps can't
    * help); the delete predicate is a `[loDay, hiDay]` ship-date
    * window. Emits ONE summary row: file/row totals, DV totals, live
    * rows (what every merge-on-read scan must anti-join), plus the
    * compaction policy outcome at `rewritePpm` — files whose deleted
    * fraction crosses the threshold are rewritten (their live rows =
    * the write amplification paid), the rest keep their DVs (the scan
    * tax that remains). One keyed agg + one global agg — the planner
    * for "when do deletes justify rewriting" priced from data, not
    * guessed.
    */
  def deleteVectorStats(lineitem: DataFrame, keyBin: Long = 128L,
                        loDay: Long = 9500L, hiDay: Long = 9529L,
                        rewritePpm: Long = 12000L): DataFrame = {
    val rows = lineitem.select(
      expr(s"l_orderkey div $keyBin").as("file"),
      when(expr("unix_millis(cast(l_shipdate as timestamp)) div 86400000")
        .between(loDay, hiDay), 1L).otherwise(0L).as("del"))
    rows.groupBy("file")
      .agg(count(lit(1)).as("n_rows"), sum("del").as("dv"))
      .withColumn("del_ppm", expr("dv * 1000000 div n_rows"))
      .withColumn("rw", col("del_ppm") >= rewritePpm)
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("dv") > 0, 1L).otherwise(0L)).as("files_with_dv"),
        sum("n_rows").as("rows_total"),
        sum("dv").as("dv_total"),
        (sum("n_rows") - sum("dv")).as("rows_live"),
        sum(when(col("rw"), 1L).otherwise(0L)).as("files_rewritten"),
        sum(when(col("rw"), col("n_rows") - col("dv")).otherwise(0L))
          .as("rows_rewritten"),
        sum(when(!col("rw"), col("dv")).otherwise(0L)).as("dv_after"))
  }

  /** Bitmap secondary-index utility report for a low-cardinality
    * column — the classic OLAP question "would a bitmap index on
    * l_returnflag let scans skip row groups?", answered from data in
    * both the CURRENT layout and the best-case one. Rows land in
    * 32-row groups (`l_orderkey div 32`; slot = key mod 32 — 31 is
    * the max shift DuckDB's checked `<<` allows on BIGINT) and each
    * (value, group) bitmap is a single bigint built by a
    * map-side-combinable `bit_or(1 << slot)` — the real encoding
    * trick of roaring-style indexes, state = one word per group per
    * value. `n_groups_roworder` (groups a flag-filtered scan must
    * touch today) comes from that bitmap; `n_groups_sorted` (groups
    * it would touch if the table were CLUSTERED by the flag) needs no
    * rewrite at all — it falls out of the cumulative row counts:
    * value spanning rows [s, e) occupies groups s div 32 … (e−1)
    * div 32. The verdict this emits — selectivity ≈ 10⁶ ppm unsorted
    * vs ≈ ⅓ sorted — is the measured form of the rule that index
    * utility is a property of LAYOUT, not of the index (same lesson
    * as `lake_zone_map_skipping`, one level below zone maps).
    */
  def bitmapIndexStats(lineitem: DataFrame): DataFrame = {
    val rows = lineitem.select(col("l_returnflag"),
      expr("l_orderkey div 32").as("grp"),
      expr("cast(l_orderkey % 32 AS int)").as("slot"))
    val bitmaps = rows.groupBy("l_returnflag", "grp")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), slot))").as("mask"))
    val roworder = bitmaps.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_groups_roworder"),
        sum(expr("bit_count(mask)")).cast("long").as("n_slots_set"))
    val totals = rows.agg(
      count_distinct(col("grp")).as("n_total_groups"),
      count(lit(1)).as("n_total_rows"))
    // flag-sorted layout: contiguous row ranges from cumulative counts
    val byFlag = lineitem.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"))
    val cumW = org.apache.spark.sql.expressions.Window
      .orderBy("l_returnflag")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val sorted = byFlag // 3-row frame; the window is value-domain-sized
      .withColumn("row_start", coalesce(sum("n_rows").over(cumW), lit(0L)))
      .select(col("l_returnflag"), col("n_rows"),
        expr("(row_start + n_rows - 1) div 32 - row_start div 32 + 1")
          .as("n_groups_sorted"))
    roworder.join(sorted, Seq("l_returnflag"))
      .crossJoin(broadcast(totals))
      .select(col("l_returnflag"), col("n_rows"), col("n_slots_set"),
        col("n_groups_roworder"),
        expr("n_groups_roworder * 1000000 div n_total_groups")
          .as("sel_roworder_ppm"),
        col("n_groups_sorted"),
        expr("n_groups_sorted * 1000000 div ((n_total_rows - 1) div 32 + 1)")
          .as("sel_sorted_ppm"))
      .orderBy("l_returnflag")
  }

  /** Per-file NDV (number-of-distinct-values) statistics for a join
    * key — the column-level metadata an optimizer's manifest stores
    * beside min/max zone maps: files modeled as `l_orderkey div 512`
    * bins, and for each file BOTH the exact NDV and the HLL m=64
    * register estimate (`TextAnalysis.hllRegisters` math inlined
    * per-file: dual-engine md5 hash, bit-length rho, integer harmonic
    * sum, one shared double constant). At 100 TB the exact side is
    * exactly what a writer cannot afford per file — the register
    * sketch is 64 longs per (file, column), mergeable upward into
    * partition- and table-level NDV without rescanning, which is why
    * manifests store sketches and not counts. err_ppm per file is the
    * measured contract.
    */
  def fileNdvStats(lineitem: DataFrame, keyBin: Long = 512L,
                   m: Int = 64): DataFrame = {
    // same domain contract as hllRegisters: a non-power-of-two m would
    // silently overlap the bucket/rest bit fields — fail loudly instead
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 4096,
      s"m must be a power of two in [2, 4096], got $m")
    val w = 60 - java.lang.Integer.numberOfTrailingZeros(m)
    val rows = lineitem.select(
      expr(s"l_orderkey div $keyBin").as("file"),
      expr("cast(conv(substr(md5(cast(l_partkey AS string)), 1, 15), 16, 10) AS bigint)")
        .as("h"),
      col("l_partkey"))
    val regs = rows
      .select(col("file"), (col("h") % m).as("bucket"),
        expr(s"h div $m").as("rest"))
      .select(col("file"), col("bucket"),
        when(col("rest") === 0, lit(w + 1))
          .otherwise(lit(w + 1) - length(expr("bin(rest)")))
          .cast("long").as("rho"))
      .groupBy("file", "bucket").agg(max("rho").as("max_rho"))
    val est = regs.groupBy("file")
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${w + 1} - max_rho AS INT))"))
          .as("s_present"))
      .select(col("file"),
        (col("s_present") +
          (lit(m.toLong) - col("n_buckets")) * lit(1L << (w + 1)))
          .as("s_scaled"))
      .select(col("file"),
        floor(lit(graft.operators.TextAnalysis.hllAlphaNum(m))
          / col("s_scaled").cast("double")).cast("long").as("ndv_est"))
    val exact = rows.groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("l_partkey")).as("ndv_exact"))
    exact.join(est, Seq("file"))
      .select(col("file"), col("n_rows"), col("ndv_exact"), col("ndv_est"),
        expr("(abs(ndv_est - ndv_exact) * 1000000) div ndv_exact")
          .as("err_ppm"))
      .orderBy("file")
  }

  /** Write `df` z-ordered on (xCol, yCol): range-partition by z-value
    * (balanced output files via range exchange, not hash), sort rows
    * within each partition, drop the helper column. The result is a
    * parquet layout whose per-file min/max on BOTH columns is tight —
    * the scale path for multi-dimension point/range lookups.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  partitions: Int, path: String): Unit =
    df.withColumn("zval",
        zValue(col(xCol).cast("long"), col(yCol).cast("long"), bits))
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path)
}
