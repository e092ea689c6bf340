package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dataset profiling — per-column summary statistics in ONE scan, the
 * "know your corpus before you train on it" primitive (null rates,
 * cardinalities, ranges drive schema checks and drift alerts between
 * pipeline runs).
 *
 * Scale shape, exact tier (r16): one compound
 * [[graft.functions.ColumnStats]] aggregate per column — n / nulls /
 * distinct-set / min / max in ONE buffer, updated once per (row,
 * column) straight off the scan. No EXPAND (the multi-distinct plan
 * Catalyst would otherwise emit), no stack Generate, no
 * (column, value) → count table, no mid-plan exchange: the single
 * exchange carries one serialized buffer per (partition, column),
 * each bounded by the column's value CARDINALITY — the same bound the
 * r13–r15 counts table had, in set form. For unbounded
 * high-cardinality domains at 100 TB that cardinality is the bound —
 * pass `exact = false` for the KMV bottom-k distinct sketch (one
 * pass, no distinct set, state ≤ `sketchK` longs per column,
 * ~1/√sketchK error).
 */
object Profile {

  /** One output row per profiled numeric column:
    * (column, n, n_null, n_distinct, mn, mx).
    *
    * Sketch tier (`exact = false`, `sketch = "kmv"` default):
    * n_distinct is a KMV bottom-k estimate over the 60-bit md5 hash of
    * each value's long rendering. **Quantization contract**: FRACTIONAL
    * columns (double/float/decimal) are keyed as `round(v·hashScale)` —
    * the quantileProfile `scale` convention — so values closer than
    * half a 1/hashScale unit COLLAPSE to one distinct key; pick a
    * hashScale that resolves the column (default 100 resolves cents),
    * and note |v|·hashScale beyond ±2⁶³ would overflow the long key.
    * INTEGRAL columns (tinyint/smallint/int/bigint) are keyed as their
    * RAW value — no multiply, so id-like columns count true distinct
    * values at any magnitude with no overflow and hashScale is ignored
    * (r15; previously round(v·100) collapsed sub-unit info never present
    * and overflowed for |v| ≳ 9.2e16). Unlike HLL++, the k smallest md5
    * values are a pure function of the value SET and reproducible by
    * any engine with md5, so the tier is bit-deterministic at every
    * layout AND strict-oracle (DuckDB replays the hash, the bottom-k,
    * and the exact-integer estimate — see the profile_stats_approx /
    * profile_stats_approx_int gate oracles). Default k=1024 ⇒ σ ≈ 3.1%,
    * 8 KiB/column state; error ∝ 1/√k. n / nulls / min / max stay exact
    * in the same single pass.
    *
    * `sketch = "hll"` swaps the distinct estimator for Spark's native
    * HyperLogLog++ (`approx_count_distinct`, ~2.3% error at 2 KiB of
    * register state, no hash projection) over the SAME quantized key —
    * cheaper state and wall for production profiling of wide frames,
    * but NOT cross-engine replayable and not bit-stable across engines,
    * so the oracle gate stays on kmv. */

  // stack()/percentile_approx expressions interpolate column names into
  // SQL text; a quote or backtick in a name would mis-parse the
  // expression (or escape its quoting), so such names are rejected
  // loudly up front instead of failing with an opaque AnalysisException.
  // `__kmvh__` is the sketch tier's reserved internal-hash-column prefix:
  // a user column named `__kmvh__x` profiled alongside `x` would collide
  // in the projection, so it is rejected here too.
  private def requireSqlSafeNames(cols: Seq[String]): Unit =
    cols.foreach { c =>
      require(!c.contains("'") && !c.contains("`"),
        s"column name <$c> contains a quote or backtick - unsupported in profiling ops")
      require(!c.startsWith("__kmvh__"),
        s"column name <$c> uses the reserved __kmvh__ prefix - rename to profile it")
    }

  def numericProfile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true,
      hashScale: Long = 100L,
      sketchK: Int = 1024,
      sketch: String = "kmv"): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(hashScale > 0, "hashScale must be > 0")
    require(sketch == "kmv" || sketch == "hll",
      s"sketch must be kmv or hll, got <$sketch>")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    requireSqlSafeNames(cols)

    if (exact) {
      // ONE compound aggregate per column (r16): each input row costs
      // |cols| buffer updates (null-count / distinct-set insert /
      // min-max compare in one dispatch) — no stack Generate, no
      // (column, value) → count table, no mid-plan exchange; the only
      // exchange carries one serialized buffer per (partition, column).
      // The r15 shape paid rows×|cols| hash-aggregate probes against a
      // cardinality-sized table, exchanged that table, re-aggregated
      // it, and restored names through a broadcast join — measured 2.4M
      // stacked rows for the 4-column lineitem profile. State bound is
      // UNCHANGED: the distinct set is the same value-cardinality bound
      // the counts table had (sketch tier for unbounded domains).
      // Values unify as double; integral values beyond 2^53 would alias
      // under the cast — profile such ids as strings or sketch them.
      // The cast runs in a codegen projection: TypedImperativeAggregate
      // evaluates children interpreted per row, so children stay bare
      // column refs (the corrExact/KMV discipline).
      val proj = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      val aggs = cols.map(c =>
        graft.functions.ColumnStatsAgg.column_stats(col(c)).as(s"st__$c"))
      val one = proj.agg(aggs.head, aggs.tail: _*)
      // unpivot the single row; an EMPTY input frame still yields one
      // row per column with n=0 and null min/max (each buffer evals to
      // (0,0,0,null,null)) — the contract the old |cols|-row left join
      // existed to keep, now a construction property
      val stacked = cols.map { c =>
        s"'$c', `st__$c`.n, `st__$c`.n_null, `st__$c`.n_distinct, " +
          s"`st__$c`.mn, `st__$c`.mx"
      }.mkString(", ")
      one.select(expr(
        s"stack(${cols.size}, $stacked) AS (column, n, n_null, n_distinct, mn, mx)"))
    } else {
      // integral columns hash their RAW value (exact, no overflow);
      // fractional columns quantize per the scaladoc contract
      import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
      def sketchKey(c: String): Column = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
        case _ => graft.functions.ColumnMath.roundHalfUp(col(c) * hashScale).cast("long")
      }
      // the KMV child must be a bare column ref (TypedImperativeAggregate
      // evaluates children interpreted per row) — the round + md5-kernel hash
      // chain runs in this codegen projection, fused into the scan. The
      // hll tier needs no hash projection (HLL++ hashes internally).
      val hashed = if (sketch == "hll") df.select(cols.map(c => col(c)): _*)
        else df.select(
          cols.map(c => col(c)) ++ cols.map(c =>
            graft.functions.KmvDistinct.kmvHash60(
              sketchKey(c)).as(s"__kmvh__$c")): _*)
      val aggs: Seq[Column] = cols.flatMap { c =>
        val v = col(c)
        val dist =
          if (sketch == "hll") approx_count_distinct(sketchKey(c))
          else graft.functions.KmvDistinct.kmv_distinct(col(s"__kmvh__$c"), sketchK)
        Seq(
          count(lit(1)).as(s"n__$c"),
          (count(lit(1)) - count(v)).as(s"null__$c"),
          dist.as(s"dist__$c"),
          min(v).cast("double").as(s"mn__$c"),
          max(v).cast("double").as(s"mx__$c"))
      }
      val one = hashed.agg(aggs.head, aggs.tail: _*)
      // unpivot the single row: stack(n, 'col1', n__col1, ..., 'colk', ...)
      val stacked = cols.map { c =>
        s"'$c', `n__$c`, `null__$c`, `dist__$c`, `mn__$c`, `mx__$c`"
      }.mkString(", ")
      one.select(expr(
        s"stack(${cols.size}, $stacked) AS (column, n, n_null, n_distinct, mn, mx)"))
    }
  }

  /**
   * Exact interpolated quantiles for every column in ONE aggregation pass
   * (linear interpolation at rank q·(n−1), the quantile_cont convention).
   *
   * Values are scaled to integers (`round(col·scale)`) before ranking, so
   * the interpolation arithmetic is exact in double (integer endpoints ×
   * exactly-representable quartile fractions) — bit-reproducible and
   * SQL-replayable.
   *
   * Exact tier shape: NOT the builtin `percentile` aggregate (per-row
   * boxed OpenHashMap state, whole maps merged between partials) — the
   * input collapses to a (column, value, count) table in a codegen hash
   * aggregate (shuffle ∝ value cardinality, not rows), a window cumsum
   * assigns each value its global rank range, and the q·(n−1)
   * interpolation (the `quantile_cont` convention, Spark's own
   * `(hi−pos)·lower + (pos−lo)·higher` form) reads its two endpoints
   * straight off that table. Bounded-domain columns (money cents,
   * counts, enum codes) keep the table small at any corpus size; for
   * unbounded high-cardinality doubles at 100 TB use `exact = false` —
   * a DETERMINISTIC-HASH row sample (md5-bucket threshold, the
   * Splits.downsample convention) feeding this same exact machinery,
   * whose state is then bounded by the sample, not the domain.
   *
   * Sketch tier (r14 — replaced the seeded `df.sample` + GK
   * `percentile_approx` pair): a row survives iff the first 4 hex chars
   * of md5 over its `sampleKeyCols` rendering fall under
   * `sampleRows/n`, so the sampled SET is a pure function of the data
   * multiset — layout-invariant at every partition count/thread count
   * (the old tier's per-partition RNG and order-dependent GK merges
   * both varied with layout; CPUS=1 at sf0.1 diverged from CPUS=8),
   * and SQL-replayable (any engine with md5 reproduces the membership,
   * so a DuckDB oracle can gate the tier STRICTLY). The quantiles over
   * the sample run through the exact two-pass selection above —
   * integer-exact, no sketch summary at all.
   *
   * Sketch-tier error: pure sampling term — a uniform sample of m rows
   * puts a sample quantile within ±z·√(q(1−q)/m) of the true RANK
   * (m = 65536 ⇒ ±0.5% at the median at 99% confidence); the old GK
   * term (≤ 1/accuracy on top) is gone. Per-row cost one md5 of the key
   * rendering, map-only, fused into the scan.
   *
   * `sampleKeyCols` is the row identity hashed for membership (default:
   * every column of `df`). Rows IDENTICAL in the key tuple move in and
   * out of the sample together — pass a unique key (or leave the
   * all-columns default on de-duplicated tables) so the sample is a
   * row-sample, not a value-class sample; a LOW-cardinality key (e.g.
   * the profiled column itself) would keep or drop whole value classes
   * and skew the estimate.
   */
  def quantileProfile(
      df: DataFrame,
      cols: Seq[String],
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75),
      scale: Long = 1L,
      exact: Boolean = true,
      sampleRows: Long = 65536L,
      sampleKeyCols: Seq[String] = Seq.empty): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    require(scale > 0, "scale must be > 0")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    requireSqlSafeNames(cols)

    if (exact) {
      // Two-pass histogram SELECTION (the distributed exact-quantile
      // classic; same driver-bounded shape as Spark's own approxQuantile):
      //   pass 1: ONE scan, one LongBucketCounts aggregate per column —
      //           a (v div 1024 → count) map whose size is OCCUPIED
      //           buckets, not rows (hard-guarded against pathological
      //           sparse domains). Prefix-summing the ≤3 target ranks
      //           q·(n−1) through the sorted buckets on the driver
      //           locates each rank's bucket.
      //   pass 2: ONE more scan, per-value count maps restricted to the
      //           ≤ 2·|qs| candidate buckets per column (≤1024 distinct
      //           values each), from which the driver reads the two
      //           interpolation endpoints exactly.
      // The corpus is scanned twice and SHUFFLED never; driver state is
      // bucket-bounded. Interpolation is Spark/DuckDB's quantile_cont
      // form (hi−pos)·lower + (pos−lo)·higher on exact integers.
      val W = 1024L
      val spark = df.sparkSession
      def scaled(c: String) = graft.functions.ColumnMath.roundHalfUp(col(c) * scale).cast("long")

      // pre-project the scaled values in a codegen'd select: the
      // TypedImperativeAggregate evaluates its child INTERPRETED per
      // row, so the child must be a bare column reference
      val scaledDF = df.select(cols.map(c => scaled(c).as(c)): _*)
      val hist1 = scaledDF.agg(
        graft.functions.HistAgg.bucket_counts(col(cols.head), W)
          .as(cols.head),
        cols.tail.map(c =>
          graft.functions.HistAgg.bucket_counts(col(c), W).as(c)): _*)
        .head()
      // driver: locate, per (column, q), the bucket(s) holding the two
      // endpoint ranks; remember each bucket's starting global rank
      case class Target(column: String, q: Double, pos: Double,
          loI: Long, hiI: Long)
      val perCol = cols.zipWithIndex.map { case (c, i) =>
        val m = hist1.getMap[Long, Long](i)
        val buckets = m.toSeq.sortBy(_._1) // (bucket, count) ascending
        val n = buckets.iterator.map(_._2).sum
        (c, buckets, n)
      }
      val targets = perCol.flatMap { case (c, _, n) =>
        qs.map { q =>
          val pos = q * (n - 1).toDouble
          Target(c, q, pos, math.floor(pos).toLong, math.ceil(pos).toLong)
        }
      }
      // candidate buckets + their rank offsets, per column
      val candOf: Map[String, Map[Long, Long]] = perCol.map {
        case (c, buckets, n) =>
          val wanted = targets.filter(_.column == c)
            .flatMap(t => Seq(t.loI, t.hiI)).toSet
          var off = 0L
          val cand = Map.newBuilder[Long, Long]
          buckets.foreach { case (b, cnt) =>
            if (wanted.exists(r => r >= off && r < off + cnt)) cand += b -> off
            off += cnt
          }
          c -> cand.result()
      }.toMap

      val nonEmpty = perCol.filter(_._3 > 0).map(_._1)
      val out: Seq[(String, Double, Option[Double])] = if (nonEmpty.isEmpty) Seq.empty
      else {
        // pass 2: per-value counts inside candidate buckets only (the
        // bucket membership filter rides the codegen'd projection too)
        val candDF = df.select(nonEmpty.map { c =>
          when(floorDiv(scaled(c), W).isin(candOf(c).keys.toSeq: _*),
            scaled(c)).as(c)
        }: _*)
        val hist2 = candDF.agg(
          graft.functions.HistAgg.bucket_counts(col(nonEmpty.head), 1L)
            .as(nonEmpty.head),
          nonEmpty.tail.map(c =>
            graft.functions.HistAgg.bucket_counts(col(c), 1L).as(c)): _*)
          .head()
        val valueCounts: Map[String, Seq[(Long, Long)]] =
          nonEmpty.zipWithIndex.map { case (c, i) =>
            c -> hist2.getMap[Long, Long](i).toSeq.sortBy(_._1)
          }.toMap
        targets.filter(t => valueCounts.contains(t.column)).map { t =>
          val offByBucket = candOf(t.column)
          // walk the candidate values in order, tracking each value's
          // global rank range [cum − cnt, cum − 1] from its bucket's off
          var lo = Long.MinValue; var hi = Long.MinValue
          var curBucket = Long.MinValue; var cum = 0L
          valueCounts(t.column).foreach { case (v, cnt) =>
            val b = Math.floorDiv(v, W)
            if (b != curBucket) { curBucket = b; cum = offByBucket(b) }
            cum += cnt
            if (t.loI >= cum - cnt && t.loI < cum) lo = v
            if (t.hiI >= cum - cnt && t.hiI < cum) hi = v
          }
          // pass 2 re-scans the source: a non-deterministic df (rand(),
          // files changed between the two actions) can disagree with
          // pass 1's ranks — surface that as an error, not a garbage
          // interpolation from the Long.MinValue sentinels
          require(lo != Long.MinValue && hi != Long.MinValue,
            s"quantile scan inconsistency for ${t.column} q=${t.q}: " +
              "pass 2 did not reproduce pass 1's ranks (non-deterministic input?)")
          val raw = if (t.hiI == t.loI) lo.toDouble
            else (t.hiI - t.pos) * lo.toDouble + (t.pos - t.loI) * hi.toDouble
          (t.column, t.q, Some(raw / scale.toDouble))
        }
      }
      // all-null / empty columns still yield one row per requested
      // quantile, with a null value — matching the builtin-percentile
      // semantics, so downstream (column, q)-keyed joins (drift checks)
      // see nulls, not missing keys
      val empty = perCol.filter(_._3 == 0).map(_._1)
      val stubs = empty.flatMap(c => qs.map(q => (c, q, None: Option[Double])))
      import spark.implicits._
      (out ++ stubs).toDF("column", "q", "v")
    } else {
      // Deterministic-hash sample, then the exact machinery on the
      // survivors. The row count that sizes the fraction is a
      // columnless scan — parquet answers it from row-group metadata,
      // and at 100 TB a profiler caller has it anyway (numericProfile's
      // n, or the catalog). The md5-bucket membership rule is shared
      // with Splits.downsample (rateHex), so the threshold a DuckDB
      // oracle recomputes from ITS count(*) is char-identical: both
      // sides evaluate round(65536·sampleRows/n) in double (same IEEE
      // ops; Scala's floor(x+0.5) == DuckDB's half-away-from-zero for
      // positive x) and render %04x.
      val keys = if (sampleKeyCols.nonEmpty) sampleKeyCols
        else df.columns.toSeq
      val missingKeys = keys.filterNot(df.columns.contains)
      require(missingKeys.isEmpty, s"sample key columns not in frame: $missingKeys")
      requireSqlSafeNames(keys)
      val n = df.count()
      if (n <= sampleRows) quantileProfile(df, cols, qs, scale, exact = true)
      else {
        // persist the ~sampleRows survivors so the exact tier's two
        // passes read the cached sample, not the corpus twice — at
        // 100 TB this tier costs ONE full scan (plus the metadata-only
        // count), and the cache is bounded by the sample size. The
        // exact tier is eager (both passes complete inside the call),
        // so the unpersist is safe immediately after.
        val sampled = quantileSampleFrame(df, cols, keys,
            sampleRows.toDouble / n)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try quantileProfile(sampled, cols, qs, scale, exact = true)
        finally sampled.unpersist(blocking = false)
      }
    }
  }

  /** The sketch tier's sample pass, as a frame: rows whose 16-bit md5
    * bucket over the key rendering falls under `round(rate·65536)`,
    * projected to the profiled columns. One shared constructor so the
    * ExplainDump pseudo-entry dumps exactly the plan [[quantileProfile]]
    * caches. Membership is bit-identical to the r14–r15
    * `substring(md5(concat_ws('|', keys…)), 1, 4) < rateHex(rate)`
    * string chain the DuckDB oracle still replays — the key rendering
    * and concat stay in Catalyst (cross-engine semantics visible in the
    * plan); [[graft.functions.KmvDistinct.md5Bucket16]] replaces only
    * the hex-string materialization + substring + string compare with
    * an int compare (r16; see the Md5Bucket16 scaladoc for the
    * lexicographic ⟺ numeric equivalence, KernelPropertySpec for the
    * pin). The projection to `cols` prunes the scan AND the cache: the
    * exact tier reads only the profiled columns, so caching the full
    * row width paid decode + cache bytes for nothing. */
  private[graft] def quantileSampleFrame(
      df: DataFrame,
      cols: Seq[String],
      keys: Seq[String],
      rate: Double): DataFrame =
    df.filter(graft.functions.KmvDistinct.md5Bucket16(
        concat_ws("|", keys.map(k => col(k).cast("string")): _*))
        < lit(Splits.rateBucket16(rate)))
      .select(cols.map(col): _*)

  /**
   * Fixed-width histogram — (bin, lo, n) where bin = value DIV width in
   * scaled-integer space (exact binning, no float-edge ambiguity about
   * which side of a boundary a value lands on). One groupBy whose key
   * count is the number of OCCUPIED bins — bounded by the value range,
   * not the corpus — so the exchange stays tiny at any scale.
   */
  def histogram(
      df: DataFrame,
      c: String,
      binWidth: Double,
      scale: Long = 100L): DataFrame = {
    require(binWidth > 0, "binWidth must be > 0")
    require(scale > 0, "scale must be > 0")
    val widthScaled = math.round(binWidth * scale)
    require(widthScaled > 0, "binWidth must not round to zero at this scale")
    val v = graft.functions.ColumnMath.roundHalfUp(col(c).cast("double") * scale).cast("long")
    df.filter(col(c).isNotNull)
      .groupBy(floorDiv(v, widthScaled).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (col("bin") * widthScaled / lit(scale.toDouble)).as("lo"), col("n"))
  }

  // floor division for possibly-negative longs (Spark's `div` truncates
  // toward zero; histogram bins must floor so -1 cents lands in bin -1).
  // (a - pmod(a,b)) is exactly divisible by b and pmod is non-negative,
  // so the double division is an exact integer.
  private def floorDiv(a: Column, b: Long): Column =
    // the shared EXACT form: the previous double-division here
    // ((a - pmod)/b cast long) was only exact while the numerator fit
    // in 2^53 — above that the integer-valued quotient arrives as
    // q·(1±2^-52) and cast("long") TRUNCATES it to q-1
    graft.functions.ColumnMath.floorDiv(a, b)

  /**
   * Top-k most frequent values per (categorical) column — the value-
   * distribution half of profiling (enum drift, junk-value detection).
   *
   * Scale shape: one unpivoted pass (`stack`) feeds a partial+final
   * count aggregate, so the corpus collapses to (column, value) counts
   * before anything ranks; ranking is the bounded-heap TopKAggregate
   * over that counts table — NOT a `row_number` window, which would
   * sort a high-cardinality column's whole value domain in one task.
   * The rank exchange carries ≤ partitions × |cols| × k rows. Ties
   * break (count DESC, value ASC), so the result is deterministic.
   */
  def topValues(
      df: DataFrame,
      cols: Seq[String],
      k: Int): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    require(k > 0, "k must be > 0")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    requireSqlSafeNames(cols)
    val stacked = cols.map(c => s"'$c', cast(`$c` AS string)").mkString(", ")
    df.select(expr(s"stack(${cols.size}, $stacked) AS (column, value)"))
      .filter(col("value").isNotNull)
      .groupBy(col("column"), col("value")).agg(count(lit(1)).as("n"))
      .groupBy(col("column"))
      .agg(graft.functions.TopKAggregate.topk_rows(
        struct(col("n"), col("value")), k).as("__top"))
      .select(col("column"), posexplode(col("__top")).as(Seq("__r", "__e")))
      .select(col("column"),
        col("__e").getField("value").as("value"),
        col("__e").getField("n").as("n"),
        (col("__r") + 1).cast("long").as("rank"))
  }

  /**
   * Heavy hitters by Misra–Gries sketch — the FIXED-MEMORY tier of
   * [[topValues]] for unbounded-cardinality columns (user ids, URLs,
   * session keys at 100 TB), in the same sketch-tier mold as
   * `statsApprox`/`quantilesApprox`: the exact tier's group-by state
   * grows with the domain; this tier's state is `capacity` counters per
   * map task, period.
   *
   * Determinism/gate contract (see [[graft.functions.MisraGriesAgg]]):
   * with distinct ≤ capacity every counter is exact and the output
   * equals `topValues` — the oracle-gated regime. Above capacity every
   * true heavy hitter with freq > n/(capacity+1) survives with its
   * estimate within n/(capacity+1) of truth (spec-pinned).
   *
   * Output: (rank, value, est_count), rank by (count DESC, value ASC),
   * topN rows.
   */
  def heavyHitters(
      df: DataFrame,
      valueCol: String,
      capacity: Int,
      topN: Int): DataFrame = {
    require(topN >= 1 && topN <= capacity, "need 1 <= topN <= capacity")
    df.agg(graft.functions.MisraGries.mg_sketch(
        col(valueCol).cast("string"), capacity).as("__hh"))
      .select(posexplode(col("__hh")).as(Seq("__r", "__e")))
      .filter(col("__r") < topN)
      .select((col("__r") + 1).cast("long").as("rank"),
        col("__e").getField("value").as("value"),
        col("__e").getField("count").as("est_count"))
  }

  /**
   * Per-group z-scores with EXACT moments — the anomaly-flagging staple
   * ("this event's value is 4σ off this user's norm"). Mean/variance come
   * from exact decimal sums of scaled integers, algebraically rearranged
   * so the whole score is one integer numerator over one integer-rooted
   * denominator: z = (n·v − Σv) / √(n·Σv² − (Σv)²) — bit-reproducible
   * and SQL-replayable; groups with zero variance (or one row) yield
   * null rather than ±∞.
   *
   * Scale shape: one stats aggregate (one row per group) plus one
   * equi-join of the input against it — a single data-sized shuffle,
   * keyed the way anomaly consumers group anyway.
   */
  def zscores(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      idCol: String,
      scale: Long = 100L): DataFrame = {
    require(scale > 0, "scale must be > 0")
    val dec = "decimal(38,0)"
    val v = graft.functions.ColumnMath.roundHalfUp(col(valueCol).cast("double") * scale).cast("long").cast(dec)
    val stats = df.groupBy(col(groupCol)).agg(
      // count the non-null MEASURES: the sums skip nulls, so count(1)
      // would mix moments over different row subsets and silently skew
      // every z in a group containing a null value
      count(v).cast(dec).as("__n"),
      sum(v).as("__s"), sum(v * v).as("__ss"))
    val num = (col("__n") * v - col("__s")).cast("double")
    val den = (col("__n") * col("__ss") - col("__s") * col("__s"))
      .cast("double")
    df.join(stats, groupCol)
      .select(col(idCol), col(groupCol),
        when(den > 0, num / sqrt(den)).as("z"))
  }

  /**
   * Exact-moment Pearson correlation for column pairs in one pass.
   *
   * A naive float `corr` is partition-order dependent (float sums do not
   * commute); here every moment (Σx, Σy, Σxy, Σx², Σy²) is an EXACT
   * decimal sum of scaled-integer values, so the moments are
   * bit-reproducible and SQL-replayable, and only the final closed-form
   * combination runs in floating point. Scale bounds: |x·scale| up to
   * ~1e16 squares into ~1e32 per row — decimal(38) holds corpus sums to
   * ~1e38, i.e. trillions of rows at money-cents magnitudes.
   */
  /**
   * Exact order statistics: the value (in `round(x·scale)` long units)
   * at each 0-based rank of the sorted column — [[quantileProfile]]'s
   * two-pass bucket selection WITHOUT interpolation, so every result
   * is an actual data value and bit-exact across engines. Pass 1: one
   * LongBucketCounts aggregate (driver state bounded by OCCUPIED
   * buckets); a driver prefix-walk locates each rank's bucket. Pass 2:
   * per-value counts restricted to the candidate buckets. Two scans,
   * zero shuffles beyond the count-class aggregate merges.
   */
  def orderStatistics(
      df: DataFrame,
      valueCol: String,
      ranks: Seq[Long],
      scale: Long = 100L): Map[Long, Long] =
    orderStatisticsCore(df, valueCol, _ => ranks, scale)

  /** [[orderStatistics]] with ranks derived from the row count the
    * FIRST bucket pass already establishes — callers that would
    * otherwise pay a separate `count()` scan just to compute a
    * fraction-of-n rank (e.g. [[graft.ops.Splits.timeHoldout]]) save
    * that whole pass. `ranksOfN` receives the exact non-null count. */
  def orderStatisticsByN(
      df: DataFrame,
      valueCol: String,
      ranksOfN: Long => Seq[Long],
      scale: Long = 100L): Map[Long, Long] =
    orderStatisticsCore(df, valueCol, ranksOfN, scale)

  private def orderStatisticsCore(
      df: DataFrame,
      valueCol: String,
      ranksOfN: Long => Seq[Long],
      scale: Long): Map[Long, Long] = {
    val W = 1024L
    val scaled = df
      .select(graft.functions.ColumnMath.roundHalfUp(col(valueCol) * scale).cast("long").as("v"))
      .filter(col("v").isNotNull)
    val hist1 = scaled
      .agg(graft.functions.HistAgg.bucket_counts(col("v"), W).as("h"))
      .head().getMap[Long, Long](0)
    val buckets = hist1.toSeq.sortBy(_._1)
    val n = buckets.iterator.map(_._2).sum
    val ranks = ranksOfN(n)
    require(ranks.nonEmpty && ranks.forall(_ >= 0), "ranks must be >= 0")
    require(ranks.forall(_ < n), s"rank beyond row count $n")
    var off = 0L
    val candB = Map.newBuilder[Long, Long]
    buckets.foreach { case (b, cnt) =>
      if (ranks.exists(r => r >= off && r < off + cnt)) candB += b -> off
      off += cnt
    }
    val cand = candB.result()
    val hist2 = scaled
      .select(when(floorDiv(col("v"), W).isin(cand.keys.toSeq: _*), col("v"))
        .as("v"))
      .agg(graft.functions.HistAgg.bucket_counts(col("v"), 1L).as("h"))
      .head().getMap[Long, Long](0)
    val values = hist2.toSeq.sortBy(_._1)
    val out = Map.newBuilder[Long, Long]
    var curBucket = Long.MinValue
    var cum = 0L
    values.foreach { case (v, cnt) =>
      val b = Math.floorDiv(v, W)
      if (b != curBucket) { curBucket = b; cum = cand(b) }
      ranks.foreach { r => if (r >= cum && r < cum + cnt) out += r -> v }
      cum += cnt
    }
    val result = out.result()
    require(ranks.forall(result.contains),
      "order-statistic scan inconsistency (non-deterministic input?)")
    result
  }

  /**
   * Equi-depth (equi-height) histogram: `buckets` bins whose edges are
   * EXACT order statistics `c_b = value at rank ⌊b·(n−1)/buckets⌋` —
   * the skew-honest profiler (a fixed-width [[histogram]] puts 99% of
   * a heavy-tailed column in one bin; equal-count bins expose the
   * distribution). Bucket 0 spans [c_0, c_1], bucket b>0 spans
   * (c_b, c_{b+1}] — every row lands in exactly one bucket, including
   * through duplicated edges on skewed data (empty bins come out as
   * n = 0 rather than vanishing). All edges and counts are exact
   * integers in scaled units. Three scans total (the two
   * [[orderStatisticsByN]] passes + one counting pass; r15 folded the
   * former separate `count()` scan into pass 1, whose bucket-count
   * aggregate already establishes the exact non-null row count), zero
   * shuffles.
   */
  def equiDepthHistogram(
      df: DataFrame,
      valueCol: String,
      buckets: Int = 10,
      scale: Long = 100L): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val spark = df.sparkSession
    val scaled = graft.functions.ColumnMath.roundHalfUp(col(valueCol) * scale).cast("long")
    val base = df.filter(col(valueCol).isNotNull)
    // rank set derived from pass 1's own exact count — same n the old
    // count() scan produced (both count non-null valueCol rows), so
    // edges and counts are unchanged; one full scan cheaper
    var n = 0L
    val stats = orderStatisticsByN(df, valueCol, { nn =>
      require(nn > 0, "equiDepthHistogram needs at least one row")
      n = nn
      (0 to buckets).map(b => b.toLong * (nn - 1) / buckets).distinct
    }, scale)
    val rankOf = (0 to buckets).map(b => b.toLong * (n - 1) / buckets)
    val edges = rankOf.map(stats)
    val conds = (0 until buckets).map { b =>
      val lo = if (b == 0) scaled >= lit(edges(b)) else scaled > lit(edges(b))
      sum(when(lo && scaled <= lit(edges(b + 1)), 1L).otherwise(0L)).as(s"b$b")
    }
    val row = base.agg(conds.head, conds.tail: _*).head()
    import spark.implicits._
    (0 until buckets).map { b =>
      (b.toLong, edges(b), edges(b + 1), row.getLong(b))
    }.toDF("bucket", "lo", "hi", "n")
  }

  /**
   * Robust per-row outlier flags: `|x − median| > k·MAD` (median
   * absolute deviation), with every membership decision made on exact
   * integers. Doubled-unit trick: the interpolated median of n scaled
   * longs is half-integral, so `med2 = 2·median` and `m2 = 2·MAD` are
   * exact integers and the flag is the integer comparison
   * `2·|2s − med2| > k·(2·m2)`… reduced: `d = |2s − med2|` (units
   * 1/(2·scale)), flag `2d > k·m2`. The only doubles are the
   * `quantile_cont` interpolations, whose true values are integers ÷ 2
   * — the round-back is exact because the double error (~4e-16
   * relative) is orders of magnitude under the 0.5 rounding margin.
   *
   * Scale shape: two [[quantileProfile]] exact selections (each two
   * scans, zero shuffles, driver bucket-bounded) + one map-only flag
   * projection — 5 scans total, no exchange anywhere. The classic
   * robust alternative to [[zscores]] when heavy tails poison the
   * mean/stddev.
   */
  def madOutliers(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      k: Long = 3L,
      scale: Long = 100L): DataFrame = {
    require(k > 0 && scale > 0, "k and scale must be > 0")
    val medRow = quantileProfile(df, Seq(valueCol), Seq(0.5), scale)
      .select(col("v")).head()
    require(!medRow.isNullAt(0),
      s"madOutliers needs at least one non-null $valueCol row " +
        "(the median of an empty/all-null column is undefined)")
    val medV = medRow.getDouble(0)
    val med2 = math.round(medV * 2 * scale) // = lo + hi, exactly
    val dev = df.select(col(idCol),
        graft.functions.ColumnMath.roundHalfUp(col(valueCol) * scale).cast("long").as("__s"))
      .withColumn("__d", abs(col("__s") * lit(2L) - lit(med2)))
    val madV = quantileProfile(dev, Seq("__d"), Seq(0.5), 1L)
      .select(col("v")).head().getDouble(0)
    val m2 = math.round(madV * 2) // = d_lo + d_hi, exactly
    dev.select(col(idCol), col("__s").as(s"${valueCol}_scaled"),
      (col("__d") * lit(2L) > lit(k * m2)).as("is_outlier"))
  }

  def corrExact(
      df: DataFrame,
      pairs: Seq[(String, String)],
      scale: Long = 100L): DataFrame = {
    require(pairs.nonEmpty, "pairs must be non-empty")
    requireSqlSafeNames(pairs.flatMap(p => Seq(p._1, p._2)))
    require(scale > 0, "scale must be > 0")
    val missing = pairs.flatMap(p => Seq(p._1, p._2))
      .filterNot(df.columns.contains).distinct
    require(missing.isEmpty, s"columns not in frame: $missing")

    // One scaled long per distinct column, computed in a CODEGEN
    // projection; the 128-bit aggregates then see bare column refs
    // (TypedImperativeAggregate evaluates children interpreted).
    // Int128Sum/Int128SumProduct keep the entire sum in two primitive
    // longs — no per-row Decimal boxing, and no BigDecimal degradation
    // once partial sums leave the compact-long range (which they DO at
    // billions of rows per partition over ~1e32-magnitude squares; the
    // product itself is exact via 128-bit multiply).
    val usedCols = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val proj = df.select(usedCols.map(c =>
      graft.functions.ColumnMath.roundHalfUp(col(c).cast("double") * scale).cast("long").as(s"s__$c")): _*)
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      // pairwise-complete moments: every one of the six sums (and n)
      // must cover exactly the rows where BOTH columns are non-null —
      // per-column null-skipping would mix subsets and can return
      // |corr| > 1 on a column with missing values
      val both = col(s"s__$x").isNotNull && col(s"s__$y").isNotNull
      val xs = when(both, col(s"s__$x"))
      val ys = when(both, col(s"s__$y"))
      Seq(
        count(when(both, lit(1))).as(s"n__$i"),
        graft.functions.Int128Sum.sum128(xs).as(s"sx__$i"),
        graft.functions.Int128Sum.sum128(ys).as(s"sy__$i"),
        graft.functions.Int128Sum.sumProduct128(xs, ys).as(s"sxy__$i"),
        graft.functions.Int128Sum.sumProduct128(xs, xs).as(s"sxx__$i"),
        graft.functions.Int128Sum.sumProduct128(ys, ys).as(s"syy__$i"))
    }
    val one = proj.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.zipWithIndex.map { case ((x, y), i) =>
      s"'$x', '$y', `n__$i`, `sx__$i`, `sy__$i`, `sxy__$i`, `sxx__$i`, `syy__$i`"
    }.mkString(", ")
    one.select(expr(
        s"stack(${pairs.size}, $stacked) AS (x_col, y_col, n, sx, sy, sxy, sxx, syy)"))
      .withColumn("corr",
        (col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double")) /
        sqrt((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")) *
          (col("n").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double"))))
      // `corr` is a convenience double for callers. It is NOT a
      // cross-engine-stable handle: the decimal(38)→double casts feeding
      // the closed form round differently between engines (n·sxy can
      // exceed 2^53), so any exact comparison must use the six integer
      // moments — they fully determine the correlation.
  }
}
