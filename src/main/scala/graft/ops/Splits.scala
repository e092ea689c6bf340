package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic dataset splits for training pipelines.
 *
 * Random splits are unreproducible across engines and re-runs; the
 * portable answer is HASH bucketing: a document's split is a pure
 * function of its id (first 4 hex chars of md5, compared as strings
 * against cumulative-fraction thresholds). The same rule is expressible
 * in any engine with md5 — which is what makes an exact DuckDB oracle
 * possible — and at 100 TB it is a stateless map-only projection: no
 * sampling pass, no shuffle, stable under re-partitioning and re-runs.
 */
object Splits {

  /** Split-name column from cumulative md5-hex thresholds.
    * `fractions` must sum to 1 (±1e-9); order defines precedence. */
  def splitColumn(idCol: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val bucket = substring(md5(idCol.cast("string")), 1, 4)
    val thresholds = hexThresholds(fractions)
    // last split is the ELSE arm — no rounding gap can drop a row
    val whens = thresholds.init.map { case (name, hex) =>
      (name, bucket < lit(hex))
    }
    val assigned = whens.foldRight(lit(thresholds.last._1): Column) {
      case ((name, cond), rest) => when(cond, lit(name)).otherwise(rest)
    }
    // null id ⇒ null split: md5(null) is null, every `bucket < hex`
    // condition is null (not true), and the fold's ELSE arm silently
    // piled ALL malformed rows into the LAST split — deterministically
    // skewing exactly the split that is usually the eval set. A null
    // split marks the row for the caller instead (siblings like
    // downsample DROP null ids; an assignment op must not drop rows).
    when(bucket.isNull, lit(null).cast("string")).otherwise(assigned)
  }

  /** Adds a `split` column. */
  def assign(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), fractions))

  /** (name, upper-threshold-hex) per split, cumulative, 4 hex digits —
    * shared with the SQL oracle generator. */
  def hexThresholds(fractions: Seq[(String, Double)]): Seq[(String, String)] = {
    var cum = 0.0
    fractions.map { case (name, f) =>
      cum += f
      // clamp to ffff (the rateHex convention): 65536 would format as
      // 5-hex "10000", and a 4-char bucket compared lexicographically
      // against it would route ~6% of rows instead of ~100% — any
      // non-final cumulative fraction ≥ 1 − 1/131072 would silently
      // invert the split sizes
      val t = math.min(65535L, math.round(cum * 65536.0))
      (name, f"$t%04x")
    }
  }

  /**
   * Deterministic per-group downsampling — the "rebalance the corpus"
   * step (overrepresented languages/domains/sources kept at a fraction,
   * everything else untouched). A row survives iff its md5-hex bucket
   * falls under its group's keep rate, so the result is a pure function
   * of (id, group): reproducible across engines, re-runs, and
   * re-partitionings, with NO sampling pass — at 100 TB this is a
   * map-only filter fused into the scan. Groups absent from `rates` keep
   * `defaultRate` of their rows.
   */
  def downsample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0.0 && r <= 1.0),
      "keep rates must be in [0, 1]")
    val bucket = substring(md5(col(idCol).cast("string")), 1, 4)
    def keep(rate: Double): Column =
      if (rate >= 1.0) lit(true) else bucket < lit(rateHex(rate))
    // sorted fold for a deterministic CASE chain (Map order isn't stable)
    val cond = rates.toSeq.sortBy(_._1).foldLeft(keep(defaultRate)) {
      case (acc, (g, r)) => when(col(groupCol) === g, keep(r)).otherwise(acc)
    }
    df.filter(cond)
  }

  /** 4-hex upper threshold for a keep rate — shared with the SQL oracle
    * generator (rates ≥ 1 are handled as keep-all, never compared). */
  def rateHex(rate: Double): String =
    f"${math.min(65535L, math.round(rate * 65536.0))}%04x"

  /** [[rateHex]]'s integer twin: the same `min(65535, round(rate·65536))`
    * threshold as an int, for comparison against
    * [[graft.functions.KmvDistinct.md5Bucket16]]. Because both the md5
    * prefix and the threshold are exactly 4 lowercase hex chars,
    * `substring(md5(s),1,4) < rateHex(r)` ⟺ `md5_bucket16(s) <
    * rateBucket16(r)` — one rounding implementation for both forms, so
    * the hex oracle replay and the int kernel path cannot diverge. */
  def rateBucket16(rate: Double): Int =
    math.min(65535L, math.round(rate * 65536.0)).toInt

  /**
   * Fractional EPOCH expansion — the up-sampling half of a pretraining
   * mix recipe ("2.3 epochs of wikipedia, 0.8 of books"): every doc of
   * group g appears ⌊e_g⌋ times, plus one more when its md5 bucket
   * falls under the fractional remainder — the same 4-hex rule as
   * [[downsample]], so which docs get the extra epoch is a pure
   * function of (id, group) and the output composition is exactly
   * n_g·e_g ± 1 per group in expectation with deterministic membership.
   * Emits an `epoch` index (0-based) so downstream shuffling/packing
   * can keep copies apart. Groups absent from the map default to 1.0;
   * e_g = 0 drops the group.
   *
   * Scale shape: map-only — the copy count is a per-row expression and
   * the expansion is one `explode(sequence(...))`; no shuffle, no
   * join, SQL-replayable via generate_series.
   */
  def epochExpand(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      epochs: Map[String, Double],
      defaultEpochs: Double = 1.0): DataFrame = {
    require((epochs.values.toSeq :+ defaultEpochs).forall(e => e >= 0.0 && e <= 100.0),
      "epochs must be in [0, 100]")
    val bucket = substring(md5(col(idCol).cast("string")), 1, 4)
    def copies(e: Double): Column = {
      val whole = math.floor(e).toLong
      val frac = e - whole
      if (frac == 0.0) lit(whole)
      else lit(whole) + when(bucket < lit(rateHex(frac)), 1L).otherwise(0L)
    }
    val cnt = epochs.toSeq.sortBy(_._1).foldLeft(copies(defaultEpochs)) {
      case (acc, (g, e)) => when(col(groupCol) === g, copies(e)).otherwise(acc)
    }
    df.withColumn("__copies", cnt)
      .filter(col("__copies") > 0L)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")
  }

  /**
   * Temperature-based source rebalancing — the multilingual-LM sampling
   * rule (size of group g in the output ∝ n_g^alpha): alpha = 1 keeps
   * the natural distribution, alpha → 0 equalizes all groups down to the
   * smallest. Realized WITHOUT replacement as deterministic per-group
   * keep rates r_g = (n_min / n_g)^(1-alpha) (the smallest group keeps
   * everything, larger groups thin toward it), decided by the same
   * md5-bucket rule as `downsample` — so the sampled set is a pure
   * function of (id, group, corpus counts): engine-portable and stable
   * across re-runs.
   *
   * Scale shape: one tiny counts aggregate (|groups| rows) broadcasts
   * back; the filter itself is map-only against the scan. Rates are
   * computed IN the plan (no driver collect), so the op stays one job.
   */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    // null groups are excluded up front: counted, a junk null group
    // would set n_min (over-thinning every real group) and its rows
    // would then vanish anyway in the non-null-safe rates equi-join
    val src = df.filter(col(groupCol).isNotNull)
    val counts = src.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    // KNOWN float surface (documented, like the LSH oracle's double-dot
    // caveat): the keep rate (n_min/n)^(1-alpha) is a libm pow, and a
    // last-ulp difference between engines could flip round(rate·65536)
    // at an exact .5 boundary — membership is otherwise pure integer
    // md5-bucket compare. A boundary needs rate·65536 within 1 ulp of
    // .5 for some group's exact (n_min, n, alpha); the gate's seeded
    // corpus has none, and the practical blast radius is ±1 bucket in
    // 65536 for one group.
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__nmin"))))
      .select(col(groupCol),
        pow(col("__nmin").cast("double") / col("__n"), 1.0 - alpha)
          .as("__rate"))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    src.join(broadcast(rates), Seq(groupCol))
      .filter(bucket < graft.functions.ColumnMath.roundHalfUp(col("__rate") * 65536).cast("long"))
      .drop("__rate")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /**
   * Per-row weighted sampling — keep each row with probability given by
   * its own `prob` column (quality-weighted corpus thinning: keep
   * probability ∝ quality score, the soft alternative to a hard quality
   * cutoff). Decided by the md5-bucket rule, so the kept set is a pure
   * function of (id, prob): deterministic, engine-portable, map-only.
   */
  def weightedSample(df: DataFrame, idCol: String, prob: Column): DataFrame = {
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    // validate IN the filter condition (projection-folded guards get
    // column-pruned away — the scan-consistency house rule): prob > 1
    // silently kept everything and negative/NaN silently dropped —
    // caller error surfaced as a skewed sample. Null prob still means
    // "drop" (the sibling convention for null inputs).
    val p = prob.cast("double")
    val checked = when(isnan(p) || p < 0.0 || p > 1.0,
        raise_error(concat(lit("weightedSample: prob outside [0,1]: "),
          p.cast("string"))))
      .otherwise(p)
    df.filter(bucket < graft.functions.ColumnMath.roundHalfUp(checked * 65536).cast("long"))
  }

  /**
   * Exact-N deterministic global sample: the `n` rows with the smallest
   * md5(id) — a uniformly-spread subset that is a pure function of the
   * id set (engine-portable, reproducible across re-runs and
   * partitionings), for carving eval/inspection subsets out of a corpus.
   *
   * Scale shape: `orderBy(md5).limit(n)` plans as TakeOrderedAndProject
   * (pinned in PlanSpec) — every partition keeps its n smallest in a
   * bounded heap and the driver merges heads. ONE corpus pass, no
   * count job, no global sort, no Exchange; contrast `sample(fraction)`,
   * which needs a separate count to hit an exact N and still isn't
   * deterministic under repartitioning.
   */
  def deterministicTake(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be > 0")
    df.orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(n)
  }

  /**
   * Exact-size per-group cap: keep AT MOST `maxPerGroup` rows of every
   * group, chosen deterministically by md5-of-id rank (not arrival
   * order), so the kept set is a pure function of the data — stable
   * across engines, re-runs, and partitionings. The rate-based
   * `downsample` keeps a FRACTION (size varies with group size); this
   * caps an absolute budget per group — the "at most N docs per domain"
   * dedup-adjacent rebalance step.
   *
   * Scale shape: the bounded-heap `TopKRows` aggregate pre-reduces
   * map-side, so the exchange carries ≤ partitions × groups × N rows —
   * never a full window sort over the corpus (no `row_number` pass).
   */
  def capPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, "maxPerGroup must be > 0")
    // rank ascending by (md5(id), id): TopKRows keeps the k LARGEST by
    // struct order, so rank by the NEGATED comparison via a descending
    // sort key — md5 hex strings reverse-order under string DESC. The
    // aggregate orders (score DESC, id ASC) on its first field, so feed
    // it a key whose DESC order is our ASC md5 order: use the bitwise
    // complement of the first 15 md5 hex digits as a long.
    val rankKey = -conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val kept = df
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKAggregate.topk_rows(
        struct(rankKey.as("__r"), col(idCol)), maxPerGroup).as("__w"))
      .select(explode(col("__w")).as("__e"))
      .select(col("__e").getField(idCol).as(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /**
   * Leakage-safe split assignment: near-duplicate documents must never
   * straddle train/test (a test doc whose near-dup sits in train leaks
   * the answer — the standard eval-contamination failure). The split key
   * is the document's near-dup CLUSTER (connected component of `pairs`),
   * not the document itself: every member of a cluster hashes to the
   * same side, singletons fall back to their own id, and the assignment
   * stays a pure deterministic function (engine-portable md5 rule).
   *
   * Scale shape: components run on the collision-bounded pair graph
   * (edge-list-only shuffles, O(log n) rounds); the join back to the
   * corpus is one shuffle on id; the split itself is map-only.
   */
  def leakageSafeAssign(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      fractions: Seq[(String, Double)],
      idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val comp = Dedup.connectedComponents(pairs, idA, idB)
      .withColumnRenamed("id", idCol)
    df.join(comp, Seq(idCol), "left")
      .withColumn("split",
        splitColumn(coalesce(col("component"), col(idCol)), fractions))
      .drop("component")
  }

  /**
   * Token-budget corpus mix: for each group (language, source, domain),
   * keep the md5-prioritized prefix of its documents whose cumulative
   * `weightCol` stays within the group's budget — the standard
   * pretraining-mix primitive ("60 B tokens of web, 10 B of code, 3 B
   * of wiki"). The kept set is a pure function of the data: documents
   * are ordered by (md5(id), id) within their group and a document is
   * kept iff its INCLUSIVE cumulative weight ≤ budget (weights are
   * non-negative, so the cumulative sum is monotone and "first prefix
   * under budget" ≡ this filter). Groups absent from `budgets` are
   * dropped — the mix is an explicit contract, not a passthrough.
   *
   * Scale shape: the obvious formulation — a window cumsum over every
   * group — sorts each ENTIRE group on one task (partitionBy(group)
   * sends 60 TB of web docs to one reducer). This instead does two-pass
   * bucket SELECTION, the same shape as the exact-quantile profiler:
   * pass 1 aggregates weight sums per (group, first-2-hex-digits-of-md5
   * bucket) — ≤ groups×256 rows to the driver — and a driver walk of
   * each group's buckets in hex order finds the single CUTOFF bucket
   * where the cumulative crosses the budget (buckets before it are
   * kept whole, after it dropped whole). Pass 2 window-sorts ONLY the
   * cutoff buckets — ~1/256 of each group — against the budget
   * remainder. Both passes shuffle (group, bucket, id, weight) tuples,
   * never text; the window's partition carries ~group/256 rows.
   *
   * Returns (idCol, groupCol, weightCol) of the kept documents; callers
   * semi-join on idCol for full rows.
   */
  def tokenBudgetTake(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weightCol: String,
      budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "budgets must be non-empty")
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    require(df.schema(groupCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"$groupCol must be string-typed (budget keys are strings)")
    val spark = df.sparkSession
    import spark.implicits._
    val proj = df
      .filter(col(groupCol).isin(budgets.keys.toSeq.map(x => x: Any): _*))
      .select(col(groupCol).as("__g"), col(idCol),
        // the whole prefix-under-budget ≡ cumulative-filter equivalence
        // rests on non-negative weights (doc above); a negative sentinel
        // from a buggy upstream would break monotonicity SILENTLY, so
        // fail loudly in-scan instead (folded into the selected value —
        // a separate projected guard column would be pruned away)
        when(col(weightCol) < 0, raise_error(concat(
            lit(s"tokenBudgetTake: negative $weightCol for "), col(idCol))))
          .otherwise(col(weightCol)).cast("long").as("__w"),
        md5(col(idCol).cast("string")).as("__h"))
      .withColumn("__b", substring(col("__h"), 1, 2))
    // pass 1: per-(group, bucket) weight totals — bounded at groups×256
    val totals = proj.groupBy("__g", "__b").agg(sum("__w").as("__s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    // driver walk in hex-bucket order: whole-kept buckets, ONE cutoff
    // bucket per group carrying the budget remainder, rest dropped
    val keepWhole = Seq.newBuilder[(String, String)]
    // cutoff rows carry (group, bucket, remainder, pass-1 bucket total)
    // — the total feeds the pass-2 consistency guard below
    val cutoffs = Seq.newBuilder[(String, String, Long, Long)]
    totals.foreach { case (g, rows) =>
      val budget = budgets(g)
      var acc = 0L
      var cut = false
      rows.sortBy(_._2).foreach { case (_, b, s) =>
        if (!cut) {
          if (acc + s <= budget) { keepWhole += ((g, b)); acc += s }
          else { cutoffs += ((g, b, budget - acc, s)); cut = true }
        }
      }
    }
    val wholeRows = {
      val kw = keepWhole.result()
      if (kw.isEmpty) proj.limit(0).select(col("__g"), col(idCol), col("__w"))
      else proj.join(broadcast(kw.toDF("__g", "__b")), Seq("__g", "__b"))
        .select(col("__g"), col(idCol), col("__w"))
    }
    val cutoffRows = {
      val cutTotals = cutoffs.result()
      if (cutTotals.isEmpty)
        proj.limit(0).select(col("__g"), col(idCol), col("__w"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__g"), col("__b"))
          .orderBy(col("__h"), col(idCol))
        // scan-consistency guard (the interleaveBySource convention):
        // pass 2 re-scans the source after pass 1's driver walk, so a
        // non-deterministic input would silently break the budget
        // contract — compare the cutoff bucket's pass-2 total (an
        // unbounded frame over the SAME window spec: free) against its
        // pass-1 total and fail loudly instead. Folded into __w so
        // column pruning can't drop the check.
        proj.join(broadcast(cutTotals.toDF("__g", "__b", "__r", "__t")),
            Seq("__g", "__b"))
          .withColumn("__cum", sum(col("__w")).over(
            w.rowsBetween(Long.MinValue, 0)))
          // the guard total must be computed HERE, before the remainder
          // filter drops rows — same window spec as __cum, so it rides
          // the exchange + sort the selection already pays. The check
          // lives in the FILTER condition (not a projected column):
          // filters survive any downstream column pruning, so a caller
          // that keeps only idCol still gets the guard. Residual
          // assumption: whole-kept buckets are not re-validated — a
          // guard there would cost a shuffle the happy path never needs;
          // divergence large enough to matter also shifts the cutoff
          // bucket, which IS checked.
          .withColumn("__tot", sum(col("__w")).over(
            w.rowsBetween(Long.MinValue, Long.MaxValue)))
          .filter(
            when(col("__tot") =!= col("__t"),
              raise_error(concat(
                lit("tokenBudgetTake: pass-2 bucket total diverged from "),
                lit("pass-1 for (group,bucket)=("), col("__g"), lit(","),
                col("__b"), lit(") — non-deterministic input")))
              .cast("boolean"))
            .otherwise(col("__cum") <= col("__r")))
          .select(col("__g"), col(idCol), col("__w"))
      }
    }
    wholeRows.union(cutoffRows)
      .select(col(idCol), col("__g").as(groupCol), col("__w").as(weightCol))
  }

  /**
   * Importance-directed selection toward a TARGET corpus — the
   * data-selection move of DSIR (Xie et al. 2023, arXiv:2302.03169)
   * with an integer-exact score instead of a float likelihood ratio:
   * `score_e6 = ⌊10⁶ · |distinct doc n-grams ∩ target grams| /
   * |distinct doc n-grams|⌋`, top-`n` docs by (score desc, id). Every
   * quantity is an integer (the floor is integer division), so the
   * kept set is a pure function of the data and SQL-replayable — no
   * log-space doubles deciding membership near a cut line.
   *
   * Scale shape (the benchmarkLeaks asymmetry): the target/reference
   * corpus is tiny next to the 100 TB candidate pool, so its distinct
   * gram-hash set BROADCASTS and the big side probes it inside the
   * scan stage — corpus grams never shuffle (they exist only as
   * per-row `shingle_hashes` output); the one exchange carries per-doc
   * (n_grams, n_hits) count rows, and the head is a bounded
   * TakeOrderedAndProject. For budget-sized selections (n beyond
   * driver head sizes) feed the scores to [[tokenBudgetTake]]'s
   * two-pass bucket selection instead of the limit.
   */
  /**
   * Curriculum tiers by LM-typicality quantile (curriculum learning:
   * schedule typical text first, rare/hard text later). Score is the
   * integer mean milli-nats per char-trigram from
   * [[TextAnalysis.lmScoreFast]] (`sum_millinats div n_grams` —
   * integer division, order-independent); tier cutoffs are EXACT order
   * statistics at ranks ⌊b·(n−1)/tiers⌋ ([[Profile.orderStatistics]] —
   * no interpolation, no doubles), and `tier = #{cutoffs strictly
   * below score}` with cutoff ties going to the LOWER tier — the
   * assignment is a pure function of the corpus.
   *
   * Scale shape: the LM score is the existing one-aggregate + one
   * kernel-scan pipeline; the score frame materializes once
   * (localCheckpoint) and feeds the two bucket-selection scans plus
   * the map-only tier projection. No per-group windows anywhere.
   *
   * NOTE: documents shorter than 3 characters have no char-trigrams,
   * so [[TextAnalysis.lmScoreFast]] emits no score row for them and
   * they get NO tier row here — callers joining tiers back onto the
   * corpus should left-join and default unscorable docs explicitly
   * (tier 0 to schedule them first, or drop them as noise).
   */
  /**
   * Deterministic source-interleaved TRAINING ORDER: each document gets
   * a global position `train_pos = rank_within_source · S + source_idx`
   * where sources index alphabetically and the within-source order is
   * the md5-of-id shuffle (ties by id) — strict round-robin across
   * corpora ("web, code, books, web, code, books, …"), the
   * order-materialization step after mixing decides WHAT to train on.
   * Positions are unique; when sources exhaust at different times their
   * slots go unused (gaps are harmless — consumers sort by position).
   * Pure function of the data: reruns, partitionings, and the SQL
   * oracle agree bit-for-bit. The source column is cast to string for
   * the round-robin key (and returned as string); null sources are
   * rejected — a null has no slot in the rotation.
   *
   * Scale shape: NOT a per-source global window (partitionBy(source)
   * would sort 60 TB of web on one reducer). Same two-pass bucket
   * selection as [[tokenBudgetTake]]: pass 1 counts per (source,
   * first-`bucketHex`-hex md5 bucket) — ≤ sources × 16^bucketHex
   * driver rows — and a driver walk turns counts into per-bucket rank
   * OFFSETS; pass 2 windows only within (source, bucket) (~1/256 of a
   * source at the default), adds the offset, and maps to the global
   * position. Shuffled tuples are (source, bucket, id, hash) — never
   * text. Raise `bucketHex` to 3–4 at cluster scale for more window
   * parallelism (driver table stays ≤ sources × 65536).
   */
  /**
   * Time-based holdout — "train on the past, test on the future", the
   * leakage-safe split for anything with temporal drift (events,
   * logs, crawls): the cutoff timestamp is the EXACT order statistic
   * of the time column at rank ⌊(n−1)·(den−num)/den⌋ (test fraction
   * num/den as a RATIONAL — a float fraction could round the rank
   * differently across engines), rows at or before the cutoff are
   * `train`, strictly after are `test`; timestamp ties all land on
   * the train side, so the assignment is a pure function of the data.
   *
   * Rows whose timestamp is null (or casts to null) are excluded from
   * the cutoff computation AND get a null `split` — an undated row has
   * no position on the timeline, so silently calling it "future" would
   * contaminate the test side (callers that want them trained on can
   * `coalesce(split, 'train')`). A corpus with NO datable row at all is
   * rejected (there is no timeline to place the cutoff on).
   *
   * Scale shape: the cutoff comes from [[Profile.orderStatistics]]'s
   * two bucket-count scans (zero shuffles, driver gets 1024-bucket
   * histograms), and the assignment itself is a map-only projection
   * against the broadcast cutoff literal.
   */
  def timeHoldout(
      df: DataFrame,
      tsCol: String,
      testNum: Long,
      testDen: Long): DataFrame = {
    require(testNum > 0 && testNum < testDen, "need 0 < testNum/testDen < 1")
    val micros = df
      .select(unix_micros(col(tsCol).cast("timestamp")).as("__us"))
      .filter(col("__us").isNotNull)
    // rank derives from the count the first bucket pass establishes —
    // no separate count() scan
    val cut = Profile.orderStatisticsByN(micros, "__us",
      n => {
        require(n > 0, "timeHoldout needs at least one non-null, " +
          "timestamp-castable row to place the cutoff — an entirely " +
          "undated corpus has no timeline to split on")
        // BigInt: (n−1)·(den−num) overflows Long for a billion-row
        // corpus with a high-precision rational (den ~1e10), wrapping
        // to a garbage negative rank
        Seq((BigInt(n - 1) * BigInt(testDen - testNum) / BigInt(testDen)).toLong)
      }, scale = 1L).values.head
    val us = unix_micros(col(tsCol).cast("timestamp"))
    df.withColumn("split",
      when(us.isNull, lit(null).cast("string"))
        .when(us <= lit(cut), "train")
        .otherwise("test"))
  }

  def interleaveBySource(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      bucketHex: Int = 2): DataFrame = {
    require(bucketHex >= 1 && bucketHex <= 8, "bucketHex in [1,8]")
    val spark = df.sparkSession
    import spark.implicits._
    // group key is cast to string (any atomic group type works); null
    // groups are rejected up front — a null source has no round-robin
    // slot and would silently collapse into one bucket otherwise
    val proj = df.select(col(groupCol).cast("string").as("__g"), col(idCol),
        md5(col(idCol).cast("string")).as("__h"))
      .withColumn("__b", substring(col("__h"), 1, bucketHex))
    val counts = proj.groupBy("__g", "__b").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(!counts.exists(_._1 == null),
      s"interleaveBySource: null $groupCol values — every row needs a source")
    val sources = counts.map(_._1).distinct.sorted.toSeq
    val nS = sources.length.toLong
    val offsets = counts.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (g, b, n) =>
        val o = (g, b, acc, n); acc += n; o
      }
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g"), col("__b"))
      .orderBy(col("__h"), col(idCol))
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g"), col("__b"))
    // scan-consistency guard (the orderStatisticsCore convention): the
    // pass-2 window re-scans the source after pass-1's driver-collected
    // counts, so a non-deterministic input would yield overlapping or
    // duplicate train_pos — compare each bucket's pass-2 row count
    // against its pass-1 count and fail loudly instead. The offsets
    // join is LEFT (not inner): a pass-2 row whose bucket pass 1 never
    // saw would be silently dropped by an inner join, which is exactly
    // the corruption being guarded — a null offset raises too. __chk is
    // 0L on the happy path and folds into train_pos so pruning can't
    // drop it.
    val chk = when(
      col("__o").isNull ||
        max(col("__rn")).over(wBucket) =!= col("__n"),
      raise_error(concat(
        lit("interleaveBySource: pass-2 bucket diverged from pass-1 "),
        lit("for (source,bucket)=("), col("__g"), lit(","),
        col("__b"), lit(") — non-deterministic input")))
      .cast("long")).otherwise(lit(0L))
    proj
      .join(broadcast(offsets.toDF("__g", "__b", "__o", "__n")),
        Seq("__g", "__b"), "left")
      .join(broadcast(sources.zipWithIndex
        .map { case (g, i) => (g, i.toLong) }.toDF("__g", "__sidx")),
        Seq("__g"), "left")
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__rk", col("__o") + col("__rn") - 1L)
      // chk is the FIRST operand: Add short-circuits on a null left
      // child, so `rk*nS + ... + chk` with a null __o would return null
      // WITHOUT ever evaluating chk's raise_error — the exact silent
      // corruption the guard exists to catch
      .select(col(idCol), col("__g").as(groupCol),
        (chk + col("__rk") * nS + coalesce(col("__sidx"), lit(0L)))
          .cast("long").as("train_pos"))
  }

  def curriculumAssign(
      df: DataFrame,
      textCol: String,
      idCol: String,
      tiers: Int = 4): DataFrame = {
    require(tiers >= 2, "tiers must be >= 2")
    val s = TextAnalysis.lmScoreFast(df, textCol, idCol)
      .select(col(idCol),
        expr("sum_millinats div n_grams").as("score_e3"))
      .localCheckpoint(true) // feeds 3 passes; the LM pipeline runs once
    val n = s.count()
    require(n > 0, "curriculumAssign needs at least one scored row")
    val ranks = (1 until tiers).map(b => b.toLong * (n - 1) / tiers)
    val cuts = Profile.orderStatistics(s, "score_e3", ranks.distinct, scale = 1L)
    val tier = ranks.map(cuts).foldLeft(lit(0L)) { (acc, c) =>
      acc + when(col("score_e3") > lit(c), 1L).otherwise(0L)
    }
    s.select(col(idCol), col("score_e3"), tier.cast("long").as("tier"))
  }

  def importanceTake(
      corpus: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      gramN: Int = 2): DataFrame = {
    require(n > 0 && gramN >= 1, "need n > 0 and gramN >= 1")
    import graft.functions.HashFunctions.shingle_hashes
    val targetGrams = target
      .select(explode(shingle_hashes(Dedup.tokens(col(textCol)), gramN)).as("g"))
      .distinct()
      .withColumn("__hit", lit(1))
    val corpusGrams = corpus.select(col(idCol),
      explode(shingle_hashes(Dedup.tokens(col(textCol)), gramN)).as("g"))
    corpusGrams
      .join(broadcast(targetGrams), Seq("g"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hits"))
      .select(col(idCol),
        expr("(n_hits * 1000000) div n_grams").as("score_e6"))
      .orderBy(col("score_e6").desc, col(idCol))
      .limit(n)
  }
}
