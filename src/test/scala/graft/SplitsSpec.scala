package graft

import org.apache.spark.sql.functions._

import graft.ops.Splits

class SplitsSpec extends SparkSuite {
  import spark.implicits._

  test("split assignment is deterministic, complete, and ~proportional") {
    val df = withLogLevel(spark.range(0, 10000).toDF("id"))
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Splits.assign(df, "id", fr)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 10000L, "every row lands in exactly one split")
    assert(math.abs(counts("train") - 8000L) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 150, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 150, counts.toString)
    // re-running (and re-partitioning) yields the identical assignment
    val b = Splits.assign(df.repartition(7), "id", fr)
    assert(a.join(b.withColumnRenamed("split", "s2"), Seq("id"))
      .filter($"split" =!= $"s2").count() === 0L)
  }

  test("downsample keeps per-group rates deterministically, default untouched") {
    val df = withLogLevel(spark.range(0, 9000)
      .select($"id", (when($"id" % 3 === 0, "en")
        .when($"id" % 3 === 1, "de").otherwise("fr")).as("lang")))
    val kept = Splits.downsample(df, "id", "lang", Map("en" -> 0.5, "de" -> 0.0))
    val counts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("en") - 1500L) < 150, counts.toString) // 50% of 3000
    assert(!counts.contains("de"), "rate 0 drops the whole group")
    assert(counts("fr") === 3000L, "default rate 1.0 keeps every row")
    // pure function of (id, group): identical under re-partitioning
    val again = Splits.downsample(df.repartition(11), "id", "lang",
      Map("en" -> 0.5, "de" -> 0.0))
    assert(again.select("id").except(kept.select("id")).count() === 0L)
    assert(kept.count() === again.count())
    intercept[IllegalArgumentException](
      Splits.downsample(df, "id", "lang", Map("en" -> 1.5)))
  }

  test("fractions must be sane") {
    val df = spark.range(2).toDF("id")
    intercept[IllegalArgumentException](
      Splits.assign(df, "id", Seq("a" -> 0.5, "b" -> 0.2)))
    intercept[IllegalArgumentException](
      Splits.assign(df, "id", Seq.empty))
  }

  test("capPerGroup keeps exactly min(n, cap) rows per group, deterministically") {
    import spark.implicits._
    val df = (0L until 300L)
      .map(i => (i, if (i % 3 == 0) "big" else if (i % 3 == 1) "mid" else "tiny"))
      .toDF("id", "grp")
      .filter(col("grp") =!= "mid" || col("id") < 30)   // mid: 10 rows
      .filter(col("grp") =!= "tiny" || col("id") < 150) // tiny: 50 rows
    val kept = Splits.capPerGroup(df, "id", "grp", 40)
    val counts = kept.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("big") === 40L)  // 100 rows capped to 40
    assert(counts("mid") === 10L)  // under the cap: untouched
    assert(counts("tiny") === 40L) // 50 capped to 40
    // deterministic and partition-independent: same ids on a reshuffle
    val again = Splits.capPerGroup(df.repartition(13), "id", "grp", 40)
    assert(again.select("id").except(kept.select("id")).count() === 0L)
    assert(kept.count() === again.count())
    // the kept set matches an explicit md5-rank selection
    val expected = df
      .withColumn("__rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(substring(md5(col("id").cast("string")), 1, 15), col("id"))))
      .filter(col("__rk") <= 40).select("id")
    assert(kept.select("id").except(expected).count() === 0L)
    intercept[IllegalArgumentException](Splits.capPerGroup(df, "id", "grp", 0))
  }

  test("capPerGroup plans a bounded-heap aggregate, not a window sort") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, (i % 5).toString)).toDF("id", "grp")
    val p = Splits.capPerGroup(df, "id", "grp", 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"no window sort over the corpus:\n$p")
    assert(p.contains("topk_rows") || p.contains("ObjectHashAggregate"),
      s"expected the bounded-heap aggregate:\n$p")
  }

  test("deterministicTake returns exactly n rows, nested under larger takes") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"doc $i")).toDF("id", "text")
    val t10 = Splits.deterministicTake(df, "id", 10).select("id")
      .as[Long].collect().toSet
    val t50 = Splits.deterministicTake(df, "id", 50).select("id")
      .as[Long].collect().toSet
    assert(t10.size === 10 && t50.size === 50)
    // smaller takes are prefixes of larger ones (same md5 order)
    assert(t10.subsetOf(t50))
    // deterministic across re-runs and re-partitionings
    val again = Splits.deterministicTake(df.repartition(7), "id", 10)
      .select("id").as[Long].collect().toSet
    assert(again === t10)
  }

  test("deterministicTake plans a bounded top-k, not a global sort") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"d$i")).toDF("id", "text")
    val p = withLogLevel(Splits.deterministicTake(df, "id", 5)
      .queryExecution.executedPlan.toString)
    assert(p.contains("TakeOrderedAndProject"), s"must be bounded top-k:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"no global sort:\n$p")
  }

  test("temperatureSample sizes groups ~ n^alpha, anchored at the smallest") {
    val df = withLogLevel(spark.range(0, 10000)
      .select($"id", (when($"id" < 8000, "big")
        .when($"id" < 9600, "mid").otherwise("small")).as("g")))
    // alpha=1: natural distribution untouched
    assert(Splits.temperatureSample(df, "id", "g", 1.0).count() === 10000L)
    // alpha=0.5: n_g -> n_g^0.5 * nmin^0.5; big 8000 -> ~1789, mid 1600
    // -> ~800, small 400 kept whole
    val counts = Splits.temperatureSample(df, "id", "g", 0.5)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("small") === 400L, "smallest group keeps everything")
    assert(math.abs(counts("big") - 1789L) < 180, counts.toString)
    assert(math.abs(counts("mid") - 800L) < 120, counts.toString)
    // deterministic under re-partitioning
    val again = Splits.temperatureSample(df.repartition(7), "id", "g", 0.5)
    assert(again.count() === counts.values.sum)
    assert(again.select("id")
      .except(Splits.temperatureSample(df, "id", "g", 0.5).select("id"))
      .count() === 0L)
    // original column order survives the internal join
    assert(Splits.temperatureSample(df, "id", "g", 0.5).columns.toSeq
      === Seq("id", "g"))
    intercept[IllegalArgumentException](
      Splits.temperatureSample(df, "id", "g", 0.0))
    intercept[IllegalArgumentException](
      Splits.temperatureSample(df, "id", "g", 1.5))
  }

  test("weightedSample keeps rows with per-row probability, deterministically") {
    val df = withLogLevel(spark.range(0, 9000)
      .select($"id", (when($"id" % 3 === 0, 0.0)
        .when($"id" % 3 === 1, 0.5).otherwise(1.0)).as("p")))
    val kept = Splits.weightedSample(df, "id", col("p"))
    val counts = kept.groupBy("p").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(!counts.contains(0.0), "probability 0 drops every row")
    assert(counts(1.0) === 3000L, "probability 1 keeps every row")
    assert(math.abs(counts(0.5) - 1500L) < 150, counts.toString)
    val again = Splits.weightedSample(df.repartition(11), "id", col("p"))
    assert(again.select("id").except(kept.select("id")).count() === 0L)
    assert(kept.count() === again.count())
  }

  test("null ids get a NULL split, not a silent seat in the last one (r12)") {
    val df = withLogLevel(Seq(Some("a"), Some("b"), None).toDF("id"))
    val r = Splits.assign(df, "id", Seq("train" -> 0.9, "test" -> 0.1))
      .collect().map(x => Option(x.getString(0)) -> Option(x.getString(1))).toMap
    assert(r(None) === None, "null id must not land in 'test'")
    assert(r(Some("a")).isDefined && r(Some("b")).isDefined)
  }

  test("weightedSample raises on prob outside [0,1] instead of a silently skewed sample (r12)") {
    val bad = withLogLevel(spark.range(0, 10)
      .select($"id", lit(1.2).as("p")))
    val e = intercept[Exception] {
      Splits.weightedSample(bad, "id", col("p")).count()
    }
    def msgs(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("outside [0,1]")), msgs(e).toString)
    // null prob still means drop (the sibling null convention)
    val withNull = withLogLevel(spark.range(0, 4).select($"id",
      when($"id" === 0, lit(null).cast("double")).otherwise(lit(1.0)).as("p")))
    assert(Splits.weightedSample(withNull, "id", col("p")).count() === 3)
  }

  test("temperatureSample broadcasts the rates — no data-sized shuffle") {
    val df = (0L until 100L).map(i => (i, (i % 3).toString)).toDF("id", "g")
    val p = Splits.temperatureSample(df, "id", "g", 0.5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"rates must broadcast back, not shuffle the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("leakageSafeAssign puts whole near-dup clusters on one side") {
    val docs = withLogLevel(Seq(
      (1L, "aa bb cc dd"), (2L, "aa bb cc dd"), (3L, "aa bb cc dd"),
      (10L, "zz yy xx ww"), (20L, "qq rr ss tt")).toDF("doc_id", "text"))
    val pairs = graft.ops.Dedup.wordJaccardPairs(docs, "text", "doc_id", 0.7)
    val assigned = Splits.leakageSafeAssign(docs, "doc_id", pairs,
      Seq("train" -> 0.5, "test" -> 0.5))
    val r = assigned.select("doc_id", "split")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    // cluster {1,2,3} must agree (keyed by component min = 1)
    assert(r(1L) === r(2L) && r(2L) === r(3L))
    // and the cluster's side equals the plain assignment of its min id
    val solo = Splits.assign(docs.filter($"doc_id" === 1L), "doc_id",
        Seq("train" -> 0.5, "test" -> 0.5))
      .select("split").head().getString(0)
    assert(r(1L) === solo)
    // all five rows assigned, no rows lost or duplicated
    assert(assigned.count() === 5L)
  }

  test("tokenBudgetTake ≡ brute-force md5-ordered take-while, per group") {
    val rnd = new scala.util.Random(11)
    val groups = Vector("en", "de", "zh", "fr")
    val rows = (1L to 400L).map(i =>
      (i, groups(rnd.nextInt(groups.size)), 1L + rnd.nextInt(50)))
    val df = withLogLevel(rows.toDF("id", "g", "w"))
    val budgets = Map("en" -> 900L, "de" -> 300L, "zh" -> 0L)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val expected = rows.filter(r => budgets.contains(r._2))
      .groupBy(_._2).flatMap { case (g, rs) =>
        var acc = 0L
        rs.sortBy(r => (md5hex(r._1.toString), r._1)).takeWhile { r =>
          acc += r._3; acc <= budgets(g)
        }
      }.map(r => (r._1, r._2, r._3)).toSet
    val got = Splits.tokenBudgetTake(df, "id", "g", "w", budgets).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    // fr absent from the budget map ⇒ dropped entirely
    assert(!got.exists(_._2 == "fr"))
    // zh budget 0 ⇒ nothing kept
    assert(!got.exists(_._2 == "zh"))
    // a budget covering the whole group keeps every row
    val all = Splits.tokenBudgetTake(df, "id", "g", "w",
        Map("en" -> Long.MaxValue)).collect()
    assert(all.length === rows.count(_._2 == "en"))
    // determinism under repartitioning
    val re = Splits.tokenBudgetTake(df.repartition(7), "id", "g", "w", budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(re === got)
  }

  test("tokenBudgetTake shuffles id/weight tuples, never text; window only on cutoff buckets") {
    val rows = (1L to 300L).map(i => (i, "en", 3L, s"body of document $i"))
    val df = withLogLevel(rows.toDF("id", "g", "w", "text"))
    val taken = Splits.tokenBudgetTake(
      df.select($"id", $"g", $"w"), "id", "g", "w", Map("en" -> 100L))
    val p = taken.queryExecution.executedPlan.toString
    // both passes broadcast the driver's bucket verdicts back — the
    // corpus side never sort-merge-joins, and the one window runs over
    // the cutoff-bucket slice, partitioned by (group, bucket)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val wins = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(wins.nonEmpty && wins.forall(_.contains("__b")),
      s"window must partition by (group, bucket):\n$p")
  }

  test("curriculumAssign: quartile tiers, ties share a tier, repartition-invariant") {
    val rnd = new scala.util.Random(71)
    val words = (0 until 40).map(i => s"w$i")
    val docs = (0 until 120).map { i =>
      val n = 6 + rnd.nextInt(10)
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.ops.Splits.curriculumAssign(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size === 120)
    val byTier = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byTier.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    assert(byTier.values.sum === 120)
    // monotonic: every tier-0 score <= every tier-3 score
    val t0max = got.values.filter(_._2 == 0L).map(_._1).max
    val t3min = got.values.filter(_._2 == 3L).map(_._1).min
    assert(t0max <= t3min)
    // equal scores always land in the same tier
    got.values.groupBy(_._1).foreach { case (_, vs) =>
      assert(vs.map(_._2).toSet.size === 1, "ties must share a tier")
    }
    val again = graft.ops.Splits.curriculumAssign(
        docs.repartition(13), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again === got)
  }

  test("importanceTake ≡ brute-force distinct-2-gram coverage top-n") {
    val target = Seq(
      (100L, "the quick brown fox"),
      (101L, "lazy dog sleeps here")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox again"),   // 4 of 5 grams hit
      (2L, "lazy dog sleeps"),             // 2 of 2 hit => 100%
      (3L, "completely unrelated words"),  // 0
      (4L, "the quick dog"),               // "the quick" hits only
      (5L, "x")).toDF("doc_id", "text")    // short-doc fallback, 0
    val got = graft.ops.Splits.importanceTake(corpus, target,
        "text", "doc_id", n = 3, gramN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def gramsOf(s: String): Set[String] = {
      val t = s.toLowerCase.split(" ").toSeq
      if (t.length < 2) Set(t.mkString(" "))
      else t.sliding(2).map(_.mkString(" ")).toSet
    }
    val tgt = Set(100L -> "the quick brown fox", 101L -> "lazy dog sleeps here")
      .flatMap(p => gramsOf(p._2))
    val want = Seq(1L, 2L, 3L, 4L, 5L).map { id =>
      val txt = Map(1L -> "the quick brown fox again", 2L -> "lazy dog sleeps",
        3L -> "completely unrelated words", 4L -> "the quick dog", 5L -> "x")(id)
      val g = gramsOf(txt)
      id -> (g.count(tgt.contains).toLong * 1000000L / g.size)
    }.sortBy { case (id, s) => (-s, id) }.take(3)
    assert(got === want)
    assert(got.head._1 === 2L && got.head._2 === 1000000L)
  }

  test("importanceTake is repartition-invariant") {
    val docs = (0 until 200).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 11} tok${i % 5} tok${(i * 3) % 13}"))
      .toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val target = docs.filter($"doc_id" % 10 === 0)
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Splits.importanceTake(df, target, "text", "doc_id", n = 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(corpus.repartition(17)) === run(corpus.repartition(2)))
  }

  test("importanceTake broadcasts the target grams; corpus text never shuffles") {
    val docs = (0 until 50).map(i => (i.toLong, s"a b c tok$i")).toDF("doc_id", "text")
    val p = withLogLevel {
      graft.ops.Splits.importanceTake(
        docs.filter($"doc_id" % 10 =!= 0), docs.filter($"doc_id" % 10 === 0),
        "text", "doc_id", n = 10)
        .queryExecution.executedPlan.toString
    }
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("epochExpand: whole copies exact, fractional copies by md5 rule, drops at 0") {
    val df = (0 until 400).map(i =>
      (i.toLong, Seq("a", "b", "c", "d")(i % 4))).toDF("doc_id", "source")
    val got = graft.ops.Splits.epochExpand(df, "doc_id", "source",
      Map("a" -> 3.0, "b" -> 0.0, "c" -> 1.5))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") === 300L, "3 epochs = exactly 3 copies each")
    assert(!got.contains("b"), "0 epochs drops the group")
    assert(got("d") === 100L, "default 1.0 keeps one copy")
    // c: 100 + the ~half under the md5 threshold — binomial, wide bound
    assert(got("c") > 120L && got("c") < 180L, s"c=${got("c")}")
    // epoch indexes are dense per doc and membership is deterministic
    val byDoc = graft.ops.Splits.epochExpand(df, "doc_id", "source",
      Map("a" -> 2.5)).filter($"source" === "a")
      .groupBy("doc_id").agg(max("epoch").as("m"), count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(byDoc.forall { case (m, c) => m === c - 1 })
    assert(byDoc.map(_._2).toSet === Set(2L, 3L))
  }

  test("timeHoldout: strict past/future partition at the exact rank cutoff") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", $"ts".cast("timestamp"))
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Splits.timeHoldout(d, "ts", testNum = 1L, testDen = 5L)
    val out = run(ev).select($"ts".cast("long").as("t"), $"split").collect()
    val train = out.filter(_.getString(1) == "train").map(_.getLong(0))
    val test_ = out.filter(_.getString(1) == "test").map(_.getLong(0))
    assert(train.nonEmpty && test_.nonEmpty)
    assert(train.max < test_.min, "every train ts must precede every test ts")
    // rank contract: train holds the first ⌊(n−1)·4/5⌋+1 rows (± ties)
    val n = out.length.toLong
    val r = (n - 1) * 4 / 5
    assert(train.length >= r + 1, "cutoff row itself is train")
    // partitioning invariance
    val a = run(ev).select("event_id", "split").collect().map(_.toString).sorted.toSeq
    val b = run(ev.repartition(13)).select("event_id", "split")
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("interleaveBySource equals the whole-source window brute force") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    val sidx = sources.zipWithIndex.map { case (s, i) => (s, i.toLong) }
      .toSeq.toDF("source", "sidx")
    val expected = docs
      .withColumn("rk", row_number().over(w).cast("long") - 1L)
      .join(sidx, Seq("source"))
      .select($"doc_id", $"source",
        ($"rk" * sources.length + $"sidx").as("train_pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Splits.interleaveBySource(d, "doc_id", "source")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(run(docs) === expected)
    assert(run(docs.repartition(11)) === expected)
  }

  test("tokenBudgetTake guard fires on a scan-inconsistent source") {
    // a weight column that flips value between the pass-1 count scan and
    // the pass-2 selection scan: the first 60 evaluations (pass 1 sees
    // 60 rows) return 100, later ones return 1 — pass-2 totals can't
    // match pass-1's, the cutoff-bucket guard must fail the job loudly
    // instead of silently breaking the budget contract
    SplitsSpec.scanCounter.set(0L)
    val flip = udf(() =>
      if (SplitsSpec.scanCounter.incrementAndGet() <= 60L) 100L else 1L)
      .asNondeterministic()
    val df = spark.range(60).select(col("id"), lit("en").as("g"),
      flip().as("w"))
    val e = intercept[Exception] {
      Splits.tokenBudgetTake(df, "id", "g", "w", Map("en" -> 250L)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("diverged")),
      s"expected the scan-consistency guard, got: ${msgs(e).mkString(" | ")}")
  }

  test("interleaveBySource: unique positions, round-robin residues") {
    val df = (0 until 90).map(i =>
      (i.toLong, Seq("web", "code", "books")(i % 3))).toDF("doc_id", "source")
    val got = graft.ops.Splits.interleaveBySource(df, "doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._3).distinct.length === got.length, "positions must be unique")
    // alphabetical: books=0, code=1, web=2 — position mod 3 encodes source
    val bySrc = got.groupBy(_._2)
    assert(bySrc("books").forall(_._3 % 3 === 0L))
    assert(bySrc("code").forall(_._3 % 3 === 1L))
    assert(bySrc("web").forall(_._3 % 3 === 2L))
    // within a source, consecutive ranks: positions are 0-dense in rank
    bySrc.foreach { case (_, rows) =>
      val ranks = rows.map(_._3 / 3).sorted.toSeq
      assert(ranks === (0L until ranks.length.toLong).toSeq,
        "ranks must be 0..n-1 dense")
    }
  }
}

/** Shared mutable state for the scan-inconsistency test: a companion
  * static so local-mode executor threads (same JVM) see one counter —
  * a closure-captured AtomicLong would be serialized per task and
  * reset, making the source deterministic again. */
object SplitsSpec {
  val scanCounter = new java.util.concurrent.atomic.AtomicLong(0L)
}
