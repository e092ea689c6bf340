package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashKernels, LexicalKernel, NgramStats}
import graft.ops.{Multimodal, Pca, VectorSearch}

/**
 * Seeded property sweeps over the PURE kernels (no SparkSession — these
 * run in milliseconds): each test drives a few hundred random cases
 * through an algebraic property the operators' correctness arguments
 * depend on. Deterministic seeds so a failure is reproducible verbatim.
 */
class KernelPropertySpec extends AnyFunSuite {

  private def toks(ws: Seq[String]): ArrayData =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w)).toArray[Any])

  test("pigeonhole: hamming(a,b) <= 3 implies >= 1 equal 16-bit band (500 cases)") {
    // the FULL-RECALL argument behind every banded-Hamming candidate
    // join (Multimodal.hashNearDupPairs): 4 bands, <= 3 flipped bits
    // leave at least one band untouched
    val rnd = new scala.util.Random(101)
    (1 to 500).foreach { _ =>
      val a = rnd.nextLong()
      var b = a
      val flips = rnd.nextInt(4) // 0..3
      (1 to flips).foreach(_ => b ^= (1L << rnd.nextInt(64)))
      val shares = (0 until 4).exists { band =>
        ((a >>> (band * 16)) & 0xFFFFL) == ((b >>> (band * 16)) & 0xFFFFL)
      }
      assert(shares, s"pigeonhole violated: a=$a b=$b flips=$flips")
    }
  }

  test("minhash containment: equal shingle sets give equal signatures (200 cases)") {
    // minhash signatures are a pure function of the shingle SET — token
    // order/duplication of whole docs must not matter at w=1
    val rnd = new scala.util.Random(202)
    val vocab = (0 until 30).map(i => s"w$i")
    (1 to 200).foreach { _ =>
      val set = rnd.shuffle(vocab).take(1 + rnd.nextInt(10))
      val a = set ++ set.take(rnd.nextInt(set.size)) // duplicated suffix
      val b = rnd.shuffle(a)
      val sigA = HashKernels.minhash(toks(a), 16, 1).toLongArray().toSeq
      val sigB = HashKernels.minhash(toks(b), 16, 1).toLongArray().toSeq
      assert(sigA === sigB)
    }
  }

  test("shingle/minhash agree on emptiness; jaccard in [0,1] and symmetric (200 cases)") {
    assert(HashKernels.shingleHashes(toks(Seq.empty), 3).numElements() === 0)
    val rnd = new scala.util.Random(303)
    val vocab = (0 until 20).map(i => s"w$i")
    (1 to 200).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val b = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val sa = HashKernels.shingleHashes(toks(a), 3)
      val sb = HashKernels.shingleHashes(toks(b), 3)
      val jab = HashKernels.jaccardSorted(sa, sb)
      val jba = HashKernels.jaccardSorted(sb, sa)
      assert(jab === jba)
      assert(jab >= 0.0 && jab <= 1.0)
      if (a.nonEmpty) assert(HashKernels.jaccardSorted(sa, sa) === 1.0)
    }
  }

  test("jacobi eigendecomposition: A·v = λ·v residuals (50 random symmetric 6x6)") {
    val rnd = new scala.util.Random(404)
    (1 to 50).foreach { _ =>
      val d = 6
      val m = Array.tabulate(d, d)((_, _) => rnd.nextDouble() * 2 - 1)
      val sym = Array.tabulate(d, d)((i, j) => (m(i)(j) + m(j)(i)) / 2)
      val (evals, evecs) = Pca.jacobi(sym)
      // residual ‖A·v − λ·v‖∞ per eigenpair (vectors are COLUMNS)
      (0 until d).foreach { k =>
        (0 until d).foreach { i =>
          val av = (0 until d).map(j => sym(i)(j) * evecs(j)(k)).sum
          assert(math.abs(av - evals(k) * evecs(i)(k)) < 1e-9,
            s"eigenpair $k residual at row $i")
        }
      }
      // trace preserved
      val trace = (0 until d).map(i => sym(i)(i)).sum
      assert(math.abs(evals.sum - trace) < 1e-9)
    }
  }

  test("GRFT fake-image encode/decode roundtrip (100 cases)") {
    val rnd = new scala.util.Random(505)
    (1 to 100).foreach { _ =>
      val w = 1 + rnd.nextInt(16); val h = 1 + rnd.nextInt(16)
      val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val (dw, dh, dc, dpx) =
        Multimodal.decodeBytes(Multimodal.encodeFake(w, h, px))
      assert((dw, dh, dc) === ((w, h, 3)))
      assert(dpx.toSeq === px.toSeq)
    }
  }

  test("bilinearResize: exact size, identity resize is the input (100 cases)") {
    val rnd = new scala.util.Random(606)
    (1 to 100).foreach { _ =>
      val w = 2 + rnd.nextInt(12); val h = 2 + rnd.nextInt(12); val c = 1 + rnd.nextInt(3)
      val px = Array.fill(w * h * c)(rnd.nextInt(256).toByte)
      val same = Multimodal.bilinearResize(px, w, h, c, w, h)
      assert(same.toSeq === px.toSeq, "identity resize must reproduce the raster")
      val nw = 1 + rnd.nextInt(20); val nh = 1 + rnd.nextInt(20)
      assert(Multimodal.bilinearResize(px, w, h, c, nw, nh).length === nw * nh * c)
    }
  }

  test("classify is total over {en,de,es,fr,zh,und} incl. null/garbage (300 cases)") {
    val langs = Set("en", "de", "es", "fr", "zh", "und")
    assert(graft.functions.LangIdExpression.classify(null).toString === "und")
    val rnd = new scala.util.Random(707)
    (1 to 300).foreach { _ =>
      val s = (1 to rnd.nextInt(30)).map(_ =>
        rnd.nextInt(3) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar.toString
          case 1 => " "
          case _ => new String(Character.toChars(0x4e00 + rnd.nextInt(100)))
        }).mkString
      val out = graft.functions.LangIdExpression
        .classify(UTF8String.fromString(s)).toString
      assert(langs.contains(out), s"classify('$s') = $out")
    }
  }

  test("LSH signature: local kernel equals per-plane sign definition (100 cases)") {
    val rnd = new scala.util.Random(808)
    val planes = VectorSearch.randomPlanes(12, 8, seed = 42L)
    (1 to 100).foreach { _ =>
      val v = Array.fill(8)(rnd.nextFloat() * 2 - 1)
      val sig = VectorSearch.signatureOf(v, planes)
      (0 until 12).foreach { p =>
        val dot = (0 until 8).map(i => v(i) * planes(p)(i)).sum
        assert((((sig >> p) & 1L) == 1L) === (dot >= 0),
          s"plane $p sign mismatch")
      }
    }
  }

  // --- NgramStats kernels vs brute-force references --------------------
  // The Gopher §A1.2 gate entries ride on these per-row kernels; the
  // example-based specs pin known documents, these sweeps pin the
  // DEFINITION against an obviously-correct sliding-window reference on
  // random token streams over a tiny vocabulary (ties and repeats are
  // the common case, not the corner case).

  private def randToks(rnd: scala.util.Random, maxLen: Int): Seq[String] = {
    val vocab = Seq("a", "bb", "ccc", "dd", "e") // varied char lengths
    Seq.fill(rnd.nextInt(maxLen + 1))(vocab(rnd.nextInt(vocab.size)))
  }

  test("topNgramEval equals brute-force max-count/lex-min gram (400 cases)") {
    val rnd = new scala.util.Random(909)
    (1 to 400).foreach { _ =>
      val ws = randToks(rnd, 14)
      val n = 1 + rnd.nextInt(4)
      val got = NgramStats.topNgramEval(toks(ws), n)
      if (ws.length < n) assert(got == null, s"ws=$ws n=$n must yield null")
      else {
        val grams = ws.sliding(n).map(_.mkString(" ")).toSeq
        val byCount = grams.groupBy(identity).view.mapValues(_.size)
        val bestCnt = byCount.values.max
        // tie-break: lexicographically smallest among the max-count grams
        // (UTF8String.compareTo is unsigned-byte order == Java String
        // order for this ASCII vocab)
        val bestGram = byCount.collect { case (g, c) if c == bestCnt => g }.min
        assert(got.getUTF8String(0).toString === bestGram,
          s"ws=$ws n=$n: gram ${got.getUTF8String(0)} != $bestGram")
        assert(got.getLong(1) === bestCnt.toLong, s"ws=$ws n=$n count")
      }
    }
  }

  test("dupNgramEval equals brute-force span union (400 cases)") {
    val rnd = new scala.util.Random(1010)
    (1 to 400).foreach { _ =>
      val ws = randToks(rnd, 14)
      val n = 1 + rnd.nextInt(4)
      val got = NgramStats.dupNgramEval(toks(ws), n)
      val t = ws.length
      val expTokenChars = ws.map(_.length.toLong).sum
      // reference: mark [i, i+n) for every position whose gram text
      // occurs >= 2 times in the doc, then tally the UNION (overlapping
      // repeats counted once)
      val grams =
        if (t < n) Seq.empty else ws.sliding(n).map(_.mkString(" ")).toSeq
      val dupAt = grams.zipWithIndex.collect {
        case (g, i) if grams.count(_ == g) >= 2 => i
      }
      val covered = dupAt.flatMap(i => i until i + n).toSet
      assert(got.getLong(0) === t.toLong, s"ws=$ws n=$n n_tokens")
      assert(got.getLong(1) === expTokenChars, s"ws=$ws n=$n token_chars")
      assert(got.getLong(2) === covered.size.toLong,
        s"ws=$ws n=$n covered_tokens")
      assert(got.getLong(3) === covered.toSeq.map(ws(_).length.toLong).sum,
        s"ws=$ws n=$n covered_chars")
      // structural invariants the gate's cross-multiplied verdicts assume
      assert(got.getLong(2) <= got.getLong(0) && got.getLong(3) <= got.getLong(1))
    }
  }

  test("LexicalKernel equals brute-force distinct/hapax counts (300 cases)") {
    val rnd = new scala.util.Random(1111)
    (1 to 300).foreach { _ =>
      val ws = randToks(rnd, 20)
      val got = LexicalKernel.eval(toks(ws))
      val byCount = ws.groupBy(identity).view.mapValues(_.size)
      assert(got.getLong(0) === ws.length.toLong)
      assert(got.getLong(1) === byCount.size.toLong)
      assert(got.getLong(2) === byCount.values.count(_ == 1).toLong)
    }
  }

  test("jaccardSorted equals |A∩B|/|A∪B| of the string shingle sets (300 cases)") {
    // the existing sweep pins symmetry/range/self=1 but never the
    // DEFINITION; this one compares against set jaccard computed on the
    // string windows themselves (w=3; docs shorter than w contribute
    // one whole-doc shingle, the kernel's short-doc rule)
    val rnd = new scala.util.Random(1515)
    val vocab = (0 until 12).map(i => s"w$i")
    def windows(ws: Seq[String]): Set[Seq[String]] =
      if (ws.isEmpty) Set.empty
      else (0 until math.max(1, ws.length - 2))
        .map(s => ws.slice(s, math.min(ws.length, s + 3))).toSet
    (1 to 300).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
      val b = Seq.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
      val (wa, wb) = (windows(a), windows(b))
      val want =
        if (wa.isEmpty && wb.isEmpty) 0.0
        else wa.intersect(wb).size.toDouble / wa.union(wb).size
      val got = HashKernels.jaccardSorted(
        HashKernels.shingleHashes(toks(a), 3),
        HashKernels.shingleHashes(toks(b), 3))
      assert(got === want, s"a=$a b=$b")
    }
  }

  test("simhash64 bit b is the majority vote of token-hash bit b (200 cases)") {
    val rnd = new scala.util.Random(1616)
    val vocab = (0 until 10).map(i => s"w$i")
    (1 to 200).foreach { _ =>
      val ws = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val sig = HashKernels.simhash64(toks(ws))
      val hashes = ws.map(w =>
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(UTF8String.fromString(w), 0L))
      (0 until 64).foreach { b =>
        val votes = hashes.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
        assert((((sig >>> b) & 1L) == 1L) === (votes > 0),
          s"bit $b of simhash(${ws.mkString(",")})") // ties → 0
      }
    }
  }

  test("Misra-Gries kernel: guarantee holds under random splits and merge orders (60 streams)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    val rnd = new scala.util.Random(1717)
    val agg = graft.functions.MisraGriesAgg(
      BoundReference(0, StringType, nullable = true), capacity = 8)
    (1 to 60).foreach { trial =>
      // zipf-ish stream over ~40 values so some exceed n/(cap+1)
      val stream = Seq.fill(400)(s"v${math.min(rnd.nextInt(40), rnd.nextInt(40))}")
      // split into random segments, build one buffer per segment
      val cuts = (Seq(0, stream.length) ++
        Seq.fill(rnd.nextInt(5))(rnd.nextInt(stream.length + 1))).distinct.sorted
      val bufs = cuts.zip(cuts.tail).map { case (lo, hi) =>
        val b = agg.createAggregationBuffer()
        stream.slice(lo, hi).foreach(v =>
          agg.update(b, InternalRow(UTF8String.fromString(v))))
        b
      }
      // merge in shuffled order
      val merged = rnd.shuffle(bufs).reduce((x, y) => agg.merge(x, y))
      val n = stream.length
      val bound = n / 9 // n/(capacity+1)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      truth.foreach { case (v, c) =>
        if (c > bound)
          assert(merged.contains(v),
            s"trial $trial: heavy hitter $v (count $c > $bound) evicted")
      }
      merged.foreach { case (v, est) =>
        val t = truth(v)
        assert(est <= t && est >= t - bound,
          s"trial $trial: estimate $est for $v outside [${t - bound}, $t]")
      }
    }
  }

  test("fast HALF_UP (floor + exact frac compare) == Spark's Round on the quantize domain (5000 cases + edges)") {
    // Groundwork for the planned native quantize kernel (SURVEY r15 item
    // 15: the q8 build is dominated by the non-codegen transform()
    // lambda): quantizeCol's hot element op is round(x/scale, 0) on
    // double, which Spark evaluates through BigDecimal(shortest-decimal
    // rendering).setScale(0, HALF_UP) - ~100 ns and 2 allocations per
    // element. The allocation-free form below works on |y| and applies
    // the sign last: for a = |y| >= 0, a - floor(a) is EXACT in double
    // (a < 1 trivially; a >= 1 by Sterbenz, floor(a) <= a < 2*floor(a)),
    // and the shortest-decimal rendering round-trips uniquely, so its
    // fractional part compares against 0.5 exactly as the binary
    // fraction does - HALF_UP ties go away from zero, i.e. UP in |y|.
    // TWO known-broken "fast" forms this pin exists to keep out:
    //  * floor(y + 0.5): the addition itself rounds
    //    (y = 0.49999999999999994 -> y + 0.5 == 1.0 -> 1, truth 0);
    //  * frac-compare on SIGNED y: y - floor(y) is inexact for negative
    //    fractions (y = -0.49999999999999994: y + 1.0 lands exactly on
    //    the ties-to-even midpoint and rounds to 0.5, so the tie branch
    //    fires and returns -1, truth 0). This second form was the
    //    first draft of this very test - the sweep caught it.
    import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
    def sparkRound(y: Double): Double =
      Round(Literal(y), Literal(0)).eval(null).asInstanceOf[Double]
    def fastHalfUp(y: Double): Double = {
      val a = math.abs(y)
      val f = math.floor(a)
      val m = if (a - f >= 0.5) f + 1 else f
      math.copySign(m, y)
    }
    val edges = Seq(0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5,
      126.5, -126.5, 127.0, -127.0,
      0.49999999999999994, -0.49999999999999994,
      2.4999999999999996, 2.5000000000000004, -2.5000000000000004,
      0.5000000000000001, -0.5000000000000001)
    val rnd = new scala.util.Random(404)
    val cases = edges ++
      (1 to 5000).map(_ => (rnd.nextDouble() - 0.5) * 255.0) ++
      // near-half-boundary stress: integers plus a tiny dither around .5
      (1 to 2000).map(_ => rnd.nextInt(127) +
        0.5 + (rnd.nextInt(5) - 2) * 1e-16)
    cases.foreach { y =>
      assert(fastHalfUp(y) === sparkRound(y), s"y = $y")
      assert(fastHalfUp(-y) === sparkRound(-y), s"y = ${-y}")
    }
  }

  test("HalfUpRound expression == Spark's Round(x, 0) incl. non-finite, large, null") {
    // the r15 scalar drop-in for the gate's round(col*scale).cast(long)
    // projections: same eval contract as Round at EVERY double, not just
    // the quantize domain - money cents, scaled quantiles, 65536-rate
    // thresholds all route through it now
    import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
    def sparkRound(y: Double): Double =
      Round(Literal(y), Literal(0)).eval(null).asInstanceOf[Double]
    def kernel(y: Double): Double =
      graft.functions.HalfUpRound(Literal(y)).eval(null).asInstanceOf[Double]
    val edges = Seq(0.0, -0.0, 0.5, -0.5, 1e15 + 0.5, -(1e15 + 0.5),
      9.007199254740992e15, 4.9e-324, -4.9e-324,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MaxValue, Double.MinValue, Double.MinPositiveValue)
    val rnd = new scala.util.Random(7)
    val cases = edges ++
      (1 to 5000).map(_ => (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(12))) ++
      (1 to 2000).map(_ => rnd.nextInt(1 << 20) + 0.5 + (rnd.nextInt(5) - 2) * 1e-16)
    cases.foreach { y =>
      val (a, b) = (kernel(y), sparkRound(y))
      assert(java.lang.Double.doubleToRawLongBits(a) ===
             java.lang.Double.doubleToRawLongBits(b), s"y = $y: $a vs $b")
    }
    // null propagates like Round's
    assert(graft.functions.HalfUpRound(
      Literal(null, org.apache.spark.sql.types.DoubleType)).eval(null) == null)
  }

  test("Md5Bucket16 == int(md5hex[0:4],16); int compare == hex string compare (3000 cases)") {
    // the r16 membership kernel behind the deterministic hash sample
    // (Profile.quantileSampleFrame): must reproduce the
    // substring(md5(s),1,4) < rateHex(r) decision BIT-EXACTLY, because
    // the DuckDB oracle replays the hex-string form. Two halves:
    //  (a) value pin: the kernel's int is the first-4-hex-chars integer
    //      of an INDEPENDENT MessageDigest's hex rendering;
    //  (b) order pin: for 4-char lowercase hex, lexicographic < equals
    //      numeric < (hex digits ascend in ASCII), so the membership
    //      decision is identical at every (string, rate) pair —
    //      including rate edges 0, 1, and the 65535 clamp.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.Md5Bucket16
    import graft.ops.Splits
    def hex4(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      d.take(2).map(b => f"${b & 0xff}%02x").mkString
    }
    def kernel(s: String): Int =
      Md5Bucket16(Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[Int]
    val rnd = new scala.util.Random(1616)
    val edgeStrings = Seq("", "0", "-1", "a|b", "0|0", "åß∂ƒ", " ",
      "9999999999|7", " ", "null")
    val strings = edgeStrings ++ (1 to 3000).map { _ =>
      val n = rnd.nextInt(24)
      (1 to n).map(_ => (rnd.nextInt(0x2000) + 1).toChar).mkString
    }
    val rates = Seq(0.0, 1.0, 0.5, 1.0 / 131072, 1 - 1.0 / 131072) ++
      (1 to 50).map(_ => rnd.nextDouble())
    strings.foreach { s =>
      val h = hex4(s)
      val k = kernel(s)
      assert(f"$k%04x" === h, s"s=<$s>")
      rates.foreach { r =>
        assert((k < Splits.rateBucket16(r)) === (h < Splits.rateHex(r)),
          s"s=<$s> r=$r")
      }
    }
    // null propagates (null key rendering → null bucket → filter drops,
    // exactly as null md5-hex did)
    assert(Md5Bucket16(
      Literal(null, org.apache.spark.sql.types.StringType)).eval(null) == null)
  }
}
