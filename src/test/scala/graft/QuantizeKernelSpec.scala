package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Quantize

/**
 * Bit-identity pin for the r15→r16 native quantize kernels
 * (functions/QuantizeExpressions.scala) against a FROZEN copy of the
 * column chain they replaced (Quantize.scaleCol/quantizeCol as committed
 * through r15 — `array_max(transform(abs(cast)))/127` and
 * `when(scale=0, zeros) otherwise transform(round(cast/scale))::int`).
 * Every committed DuckDB oracle for the quantized tiers replays THAT
 * chain's arithmetic, so the kernels must reproduce it exactly —
 * including the null/empty/zero edge semantics, not just the happy path.
 */
class QuantizeKernelSpec extends SparkSuite {
  import spark.implicits._

  // ---- the frozen pre-kernel chain (verbatim from r15 Quantize.scala) ----
  private def scaleColOld(vecCol: Column): Column =
    array_max(transform(vecCol, x => abs(x.cast("double")))) / lit(127.0)
  private def quantizeColOld(vecCol: Column, scale: Column): Column =
    when(scale === 0d,
      transform(vecCol, _ => lit(0).cast("int")))
      .otherwise(transform(vecCol, x => round(x.cast("double") / scale).cast("int")))

  private def bothChains(df: DataFrame): (Seq[(Option[Double], Option[Seq[Option[Int]]])],
                                          Seq[(Option[Double], Option[Seq[Option[Int]]])]) = {
    def collect(scaled: DataFrame): Seq[(Option[Double], Option[Seq[Option[Int]]])] =
      scaled.orderBy("id")
        .select(col("qscale"), col("qvec"))
        .collect()
        .map { r =>
          val s = if (r.isNullAt(0)) None else Some(r.getDouble(0))
          val v = if (r.isNullAt(1)) None
                  else Some(r.getSeq[Any](1).map(x => Option(x).map(_.asInstanceOf[Int])))
          (s, v)
        }.toSeq
    val oldDf = df.withColumn("qscale", scaleColOld(col("vec")))
      .withColumn("qvec", quantizeColOld(col("vec"), col("qscale")))
    val newDf = Quantize.quantize(df, "vec")
    (collect(oldDf), collect(newDf))
  }

  private def assertBitIdentical(df: DataFrame): Unit = {
    val (o, n) = bothChains(df)
    assert(o.length === n.length)
    o.zip(n).zipWithIndex.foreach { case (((os, ov), (ns, nv)), i) =>
      (os, ns) match {
        case (Some(a), Some(b)) =>
          assert(java.lang.Double.doubleToRawLongBits(a) ===
                 java.lang.Double.doubleToRawLongBits(b), s"row $i qscale: $a vs $b")
        case (a, b) => assert(a === b, s"row $i qscale nullness: $a vs $b")
      }
      assert(ov === nv, s"row $i qvec")
    }
  }

  test("kernel ≡ frozen chain on realistic embeddings (normalized, d=1536)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val v = Array.fill(1536)(rnd.nextFloat() * 2f - 1f)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / nrm))
    }
    assertBitIdentical(rows.toDF("id", "vec"))
  }

  test("kernel ≡ frozen chain on half-boundary stress (q near .5 ties)") {
    // engineer floats whose quotient x/scale lands ON or NEAR k + 0.5:
    // scale = 1/127 exactly when max|x| = 1.0f, so x = (k+0.5f)/127f
    // reproduces the tie geometry the HALF_UP pin cares about
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      val v = Array.fill(32)(((rnd.nextInt(253) - 126) + 0.5f +
        (rnd.nextInt(5) - 2) * 1e-7f) / 127f)
      v(rnd.nextInt(32)) = if (rnd.nextBoolean()) 1.0f else -1.0f // pin the scale
      (i.toLong, v)
    }
    assertBitIdentical(rows.toDF("id", "vec"))
  }

  test("kernel ≡ frozen chain on magnitude extremes (denormals to 3e38)") {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.fill(16)(
        java.lang.Float.intBitsToFloat(rnd.nextInt()) match {
          case f if f.isNaN || f.isInfinite => rnd.nextFloat()
          case f => f
        }))
    }
    assertBitIdentical(rows.toDF("id", "vec"))
  }

  test("kernel ≡ frozen chain on the edge menagerie (zero, empty, null, null elements)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(0L, Seq(0f, 0f, 0f)),          // zero vector → scale 0, zeros
      Row(1L, Seq(0f, -0f, 0f)),         // ±0 only → still scale 0
      Row(2L, Seq.empty[Float]),         // empty → scale null, qvec []
      Row(3L, null),                     // null vec → null, null
      Row(4L, Seq[Any](1f, null, -2f)),  // null element skipped in max, null in qvec
      Row(5L, Seq[Any](null, null)),     // all-null → scale null, qvec [null, null]
      Row(6L, Seq[Any](0f, null)),       // max over {0} → scale 0 → BOTH slots 0
      Row(7L, Seq(42f))                  // single element → ±127
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    assertBitIdentical(df)
  }

  test("kernel matches the chain's ANSI raise on non-finite input") {
    // the old chain's `cast(int)` raises under ANSI for a NaN/Inf
    // quotient; the kernel must be in the same behavior class (raise),
    // not silently emit 0 the way a bare (int) conversion would
    for (bad <- Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity)) {
      val df = Seq((0L, Array(1.0f, bad))).toDF("id", "vec")
      val eOld = intercept[Exception] {
        df.withColumn("qscale", scaleColOld(col("vec")))
          .withColumn("qvec", quantizeColOld(col("vec"), col("qscale")))
          .collect()
      }
      val eNew = intercept[Exception] { Quantize.quantize(df, "vec").collect() }
      assert(eOld != null && eNew != null, s"both chains must raise on $bad")
    }
  }

  test("kernel ≡ frozen chain with whole-stage codegen disabled (interpreted eval path)") {
    val rnd = new scala.util.Random(1234)
    val rows = (0 until 50).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() * 4f - 2f)))
    val before = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assertBitIdentical(rows.toDF("id", "vec"))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", before)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("analysis-time guard: non-float arrays and non-double scales are rejected") {
    val dd = Seq((0L, Array(1.0, 2.0))).toDF("id", "vec")
    val e1 = intercept[Exception] { Quantize.quantize(dd, "vec").collect() }
    assert(e1.getMessage.toLowerCase.contains("array<float>") ||
           e1.getMessage.contains("max_abs_scale_f32"), e1.getMessage)
    val ff = Seq((0L, Array(1.0f))).toDF("id", "vec")
    val e2 = intercept[Exception] {
      ff.withColumn("q", Quantize.quantizeCol(col("vec"), lit(1))).collect()
    }
    assert(e2.getMessage.contains("quantize_arr_f32") ||
           e2.getMessage.toLowerCase.contains("double"), e2.getMessage)
  }
}
