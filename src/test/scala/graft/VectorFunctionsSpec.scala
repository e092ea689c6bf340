package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.functions.VectorFunctions._

/** Kernel parity with reference vector.go + codegen/interpreted agreement. */
class VectorFunctionsSpec extends SparkSuite {
  import spark.implicits._

  /** 200 seeded random vectors of varying dims (property-style sample). */
  private def randomVectors: Seq[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(200)(Array.fill(1 + rnd.nextInt(64))(rnd.nextFloat() * 20 - 10))
  }

  test("driver-side dot matches manual sum (float32)") {
    val a = Array(1f, 2f, 3f); val b = Array(4f, 5f, 6f)
    assert(VectorFunctions.dot(a, b) === 32f)
  }

  test("dot errors on length mismatch (reference vector.go:16-18)") {
    val e = intercept[IllegalArgumentException] {
      VectorFunctions.dot(Array(1f), Array(1f, 2f))
    }
    assert(e.getMessage.contains("same length"))
  }

  test("normalize produces unit vectors; isNormalized tolerance 1e-6") {
    randomVectors.filter(VectorFunctions.norm(_) > 1e-3).foreach { v =>
      assert(VectorFunctions.isNormalized(VectorFunctions.normalize(v)))
    }
    assert(VectorFunctions.normalize(Array(-0.1f, 0.1f, 0.2f))
      .zip(Array(-0.40824828f, 0.40824828f, 0.81649655f))
      .forall { case (a, b) => math.abs(a - b) < 1e-6 })
  }

  test("column expressions agree with driver-side kernels") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(50)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val q = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
    val got = df.select($"id",
        dot_f32($"v", typedLit(q.toIndexedSeq)).as("d32"),
        dot_const_f32($"v", q).as("dc32"),
        dot_f64($"v", typedLit(q.toIndexedSeq)).as("d64"),
        l2_norm($"v").as("nrm"),
        is_normalized($"v").as("isn"))
      .collect().map(r => (r.getInt(0), r.getFloat(1), r.getFloat(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))).sortBy(_._1)
    got.foreach { case (i, d32, dc32, d64, nrm, isn) =>
      val expected = VectorFunctions.dot(vecs(i), q)
      assert(math.abs(d32 - expected) < 1e-5, s"dot_f32 row $i")
      assert(d32 === dc32, s"dot_const_f32 must equal dot_f32 bit-for-bit, row $i")
      assert(math.abs(d64 - expected) < 1e-4, s"dot_f64 row $i")
      assert(math.abs(nrm - VectorFunctions.norm(vecs(i))) < 1e-9, s"l2_norm row $i")
      assert(isn === VectorFunctions.isNormalized(vecs(i)), s"is_normalized row $i")
    }
  }

  test("normalize_f32 column matches driver normalize") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(20)(Array.fill(8)(rnd.nextFloat() * 4 - 2))
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
    val got = df.select($"id", normalize_f32($"v").as("n")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    got.foreach { case (i, n) =>
      val exp = VectorFunctions.normalize(vecs(i))
      assert(n.zip(exp).forall { case (a, b) => math.abs(a - b) < 1e-6 }, s"row $i")
    }
  }

  test("column dot raises on length mismatch inside codegen") {
    val df = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(dot_f32($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("same length") ||
      e.getCause != null && e.getCause.getMessage.contains("same length"))
  }

  test("subtract matches element-wise difference (reference vector.go:44-52)") {
    assert(VectorFunctions.subtract(Array(3f, 2f), Array(1f, 5f)).toSeq === Seq(2f, -3f))
  }
}
