package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/**
 * Spark SQL surface for the graft kernels: register with
 *
 * {{{
 * SparkSession.builder().withExtensions(new GraftExtensions)
 * // or spark.sql.extensions=graft.GraftExtensions
 * }}}
 *
 * then use from SQL:
 * {{{
 * SELECT id, dot_f32(embedding, query) AS sim FROM docs
 * ORDER BY sim DESC LIMIT 10
 * }}}
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity arguments")
          builder(args)
        }))
    }
}

object GraftExtensions {
  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(
      s"$fn expects an integer literal argument")
  }

  private val functions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("dot_f32", 2, args => DotProductF32(args(0), args(1))),
    ("dot_f64", 2, args => DotProductF64(args(0), args(1))),
    ("cosine_sim", 2, args => CosineSimilarity(args(0), args(1))),
    ("l2_norm", 1, args => L2Norm(args(0))),
    ("normalize_f32", 1, args => NormalizeF32(args(0))),
    ("is_normalized", 1, args => IsNormalizedF32(args(0))),
    ("simhash64", 1, args => SimHash64(args(0))),
    ("fast_lang_id", 1, args => FastLangId(args(0))),
    ("minhash_signature", 3, args => MinHashSignature(args(0),
      litInt(args(1), "minhash_signature"), litInt(args(2), "minhash_signature"))),
    ("shingle_hashes", 2, args =>
      ShingleHashes(args(0), litInt(args(1), "shingle_hashes"))),
    ("jaccard_sorted", 2, args => JaccardSorted(args(0), args(1))),
    ("nfc_normalize", 1, args => NfcNormalize(args(0))))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, arity, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity arguments")
          builder(args)
        },
        "built-in")
    }
}
