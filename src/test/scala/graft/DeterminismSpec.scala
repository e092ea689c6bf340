package graft

/**
 * Every gate query must be value-deterministic across runs: the driver
 * hash-compares Verify output against a DuckDB oracle, so ANY
 * nondeterminism (float accumulation reorder, unstable tie-breaks,
 * time/random dependence) shows up as a flaky gate. Running each query
 * twice and comparing collected rows (order-insensitive — the driver
 * sorts before hashing) pins the property at test time instead of
 * discovering it in a red round.
 */
class DeterminismSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("every gate query returns identical rows on a second run") {
    withLogLevel {
      val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        def run(): Seq[String] =
          fn(spark, dir).collect().map(_.toString).sorted.toSeq
        val (a, b) = (run(), run())
        if (a == b) None else Some(name)
      }
      assert(diffs.isEmpty, s"nondeterministic gate queries: $diffs")
    }
  }
}
