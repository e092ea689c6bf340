package graft

/** Dev alias: `runMain graft.VerifySubset <sfDir> <outDir> <q1> <q2> …`.
  * Delegates to [[Verify]], which accepts the same extra-args subset —
  * the earlier standalone implementation duplicated Verify's dump logic
  * (with a third copy of the JSON escaper) and used `coalesce(1)`, the
  * exact single-task collapse Verify's repartition(1) comment warns
  * about. One implementation now serves both entry points. */
object VerifySubset {
  def main(args: Array[String]): Unit = Verify.main(args)
}
