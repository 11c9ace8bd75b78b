package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The engine-exact exp surrogate shared by [[GmmReplay]] and [[Doremi]]:
  * pexp(x) = (1 + x/2¹⁶)^(2¹⁶) as 16 explicit IEEE squarings — pure ·/+
  * arithmetic any IEEE-754 engine replays bit-for-bit (true exp is <1 ulp
  * per engine but not the SAME ulp; see the [[GmmReplay]] scaladoc for the
  * full rationale). ≤0.7 % from true exp at x = −30; monotone.
  */
object PseudoExp {

  val Squarings = 16
  val PexpBase: Double = (1L << Squarings).toDouble // 65536

  /** pexp as a named-column chain: each squaring references the PREVIOUS
    * named column, keeping the Catalyst tree linear (a self-referencing
    * fold would build a 2^16-node tree).
    */
  def chain(df: DataFrame, xCol: String, outCol: String): DataFrame = {
    val seeded = df.withColumn(s"${outCol}_p0",
      lit(1.0d) + col(xCol) / lit(PexpBase))
    val chained = (1 to Squarings).foldLeft(seeded) { (d, i) =>
      d.withColumn(s"${outCol}_p$i",
        col(s"${outCol}_p${i - 1}") * col(s"${outCol}_p${i - 1}"))
    }
    chained.withColumn(outCol, col(s"${outCol}_p$Squarings"))
      .drop((0 to Squarings).map(i => s"${outCol}_p$i"): _*)
  }
}
