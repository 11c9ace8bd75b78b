package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CommunityQuality

/** Hand-traced intra-community Jaccard cases: identical docs → 1, disjoint
  * docs → 0, singleton communities omitted, cap bounds the pair count.
  */
final class CommunityQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("identical-member community scores 1, disjoint-member community 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "one two three four"),
      (4L, "five six seven eight"),
      (5L, "lonely doc")
    ).toDF("doc_id", "text")
    val comm = Seq(1L -> 10L, 2L -> 10L, 3L -> 20L, 4L -> 20L, 5L -> 30L)
      .toDF("node", "community")
    val got = CommunityQuality.intraJaccard(docs, comm).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(10L, 20L)) // singleton 30 omitted
    assert(got(10L).getAs[Long]("n_pairs") === 1L)
    assert(got(10L).getAs[Long]("sum_j_e6") === 1000000L)
    assert(got(10L).getAs[Double]("mean_jaccard") === 1.0)
    assert(got(20L).getAs[Long]("sum_j_e6") === 0L)
    assert(got(20L).getAs[Double]("mean_jaccard") === 0.0)
  }

  test("cap bounds sampled members and pair count") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, "common shingle text here"))
      .toDF("doc_id", "text")
    val comm = (1L to 30L).map(i => (i, 1L)).toDF("node", "community")
    val r = CommunityQuality.intraJaccard(docs, comm, capPerCommunity = 5)
      .collect().head
    assert(r.getAs[Long]("n_members") === 30L)
    assert(r.getAs[Long]("n_sampled") === 5L)
    assert(r.getAs[Long]("n_pairs") === 10L) // C(5,2)
    assert(r.getAs[Double]("mean_jaccard") === 1.0)
  }
}
