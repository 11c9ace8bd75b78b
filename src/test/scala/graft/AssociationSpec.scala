package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Association

/** Event-type lift vs hand-computed incidence tables. */
final class AssociationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed lift, independence and positive association") {
    import spark.implicits._
    // 4 users: u1 {a,b}, u2 {a,b}, u3 {a}, u4 {b}  (duplicates collapse)
    // n_a=3, n_b=3, n_ab=2, N=4 → lift = 2·4/(3·3) = 8/9 ≈ 0.888889
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "b"))
      .toDF("user_id", "event_type")
    val r = Association.typeLift(df).collect()
    assert(r.length === 1)
    val row = r.head
    assert((row.getString(0), row.getString(1)) === (("a", "b")))
    assert((row.getLong(2), row.getLong(3), row.getLong(4)) === ((3L, 3L, 2L)))
    assert(row.getDouble(5) === math.floor(8.0 / 9.0 * 1e6 + 0.5) / 1e6)
  }

  test("pairs are canonical (type_a < type_b) and complete") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c")).toDF("user_id", "event_type")
    val got = Association.typeLift(df).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}
