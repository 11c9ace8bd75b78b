package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MergeApply

class MergeApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // base keys 1..6; changes exercise every MERGE class plus last-writer
  // precedence and a delete-miss
  private lazy val base =
    Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"),
      (5L, "five"), (6L, "six"), (8L, "eight")).toDF("k", "v")
  private lazy val changes = Seq(
    (2L, 1L, "U", "two v2"),   // update
    (3L, 1L, "D", null),       // delete
    (4L, 1L, "U", "four"),     // no-op (identical value)
    (7L, 1L, "U", "seven"),    // insert (absent key)
    (5L, 1L, "U", "five v2"),  // superseded by...
    (5L, 2L, "D", null),       // ...delete (last writer wins)
    (6L, 1L, "D", null),       // superseded by...
    (6L, 2L, "U", "six v2"),   // ...update (last writer wins)
    (9L, 1L, "D", null),       // delete-miss (absent key)
    (8L, 1L, "U", null)        // legal update-to-NULL (not a delete!)
  ).toDF("k", "seq", "op", "v")

  test("audit classifies keep/insert/update/noop/delete incl. last-writer-wins") {
    val acts = MergeApply.audit(base, changes, "k", "seq", "op", "v")
      .select($"k", $"action").as[(Long, String)].collect().toMap
    assert(acts == Map(
      1L -> "keep", 2L -> "update", 3L -> "delete", 4L -> "noop",
      5L -> "delete", 6L -> "update", 7L -> "insert", 9L -> "delete",
      8L -> "update")) // update-to-NULL classifies as update, not noop/delete
  }

  test("audit hash is the post-merge content hash, NULL for deletes") {
    val rows = MergeApply.audit(base, changes, "k", "seq", "op", "v")
      .select($"k", $"action", $"text_md5")
      .as[(Long, String, Option[String])].collect()
    val byK = rows.map(r => r._1 -> r._3).toMap
    def md5of(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(byK(3L).isEmpty && byK(5L).isEmpty && byK(9L).isEmpty)
    assert(byK(8L).isEmpty, "post-merge value IS NULL, so its hash is NULL")
    assert(byK(1L).contains(md5of("one")))
    assert(byK(2L).contains(md5of("two v2")))
    assert(byK(4L).contains(md5of("four")))
    assert(byK(6L).contains(md5of("six v2")))
    assert(byK(7L).contains(md5of("seven")))
  }

  test("snapshot: deletes dropped, upserts applied (incl. update-to-NULL), keeps preserved") {
    val snap = MergeApply.snapshot(base, changes, "k", "seq", "op", "v")
      .as[(Long, Option[String])].collect().toMap
    assert(snap == Map(
      1L -> Some("one"), 2L -> Some("two v2"), 4L -> Some("four"),
      6L -> Some("six v2"), 7L -> Some("seven"),
      8L -> None)) // the NULL update applies; coalesce would resurrect "eight"
  }

  test("q_merge_apply on the fixture: every action class occurs; keys partition") {
    val df = SparkEntry.queries("q_merge_apply")(spark, TestSpark.Sf0001)
    val n = df.groupBy($"action").count().as[(String, Long)].collect().toMap
    for (a <- Seq("keep", "insert", "update", "noop", "delete"))
      assert(n.getOrElse(a, 0L) > 0L, s"missing action class $a")
    // one audit row per key in base ∪ changes
    val total = df.count()
    assert(df.select($"doc_id").distinct().count() == total)
  }
}
