package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Repetition

class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(text: String): (Int, Double, Double, Double, Double) =
    Repetition.scores(Seq((1L, text)).toDF("doc_id", "text"))
      .select($"n_words", $"dup_word_frac", $"dup_bigram_frac", $"dup_line_frac",
        $"top_word_frac")
      .as[(Int, Double, Double, Double, Double)].head()

  test("hand-computed metrics on a repetitive document") {
    // words: the cat the cat sat (5 words, 3 distinct)
    // bigrams: "the cat","cat the","the cat","cat sat" (4, 3 distinct)
    // lines: "The cat", "the Cat sat" minus blanks (2, 2 distinct)
    val (n, dw, db, dl, tw) = score("The cat\n\nthe Cat sat")
    assert(n == 5)
    assert(dw == 1.0 - 3.0 / 5.0)
    assert(db == 1.0 - 3.0 / 4.0)
    assert(dl == 0.0)
    assert(tw == 2.0 / 5.0) // "the" (and "cat") appear twice
  }

  test("degenerate docs: empty text and single word") {
    assert(score("") == ((0, 0.0, 0.0, 0.0, 0.0)))
    assert(score("word") == ((1, 0.0, 0.0, 0.0, 1.0)))
  }

  test("fully repeated line boilerplate is caught by dup_line_frac") {
    val (_, _, _, dl, tw) = score("subscribe now\nsubscribe now\nsubscribe now")
    assert(dl == 0.666667) // 1 - 1/3, rounded at 6

    assert(tw == 0.5) // "subscribe" 3 of 6
  }

  test("metrics are a zero-shuffle projection (no Exchange in the plan)") {
    val df = Repetition.scores(Seq((1L, "a b c")).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
