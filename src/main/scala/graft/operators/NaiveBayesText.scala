package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multinomial Naive Bayes text classifier — train and score entirely as
  * relational aggregates (McCallum & Nigam 1998), with every model
  * parameter an exact integer so the full train→predict→confusion
  * pipeline hash-replays in any engine:
  *
  *   score(d, c) = ln P(c) + Σ_w count_d(w) · ln P(w|c)
  *   P(w|c)      = (cnt(w,c) + 1) / (N_c + V)          (Laplace)
  *
  * The ln of a RATIO never appears: the per-word term decomposes as
  * `count_d(w)·lnE6(cnt(w,c)+1)` minus a per-DOC `L_d·lnE6(N_c+V)`
  * correction (words absent from class c contribute lnE6(0+1) = 0, so
  * only observed (word, class) cells are ever joined — the sparse-join
  * spelling of the dense score). `lnE6(n) = floor(ln(n)·10⁶ + 0.5)` on an
  * integer argument lands on the same BIGINT in the JVM and DuckDB
  * (verified exhaustively to 500k), so scores are BIGINT sums of BIGINT
  * terms and the argmax is exact — no double ever enters an aggregate.
  *
  * Scale shape: training is one (class, word) aggregate over the token
  * explosion — the word-count shuffle every corpus profile already pays.
  * Scoring joins test (doc, word) counts to the model on the WORD key
  * (model rows ≤ V·k — broadcastable for bounded vocabularies, hash-join
  * otherwise), then one (doc, class) aggregate and one per-doc argmax
  * window over k rows. The class table (k rows) broadcasts. No driver
  * state, no collect.
  *
  * Split: deterministic holdout `doc_id % 5 == 0` (the md5-free split is
  * fine here — doc_id assignment is already content-independent), train
  * on the rest; resubstitution is avoided so the confusion matrix is an
  * honest generalization readout.
  */
object NaiveBayesText {

  private def lnE6(x: Column): Column =
    floor(log(x.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")

  /** Per-(true class, predicted class) document counts on the holdout.
    * Output: `true_class`, `pred_class`, `n_docs` — k² rows max.
    */
  def confusion(
      docs: DataFrame,
      classCol: String = "lang",
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(classCol).as("cls"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val train = base.filter(col("doc_id") % 5 =!= 0)
    val test  = base.filter(col("doc_id") % 5 === 0)

    // model: per-(class, word) token counts over the training split
    val cw = train
      .select(col("cls"), explode(col("toks")).as("word"))
      .groupBy(col("cls"), col("word")).agg(count(lit(1)).as("cnt"))
    // per-class token totals and doc counts; vocabulary size; train size.
    // All tiny aggregates of the cw/train frames — k rows, 1 row — that
    // broadcast into the scoring join.
    val classStats = cw.groupBy(col("cls")).agg(sum(col("cnt")).as("n_tok"))
      .join(train.groupBy(col("cls")).agg(count(lit(1)).as("n_docs")), Seq("cls"))
    val vocab = cw.select(col("word")).distinct()
      .agg(count(lit(1)).as("v_size"))
    val nTrain = train.agg(count(lit(1)).as("n_train"))
    val classes = classStats.crossJoin(vocab).crossJoin(nTrain)
      .select(col("cls").as("pred_cls"),
        // ln P(c) and the per-token denominator, both integer-micro
        (lnE6(col("n_docs")) - lnE6(col("n_train"))).as("prior_e6"),
        lnE6(col("n_tok") + col("v_size")).as("denom_e6"))

    // holdout (doc, word) counts and lengths
    val tw = test.select(col("doc_id"), explode(col("toks")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c_w"))
    val docLen = test.select(col("doc_id"), col("cls").as("true_cls"),
      size(col("toks")).cast("long").as("len"))

    // sparse numerator: only observed (word, class) cells join
    val s1 = tw.join(cw.withColumnRenamed("cls", "pred_cls"), Seq("word"))
      .groupBy(col("doc_id"), col("pred_cls"))
      .agg(sum(col("c_w") * lnE6(col("cnt") + lit(1L))).as("s1_e6"))

    val scored = docLen
      .crossJoin(broadcast(classes))
      .join(s1, Seq("doc_id", "pred_cls"), "left")
      .select(col("doc_id"), col("true_cls"), col("pred_cls"),
        (coalesce(col("s1_e6"), lit(0L))
          - col("len") * col("denom_e6") + col("prior_e6")).as("score_e6"))

    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_e6").desc, col("pred_cls"))
    scored
      .withColumn("_rk", row_number().over(win))
      .filter(col("_rk") === 1)
      .groupBy(col("true_cls"), col("pred_cls"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
