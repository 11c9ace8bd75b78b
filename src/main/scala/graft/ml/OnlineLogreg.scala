package graft.ml

import scala.collection.mutable

/** M6: driver-side online logistic regression with running standardization —
  * the Scala twin of the reference's SGDClassifier(log_loss) + StandardScaler
  * (reference: src/streaming/online_model.py:54-236).
  *
  * - Welford running mean/variance standardizes each feature online.
  * - Mini-batch SGD (batch = `miniBatch`, default 100 like config.py:126)
  *   with constant learning rate on the log-loss gradient.
  * - Cold-start heuristic before the first fit: cart>0 → 0.7, views>3 → 0.3,
  *   else 0.1 (online_model.py:151-159).
  * - Rolling accuracy over the last `accWindow` labeled predictions.
  *
  * Thread-safety: `foreachBatch` runs one invocation at a time per streaming
  * query, so no lock is needed unless the instance is shared across queries
  * (the reference locks because Python threads share it).
  */
final class OnlineLogreg(
    val nFeatures: Int,
    val lr: Double = 0.01,
    val miniBatch: Int = 100,
    val accWindow: Int = 1000,
    val viewIdx: Int = 0,
    val cartIdx: Int = 1
) extends Serializable {

  val weights: Array[Double] = Array.fill(nFeatures)(0.0)
  var bias: Double = 0.0
  var isFitted: Boolean = false
  var predictionsMade: Long = 0L
  var samplesSeen: Long = 0L

  // Welford accumulators
  private val mean = Array.fill(nFeatures)(0.0)
  private val m2 = Array.fill(nFeatures)(0.0)
  private var scaleN = 0L

  private val buffer = mutable.ArrayBuffer.empty[(Array[Double], Int)]
  private val recent = mutable.Queue.empty[Boolean]

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-math.max(-35.0, math.min(35.0, z))))

  private def observeScale(x: Array[Double]): Unit = {
    scaleN += 1
    var i = 0
    while (i < nFeatures) {
      val d = x(i) - mean(i)
      mean(i) += d / scaleN
      m2(i) += d * (x(i) - mean(i))
      i += 1
    }
  }

  def scaled(x: Array[Double]): Array[Double] = {
    val out = new Array[Double](nFeatures)
    var i = 0
    while (i < nFeatures) {
      val variance = if (scaleN > 1) m2(i) / (scaleN - 1) else 0.0
      val sd = math.sqrt(variance)
      out(i) = if (sd > 1e-12) (x(i) - mean(i)) / sd else 0.0
      i += 1
    }
    out
  }

  def coldStart(x: Array[Double]): Double =
    if (x(cartIdx) > 0) 0.7 else if (x(viewIdx) > 3) 0.3 else 0.1

  def predictProba(x: Array[Double]): Double = {
    predictionsMade += 1
    if (!isFitted) coldStart(x)
    else {
      val s = scaled(x)
      var z = bias
      var i = 0
      while (i < nFeatures) { z += weights(i) * s(i); i += 1 }
      sigmoid(z)
    }
  }

  /** Buffer one labeled sample; run an SGD sweep when the mini-batch fills. */
  def partialFit(x: Array[Double], label: Int): Unit = {
    observeScale(x)
    samplesSeen += 1
    val p = if (isFitted) predictRaw(x) else coldStart(x)
    recent.enqueue((if (p >= 0.5) 1 else 0) == label)
    while (recent.size > accWindow) recent.dequeue()
    buffer += ((x, label))
    if (buffer.size >= miniBatch) flush()
  }

  private def predictRaw(x: Array[Double]): Double = {
    val s = scaled(x)
    var z = bias
    var i = 0
    while (i < nFeatures) { z += weights(i) * s(i); i += 1 }
    sigmoid(z)
  }

  /** One SGD pass over the buffered mini-batch (log-loss gradient:
    * (p − y)·x), then clear the buffer.
    */
  def flush(): Unit = {
    if (buffer.isEmpty) return
    buffer.foreach { case (x, y) =>
      val s = scaled(x)
      var z = bias
      var i = 0
      while (i < nFeatures) { z += weights(i) * s(i); i += 1 }
      val p = sigmoid(z)
      val g = p - y
      i = 0
      while (i < nFeatures) { weights(i) -= lr * g * s(i); i += 1 }
      bias -= lr * g
    }
    buffer.clear()
    isFitted = true
  }

  def recentAccuracy: Double =
    if (recent.isEmpty) 0.0 else recent.count(identity).toDouble / recent.size

  /** |weight| feature importance (reference: online_model.py:283). */
  def featureImportance: Array[Double] = weights.map(math.abs)

  def metrics: Map[String, Any] = Map(
    "predictions_made" -> predictionsMade,
    "is_fitted" -> isFitted,
    "buffer_size" -> buffer.size,
    "recent_accuracy" -> recentAccuracy,
    "model_type" -> "OnlineLogreg(scala)"
  )

  /** Distributed scoring: snapshot the weights/scaler into a pure Column
    * expression (broadcast as literals, codegen'd on executors) — scores a
    * billion rows without collecting anything to the driver. The driver-side
    * `predictProba` path stays for the reference-parity feedback loop; this
    * is the scale path (SURVEY §7.3).
    */
  def scoringColumn(featureCols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(featureCols.size == nFeatures, s"expected $nFeatures feature columns")
    if (!isFitted) {
      // cold-start heuristic, vectorized
      when(featureCols(cartIdx) > 0, 0.7)
        .when(featureCols(viewIdx) > 3, 0.3)
        .otherwise(0.1)
    } else {
      val z = featureCols.zipWithIndex.foldLeft(lit(bias)) { case (acc, (c, i)) =>
        val variance = if (scaleN > 1) m2(i) / (scaleN - 1) else 0.0
        val sd = math.sqrt(variance)
        if (sd > 1e-12) acc + lit(weights(i)) * ((c.cast("double") - lit(this.mean(i))) / lit(sd))
        else acc
      }
      lit(1.0) / (lit(1.0) + exp(-greatest(lit(-35.0), least(lit(35.0), z))))
    }
  }
}
