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

  /** When set, [[flush]] snapshots the model here every `snapshotEvery`
    * predictions (the reference pickles model+scaler+counters every ~1000
    * predictions, online_model.py:87-116,230-233 — its `% 1000 == 0` check
    * only fires on exact multiples; we track the last-saved watermark so no
    * crossing is missed). The mini-batch buffer and accuracy window are
    * deliberately not persisted, matching the reference's pickle payload.
    */
  var snapshotPath: Option[String] = None
  var snapshotEvery: Long = 1000L
  private var lastSnapshotAt: Long = 0L

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
    snapshotPath.foreach { p =>
      if (predictionsMade - lastSnapshotAt >= snapshotEvery) {
        save(p)
        lastSnapshotAt = predictionsMade
      }
    }
  }

  /** Persist weights + scaler + counters as key=value text (doubles via
    * Double.toString — exact round-trip). Written atomically (temp + move)
    * so a reader never sees a torn snapshot.
    */
  def save(path: String): Unit = {
    val sb = new StringBuilder
    sb ++= "version=1\n"
    sb ++= s"nFeatures=$nFeatures\nlr=$lr\nminiBatch=$miniBatch\naccWindow=$accWindow\n"
    sb ++= s"viewIdx=$viewIdx\ncartIdx=$cartIdx\n"
    sb ++= s"bias=$bias\nisFitted=$isFitted\n"
    sb ++= s"predictionsMade=$predictionsMade\nsamplesSeen=$samplesSeen\nscaleN=$scaleN\n"
    sb ++= s"weights=${weights.mkString(",")}\n"
    sb ++= s"mean=${mean.mkString(",")}\n"
    sb ++= s"m2=${m2.mkString(",")}\n"
    val target = java.nio.file.Paths.get(path)
    Option(target.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.write(tmp, sb.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
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

object OnlineLogreg {

  /** Restore a model saved by [[OnlineLogreg.save]]: hyperparameters come
    * from the snapshot, learned state (weights, scaler, counters) resumes
    * exactly — a restarted streaming job predicts identically to the one
    * that wrote the snapshot (reference `_load_model`,
    * online_model.py:87-101).
    */
  def load(path: String): OnlineLogreg = {
    val kv = scala.io.Source.fromFile(path, "UTF-8").getLines()
      .filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
      }.toMap
    require(kv.get("version").contains("1"), s"unknown OnlineLogreg snapshot version in $path")
    def longs(k: String) = kv(k).toLong
    def arr(k: String): Array[Double] =
      if (kv(k).isEmpty) Array.empty else kv(k).split(",").map(_.toDouble)
    val m = new OnlineLogreg(
      nFeatures = kv("nFeatures").toInt, lr = kv("lr").toDouble,
      miniBatch = kv("miniBatch").toInt, accWindow = kv("accWindow").toInt,
      viewIdx = kv("viewIdx").toInt, cartIdx = kv("cartIdx").toInt)
    arr("weights").copyToArray(m.weights)
    arr("mean").copyToArray(m.mean)
    arr("m2").copyToArray(m.m2)
    m.bias = kv("bias").toDouble
    m.isFitted = kv("isFitted").toBoolean
    m.predictionsMade = longs("predictionsMade")
    m.samplesSeen = longs("samplesSeen")
    m.scaleN = longs("scaleN")
    m.lastSnapshotAt = m.predictionsMade
    m
  }

  /** Load the snapshot if one exists (the reference's constructor-time
    * `_load_model`), else a fresh model; either way future flushes snapshot
    * back to `path`.
    */
  def loadOrNew(path: String, nFeatures: Int, lr: Double = 0.01,
      miniBatch: Int = 100): OnlineLogreg = {
    val m =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) load(path)
      else new OnlineLogreg(nFeatures, lr = lr, miniBatch = miniBatch)
    m.snapshotPath = Some(path)
    m
  }
}
