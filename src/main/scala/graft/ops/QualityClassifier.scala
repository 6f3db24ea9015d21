package graft.ops

import graft.core.Xxh64
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** fastText-style linear text classifier (Joulin et al. 2017, "Bag of
  * Tricks for Efficient Text Classification") — the model family the CCNet
  * pipeline uses for language-ID and quality filtering of web-crawl
  * corpora: hashed unigram+bigram bag, l2-normalized, logistic regression.
  *
  * Training is full-batch gradient descent; each iteration is ONE
  * `treeAggregate` pass over the corpus producing a dense gradient of
  * `dim + 1` longs (~2 MB at the default 2^18 — the classic "model fits on
  * the driver, data never moves" shape: at 100 TB the per-iteration cost
  * is a corpus scan with a tree-reduced fixed-size accumulator, no
  * shuffle, no parameter server).
  *
  * EXACT DETERMINISM: per-document gradient contributions are quantized to
  * integer 2^-32 units and summed as longs — long addition is associative
  * and commutative, so the distributed sum is bit-identical to a
  * sequential loop regardless of partitioning or executor count. The
  * sigmoid uses StrictMath.exp (IEEE-reproducible across JVMs), features
  * are accumulated into index-sorted sparse vectors (fixed dot-product
  * order), and weights update on the driver in plain double arithmetic —
  * so retraining anywhere reproduces the identical model.
  */
object QualityClassifier {

  /** Trained model: `weights(dim)` is the bias term. */
  final case class LinearModel(dim: Int, bigrams: Boolean,
                               weights: Array[Double]) {
    require(weights.length == dim + 1, "weights must be dim + 1 (bias last)")
  }

  private val GradScale = 4294967296.0 // 2^32

  private def tokenize(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("[^a-z]+").filter(_.nonEmpty)

  /** Hashed l2-normalized tf bag of unigrams (+ bigrams): sparse (indices,
    * values) with indices strictly ascending — the fixed accumulation
    * order every dot product depends on for reproducibility. l2 rather
    * than fastText's mean pooling: the unit-norm rows condition full-batch
    * gradient descent so a single moderate learning rate converges, where
    * mean-pooled rows need weights ~100× the logit scale.
    */
  def featurize(text: String, dim: Int,
                bigrams: Boolean): (Array[Int], Array[Double]) = {
    val toks = tokenize(text)
    if (toks.isEmpty) return (Array.empty, Array.empty)
    val counts = new java.util.TreeMap[Int, Int]()
    def add(s: String): Unit = {
      val idx = ((Xxh64.hashString(s) >>> 1) % dim).toInt
      counts.merge(idx, 1, (a, b) => a + b)
    }
    toks.foreach(add)
    if (bigrams && toks.length >= 2) {
      var i = 0
      while (i < toks.length - 1) { add(toks(i) + " " + toks(i + 1)); i += 1 }
    }
    val idxs = new Array[Int](counts.size)
    val vals = new Array[Double](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    var sq = 0.0
    while (it.hasNext) {
      val e = it.next()
      idxs(j) = e.getKey
      vals(j) = e.getValue.toDouble
      sq += vals(j) * vals(j)
      j += 1
    }
    val inv = 1.0 / StrictMath.sqrt(sq)
    j = 0
    while (j < vals.length) { vals(j) *= inv; j += 1 }
    (idxs, vals)
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + StrictMath.exp(-z))

  /** P(label = 1 | text) under the model. */
  def predict(model: LinearModel, text: String): Double = {
    val (idxs, vals) = featurize(text, model.dim, model.bigrams)
    var z = model.weights(model.dim)
    var i = 0
    while (i < idxs.length) { z += model.weights(idxs(i)) * vals(i); i += 1 }
    sigmoid(z)
  }

  /** One document's quantized gradient contribution added into `acc`
    * (length dim + 2: gradient, bias gradient, then quantized loss in the
    * last slot). Shared verbatim by the distributed pass and the
    * sequential oracle twin.
    */
  def accumulate(acc: Array[Long], weights: Array[Double], dim: Int,
                 bigrams: Boolean, text: String, label: Double): Unit = {
    val (idxs, vals) = featurize(text, dim, bigrams)
    var z = weights(dim)
    var i = 0
    while (i < idxs.length) { z += weights(idxs(i)) * vals(i); i += 1 }
    val p = sigmoid(z)
    val err = p - label
    i = 0
    while (i < idxs.length) {
      acc(idxs(i)) += math.floor(err * vals(i) * GradScale).toLong
      i += 1
    }
    acc(dim) += math.floor(err * GradScale).toLong
    // quantized log-loss, clamped away from log(0)
    val eps = 1e-12
    val loss = -(label * StrictMath.log(math.max(p, eps)) +
      (1.0 - label) * StrictMath.log(math.max(1.0 - p, eps)))
    acc(dim + 1) += math.floor(loss * GradScale).toLong
  }

  /** Driver-side weight update from a summed quantized gradient; returns
    * the mean quantized loss for convergence tracking. Shared by the
    * distributed trainer and the sequential twin.
    */
  def applyUpdate(weights: Array[Double], acc: Array[Long], n: Long,
                  lr: Double): Double = {
    val dim = weights.length - 1
    var j = 0
    while (j <= dim) {
      weights(j) -= lr * ((acc(j).toDouble / GradScale) / n.toDouble)
      j += 1
    }
    (acc(dim + 1).toDouble / GradScale) / n.toDouble
  }

  /** Train on (textCol, labelCol ∈ {0.0, 1.0}). Linearly-decayed learning
    * rate as fastText; weights start at zero (no RNG anywhere).
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
            dim: Int = 1 << 18, bigrams: Boolean = true,
            iters: Int = 30, lr: Double = 50.0): LinearModel = {
    val rows = df.select(col(textCol).cast("string"),
        col(labelCol).cast("double"))
      .na.drop()
      // the corpus is scanned once per iteration: pin the (text, label)
      // projection so iteration 2..n read shuffle-free cached blocks
      .localCheckpoint(true)
    val n = rows.count()
    require(n > 0, "empty training set")
    val sc = df.sparkSession.sparkContext
    val weights = new Array[Double](dim + 1)
    var t = 0
    while (t < iters) {
      val bw = sc.broadcast(weights.clone())
      val acc = rows.rdd.treeAggregate(new Array[Long](dim + 2))(
        seqOp = (a, r: Row) => {
          accumulate(a, bw.value, dim, bigrams, r.getString(0), r.getDouble(1)); a
        },
        combOp = (a, b) => { var j = 0; while (j < a.length) { a(j) += b(j); j += 1 }; a })
      bw.destroy()
      applyUpdate(weights, acc, n, lr * (1.0 - t.toDouble / iters.toDouble))
      t += 1
    }
    LinearModel(dim, bigrams, weights)
  }

  /** Score every row: (idCol, prob). The model ships once as a broadcast,
    * scoring is an embarrassingly-parallel scan.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: LinearModel): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val f = udf((t: String) => predict(bc.value, t))
    df.select(col(idCol), f(col(textCol)).as("prob"))
  }
}
