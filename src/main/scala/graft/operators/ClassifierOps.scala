package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.unsafe.types.UTF8String

/** Trainable text-quality classifier — the learned filtering stage
  * of a web-scale corpus pipeline (the GPT-3/LLaMA recipe: logistic
  * regression over hashed bag-of-words features, positives = a
  * high-quality reference corpus, then keep/downsample by predicted
  * quality). No ML library: features are hashed token presences
  * (the same single-pass tokenize+hash kernel the dedup family
  * uses), training is full-batch gradient descent where each pass
  * is ONE `treeAggregate` of dense gradient partials (the classic
  * data-parallel shape: executors each reduce their partitions to a
  * dim-sized vector, a tree combine sums them — no shuffle of row
  * data, driver holds only the weight vector), and scoring is a
  * zero-shuffle codegen'd Expression with the weights riding into
  * generated code as a reference object.
  *
  * Feature map: distinct token hash indices, L2-normalized binary
  * bag (value 1/√k for k distinct tokens) + a bias term. Train and
  * score share the same static kernel, so there is no
  * featurization skew between the two paths.
  *
  * Driver memory is bounded by `dim` (2²⁰ doubles = 8 MB), never by
  * the corpus; per-pass cost is linear in the data. At 100 TB you
  * would subsample the training set first (classifier fitting needs
  * ~10⁵-10⁷ rows, not the corpus) — `temperatureSample` or
  * `SplitOps` provide the deterministic sample.
  */
object ClassifierOps {

  private val HashSeed = 29L

  /** distinct feature indices of a text: xxh64 token hashes folded
    * into [0, dim), sorted. Public: invoked from generated code.
    */
  def featurizeKernel(text: UTF8String, dim: Int): Array[Int] = {
    val hashes = graft.functions.HashExpressions.tokenHashKernel(text, HashSeed)
    if (hashes.isEmpty) return Array.emptyIntArray
    // primitive sort + in-place dedup — this runs per row in the
    // scoring hot path; no boxed TreeSet
    val idxs = new Array[Int](hashes.length)
    var i = 0
    while (i < hashes.length) {
      idxs(i) = ((hashes(i) % dim + dim) % dim).toInt
      i += 1
    }
    java.util.Arrays.sort(idxs)
    var w = 0
    i = 0
    while (i < idxs.length) {
      if (i == 0 || idxs(i) != idxs(i - 1)) { idxs(w) = idxs(i); w += 1 }
      i += 1
    }
    if (w == idxs.length) idxs else java.util.Arrays.copyOf(idxs, w)
  }

  /** σ(w·φ + b) over pre-extracted indices — the ONE implementation
    * both the scoring expression and the training gradient use, so
    * the two paths cannot drift.
    */
  private def sigmoidDot(idx: Array[Int], weights: Array[Double], dim: Int): Double = {
    var dot = weights(dim)
    if (idx.nonEmpty) {
      val v = 1.0 / math.sqrt(idx.length.toDouble)
      var i = 0
      while (i < idx.length) { dot += weights(idx(i)) * v; i += 1 }
    }
    1.0 / (1.0 + math.exp(-dot))
  }

  /** σ(w·φ(text) + b); weights has length dim+1, bias last. Public:
    * invoked from generated code.
    */
  def scoreKernel(text: UTF8String, weights: Array[Double], dim: Int): Double =
    sigmoidDot(featurizeKernel(text, dim), weights, dim)

  /** predicted quality in (0,1) as a Catalyst expression. */
  case class TextLrScore(child: Expression, weights: Array[Double], dim: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    // return type inferred: AbstractDataType is private[sql]
    override def inputTypes = Seq(StringType)
    require(weights.length == dim + 1, s"weights must have dim+1 entries, got ${weights.length} for dim $dim")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "text_lr_score"
    override protected def withNewChildInternal(newChild: Expression): TextLrScore = copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      scoreKernel(input.asInstanceOf[UTF8String], weights, dim)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftLrWeights", weights, "double[]")
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.operators.ClassifierOps.scoreKernel($t, $ref, $dim);")
    }
  }

  def score(c: Column, weights: Array[Double], dim: Int = 1 << 18): Column =
    ColumnBridge.column(TextLrScore(ColumnBridge.expression(c), weights, dim))

  /** Fit the classifier: rows with non-null text and a 0/1 label.
    * Returns the dim+1 weight vector (bias last) for [[score]].
    *
    * Full-batch GD with an optional L2 penalty; deterministic up to
    * float summation order in the tree combine (planted-margin
    * decisions are stable — only scores within ~1e-12 of the 0.5
    * boundary could flip across layouts).
    */
  def trainTextClassifier(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      dim: Int = 1 << 18,
      epochs: Int = 30,
      lr: Double = 2.0,
      reg: Double = 0.0
  ): Array[Double] = {
    require(dim > 0 && epochs > 0 && lr > 0, "dim, epochs, lr must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // featurize ONCE, keep the compact (indices, label) pairs across passes
    val data = df
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
      .select(col(textCol).cast("string"), col(labelCol).cast("double"))
      .as[(String, Double)]
      .map { case (t, y) => (featurizeKernel(UTF8String.fromString(t), dim), y) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = data.count()
    require(n > 0, "no labeled rows to train on")

    val w = new Array[Double](dim + 1)
    var epoch = 0
    while (epoch < epochs) {
      val bcW = spark.sparkContext.broadcast(w.clone())
      val grad = data.rdd.treeAggregate(new Array[Double](dim + 1))(
        seqOp = (g, row) => {
          val (idx, y) = row
          val err = sigmoidDot(idx, bcW.value, dim) - y
          val v = if (idx.isEmpty) 0.0 else 1.0 / math.sqrt(idx.length.toDouble)
          var i = 0
          while (i < idx.length) { g(idx(i)) += err * v; i += 1 }
          g(dim) += err
          g
        },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        },
        depth = 2)
      var i = 0
      while (i <= dim) {
        w(i) -= lr * (grad(i) / n + reg * w(i))
        i += 1
      }
      bcW.destroy()
      epoch += 1
    }
    data.unpersist()
    w
  }
}
