package graft.crf

import org.apache.spark.sql.{Dataset, SparkSession}
import breeze.linalg.DenseVector
import breeze.optimize.{DiffFunction, LBFGS, OWLQN}

/** Distributed CRF training: feature extraction as a Dataset map, L-BFGS /
  * OWL-QN on the driver with the loss/gradient computed by `treeAggregate`
  * over executor-resident encoded sentences — the MLlib pattern
  * (weights broadcast per iteration, gradients combined up a tree).
  *
  * The reference trains single-process (libcrfsuite). Curated corpora fit on
  * the driver (use `Trainer.train`); this path exists for corpus-scale
  * training where examples live in a Dataset — gradient cost dominates and
  * scales with executors, while the optimizer state (one weight vector)
  * stays on the driver.
  */
object SparkTrainer {

  def train(examples: Dataset[Example], config: CrfConfig, bilou: Boolean = true): CrfModel = {
    val spark = examples.sparkSession
    import spark.implicits._

    // 1. distributed featurization → (attrs per token, tags)
    val featurized: Dataset[(Array[Array[String]], Array[Array[Double]], Array[String])] =
      examples.map { ex =>
        val crfToks = Featurizer.goldExampleToCrfTokens(ex, bilou)
        val feats = Featurizer.sentenceFeatures(crfToks, config.features)
        (feats.map(_.map(_.attr)).toArray, feats.map(_.map(_.weight)).toArray,
          crfToks.map(_.entity).toArray)
      }.filter(_._3.nonEmpty)
    featurized.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 2. dictionaries: labels (first appearance by sentence order — collect
    //    keys only, not features) and attr→id, observed (attr,label) pairs
    val labelSeq = featurized.flatMap(_._3).distinct().collect().sorted.toIndexedSeq
    val lIdx = labelSeq.zipWithIndex.toMap
    val observedPairs = featurized.flatMap { case (attrs, _, tags) =>
      attrs.iterator.zip(tags.iterator).flatMap { case (as, t) => as.iterator.map(a => (a, t)) }
    }.distinct().collect()
    val attrSeq = observedPairs.map(_._1).distinct.sorted.toIndexedSeq
    val aIdx = attrSeq.zipWithIndex.toMap
    val L = labelSeq.length
    val observed = Array.fill(attrSeq.length)(new Array[Boolean](L))
    observedPairs.foreach { case (a, t) => observed(aIdx(a))(lIdx(t)) = true }
    var pCount = 0
    val attrParam = observed.map(_.map { o => if (o) { val i = pCount; pCount += 1; i } else -1 })
    val idx = new Trainer.FeatureIndex(labelSeq, attrSeq, attrParam, pCount)
    val n = idx.numParams

    // 3. encode sentences against the dictionaries, keep distributed
    val bcIdx = spark.sparkContext.broadcast(idx)
    val encoded: Dataset[Trainer.EncSent] = featurized.map { case (attrs, ws, tags) =>
      val ix = bcIdx.value
      val ids = attrs.map(_.flatMap(ix.attrIdx.get))
      val weights = attrs.zip(ws).map { case (as, vs) =>
        as.iterator.zip(vs.iterator).collect { case (a, v) if ix.attrIdx.contains(a) => v }.toArray
      }
      Trainer.EncSent(ids, weights, tags.map(ix.labelIdx))
    }
    encoded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    encoded.count() // materialize before the iteration loop
    featurized.unpersist()

    // 4. optimizer on driver; loss+gradient via treeAggregate per iteration
    val encRdd = encoded.rdd
    val f = new DiffFunction[DenseVector[Double]] {
      def calculate(wv: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val bcW = spark.sparkContext.broadcast(wv.data)
        // locals only — the closures must not capture this DiffFunction
        // (it holds the non-serializable SparkSession)
        val localIdx = bcIdx
        val localW = bcW
        val nn = n
        val seqOp = (acc: (Double, Array[Double]), s: Trainer.EncSent) =>
          (acc._1 + Trainer.sentenceNllGradPublic(localIdx.value, localW.value, s, acc._2), acc._2)
        val combOp = (a: (Double, Array[Double]), b: (Double, Array[Double])) => {
          var i = 0
          while (i < nn) { a._2(i) += b._2(i); i += 1 }
          (a._1 + b._1, a._2)
        }
        val (loss, grad) = encRdd.treeAggregate((0.0, new Array[Double](n)))(seqOp, combOp, depth = 2)
        bcW.destroy()
        var totLoss = loss
        if (config.c2 > 0) {
          val w = wv.data
          var i = 0
          while (i < n) { totLoss += config.c2 * w(i) * w(i); grad(i) += 2 * config.c2 * w(i); i += 1 }
        }
        (totLoss, DenseVector(grad))
      }
    }
    val init = DenseVector.zeros[Double](n)
    val wOpt =
      if (config.c1 > 0) new OWLQN[Int, DenseVector[Double]](config.maxIter, 6, config.c1, 1e-8).minimize(f, init)
      else new LBFGS[DenseVector[Double]](config.maxIter, 6, 1e-8).minimize(f, init)
    encoded.unpersist()

    val w = wOpt.data
    val stateW = attrSeq.indices.iterator.map { a =>
      val arr = new Array[Double](L)
      var y = 0
      while (y < L) { val p = attrParam(a)(y); if (p >= 0) arr(y) = w(p); y += 1 }
      attrSeq(a) -> arr
    }.toMap
    val transW = Array.tabulate(L, L)((i, j) => w(idx.numStateParams + i * L + j))
    CrfModel(labelSeq, stateW, transW, config)
  }
}
