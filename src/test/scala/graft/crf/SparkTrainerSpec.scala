package graft.crf

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.kg.PagesGen

/** Distributed trainer: treeAggregate gradient must train a model of the same
  * quality as the driver-local trainer on the same corpus. */
class SparkTrainerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("SparkTrainer model matches local trainer quality (P/R = 1.0 on train set)") {
    import spark.implicits._
    val examples = PagesGen.trainingExamples(42L, 200)
    val cfg = graft.kg.KgPipeline.pipelineConfig
    val distModel = SparkTrainer.train(spark.createDataset(examples), cfg)
    val rep = EvalReport.evalExamples(distModel, examples)
    assert(rep.microF1 === 1.0, rep.formatted)
    // same feature space as the local trainer (same attrs observed)
    val localModel = Trainer.trainExamples(examples, cfg)
    assert(distModel.stateW.keySet === localModel.stateW.keySet)
    assert(distModel.labels.toSet === localModel.labels.toSet)
  }
}
