package graft.io

import com.fasterxml.jackson.databind.ObjectMapper
import graft.crf.{Example, Span}
import scala.jdk.CollectionConverters._

/** Gold-standard JSON example reader — reference `read_file` JSON branch
  * (`/root/reference/spacy_crfsuite/utils.py:41-47`): a list (or JSONL) of
  * `{"text": str, "entities": [{"start", "end", "value", "entity"}]}`. */
object JsonExamples {
  private val mapper = new ObjectMapper()

  def readFile(path: String): IndexedSeq[Example] = {
    val content = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    if (path.toLowerCase.endsWith(".jsonl"))
      content.linesIterator.filter(_.trim.nonEmpty).map(parseOne).toIndexedSeq
    else
      mapper.readTree(content).elements().asScala.map(fromNode).toIndexedSeq
  }

  def parseOne(json: String): Example = fromNode(mapper.readTree(json))

  private def fromNode(n: com.fasterxml.jackson.databind.JsonNode): Example = {
    val text = n.get("text").asText()
    val entities = Option(n.get("entities")).map(_.elements().asScala.map { e =>
      Span(e.get("start").asInt(), e.get("end").asInt(),
        Option(e.get("value")).map(_.asText()).getOrElse(""),
        e.get("entity").asText(), 1.0)
    }.toIndexedSeq).getOrElse(IndexedSeq.empty)
    Example(text, IndexedSeq.empty, entities)
  }
}

/** Component-config JSON parser — reference config files like
  * `/root/reference/examples/default-config.json` merged over defaults
  * (`utils.py:8-23`, `crf_extractor.py:86-94`). Keys: `features` (window
  * slots), `c1`, `c2`, `max_iter`, `BILOU_flag`, `algorithm`,
  * `all_possible_transitions`, `min_freq`. */
object ConfigJson {
  def parse(json: String): graft.crf.CrfConfig = {
    val n = new ObjectMapper().readTree(json)
    var cfg = graft.crf.CrfConfig()
    if (n.has("features"))
      cfg = cfg.copy(features = n.get("features").elements().asScala
        .map(_.elements().asScala.map(_.asText()).toIndexedSeq).toIndexedSeq)
    if (n.has("c1")) cfg = cfg.copy(c1 = n.get("c1").asDouble())
    if (n.has("c2")) cfg = cfg.copy(c2 = n.get("c2").asDouble())
    if (n.has("max_iter")) cfg = cfg.copy(maxIter = n.get("max_iter").asInt())
    if (n.has("BILOU_flag")) cfg = cfg.copy(bilou = n.get("BILOU_flag").asBoolean())
    if (n.has("algorithm")) cfg = cfg.copy(algorithm = n.get("algorithm").asText())
    if (n.has("all_possible_transitions"))
      cfg = cfg.copy(allPossibleTransitions = n.get("all_possible_transitions").asBoolean())
    if (n.has("all_possible_states"))
      cfg = cfg.copy(allPossibleStates = n.get("all_possible_states").asBoolean())
    if (n.has("min_freq")) cfg = cfg.copy(minFreq = n.get("min_freq").asDouble())
    if (n.has("use_dense_features"))
      cfg = cfg.copy(useDenseFeatures = n.get("use_dense_features").asBoolean())
    if (n.has("dense_features_cls_pooling"))
      cfg = cfg.copy(denseFeaturesClsPooling = n.get("dense_features_cls_pooling").asText())
    cfg
  }
}
