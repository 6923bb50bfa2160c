package graft.kg

import graft.crf.CrfDecoder

/** The page-local slice of the KG pipeline — decode → alias link (rank-1)
  * → in-sentence relation matching — as plain Scala over one sentence.
  * ONE implementation shared by every non-batch surface (streaming
  * micro-batches via `streaming.StreamingTriples`, request/response via
  * `run.ServeCli /triples`), mirroring the batch DataFrame stages exactly:
  * same alias dictionary and max-struct tie-break order, same sorted pair
  * orientation, same first-match `KgPipeline.relationPatterns`, same
  * `least(conf)`. StreamingTriplesSpec pins this implementation equal to
  * batch `KgPipeline.triples` on 200 generated pages.
  */
object PageLocal {

  case class Linked(start: Int, end: Int, entity: String,
                    entityId: String, score: Double)
  case class LocalTriple(subj: String, pred: String, obj: String, conf: Double)

  type CompiledPatterns = Seq[(KgPipeline.RelationPattern, java.util.regex.Pattern)]

  /** Right-triggers compiled once (per partition / per server). */
  def compilePatterns(
      ps: Seq[KgPipeline.RelationPattern] = KgPipeline.relationPatterns): CompiledPatterns =
    ps.map { p =>
      (p, p.trigger match {
        case Left(_) => null
        case Right(re) => java.util.regex.Pattern.compile(re)
      })
    }

  /** alias surface → candidate (entity_id, prior) list — the KB-scale side
    * that the batch path broadcasts. */
  def aliasIndex: Map[String, Seq[(String, Double)]] =
    Synth.aliasDict.groupBy(_.alias)
      .map { case (a, xs) => a -> xs.map(x => (x.entityId, x.prior)) }

  /** Decode one sentence and link mentions (inner semantics — unlinked
    * mentions drop; rank-1 by the batch max-struct order (score, id)),
    * sorted in the batch pair orientation. */
  def linkSentence(decoder: CrfDecoder, sent: String,
                   alias: Map[String, Seq[(String, Double)]]): Seq[Linked] =
    decoder.process(sent).flatMap { sp =>
      // Locale.ROOT: Spark's lower() is locale-independent; a default-locale
      // toLowerCase diverges on Turkish-locale JVMs (İ/ı) and breaks parity
      val cands = alias.getOrElse(sp.value.toLowerCase(java.util.Locale.ROOT), Nil)
        .filter(_._1.take(3) == sp.entity)
      if (cands.isEmpty) None
      else {
        val (id, prior) = cands.maxBy { case (eid, pr) => (pr * sp.confidence, eid) }
        Some(Linked(sp.start, sp.end, sp.entity, id, prior * sp.confidence))
      }
    }.sortBy(m => (m.start, m.end, m.entity, m.entityId, m.score))

  /** All relation triples of one sentence (first matching pattern wins,
    * conf = min of the pair's link scores). */
  def sentenceTriples(decoder: CrfDecoder, sent: String,
                      alias: Map[String, Seq[(String, Double)]],
                      compiled: CompiledPatterns): Iterator[LocalTriple] = {
    val linked = linkSentence(decoder, sent, alias)
    for {
      i <- linked.indices.iterator
      j <- ((i + 1) until linked.length).iterator
      m1 = linked(i); m2 = linked(j)
      if m1.end < m2.start
      between = sent.substring(m1.end, m2.start)
      hit <- compiled.find { case (p, re) =>
        p.k1 == m1.entity && p.k2 == m2.entity &&
          (if (re == null) between.contains(p.trigger.left.getOrElse(""))
           else re.matcher(between).find())
      }
    } yield LocalTriple(m1.entityId, hit._1.predicate, m2.entityId,
      math.min(m1.score, m2.score))
  }
}
