package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.crf.CrfModel
import graft.kg.{KgPipeline, Page, Synth}

/** Streaming KG triple construction — the full extract→link→relate chain on
  * an unbounded page stream.
  *
  * The key structural observation: everything up to the cross-document
  * rollup is PAGE-LOCAL (sentence split, CRF decode, alias linking, the
  * rank-1 link choice, in-sentence pair/relation matching never look
  * outside one page), so the whole chain runs as ONE stateless
  * `mapPartitions` inside each micro-batch — zero shuffles, no state
  * store, unbounded throughput. Only the corpus-wide (subj, pred, obj)
  * aggregation is stateful, and that is a standard watermarked windowed
  * aggregation with eviction.
  *
  * The per-page Scala logic mirrors the batch stages exactly (same decoder,
  * same alias dictionary and rank-1 tie-break struct order, same sorted
  * pair orientation, same first-match relation patterns from the SHARED
  * `KgPipeline.relationPatterns` table, same `least(conf)`); the
  * StreamingTriplesSpec parity gate holds stream output equal to batch
  * `KgPipeline.triples` on the same pages.
  */
object StreamingTriples {

  case class RawTriple(subj: String, pred: String, obj: String, url: String,
                       conf: Double, warc_ts: Timestamp)

  private case class Linked(start: Int, end: Int, entity: String,
                            entityId: String, score: Double)

  /** Stateless pages → raw triples (one row per matched in-sentence pair). */
  def rawTripleStream(pages: Dataset[Page], model: CrfModel): Dataset[RawTriple] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bcModel = spark.sparkContext.broadcast(model)
    // alias surface → candidate (entity_id, prior) list; KB-scale broadcast
    val bcAlias = spark.sparkContext.broadcast(
      Synth.aliasDict.groupBy(_.alias)
        .map { case (a, xs) => a -> xs.map(x => (x.entityId, x.prior)) })
    val patterns = KgPipeline.relationPatterns

    pages.filter(_.lang == "en").mapPartitions { iter =>
      val decoder = new graft.crf.CrfDecoder(bcModel.value)
      val alias = bcAlias.value
      // Right-triggers compiled once per partition
      val compiled = patterns.map { p =>
        (p, p.trigger match {
          case Left(phrase) => null
          case Right(re) => java.util.regex.Pattern.compile(re)
        })
      }
      iter.flatMap { page =>
        page.text.split('\n').iterator.flatMap { sent =>
          // decode + link (inner semantics: unlinked mentions drop; rank-1
          // by the batch max-struct order (score, entity_id))
          val linked = decoder.process(sent).flatMap { sp =>
            val cands = alias.getOrElse(sp.value.toLowerCase, Nil)
              .filter(_._1.take(3) == sp.entity)
            if (cands.isEmpty) None
            else {
              val (id, prior) = cands.maxBy { case (eid, pr) => (pr * sp.confidence, eid) }
              Some(Linked(sp.start, sp.end, sp.entity, id, prior * sp.confidence))
            }
          // batch pair orientation: sort_array over struct(start, end,
          // entity, entity_id, score) — mirror the lexicographic order
          }.sortBy(m => (m.start, m.end, m.entity, m.entityId, m.score))
          for {
            i <- linked.indices.iterator
            j <- (i + 1) until linked.length
            m1 = linked(i); m2 = linked(j)
            if m1.end < m2.start
            between = sent.substring(m1.end, m2.start)
            hit <- compiled.find { case (p, re) =>
              p.k1 == m1.entity && p.k2 == m2.entity &&
                (if (re == null) between.contains(p.trigger.left.getOrElse(""))
                 else re.matcher(between).find())
            }
          } yield RawTriple(m1.entityId, hit._1.predicate, m2.entityId,
            page.url, math.min(m1.score, m2.score), page.warc_ts)
        }
      }
    }
  }

  /** Stateful corpus rollup: per event-time window, (subj, pred, obj) →
    * occurrence count + max confidence, watermark-evicted state. */
  def windowedTripleRollup(raw: Dataset[RawTriple],
                           windowLen: String = "10 minutes",
                           watermark: String = "30 minutes"): DataFrame =
    raw.withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowLen),
        col("subj"), col("pred"), col("obj"))
      .agg(count(lit(1)).as("n_sources"), max(col("conf")).as("conf"))
}
