package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character-trigram language identification (the classic n-gram profile
  * method, Cavnar & Trenkle 1994): score a document by overlap between its
  * trigram set and a per-language top-trigram profile; argmax wins.
  *
  * Profiles are built once from small embedded seed corpora (public-domain
  * pangram/common-phrase snippets) — no external data. The scorer is pure
  * column algebra: `array_intersect` against a literal profile array, fully
  * codegen'd, no UDF. `TextStats.isEnglishHeuristic` stays as the cheaper
  * stopword-based scan filter; this is the higher-precision classifier. */
object LangId {

  private val seedCorpora: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and this is a test of the language " +
      "identification system which should work with common english words and their letters " +
      "that have been written here for the purpose of building a trigram profile of english " +
      "people often say that the morning is the best time of the day because everything is " +
      "quiet and you can think about what you want to do with your life and your work " +
      "she walked through the old town and looked at the houses where many families had " +
      "lived for years while the children played outside near the water under a clear sky " +
      "it was not what they had expected but they knew there would be another chance to " +
      "make things better when the right moment finally came along with some good news"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und dies ist ein test des " +
      "systems zur spracherkennung das mit häufigen deutschen wörtern und ihren buchstaben " +
      "funktionieren sollte die hier geschrieben wurden um ein trigramm profil zu erstellen " +
      "die leute sagen oft dass der morgen die beste zeit des tages ist weil alles ruhig " +
      "ist und man darüber nachdenken kann was man mit seinem leben und seiner arbeit " +
      "machen möchte sie ging durch die alte stadt und schaute auf die häuser in denen " +
      "viele familien seit jahren wohnten während die kinder draußen am wasser spielten " +
      "es war nicht das was sie erwartet hatten aber sie wussten dass es eine weitere " +
      "gelegenheit geben würde alles besser zu machen wenn der richtige augenblick kommt"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux et ceci est un test du " +
      "système d'identification de la langue qui devrait fonctionner avec des mots français " +
      "courants et leurs lettres qui ont été écrits ici pour construire un profil de trigrammes " +
      "les gens disent souvent que le matin est le meilleur moment de la journée parce que " +
      "tout est calme et on peut réfléchir à ce que l'on veut faire de sa vie et de son " +
      "travail elle marchait dans la vieille ville et regardait les maisons où de nombreuses " +
      "familles vivaient depuis des années pendant que les enfants jouaient dehors près de " +
      "l'eau sous un ciel clair ce n'était pas ce qu'ils attendaient mais ils savaient " +
      "qu'il y aurait une autre occasion de faire mieux quand le bon moment arriverait"))

  val ProfileSize = 120

  /** Top-N trigrams per language by frequency (ties broken lexicographically
    * — deterministic). */
  lazy val profiles: Map[String, IndexedSeq[String]] = seedCorpora.map { case (lang, corpus) =>
    val t = s" ${corpus.toLowerCase} ".replaceAll("\\s+", " ")
    val counts = t.sliding(3).foldLeft(Map.empty[String, Int]) { (m, g) =>
      m.updated(g, m.getOrElse(g, 0) + 1)
    }
    lang -> counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(ProfileSize).map(_._1).toIndexedSeq
  }

  /** Distinct trigrams of a text column (lowercased, whitespace-normalized,
    * space-padded like the profiles).
    *
    * Built from the char array zipped with its own 1- and 2-shifted slices:
    * a HOF's ARRAY arguments evaluate once per row, whereas a per-element
    * `substr(i, 3)` lambda re-evaluates the normalized-text expression for
    * every element — O(len²) regex work that benchmarked ~300 ms/row. zip_with
    * null-pads the shorter side, so short tails drop out via the filter. */
  def trigrams(text: Column): Column = {
    val t = concat(lit(" "), regexp_replace(lower(text), "\\s+", " "), lit(" "))
    val c = split(t, "")
    val g = zip_with(
      zip_with(c, slice(c, 2, 1000000), (a, b) => concat(a, b)),
      slice(c, 3, 1000000), (ab, c3) => concat(ab, c3))
    array_distinct(filter(g, x => x.isNotNull && length(x) === 3))
  }

  /** Trigrams unique to each language among the profiled set — shared
    * trigrams (" de", "es ", …) carry no signal and cause cross-language
    * misfires, so scoring uses the discriminative sets. */
  lazy val discriminative: Map[String, IndexedSeq[String]] = profiles.map { case (lang, ps) =>
    val others = profiles.collect { case (l, p) if l != lang => p.toSet }
      .foldLeft(Set.empty[String])(_ ++ _)
    lang -> ps.filterNot(others)
  }

  /** Overlap score in [0,1] against one language's DISCRIMINATIVE profile. */
  def score(text: Column, lang: String): Column = {
    val prof = array(discriminative(lang).map(lit): _*)
    val tg = trigrams(text)
    when(size(tg) === 0, lit(0.0))
      .otherwise(size(array_intersect(tg, prof)).cast("double") / size(tg).cast("double"))
  }

  private def langsSorted: IndexedSeq[String] = profiles.keys.toSeq.sorted.toIndexedSeq

  /** Per-language discriminative-overlap counts in ONE pass over the trigram
    * array (the trigram extraction — the expensive part — is the aggregate's
    * array argument, evaluated once per row; scoring each language with its
    * own `score()` call would re-run it per language). Returns
    * array<int> aligned with `langsSorted`. */
  def overlapCounts(text: Column): Column = {
    val profs = array(langsSorted.map(l => array(discriminative(l).map(lit): _*)): _*)
    aggregate(trigrams(text), array_repeat(lit(0), langsSorted.length),
      (acc, g) => zip_with(acc, profs,
        (a, p) => a + when(array_contains(p, g), 1).otherwise(0)))
  }

  /** Best language among the profiled set (max overlap count; ties break to
    * the lexicographically last language — deterministic). */
  def detect(text: Column): Column = {
    val langsLit = array(langsSorted.map(lit): _*)
    val best = aggregate(
      zip_with(overlapCounts(text), langsLit, (c, l) => struct(c.as("c"), l.as("lang"))),
      struct(lit(-1).as("c"), lit("").as("lang")),
      (acc, x) => when(x.getField("c") >= acc.getField("c"), x).otherwise(acc))
    best.getField("lang")
  }
}
