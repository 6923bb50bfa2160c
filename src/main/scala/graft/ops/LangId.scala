package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character-trigram language identification (the n-gram profile family,
  * Cavnar & Trenkle 1994): score a document by idf-weighted overlap between
  * its distinct-trigram set and each language's top-trigram profile — a
  * trigram shared by k of the L profiles contributes (L−k)/(L−1), so
  * language-unique trigrams dominate and pan-European ones carry nothing;
  * argmax wins.
  *
  * Profiles are built once from small embedded seed corpora (original
  * common-phrase snippets) — no external data. The per-row scorer is the
  * native [[graft.plans.LangScoresExpression]] Catalyst kernel: one
  * substring loop + one hash probe per distinct trigram (the previous
  * higher-order-function formulation pushed a 64+-element char array through
  * three interpreted lambda layers per row). `TextStats.isEnglishHeuristic`
  * stays as the cheaper stopword-based scan filter; this is the
  * higher-precision classifier. */
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
      "make things better when the right moment finally came along with some good news " +
      "the old man sat by the window and read his newspaper every evening after dinner while " +
      "the cat slept on the warm chair beside him the train to the city leaves early in the " +
      "morning so we should buy our tickets tonight and pack the bags before going to sleep " +
      "there were many people at the market buying fresh bread fruit and vegetables for the " +
      "weekend"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und dies ist ein test des " +
      "systems zur spracherkennung das mit häufigen deutschen wörtern und ihren buchstaben " +
      "funktionieren sollte die hier geschrieben wurden um ein trigramm profil zu erstellen " +
      "die leute sagen oft dass der morgen die beste zeit des tages ist weil alles ruhig " +
      "ist und man darüber nachdenken kann was man mit seinem leben und seiner arbeit " +
      "machen möchte sie ging durch die alte stadt und schaute auf die häuser in denen " +
      "viele familien seit jahren wohnten während die kinder draußen am wasser spielten " +
      "es war nicht das was sie erwartet hatten aber sie wussten dass es eine weitere " +
      "gelegenheit geben würde alles besser zu machen wenn der richtige augenblick kommt " +
      "der alte mann saß am fenster und las jeden abend nach dem essen seine zeitung während " +
      "die katze auf dem warmen stuhl neben ihm schlief der zug in die stadt fährt früh am " +
      "morgen deshalb sollten wir unsere fahrkarten heute abend kaufen und die taschen packen " +
      "bevor wir schlafen gehen auf dem markt waren viele menschen die frisches brot obst und " +
      "gemüse für das wochenende kauften"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux et ceci est un test du " +
      "système d'identification de la langue qui devrait fonctionner avec des mots français " +
      "courants et leurs lettres qui ont été écrits ici pour construire un profil de trigrammes " +
      "les gens disent souvent que le matin est le meilleur moment de la journée parce que " +
      "tout est calme et on peut réfléchir à ce que l'on veut faire de sa vie et de son " +
      "travail elle marchait dans la vieille ville et regardait les maisons où de nombreuses " +
      "familles vivaient depuis des années pendant que les enfants jouaient dehors près de " +
      "l'eau sous un ciel clair ce n'était pas ce qu'ils attendaient mais ils savaient " +
      "qu'il y aurait une autre occasion de faire mieux quand le bon moment arriverait " +
      "le vieil homme était assis près de la fenêtre et lisait son journal chaque soir après le " +
      "dîner pendant que le chat dormait sur la chaise chaude à côté de lui le train pour la " +
      "ville part tôt le matin donc nous devrions acheter nos billets ce soir et préparer les " +
      "valises avant d'aller dormir il y avait beaucoup de monde au marché qui achetait du pain " +
      "frais des fruits et des légumes pour le week-end"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y esto es una prueba del " +
      "sistema de identificación de idiomas que debería funcionar con palabras españolas " +
      "comunes y sus letras que han sido escritas aquí para construir un perfil de trigramas " +
      "la gente dice a menudo que la mañana es el mejor momento del día porque todo está " +
      "tranquilo y uno puede pensar en lo que quiere hacer con su vida y su trabajo " +
      "ella caminaba por la ciudad vieja y miraba las casas donde muchas familias habían " +
      "vivido durante años mientras los niños jugaban afuera cerca del agua bajo un cielo " +
      "despejado no era lo que esperaban pero sabían que habría otra oportunidad para " +
      "mejorar las cosas cuando llegara el momento adecuado con algunas buenas noticias " +
      "el viejo hombre estaba sentado junto a la ventana y leía su periódico cada noche después " +
      "de la cena mientras el gato dormía en la silla caliente a su lado el tren hacia la " +
      "ciudad sale temprano por la mañana así que deberíamos comprar nuestros billetes esta " +
      "noche y preparar las maletas antes de ir a dormir había mucha gente en el mercado " +
      "comprando pan fresco frutas y verduras para el fin de semana"),
    "it" -> ("la veloce volpe marrone salta sopra il cane pigro e questo è un test del sistema " +
      "di identificazione della lingua che dovrebbe funzionare con parole italiane comuni " +
      "e le loro lettere che sono state scritte qui per costruire un profilo di trigrammi " +
      "la gente dice spesso che la mattina è il momento migliore della giornata perché " +
      "tutto è tranquillo e si può pensare a quello che si vuole fare della propria vita " +
      "e del proprio lavoro lei camminava per la città vecchia e guardava le case dove " +
      "molte famiglie avevano vissuto per anni mentre i bambini giocavano fuori vicino " +
      "all'acqua sotto un cielo sereno non era quello che si aspettavano ma sapevano che " +
      "ci sarebbe stata un'altra occasione per migliorare le cose al momento giusto " +
      "il vecchio uomo era seduto vicino alla finestra e leggeva il suo giornale ogni sera dopo " +
      "cena mentre il gatto dormiva sulla sedia calda accanto a lui il treno per la città parte " +
      "presto la mattina quindi dovremmo comprare i nostri biglietti stasera e preparare le " +
      "valigie prima di andare a dormire c'era molta gente al mercato che comprava pane fresco " +
      "frutta e verdura per il fine settimana"),
    "pt" -> ("a rápida raposa marrom salta sobre o cão preguiçoso e isto é um teste do sistema " +
      "de identificação de línguas que deveria funcionar com palavras portuguesas comuns " +
      "e as suas letras que foram escritas aqui para construir um perfil de trigramas " +
      "as pessoas dizem muitas vezes que a manhã é a melhor hora do dia porque tudo está " +
      "calmo e pode pensar no que quer fazer com a sua vida e o seu trabalho " +
      "ela caminhava pela cidade velha e olhava para as casas onde muitas famílias tinham " +
      "vivido durante anos enquanto as crianças brincavam lá fora perto da água sob um " +
      "céu limpo não era o que esperavam mas sabiam que haveria outra oportunidade para " +
      "melhorar as coisas quando chegasse o momento certo com algumas boas notícias " +
      "o velho homem estava sentado junto à janela e lia o seu jornal todas as noites depois do " +
      "jantar enquanto o gato dormia na cadeira quente ao seu lado o comboio para a cidade " +
      "parte cedo de manhã por isso devíamos comprar os nossos bilhetes esta noite e preparar " +
      "as malas antes de ir dormir havia muita gente no mercado a comprar pão fresco fruta e " +
      "legumes para o fim de semana"),
    "nl" -> ("de snelle bruine vos springt over de luie hond en dit is een test van het " +
      "systeem voor taalherkenning dat zou moeten werken met veelvoorkomende nederlandse " +
      "woorden en hun letters die hier zijn geschreven om een trigram profiel op te bouwen " +
      "mensen zeggen vaak dat de ochtend de beste tijd van de dag is omdat alles rustig " +
      "is en je kunt nadenken over wat je met je leven en je werk wilt doen " +
      "zij liep door de oude stad en keek naar de huizen waar veel gezinnen jarenlang " +
      "hadden gewoond terwijl de kinderen buiten speelden bij het water onder een heldere " +
      "hemel het was niet wat ze hadden verwacht maar ze wisten dat er nog een kans zou " +
      "komen om dingen beter te maken als het juiste moment eindelijk kwam " +
      "de oude man zat bij het raam en las elke avond na het eten zijn krant terwijl de kat op " +
      "de warme stoel naast hem sliep de trein naar de stad vertrekt vroeg in de ochtend dus we " +
      "zouden onze kaartjes vanavond moeten kopen en de tassen inpakken voordat we gaan slapen " +
      "er waren veel mensen op de markt die vers brood fruit en groenten voor het weekend " +
      "kochten"))

  val ProfileSize = 400

  /** Top-N trigrams per language by frequency (ties broken lexicographically
    * — deterministic). */
  lazy val profiles: Map[String, IndexedSeq[String]] = seedCorpora.map { case (lang, corpus) =>
    val t = s" ${corpus.toLowerCase} ".replaceAll("\\s+", " ")
    val counts = t.sliding(3).foldLeft(Map.empty[String, Int]) { (m, g) =>
      m.updated(g, m.getOrElse(g, 0) + 1)
    }
    lang -> counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(ProfileSize).map(_._1).toIndexedSeq
  }

  private[graft] def langsSorted: IndexedSeq[String] = profiles.keys.toSeq.sorted.toIndexedSeq

  /** struct<lang, scores, n_trigrams> from the native kernel — one pass/row,
    * idf weighting over the FULL profiles (the kernel derives per-trigram
    * weights from how many profiles share it). */
  def langScores(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.LangScoresExpression(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        langsSorted, langsSorted.map(profiles(_))))

  /** Normalized idf-weighted overlap in [0,1] against one language's profile:
    * integer-weighted overlap / ((L−1) · distinct trigram count). Exact-
    * integer numerator and one final division make the value reproducible by
    * the DuckDB oracle bit-for-bit. */
  def score(text: Column, lang: String): Column = {
    val idx = langsSorted.indexOf(lang)
    require(idx >= 0, s"no profile for language '$lang' (have ${langsSorted.mkString(",")})")
    val s = langScores(text)
    val n = s.getField("n_trigrams")
    when(n === 0, lit(0.0))
      .otherwise(element_at(s.getField("scores"), idx + 1) /
        (n * (langsSorted.length - 1)).cast("double"))
  }

  /** DuckDB SQL reproducing `detect` + `score(_, lang)` over a `documents`
    * view — generated from the same profiles (integer weights L−df), used as
    * the driver oracle for q26. Ties in the argmax break to the
    * lexicographically LAST language, like the kernel. */
  def oracleSql(scoreLang: String): String = {
    val L = langsSorted.length
    val df = scala.collection.mutable.Map.empty[String, Int]
    for (l <- langsSorted; g <- profiles(l)) df(g) = df.getOrElse(g, 0) + 1
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val rows = for (l <- langsSorted; g <- profiles(l))
      yield s"(${q(l)}, ${q(g)}, ${L - df(g)})"
    s"""WITH w(lang, g, wt) AS (VALUES ${rows.mkString(", ")}),
        t AS (SELECT doc_id, ' ' || regexp_replace(lower(text), '\\s+', ' ', 'g') || ' ' AS t
              FROM documents),
        tg AS (SELECT doc_id, list_distinct([t[i:i+2] for i in range(1, length(t) - 1)]) AS gs
               FROM t),
        d AS (SELECT doc_id, len(gs) AS n, unnest(gs) AS g FROM tg),
        sc AS (SELECT doc_id, lang, CAST(sum(wt) AS BIGINT) AS s
               FROM d JOIN w ON d.g = w.g GROUP BY 1, 2),
        allsc AS (SELECT tg.doc_id, tg.gs, langs.lang, coalesce(sc.s, 0) AS s
                 FROM tg CROSS JOIN (SELECT unnest([${langsSorted.map(q).mkString(", ")}]) AS lang) langs
                 LEFT JOIN sc ON sc.doc_id = tg.doc_id AND sc.lang = langs.lang),
        best AS (SELECT doc_id, CASE WHEN len(gs) = 0 THEN '' ELSE lang END AS lang_detected
                 FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY s DESC, lang DESC) AS rn FROM allsc) WHERE rn = 1)
     SELECT best.doc_id, best.lang_detected,
            round(CASE WHEN tg2.n = 0 THEN 0.0
                  ELSE CAST(coalesce(en.s, 0) AS DOUBLE) / (tg2.n * ${L - 1}) END, 4) AS en_score
     FROM best
     JOIN (SELECT doc_id, len(gs) AS n FROM tg) tg2 ON tg2.doc_id = best.doc_id
     LEFT JOIN (SELECT doc_id, s FROM sc WHERE lang = ${q(scoreLang)}) en
            ON en.doc_id = best.doc_id"""
  }

  /** Best language among the profiled set (max weighted overlap; ties break
    * to the lexicographically last language — deterministic). */
  def detect(text: Column): Column = langScores(text).getField("lang")
}
