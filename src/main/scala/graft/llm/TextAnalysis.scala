package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators: quality statistics, token counting, language
  * identification (n-gram/stopword heuristic), and document fingerprinting.
  * All per-row, codegen'd builtin expressions — embarrassingly parallel,
  * no shuffles beyond what the caller adds.
  */
object TextAnalysis {

  /** Quality statistics per document: char/token counts, distinct tokens,
    * avg token length (chars-per-token incl. separators), stopword ratio.
    */
  def stats(documents: DataFrame, textCol: String = "text",
            idCol: String = "doc_id",
            stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val toks = split(col(textCol), " ")
    val stopArr = array(stopwords.map(lit): _*)
    documents.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      round(length(col(textCol)) * lit(1.0) / size(toks), 4).as("avg_token_len"),
      round(size(filter(toks, w => array_contains(stopArr, w))) * lit(1.0)
        / size(toks), 4).as("stopword_ratio"))
  }

  /** Token Shannon entropy per document (quality signal: repetitive/
    * boilerplate text scores low). Two hash aggregates — (doc, token)
    * counts, then per-doc H = log2(n) − Σc·log2(c)/n — both with map-side
    * partial aggregation; no windows, no driver work. */
  def tokenEntropy(documents: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    documents
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * log2(col("c"))).as("slc"))
      .select(col("doc_id"),
        round(log2(col("n")) - col("slc") / col("n"), 4).as("entropy"))

  /** Regex token counts (BPE-ish pre-tokenizer shape: word runs + digit
    * runs counted separately). */
  def tokenCounts(documents: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    documents.select(
      col(idCol).as("doc_id"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+"), lit(0))).as("n_word_tokens"),
      size(regexp_extract_all(col(textCol), lit("[0-9]+"), lit(0))).as("n_num_tokens"))

  /** Tiny built-in stopword profiles for the language-ID heuristic.
    * Deliberately deterministic and dependency-free: score(lang) =
    * Σ_token [token ∈ profile(lang)]; argmax wins, 'en' on ties.
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "les"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"),
  )

  /** Language-ID: stopword-profile vote over word tokens. Returns the input
    * plus `pred_lang` and the per-language score it won with. */
  def languageId(documents: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    def score(profile: Seq[String]): Column = {
      val arr = array(profile.map(lit): _*)
      size(filter(toks, w => array_contains(arr, w)))
    }
    // argmax via a sorted struct array: highest score first, stable
    // alphabetical tie-break on language code.
    val scored = array(langProfiles.map { case (lang, profile) =>
      struct((-score(profile)).as("neg"), lit(lang).as("lang"))
    }: _*)
    documents
      .withColumn("pred_lang", sort_array(scored).getItem(0).getField("lang"))
      .withColumn("pred_score", -sort_array(scored).getItem(0).getField("neg"))
  }

  /** Hashed char-trigram features of lowercased text — the fastText
    * feature shape. Trigrams of length-≥3 text (including spaces, so
    * word boundaries contribute); shorter text is its own single
    * feature. */
  private def charTrigrams(textCol: Column): Column = {
    val t = lower(textCol)
    transform(sequence(lit(1), greatest(length(t) - 2, lit(1))),
      i => t.substr(i, lit(3)))
  }

  /** Engine-portable feature bucket in [0, 4096): the first three hex
    * digits of md5 (the q_feature_hash machinery widened to 12 bits) —
    * identical arithmetic via instr/strpos on both engines, so a model
    * trained here is bit-reproducible by the DuckDB oracle. */
  private def md5Bucket4096(c: Column): Column = {
    val hex = lit("0123456789abcdef")
    val h = md5(c)
    ((instr(hex, substring(h, 1, 1)) - 1) * 256 +
      (instr(hex, substring(h, 2, 1)) - 1) * 16 +
      (instr(hex, substring(h, 3, 1)) - 1)).cast("long")
  }

  /** Number of hash buckets in the langid feature space. */
  val LangIdDim = 4096

  /** Train a fastText-style hashed-trigram language-ID model: a
    * multinomial Naive-Bayes linear model over [[LangIdDim]] hashed
    * char-trigram buckets (the published shape — a linear model over
    * hashed n-gram features — with NB-counted weights, which train in
    * two hash aggregates instead of SGD epochs). Laplace-smoothed
    * per-bucket log-likelihoods are rounded to 4 decimals and fixed to
    * integer MICRO-UNITS (the q_lm_score determinism discipline), so
    * document scores are exact BIGINT sums on any engine.
    *
    * Returns (lang, b, w_micro) with one `b = -1` row per language
    * carrying the unseen-bucket default weight. Model size is bounded by
    * languages × [[LangIdDim]] — broadcast territory forever, no matter
    * the training corpus size; training itself is two map-side-combined
    * aggregates over the exploded trigrams. */
  def trainLangIdModel(labeled: DataFrame, langCol: String = "lang",
                       textCol: String = "text"): DataFrame = {
    val micro = (x: Column) => round(round(x, 4) * 10000).cast("long")
    val counts = Caches.track(labeled
      .select(col(langCol).as("lang"), explode(charTrigrams(col(textCol))).as("g"))
      .select(col("lang"), md5Bucket4096(col("g")).as("b"))
      .groupBy(col("lang"), col("b"))
      .agg(count(lit(1)).as("c")))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    val weights = counts.join(totals, "lang")
      .select(col("lang"), col("b"),
        micro(log((col("c") + lit(1.0)) / (col("n") + lit(LangIdDim.toDouble))))
          .as("w_micro"))
    val defaults = totals
      .select(col("lang"), lit(-1L).as("b"),
        micro(log(lit(1.0) / (col("n") + lit(LangIdDim.toDouble))))
          .as("w_micro"))
    weights.unionByName(defaults)
  }

  /** Score documents under a [[trainLangIdModel]] model: per-doc bucket
    * counts join the BROADCAST model, unseen buckets pay the language's
    * default weight, and the argmax (ties to the alphabetically first
    * language) is a struct-min aggregate — no window, map-side
    * combinable. Returns (idCol, pred_lang, score_micro). The text
    * never shuffles: the exchange carries (id, bucket, count) and the
    * per-(id, lang) partial sums. */
  def langIdScore(documents: DataFrame, model: DataFrame,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val tri = Caches.track(documents
      .select(col(idCol).as("id"), explode(charTrigrams(col(textCol))).as("g"))
      .select(col("id"), md5Bucket4096(col("g")).as("b"))
      .groupBy(col("id"), col("b"))
      .agg(count(lit(1)).as("c")))
    val nTri = tri.groupBy(col("id")).agg(sum(col("c")).as("n_tri"))
    val weights = model.filter(col("b") >= 0)
    val defaults = model.filter(col("b") === -1)
      .select(col("lang"), col("w_micro").as("def_micro"))
    val matched = tri.join(broadcast(weights), "b")
      .groupBy(col("id"), col("lang"))
      .agg(sum(col("c") * col("w_micro")).as("ms"), sum(col("c")).as("mc"))
    nTri.crossJoin(broadcast(defaults))
      .join(matched, Seq("id", "lang"), "left")
      .select(col("id"), col("lang"),
        (coalesce(col("ms"), lit(0L)) +
          (col("n_tri") - coalesce(col("mc"), lit(0L))) * col("def_micro"))
          .as("score_micro"))
      .groupBy(col("id"))
      .agg(min(struct((-col("score_micro")).as("neg"), col("lang"))).as("top"))
      .select(col("id").as(idCol), col("top.lang").as("pred_lang"),
        (-col("top.neg")).as("score_micro"))
  }

  /** Six-language sentence fixture for the hashed-trigram langid model —
    * 8 training + 3 held-out sentences per language, authored for this
    * repo (lowercase ASCII so `lower`/md5 agree byte-for-byte across
    * engines). Shared by the oracle-checked query (which interpolates it
    * into SQL VALUES) and the held-out accuracy spec. */
  val langIdFixture: Seq[(String, Int, String)] = {
    def block(lang: String, train: Seq[String], test: Seq[String]) =
      train.map(t => (lang, 0, t)) ++ test.map(t => (lang, 1, t))
    block("en", Seq(
      "the cat sat on the mat and looked at the dog",
      "we went to the market to buy some fresh bread",
      "it is raining today so take your umbrella with you",
      "the children are playing in the garden after school",
      "i would like a cup of tea with milk please",
      "this book was written by a famous english author",
      "the train leaves the station at seven in the morning",
      "they have been living in london for many years"), Seq(
      "the weather is very nice this time of year",
      "she reads the newspaper every morning with coffee",
      "the quick brown fox jumps over the lazy dog")) ++
    block("es", Seq(
      "el gato esta sentado en la alfombra de la casa",
      "vamos al mercado a comprar pan fresco y fruta",
      "hoy esta lloviendo asi que lleva tu paraguas",
      "los ninos juegan en el jardin despues de la escuela",
      "me gustaria una taza de cafe con leche por favor",
      "este libro fue escrito por un autor espanol famoso",
      "el tren sale de la estacion a las siete de la manana",
      "ellos viven en madrid desde hace muchos anos"), Seq(
      "el tiempo es muy agradable en esta epoca del ano",
      "ella lee el periodico todas las mananas con cafe",
      "los perros corren rapido por el parque grande")) ++
    block("de", Seq(
      "die katze sitzt auf der matte und schaut den hund an",
      "wir gehen zum markt um frisches brot zu kaufen",
      "es regnet heute also nimm deinen regenschirm mit",
      "die kinder spielen nach der schule im garten",
      "ich moechte bitte eine tasse tee mit milch",
      "dieses buch wurde von einem beruehmten autor geschrieben",
      "der zug faehrt um sieben uhr morgens vom bahnhof ab",
      "sie wohnen seit vielen jahren in berlin"), Seq(
      "das wetter ist sehr schoen um diese jahreszeit",
      "sie liest jeden morgen die zeitung mit kaffee",
      "die hunde laufen schnell durch den grossen park")) ++
    block("fr", Seq(
      "le chat est assis sur le tapis de la maison",
      "nous allons au marche pour acheter du pain frais",
      "il pleut aujourd hui alors prends ton parapluie",
      "les enfants jouent dans le jardin apres l ecole",
      "je voudrais une tasse de the avec du lait",
      "ce livre a ete ecrit par un auteur francais celebre",
      "le train part de la gare a sept heures du matin",
      "ils habitent a paris depuis de nombreuses annees"), Seq(
      "le temps est tres agreable a cette periode de l annee",
      "elle lit le journal tous les matins avec du cafe",
      "les chiens courent vite dans le grand parc")) ++
    block("it", Seq(
      "il gatto e seduto sul tappeto della casa",
      "andiamo al mercato a comprare del pane fresco",
      "oggi piove quindi porta il tuo ombrello con te",
      "i bambini giocano in giardino dopo la scuola",
      "vorrei una tazza di te con il latte per favore",
      "questo libro e stato scritto da un famoso autore italiano",
      "il treno parte dalla stazione alle sette del mattino",
      "loro vivono a roma da molti anni"), Seq(
      "il tempo e molto bello in questo periodo dell anno",
      "lei legge il giornale ogni mattina con il caffe",
      "i cani corrono veloci nel grande parco")) ++
    block("pt", Seq(
      "o gato esta sentado no tapete da casa",
      "vamos ao mercado comprar pao fresco e fruta",
      "hoje esta chovendo entao leve o seu guarda chuva",
      "as criancas brincam no jardim depois da escola",
      "eu gostaria de uma xicara de cha com leite por favor",
      "este livro foi escrito por um autor portugues famoso",
      "o trem sai da estacao as sete da manha",
      "eles moram em lisboa ha muitos anos"), Seq(
      "o tempo esta muito agradavel nesta epoca do ano",
      "ela le o jornal todas as manhas com cafe",
      "os caes correm rapido pelo grande parque"))
  }

  /** Train a DISCRIMINATIVE quality classifier — binary LOGISTIC
    * regression over the same [[LangIdDim]] hashed char-trigram buckets
    * as [[trainLangIdModel]]. The published fastText-style quality
    * filter (the CCNet/RefinedWeb wiki-vs-crawl model) is a TRAINED
    * linear model, not NB-counted weights: discriminative training
    * reweights features the classes share (NB's independence assumption
    * double-counts them), which is what separates borderline documents.
    *
    * Training is full-batch gradient descent on normalized trigram
    * frequencies where each round is ONE action over the cached
    * (doc, bucket, x) table — per-doc margins (the current weight
    * vector rides as a plan literal), residuals joined back, per-bucket
    * gradient collected. Driver state is ≤ [[LangIdDim]]+1 doubles no
    * matter the corpus size, and every round is map-side-combined
    * aggregate work — the MLlib-L-BFGS scale shape without the
    * dependency. The intercept trains as pseudo-bucket −1 with x = 1 —
    * exactly [[langIdScore]]'s unseen-bucket default slot.
    *
    * The returned model is the SAME (lang, b, w_micro) shape
    * [[langIdScore]] scores: the intercept is folded into every bucket
    * weight and the default row (Σ_b c_b·(w_b + b0) = n·(Σ x_b·w_b +
    * b0)), so scoring raw counts scales the trained frequency margin by
    * the positive n_tri and preserves the decision boundary exactly.
    * The negative class carries only a zero default row — its score is
    * the 0 the positive margin is compared against. */
  def trainQualityLogistic(labeled: DataFrame, posLabel: String,
                           negLabel: String, labelCol: String = "lang",
                           textCol: String = "text", iters: Int = 20,
                           lr: Double = 8.0, l2: Double = 1e-4): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    // id assigned BEFORE the explode: in the same select,
    // monotonically_increasing_id() evaluates per EXPLODED row, which
    // would make every trigram occurrence its own one-feature document
    // and silently void the per-document frequency normalization below
    val tri = Caches.track(labeled
      .filter(col(labelCol).isin(posLabel, negLabel))
      .select(monotonically_increasing_id().as("id"),
        (col(labelCol) === posLabel).cast("double").as("y"),
        col(textCol).as("t"))
      .select(col("id"), col("y"),
        explode(charTrigrams(col("t"))).as("g"))
      .select(col("id"), col("y"), md5Bucket4096(col("g")).as("b"))
      .groupBy(col("id"), col("y"), col("b"))
      .agg(count(lit(1)).as("c")))
    val withN = tri
      .join(tri.groupBy(col("id")).agg(sum(col("c")).as("n")), "id")
      .select(col("id"), col("y"), col("b"), (col("c") / col("n")).as("x"))
    // intercept as pseudo-bucket −1, x = 1 per doc
    val feats = Caches.track(withN.unionByName(
      withN.select(col("id"), col("y")).distinct()
        .select(col("id"), col("y"), lit(-1L).as("b"), lit(1.0).as("x"))))
    val nDocs = feats.select(col("id")).distinct().count().toDouble
    // w(0) = intercept (bucket −1), w(b+1) = bucket b
    var w = Array.fill(LangIdDim + 1)(0.0)
    // size the per-round shuffles from the training-set size, not the
    // session CPU count: each round is a driver-synchronized action, so
    // 32 near-empty shuffle partitions per stage is pure scheduling
    // overhead on small labeled sets (the labeled set is SMALL by the
    // problem's nature — thousands of curated examples, not the corpus)
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    // skip the tuning when the configured value isn't a plain integer
    // (e.g. "auto" on some distributions) — aborting training over a
    // scheduling optimization would be backwards
    scala.util.Try(saved.toInt).toOption.foreach { savedN =>
      spark.conf.set(key, math.max(2L, math.min(savedN.toLong,
        nDocs.toLong / 50000 + 1)).toString)
    }
    try {
      for (_ <- 0 until iters) {
        val wLit = typedLit(w.toSeq)
        val resid = feats
          .withColumn("wx",
            element_at(wLit, (col("b") + 2).cast("int")) * col("x"))
          .groupBy(col("id"), col("y")).agg(sum(col("wx")).as("s"))
          .select(col("id"),
            (lit(1.0) / (lit(1.0) + exp(-col("s"))) - col("y")).as("r"))
        val grad = feats.join(resid, "id")
          .groupBy(col("b")).agg(sum(col("r") * col("x")).as("g"))
          .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
        w = Array.tabulate(LangIdDim + 1) { i =>
          val b = i - 1
          w(i) - lr * (grad.getOrElse(b, 0.0) / nDocs +
            (if (b >= 0) l2 * w(i) else 0.0))
        }
      }
    } finally spark.conf.set(key, saved)
    val micro = (x: Double) => math.round(x * 10000.0)
    val observed = feats.filter(col("b") >= 0).select(col("b"))
      .distinct().collect().map(_.getLong(0))
    val posRows = observed.toSeq
      .map(b => (posLabel, b, micro(w(b.toInt + 1) + w(0))))
    (posRows ++ Seq((posLabel, -1L, micro(w(0))), (negLabel, -1L, 0L)))
      .toDF("lang", "b", "w_micro")
  }

  /** Quality-classifier fixture: high-quality prose vs two published
    * low-quality failure modes (keyboard mash, token spam), split into
    * train (0) and held-out (1) rows — the [[langIdFixture]] pattern
    * for the hq/lq axis. Shared by the NB and logistic specs and the
    * oracle-checked q_quality_logistic query. */
  val qualityFixture: Seq[(String, Int, String)] = {
    val prose = Seq(
      "the committee reviewed the proposal and suggested several changes",
      "she walked along the river bank watching the evening light fade",
      "modern compilers perform many optimization passes over the code",
      "the recipe calls for two cups of flour and a pinch of salt",
      "historians still debate the causes of the sudden economic decline",
      "the museum opened a new wing dedicated to maritime navigation")
    // held-out lq rows are RECOMBINATIONS of the training vocabulary
    // (new token order, same failure mode) — the generalization a
    // content-based linear model is supposed to make; fully novel
    // vocabulary would test the unseen-bucket prior, not the weights
    val mash = Seq(
      "asdf jkl qwerty zxcv uiop bnm asdf qwer zxcv jklm asdf qwerty",
      "xkcd qqq wvw zzz kjh gfd poi uyt rew vbn mnb asd fgh jkl qwe",
      "qwerty asdf zxcv jkl uiop qqq zzz bnm qwer asd fgh poi rew")
    val spam = Seq(
      "buy now buy now buy now click here click here best price best price",
      "win win win free free free offer offer offer now now now click",
      "click here best price buy now free offer win now click here win")
    prose.take(4).map(("hq", 0, _)) ++ prose.drop(4).map(("hq", 1, _)) ++
      mash.take(2).map(("lq", 0, _)) ++ mash.drop(2).map(("lq", 1, _)) ++
      spam.take(2).map(("lq", 0, _)) ++ spam.drop(2).map(("lq", 1, _))
  }

  /** Karp-Rabin polynomial rolling hash of the normalized text (lowercased,
    * whitespace collapsed): h = Σ c_i · 257^i mod 1e9+7, folded left so the
    * accumulator stays < 2^62 (ANSI-safe). `ascii` returns the full Unicode
    * code point in both Spark and DuckDB, so the hash is portable across
    * the BMP; only non-BMP text (surrogate pairs, e.g. emoji) diverges —
    * Spark's `split("")` yields two UTF-16 code units where DuckDB yields
    * one code point. */
  def fingerprint(documents: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val normalized = regexp_replace(lower(col(textCol)), "\\s+", " ")
    val chars = split(normalized, "")
    documents.select(
      col(idCol).as("doc_id"),
      aggregate(chars, lit(0L),
        (acc, c) => pmod(acc * lit(257L) + ascii(c), lit(1000000007L)))
        .as("fingerprint"),
      length(normalized).as("n_chars_norm"))
  }

  /** TF-IDF per (document, term): tf = c/n, smoothed idf =
    * ln((1+N)/(1+df)).
    *
    * Scale shape: two hash aggregates off one tokenize-explode (map-side
    * combined), an equi-join of term counts against the vocabulary df
    * table (narrow keys), and the 1-row corpus count broadcast. No
    * windows, no driver work — the vocabulary join is the only shuffle
    * that grows with corpus size.
    *
    * Oracle note: every float op is per-row (count ratios are exact
    * binary rationals; the single ln product is rounded to 4 decimals —
    * transcendentals never land on exact decimal half-boundaries, so the
    * HALF_UP-vs-half-even rounding divergence that bit the rational
    * scores cannot trigger). Float SUMS would not survive the bit-exact
    * compare; there are none.
    */
  def tfidf(documents: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val tc = Caches.track(documents
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c")))
    val perDoc = tc.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val vocabDf = tc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = documents.select(countDistinct(col(idCol)).as("n_docs"))
    tc.join(perDoc, "doc_id")
      .join(vocabDf, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round((col("c").cast("double") / col("n"))
          * log((lit(1L) + col("n_docs")).cast("double")
            / (lit(1L) + col("df")).cast("double")), 4).as("tfidf"))
  }

  /** Per-document unigram language-model log-likelihood — the
    * perplexity-proxy quality score (docs whose tokens are improbable
    * under the corpus' own unigram distribution are boilerplate, noise,
    * or wrong-language). Add-one smoothing: p(t) = (ct+1)/(N+V).
    *
    * Scale shape: tokenize-explode → (doc,term) counts → vocabulary
    * counts (both map-side combined) → broadcast 1-row corpus totals →
    * postings equi-join back — the tfidf/bm25 template.
    *
    * Determinism: a per-doc SUM of float log-probs would depend on
    * aggregation order and could never hash-match an oracle. Instead each
    * term's ln p is rounded to 4 decimals (per-row transcendental — the
    * stable op) and converted to exact integer micro-units (×10⁴, round
    * not floor, so the representation error of the 4-dp double cannot
    * flip a unit); doc scores are then BIGINT sums — exact, associative,
    * engine-identical. Output stays integral (n_tokens, sum_logp_micro):
    * the per-token average is a downstream division, not a stored float.
    */
  def unigramLmScore(documents: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val tc = Caches.track(documents
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c")))
    val vocab = tc.groupBy(col("term")).agg(sum(col("c")).as("ct"))
    val totals = vocab.agg(sum(col("ct")).as("n"), count(lit(1)).as("v"))
    val lm = vocab.crossJoin(broadcast(totals))
      .select(col("term"),
        round(round(log((col("ct") + lit(1.0)) / (col("n") + col("v"))), 4)
          * 10000).cast("long").as("micro"))
    tc.join(lm, "term")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("micro")).as("sum_logp_micro"))
  }

  /** Per-document INTERPOLATED BIGRAM language-model log-likelihood —
    * the KenLM-shape perplexity filter (published pipelines score docs
    * under an n-gram LM; unigram [[unigramLmScore]] catches
    * wrong-language and noise, the bigram term additionally catches
    * scrambled/unnatural word ORDER that unigram statistics cannot see).
    * p(w₂|w₁) = λ·c(w₁w₂)/c(w₁) + (1−λ)·(c(w₂)+1)/(N+V) with λ = 3/4
    * (both λ terms exact binary fractions); every scored bigram is
    * corpus-observed so the conditional term needs no smoothing, and the
    * unigram backoff keeps parity with unigramLmScore's add-one.
    *
    * Same determinism discipline as unigramLmScore: per-bigram ln p is
    * rounded to 4 decimals then fixed to integer micro-units, and doc
    * scores are exact BIGINT sums. Two thin column-pruned scans (bigram
    * explode + unigram explode) rather than one fused wide explode —
    * the covariance split-pass trade. All count tables are
    * vocabulary-bounded; the model join broadcasts.
    */
  def bigramLmScore(documents: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val bg = Caches.track(documents
      .filter(size(split(col(textCol), " ")) >= 2)
      .select(col(idCol).as("doc_id"),
        explode(expr(
          s"transform(sequence(0, size(split($textCol, ' ')) - 2)," +
            s" i -> named_struct('w1', split($textCol, ' ')[i]," +
            s" 'w2', split($textCol, ' ')[i + 1]))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c")))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("cb"))
    val cu = Caches.track(documents
      .select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cu")))
    val totals = cu.agg(sum(col("cu")).as("n"), count(lit(1)).as("v"))
    val p = (lit(0.75) * col("cb") / col("cu1")) +
      (lit(0.25) * (col("cu2") + lit(1.0)) / (col("n") + col("v")))
    val lm = cb
      .join(broadcast(cu.select(col("term").as("w1"), col("cu").as("cu1"))),
        "w1")
      .join(broadcast(cu.select(col("term").as("w2"), col("cu").as("cu2"))),
        "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"),
        round(round(log(p), 4) * 10000).cast("long").as("micro"))
    bg.join(lm, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * col("micro")).as("sum_logp_micro"))
  }

  /** Per-document KNESER-NEY bigram log-likelihood — the smoothing the
    * production n-gram filters actually ship (KenLM's default, hence
    * CCNet's): absolute discounting with a CONTINUATION-probability
    * backoff,
    *
    *   p(w₂|w₁) = (c(w₁w₂) − d)/c(w₁·) + λ(w₁)·p_cont(w₂)
    *   λ(w₁)    = d·N₁₊(w₁·)/c(w₁·)        (the discounted mass)
    *   p_cont(w₂) = N₁₊(·w₂)/N₁₊(··)
    *
    * with d = 3/4 (exact binary fraction). Unlike [[bigramLmScore]]'s
    * unigram-frequency interpolation, the backoff weighs how many
    * DISTINCT contexts a word follows — "francisco" is frequent but
    * nearly always follows "san", so its continuation probability is
    * tiny and novel-context uses are penalized; that distinction is the
    * published reason KN beats interpolated counts as a fluency filter.
    * Every scored bigram is corpus-observed, so c(w₁w₂) ≥ 1 > d and the
    * max(·,0) clamp in the textbook formula is vacuous here.
    *
    * Determinism (the [[unigramLmScore]] discipline): every model count
    * is an exact integer — c(w₁w₂); c(w₁·) = Σ_{w₂} c(w₁w₂); the
    * continuation counts N₁₊ are DISTINCT-counts over the bigram-type
    * table — and the per-bigram probability is a fixed five-operation
    * IEEE double expression evaluated in identical association order on
    * both engines, then ln → round(4 dp) → integer micro-units, so doc
    * scores are exact BIGINT sums.
    *
    * Scale shape: the bigram explode is the [[bigramLmScore]] template;
    * all model tables (bigram types, left/right continuation counts)
    * are vocabulary-bounded hash aggregates; the assembled model
    * broadcasts back against the per-doc bigrams — corpus text never
    * joins by shuffle.
    */
  def kneserNeyBigramScore(documents: DataFrame, textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    val bg = Caches.track(documents
      .filter(size(split(col(textCol), " ")) >= 2)
      .select(col(idCol).as("doc_id"),
        explode(expr(
          s"transform(sequence(0, size(split($textCol, ' ')) - 2)," +
            s" i -> named_struct('w1', split($textCol, ' ')[i]," +
            s" 'w2', split($textCol, ' ')[i + 1]))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c")))
    // bigram TYPE table: (w1, w2, cb) — every other model table derives
    // from it, so the corpus is scanned once for the whole model
    val cb = Caches.track(bg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c")).as("cb")))
    // left profile of w1: total mass c(w1·) and distinct continuations
    val lft = cb.groupBy(col("w1"))
      .agg(sum(col("cb")).as("c1"), count(lit(1)).as("n1p"))
    // right continuation count of w2: distinct preceding contexts
    val rgt = cb.groupBy(col("w2")).agg(count(lit(1)).as("nl"))
    val totals = cb.agg(count(lit(1)).as("ntypes"))
    // ((cb − d)/c1) + (((d·n1p)/c1) · (nl/ntypes)) — five IEEE ops in
    // this exact association order; the oracle states the same shape
    val p = ((col("cb") - lit(0.75)) / col("c1")) +
      (((lit(0.75) * col("n1p")) / col("c1"))
        * (col("nl").cast("double") / col("ntypes").cast("double")))
    val lm = cb
      .join(broadcast(lft), "w1")
      .join(broadcast(rgt), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"),
        round(round(log(p), 4) * 10000).cast("long").as("micro"))
    bg.join(lm, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * col("micro")).as("sum_logp_micro"))
  }

  /** Per-document interpolated TRIGRAM Kneser-Ney log-likelihood — the
    * order at which the production perplexity filters actually operate
    * (KenLM ships order ≥ 3; CCNet's reference model is a 5-gram): the
    * [[kneserNeyBigramScore]] discount-plus-continuation recursion
    * applied one level deeper (Chen & Goodman 1999's interpolated form),
    *
    *   p(w₃|w₁w₂) = (c(w₁w₂w₃) − d)/c(w₁w₂·)
    *              + λ(w₁w₂) · p_KN(w₃|w₂)
    *   p_KN(w₃|w₂) = (N₁₊(·w₂w₃) − d)/N₁₊(·w₂·)
    *              + (d·N₁₊(w₂·)/N₁₊(·w₂·)) · N₁₊(·w₃)/N₁₊(··)
    *
    * with d = 3/4 and λ(w₁w₂) = d·N₁₊(w₁w₂·)/c(w₁w₂·). The mid-level
    * probability uses CONTINUATION counts (distinct predecessors of the
    * (w₂,w₃) pair over trigram types), not raw bigram frequency — the
    * defining KN property carried through the recursion. Every scored
    * trigram is corpus-observed, so both discounted numerators are ≥
    * 1 − d > 0 and the textbook max(·,0) clamps are vacuous.
    *
    * Determinism: every model quantity is an exact integer (trigram
    * counts, context masses, four distinct-count tables); the per-trigram
    * probability is a fixed eleven-operation IEEE double expression in
    * stated association order, then ln → 4 dp → integer micro-units —
    * doc scores are exact BIGINT sums (the [[kneserNeyBigramScore]]
    * discipline one order up).
    *
    * Scale shape: one corpus scan builds the per-doc trigram counts; the
    * trigram TYPE table derives every model table as vocabulary-bounded
    * hash aggregates (plus the bigram-type table for the base
    * continuation level). The unigram-bounded profiles broadcast; the
    * type-table-sized context/continuation tables join KEYED (they are
    * the same order as the model itself — a forced broadcast there
    * would OOM at production vocabulary), and the per-doc scoring join
    * probes the assembled model, which Catalyst broadcasts whenever it
    * fits. */
  def kneserNeyTrigramScore(documents: DataFrame, textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    val tg = Caches.track(documents
      .filter(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).as("doc_id"),
        explode(expr(
          s"transform(sequence(0, size(split($textCol, ' ')) - 3)," +
            s" i -> named_struct('w1', split($textCol, ' ')[i]," +
            s" 'w2', split($textCol, ' ')[i + 1]," +
            s" 'w3', split($textCol, ' ')[i + 2]))")).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
      .groupBy(col("doc_id"), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c")))
    // trigram TYPE table — the model's single derivation root (the
    // bigram level additionally needs the corpus bigram-type table for
    // the base continuation distribution)
    val ct = Caches.track(tg.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(sum(col("c")).as("c3")))
    // context profile of (w1,w2): total mass and distinct continuations
    val ctx = ct.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c3")).as("cctx"), count(lit(1)).as("n3"))
    // mid continuation counts around w2: distinct predecessors of each
    // (w2,w3) pair, and distinct (w1,w3) pairs through w2
    val mid = ct.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("nm"))
    val midCtx = ct.groupBy(col("w2")).agg(count(lit(1)).as("n2mid"))
    // base level over corpus BIGRAM types (both corpus positions, not
    // just trigram-interior ones): distinct continuations of w2,
    // distinct predecessors of w3, total bigram types
    val bgt = Caches.track(documents
      .filter(size(split(col(textCol), " ")) >= 2)
      .select(explode(expr(
        s"transform(sequence(0, size(split($textCol, ' ')) - 2)," +
          s" i -> named_struct('w1', split($textCol, ' ')[i]," +
          s" 'w2', split($textCol, ' ')[i + 1]))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .distinct())
    val rgt = bgt.groupBy(col("w1").as("w2")).agg(count(lit(1)).as("nr"))
    val lft = bgt.groupBy(col("w2").as("w3")).agg(count(lit(1)).as("nl"))
    val totals = bgt.agg(count(lit(1)).as("ntypes"))
    // ((c3−d)/cctx) + (((d·n3)/cctx) · (((nm−d)/n2mid)
    //   + (((d·nr)/n2mid) · (nl/ntypes)))) — eleven IEEE ops in this
    // exact association order; the oracle states the same shape
    val p = ((col("c3") - lit(0.75)) / col("cctx")) +
      (((lit(0.75) * col("n3")) / col("cctx"))
        * (((col("nm") - lit(0.75)) / col("n2mid"))
          + (((lit(0.75) * col("nr")) / col("n2mid"))
            * (col("nl").cast("double") / col("ntypes").cast("double")))))
    // ctx and mid are TYPE-TABLE-sized ((w1,w2) contexts / (w2,w3)
    // continuations — the same order as ct itself), so they must NOT
    // carry a broadcast hint: at production vocabulary they exceed any
    // broadcast budget and the keyed join is the right plan. Only the
    // UNIGRAM-bounded profiles (midCtx, rgt, lft) and the 1-row total
    // broadcast unconditionally.
    val lm = ct
      .join(ctx, Seq("w1", "w2"))
      .join(mid, Seq("w2", "w3"))
      .join(broadcast(midCtx), "w2")
      .join(broadcast(rgt), "w2")
      .join(broadcast(lft), "w3")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("w3"),
        round(round(log(p), 4) * 10000).cast("long").as("micro"))
    tg.join(lm, Seq("w1", "w2", "w3"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_trigrams"),
        sum(col("c") * col("micro")).as("sum_logp_micro"))
  }

  /** Scale-safe CCNet bucketing — the production form of the exact-ntile
    * `q_ccnet_buckets` query: derive per-language tercile CUTOFF scores
    * with approximate quantiles (one hash aggregate, no sort), broadcast
    * the languages×2 cutoff table, and bucket every document with a
    * per-row comparison. The exact formulation funnels each language
    * through ONE window-sort task — a straggler on a skewed 100 TB
    * corpus; this shape has no sort anywhere and its cost is the LM
    * template plus two narrow aggregates. CCNet itself fits cutoffs on a
    * sample, so approximate boundaries are the method, not a compromise.
    * Docs at the cutoff boundary may land one bucket away from the
    * exact-tercile assignment (LlmSpec pins high agreement on the test
    * corpus). */
  def pplBucketsApprox(documents: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id",
                       langCol: String = "lang"): DataFrame = {
    val scores = Caches.track(documents
      .select(col(idCol).as("doc_id"), col(langCol).as("lang"))
      .join(unigramLmScore(documents, textCol, idCol), "doc_id")
      .withColumn("avg_logp",
        col("sum_logp_micro") * lit(1.0) / col("n_tokens")))
    val cuts = scores.groupBy(col("lang"))
      .agg(percentile_approx(col("avg_logp"),
        array(lit(2.0 / 3), lit(1.0 / 3)), lit(10000)).as("cuts"))
      .select(col("lang"), col("cuts").getItem(0).as("c_head"),
        col("cuts").getItem(1).as("c_mid"))
    scores.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"),
        when(col("avg_logp") >= col("c_head"), "head")
          .when(col("avg_logp") >= col("c_mid"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** DSIR-style importance weights (Xie et al., NeurIPS'23 — "Data
    * Selection for Language Models via Importance Resampling"): score each
    * document by how much more likely its hashed-unigram bag is under a
    * TARGET slice of the corpus than under the RAW corpus,
    * `log w(d) = Σ_tokens ln(p_target(bucket)/p_raw(bucket))`, add-one
    * smoothed over a fixed 256-bucket feature space. High-weight docs
    * "look like" the target domain; selection takes the top quantile.
    *
    * Scale shape: ONE tokenize-explode feeds ONE (doc, bucket) count
    * aggregate — everything downstream (the 256-row corpus bucket table,
    * the log-ratio broadcast, the per-doc weight rollup) works off that
    * ≤256-rows-per-doc table, never re-touching exploded tokens (Σ_tokens
    * lr = Σ_buckets cnt·lr exactly, so the collapse is integer-lossless);
    * the target count rides free (tgt is per-doc constant: ct = tgt·cnt).
    * The 256-row log-ratio table is vocabulary-free (hashing trick: no
    * dictionary to build or ship) and broadcasts onto the per-doc bucket
    * counts. Nothing but two narrow shuffles scales with the corpus. The
    * bucket is two md5 hex digits mapped through `instr` (portable across
    * engines — hex→int casts are not).
    *
    * `targetPred` is any boolean Column over `documents`' columns (e.g.
    * `col("lang") === "en"`, a quality flag, a hand-curated id set); a
    * NULL predicate counts as not-target (coalesced to 0 — without it a
    * bucket fed only by NULL-pred docs would get a NULL count and its
    * tokens would silently vanish from every doc's weight).
    */
  def importanceWeights(documents: DataFrame, targetPred: Column,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val hx = "0123456789abcdef"
    def digit(i: Int): Column =
      instr(lit(hx), substring(md5(col("term")), i, 1)) - 1
    // (doc, bucket) counts: the ONLY pass over exploded tokens. Cached —
    // it feeds both the corpus bucket table and the per-doc rollup, and
    // it is min(n_tokens, 256) rows per doc vs one row per token.
    val dbc = Caches.track(documents
      .select(col(idCol).as("doc_id"),
        coalesce(targetPred.cast("int"), lit(0)).as("tgt"),
        explode(split(col(textCol), " ")).as("term"))
      .select(col("doc_id"), col("tgt"),
        (digit(1) * 16 + digit(2)).cast("long").as("b"))
      .groupBy(col("doc_id"), col("tgt"), col("b"))
      .agg(count(lit(1)).as("cnt")))
    // corpus bucket table (256 rows): tgt is per-doc constant, so the
    // target token count is tgt·cnt — the target slice never costs a
    // second corpus scan
    val bc = Caches.track(dbc.groupBy(col("b"))
      .agg(sum(col("cnt")).as("cr"),
        sum(col("tgt") * col("cnt")).as("ct")))
    val totals = bc.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val lr = bc.crossJoin(broadcast(totals))
      .select(col("b"),
        round(round(log(((col("ct") + lit(1.0)) * (col("nr") + lit(256))) /
            ((col("cr") + lit(1.0)) * (col("nt") + lit(256)))), 4)
          * 10000).cast("long").as("lr_micro"))
    dbc.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("lr_micro")).as("log_w_micro"))
  }

  /** BM25 relevance per (document, query term) — the ranking function TF-IDF
    * feeds into in every lexical retrieval stack (Robertson/Spärck Jones;
    * Lucene's default similarity). k1 damps term-frequency saturation, b
    * normalizes by document length against the corpus mean.
    *
    * Scale shape mirrors [[tfidf]]: one tokenize-explode feeding term
    * counts (map-side combined), doc lengths over ALL terms, df restricted
    * to the query's terms, and the 1-row corpus stats (N, avgdl) broadcast
    * — both stats in ONE aggregate over the doc-length table, so the
    * corpus is scanned exactly once (N = docs with at least one term).
    * The query-term filter prunes the big tc join input BEFORE the df join,
    * so cost tracks matching postings, not the vocabulary.
    *
    * Oracle note: same per-row discipline as tfidf — counts and lengths
    * are exact integers, avgdl is one BIGINT-sum/count division identical
    * in any engine, and the lone transcendental (ln in the idf) is rounded
    * at 4 decimals per row. Nothing sums floats.
    */
  def bm25(documents: DataFrame, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75,
           textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tc = Caches.track(documents
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c")))
    val docLen = tc.groupBy(col("doc_id")).agg(sum(col("c")).as("dl"))
    val hits = tc.filter(col("term").isin(queryTerms: _*))
    val dfTbl = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N and avgdl come from ONE aggregate over docLen (a row per doc
    // with ≥1 term, already derived from the persisted term counts) — a
    // separate countDistinct over `documents` would re-scan the whole
    // corpus for a number docLen already knows. Both land in the same
    // 1-row broadcast.
    val stats = docLen.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val idf = log(lit(1.0)
      + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("c") * (lit(k1) + 1.0)) /
      (col("c") + lit(k1) * (lit(1.0) - lit(b)
        + lit(b) * col("dl") / col("avgdl")))
    hits.join(docLen, "doc_id")
      .join(dfTbl, "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        round(idf * tfNorm, 4).as("bm25"))
  }

  /** HTML → text extraction (the trafilatura-shape step at the head of
    * every web-corpus pipeline, reduced to its deterministic core):
    * script/style subtrees are DROPPED (their text is code, not prose),
    * remaining tags become whitespace, the five standard entities decode,
    * and whitespace runs collapse. Pure per-row regexp/replace chains —
    * codegen'd, no shuffle, and every step states identically in the
    * DuckDB oracle (RE2 and Java agree on these patterns; non-greedy
    * `.*?` keeps two script blocks from merging into one deletion).
    * Returns (doc_id, clean text, n_tags removed). */
  def htmlStrip(documents: DataFrame, htmlCol: String = "html",
                idCol: String = "doc_id"): DataFrame = {
    // (?is): real-world scripts span lines (Java '.' stops at \n without
    // DOTALL) and tags come uppercase — both would otherwise leak script
    // code into the "clean" text
    val noScript = regexp_replace(col(htmlCol),
      lit("(?is)<(script|style)[^>]*>.*?</(script|style)>"), lit(" "))
    val noTags = regexp_replace(noScript, lit("<[^>]*>"), lit(" "))
    // '&amp;' decodes LAST: escaped entities ('&amp;lt;' = the literal
    // text "&lt;") must not double-decode into '<'
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    documents.select(col(idCol).as("doc_id"),
      trim(regexp_replace(decoded, lit("\\s+"), lit(" "))).as("text"),
      size(regexp_extract_all(col(htmlCol), lit("<[^>]*>"), lit(0)))
        .cast("long").as("n_tags"))
  }

  /** Per-document DEFLATE compression ratio — the published
    * "gzip-compressibility" quality signal (used in RedPajama/Dolma-style
    * curation): highly repetitive or templated text compresses far below
    * natural prose, and near-random noise barely compresses at all, so
    * the ratio separates both failure modes from quality text with one
    * cheap pass. Round-13 upgrade: the DEFLATE length is a native
    * codegen'd expression ([[graft.functions.DeflateLenExpr]], raw
    * deflate at the fixed level 6, thread-local reused Deflater — one
    * per pool thread, bounded), so the whole signal lives inside
    * whole-stage codegen next to the other quality projections instead
    * of a mapPartitions island. Emitted in integer micro-units
    * (compressed·10⁶ div raw) so downstream thresholds are exact.
    * Null/empty text → ratio 0. DEFLATE is not SQL-expressible, so raw
    * lengths are spec territory (LlmSpec pins repetitive < natural <
    * noise ordering and determinism); q_quality_compress oracle-gates
    * widely-separated threshold verdicts that a zlib revision cannot
    * flip. */
  def compressionRatio(documents: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame =
    documents.select(col(idCol).cast("long").as("doc_id"),
        coalesce(octet_length(col(textCol)), lit(0)).cast("long")
          .as("n_bytes"),
        graft.functions.TextExpressions.deflateLen(col(textCol))
          .as("dl"))
      .select(col("doc_id"), col("n_bytes"),
        when(col("n_bytes") === 0L, lit(0L))
          .otherwise(expr("dl * 1000000L div n_bytes")).as("ratio_micro"))

  /** Line-level boilerplate removal — the first cleaning pass in published
    * web-corpus pipelines (CCNet's per-shard line dedup, RefinedWeb's
    * line-wise filters): a line that recurs across many documents of the
    * same source is mast-head/footer/cookie-banner furniture, not content.
    * The testdata corpus carries no newlines, so the "line" unit is a
    * non-overlapping window of `lineWords` tokens (the q_chunk_docs chunk
    * contract); a line is boilerplate within a source when its exact text
    * occurs in at least `minDocs` DISTINCT documents of that source.
    * Returns only the AFFECTED documents (≥1 line removed) with their
    * rebuilt text and removal counts — the untouched corpus majority never
    * leaves the scan.
    *
    * Scale: the frequency aggregate and both membership joins run on the
    * 128-bit line HASH, never the line text, so shuffles carry (source,
    * hash) pairs; the only text movement is the per-doc rebuild of its own
    * kept lines. Distinct from [[graft.llm.Dedup]]'s span dedup: the
    * criterion is within-source document FREQUENCY (threshold), not
    * cross-corpus duplication, and every occurrence is dropped — there is
    * no kept first copy.
    */
  def stripBoilerplate(documents: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id", sourceCol: String = "source",
                       lineWords: Int = 10, minDocs: Int = 2): DataFrame = {
    val w = split(col(textCol), " ")
    val nChunks = ceil(size(w) / lit(lineWords.toDouble)).cast("int")
    // lines feeds the frequency aggregate, the affected-doc probe, the
    // kept-line rebuild, and the per-doc totals — persist once
    val lines = Caches.track(documents
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(w, i * lineWords + 1, lit(lineWords)))))
          .as(Seq("pos", "line")))
      .withColumn("lh", md5(col("line"))))
    val boiler = lines.groupBy(col("source"), col("lh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("source"), col("lh"))
    val affected = lines.join(boiler, Seq("source", "lh"), "left_semi")
      .select(col("doc_id")).distinct()
    val mine = lines.join(affected, Seq("doc_id"), "left_semi")
    val kept = mine.join(boiler, Seq("source", "lh"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("clean_text"))
    mine.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** C4's line-level cleaning battery (Raffel et al. 2020, JMLR 21(140)
    * §2.2 — the most-cited published pretraining cleaning recipe,
    * applied verbatim by the T5 corpus and countless successors). Per
    * LINE, keep only lines that
    *  (1) end in a terminal punctuation mark — `.` `!` `?`, optionally
    *      followed by a closing quote (C4's "end quotation mark");
    *  (2) carry at least `minWordsPerLine` words (C4 used 5);
    *  (3) do not mention "javascript" (the cookie/JS-warning
    *      boilerplate rule).
    * Per PAGE, `keep` is false when fewer than `minKeptLines` lines
    * survive (C4's three-sentence floor), or the page contains
    * "lorem ipsum", a curly brace `{` (code), or any `badWords` entry
    * as a whole word (C4's blocklist rule; entries must be lowercase
    * alphanumeric words). C4's remaining rule — the three-sentence-span
    * corpus dedup — is [[Dedup]]'s spans family, not a per-doc map.
    *
    * Line-drop counters cascade deterministically (punct → short → js):
    * each dropped line counts under its FIRST failing rule.
    *
    * Scale shape: pure per-row higher-order array work (split / filter /
    * size / array_join) — whole-stage codegen, zero shuffle,
    * embarrassingly parallel at any corpus size. The page verdict and
    * the cleaned text both come out of one projection, so the filter
    * composes with any downstream operator without re-reading. */
  def c4Clean(documents: DataFrame, textCol: String = "text",
              idCol: String = "doc_id", minWordsPerLine: Int = 5,
              minKeptLines: Int = 3,
              badWords: Seq[String] = Seq.empty): DataFrame = {
    require(badWords.forall(_.matches("[a-z0-9]+")),
      "badWords must be lowercase alphanumeric words (whole-word regex)")
    val lines = split(col(textCol), "\n")
    def punctOk(l: Column) = l.rlike("[.!?][\"']?$")
    def longEnough(l: Column) = size(split(l, " ")) >= minWordsPerLine
    def hasJs(l: Column) = contains(lower(l), lit("javascript"))
    val kept = filter(lines, l => punctOk(l) && longEnough(l) && !hasJs(l))
    val lowered = lower(col(textCol))
    val badHit =
      if (badWords.isEmpty) lit(false)
      else lowered.rlike("\\b(" + badWords.mkString("|") + ")\\b")
    documents.select(col(idCol).as("doc_id"),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      size(filter(lines, l => !punctOk(l))).as("dropped_punct"),
      size(filter(lines, l => punctOk(l) && !longEnough(l)))
        .as("dropped_short"),
      size(filter(lines, l => punctOk(l) && longEnough(l) && hasJs(l)))
        .as("dropped_js"),
      (size(kept) >= minKeptLines
        && !contains(lowered, lit("lorem ipsum"))
        && !contains(col(textCol), lit("{"))
        && !badHit).as("keep"),
      array_join(kept, "\n").as("clean_text"))
  }

  /** Luhn-validated card-number detection (Luhn 1960; ISO/IEC 7812) — the
    * checksum gate production DLP scanners put behind the digit-run
    * regex: a 13–19 digit run is only a PII hit when its mod-10 checksum
    * verifies, which drops the overwhelming majority of order ids,
    * timestamps, and hashes a bare regex would scrub (the q_pii_scrub
    * rule redacts every long digit run; this is the precision upgrade).
    *
    * One row per candidate digit run with its verdict. Pure per-row
    * codegen'd work (regexp_extract_all + an `aggregate` over the digit
    * positions) — no shuffle, no state; the checksum is exact integer
    * arithmetic, so DuckDB replays it digit for digit. */
  def luhnScan(df: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol).as("doc_id"),
        // digit-boundary lookarounds: a 20+-digit run (hash, id) is NOT
        // a card candidate — without them the greedy {13,19} would
        // slice a 19-digit prefix out of it and occasionally pass the
        // checksum by chance
        explode(expr(
          s"regexp_extract_all($textCol," +
            " '(?<![0-9])[0-9]{13,19}(?![0-9])', 0)"))
          .as("candidate"))
      // double every SECOND digit counting from the right (the check
      // digit, rightmost, stays single): right-position = len - i + 1,
      // doubled when even ⇔ (len - i) odd; doubled digits > 9 fold back
      // by subtracting 9
      .withColumn("luhn_ok", expr(
        """aggregate(
          |  sequence(1, length(candidate)), 0,
          |  (acc, i) -> acc + (CASE
          |    WHEN (length(candidate) - i) % 2 = 1
          |    THEN IF(2 * CAST(substring(candidate, i, 1) AS INT) > 9,
          |            2 * CAST(substring(candidate, i, 1) AS INT) - 9,
          |            2 * CAST(substring(candidate, i, 1) AS INT))
          |    ELSE CAST(substring(candidate, i, 1) AS INT) END)
          |) % 10 = 0""".stripMargin))
}
