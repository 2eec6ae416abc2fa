package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-scale text analysis in relational form.
  *
  * `TextFunctions.langId` is a per-row Column expression — convenient,
  * but its expression tree tokenizes the document once per candidate
  * language. At corpus scale the idiomatic Spark plan tokenizes ONCE:
  * explode tokens, conditional-count per language (map-side combined),
  * pick the winner. One narrow pass + one small shuffle on the doc id.
  */
object TextAnalysis {

  /** Stopword-vote language ID per document: returns
    * (idCol..., detected_lang), same semantics as TextFunctions.langId —
    * DISTINCT stopword hits per language, ties to the alphabetically
    * first language, zero hits → "und". `carryCols` ride along. */
  def langIdByVote(
      df: DataFrame,
      idCol: String,
      textCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    val langs = TextFunctions.stopwords.toSeq.sortBy(_._1)
    val keyCols = (idCol +: carryCols).map(col)

    val toks = df.select(keyCols :+
      explode_outer(array_distinct(
        TextFunctions.wsTokens(lower(col(textCol))))).as("__tok"): _*)

    val scored = toks
      .groupBy(keyCols: _*)
      .agg(
        count(when(col("__tok").isin(langs.head._2.map(lit): _*), 1))
          .as(s"s_${langs.head._1}"),
        langs.tail.map { case (l, ws) =>
          count(when(col("__tok").isin(ws.map(lit): _*), 1)).as(s"s_$l")
        }: _*)

    val mx = greatest(langs.map(l => col(s"s_${l._1}")): _*)
    val winner = langs.foldRight(lit(langs.last._1)) { case ((l, _), rest) =>
      when(col(s"s_$l") === mx, lit(l)).otherwise(rest)
    }
    scored.select(keyCols :+
      when(mx === 0, "und").otherwise(winner).as("detected_lang"): _*)
  }

  /** Per-document shingle novelty: the fraction of a doc's distinct
    * word n-grams that appear NOWHERE else in the corpus (global
    * df == 1). High novelty = original content; near-zero = assembled
    * from boilerplate the corpus already has everywhere — a cheap,
    * exactly-reproducible counterpart to the LM surprisal signal.
    * Shapes: one explode, one df aggregate, one join riding the same
    * shingle hash partitioning, one per-doc aggregate. The avg is over
    * exact 0/1 doubles (integer-valued sums), so it is
    * engine-portable without decimal machinery. The exploded frame
    * feeds BOTH the df aggregate and the join probe, so its lineage is
    * cut once (localCheckpoint) — without the cut the tokenize+explode
    * pass over the whole corpus runs twice. */
  def shingleNovelty(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3): org.apache.spark.sql.DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
      explode(Dedup.shingleSet(col(textCol), shingleN)).as("shingle"))
      .transform(Lineage.cutLocal)
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
    sh.join(freq, "shingle")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        round(avg(when(col("__df") === 1, 1.0).otherwise(0.0)), 4)
          .as("novelty"))
  }

  /** CCNet-style language-model quality signal: per-document cross-
    * entropy under a unigram LM trained on the corpus itself. Junk docs
    * (rare-token soup) score high; boilerplate scores low. No external
    * model: the "training" is one token-frequency aggregation, so the
    * whole signal is deterministic and oracle-able.
    *
    * surprisal(d) = avg over tokens of ln(N) - ln(c(tok)), where c is
    * the corpus count and N the corpus token total. Per-token surprisals
    * are rounded to 6dp and summed as DECIMAL so the per-doc result is
    * independent of summation order (float sums are not associative —
    * the engines would disagree in the last ulp otherwise).
    *
    * Scale shape: one explode collapsed immediately to distinct
    * (doc, token, tf) triples (map-side combined — the join input
    * shrinks from total-token to distinct-pair cardinality, which is
    * what survives a stopword-skewed 100 TB corpus), one vocab
    * aggregation, one join back by token (AQE splits residual hot
    * tokens; broadcast the vocab instead when it fits), one per-doc
    * aggregation. tf * surprisal stays DECIMAL-exact, so collapsing
    * multiplicity changes nothing in the result. The (doc, token, tf)
    * frame feeds the vocab aggregate, the corpus total, AND the join
    * probe — its lineage is cut once (localCheckpoint) so the
    * explode+aggregate pass runs once, not three times.
    */
  def unigramSurprisal(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val tf = df.select(col(idCol),
      explode(TextFunctions.wsTokens(lower(col(textCol)))).as("__tok"))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
      .transform(Lineage.cutLocal)
    val counts = tf.groupBy("__tok").agg(sum(col("__tf")).as("__c"))
    val total = counts.agg(sum(col("__c")).as("__n_total"))
    tf
      .join(counts, "__tok")
      .crossJoin(broadcast(total))
      .select(col(idCol), col("__tf"),
        (round(log(col("__n_total")) - log(col("__c")), 6)
          .cast("decimal(18,6)") * col("__tf")).as("__s"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"),
        round(sum(col("__s")).cast("double") / sum(col("__tf")), 2)
          .as("surprisal"))
  }

  /** Bigram language-model perplexity scoring — the CCNet-style LM
    * quality filter (docs whose token sequences the corpus LM finds
    * improbable are noise candidates; [[unigramSurprisal]] ranks by
    * token RARITY, this ranks by SEQUENCE probability). Add-α smoothed
    * conditional model trained on the corpus itself:
    *
    *   p(w|v) = (c(v,w) + α) / (c(v) + α·V),   V = |vocab|
    *   nll(doc) = Σ −ln p(w_i | w_{i−1}) / (T − 1)
    *
    * reported as mean negative log-likelihood in nats (the monotone
    * equivalent of perplexity = e^nll; exp would amplify last-ulp
    * differences, nll keeps the decimal-sum exactness contract).
    *
    * Scale shape: ONE explode pass builds (doc, v, w, pairs) rows with
    * multiplicity collapsed per doc (lineage cut once — the frame feeds
    * the LM aggregation and the probe); bigram counts shuffle bounded
    * by distinct bigrams; context counts derive from the bigram table
    * (never a second corpus pass); V is a lazy broadcast 1-row
    * aggregate; the scoring join keys on the bigram. Per-term logs
    * round to 6dp and sum as DECIMAL. Docs with fewer than 2 tokens
    * have no bigram events and are excluded (a perplexity of nothing). */
  def bigramNll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.5): DataFrame = {
    val toks = TextFunctions.wsTokens(lower(col(textCol)))
    val pairs = df.select(col(idCol), toks.as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col(idCol),
        slice(col("__tk"), lit(1), size(col("__tk")) - 1).as("__vs"),
        slice(col("__tk"), lit(2), size(col("__tk")) - 1).as("__ws"))
      .select(col(idCol), explode(arrays_zip(col("__vs"), col("__ws"))).as("__p"))
      .groupBy(col(idCol), col("__p.__vs").as("__v"), col("__p.__ws").as("__w"))
      .agg(count(lit(1)).as("__k"))
      .transform(Lineage.cutLocal)
    val c2 = pairs.groupBy("__v", "__w").agg(sum(col("__k")).as("__c2"))
      .transform(Lineage.cutLocal)
    val c1 = c2.groupBy("__v").agg(sum(col("__c2")).as("__c1"))
    val vocab = broadcast(df
      .select(explode(toks).as("__t")).agg(countDistinct(col("__t"))
        .cast("double").as("__vsz")))
    pairs
      .join(c2, Seq("__v", "__w"))
      .join(c1, Seq("__v"))
      .crossJoin(vocab)
      .select(col(idCol), col("__k"),
        (round(-log((col("__c2") + alpha) /
            (col("__c1") + lit(alpha) * col("__vsz"))), 6)
          .cast("decimal(18,6)") * col("__k")).as("__s"))
      .groupBy(col(idCol))
      .agg(sum(col("__k")).as("n_bigrams"),
        round(sum(col("__s")).cast("double") / sum(col("__k")), 4)
          .as("nll"))
  }

  /** CCNet-style perplexity gate (Wenzek et al. 2020) — per-source
    * head/middle/tail partition of the [[bigramNll]] LM score: the
    * canonical web-corpus curation move is "keep the head, sample the
    * middle, drop the tail", cut at PER-SOURCE quantiles so a noisy
    * source's best documents still survive against a clean source's
    * average. Cuts at p25/p75 (exactly-representable fractions — no
    * quantile-literal parity risk between engines).
    *
    * Determinism contract: the per-doc score is [[bigramNll]]'s
    * 4dp-pinned nll; thresholds are `percentile` doubles (== DuckDB
    * quantile_cont, the aq51 precedent) over those pinned scores;
    * bucket mean nll is a decimal(18,4) sum divided once, pinned.
    * Documents under 2 tokens have no bigram score and are excluded
    * (the [[bigramNll]] domain).
    *
    * Scale shape: the bigramNll passes, then one |groups|-row
    * broadcast threshold frame joined back onto the |docs|-row score
    * frame and a (group, bucket) aggregate — nothing new is
    * corpus-sized. Returns `(group, bucket, n_docs, mean_nll)`. */
  def perplexityBuckets(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String): DataFrame = {
    val scored = Lineage.cutLocal(
      bigramNll(df, idCol, textCol)
        .join(df.select(col(idCol), col(groupCol).as("__g")), Seq(idCol)))
    val th = broadcast(scored.groupBy("__g").agg(
      expr("percentile(nll, 0.25)").as("__p25"),
      expr("percentile(nll, 0.75)").as("__p75")))
    scored.join(th, Seq("__g"))
      .withColumn("__b",
        when(col("nll") <= col("__p25"), "head")
          .when(col("nll") <= col("__p75"), "middle")
          .otherwise("tail"))
      .groupBy(col("__g").as(groupCol), col("__b").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        Readout.pin(sum(col("nll").cast("decimal(18,4)"))
          .cast("double") / count(lit(1)), 6).as("mean_nll"))
      .orderBy(groupCol, "bucket")
  }

  /** Interpolated Kneser–Ney smoothed bigram model (Kneser & Ney 1995;
    * Chen & Goodman 1999) — the smoothing that actually wins LM
    * benchmarks, beside [[bigramNll]]'s add-α baseline: instead of
    * stealing mass uniformly, absolute discounting D backs off to the
    * CONTINUATION probability (how many distinct contexts a word
    * follows — "Francisco" is frequent but only ever follows "San", so
    * its continuation mass is tiny):
    *
    *   p_KN(w|v) = max(c(v,w) − D, 0)/c(v·) + D·N₁₊(v·)/c(v·) · p_cont(w),
    *   p_cont(w) = N₁₊(·w) / N₁₊(··).
    *
    * Output: the corpus' `topK` bigrams by count (ties on the words),
    * each with its raw count and smoothed probability — the model
    * table an LM-based quality filter scores against.
    *
    * Determinism contract: every N₁₊ and count is an exact integer;
    * p_KN is ONE fixed-order double expression of them rounded to 6dp
    * — identical in any engine.
    *
    * Scale shape: one explode pass to corpus bigram counts (map-side
    * partials, bounded by distinct bigrams); the three N₁₊ statistics
    * all derive from that table (never a second corpus pass) — two
    * grid-keyed joins and one broadcast 1-row total; top-K is
    * TakeOrdered, never a global sort. */
  def kneserNeyBigrams(
      df: DataFrame,
      textCol: String,
      discountNum: Long = 3L,
      discountDen: Long = 4L,
      topK: Int = 100): DataFrame = {
    require(discountDen > 0 && discountNum >= 0 &&
      discountNum <= discountDen, "discount must lie in [0, 1]")
    require(topK >= 1 && topK <= 100000, "topK in [1, 100000]")
    val d = lit(discountNum.toDouble / discountDen.toDouble)
    val toks = TextFunctions.wsTokens(lower(col(textCol)))
    val c2 = Lineage.cutLocal(df.select(toks.as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(
        slice(col("__tk"), lit(1), size(col("__tk")) - 1).as("__vs"),
        slice(col("__tk"), lit(2), size(col("__tk")) - 1).as("__ws"))
      .select(explode(arrays_zip(col("__vs"), col("__ws"))).as("__p"))
      .groupBy(col("__p.__vs").as("w1"), col("__p.__ws").as("w2"))
      .agg(count(lit(1)).as("c")))
    val ctx = c2.groupBy("w1")
      .agg(sum(col("c")).as("__c1"), count(lit(1)).as("__nf"))
    val cont = c2.groupBy("w2").agg(count(lit(1)).as("__nb"))
    val total = broadcast(c2.agg(count(lit(1)).as("__nbi")))
    c2.join(ctx, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(total)
      .select(col("w1"), col("w2"), col("c"),
        round(
          (greatest(col("c").cast("double") - d, lit(0.0)) +
            d * col("__nf").cast("double") *
              (col("__nb").cast("double") / col("__nbi").cast("double"))) /
            col("__c1").cast("double"), 6).as("p_kn"))
      .orderBy(col("c").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** CCNet-style boilerplate line removal: drop every line that occurs
    * in more than `maxDf` distinct documents (navigation chrome, cookie
    * banners, footers — the lines a crawl repeats everywhere), and
    * reassemble each document from its surviving lines in original
    * order. The standard pre-dedup cleanup pass for web corpora.
    *
    * Scale shape: one narrow posexplode (lineage cut once — the frame
    * feeds both the frequency aggregate and the join probe), one
    * (doc,line)-distinct + per-line aggregate for document frequency,
    * and a flag join, BROADCAST by default. The broadcast is right when
    * the boilerplate set is chrome-sized (the common crawl case), but it
    * is NOT bounded by construction — at most total_distinct_lines /
    * (maxDf + 1) lines can exceed the cap, which at maxDf = 1 is half
    * the distinct lines (e.g. a corpus of mirrored page pairs). Pass
    * `broadcastFlags = false` there: the flag join becomes a shuffle
    * join on the line key instead of a driver collect. The per-doc
    * reassembly sorts (pos, line) structs inside the aggregation buffer
    * (array_sort of a collected list, native expressions only) — a
    * per-document cost, same contract as any per-doc text op. Documents
    * whose every line is boilerplate come back with empty `clean_text`,
    * and NULL-text docs come back with empty `clean_text` and zero
    * counts — never silently missing. A NULL doc contributes NOTHING to
    * the line frequencies (posexplode_outer emits a null-line row that
    * no join key matches), so a corpus full of NULL rows cannot flag
    * other documents' genuine blank lines as boilerplate. */
  def removeBoilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Long = 1,
      sep: String = "\n",
      broadcastFlags: Boolean = true): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode_outer(split(col(textCol),
        java.util.regex.Pattern.quote(sep), -1)).as(Seq("__pos", "__line")))
      .transform(Lineage.cutLocal)
    val boiler = lines.filter(col("__line").isNotNull)
      .select(col(idCol), col("__line")).distinct()
      .groupBy("__line").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__line"), lit(true).as("__boiler"))
    val keep = !col("__drop") && col("__line").isNotNull
    lines.join(if (broadcastFlags) broadcast(boiler) else boiler,
        Seq("__line"), "left")
      .withColumn("__drop", coalesce(col("__boiler"), lit(false)))
      .groupBy(col(idCol))
      .agg(
        array_join(
          sort_array(collect_list(when(keep,
            struct(col("__pos"), col("__line"))))).getField("__line"),
          sep).as("clean_text"),
        count(when(keep, 1)).as("n_lines_kept"),
        count(when(col("__drop"), 1)).as("n_lines_dropped"))
  }

  /** Distribution-drift diagnostic: KL(P || Q) between the unigram
    * token distributions of two corpora — the standard check that a
    * sampling/filtering step did not skew the data (P = the sample,
    * Q = the source). Vocabulary is restricted to P's tokens (for a
    * sample of Q every P-token exists in Q, so no smoothing is needed;
    * tokens of Q absent from P contribute zero to KL by definition).
    *
    * Scale shape: two token-count aggregations (map-side combined,
    * vocab-sized outputs), their totals as lazy broadcast 1-row
    * aggregates (no driver action), one vocab-sized join. Each count
    * frame feeds its total AND the join, so both are lineage-cut once
    * — vocab-sized, bounded materialization. Per-token terms round to
    * 10dp and sum as DECIMAL, so the scalar is summation-order
    * independent and engine-portable (the tq8 discipline).
    *
    * Returns one row: (kl_nats, n_tokens_p, n_tokens_q, shared_vocab). */
  def tokenKlDivergence(
      p: DataFrame,
      q: DataFrame,
      textCol: String): DataFrame = {
    def counts(df: DataFrame) = df
      .select(explode(TextFunctions.wsTokens(lower(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .transform(Lineage.cutLocal)
    val cp = counts(p)
    val cq = counts(q)
    val np = broadcast(cp.agg(sum(col("c")).as("np")))
    val nq = broadcast(cq.agg(sum(col("c")).as("nq")))
    cp.join(cq.select(col("tok"), col("c").as("cq")), "tok")
      .crossJoin(np).crossJoin(nq)
      .select(
        // operation order matches the SQL oracle exactly — IEEE double
        // arithmetic is order-sensitive in the last ulp
        round((col("c").cast("double") / col("np")) *
          log((col("c").cast("double") * col("nq")) /
            (col("cq").cast("double") * col("np"))), 10)
          .cast("decimal(28,10)").as("__term"),
        col("c"), col("np"), col("nq"))
      .agg(
        Readout.pin(sum(col("__term")).cast("double"), 6).as("kl_nats"),
        first(col("np")).as("n_tokens_p"),
        first(col("nq")).as("n_tokens_q"),
        count(lit(1)).as("shared_vocab"))
  }

  /** Pairwise Jensen–Shannon divergence between group unigram
    * distributions (Lin 1991) — the SYMMETRIC, always-finite companion
    * to [[tokenKlDivergence]] (KL needs shared support and an
    * ordering; JSD compares against the mixture M = (P+Q)/2, so a
    * token one side lacks contributes finitely instead of blowing up):
    *
    *   JSD(P, Q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),  m = (p+q)/2,
    *
    * in nats, 0 for identical distributions, ln 2 for disjoint ones —
    * the corpus-similarity matrix behind mixture design ("how far
    * apart are my sources/languages really").
    *
    * Determinism contract: each addend rounds to 10dp and sums as
    * DECIMAL (the tq8/KL discipline — token order differs between
    * engines); the ln operation order is written identically in the
    * oracle; zero-count sides contribute an exact 0 by CASE, never an
    * engine-specific ln(0).
    *
    * Scale shape: ONE (group, token) count pass (vocab-sized,
    * lineage-cut — it feeds both sides of every pair), a broadcast
    * |groups|²-pair frame joined twice on the group key, a full-outer
    * token align per pair, |groups|-row broadcast totals, one pair
    * aggregate. Returns
    * `(group_a, group_b, n_union, n_common, jsd_nats)` per pair. */
  def jensenShannon(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val cnt = Lineage.cutLocal(df
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(TextFunctions.wsTokens(lower(col(textCol)))).as("__tok"))
      .groupBy("__g", "__tok").agg(count(lit(1)).as("__c")))
    val totals = cnt.groupBy("__g").agg(sum("__c").as("__n"))
    val groups = totals.select(col("__g"), col("__n"))
    val pairs = broadcast(groups.select(col("__g").as("group_a"),
        col("__n").as("__na"))
      .crossJoin(groups.select(col("__g").as("group_b"),
        col("__n").as("__nb")))
      .filter(col("group_a") < col("group_b")))
    val left = pairs.join(cnt.select(col("__g").as("group_a"),
      col("__tok"), col("__c").as("__ca")), Seq("group_a"))
    val right = pairs.join(cnt.select(col("__g").as("group_b"),
      col("__tok"), col("__c").as("__cb")), Seq("group_b"))
    val aligned = left.select("group_a", "group_b", "__na", "__nb",
        "__tok", "__ca")
      .join(right.select("group_a", "group_b", "__tok", "__cb"),
        Seq("group_a", "group_b", "__tok"), "full_outer")
      // the pair totals ride the left frame; restore them on
      // right-only rows from the broadcast pair frame
      .drop("__na", "__nb")
      .join(pairs, Seq("group_a", "group_b"))
      .withColumn("__ca", coalesce(col("__ca"), lit(0L)))
      .withColumn("__cb", coalesce(col("__cb"), lit(0L)))
    val p = col("__ca").cast("double") / col("__na")
    val q = col("__cb").cast("double") / col("__nb")
    val m = (p + q) / 2.0
    val termP = when(col("__ca") > 0L,
      round(p * log(p / m), 10)).otherwise(lit(0.0))
    val termQ = when(col("__cb") > 0L,
      round(q * log(q / m), 10)).otherwise(lit(0.0))
    aligned
      .select(col("group_a"), col("group_b"),
        termP.cast("decimal(28,10)").as("__tp"),
        termQ.cast("decimal(28,10)").as("__tq"),
        col("__ca"), col("__cb"))
      .groupBy("group_a", "group_b")
      .agg(count(lit(1)).as("n_union"),
        count(when(col("__ca") > 0L && col("__cb") > 0L, 1)).as("n_common"),
        Readout.pin((sum(col("__tp")) + sum(col("__tq"))).cast("double") / 2.0, 6)
          .as("jsd_nats"))
      .orderBy("group_a", "group_b")
  }

  /** Corpus-health profile per group: Zipf slope and type-token ratio.
    * A natural-language corpus follows Zipf's law — log(freq) vs
    * log(rank) is near-linear with slope ≈ −1; machine-generated or
    * template-heavy slices deviate sharply, so the slope (fitted by
    * least squares over the top `topN` tokens) plus the type-token
    * ratio is the standard "does this slice look like language" gate.
    *
    * Scale shape: one (group, token)-count aggregation (map-side
    * combined, vocab-sized), lineage-cut once because it feeds both the
    * rank window and the TTR aggregate. The row_number window partitions
    * by group over the vocab-sized frame — never over the corpus — and
    * the final join is group-cardinality rows on both sides (broadcast).
    * Determinism discipline (the tq8/aq23 pattern): ranks tie-break on
    * token; per-row log terms round to 10dp and sum as DECIMAL (exact,
    * order-independent); the slope formula then runs in double with an
    * operation order written identically in the SQL oracle.
    *
    * Returns one row per group:
    * (groupCol, zipf_slope, n_types, n_tokens, ttr). */
  def zipfProfile(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = df
      .select(col(groupCol).as("__grp"),
        explode(TextFunctions.wsTokens(lower(col(textCol)))).as("__tok"))
      .groupBy("__grp", "__tok").agg(count(lit(1)).as("__c"))
      .transform(Lineage.cutLocal)
    val ttr = cnt.groupBy("__grp").agg(
      count(lit(1)).as("n_types"),
      sum(col("__c")).as("n_tokens"))
    val dec = (c: Column) => round(c, 10).cast("decimal(28,10)")
    val ranked = cnt
      .withColumn("__r", row_number().over(
        Window.partitionBy("__grp")
          .orderBy(col("__c").desc, col("__tok").asc)))
      .filter(col("__r") <= topN)
      .select(col("__grp"),
        round(log(col("__r").cast("double")), 10).as("__x"),
        round(log(col("__c").cast("double")), 10).as("__y"))
    // exact decimal sums of the rounded per-token terms, then the
    // closed-form least-squares slope in double — operation order
    // matches the SQL oracle exactly
    val sums = ranked.groupBy("__grp").agg(
      count(lit(1)).cast("double").as("__n"),
      round(sum(dec(col("__x"))).cast("double"), 8).as("__sx"),
      round(sum(dec(col("__y"))).cast("double"), 8).as("__sy"),
      round(sum(dec(col("__x") * col("__y"))).cast("double"), 8).as("__sxy"),
      round(sum(dec(col("__x") * col("__x"))).cast("double"), 8).as("__sxx"))
    // a degenerate group (one ranked token) has zero x-variance — the
    // fit is undefined; emit NULL, not a 0/0 NaN (engines disagree on
    // NaN hashing)
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    sums
      .select(col("__grp"),
        Readout.pin((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          when(den === 0.0, lit(null)).otherwise(den), 6)
          .as("zipf_slope"))
      .join(broadcast(ttr), "__grp")
      .select(col("__grp").as(groupCol), col("zipf_slope"),
        col("n_types"), col("n_tokens"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"))
  }

  /** Tokenizer-training pre-flight: the top-`topN` vocabulary by corpus
    * frequency with each token's cumulative corpus coverage — "how much
    * of the corpus does an N-token vocab explain" is the curve that
    * sizes a tokenizer's vocab (and flags template-heavy corpora, where
    * a tiny vocab covers nearly everything).
    *
    * Scale shape: one (token)-count aggregation (map-side combined,
    * vocab-sized), lineage-cut once because it feeds both the corpus
    * total and the top-N selection. The top-N is orderBy+limit —
    * Spark plans TakeOrderedAndProject (per-partition heaps + merge),
    * NOT a global sort of the vocabulary. The unpartitioned cumulative
    * window then runs over the ≤topN selected rows only — a bounded
    * frame, same contract as any driver-sized result. Counts stay
    * integer-exact until the single final division.
    *
    * Returns (rank, token, n_occurrences, cum_coverage), rank 1..topN
    * tie-broken on token. */
  def vocabCoverage(
      df: DataFrame,
      textCol: String,
      topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = df
      .select(explode(TextFunctions.wsTokens(lower(col(textCol))))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .transform(Lineage.cutLocal)
    val total = broadcast(cnt.agg(sum(col("n_occurrences")).as("__total")))
    val top = cnt
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(topN)
    val w = Window.orderBy(col("n_occurrences").desc, col("token").asc)
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col("n_occurrences"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(total)
      .select(col("rank"), col("token"), col("n_occurrences"),
        round(col("__cum").cast("double") / col("__total"), 6)
          .as("cum_coverage"))
  }

  /** Model-based quality scoring: a fixed linear model over the
    * engineered quality features (stopword ratio, log token count,
    * punctuation+digit noise, mean token length) squashed through a
    * sigmoid — the relational form of the fastText-classifier filtering
    * stage every LLM data pipeline runs (GPT-3/LLaMA-style quality
    * classifiers). Swap the weights for trained ones; the plan shape is
    * weight-independent.
    *
    * Scale shape: a pure per-row projection — no shuffle, no UDF, all
    * codegen'd built-ins; at 100 TB this is a map-only pass fused into
    * whatever scan feeds it. Engine-portability discipline: the logit
    * rounds to 10dp before the sigmoid and the score to 6dp after
    * (mean token length to 6dp before entering the logit — its list
    * fold is the one input whose summation order an external engine
    * could conceivably differ on). */
  def modelQualityScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bias: Double = -2.0,
      wStop: Double = 4.0,
      wLogLen: Double = 0.6,
      wNoise: Double = -6.0,
      wMtl: Double = 0.15,
      keepAt: Double = 0.5): DataFrame =
    df.select(col(idCol),
      modelScoreColumn(col(textCol), bias, wStop, wLogLen, wNoise, wMtl)
        .as("model_score"))
      .withColumn("keep", col("model_score") >= keepAt)

  /** The [[modelQualityScore]] sigmoid as a bare Column — lets a
    * curation chain FILTER on the score without a join (the score is a
    * per-row expression; re-deriving it is free, joining on it is a
    * shuffle). */
  def modelScoreColumn(
      txt: Column,
      bias: Double = -2.0,
      wStop: Double = 4.0,
      wLogLen: Double = 0.6,
      wNoise: Double = -6.0,
      wMtl: Double = 0.15): Column = {
    import graft.functions.TextFunctions._
    val nChars = length(txt).cast("double")
    val noise = when(nChars === 0, 0.0)
      .otherwise((punctCount(txt) + digitCount(txt)).cast("double") / nChars)
    val z = round(
      lit(bias) + lit(wStop) * wordRatio(txt, stopwords("en")) +
        lit(wLogLen) * log(lit(1.0) + tokenCount(txt).cast("double")) +
        lit(wNoise) * noise + lit(wMtl) * round(meanTokenLen(txt), 6), 10)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Per-source quality scorecard — the routing dashboard a curation
    * run emits per ingest feed: document count, mean model-quality
    * score ([[modelScoreColumn]], decimal-summed 6dp scores), the
    * fraction passing the 0.5 keep gate (mean of exact 0/1 doubles —
    * portable without decimal machinery), and total token volume.
    * The per-feed view that decides which sources get re-crawled,
    * down-weighted, or cut.
    *
    * Scale shape: the signals are per-row codegen expressions riding
    * the scan; ONE |sources|-ary aggregate with map-side partials —
    * no joins, no windows. */
  def sourceScorecard(
      df: DataFrame,
      sourceCol: String,
      textCol: String): DataFrame = {
    import graft.functions.TextFunctions._
    df.select(col(sourceCol).as("source"),
      modelScoreColumn(col(textCol)).as("__score"),
      tokenCount(col(textCol)).as("__words"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("__score").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("avg_score"),
        round(avg(when(col("__score") >= 0.5, 1.0).otherwise(0.0)), 4)
          .as("pass_rate"),
        sum(col("__words")).as("total_words"))
      .orderBy("source")
  }

  /** Gopher/RefinedWeb-style repetition signals per document
    * (cf. reference `nexus/` has no text analytics; this is a
    * training-data-pipeline extension): duplicate-token fraction and the
    * fraction of characters covered by the most frequent word bigram —
    * the standard boilerplate/repetition quality gates.
    *
    * Scale shape: token stats are pure array expressions (codegen, no
    * shuffle); the top-bigram needs per-(doc,bigram) counts, aggregated
    * with map-side partials, then a `min_by` on (-count, bigram) per doc
    * — an aggregation, NOT a row_number window, so there is no per-doc
    * sort and both shuffles partial-aggregate. Ties break to the
    * lexicographically smallest bigram.
    */
  def repetitionSignals(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val base = df.select(
      col(idCol),
      length(col(textCol)).as("__n_chars"),
      TextFunctions.wsTokens(lower(col(textCol))).as("__tk"))

    val stats = base.select(
      col(idCol),
      col("__n_chars"),
      size(col("__tk")).as("n_tokens"),
      size(array_distinct(col("__tk"))).as("__n_distinct"))

    val top = base
      .filter(size(col("__tk")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("__tk"), lit(1), size(col("__tk")) - 1),
        slice(col("__tk"), lit(2), size(col("__tk")) - 1))).as("z"))
      .select(col(idCol), concat_ws(" ", col("z.0"), col("z.1")).as("bigram"))
      .groupBy(col(idCol), col("bigram"))
      .agg(count(lit(1)).as("bn"))
      .groupBy(col(idCol))
      .agg(min_by(
        struct(col("bigram"), col("bn")),
        struct((-col("bn")).as("neg_bn"), col("bigram"))).as("top"))
      .select(col(idCol), col("top.bigram").as("__top_bigram"),
        col("top.bn").as("__top_n"))

    stats.join(top, Seq(idCol), "left").select(
      col(idCol),
      col("n_tokens"),
      round(when(col("n_tokens") === 0, 0.0).otherwise(
        lit(1.0) - col("__n_distinct").cast("double") / col("n_tokens")), 4)
        .as("dup_token_frac"),
      coalesce(col("__top_bigram"), lit("")).as("top_bigram"),
      coalesce(col("__top_n"), lit(0L)).as("top_bigram_n"),
      round(when(col("__n_chars") === 0 || col("__top_n").isNull, 0.0)
        .otherwise(col("__top_n") * length(col("__top_bigram")).cast("double")
          / col("__n_chars")), 4).as("top_bigram_frac"))
  }

  /** Per-document word-distribution entropy (nats) plus the ln(V)-
    * normalized variant — the information-theoretic repetition signal:
    * near 0 = one word dominates (boilerplate/spam), near ln(V) = flat
    * usage. Complements [[qualityRuleFilter]]'s ratio rules with a
    * measure that sees the WHOLE distribution, not just the mode.
    *
    * Exactness: each term `p·ln(p)` rounds to 10dp and sums as DECIMAL
    * (order-independent — the aq24 recipe); the normalizer divides the
    * unrounded sum by `ln(V)` with the identical expression both
    * engines, then rounds.
    *
    * Scale shape: two aggregates BOTH keyed on the doc id — the word
    * histogram and the entropy sum reuse one hash partitioning (AQE
    * sees co-partitioned joins); partition size is one document's
    * vocabulary. Nothing global, nothing quadratic. */
  def wordEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("__w"))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
      .transform(Lineage.cutLocal)
    val totals = counts.groupBy(col(idCol))
      .agg(sum("__c").as("__n"), count(lit(1)).as("n_distinct"))
    val p = col("__c").cast("double") / col("__n")
    counts.join(totals, Seq(idCol))
      .select(col(idCol), col("__n"), col("n_distinct"),
        round(p * log(p), 10).cast("decimal(28,10)").as("__e"))
      .groupBy(col(idCol), col("__n"), col("n_distinct"))
      .agg(sum(col("__e")).as("__s"))
      .select(col(idCol), col("__n").as("n_words"), col("n_distinct"),
        round((-col("__s")).cast("double"), 6).as("entropy_nats"),
        when(col("n_distinct") > 1,
          round((-col("__s")).cast("double") /
            log(col("n_distinct").cast("double")), 6))
          .otherwise(0.0).as("norm_entropy"))
      .orderBy(idCol)
  }

  /** Gopher-style composite quality filter with PER-RULE attribution
    * (Rae et al. 2021 §A1.1 quality heuristics; the reference `nexus/`
    * has no text analytics — training-data-pipeline extension). Each
    * document gets its measured signals, the comma-joined list of rules
    * it FAILED (stable order: wc, mwl, stop, rep, top), and the overall
    * `keep` verdict. Attribution is the point: at curation scale you
    * tune thresholds from the per-rule failure mix, not from a bare
    * keep-rate.
    *
    * Rules (inclusive bounds, evaluated on the ROUNDED signals so both
    * engines compare identical doubles):
    *   wc   — word count in [minWords, maxWords]
    *   mwl  — mean word length in [minMeanWordLen, maxMeanWordLen]
    *   stop — at least minStopHits stopword occurrences
    *   rep  — distinct-word ratio ≥ minDistinctRatio
    *   top  — most-frequent-word share ≤ maxTopShare
    *
    * Scale shape: ZERO shuffles — every signal is a per-row array
    * expression. The top-word share needs the per-doc word mode, which
    * is computed as the longest equal-run of the SORTED token array via
    * one `aggregate` HOF (linear in doc length, no explode, no
    * (doc, word) aggregate — compare [[repetitionSignals]], whose
    * bigram mode genuinely needs the two-level aggregate). The lambda
    * references only its accumulator and element, so the
    * CollapseProject×HOF re-evaluation trap (NOTES_BUILD) does not
    * apply. At 100 TB this is a single narrow map over the corpus.
    */
  def qualityRuleFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String],
      minWords: Int = 20,
      maxWords: Int = 90,
      minMeanWordLen: Double = 4.0,
      maxMeanWordLen: Double = 5.0,
      minStopHits: Int = 2,
      minDistinctRatio: Double = 0.35,
      maxTopShare: Double = 0.15): DataFrame = {
    val words = split(col(textCol), " ")
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    // longest equal-run over the sorted array == count of the mode word
    val topRun = expr(
      s"""aggregate(
         |  sort_array(split($textCol, ' ')),
         |  struct(cast('' as string) as prev, 0 as run, 0 as best),
         |  (a, x) -> struct(
         |    x as prev,
         |    if(x = a.prev, a.run + 1, 1) as run,
         |    greatest(a.best, if(x = a.prev, a.run + 1, 1)) as best),
         |  a -> a.best)""".stripMargin)

    val sig = df.select(
      col(idCol),
      size(words).as("n_words"),
      // single-space-joined corpus: alpha chars = length minus spaces;
      // translate() (not arithmetic on n_words) stays correct under
      // repeated separators
      length(translate(col(textCol), " ", "")).as("__n_alpha"),
      expr(s"size(filter(split($textCol, ' '), x -> x IN ($stopList)))")
        .as("stop_hits"),
      size(array_distinct(words)).as("__n_distinct"),
      topRun.as("__top_n"))
      .select(
        col(idCol), col("n_words"), col("stop_hits"),
        round(col("__n_alpha").cast("double") / col("n_words"), 4)
          .as("mean_wlen"),
        round(col("__n_distinct").cast("double") / col("n_words"), 4)
          .as("distinct_ratio"),
        round(col("__top_n").cast("double") / col("n_words"), 4)
          .as("top_share"))

    val failWc = col("n_words") < minWords || col("n_words") > maxWords
    val failMwl =
      col("mean_wlen") < minMeanWordLen || col("mean_wlen") > maxMeanWordLen
    val failStop = col("stop_hits") < minStopHits
    val failRep = col("distinct_ratio") < minDistinctRatio
    val failTop = col("top_share") > maxTopShare
    sig.select(
      col(idCol), col("n_words"), col("mean_wlen"), col("stop_hits"),
      col("distinct_ratio"), col("top_share"),
      concat_ws(",",
        when(failWc, "wc"), when(failMwl, "mwl"), when(failStop, "stop"),
        when(failRep, "rep"), when(failTop, "top")).as("fails"),
      (!(failWc || failMwl || failStop || failRep || failTop)).as("keep"))
      .orderBy(idCol)
  }

  /** Flesch readability signals per document (Flesch 1948; Kincaid et
    * al. 1975 grade-level re-fit — both public formulas; the reference
    * `nexus/` has no text analytics — training-data-pipeline extension).
    * Readability is a standard pretraining-corpus quality signal: filter
    * or stratify by how syntactically dense a document is.
    *
    * Signals (all integer counts, so the ratios are exact doubles):
    *   n_words     — whitespace tokens
    *   n_sentences — runs of sentence punctuation `[.!?]+`, floor 1
    *   n_syllables — per word, vowel-group runs `[aeiouy]+` (floor 1 —
    *                 the standard heuristic: "rhythm" still counts 1),
    *                 summed over the document
    *   flesch      — 206.835 − 1.015·(words/sentence) − 84.6·(syll/word)
    *   fk_grade    — 0.39·(words/sentence) + 11.8·(syll/word) − 15.59
    * Both scores compare on values rounded to 4dp so Spark and the
    * oracle agree bit-for-bit.
    *
    * Scale shape: ZERO shuffles — every signal is a per-row array /
    * regexp expression inside one codegen'd projection; at 100 TB this
    * is a single narrow map over the corpus. The syllable sum is an
    * `aggregate` HOF whose lambda touches only its own element, so the
    * CollapseProject×HOF re-evaluation trap (NOTES_BUILD) does not
    * apply. */
  def readability(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val words = split(col(textCol), " ")
    val nWords = size(words)
    // Vowel-group count per word, floor 1, summed with integer math.
    val syll = expr(
      s"""aggregate(split($textCol, ' '), 0L,
         |  (acc, w) -> acc + greatest(1,
         |      size(regexp_extract_all(w, '[aeiouy]+', 0))))""".stripMargin)
    val nSent = greatest(
      lit(1),
      size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")))
    val wps = col("n_words").cast("double") / col("n_sentences")
    val spw = col("n_syllables").cast("double") / col("n_words")
    df.select(col(idCol), nWords.as("n_words"), nSent.as("n_sentences"),
      syll.as("n_syllables"))
      .filter(col("n_words") > 0)
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        Readout.pin(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4)
          .as("flesch"),
        Readout.pin(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4)
          .as("fk_grade"))
      .orderBy(idCol)
  }

  /** Per-document TF-IDF keyword extraction: the top-`topK` terms of
    * each document by `tf · ln((N+1)/(df+1))` — the baseline topic
    * tagger a curation pipeline uses for routing, mixture labels, and
    * search facets (smoothed-idf form as in standard IR practice).
    * Ties break on the term; weights round to 6dp for output while the
    * RANKING runs on the raw doubles, which are bit-identical in any
    * engine (integer tf times ln of an integer ratio divided once in
    * double).
    *
    * Scale shape: (doc, term) tf counts shuffle on the pair key once;
    * the df frame aggregates off tf (vocabulary-sized, lineage-cut —
    * it feeds the join) and N rides as a broadcast 1-row aggregate.
    * The per-doc top-k is a doc-partitioned window, bounded by one
    * document's vocabulary. */
  def keywords(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("w"))
    val tf = Lineage.cutLocal(
      toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf")))
    val dfc = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = broadcast(docs.agg(count(lit(1)).as("__n")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("weight").desc, col("w"))
    tf.join(dfc, "w").crossJoin(nDocs)
      .withColumn("weight",
        col("tf") * log((col("__n") + 1) / (col("df") + 1)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("w").as("word"),
        col("tf"), round(col("weight"), 6).as("weight"))
      .orderBy("doc_id", "rank")
  }

  /** PMI collocations: the corpus's strongest two-word associations —
    * `pmi(x,y) = ln(p(x,y) / (p(x)·p(y)))` over adjacent-word bigrams,
    * the classic collocation-extraction signal (Church & Hanks 1990)
    * and a standard corpus-quality probe (template/boilerplate corpora
    * show degenerate PMI tails). Returns the top-k pairs with
    * `c_xy >= minCount` as `(w1, w2, c_xy, pmi)`, PMI rounded to 6dp,
    * ties broken on the words.
    *
    * Numeric contract: counts are exact longs; the PMI argument is one
    * integer-valued double product chain (exact below 2^53, the case
    * for any corpus whose `c_xy·N²` fits — document-scale counts), so
    * both engines take `ln` of the SAME double and 6dp rounding
    * agrees.
    *
    * Scale shape: tokens explode straight out of the scan twice (once
    * for unigrams, once for the bigram window) — deliberately NOT
    * lineage-cut: a token-level materialization is corpus-sized, while
    * the re-scan is a cheap pushdown projection. The bigram window
    * partitions on the doc id (bounded by one doc), both count
    * aggregates have map-side partials, totals ride as broadcast 1-row
    * aggregates, and the vocabulary joins are plain equi-joins AQE
    * broadcasts when the vocab is dimension-sized. Output is capped by
    * `minCount` + TakeOrdered — never a global sort of the pair space.
    */
  def pmiCollocations(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 5L,
      topK: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def toks = docs.select(col(idCol).as("__doc"),
      posexplode(split(col(textCol), " ")).as(Seq("__pos", "w")))
    val byDoc = Window.partitionBy("__doc").orderBy("__pos")
    val uni = Lineage.cutLocal(
      toks.groupBy("w").agg(count(lit(1)).as("c")))
    val bi = Lineage.cutLocal(
      toks.withColumn("w2", lead("w", 1).over(byDoc))
        .filter(col("w2").isNotNull)
        .groupBy(col("w").as("w1"), col("w2"))
        .agg(count(lit(1)).as("c_xy")))
    val nu = broadcast(uni.agg(sum("c").cast("double").as("__nu")))
    val nb = broadcast(bi.agg(sum("c_xy").cast("double").as("__nb")))
    bi.filter(col("c_xy") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("__cx")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("__cy")), "w2")
      .crossJoin(nu).crossJoin(nb)
      .withColumn("pmi", Readout.pin(log(
        (col("c_xy").cast("double") * col("__nu") * col("__nu")) /
          (col("__nb") * col("__cx").cast("double") *
            col("__cy").cast("double"))), 6))
      .select("w1", "w2", "c_xy", "pmi")
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Zipf rank-frequency fit (Zipf 1949) over the corpus vocabulary —
    * the distribution-health check: natural text's log-log
    * rank-frequency line has slope ≈ −1; template/boilerplate-heavy or
    * synthetic corpora bend it. OLS over the top-`topN` words'
    * `(ln rank, ln freq)`: returns ONE row
    * `(n_ranked, slope, intercept)`.
    *
    * Determinism contract: ranks break ties on the word; each ln term
    * rounds to 6dp and each product term to 10dp before DECIMAL
    * summation (order-independent — the tq8 discipline; both engines
    * ln() the same integer-valued double, the tq20 precedent); slope
    * is one double division of exact decimal differences, and the
    * intercept reuses the ROUNDED slope.
    *
    * Scale shape: one vocab-bounded word count, a TakeOrdered top-N
    * (no global sort), then all arithmetic on the ≤topN frame. */
  def zipfFit(
      docs: DataFrame,
      textCol: String,
      topN: Int = 1000): DataFrame = {
    require(topN >= 2 && topN <= 100000, "topN in [2, 100000]")
    import org.apache.spark.sql.expressions.Window
    val freqs = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(topN)
    // ≤topN rows: the no-partition rank window is bounded by the cap,
    // not by data (the aq20 dimension-frame reasoning)
    val terms = freqs
      .withColumn("rk", row_number().over(
        Window.orderBy(col("f").desc, col("w"))))
      .select(expr("round(ln(cast(rk as double)), 6)").as("lr"),
        expr("round(ln(cast(f as double)), 6)").as("lf"))
    val agg = terms.agg(
      count(lit(1)).as("n"),
      sum(col("lr").cast("decimal(18,6)")).as("sx"),
      sum(col("lf").cast("decimal(18,6)")).as("sy"),
      sum(expr("cast(round(lr * lf, 10) as decimal(28,10))")).as("sxy"),
      sum(expr("cast(round(lr * lr, 10) as decimal(28,10))")).as("sxx"))
    agg
      .withColumn("slope",
        when((col("n") * col("sxx") - col("sx") * col("sx")) =!= 0,
          Readout.pin((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double"), 6)))
      .select(col("n").as("n_ranked"), col("slope"),
        Readout.pin((col("sy").cast("double") -
          col("slope") * col("sx").cast("double")) / col("n"), 6)
          .as("intercept"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) over the
    * corpus: words are nodes, co-occurrence within a distance-2 window
    * (in any document) adds one parallel edge in each direction, and
    * [[Graph.pageRankKeyed]] ranks the graph — parallel-edge
    * multiplicity IS the co-occurrence weighting, so this is weighted
    * TextRank without a separate weight column. Adjacent duplicate
    * words produce no self-loops. Returns the top-`topK`
    * `(word, rank)` — the corpus' domain glossary.
    *
    * Tokenization contract: split on a single space with empty tokens
    * REMOVED and adjacency over the remaining sequence (the tq18
    * portable-split discipline — identical in the oracle).
    *
    * Scale shape: one per-doc window pass for adjacency (no global
    * sort), one edge shuffle, then pageRank's |V|-row-frame rounds;
    * rank comparisons are 12dp-pinned so top-K ties break on the word.
    */
  def textRank(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      iterations: Int = 3,
      damping: Double = 0.85,
      topK: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
      .filter(col("__w") =!= "")
    val w = Window.partitionBy("__doc").orderBy("__pos")
    val adj = toks.select(col("__w"),
      lead("__w", 1).over(w).as("__w1"),
      lead("__w", 2).over(w).as("__w2"))
    val pairs = adj
      .filter(col("__w1").isNotNull && col("__w") =!= col("__w1"))
      .select(col("__w").as("a"), col("__w1").as("b"))
      .unionByName(adj
        .filter(col("__w2").isNotNull && col("__w") =!= col("__w2"))
        .select(col("__w").as("a"), col("__w2").as("b")))
    // parallel edges pre-aggregate into integer weights: the word
    // graph shrinks ~6x and pageRankWeighted is bit-identical to the
    // repeated-edge formulation (exact decimal multiply)
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    Graph.pageRankWeighted(edges, iterations, damping)
      .select(col("node").as("word"), round(col("rank"), 10).as("rank"))
      .orderBy(col("rank").desc, col("word"))
      .limit(topK)
  }

  /** Unigram^(3/4) negative-sampling table (Mikolov et al. 2013,
    * word2vec): draw negatives with probability ∝ count^0.75 — the
    * exponent that up-weights rare words just enough. Builds the
    * capped-vocabulary sampling distribution and maps `draws`
    * deterministic pseudo-uniforms through its cumulative bounds —
    * the contrastive-pair sampler behind embedding training.
    *
    * Determinism contract: count^0.75 is the LIBM-FREE
    * √(c·√c) — IEEE sqrt is correctly rounded in every engine, so the
    * weight doubles are bit-identical — then 8dp-rounded into integer
    * weight units; cumulative bounds are EXACT decimal(38,0) sums in
    * token order (never a float running sum — engines disagree on
    * windowed double summation order); each draw's target is the
    * integer ⌊h·Z/2³²⌋ from the md5 32-bit uniform (the aq84/dq22
    * literal-free integer path), and bucket lookup is
    * lo ≤ target < hi. No float comparison anywhere.
    *
    * Scale shape: one token-count pass (map-side combined), TakeOrdered
    * vocab cap, a VOCAB-SIZED single-partition cumsum window (bounded
    * by `vocabSize` by contract), the vocab broadcast against the
    * distributed draw frame (range lookup per draw), one draw-count
    * aggregate. Returns `(token, n_draws, share)` for the `topK`
    * most-drawn tokens (count desc, token asc). */
  def negativeSamplingTable(
      df: DataFrame,
      textCol: String,
      vocabSize: Int = 1000,
      draws: Int = 10000,
      topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(vocabSize >= 1 && vocabSize <= 1000000,
      "vocabSize in [1, 1e6] — the cumsum window is vocab-sized")
    require(draws >= 1, "need at least one draw")
    val dec = "decimal(38,0)"
    val cnt = df
      .select(explode(TextFunctions.wsTokens(lower(col(textCol))))
        .as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__c"))
    val top = cnt.orderBy(col("__c").desc, col("__tok")).limit(vocabSize)
    val cD = col("__c").cast("double")
    val wu = (round(sqrt(cD * sqrt(cD)), 8).cast("decimal(28,8)") *
      lit(100000000L)).cast(dec)
    val w = Window.orderBy("__tok")
      .rowsBetween(Window.unboundedPreceding, 0)
    val vocab = Lineage.cutLocal(top
      .withColumn("__wu", wu)
      .withColumn("__hi", sum(col("__wu")).over(w).cast(dec))
      .withColumn("__lo", (col("__hi") - col("__wu")).cast(dec)))
    val z = broadcast(vocab.agg(max(col("__hi")).as("__z")))
    val h = conv(substring(md5(concat(lit("neg:"),
      col("id").cast("string"))), 1, 8), 16, 10).cast("long")
    // h32 is materialized first so the md5 appears once in the plan
    val withH = df.sparkSession.range(draws.toLong)
      .select(col("id"), h.as("h32"))
      .crossJoin(z)
      .select(col("id").as("__s"),
        expr(s"(cast(h32 as $dec) * __z) div 4294967296").as("__tgt"))
    val mapped = withH.join(broadcast(vocab),
      col("__tgt") >= col("__lo") && col("__tgt") < col("__hi"))
    val counts = mapped.groupBy("__tok")
      .agg(count(lit(1)).as("n_draws"))
    counts
      .join(broadcast(vocab.select(col("__tok"), col("__wu"))),
        Seq("__tok"))
      .crossJoin(z)
      .select(col("__tok").as("token"), col("n_draws"),
        round(col("__wu").cast("double") /
          when(col("__z") > lit(0L).cast(dec),
            col("__z").cast("double")), 6).as("share"))
      .orderBy(col("n_draws").desc, col("token"))
      .limit(topK)
  }

  /** Heaps'-law vocabulary-growth fit (Heaps 1978) — V(N) ≈ K·N^β over
    * a fixed grid of corpus checkpoints: how fast does the vocabulary
    * grow as the corpus grows? β ≈ 0.4–0.6 is natural text; β near 0
    * is a closed/templated vocabulary; β near 1 is id-like noise
    * tokens. The tokenizer-sizing companion to [[vocabCoverage]]
    * (coverage sizes a vocab for TODAY's corpus; Heaps extrapolates
    * what the next 10× of data will add).
    *
    * Checkpoints are id-prefix cuts c_k = ⌊maxId·k/P⌋ — a token's
    * FIRST-seen doc id decides when it enters the vocabulary, so
    * V(c) = |{w : firstSeen(w) ≤ c}| needs no ordered scan, just one
    * min-aggregate and a P-way broadcast fanout. The fit is the
    * zipfProfile least-squares discipline over the ≤P (ln N, ln V)
    * points (10dp-rounded coordinates, exact decimal sums, closed-form
    * slope; the intercept derives from the ROUNDED β and is reported
    * as ln K — no engine-varying exp in the readout).
    *
    * Scale shape: one token explode + min-aggregate (vocab-sized), one
    * doc-length projection, two broadcast non-equi fanouts against the
    * P-row checkpoint frame (map-side partials into P cells), a P-row
    * fit. Returns one row per checkpoint:
    * `(checkpoint, n_tokens, vocab, beta, log_k)` with the fit
    * repeated per row (the benford pattern). */
  def heapsFit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 2, "need at least 2 checkpoints")
    val toks = TextFunctions.wsTokens(lower(col(textCol)))
    val docLens = Lineage.cutLocal(df.select(
      col(idCol).cast("long").as("__id"), size(toks).cast("long").as("__nt")))
    val firstSeen = Lineage.cutLocal(df
      .select(col(idCol).cast("long").as("__id"), explode(toks).as("__tok"))
      .groupBy("__tok").agg(min("__id").as("__first")))
    val cps = Lineage.cutLocal(docLens.agg(max("__id").as("__mx"))
      .select(explode(expr(
        s"transform(sequence(1, $checkpoints), k -> (__mx * k) div $checkpoints)"))
        .as("checkpoint"))
      .dropDuplicates("checkpoint"))
    val nAt = docLens.join(broadcast(cps), col("__id") <= col("checkpoint"))
      .groupBy("checkpoint").agg(sum("__nt").as("n_tokens"))
    val vAt = firstSeen.join(broadcast(cps), col("__first") <= col("checkpoint"))
      .groupBy("checkpoint").agg(count(lit(1)).as("vocab"))
    val pts = nAt.join(vAt, Seq("checkpoint"))
      .filter(col("n_tokens") > 0L && col("vocab") > 0L)
      .select(col("checkpoint"), col("n_tokens"), col("vocab"),
        round(log(col("n_tokens").cast("double")), 10).as("__x"),
        round(log(col("vocab").cast("double")), 10).as("__y"))
      .transform(Lineage.cutLocal)
    val dec = (c: Column) => round(c, 10).cast("decimal(28,10)")
    val sums = pts.agg(
      count(lit(1)).cast("double").as("__n"),
      round(sum(dec(col("__x"))).cast("double"), 8).as("__sx"),
      round(sum(dec(col("__y"))).cast("double"), 8).as("__sy"),
      round(sum(dec(col("__x") * col("__y"))).cast("double"), 8).as("__sxy"),
      round(sum(dec(col("__x") * col("__x"))).cast("double"), 8).as("__sxx"))
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    // fewer than 2 points has no slope — and with ONE nonzero point
    // the rounded sums leave den a hair off exact zero, so the count
    // guard is explicit, not inferred from den
    // Readout.pin, not bare round: on a constant-vocab corpus the true
    // slope is zero and the numerator lands at a tiny NEGATIVE — the
    // engines then disagree on the rounded zero's sign (see Readout).
    val fit = sums.select(
      Readout.pin((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
        when(col("__n") < 2.0 || den === 0.0, lit(null)).otherwise(den),
        6).as("beta"),
      col("__n"), col("__sx"), col("__sy"))
    pts.crossJoin(broadcast(fit))
      .select(col("checkpoint"), col("n_tokens"), col("vocab"),
        col("beta"),
        Readout.pin((col("__sy") - col("beta") * col("__sx")) / col("__n"), 6)
          .as("log_k"))
      .orderBy("checkpoint")
  }

  /** Token burstiness — the Fano factor (variance-to-mean ratio) of
    * each token's per-document counts over the WHOLE corpus (absent
    * docs count as zero): function words spread evenly (Fano ≈ 1,
    * Poisson-like); content/template tokens clump into few documents
    * (Fano ≫ 1). The Church & Gale (1995) observation turned into a
    * corpus screen: a topical keyword list for the dictionary-free,
    * and a template detector when boilerplate tokens burst.
    *
    *   Fano(w) = (Σc²/D − (C/D)²) / (C/D),   C = Σc over docs, D docs.
    *
    * Determinism contract: C, Σc², and D are exact integers (Σc² rides
    * decimal(38,0)); Fano is one fixed-order double expression rounded
    * to 6dp; output order is (C desc, token) with a top-N cut.
    *
    * Scale shape: one (doc, token) count aggregate (map-side
    * combined), one token aggregate over it, a broadcast 1-row D, and
    * a TakeOrdered top-N — nothing data-sized past the first
    * aggregate. Returns `(token, n_docs, n_total, fano)`. */
  def burstiness(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topN: Int = 100): DataFrame = {
    require(topN >= 1, "topN must be at least 1")
    val cells = df
      .select(col(idCol).as("__id"),
        explode(TextFunctions.wsTokens(lower(col(textCol)))).as("__tok"))
      .groupBy("__id", "__tok").agg(count(lit(1)).as("__c"))
    val perTok = cells.groupBy(col("__tok").as("token")).agg(
      count(lit(1)).as("n_docs"),
      sum("__c").as("n_total"),
      sum((col("__c").cast("decimal(19,0)") * col("__c").cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("__s2"))
    val d = broadcast(df.agg(count(lit(1)).as("__d")))
    val mean = col("n_total").cast("double") / col("__d").cast("double")
    perTok.crossJoin(d)
      .select(col("token"), col("n_docs"), col("n_total"),
        Readout.pin((col("__s2").cast("double") / col("__d").cast("double") -
          mean * mean) / mean, 6).as("fano"))
      .orderBy(col("n_total").desc, col("token"))
      .limit(topN)
  }

  /** Bigram conditional entropy rate per group — the
    * predictability-of-the-next-word readout H(W₂|W₁) beside the
    * marginal entropy H(W₁), and their ratio (1 = the corpus is
    * memoryless; → 0 = highly templated). The corpus-health metric
    * that catches boilerplate a unigram profile misses: template-heavy
    * sources keep a normal vocabulary but collapse the CONDITIONAL
    * entropy.
    *
    *   H(W₂|W₁) = Σ (c₁₂/N)·ln(c₁/c₁₂),
    *   H(W₁)    = Σ (c₁/N)·ln(N/c₁),
    *
    * over the bigram multiset (N bigrams per group; c₁ the
    * left-margin count re-aggregated from the SAME cell frame).
    *
    * Determinism contract: the mutualInformation discipline — counts
    * exact, each addend one fixed-order double rounded to 10dp
    * decimal (cell order differs between engines), readouts rounded
    * to 6dp, the ratio derived from the ROUNDED entropies with a
    * NULL-guarded denominator.
    *
    * Scale shape: one (group, w₁, w₂) count aggregate over the corpus
    * (map-side combined, bigram-vocab-sized), margins and entropies
    * re-aggregated from that one lineage-cut frame — never a second
    * data pass. Returns one row per group:
    * `(group, n_bigrams, h_cond, h_marginal, h_ratio)`. */
  def entropyRate(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val toks = TextFunctions.wsTokens(lower(col(textCol)))
    // the bigramNll zip idiom: two slices + arrays_zip + explode — one
    // vectorized pass, no per-element element_at lambda (the HOF
    // formulation measured ~7× slower on the same corpus)
    val cells = Lineage.cutLocal(df
      .select(col(groupCol).as("__g"), toks.as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col("__g"),
        slice(col("__tk"), lit(1), size(col("__tk")) - 1).as("__vs"),
        slice(col("__tk"), lit(2), size(col("__tk")) - 1).as("__ws"))
      .select(col("__g"), explode(arrays_zip(col("__vs"), col("__ws")))
        .as("__p"))
      .groupBy(col("__g"), col("__p.__vs").as("__w1"),
        col("__p.__ws").as("__w2"))
      .agg(count(lit(1)).as("__c12")))
    val m1 = Lineage.cutLocal(
      cells.groupBy("__g", "__w1").agg(sum("__c12").as("__c1")))
    val nF = m1.groupBy("__g").agg(sum("__c1").as("__nb"))
    val dec10 = (c: Column) => round(c, 10).cast("decimal(28,10)")
    val hc = cells
      .join(m1, Seq("__g", "__w1"))
      .join(broadcast(nF), Seq("__g"))
      .select(col("__g"),
        dec10((col("__c12").cast("double") / col("__nb")) *
          log(col("__c1").cast("double") / col("__c12"))).as("__t"))
      .groupBy("__g")
      .agg(round(sum(col("__t")).cast("double"), 6).as("h_cond"))
    val hm = m1
      .join(broadcast(nF), Seq("__g"))
      .select(col("__g"),
        dec10((col("__c1").cast("double") / col("__nb")) *
          log(col("__nb").cast("double") / col("__c1"))).as("__t"))
      .groupBy("__g")
      .agg(round(sum(col("__t")).cast("double"), 6).as("h_marginal"))
    nF.join(hc, Seq("__g")).join(hm, Seq("__g"))
      .select(col("__g").as(groupCol), col("__nb").as("n_bigrams"),
        col("h_cond"), col("h_marginal"),
        round(col("h_cond") /
          when(col("h_marginal") > 0.0, col("h_marginal")), 6)
          .as("h_ratio"))
      .orderBy(groupCol)
  }

  /** Good–Turing frequency re-estimation (Good 1953; Turing's WWII
    * cryptanalysis estimator) — the count-of-counts table with the
    * Turing-adjusted counts and the unseen-mass estimate, the
    * smoothing backbone under Katz backoff and the sanity readout for
    * any corpus LM ([[kneserNey]] is the bigram cousin; this is the
    * unigram "how much probability belongs to words we have never
    * seen"):
    *
    *   N_r = |{w : c(w) = r}|,   r* = (r+1)·N_{r+1}/N_r,
    *   P₀ = N₁/N   (total tokens N).
    *
    * Only the low-count region (`r ≤ maxR`, default 30) is reported —
    * beyond it N_r is sparse and the raw counts are already reliable
    * (the standard Katz cutoff); r* is NULL when N_{r+1} = 0 (the
    * estimator is undefined there, not zero).
    *
    * Determinism contract: everything is exact integers until the two
    * final divisions (r*, P₀), each ONE fixed-order double rounded to
    * 6dp — no logs, no smoothing regression, nothing engine-varying.
    *
    * Scale shape: one token-count aggregate (map-side combined,
    * vocab-sized), one count-of-counts aggregate over the vocab frame
    * (grid-sized — distinct r values), a self-join on r+1 over the
    * ≤maxR rows and two broadcast 1-row totals. Returns one row per
    * observed r ≤ maxR: `(r, n_r, n_r_next, r_star, p_unseen)`
    * (p_unseen repeated per row, the benford chi2_total pattern). */
  def goodTuring(
      df: DataFrame,
      textCol: String,
      maxR: Int = 30,
      ngram: Int = 1): DataFrame = {
    require(maxR >= 1, "maxR must be at least 1")
    require(ngram >= 1, "ngram must be at least 1")
    val toks = TextFunctions.wsTokens(lower(col(textCol)))
    // the unit is the word n-gram MULTISET (counts matter — shingleSet
    // would dedup per doc and corrupt the frequency table); a doc
    // shorter than n contributes nothing. Grams come from n shifted
    // slices zipped together (the bigramNll idiom — one vectorized
    // pass; the per-element transform/element_at HOF measured ~7×
    // slower on the same corpus).
    val gramRows = if (ngram == 1) df.select(explode(toks).as("__tok"))
      else {
        val sliced = df.select(toks.as("__tk"))
          .filter(size(col("__tk")) >= ngram)
          .select((0 until ngram).map(j =>
            slice(col("__tk"), lit(j + 1),
              size(col("__tk")) - (ngram - 1)).as(s"__s$j")): _*)
        val zipped = arrays_zip((0 until ngram).map(j => col(s"__s$j")): _*)
        sliced.select(explode(zipped).as("__p"))
          .select(concat_ws(" ",
            (0 until ngram).map(j => col(s"__p.__s$j")): _*).as("__tok"))
      }
    val counts = Lineage.cutLocal(
      gramRows.groupBy("__tok").agg(count(lit(1)).as("__c")))
    val cof = Lineage.cutLocal(
      counts.groupBy(col("__c").as("r")).agg(count(lit(1)).as("n_r")))
    val totals = broadcast(counts.agg(sum("__c").as("__N")))
    val n1 = broadcast(cof.filter(col("r") === 1L)
      .agg(coalesce(sum("n_r"), lit(0L)).as("__n1")))
    val next = cof.select((col("r") - 1L).as("r"), col("n_r").as("__nr1"))
    cof.filter(col("r") <= maxR)
      .join(next, Seq("r"), "left")
      .crossJoin(totals)
      .crossJoin(n1)
      .select(col("r"), col("n_r"),
        coalesce(col("__nr1"), lit(0L)).as("n_r_next"),
        when(col("__nr1").isNotNull, round(
          ((col("r") + 1L) * col("__nr1")).cast("double") /
            col("n_r").cast("double"), 6)).as("r_star"),
        round(col("__n1").cast("double") / col("__N").cast("double"), 6)
          .as("p_unseen"))
      .orderBy("r")
  }

  /** Chao1 species-richness estimate per group (Chao 1984) — "how much
    * vocabulary haven't we seen yet": observed distinct tokens plus
    * the singleton/doubleton correction
    *
    *   Ĉ = V + n₁(n₁−1) / (2(n₂+1))
    *
    * (the bias-corrected form — defined even with zero doubletons).
    * The coverage companion to [[goodTuring]]'s unseen-mass P₀ and
    * [[heapsFit]]'s growth exponent: Good–Turing prices the NEXT
    * token, Heaps extrapolates the trend, Chao1 bounds the TOTAL —
    * "is this source's vocabulary nearly exhausted or barely
    * sampled", per source, before committing crawl budget.
    *
    * Determinism contract: V, n₁, n₂ are exact integer counts from
    * one (group, token) aggregate; the estimate is one pinned double
    * expression rounded at 6dp.
    *
    * Scale shape: one token pass to the (group, token) count frame,
    * one grouped readout — nothing pairwise, nothing collected. */
  def chao1(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val counts = df
      .select(col(groupCol).as("__g"),
        explode(TextFunctions.wsTokens(lower(col(textCol)))).as("__t"))
      .groupBy("__g", "__t").agg(count(lit(1)).as("__c"))
    counts.groupBy(col("__g").as(groupCol)).agg(
      count(lit(1)).as("vocab"),
      count(when(col("__c") === 1L, 1L)).as("n1"),
      count(when(col("__c") === 2L, 1L)).as("n2"))
      .select(col(groupCol), col("vocab"), col("n1"), col("n2"),
        round(col("vocab").cast("double") +
          col("n1").cast("double") * (col("n1") - 1L).cast("double") /
            (lit(2.0) * (col("n2") + 1L).cast("double")), 6)
          .as("chao1"))
      .orderBy(groupCol)
  }

  /** Pairwise vocabulary overlap between groups — "which sources share
    * a lexicon": Jaccard of the groups' DISTINCT token sets, from ONE
    * token-keyed self-join (tokens appearing in both groups meet on
    * the token key; the output is group-pair-sized). The planning
    * readout before cross-source dedup — high-overlap pairs are where
    * near-dup candidates concentrate — and the set-based complement
    * to [[tokenKlDivergence]]/[[jensenShannon]]'s distributional
    * drift (which weight by frequency; this asks only who SHARES
    * words).
    *
    * Determinism contract: set sizes and intersections are exact
    * integer counts; Jaccard is one division rounded at 6dp; pairs
    * are emitted once with group_a < group_b.
    *
    * Scale shape: one token pass to the distinct (group, token)
    * frame, one token-keyed equi-join (group-count-bounded fan-out
    * per token), one pair aggregate. */
  def vocabOverlap(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val toks = Lineage.cutLocal(df
      .select(col(groupCol).cast("string").as("__g"),
        explode(TextFunctions.wsTokens(lower(col(textCol)))).as("__t"))
      .distinct())
    val sizes = broadcast(toks.groupBy(col("__g").as("__sg"))
      .agg(count(lit(1)).as("__n")))
    val inter = toks.as("a")
      .join(toks.as("b"),
        col("a.__t") === col("b.__t") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("group_a"), col("b.__g").as("group_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(sizes.select(col("__sg").as("group_a"), col("__n").as("n_a")),
        Seq("group_a"))
      .join(sizes.select(col("__sg").as("group_b"), col("__n").as("n_b")),
        Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 6)
          .as("jaccard"))
      .orderBy("group_a", "group_b")
  }

  /** Standardized type-token ratio (STTR, Johnson 1944) per group —
    * lexical diversity that raw TTR can't give across documents of
    * different lengths (TTR falls with length by Heaps' law, so a
    * long doc always looks "less diverse"): each document is cut into
    * fixed `chunk`-token windows, the trailing partial window is
    * dropped, TTR = distinct/chunk is computed per window, and the
    * group readout is the MEAN window TTR — length-comparable across
    * sources, the repetitive-template detector that complements
    * [[wordEntropy]] (frequency-weighted) with a coverage-weighted
    * view.
    *
    * Determinism contract: per-window distinct counts are exact;
    * each window TTR = distinct/chunk is one division rounded to 6dp
    * decimal(18,6) BEFORE the window-order-independent group sum (the
    * tq8 discipline); the mean reads out at 6dp. Groups with no full
    * window are absent (nothing to standardize over).
    *
    * Scale shape: one positional token pass, one (doc, window)
    * distinct aggregate, one group readout — windows derive from the
    * in-doc position, so nothing global orders anything. */
  def sttr(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      chunk: Int = 100): DataFrame = {
    require(chunk >= 2, "chunk must be at least 2")
    val toks = df.select(col(groupCol).as("__g"), col(idCol).as("__doc"),
      posexplode(TextFunctions.wsTokens(lower(col(textCol))))
        .as(Seq("__pos", "__w")))
    val wins = toks
      .withColumn("__win", (col("__pos") / chunk).cast("long"))
      .groupBy("__g", "__doc", "__win")
      .agg(count(lit(1)).as("__nt"),
        countDistinct(col("__w")).as("__dt"))
      .filter(col("__nt") === chunk.toLong) // full windows only
    wins.groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(round(col("__dt").cast("double") / chunk.toDouble, 6)
          .cast("decimal(18,6)")).as("__st"))
      .select(col(groupCol), col("n_windows"),
        round(col("__st").cast("double") /
          col("n_windows").cast("double"), 6).as("sttr"))
      .orderBy(groupCol)
  }

  /** Simpson diversity of the token distribution per group — the
    * unbiased concentration index λ = Σc(c−1) / (N(N−1)) ("the
    * probability two tokens drawn WITHOUT replacement are the same
    * type", Simpson 1949; Herfindahl's ecology twin) and its inverse
    * 1/λ, the EFFECTIVE vocabulary size — "this source uses 40k
    * distinct words but concentrates like a 900-word vocabulary".
    * Entropy ([[wordEntropy]]) weights the long tail logarithmically;
    * Simpson is dominated by the head — boilerplate and template
    * saturation move it first, which is why it's the concentration
    * alarm in a source scorecard.
    *
    * Determinism contract: Σc(c−1) rides decimal(38,0) (exact,
    * order-independent) and N is an exact count, so λ is ONE double
    * division rounded at 6dp; 1/λ guards λ > 0 (an all-singleton
    * sample has λ = 0 — unbounded effective vocabulary, NULL).
    *
    * Scale shape: one token pass to the (group, token) count frame,
    * one grouped readout — [[chao1]]'s shape exactly. */
  def simpsonDiversity(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = df
      .select(col(groupCol).as("__g"),
        explode(TextFunctions.wsTokens(lower(col(textCol)))).as("__t"))
      .groupBy("__g", "__t").agg(count(lit(1)).as("__c"))
    counts.groupBy(col("__g").as(groupCol)).agg(
      count(lit(1)).as("vocab"),
      sum("__c").as("n_tokens"),
      sum((col("__c").cast(dec) * (col("__c") - 1L).cast(dec)).cast(dec))
        .as("__rep"))
      .filter(col("n_tokens") >= 2L)
      .select(col(groupCol), col("vocab"), col("n_tokens"), {
        val lam = col("__rep").cast("double") /
          (col("n_tokens").cast(dec) *
            (col("n_tokens") - 1L).cast(dec)).cast("double")
        round(lam, 6).as("simpson")
      })
      .withColumn("effective_vocab",
        round(lit(1.0) / when(col("simpson") > 0.0, col("simpson")), 6))
      .orderBy(groupCol)
  }

  /** Duplicated-n-gram repetition profile per document — the
    * C4/RefinedWeb "repetitious content" family: of a document's
    * positional n-gram OCCURRENCES, what fraction belong to an n-gram
    * that occurs at least twice IN THE SAME DOCUMENT. Machine-looped
    * text (keyword stuffing, template spam) scores near 1, natural
    * prose near 0 — a core crawl-quality gate beside the ratio
    * profile in [[qualityProfile]].
    *
    * Determinism contract: counts are exact integers from one
    * positional n-gram pass (NON-distinct, unlike the dedup shingle
    * set); the ratio is one pinned double per doc.
    *
    * Scale shape: one explode + two grouped aggregates keyed by
    * (doc, gram) then doc — everything partitions by document, no
    * window, no driver state. Returns
    * `(id, n_grams, n_dup_occurrences, dup_ratio)` for docs with at
    * least one n-gram. */
  def dupNgramStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, "n-gram size must be positive")
    val toks = graft.functions.TextFunctions.wsTokens(lower(col(textCol)))
    val grams = df
      .select(col(idCol).as("__id"), toks.as("__tk"))
      .filter(size(col("__tk")) >= n)
      .select(col("__id"), explode(
        transform(sequence(lit(0), size(col("__tk")) - n),
          i => array_join(slice(col("__tk"), i + 1, lit(n)), " ")))
        .as("__gr"))
    grams.groupBy("__id", "__gr").agg(count(lit(1)).as("__c"))
      .groupBy(col("__id").as(idCol))
      .agg(sum("__c").as("n_grams"),
        sum(when(col("__c") >= 2L, col("__c")).otherwise(0L))
          .as("n_dup_occurrences"))
      .select(col(idCol), col("n_grams"), col("n_dup_occurrences"),
        Readout.pin(col("n_dup_occurrences").cast("double") /
          col("n_grams").cast("double"), 6).as("dup_ratio"))
      .orderBy(idCol)
  }

  /** Pairwise Hellinger distance between group unigram distributions —
    * the BOUNDED, metric companion to [[jensenShannon]] (JSD is a
    * divergence; Hellinger is a true metric in [0, 1], the form
    * mixture-design optimizers want as an actual distance):
    *
    *   BC(P, Q) = Σ √(p·q)   (the Bhattacharyya coefficient),
    *   H(P, Q)  = √(1 − BC),
    *
    * 0 for identical distributions, 1 for disjoint support. Only
    * SHARED tokens contribute to BC (√(p·q) = 0 when either side is
    * 0), so the align join is INNER — strictly cheaper than JSD's
    * full-outer over the union vocab; pairs with NO shared tokens are
    * restored from the broadcast pair frame afterwards (BC = 0,
    * H = 1) so disjoint sources stay visible in the matrix.
    *
    * Determinism contract: each √(p·q) addend rounds to 10dp and sums
    * as DECIMAL (token order differs between engines — the KL/JSD
    * discipline); per-term rounding can push BC a hair past 1 on
    * near-identical distributions, so 1 − BC clamps at 0 on BOTH
    * sides before the √ (never an engine NaN).
    *
    * Scale shape: the [[jensenShannon]] shape minus the full-outer —
    * one (group, token) count pass (vocab-sized, lineage-cut),
    * broadcast |groups|² pairs, an inner token align per pair, one
    * pair aggregate. Returns
    * `(group_a, group_b, n_common, bc, hellinger)` per pair. */
  def hellinger(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val cnt = Lineage.cutLocal(df
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(TextFunctions.wsTokens(lower(col(textCol)))).as("__tok"))
      .groupBy("__g", "__tok").agg(count(lit(1)).as("__c")))
    val totals = cnt.groupBy("__g").agg(sum("__c").as("__n"))
    val pairs = broadcast(totals.select(col("__g").as("group_a"),
        col("__n").as("__na"))
      .crossJoin(totals.select(col("__g").as("group_b"),
        col("__n").as("__nb")))
      .filter(col("group_a") < col("group_b")))
    val term = sqrt((col("__ca").cast("double") / col("__na")) *
      (col("__cb").cast("double") / col("__nb")))
    val shared = pairs
      .join(cnt.select(col("__g").as("group_a"), col("__tok"),
        col("__c").as("__ca")), Seq("group_a"))
      .join(cnt.select(col("__g").as("group_b"), col("__tok"),
        col("__c").as("__cb")), Seq("group_b", "__tok"))
      .select(col("group_a"), col("group_b"),
        round(term, 10).cast("decimal(28,10)").as("__t"))
      .groupBy("group_a", "group_b")
      .agg(count(lit(1)).as("__nc"), sum(col("__t")).as("__bcs"))
    val bc = coalesce(col("__bcs").cast("double"), lit(0.0))
    pairs.select("group_a", "group_b")
      .join(shared, Seq("group_a", "group_b"), "left")
      .select(col("group_a"), col("group_b"),
        coalesce(col("__nc"), lit(0L)).as("n_common"),
        Readout.pin(bc, 6).as("bc"),
        Readout.pin(
          sqrt(when(lit(1.0) - bc > 0.0, lit(1.0) - bc).otherwise(0.0)),
          6).as("hellinger"))
      .orderBy("group_a", "group_b")
  }

  /** Pairwise 1-D earth mover's distance (Wasserstein-1) between group
    * distributions of a discrete numeric signal (document length,
    * score grid) — the distribution distance that knows the VALUE
    * AXIS: JSD/Hellinger see "different bins"; EMD sees HOW FAR the
    * mass moved, in the signal's own units (the Ramdas et al. 2017
    * univariate form):
    *
    *   EMD(P, Q) = ∫ |F_P(v) − F_Q(v)| dv
    *             = Σ_v |F_P(v) − F_Q(v)| · (next(v) − v).
    *
    * Determinism contract: the CDF gap is carried as the EXACT integer
    * |cumA·n_b − cumB·n_a| (cross-multiplied cumulative counts — the
    * [[Stats.ksTest]] trick; the common denominator never
    * materializes as a float), each gap×width term is an exact
    * decimal(38,0) product, and the single division by n_a·n_b
    * happens once at the readout, pinned to 6dp. No per-term float
    * rounding anywhere.
    *
    * Scale shape: one (group, value) count pass (grid-sized — the
    * measurement grid, never row count), broadcast |groups|² pairs, a
    * full-outer value align per pair (both CDFs must step at every
    * union grid point), a per-PAIR ordered window over the grid
    * (partitioned by pair — never a global sort), one pair aggregate.
    * Returns `(group_a, group_b, n_a, n_b, emd)` per pair. */
  def emd1d(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val cnt = Lineage.cutLocal(df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c")))
    val totals = cnt.groupBy("__g").agg(sum("__c").as("__n"))
    val pairs = broadcast(totals.select(col("__g").as("group_a"),
        col("__n").as("__na"))
      .crossJoin(totals.select(col("__g").as("group_b"),
        col("__n").as("__nb")))
      .filter(col("group_a") < col("group_b")))
    val left = pairs
      .join(cnt.select(col("__g").as("group_a"), col("__v"),
        col("__c").as("__ca")), Seq("group_a"))
      .select("group_a", "group_b", "__v", "__ca")
    val right = pairs
      .join(cnt.select(col("__g").as("group_b"), col("__v"),
        col("__c").as("__cb")), Seq("group_b"))
      .select("group_a", "group_b", "__v", "__cb")
    val aligned = left
      .join(right, Seq("group_a", "group_b", "__v"), "full_outer")
      .join(pairs, Seq("group_a", "group_b"))
      .withColumn("__ca", coalesce(col("__ca"), lit(0L)))
      .withColumn("__cb", coalesce(col("__cb"), lit(0L)))
    val w = Window.partitionBy("group_a", "group_b").orderBy("__v")
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    aligned
      .withColumn("__cuma", sum(col("__ca")).over(cum))
      .withColumn("__cumb", sum(col("__cb")).over(cum))
      .withColumn("__next", lead(col("__v"), 1).over(w))
      .select(col("group_a"), col("group_b"), col("__na"), col("__nb"),
        when(col("__next").isNotNull,
          (abs(col("__cuma").cast(dec) * col("__nb").cast(dec) -
            col("__cumb").cast(dec) * col("__na").cast(dec)) *
            (col("__next") - col("__v")).cast(dec)).cast(dec))
          .otherwise(lit(0).cast(dec)).as("__t"))
      .groupBy("group_a", "group_b")
      .agg(first(col("__na")).as("n_a"), first(col("__nb")).as("n_b"),
        sum(col("__t")).as("__s"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          Readout.pin(col("__s").cast("double") /
            (col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double"),
            6)).as("emd"))
      .orderBy("group_a", "group_b")
  }
}
