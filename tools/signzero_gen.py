#!/usr/bin/env python3
"""Regenerate SIGNZERO.md — the signed-zero adjudication table.

Extracts every bare `round(` site (not Readout.pin, not math.round,
not comment) from the four operator files and classifies each by a
reviewed content-prefix map. Unmatched sites abort the run: a new
bare-round readout must be adjudicated here (or pinned) before the
table regenerates, and SignZeroAuditSpec fails the build until the
table covers the source. Dev-side only, like check.py.
"""
import re, collections, sys, os

ROOT = os.path.join(os.path.dirname(__file__), "..")
FILES = ["Stats", "Similarity", "TextAnalysis", "Behavior"]

OVER = [
 ('round(col("n_outliers")', ("nonneg","share of count over count")),
 ('val lim = when(varY > 0.0', ("nonneg","factor>0 times sqrt(var>0)")),
 ('val dev = round(abs(', ("nonneg","abs()")),
 ('when(col("total") > 0, round(', ("nonneg","k*Sxx - Sx^2 over exact integer sums >= 0 (Cauchy-Schwarz), den > 0")),
 ('round(col("u2").cast("double") / 2.0, 1)', ("nonneg","U statistic, exact nonneg integer / 2")),
 ('when(ok, round(d, 6)).as("d_stat")', ("nonneg","d = max of abs cross-products")),
 ('when(ok, round(', ("nonneg","d >= 0 times sqrt of positive (ks_stat)")),
 ('round(sqrt(col("__chi2")', ("nonneg","sqrt of chi2/n >= 0")),
 ('.select(col("__ng"), round(', ("decimal-carrier","R^2/4n quotient cast decimal before cross-group sum")),
 ('when(col("n_groups") >= 2L && col("n") >= 2L, round(h, 6))', ("nonneg","Kruskal-Wallis H >= 0 (squared rank deviations identity, exact ints)")),
 ('round(round(h, 6) / corr, 6)).as("h_adj")', ("nonneg","H >= 0 over tie-correction in (0,1]")),
 ('.withColumn("auc", round(num / den, 6))', ("nonneg","AUC = nonneg exact-integer ratio in [0,1]")),
 ('val pbar = round(', ("nonneg","ratio of nonneg counts")),
 ('val obar = round(', ("nonneg","ratio of nonneg counts")),
 ('val orate = round(', ("nonneg","positive-rate ratio")),
 ('round(col("__ssqt")', ("nonneg","Brier mean of squares")),
 ('round(col("__rel")', ("nonneg","reliability sum of squares / n")),
 ('round(col("__res")', ("nonneg","resolution sum of squares / n")),
 ('round(col("o_rate") * (lit(1.0) - col("o_rate")), 6))', ("nonneg","o(1-o) with o in [0,1]")),
 ('round(sqrt(varNum / varDen)', ("nonneg","sqrt ratio / 1e6")),
 ('round(sqrt(seSq), 6).as("se")', ("nonneg","se = sqrt-based")),
 ('round(se, 6).as("se"),', ("nonneg","se = sqrt-based")),
 ('round(lit(zSum) * se, 6).as("mde_abs"),', ("nonneg","zSum>0 times se>=0")),
 ('round(p1, 6).as("p_a")', ("nonneg","proportions in [0,1]")),
 ('when(col("__sv").cast("double") > 0.0, round(', ("nonneg","devAbs^2 over positive variance")),
 ('when(col("__sbc").cast("double") > 0.0, round(', ("nonneg","MH odds ratio: nonneg sums ratio")),
 ('round(abs(col("__v") - col("__med")), 6)', ("nonneg","abs deviation")),
 ('round(((col("__nt") - col("__kt")).cast("double") /', ("nonneg","SSB decimal sum of squared terms >= 0 over guarded SSW > 0")),
 ('round((bd - cd) * (bd - cd) / den, 6)', ("nonneg","(b-c)^2/den")),
 ('round(adj * adj / den, 6)', ("nonneg","adj^2/den")),
 ('round((lit(2.0) * col("__siv")', ("nonneg","Gini over ascending ranks: 2*Sum(i*v) >= (n+1)*Sum(v) by rearrangement on exact decimals; exact zero is +0")),
 ('.agg(round(sum("__term").cast("double"), 6).as("psi"))', ("nonneg","PSI: each (pc-pr)*ln(pc/pr) term >= 0 pre-round, decimal sum of nonneg")),
 ('round(po, 6)', ("nonneg","probability")),
 ('round(pe, 6)', ("nonneg","probability")),
 ('val term = round((col("__v") / m) * log(col("__v") / m), 10)', ("decimal-carrier","theil term rounds into decimal(28,10)")),
 ('round(col("__c.__b").cast("double") * width +', ("nonneg","bucket*width + interpolation of nonneg")),
 ('round(least(lit(1.0),', ("nonneg","p-value: least(1, 2exp(-x)) > 0")),
 ('when(ok, round(col("k1")', ("nonneg","rate = count/positive exposure")),
 ('when(ok, round(col("k2")', ("nonneg","rate = count/positive exposure")),
 ('round((col("__a").cast("double") / (kd - 1.0)) /', ("nonneg","Welch F: decimal sum of squared weighted deviations over positive")),
 ('round((kd * kd - 1.0) / (lit(3.0) * lam), 6)', ("nonneg","df2 > 0 by construction")),
 ('round(coalesce(sd, lit(0.0)), 6)', ("nonneg","stddev >= 0")),
 ('round(lit(budget).cast("double") *', ("nonneg","budget share of nonneg")),
 ('.withColumn("csim", round(cosine(', ("order-only","probe ranking only; -0.0 orders identically to +0.0 and the column is dropped")),
 ('round(col("tf") * log(col("__n") / col("df")), 6)', ("nonneg","tf * idf with idf = log(n/df) >= 0 (n >= df)")),
 ('.agg(round(sum(col("__term")).cast("double"), 4).as("lex_score"))', ("nonneg","sum of nonneg tf-idf terms")),
 ('round(avg(col("__dl")), 6).as("__avgdl")', ("nonneg","average document length")),
 ('.withColumn("__term", round(', ("nonneg","BM25 +1-variant idf: log(arg > 1) > 0, tf factors nonneg")),
 ('.agg(round(sum(col("__term")).cast("double"), 4).as("bm25"))', ("nonneg","sum of nonneg BM25 terms")),
 ('.filter(round(cosine(col("av"), col("bv")), 4) > threshold)', ("order-only","threshold filter comparison only; -0.0 compares equal to 0.0")),
 ('round(float_dot(col("av"), col("bv")) / (col("an") * col("bn")), 4))', ("order-only","pairwise sim feeds max/ranking only; never emitted")),
 ('round(coalesce(col("n_hits"), lit(0L)) / lit(k.toDouble), 4)', ("nonneg","hit count / k")),
 ('round(((col("x") - col("__mu")) / sqrt(col("__var"))) *', ("nonneg","squared z term")),
 ('.agg(round(sum(col("__t")).cast("double"), 4).as("score"))', ("nonneg","sum of squares")),
 ('s"1.0 - round(list_sum(', ("oracle-sql","generated DuckDB oracle: 1 - cosine >= 0 (rounded cosine <= 1)")),
 ('val d = lit(1.0) - round(cosine(', ("nonneg","1 - round(cosine,4) >= 0 since rounded cosine <= 1")),
 ('round(sum(round(col("__d"), 6)', ("decimal-carrier","distance rounds into decimal(18,6)")),
 ('round(col("n_both").cast("double") /', ("nonneg","co-occurrence cosine / confidence of counts")),
 ('round(col("n_both").cast("double") * col("__users")', ("nonneg","lift = ratio of counts")),
 ('.select(floor(round(cosine(', ("order-only","bucket key: floor(round/width) maps -0.0 and +0.0 to bucket 0 in both engines")),
 ('.withColumn("lo", round(col("bucket")', ("nonneg","bucket >= 0 times width")),
 ('.withColumn("rrf_score", round(', ("nonneg","RRF sum of positive reciprocals")),
 ('round(avg(when(col("__df") === 1, 1.0)', ("nonneg","avg of 0/1")),
 ('(round(log(col("__n_total")) - log(col("__c")), 6)', ("nonneg","idf = log(N) - log(c) >= 0, N >= c")),
 ('round(sum(col("__s")).cast("double") / sum(col("__tf")), 2)', ("nonneg","nonneg weighted sum / positive")),
 ('(round(-log((col("__c2") + alpha) /', ("nonneg","surprisal -log(p), p <= 1")),
 ('round(sum(col("__s")).cast("double") / sum(col("__k")), 4)', ("nonneg","mean of nonneg surprisals")),
 ('round((col("c").cast("double") / col("np")) *', ("decimal-carrier","KL term rounds into decimal(28,10)")),
 ('round(p * log(p / m), 10)).otherwise(lit(0.0))', ("internal","JSD term feeds decimal carrier; final jsd_nats pinned")),
 ('round(q * log(q / m), 10)).otherwise(lit(0.0))', ("internal","JSD term; final jsd_nats pinned")),
 ('round(log(col("__r").cast("double")), 10).as("__x")', ("internal","log >= 0 of rank >= 1, feeds decimal sums; final slope pinned")),
 ('round(log(col("__c").cast("double")), 10).as("__y")', ("internal","log >= 0 of count >= 1")),
 ('round(sum(dec(col("__x"))).cast("double"), 8).as("__sx")', ("internal","decimal-summed regression moments; final slope pinned")),
 ('round(sum(dec(col("__y"))).cast("double"), 8).as("__sy")', ("internal","decimal-summed regression moments")),
 ('round(sum(dec(col("__x") * col("__y"))).cast("double"), 8)', ("internal","decimal-summed regression moments")),
 ('round(sum(dec(col("__x") * col("__x"))).cast("double"), 8)', ("internal","decimal-summed regression moments")),
 ('round(col("n_types").cast("double") / col("n_tokens"), 6)', ("nonneg","TTR = types/tokens")),
 ('round(col("__cum").cast("double") / col("__total"), 6)', ("nonneg","cumulative share")),
 ('val z = round(', ("internal","logistic z feeds sigmoid only")),
 ('lit(wNoise) * noise + lit(wMtl) * round(meanTokenLen(txt), 6), 10)', ("internal","weighted nonneg feature sum inside z")),
 ('round(lit(1.0) / (lit(1.0) + exp(-z)), 6)', ("nonneg","sigmoid in (0,1)")),
 ('round(sum(col("__score").cast("decimal(18,6)")).cast("double") /', ("nonneg","decimal-summed scores in [0,1] / count")),
 ('round(avg(when(col("__score") >= 0.5, 1.0)', ("nonneg","avg of 0/1")),
 ('round(when(col("n_tokens") === 0, 0.0).otherwise(', ("nonneg","guarded ratio of counts")),
 ('round(when(col("__n_chars") === 0 || col("__top_n").isNull, 0.0)', ("nonneg","guarded ratio of counts")),
 ('round((-col("__s")).cast("double"), 6).as("entropy_nats")', ("nonneg","entropy: decimal sum of nonneg -p log p terms")),
 ('round((-col("__s")).cast("double") /', ("nonneg","entropy / log(vocab)")),
 ('round(col("__n_alpha").cast("double") / col("n_words"), 4)', ("nonneg","ratio of counts")),
 ('round(col("__n_distinct").cast("double") / col("n_words"), 4)', ("nonneg","ratio of counts")),
 ('round(col("__top_n").cast("double") / col("n_words"), 4)', ("nonneg","ratio of counts")),
 ('col("tf"), round(col("weight"), 6).as("weight"))', ("nonneg","tf-idf weight >= 0")),
 ('.select(expr("round(ln(cast(rk as double)), 6)").as("lr")', ("nonneg","ln(rank >= 1) >= 0")),
 ('expr("round(ln(cast(f as double)), 6)").as("lf"))', ("nonneg","ln(freq >= 1) >= 0")),
 ('sum(expr("cast(round(lr * lf, 10) as decimal(28,10))")).as("sxy")', ("decimal-carrier","moment product rounds into decimal")),
 ('sum(expr("cast(round(lr * lr, 10) as decimal(28,10))")).as("sxx")', ("decimal-carrier","moment product rounds into decimal")),
 ('.select(col("node").as("word"), round(col("rank"), 10).as("rank"))', ("nonneg","TextRank rank > 0")),
 ('round(col("__wu").cast("double") /', ("nonneg","normalized nonneg weight")),
 ('round(log(col("n_tokens").cast("double")), 10).as("__x")', ("internal","log of count >= 1, decimal-summed; heaps readouts already pinned")),
 ('round(log(col("vocab").cast("double")), 10).as("__y")', ("internal","log of count >= 1")),
 ('.agg(round(sum(col("__t")).cast("double"), 6).as("h_cond"))', ("nonneg","conditional entropy: decimal sum of nonneg -p log p terms")),
 ('.agg(round(sum(col("__t")).cast("double"), 6).as("h_marginal"))', ("nonneg","marginal entropy, same nonneg terms")),
 ('round(col("h_cond") /', ("nonneg","entropy ratio of nonnegs")),
 ('when(col("__nr1").isNotNull, round(', ("nonneg","Good-Turing adjusted count >= 0")),
 ('round(col("__n1").cast("double") / col("__N").cast("double"), 6)', ("nonneg","ratio of counts")),
 ('round(col("vocab").cast("double") +', ("nonneg","chao1 = vocab + nonneg correction")),
 ('round(col("n_shared").cast("double") /', ("nonneg","overlap ratio of counts")),
 ('sum(round(col("__dt").cast("double") / chunk.toDouble, 6)', ("decimal-carrier","per-chunk TTR rounds into decimal before the order-free sum")),
 ('round(col("__st").cast("double") /', ("nonneg","mean of nonneg chunk TTRs")),
 ('round(lam, 6).as("simpson")', ("nonneg","Simpson lambda = exact Sum c(c-1)/N(N-1) >= 0")),
 ('round(lit(1.0) / when(col("simpson") > 0.0, col("simpson")), 6))', ("nonneg","reciprocal of guarded positive")),
 ('round(sum(col("__lag_us")).cast("double") /', ("nonneg","mean lag of nonneg microseconds")),
 ('s"round(($center $sign $margin)', ("pinned-text","the generated expression text itself appends + 0.0 — pinned on BOTH engines at once")),
 ('expr(s"round($p, 6)").as("rate")', ("nonneg","conversion rate")),
 ('round(percentile(col("__lag_us").cast("double") / 1e6,', ("nonneg","percentile of nonneg lags")),
 ('round(col("n").cast("double") / sum("n").over(byFrom), 6))', ("nonneg","transition share")),
 ('round(col("n_active").cast("double") / col("cohort_users"), 6)', ("nonneg","retention ratio")),
 ('round(mean, 4).as("mean_n")', ("nonneg","mean count")),
 ('round(col("__s").cast("double"), 6).as("decayed_rate"))', ("nonneg","decayed nonneg rate")),
 ('.select(col("state"), round(col("p"), 6).as("p_convert"))', ("nonneg","absorption probability")),
 ('.agg(sum(round(col("t_prob") * col("p"), 12)', ("decimal-carrier","probability product rounds into decimal(38,12)")),
 ('.otherwise(round(coalesce(col("__r").cast("double"),', ("nonneg","guarded nonneg probability readout")),
 ('round(lit(1.0) - col("p_removed") / col("__p_base"), 6)))', ("nonneg","removal effect clamped ratio of probabilities")),
 ('round(col("p_removed"), 6).as("p_removed")', ("nonneg","probability")),
 ('round(col("removal_effect") / col("__tot").cast("double"), 6)', ("nonneg","share of nonneg total")),
 ('sum(round(t.t_prob * p.p, 12)::decimal(38,12)) AS r', ("oracle-sql","DuckDB oracle: probability products")),
 ('ELSE round(coalesce(r.r::double, 0.0::double), 12) END AS p', ("oracle-sql","DuckDB oracle: probability readout")),
 ('round(1.0::double - p_removed', ("oracle-sql","DuckDB oracle: clamped ratio")),
 ('SELECT channel, round(p_removed, 6) AS p_removed', ("oracle-sql","DuckDB oracle: probability")),
 ('round(removal_effect / (SELECT t FROM tot)::double, 6) AS share', ("oracle-sql","DuckDB oracle: share")),
 ('.withColumn("__cents", (round(col("__cum"), 2) * 100).cast("long"))', ("nonneg","cents of nonneg revenue")),
 ('round(col("__rev"), 2).cast("double").as("revenue")', ("nonneg","revenue")),
 ('round(col("__cum"), 2).cast("double").as("cum_revenue")', ("nonneg","cumulative revenue")),
 ('round(sum(col("__dwell_us")).cast("double") / 1e6, 2)', ("nonneg","dwell seconds")),
 ('round(sum(col("__dwell_us")).cast("double") /', ("nonneg","dwell ratio")),
 ('round(col("__mon"), 2).cast("double").as("monetary")', ("nonneg","monetary decimal readout")),
 ('round(phi_scaled /', ("oracle-sql","DuckDB oracle: Shapley credit share of nonnegs")),
 ('round(coalesce(try_element_at(acc, -1).survival, 1.0d)', ("oracle-sql","DuckDB oracle: survival in [0,1]")),
 ('round((nd - 1.0) * col("__var"), 6)', ("nonneg","(n-1)>=1 times var>0 (filtered); rounds into decimal carrier")),
 ('round((nd - 1.0) * log(col("__var")), 8)', ("decimal-carrier","Bartlett ln-variance term rounds into decimal(38,8); decimal zero is unsigned")),
 ('round(lit(1.0) / (nd - 1.0), 10)', ("nonneg","1/(n-1) with n>=2 (filtered)")),
 ('when(col("n_blocks") >= 1L, round(lD, 1)).as("l_stat")', ("nonneg","Page L = sum of positive j*rank products, > 0 when emitted")),
 ('round(log(col("__d") / col("__dk")), 10)', ("decimal-carrier","LID ln ratio rounds into decimal(28,10); d=dk gives exact ln(1)=+0")),
 ('round(term, 10).cast("decimal(28,10)").as("__t"))', ("nonneg","Hellinger sqrt of product of positive shares; decimal carrier")),
 ('val du = (round(col(diffCol).cast("double"), 6)', ("decimal-carrier","Wilcoxon diff quantizes into decimal(18,6); decimal zero is unsigned and du=0 rows drop")),
 ('sum(when(hasF, round(abs(col("residual")), 6)', ("nonneg","abs residual; decimal carrier")),
 ('.select(round(sampleVar(', ("nonneg","sample variance >= 0 (Cauchy-Schwarz on exact integer sums); decimal carrier")),
 ('round(coalesce(col("__rel"), lit(0L)).cast("double") /', ("nonneg","NDCG term: nonneg grade over positive log; decimal carrier")),
 ('round(term, 6).cast("decimal(18,6)").as("__term"))', ("decimal-carrier","chi-square cell term rounds into decimal(18,6); decimal zero is unsigned")),
 ('round(col("__w2").cast("double") / 2.0, 1).as("w_plus")', ("nonneg","Wilcoxon W+ = exact nonneg integer (2W+) / 2")),
 ('round(abs(col("residual")) / col("y"), 8)', ("decimal-carrier","MAPE term: abs residual over y (summed only under the y>0 guard), rounds into decimal(28,8)")),
 ('round(lit(2.0) * abs(f - col("y")) /', ("decimal-carrier","sMAPE term: 2|f-y| over |f|+|y| (summed only under the >0 guard), rounds into decimal(28,8)")),
 ('round(abs(col("y") - col("__py")), 6).cast("decimal(28,6)")', ("decimal-carrier","naive-MAE term: abs lag-1 difference rounds into decimal(28,6)")),
 ('round(log(col("__v") / col("__xk")), 10)', ("decimal-carrier","Hill ln(x_i/x_(k+1)) with x_i >= x_(k+1) > 0 rounds into decimal(28,10); ln(1) = +0 exact")),
 ('round(col("__thr"), 4).as("threshold")', ("nonneg","Hill threshold = (k+1)-th order statistic of values filtered > 0")),
 ('round(col("__x").cast("double"), 6).cast("decimal(18,6)").as("__v"))', ("decimal-carrier","embedding coordinate rounds into decimal(18,6); decimal zero is unsigned")),
 ('round((lit(k + 1L) - col("rank")).cast("double") /', ("decimal-carrier","per-query IDCG term: nonneg grade (k+1-rank >= 1 on the exact side) over positive log, rounds into decimal(28,8)")),
 ('.withColumn("__e", round(', ("decimal-carrier","KNN-Shapley per-rank increment (signed by construction) rounds into decimal(28,12); decimal zero is unsigned")),
 ('round(p * log(p), 10).cast("decimal(28,10)").as("__e"))', ("decimal-carrier","entropy term p*ln(p) rounds into decimal(28,10)")),
 ('round(sum(col(valueCol).cast("decimal(18,4)")), 2)', ("decimal-carrier","decimal round of a decimal sum; decimal zero is unsigned")),
 ('round(', ("nonneg","Kneser-Ney probability (greatest(c-d,0) + backoff, all nonneg)")),
]

def main():
    sites = collections.OrderedDict()
    for f in FILES:
        p = os.path.join(ROOT, "src/main/scala/graft/operators", f + ".scala")
        for i, line in enumerate(open(p), 1):
            t = line.strip()
            if "round(" not in t: continue
            if "Readout.pin" in t or "math.round" in t: continue
            if t.startswith("//") or t.startswith("*"): continue
            sites.setdefault((f, t), []).append(i)
    rows, missing = [], []
    dec = re.compile(r'cast\("decimal')
    for (f, t), ls in sites.items():
        hit = None
        for pref, cat in OVER:
            if t.startswith(pref):
                hit = cat; break
        if hit is not None:
            rows.append((f, ls, hit[0], hit[1], t)); continue
        if t.startswith("|"):
            rows.append((f, ls, "oracle-sql",
                "generated DuckDB oracle text; paired engine site adjudicated/pinned", t)); continue
        if dec.search(t):
            rows.append((f, ls, "decimal-carrier",
                "rounds into a decimal cast; decimal zero is unsigned", t)); continue
        missing.append((f, ls[0], t[:110]))
    if missing:
        for m in missing: print("UNADJUDICATED:", m)
        sys.exit(1)
    with open(os.path.join(ROOT, "SIGNZERO.md"), "w") as out:
        out.write(HEADER)
        for f, ls, cat, reason, t in rows:
            cell = t.replace("|", "\\|")
            out.write("| %s | %s | %s | %s | `%s` |\n" %
                      (f, ",".join(map(str, ls)), cat, reason, cell))
    print("SIGNZERO.md:", len(rows), "adjudicated sites")

HEADER = """# Signed-zero adjudication — every bare `round(` in the operator files

The trap (r11's one red row, tq33): a rounded DOUBLE readout whose true
value is a tiny negative rounds to `-0.0` in DuckDB (sign-preserving
binary rounding) but `+0.0` through Spark's BigDecimal round; the
driver's hash distinguishes them. The fix where the class is live is
`Readout.pin` on the engine side plus a literal `+ 0.0` in the oracle
SQL - r13 adopted it at every signed final readout (z-scores, slopes,
correlations, signed effect sizes, cosines, PMI, KL/JSD, readability
grades, adjusted/raw means). This table adjudicates EVERY REMAINING
bare `round(` site in Stats/Similarity/TextAnalysis/Behavior: each is
immune for the stated reason. SignZeroAuditSpec cross-checks the table
against the source - a new or edited bare round( site fails the build
until a row here covers it. Regenerate with tools/signzero_gen.py.

Categories: `nonneg` (provably >= 0 before rounding - a nonneg double
never rounds to -0.0), `decimal-carrier` (rounds into a decimal cast;
decimal zero is unsigned on both engines), `internal` (a `__`-aliased
intermediate feeding exact machinery - the FINAL readout is its own
row or is pinned), `order-only` (used only in comparisons/ranking/
bucket keys, where -0.0 == 0.0 in both engines), `oracle-sql` (DuckDB
oracle text generated in the operator file; pinned in tandem with its
engine site where at risk), `pinned-text` (the generated expression
text itself carries the + 0.0).

| file | lines | category | reason | site |
|---|---|---|---|---|
"""

if __name__ == "__main__":
    main()
