package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding merge training (Sennrich et al., ACL'16 — the
  * subword tokenizer behind most LLM vocabularies) as a distributed
  * histogram algorithm.
  *
  * The classic formulation never touches the corpus per iteration: BPE
  * statistics are a function of the DISTINCT-WORD histogram, so the
  * corpus is read once (tokenize → word counts, one shuffle bounded by
  * |vocab|), and each merge iteration is
  *
  *   1. adjacent-symbol pair counts over the histogram — one
  *      explode + groupBy shuffle, cardinality ≤ Σ|word| over the
  *      vocabulary, NOT over the corpus;
  *   2. argmax pair (count desc, then lexicographic — fully
  *      deterministic) — a 1-row TakeOrdered collect, the only driver
  *      state;
  *   3. apply the merge to every word's symbol sequence — a per-row
  *      compiled kernel ([[Bpe.MergeBigram]]), no shuffle, lineage cut
  *      per round (iterative-frame discipline).
  *
  * At 100 TB the histogram is ~10⁷-10⁸ rows regardless of corpus size —
  * each iteration costs one bounded shuffle, and the driver holds one
  * (left, right, count) row per merge. This is the standard scalable
  * BPE shape (map-reduce pair counting); the reference has no
  * tokenizer-training surface, so this is a capability extension in the
  * training-data-pipeline family (SURVEY §6).
  *
  * Determinism contract (what makes it DuckDB-oracle-able): words are
  * lower-cased whitespace tokens restricted to `^[a-z]+$` (symbol
  * strings never collide with the merge separator), pair counting
  * counts EVERY adjacent position (overlapping, the paper's counting),
  * merge application is greedy left-to-right non-overlapping, ties
  * break on (count desc, left asc, right asc).
  */
object Bpe {

  /** Greedy left-to-right application of one merge (x, y) → xy over a
    * symbol sequence: [a, x, y, x] → [a, xy, x]; overlapping runs
    * consume left-first ([x, x, x] with (x,x) → [xx, x]). One compiled
    * pass per row — the same reasoning as the text kernels: a
    * transform/aggregate HOF formulation interprets its lambda per
    * element and allocates per step. */
  case class MergeBigram(child: Expression, x: String, y: String)
      extends UnaryExpression with CodegenFallback {
    private lazy val xs = UTF8String.fromString(x)
    private lazy val ys = UTF8String.fromString(y)
    private lazy val merged = UTF8String.fromString(x + y)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new java.util.ArrayList[Any](n)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (i + 1 < n && s.equals(xs) && arr.getUTF8String(i + 1).equals(ys)) {
          out.add(merged)
          i += 2
        } else {
          out.add(s)
          i += 1
        }
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): MergeBigram =
      copy(child = c)
  }

  def mergeBigram(sym: Column, x: String, y: String): Column =
    GraftSqlBridge.toColumn(MergeBigram(GraftSqlBridge.toExpression(sym), x, y))

  /** The tokenizer side of BPE: segment a WORD by applying the learned
    * merge list in order (the subword-nmt application algorithm — each
    * merge sweeps the whole symbol sequence greedily before the next
    * applies) and return the resulting token count. One compiled pass
    * per distinct word; |merges| small by construction. */
  case class BpeSegmentCount(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any = {
      val w = input.asInstanceOf[UTF8String].toString
      var sym = new Array[String](w.length)
      var i = 0
      while (i < w.length) { sym(i) = String.valueOf(w.charAt(i)); i += 1 }
      var n = sym.length
      merges.foreach { case (x, y) =>
        val out = new Array[String](n)
        var o = 0
        var p = 0
        while (p < n) {
          if (p + 1 < n && sym(p) == x && sym(p + 1) == y) {
            out(o) = x + y
            p += 2
          } else {
            out(o) = sym(p)
            p += 1
          }
          o += 1
        }
        sym = out
        n = o
      }
      n
    }
    override protected def withNewChildInternal(c: Expression): BpeSegmentCount =
      copy(child = c)
  }

  def bpeSegmentCount(word: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.toColumn(BpeSegmentCount(
      GraftSqlBridge.toExpression(word), merges))

  /** Per-document BPE token counts under an ordered merge list: the
    * tokenizer APPLIED at corpus scale. Segmentation runs once per
    * DISTINCT word (the vocabulary — bounded regardless of corpus
    * size); per-doc counts come from a multiplicity-collapsed
    * (doc, word) frame joined against that vocabulary table. Output:
    * (id, n_words, n_tokens). */
  def tokenCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val perDoc = df.select(col(idCol),
        explode(graft.functions.TextFunctions
          .wsTokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("__k"))
      .transform(Lineage.cutLocal)
    val lens = perDoc.select("w").distinct()
      .select(col("w"), bpeSegmentCount(col("w"), merges).cast("long").as("__len"))
    perDoc.join(lens, "w")
      .groupBy(col(idCol))
      .agg(sum(col("__k")).as("n_words"),
        sum(col("__k") * col("__len")).as("n_tokens"))
  }

  /** The distinct-word symbol histogram: (sym: array<string>, cnt). */
  private def wordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.TextFunctions
        .wsTokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("sym"),
        col("cnt"))

  /** Learn `k` merges; returns (iter, merge_left, merge_right,
    * pair_count) — one row per learned merge, ordered by iter. Stops
    * early if no adjacent pair remains. */
  def learnMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    var words = Lineage.cut(wordHistogram(df, textCol))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var iter = 1
    var exhausted = false
    while (iter <= k && !exhausted) {
      val best = words
        .select(col("cnt"),
          slice(col("sym"), lit(1), size(col("sym")) - 1).as("xs"),
          slice(col("sym"), lit(2), size(col("sym")) - 1).as("ys"))
        .select(col("cnt"), explode(arrays_zip(col("xs"), col("ys"))).as("p"))
        .groupBy(col("p.xs").as("x"), col("p.ys").as("y"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("x"), col("y"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (x, y, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((iter, x, y, c))
        words = Lineage.cut(
          words.withColumn("sym", mergeBigram(col("sym"), x, y)))
        iter += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("iter", "merge_left", "merge_right", "pair_count")
      .orderBy("iter")
  }

  /** The shared CTE chain both oracles unroll: `k` iterations of
    * pair-count / argmax / list_reduce merge application, carrying the
    * raw word `w` through every generation (the tokenize oracle joins
    * on it; the learn oracle ignores it). */
  private def oracleChain(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS (
        |  SELECT w, list_transform(range(1, len(w)+1), i -> w[i]) AS sym, cnt
        |  FROM (
        |    SELECT w, count(*) AS cnt
        |    FROM (
        |      SELECT lower(t.tok) AS w
        |      FROM documents, unnest(regexp_split_to_array(text, '\s+')) t(tok)
        |    )
        |    WHERE regexp_matches(w, '^[a-z]+$')
        |    GROUP BY 1
        |  )
        |)""".stripMargin)
    for (i <- 1 to k) {
      val prev = s"w${i - 1}"
      sb.append(s""",
        |p$i AS (
        |  SELECT sym[j] AS x, sym[j+1] AS y, sum(cnt)::bigint AS c
        |  FROM $prev, unnest(range(1, len(sym))) t(j)
        |  GROUP BY 1, 2
        |), b$i AS (
        |  SELECT x, y, c FROM p$i ORDER BY c DESC, x, y LIMIT 1
        |), w$i AS (
        |  SELECT w,
        |    string_split(ltrim(CASE
        |      WHEN split_part(acc, chr(31), 2) = ''
        |        THEN split_part(acc, chr(31), 1)
        |      ELSE split_part(acc, chr(31), 1) || ' ' ||
        |           split_part(acc, chr(31), 2)
        |    END, ' '), ' ') AS sym, cnt
        |  FROM (
        |    SELECT w, cnt,
        |      list_reduce(list_prepend(chr(31), sym),
        |        (acc, s) -> CASE
        |          WHEN split_part(acc, chr(31), 2) = b.x AND s = b.y
        |            THEN split_part(acc, chr(31), 1) || ' ' || b.x || b.y
        |                 || chr(31)
        |          WHEN split_part(acc, chr(31), 2) = ''
        |            THEN split_part(acc, chr(31), 1) || chr(31) || s
        |          ELSE split_part(acc, chr(31), 1) || ' ' ||
        |               split_part(acc, chr(31), 2) || chr(31) || s
        |        END) AS acc
        |    FROM $prev, b$i b
        |  )
        |)""".stripMargin)
    }
    sb.toString
  }

  /** The DuckDB replay of [[learnMerges]] — generated here so engine
    * and oracle stay one edit apart. */
  def oracleSql(k: Int): String = {
    val union = (1 to k).map(i =>
      s"SELECT $i AS iter, x AS merge_left, y AS merge_right, c AS pair_count FROM b$i")
      .mkString("\n", "\nUNION ALL\n", "\n")
    oracleChain(k) + union + "ORDER BY iter"
  }

  /** Tokenizer fertility per group — BPE tokens emitted per word
    * (the tokenizer-efficiency number mixture design weighs: a source
    * whose text fragments into 2.5 tokens/word costs 2.5× the context
    * budget of one at 1.1, and fertility is THE standard per-language
    * tokenizer-fit readout). Same machinery as [[tokenCounts]] —
    * segmentation runs once per DISTINCT (group, word) via the native
    * [[bpeSegmentCount]] kernel; fertility is one pinned division of
    * exact longs. Returns `(group, n_words, n_tokens, fertility)`. */
  def fertility(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val perGroup = df.select(col(groupCol).as("__g"),
        explode(graft.functions.TextFunctions
          .wsTokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("__g"), col("w"))
      .agg(count(lit(1)).as("__k"))
      .transform(Lineage.cutLocal)
    val lens = perGroup.select("w").distinct()
      .select(col("w"),
        bpeSegmentCount(col("w"), merges).cast("long").as("__len"))
    perGroup.join(lens, "w")
      .groupBy(col("__g"))
      .agg(sum(col("__k")).as("n_words"),
        sum(col("__k") * col("__len")).as("n_tokens"))
      .select(col("__g").as(groupCol), col("n_words"), col("n_tokens"),
        Readout.pin(col("n_tokens").cast("double") /
          col("n_words").cast("double"), 6).as("fertility"))
      .orderBy(groupCol)
  }

  /** DuckDB replay of [[fertility]] — the same learned chain, joined
    * per-source. */
  def fertilityOracleSql(k: Int): String =
    oracleChain(k) + s""",
      |dw AS (
      |  SELECT source, lower(t.tok) AS w
      |  FROM documents, unnest(regexp_split_to_array(text, '\\s+')) t(tok)
      |  WHERE regexp_matches(lower(t.tok), '^[a-z]+$$')
      |)
      |SELECT source, count(*)::bigint AS n_words,
      |       sum(len(w$k.sym))::bigint AS n_tokens,
      |       round(sum(len(w$k.sym))::double / count(*)::double, 6) + 0.0
      |         AS fertility
      |FROM dw JOIN w$k USING (w)
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** DuckDB replay of learn-then-tokenize ([[tokenCounts]] fed by
    * [[learnMerges]]): the same chain, then per-document token counts
    * via a join of each doc's words against the final symbol table. */
  def tokenizeOracleSql(k: Int): String =
    oracleChain(k) + s""",
      |dw AS (
      |  SELECT doc_id, lower(t.tok) AS w
      |  FROM documents, unnest(regexp_split_to_array(text, '\\s+')) t(tok)
      |  WHERE regexp_matches(lower(t.tok), '^[a-z]+$$')
      |)
      |SELECT doc_id, count(*)::bigint AS n_words,
      |       sum(len(w$k.sym))::bigint AS n_tokens
      |FROM dw JOIN w$k USING (w)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
}
