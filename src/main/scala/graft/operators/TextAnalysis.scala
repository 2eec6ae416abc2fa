package graft.operators

import org.apache.spark.sql.DataFrame
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
}
