package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t")
      .select(TextFunctions.redactPii(col("t")).as("r"))
      .head().getString(0)

  test("redactPii replaces emails, IPs, and phones with typed tags") {
    assert(redactOne("mail a.b+c@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(redactOne("host 192.168.001.1 up") == "host <IP> up")
    assert(redactOne("call 555-123-4567 or 555.123.4567") ==
      "call <PHONE> or <PHONE>")
    assert(redactOne("x user1@a.io y 10.0.0.1 z 111-222-3333 w") ==
      "x <EMAIL> y <IP> z <PHONE> w")
  }

  test("word_ngrams kernel == the HOF shingle composition, with multiplicity") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 50)
    val kernel = docs.select(col("doc_id"),
        explode(TextKernelExpressions.word_ngrams(col("text"), 2)).as("g"))
      .groupBy("doc_id", "g").count()
    val hof = docs.select(col("doc_id"),
        explode(concat(TextFunctions.shingles(col("text"), 1),
          TextFunctions.shingles(col("text"), 2))).as("g"))
      .groupBy("doc_id", "g").count()
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
    // multiplicity: "a b a b" has unigram a x2, b x2, bigram "a b" x2
    val m = Seq("a b a b").toDF("t")
      .select(explode(TextKernelExpressions.word_ngrams(col("t"), 2)).as("g"))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 2L, "b" -> 2L, "a b" -> 2L, "b a" -> 1L))
  }

  test("portable_minhash kernel == the md5-affine HOF chain it replaced") {
    // the audit family's engine-portable signature (Dedup.portableSigs):
    // per shingle x = conv(substring(md5(s),1,8),16,10) % p, hash i =
    // min over shingles of ((2i+1)*1597334677 % p * x + (40503i+7) % p) % p
    val p = 2147483647L
    val k = 16
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 80)
      .select(col("doc_id"),
        TextKernelExpressions.word_shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val kernel = docs.select(col("doc_id"),
      TextKernelExpressions.portable_minhash(col("sh"), k).as("sig"))
    val xs = docs.select(col("doc_id"), transform(col("sh"), s =>
      conv(substring(md5(s), 1, 8), 16, 10).cast("long") % p).as("__xs"))
    val hof = xs.select(col("doc_id"),
      transform(sequence(lit(0), lit(k - 1)), i => {
        val a = (i.cast("long") * 2L + 1L) * 1597334677L % p
        val b = (i.cast("long") * 40503L + 7L) % p
        array_min(transform(col("__xs"), x => (a * x + b) % p))
      }).as("sig"))
    val joined = kernel.join(hof.withColumnRenamed("sig", "sig2"), "doc_id")
    assert(joined.count() >= 50)
    assert(joined.filter(col("sig") =!= col("sig2")).count() == 0)
    // empty shingle array mirrors array_min-of-empty: an all-null sig
    val empty = Seq(Seq.empty[String]).toDF("sh")
      .select(TextKernelExpressions.portable_minhash(col("sh"), 4).as("sig"))
      .head().getSeq[Any](0)
    assert(empty.size == 4 && empty.forall(_ == null))
  }

  test("redactPii leaves near-misses alone") {
    // no TLD, letters in octets, 2-3-4 digit grouping
    assert(redactOne("a@b plain 1.2.3 text 12-345-6789") ==
      "a@b plain 1.2.3 text 12-345-6789")
  }

  test("piiCount counts matches per pattern") {
    val r = Seq("a@b.co and c@d.io at 1.2.3.4").toDF("t").select(
      TextFunctions.piiCount(col("t"), TextFunctions.emailPattern).as("e"),
      TextFunctions.piiCount(col("t"), TextFunctions.ipv4Pattern).as("i"))
      .head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 1)
  }
}
