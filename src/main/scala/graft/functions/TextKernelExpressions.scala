package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel expressions for the text-dedup hot path.
  *
  * Spark's higher-order functions (transform / filter / aggregate /
  * zip_with) are CodegenFallback AND interpret their lambda per element —
  * a shingle+minhash pipeline composed from them costs milliseconds per
  * document. These expressions do the same work in one compiled Scala
  * loop per row (a single virtual call per row; the loop itself is JIT
  * compiled), which is what makes minhash over billions of documents
  * tractable.
  *
  * Tokenization semantics match TextFunctions.wsTokens / the DuckDB
  * oracle exactly: lower-case, split on `\s+` ([ \t\n\x0B\f\r]), drop
  * empties; shingles are n consecutive tokens joined by a single space,
  * de-duplicated.
  */
object TextKernelExpressions {

  private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  /** Tokenize + n-gram shingle + distinct, one pass. */
  private[functions] def shingleSet(text: String, n: Int): Array[UTF8String] = {
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) toks.add(text.substring(start, i).toLowerCase)
    }
    val m = toks.size - n + 1
    if (m <= 0) return Array.empty
    val seen = new java.util.LinkedHashSet[String](m * 2)
    var j = 0
    val sb = new java.lang.StringBuilder
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    out
  }

  /** array<string> of distinct word n-gram shingles of lower(text). */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        shingleSet(input.asInstanceOf[UTF8String].toString, n)
          .asInstanceOf[Array[Any]])
    override protected def withNewChildInternal(c: Expression): WordShingles =
      copy(child = c)
  }

  /** array<string> of ALL word n-grams of lower(text) for n = 1..maxN,
    * contiguous, WITH multiplicity (unlike [[WordShingles]], which
    * de-duplicates) — the bag-of-grams feature stream language-model
    * scoring needs (DSIR importance weights). Same tokenization as
    * every other kernel; one compiled pass, no per-element lambdas. */
  case class WordNGrams(child: Expression, maxN: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = new java.util.ArrayList[String]()
      var i = 0
      val len = text.length
      while (i < len) {
        while (i < len && isWs(text.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(text.charAt(i))) i += 1
        if (i > start) toks.add(text.substring(start, i).toLowerCase)
      }
      val t = toks.size
      var total = 0
      var n = 1
      while (n <= maxN) { total += math.max(0, t - n + 1); n += 1 }
      val out = new Array[Any](total)
      var o = 0
      val sb = new java.lang.StringBuilder
      n = 1
      while (n <= maxN) {
        var j = 0
        val m = t - n + 1
        while (j < m) {
          sb.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(toks.get(j + k))
            k += 1
          }
          out(o) = UTF8String.fromString(sb.toString)
          o += 1
          j += 1
        }
        n += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): WordNGrams =
      copy(child = c)
  }

  /** array<string> of the word n-grams of EXACTLY length n, contiguous,
    * WITH multiplicity — the single-length sibling of [[WordNGrams]]
    * for shingle-stream operators (TF-IDF cosine pairs). Fewer than n
    * tokens → empty array (explode then drops the doc, matching the
    * `size >= n` guard the interpreted chain needed). One compiled
    * tokenize pass per document; replaces a transform+slice+array_join
    * HOF chain, which both allocates a token array per doc AND sits one
    * CollapseProject away from the per-element re-tokenization trap
    * (NOTES_BUILD). */
  case class WordNGramsOnly(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = new java.util.ArrayList[String]()
      var i = 0
      val len = text.length
      while (i < len) {
        while (i < len && isWs(text.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(text.charAt(i))) i += 1
        if (i > start) toks.add(text.substring(start, i).toLowerCase)
      }
      val t = toks.size
      val m = math.max(0, t - n + 1)
      val out = new Array[Any](m)
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < m) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks.get(j + k))
          k += 1
        }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): WordNGramsOnly =
      copy(child = c)
  }

  /** MinHash signature (array<long>, length k) of an array<string>:
    * sig[i] = min over elements of xxhash64(element, seed = i). */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return null
      val sig = Array.fill(k)(Long.MaxValue)
      var e = 0
      while (e < n) {
        val s = arr.getUTF8String(e)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var i = 0
        while (i < k) {
          val h = XXH64.hashUnsafeBytes(base, off, len, i.toLong)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        e += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(child = c)
  }

  // one digest instance per executor thread (the StatKernelExpressions
  // discipline): getInstance("MD5") would otherwise run per shingle
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** ENGINE-PORTABLE MinHash signature over a shingle array — the
    * compiled form of the audit family's md5-affine chain
    * (graft.operators.Dedup.portableSigs): per shingle,
    * x = (first 4 md5 digest bytes as unsigned 32-bit) mod p with
    * p = 2³¹−1 (bit-identical to
    * `conv(substring(md5(s),1,8),16,10) % p` — the first 8 hex digits
    * ARE the first 4 bytes), and hash i is min over shingles of
    * (aᵢ·x + bᵢ) mod p, aᵢ = (2i+1)·1597334677 mod p,
    * bᵢ = (40503·i + 7) mod p. One digest per thread, one pass over
    * the shingles with an inner k-loop — the composed HOF form pays an
    * interpreted lambda per (shingle, hash) PLUS an md5 hex round-trip
    * per shingle, and needed a lineage cut just to stop the md5 from
    * re-running k times. Mirrors the HOF form's null shape: an empty
    * shingle array yields an all-null signature (array_min of empty),
    * null elements are skipped (array_min ignores nulls). */
  case class PortableMinHash(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1 && k <= 64, "numHashes in [1, 64]")
    private val P = 2147483647L
    private val as = Array.tabulate(k)(i => (2L * i + 1L) * 1597334677L % P)
    private val bs = Array.tabulate(k)(i => (40503L * i + 7L) % P)
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sig = Array.fill(k)(Long.MaxValue)
      val md = md5.get()
      var e = 0
      var seen = false
      while (e < n) {
        if (!arr.isNullAt(e)) {
          seen = true
          val s = arr.getUTF8String(e)
          md.reset()
          md.update(s.getBytes)
          val d = md.digest()
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          val x = h % P
          var i = 0
          while (i < k) {
            val v = (as(i) * x + bs(i)) % P
            if (v < sig(i)) sig(i) = v
            i += 1
          }
        }
        e += 1
      }
      if (!seen) new GenericArrayData(new Array[Any](k)) // k nulls
      else new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): PortableMinHash =
      copy(child = c)
  }

  /** 64-bit SimHash of lower(text)'s whitespace tokens: per-bit vote of
    * each token's xxhash64 (seed 42, matching functions.xxhash64). */
  case class SimHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val votes = new Array[Int](64)
      var i = 0
      val len = text.length
      while (i < len) {
        while (i < len && isWs(text.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(text.charAt(i))) i += 1
        if (i > start) {
          val tok = UTF8String.fromString(
            text.substring(start, i).toLowerCase)
          val h = XXH64.hashUnsafeBytes(
            tok.getBaseObject, tok.getBaseOffset, tok.numBytes(), 42L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
    override protected def withNewChildInternal(c: Expression): SimHash =
      copy(child = c)
  }

  /** Winnowing fingerprint selection (SIGMOD'03) in one compiled pass:
    * tokenize lower(text) on whitespace, hash every positional word
    * n-gram, slide a window of `window` consecutive hashes, keep each
    * window's minimum, de-duplicate preserving first appearance —
    * exactly the HOF-chain semantics in Dedup.winnowingFingerprints,
    * minus the per-element lambda interpretation and the hex-string
    * round-trip of `conv(substring(md5(g),1,8),16,10)`.
    *
    * `portable = true` keeps the engine-replayable hash (first 4 md5
    * digest bytes as an unsigned 32-bit value — bit-identical to the
    * SQL formulation, so the DuckDB oracle still replays fingerprints);
    * `portable = false` swaps in xxhash64(seed 42), the production
    * hash: no digest allocation per gram, ~2× the selection throughput,
    * same guaranteed-density contract (any hash works — the paper's
    * guarantee is positional, not hash-specific).
    *
    * Returns null when the document has fewer than `n` tokens (no
    * grams → no fingerprints), mirroring the pre-filter the HOF chain
    * needed. */
  case class WinnowFingerprints(
      child: Expression, n: Int, window: Int, portable: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val toks = new java.util.ArrayList[String]()
      var i = 0
      val len = text.length
      while (i < len) {
        while (i < len && isWs(text.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(text.charAt(i))) i += 1
        if (i > start) toks.add(text.substring(start, i).toLowerCase)
      }
      val m = toks.size - n + 1
      if (m <= 0) return null
      val md = if (portable)
        java.security.MessageDigest.getInstance("MD5") else null
      val h = new Array[Long](m)
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < m) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks.get(j + k))
          k += 1
        }
        val g = UTF8String.fromString(sb.toString)
        if (portable) {
          md.reset()
          val d = md.digest(g.getBytes)
          h(j) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        } else {
          h(j) = XXH64.hashUnsafeBytes(
            g.getBaseObject, g.getBaseOffset, g.numBytes(), 42L)
        }
        j += 1
      }
      val out = new java.util.LinkedHashSet[java.lang.Long]()
      if (m <= window) {
        var mn = h(0)
        var p = 1
        while (p < m) { if (h(p) < mn) mn = h(p); p += 1 }
        out.add(mn)
      } else {
        var p = 0
        val last = m - window
        while (p <= last) {
          var mn = h(p)
          var q = p + 1
          while (q < p + window) { if (h(q) < mn) mn = h(q); q += 1 }
          out.add(mn)
          p += 1
        }
      }
      val arr = new Array[Any](out.size)
      val it = out.iterator()
      var o = 0
      while (it.hasNext) { arr(o) = it.next().longValue(); o += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
      copy(child = c)
  }

  /** Content-defined chunk boundaries (the Rabin-fingerprint family —
    * basic CDC without min/max clamps): slide a `w`-codepoint window
    * over the text, compute the polynomial hash
    * Σ_{k<w} code(i−k)·31^k (mod 2^64), and cut after position i
    * whenever the hash's low bits equal divisor−1 — so boundaries
    * depend only on LOCAL content and survive insertions/deletions
    * elsewhere (the property fixed-size chunking lacks, and the reason
    * CDC is the storage-dedup standard). Expected chunk length ≈
    * `divisor` codepoints.
    *
    * Positions are 1-based CODEPOINTS (matching SQL substr semantics
    * on both engines). Returns array<struct<start,len>> covering the
    * text exactly; null for empty input. One compiled pass per row;
    * mod-2^64 arithmetic is Java long wrap-around, replayed exactly in
    * HUGEINT SQL with the same power table. */
  case class CdcChunks(child: Expression, w: Int, divisor: Int)
      extends UnaryExpression with CodegenFallback {
    require(w > 0 && divisor > 1 && (divisor & (divisor - 1)) == 0,
      "w must be positive and divisor a power of two")
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("start", IntegerType, nullable = false),
        StructField("len", IntegerType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val cps = s.codePoints().toArray
      val L = cps.length
      if (L == 0) return null
      val pw = new Array[Long](w)
      pw(0) = 1L
      var k = 1
      while (k < w) { pw(k) = pw(k - 1) * 31L; k += 1 }
      val mask = (divisor - 1).toLong
      val cuts = new java.util.ArrayList[Int]()
      cuts.add(0)
      var i = w - 1
      while (i < L) {
        var h = 0L
        var j = 0
        while (j < w) { h += cps(i - j) * pw(j); j += 1 }
        if ((h & mask) == mask && i + 1 < L) cuts.add(i + 1)
        i += 1
      }
      cuts.add(L)
      val out = new Array[Any](cuts.size - 1)
      var c = 0
      while (c < cuts.size - 1) {
        val a = cuts.get(c)
        val b = cuts.get(c + 1)
        out(c) = org.apache.spark.sql.catalyst.InternalRow(a + 1, b - a)
        c += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): CdcChunks =
      copy(child = c)
  }

  def word_shingles(text: Column, n: Int): Column =
    GraftSqlBridge.toColumn(WordShingles(GraftSqlBridge.toExpression(text), n))

  def word_ngrams(text: Column, maxN: Int): Column =
    GraftSqlBridge.toColumn(WordNGrams(GraftSqlBridge.toExpression(text), maxN))

  def word_ngrams_only(text: Column, n: Int): Column =
    GraftSqlBridge.toColumn(
      WordNGramsOnly(GraftSqlBridge.toExpression(text), n))

  def minhash_sig(shingles: Column, k: Int): Column =
    GraftSqlBridge.toColumn(MinHashSig(GraftSqlBridge.toExpression(shingles), k))

  def portable_minhash(shingles: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      PortableMinHash(GraftSqlBridge.toExpression(shingles), k))

  def simhash(text: Column): Column =
    GraftSqlBridge.toColumn(SimHash(GraftSqlBridge.toExpression(text)))

  def winnow_fingerprints(
      text: Column, n: Int, window: Int, portable: Boolean): Column =
    GraftSqlBridge.toColumn(WinnowFingerprints(
      GraftSqlBridge.toExpression(text), n, window, portable))

  def cdc_chunks(text: Column, w: Int, divisor: Int): Column =
    GraftSqlBridge.toColumn(CdcChunks(
      GraftSqlBridge.toExpression(text), w, divisor))
}
