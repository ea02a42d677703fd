package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the character-trigram hot path (t05).
  *
  * `transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))`
  * allocates one 3-char UTF8String per trigram — tens of millions of
  * short-lived objects per partition on a corpus scan, and the downstream
  * hash aggregate keys on variable-length strings. This expression packs
  * each trigram's three CODE POINTS into one long (21 bits each — all of
  * Unicode fits, so packing is injective) in a single pass: the aggregate
  * then runs on fixed-width longs and only the final top-k rows are
  * decoded back to strings.
  *
  * Ordering: UTF-8 binary order equals code-point order, so sorting by
  * the packed long is EXACTLY sorting by the trigram string — top-k
  * tie-breaks survive the encoding unchanged (oracle parity).
  */
case class PackedTrigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_trigrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"packed_trigrams: expected STRING, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    PackedTrigrams.pack(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PackedTrigrams.pack($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object PackedTrigrams {
  /** One pass over the code points; code-point indexing matches Spark's
    * `substring`/`length` semantics (not UTF-16 units), so
    * unpack(pack(s)(i)) == substring(s, i+1, 3) for every i. */
  def pack(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length - 2
    if (n <= 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = (cps(i).toLong << 42) |
          (cps(i + 1).toLong << 21) | cps(i + 2).toLong
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Inverse of one packed trigram — used only on final top-k rows. */
  def unpack(l: Long): String =
    new String(Array(((l >> 42) & 0x1FFFFF).toInt,
      ((l >> 21) & 0x1FFFFF).toInt, (l & 0x1FFFFF).toInt), 0, 3)
}

/** Native Catalyst expression for word n-gram hash keys (d03/d04/d07
  * shingles, d08 decontamination grams).
  *
  * The declarative form,
  * `transform(sequence(1, size(words)-n+1), i -> xxhash64(slice(words, i, n)))`,
  * runs INTERPRETED (lambda higher-order functions are outside
  * whole-stage codegen) and allocates one sliced ArrayData per token
  * position, re-hashing every word's bytes n times — the single hottest
  * map-side loop of the dedup/decontamination pipeline (2.4 s of the
  * 3.3 s d08 scan stage at sf0.1). This expression does one pass: split
  * on single spaces (Spark `split(trim(text), " ")` semantics, trailing
  * empties kept), hash each word's UTF-8 bytes ONCE (XXH64, Spark's
  * seed 42), then chain n consecutive word-hashes per gram position with
  * `XXH64.hashLong` — the identical avalanche Spark's `xxhash64` applies
  * to an array<long>, 8 primitive ops per gram instead of n string
  * hashes + an allocation.
  *
  * The values are internal JOIN/GROUP keys only (near-dup candidates,
  * gram-overlap counts); no oracle ever sees a hash, so the function only
  * needs determinism and 64-bit spread, not cross-engine portability.
  */
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hashes: expected STRING, got ${child.dataType.simpleString}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hashes: gram width must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    WordGramHashes.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramHashes.hashes($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object WordGramHashes {
  private final val Seed = 42L // Spark's xxhash64 seed

  /** Per-position n-gram hashes of the single-space-separated words of
    * `s` after trim; empty array when the document has fewer than n
    * words. Word boundaries come from a raw byte scan (0x20 is never a
    * UTF-8 continuation byte, so this equals code-point splitting), each
    * word's bytes hash ONCE in place — no String, no per-word array. */
  def hashes(s0: UTF8String, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val s = s0.trim()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    // split(trim(text), " ") semantics: words = spaces + 1 (empty input
    // included — Java regex split of "" yields one empty word)
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        spaces += 1
      }
      i += 1
    }
    val nw = spaces + 1
    val k = nw - n + 1
    if (k <= 0) return new GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](nw)
    var w = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len ||
          org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        wh(w) = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        w += 1
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](k)
    i = 0
    while (i < k) {
      var h = Seed
      var j = 0
      while (j < n) {
        h = XXH64.hashLong(wh(i + j), h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for the per-document MinHash signature
  * (d09's corpus-side map pass).
  *
  * The declarative form — n separate
  * `array_min(transform(shs, x -> xxhash64(lit(i), x)))` columns — runs
  * INTERPRETED (each lambda HOF is outside whole-stage codegen) and
  * walks the shingle array n times, allocating a transformed ArrayData
  * per walk; at n = 64 that was the dominant cost of d09's corpus scan
  * (~2x the rest of the query at sf0.1). This expression computes all n
  * minima in ONE pass of a tight primitive loop: n×m `XXH64.hashLong`
  * calls, zero allocation beyond the n-long output.
  *
  * Bit-compatibility contract: element i equals
  * `array_min(transform(arr, x -> xxhash64(lit(i), x)))` EXACTLY —
  * per-seed prefix `XXH64.hashInt(i, 42)` (Spark hashes the INT literal
  * first at seed 42) then `XXH64.hashLong(x, prefix)` per element, the
  * identical fold Spark's `xxhash64(lit(i), x)` applies — so swapping
  * the declarative form for this expression cannot change any LSH
  * bucket (pinned by WordGramHashesSpec's minhash parity case).
  * An empty input array yields Long.MaxValue minima (callers filter
  * shingle-less docs first, as d09 does). A NULL element throws —
  * Spark's own null-skipping in `xxhash64`/`array_min` would fold a
  * seed-only hash into the minima, so a null shingle hash is always a
  * caller bug; failing loudly beats silently shifting buckets.
  */
case class MinHashSignature(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != ArrayType(LongType, containsNull = false) &&
        child.dataType != ArrayType(LongType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"minhash_signature: expected ARRAY<BIGINT>, got " +
          child.dataType.simpleString)
    else if (n < 1 || n > 1024) TypeCheckResult.TypeCheckFailure(
      s"minhash_signature: signature width must be in [1, 1024], got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.sign(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.sign($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MinHashSignature {
  def sign(arr: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val m = arr.numElements()
    var k = 0
    while (k < m) {
      if (arr.isNullAt(k)) throw new IllegalArgumentException(
        "minhash_signature: null element in the hash array — a null " +
          "shingle hash is a caller bug (it would silently shift LSH " +
          "buckets); filter or fix the input")
      k += 1
    }
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val prefix = XXH64.hashInt(i, 42L) // xxhash64(lit(i), _)'s 1st fold
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val h = XXH64.hashLong(arr.getLong(j), prefix)
        if (h < best) best = h
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for the PORTABLE affine MinHash family the
  * dedup tuning sweeps use (d18/d23/d27 — reference extension point:
  * `main/stream/Kinesis.scala` delegates record analytics to user code;
  * the affine family itself is the classic universal-hash construction,
  * Broder 1997).
  *
  * The declarative form those sweeps shipped with —
  * `array(array_min(transform(xs, x -> (a0*x + b0) % P)), ...)` — is n
  * interpreted lambda walks per row (n = 64 for the band sweep): each
  * `transform` allocates a fresh ArrayData and every element passes
  * through the interpreter. This expression computes all n affine minima
  * in ONE tight primitive loop, the d-family twin of [[MinHashSignature]]
  * (which is xxhash64-seeded and therefore not DuckDB-checkable; this
  * family is pure BIGINT arithmetic both engines evaluate identically).
  *
  * Bit-compatibility contract: element i equals
  * `array_min(transform(xs, x -> (x % P) pre-reduced, then
  * (a_i·x + b_i) % P))` EXACTLY, with P = 2^31−1,
  * a_i = ((2i+1)·2654435761) % P, b_i = (i·40503 + 12345) % P — the
  * constants [[AffineMinHashSignature.affineA]]/[[affineB]] that the
  * DuckDB oracle SQL spells out. Inputs reduce mod P internally, so
  * callers may pass raw 60-bit shingle fingerprints; since reduction is
  * idempotent, pre-reduced inputs give the same signature. The product
  * (P−1)² + (P−1) < 2^62 never overflows a long, so Scala `%` and SQL
  * `%` agree (all operands non-negative).
  *
  * Loud contracts (a wrong signature silently shifts LSH buckets):
  * null elements, negative elements, and empty arrays all throw —
  * the SQL form would yield NULL minima for an empty array, which the
  * non-null output type cannot represent, and callers always filter
  * shingle-less docs first.
  */
case class AffineMinHashSignature(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "affine_minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != ArrayType(LongType, containsNull = false) &&
        child.dataType != ArrayType(LongType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"affine_minhash_signature: expected ARRAY<BIGINT>, got " +
          child.dataType.simpleString)
    else if (n < 1 || n > 1024) TypeCheckResult.TypeCheckFailure(
      s"affine_minhash_signature: signature width must be in [1, 1024], " +
        s"got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    AffineMinHashSignature.sign(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AffineMinHashSignature.sign($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object AffineMinHashSignature {
  val P31 = 2147483647L // 2^31 − 1, Mersenne prime
  def affineA(i: Int): Long = ((2L * i + 1) * 2654435761L) % P31
  def affineB(i: Int): Long = (i.toLong * 40503L + 12345L) % P31

  def sign(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m == 0) throw new IllegalArgumentException(
      "affine_minhash_signature: empty shingle array — the declarative " +
        "form yields NULL minima here, which the non-null signature " +
        "type cannot represent; filter shingle-less docs first")
    val xs = new Array[Long](m)
    var k = 0
    while (k < m) {
      if (arr.isNullAt(k)) throw new IllegalArgumentException(
        "affine_minhash_signature: null element in the fingerprint " +
          "array — a null shingle hash is a caller bug (it would " +
          "silently shift LSH buckets); filter or fix the input")
      val x = arr.getLong(k)
      if (x < 0L) throw new IllegalArgumentException(
        s"affine_minhash_signature: negative fingerprint $x — the " +
          "affine family is defined over non-negative residues; SQL % " +
          "and Scala % diverge from the intended bucket on negatives")
      xs(k) = x % P31
      k += 1
    }
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val a = affineA(i)
      val b = affineB(i)
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val h = (a * xs(j) + b) % P31
        if (h < best) best = h
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for the PORTABLE 60-bit md5 word-gram
  * fingerprint idiom the d/t families share:
  *
  * sliding (`step` = 1):
  * `transform(sequence(1, size(split(trim(text),' ')) - n + 1),
  *    i -> CAST(conv(substring(md5(encode(array_join(slice(
  *      split(trim(text),' '), i, n), ' '), 'UTF-8')), 1, 15), 16, 10)
  *      AS BIGINT))`  (empty array when the doc has < n words)
  *
  * chunked (`step` = n):
  * `transform(sequence(0, (size(split(trim(text),' ')) - 1) div n),
  *    i -> ... slice(..., i*n + 1, n) ...)`  (last chunk may be short;
  *    always >= 1 chunk, even for an empty/whitespace-only text)
  *
  * The declarative chain is an interpreted lambda that, at the four
  * hottest sites, also re-evaluates `split(trim(text))` PER GRAM —
  * O(words²) work per document — and per position allocates a sliced
  * array, a joined string, an encode copy, a 32-char hex string, a
  * 15-char substring and a base-16 parse. This expression computes the
  * identical values in one pass: trim once, find the word boundaries
  * once (single-space split semantics — consecutive spaces yield empty
  * words, exactly like `split(trim(text), ' ')`), and MD5 each gram
  * directly over its ORIGINAL byte span (joining k consecutive words
  * with single spaces reproduces that span byte-for-byte, because the
  * separators between consecutive words are single 0x20 bytes by
  * construction of the split). The 60-bit value is the big-endian long
  * of digest bytes 0..7 shifted right 4 — [[Md5Hash60]]'s parse.
  * Bit-identical to the conv chain (spec-pinned), so every DuckDB
  * oracle built on the md5-prefix Horner parse is unchanged.
  */
case class Md5GramFps(child: Expression, n: Int, step: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_gram_fps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"md5_gram_fps: expected STRING, got ${child.dataType.simpleString}")
    else if (n < 1) TypeCheckResult.TypeCheckFailure(
      s"md5_gram_fps: gram width must be >= 1, got $n")
    else if (step != 1 && step != n) TypeCheckResult.TypeCheckFailure(
      s"md5_gram_fps: step must be 1 (sliding) or n (chunked), got $step")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    Md5GramFps.fps(input.asInstanceOf[UTF8String], n, step)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5GramFps.fps($c, $n, $step);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Md5GramFps {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def fps(s0: UTF8String, n: Int, step: Int): ArrayData = {
    val bytes = s0.trim().getBytes // one copy of the trimmed text
    val len = bytes.length
    // word boundaries of split(trim(text), " "): starts(w)..ends(w) is
    // word w's byte span; consecutive spaces yield empty words, and an
    // empty text yields the single empty word — matching Spark's split
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val nw = spaces + 1
    val starts = new Array[Int](nw)
    val ends = new Array[Int](nw)
    var w = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || bytes(i) == 0x20) {
        starts(w) = start; ends(w) = i; w += 1; start = i + 1
      }
      i += 1
    }
    val k =
      if (step == 1) nw - n + 1
      else (nw - 1) / n + 1 // chunked: always >= 1 chunk
    if (k <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = digests.get()
    val out = new Array[Long](k)
    i = 0
    while (i < k) {
      val lo = i * step
      val hi = math.min(lo + n, nw) - 1 // last chunk may be short
      md.reset()
      md.update(bytes, starts(lo), ends(hi) - starts(lo))
      val d = md.digest()
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = h >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextFunctions {
  /** Codegen'd packed character trigrams of a string column. */
  def packedTrigrams(c: Column): Column =
    GraftBridge.column(PackedTrigrams(GraftBridge.expression(c)))

  /** Codegen'd per-position word n-gram hash keys of a text column. */
  def wordGramHashes(c: Column, n: Int): Column =
    GraftBridge.column(WordGramHashes(GraftBridge.expression(c), n))

  /** Codegen'd 60-bit md5 word-gram fingerprints of a text column —
    * value-identical to the declarative
    * `transform(sequence(...), i -> conv(substring(md5(...)...)))`
    * sliding/chunked gram idiom (see [[Md5GramFps]]). */
  def md5GramFps(c: Column, n: Int, step: Int = 1): Column =
    GraftBridge.column(Md5GramFps(GraftBridge.expression(c), n, step))

  /** Codegen'd n-wide MinHash signature of an array<bigint> column. */
  def minhashSignature(c: Column, n: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(c), n))

  /** Codegen'd n-wide PORTABLE affine MinHash signature (oracle-checkable
    * twin of [[minhashSignature]]; see [[AffineMinHashSignature]]). */
  def affineMinhashSignature(c: Column, n: Int): Column =
    GraftBridge.column(AffineMinHashSignature(GraftBridge.expression(c), n))
}
