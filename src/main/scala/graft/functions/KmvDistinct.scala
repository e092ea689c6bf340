package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * KMV (k-minimum-values) distinct-count estimate over a pre-hashed
 * 60-bit column, as bigint (Bar-Yossef et al. 2002, the classic
 * bottom-k sketch).
 *
 * State is the set of the k smallest DISTINCT hash values seen — a
 * pure function of the input's value SET, so the result is
 * bit-deterministic under any partitioning, any merge order, and any
 * thread count. That is the property Spark's own HyperLogLog++
 * (`approx_count_distinct`) cannot give a cross-engine gate: HLL
 * register state is engine-internal, while the k smallest md5 values
 * are reproducible by ANY engine with md5 — `SELECT DISTINCT hash
 * ORDER BY hash LIMIT k` — which makes a strict DuckDB oracle possible
 * (see the `profile_stats_approx` gate entry).
 *
 * Estimate: with m = |retained set|,
 *   - m < k  → m exactly (every distinct hash fits; the sketch IS the
 *     distinct count of the 60-bit hashes),
 *   - m = k  → floor((k−1) · 2⁶⁰ / h_k) where h_k is the k-th smallest
 *     hash — exact integer arithmetic (BigInt here, HUGEINT `//` in the
 *     oracle), no floating point anywhere, so the two engines agree
 *     bit-for-bit, not approximately.
 * Relative standard error ≈ 1/√(k−2): ~3.1% at the default k = 1024
 * (HLL++ p=11's 2.3% band, at 8 KiB vs 2 KiB of state — the price of
 * replayability; bump k for tighter bounds, error ∝ 1/√k).
 *
 * Scale shape: per-partition partial state is ≤ k longs regardless of
 * row count; the shuffle carries ≤ k·8 bytes per column per partition
 * (map-side combined), never values. Update cost beyond warm-up is one
 * compare against the current k-th minimum (almost always a reject on
 * uniform hashes: P(accept) = k/m after m distincts).
 *
 * The child must be the 60-bit hash ALREADY computed — a
 * TypedImperativeAggregate evaluates its child interpreted per row, so
 * the md5 kernel belongs in a codegen projection upstream
 * (`KmvDistinct.kmvHash60`, same discipline as Profile.corrExact).
 */
/** The shared KMV skeleton — ONE definition of the sketch's state
  * machine (bounded insert, merge, serde, input contract) so the two
  * readouts below can never diverge; subclasses choose only WHAT to
  * read off the retained set (`dataType`/`eval`) plus case-class
  * plumbing. */
sealed trait KmvAggregate
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  def child: Expression
  def k: Int

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash input, got ${other.sql}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvDistinct.insert(buf, k, v.asInstanceOf[Long], prettyName)
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    KmvDistinct.mergeInto(buf, k, other, prettyName)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvDistinct.ser(buf)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvDistinct.deser(bytes)
}

case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvAggregate {

  KmvDistinct.requireValidK(k)

  override def dataType: DataType = LongType

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvDistinct.estimate(buf.size, k,
      if (buf.isEmpty) 0L else buf.last.longValue())

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "kmv_distinct"
}

/**
 * The KMV sketch ITSELF — the k smallest distinct 60-bit hashes, as a
 * sorted bigint array — for callers that combine sketches rather than
 * read one estimate: set-operation estimators (union/intersection/
 * Jaccard between corpora, see `Dedup.corpusOverlapKmv`) merge two
 * retained sets and re-trim, which needs the hashes, not the scalar.
 * Same state, same determinism contract as [[KmvDistinct]].
 */
case class KmvSet(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvAggregate {

  KmvDistinct.requireValidK(k)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSet =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSet =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "kmv_set"
}

object KmvDistinct {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression => toExpr}

  /** Hash domain: the first 15 hex chars of md5 = 60 bits, chosen so the
    * integer fits a signed long in BOTH engines (DuckDB parses it with
    * `CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`). */
  val HashBits: Int = 60
  val HashMax: Long = (1L << HashBits) - 1

  /** KMV distinct-count estimate of a 60-bit hash column (bigint). */
  def kmv_distinct(c: Column, k: Int = 1024): Column =
    column(KmvDistinct(toExpr(c), k).toAggregateExpression())

  /** The retained bottom-k hash set itself, sorted ascending
    * (array<bigint>) — for sketch-combining callers. */
  def kmv_set(c: Column, k: Int = 1024): Column =
    column(KmvSet(toExpr(c), k).toAggregateExpression())

  // shared bounded-insert / merge / estimate / serde core for the two
  // aggregates — ONE definition of the sketch's semantics
  // floor 16: below that the (k−1)/h_k estimator's variance is useless
  // and k=1 would degenerate to est=0; ceiling keeps serialize()'s
  // 4 + k*8 length math in int range
  private[functions] def requireValidK(k: Int): Unit =
    require(k >= 16 && k <= (Int.MaxValue - 4) / 8,
      s"k must be in [16, ${(Int.MaxValue - 4) / 8}], got $k")

  private[functions] def insert(
      buf: java.util.TreeSet[java.lang.Long], k: Int, h: Long,
      name: String): Unit = {
    // the estimator divides by h_k assuming a uniform [0, 2^60) hash;
    // out-of-domain input means the caller fed something other than
    // kmvHash60 — a silently wrong estimate, so fail loudly instead
    if (h < 0L || h > HashMax) throw new IllegalStateException(
      s"$name input $h outside the 60-bit hash domain - " +
      "feed KmvDistinct.kmvHash60(col) (or an equivalent [0, 2^60) hash)")
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last && buf.add(h)) { buf.pollLast(); () }
  }

  private[functions] def mergeInto(
      buf: java.util.TreeSet[java.lang.Long], k: Int,
      other: java.util.TreeSet[java.lang.Long],
      name: String): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, k, it.next().longValue(), name)
    buf
  }

  /** m < k → m exactly; else ⌊(k−1)·2⁶⁰ / h_k⌋ in exact integer
    * arithmetic. h_k = 0 needs k distinct non-negative hashes all ≤ 0 —
    * impossible for k ≥ 2; max() is belt-and-braces so a (vanishingly
    * unlikely) all-zero domain errors high, not ÷0. */
  def estimate(m: Int, k: Int, hk: Long): Long =
    if (m < k) m.toLong
    else ((BigInt(k - 1) << HashBits) / BigInt(math.max(hk, 1L))).toLong

  private[functions] def ser(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  private[functions] def deser(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  /** The 60-bit md5 hash of a column's string rendering, as a native
    * codegen expression ([[KmvHash60]]) — exactly replayable in DuckDB
    * as `CAST('0x' || substring(md5(CAST(x AS VARCHAR)), 1, 15) AS
    * BIGINT)`: integer columns render as their decimal digits (Java's
    * `Long.toString` ≡ both engines' casts), strings hash their UTF-8
    * bytes, both md5s are RFC 1321, and the top 60 bits of the first 8
    * digest bytes equal the first-15-hex-chars integer (pinned against
    * an independent MessageDigest in KmvDistinctSpec). Null propagates
    * (null value → null hash → skipped by the aggregates).
    *
    * Why not the builtin `conv(substring(md5(cast(...))))` chain it
    * replaces (r14, measured): that chain allocates a hex UTF8String +
    * a conv decimal string per row per column — the projection alone
    * cost ~2 s of the KMV profile's sf0.1 wall; this kernel is one
    * thread-local MessageDigest call and bit arithmetic. */
  def kmvHash60(c: Column): Column = column(KmvHash60(toExpr(c)))

  /** The 60-bit md5 hashes of a token array's word `n`-grams, fused
    * into ONE codegen expression ([[KmvShingleHash60]]): array<bigint>,
    * one hash per gram, in gram order. Bit-identical to the
    * `explode(shingles) + kmvHash60` chain it replaces when fed the
    * SAME `tokens(...)` array (KmvShingleSpec pins it against a frozen
    * copy of that chain): gram rendering is the window's tokens joined
    * by one space with nulls skipped (`concat_ws` semantics), a
    * streamed md5 over token bytes + 0x20 separators equals md5 of the
    * concatenated gram string, and a <n-token document yields ONE gram
    * of all its tokens. What it removes (r15, the dedup_overlap_kmv
    * hot path): the per-gram `slice` array + gram STRING
    * materialization and the explode of those strings — grams never
    * exist as strings; each token's UTF-8 bytes are fetched once per
    * document and streamed through the digest per window. Tokenization
    * itself stays in Catalyst (`split(lower(...))`) so its semantics
    * cannot drift from Spark's. */
  def kmvShingleHash60(tokens: Column, n: Int): Column =
    column(KmvShingleHash60(toExpr(tokens), n))

  /** The 16-bit md5 bucket of a string — the integer whose `%04x`
    * rendering is `substring(md5(s), 1, 4)`, as one codegen kernel
    * ([[Md5Bucket16]]). The deterministic-membership rule shared by
    * [[graft.ops.Splits]] and the quantile profiler's hash sample
    * compares that 4-hex prefix LEXICOGRAPHICALLY against a 4-hex
    * threshold; both sides are exactly 4 lowercase hex chars, and hex
    * digits sort in value order ('0'‥'9' < 'a'‥'f' in ASCII), so
    * `substring(md5(s),1,4) < hex4` ⟺ `md5_bucket16(s) < int(hex4,16)`
    * — pinned against the builtin chain in KernelPropertySpec. What it
    * removes (r16): the 32-char hex UTF8String + the substring copy +
    * the per-row string comparison; the digest itself (intrinsified
    * MessageDigest) remains. Null propagates. */
  def md5Bucket16(c: Column): Column = column(Md5Bucket16(toExpr(c)))
}

/**
 * First 16 bits of md5 over a string's UTF-8 bytes, as int in
 * [0, 65536) — `int(md5hex[0:4], 16)`. See [[KmvDistinct.md5Bucket16]]
 * for the equivalence contract with the `substring(md5(s), 1, 4)`
 * string chain it replaces.
 */
case class Md5Bucket16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    HashTypeChecks.string(child.dataType, prettyName)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any): Any =
    KmvHash60Kernels.bucket16Utf8(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.KmvHash60Kernels.bucket16Utf8($x)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "md5_bucket16"
}

/**
 * Native codegen form of the KMV input hash: the 60-bit integer whose
 * hex form is the first 15 chars of md5 over the value's string
 * rendering. Accepts bigint/int (decimal-digit rendering — identical
 * to both engines' cast-to-string) and string (raw UTF-8 bytes); cast
 * other types to string explicitly so the cross-engine rendering is a
 * visible choice, not an accident.
 */
case class KmvHash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, int, or string input, got ${other.sql}" +
      " - cast to string to pick the rendering explicitly")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any = child.dataType match {
    case StringType => KmvHash60Kernels.hash60Utf8(a.asInstanceOf[UTF8String])
    case IntegerType => KmvHash60Kernels.hash60Long(a.asInstanceOf[Int].toLong)
    case _ => KmvHash60Kernels.hash60Long(a.asInstanceOf[Long])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType => defineCodeGen(ctx, ev,
        x => s"graft.functions.KmvHash60Kernels.hash60Utf8($x)")
      // int widens to long in the generated Java call - same digits
      case _ => defineCodeGen(ctx, ev,
        x => s"graft.functions.KmvHash60Kernels.hash60Long($x)")
    }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "kmv_hash60"
}

/**
 * Fused word-n-gram KMV hashes: token array (array<string>) →
 * array<bigint> of the 60-bit md5 hashes of each word n-gram — see
 * [[KmvDistinct.kmvShingleHash60]] for the exact-equivalence contract
 * with the `shingles + explode + kmvHash60` chain it replaces
 * (KmvShingleSpec pins it against a frozen copy of that chain).
 */
case class KmvShingleHash60(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    HashTypeChecks.tokenArray(child.dataType, prettyName)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    KmvHash60Kernels.gramHashes(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.KmvHash60Kernels.gramHashes($x, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "kmv_shingle_hash60"
}

/** Per-row kernels for [[KmvHash60]] — a standalone object (no
  * companion class) so Scala emits static forwarders the generated
  * Java can call. One thread-local MessageDigest, reused per row. */
object KmvHash60Kernels {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  // Direct-mapped lossy memo for hash60Long (r15): real columns repeat
  // values heavily (enum-like domains, money cents — l_discount has 11
  // distinct values across 600k rows), and at ~340 ns per md5 the hash
  // projection dominated the KMV profile entries. A hit costs two array
  // reads; a collision just overwrites (the cache is a pure memo — the
  // function stays deterministic whatever the hit pattern). 2^16 slots
  // × 16 B = 1 MiB per scan thread, bounded for the life of the thread.
  private val MemoBits = 16
  private val MemoMask = (1 << MemoBits) - 1
  private final class Memo {
    val keys = new Array[Long](1 << MemoBits)
    // -1 marks an empty slot: hash60 values live in [0, 2^60), so every
    // REAL cached hash is non-negative (keys init to 0 would otherwise
    // alias the legitimate input 0)
    val vals = Array.fill(1 << MemoBits)(-1L)
  }
  private val memo = ThreadLocal.withInitial[Memo](() => new Memo)

  /** Hash of the long's decimal rendering ("2400", "-5", …). */
  def hash60Long(v: Long): Long = {
    val m = memo.get()
    // Fibonacci scramble so consecutive ids spread over the table
    val idx = ((v * 0x9e3779b97f4a7c15L) >>> (64 - MemoBits)).toInt & MemoMask
    val cached = m.vals(idx)
    if (cached >= 0 && m.keys(idx) == v) return cached
    val h = digest60(java.lang.Long.toString(v)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    m.keys(idx) = v
    m.vals(idx) = h
    h
  }

  /** Hash of the string's UTF-8 bytes (what md5(string) hashes). */
  def hash60Utf8(s: UTF8String): Long = digest60(s.getBytes)

  /** First 16 bits of md5 over the string's UTF-8 bytes —
    * `int(md5hex[0:4], 16)`: hex chars 0..3 are exactly digest bytes
    * 0..1 big-endian. The per-row kernel behind [[Md5Bucket16]]. */
  def bucket16Utf8(s: UTF8String): Int = {
    val md = md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xff) << 8) | (d(1) & 0xff)
  }

  /** All word-n-gram hashes of a token array in one call — the fused
    * kernel behind [[KmvShingleHash60]]. Gram rendering matches
    * `concat_ws(" ", slice(toks, i+1, n))` exactly: window tokens
    * joined by a single 0x20, null tokens skipped (concat_ws
    * semantics), and a document with fewer than n tokens yields ONE
    * gram of all its tokens. The md5 is STREAMED per window (digest of
    * sequential updates ≡ digest of the concatenation), so no gram
    * string is ever materialized; each token's bytes are fetched once
    * per document, not once per covering window. */
  def gramHashes(
      toks: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val total = toks.numElements()
    // token bytes fetched once; null tokens marked to be skipped
    val tb = new Array[Array[Byte]](total)
    var i = 0
    while (i < total) {
      if (!toks.isNullAt(i)) tb(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = md5.get()
    def windowHash(from: Int, len: Int): Long = {
      md.reset()
      var wrote = false
      var j = from
      val end = from + len
      while (j < end) {
        val b = tb(j)
        if (b != null) {
          if (wrote) md.update(' '.toByte)
          md.update(b)
          wrote = true
        }
        j += 1
      }
      top60(md.digest())
    }
    val out =
      if (total < n) Array(windowHash(0, total))
      else {
        val m = total - n + 1
        val hs = new Array[Long](m)
        var i = 0
        while (i < m) { hs(i) = windowHash(i, n); i += 1 }
        hs
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // top 60 bits of the first 8 digest bytes == int(md5hex[0:15], 16):
  // hex chars 0..14 are bytes 0..6 plus the HIGH nibble of byte 7,
  // which is exactly the big-endian 64-bit read shifted right by 4
  private def top60(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  private def digest60(bytes: Array[Byte]): Long = {
    val md = md5.get()
    md.reset()
    top60(md.digest(bytes))
  }
}
