package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot loops the built-in surface
  * cannot express efficiently.
  *
  * Why these exist (measured on sf0.1, local[32]):
  *  - A higher-order-function fold (`aggregate`/`transform`) is
  *    INTERPRETED per element — no codegen, no CSE inside the lambda; a
  *    64-dim dot product via fold costs ~30us/pair.
  *  - Unrolling into a flat 128-term expression does codegen, but the
  *    generated method exceeds HotSpot's huge-method limit (8KB) and runs
  *    as un-JIT-ed bytecode: ~0.7us per term.
  *  - A custom expression with a LOOP in `doGenCode` JIT-compiles to a
  *    vectorizable kernel: ~0.05us/pair — three orders of magnitude over
  *    the fold, while preserving the exact left-to-right IEEE-754
  *    addition order the DuckDB oracle reproduces.
  */

/** Ordered dot product over two array<float|double> columns, widening to
  * double BEFORE multiplying and accumulating left-to-right — the exact
  * arithmetic of `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and of the
  * oracle's list_reduce fold, at JIT-loop speed.
  *
  * Null ELEMENTS are not supported (embedding vectors are dense); null
  * INPUT arrays propagate null per BinaryExpression's default. Arrays of
  * DIFFERENT lengths yield NULL — the same answer the composed
  * `aggregate(zip_with(...))` form and the oracle's list_reduce give
  * (zip_with pads the short side with null, nulling the fold): a ragged
  * embedding must surface as a visible NULL, never as a silently
  * truncated partial sum.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on ragged inputs
  override def prettyName: String = "graft_dot"

  private def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  @transient private lazy val leftDouble = elemIsDouble(left)
  @transient private lazy val rightDouble = elemIsDouble(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightDouble) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val ga = if (leftDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val gb = if (rightDouble) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $acc += $ga * $gb; }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Distinct word n-gram shingles of a text column in ONE pass per row.
  *
  * Semantics mirror `array_distinct(shinglesOfTokens(tokens(text), n))`
  * exactly (space-run tokenization after space-trim, space-joined
  * n-grams, first-occurrence distinct) — but as a single evaluator. The
  * composed HOF form is interpreted per element AND, after
  * CollapseProject/filter-pushdown inlines the token expression into the
  * lambda, re-tokenizes the document for every element_at — O(len *
  * shingles) per row, measured 30s+ on 5k docs. This runs in O(len).
  *
  * CodegenFallback is fine here: one eval per ROW (not per element), and
  * the eval body is already a tight JIT-compiled loop.
  */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Space-only trim + split on space runs, matching trim()/split(' +').
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    val toks = s.substring(start, end).split(" +").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Rolling polynomial hash over a string's code points at JIT-loop speed:
  * acc' = (acc * 31 + cp) mod (2^31 - 1), acc0 = 0 — bit-identical to the
  * HOF fold `aggregate(codePoints(c), 0L, (acc, x) => (acc*31+x) % p)`
  * (and to the oracle's list_reduce), which evaluates INTERPRETED per
  * character: ~25ms for a single 8 KB document, versus microseconds here.
  * Intermediate acc < 2^31, so acc*31 + cp stays far below 2^62 — safe
  * under ANSI overflow checking and exactly representable.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % 2147483647L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** MinHash-LSH band keys of a document in ONE pass: tokenization
  * identical to [[ShingleSet]]; per shingle the 64-bit xxHash (seed 42,
  * same function as Spark's `xxhash64`) is reduced mod p = 2^31-1 and
  * pushed through `numHashes` universal-hash permutations
  * h_k(x) = (a_k * x + b_k) mod p (a_k in [1,p), b_k in [0,p), fixed
  * seed), keeping the per-permutation minimum; the signature is then
  * folded into `bands` band keys (rows = numHashes / bands minima per
  * band, band index baked into the fold seed). Null when the document
  * has fewer than n tokens.
  *
  * Replaces the explode → shuffle → 128-min-aggregate signature build:
  * the signature never leaves the row, so the only shuffled payload in
  * MinHash dedup is (doc_id, band, key) — `bands` rows per document
  * instead of one row per shingle. Duplicate shingles are not
  * deduplicated (a duplicate cannot change a minimum). All products
  * stay below 2^62 (plain JVM arithmetic — ANSI overflow rules do not
  * apply inside an expression's eval). CodegenFallback like
  * [[ShingleSet]]: one eval per row, tight JIT'd loops.
  */
case class MinHashBandKeys(child: Expression, n: Int, numHashes: Int,
    bands: Int) extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")
  require(numHashes % bands == 0, "bands must divide numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_band_keys"

  private val P = 2147483647L

  // Fixed-seed universal-hash coefficients — identical draw order to the
  // column-based formulation this replaced, so the per-permutation MINIMA
  // (and hence the candidate SEMANTICS — which documents can collide in a
  // band) are stable across versions. The band-KEY values themselves are
  // a fold over those minima and have changed encodings before; persisted
  // keys are not comparable across builds, only the minima are.
  @transient private lazy val (coefA, coefB) = {
    val rnd = new scala.util.Random(42)
    val as = Array.fill(numHashes)(1L + rnd.nextLong(P - 1))
    val bs = Array.fill(numHashes)(rnd.nextLong(P))
    (as, bs)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    val toks = s.substring(start, end).split(" +").filter(_.nonEmpty)
    if (toks.length < n) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val xxh = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      val h = java.lang.Math.floorMod(xxh, P)
      var j = 0
      while (j < numHashes) {
        val v = (coefA(j) * h + coefB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val rows = numHashes / bands
    val keys = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var r = 0
      while (r < rows) {
        acc = acc * 1000003L + mins(b * rows + r)
        r += 1
      }
      // Finalizing xor-shift mix (splitmix64 tail): the plain affine fold
      // keeps the low bits weakly mixed, which admits spurious band-key
      // collisions (harmless for correctness — candidates are verified
      // exactly — but each one costs a verification). Equal minima still
      // map to equal keys, so candidate semantics are unchanged.
      acc ^= acc >>> 30; acc *= 0xbf58476d1ce4e5b9L
      acc ^= acc >>> 27; acc *= 0x94d049bb133111ebL
      acc ^= acc >>> 31
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** 64-bit SimHash of a document's DISTINCT word n-gram shingles in ONE
  * pass: tokenization and distinct semantics identical to [[ShingleSet]],
  * per-shingle hash = xxHash64(seed 42, Spark's `xxhash64`), bit j of
  * the code set iff at least half the distinct shingle hashes have bit j
  * set (2*count >= total — the same majority rule as the aggregate
  * formulation this replaced). Null when the document has fewer than
  * `minShingles` distinct shingles: below that the majority vote has not
  * concentrated and callers route the document through an exact path —
  * encoding the cutoff here means short docs never enter the sketch
  * pipeline at all.
  *
  * Replaces an explode → shuffle → 65-sum-aggregate majority build; the
  * only shuffled payload in SimHash blocking is (doc_id, chunk keys).
  */
case class SimHashCode(child: Expression, n: Int, minShingles: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    val toks = s.substring(start, end).split(" +").filter(_.nonEmpty)
    if (toks.length < n) return null
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](64)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) {
        val h = XXH64.hashUTF8String(UTF8String.fromString(sh), 42L)
        var j = 0
        while (j < 64) {
          counts(j) += ((h >>> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    val total = seen.size
    if (total < minShingles) return null
    var code = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) * 2 >= total) code |= (1L << j)
      j += 1
    }
    code
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashCode =
    copy(child = newChild)
}

/** Minimum rolling hash over a document's word n-gram shingles in ONE
  * pass (the bottom-1 MinHash sketch): tokenization identical to
  * [[ShingleSet]], per-shingle hash identical to [[RollingHash]], null
  * when the document has fewer than n tokens. Duplicate shingles cannot
  * change a minimum, so no distinct pass is needed — semantics equal
  * `array_min(transform(shingleSet(c, n), rollingHash))`, whose
  * interpreted HOF form re-tokenizes the document per shingle
  * (O(len * shingles); it made the fingerprint query the single most
  * expensive scan in the catalog at 12s/500 docs).
  *
  * CodegenFallback like ShingleSet: one eval per row, tight JIT'd loop.
  */
case class MinShingleHash(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_shingle_hash"

  private def hashRange(toks: Array[String], from: Int): Long = {
    // Hash of toks(from .. from+n-1) joined by single spaces, without
    // materializing the joined string.
    var acc = 0L
    var k = 0
    while (k < n) {
      if (k > 0) acc = (acc * 31 + ' '.toInt) % 2147483647L
      val t = toks(from + k)
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        acc = (acc * 31 + cp) % 2147483647L
        i += Character.charCount(cp)
      }
      k += 1
    }
    acc
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    val toks = s.substring(start, end).split(" +").filter(_.nonEmpty)
    if (toks.length < n) return null
    var best = Long.MaxValue
    var i = 0
    while (i <= toks.length - n) {
      val h = hashRange(toks, i)
      if (h < best) best = h
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): MinShingleHash =
    copy(child = newChild)
}

/** Full sign-random-projection code in ONE evaluator: bit j of the result
  * is the sign of the dot product between the embedding and deterministic
  * hyperplane j (components from the LCG rational formula — see
  * [[graft.similarity.VectorFunctions.hyperplaneComponent]]).
  *
  * Bit-identical to the composed form (`lshCode`: nBits `graft_dot`s
  * against literal hyperplane arrays OR-ed together) — same left-to-right
  * double accumulation per hyperplane — but as a single O(nBits * dim)
  * loop over one precomputed component table. The composed form's
  * expression tree (64 dot kernels x 64-element literals) costs seconds
  * of codegen/JIT per stage before the first row; this evaluates with no
  * per-stage compilation at all (CodegenFallback: one eval per row, the
  * body is a tight JIT'd loop).
  */
case class SrpCode(child: Expression, nBits: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {

  require(nBits >= 1 && nBits <= 64, "code width must be 1..64 bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_code"

  @transient private lazy val elemDouble =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  /** hyperplanes(j*dim + i) = lcg(j*dim + i)/2^31 - 0.5, exactly the
    * literal components the composed form folds against. */
  @transient private lazy val hyperplanes: Array[Double] = {
    val h = new Array[Double](nBits * dim)
    var k = 0
    while (k < h.length) {
      h(k) = ((1103515245L * k + 12345L) % 2147483648L).toDouble /
        2147483648.0 - 0.5
      k += 1
    }
    h
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var code = 0L
    var j = 0
    while (j < nBits) {
      var acc = 0.0
      val base = j * dim
      var i = 0
      while (i < n) {
        val x = if (elemDouble) v.getDouble(i) else v.getFloat(i).toDouble
        acc += hyperplanes(base + i) * x
        i += 1
      }
      if (acc >= 0.0) code |= 1L << j
      j += 1
    }
    code
  }

  override protected def withNewChildInternal(newChild: Expression): SrpCode =
    copy(child = newChild)
}

/** Shared product-quantization distance loop: entry m*k0 + k of the
  * result is the squared L2 distance between subvector m of the input
  * (elements m*subDim .. m*subDim+subDim-1, floats widened to double)
  * and centroid (m, k) of the flattened codebook — an ordered
  * left-to-right fold of (x - c)^2, the exact arithmetic of the
  * oracle's list_reduce fold.
  */
private[functions] object PqKernel {
  def distTable(v: ArrayData, elemDouble: Boolean, cb: Array[Double],
      m: Int, k0: Int, subDim: Int): Array[Double] = {
    // BOUNDED reads: a vector shorter than m*subDim reads as 0-padded
    // instead of past the array — UnsafeArrayData's index assert is
    // compiled out in production, so an unguarded getFloat would return
    // GARBAGE bytes (nondeterministic codes), not throw.
    val n = v.numElements()
    val out = new Array[Double](m * k0)
    var mi = 0
    while (mi < m) {
      val off = mi * subDim
      var k = 0
      while (k < k0) {
        val cOff = (mi * k0 + k) * subDim
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (off + i >= n) 0.0
                  else if (elemDouble) v.getDouble(off + i)
                  else v.getFloat(off + i).toDouble
          val d = x - cb(cOff + i)
          acc += d * d
          i += 1
        }
        out(mi * k0 + k) = acc
        k += 1
      }
      mi += 1
    }
    out
  }
}

/** Product-quantization code of an embedding in ONE evaluator: element m
  * is the argmin-squared-L2 centroid index of subvector m against the
  * literal sub-codebook (ties to the SMALLER index — strict `<` keeps
  * the first minimum, matching the oracle's `ORDER BY d ASC, k` rank-1
  * row). The codebook is M*K*subDim flattened doubles — broadcast-sized
  * by construction, so encoding is a pure per-row expression: at 100 TB
  * the 4-byte-per-subspace codes replace the float vector at ingest and
  * ADC ranking never reads the floats. CodegenFallback: one eval per
  * row, tight JIT'd loops.
  */
case class PqCode(child: Expression, codebook: Seq[Double], m: Int,
    k: Int, subDim: Int) extends UnaryExpression with CodegenFallback {

  require(codebook.size == m * k * subDim, "codebook must be m*k*subDim")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_code"

  @transient private lazy val cb = codebook.toArray
  @transient private lazy val elemDouble =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val d = PqKernel.distTable(input.asInstanceOf[ArrayData], elemDouble,
      cb, m, k, subDim)
    val codes = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      var best = Double.PositiveInfinity
      var arg = 0
      var ki = 0
      while (ki < k) {
        val v = d(mi * k + ki)
        if (v < best) { best = v; arg = ki }
        ki += 1
      }
      codes(mi) = arg
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCode =
    copy(child = newChild)
}

/** Per-query PQ lookup table: the full M*K squared-L2 distance table of
  * [[PqKernel.distTable]] as a flat array<double> — computed once per
  * QUERY row; a candidate's asymmetric (ADC) distance is then M array
  * lookups summed, independent of the vector dimension.
  */
case class PqLut(child: Expression, codebook: Seq[Double], m: Int,
    k: Int, subDim: Int) extends UnaryExpression with CodegenFallback {

  require(codebook.size == m * k * subDim, "codebook must be m*k*subDim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  @transient private lazy val cb = codebook.toArray
  @transient private lazy val elemDouble =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(PqKernel.distTable(
      input.asInstanceOf[ArrayData], elemDouble, cb, m, k, subDim)
      .map(_.asInstanceOf[Any]))

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** 64-bit Morton (Z-order) interleave of up to four 16-bit column ranks:
  * bit `i` of rank `j` lands at output position `i * k + (k - 1 - j)`,
  * so rows sorted by the code cluster on equal-rank PREFIXES of every
  * input column simultaneously — the multi-dimensional locality Delta's
  * `OPTIMIZE ZORDER BY` (and liquid clustering over several keys) relies
  * on for min/max file-stat skipping on NON-leading cluster keys, where
  * a lexicographic sort only tightens the leading one.
  *
  * Inputs are LongType ranks already reduced to 16 bits (see
  * `graft.storage.ZOrder.rank16`); higher bits are masked. Null ranks
  * read as 0, so null keys cluster first (NULLS FIRST). CodegenFallback:
  * evaluated once per row on the WRITE path only.
  */
case class ZOrderCode(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.nonEmpty && children.size <= 4,
    "z-order interleave supports 1-4 rank columns")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zorder"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = children.size
    var z = 0L
    var j = 0
    while (j < k) {
      val v = children(j).eval(input)
      val r = if (v == null) 0L else v.asInstanceOf[Long] & 0xFFFFL
      var i = 0
      while (i < 16) {
        z |= ((r >> i) & 1L) << (i * k + (k - 1 - j))
        i += 1
      }
      j += 1
    }
    // Four coordinates fill all 64 bits, putting the leading column's
    // top bit on the SIGN bit — under signed Long ordering (what
    // repartitionByRange compares) the domain's upper half would sort
    // first. Flipping the sign bit maps unsigned interleave order onto
    // signed order, keeping the code monotone per coordinate.
    if (k == 4) z ^ java.lang.Long.MIN_VALUE else z
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderCode =
    copy(children = newChildren)
}

/** BPE merge-table APPLICATION over a document's word array — the
  * operator a pretraining pipeline runs on 100% of bytes: given the
  * ranked merge list t13_bpe_merges induces (pairs of adjacent code
  * points, highest corpus count first), tokenize each word into code
  * points and apply the merges IN RANK ORDER; returns the total
  * surviving symbol (= token) count for the document.
  *
  * Merged symbols are INERT under later rules: every rule's two sides
  * are single code points, and a merged symbol is two — so the sentinel
  * can never equal a rule side. The per-rule semantics replay the
  * DuckDB oracle's separator-encoded string `replace` EXACTLY,
  * iterated to fixpoint: within one replace pass, a match consumes its
  * trailing boundary separator, so the symbol immediately after a
  * merge cannot START the next match in the same pass (it is emitted
  * raw); passes repeat per rule until none merges. This is NOT plain
  * leftmost greedy — on a self-pair run of odd length >= 5 ("sssss"
  * under 'ss') replace strands the leftover singleton MID-run
  * ([x,s,x]) where greedy leaves it at the END ([x,x,s]), and a later
  * rule ('si') then sees different adjacencies. NativeExpressionsSpec
  * pins the equivalence against a verbatim String.replace-fixpoint
  * replay on adversarial chains ("abab", "aaaa", "sssssi"/['ss','si'],
  * "aaaaab"/['aa','ab']).
  *
  * One eval per row, all work in tight JIT'd loops over int arrays
  * (CodegenFallback like [[ShingleSet]]); the merge table is a bounded
  * literal (the codebook-materialization pattern), so the whole apply
  * is a pure per-row function — no shuffle, no state, survives any
  * corpus scale.
  */
case class BpeTokenCount(child: Expression, merges: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"

  /** Rule sides as parallel code-point arrays, rank order preserved. */
  @transient private lazy val (ruleA, ruleB): (Array[Int], Array[Int]) = {
    val a = new Array[Int](merges.length)
    val b = new Array[Int](merges.length)
    var i = 0
    merges.foreach { m =>
      require(m.codePointCount(0, m.length) == 2,
        s"BPE merge rule must be exactly two code points, got '$m'")
      a(i) = m.codePointAt(0)
      b(i) = m.codePointAt(m.offsetByCodePoints(0, 1))
      i += 1
    }
    (a, b)
  }

  private val Merged = Int.MinValue // < any code point; rules never match it

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val nRules = ruleA.length
    var total = 0L
    var w = 0
    val nWords = words.numElements()
    var buf = new Array[Int](64)
    while (w < nWords) {
      val s = words.getUTF8String(w).toString
      // code points into a reusable buffer
      var len = 0
      var ci = 0
      while (ci < s.length) {
        val cp = s.codePointAt(ci)
        if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
        buf(len) = cp
        len += 1
        ci += Character.charCount(cp)
      }
      var r = 0
      while (r < nRules && len > 1) {
        val a = ruleA(r); val b = ruleB(r)
        // Replay replace-to-fixpoint: a merge consumes the shared
        // boundary separator, so the next symbol may not START a match
        // within the same pass; iterate passes until none merges.
        var changed = true
        while (changed && len > 1) {
          changed = false
          var i = 0
          var o = 0
          var blocked = false
          while (i < len) {
            if (!blocked && i + 1 < len && buf(i) == a && buf(i + 1) == b) {
              buf(o) = Merged; i += 2
              changed = true; blocked = true
            } else {
              buf(o) = buf(i); i += 1
              blocked = false
            }
            o += 1
          }
          len = o
        }
        r += 1
      }
      total += len
      w += 1
    }
    total
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenCount = copy(child = newChild)
}

/** Hashed-n-gram linear classifier INFERENCE — the DCLM/FineWeb-style
  * quality-gate shape: every unigram and consecutive bigram of the
  * word array hashes (RollingHash fold, mod p = 2^31-1) into one of
  * `weights.length` buckets, and the document's score is the integer
  * sum of the bucketed weights. Returns `[score, n_grams]` so the
  * caller can threshold on the exact rational mean without a division.
  *
  * All-integer arithmetic (weights are integer, the hash fold is the
  * shared RollingHash convention) makes the score bit-exact across
  * engines — the DuckDB oracle replays the identical fold and weight
  * formula. The weight vector is a bounded literal (the broadcast-
  * weights shape of a production classifier; here derived from a fixed
  * integer formula so the oracle can regenerate it); inference is a
  * pure per-row function — no shuffle, no state, linear in corpus
  * bytes at any scale.
  *
  * One pass: each word's hash is computed once, and the bigram hash
  * CONTINUES the left word's fold through the joining space — exactly
  * hash(w1 + " " + w2) without re-walking w1. Empty words (regex-split
  * artifacts) are skipped on both sides.
  */
case class HashedNgramScore(child: Expression, weights: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  require(weights.nonEmpty, "weight vector must be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_ngram_score"

  @transient private lazy val w: Array[Long] = weights.toArray

  private val P = 2147483647L

  private def extend(acc0: Long, s: String): Long = {
    var acc = acc0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val nW = words.numElements()
    val b = w.length
    // Non-empty words and their fold hashes, in order.
    val toks = new scala.collection.mutable.ArrayBuffer[String](nW)
    var i = 0
    while (i < nW) {
      val s = words.getUTF8String(i).toString
      if (s.nonEmpty) toks += s
      i += 1
    }
    var sum = 0L
    var n = 0L
    var prevHash = 0L
    var k = 0
    while (k < toks.length) {
      val h = extend(0L, toks(k))
      sum += w((h % b).toInt)
      n += 1
      if (k > 0) {
        // bigram: continue the LEFT word's fold through ' ' + right word
        val hb = extend((prevHash * 31 + ' '.toInt) % P, toks(k))
        sum += w((hb % b).toInt)
        n += 1
      }
      prevHash = h
      k += 1
    }
    new GenericArrayData(Array(sum, n))
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedNgramScore = copy(child = newChild)
}
