package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns.
  *
  * All arithmetic is an ORDERED left fold in index order (`zip_with` +
  * `aggregate`), not an unordered SQL SUM — IEEE-754 float addition is not
  * associative, and the DuckDB oracle reproduces the identical fold, so
  * cosine values match bit-for-bit across engines. Pure codegen'd
  * expressions: no UDFs, no shuffles; at scale the dot product runs inside
  * the join stage's generated code.
  */
object VectorFunctions {

  /** Ordered dot product: fold_i (acc + a[i]*b[i]), floats widened to
    * double BEFORE multiplying (matches the oracle's CAST placement).
    * Generic over vector length, but the fold runs as an INTERPRETED
    * higher-order function — use [[dotF]] in hot paths.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native-kernel dot product ([[graft.functions.DotProduct]]): the same
    * left-to-right widen-then-multiply arithmetic as [[dot]] — bit-
    * identical results — but as a JIT-compiled loop (doGenCode), ~3
    * orders of magnitude faster per pair. Use for pairwise similarity
    * joins. (A flat unrolled sum was tried first: it codegens but blows
    * HotSpot's huge-method limit and runs un-JIT-ed.)
    */
  def dotN(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.DotProduct(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  def normN(a: Column): Column = sqrt(dotN(a, a))

  def cosineN(a: Column, b: Column): Column =
    dotN(a, b) / (normN(a) * normN(b))

  // ---- Random-hyperplane LSH (sign-random-projection) ----

  /** Deterministic pseudo-random hyperplane component, reproducible by any
    * engine with exact integer + double arithmetic:
    *   lcg(k)  = (1103515245*k + 12345) mod 2^31
    *   h[j][i] = lcg(j*dim + i) / 2^31 - 0.5
    * (glibc LCG constants — public domain folklore.) The rationals are
    * exactly representable in double, so sign bits agree across engines.
    */
  def hyperplaneComponent(k: Long): Double =
    ((1103515245L * k + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5

  /** dim-length literal array for hyperplane j. */
  def hyperplane(j: Int, dim: Int): Column =
    array((0 until dim).map(i =>
      lit(hyperplaneComponent(j.toLong * dim + i))): _*)

  /** nBits-bit sign-random-projection bucket code of an embedding:
    * bit j = (dot(h_j, v) >= 0). Deterministic: both engines compute the
    * identical dot (ordered left-assoc loop over identical hyperplane
    * doubles), so the code — even for near-zero dots — is identical.
    * Each per-bit dot is the native kernel against a constant-folded
    * literal hyperplane array.
    */
  def lshCode(v: Column, nBits: Int, dim: Int): Column = {
    val code = (0 until nBits).map { j =>
      when(dotN(hyperplane(j, dim), v) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    // NULL in, NULL out — matching the native SrpCode (null-intolerant
    // per UnaryExpression): without this, a null embedding would fold
    // every when(...) to its otherwise(0) and land in bucket 0 here
    // while the native form drops it, so the two "bit-identical" forms
    // would disagree on exactly the rows with no vector.
    when(v.isNull, lit(null).cast("long")).otherwise(code)
  }

  /** Native single-evaluator form of [[lshCode]] (bit-identical; parity-
    * tested): the composed form's 64-dot-kernel expression tree costs
    * seconds of codegen/JIT per STAGE before the first row — measured as
    * most of s2's wall time at sf0.1 — while [[graft.functions.SrpCode]]
    * is one precomputed-table loop with no per-stage compilation. Use in
    * every LSH hot path.
    */
  def lshCodeN(v: Column, nBits: Int, dim: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.SrpCode(
        org.apache.spark.sql.graftbridge.Bridge.expression(v), nBits, dim))

  /** Hamming distance between two bucket codes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- IVF (inverted-file) coarse quantization ----

  /** Cosine of a vector column against a LITERAL centroid — the centroid
    * array and its norm constant-fold, so cell assignment runs inside the
    * scan's generated code with no join and no shuffle. Fold order is the
    * oracle's (vector index order; IEEE multiply is commutative, so
    * operand order inside each product is immaterial). Codebooks are
    * doubles: float seeds widen exactly, trained (mean) centroids are
    * doubles natively.
    */
  def centroidCosine(cent: Seq[Double], v: Column, vNrm: Column): Column =
    dotN(typedLit(cent), v) / (normN(typedLit(cent)) * vNrm)

  /** IVF cell id: argmax-cosine centroid index, ties to the SMALLER
    * index (via struct max over (cosine, -index) — lexicographic struct
    * ordering makes greatest() pick max cosine then min index, exactly
    * the oracle's `ORDER BY cosine DESC, j` rank-1 row).
    *
    * The codebook is a handful of literal vectors (16 x 64 components
    * here — the standard IVF contract: the quantizer is broadcast-sized
    * by construction), so assignment is a pure per-row expression: at
    * 100 TB vectors can be PARTITIONED BY this cell at ingest and a
    * probe touches only the probed cells' files.
    */
  def ivfCell(centroids: Seq[Seq[Double]], v: Column, vNrm: Column): Column = {
    val scored = centroids.zipWithIndex.map { case (c, j) =>
      struct(centroidCosine(c, v, vNrm).as("c"), lit(-j).as("nj"))
    }
    (-greatest(scored: _*).getField("nj")).cast("int")
  }

  // ---- PQ (product quantization) ----

  /** PQ code array (length m): per-subspace argmin-squared-L2 centroid
    * index against a flattened literal sub-codebook (layout
    * `(mi*k + ki)*subDim + i`); ties to the smaller index. See
    * [[graft.functions.PqCode]].
    */
  def pqCodeN(v: Column, codebook: Seq[Double], m: Int, k: Int,
      subDim: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.PqCode(
        org.apache.spark.sql.graftbridge.Bridge.expression(v),
        codebook, m, k, subDim))

  /** Flat M*K per-query squared-L2 lookup table for ADC ranking. See
    * [[graft.functions.PqLut]].
    */
  def pqLutN(v: Column, codebook: Seq[Double], m: Int, k: Int,
      subDim: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.PqLut(
        org.apache.spark.sql.graftbridge.Bridge.expression(v),
        codebook, m, k, subDim))

  /** EXACT all-pairs cosine-threshold join, triangle-blocked for scale.
    *
    * For dense near-random embeddings at a low threshold there is no
    * candidate structure to exploit (every LSH family trades recall, and
    * exactness is the contract here), so the O(n^2) pair set must be
    * computed — the scale question is HOW. A broadcast nested loop puts
    * n^2 work behind one broadcast of the whole table; this instead grids
    * vectors into B deterministic blocks and shuffles each vector to the
    * B block-PAIRS it participates in: task (i, j) holds only blocks i
    * and j (2n/B vectors — bounded memory), computes its |i|x|j| pairs
    * locally with the native dot kernel, and the B(B+1)/2 tasks spread
    * the quadratic work evenly across the cluster. Each unordered pair is
    * counted exactly once (a pair's group is (min(blk_a, blk_b),
    * max(blk_a, blk_b)), enforced in the join condition), so the result
    * is IDENTICAL to brute force — the DuckDB oracle needs no notion of
    * the blocking. Choose B ~ sqrt(2 * parallelism); B = 1 degenerates to
    * a single in-memory cross join.
    *
    * Input frame must carry (idCol: bigint, embCol: array<float|double>).
    * Output: (vec_a, vec_b, cosine) with vec_a < vec_b, cosine >= threshold.
    */
  def allPairsCosine(v: org.apache.spark.sql.DataFrame, idCol: String,
      embCol: String, threshold: Double,
      blocks: Int = 8): org.apache.spark.sql.DataFrame = {
    require(blocks >= 1, "blocks must be >= 1")
    // widen: with a broadcast-size build side the block join never
    // shuffles its streamed side, so an unsplittable small scan would
    // run EVERY pair's dot product in one task (measured: 1.9 s
    // single-task on d5) — the O(n^2/blocks) compute is exactly the
    // bytes-say-one-task case Parallelism.widen repairs; no-op at scale.
    val base = graft.core.Parallelism.widen(v)
      .select(col(idCol).as("vid"), col(embCol).as("emb"))
      .withColumn("nrm", normN(col("emb")))
      .withColumn("blk", pmod(hash(col("vid")), lit(blocks)))
    // Route each vector to every block-pair group it can meet a partner
    // in: (min(blk, j), max(blk, j)) for all j — `blocks` rows per vector.
    val routed = base.select(col("vid"), col("emb"), col("nrm"), col("blk"),
      explode(array((0 until blocks).map(j =>
        struct(least(col("blk"), lit(j)).as("gi"),
          greatest(col("blk"), lit(j)).as("gj"))): _*)).as("g"))
      .select(col("vid"), col("emb"), col("nrm"), col("blk"),
        col("g.gi"), col("g.gj"))
    val a = routed.alias("a")
    val b = routed.alias("b")
    a.join(b,
        col("a.gi") === col("b.gi") && col("a.gj") === col("b.gj")
          && col("a.vid") < col("b.vid")
          // a pair belongs to exactly ONE group: its own blocks'
          && col("a.gi") === least(col("a.blk"), col("b.blk"))
          && col("a.gj") === greatest(col("a.blk"), col("b.blk")))
      .select(col("a.vid").as("vec_a"), col("b.vid").as("vec_b"),
        (dotN(col("a.emb"), col("b.emb")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
