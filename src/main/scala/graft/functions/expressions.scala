package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
  * INPUT arrays propagate null per BinaryExpression's default.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  @transient private lazy val leftDouble = elemIsDouble(left)
  @transient private lazy val rightDouble = elemIsDouble(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += $ga * $gb; }
         |${ev.value} = $acc;
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
