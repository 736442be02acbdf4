package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Vector math over `array<float>` embedding columns as native codegen'd
  * Catalyst expressions.
  *
  * The composed-builtin forms (`aggregate(zip_with(...))`) are higher-order
  * functions whose lambdas Spark evaluates INTERPRETED per element — the one
  * hot loop in every ANN/dedup query. These expressions generate a static
  * call into a tight JIT'd loop instead, while folding in EXACTLY the same
  * order (left-to-right, each element widened float->double before the
  * multiply), so results are bit-identical to both the HOF forms and the
  * DuckDB `list_sum(list_transform(...))` oracles (see
  * graft-oracle determinism notes; reference analogue: the engine-native
  * vector kernels DataFusion gets from Arrow compute).
  */
object VectorFunctions {

  // ---- static eval helpers (shared by interpreted eval and codegen) --------

  def dotOf(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def l2Of(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Squared L2 distance to each centroid, one pass over the vector per
    * centroid, fold order identical to `aggregate(zip_with(...))`. */
  /** Per-row dots against k fixed weight vectors (PCA projection, linear
    * probes): out(c) = Σ_i v(i)·w_c(i), left-to-right fold. */
  def weightDotsOf(v: ArrayData, ws: Array[Array[Double]]): ArrayData = {
    val out = new Array[Any](ws.length)
    var c = 0
    while (c < ws.length) {
      val w = ws(c)
      val n = math.min(v.numElements(), w.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += v.getFloat(i).toDouble * w(i)
        i += 1
      }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  def sqDistsOf(v: ArrayData, cents: Array[Array[Double]]): ArrayData = {
    val out = new Array[Any](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = v.getFloat(i).toDouble - cent(i)
        s += d * d
        i += 1
      }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Sign-random-projection bucket: bit b set iff Σ v_i·w[b][i] >= 0, fold
    * order identical to the HOF form. */
  def signBucketOf(v: ArrayData, w: Array[Array[Double]]): Long = {
    var bucket = 0L
    var b = 0
    while (b < w.length) {
      val wb = w(b)
      val n = math.min(v.numElements(), wb.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getFloat(i).toDouble * wb(i); i += 1 }
      if (s >= 0) bucket += (1L << b)
      b += 1
    }
    bucket
  }

  /** Pack bit ids (0-based) into an nWords-long bitset. */
  def bitsetOf(ids: ArrayData, nWords: Int): ArrayData = {
    val words = new Array[Long](nWords)
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      val b = ids.getLong(i)
      words((b >>> 6).toInt) |= (1L << (b & 63L))
      i += 1
    }
    new GenericArrayData(words)
  }

  /** popcount(a AND b) — the set-intersection kernel for bitset Jaccard. */
  def andPopcountOf(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i)); i += 1 }
    s
  }

  // ---- expressions ---------------------------------------------------------

  /** Σ a_i·b_i with float->double widening (cosine numerator). */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      dotOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.VectorFunctions.dotOf($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(l, r)
  }

  /** sqrt(Σ x_i²) — L2 norm. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = l2Of(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.VectorFunctions.l2Of($a)")
    override protected def withNewChildInternal(c: Expression): L2Norm = copy(c)
  }

  /** array of squared distances to k fixed centroids (IVF assignment input);
    * the centroid matrix rides into generated code as a reference object. */
  case class CentroidSqDists(child: Expression, cents: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(a: Any): Any = sqDistsOf(a.asInstanceOf[ArrayData], cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cents", cents, "double[][]")
      defineCodeGen(ctx, ev,
        a => s"graft.functions.VectorFunctions.sqDistsOf($a, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): CentroidSqDists =
      copy(child = c)
  }

  /** array of dots against k fixed weight vectors (PCA projection). */
  case class WeightDots(child: Expression, ws: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(a: Any): Any = weightDotsOf(a.asInstanceOf[ArrayData], ws)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ws", ws, "double[][]")
      defineCodeGen(ctx, ev,
        a => s"graft.functions.VectorFunctions.weightDotsOf($a, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): WeightDots =
      copy(child = c)
  }

  /** Bit ids -> fixed-width bitset (array<long>). */
  case class BitsetFromIds(child: Expression, nWords: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
      containsNull = false)
    override def nullSafeEval(a: Any): Any =
      bitsetOf(a.asInstanceOf[ArrayData], nWords)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        a => s"graft.functions.VectorFunctions.bitsetOf($a, $nWords)")
    override protected def withNewChildInternal(c: Expression): BitsetFromIds =
      copy(child = c)
  }

  /** popcount(a AND b). */
  case class AndPopcount(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.valueOf(andPopcountOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.VectorFunctions.andPopcountOf($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): AndPopcount =
      copy(l, r)
  }

  /** LSH bucket id from fixed ±1 hyperplane weights. */
  case class SignLshBucket(child: Expression, weights: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullSafeEval(a: Any): Any =
      java.lang.Long.valueOf(signBucketOf(a.asInstanceOf[ArrayData], weights))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("lshw", weights, "double[][]")
      defineCodeGen(ctx, ev,
        a => s"graft.functions.VectorFunctions.signBucketOf($a, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): SignLshBucket =
      copy(child = c)
  }

  private def toExpr(c: Column) = GraftColumnBridge.expression(c)

  /** Float-array dot product; identical bits to the HOF fold. */
  def dotF(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(toExpr(a), toExpr(b)))
  def l2normF(c: Column): Column =
    GraftColumnBridge.column(L2Norm(toExpr(c)))
  def centroidSqDists(v: Column, cents: Seq[Array[Double]]): Column =
    GraftColumnBridge.column(CentroidSqDists(toExpr(v), cents.toArray))
  def weightDots(v: Column, ws: Seq[Array[Double]]): Column =
    GraftColumnBridge.column(WeightDots(toExpr(v), ws.toArray))
  def signLshBucket(v: Column, weights: Array[Array[Double]]): Column =
    GraftColumnBridge.column(SignLshBucket(toExpr(v), weights))
  def bitsetFromIds(ids: Column, nWords: Int): Column =
    GraftColumnBridge.column(BitsetFromIds(toExpr(ids), nWords))
  def andPopcount(a: Column, b: Column): Column =
    GraftColumnBridge.column(AndPopcount(toExpr(a), toExpr(b)))
}
