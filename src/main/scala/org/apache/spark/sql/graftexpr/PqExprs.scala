package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the PQ/ANN hot path (optimization
  * guide §4 / SURVEY.md §4 "custom Expression as perf upgrade" — the
  * DotProductExpr precedent applied to the remaining interpreted-lambda
  * trees).
  *
  * The builtin-HOF forms these replace (`aggregate(zip_with(...))` folds
  * inside `array_min(array(struct(...)))` argmin trees) are
  * CodegenFallback expressions: every per-row evaluation walks an
  * interpreted lambda per element and allocates intermediate arrays —
  * measured as the dominant single-task CPU of the ANN bench family
  * (q136/q137/q141/q142/q145/q148/q149). Each expression here states its
  * HOF twin and preserves its FLOATING-POINT OPERATION ORDER EXACTLY
  * (left-to-right accumulation, strict-less argmin with ties to the
  * lower code, Spark's NaN-greatest ordering), so trained models, code
  * assignments, ADC ranks and error sums are bit-identical and every
  * certificate gate row is unchanged by construction (PqSpec pins
  * equality on fixtures).
  *
  * Codebooks ride along as literal metadata (an `IndexedSeq` so case-
  * class equality stays structural), shipped to executors once per plan
  * via `ctx.addReferenceObj`, exactly like the literal arrays the HOF
  * form embedded — bounded model objects, never a join side.
  */
object PqExprs {
  /** Shared argmin update rule replicating Spark's struct `array_min`
    * ordering over (distance, code): strictly smaller wins; NaN sorts
    * GREATER than every number (so a NaN distance never displaces a
    * finite one, and a finite one displaces NaN); ties keep the lower
    * (earlier) code. */
  @inline private[graftexpr] def better(d: Double, best: Double): Boolean =
    d < best || (java.lang.Double.isNaN(best) && !java.lang.Double.isNaN(d))

  /** Java source for [[better]], inlined into generated code. */
  private[graftexpr] def betterJava(d: String, best: String): String =
    s"($d < $best || (java.lang.Double.isNaN($best) && !java.lang.Double.isNaN($d)))"

  /** Dimension guard shared by the codebook expressions: a vector shorter
    * than nSub·subDim would read out-of-bounds UnsafeArrayData memory and
    * yield silent garbage (the HOF twins degraded to nulls instead) —
    * fail loudly with the sizes (ADVICE r15). */
  @inline private[graftexpr] def requireDims(actual: Int, expected: Int): Unit =
    if (actual != expected)
      throw new IllegalArgumentException(
        s"PQ expression input vector has $actual elements, model expects $expected")

  /** Java source for [[requireDims]], inlined into generated code. */
  private[graftexpr] def requireDimsJava(v: String, expected: Int): String =
    s"""if ($v.numElements() != $expected)
          throw new IllegalArgumentException(
            "PQ expression input vector has " + $v.numElements() +
            " elements, model expects $expected");"""
}

/** codes[m] = argmin_j ‖v[m·subDim ..) − codebook(m)(j)‖² — the whole
  * per-row PQ encode as ONE generated loop. HOF twin: per subspace m,
  * `array_min(array_j(struct(d2Col(slice(v)), j))).getField("code")`
  * where d2Col is the left-to-right squared-difference fold; this emits
  * identical code assignments (same fold order, same tie rule). */
case class PqCodesExpr(child: Expression,
    codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes {

  private def nSub = codebooks.length
  private def nCodes = codebooks.head.length
  private def subDim = codebooks.head.head.length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  /** codebooks flattened to [m][j·subDim+i] for tight generated loops. */
  @transient private lazy val flat: Array[Array[Double]] =
    codebooks.map(_.flatten.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    PqExprs.requireDims(v.numElements(), nSub * subDim)
    val out = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      val book = flat(m)
      val base = m * subDim
      var bestD = Double.NaN
      var bestJ = 0
      var j = 0
      while (j < nCodes) {
        var s = 0.0
        var i = 0
        while (i < subDim) {
          val d = v.getDouble(base + i) - book(j * subDim + i)
          s += d * d
          i += 1
        }
        if (j == 0 || PqExprs.better(s, bestD)) { bestD = s; bestJ = j }
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val books = ctx.addReferenceObj("pqBooks", flat, "double[][]")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val d = ctx.freshName("d"); val bestD = ctx.freshName("bestD")
      val bestJ = ctx.freshName("bestJ"); val book = ctx.freshName("book")
      s"""
        ${PqExprs.requireDimsJava(v, nSub * subDim)}
        int[] $out = new int[$nSub];
        for (int $m = 0; $m < $nSub; $m++) {
          double[] $book = $books[$m];
          double $bestD = Double.NaN;
          int $bestJ = 0;
          for (int $j = 0; $j < $nCodes; $j++) {
            double $s = 0.0;
            for (int $i = 0; $i < $subDim; $i++) {
              double $d = $v.getDouble($m * $subDim + $i) - $book[$j * $subDim + $i];
              $s += $d * $d;
            }
            if ($j == 0 || ${PqExprs.betterJava(s, bestD)}) { $bestD = $s; $bestJ = $j; }
          }
          $out[$m] = $bestJ;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC distance Σ_m lut[m][codes[m]] as one generated loop. HOF twin:
  * `aggregate(zip_with(codes, lut, (cd, row) => element_at(row, cd+1)),
  * 0d, +)` — identical left-to-right summation over min(|codes|, |lut|)
  * subspaces. */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(ArrayType(DoubleType)))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.numElements())
    var s = 0.0
    var m = 0
    while (m < n) {
      s += lut.getArray(m).getDouble(codes.getInt(m))
      m += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($codes.numElements(), $lut.numElements());
        double $s = 0.0;
        for (int $m = 0; $m < $n; $m++) {
          $s += $lut.getArray($m).getDouble($codes.getInt($m));
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Per-vector PQ quantization error Σ_m min_j ‖v[m] − c_mj‖² as one
  * generated loop. HOF twin: the per-subspace
  * `array_min(array_j(d2Col(slice(v), c_mj)))` values summed left-to-
  * right (= the reconstruction error, since encode assigns each
  * subvector to its argmin code). Same fold order, same NaN rule. */
case class PqErrorExpr(child: Expression,
    codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes {

  private def nSub = codebooks.length
  private def nCodes = codebooks.head.length
  private def subDim = codebooks.head.head.length

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  @transient private lazy val flat: Array[Array[Double]] =
    codebooks.map(_.flatten.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    PqExprs.requireDims(v.numElements(), nSub * subDim)
    var total = 0.0
    var m = 0
    while (m < nSub) {
      val book = flat(m)
      val base = m * subDim
      var bestD = Double.NaN
      var j = 0
      while (j < nCodes) {
        var s = 0.0
        var i = 0
        while (i < subDim) {
          val d = v.getDouble(base + i) - book(j * subDim + i)
          s += d * d
          i += 1
        }
        if (j == 0 || PqExprs.better(s, bestD)) bestD = s
        j += 1
      }
      total += bestD
      m += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val books = ctx.addReferenceObj("pqBooks", flat, "double[][]")
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val d = ctx.freshName("d"); val bestD = ctx.freshName("bestD")
      val total = ctx.freshName("total"); val book = ctx.freshName("book")
      s"""
        ${PqExprs.requireDimsJava(v, nSub * subDim)}
        double $total = 0.0;
        for (int $m = 0; $m < $nSub; $m++) {
          double[] $book = $books[$m];
          double $bestD = Double.NaN;
          for (int $j = 0; $j < $nCodes; $j++) {
            double $s = 0.0;
            for (int $i = 0; $i < $subDim; $i++) {
              double $d = $v.getDouble($m * $subDim + $i) - $book[$j * $subDim + $i];
              $s += $d * $d;
            }
            if ($j == 0 || ${PqExprs.betterJava(s, bestD)}) $bestD = $s;
          }
          $total += $bestD;
        }
        ${ev.value} = $total;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unit-normalize: out[i] = v[i] / sqrt(Σ v[k]²) as one generated loop.
  * HOF twin: `transform(v, x => x / sqrt(DotProductExpr(v, v)))` — the
  * norm is the same left-to-right self-dot (computed ONCE here instead
  * of per element), each element divides by the identical double, and a
  * null element stays null, so outputs are bit-identical. */
case class NormalizeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(DoubleType, n)
    case _ => ArrayType(DoubleType)
  }
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  /** Input arrays proven null-free by their schema take the primitive
    * path (an UnsafeArrayData over a double[] — no per-element boxing);
    * the nullable path preserves the HOF twin's null-stays-null rule. */
  private def inputHasNulls: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); s += x * x; i += 1 }
    val nrm = math.sqrt(s)
    if (!inputHasNulls) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = v.getDouble(i) / nrm; i += 1 }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (v.isNullAt(i)) null else (v.getDouble(i) / nrm)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out"); val x = ctx.freshName("x")
      val fill =
        if (!inputHasNulls)
          s"""
          double[] $out = new double[$n];
          for (int $i = 0; $i < $n; $i++) {
            $out[$i] = $v.getDouble($i) / $nrm;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions
            .UnsafeArrayData.fromPrimitiveArray($out);"""
        else
          s"""
          Object[] $out = new Object[$n];
          for (int $i = 0; $i < $n; $i++) {
            $out[$i] = $v.isNullAt($i) ? null
              : (Object) java.lang.Double.valueOf($v.getDouble($i) / $nrm);
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);"""
      s"""
        int $n = $v.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = $v.getDouble($i);
          $s += $x * $x;
        }
        double $nrm = java.lang.Math.sqrt($s);
        $fill
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-probe ADC lookup table lut[m][j] = ‖q[m·subDim ..) − c_mj‖² as one
  * generated loop over the literal codebooks. HOF twin: the
  * array(array(d2Col(slice(q), c_mj))) literal tree — 256 fold subtrees
  * whose serialized size dominated task binaries (measured ~50 ms of
  * task DESERIALIZATION per task). Same left-to-right fold per (m, j),
  * so every table entry is bit-identical. */
case class PqLutExpr(child: Expression,
    codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes {

  private def nSub = codebooks.length
  private def nCodes = codebooks.head.length
  private def subDim = codebooks.head.head.length

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  @transient private lazy val flat: Array[Array[Double]] =
    codebooks.map(_.flatten.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    PqExprs.requireDims(v.numElements(), nSub * subDim)
    val rows = new Array[Any](nSub)
    var m = 0
    while (m < nSub) {
      val book = flat(m)
      val base = m * subDim
      val row = new Array[Double](nCodes)
      var j = 0
      while (j < nCodes) {
        var s = 0.0
        var i = 0
        while (i < subDim) {
          val d = v.getDouble(base + i) - book(j * subDim + i)
          s += d * d
          i += 1
        }
        row(j) = s
        j += 1
      }
      rows(m) = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(row)
      m += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val books = ctx.addReferenceObj("pqBooks", flat, "double[][]")
      val rows = ctx.freshName("rows"); val row = ctx.freshName("row")
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val d = ctx.freshName("d"); val book = ctx.freshName("book")
      s"""
        ${PqExprs.requireDimsJava(v, nSub * subDim)}
        Object[] $rows = new Object[$nSub];
        for (int $m = 0; $m < $nSub; $m++) {
          double[] $book = $books[$m];
          double[] $row = new double[$nCodes];
          for (int $j = 0; $j < $nCodes; $j++) {
            double $s = 0.0;
            for (int $i = 0; $i < $subDim; $i++) {
              double $d = $v.getDouble($m * $subDim + $i) - $book[$j * $subDim + $i];
              $s += $d * $d;
            }
            $row[$j] = $s;
          }
          $rows[$m] = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray($row);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
