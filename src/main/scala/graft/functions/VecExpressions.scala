package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector arithmetic over embedding columns.
  *
  * `zip_with`/`aggregate` higher-order functions are codegen-fallback and
  * box every element — at millions of candidate pairs × 64 dims that
  * interpretation overhead dominates similarity search. These expressions
  * run the same left-to-right double-precision accumulation (bit-identical
  * results, including against a DuckDB oracle widening FLOAT[]→DOUBLE[])
  * in a primitive loop, and `doGenCode` keeps them inside whole-stage
  * codegen via static helper calls.
  */
object VecFns {

  def dot(a: ArrayData, b: ArrayData, isFloat: Boolean): Double =
    dot2(a, b, isFloat, isFloat)

  /** Mixed-element-type dot: each side reads as its own declared type
    * (float widens to double exactly — same arithmetic as a cast-then-
    * multiply). Lets a float embedding column probe a double literal
    * hyperplane/centroid without a per-row `transform` cast. */
  def dot2(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def norm(a: ArrayData, isFloat: Boolean): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  private[functions] def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }

  /** Element-wise a − b in double precision (residual vectors for
    * by-residual PQ). Truncates to the shorter input, like [[dot2]]. */
  def sub(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean)
      : ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      out(i) = x - y
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** SQ8 quantize∘reconstruct: code = clamp(⌊(x − min)/Δ⌋, 0, 255),
    * value = min + (code + 0.5)·Δ; a constant dimension (Δ ≤ 0)
    * reconstructs to its min. Truncated vectors reconstruct their
    * present coordinates. */
  def sq8Recon(a: ArrayData, isFloat: Boolean, mins: Array[Double],
               deltas: Array[Double]): ArrayData = {
    val n = math.min(a.numElements(), mins.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val d = deltas(i)
      out(i) =
        if (d <= 0.0) mins(i)
        else {
          var c = math.floor((x - mins(i)) / d)
          if (c < 0.0) c = 0.0
          if (c > 255.0) c = 255.0
          mins(i) + (c + 0.5) * d
        }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** SQ8 encode: the clamped-floor level of every coordinate packed
    * ONE BYTE each (the stored index artifact — dim bytes per vector,
    * 4× under float32). Same level arithmetic as [[sq8Recon]]. */
  def sq8Codes(a: ArrayData, isFloat: Boolean, mins: Array[Double],
               deltas: Array[Double]): Array[Byte] = {
    val n = math.min(a.numElements(), mins.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val d = deltas(i)
      val c =
        if (d <= 0.0) 0.0
        else {
          var c0 = math.floor((x - mins(i)) / d)
          if (c0 < 0.0) c0 = 0.0
          if (c0 > 255.0) c0 = 255.0
          c0
        }
      out(i) = c.toInt.toByte
      i += 1
    }
    out
  }

  /** SQ8 decode: byte codes back to the reconstructed vector —
    * bit-identical to [[sq8Recon]] of the original (both compute
    * min + (code + 0.5)·Δ from the same integer level). */
  def sq8Decode(codes: Array[Byte], mins: Array[Double],
                deltas: Array[Double]): ArrayData = {
    val n = math.min(codes.length, mins.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val d = deltas(i)
      out(i) =
        if (d <= 0.0) mins(i)
        else mins(i) + ((codes(i) & 0xff) + 0.5) * d
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** PQ encoding of one vector against a driver-bounded per-subspace
    * codebook: for each of the `m` subspaces, the codebook entry
    * minimizing ‖x_sub − c‖² (via d2 = ‖c‖² − 2·x_sub·c, ties toward
    * the smaller cid — the exact semantics of the (id, sub)-keyed
    * `min(struct(d2, cid, cn2))` aggregate this replaces). Returns an
    * array of m (code, codeN2) structs. The aggregate formulation
    * exploded the corpus ×m, joined the broadcast codebook ×ks and
    * re-aggregated — ×(m·ks) rows through the plan per vector; this is
    * ONE codegen'd call per vector, so index builds become scan →
    * project → bucketed write. */
  def pqCodes(v: ArrayData, vFloat: Boolean, m: Int, sub: Int,
              cids: Array[Array[Int]], cvs: Array[Array[Array[Double]]],
              cn2s: Array[Array[Double]])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new Array[Any](m)
    val vLen = v.numElements()
    var s0 = 0
    while (s0 < m) {
      var bestD2 = 0.0
      var bestCid = 0
      var bestCn2 = 0.0
      var first = true
      val scids = cids(s0); val scvs = cvs(s0); val scn2 = cn2s(s0)
      var j = 0
      while (j < scids.length) {
        val cv = scvs(j)
        var dot = 0.0
        var i = 0
        while (i < sub && i < cv.length && s0 * sub + i < vLen) {
          val x = if (vFloat) v.getFloat(s0 * sub + i).toDouble
                  else v.getDouble(s0 * sub + i)
          dot += x * cv(i)
          i += 1
        }
        val d2 = scn2(j) - 2.0 * dot
        val c = if (first) -1 else cmpDouble(d2, bestD2)
        if (c < 0 || (c == 0 && scids(j) < bestCid)) {
          bestD2 = d2; bestCid = scids(j); bestCn2 = scn2(j)
        }
        first = false
        j += 1
      }
      out(s0) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](bestCid, bestCn2))
      s0 += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Spark's SQL double total order (SQLOrderingUtil.compareDoubles):
    * NaN equals NaN and sorts ABOVE every other value; ±0.0 compare
    * equal (primitive <,> first — unlike java.lang.Double.compare).
    * [[bestCell]] must tie-break exactly like a `greatest(struct(csim,
    * -cid, cid))` over the same values, which uses this ordering. */
  private def cmpDouble(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1
    else if (x.isNaN) { if (y.isNaN) 0 else 1 }
    else if (y.isNaN) -1 else 0

  /** Argmax-over-centroids cell assignment: the nearest (by cosine) of
    * a driver-bounded centroid matrix, ties toward the smaller cid —
    * returns struct(cell, csim). Arithmetic is bit-identical to
    * `vec_dot(v, cv)/(vec_norm(v)·cn)` per centroid (same left-to-right
    * accumulation, float widened exactly): the per-centroid-literal
    * `greatest(struct(…))` projection this replaces generated O(nlist)
    * inline expression code and blew the JVM's 64 KB method limit past
    * ~100 centroids, silently dropping the whole stage to interpreted
    * evaluation — this is ONE static call per row at any nlist. */
  def bestCell(v: ArrayData, vFloat: Boolean, cids: Array[Long],
               cvs: Array[Array[Double]], cns: Array[Double])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = norm(v, vFloat)
    var bestSim = Double.NegativeInfinity
    var bestCid = Long.MaxValue
    var first = true
    var j = 0
    while (j < cids.length) {
      val cv = cvs(j)
      val len = math.min(v.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < len) {
        s += (if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)) * cv(i)
        i += 1
      }
      val csim = s / (n * cns(j))
      val c = if (first) 1 else cmpDouble(csim, bestSim)
      if (c > 0 || (c == 0 && cids(j) < bestCid)) {
        bestSim = csim; bestCid = cids(j)
      }
      first = false
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCid, bestSim))
  }
}

/** `vec_dot(a, b)` — Σ a_i·b_i in double precision. */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val lFloat = VecFns.isFloatArray(left.dataType)
  private lazy val rFloat = VecFns.isFloatArray(right.dataType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecFns.dot2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lFloat, rFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecFns.dot2($a, $b, $lFloat, $rFloat);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** `vec_norm(a)` — √(Σ a_i²) in double precision. */
case class VecNormExpr(child: Expression) extends UnaryExpression {
  private lazy val isFloat = VecFns.isFloatArray(child.dataType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any): Any =
    VecFns.norm(a.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecFns.norm($a, $isFloat);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vec_norm"
}

/** `vec_best_cell(v)` — nearest centroid of a driver-bounded matrix by
  * cosine, ties toward the smaller cid; returns struct(cell: long,
  * csim: double). The matrix rides in the expression (plan references,
  * shared per task — NOT per row), so whole-stage codegen emits one
  * static call regardless of nlist, where the literal-`greatest` form
  * it replaces overflowed the 64 KB method limit at production nlist
  * and fell back to interpreted evaluation. */
case class VecBestCellExpr(child: Expression, cids: Array[Long],
                           cvs: Array[Array[Double]], cns: Array[Double])
    extends UnaryExpression {
  private lazy val isFloat = VecFns.isFloatArray(child.dataType)
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("csim", DoubleType,
        nullable = false)))
  override protected def nullSafeEval(a: Any): Any =
    VecFns.bestCell(a.asInstanceOf[ArrayData], isFloat, cids, cvs, cns)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val cvsRef = ctx.addReferenceObj("cvs", cvs, "double[][]")
    val cnsRef = ctx.addReferenceObj("cns", cns, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecFns.bestCell($a, $isFloat, " +
        s"$cidsRef, $cvsRef, $cnsRef);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vec_best_cell"
  // the Array fields make the synthesized case-class equals/hashCode
  // reference-based, which hides logically identical expressions from
  // Catalyst canonicalization / semanticEquals / subexpression
  // elimination (missed CSE, never wrong results) — compare contents
  override def equals(o: Any): Boolean = o match {
    case that: VecBestCellExpr =>
      child == that.child &&
        java.util.Arrays.equals(cids, that.cids) &&
        java.util.Arrays.deepEquals(
          cvs.asInstanceOf[Array[AnyRef]], that.cvs.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(cns, that.cns)
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(cids)),
      Integer.valueOf(java.util.Arrays.deepHashCode(cvs.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.hashCode(cns)))
}

/** `vec_pq_codes(v)` — per-subspace PQ argmin codes against a
  * driver-bounded codebook riding in plan references; returns
  * array<struct<code: int, codeN2: double>> of length m. One codegen'd
  * static call per vector — the encode stage of an index build with no
  * ×(m·ks) row blow-up. */
case class VecPqCodesExpr(child: Expression, m: Int, sub: Int,
                          cids: Array[Array[Int]],
                          cvs: Array[Array[Array[Double]]],
                          cn2s: Array[Array[Double]])
    extends UnaryExpression {
  private lazy val isFloat = VecFns.isFloatArray(child.dataType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("code",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("codeN2", DoubleType,
        nullable = false))), containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    VecFns.pqCodes(a.asInstanceOf[ArrayData], isFloat, m, sub, cids, cvs, cn2s)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "int[][]")
    val cvsRef = ctx.addReferenceObj("cvs", cvs, "double[][][]")
    val cn2sRef = ctx.addReferenceObj("cn2s", cn2s, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecFns.pqCodes($a, $isFloat, $m, $sub, " +
        s"$cidsRef, $cvsRef, $cn2sRef);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vec_pq_codes"
  // structural equality over the codebook matrices — see VecBestCellExpr
  override def equals(o: Any): Boolean = o match {
    case that: VecPqCodesExpr =>
      child == that.child && m == that.m && sub == that.sub &&
        java.util.Arrays.deepEquals(
          cids.asInstanceOf[Array[AnyRef]], that.cids.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.deepEquals(
          cvs.asInstanceOf[Array[AnyRef]], that.cvs.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.deepEquals(
          cn2s.asInstanceOf[Array[AnyRef]], that.cn2s.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child, Integer.valueOf(m), Integer.valueOf(sub),
      Integer.valueOf(java.util.Arrays.deepHashCode(cids.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.deepHashCode(cvs.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.deepHashCode(cn2s.asInstanceOf[Array[AnyRef]])))
}

/** `vec_sq8_recon(v)` — scalar-quantize each coordinate to its 8-bit
  * level over driver-bounded per-dimension [min, max] ranges and
  * return the RECONSTRUCTED vector (min + (code + 0.5)·Δ) as
  * array<double> — the encode∘decode of FAISS's
  * IndexScalarQuantizer(QT_8bit) fused into one codegen'd call (the
  * stored artifact would be the byte codes; the search math only ever
  * needs the reconstruction). A constant dimension (Δ ≤ 0)
  * reconstructs to its min. */
case class VecSq8ReconExpr(child: Expression, mins: Array[Double],
                           deltas: Array[Double])
    extends UnaryExpression {
  private lazy val isFloat = VecFns.isFloatArray(child.dataType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    VecFns.sq8Recon(a.asInstanceOf[ArrayData], isFloat, mins, deltas)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val deltasRef = ctx.addReferenceObj("deltas", deltas, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecFns.sq8Recon($a, $isFloat, " +
        s"$minsRef, $deltasRef);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vec_sq8_recon"
  // structural equality over the range arrays — see VecBestCellExpr
  override def equals(o: Any): Boolean = o match {
    case that: VecSq8ReconExpr =>
      child == that.child &&
        java.util.Arrays.equals(mins, that.mins) &&
        java.util.Arrays.equals(deltas, that.deltas)
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(mins)),
      Integer.valueOf(java.util.Arrays.hashCode(deltas)))
}

/** `vec_sq8_codes(v)` — the SQ8 byte codes as BINARY (dim bytes per
  * vector — the stored index artifact, 4× under float32); the ranges
  * ride in plan references. */
case class VecSq8CodesExpr(child: Expression, mins: Array[Double],
                           deltas: Array[Double])
    extends UnaryExpression {
  private lazy val isFloat = VecFns.isFloatArray(child.dataType)
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override protected def nullSafeEval(a: Any): Any =
    VecFns.sq8Codes(a.asInstanceOf[ArrayData], isFloat, mins, deltas)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val deltasRef = ctx.addReferenceObj("deltas", deltas, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecFns.sq8Codes($a, $isFloat, " +
        s"$minsRef, $deltasRef);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vec_sq8_codes"
  override def equals(o: Any): Boolean = o match {
    case that: VecSq8CodesExpr =>
      child == that.child &&
        java.util.Arrays.equals(mins, that.mins) &&
        java.util.Arrays.equals(deltas, that.deltas)
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(mins)),
      Integer.valueOf(java.util.Arrays.hashCode(deltas)))
}

/** `vec_sq8_decode(codes)` — byte codes back to the reconstructed
  * array<double>; bit-identical to `vec_sq8_recon` of the original
  * vector under the same ranges. */
case class VecSq8DecodeExpr(child: Expression, mins: Array[Double],
                            deltas: Array[Double])
    extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"expected binary codes, got ${child.dataType}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    VecFns.sq8Decode(a.asInstanceOf[Array[Byte]], mins, deltas)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val deltasRef = ctx.addReferenceObj("deltas", deltas, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecFns.sq8Decode($a, " +
        s"$minsRef, $deltasRef);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vec_sq8_decode"
  override def equals(o: Any): Boolean = o match {
    case that: VecSq8DecodeExpr =>
      child == that.child &&
        java.util.Arrays.equals(mins, that.mins) &&
        java.util.Arrays.equals(deltas, that.deltas)
    case _ => false
  }
  override def hashCode: Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.hashCode(mins)),
      Integer.valueOf(java.util.Arrays.hashCode(deltas)))
}

/** `vec_sub(a, b)` — element-wise a − b as array<double>. */
case class VecSubExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val lFloat = VecFns.isFloatArray(left.dataType)
  private lazy val rFloat = VecFns.isFloatArray(right.dataType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecFns.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lFloat, rFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecFns.sub($a, $b, $lFloat, $rFloat);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_sub"
}

object VecExpressions {
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vec_norm(a: Column): Column =
    ColumnBridge.column(VecNormExpr(ColumnBridge.expression(a)))
  def vec_sub(a: Column, b: Column): Column =
    ColumnBridge.column(VecSubExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vec_pq_codes(v: Column, m: Int, sub: Int, cids: Array[Array[Int]],
                   cvs: Array[Array[Array[Double]]],
                   cn2s: Array[Array[Double]]): Column =
    ColumnBridge.column(VecPqCodesExpr(ColumnBridge.expression(v),
      m, sub, cids, cvs, cn2s))
  def vec_best_cell(v: Column, cids: Array[Long], cvs: Array[Array[Double]],
                    cns: Array[Double]): Column =
    ColumnBridge.column(VecBestCellExpr(ColumnBridge.expression(v),
      cids, cvs, cns))
  def vec_sq8_recon(v: Column, mins: Array[Double],
                    deltas: Array[Double]): Column =
    ColumnBridge.column(VecSq8ReconExpr(ColumnBridge.expression(v),
      mins, deltas))
  def vec_sq8_codes(v: Column, mins: Array[Double],
                    deltas: Array[Double]): Column =
    ColumnBridge.column(VecSq8CodesExpr(ColumnBridge.expression(v),
      mins, deltas))
  def vec_sq8_decode(codes: Column, mins: Array[Double],
                     deltas: Array[Double]): Column =
    ColumnBridge.column(VecSq8DecodeExpr(ColumnBridge.expression(codes),
      mins, deltas))
}
