package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, GraftVectorArgs}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding similarity — the 100 TB
  * path for ANN / near-dup (SURVEY §4 item 1). A Scala UDF would box
  * every float; these participate in whole-stage codegen: the generated
  * loop reads the unsafe array data directly.
  *
  * Inputs may be array<float> or array<double> (SQL literals like
  * `array(1.0, 0.0)` are double arrays); element width is resolved at
  * analysis time and wrong types fail analysis, never silently
  * misread bytes. Accumulation is always double so results are
  * reproducible against a double-math oracle.
  */
private[functions] object VectorTypeCheck {
  def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  def isDoubleVec(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  /** Java accessor expression for element i of an ArrayData variable. */
  def getter(variable: String, idx: String, double: Boolean): String =
    if (double) s"$variable.getDouble($idx)" else s"(double) $variable.getFloat($idx)"
  def get(a: ArrayData, i: Int, double: Boolean): Double =
    if (double) a.getDouble(i) else a.getFloat(i).toDouble
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with GraftVectorArgs {

  override def vectorArity: Int = 2
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null on dimension mismatch (a truncated prefix score would be
  // plausible-but-wrong; DuckDB errors there — null keeps the row
  // visible without desyncing the engines)
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  private lazy val lDouble = VectorTypeCheck.isDoubleVec(left.dataType)
  private lazy val rDouble = VectorTypeCheck.isDoubleVec(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = VectorTypeCheck.get(x, i, lDouble)
      val yi = VectorTypeCheck.get(y, i, rDouble)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, nx, ny, n, i) =
        (ctx.freshName("dot"), ctx.freshName("nx"), ctx.freshName("ny"),
         ctx.freshName("n"), ctx.freshName("i"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xi = ${VectorTypeCheck.getter(a, i, lDouble)};
         |    double yi = ${VectorTypeCheck.getter(b, i, rDouble)};
         |    $dot += xi * yi; $nx += xi * xi; $ny += yi * yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product over float/double arrays, double accumulation, codegen'd. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with GraftVectorArgs {

  override def vectorArity: Int = 2
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null on dimension mismatch — see CosineSimilarity
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private lazy val lDouble = VectorTypeCheck.isDoubleVec(left.dataType)
  private lazy val rDouble = VectorTypeCheck.isDoubleVec(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) {
      dot += VectorTypeCheck.get(x, i, lDouble) * VectorTypeCheck.get(y, i, rDouble)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, n, i) = (ctx.freshName("dot"), ctx.freshName("n"), ctx.freshName("i"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${VectorTypeCheck.getter(a, i, lDouble)} * ${VectorTypeCheck.getter(b, i, rDouble)};
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean (L2) distance over float/double arrays — sqrt of the sum
  * of squared element differences, accumulated in element order with
  * double precision so the value reproduces DuckDB's `list_distance`
  * (same loop order ⇒ same rounding) for the k-means oracle. */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression with GraftVectorArgs {

  override def vectorArity: Int = 2
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null on dimension mismatch — see CosineSimilarity
  override def nullable: Boolean = true
  override def prettyName: String = "l2_distance"

  private lazy val lDouble = VectorTypeCheck.isDoubleVec(left.dataType)
  private lazy val rDouble = VectorTypeCheck.isDoubleVec(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0; var i = 0
    while (i < n) {
      val d = VectorTypeCheck.get(x, i, lDouble) - VectorTypeCheck.get(y, i, rDouble)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (s, d, n, i) = (ctx.freshName("s"), ctx.freshName("d"),
        ctx.freshName("n"), ctx.freshName("i"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${VectorTypeCheck.getter(a, i, lDouble)} - ${VectorTypeCheck.getter(b, i, rDouble)};
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($s);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** cosine_similarity(a, b) over array<float|double> columns → double. */
  def cosine_similarity(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** l2_distance(a, b) over array<float|double> columns → double. */
  def l2_distance(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      L2Distance(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Fused LSH bucket id over an array<float|double> embedding column. */
  def hyperplane_bucket(emb: Column, planes: Int, dim: Int, seed: Long): Column =
    GraftSqlBridge.column(
      HyperplaneBucket(GraftSqlBridge.expression(emb), planes, dim, seed))
}

/** LSH bucket id in one pass: sign bits of `planes` pseudo-random
  * hyperplane dot products (plane matrix derived from `seed` via
  * splitmix64, materialized once per executor as a codegen reference
  * object). Replaces `planes` separate dot-product expressions with a
  * single fused loop over the embedding.
  */
case class HyperplaneBucket(child: Expression, planes: Int, dim: Int, seed: Long)
    extends UnaryExpression with GraftVectorArgs {
  require(planes > 0 && planes <= 30, s"planes out of range: $planes")

  override def vectorArity: Int = 1
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bucket"

  private lazy val cDouble = VectorTypeCheck.isDoubleVec(child.dataType)

  /** Flat [planes × dim] row-major matrix, uniform [-1, 1). */
  @transient lazy val matrix: Array[Double] = Array.tabulate(planes * dim) { idx =>
    val p = idx / dim; val i = idx % dim
    Hash64.splitmix(seed + p.toLong * 100003L + i).toDouble / Long.MaxValue.toDouble
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(dim, arr.numElements())
    var bucket = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      val off = p * dim
      while (i < n) { dot += VectorTypeCheck.get(arr, i, cDouble) * matrix(off + i); i += 1 }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("matrix", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val (b, p, i, dot, n) = (ctx.freshName("bucket"), ctx.freshName("p"),
        ctx.freshName("i"), ctx.freshName("dot"), ctx.freshName("n"))
      s"""
         |int $b = 0;
         |int $n = java.lang.Math.min($dim, $c.numElements());
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $dot = 0.0;
         |  int __off = $p * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${VectorTypeCheck.getter(c, i, cDouble)} * $mat[__off + $i];
         |  }
         |  if ($dot >= 0) $b |= (1 << $p);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
