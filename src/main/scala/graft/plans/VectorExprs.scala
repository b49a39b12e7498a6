package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector expressions over `array<float>` embedding columns.
  *
  * Precision contract: every element is widened float→double and the
  * fold is sequential left-to-right — identical to the composed
  * `aggregate(zip_with(…))` formulation AND to the DuckDB oracle's
  * `list_aggregate('sum')`, so cosine scores stay bit-exact while the
  * interpreted per-element lambda overhead disappears.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  private def okType(dt: DataType) = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double>, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isFloatL = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def isFloatR = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], isFloatL,
      b.asInstanceOf[ArrayData], isFloatR)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.CosineSim.compute($a, $isFloatL, $b, $isFloatR);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x: Double = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y: Double = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** All multi-table sign-LSH buckets of a vector in one pass: output is
  * `array<long>` with one bucket id per hash table. The plane matrix is
  * part of the expression (tiny, deterministic, travels with the plan —
  * a broadcast-free literal). Sign rule: projection >= 0 sets bit i,
  * matching the composed `when(proj >= 0, 1<<i)` formulation.
  */
case class LshBuckets(child: Expression, planes: Seq[Seq[Double]],
                      planesPerTable: Int) extends UnaryExpression {
  // Seq params keep case-class equality value-based (semanticEquals/CSE)
  require(planes.nonEmpty && planes.length % planesPerTable == 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects array<float|double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val flat: Array[Double] = planes.flatten.toArray
  @transient private lazy val dim: Int = planes.head.length

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], isFloat, flat, dim,
      planes.length, planesPerTable)

  // plane matrix goes into a codegen reference object rather than a
  // giant literal string
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("lshPlanesFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LshBuckets.compute($c, $isFloat, $flatRef, " +
        s"$dim, ${planes.length}, $planesPerTable);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  def compute(v: ArrayData, vFloat: Boolean, flat: Array[Double], dim: Int,
              nPlanes: Int, planesPerTable: Int): ArrayData = {
    val n = math.min(v.numElements(), dim)
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) {
      vec(i) = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val nTables = nPlanes / planesPerTable
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val base = (t * planesPerTable + p) * dim
        var proj = 0.0
        var j = 0
        while (j < n) { proj += vec(j) * flat(base + j); j += 1 }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = java.lang.Long.valueOf(bucket)
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Cell routing of a vector against a centroid table that travels as
  * a codegen REFERENCE OBJECT, not unrolled literals — the router for
  * cell counts the inlined-literal probe expression cannot reach (it
  * outgrows Janino method limits near ~128 centroids; this expression's
  * generated code is one static call at ANY nlist).
  *
  * One or two levels, mirroring `Similarity.semCellsTwoLevel`'s rule:
  * with a single branch the scan is the flat argmax-cosine assignment
  * (ties to the lowest cid — `array_position(scores, array_max)`
  * semantics); with multiple branches the vector first takes its
  * argmax-cosine super (ties to the lowest sid), then the argmax
  * centroid WITHIN that super's branch — n·O(√nlist) score work, the
  * IMI shape. Cosine is the same sequential float→double fold as
  * [[CosineSim]], so assignments are bit-identical to every batch
  * variant. Returns the winning centroid's cid (LongType).
  */
case class CellRoute(child: Expression, superVs: Seq[Seq[Double]],
                     branchCids: Seq[Seq[Long]],
                     branchVs: Seq[Seq[Seq[Double]]]) extends UnaryExpression {
  // Seq params keep case-class equality value-based (semanticEquals/CSE)
  require(superVs.nonEmpty && superVs.length == branchCids.length &&
    branchCids.length == branchVs.length,
    "one (cids, centroids) branch per super")
  require(branchCids.forall(_.nonEmpty),
    "every super's branch must hold at least one centroid (itself)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_route expects array<float|double>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "cell_route"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val supersArr: Array[Array[Double]] =
    superVs.map(_.toArray).toArray
  @transient private lazy val cidsArr: Array[Array[Long]] =
    branchCids.map(_.toArray).toArray
  @transient private lazy val centsArr: Array[Array[Array[Double]]] =
    branchVs.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    CellRoute.compute(input.asInstanceOf[ArrayData], isFloat,
      supersArr, cidsArr, centsArr)

  // centroid matrices go into codegen reference objects rather than
  // giant literal strings — code size is constant in nlist
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val supersRef = ctx.addReferenceObj("cellRouteSupers", supersArr, "double[][]")
    val cidsRef = ctx.addReferenceObj("cellRouteCids", cidsArr, "long[][]")
    val centsRef = ctx.addReferenceObj("cellRouteCents", centsArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CellRoute.compute($c, $isFloat, " +
        s"$supersRef, $cidsRef, $centsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CellRoute =
    copy(child = newChild)
}

object CellRoute {
  /** The [[CosineSim]] fold over a raw centroid array — same op order,
    * bit-identical scores. */
  private def cos(v: ArrayData, vFloat: Boolean, c: Array[Double]): Double = {
    val n = math.min(v.numElements(), c.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x: Double = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val y: Double = c(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def compute(v: ArrayData, vFloat: Boolean, supers: Array[Array[Double]],
              cids: Array[Array[Long]],
              cents: Array[Array[Array[Double]]]): Long = {
    // level 1: argmax super, strict > keeps the FIRST best = lowest sid
    var branch = 0
    if (supers.length > 1) {
      var best = Double.NegativeInfinity
      var i = 0
      while (i < supers.length) {
        val s = cos(v, vFloat, supers(i))
        if (s > best) { best = s; branch = i }
        i += 1
      }
    }
    // level 2: argmax within the branch, first best = lowest cid
    // (branch cids are sorted ascending at construction)
    val bc = cents(branch)
    val bi = cids(branch)
    var best = Double.NegativeInfinity
    var cell = bi(0)
    var j = 0
    while (j < bc.length) {
      val s = cos(v, vFloat, bc(j))
      if (s > best) { best = s; cell = bi(j) }
      j += 1
    }
    cell
  }
}
