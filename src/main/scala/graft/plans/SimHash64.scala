package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash of a token array in one
  * pass — each output bit is the sign of the ±1 vote sum of that bit
  * across `xxhash64(token)` (seed 42, matching Spark's `xxhash64`).
  *
  * Replaces the compose-built-ins formulation (explode + groupBy with
  * 64 vote sums — a full shuffle of every token) with a narrow
  * projection: no shuffle, no per-token rows, stays inside
  * WholeStageCodegen via `doGenCode`. This is the preferred-order (b)
  * path from the build guide: a custom `Expression` where composition
  * is semantically right but physically wasteful.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** SimHash over an engine-portable hash family: per-token polynomial
  * hash h, then bit b votes by the sign of ((h·a_b + b_b) mod P) − P/2.
  * Same sketch semantics as [[SimHash64]], but every operation is plain
  * arithmetic reproducible in SQL — which gives the SimHash query a
  * full DuckDB oracle (constants embedded in the generated statement).
  */
case class SimHashPortable(child: Expression, permsA: Seq[Long],
                           permsB: Seq[Long], modulus: Long)
    extends UnaryExpression {
  // Seq params keep case-class equality value-based (semanticEquals/CSE)
  require(permsA.length == 64 && permsB.length == 64)

  @transient private lazy val pa: Array[Long] = permsA.toArray
  @transient private lazy val pb: Array[Long] = permsB.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_portable expects array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_portable"

  override def nullSafeEval(input: Any): Any =
    SimHashPortable.compute(input.asInstanceOf[ArrayData], pa, pb, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val paRef = ctx.addReferenceObj("shPa", pa, "long[]")
    val pbRef = ctx.addReferenceObj("shPb", pb, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashPortable.compute($c, $paRef, $pbRef, ${modulus}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashPortable =
    copy(child = newChild)
}

object SimHashPortable {
  def compute(arr: ArrayData, pa: Array[Long], pb: Array[Long], p: Long): Long = {
    val votes = new Array[Int](64)
    val half = p / 2
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = PolyHash.compute(arr.getUTF8String(i), p)
        var b = 0
        while (b < 64) {
          val v = (h * pa(b) + pb(b)) % p
          if (v > half) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object SimHash64 {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
