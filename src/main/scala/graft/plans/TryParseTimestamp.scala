package graft.plans

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Lenient timestamp parse as a native expression: same result as
  * `to_timestamp(c, fmt)` on valid input, null on malformed input
  * (KSQL stream semantics), WITHOUT the whole-stage-codegen fallback
  * that `try_to_timestamp`'s TryEval wrapper causes (~6x on the
  * parse-heavy pipelines). Timezone is explicit — the engine pins the
  * session to UTC (Engine.configure).
  */
case class TryParseTimestamp(child: Expression, format: String,
                             zone: String = "UTC") extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"try_parse_timestamp expects string, got ${other.sql}")
  }
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "try_parse_timestamp"

  override def nullSafeEval(input: Any): Any =
    GraftBridge.parseTimestampOrNull(format, zone, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val fmtRef = ctx.addReferenceObj("tpFmt", format, "java.lang.String")
    val zoneRef = ctx.addReferenceObj("tpZone", zone, "java.lang.String")
    val parsed = ctx.freshName("parsed")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $parsed = org.apache.spark.sql.GraftBridge.parseTimestampOrNull(
            $fmtRef, $zoneRef, ${childGen.value});
          if ($parsed != null) { ${ev.isNull} = false; ${ev.value} = $parsed.longValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): TryParseTimestamp =
    copy(child = newChild)
}
