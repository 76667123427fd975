package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's replayable hash —
  * FNV-1a-64 folded over UTF-16 code units, bit-parity with
  * [[graft.mix.Mix.fnv1a]] and the DuckDB oracle's HUGEINT fold
  * (`fnvFoldSql`). The scalar form lives in typed kernels because
  * FNV's wraparound multiply overflows ANSI-mode Column arithmetic
  * (Spark 4 default); this expression does the wraparound in plain
  * Java inside whole-stage codegen instead, so hash-addressed
  * relational operators (CMS bucketing) stay fully codegen'd with no
  * encoder round trip (brief's preference order: builtin Column >
  * custom Expression with doGenCode > UDF).
  */
case class FnvHash(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv_hash expects STRING input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    FnvHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.FnvHash.hash($s)")

  override protected def withNewChildInternal(newChild: Expression): FnvHash =
    copy(child = newChild)
}

object FnvHash {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** The fold itself — UTF-16 code units, matching `Mix.fnv1a`. */
  def hash(s: UTF8String): Long = graft.mix.Mix.fnv1a(s.toString)

  /** Column form: `fnv_hash(stringCol)`. */
  def apply(col: Column): Column =
    ColumnBridge.column(FnvHash(ColumnBridge.expression(col)))
}
