package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's avalanche-finalized
  * hash: splitmix64(FNV-1a-64(s)) — the [[graft.sketch.Kmv]] /
  * [[graft.mix.Mix.shardAssign]] convention (raw FNV over consecutive
  * decimal ids is not avalanche-y; the splitmix finalizer fixes the
  * adjacency-preservation weakness both call sites hit). Same rationale
  * as [[FnvHash]]: the wraparound multiplies live in plain Java inside
  * whole-stage codegen, where ANSI-mode Column arithmetic would
  * overflow-error. Bit parity with the scalar path and with the DuckDB
  * oracle's staged HUGEINT replay (`xorShrSql`/`mulSql`) is
  * ScalaCheck'd/oracled.
  */
case class MixHash(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix_hash expects STRING input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    MixHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.MixHash.hash($s)")

  override protected def withNewChildInternal(newChild: Expression): MixHash =
    copy(child = newChild)
}

object MixHash {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def hash(s: UTF8String): Long = {
    var z = graft.mix.Mix.fnv1a(s.toString)
    z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
    z ^= z >>> 27; z *= 0x94d049bb133111ebL
    z ^= z >>> 31
    z
  }

  /** Column form: `mix_hash(stringCol)`. */
  def apply(col: Column): Column =
    ColumnBridge.column(MixHash(ColumnBridge.expression(col)))
}
