package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the phase-1 HTML→text extraction
  * (north star: "deterministic HTML-to-text extraction ... re-expressed
  * as Catalyst expressions"). Replaces the Scala UDF on the pipeline's
  * hot path: a UDF pays catalyst↔scala row conversion and closure
  * dispatch per row; this expression codegens to a direct static call
  * inside whole-stage codegen (brief's preference order: builtin Column
  * > custom Expression with doGenCode > UDF).
  *
  * Semantics are exactly [[HtmlText.extractMainFromBytes]] — the
  * byte-identical-per-url invariant is asserted against the UDF path in
  * ExtractMainTextSpec and by the kg_extract_text oracle.
  */
case class ExtractMainText(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_main_text expects BINARY input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlText.extractMainFromBytes(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, bytes =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.extract.HtmlText.extractMainFromBytes($bytes))")

  override protected def withNewChildInternal(newChild: Expression): ExtractMainText =
    copy(child = newChild)
}

object ExtractMainText {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column form: `extract_main_text(htmlBytesCol)`. */
  def apply(col: Column): Column =
    ColumnBridge.column(ExtractMainText(ColumnBridge.expression(col)))
}
