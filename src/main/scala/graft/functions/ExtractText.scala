package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel so generated code calls a monomorphic method. */
object ExtractTextKernel {
  def extract(payload: UTF8String): UTF8String =
    UTF8String.fromString(graft.extract.Extractor.extract(payload.toString).text)
}

/** `extract_text(payload)` as a native Catalyst expression — the SQL face of the
  * extraction kernel (SURVEY.md §4.3's optional `ExtractText`): usable from
  * `spark.sql`, composes with any relational plan, codegen keeps it inside
  * whole-stage pipelines. */
object ExtractSpansKernel {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** spans as Catalyst array<struct<start:int,end:int,label:string>>. */
  def extract(payload: UTF8String): GenericArrayData = {
    val spans = graft.extract.Extractor.extract(payload.toString).spans
    new GenericArrayData(spans.map(s =>
      InternalRow(s.start, s.end, UTF8String.fromString(s.label))).toArray[Any])
  }
}

/** `extract_spans(payload)` — the character-offset span side of the extraction
  * output, exposed to SQL with the full nested type. */
case class ExtractSpans(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType.fromDDL("start INT, end INT, label STRING"),
    containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExtractSpansKernel.extract(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractSpansKernel.extract($c)")
  override protected def withNewChildInternal(newChild: Expression): ExtractSpans =
    copy(child = newChild)
  override def prettyName: String = "extract_spans"
}

case class ExtractText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    ExtractTextKernel.extract(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractTextKernel.extract($c)")
  override protected def withNewChildInternal(newChild: Expression): ExtractText =
    copy(child = newChild)
  override def prettyName: String = "extract_text"
}
