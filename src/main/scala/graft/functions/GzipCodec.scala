package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** gzip helpers callable from generated Java code (Scala object methods
  * compile to static forwarders). The reference gzips protein sequences
  * and HMM blobs at rest (interpro/oracle/proteins.py:68,
  * interpro/oracle/hmms.py:520-521); Spark has no builtin column-level
  * gzip, so this is the custom-expression seam (SURVEY.md §4.5).
  */
object GzipUtil {
  def compress(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 32)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  def decompress(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val bos = new ByteArrayOutputStream(bytes.length * 3 + 32)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }
}

abstract class GzipExpression extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${child.dataType.catalogString}")
}

/** gzip-compress a binary column. Not codegen-split: the generated code
  * is a single static call, so the expression stays inside whole-stage
  * codegen spans.
  */
case class GzipCompress(child: Expression) extends GzipExpression {
  override def prettyName: String = "gzip_compress"
  override def nullSafeEval(v: Any): Any =
    GzipUtil.compress(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipUtil.compress($c)")
  override protected def withNewChildInternal(newChild: Expression): GzipCompress =
    copy(child = newChild)
}

case class GzipDecompress(child: Expression) extends GzipExpression {
  override def prettyName: String = "gzip_decompress"
  override def nullSafeEval(v: Any): Any =
    GzipUtil.decompress(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipUtil.decompress($c)")
  override protected def withNewChildInternal(newChild: Expression): GzipDecompress =
    copy(child = newChild)
}

object GzipCodec {
  private def ident(name: String) =
    new org.apache.spark.sql.catalyst.FunctionIdentifier(name)

  val compressDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                           ExpressionInfo, Seq[Expression] => Expression) = (
    ident("gzip_compress"),
    new ExpressionInfo(classOf[GzipCompress].getName, "gzip_compress"),
    (children: Seq[Expression]) => GzipCompress(Cast(children.head, BinaryType))
  )

  val decompressDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                             ExpressionInfo, Seq[Expression] => Expression) = (
    ident("gzip_decompress"),
    new ExpressionInfo(classOf[GzipDecompress].getName, "gzip_decompress"),
    (children: Seq[Expression]) => GzipDecompress(children.head)
  )
}
