package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels referenced from generated code (must be static-callable from
  * Janino-compiled Java, hence a top-level object with forwarders). */
object TextKernels {
  def nfkc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFKC))

  /** 64-bit polynomial rolling hash (Karp-Rabin style, base 31) over UTF-8
    * bytes — the document-fingerprint primitive (reference uses SHA-256 hex
    * keys, io_helpers.py:105-115; a rolling hash is the scale-path variant:
    * 8 bytes/doc instead of 64 hex chars). */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }
}

/** T1 (data_transformation_helpers.py:20-86): Unicode NFKC normalization as
  * a native Catalyst expression — `doGenCode` keeps it inside whole-stage
  * codegen (unlike a Scala UDF, which forces an eval boundary and blocks
  * filter pushdown through the projection).
  */
case class NfkcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.nfkc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfkc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfkc_normalize"
}

/** Rolling-hash fingerprint expression (codegen-friendly, see
  * TextKernels.rollingHash). */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.rollingHash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object TextExpressions {
  def nfkc(c: Column): Column =
    GraftSqlBridge.column(NfkcNormalize(GraftSqlBridge.expression(c)))
  def rollingHash(c: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(c)))
}
