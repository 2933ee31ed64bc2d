package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4122 version-5 (SHA-1, name-based) UUID in the DNS namespace —
  * bit-exact with Python's `uuid.uuid5(uuid.NAMESPACE_DNS, name)`, which the
  * reference uses for the deterministic assay surrogate key
  * (/root/reference/scripts/assay.py:100; SURVEY A29/C14).
  *
  * Kept free of Spark types so both the interpreted and generated code paths
  * call the same static method.
  */
object Uuid5Fn {

  /** NAMESPACE_DNS = 6ba7b810-9dad-11d1-80b4-00c04fd430c8 (RFC 4122 §C). */
  private val NamespaceDns: Array[Byte] = Array(
    0x6b, 0xa7, 0xb8, 0x10, 0x9d, 0xad, 0x11, 0xd1,
    0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  private val HexChars = "0123456789abcdef".toCharArray

  /** uuid5(NAMESPACE_DNS, name): SHA-1(namespace ‖ utf8(name)), truncated to
    * 128 bits with version 5 in octet 6 and RFC variant in octet 8.
    */
  def computeDns(name: UTF8String): UTF8String = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(NamespaceDns)
    md.update(name.getBytes)
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte
    h(8) = ((h(8) & 0x3f) | 0x80).toByte
    val out = new Array[Char](36)
    var i = 0
    var j = 0
    while (i < 16) {
      if (j == 8 || j == 13 || j == 18 || j == 23) { out(j) = '-'; j += 1 }
      out(j) = HexChars((h(i) >> 4) & 0xf)
      out(j + 1) = HexChars(h(i) & 0xf)
      j += 2
      i += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** Catalyst expression for `uuid5_dns(name)`. Deterministic and foldable
  * under constant inputs; participates in whole-stage codegen via a static
  * call, so it stays inside the fused pipeline (no UDF serialization
  * boundary).
  */
case class Uuid5Expr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"uuid5_dns expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "uuid5_dns"
  // deterministic pure function ⇒ constant-foldable over literal input
  // (ConstantFolding then evaluates it once at plan time)
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(input: Any): Any =
    Uuid5Fn.computeDns(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Uuid5Fn.computeDns($c)")

  override protected def withNewChildInternal(newChild: Expression): Uuid5Expr =
    copy(child = newChild)
}
