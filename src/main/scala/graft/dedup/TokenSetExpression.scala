package graft.dedup

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel: reference tokenize/filter/shingle/dedup/sort in one
  * compiled pass (delegates to [[Tokenize.tokenSetScala]], which the test
  * suite holds equal to both the Column-built-ins version and the oracle). */
object TokenSetKernel {
  def eval(s: UTF8String, k: Int): ArrayData = {
    val toks = Tokenize.tokenSetScala(s.toString, k)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Codegen'd tokenizer expression. The equivalent chain of built-ins
  * (regexp_extract_all -> higher-order filter with 3 regex predicates and a
  * 527-element array scan -> shingle transform -> distinct -> sort) is NOT
  * whole-stage-codegen'd (higher-order functions evaluate interpreted, each
  * lambda predicate allocating per element); this single compiled kernel with
  * a precompiled regex and a hash-set stopword probe does the same work in
  * one pass and stays inside codegen.
  */
case class TokenSet(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"token_set expects string, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    TokenSetKernel.eval(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = graft.dedup.TokenSetKernel.eval($s, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_set"
}

object TokenSet {
  def apply(c: Column, k: Int): Column = GraftBridge.column(TokenSet(GraftBridge.expression(c), k))
}
