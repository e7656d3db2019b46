package graft.functions

import com.ibm.icu.lang.UCharacter
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode accent folding: NFKD-normalize, then drop every character with a
  * non-zero canonical combining class.
  *
  * Semantics of the reference's `remove_accents` UDF
  * (`/root/reference/src/cleaning.py:76-83`): Python
  * `unicodedata.normalize("NFKD", s)` followed by dropping chars where
  * `unicodedata.combining(char) != 0`. We match that exactly — including the
  * NFKD compatibility decompositions (ligatures, superscripts) and the
  * combining-class (not general-category) test — via ICU, which implements
  * the same UCD data tables CPython uses.
  */
object AccentFolder {
  /** Static entry point shared by interpreted + generated code paths. */
  def fold(s: UTF8String): UTF8String = {
    if (s == null) return null
    val norm = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(norm.length)
    var i = 0
    while (i < norm.length) {
      val cp = norm.codePointAt(i)
      if (UCharacter.getCombiningClass(cp) == 0) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native Catalyst expression for [[AccentFolder.fold]]. Generated code calls
  * the static helper, so the operator stays inside whole-stage codegen (no
  * UDF boundary, no serialization).
  */
case class FoldAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    AccentFolder.fold(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AccentFolder.fold($c)")
  override protected def withNewChildInternal(newChild: Expression): FoldAccents =
    copy(child = newChild)
  override def prettyName: String = "fold_accents"
}

object FoldAccents {
  def apply(c: Column): Column = Compat.column(FoldAccents(Compat.expression(c)))
}
