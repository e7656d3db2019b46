package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 32-bit SimHash of a feature-hash array: bit j of the result is set when
  * more than half the input hashes have bit j set (strict majority,
  * `2 * count > n`). The native twin of the
  * `aggregate(...bit counts...) -> 32-term majority sum` Column form in
  * [[graft.operators.Dedup.simhash32]] (verified value-equal by
  * `GraftFunctionsSpec`): one primitive loop over the hashes instead of an
  * interpreted lambda chain that allocates a 32-element accumulator per
  * element. Null array yields null; elements are non-null md5-derived
  * hashes.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  // Null-propagating on null ELEMENTS too (not just a null array): the
  // conservative containsNull=true flag is accepted (call sites all
  // produce non-null md5 hashes, but transform() flags its output array
  // conservatively), and a null element — were one ever to appear —
  // yields NULL loudly instead of being silently hashed as 0.
  override def nullable: Boolean =
    child.nullable || (child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override def prettyName: String = "graft_simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32.simhashOrNull(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c =>
        if (nullable)
          s"""
          Object simhashR = graft.expressions.SimHash32.simhashOrNull($c);
          if (simhashR == null) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = ((java.lang.Long) simhashR).longValue();
          }
        """
        else
          // Statically no nulls possible: ev.isNull is a literal (not
          // assignable); a null here would be a schema lie — fail loudly.
          s"${ev.value} = ((java.lang.Long) graft.expressions.SimHash32.simhashOrNull($c)).longValue();")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {

  /** Majority vote per bit over the low 32 bits of each hash; null (boxed)
    * when any element is null.
    */
  def simhashOrNull(harr: ArrayData): java.lang.Long = {
    val n = harr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (harr.isNullAt(i)) return null
      val h = harr.getLong(i)
      var j = 0
      while (j < 32) {
        counts(j) += ((h >> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (2L * counts(j) > n) sim |= 1L << j
      j += 1
    }
    sim
  }
}
