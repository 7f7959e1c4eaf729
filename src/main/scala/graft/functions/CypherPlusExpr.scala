package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Type-adaptive Cypher `+`, resolved at analysis time.
  *
  * Cypher overloads `+` on numbers (add), strings (concat), lists
  * (concat / element append) and mixed string+scalar (stringify then
  * concat). The reference dispatches on runtime JS types
  * (executor.ts binary-op evaluation); Catalyst types are static, so the
  * Spark-first equivalent is a RuntimeReplaceable expression that picks
  * the concrete plan-time form once child types are known — crucially
  * this also works for lambda-bound variables (`reduce(s = '', x IN l |
  * s + x)`), where the Column-level AST heuristics in the compiler can't
  * see a type.
  *
  * The replacement is built fully typed (explicit Casts) because
  * optimizer-stage replacements are not re-analyzed.
  */
case class CypherPlus(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override lazy val replacement: Expression = (left.dataType, right.dataType) match {
    case (NullType, NullType) => Literal.create(null, NullType)
    case (NullType, t) => Literal.create(null, t)
    case (t, NullType) => Literal.create(null, t)
    case (_: StringType, _) | (_, _: StringType) =>
      Concat(Seq(Cast(left, StringType), Cast(right, StringType)))
    case (l: ArrayType, r: ArrayType) =>
      if (l.elementType == r.elementType) Concat(Seq(left, right))
      else if (l.elementType == NullType) Concat(Seq(Cast(left, r), right))
      else Concat(Seq(left, Cast(right, l)))
    case (l: ArrayType, _) => // [1, 2] + 3 appends the element
      Concat(Seq(left, CreateArray(Seq(Cast(right, l.elementType)))))
    case (_, r: ArrayType) =>
      Concat(Seq(CreateArray(Seq(Cast(left, r.elementType))), right))
    case (lt, rt) if isIntegral(lt) && isIntegral(rt) =>
      Add(Cast(left, LongType), Cast(right, LongType))
    case _ =>
      Add(Cast(left, DoubleType), Cast(right, DoubleType))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CypherPlus =
    copy(left = newLeft, right = newRight)
}
