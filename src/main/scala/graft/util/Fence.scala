package graft.util

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Optimizer fence: a typed identity map over a DataFrame.
  *
  * The Deserialize/SerializeFromObject pair it plants in the plan is a
  * boundary Catalyst's projection collapse and predicate pushdown do
  * not cross — which is exactly what an EXPENSIVE projected expression
  * needs. Pushdown's alias substitution has no expression-cost guard:
  * a filter over N fields of one expensive struct alias is rewritten
  * into N conjuncts that each embed their own copy of the producing
  * expression, and whole-stage-codegen FilterExec evaluates conjuncts
  * independently (no cross-conjunct subexpression elimination). Fencing
  * the producing projection pins "evaluate once, then reference".
  *
  * Cost: one per-row deserialize/serialize at the fence — place it
  * where rows are already narrow (after heavy columns are dropped). It
  * adds no shuffle, no materialization, and stays fully lazy;
  * whole-stage codegen resumes on both sides.
  */
object Fence {
  def apply(df: DataFrame): DataFrame =
    df.map(identity)(Encoders.row(df.schema))
}
