package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent session registration for the native function modules.
  *
  * Every query builder calls its module's `register()` defensively
  * (builders must work on any session handed to them), so registration
  * must be a no-op when the function already exists — both for repeat
  * calls and for sessions built with `graft.GraftExtensions`, where the
  * same names were injected at session build. Plain
  * `createOrReplaceTempFunction` logs `replaced a previously registered
  * function` on every repeat; checking first keeps re-registration
  * silent and keeps the injected built-ins in place.
  */
private[functions] object Registration {
  def ifAbsent(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
