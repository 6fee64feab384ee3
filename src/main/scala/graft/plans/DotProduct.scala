package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.graftexpr.DotProductExpr

/** Column-API entry point for the codegen dot product
  * (org.apache.spark.sql.graftexpr.DotProductExpr — see its scaladoc). */
object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotProductExpr(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
