package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}

import graft.plans.SimHash64

/** Column API over the engine's native Catalyst expressions. */
object Native {
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
}
