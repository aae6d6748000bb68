package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.SqlBridge

import graft.functions.expressions.{CharShingles, MinHashShingles}

/** Column-API entry points for graft's native Catalyst expressions. */
object GraftColumns {
  /** MinHash signature of `text`'s character k-shingles as
    * array<long> of length numPerms — single compiled pass per row
    * (see [[MinHashShingles]]). */
  def minHashShingles(text: Column, k: Int, numPerms: Int): Column =
    SqlBridge.column(MinHashShingles(SqlBridge.expression(text), k, numPerms))

  /** Distinct character k-shingles in one pass (see [[CharShingles]]). */
  def charShingles(text: Column, k: Int): Column =
    SqlBridge.column(CharShingles(SqlBridge.expression(text), k))
}
