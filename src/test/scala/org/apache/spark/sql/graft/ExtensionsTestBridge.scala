package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge to the `private[sql]` extension-application hook, so a
  * spec can apply a SparkSessionExtensions instance to a registry clone
  * without building a whole second SparkSession.
  */
object ExtensionsTestBridge {
  def registerFunctions(ext: SparkSessionExtensions,
                        reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
