package graft

import org.apache.spark.sql.SparkSession

import graft.functions.expressions._

/** SQL-surface registration for the engine's custom Catalyst expressions,
  * so `spark.sql("SELECT graft_dot(a, b) ...")` works alongside the Column
  * API. Idempotent; call once per session.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      es => DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash",
      es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      es => ShingleHashSet(es.head,
        es(1).eval().asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      es => MinHashSig(es.head,
        es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Number].longValue()), "scala_udf")
  }
}
