package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for large-x-large equi-joins.
  *
  * When BOTH join sides are too large to broadcast and the key histogram is
  * heavy-tailed, a plain hash join sends every row of a hot key to one
  * reducer — the classic straggler. [[saltedJoin]] splits each key's
  * partition into `salts` independent ones: left rows get a deterministic
  * salt, right rows are replicated once per salt value, and the join key
  * becomes (key, salt). Output is row-identical to the unsalted inner join;
  * the cost is `salts` copies of the (smaller) right side in the shuffle.
  *
  * AQE's skew-join splitting covers sort-merge joins it can observe at
  * runtime; explicit salting is the portable, plan-time form — it also
  * composes with bucketed layouts and works where AQE cannot re-plan
  * (e.g. a join feeding a streaming stage).
  */
object Skew {

  /** Inner equi-join on `keys`, salted `salts` ways.
    *
    * @param saltBy a LEFT-side column whose values distribute within a key
    *               (any unique-ish id); rows of one hot key spread over
    *               `salts` partitions by its murmur3 hash. Deterministic —
    *               reruns produce identical partitioning.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int, saltBy: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(keys.nonEmpty, "need at least one join key")
    val l = left.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    l.join(r, keys :+ "__salt", "inner").drop("__salt")
  }
}
