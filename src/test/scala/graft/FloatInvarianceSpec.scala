package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical partition-invariance sweep over EVERY registry query whose
  * output carries a float/double column — the class of nondeterminism the
  * r8 `e_covariance` failure exposed: double aggregation buffers merge in
  * partition order, so "oracle-green once" does not prove "deterministic".
  *
  * Unlike [[PartitionInvarianceSpec]] (a hand-picked slice of rank/join/
  * bucket operators), this spec is derived FROM the registry: it builds
  * every query's plan at sf0.001, selects those whose schema contains a
  * DoubleType/FloatType anywhere (top-level, array element, struct field,
  * map side), and runs each under two layouts that move BOTH knobs —
  * `spark.sql.shuffle.partitions` AND the input fan-out width
  * ([[Queries.fanOutOverride]]) — requiring identical sorted rows.
  * Double.toString is injective on doubles, so string equality here is
  * bit-for-bit value equality.
  *
  * A query added to the registry with a float output is swept
  * automatically; there is no list to forget to update. */
class FloatInvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def hasFloat(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case ArrayType(e, _)        => hasFloat(e)
    case StructType(fields)     => fields.exists(f => hasFloat(f.dataType))
    case MapType(k, v, _)       => hasFloat(k) || hasFloat(v)
    case _                      => false
  }

  /** Names of every float-emitting query, derived by analyzing (not
    * executing) each registry plan. Queries whose CONSTRUCTION alone
    * requires cluster work (driver-side model fits) still run here — at
    * sf0.001 that is cheap — so the filter sees the true output schema. */
  private lazy val floatQueries: Seq[String] = {
    val s = spark // force session before plan construction
    Queries.all.flatMap { case (name, q) =>
      val keep =
        try hasFloat(q.fn(s, dir).schema)
        finally graft.core.CacheScope.release()
      if (keep) Some(name) else None
    }
  }

  private def run(name: String, parts: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    Queries.fanOutOverride = Some(parts)
    try Queries.queries(name)(spark, dir).collect().map(_.toString).sorted.toSeq
    finally {
      Queries.fanOutOverride = None
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.core.CacheScope.release()
    }
  }

  test("the registry exposes float-emitting queries to sweep") {
    assert(floatQueries.size >= 40, s"only ${floatQueries.size} found")
  }

  test("every float-emitting registry query is partition-invariant") {
    val failures = floatQueries.flatMap { name =>
      val at2 = run(name, 2)
      val at32 = run(name, 32)
      if (at2 == at32) None
      else Some(s"$name (${at2.size} vs ${at32.size} rows)")
    }
    assert(failures.isEmpty,
      s"partition-dependent float results: ${failures.mkString(", ")}")
  }
}
