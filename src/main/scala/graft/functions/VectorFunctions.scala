package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns using higher-order
  * functions — `zip_with`/`aggregate` are Catalyst expressions that stay in
  * codegen, so the dot product compiles to a tight loop per row with no UDF
  * boxing. Folds run left-to-right, giving bit-identical doubles across
  * engines that fold the same way (the DuckDB oracle does).
  */
object VectorFunctions {

  /** Left-fold sum of an array<double>. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm(a: Column): Column =
    sqrt(arraySum(transform(a, x => x.cast("double") * x.cast("double"))))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bit signature: bit j = sign of <v, h_j> where
    * hyperplane h_j's components are deterministic pseudo-random values in
    * [-0.5, 0.5) derived from xxhash64(j, dim). Returns an int bucket id with
    * `nBits` bits. Deterministic, distributed, no driver state.
    */
  def hyperplaneBucket(v: Column, nBits: Int, seed: Long = 42L): Column = {
    val bits = (0 until nBits).map { j =>
      val proj = arraySum(zip_with(v, sequence(lit(0), lit(63)), (x, d) =>
        x.cast("double") *
          ((pmod(xxhash64(lit(j), d, lit(seed)), lit(1000000L)).cast("double")
            / 1000000.0) - 0.5)))
      when(proj >= 0, lit(1 << j)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
