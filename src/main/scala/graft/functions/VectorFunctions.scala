package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns, composed from
  * Spark's higher-order array functions (`zip_with` + `aggregate`), which
  * evaluate as codegen'd expressions — no UDF boxing per element.
  *
  * Determinism contract (needed for the DuckDB-oracle compare): all
  * arithmetic is done in DOUBLE after an explicit array cast, and the
  * accumulation folds left-to-right in element order — the same order a
  * single-threaded engine uses — so results are bit-identical.
  *
  * Scale path: brute-force cosine is O(n·m·d) and only used as the exact
  * baseline / verification stage; the 100 TB path is LSH bucketing
  * (see operators.Similarity) which turns the cross join into an
  * equi-join on bucket signature.
  */
object VectorFunctions {

  /** Cast to ARRAY<DOUBLE> for stable arithmetic. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** [[asDouble]] plus the dense-corpus boundary validation
    * ([[KnownDenseArray]]): one O(d) null scan per INPUT row, loud
    * failure on a null element, and a `containsNull = false` output
    * type that lets [[CosineSimilarity]] codegen its check-free
    * multiply-accumulate loop inside the O(n²) pair stages. Use for
    * corpora whose generator guarantees density (the catalog
    * embeddings); keep plain [[asDouble]] where a null element must
    * map to a NULL score instead of failing the query.
    */
  def asDoubleDense(v: Column): Column =
    KnownDenseArray.denseChecked(asDouble(v))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (double, deterministic). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane (SimHash-style) LSH signature for cosine distance:
    * `nBits` sign bits packed into a LONG. Hyperplane components are
    * pseudo-random constants derived from a fixed seed at plan-build time,
    * embedded as array literals — every executor evaluates the identical
    * expression, no driver-side state, no UDF.
    *
    * Vectors with equal signatures (or signatures within small Hamming
    * distance) are cosine-close candidates; used to bucket an ANN join.
    */
  def lshSignature(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    // one hyperplane per bit: dim gaussian-ish components in [-1, 1)
    val planes: Seq[Seq[Double]] =
      Seq.fill(nBits)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeLit = typedLit(plane)
      val proj = aggregate(
        zip_with(vec, planeLit, (x, p) => x * p), lit(0.0), (acc, v) => acc + v)
      // proj is NULL when the vector's length differs from `dim`
      // (zip_with pads with nulls): the signature must be NULL then,
      // not bit 0 — an unconditional otherwise(0) gave EVERY
      // wrong-dimension vector the same signature 0, silently
      // degenerating the LSH equi-join into one all-pairs bucket.
      // NULL band keys drop out of the join instead.
      when(proj >= 0, shiftleft(lit(1L), i))
        .when(proj < 0, lit(0L)) // else NULL propagates through the sum
    }
    bits.reduce(_ + _)
  }
}
