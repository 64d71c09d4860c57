package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * builtin higher-order functions (`zip_with` / `aggregate`) — no UDFs, so
  * the whole similarity pipeline stays inside whole-stage codegen.
  *
  * All arithmetic is routed through DOUBLE (cast once, then sequential
  * left-to-right folds) so results are deterministic and engine-comparable:
  * float accumulation order would otherwise make every run differ in the
  * low bits.
  */
object VectorFunctions {

  /** Cast an array<float> to array<double> once, up front. */
  def asDoubles(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Dot product — native codegen'd expression (see [[DotProduct]]: the
    * higher-order-function fold is CodegenFallback and dominates all-pairs
    * work). Summation is left-to-right in both implementations, so values
    * are bit-identical.
    */
  def dot(a: Column, b: Column): Column = DotProduct.dot_product(a, b)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane signature: `nBits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes (SimHash for real vectors —
    * Charikar, STOC'02), reproducible with no RNG state.
    *
    * This is the bucketing primitive for LSH ANN: vectors in the same
    * bucket (equal signature prefix) are near-neighbor candidates, so a
    * 100 TB corpus shuffles once on the signature instead of cross-joining.
    * Runs as the native codegen'd [[HyperplaneSignature]] expression (the
    * higher-order fold form was CodegenFallback — nBits×dims interpreted
    * lambda evals per vector).
    */
  def hyperplaneSignature(v: Column, nBits: Int, seed: Int = 0): Column =
    HyperplaneSignature.hyperplane_signature(v, nBits, seed)
}
