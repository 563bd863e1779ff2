package graft

import org.apache.spark.sql.functions._

/** The pq_codes kernel's input contract and expression identity
  * (round-11 ADVICE): dim mismatches fail NAMED (a short vector used to
  * surface as a raw ArrayIndexOutOfBoundsException from generated code;
  * a long one silently ignored trailing dims), and two expressions
  * built from structurally-identical but separately-collected codebooks
  * compare equal — the property canonicalization and the
  * ExtractExpensiveSubexpressions CSE rest on.
  */
class PqCodesSpec extends SparkSuite {
  import spark.implicits._

  // m=2 subspaces x k=2 codewords x subDim=2
  private def freshCws(): Array[Array[Array[Double]]] = Array(
    Array(Array(0.0, 0.0), Array(1.0, 1.0)),
    Array(Array(0.0, 1.0), Array(1.0, 0.0)))

  test("vector dim must equal m*subDim — named error either direction") {
    for (bad <- Seq(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f, 4f, 5f))) {
      val df = Seq(Tuple1(bad)).toDF("embedding")
        .select(graft.functions.pq_codes(col("embedding"), freshCws(), 2).as("c"))
      val e = intercept[Exception] { df.collect() }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      val named = chain(e).exists(t => t.isInstanceOf[IllegalArgumentException]
        && t.getMessage.contains("pq_codes") && t.getMessage.contains("2*2"))
      assert(named, s"expected the named pq_codes dim guard, got: $e")
    }
  }

  test("well-formed vectors still encode (guard is not over-eager)") {
    val out = Seq(Tuple1(Seq(0.9f, 0.9f, 0.1f, 0.9f)))
      .toDF("embedding")
      .select(graft.functions.pq_codes(col("embedding"), freshCws(), 2).as("c"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(1L, 0L)) // (0.9,0.9)->cw1; (0.1,0.9)->cw(0,1)=code 0
  }

  test("separately-collected codebooks yield EQUAL expressions (structural identity)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.functions.{PqCodebook, PqCodesExpr}
    // identical child on both sides — what differs is ONLY that each
    // side "collected" its own copy of the codebook arrays
    val child = BoundReference(0, ArrayType(FloatType), nullable = true)
    val a = PqCodesExpr(child, new PqCodebook(freshCws()), 2)
    val b = PqCodesExpr(child, new PqCodebook(freshCws()), 2)
    assert(a == b, "case-class equality must be structural over the codebook")
    assert(a.semanticEquals(b), "semanticEquals must see through the codebook")
    assert(a.hashCode == b.hashCode)
    // and a genuinely different codebook must NOT compare equal
    val other = freshCws(); other(1)(1)(0) = 9.0
    assert(a != PqCodesExpr(child, new PqCodebook(other), 2))
  }
}
