package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The DSIR hash-kernel swap (r13 verdict item 6): the md5 kernel keeps
  * the DuckDB oracle (the registered queries), the xxhash64 kernel is
  * the production form — ~6× on the corpus-sized hash. Values under the
  * two kernels legitimately differ (different bigram→bucket maps), so
  * these tests pin SHAPE equivalence, not value equality: schema ≡,
  * per-doc feature counts ≡ (bucketing never changes how many bigrams a
  * doc has), partitioning-proof determinism, and the resample contract.
  */
class DsirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"lang", $"text")

  private def weights(hash: Dsir.HashKernel): DataFrame = {
    val feats = Dsir.hashedBigramFeatures(docs, hash = hash)
    Dsir.docWeights(feats, Dsir.llrTerms(feats)).orderBy($"doc_id")
  }

  test("xxhash64 kernel keeps the md5 form's schema and per-doc feature counts") {
    val md = weights(Dsir.HashKernel.Md5)
    val xx = weights(Dsir.HashKernel.Xx64)
    assert(xx.schema == md.schema)
    // n_features = the doc's bigram count — a pure function of the text,
    // identical under ANY bucket hash; only the weights may differ
    val mdCounts = md.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val xxCounts = xx.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(xxCounts == mdCounts)
    assert(mdCounts.nonEmpty)
  }

  test("xxhash64 kernel is deterministic across runs and partitionings") {
    def run(parts: Int): Seq[(Long, String, Long, Long)] = {
      val d = docs.repartition(parts)
      val feats = Dsir.hashedBigramFeatures(d, hash = Dsir.HashKernel.Xx64)
      Dsir.docWeights(feats, Dsir.llrTerms(feats))
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    }
    val a = run(2)
    val b = run(7)
    assert(a == b, "xx64 weights changed under repartitioning")
  }

  test("gumbel resample over xx64 scores returns exactly k rows, deterministically") {
    val feats = Dsir.hashedBigramFeatures(docs, hash = Dsir.HashKernel.Xx64)
    val scored = Dsir.docWeights(feats, Dsir.llrTerms(feats))
      .select($"doc_id", $"lang", $"dsir_micro_nats")
    val k = 20
    def ids() = Dsir.gumbelResample(scored, k).collect()
      .map(_.getLong(0)).sorted.toSeq
    val first = ids()
    assert(first.size == k)
    assert(first.distinct.size == k, "resample drew a duplicate doc")
    assert(ids() == first, "resample not deterministic")
  }
}
