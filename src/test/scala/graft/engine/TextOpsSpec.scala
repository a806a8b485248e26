package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.GraftSpark

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.session("local[4]", appName = "text-spec")

  val sf = "/root/testdata/sf0.001"

  /** Brute-force shingle-jaccard pairs, same tokenization as TextOps. */
  def brutePairs(threshold: Double): Set[(Long, Long)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val w = t.trim.split("\\s+").filter(_.nonEmpty)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }
    (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (a, sa) = sets(i); (b, sb) = sets(j)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= threshold
    } yield (math.min(a, b), math.max(a, b))).toSet
  }

  test("minhash-LSH pairs: perfect precision, high recall vs brute force") {
    val got = TextOps.minhashLshPairs(
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = brutePairs(TextOps.JaccardThreshold)
    assert(truth.nonEmpty, "fixture should contain planted near-dup pairs")
    // precision is 1.0 by construction (candidates are exact-jaccard verified)
    assert((got -- truth).isEmpty, s"false positives: ${got -- truth}")
    // LSH recall: P[miss] = (1-s^4)^4 ≈ 1.4% at s=0.9; deterministic here
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.85, s"recall $recall (${got.size}/${truth.size})")
  }

  test("simhash: near-dup pairs have small hamming distance, random pairs large") {
    val sim = TextOps.simhash60(
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dups = brutePairs(0.9)
    assert(dups.nonEmpty)
    val dupHam = dups.toSeq.map { case (a, b) => ham(sim(a), sim(b)) }
    val rnd = new scala.util.Random(7)
    val ids = sim.keys.toArray
    val randHam = (0 until 200).map { _ =>
      val a = ids(rnd.nextInt(ids.length)); val b = ids(rnd.nextInt(ids.length))
      ham(sim(a), sim(b))
    }.filter(_ > 0)
    // docs share one small vocabulary (word-soup fixture), so absolute
    // random-pair distances are modest; assert clear SEPARATION instead
    val dupMean = dupHam.sum.toDouble / dupHam.size
    val randMean = randHam.sum.toDouble / randHam.size
    assert(dupHam.max < 10, s"dup hamming too high: ${dupHam.max}")
    assert(randMean > dupMean + 5.0, s"no separation: dup=$dupMean rand=$randMean")
  }
}
