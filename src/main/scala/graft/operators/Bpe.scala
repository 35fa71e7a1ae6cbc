package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding over the corpus: merge-table training (the real
  * thing a "tokenizer-grade" token count needs, vs the regex stand-in
  * in [[TextAnalysis.tokenCounts]]) plus merge-table token counting.
  *
  * Training is classic BPE (Sennrich et al. 2016) with the work split
  * the way production tokenizer trainers split it:
  *
  *   - DISTRIBUTED: the corpus collapses to a word-frequency dict (one
  *     full-corpus groupBy — the only pass over the data), capped to
  *     the top `VocabCap` words by (freq DESC, word ASC) exactly like
  *     SentencePiece/HF trainers cap their vocabulary;
  *   - DRIVER: the merge loop runs on that counted dict — O(vocab ×
  *     merges) string work on ≤ 100k rows, far below any distributed
  *     crossover point (an earlier all-DataFrame loop spent minutes in
  *     Catalyst re-planning 16 chained iterations of a 31-row table);
  *   - DISTRIBUTED: encoding joins the corpus against the broadcast
  *     encoded dict — the merge loop never touches the corpus again.
  *
  * Symbol sequences are marker-prefixed strings ("scan" → "_s _c _a
  * _n") so a merge is a plain `replace(sym, "_a _b", "_ab")`: the "_"
  * marker makes substring matches boundary-safe, left-to-right
  * non-overlapping replacement IS Sennrich's apply rule, and because
  * `replace` behaves identically in any engine the whole pipeline —
  * training included — is DuckDB-oracle-checkable (the oracle unrolls
  * the same loop in SQL over the same capped dict).
  */
object Bpe {

  /** Vocabulary cap for training, mirrored in the SQL oracle. */
  val VocabCap = 100000

  /** Trained state per (dir, numMerges): (merges, encoded dict rows
    * (word, n_sym)). */
  private val cache = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[(Int, String, String)], Seq[(String, Int)])]

  private def merged(pair: String): String = pair.replace(" _", "")

  private[graft] def train(spark: SparkSession, dir: String,
                           numMerges: Int): (Seq[(Int, String, String)], Seq[(String, Int)]) =
    cache.getOrElseUpdate(
      s"${graft.GraftSession.sessionKey(spark, dir)}/$numMerges", {
      // distributed: count words, keep the top-VocabCap vocabulary
      val wordFreq: Array[(String, Long)] = Tables(spark, dir).documents
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("word").asc)
        .limit(VocabCap)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // driver: the merge loop on the counted dict
      val freqs = wordFreq.map(_._2)
      val syms = wordFreq.map { case (w, _) =>
        "_" + w.split("").mkString(" _")
      }
      val merges = Seq.newBuilder[(Int, String, String)]
      for (r <- 1 to numMerges) {
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        var wi = 0
        while (wi < syms.length) {
          val parts = syms(wi).split(" ")
          var i = 0
          while (i < parts.length - 1) {
            val p = parts(i) + " " + parts(i + 1)
            counts.update(p, counts.getOrElse(p, 0L) + freqs(wi))
            i += 1
          }
          wi += 1
        }
        if (counts.nonEmpty) {
          // top pair: count DESC, pair ASC — same tie-break as the oracle
          val best = counts.reduce { (a, b) =>
            if (a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)) a else b
          }._1
          merges += ((r, best, merged(best)))
          val m = merged(best)
          wi = 0
          while (wi < syms.length) {
            syms(wi) = syms(wi).replace(best, m)
            wi += 1
          }
        }
      }
      val dict = wordFreq.indices
        .map(i => (wordFreq(i)._1, syms(i).split(" ").length))
      (merges.result(), dict)
    })

  /** The learned merge table: (rank, pair, merged) in training order. */
  def bpeMerges(spark: SparkSession, dir: String,
                numMerges: Int = 16): DataFrame = {
    import spark.implicits._
    train(spark, dir, numMerges)._1.toDF("rank", "pair", "merged")
      .orderBy("rank")
  }

  /** Tokenizer-grade token counts: per document, the number of BPE
    * symbols after applying the trained merge table. One corpus scan:
    * explode + broadcast dict join + sum. */
  def bpeTokenCounts(spark: SparkSession, dir: String,
                     numMerges: Int = 16): DataFrame = {
    import spark.implicits._
    val dict = train(spark, dir, numMerges)._2.toDF("word", "n_sym")
    Tables(spark, dir).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(dict), "word")
      .groupBy("doc_id")
      .agg(sum("n_sym").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }
}
