package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning, distributed the way
  * industrial subword trainers do it: the corpus collapses ONCE into
  * a word vocabulary `(word, freq)` — the only corpus-sized shuffle —
  * and every merge round then runs over that vocab, which is orders
  * of magnitude smaller (distinct lowercase words, not tokens). The
  * reference has no trainer; its token accounting stops at counts
  * (`q_token_count_bpe`), so this supplies the missing "learn the
  * merges" half of the tokenizer story a training pipeline needs.
  *
  * Semantics follow Sennrich et al. 2016 (arXiv:1508.07909): words
  * split to characters plus a `</w>` end marker; each round merges
  * the most frequent adjacent symbol pair (ties broken by pair,
  * ascending, so learning is deterministic); merge application is
  * greedy left-to-right within a word.
  *
  * Scale shape: pair counting is a narrow transform + one small
  * groupBy per round; the argmax is a `limit(1)` driver scalar (same
  * driver-scalar pattern as [[IncrementalAgg]]); each round ends in
  * an eager localCheckpoint so the iterative plan never grows — the
  * canonical iterative-algorithm guard, same as
  * [[Dedup.clusterPairs]].
  */
object Bpe {

  /** Lowercase letter-run words of a text column. */
  def words(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), w => length(w) > 0)

  /** Character symbols of a word plus the `</w>` end marker. */
  def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit("</w>")))

  /** Adjacent symbol pairs as `(a, b)` structs. */
  def adjacentPairs(syms: Column): Column =
    transform(sequence(lit(1), size(syms) - 1),
      i => struct(element_at(syms, i).as("a"),
        element_at(syms, i + 1).as("b")))

  /** One greedy left-to-right merge pass: every adjacent `(a, b)`
    * becomes the single symbol `a+b`. A fold, not a regex — symbols
    * are arbitrary strings after round one. Overlaps resolve
    * greedily: merging `(a,a)` turns `a a a` into `aa a`, because the
    * freshly-merged `aa` at the accumulator tail no longer equals
    * `a`.
    */
  def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Corpus → word vocabulary `(word, freq)`: the one corpus-sized
    * aggregation; everything after runs at vocab scale.
    */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    graft.functions.Functions.explodeOnce(
      docs.select(words(col(textCol)).as("__ws")),
      Seq.empty, col("__ws"), "word")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` BPE merges from a `(word, freq)` vocabulary.
    * Returns the merge table in learned order. Each round: count
    * weighted adjacent pairs, take the (count desc, pair asc) argmax
    * as one driver scalar, rewrite the vocab's symbol arrays, and
    * localCheckpoint to pin the lineage.
    */
  def learnMerges(vocabDf: DataFrame, numMerges: Int): Seq[(String, String)] = {
    var (cur, handle) = graft.InternalCaches.localCheckpointHandle(
      vocabDf.select(initialSymbols(col("word")).as("syms"),
        col("freq").cast("long").as("freq")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val top = graft.functions.Functions.explodeOnce(
        cur.filter(size(col("syms")) > 1),
        Seq(col("freq")), adjacentPairs(col("syms")), "p")
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val (next, nextHandle) = graft.InternalCaches.localCheckpointHandle(
          cur.withColumn("syms", mergeOnce(col("syms"), a, b)))
        graft.InternalCaches.release(handle)
        cur = next; handle = nextHandle
      }
      round += 1
    }
    graft.InternalCaches.release(handle)
    merges.toSeq
  }

  /** Encode a word with a learned merge table: split to chars +
    * `</w>`, then apply each merge greedily in learned order — the
    * standard training-time segmentation. A per-row pure function
    * over a small loop; the merge table is imperative state, so this
    * is the documented UDF exception (SURVEY.md §2.9 preference
    * order), mirrored bit-for-bit by [[mergeOnce]] in BpeSpec.
    */
  def encodeUdf(merges: Seq[(String, String)]):
      org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (word: String) =>
      if (word == null) null
      else {
        var syms = word.split("").toVector :+ "</w>"
        merges.foreach { case (a, b) =>
          // greedy fold, mirroring mergeOnce
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b) {
              acc.remove(acc.length - 1); acc += (a + b)
            } else acc += x
          }
          syms = acc.toVector
        }
        syms
      }
    }

  def defs: Map[String, QueryDef] = Map(
    // Round-one BPE statistics: the 20 most frequent adjacent symbol
    // pairs (chars + end marker) over the corpus vocabulary, weighted
    // by word frequency. The oracle replays tokenization, marker,
    // pair extraction, and the (count desc, pair asc) tie-break — the
    // exact argmax order learnMerges consumes.
    "q_bpe_pairs" -> QueryDef(
      (s, dir) => {
        val v = vocab(table(s, dir, "documents"), "text")
        graft.functions.Functions.explodeOnce(
          v.select(col("freq"), initialSymbols(col("word")).as("syms")),
          Seq(col("freq")), adjacentPairs(col("syms")), "p")
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("freq").as("n"))
          .orderBy(col("n").desc, col("a"), col("b"))
          .limit(20)
      },
      """WITH w AS (
        |  SELECT word, count(*) AS freq FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
        |    FROM documents)
        |  WHERE word <> '' GROUP BY 1
        |),
        |p AS (
        |  SELECT unnest(list_transform(range(1, length(word)),
        |           i -> substr(word, CAST(i AS INTEGER), 1))) AS a,
        |         unnest(list_transform(range(1, length(word)),
        |           i -> substr(word, CAST(i AS INTEGER)+1, 1))) AS b,
        |         freq
        |  FROM w
        |  UNION ALL
        |  SELECT substr(word, length(word), 1), '</w>', freq FROM w
        |)
        |SELECT a, b, CAST(sum(freq) AS BIGINT) AS n FROM p
        |GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 20""".stripMargin),

    // Segment the corpus vocabulary with a FIXED 8-merge table applied
    // in learned order (chained merges: t+h → th+e → the+</w>), all as
    // the declarative mergeOnce fold — no UDF in the declared path.
    // Runs at VOCAB scale by construction (distinct words, the one
    // corpus-sized shuffle is the vocab groupBy). The oracle replays
    // greedy left-to-right application as repeated FIRST-occurrence
    // space-delimited replaces (leftmost rescan ≡ the fold: a merge
    // can never create a new match to its left, since a+b equals
    // neither a nor b), so a drifted merge order, a missed chain, or
    // an overlap bug mismatches the encoded string.
    "q_bpe_encode" -> QueryDef(
      (s, dir) => {
        val merges = Seq("t" -> "h", "th" -> "e", "the" -> "</w>",
          "e" -> "</w>", "a" -> "t", "at" -> "a", "r" -> "o", "ro" -> "w")
        val enc = merges.foldLeft(initialSymbols(col("word"))) {
          case (c, (a, b)) => mergeOnce(c, a, b)
        }
        vocab(table(s, dir, "documents"), "text")
          .select(col("word"), enc.as("__e"))
          .select(col("word"), concat_ws(" ", col("__e")).as("encoded"),
            size(col("__e")).as("n_tokens"))
          .orderBy("word")
      },
      """WITH RECURSIVE w AS (
        |  SELECT DISTINCT word FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
        |    FROM documents) WHERE word <> ''),
        |enc AS (
        |  SELECT word, 1 AS mi,
        |    ' ' || array_to_string(regexp_split_to_array(word, ''), ' ')
        |      || ' </w> ' AS s
        |  FROM w
        |  UNION ALL
        |  SELECT word, CASE WHEN s = r THEN mi + 1 ELSE mi END, r
        |  FROM (
        |    SELECT word, mi, s,
        |      regexp_replace(s,
        |        CASE mi WHEN 1 THEN ' t h ' WHEN 2 THEN ' th e '
        |                WHEN 3 THEN ' the </w> ' WHEN 4 THEN ' e </w> '
        |                WHEN 5 THEN ' a t ' WHEN 6 THEN ' at a '
        |                WHEN 7 THEN ' r o ' WHEN 8 THEN ' ro w ' END,
        |        CASE mi WHEN 1 THEN ' th ' WHEN 2 THEN ' the '
        |                WHEN 3 THEN ' the</w> ' WHEN 4 THEN ' e</w> '
        |                WHEN 5 THEN ' at ' WHEN 6 THEN ' ata '
        |                WHEN 7 THEN ' ro ' WHEN 8 THEN ' row ' END) AS r
        |    FROM enc WHERE mi <= 8))
        |SELECT word, trim(s) AS encoded,
        |  CAST(len(regexp_split_to_array(trim(s), ' ')) AS INT) AS n_tokens
        |FROM enc WHERE mi = 9 ORDER BY word""".stripMargin)
  )
}
