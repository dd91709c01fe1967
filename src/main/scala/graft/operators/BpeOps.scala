package graft.operators

import graft.Tables
import graft.functions.TextFns
import graft.functions.Exact.lcount
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** D39: BPE tokenizer induction + application — the step that turns a
  * curated corpus into a trained tokenizer and token counts that mean
  * something to a trainer (whitespace counts, D5, are a proxy; the
  * packing/budget math of a real pipeline runs on BPE pieces).
  *
  * Shape of the computation (the classic fast-BPE factoring):
  *   1. ONE corpus-sized pass: the word histogram (groupBy token —
  *      partial-agg shuffle, output is vocab-sized).
  *   2. The merge loop runs over the top-V histogram ONLY — a bounded
  *      model artifact (like the IVF quantizer or PQ codebooks), never
  *      the corpus. V caps driver memory; mass coverage of a Zipfian
  *      vocabulary makes top-V the standard trainer input.
  *   3. Application is per-DISTINCT-word (vocab-sized, not
  *      corpus-sized), then a count-weighted join back onto per-doc
  *      word counts.
  *
  * Merge semantics — pinned identically across all three engines that
  * compute them (driver Scala, Spark SQL, DuckDB oracle): a word's
  * symbol state is the string "||s1||s2||…||" and applying merge
  * (l, r) is literal leftmost non-overlapping
  * `replace("|l||r|" → "|lr|")`. The doubled separator is what makes
  * plain `replace` correct: each boundary owns two bars, a match
  * consumes one from each side, so consecutive disjoint pairs
  * ([a,b,a,b] → [ab,ab]) both merge while overlaps ([a,a,a] → [aa,a])
  * stay leftmost-greedy. Java's `String.replace`, Spark's `replace`
  * and DuckDB's `replace` all scan leftmost-non-overlapping, so the
  * three paths cannot disagree.
  */
object BpeOps {
  /** Merges to learn (rank 1..M). */
  val Merges = 12
  /** Histogram cap — the driver-side model artifact bound. */
  val VocabCap = 1000

  final case class MergeRow(merge_rank: Long, lhs: String, rhs: String,
    merged: String, pair_cnt: Long)

  private[graft] def symState(w: String): String =
    "||" + w.map(_.toString).mkString("||") + "||"

  private[graft] def symbols(st: String): Array[String] =
    st.split("\\|\\|").filter(_.nonEmpty)

  /** The trained merge table — driver loop over the collected top-V
    * histogram, memoized per (session, dir) like the other model
    * artifacts (IVF centroids, PQ codebooks).
    */
  def trainedMerges(spark: SparkSession, dir: String): Seq[MergeRow] =
    graft.Memo.value(spark, s"bpeMerges:$dir") {
      val hist = Tables.documents(spark, dir)
        .select(explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(lcount.as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc)
        .limit(VocabCap)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      var state: Array[(String, Long)] = hist.map { case (w, c) => (symState(w), c) }
      val out = Seq.newBuilder[MergeRow]
      var k = 1
      var exhausted = false
      while (k <= Merges && !exhausted) {
        val pc = collection.mutable.HashMap.empty[(String, String), Long]
        state.foreach { case (st, cnt) =>
          val sy = symbols(st)
          var i = 0
          while (i < sy.length - 1) {
            val key = (sy(i), sy(i + 1))
            pc.update(key, pc.getOrElse(key, 0L) + cnt)
            i += 1
          }
        }
        if (pc.isEmpty) exhausted = true
        else {
          val ((l, r), n) = pc.reduce { (a, b) =>
            if (a._2 > b._2) a
            else if (a._2 < b._2) b
            else if (a._1._1 < b._1._1) a
            else if (a._1._1 > b._1._1) b
            else if (a._1._2 <= b._1._2) a else b
          }
          out += MergeRow(k.toLong, l, r, l + r, n)
          state = state.map { case (st, cnt) =>
            (st.replace(s"|$l||$r|", s"|$l$r|"), cnt)
          }
          k += 1
        }
      }
      out.result()
    }

  /** D39: bpe_train — the merge table as a query result: one row per
    * learned merge (rank, pair, merged symbol, the pair's
    * count-weighted frequency at selection time). This IS the
    * tokenizer model a serving stack ships.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, dir).toDF()
      .select(col("merge_rank"), col("lhs"), col("rhs"), col("merged"),
        col("pair_cnt"))
      .orderBy("merge_rank")
  }

  /** BPE piece count of the `tok` column under a trained merge chain —
    * char-split symbol state "||c1||c2||…||" (expr form: the
    * Column-DSL substring cannot take the lambda index), then the
    * merges folded as chained SQL `replace` calls (literal, leftmost,
    * non-overlapping — same semantics as the driver loop and the
    * oracle), all codegen string ops. Works for ANY word, including
    * ones outside the training vocabulary (OOV words just take
    * whatever merges apply to their character sequence).
    */
  private[graft] def pieceCount(merges: Seq[MergeRow]): org.apache.spark.sql.Column = {
    val stInit = expr(
      "concat('||', concat_ws('||', transform(sequence(1, length(tok)), " +
        "i -> substring(tok, i, 1))), '||')")
    val applied = merges.foldLeft(stInit) { (st, m) =>
      call_function("replace", st, lit(s"|${m.lhs}||${m.rhs}|"),
        lit(s"|${m.merged}|"))
    }
    size(filter(split(applied, "\\|\\|"), x => x =!= lit("")))
      .cast(LongType)
  }

  /** Driver-side twin of [[pieceCount]] (same String.replace fold) —
    * segmentation of one word under the merge chain.
    */
  private[graft] def segment(word: String, merges: Seq[MergeRow]): Seq[String] = {
    val st = merges.foldLeft(symState(word)) { (s, m) =>
      s.replace(s"|${m.lhs}||${m.rhs}|", s"|${m.merged}|")
    }
    symbols(st).toSeq
  }

  /** D39b: text_tokenize_bpe — apply the trained merges to the corpus
    * and report real piece counts per document. The merge chain runs
    * per DISTINCT word (vocab-sized domain) as M chained codegen
    * `replace` calls — no UDF, no driver loop over data — and the
    * result joins back onto per-doc word counts; the corpus itself is
    * touched exactly once (the word-count shuffle).
    */
  def tokenizeBpe(spark: SparkSession, dir: String): DataFrame =
    tokenizeWith(spark, dir, trainedMerges(spark, dir))

  /** [[tokenizeBpe]] against an explicit merge chain — the serving
    * face: a restarted session collects the persisted merge table
    * (a bounded model artifact, like the IVF quantizer) and applies
    * it without retraining.
    */
  def tokenizeWith(spark: SparkSession, dir: String,
      merges: Seq[MergeRow]): DataFrame = {
    val wordCounts = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(lcount.as("n"))
    val pieces = wordCounts.select(col("tok")).distinct()
      .withColumn("n_pieces", pieceCount(merges))
      .select(col("tok"), col("n_pieces"))
    wordCounts.join(broadcast(pieces), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast(LongType).as("n_words"),
        sum(col("n") * col("n_pieces")).cast(LongType).as("n_pieces"))
      .withColumn("pieces_per_word",
        col("n_pieces").cast(DoubleType) / col("n_words").cast(DoubleType))
      .orderBy("doc_id")
  }

  /** D19b: doc_pack_bpe — token-budget packing (the D19 shape: hash
    * buckets inside each language, running-sum window, budget bins)
    * driven by REAL BPE piece counts instead of the regex proxy. This
    * is the batch-construction math a trainer actually runs: bins of
    * ~BinPieces model tokens, not of approximate word counts. Same
    * scale shape as D19 — the window spreads over |langs|×buckets
    * partitions, bins never cross a shuffle boundary — plus the
    * tokenizer join (vocab-sized broadcast).
    */
  def packBpe(spark: SparkSession, dir: String,
      binPieces: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pieceCounts = tokenizeBpe(spark, dir)
      .select(col("doc_id"), col("n_pieces"))
    val w = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
      .join(pieceCounts, Seq("doc_id"))
      .withColumn("bucket", (col("doc_id") % 8).cast(LongType))
      .withColumn("cum_pieces", sum(col("n_pieces")).over(w).cast(LongType))
      .withColumn("bin_id",
        expr(s"(cum_pieces - 1) DIV $binPieces").cast(LongType))
      .orderBy("doc_id")
  }

  /** D45: tokenizer coverage report — per language: word/piece
    * volumes, pieces-per-word, and the share of word OCCURRENCES the
    * trained vocab covers as a single piece (the fragmentation signal
    * that tells a tokenizer team which languages the merge budget is
    * short-changing). Same scale shape as tokenizeBpe: merges apply
    * once per DISTINCT word (broadcast piece table), the corpus pays
    * one (lang, word) aggregation; all ratios are exact long-count
    * divisions.
    */
  def coverageBpe(spark: SparkSession, dir: String): DataFrame = {
    val merges = trainedMerges(spark, dir)
    val wc = Tables.documents(spark, dir)
      .select(col("lang"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").agg(lcount.as("n"))
    val pieces = wc.select(col("tok")).distinct()
      .withColumn("n_pieces", pieceCount(merges))
      .select(col("tok"), col("n_pieces"))
    wc.join(broadcast(pieces), Seq("tok"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).cast(LongType).as("n_words"),
        sum(col("n") * col("n_pieces")).cast(LongType).as("n_pieces"),
        sum(when(col("n_pieces") === 1, col("n")).otherwise(lit(0L)))
          .cast(LongType).as("n_single"))
      .withColumn("pieces_per_word",
        col("n_pieces").cast(DoubleType) / col("n_words").cast(DoubleType))
      .withColumn("single_piece_share",
        col("n_single").cast(DoubleType) / col("n_words").cast(DoubleType))
      .orderBy("lang")
  }
}
