package graft.text

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, the GPT-2-style
  * rank-greedy variant): train merge rules on a word-frequency
  * dictionary, encode a word by repeatedly applying the LOWEST-ranked
  * applicable merge. Pure JVM logic — the distributed halves (corpus
  * word counts in, broadcast encode map out) live in
  * [[graft.operators.BpeTokenizer]].
  *
  * Conventions: words are whitespace tokens (already lower-cased by the
  * pipeline's `words()`), symbolized as characters plus a final
  * [[Eow]] marker so merges can learn word endings. A literal token
  * equal to the marker string would collide — impossible for
  * whitespace-split tokens containing no `<`/`>` pairs like this
  * corpus's, and detectable by callers that care.
  *
  * Determinism: pair selection breaks count ties lexicographically on
  * (left, right); merging scans left-to-right, so overlapping pairs
  * ("aaa" under (a,a)) merge greedily from the left. Training and
  * [[encode]] share [[mergePair]], and applying merges in rank order
  * reproduces the trainer's final segmentation exactly (pinned in the
  * suite).
  */
object Bpe {

  type Merge = (String, String)

  /** End-of-word symbol, part of the alphabet from the start. */
  val Eow = "</w>"

  def symbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Eow

  /** One left-to-right pass merging every (non-overlapping) occurrence
    * of `p`.
    */
  def mergePair(syms: Vector[String], p: Merge): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Learn up to `numMerges` merge rules from a word-frequency dict
    * (stops early when no pair repeats). O(numMerges × Σ|word|) — the
    * dict is the VOCABULARY with counts, never the corpus.
    */
  def train(wordCounts: Iterable[(String, Long)],
      numMerges: Int): Vector[Merge] = {
    var seqs: Vector[(Vector[String], Long)] = wordCounts.iterator
      .map { case (w, c) => symbols(w) -> c }.toVector
    val merges = Vector.newBuilder[Merge]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[Merge, Long]
      for ((syms, c) <- seqs) {
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          j += 1
        }
      }
      // a pair occurring once can still merge, but learns nothing that
      // generalizes; the classic trainer stops when no pair repeats
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        seqs = seqs.map { case (syms, c) => mergePair(syms, best) -> c }
        i += 1
      }
    }
    merges.result()
  }

  /** Rank-greedy encoding: repeatedly merge the lowest-ranked adjacent
    * pair present until none applies.
    */
  def encode(word: String, ranks: Map[Merge, Int]): Vector[String] = {
    var syms = symbols(word)
    var go = true
    while (go && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: Merge = null
      var j = 0
      while (j < syms.length - 1) {
        val k = (syms(j), syms(j + 1))
        val r = ranks.getOrElse(k, Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = k }
        j += 1
      }
      if (best == null) go = false
      else syms = mergePair(syms, best)
    }
    syms
  }
}
