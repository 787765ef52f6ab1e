package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Exact edit-distance (Levenshtein) joins — fuzzy record linkage, the
 * training-data-cleaning companion to [[Dedup]]'s set-similarity family:
 * near-identical titles/urls/names that token-level Jaccard misses because
 * the difference is a typo inside a token, not a missing token.
 *
 * The reference connector has no string operators at all (SURVEY §2.6 —
 * its only expression-level code is the sink-side cast projection,
 * EventHubsWriteTask.scala:210-218); this family is part of the analytics
 * layer layered on top.
 *
 * EXACT and COMPLETE, never all-pairs: candidates come from the
 * pigeonhole segment scheme (the PassJoin partitioning technique —
 * public literature, Li/Deng/Feng VLDB'11). Split every indexed string
 * into `k+1` contiguous segments; if `ed(a, b) <= k` then some segment of
 * `a` survives the optimal alignment edit-free, so it occurs in `b`
 * VERBATIM, at a position shifted by at most `k`. Candidate generation is
 * therefore a pure EQUI-join:
 *
 *  - index side: `k+1` rows per string — (own length, segment index,
 *    segment text);
 *  - probe side: for each hypothesized index length `la` within `±k` of
 *    its own, each segment slot, and each in-window start position, the
 *    probe's substring of the segment's exact length — at most
 *    `(2k+1)^2 (k+1)` bounded rows per string (75 at k=2), each a few
 *    bytes;
 *  - join on (length, slot, text) → distinct id pairs → one banded
 *    `levenshtein(a, b, k)` verify per candidate (codegen'd built-in,
 *    O(k·min(|a|,|b|)) via the threshold argument — never the full DP
 *    matrix on non-matches).
 *
 * 100 TB shape: both exploded sides shuffle on discriminative content
 * keys; no inequality join, no cartesian, no driver state. The one hot
 * spot is TEMPLATED text — a corpus where millions of strings share an
 * identical segment at the same slot (a boilerplate prefix) puts them in
 * one bucket and the candidate set goes quadratic there. That is partly
 * inherent (if the strings really are within distance k of each other the
 * OUTPUT is quadratic), and where it is not, the standard cure is
 * upstream: exact-dedup first ([[Dedup.exact]]) and key on the
 * discriminative field, not the boilerplate. AQE's skew-join split keeps
 * the shuffle itself balanced either way.
 *
 * Strings shorter than `k+1` cannot be cut into `k+1` non-empty segments;
 * those index rows (and their possible partners, all of length `< 2k+1`)
 * take a separate banded length-bucket equi-join — bounded work unless
 * the corpus is degenerate (millions of sub-5-char keys at k=2, where no
 * edit-distance blocking can discriminate).
 *
 * Null ids or keys never match (dropped up front, SQL comparison
 * semantics). Distances are true Levenshtein distances (unit
 * insert/delete/substitute), matching DuckDB/Postgres `levenshtein`.
 */
object Fuzzy {

  /** All pairs (id_l, id_r, dist) with `levenshtein(leftKey, rightKey)
    * <= maxDist` between two tables — fuzzy record linkage. Output
    * columns: `id_l`, `id_r`, `dist`. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftKey: String,
      rightId: String, rightKey: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val l = left.select(col(leftId).as("__lid"), col(leftKey).as("__lkey"))
      .filter(col("__lid").isNotNull && col("__lkey").isNotNull)
    val r = right.select(col(rightId).as("__rid"), col(rightKey).as("__rkey"))
      .filter(col("__rid").isNotNull && col("__rkey").isNotNull)
    verify(candidates(l, r, maxDist), l, r, maxDist)
      .select(col("__lid").as("id_l"), col("__rid").as("id_r"), col("dist"))
  }

  /** All unordered pairs (id_a, id_b, dist) with
    * `levenshtein(key_a, key_b) <= maxDist` WITHIN one table — fuzzy
    * near-duplicate discovery (id_a < id_b, self-pairs excluded). */
  def fuzzyPairs(df: DataFrame, idCol: String, keyCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val d = df.select(col(idCol).as("__lid"), col(keyCol).as("__lkey"))
      .filter(col("__lid").isNotNull && col("__lkey").isNotNull)
    val asProbe = d.select(col("__lid").as("__rid"), col("__lkey").as("__rkey"))
    // the pigeonhole guarantees the (index=a, probe=b) orientation finds
    // every true pair, so one self candidate pass suffices; normalize the
    // orientation before the distinct so each pair verifies once
    val cand = candidates(d, asProbe, maxDist)
      .filter(col("__lid") =!= col("__rid"))
      .select(least(col("__lid"), col("__rid")).as("__lid"),
        greatest(col("__lid"), col("__rid")).as("__rid"))
      .distinct()
    verify(cand, d, asProbe, maxDist)
      .select(col("__lid").as("id_a"), col("__rid").as("id_b"), col("dist"))
  }

  /** Distinct candidate id pairs (__lid, __rid) from the segment
    * equi-join plus the short-string band join. Complete for
    * `ed <= maxDist`; a superset otherwise (verification prunes). */
  private def candidates(l: DataFrame, r: DataFrame, k: Int): DataFrame = {
    val m = k + 1 // segments per indexed string
    // --- segmented path: indexed strings of length >= m ---
    // segment i of a length-la string: the last (la % m) segments are one
    // longer, starts are cumulative
    def segLen(la: Column, i: Column): Column =
      floor(la / lit(m)).cast("long") +
        when(i >= lit(m.toLong) - la % lit(m), 1L).otherwise(0L)
    def segStart(la: Column, i: Column): Column =
      i * floor(la / lit(m)).cast("long") +
        greatest(i - (lit(m.toLong) - la % lit(m)), lit(0L))

    val idx = l
      .withColumn("__la", length(col("__lkey")).cast("long"))
      .filter(col("__la") >= m)
      .select(col("__lid"), explode(transform(sequence(lit(0L), lit(k.toLong)),
        i => struct(
          col("__la").as("cand_len"), i.as("seg_i"),
          col("__lkey").substr(
            (segStart(col("__la"), i) + 1L).cast("int"),
            segLen(col("__la"), i).cast("int")).as("seg")))).as("__s"))
      .select(col("__lid"), col("__s.cand_len"), col("__s.seg_i"), col("__s.seg"))

    // probe: for each plausible index length la in [lb-k, lb+k] (>= m),
    // each slot i, each start within +-k of the slot's position, the
    // probe's substring of that slot's exact length
    val prb = r
      .withColumn("__lb", length(col("__rkey")).cast("long"))
      .select(col("__rid"), explode(flatten(flatten(transform(
        filter(sequence(col("__lb") - k, col("__lb") + k), la => la >= m),
        la => transform(sequence(lit(0L), lit(k.toLong)), i => {
          val len = segLen(la, i)
          val st = segStart(la, i)
          transform(
            filter(sequence(st - k, st + k),
              p => p >= 0L && p <= col("__lb") - len),
            p => struct(la.as("cand_len"), i.as("seg_i"),
              col("__rkey").substr((p + 1L).cast("int"), len.cast("int"))
                .as("seg")))
        }))))).as("__s"))
      .select(col("__rid"), col("__s.cand_len"), col("__s.seg_i"), col("__s.seg"))

    val segCand = idx.join(prb, Seq("cand_len", "seg_i", "seg"))
      .select(col("__lid"), col("__rid"))

    // --- short path: indexed strings of length < m can't be segmented;
    // their possible partners all have length <= (m-1)+k < 2k+1. Banded
    // length-bucket equi-join (rangeJoinMicros' binning), no cartesian.
    val shortIdx = l
      .withColumn("__la", length(col("__lkey")).cast("long"))
      .filter(col("__la") < m)
      .select(col("__lid"), floor(col("__la") / lit(m)).as("__bkt"))
    val shortPrb = r
      .withColumn("__lb", length(col("__rkey")).cast("long"))
      .filter(col("__lb") < 2 * k + 1)
      .select(col("__rid"), explode(array(Seq(-1, 0, 1).map(d =>
        floor(col("__lb") / lit(m)) + d): _*)).as("__bkt"))
    val shortCand = shortIdx.join(shortPrb, "__bkt")
      .select(col("__lid"), col("__rid"))

    segCand.unionAll(shortCand).distinct()
  }

  /** Attach both keys to each candidate pair and keep those within
    * distance k — the banded built-in never fills the full DP matrix on
    * rejects. The surviving `dist` is the true distance. */
  private def verify(cand: DataFrame, l: DataFrame, r: DataFrame,
      k: Int): DataFrame =
    cand
      .join(l, "__lid")
      .join(r, "__rid")
      .withColumn("dist", levenshtein(col("__lkey"), col("__rkey"), k))
      .filter(col("dist") >= 0 && col("dist") <= k)
}
