package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution fuzzy matching — the warehouse-side companion of
  * the document dedup suite (customer/transaction dims carry free-text
  * names, and "same entity, slightly different spelling" is the classic
  * dim-dedup problem).
  *
  * Scale shape: candidate generation is a *blocked* equi-join — block =
  * (first character, length band) — so the edit-distance verify runs on
  * Σ per-block² pairs, never n². Blocking on a cheap deterministic key
  * is the same trick as [[Dedup]]'s LSH bands and
  * [[graft.sim.Similarity.blockedCosinePairs]]'s label key.
  */
object FuzzyMatch {

  /** Candidate pairs within the same (first-char, last-char, length-band)
    * block, verified by levenshtein ≤ maxDist. First char alone is a bad
    * block on ID-like corpora (shared prefixes collapse everything into
    * one block); the trailing character splits those. Matches that edit
    * the blocking characters themselves are missed — the documented
    * recall trade of single-key blocking; production ER adds a second
    * pass with a shifted key. */
  def blockedNamePairs(df: DataFrame, idCol: String, nameCol: String,
                       maxDist: Int = 2, lenBand: Int = 4): DataFrame = {
    val keyed = df.select(
      col(idCol).as("id"),
      lower(trim(col(nameCol))).as("name"))
      .withColumn("blk_c", substring(col("name"), 1, 1))
      .withColumn("blk_e", substring(col("name"), -1, 1))
      .withColumn("blk_l", (length(col("name")) / lenBand).cast("int"))
    val a = keyed.select(col("id").as("id_a"), col("name").as("name_a"),
      col("blk_c"), col("blk_e"), col("blk_l"))
    val b = keyed.select(col("id").as("id_b"), col("name").as("name_b"),
      col("blk_c"), col("blk_e"), col("blk_l"))
    a.join(b, Seq("blk_c", "blk_e", "blk_l")).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }

  /** LOSSLESS edit-distance self-join (ED-Join/q-gram prefix filtering)
    * — the exact companion to [[blockedNamePairs]]'s heuristic blocks,
    * the same relationship x81's prefix-filtered Jaccard join has to
    * the LSH path: recall 1.0 by theorem, pruning by gram rarity.
    *
    * One edit operation touches at most q of a string's q-grams, so
    * ed(a,b) ≤ d ⇒ the set difference G(a)∖G(b) has ≤ q·d grams —
    * among a's q·d+1 RAREST grams (global document frequency
    * ascending, ties by gram), at least one must also appear in b.
    * Candidates therefore come from joining each string's
    * (q·d+1)-gram rarity prefix against the OTHER side's full gram
    * set (the asymmetric prefix⋈full form — trivially lossless, and
    * the prefix side never contains the corpus-hot grams that would
    * square the join). A length filter (\|len(a)−len(b)\| ≤ d) prunes
    * before the levenshtein verify. The oracle states the NAIVE
    * all-pairs join, so the hash gate PROVES recall 1.0 on the data.
    *
    * The gram filter's precondition: the LOWER-id string must have
    * MORE than q·d distinct q-grams (length > q·d + q − 1), else a
    * single edit can destroy its every gram and a true pair yields no
    * candidate (recall < 1.0 — the round-9 advice finding). Strings at
    * or under that length therefore take a supplemental LENGTH-BLOCK
    * all-pairs path: their partners are length-bounded too (|len
    * diff| ≤ d ⇒ partner length ≤ q·d + q − 1 + d ≈ 2q chars at the
    * defaults), so the block is the corpus's sliver of near-empty
    * names — bounded in any real corpus, and still levenshtein-
    * verified. Losslessness then holds unconditionally.
    *
    * Scale shape: gram df is a vocabulary-sized map-combined
    * aggregate; the rarity-prefix window partitions per id (bounded by
    * name length); the candidate join keys on rare grams only — hot
    * grams ("cu", "er" on ID-like corpora) sit on the full side where
    * they meet only rare-prefix probes, never each other; the short
    * block self-joins ≤ 2q-char names only. */
  def prefixEditPairs(df: DataFrame, idCol: String, nameCol: String,
                      maxDist: Int = 1, q: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prefixLen = q * maxDist + 1
    // q-gram explode + the gram self-join are CPU-dense per input byte —
    // widen a narrower-than-cluster input (identity at production scan
    // widths; see ScanTuning), and materialize the shared gram/prefix
    // planes EAGERLY: each feeds both sides of the candidate join, and
    // lazily-shared plans are rebuilt by the concurrent broadcast
    // subtrees (the x81/minhashNearDups lesson — JobProbe showed the
    // 2.1 s gram-expansion stage computed twice).
    val names = graft.util.ScanTuning.ensureParallelism(df, col(idCol))
      .select(col(idCol).cast("long").as("id"),
        lower(trim(col(nameCol))).as("name"))
    // strings the gram theorem cannot protect, and their possible
    // partners (both length-bounded — this is a degenerate sliver)
    val shortMax = q * maxDist + q - 1
    val short = names.filter(length(col("name")) <= shortMax)
    val partners = names.filter(length(col("name")) <= shortMax + maxDist)
    val shortCand = short.as("sa")
      .join(partners.as("sb"), col("sa.id") < col("sb.id") &&
        abs(length(col("sa.name")) - length(col("sb.name"))) <= maxDist)
      .select(col("sa.id").as("id_a"), col("sb.id").as("id_b"))
    val grams = names
      .select(col("id"), explode(expr(
        s"""array_distinct(transform(
              sequence(1, greatest(length(name) - ${q - 1}, 1)),
              i -> substring(name, i, $q)))""")).as("g"))
      .localCheckpoint(true)
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("gdf"))
    val wg = Window.partitionBy("id").orderBy("gdf", "g")
    val prefix = grams.join(dfreq, Seq("g"))
      .withColumn("rn", row_number().over(wg))
      .filter(col("rn") <= prefixLen)
      .select("id", "g")
      .localCheckpoint(true)
    val cand = prefix.as("a")
      .join(grams.as("b"), col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .union(shortCand).distinct()
    val na = names.select(col("id").as("id_a"), col("name").as("name_a"))
    val nb = names.select(col("id").as("id_b"), col("name").as("name_b"))
    cand.join(na, Seq("id_a")).join(nb, Seq("id_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }
}
