package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Entity resolution (fuzzy record linkage) — the blocking → bounded
  * pairwise-verify → transitive-cluster pipeline of the record-linkage
  * literature (Fellegi–Sunter framing; blocking surveys by Christen):
  * find records that name the SAME real-world entity despite textual
  * drift, without ever comparing all pairs.
  *
  * Not in the reference (SURVEY.md §2.4 extended surface); ER is the
  * standard pre-join cleanup any warehouse runs over vendor/product
  * catalogs, here gated over `part` names.
  *
  * Scale design:
  *   - BLOCKING: candidates are generated only within a block (the
  *     name's head noun), never corpus×corpus. Block sizes are bounded
  *     by the same count-first/df-cap discipline as the ngram posting
  *     lists ([[Dedup]] MaxDf): a block over [[ErMaxBlock]] records is
  *     dropped (a stop-noun; its members stay as singletons), so pair
  *     fan-out is ≤ ErMaxBlock² per block BY CONSTRUCTION and the
  *     count censusing it partial-aggregates map-side.
  *   - VERIFY: `levenshtein` ≤ [[ErMaxDist]] on the normalized name —
  *     a codegen'd built-in, evaluated only on within-block pairs.
  *   - CLUSTER: min-label propagation over the verified match edges
  *     (the shared [[Dedup.propagateMin]] kernel); entity id = min
  *     part key of the component, sizes via the skew-safe
  *     aggregate+join-back idiom.
  * The blocking-recall eval quantifies what the block key loses,
  * the [[Dedup.dedupRecallEval]]/[[Similarity.simRecallEval]]
  * discipline: measure the trade, don't hide it.
  *
  * Determinism: levenshtein is exact integer edit distance; blocks,
  * caps and thresholds are integer comparisons; entity ids are min()
  * fixpoints — unique regardless of partitioning or round count.
  */
object EntityResolution {

  /** Drop blocks larger than this (stop-noun analog of Dedup.MaxDf):
    * bounds per-block pair fan-out at any corpus size. */
  private val ErMaxBlock = 4096
  /** Max edit distance for a verified match. */
  private val ErMaxDist = 2
  /** Deterministic key-sample modulus for the blocking-recall eval. */
  private val ErSampleMod = 7

  /** (k, name, blk) — normalized name + blocking key for any
    * part-shaped frame. */
  private def names(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey").as("k"),
      lower(col("p_name")).as("name"),
      element_at(split(lower(col("p_name")), " "), 2).as("blk"))

  private val namesSql: String =
    """names AS (
      |  SELECT p_partkey AS k, lower(p_name) AS name,
      |         split_part(lower(p_name), ' ', 2) AS blk
      |  FROM part)""".stripMargin

  /** Verified within-block match pairs. Count-first block cap, then
    * the self-join generates ≤ cap² candidates per block; levenshtein
    * verifies each once (key_a < key_b). */
  def erPairs(s: SparkSession, dir: String): DataFrame = {
    val n = names(s, dir)
    val keep = n.groupBy(col("blk")).agg(count(lit(1)).as("df"))
      .where(col("df") <= ErMaxBlock).select(col("blk"))
    val kept = n.join(keep, Seq("blk"), "left_semi")
    kept.as("a").join(kept.as("b"),
        col("a.blk") === col("b.blk") && col("a.k") < col("b.k"))
      .select(col("a.k").as("key_a"), col("b.k").as("key_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name")).cast("int").as("dist"))
      .where(col("dist") <= ErMaxDist)
  }

  /** The pairs CTE chain (names/keep/kept/pairs), shared textually by
    * the pairs, entities, and recall oracles. */
  private val pairsCtesSql: String =
    s"""$namesSql,
       |keep AS (SELECT blk FROM names GROUP BY blk HAVING COUNT(1) <= $ErMaxBlock),
       |kept AS (SELECT names.* FROM names JOIN keep ON names.blk = keep.blk),
       |pairs AS (
       |  SELECT a.k AS key_a, b.k AS key_b, a.name AS name_a, b.name AS name_b,
       |         CAST(levenshtein(a.name, b.name) AS INT) AS dist
       |  FROM kept a JOIN kept b ON a.blk = b.blk AND a.k < b.k
       |  WHERE levenshtein(a.name, b.name) <= $ErMaxDist)""".stripMargin

  val erPairsSql: String =
    s"""WITH $pairsCtesSql
       |SELECT key_a, key_b, name_a, name_b, dist FROM pairs""".stripMargin

  /** Transitive entity clusters over the verified pairs: every part
    * keyed to the min part key of its match component; singletons keep
    * themselves. Sizes via aggregate + join-back (no window over
    * entity_id — a mega-entity would serialize into one window task). */
  def erEntities(s: SparkSession, dir: String): DataFrame = {
    val n = names(s, dir)
    val sym = Dedup.symmetrize(
        erPairs(s, dir).select(col("key_a").as("da"), col("key_b").as("db")))
      .repartition(col("src")).persist()
    val labels = Dedup.propagateMin(s,
      n.select(col("k").as("doc_id"), col("k").as("label")),
      sym, "erEntities")
    sym.unpersist()
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("entity_size"))
    labels.join(sizes, "label")
      .select(col("doc_id").as("p_partkey"), col("label").as("entity_id"),
        col("entity_size"),
        (col("doc_id") === col("label")).cast("int").as("is_canonical"))
  }

  val erEntitiesSql: String =
    s"""WITH RECURSIVE $pairsCtesSql,
       |e AS MATERIALIZED (SELECT key_a AS da, key_b AS db FROM pairs),
       |sym AS MATERIALIZED (SELECT da AS src, db AS dst FROM e
       |        UNION ALL SELECT db, da FROM e),
       |reach(src, dst) AS (
       |  SELECT k, k FROM names
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst),
       |lab AS MATERIALIZED (
       |  SELECT src AS p_partkey, MIN(dst) AS entity_id FROM reach GROUP BY src),
       |sizes AS (SELECT entity_id, COUNT(1) AS entity_size FROM lab GROUP BY entity_id)
       |SELECT l.p_partkey, l.entity_id, s.entity_size,
       |       CAST(l.p_partkey = l.entity_id AS INT) AS is_canonical
       |FROM lab l JOIN sizes s ON l.entity_id = s.entity_id""".stripMargin

  /** Blocking-recall eval: over a deterministic key sample, compare the
    * blocked pipeline's matches against EXHAUSTIVE pairwise truth
    * (every sample pair, no blocking). The exhaustive side is the eval
    * harness, not the production path — it is quadratic ON THE SAMPLE
    * ONLY (sample² pairs, broadcastable), the sampled-truth discipline
    * of [[Dedup.dedupRecallEval]]. One output row: truth size, found
    * size, recall. */
  def erBlockRecall(s: SparkSession, dir: String): DataFrame = {
    val sample = names(s, dir).where(col("k") % ErSampleMod === 0)
    val truth = sample.as("a").join(broadcast(sample.as("b")),
        col("a.k") < col("b.k") &&
          levenshtein(col("a.name"), col("b.name")) <= ErMaxDist)
      .select(col("a.k").as("key_a"), col("b.k").as("key_b"))
    val found = erPairs(s, dir)
      .where(col("key_a") % ErSampleMod === 0 && col("key_b") % ErSampleMod === 0)
      .select(col("key_a"), col("key_b"))
    val joined = truth.join(found, Seq("key_a", "key_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth")).crossJoin(
        joined.agg(count(lit(1)).as("n_found")))
      .select(col("n_truth"), col("n_found"),
        when(col("n_truth") === 0, lit(1.0))
          .otherwise(col("n_found").cast("double") / col("n_truth").cast("double"))
          .as("recall"))
  }

  val erBlockRecallSql: String =
    s"""WITH $pairsCtesSql,
       |sample AS (SELECT * FROM names WHERE k % $ErSampleMod = 0),
       |truth AS (
       |  SELECT a.k AS key_a, b.k AS key_b
       |  FROM sample a JOIN sample b ON a.k < b.k
       |  WHERE levenshtein(a.name, b.name) <= $ErMaxDist),
       |found AS (
       |  SELECT key_a, key_b FROM pairs
       |  WHERE key_a % $ErSampleMod = 0 AND key_b % $ErSampleMod = 0),
       |hit AS (SELECT t.* FROM truth t
       |        WHERE EXISTS (SELECT 1 FROM found f
       |                      WHERE f.key_a = t.key_a AND f.key_b = t.key_b))
       |SELECT (SELECT CAST(COUNT(1) AS BIGINT) FROM truth) AS n_truth,
       |       (SELECT CAST(COUNT(1) AS BIGINT) FROM hit) AS n_found,
       |       CASE WHEN (SELECT COUNT(1) FROM truth) = 0 THEN 1.0
       |            ELSE CAST((SELECT COUNT(1) FROM hit) AS DOUBLE)
       |                 / CAST((SELECT COUNT(1) FROM truth) AS DOUBLE) END AS recall""".stripMargin
}
