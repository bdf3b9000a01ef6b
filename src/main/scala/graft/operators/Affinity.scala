package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Market-basket / graph-affinity analytics (SURVEY.md §2.B extension):
  * co-occurrence mining over order baskets and triangle counting over
  * the resulting affinity graph — the recommendation-adjacent family a
  * retail warehouse serves next to the star schema.
  *
  * Scale notes (100 TB):
  *  - co-occurrence explodes each basket into k·(k−1)/2 pairs — cost is
  *    Σ k², governed by the BASKET size distribution, not the corpus:
  *    retail baskets are bounded (k ≤ ~100), so the explosion is a
  *    constant factor on the scan. A pathological basket (B2B bulk
  *    order with 10⁵ items) must be capped upstream — the same df-cap
  *    reasoning as hot shingles in [[Dedup.ngramJaccardOn]].
  *  - pair aggregation shuffles on (a, b) — high cardinality, well
  *    dispersed, map-side combined.
  *  - triangles run on the SUPPORT-FILTERED edge set (affinity graphs
  *    are pruned before analytics everywhere in practice); with edges
  *    ordered a < b < c, each triangle is found exactly once by two
  *    equi-joins — never an all-pairs product. Join order puts the
  *    (b, c) probe against the smaller filtered edge list.
  */
object Affinity {

  /** Co-occurrence pairs over (basket, item) rows: items appearing in
    * ≥ `minSupport` common baskets, with the pair count. Output:
    * (a_item, b_item, n_baskets), a_item < b_item.
    *
    * Shape: baskets are assembled ONCE (collect_set keyed on the basket
    * id — one shuffle) and pairs explode scan-side from the sorted item
    * array; a posting-list self-join would instead shuffle the item
    * rows twice more for the equi-join. Two shuffles total regardless
    * of corpus size.
    */
  def copurchaseOn(basketItems: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame =
    basketItems.select(col(basketCol).as("bk"), col(itemCol).as("item"))
      .groupBy(col("bk")).agg(sort_array(collect_set(col("item"))).as("items"))
      .filter(size(col("items")) >= 2)
      .select(explode(expr(
        "flatten(transform(sequence(1, size(items) - 1), i -> " +
          "transform(sequence(i + 1, size(items)), j -> " +
          "struct(element_at(items, i) AS a_item, element_at(items, j) AS b_item))))")).as("p"))
      .select(col("p.a_item").as("a_item"), col("p.b_item").as("b_item"))
      .groupBy(col("a_item"), col("b_item"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)

  /** q42_copurchase testdata binding: parts co-ordered in ≥ 2 orders. */
  def copurchase(spark: SparkSession, sfDir: String): DataFrame =
    copurchaseOn(Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey", 2L)
      .orderBy(col("a_item"), col("b_item"))

  def copurchaseSql: String =
    """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item FROM lineitem),
      |p AS (SELECT a.item AS a_item, b.item AS b_item, count(*) AS n_baskets
      |      FROM it a JOIN it b ON a.bk = b.bk AND a.item < b.item
      |      GROUP BY 1, 2)
      |SELECT a_item, b_item, n_baskets FROM p WHERE n_baskets >= 2
      |ORDER BY a_item, b_item""".stripMargin

  /** Triangle listing over an undirected edge set (a < b rows): every
    * triple whose three edges all exist, found once via two equi-joins
    * under the a < b < c ordering. Output: (a, b, c) vertex triples.
    */
  def trianglesOn(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a_item").as("u"), col("b_item").as("v"))
    e.select(col("u").as("a"), col("v").as("b"))
      .join(e.select(col("u").as("b"), col("v").as("c")), Seq("b"))
      .join(e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"), "left_semi")
      .select(col("a"), col("b"), col("c"))
  }

  /** q43_triangles testdata binding: triangles of the support-≥2
    * co-purchase graph (closed product triads — the clustering signal
    * of the affinity graph).
    */
  def triangles(spark: SparkSession, sfDir: String): DataFrame =
    trianglesOn(copurchase(spark, sfDir))
      .orderBy(col("a"), col("b"), col("c"))

  def trianglesSql: String =
    """WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item FROM lineitem),
      |p AS (SELECT a.item AS a_item, b.item AS b_item, count(*) AS n_baskets
      |      FROM it a JOIN it b ON a.bk = b.bk AND a.item < b.item
      |      GROUP BY 1, 2),
      |e AS (SELECT a_item AS u, b_item AS v FROM p WHERE n_baskets >= 2)
      |SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |FROM e e1 JOIN e e2 ON e1.v = e2.u
      |WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.u = e1.u AND e3.v = e2.v)
      |ORDER BY a, b, c""".stripMargin
}
