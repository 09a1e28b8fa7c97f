package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Link-graph centrality — the crawl-frontier prioritization signal
  * of a web-scale corpus pipeline (rank domains/pages before spending
  * fetch or training budget on them; the role harmonic centrality
  * plays for Common Crawl's domain ranking).
  *
  * The documents table carries no link column, so the out-links are
  * synthesized deterministically from doc_id (three affine probes mod
  * the corpus size — the corpus size itself derived IN-QUERY as a
  * 1-row broadcast, no driver probe, per the CLAUDE.md convention).
  * The OPERATOR under test is the iterative rank propagation:
  * out-degree-normalized contributions summed per target, damped and
  * re-based each round — K fixed rounds of the classic PageRank
  * update (d = 0.85), entirely in INTEGER micro-units so both engines
  * compute bit-identical ranks: floor-division remainders and the
  * dropped dangling mass are deterministic, not drift.
  *
  * Scale shape per iteration: one equi-join (edges ⋈ ranks on src —
  * shuffle keyed on node id) and one groupBy(dst) partial-sum — the
  * same bounded shape as [[Dedup]]'s label propagation, ×K fixed
  * rounds. Edges stay id-only (3N rows); ranks are (id, long). The
  * final top-20 is TakeOrderedAndProject. At 100 TB the edge frame is
  * the real link table and the per-iteration staged write replaces
  * lineage growth; K stays a constant.
  */
object Graph {

  private val K     = 5        // fixed propagation rounds
  private val BASE  = 1000000L // initial rank, micro-units
  private val TOPK  = 20

  /** Exact floor division on non-negative longs, portable: the
    * numerator is reduced to a multiple of the divisor first, so the
    * double division is exact (numerators stay far below 2^53). */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** The synthesized (src, dst) link set over a node frame — three
    * affine out-links per node, kept only when the target id exists
    * (dangling-probe drop — deterministic in both engines). Shared by
    * [[pagerankOf]] and [[degreeDistribution]]. */
  private def edgesOf(nodes: DataFrame): DataFrame = {
    val m = nodes.agg(count(lit(1)).as("m"))
    nodes.crossJoin(broadcast(m))
      .select(col("id").as("src"),
        explode(array((1 to 3).map(k =>
          pmod(col("id") * 7 + k * 13, col("m"))): _*)).as("dst"))
      .join(nodes.select(col("id").as("dst")), Seq("dst"))
  }

  private[graft] def pagerankOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val nodes = docs.select(col("doc_id").as("id"))
      .repartition(spark.sparkContext.defaultParallelism)
    val edges = edgesOf(nodes)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesD = edges.join(deg, Seq("src"))
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint(eager = false)
    var ranks = nodes.select(col("id"), lit(BASE).as("rank"))
    for (_ <- 1 to K) {
      val inc = edgesD.join(ranks, col("src") === col("id"))
        .select(col("dst"), idiv(col("rank"), col("deg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
      ranks = nodes
        .join(inc.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + idiv(coalesce(col("inc"), lit(0L)) * 85, lit(100L)))
            .as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks.join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("deg"), lit(0L)).cast("long").as("out_degree"),
        col("rank").cast("long").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("doc_id"))
      .limit(TOPK)
  }

  def pagerankLinks(spark: SparkSession, dir: String): DataFrame =
    pagerankOf(Tables.documents(spark, dir).select(col("doc_id")))

  val pagerankLinksSql: String = {
    val iters = (1 to K).map { i =>
      s"""r$i AS (
         SELECT n.id,
           150000 + (85 * COALESCE(s.inc, 0)) // 100 AS rank
         FROM nodes n LEFT JOIN (
           SELECT e.dst AS id, sum(r.rank // e.deg) AS inc
           FROM r${i - 1} r JOIN edgesd e ON e.src = r.id
           GROUP BY e.dst) s USING (id))"""
    }.mkString(",\n       ")
    s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
       m AS (SELECT count(*) AS m FROM nodes),
       probes AS (
         SELECT id AS src, unnest([(id * 7 + 13) % m.m,
                                   (id * 7 + 26) % m.m,
                                   (id * 7 + 39) % m.m]) AS dst
         FROM nodes CROSS JOIN m),
       edges AS (
         SELECT p.src, p.dst FROM probes p
         JOIN nodes t ON t.id = p.dst),
       deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       edgesd AS (
         SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
       r0 AS (SELECT id, $BASE AS rank FROM nodes),
       $iters
       SELECT n.id AS doc_id,
         CAST(COALESCE(d.deg, 0) AS BIGINT) AS out_degree,
         CAST(r.rank AS BIGINT) AS rank_micro
       FROM r$K r JOIN nodes n USING (id)
       LEFT JOIN deg d ON d.src = n.id
       ORDER BY rank_micro DESC, doc_id LIMIT $TOPK"""
  }

  /** Degree-distribution profile of the link graph — the first plot
    * a crawl-graph analysis draws (a web graph's in-degree tail is
    * the power law [[pagerankLinks]] exploits; a missing tail means
    * the synthesized/ingested edge set is broken). One row per degree
    * value with the node counts holding that out- and in-degree,
    * zero-degree nodes included (a node every probe dangled away
    * from still counts in the 0 bucket — hence the left joins before
    * the histograms).
    *
    * Scale shape: the edge build (one broadcast + one equi-join),
    * two id-keyed count aggregates, two map-side-combined histogram
    * rollups on the tiny degree key space, one full-outer stitch.
    * Nothing wider than (id, long) ever shuffles. */
  def degreeDistribution(spark: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.documents(spark, dir).select(col("doc_id").as("id"))
      .repartition(spark.sparkContext.defaultParallelism)
    val edges = edgesOf(nodes).localCheckpoint(eager = false)
    def hist(keyed: DataFrame, out: String): DataFrame =
      nodes.join(keyed, Seq("id"), "left")
        .select(coalesce(col("d"), lit(0L)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as(out))
    val outH = hist(edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("d")), "n_out_nodes")
    val inH = hist(edges.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("d")), "n_in_nodes")
    outH.join(inH, Seq("degree"), "full_outer")
      .select(col("degree"),
        coalesce(col("n_out_nodes"), lit(0L)).as("n_out_nodes"),
        coalesce(col("n_in_nodes"), lit(0L)).as("n_in_nodes"))
      .orderBy(col("degree"))
  }

  val degreeDistributionSql: String =
    """WITH nodes AS (SELECT doc_id AS id FROM documents),
       m AS (SELECT count(*) AS m FROM nodes),
       probes AS (
         SELECT id AS src, unnest([(id * 7 + 13) % m.m,
                                   (id * 7 + 26) % m.m,
                                   (id * 7 + 39) % m.m]) AS dst
         FROM nodes CROSS JOIN m),
       edges AS (SELECT p.src, p.dst FROM probes p JOIN nodes t ON t.id = p.dst),
       outd AS (
         SELECT COALESCE(e.d, 0) AS degree, count(*) AS n_out_nodes
         FROM nodes n LEFT JOIN (
           SELECT src AS id, count(*) AS d FROM edges GROUP BY src) e USING (id)
         GROUP BY 1),
       ind AS (
         SELECT COALESCE(e.d, 0) AS degree, count(*) AS n_in_nodes
         FROM nodes n LEFT JOIN (
           SELECT dst AS id, count(*) AS d FROM edges GROUP BY dst) e USING (id)
         GROUP BY 1)
       SELECT COALESCE(o.degree, i.degree) AS degree,
         CAST(COALESCE(o.n_out_nodes, 0) AS BIGINT) AS n_out_nodes,
         CAST(COALESCE(i.n_in_nodes, 0) AS BIGINT) AS n_in_nodes
       FROM outd o FULL OUTER JOIN ind i ON o.degree = i.degree
       ORDER BY degree"""
}
