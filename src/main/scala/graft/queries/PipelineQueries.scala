package graft.queries

import graft.{QueryCatalog, QueryDef}
import graft.pipelines.Pipelines

/** End-to-end lab pipelines as single queries. lab4 is fully relational and
  * oracle-checked; lab1–lab3 embed iterative/model stages (DBSCAN, GBT,
  * SSSP) whose components are individually oracle-checked or spec-pinned,
  * so the composed runs record the weaker rows>0 check. */
object PipelineQueries extends QueryCatalog {

  def defs: Map[String, QueryDef] = Map(

    "lab1_noise_hotspots" -> QueryDef((s, dir) => Pipelines.noiseHotspots(s, dir)),

    "lab2_trip_duration" -> QueryDef((s, dir) => Pipelines.tripDuration(s, dir)),

    "lab3_road_network" -> QueryDef((s, dir) => Pipelines.roadNetwork(s, dir)),

    "lab4_review_sentiment" -> QueryDef(
      (s, dir) => Pipelines.reviewSentiment(s, dir),
      Some("""WITH lex(tok, score) AS (VALUES
             |  ('fast', 0.8), ('slow', -0.8), ('big', 0.2), ('small', -0.2),
             |  ('dup', -0.5), ('merge', 0.3), ('join', 0.4), ('filter', 0.2),
             |  ('sort', -0.3), ('stream', 0.5), ('batch', -0.4), ('hash', 0.1)),
             |dt AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
             |       FROM documents),
             |perdoc AS (SELECT doc_id, source, avg(score) AS polarity
             |  FROM dt LEFT JOIN lex USING (tok) GROUP BY 1, 2),
             |persrc AS (SELECT source, count(*) AS n_docs,
             |    round(avg(polarity), 6) AS avg_polarity,
             |    round(avg(CASE WHEN polarity > 0.1 THEN 1.0 ELSE 0.0 END), 6) AS positive_rate
             |  FROM perdoc GROUP BY 1),
             |ranked AS (SELECT source,
             |    round(avg_polarity * 0.7 + positive_rate * 0.3, 6) AS score,
             |    avg_polarity FROM persrc)
             |SELECT count(*) AS n_sources,
             |  (SELECT source FROM ranked ORDER BY score DESC, source LIMIT 1) AS top_source,
             |  round(max(score), 6) AS top_score,
             |  round(avg(avg_polarity), 6) AS corpus_polarity
             |FROM ranked""".stripMargin))
  )
}
