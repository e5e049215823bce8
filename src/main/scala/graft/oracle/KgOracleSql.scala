package graft.oracle

import graft.core.Rules
import graft.gen.Corpus
import graft.stages.Export

/** DuckDB re-implementations of the KG/tree/episode queries — the driver's
  * independent correctness oracle for everything downstream of
  * normalization: mention detection (containment join), KB BFS closure
  * (recursive CTE), canonicalization (labels + containment/alias edges +
  * connected components via recursive reachability), single-pass weibo
  * triple emission, two-phase dedup, repost-forest analytics, the
  * BlogTreeInNeo4j tree-graph vocabulary, and the episode export.
  *
  * Inputs are the parquet tables [[OracleInputs]] materializes; reference
  * semantics are cited in the corresponding engine stages
  * (stages/{WeiboTriples,KbExpand,Canon,TreeAnalytics,TreeGraph,Export}).
  */
object KgOracleSql {

  private def lit(s: String) = "'" + s.replace("'", "''") + "'"
  private def inList(xs: Iterable[String]) =
    xs.toSeq.sorted.map(lit).mkString("(", ", ", ")")

  private val recPreds = inList(Rules.recursivePreds)
  private val aliasPreds = inList(Rules.aliasPreds)
  private val catPred = lit(Rules.categoryPred)
  private val entKws = inList(Rules.entertainmentKeywords)
  private val polKws = inList(Rules.politicalKeywords)
  private val entRid = Export.relations.indexOf("entertainment")
  private val polRid = Export.relations.indexOf("political")
  private val repostRid = Export.relations.indexOf("repost")
  private val relValues = Export.relations.zipWithIndex
    .map { case (r, i) => s"(${lit(r)}, $i)" }.mkString(", ")

  /** The union target-label rule (Canon.targetLabelExpr). `kb`/`rs` are the
    * triple and religious-subject table aliases. */
  private def targetLabelCase(kb: String, rs: String): String =
    s"""CASE WHEN $kb.pred IN ('机场', '火车站') THEN '交通设施'
       |     WHEN $kb.pred IN ('创办人', '创始人') THEN '经济人物'
       |     WHEN $kb.pred IN ('主办单位', '发行商', '开发公司', '开发商') THEN '公司'
       |     WHEN $kb.pred IN ('隶属', '所属宗教', '教派', '学派') THEN '宗教'
       |     WHEN $kb.pred = '主要人物' THEN '宗教人物'
       |     WHEN $kb.pred IN ('俗称', '别名', '别称', '又名') THEN
       |       CASE WHEN $rs.subj IS NOT NULL THEN '宗教' ELSE '人物' END
       |     ELSE $kb.pred END""".stripMargin

  /** Shared CTE chain: raw corpus → kb closure → canonical map → weibo
    * triples → deduped canonical triples. */
  private def kgCtes: String = {
    val rp = OracleInputs.rp _
    s"""m2e AS (SELECT mention, entity FROM ${rp("oi_ment2ent")}),
       |av AS (SELECT entity, pred, obj FROM ${rp("oi_avpair")}),
       |blg AS (SELECT * FROM ${rp("oi_blogs")}),
       |cmt AS (SELECT * FROM ${rp("oi_comments")}),
       |det AS (SELECT DISTINCT d.mention
       |        FROM (SELECT DISTINCT mention FROM m2e) d
       |        JOIN (SELECT text FROM ${rp("oi_spans")}
       |              WHERE kind = 'text' AND text IS NOT NULL) s
       |          ON contains(s.text, d.mention)),
       |ent AS (
       |  SELECT m.entity FROM det JOIN m2e m ON m.mention = det.mention
       |  UNION
       |  SELECT m2.entity FROM ent
       |    JOIN av a ON a.entity = ent.entity AND a.pred IN $recPreds
       |    JOIN m2e m2 ON m2.mention = a.obj
       |),
       |kb AS (SELECT DISTINCT e.entity AS subj, a.pred, a.obj
       |       FROM (SELECT DISTINCT entity FROM ent) e
       |       JOIN av a ON a.entity = e.entity),
       |cat AS (SELECT subj AS name, obj AS label FROM kb WHERE pred = $catPred),
       |relsub AS (SELECT DISTINCT name AS subj FROM cat WHERE label = '宗教'),
       |tl AS (SELECT kb.obj AS name, ${targetLabelCase("kb", "r")} AS label
       |       FROM kb LEFT JOIN relsub r ON kb.subj = r.subj),
       |lbl AS (SELECT name, list_sort(list_distinct(list(label))) AS labels
       |        FROM (SELECT name, label FROM cat
       |              UNION ALL SELECT name, label FROM tl) GROUP BY name),
       |ce AS (SELECT a.name AS a, b.name AS b
       |       FROM lbl a JOIN lbl b ON a.name <> b.name
       |         AND length(a.name) >= 2 AND length(b.name) >= 2
       |         AND contains(a.name, b.name)
       |         AND len(list_filter(b.labels,
       |               x -> NOT list_contains(a.labels, x))) = 0),
       |ae AS (SELECT subj AS a, obj AS b FROM kb WHERE pred IN $aliasPreds),
       |edg AS (SELECT DISTINCT a, b FROM
       |        (SELECT a, b FROM ce UNION ALL SELECT a, b FROM ae)),
       |sym AS (SELECT a AS src, b AS dst FROM edg
       |        UNION SELECT b AS src, a AS dst FROM edg),
       |reach AS (
       |  SELECT src AS name, src AS r FROM sym
       |  UNION
       |  SELECT reach.name, s.dst FROM reach JOIN sym s ON s.src = reach.r
       |),
       |cmap AS (SELECT name, min(r) AS comp FROM reach GROUP BY name
       |         HAVING name <> min(r)),
       |tags AS (SELECT mid, doc_id, content_offset,
       |           unnest(regexp_extract_all(string_split(content, '//@')[1],
       |                    '(@\\S+)[:\\s]*', 1) ||
       |                  regexp_extract_all(string_split(content, '//@')[1],
       |                    '(#.+?#)', 1)) AS tag
       |         FROM blg WHERE content IS NOT NULL),
       |wb AS (
       |  SELECT 'user:' || uid AS subj, 'create' AS pred,
       |         'blog:' || mid AS obj, doc_id, 0 AS span_offset FROM blg
       |  UNION ALL SELECT 'user:' || uid, 'name', username, doc_id, 0 FROM blg
       |  UNION ALL SELECT 'blog:' || mid, 'at_time', "time", doc_id, 0 FROM blg
       |  UNION ALL SELECT 'blog:' || mid, 'repost_count',
       |    CAST(repost AS VARCHAR), doc_id, 0 FROM blg
       |  UNION ALL SELECT 'blog:' || mid, 'comment_count',
       |    CAST("comment" AS VARCHAR), doc_id, 0 FROM blg
       |  UNION ALL SELECT 'blog:' || mid, 'like_count',
       |    CAST("like" AS VARCHAR), doc_id, 0 FROM blg
       |  UNION ALL SELECT 'blog:' || repost_id, 'repost', 'blog:' || mid,
       |    doc_id, 0 FROM blg WHERE repost_id IS NOT NULL
       |  UNION ALL SELECT 'root:' || keyword, 'keyword', 'blog:' || mid,
       |    doc_id, 0 FROM blg WHERE keyword IS NOT NULL
       |  UNION ALL SELECT 'blog:' || mid, 'reference', 'tag:' || tag,
       |    doc_id, content_offset FROM tags
       |  UNION ALL SELECT 'user:' || uid, 'create', 'comment:' || cid,
       |    doc_id, 0 FROM cmt
       |  UNION ALL SELECT 'comment:' || cid, 'comment', 'blog:' || mid,
       |    doc_id, 0 FROM cmt
       |  UNION ALL SELECT 'comment:' || cid, 'like_count',
       |    CAST("like" AS VARCHAR), doc_id, 0 FROM cmt
       |  UNION ALL SELECT 'comment:' || cid, 'at_time', "time", doc_id, 0
       |    FROM cmt WHERE "time" IS NOT NULL
       |),
       |allt AS (SELECT subj, pred, obj, doc_id, span_offset FROM wb
       |           WHERE subj IS NOT NULL AND obj IS NOT NULL
       |         UNION ALL SELECT subj, pred, obj, CAST(NULL AS VARCHAR),
       |           -1 FROM kb),
       |ctr AS (SELECT coalesce(ms.comp, t.subj) AS subj, t.pred,
       |               coalesce(mo.comp, t.obj) AS obj, t.doc_id, t.span_offset
       |        FROM allt t LEFT JOIN cmap ms ON t.subj = ms.name
       |                    LEFT JOIN cmap mo ON t.obj = mo.name),
       |triples AS (SELECT subj, pred, obj, min(doc_id) AS doc_id,
       |                   min(span_offset) AS span_offset
       |            FROM ctr GROUP BY 1, 2, 3)""".stripMargin
  }

  /** Repost-forest CTEs (TreeAnalytics.rootsAndLevels semantics). */
  private def treeCtes: String = {
    val rp = OracleInputs.rp _
    s"""e AS (SELECT mid, repost_id FROM ${rp("oi_blog_edges")}),
       |ph AS (SELECT DISTINCT repost_id AS mid FROM e
       |       WHERE repost_id IS NOT NULL
       |         AND repost_id NOT IN (SELECT mid FROM e)),
       |rts AS (SELECT DISTINCT mid FROM
       |        (SELECT mid FROM e WHERE repost_id IS NULL
       |         UNION ALL SELECT mid FROM ph)),
       |c2p AS (SELECT mid, repost_id AS parent FROM e
       |        WHERE repost_id IS NOT NULL),
       |lab AS (SELECT mid, mid AS root, 0 AS level FROM rts
       |        UNION ALL SELECT c.mid, l.root, l.level + 1
       |        FROM lab l JOIN c2p c ON c.parent = l.mid),
       |labd AS (SELECT mid, root, level FROM
       |         (SELECT lab.*, row_number() OVER
       |            (PARTITION BY mid ORDER BY level, root) AS rn FROM lab)
       |         WHERE rn = 1),
       |dep AS (SELECT root, max(level) AS depth FROM labd GROUP BY root)""".stripMargin
  }

  private def withKg(tail: String) = s"WITH RECURSIVE\n$kgCtes\n$tail"
  private def withTree(tail: String) = s"WITH RECURSIVE\n$treeCtes\n$tail"
  private def withBoth(midCtes: String, tail: String) =
    s"WITH RECURSIVE\n$kgCtes,\n$treeCtes${if (midCtes.isEmpty) "" else ",\n" + midCtes}\n$tail"

  /** (from integerGraph) bidirectional forward-relation graph + name ids. */
  private val graphCtes =
    s"""fwd AS (SELECT subj, pred, obj FROM triples
       |        WHERE pred IN ('keyword', 'repost', 'comment', 'reference', 'create')),
       |bot AS (SELECT subj, pred, obj FROM fwd
       |        UNION ALL SELECT obj AS subj, pred || '_inv' AS pred,
       |          subj AS obj FROM fwd),
       |ids AS (SELECT name, row_number() OVER (ORDER BY name) - 1 AS ent_id
       |        FROM (SELECT DISTINCT name FROM
       |              (SELECT subj AS name FROM bot
       |               UNION ALL SELECT obj AS name FROM bot))),
       |rid AS (SELECT * FROM (VALUES $relValues) AS t(rel, rel_id))""".stripMargin

  val qKgTriples: String =
    withKg("SELECT subj, pred, obj, doc_id, span_offset FROM triples")

  val qKgCanonMap: String = withKg("SELECT name, comp FROM cmap")

  val qKgVertices: String = withKg(
    s""", kbc AS (SELECT coalesce(ms.comp, k.subj) AS subj, k.pred,
       |               coalesce(mo.comp, k.obj) AS obj
       |        FROM kb k LEFT JOIN cmap ms ON k.subj = ms.name
       |                  LEFT JOIN cmap mo ON k.obj = mo.name),
       |cat2 AS (SELECT subj AS name, obj AS label FROM kbc WHERE pred = $catPred),
       |relsub2 AS (SELECT DISTINCT name AS subj FROM cat2 WHERE label = '宗教'),
       |tl2 AS (SELECT kbc.obj AS name, ${targetLabelCase("kbc", "r")} AS label
       |        FROM kbc LEFT JOIN relsub2 r ON kbc.subj = r.subj),
       |lbl2 AS (SELECT name, list_sort(list_distinct(list(label))) AS labels
       |         FROM (SELECT name, label FROM cat2
       |               UNION ALL SELECT name, label FROM tl2) GROUP BY name),
       |vn AS (SELECT DISTINCT name FROM
       |       (SELECT subj AS name FROM triples
       |        UNION ALL SELECT obj AS name FROM triples))
       |SELECT md5(v.name) AS vertex_id, v.name,
       |       coalesce(array_to_string(l.labels, ','), '') AS labels_s
       |FROM vn v LEFT JOIN lbl2 l ON v.name = l.name""".stripMargin)

  val qExportGraph: String = withKg(
    s""", $graphCtes
       |SELECT i1.ent_id AS from_id, i2.ent_id AS to_id, r.rel_id
       |FROM bot b JOIN ids i1 ON b.subj = i1.name
       |           JOIN ids i2 ON b.obj = i2.name
       |           JOIN rid r ON b.pred = r.rel""".stripMargin)

  val qTreeDepthHistogram: String =
    withTree("SELECT depth, count(*) AS trees FROM dep GROUP BY depth")

  val qTreeTierHistogram: String = withTree(
    s""", deep AS (SELECT root FROM dep WHERE depth > 1),
       |dw AS (SELECT root, level, count(*) AS width FROM labd GROUP BY root, level),
       |aw AS (SELECT dw.root, CAST(floor(avg(width)) AS INT) AS avg_width
       |       FROM dw JOIN deep USING (root) GROUP BY dw.root)
       |SELECT CAST(floor(avg_width / 10.0) AS INT) AS tier, count(*) AS trees
       |FROM aw GROUP BY 1""".stripMargin)

  val qTreePaths: String = withTree(
    s""", p1 AS (SELECT c.mid AS tip, r.mid AS root,
       |           r.mid || ', ' || c.mid AS steps
       |        FROM rts r JOIN c2p c ON c.parent = r.mid),
       |p2 AS (SELECT c.mid AS tip, p.root, p.steps || ', ' || c.mid AS steps
       |       FROM p1 p JOIN c2p c ON c.parent = p.tip)
       |SELECT root, tip, steps FROM p2""".stripMargin)

  val qLongestPath: String = withTree(
    s""", dleaf AS (SELECT l.root, d.depth, min(l.mid) AS leaf
       |          FROM labd l JOIN dep d ON l.root = d.root AND l.level = d.depth
       |          GROUP BY l.root, d.depth),
       |lp AS (SELECT root, depth, leaf AS cur, CAST(leaf AS VARCHAR) AS path
       |       FROM dleaf
       |       UNION ALL SELECT lp.root, lp.depth, c.parent,
       |         c.parent || ', ' || lp.path
       |       FROM lp JOIN c2p c ON c.mid = lp.cur WHERE lp.cur <> lp.root)
       |SELECT root, depth, path FROM lp WHERE cur = root""".stripMargin)

  /** BlogTreeInNeo4j edge set from the planted hot root. */
  val treeGraphRoot: String = Corpus.codedMid(0, 0)

  val qKgTreeGraph: String = {
    val rp = OracleInputs.rp _
    s"""WITH RECURSIVE
       |blg AS (SELECT * FROM ${rp("oi_blogs")}),
       |cmt AS (SELECT * FROM ${rp("oi_comments")}),
       |c2p AS (SELECT mid, repost_id AS parent FROM blg
       |        WHERE repost_id IS NOT NULL),
       |tags AS (SELECT mid,
       |           unnest(regexp_extract_all(string_split(content, '//@')[1],
       |                    '(@\\S+)[:\\s]*', 1) ||
       |                  regexp_extract_all(string_split(content, '//@')[1],
       |                    '(#.+?#)', 1)) AS tag
       |         FROM blg WHERE content IS NOT NULL),
       |sub AS (SELECT ${lit(treeGraphRoot)} AS mid
       |        UNION ALL SELECT c.mid FROM sub s JOIN c2p c ON c.parent = s.mid),
       |subd AS (SELECT DISTINCT mid FROM sub)
       |SELECT DISTINCT src, rel, dst FROM (
       |  SELECT 'blog:' || c.parent AS src, 'repost' AS rel,
       |         'blog:' || c.mid AS dst
       |  FROM c2p c JOIN subd p ON c.parent = p.mid
       |  UNION ALL
       |  SELECT 'blog:' || c.mid, 'reply', 'comment:' || c.cid
       |  FROM cmt c JOIN subd s2 ON c.mid = s2.mid
       |  UNION ALL
       |  SELECT 'user:' || coalesce(b.uid, ''), 'create', 'blog:' || s3.mid
       |  FROM subd s3 LEFT JOIN blg b ON s3.mid = b.mid
       |  UNION ALL
       |  SELECT 'user:' || coalesce(c.uid, ''), 'create', 'comment:' || c.cid
       |  FROM cmt c JOIN subd s4 ON c.mid = s4.mid
       |  UNION ALL
       |  SELECT 'tag:' || t.tag, 'contain', 'blog:' || t.mid
       |  FROM tags t JOIN subd s5 ON t.mid = s5.mid
       |  UNION ALL
       |  SELECT 'time:' || CASE WHEN b."time" IS NOT NULL
       |           AND regexp_matches(b."time", '\\d{4}-\\d{2}-\\d{2}')
       |           THEN substr(b."time", 1, 10) ELSE 'unknown' END,
       |         'when', 'blog:' || s6.mid
       |  FROM subd s6 LEFT JOIN blg b ON s6.mid = b.mid
       |)""".stripMargin
  }

  val qEpisodes: String = withBoth(
    s"""$graphCtes,
       |qroot AS (SELECT b.mid,
       |            CASE WHEN b.keyword IN $entKws THEN $entRid
       |                 ELSE $polRid END AS rid,
       |            least(d.depth, 5) AS dcap
       |          FROM (SELECT mid, keyword FROM blg
       |                WHERE keyword IS NOT NULL) b
       |          JOIN dep d ON d.root = b.mid
       |          WHERE d.depth > 1
       |            AND (b.keyword IN $entKws OR b.keyword IN $polKws)),
       |wlk AS (SELECT mid AS root, mid AS tip, [mid] AS pth, 0 AS dd FROM qroot
       |        UNION ALL SELECT w.root, c.mid, list_append(w.pth, c.mid), w.dd + 1
       |        FROM wlk w JOIN c2p c ON c.parent = w.tip WHERE w.dd < 5),
       |sel AS (SELECT w.root, w.tip, w.pth FROM wlk w
       |        JOIN qroot q ON q.mid = w.root AND w.dd = q.dcap),
       |pe AS (SELECT s.root, s.tip, u.i AS pos, ids.ent_id
       |       FROM sel s
       |       CROSS JOIN unnest(generate_series(1, len(s.pth))) AS u(i)
       |       JOIN ids ON ids.name = 'blog:' || s.pth[u.i]),
       |epi AS (SELECT root, tip,
       |          string_agg(CASE WHEN pos = 1 THEN CAST(ent_id AS VARCHAR)
       |                          ELSE '$repostRid,' || CAST(ent_id AS VARCHAR)
       |                     END, ',' ORDER BY pos) AS path
       |        FROM pe GROUP BY root, tip)""".stripMargin,
    s"""SELECT i1.ent_id AS from_id, i2.ent_id AS to_id, q.rid, epi.path
       |FROM epi JOIN qroot q ON q.mid = epi.root
       |JOIN ids i1 ON i1.name = 'blog:' || epi.root
       |JOIN ids i2 ON i2.name = 'blog:' || epi.tip""".stripMargin)

  /** Entity-link candidate scoring (stages/Linker): bigram-Jaccard of span
    * context vs entity KB profile, ranked per (doc, span, mention). */
  val qLinkScores: String = {
    val rp = OracleInputs.rp _
    def bigrams(c: String) =
      s"""list_distinct(CASE WHEN length($c) >= 2
         |  THEN list_transform(generate_series(1, length($c) - 1), i -> substr($c, i, 2))
         |  ELSE [$c] END)""".stripMargin
    s"""WITH sp AS (SELECT doc_id, "offset" AS span_offset, text FROM ${rp("oi_spans")}
       |            WHERE kind = 'text' AND text IS NOT NULL),
       |m2e AS (SELECT mention, entity FROM ${rp("oi_ment2ent")}),
       |det AS (SELECT s.doc_id, s.span_offset, s.text, d.mention
       |        FROM sp s JOIN (SELECT DISTINCT mention FROM m2e) d
       |          ON contains(s.text, d.mention)),
       |ctx AS (SELECT doc_id, span_offset, mention, ${bigrams("text")} AS ctxb FROM det),
       |pb AS (SELECT DISTINCT entity, bg FROM
       |       (SELECT entity, unnest(${bigrams("obj")}) AS bg FROM ${rp("oi_avpair")})),
       |prof AS (SELECT entity, list(bg) AS profile FROM pb GROUP BY entity),
       |sc AS (SELECT c.doc_id, c.span_offset, c.mention, m.entity,
       |         round(CAST(len(list_intersect(c.ctxb, p.profile)) AS DOUBLE) /
       |           (len(c.ctxb) + len(p.profile) - len(list_intersect(c.ctxb, p.profile))), 6) AS score
       |       FROM ctx c JOIN m2e m ON c.mention = m.mention
       |                  JOIN prof p ON m.entity = p.entity)
       |SELECT doc_id, span_offset, mention, entity, score, rank FROM
       |(SELECT sc.*, row_number() OVER (PARTITION BY doc_id, span_offset, mention
       |   ORDER BY score DESC, entity) AS rank FROM sc)""".stripMargin
  }

  /** All KG-corpus oracle SQL, keyed by driver query name. */
  val all: Map[String, String] = Map(
    "q_link_scores" -> qLinkScores,
    "q_kg_triples" -> qKgTriples,
    "q_kg_canon_map" -> qKgCanonMap,
    "q_kg_vertices" -> qKgVertices,
    "q_export_graph" -> qExportGraph,
    "q_tree_depth_histogram" -> qTreeDepthHistogram,
    "q_tree_tier_histogram" -> qTreeTierHistogram,
    "q_tree_paths" -> qTreePaths,
    "q_longest_path" -> qLongestPath,
    "q_kg_tree_graph" -> qKgTreeGraph,
    "q_episodes" -> qEpisodes)
}
