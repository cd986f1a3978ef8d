package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.GokaQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming: `g*` = the reference's own capability surface (SURVEY
  * §2.1-2.3) replayed through the engine; `q*` = relational surface
  * (SURVEY §2.5); `d*`/`s*`/`t*`/`m*` = training-data pipeline operators
  * (dedup / similarity / text analysis / multimodal).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's canonical count-per-key processor (SURVEY §7.3). */
  def entry(spark: SparkSession): DataFrame =
    GokaQueries.countPerKey(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_count_per_key" -> (GokaQueries.countPerKey _),
    "g02_sum_state" -> (GokaQueries.sumState _),
    "g03_multi_input" -> (GokaQueries.multiInput _),
    "g04_join_table" -> (GokaQueries.joinTable _),
    "g05_lookup_table" -> (GokaQueries.lookupTable _),
    "g06_loopback" -> (GokaQueries.loopback _),
    "g07_tombstones" -> (GokaQueries.tombstones _),
    "g08_emit_headers" -> (GokaQueries.emitHeaders _),
    "g09_stateless_filter" -> (GokaQueries.statelessFilter _),
    "g10_visitor" -> (GokaQueries.visitor _),
    "g11_last_n" -> (GokaQueries.lastN _),
    "g12_view_point" -> (GokaQueries.viewPoint _),
    "g13_view_range" -> (GokaQueries.viewRange _),
    "g14_view_prefix" -> (GokaQueries.viewPrefix _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "g01_count_per_key" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id""",
    "g02_sum_state" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
                CAST(sum(event_id) AS BIGINT) AS sum_id
         FROM events GROUP BY user_id""",
    "g03_multi_input" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
                count(*) FILTER (WHERE event_type IN ('click','view')) AS cnt_a,
                count(*) FILTER (WHERE event_type NOT IN ('click','view')) AS cnt_b
         FROM events GROUP BY user_id""",
    "g04_join_table" ->
      """SELECT CAST(e.user_id AS VARCHAR) AS key,
                coalesce(max(c.c_mktsegment), '') AS segment,
                count(*) AS cnt
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY e.user_id""",
    "g05_lookup_table" ->
      """SELECT CAST(e.user_id AS VARCHAR) AS key, max(n.n_name) AS nation
         FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
         GROUP BY e.user_id""",
    "g06_loopback" ->
      """SELECT CAST(user_id % 10 AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id % 10""",
    "g07_tombstones" ->
      """WITH ordered AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         lastp AS (
           SELECT user_id, max(rn) AS mrn FROM ordered
           WHERE event_type = 'purchase' GROUP BY user_id)
         SELECT CAST(o.user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM ordered o LEFT JOIN lastp p ON o.user_id = p.user_id
         WHERE o.event_type <> 'purchase' AND (p.mrn IS NULL OR o.rn > p.mrn)
         GROUP BY o.user_id""",
    "g08_emit_headers" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, event_id,
                event_type AS val, 'events' AS hdr_src
         FROM events""",
    "g09_stateless_filter" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, event_id,
                upper(event_type) AS payload
         FROM events WHERE event_type = 'click' AND value > 100""",
    "g10_visitor" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) * 2 AS cnt
         FROM events GROUP BY user_id""",
    "g11_last_n" ->
      """WITH ordered AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         SELECT CAST(user_id AS VARCHAR) AS key,
                string_agg(event_type, ',' ORDER BY rn DESC) AS last5
         FROM ordered WHERE rn <= 5 GROUP BY user_id""",
    "g12_view_point" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id
         HAVING CAST(user_id AS VARCHAR) IN ('1','12','123')""",
    "g13_view_range" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id
         HAVING CAST(user_id AS VARCHAR) >= '1' AND CAST(user_id AS VARCHAR) < '3'""",
    "g14_view_prefix" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id
         HAVING CAST(user_id AS VARCHAR) LIKE '1%'""",
  )
}
