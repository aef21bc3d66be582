"""DuckDB oracle SQL for every oracle-checkable query in queries.py.

Each string is the ANSI-SQL equivalent of the Spark DataFrame query with
the same name, runnable by DuckDB over the driver's parquet views
(region nation customer supplier part orders lineitem events documents
embeddings). Snowflake-isms from the reference are rewritten per
FIXTURES.md: COUNT_IF(c) -> COUNT(*) FILTER (WHERE c); DAYOFWEEKISO ->
isodow; WEEKISO -> week; CURRENT_DATE() -> frozen literal.

Cross-engine determinism rules used throughout (mirrored on the Spark
side in queries.py / plans/):
- SUM/AVG over doubles go through CAST(... AS DECIMAL) so accumulation
  order can't change the result; final values cast back to DOUBLE.
- Window orderings always total (explicit tiebreak columns).
- Surrogate keys cast to BIGINT, date parts to INTEGER, counts are
  BIGINT naturally.
"""

from __future__ import annotations

from globalweather_etl_spark.operators.qc_frozen import (
    QC_FROZEN_BIAS_MICRO as _QC_BIAS_MICRO,
    QC_FROZEN_DIM as _QC_DIM,
    QC_FROZEN_W_MICRO,
)
from globalweather_etl_spark.sources.weather_from_events import (
    AS_OF_DATE,
    WEATHER_STAGING_SQL,
)

# the frozen classifier's micro-unit weight vector as a DuckDB list
# literal (1-based indexing at probe time) — operators/qc_frozen.py
_QC_W_SQL = "[" + ", ".join(str(w) for w in QC_FROZEN_W_MICRO) + "]"

# ---------------------------------------------------------------- weather ELT

_BAND_CASE = """CASE
    WHEN {q}AVG_TEMPERATURE_AIR_2M_F < 32 THEN 'Freezing'
    WHEN {q}AVG_TEMPERATURE_AIR_2M_F BETWEEN 32 AND 50 THEN 'Cold'
    WHEN {q}AVG_TEMPERATURE_AIR_2M_F BETWEEN 51 AND 70 THEN 'Mild'
    WHEN {q}AVG_TEMPERATURE_AIR_2M_F BETWEEN 71 AND 85 THEN 'Warm'
    ELSE 'Hot' END"""

_PTYPE_CASE = """CASE
    WHEN {q}TOT_SNOWFALL_IN > 0 THEN 'Snow'
    WHEN {q}TOT_PRECIPITATION_IN > 0 THEN 'Rain'
    ELSE 'None' END"""

_DATE_PARTS = """
    CAST(year({d}) AS INTEGER)    AS YEAR,
    CAST(month({d}) AS INTEGER)   AS MONTH,
    CAST(day({d}) AS INTEGER)     AS DAY,
    CAST(isodow({d}) AS INTEGER)  AS DAY_OF_WEEK,
    CAST(week({d}) AS INTEGER)    AS WEEK_OF_YEAR"""

# The full warehouse as a WITH-prologue (ETL:17-136 in CTE form).
WEATHER_PROLOGUE = f"""
WITH staging AS ({WEATHER_STAGING_SQL}),
dim_date AS (
  SELECT DISTINCT
    DATE_VALID_STD AS DATE_KEY,
    DATE_VALID_STD AS FULL_DATE,{_DATE_PARTS.format(d="DATE_VALID_STD")},
    DOY_STD AS DAY_OF_YEAR
  FROM staging
),
dim_location AS (
  SELECT
    CAST(row_number() OVER (ORDER BY POSTAL_CODE, CITY_NAME, COUNTRY) AS BIGINT)
      AS LOCATION_KEY,
    POSTAL_CODE, CITY_NAME, COUNTRY,
    DATE '{AS_OF_DATE.isoformat()}' AS VALID_FROM,
    CAST(NULL AS DATE) AS VALID_TO,
    TRUE               AS IS_CURRENT
  FROM (SELECT DISTINCT POSTAL_CODE, CITY_NAME, COUNTRY FROM staging)
),
dim_weather_band AS (
  SELECT DISTINCT {_BAND_CASE.format(q="")} AS WEATHER_BAND FROM staging
),
dim_precipitation_type AS (
  SELECT DISTINCT {_PTYPE_CASE.format(q="")} AS PRECIPITATION_TYPE FROM staging
),
dim_source AS (
  SELECT 1 AS SOURCE_KEY, 'Weather Source LLC' AS PROVIDER,
         'Frostbyte' AS DATASET_NAME, 'Snowflake Marketplace' AS INGEST_METHOD
),
fact AS (
  SELECT
    d.DATE_KEY, l.LOCATION_KEY, wb.WEATHER_BAND, pt.PRECIPITATION_TYPE,
    s.SOURCE_KEY,
    f.AVG_TEMPERATURE_AIR_2M_F AS AVG_TEMP_F,
    f.TOT_PRECIPITATION_IN     AS PRECIPITATION_IN,
    f.TOT_SNOWFALL_IN          AS SNOWFALL_IN,
    f.AVG_TEMPERATURE_AIR_2M_F
      - lag(f.AVG_TEMPERATURE_AIR_2M_F)
        OVER (PARTITION BY l.LOCATION_KEY ORDER BY d.DATE_KEY)
      AS TEMP_DAY_DELTA,
    round(CAST(sum(CAST(f.TOT_PRECIPITATION_IN AS DECIMAL(25,10)))
        OVER (PARTITION BY l.LOCATION_KEY ORDER BY d.DATE_KEY
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 9)
      AS PRECIPITATION_7D_SUM
  FROM staging f
  JOIN dim_date d ON f.DATE_VALID_STD = d.DATE_KEY
  JOIN dim_location l ON f.POSTAL_CODE = l.POSTAL_CODE AND l.IS_CURRENT = TRUE
  JOIN dim_weather_band wb ON wb.WEATHER_BAND = {_BAND_CASE.format(q="f.")}
  JOIN dim_precipitation_type pt
    ON pt.PRECIPITATION_TYPE = {_PTYPE_CASE.format(q="f.")}
  JOIN dim_source s ON s.SOURCE_KEY = 1
)
"""

# Exact average: order-independent decimal sum, then double division.
def _davg_sql(col: str) -> str:
    return (
        f"round(CAST(sum(CAST({col} AS DECIMAL(25,12))) AS DOUBLE)"
        f" / count({col}), 6)"
    )


PIPELINE_ORACLES: dict[str, str] = {
    "pipeline_dim_date": WEATHER_PROLOGUE + "SELECT * FROM dim_date",
    "pipeline_dim_location": WEATHER_PROLOGUE + "SELECT * FROM dim_location",
    "pipeline_dim_weather_band": WEATHER_PROLOGUE + "SELECT * FROM dim_weather_band",
    "pipeline_dim_precipitation_type": WEATHER_PROLOGUE
    + "SELECT * FROM dim_precipitation_type",
    "pipeline_dim_source": "SELECT 1 AS SOURCE_KEY, 'Weather Source LLC' AS PROVIDER, "
    "'Frostbyte' AS DATASET_NAME, 'Snowflake Marketplace' AS INGEST_METHOD",
    "pipeline_fact": WEATHER_PROLOGUE + "SELECT * FROM fact",
    "pipeline_validation": WEATHER_PROLOGUE
    + """, exp AS (
  SELECT
    CAST(count(*) AS DOUBLE) AS row_count,
    CAST(count(*) FILTER (WHERE DATE_KEY IS NULL) AS DOUBLE) AS nn_date,
    CAST(count(*) FILTER (WHERE LOCATION_KEY IS NULL) AS DOUBLE) AS nn_loc,
    CAST(count(*) FILTER (WHERE DATE_KEY IS NOT NULL
                            AND LOCATION_KEY IS NOT NULL
                            AND SOURCE_KEY IS NOT NULL) AS DOUBLE)
      - (SELECT count(*) FROM (SELECT DISTINCT DATE_KEY, LOCATION_KEY,
                                 SOURCE_KEY FROM fact
                               WHERE DATE_KEY IS NOT NULL
                                 AND LOCATION_KEY IS NOT NULL
                                 AND SOURCE_KEY IS NOT NULL))
      AS uniq,
    CAST(count(*) FILTER (WHERE AVG_TEMP_F IS NOT NULL
                            AND AVG_TEMP_F NOT BETWEEN -90 AND 140) AS DOUBLE)
      AS rng,
    CAST(count(*) FILTER (WHERE WEATHER_BAND IS NOT NULL AND WEATHER_BAND
      NOT IN ('Freezing','Cold','Mild','Warm','Hot')) AS DOUBLE) AS inset,
    CAST(count(*) FILTER (WHERE WEATHER_BAND IS NOT NULL
      AND NOT regexp_matches(WEATHER_BAND, '^[A-Z][a-z]+$')) AS DOUBLE)
      AS remiss,
    CAST(count(PRECIPITATION_IN) AS DOUBLE) / count(*) AS compl,
    CAST(count(*) FILTER (WHERE DATE_KEY IS NOT NULL AND DATE_KEY
      NOT IN (SELECT DATE_KEY FROM dim_date)) AS DOUBLE) AS fk_date,
    CAST(count(*) FILTER (WHERE WEATHER_BAND IS NOT NULL AND WEATHER_BAND
      NOT IN (SELECT WEATHER_BAND FROM dim_weather_band)) AS DOUBLE) AS fk_wb
  FROM fact
)
SELECT 'NULL_FK_COUNT' AS metric, CAST(count(*) AS DOUBLE) AS value
  FROM fact WHERE LOCATION_KEY IS NULL OR DATE_KEY IS NULL
UNION ALL SELECT 'MIN_TEMP_F', CAST(min(AVG_TEMP_F) AS DOUBLE) FROM fact
UNION ALL SELECT 'MAX_TEMP_F', CAST(max(AVG_TEMP_F) AS DOUBLE) FROM fact
UNION ALL SELECT 'exp__row_count', row_count FROM exp
UNION ALL SELECT 'exp__row_count__ok', CAST(row_count >= 1 AS DOUBLE) FROM exp
UNION ALL SELECT 'exp__not_null__DATE_KEY', nn_date FROM exp
UNION ALL SELECT 'exp__not_null__DATE_KEY__ok', CAST(nn_date = 0 AS DOUBLE) FROM exp
UNION ALL SELECT 'exp__not_null__LOCATION_KEY', nn_loc FROM exp
UNION ALL SELECT 'exp__not_null__LOCATION_KEY__ok', CAST(nn_loc = 0 AS DOUBLE) FROM exp
UNION ALL SELECT 'exp__unique__DATE_KEY_LOCATION_KEY_SOURCE_KEY', uniq FROM exp
UNION ALL SELECT 'exp__unique__DATE_KEY_LOCATION_KEY_SOURCE_KEY__ok',
  CAST(uniq = 0 AS DOUBLE) FROM exp
UNION ALL SELECT 'exp__between__AVG_TEMP_F', rng FROM exp
UNION ALL SELECT 'exp__between__AVG_TEMP_F__ok', CAST(rng = 0 AS DOUBLE) FROM exp
UNION ALL SELECT 'exp__in_set__WEATHER_BAND', inset FROM exp
UNION ALL SELECT 'exp__in_set__WEATHER_BAND__ok', CAST(inset = 0 AS DOUBLE) FROM exp
UNION ALL SELECT 'exp__matches__WEATHER_BAND', remiss FROM exp
UNION ALL SELECT 'exp__matches__WEATHER_BAND__ok', CAST(remiss = 0 AS DOUBLE) FROM exp
UNION ALL SELECT 'exp__completeness__PRECIPITATION_IN', compl FROM exp
UNION ALL SELECT 'exp__completeness__PRECIPITATION_IN__ok',
  CAST(compl >= 0.9 AS DOUBLE) FROM exp
UNION ALL SELECT 'exp__fk__DATE_KEY', fk_date FROM exp
UNION ALL SELECT 'exp__fk__DATE_KEY__ok', CAST(fk_date = 0 AS DOUBLE) FROM exp
UNION ALL SELECT 'exp__fk__WEATHER_BAND', fk_wb FROM exp
UNION ALL SELECT 'exp__fk__WEATHER_BAND__ok', CAST(fk_wb = 0 AS DOUBLE) FROM exp""",
    "pipeline_normalized_weather_day": WEATHER_PROLOGUE
    + """SELECT DATE_VALID_STD, POSTAL_CODE, AVG_TEMPERATURE_AIR_2M_F,
    MIN_TEMPERATURE_AIR_2M_F, MAX_TEMPERATURE_AIR_2M_F,
    AVG_HUMIDITY_RELATIVE_2M_PCT, AVG_PRESSURE_2M_MB, AVG_WIND_SPEED_10M_MPH,
    AVG_CLOUD_COVER_TOT_PCT, TOT_PRECIPITATION_IN, TOT_SNOWFALL_IN,
    PROBABILITY_OF_PRECIPITATION_PCT, PROBABILITY_OF_SNOW_PCT FROM staging""",
    "dashboard_q1": WEATHER_PROLOGUE
    + f"""SELECT d.FULL_DATE, {_davg_sql("f.AVG_TEMP_F")} AS AVG_TEMP_F
  FROM fact f JOIN dim_date d ON f.DATE_KEY = d.DATE_KEY
  GROUP BY d.FULL_DATE ORDER BY d.FULL_DATE""",
    "dashboard_q2": WEATHER_PROLOGUE
    + f"""SELECT l.CITY_NAME, {_davg_sql("f.AVG_TEMP_F")} AS AVG_TEMP_F
  FROM fact f JOIN dim_location l ON f.LOCATION_KEY = l.LOCATION_KEY
  GROUP BY l.CITY_NAME ORDER BY AVG_TEMP_F DESC, l.CITY_NAME LIMIT 15""",
    "dashboard_q3": WEATHER_PROLOGUE
    + f"""SELECT PRECIPITATION_TYPE, {_davg_sql("AVG_TEMP_F")} AS AVG_TEMP_F
  FROM fact GROUP BY PRECIPITATION_TYPE ORDER BY AVG_TEMP_F DESC""",
    "dashboard_q4": WEATHER_PROLOGUE
    + """SELECT WEATHER_BAND, count(*) AS DAYS_COUNT
  FROM fact GROUP BY WEATHER_BAND ORDER BY DAYS_COUNT DESC""",
    "dashboard_q5": WEATHER_PROLOGUE
    + """SELECT DATE_KEY,
    count(*) FILTER (WHERE PRECIPITATION_IN > 0) * 100.0 / count(*)
      AS PCT_LOCATIONS_WITH_RAIN
  FROM fact GROUP BY DATE_KEY ORDER BY DATE_KEY""",
}

# ------------------------------------------------------------ TPC-H operators

_PRICE_BAND_CASE = """CASE
    WHEN p_retailprice < 920 THEN 'Budget'
    WHEN p_retailprice BETWEEN 920 AND 950 THEN 'Standard'
    WHEN p_retailprice BETWEEN 951 AND 980 THEN 'Premium'
    ELSE 'Luxury' END"""

TPCH_ORACLES: dict[str, str] = {
    "tpch_star_join_revenue": """
SELECT r.r_name AS region, n.n_name AS nation,
  round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,10)))
       AS DOUBLE), 4) AS revenue,
  count(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name""",
    "tpch_q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(25,10))) AS DOUBLE), 4)
    AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,10))) AS DOUBLE), 4)
    AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,10)))
    AS DOUBLE), 4) AS sum_disc_price,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
    AS DECIMAL(25,10))) AS DOUBLE), 4) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(25,12))) AS DOUBLE)
    / count(l_quantity), 6) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,12))) AS DOUBLE)
    / count(l_extendedprice), 6) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(25,12))) AS DOUBLE)
    / count(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
    "tpch_price_band_counts": f"""
SELECT {_PRICE_BAND_CASE} AS PRICE_BAND, count(*) AS N_PARTS
FROM part GROUP BY 1 ORDER BY N_PARTS DESC""",
    "tpch_topk_customers": f"""
SELECT c.c_name, {_davg_sql("o.o_totalprice")} AS AVG_ORDER_VALUE
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_name ORDER BY AVG_ORDER_VALUE DESC, c.c_name LIMIT 15""",
    "tpch_order_date_parts": f"""
SELECT DISTINCT CAST(o_orderdate AS DATE) AS ORDER_DATE,
  {_DATE_PARTS.format(d="CAST(o_orderdate AS DATE)")},
  CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS DAY_OF_YEAR,
  CAST(quarter(CAST(o_orderdate AS DATE)) AS INTEGER) AS QUARTER,
  last_day(CAST(o_orderdate AS DATE)) AS MONTH_END,
  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
    AS PLUS_3_MONTHS,
  CAST(day(last_day(CAST(o_orderdate AS DATE))) AS INTEGER)
    AS DAYS_IN_MONTH
FROM orders""",
    "tpch_events_window_suite": """
SELECT event_id, user_id, ts, value,
  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS VALUE_DELTA,
  round(CAST(sum(CAST(value AS DECIMAL(25,10)))
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 9)
    AS VALUE_7ROW_SUM,
  lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS NEXT_VALUE,
  CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS BIGINT)
    AS VALUE_RANK,
  round(CAST(sum(CAST(value AS DECIMAL(25,10)))
      OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      AS DOUBLE), 9) AS VALUE_1H_SUM,
  CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
    AS BIGINT) AS VALUE_QUARTILE,
  round(percent_rank() OVER (PARTITION BY user_id ORDER BY value DESC), 9)
    AS VALUE_PCT_RANK,
  round(cume_dist() OVER (PARTITION BY user_id ORDER BY value DESC), 9)
    AS VALUE_CUME_DIST,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS PROPS_K,
  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS USER_FIRST_VALUE,
  nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS USER_SECOND_VALUE,
  round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 9)
    AS VALUE_7ROW_MEDIAN,
  round(mad(value) OVER w7, 9) AS VALUE_7ROW_MAD,
  CASE WHEN mad(value) OVER w7 > 0 THEN
    round(0.6745 * (value - median(value) OVER w7)
          / mad(value) OVER w7, 9) END AS VALUE_ROBUST_Z7,
  CASE WHEN mad(value) OVER w7 > 0 THEN
    abs(round(0.6745 * (value - median(value) OVER w7)
              / mad(value) OVER w7, 9)) > 3.5
  ELSE value <> median(value) OVER w7 END AS VALUE_ANOM7
FROM events
WINDOW w7 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""",
    "tpch_surrogate_key": """
SELECT CAST(row_number() OVER (ORDER BY c_mktsegment, c_nationkey) AS BIGINT)
    AS SEGMENT_KEY,
  c_mktsegment, c_nationkey
FROM (SELECT DISTINCT c_mktsegment, c_nationkey FROM customer)""",
    "tpch_scalar_checks": """
WITH RECURSIVE fo AS (
  SELECT count(*) FILTER (WHERE o.o_orderkey IS NULL) AS no_orders,
         count(*) FILTER (WHERE c.c_custkey IS NULL) AS orphans,
         count(*) AS n_rows
  FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey),
ga AS (
  SELECT count(*) AS n_rows,
         min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
  FROM lineitem),
cdc_src AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
cdc_old AS (SELECT * FROM cdc_src WHERE o_orderkey % 3 != 0),
cdc_new AS (SELECT o_orderkey,
              CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                   ELSE o_totalprice END AS o_totalprice,
              o_orderstatus
            FROM cdc_src WHERE o_orderkey % 5 != 0),
cdc AS (
  SELECT
    count(*) FILTER (WHERE o.o_orderkey IS NULL) AS n_inserted,
    count(*) FILTER (WHERE n.o_orderkey IS NULL) AS n_deleted,
    count(*) FILTER (WHERE o.o_orderkey IS NOT NULL
      AND n.o_orderkey IS NOT NULL
      AND (o.o_totalprice IS DISTINCT FROM n.o_totalprice
           OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus))
      AS n_updated,
    count(*) FILTER (WHERE o.o_orderkey IS NOT NULL
      AND n.o_orderkey IS NOT NULL
      AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
      AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
      AS n_unchanged
  FROM cdc_old o FULL OUTER JOIN cdc_new n ON o.o_orderkey = n.o_orderkey),
sfx AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn,
    CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sx,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy,
    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
      * CAST(l_quantity AS DECIMAL(25,6)) AS DECIMAL(38,6)))
      AS DOUBLE) AS sxx,
    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(25,6))
      * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,6)))
      AS DOUBLE) AS syy,
    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6))
      * CAST(l_extendedprice AS DECIMAL(25,6)) AS DECIMAL(38,6)))
      AS DOUBLE) AS sxy
  FROM lineitem),
mx AS (
  SELECT
    round((sxy - sx * sy / nn)
      / sqrt((sxx - sx * sx / nn) * (syy - sy * sy / nn)), 9)
      AS corr_qty_price,
    round((sxy - sx * sy / nn) / (sxx - sx * sx / nn), 9)
      AS slope_price_on_qty,
    round((sxy - sx * sy / nn) / nn, 6) AS cov_pop_qty_price
  FROM sfx),
twap_seg AS (
  SELECT user_id,
    CAST(lead(epoch_us(ts)) OVER w - epoch_us(ts) AS DECIMAL(25,6))
      AS dt,
    CAST(CAST(value AS DECIMAL(25,6))
      * CAST(lead(epoch_us(ts)) OVER w - epoch_us(ts) AS DECIMAL(25,6))
      AS DECIMAL(38,6)) AS vdt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)),
twap_user AS (
  SELECT user_id,
    round(CAST(sum(vdt) AS DOUBLE) / CAST(sum(dt) AS DOUBLE), 9) AS twap
  FROM twap_seg WHERE dt IS NOT NULL GROUP BY user_id),
twap AS (
  SELECT round(CAST(sum(CAST(twap AS DECIMAL(25,10))) AS DOUBLE)
           / count(*), 9) AS mean_user_twap,
         CAST(count(*) AS BIGINT) AS n_twap_users
  FROM twap_user),
fpairs AS (
  SELECT a.p_name AS s_a, b.p_name AS s_b,
         levenshtein(a.p_name, b.p_name) AS d
  FROM (SELECT DISTINCT p_name FROM part) a
  JOIN (SELECT DISTINCT p_name FROM part) b ON a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= 2),
fz AS (
  SELECT count(*) FILTER (WHERE d <= 1) AS d1,
         count(*) AS d2,
         sum(d) AS sum_d
  FROM fpairs),
eredges AS (
  SELECT s_a AS u, s_b AS v FROM fpairs
  UNION SELECT s_b AS u, s_a AS v FROM fpairs),
erwalk AS (
  SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM eredges) n
  UNION
  SELECT e.v AS node, w.label FROM erwalk w JOIN eredges e ON e.u = w.node),
erlab AS (SELECT node, min(label) AS canonical FROM erwalk GROUP BY node),
erall AS (
  SELECT p.p_name AS entity, coalesce(l.canonical, p.p_name) AS canonical
  FROM (SELECT DISTINCT p_name FROM part) p
  LEFT JOIN erlab l ON l.node = p.p_name),
ersz AS (SELECT canonical, count(*) AS cs FROM erall GROUP BY canonical),
er AS (
  SELECT count(*) AS n_values,
         count(DISTINCT e.canonical) AS n_clusters,
         max(s.cs) AS max_cluster,
         count(*) FILTER (WHERE s.cs > 1) AS merged_values
  FROM erall e JOIN ersz s ON e.canonical = s.canonical),
lk_base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
  WHERE o_orderkey % 3 != 0),
lk_src AS (
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 5 = 0),
lk_v2 AS (
  SELECT * FROM lk_src
  UNION ALL
  SELECT * FROM lk_base b
  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM lk_src)),
lk_v3 AS (SELECT * FROM lk_v2 WHERE o_orderkey % 7 != 0),
-- round 12: ANSI column-level UPDATE SET twin — matched keys
-- (every even orderkey) bump price by (orderkey % 100); the Spark
-- side runs merge_into_set with t.o_totalprice + s.bump
lk_v4 AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 2 = 0
      THEN o_totalprice + CAST(o_orderkey % 100 AS DOUBLE)
      ELSE o_totalprice END AS o_totalprice,
    o_orderstatus
  FROM lk_v3),
lk_k0 AS (
  SELECT min(o_orderkey) AS k0 FROM lk_src
  WHERE o_orderkey % 3 != 0 AND o_orderkey % 7 != 0),
cfd AS (
  SELECT
    count(*) FILTER (WHERE n.o_orderkey IS NOT NULL
      AND (b.o_orderkey IS NULL
           OR b.o_totalprice IS DISTINCT FROM n.o_totalprice
           OR b.o_orderstatus IS DISTINCT FROM n.o_orderstatus))
      AS plus_rows,
    count(*) FILTER (WHERE b.o_orderkey IS NOT NULL
      AND (n.o_orderkey IS NULL
           OR b.o_totalprice IS DISTINCT FROM n.o_totalprice
           OR b.o_orderstatus IS DISTINCT FROM n.o_orderstatus))
      AS minus_rows,
    round(CAST(
      coalesce(sum(CAST(n.o_totalprice AS DECIMAL(25,6)))
        FILTER (WHERE n.o_orderkey IS NOT NULL
          AND (b.o_orderkey IS NULL
               OR b.o_totalprice IS DISTINCT FROM n.o_totalprice
               OR b.o_orderstatus IS DISTINCT FROM n.o_orderstatus)),
        0)
      - coalesce(sum(CAST(b.o_totalprice AS DECIMAL(25,6)))
        FILTER (WHERE b.o_orderkey IS NOT NULL
          AND (n.o_orderkey IS NULL
               OR b.o_totalprice IS DISTINCT FROM n.o_totalprice
               OR b.o_orderstatus IS DISTINCT FROM n.o_orderstatus)),
        0) AS DOUBLE), 4) AS net_price
  FROM lk_base b FULL OUTER JOIN lk_v3 n
    ON b.o_orderkey = n.o_orderkey),
rs_app AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 9 = 0),
sq AS (
  SELECT user_id,
    string_agg(CASE event_type
        WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        WHEN 'error' THEN 'e' ELSE '.' END,
      '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id),
sqm AS (
  SELECT user_id, length(seq) AS sl,
    len(regexp_extract_all(seq, 'v+cp')) AS mc,
    CASE WHEN len(regexp_extract_all(seq, 'v+cp')) > 0
         THEN length(regexp_split_to_array(seq, 'v+cp')[1]) + 1
         ELSE 0 END AS fp
  FROM sq),
sqa AS (
  SELECT sum(sl) AS len_sum, sum(mc) AS total_matches,
         count(*) FILTER (WHERE mc > 0) AS users_matched,
         sum(fp) AS fp_sum
  FROM sqm),
sqd AS (
  SELECT user_id,
    string_agg(CASE WHEN value > 80 THEN 'b'
      ELSE CASE event_type
        WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        WHEN 'error' THEN 'e' ELSE '.' END END,
      '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id),
sqdm AS (
  SELECT user_id,
    len(regexp_extract_all(seq, 'v+b')) AS mc,
    CASE WHEN len(regexp_extract_all(seq, 'v+b')) > 0
         THEN length(regexp_split_to_array(seq, 'v+b')[1]) + 1
         ELSE 0 END AS fp
  FROM sqd),
sqda AS (
  SELECT sum(mc) AS total_matches,
         count(*) FILTER (WHERE mc > 0) AS users_matched,
         sum(fp) AS fp_sum
  FROM sqdm),
tm_flag AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN lag(ts) OVER tmw IS NULL
              OR ts - lag(ts) OVER tmw > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW tmw AS (PARTITION BY user_id ORDER BY ts, event_id)),
tm_sess AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM tm_flag),
tm_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
      ORDER BY ts, event_id) AS rnk
  FROM tm_sess),
tm_trans AS (
  SELECT coalesce(lag(event_type) OVER tmsw, '(start)') AS src,
         event_type AS dst
  FROM tm_ranked
  WINDOW tmsw AS (PARTITION BY user_id, session_id ORDER BY rnk)
  UNION ALL
  SELECT event_type, '(end)' FROM tm_ranked
  QUALIFY row_number() OVER (PARTITION BY user_id, session_id
                             ORDER BY rnk DESC) = 1),
tm_counts AS (
  SELECT src, dst, count(*) AS n FROM tm_trans GROUP BY src, dst),
tm_mat AS (
  SELECT src, dst, n,
    round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY src)
      AS DOUBLE), 9) AS p
  FROM tm_counts),
tm AS (
  SELECT count(*) AS cells, sum(n) AS steps,
    round(CAST(sum(CAST(p AS DECIMAL(25,9))) AS DOUBLE), 6) AS psum,
    max(CASE WHEN src = '(start)' THEN p END) AS pstart
  FROM tm_mat),
co_sets AS (
  SELECT DISTINCT user_id, session_id, event_type FROM tm_sess),
co_n AS (
  SELECT CAST(count(*) AS DOUBLE) AS ns
  FROM (SELECT DISTINCT user_id, session_id FROM tm_sess)),
co_singles AS (
  SELECT event_type AS t, count(*) AS n_t FROM co_sets
  GROUP BY event_type),
co_pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM co_sets a JOIN co_sets b
    ON a.user_id = b.user_id AND a.session_id = b.session_id
   AND a.event_type < b.event_type
  GROUP BY 1, 2),
co_mat AS (
  SELECT p.n_both,
    round(p.n_both / co_n.ns, 9) AS support,
    round((p.n_both / co_n.ns)
      / ((na.n_t / co_n.ns) * (nb.n_t / co_n.ns)), 9) AS lift
  FROM co_pairs p
  CROSS JOIN co_n
  JOIN co_singles na ON na.t = p.type_a
  JOIN co_singles nb ON nb.t = p.type_b),
co AS (
  SELECT count(*) AS pairs, sum(n_both) AS nb,
    round(CAST(sum(CAST(support AS DECIMAL(25,9))) AS DOUBLE), 6)
      AS sup,
    round(CAST(sum(CAST(lift AS DECIMAL(25,9))) AS DOUBLE), 6) AS lf
  FROM co_mat),
jd AS (
  SELECT '{"id": ' || o_orderkey || ', "cust": {"key": ' || o_custkey
    || ', "seg": "' || substring(o_orderpriority, 1, 1)
    || '"}, "tags": ["t' || (o_orderkey % 5) || '", "t'
    || (o_orderkey % 3) || '"], "amounts": [' || (o_orderkey % 7)
    || ', ' || (o_orderkey % 11) || ', ' || (o_orderkey % 13)
    || ']}' AS jdoc
  FROM orders),
jsc AS (
  SELECT
    sum(CAST(json_extract_string(jdoc, '$.cust.key') AS BIGINT))
      AS cust_key_sum,
    count(*) FILTER (
      WHERE json_extract_string(jdoc, '$.cust.seg') = '1') AS seg1,
    count(*) FILTER (
      WHERE json_extract_string(jdoc, '$.missing.deep') IS NULL)
      AS miss_null
  FROM jd),
jtg AS (
  SELECT count(*) AS tag_rows,
         count(*) FILTER (WHERE tag = 't0') AS t0_rows,
         count(DISTINCT tag) AS distinct_tags
  FROM (SELECT unnest(CAST(json_extract(jdoc, '$.tags') AS VARCHAR[]))
          AS tag
        FROM jd)),
jam AS (
  SELECT sum(amt) AS amounts_sum
  FROM (SELECT unnest(CAST(json_extract(jdoc, '$.amounts') AS BIGINT[]))
          AS amt
        FROM jd)),
jom AS (
  SELECT count(*) AS n
  FROM (SELECT unnest(coalesce(
          CAST(json_extract(jdoc, '$.nope') AS VARCHAR[]),
          [NULL])) AS v
        FROM jd)),
zm_win AS (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE CAST(o_orderdate AS DATE)
    BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
zm_key AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000),
zb_box AS (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE CAST(o_orderdate AS DATE)
    BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    AND o_custkey BETWEEN 100 AND 2000),
-- incremental-OPTIMIZE head: z-ordered base (key%3=0) + two appends
-- (key%3=1; key%3=2 excluding key%11=0), minus the merge-on-read
-- delete (key%13=0), after optimize() folded the appends into the
-- layout — physically reshuffled, relationally just this predicate
oc_head AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         o_custkey, o_totalprice
  FROM orders
  WHERE NOT (o_orderkey % 3 = 2 AND o_orderkey % 11 = 0)
    AND o_orderkey % 13 <> 0),
oc_box AS (
  SELECT * FROM oc_head
  WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    AND o_custkey BETWEEN 100 AND 2000),
-- multi-table transaction twin (tx_* rows): the final state the
-- three transactions publish, derived straight from the base tables —
-- seed (even orderkeys / even custkeys), append (odd keys not %5),
-- then one decision pairing a fact delete (%7) with a dim MERGE
-- (%3 customers updated +1000 or inserted; merge carries the source
-- row whole, so the final dim is untouched-seed UNION source)
tx_fact AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  WHERE (o_orderkey % 2 = 0
         OR (o_orderkey % 2 = 1 AND o_orderkey % 5 <> 0))
    AND o_orderkey % 7 <> 0),
tx_dim AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
  WHERE c_custkey % 2 = 0 AND c_custkey % 3 <> 0
  UNION ALL
  SELECT c_custkey, c_acctbal + 1000.0, c_mktsegment FROM customer
  WHERE c_custkey % 3 = 0),
tx_join AS (
  SELECT f.o_totalprice
  FROM tx_fact f JOIN tx_dim d ON f.o_custkey = d.c_custkey),
-- TPC-H Q3/Q5/Q10 twins (deterministic k-boundary tiebreaks added
-- in BOTH engines: Q3 by (o_orderdate, l_orderkey), Q10 by c_custkey)
q3_top AS (
  SELECT l_orderkey, o_orderdate,
    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,10)))
      AS q3rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1995-03-15'
    AND l_shipdate > TIMESTAMP '1995-03-15'
  GROUP BY l_orderkey, o_orderdate
  ORDER BY q3rev DESC, o_orderdate, l_orderkey
  LIMIT 10),
q5_nations AS (
  SELECT n_name,
    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,10)))
      AS q5rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
    AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1994-01-01'
    AND o_orderdate < TIMESTAMP '1995-01-01'
  GROUP BY n_name),
q10_top AS (
  SELECT c_custkey,
    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,10)))
      AS q10rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1993-10-01'
    AND o_orderdate < TIMESTAMP '1994-01-01'
  GROUP BY c_custkey
  ORDER BY q10rev DESC, c_custkey
  LIMIT 20),
q14_m AS (
  SELECT p_type,
    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,10)) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1995-09-01'
    AND l_shipdate < TIMESTAMP '1995-10-01'),
q18_big AS (
  SELECT lq.l_orderkey, lq.oqty, c_custkey
  FROM (SELECT l_orderkey,
          sum(CAST(l_quantity AS DECIMAL(25,10))) AS oqty
        FROM lineitem GROUP BY l_orderkey HAVING oqty > 150) lq
  JOIN orders ON lq.l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey),
q19_m AS (
  SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,10))
    AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         AND l_quantity BETWEEN 1 AND 11)
     OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         AND l_quantity BETWEEN 10 AND 20)
     OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 20 AND 30)),
q15_rev AS (
  SELECT l_suppkey,
    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,10)))
      AS srev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey),
q15_top AS (
  SELECT * FROM q15_rev
  WHERE srev = (SELECT max(srev) FROM q15_rev)),
q16_groups AS (
  SELECT p_brand, p_type, p_size,
    count(DISTINCT l_suppkey) AS nsupp
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_suppkey NOT IN
    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
  GROUP BY p_brand, p_type, p_size),
q17_avg AS (
  SELECT l_partkey,
    CAST(sum(CAST(l_quantity AS DECIMAL(25,10))) AS DOUBLE)
      / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey),
q17_m AS (
  SELECT l_extendedprice
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN q17_avg USING (l_partkey)
  WHERE p_brand = 'Brand#23' AND p_size <= 10
    AND l_quantity < 0.2 * avg_qty),
q22_m AS (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_acctbal > (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,10))) AS DOUBLE)
        / count(*)
      FROM customer WHERE c_acctbal > 0)
    AND c_custkey NOT IN (SELECT o_custkey FROM orders)),
-- Round 11: derived-column TPC-H families (Q2/Q4/Q7/Q8/Q9/Q11/Q12/
-- Q13/Q20/Q21). The md5-prefix hash recipe synthesizes commit/
-- receipt dates, shipmode, and a partsupp table IDENTICALLY to the
-- Spark side (operators/dedup._md5_long); costs stay integer cents.
lid AS (
  SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
         l_extendedprice, l_discount, ship_d,
         ship_d + CAST(h % 60 - 30 AS INTEGER) AS l_commitdate,
         ship_d + CAST(h % 28 + 1 AS INTEGER) AS l_receiptdate,
         (['MAIL','SHIP','AIR','TRUCK','RAIL','FOB','REG AIR'])
           [CAST(h % 7 + 1 AS INTEGER)] AS l_shipmode
  FROM (SELECT *, CAST(l_shipdate AS DATE) AS ship_d,
          CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)
            || ':' || CAST(l_linenumber AS VARCHAR)), 1, 15)
            AS BIGINT) AS h
        FROM lineitem)),
psd AS (
  SELECT ps_partkey, ps_suppkey,
         h % 99999 + 1 AS ps_cents, h % 9999 + 1 AS ps_availqty
  FROM (SELECT ps_partkey, ps_suppkey,
          CAST('0x' || substring(md5(CAST(ps_partkey AS VARCHAR)
            || ':' || CAST(ps_suppkey AS VARCHAR)), 1, 15)
            AS BIGINT) AS h
        FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                l_suppkey AS ps_suppkey FROM lineitem))),
supn AS (
  SELECT s_suppkey, s_acctbal, n_name AS supp_nation,
         n_regionkey AS s_regionkey
  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
custn AS (
  SELECT c_custkey, n_name AS cust_nation,
         n_regionkey AS c_regionkey
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
q4_g AS (
  SELECT o_orderpriority, count(*) AS cnt
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-07-01'
    AND o_orderdate < TIMESTAMP '1995-10-01'
    AND EXISTS (SELECT 1 FROM lid
                WHERE l_orderkey = o_orderkey
                  AND l_commitdate < l_receiptdate)
  GROUP BY o_orderpriority),
q12_g AS (
  SELECT l_shipmode,
    sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        THEN 1 ELSE 0 END) AS high,
    sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        THEN 0 ELSE 1 END) AS low
  FROM lid JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipmode IN ('MAIL','SHIP')
    AND l_commitdate < l_receiptdate
    AND ship_d < l_commitdate
    AND l_receiptdate >= DATE '1996-01-01'
    AND l_receiptdate < DATE '1997-01-01'
  GROUP BY l_shipmode),
q7_g AS (
  SELECT supp_nation, cust_nation, year(ship_d) AS l_year,
    sum(CAST(l_extendedprice * (1 - l_discount)
        AS DECIMAL(25,10))) AS vol
  FROM lid
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supn ON l_suppkey = s_suppkey
  JOIN custn ON o_custkey = c_custkey
  WHERE ship_d >= DATE '1995-01-01' AND ship_d < DATE '1997-01-01'
    AND ((supp_nation = 'NATION_1' AND cust_nation = 'NATION_2')
      OR (supp_nation = 'NATION_2' AND cust_nation = 'NATION_1'))
  GROUP BY supp_nation, cust_nation, l_year),
q8_g AS (
  SELECT year(o_orderdate) AS o_year,
    sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
        ELSE CAST(0 AS DECIMAL(25,10)) END) AS nat_rev,
    sum(rev) AS all_rev
  FROM (SELECT o_orderdate, supp_nation,
          CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(25,10)) AS rev
        FROM lid
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN custn ON o_custkey = custn.c_custkey
        JOIN region ON custn.c_regionkey = r_regionkey
          AND r_name = 'EUROPE'
        JOIN supn ON l_suppkey = s_suppkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01')
  GROUP BY o_year),
q9_g AS (
  SELECT supp_nation, year(o_orderdate) AS o_year,
    sum(CAST(l_extendedprice * (1 - l_discount)
        AS DECIMAL(25,10))) AS grev,
    sum(ps_cents * CAST(l_quantity AS BIGINT)) AS gcost
  FROM lid
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
  JOIN psd ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supn ON l_suppkey = s_suppkey
  GROUP BY supp_nation, o_year),
q11_ps AS (
  SELECT ps_partkey, ps_cents * ps_availqty AS val
  FROM psd JOIN supn ON ps_suppkey = s_suppkey
  WHERE supp_nation = 'NATION_5'),
q11_g AS (
  SELECT ps_partkey, sum(val) AS pval
  FROM q11_ps GROUP BY ps_partkey
  HAVING sum(val) * 2000 > (SELECT sum(val) FROM q11_ps)),
q13_counts AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN
    (SELECT o_custkey, o_orderkey FROM orders
     WHERE CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
           1, 15) AS BIGINT) % 20 <> 0) o
  ON c_custkey = o_custkey
  GROUP BY c_custkey),
q13_g AS (
  SELECT c_count, count(*) AS custdist
  FROM q13_counts GROUP BY c_count),
q20_ship AS (
  SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
  FROM lid
  WHERE ship_d >= DATE '1995-01-01' AND ship_d < DATE '1996-01-01'
  GROUP BY l_partkey, l_suppkey),
q20_g AS (
  SELECT DISTINCT ps_suppkey
  FROM psd
  JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'small%'
  JOIN q20_ship ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  WHERE ps_availqty * 2 > qty
    AND ps_suppkey IN (SELECT s_suppkey FROM supn
                       WHERE supp_nation = 'NATION_7')),
q21_per AS (
  SELECT l_orderkey,
    count(DISTINCT l_suppkey) AS nsupp,
    count(DISTINCT CASE WHEN l_receiptdate > l_commitdate
          THEN l_suppkey END) AS nlate
  FROM lid JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey),
q21_g AS (
  SELECT l_suppkey, count(*) AS numwait
  FROM (SELECT DISTINCT lid.l_orderkey, l_suppkey
        FROM lid JOIN q21_per ON lid.l_orderkey = q21_per.l_orderkey
        WHERE l_receiptdate > l_commitdate
          AND nsupp > 1 AND nlate = 1)
  WHERE l_suppkey IN (SELECT s_suppkey FROM supn
                      WHERE supp_nation = 'NATION_9')
  GROUP BY l_suppkey),
q2_cand AS (
  SELECT ps_partkey, ps_suppkey, ps_cents, s_acctbal
  FROM psd
  JOIN supn ON ps_suppkey = s_suppkey
  JOIN region ON s_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN part ON ps_partkey = p_partkey
    AND p_size = 3 AND p_type = 'STANDARD'),
q2_min AS (
  SELECT ps_partkey AS pk, min(ps_cents) AS mincents
  FROM q2_cand GROUP BY ps_partkey),
q2_m AS (
  SELECT c.* , mincents FROM q2_cand c
  JOIN q2_min ON c.ps_partkey = pk AND c.ps_cents = mincents),
-- spatial proximity join twin: BRUTE-FORCE cross join + the exact
-- integer radius predicate — equality with the Spark side's
-- grid-cell-blocked plan proves the blocking is lossless
geo_a AS (
  SELECT c_custkey AS a_id,
    CAST('0x' || substring(md5('glat:' || CAST(c_custkey AS VARCHAR)),
      1, 15) AS BIGINT) % 180000000 AS ax,
    CAST('0x' || substring(md5('glon:' || CAST(c_custkey AS VARCHAR)),
      1, 15) AS BIGINT) % 360000000 AS ay
  FROM customer),
geo_b AS (
  SELECT s_suppkey AS b_id,
    CAST('0x' || substring(md5('slat:' || CAST(s_suppkey AS VARCHAR)),
      1, 15) AS BIGINT) % 180000000 AS bx,
    CAST('0x' || substring(md5('slon:' || CAST(s_suppkey AS VARCHAR)),
      1, 15) AS BIGINT) % 360000000 AS "by"
  FROM supplier),
geo_m AS (
  SELECT a_id, b_id,
    (ax - bx) * (ax - bx) + (ay - "by") * (ay - "by") AS dist2
  FROM geo_a CROSS JOIN geo_b
  WHERE (ax - bx) * (ax - bx) + (ay - "by") * (ay - "by")
    <= CAST(6000000 AS BIGINT) * 6000000),
geo_knn AS (
  SELECT a_id, b_id, dist2, knn_rank FROM (
    SELECT a_id, b_id, dist2,
      row_number() OVER (PARTITION BY a_id
        ORDER BY dist2, bx, "by", b_id) AS knn_rank
    FROM (
      SELECT a_id, b_id, bx, "by",
        (ax - bx) * (ax - bx) + (ay - "by") * (ay - "by") AS dist2
      FROM geo_a CROSS JOIN geo_b
      WHERE (ax - bx) * (ax - bx) + (ay - "by") * (ay - "by")
        <= CAST(20000000 AS BIGINT) * 20000000))
  WHERE knn_rank <= 3),
-- round 12: UNBOUNDED kNN twin — row_number over ALL pairs with NO
-- radius bound; equality with Spark's expanding-ring escalation
-- proves the escalation returns the true k nearest for every point
geo_knnc AS (
  SELECT a_id, b_id, dist2, knn_rank FROM (
    SELECT a_id, b_id, dist2,
      row_number() OVER (PARTITION BY a_id
        ORDER BY dist2, bx, "by", b_id) AS knn_rank
    FROM (
      SELECT a_id, b_id, bx, "by",
        (ax - bx) * (ax - bx) + (ay - "by") * (ay - "by") AS dist2
      FROM geo_a CROSS JOIN geo_b))
  WHERE knn_rank <= 3),
-- round 12: spherical radius join twin — brute-force cross join with
-- the haversine mirrored term-for-term from the Spark expression
-- (every constant CAST to DOUBLE; the filter and digest compare the
-- 1e-6-km DECIMAL rounding so last-ulp libm drift cannot flip them)
sph_a AS (
  SELECT c_custkey AS a_id,
    CAST(CAST('0x' || substring(md5('sphlat:'
        || CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)
      % 120000000 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
      - CAST(60.0 AS DOUBLE) AS alat,
    CAST(CAST('0x' || substring(md5('sphlon:'
        || CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)
      % 360000000 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
      - CAST(180.0 AS DOUBLE) AS alon
  FROM customer),
sph_b AS (
  SELECT s_suppkey AS b_id,
    CAST(CAST('0x' || substring(md5('sphlat:s'
        || CAST(s_suppkey AS VARCHAR)), 1, 15) AS BIGINT)
      % 120000000 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
      - CAST(60.0 AS DOUBLE) AS blat,
    CAST(CAST('0x' || substring(md5('sphlon:s'
        || CAST(s_suppkey AS VARCHAR)), 1, 15) AS BIGINT)
      % 360000000 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
      - CAST(180.0 AS DOUBLE) AS blon
  FROM supplier),
sph_km AS (
  SELECT a_id, b_id,
    (CAST(2.0 AS DOUBLE) * CAST(6371.0088 AS DOUBLE)) * asin(sqrt(
      sin((blat - alat) * (CAST(3.141592653589793 AS DOUBLE)
          / CAST(180.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE))
      * sin((blat - alat) * (CAST(3.141592653589793 AS DOUBLE)
          / CAST(180.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE))
      + cos(alat * (CAST(3.141592653589793 AS DOUBLE)
          / CAST(180.0 AS DOUBLE)))
        * cos(blat * (CAST(3.141592653589793 AS DOUBLE)
          / CAST(180.0 AS DOUBLE)))
        * sin((blon - alon) * (CAST(3.141592653589793 AS DOUBLE)
          / CAST(180.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE))
        * sin((blon - alon) * (CAST(3.141592653589793 AS DOUBLE)
          / CAST(180.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE))
    )) AS km
  FROM sph_a CROSS JOIN sph_b),
sph_m AS (
  SELECT a_id, b_id, CAST(round(km, 6) AS DECIMAL(15,6)) AS km_r6
  FROM sph_km
  WHERE CAST(round(km, 6) AS DECIMAL(15,6))
    <= CAST(1200.0 AS DOUBLE)),
-- round 13: spherical kNN twin — the SAME brute-force pairs ranked
-- per left point on the DECIMAL rounding with the operator's
-- deterministic (rlat, rlon, id) tiebreak
sph_knn AS (
  SELECT a_id, b_id, km_r6, knn_rank FROM (
    SELECT m.a_id, m.b_id, m.km_r6,
      row_number() OVER (PARTITION BY m.a_id
        ORDER BY m.km_r6, b.blat, b.blon, m.b_id) AS knn_rank
    FROM sph_m m JOIN sph_b b ON b.b_id = m.b_id)
  WHERE knn_rank <= 3),
-- round 12: point-in-polygon twin — brute-force points x edges with
-- the division-free integer crossing predicate, parity per pair;
-- equality with Spark's bbox-blocked codegen fold proves both the
-- blocking and the even-odd count
pgv AS (
  SELECT pg, i,
    CAST('0x' || substring(md5('pgx:' || CAST(pg AS VARCHAR)),
      1, 15) AS BIGINT) % 180000000
    + CAST('0x' || substring(md5('pvx:' || CAST(pg AS VARCHAR)
      || ':' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 60000001
    - 30000000 AS vx,
    CAST('0x' || substring(md5('pgy:' || CAST(pg AS VARCHAR)),
      1, 15) AS BIGINT) % 360000000
    + CAST('0x' || substring(md5('pvy:' || CAST(pg AS VARCHAR)
      || ':' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 60000001
    - 30000000 AS vy
  FROM (SELECT unnest(range(20)) AS pg),
       (SELECT unnest(range(5)) AS i)),
pge AS (
  SELECT a.pg, a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
  FROM pgv a JOIN pgv b ON a.pg = b.pg AND b.i = (a.i + 1) % 5),
pipc AS (
  SELECT g.a_id, e.pg
  FROM geo_a g CROSS JOIN pge e
  WHERE ((e.y1 > g.ay) <> (e.y2 > g.ay))
    AND (
      ((e.y2 > e.y1) AND
        ((e.x1 - g.ax) * (e.y2 - e.y1)
         + (g.ay - e.y1) * (e.x2 - e.x1)) > 0)
      OR ((e.y2 < e.y1) AND
        ((e.x1 - g.ax) * (e.y2 - e.y1)
         + (g.ay - e.y1) * (e.x2 - e.x1)) < 0))),
pipin AS (
  SELECT a_id, pg FROM (
    SELECT a_id, pg, count(*) AS c FROM pipc GROUP BY a_id, pg)
  WHERE c % 2 = 1),
-- round 13: GEODESIC point-in-polygon twin — the documented
-- convention mirrored term-for-term: decimal-degree coordinates,
-- lon -180 normalized to +180, microdegree quantization via
-- round(x * 1e6) (half away from zero, both engines), then the SAME
-- division-free integer crossing predicate as pipc on (lat_u, lon_u)
gpgv AS (
  SELECT pg, i,
    CAST(round((
      CAST(CAST('0x' || substring(md5('gplat:' || CAST(pg AS VARCHAR)),
        1, 15) AS BIGINT) % 100000000 AS DOUBLE)
      / CAST(1000000.0 AS DOUBLE) - CAST(50.0 AS DOUBLE)
      + CAST(CAST('0x' || substring(md5('gpvlat:' || CAST(pg AS VARCHAR)
        || ':' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
        % 10000001 AS DOUBLE)
      / CAST(1000000.0 AS DOUBLE) - CAST(5.0 AS DOUBLE)
    ) * CAST(1000000.0 AS DOUBLE), 0) AS BIGINT) AS vlat_u,
    CAST(round((
      CAST(CAST('0x' || substring(md5('gplon:' || CAST(pg AS VARCHAR)),
        1, 15) AS BIGINT) % 340000000 AS DOUBLE)
      / CAST(1000000.0 AS DOUBLE) - CAST(170.0 AS DOUBLE)
      + CAST(CAST('0x' || substring(md5('gpvlon:' || CAST(pg AS VARCHAR)
        || ':' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
        % 10000001 AS DOUBLE)
      / CAST(1000000.0 AS DOUBLE) - CAST(5.0 AS DOUBLE)
    ) * CAST(1000000.0 AS DOUBLE), 0) AS BIGINT) AS vlon_u
  FROM (SELECT unnest(range(20)) AS pg),
       (SELECT unnest(range(5)) AS i)),
gpipp AS (
  SELECT a_id,
    CAST(round(alat * CAST(1000000.0 AS DOUBLE), 0) AS BIGINT)
      AS plat_u,
    CAST(round((CASE WHEN alon = CAST(-180.0 AS DOUBLE)
      THEN CAST(180.0 AS DOUBLE) ELSE alon END)
      * CAST(1000000.0 AS DOUBLE), 0) AS BIGINT) AS plon_u
  FROM sph_a),
gpipe AS (
  SELECT a.pg, a.vlat_u AS x1, a.vlon_u AS y1,
         b.vlat_u AS x2, b.vlon_u AS y2
  FROM gpgv a JOIN gpgv b ON a.pg = b.pg AND b.i = (a.i + 1) % 5),
gpipc AS (
  SELECT p.a_id, e.pg
  FROM gpipp p CROSS JOIN gpipe e
  WHERE ((e.y1 > p.plon_u) <> (e.y2 > p.plon_u))
    AND (
      ((e.y2 > e.y1) AND
        ((e.x1 - p.plat_u) * (e.y2 - e.y1)
         + (p.plon_u - e.y1) * (e.x2 - e.x1)) > 0)
      OR ((e.y2 < e.y1) AND
        ((e.x1 - p.plat_u) * (e.y2 - e.y1)
         + (p.plon_u - e.y1) * (e.x2 - e.x1)) < 0))),
gpipin AS (
  SELECT a_id, pg FROM (
    SELECT a_id, pg, count(*) AS c FROM gpipc GROUP BY a_id, pg)
  WHERE c % 2 = 1),
-- EWMA + CUSUM series-monitor twin, as a RECURSIVE-CTE fold (one
-- iteration per series step, all series advancing in lockstep; depth
-- = longest series). A list_reduce lambda twin exists in
-- tests/test_timeseries.py and is bit-exact at unit scale, but
-- DuckDB's grouped vectorized lambda execution was observed to
-- mis-evaluate a handful of long folds at sf0.1 (different users
-- flip depending on batch composition), so the graded oracle uses
-- the recursion: plain scalar arithmetic per step, no lambdas.
-- Every constant is CAST to DOUBLE (bare 0.5/0.0 literals are
-- DECIMAL and would divert the arithmetic).
tse AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS rn
  FROM events),
tsm AS (
  SELECT user_id, count(*) AS n,
    CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / count(*)
      AS m
  FROM events GROUP BY user_id),
tsrec AS (
  SELECT user_id, 0 AS rn, CAST(0.0 AS DOUBLE) AS pos,
    CAST(0.0 AS DOUBLE) AS neg, 0 AS alarms,
    CAST(NULL AS DOUBLE) AS ewma,
    CAST(NULL AS DOUBLE) AS hl, CAST(0.0 AS DOUBLE) AS ht
  FROM tsm
  UNION ALL
  SELECT r.user_id, r.rn + 1,
    CASE WHEN greatest(CAST(0.0 AS DOUBLE),
           r.pos + e.value - t.m - CAST(0.5 AS DOUBLE))
         > CAST(5.0 AS DOUBLE)
      THEN CAST(0.0 AS DOUBLE)
      ELSE greatest(CAST(0.0 AS DOUBLE),
           r.pos + e.value - t.m - CAST(0.5 AS DOUBLE)) END,
    CASE WHEN greatest(CAST(0.0 AS DOUBLE),
           r.neg + t.m - e.value - CAST(0.5 AS DOUBLE))
         > CAST(5.0 AS DOUBLE)
      THEN CAST(0.0 AS DOUBLE)
      ELSE greatest(CAST(0.0 AS DOUBLE),
           r.neg + t.m - e.value - CAST(0.5 AS DOUBLE)) END,
    r.alarms
      + CASE WHEN greatest(CAST(0.0 AS DOUBLE),
          r.pos + e.value - t.m - CAST(0.5 AS DOUBLE))
          > CAST(5.0 AS DOUBLE) THEN 1 ELSE 0 END
      + CASE WHEN greatest(CAST(0.0 AS DOUBLE),
          r.neg + t.m - e.value - CAST(0.5 AS DOUBLE))
          > CAST(5.0 AS DOUBLE) THEN 1 ELSE 0 END,
    CASE WHEN r.ewma IS NULL THEN e.value
      ELSE CAST(0.3 AS DOUBLE) * e.value
         + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * r.ewma END,
    CASE WHEN r.hl IS NULL THEN e.value
      ELSE CAST(0.3 AS DOUBLE) * e.value
         + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
           * (r.hl + r.ht) END,
    CASE WHEN r.hl IS NULL THEN CAST(0.0 AS DOUBLE)
      ELSE CAST(0.1 AS DOUBLE)
         * ((CAST(0.3 AS DOUBLE) * e.value
            + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
              * (r.hl + r.ht)) - r.hl)
         + (CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * r.ht END
  FROM tsrec r
  JOIN tse e ON e.user_id = r.user_id AND e.rn = r.rn + 1
  JOIN tsm t ON t.user_id = r.user_id),
tsff AS (
  SELECT r.user_id, r.ewma AS ewma_raw, r.hl, r.ht,
    {'alarms': r.alarms, 'pos': r.pos, 'neg': r.neg} AS cus
  FROM tsrec r JOIN tsm t ON t.user_id = r.user_id AND r.rn = t.n),
tsr AS (
  SELECT CAST(count(*) AS DOUBLE) AS users,
    CAST(sum(CAST(cus.alarms AS BIGINT)) AS DOUBLE) AS alarms,
    CAST(sum(CAST(round(ewma_raw, 9) AS DECIMAL(25,9))) AS DOUBLE)
      AS ewma_sum,
    CAST(sum(CAST(round(cus.pos, 9) AS DECIMAL(25,9))) AS DOUBLE)
      AS cpos_sum,
    CAST(sum(CAST(round(hl, 9) AS DECIMAL(25,9))) AS DOUBLE)
      AS holt_level_sum,
    CAST(sum(CAST(round(ht, 9) AS DECIMAL(25,9))) AS DOUBLE)
      AS holt_trend_sum
  FROM tsff),
-- Round 12: CLAMPED CUSUM (no alarm reset) twin — the prefix-sum
-- identity s_t = S_t - min(0, min_{j<=t} S_j) as two window passes,
-- in EXACT DECIMAL(25,6) arithmetic with an explicit target so the
-- values are independent of each engine's window summation order
-- (DuckDB's segment trees add in a different order than Spark's
-- running frames; floats would drift in the last ulp)
tscc1 AS (
  SELECT user_id, ts, event_id,
    sum(CAST(value AS DECIMAL(25,6)) - CAST(60.0 AS DECIMAL(25,6))
        - CAST(0.5 AS DECIMAL(25,6))) OVER wcc AS sp,
    sum(CAST(60.0 AS DECIMAL(25,6)) - CAST(value AS DECIMAL(25,6))
        - CAST(0.5 AS DECIMAL(25,6))) OVER wcc AS sn
  FROM events
  WINDOW wcc AS (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
tscc2 AS (
  SELECT user_id, ts, event_id,
    sp - LEAST(CAST(0 AS DECIMAL(25,6)), min(sp) OVER wcc2) AS cp,
    sn - LEAST(CAST(0 AS DECIMAL(25,6)), min(sn) OVER wcc2) AS cn
  FROM tscc1
  WINDOW wcc2 AS (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
tscc_last AS (
  SELECT user_id, cp, cn FROM (
    SELECT user_id, cp, cn, row_number() OVER (PARTITION BY user_id
      ORDER BY ts DESC, event_id DESC) AS rn FROM tscc2)
  WHERE rn = 1),
tscc_exc AS (
  SELECT user_id,
    sum(CASE WHEN cp > CAST(5.0 AS DECIMAL(25,6)) THEN 1 ELSE 0 END
      + CASE WHEN cn > CAST(5.0 AS DECIMAL(25,6)) THEN 1 ELSE 0 END)
      AS exc
  FROM tscc2 GROUP BY user_id),
-- Round 11: Holt-Winters additive (m=4) twin — same recursive-fold
-- recipe; the Spark side's m-length seasonal ARRAY becomes four
-- scalar columns here (identical arithmetic per step: left-fold
-- seed mean over the first four values, then the triple recursion;
-- a series shorter than m keeps NULL level).
hwrec AS (
  SELECT user_id, 0 AS rn,
    CAST(NULL AS DOUBLE) AS w0, CAST(NULL AS DOUBLE) AS w1,
    CAST(NULL AS DOUBLE) AS w2,
    CAST(NULL AS DOUBLE) AS lvl, CAST(0.0 AS DOUBLE) AS tr,
    CAST(NULL AS DOUBLE) AS s0, CAST(NULL AS DOUBLE) AS s1,
    CAST(NULL AS DOUBLE) AS s2, CAST(NULL AS DOUBLE) AS s3
  FROM tsm
  UNION ALL
  SELECT r.user_id, r.rn + 1,
    CASE WHEN r.rn = 0 THEN e.value ELSE r.w0 END,
    CASE WHEN r.rn = 1 THEN e.value ELSE r.w1 END,
    CASE WHEN r.rn = 2 THEN e.value ELSE r.w2 END,
    CASE WHEN r.rn < 3 THEN CAST(NULL AS DOUBLE)
      WHEN r.rn = 3 THEN
        ((((CAST(0.0 AS DOUBLE) + r.w0) + r.w1) + r.w2) + e.value)
          / CAST(4.0 AS DOUBLE)
      ELSE CAST(0.3 AS DOUBLE) * (e.value
             - CASE (r.rn - 4) % 4 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1
               WHEN 2 THEN r.s2 ELSE r.s3 END)
           + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
             * (r.lvl + r.tr) END,
    CASE WHEN r.rn <= 3 THEN CAST(0.0 AS DOUBLE)
      ELSE CAST(0.1 AS DOUBLE)
           * ((CAST(0.3 AS DOUBLE) * (e.value
                - CASE (r.rn - 4) % 4 WHEN 0 THEN r.s0
                  WHEN 1 THEN r.s1 WHEN 2 THEN r.s2 ELSE r.s3 END)
               + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                 * (r.lvl + r.tr)) - r.lvl)
           + (CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * r.tr END,
    CASE WHEN r.rn < 3 THEN CAST(NULL AS DOUBLE)
      WHEN r.rn = 3 THEN r.w0 -
        ((((CAST(0.0 AS DOUBLE) + r.w0) + r.w1) + r.w2) + e.value)
          / CAST(4.0 AS DOUBLE)
      WHEN (r.rn - 4) % 4 = 0 THEN
        CAST(0.2 AS DOUBLE) * (e.value
          - (CAST(0.3 AS DOUBLE) * (e.value - r.s0)
             + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
               * (r.lvl + r.tr)))
        + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.s0
      ELSE r.s0 END,
    CASE WHEN r.rn < 3 THEN CAST(NULL AS DOUBLE)
      WHEN r.rn = 3 THEN r.w1 -
        ((((CAST(0.0 AS DOUBLE) + r.w0) + r.w1) + r.w2) + e.value)
          / CAST(4.0 AS DOUBLE)
      WHEN (r.rn - 4) % 4 = 1 THEN
        CAST(0.2 AS DOUBLE) * (e.value
          - (CAST(0.3 AS DOUBLE) * (e.value - r.s1)
             + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
               * (r.lvl + r.tr)))
        + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.s1
      ELSE r.s1 END,
    CASE WHEN r.rn < 3 THEN CAST(NULL AS DOUBLE)
      WHEN r.rn = 3 THEN r.w2 -
        ((((CAST(0.0 AS DOUBLE) + r.w0) + r.w1) + r.w2) + e.value)
          / CAST(4.0 AS DOUBLE)
      WHEN (r.rn - 4) % 4 = 2 THEN
        CAST(0.2 AS DOUBLE) * (e.value
          - (CAST(0.3 AS DOUBLE) * (e.value - r.s2)
             + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
               * (r.lvl + r.tr)))
        + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.s2
      ELSE r.s2 END,
    CASE WHEN r.rn < 3 THEN CAST(NULL AS DOUBLE)
      WHEN r.rn = 3 THEN e.value -
        ((((CAST(0.0 AS DOUBLE) + r.w0) + r.w1) + r.w2) + e.value)
          / CAST(4.0 AS DOUBLE)
      WHEN (r.rn - 4) % 4 = 3 THEN
        CAST(0.2 AS DOUBLE) * (e.value
          - (CAST(0.3 AS DOUBLE) * (e.value - r.s3)
             + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
               * (r.lvl + r.tr)))
        + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.s3
      ELSE r.s3 END
  FROM hwrec r
  JOIN tse e ON e.user_id = r.user_id AND e.rn = r.rn + 1
  JOIN tsm t ON t.user_id = r.user_id),
hwff AS (
  SELECT r.user_id, round(r.lvl, 9) AS l9, round(r.tr, 9) AS t9,
    round(r.lvl + r.tr
      + CASE (t.n - 4) % 4 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1
        WHEN 2 THEN r.s2 ELSE r.s3 END, 9) AS f9
  FROM hwrec r JOIN tsm t ON t.user_id = r.user_id AND r.rn = t.n
  WHERE r.lvl IS NOT NULL),
hwr AS (
  SELECT CAST(count(*) AS DOUBLE) AS users,
    CAST(sum(CAST(l9 AS DECIMAL(25,9))) AS DOUBLE) AS lsum,
    CAST(sum(CAST(t9 AS DECIMAL(25,9))) AS DOUBLE) AS tsum,
    CAST(sum(CAST(f9 AS DECIMAL(25,9))) AS DOUBLE) AS fsum
  FROM hwff),
-- UNPIVOT twin: the pivoted priority x status count matrix melted
-- long with the standard-syntax UNPIVOT (INCLUDE NULLS to match
-- Spark's keep-nulls default; the coalesced counts have none)
unpw AS (
  SELECT o_orderpriority,
    count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
    count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
    count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
  FROM orders GROUP BY o_orderpriority),
unpl AS (
  SELECT * FROM unpw
  UNPIVOT INCLUDE NULLS (n FOR status_col IN (n_f, n_o, n_p))),
-- higher-order array-function twin: identical left folds in double
-- (list order is fixed, so no partial-agg ambiguity per vector);
-- cross-document sums via the round(9) -> DECIMAL exact route
hofd AS (
  SELECT
    round(list_reduce(
      list_prepend(0.0::DOUBLE,
        list_transform(embedding, x -> CAST(x AS DOUBLE))),
      (acc, x) -> acc + x * x), 9) AS sq,
    len(list_filter(embedding, x -> x > 0)) AS pos,
    round(list_reduce(
      list_prepend(0.0::DOUBLE,
        list_transform(embedding, (x, i) -> CAST(x AS DOUBLE)
          * CAST(embedding[len(embedding) - i + 1] AS DOUBLE))),
      (acc, x) -> acc + x), 9) AS dotrev,
    round(list_reduce(
      list_prepend(0.0::DOUBLE,
        list_transform(embedding,
          x -> least(greatest(CAST(x AS DOUBLE), -0.5), 0.5))),
      (acc, x) -> acc + x), 9) AS clip
  FROM embeddings),
hof AS (
  SELECT
    round(CAST(sum(CAST(sq AS DECIMAL(25,9))) AS DOUBLE), 6) AS sq_sum,
    sum(pos) AS pos_sum,
    round(CAST(sum(CAST(dotrev AS DECIMAL(25,9))) AS DOUBLE), 6)
      AS dot_sum,
    round(CAST(sum(CAST(clip AS DECIMAL(25,9))) AS DOUBLE), 6)
      AS clip_sum
  FROM hofd),
-- PRODUCT-QUANTIZATION twin (round 10, operators/pq.py portable
-- path): codebook = the 16 hash-min embedding vectors (code j = j-th
-- seed in id order), per-subspace assignment by the SAME fold-exact
-- distance form the Spark expression encoder uses (||c||^2 - 2 x.c,
-- ties to the smaller code), ADC = q.q - 2 q.w + w.w over the
-- reconstructed vector. Digests: md5-prefix BIGINT of the row string
-- mod 2^31-1, exact-summed — order-independent and corpus-complete.
pq_e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pq_seeds AS (
  SELECT vec_id, v FROM pq_e
  ORDER BY CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                AS BIGINT), vec_id
  LIMIT 16),
pq_cb AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1
           AS code, v
  FROM pq_seeds),
pq_subs AS (
  SELECT cb.code, t.s, list_slice(cb.v, t.s*8 + 1, t.s*8 + 8) AS c
  FROM pq_cb cb, range(8) t(s)),
pq_esub AS (
  SELECT e.vec_id, t.s, list_slice(e.v, t.s*8 + 1, t.s*8 + 8) AS x
  FROM pq_e e, range(8) t(s)),
pq_assign AS (
  SELECT vec_id, s, code FROM (
    SELECT es.vec_id, es.s, sb.code,
      row_number() OVER (PARTITION BY es.vec_id, es.s
        ORDER BY list_dot_product(sb.c, sb.c)
                 - 2*list_dot_product(es.x, sb.c) ASC,
                 sb.code ASC) AS rn
    FROM pq_esub es JOIN pq_subs sb ON sb.s = es.s) WHERE rn = 1),
pq_codes AS (
  SELECT vec_id,
    array_to_string(list(code ORDER BY s), '-') AS cs
  FROM pq_assign GROUP BY vec_id),
pq_recon AS (
  SELECT a.vec_id, flatten(list(sb.c ORDER BY a.s)) AS w
  FROM pq_assign a JOIN pq_subs sb ON sb.s = a.s AND sb.code = a.code
  GROUP BY a.vec_id),
pq_scored AS (
  SELECT q.vec_id AS query_id, r.vec_id AS cand_id,
    list_dot_product(q.v, q.v) - 2*list_dot_product(q.v, r.w)
      + list_dot_product(r.w, r.w) AS adc_dist
  FROM pq_recon r
  CROSS JOIN (SELECT vec_id, v FROM pq_e WHERE vec_id < 10) q
  WHERE r.vec_id != q.vec_id),
pq_top AS (
  SELECT * FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY adc_dist ASC, cand_id) AS INTEGER) AS rank
    FROM pq_scored) WHERE rank <= 5),
-- SEMDEDUP twin (round 10, operators/semdedup.py): portable
-- centroids = the 8 hash-min vectors fold-normalized (kmeans.py
-- portable_centroids), assignment = argmax dot with ties to the
-- LARGER cluster_id (the Arrow argmax convention), sim = fold
-- cosine to the chosen centroid, and i is pruned iff some
-- farther-from-centroid (ties: lower-id) j in its cluster has
-- cosine(i, j) >= 0.4.
sd_seeds AS (
  SELECT vec_id, v FROM pq_e
  ORDER BY CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                AS BIGINT), vec_id
  LIMIT 8),
sd_cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER)
           AS cluster_id,
    [x / sqrt(list_dot_product(v, v)) FOR x IN v] AS c
  FROM sd_seeds),
sd_assign AS (
  SELECT vec_id, v, cluster_id,
    list_dot_product(v, c)
      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c)))
      AS sim
  FROM (
    SELECT e.vec_id, e.v, c.cluster_id, c.c,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_dot_product(e.v, c.c) DESC, c.cluster_id DESC)
        AS rn
    FROM pq_e e CROSS JOIN sd_cent c) WHERE rn = 1),
sd_dom AS (
  SELECT DISTINCT a.vec_id
  FROM sd_assign a JOIN sd_assign b
    ON b.cluster_id = a.cluster_id AND b.vec_id != a.vec_id
  WHERE (b.sim < a.sim OR (b.sim = a.sim AND b.vec_id < a.vec_id))
    AND list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v))
         * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
sd AS (
  SELECT a.vec_id, a.cluster_id, a.sim, (d.vec_id IS NULL) AS is_kept
  FROM sd_assign a LEFT JOIN sd_dom d ON d.vec_id = a.vec_id),
-- SEMANTIC-DECONTAMINATION twin (round 10, operators/
-- semantic_decon.py impl='expr'): benchmark = the vec_id % 7 = 0
-- slice; per corpus row the max fold-cosine to any benchmark row
-- (ties to the smaller bench id), NULL-guarded for zero-norm
-- vectors, flagged at >= 0.4.
sdc_b AS (SELECT vec_id AS bid, v FROM pq_e WHERE vec_id % 7 = 0),
sdc_s AS (
  SELECT c.vec_id, b.bid,
    CASE WHEN sqrt(list_dot_product(c.v, c.v)) = 0 THEN NULL
         ELSE list_dot_product(c.v, b.v)
           / (sqrt(list_dot_product(c.v, c.v))
              * sqrt(list_dot_product(b.v, b.v))) END AS cos
  FROM pq_e c CROSS JOIN sdc_b b),
sdc AS (
  SELECT vec_id, cos AS max_bench_cos,
    CASE WHEN cos IS NOT NULL AND NOT isnan(cos) THEN bid END AS mbid,
    coalesce(cos >= 0.4, FALSE) AS flag
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY cos DESC NULLS LAST, bid ASC) AS rn FROM sdc_s)
  WHERE rn = 1),
-- IVF-PQ twin (round 10, operators/pq.py portable composition):
-- coarse centroids = sd_cent (the same 8 hash-min normalized
-- seeds), assignment by fold dot with ties to the LARGER list,
-- residual r = normalized vector minus its centroid, residual
-- codebook = the 16 hash-min residuals (id-ordered), residual
-- codes by the fold-exact argmin, probes = 3 best centroids per
-- query (ties to the SMALLER list), score = 1-(u.u-2u.w+w.w)/2.
iq_n AS (
  SELECT vec_id, [x / sqrt(list_dot_product(v, v)) FOR x IN v] AS nv
  FROM pq_e),
iq_asg AS (
  SELECT vec_id, nv, cluster_id AS list_id, c FROM (
    SELECT n.vec_id, n.nv, c.cluster_id, c.c,
      row_number() OVER (PARTITION BY n.vec_id
        ORDER BY list_dot_product(n.nv, c.c) DESC, c.cluster_id DESC)
        AS rn
    FROM iq_n n CROSS JOIN sd_cent c) WHERE rn = 1),
iq_res AS (
  SELECT vec_id, list_id,
    list_transform(nv, (x, i) -> x - c[i]) AS r
  FROM iq_asg),
iq_rseeds AS (
  SELECT vec_id, r FROM iq_res
  ORDER BY CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                AS BIGINT), vec_id
  LIMIT 16),
iq_rcb AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1
           AS code, r
  FROM iq_rseeds),
iq_rsubs AS (
  SELECT cb.code, t.s, list_slice(cb.r, t.s*8 + 1, t.s*8 + 8) AS c
  FROM iq_rcb cb, range(8) t(s)),
iq_xsubs AS (
  SELECT iq_res.vec_id, t.s,
    list_slice(iq_res.r, t.s*8 + 1, t.s*8 + 8) AS x
  FROM iq_res, range(8) t(s)),
iq_passign AS (
  SELECT vec_id, s, code FROM (
    SELECT xs.vec_id, xs.s, sb.code,
      row_number() OVER (PARTITION BY xs.vec_id, xs.s
        ORDER BY list_dot_product(sb.c, sb.c)
                 - 2*list_dot_product(xs.x, sb.c) ASC,
                 sb.code ASC) AS rn
    FROM iq_xsubs xs JOIN iq_rsubs sb ON sb.s = xs.s) WHERE rn = 1),
iq_codes AS (
  SELECT vec_id, array_to_string(list(code ORDER BY s), '-') AS cs
  FROM iq_passign GROUP BY vec_id),
iq_recon AS (
  SELECT p.vec_id, flatten(list(sb.c ORDER BY p.s)) AS w
  FROM iq_passign p
  JOIN iq_rsubs sb ON sb.s = p.s AND sb.code = p.code
  GROUP BY p.vec_id),
iq_probe AS (
  SELECT query_id, list_id,
    list_transform(nv, (x, i) -> x - c[i]) AS u
  FROM (
    SELECT q.vec_id AS query_id, q.nv, c.cluster_id AS list_id, c.c,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY list_dot_product(q.nv, c.c) DESC, c.cluster_id ASC)
        AS rn
    FROM iq_n q CROSS JOIN sd_cent c WHERE q.vec_id < 10)
  WHERE rn <= 3),
iq_scored AS (
  SELECT p.query_id, a.vec_id AS cand_id,
    1 - (list_dot_product(p.u, p.u) - 2*list_dot_product(p.u, r.w)
         + list_dot_product(r.w, r.w)) / 2 AS adc_cos
  FROM iq_probe p
  JOIN iq_asg a ON a.list_id = p.list_id
  JOIN iq_recon r ON r.vec_id = a.vec_id
  WHERE a.vec_id != p.query_id),
iq_top AS (
  SELECT * FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY adc_cos DESC, cand_id) AS INTEGER) AS rank
    FROM iq_scored) WHERE rank <= 5)
SELECT 'set_ops_customers' AS "check", CAST(count(*) AS DOUBLE) AS value FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL SELECT 'intersect_all_rows', CAST(count(*) AS DOUBLE) FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
UNION ALL SELECT 'except_all_rows', CAST(count(*) AS DOUBLE) FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
UNION ALL SELECT 'customers_without_orders', CAST(no_orders AS DOUBLE) FROM fo
UNION ALL SELECT 'orphan_orders', CAST(orphans AS DOUBLE) FROM fo
UNION ALL SELECT 'full_outer_rows', CAST(n_rows AS DOUBLE) FROM fo
UNION ALL SELECT 'lineitem_rows', CAST(n_rows AS DOUBLE) FROM ga
UNION ALL SELECT 'min_qty', CAST(min_qty AS DOUBLE) FROM ga
UNION ALL SELECT 'max_qty', CAST(max_qty AS DOUBLE) FROM ga
UNION ALL SELECT 'min_price', CAST(min_price AS DOUBLE) FROM ga
UNION ALL SELECT 'max_price', CAST(max_price AS DOUBLE) FROM ga
UNION ALL SELECT 'orders_via_constant_join', CAST(count(*) AS DOUBLE)
  FROM orders o
  CROSS JOIN (SELECT 1 AS SOURCE_KEY, 'Weather Source LLC' AS PROVIDER) s
UNION ALL SELECT 'unpivot_rows', CAST(count(*) AS DOUBLE) FROM unpl
UNION ALL SELECT 'unpivot_total_orders', CAST(sum(n) AS DOUBLE) FROM unpl
UNION ALL SELECT 'unpivot_f_orders',
  CAST(sum(CASE WHEN status_col = 'n_f' THEN n END) AS DOUBLE) FROM unpl
UNION ALL SELECT 'hof_sq_norm_sum', sq_sum FROM hof
UNION ALL SELECT 'hof_pos_components', CAST(pos_sum AS DOUBLE) FROM hof
UNION ALL SELECT 'hof_dot_rev_sum', dot_sum FROM hof
UNION ALL SELECT 'hof_clip_sum', clip_sum FROM hof
UNION ALL SELECT 'pq_code_digest',
  CAST(SUM(CAST('0x' || substring(md5(vec_id || ':' || cs), 1, 15)
       AS BIGINT) % 2147483647) AS DOUBLE)
  FROM pq_codes
UNION ALL SELECT 'pq_encoded_rows', CAST(count(*) AS DOUBLE) FROM pq_codes
UNION ALL SELECT 'pq_topk_digest',
  CAST(SUM(CAST('0x' || substring(
       md5(query_id || ':' || cand_id || ':' || rank), 1, 15)
       AS BIGINT) % 2147483647) AS DOUBLE)
  FROM pq_top
UNION ALL SELECT 'pq_adc_dist_sum',
  CAST(round(CAST(SUM(CAST(round(adc_dist, 9) AS DECIMAL(25,9)))
       AS DOUBLE), 6) AS DOUBLE)
  FROM pq_top
UNION ALL SELECT 'sd_rows', CAST(count(*) AS DOUBLE) FROM sd
UNION ALL SELECT 'sd_kept_rows',
  CAST(count(*) FILTER (WHERE is_kept) AS DOUBLE) FROM sd
UNION ALL SELECT 'sd_digest',
  CAST(SUM(CAST('0x' || substring(md5(vec_id || ':' || cluster_id
       || ':' || CAST(is_kept AS VARCHAR)), 1, 15) AS BIGINT)
       % 2147483647) AS DOUBLE)
  FROM sd
UNION ALL SELECT 'sd_sim_sum',
  CAST(round(CAST(SUM(CAST(round(sim, 9) AS DECIMAL(25,9)))
       AS DOUBLE), 6) AS DOUBLE)
  FROM sd
UNION ALL SELECT 'sdc_rows', CAST(count(*) AS DOUBLE) FROM sdc
UNION ALL SELECT 'sdc_flagged_rows',
  CAST(count(*) FILTER (WHERE flag) AS DOUBLE) FROM sdc
UNION ALL SELECT 'sdc_digest',
  CAST(SUM(CAST('0x' || substring(md5(vec_id || ':'
       || coalesce(CAST(mbid AS VARCHAR), '-1') || ':'
       || CAST(flag AS VARCHAR)), 1, 15) AS BIGINT)
       % 2147483647) AS DOUBLE)
  FROM sdc
UNION ALL SELECT 'sdc_cos_sum',
  CAST(round(CAST(SUM(CAST(round(max_bench_cos, 9) AS DECIMAL(25,9)))
       AS DOUBLE), 6) AS DOUBLE)
  FROM sdc
UNION ALL SELECT 'ivfpq_code_digest',
  CAST(SUM(CAST('0x' || substring(md5(a.vec_id || ':' || a.list_id
       || ':' || c.cs), 1, 15) AS BIGINT) % 2147483647) AS DOUBLE)
  FROM iq_asg a JOIN iq_codes c ON c.vec_id = a.vec_id
UNION ALL SELECT 'ivfpq_topk_digest',
  CAST(SUM(CAST('0x' || substring(
       md5(query_id || ':' || cand_id || ':' || rank), 1, 15)
       AS BIGINT) % 2147483647) AS DOUBLE)
  FROM iq_top
UNION ALL SELECT 'ivfpq_adc_cos_sum',
  CAST(round(CAST(SUM(CAST(round(adc_cos, 9) AS DECIMAL(25,9)))
       AS DOUBLE), 6) AS DOUBLE)
  FROM iq_top
UNION ALL SELECT 'ivfpq_topk_rows', CAST(count(*) AS DOUBLE) FROM iq_top
UNION ALL SELECT 'diff_inserted', CAST(n_inserted AS DOUBLE) FROM cdc
UNION ALL SELECT 'diff_deleted', CAST(n_deleted AS DOUBLE) FROM cdc
UNION ALL SELECT 'diff_updated', CAST(n_updated AS DOUBLE) FROM cdc
UNION ALL SELECT 'diff_unchanged', CAST(n_unchanged AS DOUBLE) FROM cdc
UNION ALL SELECT 'fuzzy_name_pairs_d1', CAST(d1 AS DOUBLE) FROM fz
UNION ALL SELECT 'fuzzy_name_pairs_d2', CAST(d2 AS DOUBLE) FROM fz
UNION ALL SELECT 'fuzzy_name_dist_sum', CAST(sum_d AS DOUBLE) FROM fz
UNION ALL SELECT 'er_n_values', CAST(n_values AS DOUBLE) FROM er
UNION ALL SELECT 'er_n_clusters', CAST(n_clusters AS DOUBLE) FROM er
UNION ALL SELECT 'er_max_cluster', CAST(max_cluster AS DOUBLE) FROM er
UNION ALL SELECT 'er_merged_values', CAST(merged_values AS DOUBLE) FROM er
UNION ALL SELECT 'merge_v2_rows', CAST(count(*) AS DOUBLE) FROM lk_v2
UNION ALL SELECT 'merge_v2_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM lk_v2
UNION ALL SELECT 'merge_v3_rows', CAST(count(*) AS DOUBLE) FROM lk_v3
UNION ALL SELECT 'merge_v3_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM lk_v3
UNION ALL SELECT 'merge_tt_v1_rows', CAST(count(*) AS DOUBLE) FROM lk_base
UNION ALL SELECT 'merge_tt_v1_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM lk_base
UNION ALL SELECT 'merge_set_v4_rows', CAST(count(*) AS DOUBLE)
  FROM lk_v4
UNION ALL SELECT 'merge_set_v4_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM lk_v4
UNION ALL SELECT 'merge_bloom_lookup_price',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM lk_v3, lk_k0 WHERE o_orderkey = k0
UNION ALL SELECT 'lsql_tt_v1_rows', CAST(count(*) AS DOUBLE) FROM lk_base
UNION ALL SELECT 'lsql_tt_v1_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM lk_base
UNION ALL SELECT 'clone_v1_rows', CAST(count(*) AS DOUBLE) FROM lk_base
UNION ALL SELECT 'clone_v1_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM lk_base
UNION ALL SELECT 'clone_head_rows', CAST(count(*) + 1 AS DOUBLE)
  FROM lk_base
UNION ALL SELECT 'clone_head_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
    + CAST(10.0 AS DECIMAL(25,6)) AS DOUBLE), 4)
  FROM lk_base
UNION ALL SELECT 'rw_rows', CAST(count(*) + 1 AS DOUBLE) FROM lk_base
UNION ALL SELECT 'rw_price_sum',
  round(CAST(sum(CAST(
      CASE WHEN o_orderkey % 11 = 3 THEN o_totalprice * 2
           ELSE o_totalprice END AS DECIMAL(25,6)))
    + CAST(10.0 AS DECIMAL(25,6)) AS DOUBLE), 4)
  FROM lk_base
UNION ALL SELECT 'changefeed_plus_rows', CAST(plus_rows AS DOUBLE) FROM cfd
UNION ALL SELECT 'changefeed_minus_rows', CAST(minus_rows AS DOUBLE) FROM cfd
UNION ALL SELECT 'changefeed_net_price_sum', net_price FROM cfd
UNION ALL SELECT 'read_since_rows', CAST(count(*) AS DOUBLE) FROM rs_app
UNION ALL SELECT 'read_since_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM rs_app
UNION ALL SELECT 'dv_mor_rows', CAST(count(*) AS DOUBLE) FROM lk_v2
UNION ALL SELECT 'dv_mor_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM lk_v2
UNION ALL SELECT 'dv_del_rows', CAST(count(*) AS DOUBLE) FROM lk_v3
UNION ALL SELECT 'dv_del_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM lk_v3
UNION ALL SELECT 'dv_purge_rows', CAST(count(*) AS DOUBLE) FROM lk_v3
UNION ALL SELECT 'dv_purge_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM lk_v3
UNION ALL SELECT 'salted_join_rows', CAST(count(*) AS DOUBLE)
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL SELECT 'salted_join_price_sum',
  round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL SELECT 'salted_join_segments',
  CAST(count(DISTINCT c.c_mktsegment) AS DOUBLE)
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL SELECT 'zm_date_rows', CAST(count(*) AS DOUBLE) FROM zm_win
UNION ALL SELECT 'zm_date_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM zm_win
UNION ALL SELECT 'zm_key_rows', CAST(count(*) AS DOUBLE) FROM zm_key
UNION ALL SELECT 'zm_key_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM zm_key
UNION ALL SELECT 'zb_box_rows', CAST(count(*) AS DOUBLE) FROM zb_box
UNION ALL SELECT 'zb_box_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM zb_box
UNION ALL SELECT 'oc_rows', CAST(count(*) AS DOUBLE) FROM oc_head
UNION ALL SELECT 'oc_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM oc_head
UNION ALL SELECT 'oc_box_rows', CAST(count(*) AS DOUBLE) FROM oc_box
UNION ALL SELECT 'oc_box_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM oc_box
UNION ALL SELECT 'tx_fact_rows', CAST(count(*) AS DOUBLE) FROM tx_fact
UNION ALL SELECT 'tx_fact_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM tx_fact
UNION ALL SELECT 'tx_dim_rows', CAST(count(*) AS DOUBLE) FROM tx_dim
UNION ALL SELECT 'tx_dim_acct_sum',
  round(CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM tx_dim
UNION ALL SELECT 'tx_join_rows', CAST(count(*) AS DOUBLE) FROM tx_join
UNION ALL SELECT 'tx_join_price_sum',
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 4)
  FROM tx_join
UNION ALL SELECT 'q3_rows', CAST(count(*) AS DOUBLE) FROM q3_top
UNION ALL SELECT 'q3_rev_sum',
  round(CAST(sum(q3rev) AS DOUBLE), 4) FROM q3_top
UNION ALL SELECT 'q3_orderkey_sum',
  CAST(sum(l_orderkey) AS DOUBLE) FROM q3_top
UNION ALL SELECT 'q5_nations', CAST(count(*) AS DOUBLE) FROM q5_nations
UNION ALL SELECT 'q5_rev_sum',
  round(CAST(sum(q5rev) AS DOUBLE), 4) FROM q5_nations
UNION ALL SELECT 'q5_max_rev',
  round(CAST(max(q5rev) AS DOUBLE), 4) FROM q5_nations
UNION ALL SELECT 'q10_rows', CAST(count(*) AS DOUBLE) FROM q10_top
UNION ALL SELECT 'q10_rev_sum',
  round(CAST(sum(q10rev) AS DOUBLE), 4) FROM q10_top
UNION ALL SELECT 'q10_custkey_sum',
  CAST(sum(c_custkey) AS DOUBLE) FROM q10_top
UNION ALL SELECT 'q14_rows', CAST(count(*) AS DOUBLE) FROM q14_m
UNION ALL SELECT 'q14_promo_ratio',
  round(100.0 * CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN rev
                        ELSE CAST(0 AS DECIMAL(25,10)) END) AS DOUBLE)
        / CAST(sum(rev) AS DOUBLE), 9) FROM q14_m
UNION ALL SELECT 'q18_rows', CAST(count(*) AS DOUBLE) FROM q18_big
UNION ALL SELECT 'q18_qty_sum',
  round(CAST(sum(oqty) AS DOUBLE), 4) FROM q18_big
UNION ALL SELECT 'q18_custkey_sum',
  CAST(sum(c_custkey) AS DOUBLE) FROM q18_big
UNION ALL SELECT 'q19_rows', CAST(count(*) AS DOUBLE) FROM q19_m
UNION ALL SELECT 'q19_rev_sum',
  round(CAST(sum(rev) AS DOUBLE), 4) FROM q19_m
UNION ALL SELECT 'q15_rows', CAST(count(*) AS DOUBLE) FROM q15_top
UNION ALL SELECT 'q15_top_rev',
  round(CAST(max(srev) AS DOUBLE), 4) FROM q15_top
UNION ALL SELECT 'q15_suppkey_sum',
  CAST(sum(l_suppkey) AS DOUBLE) FROM q15_top
UNION ALL SELECT 'q16_groups', CAST(count(*) AS DOUBLE) FROM q16_groups
UNION ALL SELECT 'q16_supp_sum',
  CAST(sum(nsupp) AS DOUBLE) FROM q16_groups
UNION ALL SELECT 'q17_rows', CAST(count(*) AS DOUBLE) FROM q17_m
UNION ALL SELECT 'q17_avg_yearly',
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,10))) AS DOUBLE)
        / 7.0, 4) FROM q17_m
UNION ALL SELECT 'q22_rows', CAST(count(*) AS DOUBLE) FROM q22_m
UNION ALL SELECT 'q22_acctbal_sum',
  round(CAST(sum(CAST(c_acctbal AS DECIMAL(25,10))) AS DOUBLE), 4)
  FROM q22_m
UNION ALL SELECT 'q4_groups', CAST(count(*) AS DOUBLE) FROM q4_g
UNION ALL SELECT 'q4_order_count', CAST(sum(cnt) AS DOUBLE) FROM q4_g
UNION ALL SELECT 'q4_digest', CAST(sum(
  CAST('0x' || substring(md5(o_orderpriority || ':'
    || CAST(cnt AS VARCHAR)), 1, 15) AS BIGINT) % 2147483647)
  AS DOUBLE) FROM q4_g
UNION ALL SELECT 'q12_modes', CAST(count(*) AS DOUBLE) FROM q12_g
UNION ALL SELECT 'q12_high_sum', CAST(sum(high) AS DOUBLE) FROM q12_g
UNION ALL SELECT 'q12_low_sum', CAST(sum(low) AS DOUBLE) FROM q12_g
UNION ALL SELECT 'q7_groups', CAST(count(*) AS DOUBLE) FROM q7_g
UNION ALL SELECT 'q7_rev_sum', round(CAST(sum(vol) AS DOUBLE), 4)
  FROM q7_g
UNION ALL SELECT 'q7_digest', CAST(sum(
  CAST('0x' || substring(md5(supp_nation || ':' || cust_nation
    || ':' || CAST(l_year AS VARCHAR)), 1, 15) AS BIGINT)
  % 2147483647) AS DOUBLE) FROM q7_g
UNION ALL SELECT 'q8_years', CAST(count(*) AS DOUBLE) FROM q8_g
UNION ALL SELECT 'q8_share_sum', round(sum(
  CAST(nat_rev AS DOUBLE) / CAST(all_rev AS DOUBLE)), 9) FROM q8_g
UNION ALL SELECT 'q9_groups', CAST(count(*) AS DOUBLE) FROM q9_g
UNION ALL SELECT 'q9_rev_sum', round(CAST(sum(grev) AS DOUBLE), 4)
  FROM q9_g
UNION ALL SELECT 'q9_cost_cents_sum', CAST(sum(gcost) AS DOUBLE)
  FROM q9_g
UNION ALL SELECT 'q9_digest', CAST(sum(
  CAST('0x' || substring(md5(supp_nation || ':'
    || CAST(o_year AS VARCHAR)), 1, 15) AS BIGINT) % 2147483647)
  AS DOUBLE) FROM q9_g
UNION ALL SELECT 'q11_parts', CAST(count(*) AS DOUBLE) FROM q11_g
UNION ALL SELECT 'q11_value_cents_sum', CAST(sum(pval) AS DOUBLE)
  FROM q11_g
UNION ALL SELECT 'q11_partkey_sum', CAST(sum(ps_partkey) AS DOUBLE)
  FROM q11_g
UNION ALL SELECT 'q13_groups', CAST(count(*) AS DOUBLE) FROM q13_g
UNION ALL SELECT 'q13_customers', CAST(sum(custdist) AS DOUBLE)
  FROM q13_g
UNION ALL SELECT 'q13_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(c_count AS VARCHAR) || ':'
    || CAST(custdist AS VARCHAR)), 1, 15) AS BIGINT) % 2147483647)
  AS DOUBLE) FROM q13_g
UNION ALL SELECT 'q20_suppliers', CAST(count(*) AS DOUBLE) FROM q20_g
UNION ALL SELECT 'q20_suppkey_sum', CAST(sum(ps_suppkey) AS DOUBLE)
  FROM q20_g
UNION ALL SELECT 'q21_suppliers', CAST(count(*) AS DOUBLE) FROM q21_g
UNION ALL SELECT 'q21_numwait_sum', CAST(sum(numwait) AS DOUBLE)
  FROM q21_g
UNION ALL SELECT 'q21_suppkey_sum', CAST(sum(l_suppkey) AS DOUBLE)
  FROM q21_g
UNION ALL SELECT 'q2_rows', CAST(count(*) AS DOUBLE) FROM q2_m
UNION ALL SELECT 'q2_suppkey_sum', CAST(sum(ps_suppkey) AS DOUBLE)
  FROM q2_m
UNION ALL SELECT 'q2_acctbal_sum', round(CAST(sum(
  CAST(s_acctbal AS DECIMAL(25,10))) AS DOUBLE), 4) FROM q2_m
UNION ALL SELECT 'q2_mincents_sum', CAST(sum(mincents) AS DOUBLE)
  FROM q2_m
UNION ALL SELECT 'geo_pairs', CAST(count(*) AS DOUBLE) FROM geo_m
UNION ALL SELECT 'geo_dist2_digest',
  CAST(sum(dist2 % 2147483647) AS DOUBLE) FROM geo_m
UNION ALL SELECT 'geo_pair_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(a_id AS VARCHAR) || ':'
    || CAST(b_id AS VARCHAR)), 1, 15) AS BIGINT) % 2147483647)
  AS DOUBLE) FROM geo_m
UNION ALL SELECT 'geo_knn_rows', CAST(count(*) AS DOUBLE) FROM geo_knn
UNION ALL SELECT 'geo_knn_rank_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(a_id AS VARCHAR) || ':'
    || CAST(b_id AS VARCHAR) || ':' || CAST(knn_rank AS VARCHAR)),
    1, 15) AS BIGINT) % 2147483647) AS DOUBLE) FROM geo_knn
UNION ALL SELECT 'geo_knn_dist2_digest',
  CAST(sum(dist2 % 2147483647) AS DOUBLE) FROM geo_knn
UNION ALL SELECT 'geo_knnc_rows', CAST(count(*) AS DOUBLE)
  FROM geo_knnc
UNION ALL SELECT 'geo_knnc_rank_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(a_id AS VARCHAR) || ':'
    || CAST(b_id AS VARCHAR) || ':' || CAST(knn_rank AS VARCHAR)),
    1, 15) AS BIGINT) % 2147483647) AS DOUBLE) FROM geo_knnc
UNION ALL SELECT 'geo_knnc_dist2_digest',
  CAST(sum(dist2 % 2147483647) AS DOUBLE) FROM geo_knnc
UNION ALL SELECT 'geo_sph_pairs', CAST(count(*) AS DOUBLE) FROM sph_m
UNION ALL SELECT 'geo_sph_km_digest', CAST(sum(km_r6) AS DOUBLE)
  FROM sph_m
UNION ALL SELECT 'geo_sph_pair_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(a_id AS VARCHAR) || ':'
    || CAST(b_id AS VARCHAR)), 1, 15) AS BIGINT) % 2147483647)
  AS DOUBLE) FROM sph_m
UNION ALL SELECT 'geo_sknn_rows', CAST(count(*) AS DOUBLE)
  FROM sph_knn
UNION ALL SELECT 'geo_sknn_km_digest', CAST(sum(km_r6) AS DOUBLE)
  FROM sph_knn
UNION ALL SELECT 'geo_sknn_rank_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(a_id AS VARCHAR) || ':'
    || CAST(b_id AS VARCHAR) || ':' || CAST(knn_rank AS VARCHAR)),
    1, 15) AS BIGINT) % 2147483647) AS DOUBLE) FROM sph_knn
UNION ALL SELECT 'geo_sql_pairs', CAST(count(*) AS DOUBLE)
  FROM geo_m WHERE dist2 <= CAST(5000000 AS BIGINT) * 5000000
UNION ALL SELECT 'geo_sql_dist2_digest',
  CAST(sum(dist2 % 2147483647) AS DOUBLE)
  FROM geo_m WHERE dist2 <= CAST(5000000 AS BIGINT) * 5000000
UNION ALL SELECT 'geo_pip_pairs', CAST(count(*) AS DOUBLE) FROM pipin
UNION ALL SELECT 'geo_pip_pair_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(a_id AS VARCHAR) || ':'
    || CAST(pg AS VARCHAR)), 1, 15) AS BIGINT) % 2147483647)
  AS DOUBLE) FROM pipin
UNION ALL SELECT 'geo_gpip_pairs', CAST(count(*) AS DOUBLE)
  FROM gpipin
UNION ALL SELECT 'geo_gpip_pair_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(a_id AS VARCHAR) || ':'
    || CAST(pg AS VARCHAR)), 1, 15) AS BIGINT) % 2147483647)
  AS DOUBLE) FROM gpipin
UNION ALL SELECT 'geo_sqlg_pip_pairs', CAST(count(*) AS DOUBLE)
  FROM gpipin
UNION ALL SELECT 'geo_sqlg_pip_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(a_id AS VARCHAR) || ':'
    || CAST(pg AS VARCHAR)), 1, 15) AS BIGINT) % 2147483647)
  AS DOUBLE) FROM gpipin
UNION ALL SELECT 'geo_sqlg_knn_rows', CAST(count(*) AS DOUBLE)
  FROM sph_knn
UNION ALL SELECT 'geo_sqlg_knn_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(a_id AS VARCHAR) || ':'
    || CAST(b_id AS VARCHAR) || ':' || CAST(knn_rank AS VARCHAR)),
    1, 15) AS BIGINT) % 2147483647) AS DOUBLE) FROM sph_knn
UNION ALL SELECT 'ts_users', users FROM tsr
UNION ALL SELECT 'ts_alarm_sum', alarms FROM tsr
UNION ALL SELECT 'ts_ewma_sum', ewma_sum FROM tsr
UNION ALL SELECT 'ts_cpos_sum', cpos_sum FROM tsr
UNION ALL SELECT 'ts_holt_level_sum', holt_level_sum FROM tsr
UNION ALL SELECT 'ts_holt_trend_sum', holt_trend_sum FROM tsr
UNION ALL SELECT 'ts_hw_users', users FROM hwr
UNION ALL SELECT 'ts_hw_level_sum', lsum FROM hwr
UNION ALL SELECT 'ts_hw_trend_sum', tsum FROM hwr
UNION ALL SELECT 'ts_hw_forecast_sum', fsum FROM hwr
UNION ALL SELECT 'ts_cc_users', CAST(count(*) AS DOUBLE)
  FROM tscc_last
UNION ALL SELECT 'ts_cc_exceed_sum', CAST(sum(exc) AS DOUBLE)
  FROM tscc_exc
UNION ALL SELECT 'ts_cc_pos_sum', CAST(sum(
  CAST(round(cp, 9) AS DECIMAL(25,9))) AS DOUBLE) FROM tscc_last
UNION ALL SELECT 'ts_cc_neg_sum', CAST(sum(
  CAST(round(cn, 9) AS DECIMAL(25,9))) AS DOUBLE) FROM tscc_last
UNION ALL SELECT 'corr_qty_price', corr_qty_price FROM mx
UNION ALL SELECT 'slope_price_on_qty', slope_price_on_qty FROM mx
UNION ALL SELECT 'cov_pop_qty_price', cov_pop_qty_price FROM mx
UNION ALL SELECT 'mean_user_twap', mean_user_twap FROM twap
UNION ALL SELECT 'n_twap_users', CAST(n_twap_users AS DOUBLE) FROM twap
UNION ALL SELECT 'seq_len_sum', CAST(len_sum AS DOUBLE) FROM sqa
UNION ALL SELECT 'seq_total_matches', CAST(total_matches AS DOUBLE) FROM sqa
UNION ALL SELECT 'seq_users_matched', CAST(users_matched AS DOUBLE) FROM sqa
UNION ALL SELECT 'seq_first_pos_sum', CAST(fp_sum AS DOUBLE) FROM sqa
UNION ALL SELECT 'seq_def_total_matches', CAST(total_matches AS DOUBLE)
  FROM sqda
UNION ALL SELECT 'seq_def_users_matched', CAST(users_matched AS DOUBLE)
  FROM sqda
UNION ALL SELECT 'seq_def_first_pos_sum', CAST(fp_sum AS DOUBLE)
  FROM sqda
UNION ALL SELECT 'tm_cells', CAST(cells AS DOUBLE) FROM tm
UNION ALL SELECT 'tm_steps', CAST(steps AS DOUBLE) FROM tm
UNION ALL SELECT 'tm_p_sum', psum FROM tm
UNION ALL SELECT 'tm_start_max_p', pstart FROM tm
UNION ALL SELECT 'co_pairs', CAST(pairs AS DOUBLE) FROM co
UNION ALL SELECT 'co_n_both_sum', CAST(nb AS DOUBLE) FROM co
UNION ALL SELECT 'co_support_sum', sup FROM co
UNION ALL SELECT 'co_lift_sum', lf FROM co
UNION ALL SELECT 'json_cust_key_sum', CAST(cust_key_sum AS DOUBLE) FROM jsc
UNION ALL SELECT 'json_seg1_rows', CAST(seg1 AS DOUBLE) FROM jsc
UNION ALL SELECT 'json_missing_null_rows', CAST(miss_null AS DOUBLE) FROM jsc
UNION ALL SELECT 'jshred_cust_key_sum', CAST(cust_key_sum AS DOUBLE) FROM jsc
UNION ALL SELECT 'jshred_seg1_rows', CAST(seg1 AS DOUBLE) FROM jsc
UNION ALL SELECT 'json_tag_rows', CAST(tag_rows AS DOUBLE) FROM jtg
UNION ALL SELECT 'json_tag_t0_rows', CAST(t0_rows AS DOUBLE) FROM jtg
UNION ALL SELECT 'json_distinct_tags', CAST(distinct_tags AS DOUBLE) FROM jtg
UNION ALL SELECT 'json_amounts_sum', CAST(amounts_sum AS DOUBLE) FROM jam
UNION ALL SELECT 'json_outer_missing_rows', CAST(n AS DOUBLE) FROM jom""",
    "tpch_pivot_status": """
SELECT o_orderpriority,
  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "tpch_rollup_counts": """
SELECT o_orderpriority, o_orderstatus,
  CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
  count(*) AS n_orders, 'rollup' AS grouping_form
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
UNION ALL
SELECT o_orderpriority, o_orderstatus,
  CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
  count(*) AS n_orders, 'cube' AS grouping_form
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
UNION ALL
SELECT o_orderpriority, o_orderstatus,
  CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
  count(*) AS n_orders, 'sets' AS grouping_form
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""",
    "tpch_distinct_agg": """
SELECT o_orderpriority,
  count(DISTINCT l_suppkey) AS n_suppliers,
  count(DISTINCT l_partkey) AS n_parts,
  count(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "tpch_countif_ratio": """
SELECT o_orderpriority,
  count(*) FILTER (WHERE o_totalprice > 250000) * 100.0 / count(*)
    AS PCT_HIGH_VALUE
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
}


def _pr_oracle_parts(damping_pct: int = 85, n_iter: int = 10):
    """DuckDB twin of operators/pagerank.pagerank_exact's documented
    integer recurrence, as (CTE text, UNION-ALL row text) spliced into
    tpch_scalar_checks below. n_iter is FIXED, so the recursion is
    simply n_iter CHAINED CTEs (a recursive CTE may reference the
    recursive table only once per term — the update needs three reads:
    inflow join, dangling aggregate, per-node base). `//` is DuckDB's
    floor division = Spark's `div` on these non-negative bigints;
    every per-iteration value is CAST back to BIGINT so HUGEINT sums
    never change the rendered digest strings."""
    dp = int(damping_pct)
    ctes = [
        """pr_edges AS MATERIALIZED (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS s,
                  'p' || CAST(l_partkey AS VARCHAR) AS d
  FROM lineitem),
pr_nd AS MATERIALIZED (
  -- no top-level UNION: the surrounding WITH RECURSIVE would parse
  -- this CTE as recursive (base UNION step) and break the dedup
  SELECT DISTINCT node FROM (
    SELECT s AS node FROM pr_edges
    UNION ALL SELECT d AS node FROM pr_edges)),
pr_n AS MATERIALIZED (SELECT count(*) AS n FROM pr_nd),
pr_deg AS MATERIALIZED (SELECT s, count(*) AS deg FROM pr_edges GROUP BY s),
pr_it0 AS MATERIALIZED (
  SELECT n.node, CAST(1000000000000 // c.n AS BIGINT) AS r
  FROM pr_nd n CROSS JOIN pr_n c),"""
    ]
    for k in range(1, n_iter + 1):
        ctes.append(
            f"""pr_it{k} AS MATERIALIZED (
  SELECT n.node, CAST(
    (({100 - dp}) * (1000000000000 // c.n)) // 100
    + ({dp} * (COALESCE(f.inflow, CAST(0 AS BIGINT))
               + dg.dm // c.n)) // 100 AS BIGINT) AS r
  FROM pr_nd n
  CROSS JOIN pr_n c
  CROSS JOIN (SELECT COALESCE(sum(p.r), CAST(0 AS BIGINT)) AS dm
              FROM pr_it{k - 1} p
              LEFT JOIN pr_deg dd ON p.node = dd.s
              WHERE dd.s IS NULL) dg
  LEFT JOIN (SELECT e.d AS node, sum(p.r // dd.deg) AS inflow
             FROM pr_it{k - 1} p
             JOIN pr_deg dd ON p.node = dd.s
             JOIN pr_edges e ON e.s = p.node
             GROUP BY e.d) f ON f.node = n.node),"""
        )
    ctes.append(
        f"""pr_top AS MATERIALIZED (
  SELECT node, r FROM pr_it{n_iter}
  ORDER BY r DESC, node ASC LIMIT 50),"""
    )
    dig = (
        "CAST(sum(CAST('0x' || substring(md5(node || ':' "
        "|| CAST(r AS VARCHAR)), 1, 15) AS BIGINT) "
        "% 2147483647) AS DOUBLE)"
    )
    rows = f"""
UNION ALL SELECT 'pr_nodes', CAST((SELECT n FROM pr_n) AS DOUBLE)
UNION ALL SELECT 'pr_mass_units', CAST(sum(r) AS DOUBLE)
  FROM pr_it{n_iter}
UNION ALL SELECT 'pr_rank_digest', {dig} FROM pr_it{n_iter}
UNION ALL SELECT 'pr_top50_digest', {dig} FROM pr_top
UNION ALL SELECT 'pr_top50_mass', CAST(sum(r) AS DOUBLE) FROM pr_top"""
    return "\n".join(ctes), rows


def _ks_oracle_parts(k: int = 8, n_iter: int = 3):
    """DuckDB twin of operators/kmeans.kmeans_exact (ks_* rows):
    quantize components to micro-units, hash-min seeds, then n_iter
    chained assign+update CTE pairs with the SAME integer recurrence
    (argmin ties to the lower cluster id; centroid update = trunc
    integer division, spelled with a sign CASE around DuckDB's floor
    `//` to equal Spark's `div`; empty clusters keep their previous
    centroid). Like the PageRank twin, iterations are CHAINED CTEs
    (fixed count), MATERIALIZED so inlining can't blow up, and no CTE
    body has a top-level UNION (the surrounding WITH RECURSIVE would
    parse it as a recursive base/step pair — observed on pr_nd)."""
    ctes = [
        """ks_q AS MATERIALIZED (
  SELECT vec_id, pos,
    CAST(round(CAST(v AS DOUBLE) * CAST(1000000.0 AS DOUBLE), 0)
      AS BIGINT) AS q
  FROM (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding) AS v
        FROM embeddings)),
ks_seeds AS MATERIALIZED (
  SELECT vec_id FROM embeddings
  ORDER BY CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)
             AS BIGINT), vec_id
  LIMIT """ + str(k) + """),
ks_c0 AS MATERIALIZED (
  SELECT c.cid, q.pos, q.q AS val
  FROM (SELECT vec_id,
          CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid
        FROM ks_seeds) c
  JOIN ks_q q ON q.vec_id = c.vec_id),"""
    ]
    for i in range(n_iter):
        ctes.append(
            f"""ks_a{i} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT d.vec_id, d.cid,
      row_number() OVER (PARTITION BY d.vec_id
                         ORDER BY d.d2, d.cid) AS rn
    FROM (SELECT q.vec_id, c.cid,
            sum((q.q - c.val) * (q.q - c.val)) AS d2
          FROM ks_q q JOIN ks_c{i} c ON c.pos = q.pos
          GROUP BY q.vec_id, c.cid) d) WHERE rn = 1),
ks_c{i + 1} AS MATERIALIZED (
  SELECT cid, pos, val FROM (
    SELECT a.cid, q.pos,
      CAST(CASE WHEN sum(q.q) >= 0
           THEN sum(q.q) // count(*)
           ELSE -((-sum(q.q)) // count(*)) END AS BIGINT) AS val
    FROM ks_a{i} a JOIN ks_q q ON q.vec_id = a.vec_id
    GROUP BY a.cid, q.pos
    UNION ALL
    SELECT c.cid, c.pos, c.val FROM ks_c{i} c
    WHERE c.cid NOT IN (SELECT DISTINCT cid FROM ks_a{i}))),"""
        )
    ctes.append(
        f"""ks_af AS MATERIALIZED (
  SELECT vec_id, cid, d2 FROM (
    SELECT d.vec_id, d.cid, d.d2,
      row_number() OVER (PARTITION BY d.vec_id
                         ORDER BY d.d2, d.cid) AS rn
    FROM (SELECT q.vec_id, c.cid,
            sum((q.q - c.val) * (q.q - c.val)) AS d2
          FROM ks_q q JOIN ks_c{n_iter} c ON c.pos = q.pos
          GROUP BY q.vec_id, c.cid) d) WHERE rn = 1),"""
    )
    ctes.append(
        """ksd_nrm AS MATERIALIZED (
  SELECT vec_id, sum(q * q) AS n2 FROM ks_q GROUP BY vec_id),
ksd_pairs AS MATERIALIZED (
  SELECT a.vec_id AS i, b.vec_id AS j
  FROM ks_af a JOIN ks_af b
    ON b.cid = a.cid AND b.vec_id <> a.vec_id
  WHERE b.d2 > a.d2 OR (b.d2 = a.d2 AND b.vec_id < a.vec_id)),
ksd_dot AS MATERIALIZED (
  SELECT p.i, p.j, sum(qa.q * qb.q) AS dot
  FROM ksd_pairs p
  JOIN ks_q qa ON qa.vec_id = p.i
  JOIN ks_q qb ON qb.vec_id = p.j AND qb.pos = qa.pos
  GROUP BY p.i, p.j),
ksd_dom AS MATERIALIZED (
  SELECT DISTINCT d.i AS vec_id
  FROM ksd_dot d
  JOIN ksd_nrm na ON na.vec_id = d.i
  JOIN ksd_nrm nb ON nb.vec_id = d.j
  WHERE d.dot >= 0
    AND CAST(10000 AS HUGEINT) * CAST(d.dot AS HUGEINT)
        * CAST(d.dot AS HUGEINT)
      >= CAST(1225 AS HUGEINT) * CAST(na.n2 AS HUGEINT)
        * CAST(nb.n2 AS HUGEINT)),
ksd AS MATERIALIZED (
  SELECT a.vec_id, a.cid, (dm.vec_id IS NULL) AS is_kept
  FROM ks_af a LEFT JOIN ksd_dom dm ON dm.vec_id = a.vec_id),"""
    )
    rows = f"""
UNION ALL SELECT 'ks_vecs', CAST(count(*) AS DOUBLE) FROM ks_af
UNION ALL SELECT 'ks_inertia_digest',
  CAST(sum(d2 % 2147483647) AS DOUBLE) FROM ks_af
UNION ALL SELECT 'ks_assign_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR) || ':'
    || CAST(cid AS VARCHAR)), 1, 15) AS BIGINT) % 2147483647)
  AS DOUBLE) FROM ks_af
UNION ALL SELECT 'ks_cent_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(cid AS VARCHAR) || ':'
    || CAST(pos AS VARCHAR) || ':' || CAST(val AS VARCHAR)),
    1, 15) AS BIGINT) % 2147483647) AS DOUBLE) FROM ks_c{n_iter}
UNION ALL SELECT 'ksd_kept', CAST(count(*) FILTER (WHERE is_kept)
  AS DOUBLE) FROM ksd
UNION ALL SELECT 'ksd_digest', CAST(sum(
  CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR) || ':'
    || CAST(cid AS VARCHAR) || ':' || CAST(is_kept AS VARCHAR)),
    1, 15) AS BIGINT) % 2147483647) AS DOUBLE) FROM ksd"""
    return "\n".join(ctes), rows


_PR_CTES, _PR_ROWS = _pr_oracle_parts()
_KS_CTES, _KS_ROWS = _ks_oracle_parts()
TPCH_ORACLES["tpch_scalar_checks"] = (
    TPCH_ORACLES["tpch_scalar_checks"].replace(
        "\ngpgv AS (",
        "\n" + _PR_CTES + "\n" + _KS_CTES + "\ngpgv AS (",
        1,
    )
    + _PR_ROWS
    + _KS_ROWS
)
assert _PR_CTES in TPCH_ORACLES["tpch_scalar_checks"]
assert _KS_CTES in TPCH_ORACLES["tpch_scalar_checks"]

# ------------------------------------- event-time windows (streaming kin)

_EXACT_VALUE_SUM = (
    "round(CAST(sum(CAST(value AS DECIMAL(25,10))) AS DOUBLE), 9)"
)

WINDOW_ORACLES: dict[str, str] = {
    # Spark's window(ts, '1 day') aligns to the 1970 epoch in the UTC
    # session timezone; epoch_us floor-division reproduces it exactly.
    # Round 5: the base windows joined with the day-grain retention
    # triangle (operators/retention.py) reshaped onto the same day
    # spine — cohort born that day + day-1/day-7 comeback.
    "events_tumbling_daily": f"""
WITH base AS (
  SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000)
      AS window_start,
    event_type, count(*) AS n_events, {_EXACT_VALUE_SUM} AS total_value
  FROM events GROUP BY 1, 2),
activity AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS period FROM events),
cohorts AS (SELECT u, min(period) AS cohort FROM activity GROUP BY u),
sizes AS (SELECT cohort, count(*) AS n_cohort FROM cohorts GROUP BY cohort),
act AS (
  SELECT c.cohort, datediff('day', c.cohort, a.period) AS off,
         count(*) AS n_active
  FROM activity a JOIN cohorts c USING (u) GROUP BY 1, 2),
daily AS (
  SELECT s.cohort,
    CAST(max(s.n_cohort) AS BIGINT) AS cohort_size,
    CAST(coalesce(max(CASE WHEN a.off = 1 THEN a.n_active END), 0) AS BIGINT)
      AS ret_d1_active,
    CAST(coalesce(max(CASE WHEN a.off = 7 THEN a.n_active END), 0) AS BIGINT)
      AS ret_d7_active
  FROM sizes s LEFT JOIN act a USING (cohort) GROUP BY s.cohort)
SELECT b.window_start, b.event_type, b.n_events, b.total_value,
  CAST(coalesce(d.cohort_size, 0) AS BIGINT) AS cohort_size,
  CAST(coalesce(d.ret_d1_active, 0) AS BIGINT) AS ret_d1_active,
  CAST(coalesce(d.ret_d7_active, 0) AS BIGINT) AS ret_d7_active,
  CASE WHEN coalesce(d.cohort_size, 0) > 0
       THEN CAST(d.ret_d1_active AS DOUBLE) / d.cohort_size
       ELSE 0.0 END AS ret_d1,
  CASE WHEN coalesce(d.cohort_size, 0) > 0
       THEN CAST(d.ret_d7_active AS DOUBLE) / d.cohort_size
       ELSE 0.0 END AS ret_d7
FROM base b LEFT JOIN daily d ON b.window_start = d.cohort""",
    # duration/slide = 2 -> each event belongs to exactly the 2
    # slide-aligned windows covering its timestamp.
    "events_sliding_day_12h": f"""
WITH based AS (
  SELECT event_type, value, ts,
    make_timestamp((epoch_us(ts) // 43200000000) * 43200000000) AS b
  FROM events),
expanded AS (
  SELECT unnest([b, b - INTERVAL 12 HOUR]) AS window_start, event_type, value, ts
  FROM based)
SELECT window_start, event_type, count(*) AS n_events,
  {_EXACT_VALUE_SUM} AS total_value
FROM expanded
WHERE ts >= window_start AND ts < window_start + INTERVAL 24 HOUR
GROUP BY 1, 2""",
    # DuckDB's native ASOF LEFT JOIN is the oracle for the union+
    # carry-forward implementation (inclusive backward match).
    # Right side pre-deduplicated per (user, ts) to max(value): DuckDB's
    # ASOF tie-pick is unspecified, the operator deterministically keeps
    # the greatest value-struct.
    # All three as-of directions (round 4). The right side dedups equal
    # (user, ts) signups with max(value) — the engine's greatest-struct
    # pick under duplicate right timestamps, in both directions. The
    # nearest CASE compares epoch_us deltas (exact integers; the engine
    # compares epoch-second doubles, exact for microsecond timestamps
    # within the double mantissa), ties -> backward.
    "events_asof_last_signup": """
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
r AS (SELECT user_id, ts AS signup_ts, max(value) AS signup_value
      FROM events WHERE event_type = 'signup'
      GROUP BY user_id, ts),
b AS (SELECT l.event_id, r.signup_ts, r.signup_value
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.signup_ts),
f AS (SELECT l.event_id, r.signup_ts AS next_signup_ts,
             r.signup_value AS next_signup_value
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts <= r.signup_ts)
SELECT l.event_id, l.user_id, l.ts, b.signup_ts, b.signup_value,
  f.next_signup_ts, f.next_signup_value,
  CASE WHEN f.next_signup_ts IS NULL THEN b.signup_ts
       WHEN b.signup_ts IS NULL THEN f.next_signup_ts
       WHEN epoch_us(l.ts) - epoch_us(b.signup_ts)
            <= epoch_us(f.next_signup_ts) - epoch_us(l.ts)
         THEN b.signup_ts ELSE f.next_signup_ts END AS nearest_signup_ts,
  CASE WHEN f.next_signup_ts IS NULL THEN b.signup_value
       WHEN b.signup_ts IS NULL THEN f.next_signup_value
       WHEN epoch_us(l.ts) - epoch_us(b.signup_ts)
            <= epoch_us(f.next_signup_ts) - epoch_us(l.ts)
         THEN b.signup_value ELSE f.next_signup_value END
    AS nearest_signup_value
FROM l
JOIN b ON l.event_id = b.event_id
JOIN f ON l.event_id = f.event_id""",
    "events_interval_join": """
SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
  s.event_id AS signup_id, s.ts AS signup_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON c.user_id = s.user_id
 AND s.ts <= c.ts AND s.ts >= c.ts - INTERVAL 1 HOUR""",
    # generate_series grid + native ASOF JOIN mirrors the
    # sequence+explode + carry-forward-window composition; the second
    # (forward) ASOF + lerp mirrors resample_interpolate.
    "events_resample_hourly": """
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
  FROM events GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS grid_ts
  FROM bounds),
obs AS (SELECT user_id, ts, max(value) AS value FROM events
        GROUP BY user_id, ts),
p AS (
  SELECT g.user_id, g.grid_ts, o.ts, o.value
  FROM grid g
  ASOF LEFT JOIN obs o ON g.user_id = o.user_id AND g.grid_ts >= o.ts),
n AS (
  SELECT g.user_id, g.grid_ts, o.ts AS next_ts, o.value AS next_value
  FROM grid g
  ASOF LEFT JOIN obs o ON g.user_id = o.user_id AND g.grid_ts <= o.ts)
SELECT p.user_id, p.grid_ts, p.ts, p.value, n.next_ts, n.next_value,
  round(CASE
    WHEN p.ts IS NULL OR n.next_ts IS NULL THEN NULL
    WHEN epoch_us(n.next_ts) = epoch_us(p.ts) THEN p.value
    ELSE p.value + (n.next_value - p.value)
      * (CAST(epoch_us(p.grid_ts) AS DOUBLE)
         - CAST(epoch_us(p.ts) AS DOUBLE))
      / (CAST(epoch_us(n.next_ts) AS DOUBLE)
         - CAST(epoch_us(p.ts) AS DOUBLE)) END, 6) AS value_interp
FROM p JOIN n ON p.user_id = n.user_id AND p.grid_ts = n.grid_ts""",
    # Round 6: the Spark side maintains this aggregate INCREMENTALLY
    # (operators/ivm.py folding 4 batches into a snapshot-table state);
    # the oracle stays the from-scratch GROUP BY over all events — the
    # equality IS the IVM correctness statement. temp_* mirror the IVM
    # measures: DECIMAL(25,6)-exact sum (the mergeable-partial form),
    # avg = decimal-sum / non-null count at 9dp, min/max at 6dp.
    "events_daily_band_counts": """
WITH t AS (
  SELECT ts, user_id,
    (value - floor(value / 120.0) * 120.0) - 10.0 AS temp
  FROM events),
g AS (
  SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000)
      AS window_start,
    CASE WHEN temp < 32 THEN 'Freezing'
         WHEN temp BETWEEN 32 AND 50 THEN 'Cold'
         WHEN temp BETWEEN 51 AND 70 THEN 'Mild'
         WHEN temp BETWEEN 71 AND 85 THEN 'Warm'
         ELSE 'Hot' END AS weather_band,
    temp, user_id
  FROM t),
-- grouped portable-HLL twin of the IVM approx_distinct measure
-- (operators/sketches.py hash/register/correction, per group):
-- b=6 -> 64 registers, alpha(64)=0.709, linear-count branch at
-- raw <= 2.5*m = 160 with empty registers
hh AS (
  SELECT window_start, weather_band,
    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
      AS BIGINT) AS h
  FROM g),
hr AS (
  SELECT window_start, weather_band, h & 63 AS bucket,
    max(least(55 - length(ltrim(bin(h >> 6), '0')), 40)) AS rho
  FROM hh GROUP BY 1, 2, 3),
hg AS (SELECT DISTINCT window_start, weather_band FROM hh),
hf AS (
  SELECT k.window_start, k.weather_band, coalesce(r.rho, 0) AS rho
  FROM hg k
  CROSS JOIN (SELECT unnest(range(64)) AS bucket) b
  LEFT JOIN hr r ON r.window_start = k.window_start
    AND r.weather_band = k.weather_band AND r.bucket = b.bucket),
he AS (
  SELECT window_start, weather_band,
    sum(1.0 / (CAST(1 AS BIGINT) << rho)) AS sum_inv,
    sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS n_empty
  FROM hf GROUP BY 1, 2),
hll AS (
  SELECT window_start, weather_band,
    round(CASE WHEN 0.709 * 64 * 64 / sum_inv <= 160.0
                    AND n_empty > 0
               THEN 64.0 * ln(64.0 / n_empty)
               ELSE 0.709 * 64 * 64 / sum_inv END, 6) AS n_users_hll
  FROM he)
SELECT g.window_start, g.weather_band,
  count(*) AS n_forecasts,
  round(CAST(sum(CAST(temp AS DECIMAL(25,6))) AS DOUBLE), 6) AS temp_sum,
  round(CAST(sum(CAST(temp AS DECIMAL(25,6))) AS DOUBLE)
        / count(temp), 9) AS temp_avg,
  round(min(temp), 6) AS temp_min,
  round(max(temp), 6) AS temp_max,
  any_value(hll.n_users_hll) AS n_users_hll
FROM g
JOIN hll ON hll.window_start = g.window_start
  AND hll.weather_band = g.weather_band
GROUP BY 1, 2""",
    # Gaps-and-islands rewrite of session_window(ts, '30 minutes'):
    # a new session starts when the gap from the previous event exceeds
    # the gap duration (Spark merges when next.start <= prev.end);
    # end = last event + gap.
    "events_session_30m": f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
      ORDER BY ts, event_id) AS rnk
  FROM sessions),
pp AS (
  SELECT user_id, session_id,
    string_agg(event_type, '>' ORDER BY rnk)
      FILTER (WHERE rnk <= 8) AS session_path,
    CAST(count(*) FILTER (WHERE rnk <= 8) AS BIGINT) AS n_path_events,
    CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
  FROM ranked GROUP BY user_id, session_id),
trans AS (
  SELECT user_id, session_id,
    coalesce(lag(event_type) OVER sw, '(start)') AS src,
    event_type AS dst
  FROM ranked
  WINDOW sw AS (PARTITION BY user_id, session_id ORDER BY rnk)
  UNION ALL
  SELECT user_id, session_id, event_type, '(end)'
  FROM ranked
  QUALIFY row_number() OVER (PARTITION BY user_id, session_id
                             ORDER BY rnk DESC) = 1),
tc AS (
  SELECT user_id, session_id,
    CAST(count(DISTINCT (src, dst)) AS BIGINT) AS n_distinct_transitions
  FROM trans GROUP BY user_id, session_id),
fm1 AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup'
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1),
fm2 AS (
  SELECT e.user_id, e.ts, e.event_id
  FROM events e JOIN fm1 ON fm1.user_id = e.user_id
  WHERE e.event_type = 'click'
    AND (e.ts > fm1.ts OR (e.ts = fm1.ts AND e.event_id > fm1.event_id))
  QUALIFY row_number() OVER (PARTITION BY e.user_id
                             ORDER BY e.ts, e.event_id) = 1),
fm3 AS (
  SELECT e.user_id, e.ts, e.event_id
  FROM events e JOIN fm2 ON fm2.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND (e.ts > fm2.ts OR (e.ts = fm2.ts AND e.event_id > fm2.event_id))
  QUALIFY row_number() OVER (PARTITION BY e.user_id
                             ORDER BY e.ts, e.event_id) = 1),
fun AS (
  SELECT u.user_id,
    (CASE WHEN fm1.ts IS NULL THEN 0
          WHEN fm2.ts IS NULL THEN 1
          WHEN fm3.ts IS NULL THEN 2 ELSE 3 END)::INTEGER AS funnel_steps,
    fm1.ts IS NOT NULL AND fm2.ts IS NOT NULL AND fm3.ts IS NOT NULL
      AS funnel_converted,
    fm1.ts AS funnel_t_first
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN fm1 USING (user_id)
  LEFT JOIN fm2 USING (user_id)
  LEFT JOIN fm3 USING (user_id))
SELECT s.user_id AS user_id, min(s.ts) AS session_start,
  max(s.ts) + INTERVAL 30 MINUTE AS session_end,
  count(*) AS n_events, {_EXACT_VALUE_SUM} AS total_value,
  CAST(s.session_id AS BIGINT) AS session_seq,
  any_value(pp.session_path) AS session_path,
  any_value(pp.n_path_events) AS n_path_events,
  any_value(pp.n_event_types) AS n_event_types,
  any_value(tc.n_distinct_transitions) AS n_distinct_transitions,
  any_value(fun.funnel_steps) AS funnel_steps,
  any_value(fun.funnel_converted) AS funnel_converted,
  any_value(fun.funnel_t_first) AS funnel_t_first
FROM sessions s JOIN fun USING (user_id)
JOIN pp ON pp.user_id = s.user_id AND pp.session_id = s.session_id
JOIN tc ON tc.user_id = s.user_id AND tc.session_id = s.session_id
GROUP BY s.user_id, s.session_id""",
}

# ------------------------------------------------- multimodal columns

# Scalar bin_00..bin_15 byte-histogram columns (see media_features note).
_HIST_BIN_COLS = ",\n    ".join(
    f"len(list_filter(codes, x -> x // 16 = {b})) AS bin_{b:02d}"
    for b in range(16)
)


def _media_oracles() -> dict[str, str]:
    from globalweather_etl_spark.multimodal.synthesize import MEDIA_SQL

    prologue = f"WITH media AS ({MEDIA_SQL})\n"
    return {
        # Every sum is cast to BIGINT: DuckDB sum(INTEGER) returns
        # HUGEINT (int128), which pandas renders as float64 — the
        # driver's dtype-faithful hash then diverges from Spark's int64
        # even when the values are identical (round-2 hash_match=false).
        "media_metadata_stats": prologue
        + """SELECT kind, count(*) AS n_media,
  CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
  CAST(sum(width) AS BIGINT) AS sum_width,
  CAST(sum(n_frames) AS BIGINT) AS sum_frames
FROM media GROUP BY kind""",
        # Digest tier: DuckDB has no md5(BLOB); md5 of the source VARCHAR
        # hashes the same UTF-8 bytes the payload was encoded from.
        # Histogram tier: the synthesized corpus is pure ASCII, so
        # payload bytes == codepoints and the Pandas-UDF byte histogram
        # has an exact SQL twin (verified: zero docs match [^\x00-\x7f]).
        # The 16 bins are emitted as scalar bin_00..bin_15 columns (not
        # one list column): the driver's pandas canonicalizer
        # sort_values+hashes cell values, and a list cell is unhashable
        # (round-2 err on this query).
        "media_features": prologue.rstrip("\n")
        + f""",
hist AS (
  SELECT doc_id AS media_id,
    {_HIST_BIN_COLS}
  FROM (SELECT doc_id,
          [unicode(c) FOR c IN string_split(text, '') IF c != ''] AS codes
        FROM documents))
SELECT m.media_id, m.kind, md5(d.text) AS digest,
  octet_length(m.payload) AS n_bytes,
  {", ".join(f"h.bin_{b:02d}" for b in range(16))}
FROM media m
JOIN documents d ON m.media_id = d.doc_id
JOIN hist h ON h.media_id = m.media_id""",
        # The fake decode (no codec in container) is a deterministic
        # function of the ASCII payload: dims pass through from
        # metadata, mean_intensity = mean payload byte = mean codepoint.
        # numpy's float64 mean and this sum/length division are
        # bit-identical (integer sum is exact in float64, one rounded
        # division each).
        "media_decode_image": prologue
        + """SELECT m.media_id, m.height, m.width, m.channels,
  CASE WHEN length(d.text) = 0 THEN 0.0
       ELSE CAST(list_aggregate(
              [unicode(c) FOR c IN string_split(d.text, '') IF c != ''],
              'sum') AS DOUBLE) / length(d.text)
  END AS mean_intensity
FROM media m
JOIN documents d ON d.doc_id = m.media_id
WHERE m.kind = 'image'""",
    }


# --------------------------------------------- dedup / text / similarity

_NORM_TEXT = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
# Mirrors functions.text.tokens(): trim first (split keeps the empty
# token a leading separator would produce).
_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def _shingles_sql(
    n: int, max_doc_freq: int | None = None, source: str = "documents"
) -> str:
    """Distinct word n-gram shingles per doc, mirroring
    functions.text.word_shingles + array_distinct. ``max_doc_freq``
    mirrors dedup._cap_hot_shingles: shingles appearing in more than
    that many documents are dropped (rows are distinct per doc, so a
    plain per-shingle count IS the document frequency). ``source`` is
    any table/CTE with (doc_id, text) — doc frequencies then count
    over THAT corpus, matching operators that shingle a filtered
    frame."""
    base = f"""
SELECT doc_id, unnest(list_distinct(
  CASE WHEN len(toks) >= {n}
       THEN [array_to_string(toks[i:i+{n - 1}], ' ')
             FOR i IN range(1, len(toks) - {n} + 2)]
       ELSE [] END)) AS shingle
FROM (SELECT doc_id, {_TOKS} AS toks FROM {source})"""
    if max_doc_freq is None:
        return base
    return f"""
SELECT doc_id, shingle FROM ({base})
QUALIFY count(*) OVER (PARTITION BY shingle) <= {max_doc_freq}"""


def _lang_score_sql(lang_words: list[str]) -> str:
    quoted = ", ".join(f"'{w}'" for w in lang_words)
    return (
        "CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
        f"t -> t IN ({quoted}))) AS INTEGER)"
    )


def _build_lang_id_sql() -> str:
    from globalweather_etl_spark.functions.text import _LANG_STOPWORDS

    s = {lang: _lang_score_sql(ws) for lang, ws in _LANG_STOPWORDS.items()}
    return f"""CASE
    WHEN {s["en"]} > 0 AND {s["en"]} >= {s["de"]} AND {s["en"]} >= {s["fr"]}
         AND {s["en"]} >= {s["es"]} THEN 'en'
    WHEN {s["de"]} > 0 AND {s["de"]} >= {s["fr"]} AND {s["de"]} >= {s["es"]}
         THEN 'de'
    WHEN {s["fr"]} > 0 AND {s["fr"]} >= {s["es"]} THEN 'fr'
    WHEN {s["es"]} > 0 THEN 'es'
    ELSE 'und' END"""


def _lsh_buckets_sql(
    num_planes: int, num_tables: int, dim: int = 64, src: str = "embeddings"
) -> str:
    """CTEs e/planes/buckets mirroring the portable (md5-plane) LSH
    bucketing: plane index i = t*num_planes + p, component (i, j) from
    the 60-bit md5 prefix of 'i,j', bucket bit p = sign(v . plane).
    ``src`` is the relation supplying (vec_id, embedding) — a table name
    or a parenthesized subquery."""
    return f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {src}),
planes AS (
  SELECT t, p,
    [ (CAST('0x' || substring(md5(
          CAST(t*{num_planes}+p AS VARCHAR) || ',' || CAST(j AS VARCHAR)
        ), 1, 15) AS BIGINT) % 2000001) / 1000000.0 - 1.0
      FOR j IN range(0, {dim}) ] AS pv
  FROM (SELECT unnest(range({num_tables})) AS t),
       (SELECT unnest(range({num_planes})) AS p)),
buckets AS (
  SELECT e.vec_id, pl.t AS tbl,
    CAST(sum(CASE WHEN list_dot_product(e.v, pl.pv) >= 0
        THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS bucket
  FROM e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.t)"""


def _url_kernel_sql() -> tuple[str, str]:
    """(two-label suffix array literal, PSL-subset VALUES rows) shared
    verbatim with functions/urls.py — the oracle inlines the same rule
    data the Spark side broadcasts."""
    from globalweather_etl_spark.functions.urls import (
        _TWO_LABEL_SUFFIXES,
        PSL_SUBSET,
    )

    two = ", ".join(f"'{s}'" for s in _TWO_LABEL_SUFFIXES)
    psl = ", ".join(f"('{s}')" for s in sorted(set(PSL_SUBSET)))
    return two, psl


_TWO_LABEL_SQL, _PSL_VALUES_SQL = _url_kernel_sql()

_URL_HOST_RE = "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)'"

EXT_ORACLES: dict[str, str] = {
    # All three exact-dedup views in one: per-doc keeper flag +
    # fingerprint-group duplicate count (keepers = min-id per group;
    # corpus/removed are the TRUE/FALSE partitions of is_keeper).
    # The URL CTE chain mirrors functions/urls.py expression for
    # expression (host regex, normalization, heuristic and PSL
    # registrable domain) over the same synthesized URLs.
    "docs_exact_dedup": f"""
WITH psl(sfx) AS (VALUES {_PSL_VALUES_SQL}),
u AS (
  SELECT doc_id, lang, n_chars,
    CASE doc_id % 6
      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.CO.UK/Docs/'
                  || CAST(doc_id AS VARCHAR) || '?q=Spark#Top'
      WHEN 1 THEN 'http://cdn.' || source || '.com/a/'
                  || CAST(doc_id AS VARCHAR) || '?x=1&y=2'
      WHEN 2 THEN 'https://192.168.0.'
                  || CAST(doc_id % 200 + 1 AS VARCHAR) || '/x'
      WHEN 3 THEN 'http://' || source || '.K12.CA.US/p/'
                  || CAST(doc_id AS VARCHAR)
      WHEN 4 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
      ELSE 'FTP://Mirror.' || source || '.ORG/#sec'
    END AS url
  FROM documents),
h AS (
  SELECT *,
    CASE WHEN regexp_extract(url, {_URL_HOST_RE}, 1) = '' THEN NULL
         ELSE lower(regexp_extract(url, {_URL_HOST_RE}, 1)) END AS host,
    regexp_replace(url, '#.*$', '') AS nf
  FROM u),
n2 AS (
  SELECT *,
    regexp_extract(nf, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1) AS pref
  FROM h),
norm AS (
  SELECT *,
    regexp_replace(lower(pref) || substring(nf, length(pref) + 1),
        '^([a-z][a-z0-9+.-]*://[^/?#]*)/$', '\\1') AS url_norm,
    string_split(host, '.') AS parts
  FROM n2),
dom AS (
  SELECT *, len(parts) AS nl,
    host IS NOT NULL AND regexp_matches(host,
      '^[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}$') AS is_ip
  FROM norm),
lk AS (
  SELECT *,
    CASE WHEN nl >= 2
      THEN array_to_string(list_slice(parts, nl - 1, nl), '.') END AS last2,
    CASE WHEN nl >= 3
      THEN array_to_string(list_slice(parts, nl - 2, nl), '.') END AS last3,
    CASE WHEN nl >= 4
      THEN array_to_string(list_slice(parts, nl - 3, nl), '.') END AS last4,
    CASE WHEN nl >= 5
      THEN array_to_string(list_slice(parts, nl - 4, nl), '.') END AS last5
  FROM dom),
rd AS (
  SELECT *,
    CASE WHEN host IS NULL OR is_ip OR nl <= 2 THEN host
         WHEN list_contains([{_TWO_LABEL_SQL}], last2) AND nl >= 3
           THEN last3
         ELSE last2 END AS reg_dom,
    CASE WHEN host IS NULL OR is_ip OR nl <= 2 THEN host
         WHEN nl > 4 AND EXISTS(SELECT 1 FROM psl WHERE psl.sfx = last4)
           THEN last5
         WHEN nl > 3 AND EXISTS(SELECT 1 FROM psl WHERE psl.sfx = last3)
           THEN last4
         WHEN nl > 2 AND EXISTS(SELECT 1 FROM psl WHERE psl.sfx = last2)
           THEN last3
         ELSE last2 END AS reg_dom_psl
  FROM lk),
ld_docs AS (
  SELECT doc_id,
    concat_ws(chr(10), text, 'Copyright 2024 ' || source,
      CASE WHEN doc_id % 3 = 0
           THEN 'Subscribe to our newsletter' END) AS t
  FROM documents),
ld_base AS (SELECT doc_id, str_split(t, chr(10)) AS ls FROM ld_docs),
ld_lines AS (
  SELECT doc_id, ls[i] AS line, i AS pos
  FROM ld_base, unnest(generate_series(1, len(ls))) AS g(i)),
ld_keyed AS (
  SELECT doc_id, line, pos,
    CASE WHEN lower(trim(regexp_replace(line, '\\s+', ' ', 'g'))) = ''
         THEN NULL
         ELSE md5(lower(trim(regexp_replace(line, '\\s+', ' ', 'g'))))
    END AS lk
  FROM ld_lines),
ld_freq AS (
  SELECT lk, count(DISTINCT doc_id) AS df
  FROM ld_keyed WHERE lk IS NOT NULL GROUP BY lk),
ld_flag AS (
  SELECT ld_keyed.doc_id, line, pos, lk IS NOT NULL AS counted,
         coalesce(ld_freq.df >= 2, FALSE) AS dup
  FROM ld_keyed LEFT JOIN ld_freq USING (lk)),
ld AS (
  SELECT doc_id,
    sum(CASE WHEN counted THEN 1 ELSE 0 END)::BIGINT AS line_n_lines,
    sum(CASE WHEN dup THEN 1 ELSE 0 END)::BIGINT AS line_n_dup,
    md5(coalesce(string_agg(CASE WHEN NOT dup THEN line END, chr(10)
                            ORDER BY pos), '')) AS line_clean_md5
  FROM ld_flag GROUP BY doc_id),
wd_docs AS (
  SELECT doc_id,
    concat_ws(chr(10), text, 'Copyright 2024 ' || source,
      CASE WHEN doc_id % 4 = 0
           THEN 'copyright  2024 ' || upper(source) END) AS t
  FROM documents),
wd_base AS (SELECT doc_id, str_split(t, chr(10)) AS ls FROM wd_docs),
wd_lines AS (
  SELECT doc_id, ls[i] AS line, i AS pos
  FROM wd_base, unnest(generate_series(1, len(ls))) AS g(i)),
wd_keyed AS (
  SELECT doc_id, line, pos,
    CASE WHEN lower(trim(regexp_replace(line, '\\s+', ' ', 'g'))) = ''
         THEN NULL
         ELSE md5(lower(trim(regexp_replace(line, '\\s+', ' ', 'g'))))
    END AS lk
  FROM wd_lines),
wd_flag AS (
  SELECT doc_id, line, pos, lk IS NOT NULL AS counted,
    CASE WHEN lk IS NULL THEN FALSE
         ELSE row_number() OVER (PARTITION BY doc_id, lk ORDER BY pos) > 1
    END AS dup
  FROM wd_keyed),
wd AS (
  SELECT doc_id,
    sum(CASE WHEN counted THEN 1 ELSE 0 END)::BIGINT AS within_n_lines,
    sum(CASE WHEN dup THEN 1 ELSE 0 END)::BIGINT AS within_n_dup,
    md5(coalesce(string_agg(CASE WHEN NOT dup THEN line END, chr(10)
                            ORDER BY pos), '')) AS within_clean_md5
  FROM wd_flag GROUP BY doc_id),
bf_fp AS (SELECT doc_id, md5({_NORM_TEXT}) AS fp FROM documents),
bf_dup AS (SELECT fp FROM bf_fp WHERE doc_id % 5 = 0),
bf_words AS (
  SELECT p // 63 AS word_idx,
         bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
  FROM (SELECT (CAST('0x' || substring(md5('bloom' || i || '|' || fp), 1, 15)
                AS BIGINT)) % 1024 AS p
        FROM bf_dup, unnest([0,1,2,3,4]) AS t(i))
  GROUP BY 1),
bf AS (
  SELECT doc_id,
         bool_and(coalesce((bits & mask) = mask, FALSE)) AS bloom_seen_maybe
  FROM (SELECT doc_id, p // 63 AS word_idx,
               1::BIGINT << CAST(p % 63 AS INT) AS mask
        FROM (SELECT doc_id,
                     (CAST('0x' || substring(md5('bloom' || i || '|' || fp),
                      1, 15) AS BIGINT)) % 1024 AS p
              FROM bf_fp, unnest([0,1,2,3,4]) AS t(i)))
  LEFT JOIN bf_words USING (word_idx) GROUP BY doc_id),
sp_docs AS (
  SELECT doc_id,
    CASE WHEN doc_id % 6 = 0
         THEN text || ' this syndicated boilerplate passage is repeated verbatim across many documents of the crawl corpus'
         ELSE text END AS text
  FROM documents),
sp_toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM sp_docs),
       unnest(generate_series(1, len(t))) AS g(i)
  WHERE t[i] <> ''),
sp_wins AS (
  SELECT doc_id, i - 1 AS p,
         CAST('0x' || substring(md5(array_to_string(t[i:i+7], ' ')), 1, 15)
           AS BIGINT) AS gh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM sp_docs),
       unnest(generate_series(1, len(t) - 7)) AS g(i)
  WHERE len(t) >= 8),
sp_dup AS (
  SELECT gh, min(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, gh FROM sp_wins)
  GROUP BY gh HAVING count(*) >= 2),
sp_marks AS (
  SELECT DISTINCT w.doc_id, w.p
  FROM sp_wins w JOIN sp_dup USING (gh)
  WHERE w.doc_id <> sp_dup.keeper),
sp_flag AS (
  SELECT t.doc_id, t.pos, t.tok,
         EXISTS (SELECT 1 FROM sp_marks m
                 WHERE m.doc_id = t.doc_id
                   AND m.p <= t.pos AND t.pos < m.p + 8) AS rm
  FROM sp_toks t),
sp_spans AS (
  SELECT doc_id, count(*)::BIGINT AS n_spans
  FROM (SELECT doc_id, p,
               lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        FROM sp_marks)
  WHERE prev IS NULL OR p > prev + 7
  GROUP BY doc_id),
sp AS (
  SELECT d.doc_id,
    md5(coalesce((SELECT string_agg(tok, ' ' ORDER BY pos)
                  FROM sp_flag f
                  WHERE f.doc_id = d.doc_id AND NOT f.rm), ''))
      AS span_clean_md5,
    coalesce((SELECT count(*) FROM sp_flag f
              WHERE f.doc_id = d.doc_id AND f.rm), 0)::BIGINT
      AS span_tokens_removed,
    coalesce(sp_spans.n_spans, 0)::BIGINT AS span_n_spans
  FROM sp_docs d LEFT JOIN sp_spans USING (doc_id)),
dcap AS (
  SELECT doc_id,
    row_number() OVER (PARTITION BY coalesce(reg_dom_psl, '')
                       ORDER BY doc_id) AS drn
  FROM rd)
SELECT r.doc_id, r.lang, r.n_chars,
  coalesce(k.is_keeper, FALSE) AS is_keeper,
  coalesce(k.dup_count, 0) AS dup_count,
  r.url,
  coalesce(r.host, '') AS url_host,
  r.url_norm,
  coalesce(r.reg_dom, '') AS reg_domain,
  coalesce(r.reg_dom_psl, '') AS reg_domain_psl,
  ld.line_n_lines, ld.line_n_dup, ld.line_clean_md5,
  wd.within_n_lines, wd.within_n_dup, wd.within_clean_md5,
  bf.bloom_seen_maybe,
  sp.span_clean_md5, sp.span_tokens_removed, sp.span_n_spans,
  (CASE WHEN dcap.drn <= 10 THEN dcap.drn ELSE -1 END)::BIGINT
    AS domain_rank,
  dcap.drn <= 10 AS domain_kept
FROM rd r
JOIN ld USING (doc_id)
JOIN wd USING (doc_id)
JOIN bf USING (doc_id)
JOIN sp USING (doc_id)
JOIN dcap USING (doc_id)
LEFT JOIN (
  SELECT min(doc_id) AS doc_id, count(*) AS dup_count, TRUE AS is_keeper
  FROM documents GROUP BY md5({_NORM_TEXT})) k USING (doc_id)""",
    "docs_text_metrics": None,  # filled in below (needs _LANG_STOPWORDS)
    # Benchmark decontamination: benchmark = the doc_id % 7 == 0 corpus
    # slice; a doc is contaminated iff it shares >=1 distinct word
    # 5-gram with ANY benchmark doc. The Spark side joins on 60-bit md5
    # shingle hashes; this twin joins on shingle strings, so a hash
    # collision would surface as a mismatch.
    # Stage-for-stage twin of curate_documents (hash_fn="md5"): exact
    # dedup -> md5-MinHash banded LSH pairs (threshold .8, cap 64 over
    # the DEDUPED corpus) -> recursive min-label components, min-id
    # canonical -> raw quality >= 0.3 -> 8-gram benchmark overlap ->
    # 'e666'/'f333' hash split -> per-split windowed-cumsum packing.
    "docs_decontaminate": f"""
WITH RECURSIVE sh AS ({_shingles_sql(5)}),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 7 = 0),
hits AS (
  SELECT s.doc_id, count(*) AS n
  FROM sh s JOIN bench USING (shingle)
  GROUP BY s.doc_id),
ex AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN (SELECT min(doc_id) AS doc_id
        FROM documents GROUP BY md5({_NORM_TEXT})) k USING (doc_id)),
csh AS ({_shingles_sql(3, max_doc_freq=64, source="ex")}),
chh AS (SELECT doc_id,
        CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) % 2147483647
          AS h
      FROM csh),
csizes0 AS (SELECT doc_id, count(*) AS ns FROM csh GROUP BY doc_id),
csig AS (
  SELECT doc_id, i, min((h * (2*i+1) + 7919 * (i+1)) % 2147483647) AS mh
  FROM chh CROSS JOIN (SELECT unnest(range(32)) AS i) hi
  GROUP BY doc_id, i),
cbands AS (
  SELECT doc_id, i // 4 AS band,
    CAST('0x' || substring(
        md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)), 1, 15)
      AS BIGINT) AS bhash
  FROM csig GROUP BY doc_id, i // 4),
ccand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cbands a JOIN cbands b
    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
cinter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM ccand c
  JOIN csh sa ON sa.doc_id = c.doc_a
  JOIN csh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b),
cpairs AS (
  SELECT doc_a, doc_b
  FROM cinter
  JOIN csizes0 sa ON doc_a = sa.doc_id
  JOIN csizes0 sb ON doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / CAST(sa.ns + sb.ns - n_common AS DOUBLE)
    >= 0.8),
cedges AS (
  SELECT doc_a AS u, doc_b AS v FROM cpairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM cpairs),
cwalk AS (
  SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM cedges) n
  UNION
  SELECT e.v AS node, w.label
  FROM cwalk w JOIN cedges e ON e.u = w.node),
clabels AS (SELECT node, min(label) AS cluster_id FROM cwalk GROUP BY node),
canon AS (
  SELECT e.doc_id, e.text FROM ex e
  LEFT JOIN clabels l ON l.node = e.doc_id
  WHERE l.node IS NULL OR l.cluster_id = e.doc_id),
qual AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
      CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
      CAST(length(text) - length(regexp_replace(text,
        '[.,!?;:''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE) AS n_punct,
      CAST(length(text) AS DOUBLE) AS n_chars_m,
      CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) AS non_ws
    FROM canon)
  WHERE 0.4 * least(n_tok / 50.0, 1.0)
      + 0.3 * (1.0 - least((n_punct / greatest(n_chars_m, 1.0)) * 4.0, 1.0))
      + 0.3 * (CASE WHEN non_ws / n_tok >= 3.0 AND non_ws / n_tok <= 8.0
                    THEN 1.0 ELSE 0.5 END) >= 0.3),
bsh8 AS (
  SELECT DISTINCT shingle FROM (
    {_shingles_sql(8, source="(SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0)")})),
qsh8 AS ({_shingles_sql(8, source="qual")}),
hits8 AS (
  SELECT s.doc_id, count(*) AS n
  FROM qsh8 s JOIN bsh8 USING (shingle)
  GROUP BY s.doc_id),
decon AS (
  SELECT q.doc_id, q.text FROM qual q
  LEFT JOIN hits8 h8 ON h8.doc_id = q.doc_id
  WHERE coalesce(h8.n, 0) < 1),
splitd AS (
  SELECT doc_id, text,
    CASE WHEN b < 'e666' THEN 'train'
         WHEN b < 'f333' THEN 'val'
         ELSE 'test' END AS split
  FROM (SELECT *, substring(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 4) AS b
        FROM decon)),
packedc AS (
  SELECT doc_id, split,
    CAST(n_tokens AS BIGINT) AS n_tokens,
    CAST(prior // 2048 AS BIGINT) AS bin_id,
    CAST(prior % 2048 AS BIGINT) AS bin_offset
  FROM (
    SELECT doc_id, split, n_tokens,
      COALESCE(SUM(n_tokens) OVER (PARTITION BY split ORDER BY ok, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
    FROM (SELECT doc_id, split,
            CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
            md5(CAST(doc_id AS VARCHAR)) AS ok
          FROM splitd))),
fzbench AS (
  SELECT doc_id + 1000000 AS doc_id,
         text || ' eval answer option marker alpha beta gamma' AS text
  FROM documents WHERE doc_id % 11 = 0),
fzcsh AS ({_shingles_sql(5)}),
fzbsh AS ({_shingles_sql(5, source="fzbench")}),
fzcsig AS (
  SELECT doc_id, i, min((h * (2*i+1) + 7919 * (i+1)) % 2147483647) AS mh
  FROM (SELECT doc_id,
          CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) % 2147483647
            AS h
        FROM fzcsh)
  CROSS JOIN (SELECT unnest(range(32)) AS i) hi
  GROUP BY doc_id, i),
fzbsig AS (
  SELECT doc_id, i, min((h * (2*i+1) + 7919 * (i+1)) % 2147483647) AS mh
  FROM (SELECT doc_id,
          CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) % 2147483647
            AS h
        FROM fzbsh)
  CROSS JOIN (SELECT unnest(range(32)) AS i) hi
  GROUP BY doc_id, i),
fzcband AS (
  SELECT doc_id, i // 4 AS band,
    CAST('0x' || substring(
        md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)), 1, 15)
      AS BIGINT) AS bhash
  FROM fzcsig GROUP BY doc_id, i // 4),
fzbband AS (
  SELECT doc_id, i // 4 AS band,
    CAST('0x' || substring(
        md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)), 1, 15)
      AS BIGINT) AS bhash
  FROM fzbsig GROUP BY doc_id, i // 4),
fzcand AS (
  SELECT DISTINCT c.doc_id AS cdoc, b.doc_id AS bdoc
  FROM fzcband c JOIN fzbband b ON c.band = b.band AND c.bhash = b.bhash),
fzinter AS (
  SELECT fzcand.cdoc, fzcand.bdoc, count(*) AS n_common
  FROM fzcand
  JOIN fzcsh sc ON sc.doc_id = fzcand.cdoc
  JOIN fzbsh sb ON sb.doc_id = fzcand.bdoc AND sb.shingle = sc.shingle
  GROUP BY fzcand.cdoc, fzcand.bdoc),
fzbs AS (SELECT doc_id, count(*) AS ns FROM fzbsh GROUP BY doc_id),
fzbest AS (
  SELECT cdoc, containment, bdoc
  FROM (SELECT cdoc, bdoc,
          CAST(n_common AS DOUBLE) / CAST(fzbs.ns AS DOUBLE) AS containment
        FROM fzinter JOIN fzbs ON fzbs.doc_id = fzinter.bdoc)
  QUALIFY row_number() OVER (PARTITION BY cdoc
                             ORDER BY containment DESC, bdoc ASC) = 1)
SELECT d.doc_id, d.lang,
  coalesce(h.n, 0) AS n_contaminated_shingles,
  coalesce(h.n, 0) >= 1 AS is_contaminated,
  round(coalesce(fzbest.containment, 0.0), 9) AS fuzzy_containment,
  coalesce(fzbest.bdoc, -1)::BIGINT AS matched_bench,
  coalesce(fzbest.containment, 0.0) >= 0.5 AS is_fuzzy_contaminated,
  p.doc_id IS NOT NULL AS is_curated,
  coalesce(p.split, '') AS cur_split,
  coalesce(p.n_tokens, CAST(-1 AS BIGINT)) AS cur_n_tokens,
  coalesce(p.bin_id, CAST(-1 AS BIGINT)) AS bin_id,
  coalesce(p.bin_offset, CAST(-1 AS BIGINT)) AS bin_offset
FROM documents d
LEFT JOIN hits h ON h.doc_id = d.doc_id
LEFT JOIN packedc p ON p.doc_id = d.doc_id
LEFT JOIN fzbest ON fzbest.cdoc = d.doc_id""",
    # Hash-based sampling/splits: md5 hex prefixes compare identically
    # in every engine. Thresholds: round(f * 16^4) as 4 hex chars
    # (0.25->'4000', 0.8->'cccd', 0.9->'e666'). Split assignment and
    # the 25%-sample membership flag share one bucket draw.
    # strat_rank mirrors stratified_sample's two-phase top-k prune with
    # a plain per-stratum row_number: pruning keeps any superset of the
    # global per-stratum top-30, so the two forms are value-identical.
    # The mix CTEs recompute operators/mixing.py's total_rows=None
    # rates from SQL counts with the same left-to-right double
    # arithmetic (norm * scale / count), the same round-to-threshold
    # quantization, and the same per-source-salted md5 selector.
    "docs_sample_split": f"""
WITH ranked AS (
  SELECT doc_id,
    row_number() OVER (PARTITION BY lang
        ORDER BY md5(CAST(doc_id AS VARCHAR) || ':7'), doc_id) AS rn
  FROM documents),
src AS (
  SELECT doc_id,
    CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER) % 2 = 0
      AS is_even
  FROM documents),
cnt AS (
  SELECT
    CAST(sum(CASE WHEN is_even THEN 1 ELSE 0 END) AS DOUBLE) AS n_e,
    CAST(sum(CASE WHEN NOT is_even THEN 1 ELSE 0 END) AS DOUBLE) AS n_o
  FROM src),
rates AS (
  SELECT
    least(1.0, 0.75 * least(n_e / 0.75, n_o / 0.25) / n_e) AS rate_e,
    least(1.0, 0.25 * least(n_e / 0.75, n_o / 0.25) / n_o) AS rate_o
  FROM cnt),
th AS (
  SELECT
    CASE WHEN round(rate_e * 65536) >= 65536 THEN 'g'
         ELSE printf('%04x', CAST(round(rate_e * 65536) AS INTEGER)) END
      AS t_e,
    CASE WHEN round(rate_o * 65536) >= 65536 THEN 'g'
         ELSE printf('%04x', CAST(round(rate_o * 65536) AS INTEGER)) END
      AS t_o
  FROM rates),
mixed AS (
  SELECT s.doc_id,
    CASE
      WHEN s.is_even AND substring(
        md5(CAST(s.doc_id AS VARCHAR) || '|even:7'), 1, 4) < th.t_e
        THEN 'even'
      WHEN NOT s.is_even AND substring(
        md5(CAST(s.doc_id AS VARCHAR) || '|odd:7'), 1, 4) < th.t_o
        THEN 'odd'
      ELSE '' END AS mix_source
  FROM src s CROSS JOIN th),
qual AS (
  SELECT doc_id, round(
    0.4 * least(n_tok / 50.0, 1.0)
  + 0.3 * (1.0 - least((n_punct / greatest(n_chars_m, 1.0)) * 4.0, 1.0))
  + 0.3 * (CASE WHEN non_ws / n_tok >= 3.0 AND non_ws / n_tok <= 8.0
                THEN 1.0 ELSE 0.5 END), 9) AS qv
  FROM (SELECT doc_id,
          CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
          CAST(length(text) AS DOUBLE) AS n_chars_m,
          CAST(length(text) - length(regexp_replace(text,
            '[.,!?;:''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE) AS n_punct,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
            AS non_ws
        FROM documents)),
qhist AS (
  SELECT floor(qv / 0.0001) AS qb, count(*) AS qc FROM qual GROUP BY 1),
qcum AS (SELECT qb, sum(qc) OVER (ORDER BY qb) AS qcc FROM qhist),
qth AS (
  SELECT coalesce(
    max(CASE WHEN qcc <= floor(0.5 * (SELECT count(*) FROM qual))
             THEN qb + 1 END),
    (SELECT min(qb) FROM qhist)) * 0.0001 AS qt
  FROM qcum),
ucnt AS (
  SELECT
    CAST(sum(CASE WHEN is_even THEN 1 ELSE 0 END) AS DOUBLE) AS n_e,
    CAST(sum(CASE WHEN NOT is_even THEN 1 ELSE 0 END) AS DOUBLE) AS n_o,
    count(*) AS n
  FROM src),
urate AS (
  SELECT CAST(2 * n AS DOUBLE) * (4.0 / 5.0) / n_e AS r_hi,
         CAST(2 * n AS DOUBLE) * (1.0 / 5.0) / n_o AS r_lo
  FROM ucnt),
uth AS (
  SELECT CAST(floor(r_hi) AS BIGINT) AS whole_hi,
    CASE WHEN round((r_hi - floor(r_hi)) * 65536) >= 65536 THEN 'g'
         ELSE printf('%04x',
           CAST(round((r_hi - floor(r_hi)) * 65536) AS INTEGER)) END AS t_hi,
    CASE WHEN round(least(r_lo, 1.0) * 65536) >= 65536 THEN 'g'
         ELSE printf('%04x',
           CAST(round(least(r_lo, 1.0) * 65536) AS INTEGER)) END AS t_lo
  FROM urate),
ups AS (
  SELECT s.doc_id,
    CASE WHEN s.is_even THEN
      uth.whole_hi + CASE WHEN substring(
        md5(CAST(s.doc_id AS VARCHAR) || '|hi|up:7'), 1, 4) < uth.t_hi
        THEN 1 ELSE 0 END
    ELSE CASE WHEN substring(
        md5(CAST(s.doc_id AS VARCHAR) || '|lo:7'), 1, 4) < uth.t_lo
        THEN 1 ELSE 0 END
    END AS up_copies
  FROM src s CROSS JOIN uth),
qct AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text),
      '[^\\p{{L}}\\p{{N}}]+'), x -> x != '') AS tk
  FROM documents),
qcg AS (
  SELECT doc_id, tk[i] AS g
  FROM qct, unnest(generate_series(1, len(tk))) AS u(i)
  UNION ALL
  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
  FROM qct, unnest(generate_series(1, len(tk) - 1)) AS u(i)),
qcf AS (
  SELECT DISTINCT doc_id,
    CAST(CAST('0x' || substring(md5(g), 1, 15) AS BIGINT)
      % {_QC_DIM} AS INTEGER) AS j
  FROM qcg),
qcs AS (
  SELECT doc_id, CAST(sum(({_QC_W_SQL})[j + 1]) AS BIGINT) AS wsum
  FROM qcf GROUP BY doc_id),
-- round 12: DSIR importance resampling twin — whitespace unigrams +
-- bigrams, md5 60-bit buckets mod 2048, Laplace-smoothed log ratio
-- rounded to 9dp into DECIMAL(20,9) (the single ln() is the only
-- transcendental; decimal sums make the per-doc scores independent
-- of either engine's aggregation order)
dst AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents),
dsg AS (
  SELECT doc_id, tk[i] AS g
  FROM dst, unnest(generate_series(1, len(tk))) AS u(i)
  UNION ALL
  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
  FROM dst, unnest(generate_series(1, len(tk) - 1)) AS u(i)),
dsb AS (
  SELECT doc_id,
    CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) % 2048 AS b
  FROM dsg),
dstc AS (
  SELECT b, count(*) AS tc FROM dsb WHERE doc_id % 7 = 0 GROUP BY b),
dsrc AS (
  SELECT b, count(*) AS rc FROM dsb WHERE doc_id % 7 != 0 GROUP BY b),
dstot AS (SELECT
    (SELECT CAST(coalesce(sum(tc), 0) AS DOUBLE) FROM dstc) AS tt,
    (SELECT CAST(coalesce(sum(rc), 0) AS DOUBLE) FROM dsrc) AS rr),
dsw AS (
  SELECT r.b, CAST(round(ln(
      ((CAST(coalesce(t.tc, 0) AS DOUBLE) + 1.0) * (rr + 2048.0))
      / ((CAST(r.rc AS DOUBLE) + 1.0) * (tt + 2048.0))), 9)
    AS DECIMAL(20,9)) AS w
  FROM dsrc r LEFT JOIN dstc t ON r.b = t.b CROSS JOIN dstot),
dssc AS (
  SELECT doc_id, count(*) AS dsir_n_grams,
    CAST(sum(w) AS DOUBLE) AS dsir_logw
  FROM dsb JOIN dsw USING (b)
  WHERE doc_id % 7 != 0
  GROUP BY doc_id),
dssel AS (
  SELECT doc_id, CASE WHEN row_number() OVER
      (ORDER BY dsir_logw DESC, doc_id) <= 50 THEN 1 ELSE 0 END AS sel
  FROM dssc)
SELECT d.doc_id,
  CASE WHEN b < 'cccd' THEN 'train'
       WHEN b < 'e666' THEN 'val'
       ELSE 'test' END AS split,
  b < '4000' AS sampled,
  CAST(CASE WHEN r.rn <= 30 THEN r.rn ELSE 0 END AS BIGINT) AS strat_rank,
  r.rn <= 30 AS strat_kept,
  CAST(CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || '|w:7'), 1, 4)
       AS INTEGER) AS DOUBLE) / 65536.0
    < least(CAST(d.n_chars AS DOUBLE) / 2000.0, 1.0) AS weighted_kept,
  m.mix_source != '' AS mix_kept,
  m.mix_source AS mix_source,
  qth.qt AS q50_quality_threshold,
  q.qv >= qth.qt AS quality_top_half,
  u.up_copies AS up_copies,
  CAST({_QC_BIAS_MICRO} + coalesce(s.wsum, 0) AS DOUBLE) / 1000000.0
    AS qc_score6,
  ({_QC_BIAS_MICRO} + coalesce(s.wsum, 0)) > 0 AS qc_keep,
  coalesce(ds.dsir_n_grams, 0) AS dsir_n_grams,
  coalesce(ds.dsir_logw, 0.0) AS dsir_logw,
  CAST(coalesce(dse.sel, 0) AS INTEGER) AS dsir_top50
FROM (SELECT doc_id, n_chars,
        substring(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 4) AS b
      FROM documents) d
JOIN ranked r ON r.doc_id = d.doc_id
JOIN mixed m ON m.doc_id = d.doc_id
JOIN qual q ON q.doc_id = d.doc_id
JOIN ups u ON u.doc_id = d.doc_id
LEFT JOIN qcs s ON s.doc_id = d.doc_id
LEFT JOIN dssc ds ON ds.doc_id = d.doc_id
LEFT JOIN dssel dse ON dse.doc_id = d.doc_id
CROSS JOIN qth""",
    # The oracle's plain windowed cumsum equals the engine's two-pass
    # distributed prefix sum over the same total order. The chunk CTE
    # mirrors operators/chunking.py (chunk_tokens=32, overlap=8, so
    # stride 24): generate_series over the same start grid, list_slice
    # for the window, array_to_string==concat_ws for the text.
    "docs_pack_by_budget": f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS ok
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY ok, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM t),
p0 AS (
  SELECT doc_id, n_tokens,
    CAST(prior // 2048 AS BIGINT) AS bin_id,
    CAST(prior % 2048 AS BIGINT) AS bin_offset
  FROM c),
p AS (
  SELECT *,
    CAST(bin_id // 4 AS BIGINT) AS shard_id,
    CAST(count(*) OVER (PARTITION BY bin_id // 4) AS BIGINT) AS shard_rows,
    CAST(sum(n_tokens) OVER (PARTITION BY bin_id // 4) AS BIGINT)
      AS shard_tokens
  FROM p0),
tk AS (
  SELECT doc_id, {_TOKS} AS toks
  FROM documents
  WHERE length(trim(text)) > 0),
g AS (
  SELECT doc_id, toks, i, CAST((i - 1) // 24 AS BIGINT) AS chunk_id
  FROM tk, unnest(generate_series(1, greatest(len(toks) - 8, 1), 24)) AS s(i)),
ch AS (
  SELECT doc_id, chunk_id,
    CAST(chunk_id * 24 AS BIGINT) AS chunk_start,
    CAST(least(i + 31, len(toks)) - i + 1 AS BIGINT) AS n_chunk_tokens,
    md5(array_to_string(list_slice(toks, i, least(i + 31, len(toks))), ' '))
      AS chunk_sig
  FROM g)
, seqs AS (
  SELECT p0.bin_id,
    md5(string_agg(d.text, chr(10) || chr(10)
        ORDER BY p0.bin_offset)) AS bin_seq_md5,
    count(*)::BIGINT AS bin_n_docs
  FROM p0 JOIN documents d ON d.doc_id = p0.doc_id
  GROUP BY p0.bin_id)
SELECT p.doc_id, p.n_tokens, p.bin_id, p.bin_offset,
  p.shard_id, p.shard_rows, p.shard_tokens,
  COALESCE(ch.chunk_id, CAST(-1 AS BIGINT)) AS chunk_id,
  COALESCE(ch.chunk_start, CAST(-1 AS BIGINT)) AS chunk_start,
  COALESCE(ch.n_chunk_tokens, CAST(-1 AS BIGINT)) AS n_chunk_tokens,
  COALESCE(ch.chunk_sig, '') AS chunk_sig,
  seqs.bin_seq_md5, seqs.bin_n_docs
FROM p LEFT JOIN ch ON p.doc_id = ch.doc_id
JOIN seqs ON seqs.bin_id = p.bin_id""",
    # Rolling fingerprint + the BM25 retrieval twin (mirrors
    # operators/bm25.py: Lucene-positive idf, k1=1.2 b=0.75, so the
    # literals below are k1+1=2.2 and 1-b=0.25; avgdl averages over the
    # WHOLE corpus via a left join, dl=0 for docs absent from the token
    # stream). Queries must match queries._BM25_QUERIES in order.
    "docs_rolling_fingerprint": """
WITH fp AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(
          list_filter(
            string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ''),
            c -> c != ''),
          c -> CAST(unicode(c) AS BIGINT))),
      (acc, code) -> (acc * 31 + code) % 2147483647) AS fingerprint
  FROM documents),
toks AS (
  SELECT doc_id,
    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
stats AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(COALESCE(dl.dl, 0)) AS avgdl
      FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id),
q AS (SELECT 0 AS query_id, 'table scan join' AS query
      UNION ALL SELECT 1, 'spark window'),
qt AS (SELECT query_id, unnest(string_split(lower(query), ' ')) AS term
       FROM q),
scored AS (
  SELECT qt.query_id, tf.doc_id,
    round(sum(
      ln((g.n_docs - s.df + 0.5) / (s.df + 0.5) + 1.0)
      * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl))
    ), 9) AS score
  FROM tf JOIN stats s USING (term) JOIN dl USING (doc_id)
  JOIN qt ON qt.term = tf.term CROSS JOIN g
  GROUP BY 1, 2),
rank5 AS (
  SELECT query_id, doc_id, score, rank FROM (
    SELECT query_id, doc_id, score,
      row_number() OVER (PARTITION BY query_id
          ORDER BY score DESC, doc_id) AS rank
    FROM scored)
  WHERE rank <= 5),
ovl AS (
  SELECT dq.query_id, dt.doc_id, count(*) AS overlap
  FROM (SELECT DISTINCT doc_id, term FROM toks) dt
  JOIN (SELECT DISTINCT query_id, term FROM qt) dq ON dq.term = dt.term
  GROUP BY 1, 2),
ovtop AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
      row_number() OVER (PARTITION BY query_id
          ORDER BY overlap DESC, doc_id) AS rank
    FROM ovl)
  WHERE rank <= 5),
fused AS (
  SELECT query_id, doc_id,
    round(sum(1.0 / (60.0 + rank)), 9) AS rrf_score
  FROM (SELECT query_id, doc_id, rank FROM rank5
        UNION ALL SELECT query_id, doc_id, rank FROM ovtop)
  GROUP BY 1, 2),
ftop AS (
  SELECT query_id, doc_id, rrf_score, rrf_rank FROM (
    SELECT query_id, doc_id, rrf_score,
      CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rrf_rank
    FROM fused)
  WHERE rrf_rank <= 5),
ret AS (
  SELECT COALESCE(h.doc_id, f.doc_id) AS doc_id,
    COALESCE(h.query_id, f.query_id) AS query_id,
    h.score AS bm25_score, CAST(h.rank AS BIGINT) AS bm25_rank,
    f.rrf_score, f.rrf_rank
  FROM rank5 h FULL OUTER JOIN ftop f
    ON h.query_id = f.query_id AND h.doc_id = f.doc_id),
tfx AS (SELECT doc_id, term, tf FROM tf WHERE term != ''),
tdf AS (SELECT term, count(*) AS df FROM tfx GROUP BY term),
tw AS (
  SELECT doc_id,
    CAST('0x' || substring(md5(term), 1, 15) AS BIGINT) % 64 AS bucket,
    CAST(round(tf * round(ln((g.n_docs + 1) / (df + 1.0)) + 1, 6), 6)
         AS DECIMAL(25,6)) AS w
  FROM tfx JOIN tdf USING (term) CROSS JOIN g),
tpb AS (SELECT doc_id, bucket, sum(w) AS w FROM tw GROUP BY 1, 2),
tstat AS (
  SELECT doc_id,
    CAST(count(*) AS BIGINT) AS tfidf_nnz,
    round(sqrt(CAST(sum(CAST(round(
        CAST(w AS DOUBLE) * CAST(w AS DOUBLE), 9) AS DECIMAL(25,9)))
      AS DOUBLE)), 6) AS tfidf_norm6
  FROM tpb GROUP BY doc_id)
SELECT fp.doc_id, fp.fingerprint,
  COALESCE(q.query, '') AS bm25_query,
  COALESCE(r.bm25_score, -1.0) AS bm25_score,
  CAST(COALESCE(r.bm25_rank, 0) AS BIGINT) AS bm25_rank,
  COALESCE(r.rrf_score, -1.0) AS rrf_score,
  CAST(COALESCE(r.rrf_rank, 0) AS BIGINT) AS rrf_rank,
  CAST(COALESCE(t.tfidf_nnz, 0) AS BIGINT) AS tfidf_nnz,
  COALESCE(t.tfidf_norm6, 0.0) AS tfidf_norm6
FROM fp
LEFT JOIN ret r ON fp.doc_id = r.doc_id
LEFT JOIN q ON q.query_id = r.query_id
LEFT JOIN tstat t ON t.doc_id = fp.doc_id""",
    # max_doc_freq=64 mirrors the graded query: the hot-shingle cap is
    # ON so the graded plan is the 100 TB-safe one (at sf0.01 the max
    # 3-gram doc freq is 7, so the capped output is identical to the
    # uncapped form — the cap is exercised, not the semantics changed).
    # Jaccard (symmetric, threshold .5) and containment (asymmetric,
    # |A∩B|/min(|A|,|B|), threshold .8) from one shared CTE chain;
    # pairs passing only one test carry -1 sentinels for the other's
    # columns, mirroring the full-outer union in q_docs_ngram_jaccard.
    "docs_ngram_jaccard": f"""
WITH sh AS ({_shingles_sql(3, max_doc_freq=64)}),
sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
scored AS (
  SELECT doc_a, doc_b,
    CAST(n_common AS DOUBLE) / CAST(sa.ns + sb.ns - n_common AS DOUBLE)
      AS jaccard,
    CAST(n_common AS DOUBLE) / CAST(least(sa.ns, sb.ns) AS DOUBLE)
      AS containment,
    CASE WHEN sa.ns < sb.ns THEN doc_a
         WHEN sb.ns < sa.ns THEN doc_b
         ELSE least(doc_a, doc_b) END AS contained
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id)
SELECT doc_a, doc_b,
  CASE WHEN jaccard >= 0.5 THEN jaccard ELSE -1.0 END AS jaccard,
  CASE WHEN containment >= 0.8 THEN containment ELSE -1.0 END AS containment,
  CAST(CASE WHEN containment >= 0.8 THEN contained ELSE -1 END AS BIGINT)
    AS contained
FROM scored
WHERE jaccard >= 0.5 OR containment >= 0.8""",
    # Full MinHash+LSH mirror (hash_fn="md5" on the Spark side): shingle
    # ids and band keys are 60-bit md5 prefixes, the affine family
    # (h*(2i+1) + 7919(i+1)) mod P uses only positive operands, and band
    # keys hash the comma-joined decimal signature slice — every stage
    # computes bit-identical values in both engines. n=3, num_hashes=32,
    # bands=8 (4 rows/band), threshold=0.5, matching q_docs_minhash_lsh.
    # max_doc_freq=64 as in docs_ngram_jaccard: signatures, banding AND
    # verification all run over the capped shingle space in both engines.
    # Round 4 also grades the cluster assignment (operators/
    # components.py neardup_clusters): each pair row carries doc_a's
    # connected-component label (min doc id in the component — the
    # canonical-keeper policy), the component size, and whether doc_a
    # IS the canonical. The oracle recomputes components independently
    # with a recursive min-label walk over the symmetrized pair edges —
    # diameter-bounded, fine at oracle SFs; the engine runs the O(log n)
    # large-star/small-star alternation instead.
    "docs_minhash_lsh": f"""
WITH RECURSIVE sh AS ({_shingles_sql(3, max_doc_freq=64)}),
h AS (SELECT doc_id,
        CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) % 2147483647
          AS h
      FROM sh),
sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
sig AS (
  SELECT doc_id, i, min((h * (2*i+1) + 7919 * (i+1)) % 2147483647) AS mh
  FROM h CROSS JOIN (SELECT unnest(range(32)) AS i) hi
  GROUP BY doc_id, i),
bands AS (
  SELECT doc_id, i // 4 AS band,
    CAST('0x' || substring(
        md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)), 1, 15)
      AS BIGINT) AS bhash
  FROM sig GROUP BY doc_id, i // 4),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b),
pairs AS (
  SELECT doc_a, doc_b,
    CAST(n_common AS DOUBLE) / CAST(sa.ns + sb.ns - n_common AS DOUBLE)
      AS jaccard
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / CAST(sa.ns + sb.ns - n_common AS DOUBLE)
    >= 0.5),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs),
walk AS (
  SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM edges) n
  UNION
  SELECT e.v AS node, w.label
  FROM walk w JOIN edges e ON e.u = w.node),
labels AS (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node),
csizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
SELECT p.doc_a, p.doc_b, p.jaccard,
  l.cluster_id,
  CAST(s.cluster_size AS BIGINT) AS cluster_size,
  CAST(p.doc_a = l.cluster_id AS INTEGER) AS a_is_canonical
FROM pairs p
JOIN labels l ON p.doc_a = l.node
JOIN csizes s ON l.cluster_id = s.cluster_id""",
    # Full SimHash mirror (hash_fn="md5" on the Spark side): 60-bit
    # md5-prefix shingle hashes, per-bit majority votes (2*set > n),
    # 4 pigeonhole bands of 15 bits, bit_count(xor) verification —
    # every stage computes bit-identical values in both engines.
    # n=3, max_hamming=3, num_bands=4, matching q_docs_simhash.
    "docs_simhash": f"""
WITH sh AS ({_shingles_sql(3)}),
h AS (SELECT doc_id,
        CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h
      FROM sh),
votes AS (
  SELECT doc_id, i, sum((h >> i) & 1) AS ones, count(*) AS ns
  FROM h CROSS JOIN (SELECT unnest(range(60)) AS i) bi
  GROUP BY doc_id, i),
fp AS (
  SELECT doc_id,
    sum(CASE WHEN ones * 2 > ns THEN (CAST(1 AS BIGINT) << i)
        ELSE 0 END) AS sh_fp
  FROM votes GROUP BY doc_id),
bands AS (
  SELECT doc_id, b AS band, (sh_fp >> (b * 15)) & 32767 AS bval, sh_fp
  FROM fp CROSS JOIN (SELECT unnest(range(4)) AS b) bb),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.sh_fp AS fa, b.sh_fp AS fb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
  CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 3""",
    # Full LSH mirrors (portable=True on the Spark side): hyperplane
    # component (i, j) = (md5_60bit('i,j') % 2000001)/1e6 - 1 — DuckDB
    # derives the identical plane family in SQL — and verification is
    # the sequential-fold cosine list_dot_product reproduces exactly.
    # Plane-dot SIGNS are compared across engines; a sign can only
    # diverge if a dot lands within float-summation error of 0
    # (~1e-13), which the fixed test data does not do.
    "emb_lsh_range_search": f"""
WITH {_lsh_buckets_sql(4, 6)},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT id_a, id_b,
  list_dot_product(ea.v, eb.v)
    / (sqrt(list_dot_product(ea.v, ea.v))
       * sqrt(list_dot_product(eb.v, eb.v))) AS cos_sim
FROM cand
JOIN e ea ON ea.vec_id = id_a
JOIN e eb ON eb.vec_id = id_b
WHERE list_dot_product(ea.v, eb.v)
    / (sqrt(list_dot_product(ea.v, ea.v))
       * sqrt(list_dot_product(eb.v, eb.v))) >= 0.4""",
    # Embedding-cosine near-dup on the DOCUMENTS table: the vector set
    # is documents JOIN embeddings (doc_id = vec_id), bucketing/verify
    # mirror emb_lsh_range_search (planes=4, tables=8), keeper = the
    # lower doc_id of each pair, and the dup side carries its document
    # metadata. Same bit-exact md5-plane + fold-cosine parity.
    "docs_embedding_neardup": f"""
WITH {_lsh_buckets_sql(4, 8, src=(
    "(SELECT e0.vec_id, e0.embedding FROM embeddings e0 "
    "JOIN documents d0 ON d0.doc_id = e0.vec_id)"))},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
sim AS (
  SELECT id_a, id_b,
    list_dot_product(ea.v, eb.v)
      / (sqrt(list_dot_product(ea.v, ea.v))
         * sqrt(list_dot_product(eb.v, eb.v))) AS cos_sim
  FROM cand
  JOIN e ea ON ea.vec_id = id_a
  JOIN e eb ON eb.vec_id = id_b
  WHERE list_dot_product(ea.v, eb.v)
      / (sqrt(list_dot_product(ea.v, ea.v))
         * sqrt(list_dot_product(eb.v, eb.v))) >= 0.4)
SELECT id_a AS keep_doc_id, id_b AS dup_doc_id, cos_sim,
  d.lang AS dup_lang, d.n_chars AS dup_n_chars
FROM sim JOIN documents d ON d.doc_id = id_b""",
    "emb_lsh_topk": f"""
WITH {_lsh_buckets_sql(8, 4)},
qb AS (SELECT * FROM buckets WHERE vec_id < 10),
pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
  FROM buckets c JOIN qb q
    ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.vec_id != q.vec_id),
scored AS (
  SELECT query_id, cand_id,
    list_dot_product(eq.v, ec.v)
      / (sqrt(list_dot_product(eq.v, eq.v))
         * sqrt(list_dot_product(ec.v, ec.v))) AS cos_sim
  FROM pairs
  JOIN e eq ON eq.vec_id = query_id
  JOIN e ec ON ec.vec_id = cand_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS rank
  FROM scored)
SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= 5""",
    # Full IVF mirror (portable=True, refine_iters=0 on the Spark
    # side): the centroid sample is the 16 smallest md5-prefix hashes
    # of the stringified id, centroids are L2-normalized seeds,
    # assignment is argmax of dot (ties -> larger list_id, matching
    # numpy argmax over the column-reversed matrix), probes take the
    # n_probe best centroids per query (ties -> smaller list_id), and
    # scoring is the exact-fold cosine.
    "emb_ivf_topk": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
seeds AS (
  SELECT vec_id, v FROM e
  ORDER BY CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)
                AS BIGINT)
  LIMIT 16),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS list_id,
    [x / sqrt(list_dot_product(v, v)) FOR x IN v] AS c
  FROM seeds),
assign AS (
  SELECT vec_id, v, list_id FROM (
    SELECT e.vec_id, e.v, c.list_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY list_dot_product(e.v, c.c) DESC, c.list_id DESC) AS rn
    FROM e CROSS JOIN cent c) WHERE rn = 1),
probes AS (
  SELECT query_id, list_id FROM (
    SELECT q.vec_id AS query_id, c.list_id,
      row_number() OVER (PARTITION BY q.vec_id
        ORDER BY list_dot_product(q.v, c.c) DESC, c.list_id ASC) AS rn
    FROM e q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE rn <= 4),
scored AS (
  SELECT p.query_id, a.vec_id AS cand_id,
    list_dot_product(eq.v, a.v)
      / (sqrt(list_dot_product(eq.v, eq.v))
         * sqrt(list_dot_product(a.v, a.v))) AS cos_sim
  FROM probes p
  JOIN assign a USING (list_id)
  JOIN e eq ON eq.vec_id = p.query_id
  WHERE a.vec_id != p.query_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS rank
  FROM scored)
SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= 5""",
    # The dq CTE mirrors operators/quantize.py bit-for-bit: scale =
    # max(|x|) (>= 1e-30) narrowed to float; codes = round(x/scale*127)
    # (ties away from zero in both engines); reconstruction =
    # (code_f32 * scale)_f32 / 127.0 narrowed to float — float32
    # multiply equals double-multiply-then-narrow, so every
    # reconstructed component is identical and q8_cos needs no slack.
    "emb_cosine_topk": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
    list_dot_product(q.v, c.v)
      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
      AS cos_sim
  FROM e c CROSS JOIN q WHERE c.vec_id != q.vec_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS rank
  FROM scored),
sc AS (
  SELECT vec_id, embedding,
    CAST(greatest(
      CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE),
      1e-30) AS FLOAT) AS scale
  FROM embeddings),
dq AS (
  SELECT vec_id, scale,
    list_transform(embedding, x -> CAST(
      CAST(CAST(CAST(round(CAST(x AS DOUBLE) / CAST(scale AS DOUBLE) * 127.0)
           AS TINYINT) AS FLOAT) * scale AS FLOAT) / 127.0
      AS FLOAT))::DOUBLE[] AS w
  FROM sc)
SELECT r.query_id, r.cand_id, r.cos_sim, r.rank,
  c.scale AS cand_scale,
  list_dot_product(qv.w, c.w)
    / (sqrt(list_dot_product(qv.w, qv.w)) * sqrt(list_dot_product(c.w, c.w)))
    AS q8_cos
FROM ranked r
JOIN dq c ON c.vec_id = r.cand_id
JOIN dq qv ON qv.vec_id = r.query_id
WHERE r.rank <= 5""",
}


def _text_metrics_sql() -> str:
    """Merged per-doc text kernel: token/char/punct counts, avg word
    length, per-language stopword scores, composite quality — one scan,
    mirroring q_docs_text_metrics column for column."""
    from globalweather_etl_spark.functions.text import _LANG_STOPWORDS

    sw_cols = ",\n  ".join(
        f"{_lang_score_sql(ws)} AS sw_{lang}" for lang, ws in _LANG_STOPWORDS.items()
    )
    # The BPE pre-tokenizer pattern is shared verbatim with the Spark
    # side (text._BPE_PATTERN) — only the SQL quoting of the leading
    # apostrophe differs. Both engines use leftmost-first alternation.
    from globalweather_etl_spark.functions.text import _BPE_PATTERN

    bpe_sql = _BPE_PATTERN.replace("'", "''")
    lines = (
        "list_filter(list_transform(string_split(text, chr(10)),"
        " l -> trim(l)), l -> l != '')"
    )
    # PII patterns are shared verbatim with the Spark side
    # (text._PII_PATTERNS, RE2/Java-parity by construction — no
    # lookaround, ASCII classes); regexp_extract_all is non-overlapping
    # in both engines, so the counts are bit-identical.
    from globalweather_etl_spark.functions.text import _PII_PATTERNS

    pii_cols = ",\n  ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER)"
        f" AS pii_{kind.lower()}"
        for kind, pat in _PII_PATTERNS.items()
    )
    # redaction twin: the SAME chain order as text.redact_pii (EMAIL
    # first), global replace, md5 of the scrubbed text
    redacted = "text"
    for kind in ("EMAIL", "IP", "PHONE"):
        redacted = (
            f"regexp_replace({redacted}, '{_PII_PATTERNS[kind]}', "
            f"'<{kind}>', 'g')"
        )
    redact_md5_sql = f"md5({redacted}) AS pii_redacted_md5"
    # HTML kernel twin (functions/html.py STRIP_HTML_SQL): the same
    # deterministic page wrapper as the Spark side, stripped with the
    # RE2 mirror of every pattern — byte-identity is the contract.
    from globalweather_etl_spark.functions.html import STRIP_HTML_SQL

    strip_sql = STRIP_HTML_SQL("h")
    return f"""
WITH m AS (
  SELECT doc_id, text, lang,
    CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
    CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_tok_distinct,
    CAST(len({lines}) AS DOUBLE) AS n_lines,
    CAST(len(list_distinct({lines})) AS DOUBLE) AS n_lines_distinct,
    CAST(len(regexp_extract_all(text, '{bpe_sql}')) AS INTEGER)
      AS bpe_tokens,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(length(text) - length(regexp_replace(text,
      '[.,!?;:''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE) AS n_punct,
    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) AS non_ws,
    {pii_cols}
  FROM documents),
grams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
  FROM (SELECT doc_id, {_TOKS} AS t FROM documents),
       unnest(generate_series(1, len(t) - 1)) AS g(i)),
per_gram AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2),
tng AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
         CAST(max(c) AS BIGINT) AS top_ngram_count
  FROM per_gram GROUP BY 1),
lmtoks AS (
  SELECT doc_id, i AS pos, lower(t[i]) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents),
       unnest(generate_series(1, len(t))) AS g(i)
  WHERE t[i] <> ''),
lmuni AS (SELECT tok, count(*) AS c FROM lmtoks GROUP BY tok),
lmkept AS (SELECT tok FROM lmuni WHERE c >= 2),
lmmap AS (
  SELECT doc_id, pos,
         CASE WHEN k.tok IS NULL THEN '<unk>' ELSE lmtoks.tok END AS w
  FROM lmtoks LEFT JOIN lmkept k ON k.tok = lmtoks.tok),
lmchain AS (
  SELECT doc_id,
         coalesce(lag(w) OVER (PARTITION BY doc_id ORDER BY pos), '<s>')
           AS prev,
         w
  FROM lmmap),
lmbi AS (SELECT prev, w, count(*) AS c FROM lmchain GROUP BY prev, w),
lmpc AS (SELECT prev, count(*) AS c_prev FROM lmchain GROUP BY prev),
lmvs AS (SELECT count(*) + 1 AS v FROM lmkept),
lmlp AS (
  SELECT ch.doc_id, ch.w,
         ln(CAST(coalesce(lmbi.c, 0) + 1 AS DOUBLE)
            / CAST(coalesce(lmpc.c_prev, 0) + lmvs.v AS DOUBLE)) AS lp
  FROM lmchain ch
  LEFT JOIN lmbi ON lmbi.prev = ch.prev AND lmbi.w = ch.w
  LEFT JOIN lmpc ON lmpc.prev = ch.prev
  CROSS JOIN lmvs),
lmagg AS (
  SELECT doc_id,
         count(*)::BIGINT AS lm_tokens,
         sum(CASE WHEN w = '<unk>' THEN 1 ELSE 0 END)::BIGINT AS lm_oov,
         sum(CAST(round(lp, 6) AS DECIMAL(28,6))) AS logprob6
  FROM lmlp GROUP BY doc_id),
entct AS (
  SELECT doc_id, c, count(*)::BIGINT AS n
  FROM (SELECT doc_id,
          unnest(list_filter(string_split(text, ''), c -> c != '')) AS c
        FROM documents)
  GROUP BY doc_id, c),
entagg AS (
  SELECT doc_id, sum(n) AS n_total,
         sum(CAST(round(n * ln(n), 9) AS DECIMAL(25,9))) AS s
  FROM entct GROUP BY doc_id),
hd AS (
  SELECT doc_id,
    '<!DOCTYPE html><html><head><title>Doc '
    || CAST(doc_id AS VARCHAR)
    || '</title><style>p{{color:red}}</style></head><body>'
    || '<script>var x = 1 < 2;</script><h1>Header &amp; intro</h1><p>'
    || text
    || '</p><!-- hidden comment --><div>footer&nbsp;'
    || '&quot;fine&quot;</div></body></html>' AS h
  FROM documents),
hs AS (
  SELECT doc_id, length(h) AS hlen, {strip_sql} AS stripped FROM hd)
SELECT doc_id,
  CAST(n_tok AS INTEGER) AS n_tokens,
  CAST(n_chars AS INTEGER) AS n_chars_measured,
  CAST(n_punct AS INTEGER) AS n_punct,
  non_ws / n_tok AS avg_word_len,
  {sw_cols},
  lang AS labeled_lang,
  {_build_lang_id_sql()} AS detected_lang,
  round(
    0.4 * least(n_tok / 50.0, 1.0)
  + 0.3 * (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 4.0, 1.0))
  + 0.3 * (CASE WHEN non_ws / n_tok >= 3.0 AND non_ws / n_tok <= 8.0
                THEN 1.0 ELSE 0.5 END), 9) AS quality,
  bpe_tokens,
  CASE WHEN n_tok <= 0 THEN 0.0
       ELSE 1.0 - n_tok_distinct / n_tok END AS dup_word_frac,
  CASE WHEN n_lines <= 0 THEN 0.0
       ELSE 1.0 - n_lines_distinct / n_lines END AS dup_line_frac,
  pii_email, pii_ip, pii_phone,
  {redact_md5_sql},
  md5(hs.stripped) AS html_clean_md5,
  CASE WHEN hs.hlen = 0 THEN 0.0
       ELSE round(CAST(length(hs.stripped) AS DOUBLE) / hs.hlen, 9)
  END AS html_visible_ratio,
  COALESCE(CASE WHEN entagg.n_total > 0
    THEN round((ln(entagg.n_total)
                - CAST(entagg.s AS DOUBLE) / entagg.n_total)
               / 0.6931471805599453, 6) END, 0.0) AS char_entropy6,
  CAST(COALESCE(tng.n_ngrams, 0) AS BIGINT) AS n_ngrams,
  CAST(COALESCE(tng.top_ngram_count, 0) AS BIGINT) AS top_ngram_count,
  COALESCE(CAST(tng.top_ngram_count AS DOUBLE)
           / CAST(tng.n_ngrams AS DOUBLE), 0.0) AS top_ngram_frac,
  COALESCE(lmagg.lm_tokens, 0) AS lm_tokens,
  COALESCE(lmagg.lm_oov, 0) AS lm_oov,
  CAST(COALESCE(lmagg.logprob6, 0) AS DOUBLE) AS logprob6
FROM m LEFT JOIN tng USING (doc_id)
LEFT JOIN lmagg USING (doc_id)
LEFT JOIN entagg USING (doc_id)
JOIN hs USING (doc_id)"""


EXT_ORACLES["docs_text_metrics"] = _text_metrics_sql()


def _approx_stats_sql() -> str:
    """docs_approx_stats twin: portable-HLL estimate (bit-identical
    registers, see operators/sketches.py) cross-joined with the exact
    discrete quantiles percentile_approx returns in its exact regime,
    plus the corpus health report (plans/curation.py corpus_report) —
    every report column recomputed from the shared text-kernel
    expressions, means through the DECIMAL(25,12) exact accumulator."""
    from globalweather_etl_spark.functions.text import (
        _BPE_PATTERN,
        _PII_PATTERNS,
    )
    from globalweather_etl_spark.operators.sketches import hll_oracle_sql

    hll = hll_oracle_sql(
        "documents", "text", b=6, out_col="approx_distinct_docs"
    )
    bpe_sql = _BPE_PATTERN.replace("'", "''")
    pii_sum = " + ".join(
        f"len(regexp_extract_all(text, '{_PII_PATTERNS[k]}'))"
        for k in ("EMAIL", "IP", "PHONE")
    )
    quality = """round(
    0.4 * least(n_tok / 50.0, 1.0)
  + 0.3 * (1.0 - least((n_punct / greatest(n_chars_m, 1.0)) * 4.0, 1.0))
  + 0.3 * (CASE WHEN non_ws / n_tok >= 3.0 AND non_ws / n_tok <= 8.0
                THEN 1.0 ELSE 0.5 END), 9)"""
    return f"""
WITH hll AS ({hll}),
q AS (SELECT quantile_disc(n_chars, 0.1) AS chars_p10,
             quantile_disc(n_chars, 0.5) AS chars_p50,
             quantile_disc(n_chars, 0.9) AS chars_p90,
             round(quantile_cont(n_chars, 0.25), 9) AS chars_q1_cont,
             round(quantile_cont(n_chars, 0.75), 9) AS chars_q3_cont,
             count(*) AS n_docs
      FROM documents),
pd AS (
  SELECT doc_id,
    md5({_NORM_TEXT}) AS fp,
    CAST(len({_TOKS}) AS BIGINT) AS tok,
    CAST(len(regexp_extract_all(text, '{bpe_sql}')) AS BIGINT) AS bpe,
    CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
    CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_tok_distinct,
    CAST(length(text) AS DOUBLE) AS n_chars_m,
    CAST(length(text) - length(regexp_replace(text,
      '[.,!?;:''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE) AS n_punct,
    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) AS non_ws,
    CAST({pii_sum} AS BIGINT) AS pii
  FROM documents),
pq AS (
  SELECT doc_id, fp, tok, bpe, pii,
    {quality} AS qual,
    CASE WHEN n_tok <= 0 THEN 0.0
         ELSE 1.0 - n_tok_distinct / n_tok END AS dw
  FROM pd),
rep AS (
  SELECT
    CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_contents,
    CAST(sum(tok) AS BIGINT) AS total_tokens,
    CAST(sum(bpe) AS BIGINT) AS total_bpe_tokens,
    round(CAST(sum(CAST(qual AS DECIMAL(25,12))) AS DOUBLE)
      / count(qual), 6) AS mean_quality,
    round(CAST(quantile_disc(qual, 0.5) AS DOUBLE), 9) AS median_quality,
    round(CAST(sum(CAST(dw AS DECIMAL(25,12))) AS DOUBLE)
      / count(dw), 6) AS mean_dup_word_frac,
    CAST(sum(pii) AS BIGINT) AS total_pii_hits,
    round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE)
      / CAST(count(*) AS DOUBLE), 9) AS exact_dup_rate
  FROM pq),
tc AS (
  SELECT t.term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
          AS term
        FROM documents) t
  GROUP BY t.term),
tt AS (
  SELECT term AS top_token, c AS top_token_count
  FROM tc ORDER BY c DESC, term LIMIT 1),
cms_sk AS (
  SELECT row, bucket, CAST(sum(c) AS BIGINT) AS cnt
  FROM (
    {" UNION ALL ".join(
        "SELECT %d AS row, CAST('0x' || substring(md5('%d|' || term), 1, 15)"
        " AS BIGINT) %% 4096 AS bucket, c FROM tc" % (i, i)
        for i in range(4)
    )})
  GROUP BY row, bucket),
cms_top AS (
  SELECT CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS cms_top_est
  FROM (SELECT i AS row,
          CAST('0x' || substring(md5(i || '|' ||
            (SELECT top_token FROM tt)), 1, 15) AS BIGINT) % 4096 AS bucket
        FROM (SELECT unnest(range(4)) AS i)) p
  LEFT JOIN cms_sk s USING (row, bucket)),
cms_mass AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS cms_row0_mass
  FROM cms_sk WHERE row = 0)
SELECT hll.approx_distinct_docs, q.chars_p10, q.chars_p50, q.chars_p90,
       q.chars_q1_cont, q.chars_q3_cont,
       q.n_docs, rep.*, tt.top_token, tt.top_token_count,
       cms_top.cms_top_est, cms_mass.cms_row0_mass
FROM hll CROSS JOIN q CROSS JOIN rep CROSS JOIN tt
  CROSS JOIN cms_top CROSS JOIN cms_mass"""


EXT_ORACLES["docs_approx_stats"] = _approx_stats_sql()


def all_oracles() -> dict[str, str]:
    return {
        **PIPELINE_ORACLES,
        **TPCH_ORACLES,
        **WINDOW_ORACLES,
        **_media_oracles(),
        **EXT_ORACLES,
    }
