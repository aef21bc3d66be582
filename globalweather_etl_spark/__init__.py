"""globalweather_etl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of MatejMedvec/GlobalWeather-ETL.

The reference (read-only at /root/reference) is a Snowflake ELT project:
~230 lines of declarative SQL building a three-layer warehouse
(STAGING -> NORMALIZED 3NF -> DIMENSIONAL star schema) over a daily
weather-forecast table, plus 5 dashboard queries and 2 validation queries.
This package re-expresses the full surface Spark-first (DataFrame API,
Catalyst optimization, AQE) and extends it with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns, structured streaming) designed for 100 TB scale.

Layout:
    functions/   pure Column->Column expression kernel (band CASE, ISO dates, text, vectors)
    sources/     source connectors / registries (parquet landing zone, constant-row)
    operators/   reusable DataFrame operators (surrogate keys, dedup, similarity, top-k)
    plans/       the ELT pipeline builders + dashboard + validation queries
                 + the one-call corpus curation pipeline
    streaming/   Structured Streaming variants of the window metrics
    multimodal/  binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.5.0"
