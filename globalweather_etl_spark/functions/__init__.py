"""Expression kernel: pure Column -> Column helpers.

Each function encodes one reference semantic exactly (cites are to
/root/reference/sql/ETL_GlobalWeather_DB.sql as ETL:n). Keeping them as
Column expressions (never UDFs) keeps the whole pipeline inside
whole-stage codegen.
"""

from globalweather_etl_spark.functions.dates import (
    date_parts,
    dayofweek_iso,
    weekiso,
)
from globalweather_etl_spark.functions.html import (
    strip_html,
    visible_text_ratio,
)
from globalweather_etl_spark.functions.semistructured import (
    flatten_json_array,
    json_array_size,
    json_get,
    parse_json,
)
from globalweather_etl_spark.functions.urls import (
    filter_domains,
    registered_domain,
    url_host,
    url_normalize,
)
from globalweather_etl_spark.functions.weather import precip_type, weather_band

__all__ = [
    "flatten_json_array",
    "json_array_size",
    "json_get",
    "parse_json",
    "strip_html",
    "visible_text_ratio",
    "date_parts",
    "filter_domains",
    "dayofweek_iso",
    "weekiso",
    "precip_type",
    "registered_domain",
    "url_host",
    "url_normalize",
    "weather_band",
]
