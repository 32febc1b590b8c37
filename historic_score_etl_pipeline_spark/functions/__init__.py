from historic_score_etl_pipeline_spark.functions.strings import (
    classify_activity,
    extract_svg_class_token,
    first_token,
    overtime_minute,
    split_clean,
)
from historic_score_etl_pipeline_spark.functions.dates import (
    parse_day_month_with_year,
    tomorrow_of,
)
from historic_score_etl_pipeline_spark.functions.json_fns import (
    json_extract_string,
    struct_to_json,
)

__all__ = [
    "classify_activity",
    "extract_svg_class_token",
    "first_token",
    "overtime_minute",
    "split_clean",
    "parse_day_month_with_year",
    "tomorrow_of",
    "json_extract_string",
    "struct_to_json",
]
