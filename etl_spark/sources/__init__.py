from etl_spark.sources.adapters import (
    carve_between,
    flatten_struct,
    pandas_style_headers,
    read_converted_sheet_csv,
    read_json_records,
    read_report_csv,
    read_excel_sheets,
)
from etl_spark.sources.retry import retrying, with_retries

__all__ = [
    "carve_between", "flatten_struct", "pandas_style_headers",
    "read_converted_sheet_csv", "read_json_records",
    "read_report_csv", "read_excel_sheets",
    "retrying", "with_retries",
]
