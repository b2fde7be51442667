from etl_spark.sources.adapters import (
    carve_between,
    flatten_struct,
    read_json_records,
    read_report_csv,
    read_excel_sheets,
)

__all__ = [
    "carve_between", "flatten_struct", "read_json_records",
    "read_report_csv", "read_excel_sheets",
]
