from data_profiler_spark.sinks.report import (  # noqa: F401
    RAW_SHEET_CELL_LIMIT,
    export_csv,
    render_html_report,
)
