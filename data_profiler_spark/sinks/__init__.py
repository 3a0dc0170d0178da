from data_profiler_spark.sinks.excel import (  # noqa: F401
    list_sheets,
    read_xlsx,
    write_xlsx,
)
from data_profiler_spark.sinks.report import (  # noqa: F401
    RAW_SHEET_CELL_LIMIT,
    export_csv,
    render_html_report,
)
