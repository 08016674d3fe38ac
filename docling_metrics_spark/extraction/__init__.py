from docling_metrics_spark.extraction.html_extract import (  # noqa: F401
    extract_spans_from_html,
)
