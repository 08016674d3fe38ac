from docling_metrics_spark.export.confusion_export import (  # noqa: F401
    COLLAPSED_IMAGE_HEADERS,
    export_dataset_report,
    export_tore_report,
)
