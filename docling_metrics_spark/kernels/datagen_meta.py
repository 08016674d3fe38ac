"""Shared constants between datagen and operators."""
from docling_metrics_spark.datagen import CATEGORY_NAMES

N_CATEGORIES = len(CATEGORY_NAMES)
