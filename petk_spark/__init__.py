"""petk_spark — a PySpark-native data-profiling & quality engine.

Brand-new implementation of the capabilities of open-data-toronto/petk
(reference at /root/reference), re-expressed as lazy, distributed
DataFrame operators designed for 100 TB scale, plus LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal).
"""

from petk_spark.report import Report

__version__ = "0.1.0"
__all__ = ["Report"]
