"""Domain sources: EnergyPlus ReportData ingestion + file readers."""

from energy_pandas_spark.sources.reportdata import (
    from_reportdata,
    from_reportdata_pivot,
)
from energy_pandas_spark.sources.textcorpus import read_text_corpus
from energy_pandas_spark.sources.wet import read_wet_corpus, stream_wet_corpus

__all__ = [
    "from_reportdata",
    "from_reportdata_pivot",
    "read_text_corpus",
    "read_wet_corpus",
    "stream_wet_corpus",
]
