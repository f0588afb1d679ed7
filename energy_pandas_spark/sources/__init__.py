"""Domain sources: EnergyPlus ReportData ingestion + file readers."""

from energy_pandas_spark.sources.reportdata import (
    from_reportdata,
    from_reportdata_pivot,
)

__all__ = ["from_reportdata", "from_reportdata_pivot"]
