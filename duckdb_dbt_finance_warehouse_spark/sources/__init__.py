from .csv import ingest_csv
from .tables import Warehouse, load_testdata

__all__ = ["ingest_csv", "Warehouse", "load_testdata"]
