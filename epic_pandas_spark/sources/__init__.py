from epic_pandas_spark.sources.io import load, dump, autoload
from epic_pandas_spark.sources.ingest import df_from_iterable, series_from_iterable

__all__ = ["load", "dump", "autoload", "df_from_iterable", "series_from_iterable"]
