from datamart_ray.sources.convert import (
    convert_csv_to_parquet,
    detect_and_convert,
    write_with_metadata,
)
from datamart_ray.sources.stata import (
    convert_spss_to_parquet,
    convert_stata_to_parquet,
)
from datamart_ray.sources.xlsx import convert_xlsx_to_parquet

__all__ = [
    "convert_csv_to_parquet",
    "convert_spss_to_parquet",
    "convert_stata_to_parquet",
    "convert_xlsx_to_parquet",
    "detect_and_convert",
    "write_with_metadata",
]
