from datamart_ray.sources.convert import (
    convert_csv_to_parquet,
    detect_and_convert,
    write_with_metadata,
)

__all__ = [
    "convert_csv_to_parquet",
    "detect_and_convert",
    "write_with_metadata",
]
