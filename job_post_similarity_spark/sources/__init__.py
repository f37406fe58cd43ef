from .io import (  # noqa: F401
    load_table,
    read_csv,
    read_parquet,
    schema_peek,
    write_csv,
    write_parquet,
)
