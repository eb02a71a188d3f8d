"""File-format sources/sinks beyond (Geo)Parquet."""
