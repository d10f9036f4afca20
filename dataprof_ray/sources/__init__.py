"""Sources: synthetic corpus generator, corpus reader, CSV sniffing, JSON
policy, HTTP-range parquet, WARC/WET web archives (warc.py)."""
