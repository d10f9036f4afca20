"""Sources: synthetic corpus generator, corpus reader, CSV sniffing, JSON policy."""
