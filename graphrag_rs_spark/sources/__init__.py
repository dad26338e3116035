"""Source connectors: file/dir document loaders and tabular imports."""
