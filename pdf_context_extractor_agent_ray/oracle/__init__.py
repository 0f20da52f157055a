from .extractor import extract_table  # noqa: F401
