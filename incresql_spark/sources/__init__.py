"""External sources: ``FROM DIRECTORY`` CSV ingestion (reference file_scan)."""
