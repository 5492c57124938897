"""Table sources/sinks with schema validation (SURVEY.md §2.1).

The reference's "catalog" is a text file of paths (S1) plus gz sidecar
sketch files (S3/S4); here sources are parquet/Iceberg tables with
checked schemas, and the sketches table is the persisted-sketch
equivalent (warehouse.py owns lineage).
"""

from .tables import read_pages, read_documents, read_embeddings, read_events, SCHEMAS

__all__ = ["read_pages", "read_documents", "read_embeddings", "read_events", "SCHEMAS"]
