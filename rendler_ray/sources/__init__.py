"""Sources: deterministic synthetic web, storage seam (parquet⇄lance)."""
