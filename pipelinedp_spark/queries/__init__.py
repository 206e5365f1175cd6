"""Oracle-registry query families (driver contract lives in __spark_entry__.py)."""
